"""Cluster registry — the clusters.properties / ControllerConf analog.

Reference resolves per-cluster bootstrap servers + ZK paths from
properties files (WorkerInstance.java:289-335: keys like
``kafka.cluster.servers.<name>``); regions are the first 3 chars of
the cluster name (HelixMirrorMakerManager.java:422-428).
"""

from __future__ import annotations

from dataclasses import dataclass

# engineered capacity constants (ControllerConf.java:161-171)
MAX_WORKLOAD_PER_WORKER_BYTES = 8 * 1024 * 1024
DEFAULT_BYTES_PER_SECOND = 1000.0
DEFAULT_MSGS_PER_SECOND = 1.0


@dataclass(frozen=True)
class ClusterConfig:
    name: str
    bootstrap_servers: str

    @property
    def region(self) -> str:
        return self.name[:3]


class ClusterRegistry:
    def __init__(self) -> None:
        self._clusters: dict[str, ClusterConfig] = {}

    def add(self, name: str, bootstrap_servers: str) -> "ClusterRegistry":
        self._clusters[name] = ClusterConfig(name, bootstrap_servers)
        return self

    def get(self, name: str) -> ClusterConfig:
        return self._clusters[name]

    def same_region(self, src: str, dst: str) -> bool:
        """F4 (HelixMirrorMakerManager.java:422-428)."""
        return self.get(src).region == self.get(dst).region

    @classmethod
    def from_properties(cls, path: str, prefix: str = "kafka.cluster.servers.") -> "ClusterRegistry":
        """Parse a clusters.properties-style file: ``<prefix><name>=host:port``."""
        reg = cls()
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#") or "=" not in line:
                    continue
                k, v = line.split("=", 1)
                if k.startswith(prefix):
                    reg.add(k[len(prefix):], v)
        return reg
