"""Parquet fixture source.

The driver test tables (TESTDATA.md): region nation customer supplier
part orders lineitem events documents embeddings. Reads are plain
``spark.read.parquet`` so Catalyst keeps predicate pushdown + column
pruning (verify with ``.explain``: PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ureplicator_spark.session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)  # nanosAsLong for events.ts, UTC, AQE
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
