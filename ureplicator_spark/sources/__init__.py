from ureplicator_spark.sources.parquet import load_table, register_views  # noqa: F401
