"""General relational capability: TPC-H-shaped analytics over the
fixture star schema + event sessionization.

These exercise the engine paths a 100 TB deployment leans on hardest:
  * wide-fact scan + multi-column agg (Q1): map-side partial agg, one
    shuffle keyed on the 6-group cardinality.
  * selective dim→fact join chain (Q3/Q5): broadcast the pruned dims,
    fact never shuffles until the final small agg.
  * pure scan-filter-agg (Q6): predicate pushdown to parquet row
    groups; the plan is a single WholeStageCodegen over the scan.
  * sessionization: the one genuinely order-dependent operator —
    window lag over (user, time), shuffle keyed on user only.

Determinism discipline: money math is DECIMAL(18,2)-cast BEFORE
aggregation (exact, order-independent), rounded then cast to double
only at the output edge — the pattern that makes results reproducible
across partitionings/engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(18,2)"


def _d(c: str):
    return F.col(c).cast(_DEC)


def pricing_summary(lineitem: DataFrame, cutoff: str = "2000-12-31") -> DataFrame:
    """TPC-H Q1 shape: grouped pricing summary with exact decimal sums."""
    disc_price = _d("l_extendedprice") * (F.lit(1).cast(_DEC) - _d("l_discount"))
    charge = disc_price * (F.lit(1).cast(_DEC) + _d("l_tax"))
    out = (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_d("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(_d("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            F.round(F.sum(_d("l_quantity")).cast("double") / F.count("*"), 6).alias("avg_qty"),
            F.round(F.sum(_d("l_extendedprice")).cast("double") / F.count("*"), 6).alias("avg_price"),
            F.round(F.sum(_d("l_discount")).cast("double") / F.count("*"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )
    return out


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: top-k unshipped orders by revenue.

    Dim side (filtered customer) broadcasts; the lineitem fact joins on
    its natural key so only the final top-k ranking shuffles.
    """
    revenue = _d("l_extendedprice") * (F.lit(1).cast(_DEC) - _d("l_discount"))
    j = (
        lineitem.filter(F.col("l_shipdate") > F.lit(date).cast("timestamp_ntz"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit(date).cast("timestamp_ntz")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == segment)),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    agg = j.groupBy("l_orderkey", "o_orderdate").agg(
        F.round(F.sum(revenue), 2).cast("double").alias("revenue")
    )
    from ureplicator_spark.functions import top_k_ranked

    return (
        top_k_ranked(agg, k, F.col("revenue").desc(), F.col("l_orderkey"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "revenue",
            "rank",
        )
    )


def local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation for intra-nation trade.

    The dim chain region→nation→(customer, supplier) broadcasts end to
    end; only the orders⋈lineitem fact join shuffles, then a 25-key agg.
    """
    revenue = _d("l_extendedprice") * (F.lit(1).cast(_DEC) - _d("l_discount"))
    dims = (
        nation.join(F.broadcast(region.filter(F.col("r_name") == region_name)),
                    F.col("n_regionkey") == F.col("r_regionkey"))
    )
    j = (
        lineitem
        .join(orders.filter(
            (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp_ntz"))
        ), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer), (F.col("o_custkey") == F.col("c_custkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(dims), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return j.groupBy("n_name").agg(
        F.round(F.sum(revenue), 2).cast("double").alias("revenue")
    )


def forecast_revenue_change(
    lineitem: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-agg; pushdown-friendly."""
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(_d("l_extendedprice") * _d("l_discount")), 2)
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def sessionize(events_ts_sec: DataFrame, gap_sec: int = 21600) -> DataFrame:
    """Event sessionization: session starts where the per-user gap
    exceeds ``gap_sec``. One shuffle keyed on user_id; the sort is
    within-partition (the scalable sessionization shape)."""
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    flagged = events_ts_sec.withColumn(
        "is_start",
        F.when(
            F.lag("ts_sec").over(w).isNull()
            | (F.col("ts_sec") - F.lag("ts_sec").over(w) > gap_sec),
            1,
        ).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("is_start").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )
