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

    The segment filter prunes customer ~5× but the slice still grows
    with SF, so its join strategy is left to AQE (broadcast while it
    fits, shuffle-hash beyond) instead of a forced hint that would OOM
    the driver at sf100+. Only the final top-k ranking funnels.
    """
    revenue = _d("l_extendedprice") * (F.lit(1).cast(_DEC) - _d("l_discount"))
    j = (
        lineitem.filter(F.col("l_shipdate") > F.lit(date).cast("timestamp_ntz"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit(date).cast("timestamp_ntz")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.filter(F.col("c_mktsegment") == segment),
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

    The fixed-cardinality dim chain region→nation broadcasts; customer
    and supplier grow with SF so AQE picks their join strategy. The
    orders⋈lineitem fact join shuffles once, then a 25-key agg.
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
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(customer, (F.col("o_custkey") == F.col("c_custkey"))
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


def promo_revenue_monthly(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio per month.

    part projects to two columns and broadcasts; the fact never
    shuffles until the ~24-key month agg."""
    revenue = _d("l_extendedprice") * (F.lit(1).cast(_DEC) - _d("l_discount"))
    j = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp_ntz"))
    ).join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0).cast(_DEC))
    return (
        j.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("month"))
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(revenue).cast("double"), 6
            ).alias("promo_pct"),
            F.round(F.sum(revenue), 2).cast("double").alias("revenue"),
        )
    )


def large_volume_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    threshold: int = 300,
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold.

    The HAVING-filtered aggregate is tiny, so it broadcasts into
    orders; the resulting slice is tiny too, so AQE broadcasts it into
    the customer join at runtime — the fact tables never co-shuffle."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum(_d("l_quantity")), 2).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > threshold)
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "total_qty",
        )
    )


def small_quantity_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    brand: str = "Brand#13",
    num: int = 1,
    den: int = 5,
) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-average-quantity lineitems.

    The correlated scalar subquery ("avg quantity for this part")
    decorrelates into a per-part aggregate joined back — two passes
    over the brand-restricted slice, both keyed on p_partkey, so the
    second join co-partitions with the first. The below-average filter
    is kept in EXACT arithmetic (den·count·qty < num··sum) so no
    double rounding can flip boundary rows between engines."""
    parts = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
    stats = li.groupBy("p_partkey").agg(
        F.sum(_d("l_quantity")).alias("sum_qty"),
        F.count("*").alias("n_li"),
    ).select(F.col("p_partkey").alias("s_partkey"), "sum_qty", "n_li")
    below = li.join(F.broadcast(stats), F.col("p_partkey") == F.col("s_partkey")).filter(
        _d("l_quantity") * F.lit(den) * F.col("n_li") < F.col("sum_qty") * F.lit(num)
    )
    return below.agg(
        F.round(F.sum(_d("l_extendedprice")).cast("double") / 7.0, 2).alias("avg_yearly"),
        F.count("*").alias("n_items"),
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
