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

Determinism discipline: money math runs in exact integer units (see
the money-aggregation note below), rounded and cast to double only at
the output edge — the pattern that makes results reproducible across
partitionings/engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ureplicator_spark.functions import round6f

_DEC = "decimal(18,2)"


def _d(c: str):
    return F.col(c).cast(_DEC)


# --- exact integer money aggregation -----------------------------------
# JVM Decimal sums run ~5x slower than primitive long sums (measured
# 1.1 s vs 0.2 s for the Q1 aggregate at sf0.1 — Decimal boxes and
# overflow-checks per row inside the hash aggregate). Money inputs have
# exactly 2 decimal digits, so every product used by the TPC-H shapes
# is an INTEGER in units of 10^-scale: scale 2 for prices, 4 for
# price*(1-disc), 6 for price*(1-disc)*(1+tax). Summing those integers
# is exact and order-independent, like the decimal sums they replace.
#
# One long accumulator would overflow at extreme SF (charge ≈ 1e11
# units/row × 6e11 rows at ~sf1e5 ≈ 100 TB > 2^63), so each sum is
# SPLIT into high/low partial sums around 10^6: hi ≤ 1e5/row and
# lo < 1e6/row both stay < 9.2e18 past sf1e6. Requires non-negative
# units (true for TPC-H money columns; quantities/prices/taxes ≥ 0 and
# discount ≤ 1).

_SPLIT = 1_000_000


def _units(c: str) -> "F.Column":
    """Money double → exact integer hundredths. round(x*100) and the
    oracle's CAST(x AS DECIMAL(18,2)) agree on every ≤2-decimal money
    value (both half-up; the double's representation error is orders
    of magnitude below the rounding boundary), and the double multiply
    skips a per-row decimal conversion inside the hot scan."""
    return F.round(F.col(c) * 100).cast("long")


def sum_units(units, alias_hi: str, alias_lo: str) -> list:
    """The two partial sums for an integer-units expression."""
    return [
        F.sum((units / _SPLIT).cast("long")).alias(alias_hi),
        F.sum(units % _SPLIT).alias(alias_lo),
    ]


def units_total(alias_hi: str, alias_lo: str) -> "F.Column":
    """Recombine split partial sums into the exact integer total."""
    return F.col(alias_hi) * _SPLIT + F.col(alias_lo)


def money_dec(total, from_scale: int) -> "F.Column":
    """Integer-units total → exact decimal value. Decimal math here is
    fine: it runs on the POST-aggregation rows (group cardinality), not
    per input row — a long total would lose exactness in double past
    2^53, decimal(38) never does."""
    return total.cast("decimal(38,0)") / F.lit(10**from_scale).cast(
        f"decimal({from_scale + 1},0)"
    )


def money_round(total, from_scale: int, digits: int = 2) -> "F.Column":
    """Exact half-up round of an integer-units total to ``digits``
    decimal places, emitted as double (ROUND(decimal) semantics in
    both engines for the non-negative money domain)."""
    return F.round(money_dec(total, from_scale), digits).cast("double")


def rev_units() -> "F.Column":
    """l_extendedprice·(1-l_discount) in scale-4 integer units — the
    revenue expression every TPC-H shape sums."""
    return _units("l_extendedprice") * (100 - _units("l_discount"))


money_units = _units  # public name for cross-module use


def pricing_summary(lineitem: DataFrame, cutoff: str = "2000-12-31") -> DataFrame:
    """TPC-H Q1 shape: grouped pricing summary, exact integer-units
    sums (see the money-aggregation note above) recombined to the same
    decimal-exact outputs the oracle's DECIMAL(18,2) sums produce."""
    qty = _units("l_quantity")  # scale 2
    ext = _units("l_extendedprice")  # scale 2
    disc = _units("l_discount")  # scale 2 of a 0..1 fraction
    disc_price = ext * (100 - disc)  # scale 4
    charge = disc_price * (100 + _units("l_tax"))  # scale 6
    out = (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            *sum_units(qty, "qh", "ql"),
            *sum_units(ext, "eh", "el"),
            *sum_units(disc_price, "dh", "dl"),
            *sum_units(charge, "ch", "cl"),
            *sum_units(disc, "sh", "sl"),
            F.count("*").alias("count_order"),
        )
    )
    n = F.col("count_order")
    return out.select(
        "l_returnflag",
        "l_linestatus",
        money_round(units_total("qh", "ql"), 2).alias("sum_qty"),
        money_round(units_total("eh", "el"), 2).alias("sum_base_price"),
        money_round(units_total("dh", "dl"), 4).alias("sum_disc_price"),
        money_round(units_total("ch", "cl"), 6).alias("sum_charge"),
        round6f(money_dec(units_total("qh", "ql"), 2).cast("double") / n).alias("avg_qty"),
        round6f(money_dec(units_total("eh", "el"), 2).cast("double") / n).alias("avg_price"),
        round6f(money_dec(units_total("sh", "sl"), 2).cast("double") / n).alias("avg_disc"),
        "count_order",
    )


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
    agg = (
        j.groupBy("l_orderkey", "o_orderdate")
        .agg(*sum_units(rev_units(), "rh", "rl"))
        .select(
            "l_orderkey",
            "o_orderdate",
            money_round(units_total("rh", "rl"), 4).alias("revenue"),
        )
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
    return (
        j.groupBy("n_name")
        .agg(*sum_units(rev_units(), "rh", "rl"))
        .select("n_name", money_round(units_total("rh", "rl"), 4).alias("revenue"))
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
            *sum_units(
                _units("l_extendedprice") * _units("l_discount"), "rh", "rl"
            ),
            F.count("*").alias("n_items"),
        )
        .select(
            money_round(units_total("rh", "rl"), 4).alias("revenue"),
            "n_items",
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
    j = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp_ntz"))
    ).join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    promo = F.when(F.col("p_type") == "PROMO", rev_units()).otherwise(F.lit(0))
    return (
        j.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("month"))
        .agg(
            *sum_units(promo, "ph", "pl"),
            *sum_units(rev_units(), "rh", "rl"),
        )
        .select(
            "month",
            round6f(
                F.lit(100.0)
                * money_dec(units_total("ph", "pl"), 4).cast("double")
                / money_dec(units_total("rh", "rl"), 4).cast("double")
            ).alias("promo_pct"),
            money_round(units_total("rh", "rl"), 4).alias("revenue"),
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
        .agg(*sum_units(_units("l_quantity"), "qh", "ql"))
        .select(
            "l_orderkey",
            money_round(units_total("qh", "ql"), 2).alias("total_qty"),
        )
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
    stats = (
        li.groupBy("p_partkey")
        .agg(*sum_units(_units("l_quantity"), "qh", "ql"), F.count("*").alias("n_li"))
        .select(
            F.col("p_partkey").alias("s_partkey"),
            units_total("qh", "ql").alias("sum_qty_u"),
            "n_li",
        )
    )
    below = li.join(F.broadcast(stats), F.col("p_partkey") == F.col("s_partkey")).filter(
        _units("l_quantity") * F.lit(den) * F.col("n_li")
        < F.col("sum_qty_u") * F.lit(num)
    )
    return (
        below.agg(
            *sum_units(_units("l_extendedprice"), "eh", "el"),
            F.count("*").alias("n_items"),
        )
        .select(
            round6f(
                money_dec(units_total("eh", "el"), 2).cast("double") / 7.0, 2
            ).alias("avg_yearly"),
            "n_items",
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


def retention_cohorts(events_ts_sec: DataFrame, bucket_sec: int = 604800) -> DataFrame:
    """Cohort retention: users grouped by the week of their FIRST
    activity; for each (cohort_week, week_offset) the count of users
    still active that many weeks later.

    Scale shape: the first-touch table is a per-user reduction — AQE
    broadcasts it at small SF (measured: the event stream never
    shuffles for the join); beyond the broadcast threshold the join
    keys on user_id and the aggregate side arrives already
    hash-partitioned on it, so only the event side pays a shuffle.
    The (cohort, offset) rollup then distinct-counts over a key space
    bounded by weeks², not events. Weeks are epoch-bucketed
    (ts_sec div bucket) so no calendar library is in the hot path."""
    wk = (F.col("ts_sec") / bucket_sec).cast("long")
    first = events_ts_sec.groupBy("user_id").agg(
        F.min("ts_sec").alias("first_ts")
    )
    return (
        events_ts_sec.join(first, "user_id")
        .select(
            "user_id",
            (F.col("first_ts") / bucket_sec).cast("long").alias("cohort_week"),
            (wk - (F.col("first_ts") / bucket_sec).cast("long")).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def funnel_counts(
    events_ts_sec: DataFrame,
    stages: tuple[str, ...] = ("signup", "view", "purchase"),
) -> DataFrame:
    """Ordered funnel: stage k counts users whose earliest stage-k
    event STRICTLY FOLLOWS their earliest qualifying stage-(k-1) event
    (min-ts chaining, the standard funnel semantics that is robust to
    event replays).

    Scale shape: one conditional aggregate per stage, all keyed on
    user_id, so every shuffle shares one partitioning; per-stage user
    sets only ever shrink. The output is stages-many rows built from
    1-row counts (broadcast union, no data returns to the driver)."""
    cur = None  # DataFrame[user_id, t_k] of users alive at stage k
    out = None
    for idx, stage in enumerate(stages):
        ev = events_ts_sec.filter(F.col("event_type") == stage)
        if cur is None:
            cur = ev.groupBy("user_id").agg(F.min("ts_sec").alias("t"))
        else:
            cur = (
                ev.join(cur, "user_id")
                .filter(F.col("ts_sec") > F.col("t"))
                .groupBy("user_id")
                .agg(F.min("ts_sec").alias("t"))
            )
        row = cur.agg(F.count("*").alias("n_users")).select(
            F.lit(idx).cast("int").alias("stage"),
            F.lit(stage).alias("event_type"),
            "n_users",
        )
        out = row if out is None else out.unionByName(row)
    return out


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: for every (prev_type, curr_type) pair, the transition
    count and its probability among all transitions leaving
    ``prev_type``. The behavioral-model twin of sessionization/funnel
    analytics — used to spot broken flows (a probability collapsing)
    and to generate synthetic traffic.

    Requires columns ``user_id, ts_sec, event_id, event_type``; events
    are ordered per user by (ts_sec, event_id) — the id tie-break
    makes same-second orderings deterministic in any engine.

    Scale shape: one shuffle partitions by user_id for the LAG window
    (per-user state, never a global sort); the transition rollup then
    aggregates a key space bounded by |event types|², and the per-prev
    totals roll up from THAT matrix, so the event stream is read once.
    """
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    pairs = events.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("curr_type"),
    ).filter(F.col("prev_type").isNotNull())
    matrix = pairs.groupBy("prev_type", "curr_type").agg(F.count("*").alias("n"))
    totals = matrix.groupBy("prev_type").agg(F.sum("n").alias("t"))
    return (
        matrix.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "curr_type",
            "n",
            round6f(F.col("n") / F.col("t")).alias("p"),
        )
        .orderBy("prev_type", "curr_type")
    )
