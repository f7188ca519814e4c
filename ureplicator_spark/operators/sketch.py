"""Sketch operators — sub-linear-state approximations with
engine-exact register construction.

At 100 TB, exact COUNT(DISTINCT) over a high-cardinality column is a
full shuffle of the distinct key set; a HyperLogLog sketch replaces it
with a fixed 2^p-register state that merges associatively (map-side
partial agg, constant-size exchange). Spark ships
``approx_count_distinct`` (HLL++ under the hood), but its register
layout is engine-private — useless for cross-engine verification. The
point of this module is an HLL whose registers derive from the same
portable md5 arithmetic as the rest of the engine (`md5_long`), so a
SQL oracle reproduces the sketch REGISTER-FOR-REGISTER and the
estimate to the last rounded digit: the sketch itself is under the
hash gate, not just spot-checked.

Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm" (AofA 2007); the small-range
linear-counting correction over EMPTY registers follows the paper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ureplicator_spark.functions import md5_long, round6f, round6s

# 2^9 = 512 registers -> ~4.6% standard error; alpha_m per Flajolet'07
HLL_P = 9
HLL_M = 1 << HLL_P


def _registers(
    keyed: DataFrame, group_cols: list[str], key_col: str, m: int
) -> DataFrame:
    """Shared HLL register build: one shuffle on (groups..., bucket)
    with map-side partial MIN. Integer `div`, never a double division
    (h is 60-bit, beyond double's 2^53 exact-integer range); key_col
    must already be a string — cast numeric keys identically on both
    sides.

    The rank is computed AFTER the aggregation: rho = R+1 - bitlen(v)
    is strictly decreasing in bitlen and bitlen is monotone in v, so
    MAX(rho) over a bucket == rho(MIN(v)) — the pre-agg row stream
    carries a plain long and the string-allocating `bin()` runs on
    #groups x m register rows instead of every input row (measured
    ~0.2 s off the 600 k-row build at sf0.1). The oracle keeps the
    per-row form; the register values are provably identical."""
    n_rem_bits = 60 - (m.bit_length() - 1)
    hashed = keyed.withColumn("h", md5_long(F.col(key_col))).select(
        *group_cols, (F.col("h") % m).alias("j"), F.expr(f"h div {m}").alias("v")
    )
    regs = (
        hashed.groupBy(*group_cols, "j")
        .agg(F.min("v").alias("mv"))
    )
    rho = F.when(
        F.col("mv") > 0, F.lit(n_rem_bits + 1) - F.length(F.bin(F.col("mv")))
    ).otherwise(F.lit(n_rem_bits + 1))
    return regs.select(*group_cols, "j", rho.alias("mj"))


def _estimate(regs: DataFrame, group_cols: list[str], m: int):
    """Fold registers to (per-group df, estimate Column). The dyadic
    indicator sum is exact; linear counting runs over EMPTY registers
    (m - V), per Flajolet'07."""
    per_g = regs.groupBy(*group_cols).agg(
        F.count("*").alias("v_nonempty"),
        F.sum(F.pow(F.lit(2.0), -F.col("mj"))).alias("s_present"),
    )
    alpha = 0.7213 / (1 + 1.079 / m)
    s_total = (m - F.col("v_nonempty")) + F.col("s_present")
    raw = F.lit(alpha * m * m) / s_total
    est = F.when(
        (raw <= 2.5 * m) & (F.col("v_nonempty") < m),
        m * F.log(m / (m - F.col("v_nonempty"))),
    ).otherwise(raw)
    return per_g, est


def hll_gauge(
    keyed: DataFrame, group_col: str, key_col: str, m: int = HLL_M
) -> DataFrame:
    """Per-group approximate distinct-``key_col`` count via a portable
    HyperLogLog, reported against the exact count as a calibration
    gauge: ``(group, n_rows, v_nonempty, est_distinct, true_distinct,
    rel_error)``.

    Register construction (identical in any engine with md5 + bin):
    ``h = md5_long(key)`` (60 bits) -> bucket ``j = h % m``, remainder
    ``v = h div m``; rank ``rho = (60 - log2(m)) + 1 - bitlength(v)``
    via the minimal binary-string length (``bin``), so no float log
    touches the register path. Register ``M_j`` = max rho. The
    indicator sum ``S = (m - V) + sum(2^-M_j)`` is a sum of dyadic
    rationals — EXACT in doubles — so the raw estimate
    ``alpha * m^2 / S`` is one deterministic IEEE division per group.
    Small-range correction (raw <= 2.5m, some register empty) applies
    linear counting ``m * ln(m / #empty)``; estimates round to 4
    decimals so a last-ulp ``ln`` difference between engines cannot
    surface.

    Scale shape: one shuffle on (group, bucket) with map-side partial
    MIN (the rank derives per register — see _registers) — sketch
    state is #groups x m rows regardless of corpus size;
    everything after is group-cardinality-sized. The exact side (the
    gauge) is the COUNT(DISTINCT) the sketch exists to replace — drop
    it in production and the sketch's only corpus-sized cost is the
    map-side register build."""
    regs = _registers(keyed, [group_col], key_col, m)
    per_g, est = _estimate(regs, [group_col], m)

    exact = keyed.groupBy(group_col).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct(key_col).alias("true_distinct"),
    )
    est_r = round6f(est, 4)
    return (
        per_g.join(exact, group_col)
        .select(
            group_col,
            "n_rows",
            "v_nonempty",
            est_r.alias("est_distinct"),
            "true_distinct",
            round6s((est_r - F.col("true_distinct")) / F.col("true_distinct")).alias(
                "rel_error"
            ),
        )
        .orderBy(group_col)
    )


def hll_estimate(
    keyed: DataFrame, group_col: str, key_col: str, m: int = HLL_M
) -> DataFrame:
    """PRODUCTION shape of the per-group distinct estimate: register
    build + fold + estimate only — ``(group, v_nonempty,
    est_distinct)``. :func:`hll_gauge` pairs this with the exact
    COUNT(DISTINCT) the sketch exists to replace; that comparison is a
    verification gauge that doubles the work (the exact side shuffles
    the whole key set), so it lives in pytest while THIS is the shape
    a 100 TB pipeline actually runs: one corpus scan, one (group,
    bucket) shuffle with map-side partial MIN (rank derives per
    register afterwards — see _registers), #groups × m rows of
    state, group-cardinality-sized everything after."""
    regs = _registers(keyed, [group_col], key_col, m)
    per_g, est = _estimate(regs, [group_col], m)
    return per_g.select(
        group_col,
        "v_nonempty",
        round6f(est, 4).alias("est_distinct"),
    ).orderBy(group_col)


def hll_distinct_tokens(documents: DataFrame, m: int = HLL_M) -> DataFrame:
    """Per-source approximate distinct-token count (the fixture
    vocabulary is small, so this exercises the linear-counting
    regime; :func:`hll_gauge` over a key column exercises the raw-HLL
    regime)."""
    tok = documents.select(
        "source", F.explode(F.split("text", " ")).alias("token")
    )
    return hll_gauge(tok, "source", "token", m)


def hll_profile(df: DataFrame, cols: list[str], m: int = HLL_M) -> DataFrame:
    """Single-scan table profile with PORTABLE approx distinct counts:
    per column — null count, 6-dp min/max (numeric columns), and the
    md5-HLL distinct estimate (same register math as :func:`hll_gauge`,
    so a SQL oracle reproduces the sketch register-for-register —
    unlike native ``approx_count_distinct``, whose xxhash sketch is
    engine-private).

    Canonical hash input per type (verified byte-identical between
    Spark and DuckDB on every lineitem column): integers and strings
    cast/pass through directly; floating columns canonicalize through
    DECIMAL(28,6) (both engines print full scale, so the estimate
    counts values distinct at 6-dp precision); timestamps format as
    ``yyyy-MM-dd HH:mm:ss``. NULL cells hash to NULL and are excluded
    from the registers (COUNT DISTINCT semantics) but still feed the
    null counter.

    Scale shape — ONE corpus scan: a map-side |cols|-element struct
    explode (no string cast wider than the cell, no Expand), then a
    (col, register) aggregation whose map-side partial MIN/MAX bounds the
    shuffle at |cols| × (m+1) rows per input partition, then a |cols|-
    row fold. Contrast `table_profile`'s union-of-N exact branches
    (N jobs, one COUNT DISTINCT shuffle each): at 100 TB this is the
    profile you run first."""
    dtypes = dict(df.dtypes)
    # Melt by exploding the INDEX (a literal array) and computing the
    # cell AFTER the explode with a CASE on the index: Generate
    # re-evaluates its generator's child per OUTPUT row, so exploding
    # an array of computed (md5, cast) structs would hash every cell
    # |cols| times over (measured 10.5 s vs ~2 s at sf0.1); a CASE
    # evaluates only its matching branch, so each cell hashes once.
    canon_branches, num_branches, isn_branches, name_branches = [], [], [], []
    for i, c in enumerate(cols):
        t = dtypes[c]
        num_like = t in (
            "tinyint", "smallint", "int", "bigint", "float", "double"
        ) or t.startswith("decimal")
        if t in ("float", "double") or t.startswith("decimal"):
            canon = F.col(c).cast("decimal(28,6)").cast("string")
        elif t.startswith("timestamp") or t == "date":
            canon = F.date_format(F.col(c), "yyyy-MM-dd HH:mm:ss")
        else:
            canon = F.col(c).cast("string")
        cond = F.col("ci") == i
        name_branches.append((cond, F.lit(c)))
        canon_branches.append((cond, canon))
        isn_branches.append((cond, F.when(F.col(c).isNull(), 1).otherwise(0)))
        num_branches.append(
            (
                cond,
                F.col(c).cast("double") if num_like else F.lit(None).cast("double"),
            )
        )

    def _case(branches):
        expr = F.when(*branches[0])
        for cond, val in branches[1:]:
            expr = expr.when(cond, val)
        return expr

    # fan_out: one md5 per cell is CPU-heavy per row and the fact
    # table often scans as a handful of splits at fixture scale (the
    # shingling-path lesson — no-op once the scan is already wide)
    from ureplicator_spark.functions import fan_out

    melted = fan_out(df).select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(len(cols))])).alias("ci")
    ).select(
        _case(name_branches).alias("col_name"),
        md5_long(_case(canon_branches)).alias("h"),
        _case(isn_branches).alias("isn"),
        _case(num_branches).alias("num"),
    )
    n_rem_bits = 60 - (m.bit_length() - 1)
    # rank AFTER the aggregation: MAX(rho) over a bucket == rho(MIN(v))
    # (rho strictly decreasing in bitlen, bitlen monotone in v), so the
    # string-allocating bin() runs per REGISTER, not per cell — the
    # _registers trick, worth ~0.2 s on 6.6 M cells at sf0.1
    rho_of = lambda c: F.when(  # noqa: E731
        c > 0, F.lit(n_rem_bits + 1) - F.length(F.bin(c))
    ).otherwise(F.lit(n_rem_bits + 1))
    regs = (
        melted.select(
            "col_name",
            (F.col("h") % m).alias("j"),
            F.expr(f"h div {m}").alias("v"),
            "isn",
            "num",
        )
        .groupBy("col_name", "j")
        .agg(
            F.min("v").alias("mv"),
            F.sum("isn").alias("nn"),
            F.min("num").alias("mn"),
            F.max("num").alias("mx"),
        )
        .select("col_name", "j", rho_of(F.col("mv")).alias("mj"), "nn", "mn", "mx")
    )
    # NULL cells land in the j IS NULL register group: counted for
    # n_nulls, excluded from the estimate by the isNotNull guards.
    alpha = 0.7213 / (1 + 1.079 / m)
    per = regs.groupBy("col_name").agg(
        F.sum(F.when(F.col("j").isNotNull(), 1).otherwise(0)).alias("v_nonempty"),
        F.sum(
            F.when(F.col("j").isNotNull(), F.pow(F.lit(2.0), -F.col("mj")))
        ).alias("s_present"),
        F.sum("nn").cast("long").alias("n_nulls"),
        round6s(F.min("mn")).alias("min_num"),
        round6s(F.max("mx")).alias("max_num"),
    )
    raw = F.lit(alpha * m * m) / ((m - F.col("v_nonempty")) + F.col("s_present"))
    est = F.when(
        (raw <= 2.5 * m) & (F.col("v_nonempty") < m),
        m * F.log(m / (m - F.col("v_nonempty"))),
    ).otherwise(raw)
    return per.select(
        "col_name",
        "n_nulls",
        round6f(est, 4).alias("n_distinct_est"),
        "min_num",
        "max_num",
    ).orderBy("col_name")


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan, J.Alg 2005)
# ---------------------------------------------------------------------------

CMS_D = 4      # hash rows
CMS_W = 1024   # counters per row


def cms_topk_gauge(
    keyed: DataFrame,
    key_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
    top_n: int = 20,
) -> DataFrame:
    """Count-Min frequency sketch, gauged against exact counts for the
    exact top-``top_n`` keys: ``(key, true_count, est_count,
    overestimate)``. The estimate is ``min`` over ``d`` salted-hash
    counter rows — pure integer arithmetic end to end, so any engine
    reproduces the sketch counter-for-counter (no float anywhere, not
    even a rounded one).

    CMS guarantees est >= true with overestimate <= eN/w at
    probability 1 - (1/2)^d — the heavy-hitter / frequency oracle at
    100 TB where an exact per-key count table is itself corpus-sized.

    Scale shape: the sketch build is ONE shuffle on (row, bucket)
    after a d-way map-side explode — d*w counter rows of state total,
    independent of corpus size, merged associatively (map-side partial
    SUM). The gauge side computes exact counts (the thing the sketch
    replaces); production keeps only the build + broadcast-join
    probes."""
    from ureplicator_spark.caching import pin

    # The sketch build and the exact gauge are the only two consumers
    # of the (typically explode-derived) key scan; pinned, the corpus
    # tokenization runs once and the second consumer reads the cache
    # instead of re-splitting every document.
    keyed = pin(keyed)

    # Explode LITERAL row ids and hash AFTER the explode: Generate
    # re-evaluates its generator child per output row, so exploding an
    # array of computed (r, md5 % w) structs hashed every key d×d
    # times instead of d (the hll_profile melt lesson — measured ~4×
    # on this query's hash stage at sf0.1). Literal structs re-evaluate
    # for free; the per-row md5 runs once per (key, r).
    rows_lit = F.array(*[F.lit(r) for r in range(d)])

    def _probed(df):
        r = F.col("r")
        salt = F.concat(F.lit("cms"), r.cast("string"), F.lit(":"), F.col(key_col))
        b = (
            F.conv(F.substring(F.md5(salt), 1, 15), 16, 10).cast("long") % w
        ).alias("b")
        return df.select(*df.columns, F.explode(rows_lit).alias("r")).select(
            *df.columns, "r", b
        )

    hashed = _probed(keyed).select("r", "b")
    counters = hashed.groupBy("r", "b").agg(F.count("*").alias("cnt"))

    exact = keyed.groupBy(key_col).agg(F.count("*").alias("true_count"))
    wtop = Window.orderBy(F.col("true_count").desc(), key_col)
    top = (
        exact.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= top_n)
        .drop("rn")
    )
    top_probed = _probed(top).select(key_col, "true_count", "r", "b")
    est = (
        top_probed.join(F.broadcast(counters), ["r", "b"])
        .groupBy(key_col, "true_count")
        .agg(F.min("cnt").alias("est_count"))
    )
    return est.select(
        key_col,
        "true_count",
        "est_count",
        (F.col("est_count") - F.col("true_count")).alias("overestimate"),
    ).orderBy(F.col("true_count").desc(), key_col)


def cms_estimate(
    keyed: DataFrame,
    probes: DataFrame,
    key_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """PRODUCTION shape of the Count-Min sketch: build the d×w counter
    table from ``keyed`` and answer point queries for the keys in
    ``probes`` — ``(key, est_count)``. :func:`cms_topk_gauge` pairs
    the sketch with exact per-key counts (the corpus-sized table the
    sketch exists to replace); that gauge lives in pytest, while this
    is the query a pipeline runs: frequency estimates for a bounded
    probe set against constant sketch state.

    Scale shape: counter build is ONE shuffle on (row, bucket) after a
    d-way literal explode — d·w rows of state regardless of corpus
    size, merged associatively (map-side partial SUM). The counter
    table is broadcast to the probe side (4096 rows by construction),
    so probing is map-only per probe key. Pure integer arithmetic end
    to end — any engine reproduces the answer counter-for-counter."""
    rows_lit = F.array(*[F.lit(r) for r in range(d)])

    def _probed(df):
        # literal explode first, hash after: Generate re-evaluates its
        # generator child per output row (the cms_topk_gauge lesson)
        salt = F.concat(
            F.lit("cms"), F.col("r").cast("string"), F.lit(":"), F.col(key_col)
        )
        b = (
            F.conv(F.substring(F.md5(salt), 1, 15), 16, 10).cast("long") % w
        ).alias("b")
        return df.select(*df.columns, F.explode(rows_lit).alias("r")).select(
            *df.columns, "r", b
        )

    counters = (
        _probed(keyed).select("r", "b").groupBy("r", "b").agg(
            F.count("*").alias("cnt")
        )
    )
    # LEFT join + COALESCE 0: a probe key absent from `keyed` hits
    # empty buckets that have no counter row; an inner join would
    # either overestimate (MIN over < d counters) or drop the key
    # entirely, where a Count-Min point query must answer 0.
    return (
        _probed(probes.select(key_col).distinct())
        .join(F.broadcast(counters), ["r", "b"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est_count"))
        .orderBy(key_col)
    )


# ---------------------------------------------------------------------------
# Bloom filter as data (portable bit set; Bloom, CACM 1970)
# ---------------------------------------------------------------------------

BLOOM_M = 4096  # bits
BLOOM_K = 3     # hashes


def bloom_contamination(
    documents: DataFrame, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """Decontamination by Bloom membership: the benchmark set's
    word-3-gram shingles (docs 0-9, the `benchmark_contamination`
    convention) are folded into an ``m``-bit Bloom filter; corpus
    shingles (docs >= 10) probe it. Per corpus doc: shingle count,
    Bloom-flagged count, exact hit count, and the false-positive
    surplus — the gauge that prices the bit budget.

    Why a Bloom instead of the exact benchmark-shingle broadcast the
    exact query uses: the bit set is CONSTANT-SIZE (m bits) however
    large the held-out benchmark grows, so the probe side broadcasts
    a set of at most m bit positions, never the benchmark corpus.
    All bit positions are salted-md5 integers — engine-exact.

    Scale shape: TWO phases. Phase 1 folds the benchmark's salted bit
    positions into the m-bit filter and collects it to the driver —
    an <= m-row reduction (CONSTANT-size model state however large
    the benchmark, the lang-model/BPE precedent). Phase 2 ships the
    bitmask as a LITERAL array of m/64 longs inside the probe plan:
    each corpus shingle computes its k salted-md5 bits and tests them
    against the mask map-side (shiftright + AND — whole-stage
    codegen), the exact-hit check is a broadcast left join on the
    deduplicated benchmark shingles, and ALL THREE per-doc counts
    (total / Bloom-flagged / exact) come out of ONE groupBy(doc_id)
    with map-side partial aggregation. One shuffle total. The
    previous shape (k-way explode -> bit equi-join -> (doc_id,
    shingle) re-aggregate -> three per-doc groupBys) measured 4.2x
    the columnar oracle at sf0.1; the row blowup and the extra
    exchanges were the entire gap.

    No pin: each side of the split is consumed exactly ONCE now
    (phase 1 reduces the benchmark docs, phase 2 streams the corpus
    straight into the single aggregate), so caching the shingle view
    would only add a materialize+read round trip. The benchmark side
    shingles a doc_id < 10 scan — parquet min/max pruning keeps that
    to a handful of row groups."""
    from ureplicator_spark.caching import pin
    from ureplicator_spark.operators.dedup import shingles

    # shingles() is DISTINCT (doc_id, shingle) by construction.
    # bench is pinned: it feeds phase 1 (bit fold) and phase 2 (the
    # exact-hit join) as two separate jobs — unpinned, each re-scans
    # and re-shingles the benchmark row group. The pin holds the
    # AGGREGATED shingle set (post-distinct), not the corpus.
    bench = pin(
        shingles(documents.filter(F.col("doc_id") < 10))
        .select("shingle")
        .distinct()
    )
    corpus = shingles(documents.filter(F.col("doc_id") >= 10)).select(
        "doc_id", "shingle"
    )

    def bit_col(j: int):
        salt = F.concat(F.lit(f"bloom{j}:"), F.col("shingle"))
        return F.conv(F.substring(F.md5(salt), 1, 15), 16, 10).cast("long") % m

    # Phase 1: ONE scan — the k salted bits explode AFTER the distinct
    # aggregate, never before it. (A k-way union of per-bit selects
    # re-scans the parquet k times, and the text-column decode of the
    # benchmark row group dominated the whole query — measured ~3×
    # the scan cost at sf0.1. The Generate re-evaluation caveat — the
    # cms/hll melt lesson — is k×k md5s over the POST-aggregate
    # shingle set, a few thousand rows, not the corpus.)
    bits_df = bench.select(
        F.explode(F.array(*[bit_col(j) for j in range(k)])).alias("bit")
    ).distinct()
    words = [0] * (m // 64)
    for r in bits_df.collect():
        words[r["bit"] >> 6] |= 1 << (r["bit"] & 63)
    # two's-complement fold into signed 64-bit (LongType range)
    mask_lit = F.array(
        *[F.lit(w - (1 << 64) if w >= (1 << 63) else w) for w in words]
    )

    # Phase 2: map-side membership + one broadcast join + one groupBy.
    # No explicit broadcast hint on the exact-hit side: bench is the
    # deduplicated benchmark shingle set — AQE broadcasts it at
    # runtime from its measured size, and a programmer hint on a
    # distinct() is exactly what the 100 TB broadcast guard rejects
    # (it cannot prove the reduction bounded).
    probed = corpus.join(
        bench.withColumn("hit", F.lit(1)), "shingle", "left"
    ).select(
        "doc_id",
        "hit",
        mask_lit.alias("mask"),
        *[bit_col(j).alias(f"b{j}") for j in range(k)],
    )
    flag = F.expr(
        " AND ".join(
            f"((shiftright(element_at(mask, CAST(b{j} DIV 64 AS INT) + 1),"
            f" CAST(b{j} % 64 AS INT)) & 1) = 1)"
            for j in range(k)
        )
    )
    return (
        probed.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(flag.cast("long")).alias("n_flagged"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_exact"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_flagged",
            "n_exact",
            (F.col("n_flagged") - F.col("n_exact")).alias("false_positives"),
        )
        .orderBy("doc_id")
    )


def hll_rolling_distinct(
    keyed: DataFrame, window: int = 7, m: int = HLL_M
) -> DataFrame:
    """Rolling-window distinct counting by HLL REGISTER MERGE — the
    property exact COUNT(DISTINCT) fundamentally lacks: distinct
    counts don't roll up (7 daily counts can't produce the weekly
    count), but HLL registers do (register-wise MAX is the union
    sketch). Input ``keyed`` = ``(day BIGINT, k STRING)``; output per
    day: the estimated distinct keys over ``[day-window+1, day]``,
    gauged against the exact rolling count.

    Scale shape: the raw corpus is touched ONCE (the daily register
    build, one (day, bucket) shuffle); every rolling window is then a
    register-table self-merge bounded by #days x window x m rows —
    this is exactly how OLAP cubes ship re-aggregable distinct counts.
    The exact gauge side re-scans per window (the cost being avoided);
    drop it in production."""
    regs = _registers(keyed, ["day"], "k", m).select(
        F.col("day").alias("rday"), "j", "mj"
    )
    days = regs.select(F.col("rday").alias("day")).distinct()
    merged = (
        days.join(
            regs,
            (F.col("rday") <= F.col("day"))
            & (F.col("rday") >= F.col("day") - (window - 1)),
        )
        .groupBy("day", "j")
        .agg(F.max("mj").alias("mj"))
    )
    per_day, est = _estimate(merged, ["day"], m)

    kd = keyed.select(F.col("day").alias("kday"), "k")
    exact = (
        days.join(
            kd,
            (F.col("kday") <= F.col("day"))
            & (F.col("kday") >= F.col("day") - (window - 1)),
        )
        .groupBy("day")
        .agg(F.countDistinct("k").alias("true_distinct"))
    )
    est_r = round6f(est, 4)
    return (
        per_day.join(exact, "day")
        .select(
            "day",
            "v_nonempty",
            est_r.alias("est_distinct"),
            "true_distinct",
            round6s((est_r - F.col("true_distinct")) / F.col("true_distinct")).alias(
                "rel_error"
            ),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram quantiles (the metrics-pipeline standard:
# mergeable bucket counts; Prometheus-style, exact formulas)
# ---------------------------------------------------------------------------

HIST_B = 256


def histogram_quantiles(
    keyed: DataFrame,
    group_col: str,
    value_col: str,
    b: int = HIST_B,
) -> DataFrame:
    """Quantile estimation from a fixed-width histogram, gauged
    against the exact percentile: ``(group, q, est_value,
    exact_value, n_rows)`` for q in {50, 95, 99}.

    Why this over a KLL/t-digest sketch: those compactors are
    ORDER-DEPENDENT (two engines disagree on the same data), while
    fixed-width bucket counts are pure integers over a deterministic
    bucket function — mergeable across partitions/windows AND
    engine-exact, which is why metrics pipelines standardized on
    histograms. Bucket index ``least(b-1, floor((v-min)/(max-min)*b))``
    is one deterministic IEEE chain; rank targets are integer
    ``ceil(n*q/100)``; the estimate is the midpoint of the first
    bucket whose cumulative count reaches the target (error bounded
    by bucket width — report alongside the exact value to price it).

    Scale shape: two grouped passes over the fact (min/max/count,
    then bucket counts — b rows per group of state, mergeable); the
    cumulative window runs over b-row groups, never raw rows."""
    from ureplicator_spark.functions import round6s, values_df

    spark = keyed.sparkSession
    g, v = F.col(group_col), F.col(value_col)

    # exact gauge percentiles via EXPLICIT order-statistic
    # interpolation — both engines evaluate the identical formula
    # a + (b - a)·(rem/100) from the same order stats, instead of
    # relying on F.percentile / quantile_cont whose internal
    # interpolation formulas need not agree ulp-for-ulp (the
    # workload_percentiles lesson applied to a double-typed column,
    # where integer fixed-point is unavailable)
    wg = Window.partitionBy(group_col)
    ranked = keyed.select(
        g,
        v.alias("val"),
        F.row_number().over(wg.orderBy(v)).alias("rn"),
        F.count("*").over(wg).alias("n"),
    )

    def _ex_aggs(p: int) -> list:
        lo = F.expr(f"(n - 1) * {p} div 100")
        rem = F.expr(f"(n - 1) * {p} % 100")
        return [
            F.max(F.when(F.col("rn") == lo + 1, F.col("val"))).alias(f"a{p}"),
            F.max(F.when(F.col("rn") == lo + 2, F.col("val"))).alias(f"b{p}"),
            F.max(rem).alias(f"r{p}"),
        ]

    def _ex(p: int):
        interp = (F.col(f"b{p}") - F.col(f"a{p}")) * (
            F.col(f"r{p}").cast("double") / 100.0
        )
        return round6s(F.col(f"a{p}") + F.coalesce(interp, F.lit(0.0))).alias(
            f"ex{p}"
        )

    stats = (
        ranked.groupBy(group_col)
        .agg(
            F.min("val").alias("mn"),
            F.max("val").alias("mx"),
            F.count("*").alias("n_rows"),
            *_ex_aggs(50),
            *_ex_aggs(95),
            *_ex_aggs(99),
        )
        .select(group_col, "mn", "mx", "n_rows", _ex(50), _ex(95), _ex(99))
    )
    idx = F.when(
        F.col("mx") > F.col("mn"),
        F.least(
            F.lit(b - 1),
            F.floor((v - F.col("mn")) / (F.col("mx") - F.col("mn")) * b).cast("int"),
        ),
    ).otherwise(F.lit(0))
    hist = (
        keyed.join(F.broadcast(stats.select(group_col, "mn", "mx")), group_col)
        .select(group_col, idx.alias("idx"))
        .groupBy(group_col, "idx")
        .agg(F.count("*").alias("c"))
    )
    wc = (
        Window.partitionBy(group_col)
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(wc))

    qs = values_df(spark, [(50,), (95,), (99,)], "q int")
    targets = stats.crossJoin(F.broadcast(qs)).select(
        group_col,
        "q",
        "mn",
        "mx",
        "n_rows",
        F.expr("(n_rows * q + 99) div 100").alias("rank_q"),
        F.when(F.col("q") == 50, F.col("ex50"))
        .when(F.col("q") == 95, F.col("ex95"))
        .otherwise(F.col("ex99"))
        .alias("exact_value"),
    )
    picked = (
        targets.join(cum, group_col)
        .filter(F.col("cum") >= F.col("rank_q"))
        .groupBy(group_col, "q", "mn", "mx", "n_rows", "exact_value")
        .agg(F.min("idx").alias("pick"))
    )
    est = round6s(
        F.col("mn")
        + (F.col("pick") + 0.5) * (F.col("mx") - F.col("mn")) / b
    )
    return picked.select(
        group_col, "q", est.alias("est_value"), "exact_value", "n_rows"
    ).orderBy(group_col, "q")


# ---------------------------------------------------------------------------
# KMV (k minimum values) — the distinct synopsis that supports set
# INTERSECTION estimation, which HLL's monotone registers cannot.
# ---------------------------------------------------------------------------

KMV_K = 64


def kmv_registers(
    keyed: DataFrame, group_col: str, key_col: str, k: int = KMV_K
) -> DataFrame:
    """Per-group KMV synopsis (Beyer et al., SIGMOD'07): the ``k``
    smallest distinct 60-bit md5 hashes of ``key_col`` → (group, h, r).

    Uniform hashes make the k-th smallest an order statistic of the
    distinct-value count, and — unlike HLL registers — the synopsis
    members themselves are comparable across groups, which is what
    enables union/intersection/Jaccard estimation between synopses.

    Scale shape: one (group, h) distinct shuffle (map-side combine),
    then a per-group ascending rank truncated at k. At corpus scale
    the standard refinement is a static hash prefilter
    (``h < 2^60 * f`` with f sized so expected survivors >> k) so the
    rank window's input is tiny; the fixture leaves it off so the
    oracle stays a plain window."""
    distinct = (
        keyed.select(group_col, md5_long(F.col(key_col)).alias("h"))
        .groupBy(group_col, "h")
        .agg(F.lit(1).alias("_one"))
        .select(group_col, "h")
    )
    w = Window.partitionBy(group_col).orderBy("h")
    return (
        distinct.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .select(group_col, "h", "r")
    )


def kmv_pairwise_estimates(
    regs: DataFrame, group_col: str, k: int = KMV_K
) -> DataFrame:
    """Pairwise union/Jaccard/intersection estimates from a synopsis
    table (group, h) — shared by the batch overlap query and the
    streaming synopsis view (`streaming/sketches.kmv_pair_estimates`)
    so the estimator cannot drift between them. Per pair: the k
    smallest union hashes; D(A∪B) = (k-1)·2^60/h_k (exact count when
    the union synopsis never fills), Jaccard = |both|/|synopsis|,
    intersection = Jaccard · D(A∪B). Operates on synopsis rows only —
    G²·2k worst case, broadcast-sized for any real group count."""
    ra = regs.select(
        F.col(group_col).alias("src_a"), "h", F.lit(1).alias("in_a"),
        F.lit(0).alias("in_b"),
    )
    rb = regs.select(
        F.col(group_col).alias("src_b"), "h", F.lit(0).alias("in_a"),
        F.lit(1).alias("in_b"),
    )
    srcs = regs.groupBy(group_col).agg(F.count("*").alias("_n")).select(group_col)
    pairs = (
        srcs.select(F.col(group_col).alias("src_a"))
        .crossJoin(srcs.select(F.col(group_col).alias("src_b")))
        .filter(F.col("src_a") < F.col("src_b"))
    )
    merged = (
        pairs.join(F.broadcast(ra), "src_a")
        .unionByName(pairs.join(F.broadcast(rb), "src_b"))
        .groupBy("src_a", "src_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wk = Window.partitionBy("src_a", "src_b").orderBy("h")
    kept = merged.withColumn("r", F.row_number().over(wk)).filter(F.col("r") <= k)
    per_pair = kept.groupBy("src_a", "src_b").agg(
        F.count("*").cast("long").alias("n_synopsis"),
        F.max("h").alias("hk"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
    )
    u = F.when(
        F.col("n_synopsis") < k, F.col("n_synopsis").cast("double")
    ).otherwise(F.lit(float(k - 1) * float(1 << 60)) / F.col("hk"))
    j = F.col("n_both") / F.col("n_synopsis")
    return per_pair.select(
        "src_a",
        "src_b",
        "n_synopsis",
        round6f(u, 4).alias("union_est"),
        round6f(j).alias("jaccard_est"),
        round6f(j * u, 4).alias("inter_est"),
    )


def kmv_source_overlap(documents: DataFrame, k: int = KMV_K) -> DataFrame:
    """Estimated pairwise content overlap between document sources
    from KMV synopses over word-3-gram shingles — the dedup-planning
    view that prices a cross-source dedup run BEFORE paying for it
    (sources with near-zero estimated intersection need no joint
    pass). Per source pair: D(A∪B) ≈ (k-1) · 2^60 / h_k over the k
    smallest union hashes (exact count when the union synopsis is
    smaller than k), Jaccard ≈ |both ∩ union-synopsis| / |synopsis|,
    intersection ≈ Jaccard · D(A∪B).

    SYNOPSIS-ONLY: this is the production query — it never computes
    the exact COUNT(DISTINCT) overlap joins the sketch exists to
    replace (r7 verdict: shipping that calibration harness inside the
    query was 4.6× its oracle and exactly the O(corpus²-ish) work the
    estimator avoids). The exact-gauge twin lives in
    :func:`kmv_source_overlap_gauged`, exercised by the calibration
    pytest only.

    Scale shape: synopses are G·k rows; everything pairwise operates
    on synopsis rows only (G² · 2k worst case — G is source
    cardinality, a handful), so after the one shingle-distinct shuffle
    the whole estimator is broadcast-sized. Estimation arithmetic is
    one IEEE division + one multiply from exact integers, so any
    engine reproduces the rounded estimates."""
    from ureplicator_spark.operators.dedup import shingles

    return kmv_overlap_from_shingles(shingles(documents), documents, k)


def kmv_overlap_from_shingles(
    shingle_view: DataFrame, documents: DataFrame, k: int = KMV_K
) -> DataFrame:
    """The estimator half of :func:`kmv_source_overlap` over an
    ALREADY-BUILT distinct (doc_id, shingle) view — split out so the
    standing MinHash index's persisted shingle arrays feed it
    (exploding a persisted array column is a map-only projection;
    re-tokenizing the corpus is the cost amortized into the index
    build). Output equal by construction: the distinct per-doc shingle
    view is the same set either way."""
    src = documents.select("doc_id", "source")
    keyed = shingle_view.join(src, "doc_id").select("source", "shingle")
    regs = kmv_registers(keyed, "source", "shingle", k)
    return kmv_pairwise_estimates(regs, "source", k).orderBy("src_a", "src_b")


def kmv_source_overlap_gauged(documents: DataFrame, k: int = KMV_K) -> DataFrame:
    """Calibration twin of :func:`kmv_source_overlap`: the same
    synopsis estimates joined with the EXACT distinct-shingle overlap
    counts (``true_union``, ``true_inter``) — the COUNT(DISTINCT)
    joins production drops. Test-only: the exact intersection join is
    corpus-sized work; it exists to pin the estimator's error on
    fixtures, never to run at scale."""
    from ureplicator_spark.operators.dedup import shingles

    sh = shingles(documents)
    src = documents.select("doc_id", "source")
    keyed = sh.join(src, "doc_id").select("source", "shingle")
    regs = kmv_registers(keyed, "source", "shingle", k)
    est = kmv_pairwise_estimates(regs, "source", k)

    dsh = keyed.groupBy("source", "shingle").agg(F.lit(1).alias("_one"))
    dcnt = dsh.groupBy("source").agg(F.count("*").alias("d"))
    inter = (
        dsh.select(F.col("source").alias("src_a"), "shingle")
        .join(dsh.select(F.col("source").alias("src_b"), "shingle"), "shingle")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("long").alias("true_inter"))
    )
    da = dcnt.select(F.col("source").alias("src_a"), F.col("d").alias("da"))
    db = dcnt.select(F.col("source").alias("src_b"), F.col("d").alias("db"))
    return (
        est.join(inter, ["src_a", "src_b"], "left")
        .join(F.broadcast(da), "src_a")
        .join(F.broadcast(db), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_synopsis",
            "union_est",
            "jaccard_est",
            "inter_est",
            (
                F.col("da") + F.col("db") - F.coalesce("true_inter", F.lit(0))
            ).cast("long").alias("true_union"),
            F.coalesce("true_inter", F.lit(0)).cast("long").alias("true_inter"),
        )
        .orderBy("src_a", "src_b")
    )


# ---------------------------------------------------------------------------
# HDR-histogram quantile sketch (Tene, HdrHistogram.org — log-bucketed
# integer histogram with bounded RELATIVE error; the mergeable
# quantile-sketch family member, r10 verdict task #2)
# ---------------------------------------------------------------------------

HDR_M_BITS = 5  # sub-bucket precision: relative error <= 2^-5 ~ 3.1%


def hdr_bucket_key(v, m: int = HDR_M_BITS):
    """HDR bucket key for a non-negative integer column ``v``: values
    below 2^m are EXACT (key = v); above, key = (e << m) | top-m
    mantissa bits with e = floor(log2 v). Pure integer/string ops —
    floor-log2 via ``length(bin(v)) - 1``, never a double log whose
    libm could disagree across engines at power-of-two boundaries.
    Key is monotone non-decreasing in v, so rank walks stay ordered."""
    e = (F.length(F.bin(v)) - 1).cast("int")
    big = (
        F.call_function("shiftleft", e.cast("long"), F.lit(m))
        + F.call_function("shiftright", v, e - F.lit(m))
        - F.lit(1 << m)
    )
    return F.when(v < F.lit(1 << m), v).otherwise(big)


def hdr_bucket_bounds(key, m: int = HDR_M_BITS):
    """(lo, hi) integer value bounds of an HDR bucket key. Bucket width
    is 2^(e-m), so (hi - lo + 1) / lo <= 2^-m — the relative-error
    guarantee a quantile read inherits."""
    e = F.call_function("shiftright", key, F.lit(m)).cast("int")
    rem = key - F.call_function("shiftleft", e.cast("long"), F.lit(m))
    width = F.call_function("shiftleft", F.lit(1).cast("long"), e - F.lit(m))
    lo_big = F.call_function("shiftleft", rem + F.lit(1 << m), e - F.lit(m))
    small = key < F.lit(1 << m)
    lo = F.when(small, key).otherwise(lo_big)
    hi = F.when(small, key).otherwise(lo_big + width - 1)
    return lo, hi


def hdr_registers(
    df: DataFrame, value_col: str, group_cols: list[str], m: int = HDR_M_BITS
) -> DataFrame:
    """Per-group HDR registers ``(groups..., bucket_key, cnt)`` — ONE
    shuffle on (groups, bucket) with map-side partial COUNT; at most
    ~(64-m)·2^m + 2^m buckets per group however large the corpus, and
    registers MERGE by plain SUM on bucket_key (append ≡ rebuild is
    exact, not approximate — pinned in tests/test_gauge_parity.py).
    This is the 100 TB shape `workload_percentiles`' exact per-group
    sort cannot take: sketch state is constant-size per group and the
    merge is associative, so partial registers flow through map-side
    combine like any SUM."""
    v = F.col(value_col).cast("long")
    return (
        df.groupBy(*group_cols, hdr_bucket_key(v, m).alias("bucket_key"))
        .agg(F.count("*").alias("cnt"))
    )


def hdr_quantiles(
    regs: DataFrame,
    group_cols: list[str],
    percentiles: tuple[int, ...] = (50, 95, 99),
    m: int = HDR_M_BITS,
) -> DataFrame:
    """Nearest-rank quantile reads off HDR registers: for integer
    percentile p, the answer is the hi bound of the first bucket whose
    cumulative count reaches rank ceil(p·n/100) — compared in exact
    integer cross-multiplied form (100·cum >= p·n), no doubles
    anywhere, so any engine reproduces the estimate bit-for-bit. The
    window runs over REGISTER rows (bounded per group), not data."""
    word = Window.partitionBy(*group_cols).orderBy("bucket_key")
    wall = Window.partitionBy(*group_cols)
    _, hi = hdr_bucket_bounds(F.col("bucket_key"), m)
    cum = (
        regs.withColumn("cum", F.sum("cnt").over(word))
        .withColumn("n", F.sum("cnt").over(wall))
        .withColumn("hi", hi)
    )
    aggs = [F.max("n").alias("n_records"), F.count("*").alias("n_buckets")]
    for p in percentiles:
        aggs.append(
            F.min(
                F.when(F.col("cum") * 100 >= F.col("n") * p, F.col("hi"))
            ).alias(f"p{p}_est")
        )
    return cum.groupBy(*group_cols).agg(*aggs)
