"""End-to-end corpus curation pipeline — the composed "user story"
query: quality gates → exact dedup → fuzzy keep-best → per-source
yield report.

Each stage is an existing oracle-gated operator; this module only
wires them in the order a real pretraining-data pipeline runs them
and accounts for what every stage dropped. The composition stays
fully declarative (one Spark job graph per stage family), so Catalyst
still sees and optimizes the whole lineage; the only iterative piece
is the connected-components fixpoint inside ``duplicate_clusters``.

Scale: every stage's shape is the one audited in PLAN_REPORT.md for
its standalone query — gates are per-doc aggregations, exact dedup is
one digest shuffle, fuzzy runs on the LSH candidate set only, and the
final report is a per-source rollup. Nothing in the composition adds
a corpus-sized join that the parts didn't already have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ureplicator_spark.caching import pin

from ureplicator_spark.operators.dedup import (
    duplicate_clusters,
    exact_dedup_groups,
    keep_best_per_cluster,
    lsh_candidate_pairs,
)
from ureplicator_spark.operators.text import repetition_stats


def quality_gate_ok(documents: DataFrame) -> DataFrame:
    """(doc_id, ok): the pass/fail bit of the four pretraining gates
    (same rules and rounding as ``quality_gate_summary``)."""
    stats = repetition_stats(documents, include_3gram=False)
    ok = (
        (F.col("n_tokens") >= 10)
        & (F.col("n_tokens") <= 2000)
        & (F.col("top_token_share") <= 0.2)
        & (F.col("dup_2gram_share") <= 0.3)
    )
    return stats.select("doc_id", ok.alias("ok"))


def curation_pipeline_report(
    documents: DataFrame, jaccard_threshold: float = 0.5
) -> DataFrame:
    """Per-source accounting of the full curation funnel:

    n_input → (quality gates) → (exact dedup, min-id keeper) →
    (MinHash-LSH clusters, longest-doc keeper) → n_final + token
    yield. The numbers a data lead actually reviews before a training
    run: how much each source contributes and where its documents
    were lost."""
    # The gate + exact-dedup SURVIVOR ID SETS feed many downstream
    # branches (LSH signing, keep-best sizing, the final anti-join,
    # three per-source rollups). Persist exactly those narrow id sets:
    # each branch then re-reads the parquet scan (cheap, pruned) joined
    # against a cached key list instead of re-running the
    # repetition-stats gating pipeline per branch. Persisting the WIDE
    # gated/exsurv frames instead is a trap — materializing full text
    # columns into the columnar cache costs more than the recompute it
    # saves (measured 44 s -> 72 s at sf0.1; narrow-id persist wins).
    ok_ids = pin(quality_gate_ok(documents).filter(F.col("ok")).select("doc_id"))
    gated = documents.join(ok_ids, "doc_id")
    # exact stage: keep the min-doc_id representative of each digest
    keeper_ids = pin(
        exact_dedup_groups(gated).select(F.col("keeper_doc_id").alias("doc_id"))
    )
    exsurv = gated.join(keeper_ids, "doc_id")
    # fuzzy stage: longest-doc keeper per LSH cluster
    pairs = lsh_candidate_pairs(exsurv).filter(
        F.col("est_jaccard") >= jaccard_threshold
    )
    clusters = duplicate_clusters(pairs)
    best = keep_best_per_cluster(exsurv, clusters)
    dropped = (
        clusters.join(best.select("cluster_id", "kept_doc"), "cluster_id")
        .filter(F.col("doc_id") != F.col("kept_doc"))
        .select("doc_id")
    )

    n_tok = (
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    )
    # Funnel accounting in ONE corpus pass (r13, guide §2.4): the four
    # per-source rollups each re-scanned documents and re-derived
    # gated/exsurv from the pinned id sets (4 scans + 5 id joins + an
    # anti-join + 4 aggregates + 3 result joins). Every count is a
    # predicate over membership in the three narrow id sets, so tag
    # each document with left-join flags and aggregate once — a LINEAR
    # chain (scan → 3 id joins → 1 aggregate), not a branching reuse
    # shape, so nothing is recomputed and nothing depends on exchange
    # reuse. Set algebra: keeper_ids ⊆ ok_ids by construction and
    # clusters emit one row per doc_id, so the flags compose exactly:
    # gated = _g, exact = _g ∧ _e, final = exact ∧ ¬dropped.
    flags = (
        documents.join(ok_ids.withColumn("_g", F.lit(1)), "doc_id", "left")
        .join(keeper_ids.withColumn("_e", F.lit(1)), "doc_id", "left")
        .join(dropped.withColumn("_d", F.lit(1)), "doc_id", "left")
    )
    is_g = F.col("_g").isNotNull()
    is_e = is_g & F.col("_e").isNotNull()
    is_f = is_e & F.col("_d").isNull()
    report = flags.groupBy("source").agg(
        F.count("*").alias("n_input"),
        F.count(F.when(is_g, 1)).alias("n_gated"),
        F.count(F.when(is_e, 1)).alias("n_exact"),
        F.count(F.when(is_f, 1)).alias("n_final"),
        F.sum(F.when(is_f, n_tok)).alias("tokens_final"),
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0))
    return report.select(
        "source",
        "n_input",
        (F.col("n_input") - z("n_gated")).alias("n_gate_fail"),
        (z("n_gated") - z("n_exact")).alias("n_exact_dropped"),
        (z("n_exact") - z("n_final")).alias("n_fuzzy_dropped"),
        z("n_final").alias("n_final"),
        F.coalesce(F.col("tokens_final"), F.lit(0)).alias("tokens_final"),
    ).orderBy("source")
