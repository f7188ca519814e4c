"""Persisted IVF (inverted-file) ANN index — the amortized scale path.

`operators/similarity.ivf_ann` quantizes the corpus per query run; at
100 TB the coarse quantization is built ONCE and persisted as parquet
partitioned by centroid list, so a search touches only the probed
lists' directories (partition pruning) instead of re-scanning the
corpus. Layout:

    <root>/vectors/cent_id=<c>/   (vec_id, i, x, norm) exploded components
    <root>/centroids/             (cent_id, i, cx, cn)

Search joins the probed-list ids against the partitioned vectors
table; with a broadcastable probe side Spark's dynamic partition
pruning (DPP) skips unprobed directories at runtime — the plan carries
a `dynamicpruning` subquery on cent_id (asserted in tests). Search
cost is O(Q · nprobe · N/n_centroids) rows read, and the index build
is one corpus pass.

Centroids are the same deterministic pick as `ivf_ann` (vec_id <
n_centroids) so results are reproducible; a production deployment
swaps in offline-trained k-means centroids with the identical layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ureplicator_spark.operators.similarity import _components, norms


def build_ivf_index(
    embeddings: DataFrame, root: str, n_centroids: int = 8, trained: bool = False
) -> None:
    """One-pass index build: assign every vector to its nearest
    centroid list and persist components partitioned by list.

    ``trained=True`` swaps the deterministic vec_id<k pick for Lloyd
    k-means centroids (`operators/similarity.kmeans_centroids`) — the
    offline-trained coarse quantizer a production IVF deployment uses;
    balanced lists mean balanced partition directories, which is what
    keeps the probed-list read cost even at 100 TB."""
    comp = _components(embeddings)
    nrm = norms(embeddings)
    if trained:
        from ureplicator_spark.operators.similarity import kmeans_centroids

        cent = kmeans_centroids(embeddings, k=n_centroids)
        # floor the norm: a degenerate all-zero centroid (possible on
        # pathological inputs) must not inject NaN cosines
        ncent = cent.groupBy("cent_id").agg(
            F.greatest(
                F.sqrt(F.sum(F.col("cx") * F.col("cx"))), F.lit(1e-12)
            ).alias("cn")
        )
    else:
        cent = comp.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("cent_id"), "i", F.col("x").alias("cx")
        )
        ncent = nrm.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("cent_id"), F.col("norm").alias("cn")
        )
    cent.join(F.broadcast(ncent), "cent_id").write.mode("overwrite").parquet(
        root + "/centroids"
    )
    adot = (
        comp.join(F.broadcast(cent), "i")
        .groupBy("vec_id", "cent_id")
        .agg(F.sum(F.col("x") * F.col("cx")).alias("dot"))
    )
    ascore = (
        adot.join(F.broadcast(ncent), "cent_id")
        .join(nrm, "vec_id")
        .select(
            "vec_id",
            "cent_id",
            F.round(F.col("dot") / (F.col("norm") * F.col("cn")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("cent_id"))
    assign = (
        ascore.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cent_id")
    )
    (
        comp.join(nrm, "vec_id")
        .join(assign, "vec_id")
        .select("vec_id", "i", "x", "norm", "cent_id")
        .write.mode("overwrite")
        .partitionBy("cent_id")
        .parquet(root + "/vectors")
    )


def search_ivf_index(
    spark: SparkSession,
    root: str,
    queries: DataFrame,
    nprobe: int = 2,
    k: int = 3,
) -> DataFrame:
    """Top-k cosine ANN over the persisted index. ``queries`` is
    (vec_id, embedding); only the ``nprobe`` nearest lists per query
    are read (partition-pruned via the probe join)."""
    centroids = F.broadcast(spark.read.parquet(root + "/centroids"))
    vectors = spark.read.parquet(root + "/vectors")
    qc = _components(queries).select(
        F.col("vec_id").alias("q_id"), "i", F.col("x").alias("qx")
    )
    qn = norms(queries).select(F.col("vec_id").alias("q_id"), F.col("norm").alias("qn"))
    qdot = (
        qc.join(centroids, "i")
        .groupBy("q_id", "cent_id")
        .agg(F.sum(F.col("qx") * F.col("cx")).alias("dot"))
    )
    qscore = (
        qdot.join(centroids.select("cent_id", "cn").distinct(), "cent_id")
        .join(F.broadcast(qn), "q_id")
        .select(
            "q_id",
            "cent_id",
            F.round(F.col("dot") / (F.col("qn") * F.col("cn")), 6).alias("ccos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("ccos").desc(), F.col("cent_id"))
    probe = (
        qscore.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "cent_id")
    )
    # probe side is tiny (Q·nprobe rows) → broadcast; the join on the
    # partition column triggers DPP so unprobed cent_id dirs are skipped
    cand = vectors.join(F.broadcast(probe), "cent_id").filter(
        F.col("vec_id") != F.col("q_id")
    )
    cdot = (
        cand.join(F.broadcast(qc), ["q_id", "i"])
        .groupBy("q_id", F.col("vec_id").alias("c_id"))
        .agg(
            F.sum(F.col("qx") * F.col("x")).alias("dot"),
            F.first("norm").alias("cn2"),
        )
    )
    score = cdot.join(F.broadcast(qn), "q_id").select(
        "q_id",
        "c_id",
        F.round(F.col("dot") / (F.col("qn") * F.col("cn2")), 6).alias("cosine"),
    )
    w2 = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        score.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cosine", "rank")
    )
