"""Persisted IVF-PQ index — compressed ANN at corpus scale.

The FAISS IVFPQ architecture (Jégou et al., TPAMI'11 §V) re-expressed
as parquet + DataFrame ops: a coarse quantizer splits the corpus into
inverted lists, each vector's RESIDUAL from its coarse centroid is
product-quantized, and only the m·log2(k)-bit code survives — the
float corpus is not needed at search time at all. A search probes the
``nprobe`` nearest lists (partition-pruned directory reads), builds a
per-list lookup table from the query residual, and sums m table
entries per candidate.

Layout:

    <root>/coarse/                 (cent_id, i, c)     integer centroid components
    <root>/codebook/               (sub, code, i, c)   integer PQ codewords (residual domain)
    <root>/codes/cent_id=<list>/   (vec_id, codes array<int>)

Everything is integer-exact (round(x·qscale) components, exact
squared-L2, floor-div centroid updates) — the same determinism
discipline as ``operators/similarity.kmeans_clusters`` — so tests can
pin results against an oblivious NumPy reference bit-for-bit.

Scale notes: the codebook is m·k·(dim/m) rows and the coarse table
n_centroids·dim rows — both broadcast. The build's only corpus-sized
exchanges are the coarse argmin and the per-(vec, sub) code argmin;
the search reads ONLY probed list directories (asserted via the
``dynamicpruning``/partition-filter plan test) and its one shuffle is
the per-(query, candidate) ADC sum over probed-list rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ureplicator_spark.functions import round6s


def _int_components(embeddings: DataFrame, qscale: int) -> DataFrame:
    """(vec_id, i, q): 1-based integer-quantized component view."""
    return embeddings.select(
        "vec_id", F.posexplode("embedding").alias("i0", "x")
    ).select(
        "vec_id",
        (F.col("i0") + 1).alias("i"),
        round6s(F.col("x").cast("double") * qscale, 0).cast("long").alias("q"),
    )


def _argmin_assign(dist: DataFrame, keys: list[str], id_col: str) -> DataFrame:
    """Deterministic argmin: min (dist, id) struct per key group."""
    return (
        dist.groupBy(*keys)
        .agg(F.min(F.struct("dist", id_col)).alias("m"))
        .select(*keys, F.col(f"m.{id_col}").alias(id_col), F.col("m.dist").alias("dist"))
    )


def build_ivfpq_index(
    embeddings: DataFrame,
    root: str,
    n_centroids: int = 8,
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    dim: int = 64,
    qscale: int = 1000,
) -> None:
    """One corpus pass + bounded Lloyd rounds, then persist.

    Coarse quantizer: integer Lloyd (init = first ``n_centroids``
    vectors, ``iters`` assignment passes). PQ: per-subspace integer
    Lloyd over the RESIDUAL components (init = first ``k`` vectors'
    residuals). Codes are stored as one array<int> per vector,
    partitioned by coarse list for pruned probes."""
    from ureplicator_spark.operators.lloyd import (
        _assign_np,
        _quantize_np,
        _vec_rows,
        lloyd_train,
        pq_lloyd_train,
    )

    spark = embeddings.sparkSession

    # ---- coarse quantizer: integer Lloyd through the vectorized
    # kernel (r13, guide §4.2 — operators/lloyd.py): iters−1 update
    # rounds, each ONE map pass + a k·dim partial-sum collect; the
    # persisted cents pair with the final assignment exactly as the
    # exploded-component loop's did. Value identity (coarse/codebook/
    # codes files, search, append-over-build) pinned in
    # tests/test_plans.py's numpy-reference gate and the r13 A/B.
    cids, CC = lloyd_train(embeddings, n_centroids, iters, qscale,
                           update_last=False)
    coarse_rows = [
        (int(cid), i + 1, int(CC[j, i]))
        for j, cid in enumerate(cids)
        for i in range(CC.shape[1])
    ]
    from ureplicator_spark.functions import values_df

    (
        values_df(spark, coarse_rows, "cent_id long, i int, c long")
        if coarse_rows
        else spark.createDataFrame([], "cent_id long, i int, c long")
    ).write.mode("overwrite").parquet(root + "/coarse")

    # ---- PQ codebook over residuals (per-subspace integer Lloyd in
    # residual mode: every pass quantizes, subtracts the nearest
    # coarse centroid, and trains on q − c)
    books = pq_lloyd_train(embeddings, m, k, iters, dim, qscale,
                           coarse=(cids, CC))
    subdim = dim // m
    cb_rows = [
        (s, int(code), s * subdim + i + 1, int(C[j, i]))
        for s in range(m)
        for j, code in enumerate(books[s][0])
        for C in (books[s][1],)
        for i in range(subdim)
    ]
    (
        values_df(spark, cb_rows, "sub long, code long, i int, c long")
        if cb_rows
        else spark.createDataFrame([], "sub long, code long, i int, c long")
    ).write.mode("overwrite").parquet(root + "/codebook")

    # ---- encode: ONE map pass → (vec_id, codes array<int>, cent_id);
    # the former groupBy+collect_list+join packing is pure row algebra
    # inside the kernel now. One writer task per list, as before.
    vec = _vec_rows(embeddings)
    code_ids = [b[0] for b in books]
    mats = [b[1] for b in books]

    def encode(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = _quantize_np(pdf["embedding"].to_numpy(), qscale)
            ca, _ = _assign_np(Q, CC)
            R = Q - CC[ca]
            per_sub = []
            for s in range(m):
                a, _d = _assign_np(R[:, s * subdim : (s + 1) * subdim], mats[s])
                per_sub.append(code_ids[s][a].astype(np.int32))
            packed = np.column_stack(per_sub)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy().astype("int64"),
                    "codes": list(packed),
                    "cent_id": cids[ca],
                }
            )

    packed = vec.mapInPandas(
        encode, schema="vec_id long, codes array<int>, cent_id long"
    )
    packed.repartition("cent_id").write.mode("overwrite").partitionBy(
        "cent_id"
    ).parquet(root + "/codes")

    # persist the build geometry: the search must window residuals with
    # the SAME m/dim split (and quantization scale) the codes used — a
    # mismatched hardcoded subdim would silently drop codebook rows out
    # of the LUT join and return wrong neighbors
    import json

    with open(root + "/meta.json", "w") as f:
        json.dump({"n_centroids": n_centroids, "m": m, "k": k,
                   "dim": dim, "qscale": qscale}, f)


def append_to_ivfpq_index(
    spark: SparkSession, root: str, new_embeddings: DataFrame
) -> int:
    """Grow the compressed index WITHOUT retraining: encode new
    vectors with the EXISTING coarse centroids and PQ codebooks (the
    FAISS ``add`` operation — quantizers are fixed after training) and
    append the codes partition-wise to their coarse lists. Returns
    rows appended.

    Encoding is byte-identical to the build's own encode step: integer
    components at the index's persisted qscale, exact integer-L2
    argmin against the broadcast coarse table (ties to the lower
    cent_id), per-subspace residual argmin against the broadcast
    codebook (ties to the lower code) — pinned in tests against an
    oblivious NumPy reference. Cost is O(new · (n_centroids + m·k));
    existing lists' files are never touched. Crash contract matches
    ``append_to_ivf_index`` (at-least-once mid-append; the streaming
    maintainer's marker commit makes normal replays no-ops)."""
    import json

    from pyspark.sql import Observation

    with open(root + "/meta.json") as f:
        meta = json.load(f)
    qscale, subdim = meta["qscale"], meta["dim"] // meta["m"]

    coarse = spark.read.parquet(root + "/coarse")
    cb = spark.read.parquet(root + "/codebook")

    comp = _int_components(new_embeddings, qscale)
    cdist = (
        comp.join(F.broadcast(coarse), "i")
        .groupBy("vec_id", "cent_id")
        .agg(F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c"))).alias("dist"))
    )
    assign = _argmin_assign(cdist, ["vec_id"], "cent_id").select("vec_id", "cent_id")

    resid = (
        comp.join(assign, "vec_id")
        .join(F.broadcast(coarse), ["cent_id", "i"])
        .select(
            "vec_id",
            "cent_id",
            F.expr(f"(i - 1) div {subdim}").alias("sub"),
            "i",
            (F.col("q") - F.col("c")).alias("r"),
        )
    )
    dist = (
        resid.join(F.broadcast(cb), ["sub", "i"])
        .groupBy("vec_id", "sub", "code")
        .agg(F.sum((F.col("r") - F.col("c")) * (F.col("r") - F.col("c"))).alias("dist"))
    )
    codes = _argmin_assign(dist, ["vec_id", "sub"], "code").select(
        "vec_id", "sub", "code"
    )
    packed = (
        codes.groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "code"))).alias("sc"))
        .select("vec_id", F.expr("transform(sc, s -> CAST(s.code AS INT))").alias("codes"))
        .join(assign, "vec_id")
    )
    obs = Observation()
    packed = packed.observe(obs, F.count(F.lit(1)).alias("n"))
    # same one-file-per-list write discipline as the build
    packed.repartition("cent_id").write.mode("append").partitionBy(
        "cent_id"
    ).parquet(root + "/codes")
    return int(obs.get["n"])


def search_ivfpq_index(
    spark: SparkSession,
    root: str,
    queries: DataFrame,
    nprobe: int = 2,
    top_k: int = 5,
) -> DataFrame:
    """ADC search over the persisted index: probe the ``nprobe``
    nearest coarse lists per query (exact integer L2 on the broadcast
    coarse table), build the residual lookup table for just those
    lists, and rank candidates by summed table entries. Only probed
    ``cent_id=`` directories are read. Geometry (m/dim/qscale) comes
    from the index's own meta.json, so the residual windowing always
    matches the build that produced the codes."""
    import json

    with open(root + "/meta.json") as f:
        meta = json.load(f)
    qscale, subdim = meta["qscale"], meta["dim"] // meta["m"]

    coarse = spark.read.parquet(root + "/coarse")
    cb = spark.read.parquet(root + "/codebook")
    codes = spark.read.parquet(root + "/codes")

    qcomp = _int_components(queries, qscale).withColumnRenamed("vec_id", "q_id")
    cdist = (
        qcomp.join(F.broadcast(coarse), "i")
        .groupBy("q_id", "cent_id")
        .agg(F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c"))).alias("dist"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("cent_id"))
    probe = (
        cdist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "cent_id")
    )

    # residual LUT for probed (query, list) pairs: Q·nprobe·m·k rows
    subdim_expr = f"(i - 1) div {subdim}"
    qresid = (
        qcomp.join(F.broadcast(probe), "q_id")
        .join(F.broadcast(coarse), ["cent_id", "i"])
        .select(
            "q_id", "cent_id",
            F.expr(subdim_expr).alias("sub"), "i",
            (F.col("q") - F.col("c")).alias("r"),
        )
    )
    lut = (
        qresid.join(F.broadcast(cb), ["sub", "i"])
        .groupBy("q_id", "cent_id", "sub", "code")
        .agg(F.sum((F.col("r") - F.col("c")) * (F.col("r") - F.col("c"))).alias("pdist"))
    )

    # probed-list candidates: DPP prunes unprobed cent_id directories
    cand = (
        codes.join(F.broadcast(probe), "cent_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "cent_id", "vec_id", F.posexplode("codes").alias("sub", "code"))
    )
    adc = (
        cand.join(F.broadcast(lut), ["q_id", "cent_id", "sub", "code"])
        .groupBy("q_id", F.col("vec_id").alias("c_id"))
        .agg(F.sum("pdist").alias("adc_dist"))
    )
    w2 = Window.partitionBy("q_id").orderBy(F.col("adc_dist").asc(), F.col("c_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= top_k)
        .select("q_id", "c_id", "adc_dist", "rank")
    )


def delete_from_ivfpq_index(
    spark: SparkSession, root: str, vec_ids: list[int]
) -> dict:
    """Right-to-be-forgotten for the IVF-PQ index: the ``codes``
    section stores each vector's packed subquantizer codes — a lossy
    but member-specific encoding of user content. Partition-pruned
    rewrite of the affected cent_id lists; ``coarse`` and
    ``codebook`` are MODELS (k×dim / m·k×subdim), not member rows, and
    like the IVF centroids they are refreshed by the next snapshot
    re-train rather than per-member decrement. Idempotent."""
    from ureplicator_spark.sources.rewrite import rewrite_partitioned_without

    ids = [int(i) for i in vec_ids]
    rewritten, removed = rewrite_partitioned_without(
        spark, root + "/codes", "cent_id", "vec_id", ids
    )
    return {"lists_rewritten": rewritten, "removed_dirs": removed}
