"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (oracle-checked); the LSH
(random-hyperplane) bucketed variant is the scale path — at 100 TB the
all-pairs product is infeasible, so candidates come from sign-bucket
collisions and only bucket-local pairs are scored.

All float math is float->double casts followed by left-to-right folds so
Spark and DuckDB produce bit-identical doubles (sqrt and arithmetic are
IEEE-correctly-rounded in both).  No Python UDFs — `F.zip_with` /
`F.aggregate` stay inside codegen; at production scale a pandas_udf with
numpy would also be reasonable, but builtins keep the oracle exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_QUERY_VECS = 5  # vec_id < 5 are the query vectors in the harness queries
TOP_K = 5
NEARDUP_TAU = 0.40  # max observed cosine in the testdata is ~0.51

LSH_PLANES = 8
LSH_MOD = 2001  # pseudo-random weights in [-1, 1] with 1e-3 resolution


def _dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (x, y) -> x + y)"
    )


def duck_cosine(a: str, b: str) -> str:
    return f"({_duck_dot(a, b)} / (sqrt({_duck_dot(a, a)}) * sqrt({_duck_dot(b, b)})))"


def cosine_pandas_udf(query_vec: list):
    """Arrow-batched vectorized cosine against a fixed query vector — the
    measured fast path for vector math (tools/bench_udf.py: ~3x faster than
    the zip_with/aggregate builtins at 64 dims, because Catalyst higher-order
    functions are interpreted per element while numpy fuses the batch).

    Used by scale deployments; the oracle-checked queries keep the builtin
    expression because only identical JVM expression trees are bit-exact
    against DuckDB.  Returns a pandas_udf ready to apply to an array column.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType

    qv = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(qv))

    # no pd.Series type hints: `from __future__ import annotations` turns
    # them into strings PySpark's hint resolver can't evaluate here; the
    # explicit returnType covers the signature
    @F.pandas_udf(DoubleType())
    def _cos(col):
        mat = np.stack(col.map(lambda a: np.asarray(a, dtype=np.float64)))
        return pd.Series((mat @ qv) / (np.linalg.norm(mat, axis=1) * qn))

    return _cos


def cosine_topk(emb: DataFrame, k: int = TOP_K, n_queries: int = N_QUERY_VECS) -> DataFrame:
    """Exact brute-force top-k neighbours for the query vectors.

    The query side is tiny and broadcast, so the scan side streams once with
    no shuffle; the per-query top-k is a windowed rank over (n_queries * N)
    rows — at scale swap the window for TakeOrdered per query or the LSH
    variant below."""
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    pairs = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("embedding")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def cosine_topk_sql(table: str = "embeddings", k: int = TOP_K, n_queries: int = N_QUERY_VECS) -> str:
    cos = duck_cosine("q.embedding", "e.embedding")
    return f"""
    WITH pairs AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               {cos} AS cos_sim
        FROM {table} q JOIN {table} e ON e.vec_id != q.vec_id
        WHERE q.vec_id < {n_queries}
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
        FROM pairs
    )
    SELECT query_id, neighbor_id, rank, cos_sim FROM ranked WHERE rank <= {k}
    """


def cosine_neardup_pairs(emb: DataFrame, tau: float = NEARDUP_TAU) -> DataFrame:
    """Exact all-pairs cosine near-duplicates (a < b, cosine >= tau).

    Quadratic by construction — the oracle-exact baseline.  The scale path
    is lsh_ann_candidates below (bucketed, approximate)."""
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine(F.col("ea"), F.col("eb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= tau)
    )


def cosine_neardup_pairs_sql(table: str = "embeddings", tau: float = NEARDUP_TAU) -> str:
    cos = duck_cosine("a.embedding", "b.embedding")
    return f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cos_sim
    FROM {table} a JOIN {table} b ON a.vec_id < b.vec_id
    WHERE {cos} >= {tau}
    """


def lsh_bucket(vec: Column) -> Column:
    """Sign-bucket key: LSH_PLANES bits of sign(dot(vec, plane_p)).

    Hyperplane weights are deterministic pseudo-random values derived from
    (plane, dim) with pure column math — no RNG state, reproducible on any
    engine: w = (((p*10007 + d*31 + 13) mod LSH_MOD) - half) / half."""
    half = (LSH_MOD - 1) // 2
    bits = []
    for p in range(LSH_PLANES):
        # weight_d = (((p*10007 + d*31 + 13) % LSH_MOD) - half) / half
        prods = F.zip_with(
            vec,
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda x, d: x.cast("double")
            * (((F.lit(p * 10007) + d * 31 + 13) % LSH_MOD - half) / F.lit(float(half))),
        )
        dot = F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)
        bits.append(F.when(dot > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


IVF_CLUSTERS = 16
IVF_ITERS = 3
IVF_NPROBE = 4


def _sq_dist(a: Column, b: Column) -> Column:
    diffs = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v * v)


def _assign_to_centroids(emb: DataFrame, centroids: list) -> DataFrame:
    """Nearest-centroid assignment via broadcast join + struct-min argmin
    (lowest cluster id wins ties).  One compact expression regardless of k —
    unrolled per-centroid literal expressions blow up Catalyst analysis
    time k-fold and are avoided deliberately."""
    spark = emb.sparkSession
    cent_df = spark.createDataFrame(
        [(cid, vec) for cid, vec in centroids], ["cluster", "centroid"]
    )
    d = _sq_dist(F.col("embedding"), F.col("centroid"))
    return (
        emb.crossJoin(F.broadcast(cent_df))
        .groupBy("vec_id")
        .agg(
            F.min(F.struct(d.alias("d"), F.col("cluster").alias("c"))).alias("best"),
            F.first("embedding").alias("embedding"),
        )
        .select("vec_id", "embedding", F.col("best.c").alias("cluster"))
    )


def ivf_assignments(
    emb: DataFrame, k: int = IVF_CLUSTERS, iters: int = IVF_ITERS
) -> tuple[DataFrame, list]:
    """IVF coarse quantizer: k-means with DETERMINISTIC init (the first k
    vec_ids), a few Lloyd iterations.

    Each iteration: broadcast-join the k centroids, argmin by struct-min,
    then re-average per cluster via posexplode + (cluster, dim) mean.
    Centroids are tiny (k × dim doubles) so the per-iteration collect is
    O(k·d), not data-sized.  Returns (assignments df, final centroids list).
    """
    centroids = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    ]
    centroids = [(i, vec) for i, (_vid, vec) in enumerate(centroids)]
    assigned = None
    for _ in range(iters):
        assigned = _assign_to_centroids(emb, centroids)
        new_cents = (
            assigned.select("cluster", F.posexplode("embedding").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.avg(F.col("val").cast("double")).alias("mean"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "mean"))).alias("dm"))
            .select("cluster", F.col("dm.mean").alias("centroid"))
            .collect()
        )
        by_cluster = {r.cluster: list(r.centroid) for r in new_cents}
        centroids = [
            (cid, by_cluster.get(cid, vec)) for cid, vec in centroids
        ]
    return assigned, centroids


def ivf_topk(
    emb: DataFrame,
    k: int = TOP_K,
    n_queries: int = N_QUERY_VECS,
    n_probe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF-probed approximate top-k: score only vectors in the n_probe
    clusters nearest to each query — the standard recall/compute dial.

    At 100 TB the assignment table is bucketed by cluster so a probe reads
    n_probe/k of the data; here the join is keyed the same way.  Approximate
    (recall-tested against the exact baseline), so rows-only in the harness.
    """
    assigned, centroids = ivf_assignments(emb)
    assigned = assigned.persist()
    q = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    # per-query n_probe nearest clusters: broadcast-join centroids, rank
    spark = emb.sparkSession
    cent_df = spark.createDataFrame(list(centroids), ["cluster", "centroid"])
    qd = q.crossJoin(F.broadcast(cent_df)).select(
        "query_id", "qv", "cluster",
        _sq_dist(F.col("qv"), F.col("centroid")).alias("cd"),
    )
    pw = Window.partitionBy("query_id").orderBy("cd", "cluster")
    q_probed = (
        qd.withColumn("prank", F.row_number().over(pw))
        .filter(F.col("prank") <= n_probe)
        .select("query_id", "qv", "cluster")
    )
    cand = q_probed.join(assigned, "cluster").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("qv"), F.col("embedding")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def lsh_ann_candidates(emb: DataFrame, tau: float = NEARDUP_TAU) -> DataFrame:
    """Approximate near-dup pairs: score only bucket-colliding pairs.

    Recall vs the exact variant is data-dependent (sign-LSH); this is the
    plan shape that survives 100 TB — shuffle keyed by bucket, quadratic
    only within buckets.  Rows-only correctness check (approximate by
    design); tests assert candidates ⊆ exact pairs and measure recall."""
    with_bucket = emb.select(
        "vec_id", "embedding", lsh_bucket(F.col("embedding")).alias("bucket")
    )
    a = with_bucket.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), "bucket"
    )
    b = with_bucket.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), "bucket"
    )
    return (
        a.join(b, ["bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine(F.col("ea"), F.col("eb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= tau)
        .distinct()
    )
