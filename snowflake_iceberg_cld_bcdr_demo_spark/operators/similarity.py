"""Similarity search over an embedding column (``array<float>``).

Baseline: brute-force cosine top-k — a narrow map over the scan (dot
product via higher-order functions, JVM-side) followed by TakeOrdered.
Scale path: LSH-bucketed ANN (random-hyperplane signs partition the space,
candidates only join within a bucket) — the same pattern that keeps MinHash
sub-quadratic in :mod:`.dedup`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot, norm


def brute_force_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against the embedding of `query_vec_id`.

    The 1-row query side is broadcast (no shuffle of the big side); the
    ranking is `orderBy(desc).limit(k)` → TakeOrderedAndProject, which at
    cluster scale reduces per-partition top-k on the executors.  Cosine is
    a sequential double fold (bit-deterministic) and ties break by id."""
    q = emb.filter(F.col(id_col) == query_vec_id).select(F.col(vec_col).alias("query_vec"))
    scored = (
        emb.join(F.broadcast(q))
        .filter(F.col(id_col) != query_vec_id)
        .select(
            F.col(id_col),
            F.col("label"),
            cosine(F.col(vec_col), F.col("query_vec")).alias("cosine_sim"),
        )
    )
    return scored.orderBy(F.col("cosine_sim").desc_nulls_last(), F.col(id_col)).limit(k)


def hyperplane_lsh_buckets(
    emb: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector an LSH bucket = sign pattern against fixed random
    hyperplanes (passed in as literals so the plan stays deterministic).

    At 100 TB this is the partitioning key for ANN: search only touches the
    query's bucket (and optionally Hamming-1 neighbors)."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(dot(F.col(vec_col), plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    bucket = sum(bits).cast("int")
    return emb.select(F.col(id_col), F.col(vec_col), F.col("label"), bucket.alias("bucket"))


def lsh_topk(
    emb: DataFrame,
    query_vec_id: int,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k restricted to the query's LSH bucket (approximate — may
    miss cross-bucket neighbors; recall grows with fewer planes/bands)."""
    bucketed = hyperplane_lsh_buckets(emb, planes, id_col, vec_col)
    q = bucketed.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("query_vec"), F.col("bucket").alias("query_bucket")
    )
    return (
        bucketed.join(F.broadcast(q), F.col("bucket") == F.col("query_bucket"))
        .filter(F.col(id_col) != query_vec_id)
        .select(
            F.col(id_col),
            F.col("label"),
            cosine(F.col(vec_col), F.col("query_vec")).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc_nulls_last(), F.col(id_col))
        .limit(k)
    )


def cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (all pairs above threshold).

    O(n²) self-join — the oracle-checked correctness baseline.  At corpus
    scale use :func:`cosine_pairs_lsh`, which only joins within hyperplane
    buckets (same result modulo LSH recall)."""
    a = emb.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine(F.col("va"), F.col("vb")).alias("cosine_sim"))
        .filter(F.col("cosine_sim") > threshold)
    )


def cosine_pairs_lsh(
    emb: DataFrame,
    threshold: float,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path for near-dup pairs: candidates only form inside an LSH
    bucket (sub-quadratic; misses cross-bucket pairs — recall/cost dial is
    the plane count)."""
    bucketed = hyperplane_lsh_buckets(emb, planes, id_col, vec_col)
    a = bucketed.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"), F.col("bucket")
    )
    b = bucketed.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"), F.col("bucket")
    )
    return (
        a.join(b, ["bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine(F.col("va"), F.col("vb")).alias("cosine_sim"))
        .filter(F.col("cosine_sim") > threshold)
    )


def label_norm_stats(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-label embedding stats (count, min/max L2 norm, dims) — sanity
    profile of an embedding table before indexing.  MIN/MAX (not AVG):
    order-independent folds stay bit-identical across engines
    (functions.numeric module docstring)."""
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min(norm(F.col(vec_col))).alias("min_norm"),
        F.max(norm(F.col(vec_col))).alias("max_norm"),
        F.max(F.size(F.col(vec_col))).alias("n_dims"),
    )
