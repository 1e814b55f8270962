"""Similarity search over embedding columns (LLM-pipeline surface).

Brute-force cosine top-k is the exact baseline; LSH-bucketed
(random-hyperplane) ANN is the scale path. Vector math is pure
``F.zip_with`` / ``F.aggregate`` higher-order functions — JVM-side,
no Python in the hot loop.

Scale notes (100 TB): brute force is a broadcast nested loop —
queries are broadcast-sized, so the corpus streams through one pass
with no shuffle; per-partition top-k then a driver-side final merge of
``k × num_queries`` rows via ``TakeOrderedAndProject``. The LSH
variant hashes both sides into ``2^planes`` buckets and equi-joins on
the bucket key, turning the cross product into a partitioned join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from isilon_hadoop_tools_spark.functions.hashing import stable_hash32


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a, b):
    """Cosine similarity of two array<double> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: for each query row, the k nearest corpus
    rows (self-matches on equal ids excluded).

    Output: ``query_id``, ``neighbor_id``, ``cos_sim`` (rounded to 6
    for cross-engine stability), ``rank``.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_bucket(vec_col, planes: int, dim: int, seed: int = 7):
    """Random-hyperplane LSH bucket id (0 .. 2^planes-1) for an
    array<double> column.

    Plane p's normal has component j = stable_hash32("p:j:seed")
    mapped to [-1, 1] — deterministic, no stored model, identical on
    any engine. bit p = (dot(vec, plane_p) >= 0).
    """
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        comp = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j, p=p: (
                stable_hash32(F.concat_ws(":", F.lit(p), j, F.lit(seed)))
                / F.lit(2147483648.0)
                - 1.0
            ),
        )
        bit = (_dot(vec_col, comp) >= 0).cast("long")
        bucket = bucket + bit * F.lit(2**p)
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane
    bucket; exact cosine rank within the bucket. Recall < 1 by design
    (tested against :func:`brute_force_topk` in the suite)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    ).withColumn("bucket", hyperplane_bucket(F.col("q_vec"), planes, dim))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    ).withColumn("bucket", hyperplane_bucket(F.col("c_vec"), planes, dim))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
