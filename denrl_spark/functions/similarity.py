"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot/norms are computed with ``zip_with`` + ``aggregate`` higher-order
  functions on DOUBLE-cast arrays: strictly sequential, JVM-side, so the
  value is bit-reproducible and matches a sequential-loop oracle.
- ``lsh_topk``: the scale path — random-hyperplane (SimHash-style) LSH
  buckets shrink the candidate set before exact re-scoring, turning the
  O(N*Q) cross product into per-bucket joins. Hyperplanes are derived
  deterministically from a seed (no RNG state), so results are stable
  across partitionings and cluster sizes.

At 100 TB the brute-force variant exists only as the re-scorer inside
each LSH bucket; the bucket join is the shuffle boundary and is keyed by
(plane-bucket), which AQE can split on skew.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, neighbor_id, cos_e3): exact top-k by cosine.
    Ties and float wobble are controlled by ranking on the 1e-3-floored
    score with neighbor id as tie-break."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.floor(1000 * _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))))
            .cast("long")
            .alias("cos_e3"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_e3"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "cos_e3")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-ish hyperplanes (no RNG state:
    values from a sine scramble of (seed, plane, coord))."""
    return [
        [
            math.sin(seed * 1.7 + p * 12.9898 + d * 78.233) * 2 -
            math.floor(math.sin(seed * 1.7 + p * 12.9898 + d * 78.233) * 2)
            - 0.5
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: sign-bucket on random hyperplanes, candidate
    join within bucket, exact cosine re-score. Returns the same schema
    as cosine_topk (ranks within retrieved candidates)."""
    planes = _hyperplanes(dim, n_planes, seed)

    def bucket(vec):
        bits = [
            F.when(_dot(vec, F.array(*[F.lit(x) for x in pl])) >= 0, F.lit(1)).otherwise(F.lit(0))
            for pl in planes
        ]
        out = F.lit(0)
        for i, b in enumerate(bits):
            out = out + b * (2 ** i)
        return out

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("bucket", bucket(F.col("qv")))
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("bucket", bucket(F.col("cv")))
    scored = (
        q.join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.floor(1000 * _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))))
            .cast("long")
            .alias("cos_e3"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_e3"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "cos_e3")
    )
