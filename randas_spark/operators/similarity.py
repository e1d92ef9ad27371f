"""Similarity search over embedding columns: brute-force cosine top-k
(exact baseline) and random-hyperplane LSH bucketing (the scale path).

Embeddings are plain array<float> columns; all scoring is the codegen'd
cosine from functions/vectors.py (no UDF). The LSH variant trades recall
for turning the n×m score matrix into same-bucket pairs only.
"""

from __future__ import annotations

import hashlib
import math
import struct

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from randas_spark.functions.vectors import cosine, dot


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, score every pair, keep k per query.

    Scale: queries are broadcast (no corpus shuffle, single scan);
    the rank window partitions by query id so the top-k shuffle carries
    only |queries|·|corpus| scored rows — at real scale, pre-reduce with
    a per-partition top-k (`rank <= k` after mapPartitions) or use the
    LSH route below. Deterministic: (score desc, corpus id) ordering.
    """
    q = queries.select(F.col(query_id).alias("qid"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(corpus_id).alias("cid"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("cid"))
        .withColumn("cos", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= top_k)
        .select("qid", "cid", "cos", "rk")
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane: md5-counter-derived
    doubles in [-1,1) (no RNG state, identical on every executor/session)."""
    vals = []
    for j in range(dim):
        h = hashlib.md5(f"plane:{plane_idx}:dim:{j}".encode()).digest()[:8]
        (u,) = struct.unpack("<Q", h)
        vals.append((u / 2**64) * 2.0 - 1.0)
    n = math.sqrt(sum(v * v for v in vals))
    return [v / n for v in vals]


def project_buckets(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Random-hyperplane LSH bucket id: n_planes sign bits packed into a
    long. Same-bucket probability for angle θ is (1-θ/π)^n_planes.
    Pure expression: dot products against literal plane arrays."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, p)])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit * F.lit(1 << p).cast("long")
    return bucket


def knn_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    dim: int,
    top_k: int = 10,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket. Recall is tuned by n_planes (fewer planes → bigger buckets →
    higher recall, more compute) — multiprobe (flipping low-confidence
    bits) is the standard next step; pytest bounds recall vs brute force.

    Scale: bucketing is a pure map; the join is an equi-join on bucket id
    → shuffle partitioned by bucket, never all-pairs.
    """
    q = queries.select(
        F.col(query_id).alias("qid"),
        F.col(vec_col).alias("qv"),
        project_buckets(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("cid"),
        F.col(vec_col).alias("cv"),
        project_buckets(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("qid") != F.col("cid"))
        .withColumn("cos", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= top_k)
        .select("qid", "cid", "cos", "rk")
    )
