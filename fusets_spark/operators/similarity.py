"""Similarity search over embedding columns (engine extension, round brief).

Brute-force cosine top-k is the exactness baseline (native higher-order
array functions — zip_with + aggregate, JVM-side, no UDF). The scale path is
random-hyperplane LSH bucketing: hyperplanes are a deterministic function of
(seed, plane, dim) so bucket assignment is reproducible at any parallelism;
queries probe only their own bucket (multi-probe = flip lowest-confidence
bits, left for a later round). Embedding-cosine near-dup pairs reuse the
bucket join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..datagen import _hash01


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to one stored vector. The 1-row
    query side is broadcast; ranking is fully deterministic
    (cos DESC, vec_id ASC)."""
    from pyspark.sql import Window

    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qvec")
    )
    joined = embeddings.crossJoin(F.broadcast(q))
    cos = _dot(F.col(vec_col), F.col("qvec")) / (
        _norm(F.col(vec_col)) * _norm(F.col("qvec"))
    )
    ranked = joined.select(
        F.col(id_col), F.col("label"), cos.alias("cos")
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("cos").desc(), F.col(id_col).asc())
        ),
    )
    return ranked.filter(F.col("rank") <= k).select(
        id_col, "label", F.round("cos", 6).alias("cos"), "rank"
    )


def lsh_bucket(
    embeddings: DataFrame,
    n_planes: int = 12,
    seed: int = 42,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector, as an n_planes-char '0'/'1'
    string. Hyperplanes are deterministic Gaussian-ish values from the
    splitmix hash (datagen._hash01), broadcast as literals into a native
    expression — vectorized, UDF-free, reproducible."""
    planes = np.empty((n_planes, dim))
    for p in range(n_planes):
        u1 = _hash01(np.full(dim, p), np.arange(dim), seed)
        u2 = _hash01(np.full(dim, p), np.arange(dim), seed ^ 0x5A5A)
        planes[p] = np.sqrt(-2 * np.log(u1 + 1e-12)) * np.cos(2 * np.pi * u2)
    bits = []
    for p in range(n_planes):
        arr = F.array(*[F.lit(float(v)) for v in planes[p]])
        bits.append((_dot(F.col(vec_col), arr) > 0).cast("int").cast("string"))
    return embeddings.withColumn("bucket", F.concat(*bits))


def ann_topk_lsh(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 20,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking WITHIN the query's LSH
    bucket. Recall < 1 by design; at corpus scale the bucket join replaces
    the full cross join (bucket is the shuffle/partition key)."""
    from pyspark.sql import Window

    bucketed = lsh_bucket(embeddings, n_planes, seed, dim)
    q = bucketed.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec"), F.col("bucket").alias("qbucket")
    )
    cand = bucketed.join(
        F.broadcast(q), F.col("bucket") == F.col("qbucket")
    )
    cos = _dot(F.col("embedding"), F.col("qvec")) / (
        _norm(F.col("embedding")) * _norm(F.col("qvec"))
    )
    ranked = cand.select("vec_id", "label", cos.alias("cos")).withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("cos").desc(), "vec_id")),
    )
    return ranked.filter(F.col("rank") <= k).select(
        "vec_id", "label", F.round("cos", 6).alias("cos"), "rank"
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 6,
    seed: int = 7,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate candidate pairs via LSH-bucket
    self-join (same-bucket pairs only), exact cosine filter ≥ threshold."""
    b = lsh_bucket(embeddings, n_planes, seed, dim).select(
        "vec_id", "embedding", "bucket"
    )
    a, c = b.alias("a"), b.alias("b")
    pairs = a.join(
        c,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    cos = _dot(F.col("a.embedding"), F.col("b.embedding")) / (
        _norm(F.col("a.embedding")) * _norm(F.col("b.embedding"))
    )
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", F.round("cos", 6).alias("cos"))
    )
