"""Similarity search over an embedding column (``array<float>``).

* :func:`brute_force_topk` — exact cosine top-k. The query side is small
  and **broadcast**; the corpus side streams through once; per-query top-k
  is a window rank (Catalyst plans the filter as a partial top-k). This is
  the correctness baseline and also the right kernel to run *within* a
  bucket.
* :func:`lsh_bucketed_topk` — the scale path: random-hyperplane LSH buckets
  the corpus by sign bits; each query probes only its own bucket (plus
  optional multiprobe of Hamming-1 neighbors), so the 100 TB case compares
  each query against a ~1/2^P fraction of the corpus. Approximate:
  differential tests measure recall against the brute-force baseline.

Dot products use ``zip_with`` + ``aggregate`` with explicit double casts —
built-in JVM expressions, no Python in the loop.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    return F.aggregate(F.zip_with(a, b, lambda x, y:
                                  x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k for every query vector.

    Output: (query_id, neighbor_id, rank, cos) — raw double cosine,
    ranked by (cos desc, neighbor_id asc). Self-matches excluded.
    """
    q = F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                   F.col(vec_col).alias("qvec")))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cvec"))
    scored = (c.crossJoin(q)
               .where(F.col("neighbor_id") != F.col("query_id"))
               .select("query_id", "neighbor_id",
                       cosine(F.col("qvec"), F.col("cvec")).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "rank", "cos"))


def _hyperplanes(dim: int, num_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian hyperplanes (seeded from sha256 so every
    executor derives the identical matrix with no broadcast needed)."""
    h = int.from_bytes(hashlib.sha256(f"{seed}:{dim}:{num_planes}"
                                      .encode()).digest()[:8], "big")
    rng = np.random.RandomState(h % (2**31 - 1))
    return rng.randn(num_planes, dim)


def _bucket_expr(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id: bit p set iff dot(vec, plane_p) >= 0. Plane
    coefficients are inlined as literal arrays → pure JVM expression."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(dot(vec_col, arr) >= 0,
                                 F.lit(1 << p)).otherwise(F.lit(0))
    return bucket.cast("int")


def lsh_bucketed_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      num_planes: int = 4, dim: int = 64,
                      multiprobe: bool = True) -> DataFrame:
    """Approximate cosine top-k: compare each query only against corpus
    vectors in the same hyperplane-sign bucket (plus Hamming-1 buckets when
    ``multiprobe``). Same output schema as :func:`brute_force_topk`."""
    planes = _hyperplanes(dim, num_planes)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cvec"),
                      _bucket_expr(F.col(vec_col), planes).alias("bucket"))
    qb = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("qvec"),
                        _bucket_expr(F.col(vec_col), planes).alias("qbucket"))
    if multiprobe:
        probes = F.array(*([F.col("qbucket")] +
                           [F.col("qbucket").bitwiseXOR(F.lit(1 << p))
                            for p in range(num_planes)]))
        qb = qb.select("query_id", "qvec",
                       F.explode(probes).alias("bucket"))
    else:
        qb = qb.withColumnRenamed("qbucket", "bucket")
    scored = (c.join(F.broadcast(qb), on="bucket")
               .where(F.col("neighbor_id") != F.col("query_id"))
               .select("query_id", "neighbor_id",
                       cosine(F.col("qvec"), F.col("cvec")).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "rank", "cos"))
