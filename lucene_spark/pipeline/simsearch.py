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
* :func:`ivf_topk` — the other classic scale path (IVF): deterministic
  k-means centroids (hash-seeded + Lloyd refinement, all aggregation in
  DataFrame ops), corpus partitioned by nearest centroid, queries probe
  only their ``nprobe`` nearest lists. ``nprobe == num_centroids``
  degenerates to exact brute force (the differential-test hook).
* :func:`cosine_near_duplicates` / :func:`cosine_near_duplicates_lsh` —
  embedding-cosine near-duplicate *pairs* (the training-data dedup use):
  exact all-pairs as the oracle path, hyperplane-bucketed candidates +
  exact-cosine verification as the scale path (same shape as MinHash→LSH
  in ``dedup.py``: candidate generation is linear in collisions, never
  quadratic in the corpus).

Dot products use ``zip_with`` + ``aggregate`` with explicit double casts —
built-in JVM expressions, no Python in the loop.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
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


def filtered_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                  allowed: DataFrame | None = None,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  method: str = "ivf", num_centroids: int = 16,
                  nprobe: int = 4, iters: int = 2) -> DataFrame:
    """Pre-filtered KNN — the reference's filtered vector search
    (``search/KnnFloatVectorQuery.java:32``: the filter Query's match set
    restricts the graph search BEFORE top-k, so all k results satisfy the
    filter; post-filtering would under-fill).

    ``allowed``: DataFrame with a ``doc_id`` column of permitted ids —
    typically ``Searcher.matching_docs(any boolean query)``, which is how
    vector search composes with the query algebra. The corpus is
    LEFT SEMI-joined to it: at scale the match set either broadcasts
    (selective filter) or shuffle-semi-joins on the id — the corpus
    embeddings never collect anywhere.

    ``method='ivf'`` probes ``nprobe`` inverted lists built on the
    FILTERED corpus (``nprobe == num_centroids`` is exhaustive = exact on
    the filtered subset, the differential hook); ``method='brute'`` is
    the exact baseline."""
    if allowed is not None:
        col = "doc_id" if "doc_id" in allowed.columns else allowed.columns[0]
        ids = allowed.select(F.col(col).alias(id_col)).distinct()
        corpus = corpus.join(ids, on=id_col, how="left_semi")
    if method == "brute":
        return brute_force_topk(corpus, queries, k, id_col, vec_col)
    if method != "ivf":
        raise ValueError(f"unknown method {method!r}")
    return ivf_topk(corpus, queries, k, id_col, vec_col,
                    num_centroids, nprobe, iters)


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (training-data dedup)
# ---------------------------------------------------------------------------

def cosine_near_duplicates(corpus: DataFrame, threshold: float,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold — exact all-pairs.

    The correctness oracle: quadratic in the corpus, for modest inputs /
    sampled validation of :func:`cosine_near_duplicates_lsh` (mirrors
    ``dedup.ngram_jaccard_pairs`` vs the MinHash path).
    Output: (id_a, id_b, cos) with cos as a raw double.
    """
    a = corpus.select(F.col(id_col).alias("id_a"),
                      F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"),
                      F.col(vec_col).alias("vb"))
    return (a.crossJoin(b)
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b",
                     cosine(F.col("va"), F.col("vb")).alias("cos"))
             .where(F.col("cos") >= threshold))


def cosine_near_duplicates_lsh(corpus: DataFrame, threshold: float,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               num_planes: int = 8, dim: int = 64,
                               multiprobe: bool = True) -> DataFrame:
    """Scale path: candidate pairs collide on a hyperplane-sign bucket
    (one side multiprobes Hamming-1 buckets, so pairs whose signatures
    differ by <= 1 bit are candidates), then exact-cosine verification
    keeps only pairs >= threshold. Linear in bucket collisions — at
    100 TB the shuffle key is the bucket id, and only genuinely similar
    vectors (plus ~1/2^P random collisions) meet in a reducer. Recall is
    approximate by design; differential tests measure it against
    :func:`cosine_near_duplicates`."""
    planes = _hyperplanes(dim, num_planes)
    sig = corpus.select(F.col(id_col).alias("vid"),
                        F.col(vec_col).alias("vec"),
                        _bucket_expr(F.col(vec_col), planes).alias("bucket"))
    if multiprobe:
        probes = F.array(*([F.col("bucket")] +
                           [F.col("bucket").bitwiseXOR(F.lit(1 << p))
                            for p in range(num_planes)]))
        a = (sig.select("vid", "vec", F.explode(probes).alias("bucket"))
                .select(F.col("vid").alias("id_a"),
                        F.col("vec").alias("va"), "bucket"))
    else:
        a = sig.select(F.col("vid").alias("id_a"),
                       F.col("vec").alias("va"), "bucket")
    b = sig.select(F.col("vid").alias("id_b"),
                   F.col("vec").alias("vb"), "bucket")
    return (a.join(b, on="bucket")
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b",
                     cosine(F.col("va"), F.col("vb")).alias("cos"))
             .where(F.col("cos") >= threshold)
             .groupBy("id_a", "id_b").agg(F.first("cos").alias("cos")))


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate nearest neighbor
# ---------------------------------------------------------------------------

def ivf_centroids(corpus: DataFrame, num_centroids: int,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  iters: int = 2,
                  train_fraction: float | None = None) -> np.ndarray:
    """Deterministic k-means centroids, L2-normalized (spherical k-means,
    the right geometry for cosine).

    Seeds = the ``num_centroids`` corpus vectors with smallest
    ``md5(id)`` (a uniform, engine-independent sample — no RNG state on
    executors). Refinement = ``iters`` Lloyd steps where the assign step
    is a vectorized Arrow UDF (numpy matmul against the broadcast
    centroid matrix) and the update step is a posexplode →
    ``groupBy(centroid, component).avg`` — dim-agnostic and map-side
    combined, so each step shuffles only ``num_centroids × dim`` partial
    sums per partition. The centroid matrix (C × dim floats) is tiny and
    lives on the driver.

    ``train_fraction`` samples the TRAINING set deterministically (docs
    whose ``md5(id)`` prefix falls below the fraction) so Lloyd
    iterations scan a fixed subset instead of the full corpus — the
    standard IVF practice at scale (k-means needs ~100-1000 vectors per
    centroid, not 10^12); assignment at INDEX time still covers every
    vector. None = train on everything (exact small-scale behavior).
    """
    if train_fraction is not None and not 0 < train_fraction <= 1:
        raise ValueError("train_fraction must be in (0, 1]")
    if train_fraction is not None and train_fraction < 1:
        # md5 prefix as a uniform hash in [0, 16^8): deterministic,
        # engine-independent, no RNG state on executors
        cut = format(int(train_fraction * 16**8), "08x")
        train = corpus.filter(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8) < cut)
    else:
        train = corpus
    seeds = (train.select(F.col(vec_col).alias("vec"),
                          F.md5(F.col(id_col).cast("string")).alias("h"))
                  .orderBy("h").limit(num_centroids)
                  .toPandas())
    cents = np.stack(seeds["vec"].to_numpy()).astype(np.float64)
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    dim = cents.shape[1]
    for _ in range(iters):
        assign = _assign_udf(cents)
        # per-(centroid, component) mean via posexplode — dim-agnostic
        # (no one-column-per-component widening), map-side combined: the
        # shuffle carries C × dim partial sums per partition
        pdf = (train.select(F.col(vec_col).alias("vec"))
                     .withColumn("cid", assign(F.col("vec")))
                     .select("cid", F.posexplode("vec").alias("i", "x"))
                     .groupBy("cid", "i")
                     .agg(F.avg(F.col("x").cast("double")).alias("m"))
                     .toPandas())
        new = cents.copy()
        new[pdf["cid"].to_numpy(np.int64),
            pdf["i"].to_numpy(np.int64)] = pdf["m"].to_numpy(np.float64)
        norms = np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
        cents = new / norms
    return cents


def _assign_udf(centroids: np.ndarray):
    """pandas_udf: embedding array → nearest-centroid id by cosine.
    Centroids ship in the closure (broadcast-by-serialization; C × dim is
    KBs); the batch computes one numpy matmul — no per-row Python."""
    cent = centroids.astype(np.float64)

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ cent.T, axis=1).astype(np.int32))

    return assign


def _probe_udf(centroids: np.ndarray, nprobe: int):
    cent = centroids.astype(np.float64)
    p = min(nprobe, cent.shape[0])

    @pandas_udf("array<int>")
    def probe(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ cent.T
        # top-nprobe centroid ids per query, best first (argsort is fine:
        # C is small by construction)
        order = np.argsort(-sims, axis=1)[:, :p].astype(np.int32)
        return pd.Series(list(order))

    return probe


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             num_centroids: int = 16, nprobe: int = 4,
             iters: int = 2, centroids: np.ndarray | None = None,
             train_fraction: float | None = None) -> DataFrame:
    """IVF approximate cosine top-k: corpus rows are inverted-listed by
    nearest centroid; each query scans only its ``nprobe`` closest lists.

    At scale the corpus side is written partitioned by ``centroid_id``
    (partition pruning does the list selection); here the same plan shape
    is a shuffle join on ``centroid_id``. ``nprobe == num_centroids``
    makes the search exhaustive — the differential-test equality hook.
    Same output schema as :func:`brute_force_topk`.
    """
    if centroids is None:
        centroids = ivf_centroids(corpus, num_centroids, id_col, vec_col,
                                  iters, train_fraction=train_fraction)
    assign = _assign_udf(centroids)
    probe = _probe_udf(centroids, nprobe)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cvec"),
                      assign(F.col(vec_col)).alias("centroid_id"))
    q = (queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("qvec"),
                        probe(F.col(vec_col)).alias("probes"))
                .select("query_id", "qvec",
                        F.explode("probes").alias("centroid_id")))
    scored = (c.join(F.broadcast(q), on="centroid_id")
               .where(F.col("neighbor_id") != F.col("query_id"))
               .select("query_id", "neighbor_id",
                       cosine(F.col("qvec"), F.col("cvec")).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "rank", "cos"))
