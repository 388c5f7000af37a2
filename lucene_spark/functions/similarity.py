"""Pluggable scoring strategies (the reference's ``Similarity`` extension
point: ``search/similarities/Similarity.java`` with 13 implementations —
BM25, Classic TF-IDF, DFR, LM…).

A Similarity supplies three kernels, all float32-faithful and vectorized:

* ``weight(df, doc_count, boost)``   — query-time term weight
* ``norm_cache(avgdl)``              — 256-entry per-norm-byte factor
* ``score(tfs, norm_bytes, weight, cache)`` — per-posting scores

``monotonic`` declares that score is non-decreasing in tf and in the
cached norm factor — the property that makes block-max pruning safe
(reference comment at ``BM25Similarity.java:252-262``); non-monotonic
similarities automatically fall back to exhaustive scoring.

The index layout is similarity-independent: norms store the SmallFloat
4-bit quantized field length (``intToByte4``), and every similarity
decodes document length through the same LENGTH_TABLE.
"""

from __future__ import annotations

import numpy as np

from . import bm25
from .smallfloat import LENGTH_TABLE


class Similarity:
    name = "base"
    monotonic = True

    def weight(self, df: int, doc_count: int,
               boost: float = 1.0) -> np.float32:  # pragma: no cover
        raise NotImplementedError

    def norm_cache(self, avgdl: np.float32) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError

    def score(self, tfs: np.ndarray, norm_bytes: np.ndarray,
              weight: np.float32,
              cache: np.ndarray) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError


class BM25Similarity(Similarity):
    """The default (reference ``BM25Similarity.java``; searcher default at
    ``search/IndexSearcher.java:116``)."""

    name = "bm25"
    monotonic = True

    def __init__(self, k1: float = bm25.K1_DEFAULT, b: float = bm25.B_DEFAULT):
        self.k1 = k1
        self.b = b

    def weight(self, df: int, doc_count: int, boost: float = 1.0) -> np.float32:
        return np.float32(np.float32(boost) * bm25.idf(df, doc_count))

    def norm_cache(self, avgdl: np.float32) -> np.ndarray:
        return bm25.norm_inverse_cache(avgdl, self.k1, self.b)

    def score(self, tfs, norm_bytes, weight, cache) -> np.ndarray:
        return bm25.score_block(tfs, norm_bytes, weight, cache)


class ClassicSimilarity(Similarity):
    """Lucene's pre-BM25 TF-IDF (reference ``similarities/
    ClassicSimilarity.java`` / ``TFIDFSimilarity.java``):

      idf   = 1 + ln(docCount / (df + 1))            (float32)
      tf    = sqrt(freq)                             (float32)
      norm  = 1 / sqrt(dl)  via the shared byte4 length table (the
              reference encodes 1/sqrt(dl) lossily at index time; we decode
              the same quantized dl and apply the same function)
      score = boost * idf^2 * tf * norm              (float32 op order)

    Monotonic in tf and in the norm factor → block-max safe.
    """

    name = "classic"
    monotonic = True

    def weight(self, df: int, doc_count: int, boost: float = 1.0) -> np.float32:
        idf = np.float32(1.0 + np.log(doc_count / (df + 1.0)))
        return np.float32(np.float32(boost) * np.float32(idf * idf))

    def norm_cache(self, avgdl: np.float32) -> np.ndarray:
        with np.errstate(divide="ignore"):
            inv = np.float32(1.0) / np.sqrt(LENGTH_TABLE, dtype=np.float32)
        return np.where(np.isfinite(inv), inv, np.float32(0.0)) \
                 .astype(np.float32)

    def score(self, tfs, norm_bytes, weight, cache) -> np.ndarray:
        tf = np.sqrt(np.asarray(tfs, dtype=np.float32), dtype=np.float32)
        inv = cache[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        return (weight * tf * inv).astype(np.float32)


SIMILARITIES = {"bm25": BM25Similarity, "classic": ClassicSimilarity}
