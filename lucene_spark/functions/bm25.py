"""BM25 scoring kernel, float32-faithful to the reference.

Every arithmetic step reproduces the reference's operation order and
precision (reference ``lucene/core/src/java/org/apache/lucene/search/
similarities/BM25Similarity.java``):

  * idf computed in float64 then cast to float32 (``:104-109``)
  * multi-term idf: float32 idfs summed in float64, cast to float32
    (``idfExplain(termStats[])``, ``:196-216``)
  * avgdl = sumTotalTermFreq / docCount in float64, cast float32 (``:112-116``)
  * 256-entry norm-inverse cache in float32:
    ``1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))`` (``:216-221``)
  * weight = boost * idf in float32 (``:249``)
  * score  = weight - weight / (1f + freq * cache[normByte]) in float32
    (``:253-266``) — monotonic in freq and in shorter norms, which is what
    makes block-max pruning safe.

Defaults k1=1.2, b=0.75, discountOverlaps=True (``:86-101``).
"""

from __future__ import annotations

import numpy as np

from .smallfloat import LENGTH_TABLE

K1_DEFAULT = 1.2
B_DEFAULT = 0.75

__all__ = [
    "idf",
    "idf_sum",
    "avg_field_length",
    "norm_inverse_cache",
    "score_block",
    "max_block_scores",
    "K1_DEFAULT",
    "B_DEFAULT",
]


def idf(doc_freq: int, doc_count: int) -> np.float32:
    """log(1 + (docCount - docFreq + 0.5)/(docFreq + 0.5)); float64 → float32."""
    return np.float32(np.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5)))


def idf_sum(doc_freqs, doc_count: int) -> np.float32:
    """Phrase/synonym idf: sum the float32 per-term idfs in float64, cast."""
    total = np.float64(0.0)
    for df in doc_freqs:
        total += np.float64(idf(df, doc_count))
    return np.float32(total)


def avg_field_length(sum_total_term_freq: int, doc_count: int) -> np.float32:
    return np.float32(sum_total_term_freq / float(doc_count))


def norm_inverse_cache(avgdl: np.float32,
                       k1: float = K1_DEFAULT,
                       b: float = B_DEFAULT) -> np.ndarray:
    """cache[i] = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl)), float32."""
    k1f = np.float32(k1)
    bf = np.float32(b)
    one = np.float32(1.0)
    return (one / (k1f * ((one - bf) + bf * LENGTH_TABLE / np.float32(avgdl)))
            ).astype(np.float32)


def score_block(tfs: np.ndarray, norm_bytes: np.ndarray,
                weight: np.float32, cache: np.ndarray) -> np.ndarray:
    """Vectorized ``weight - weight / (1f + freq * cache[normByte])`` (float32)."""
    freq = tfs.astype(np.float32)
    inv = cache[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
    one = np.float32(1.0)
    return (weight - weight / (one + freq * inv)).astype(np.float32)


def max_block_scores(impacts_per_block: list[np.ndarray],
                     weight: np.float32, cache: np.ndarray) -> np.ndarray:
    """Per-block upper bound: max over the impact frontier of score(tf, norm).

    This is the MaxScoreCache role (reference ``search/MaxScoreCache.java:
    58-64``): a block whose max score cannot beat the collector's minimum
    competitive score is skipped without decoding.
    """
    out = np.empty(len(impacts_per_block), dtype=np.float32)
    for i, pairs in enumerate(impacts_per_block):
        if len(pairs) == 0:
            out[i] = np.float32(0.0)
        else:
            out[i] = score_block(pairs[:, 0], pairs[:, 1], weight, cache).max()
    return out
