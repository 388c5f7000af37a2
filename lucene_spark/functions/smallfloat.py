"""4-bit "SmallFloat" norm quantization, vectorized in numpy.

Semantics match the reference's lossy 1-byte document-length encoding
(reference: ``lucene/core/src/java/org/apache/lucene/util/SmallFloat.java``
``longToInt4``/``int4ToLong``/``intToByte4``/``byte4ToInt``, lines 103-167):

  * values ``0 .. NUM_FREE_VALUES-1`` (0..23) are stored exactly;
  * larger values keep 4 significant bits (truncating, i.e. round-down),
    offset by ``NUM_FREE_VALUES``.

This is what the reference stores as the per-doc norm at index time
(``BM25Similarity.computeNorm`` → ``SmallFloat.intToByte4(numTerms)``,
reference ``similarities/BM25Similarity.java:138-148``), and what scoring
decodes through a 256-entry ``LENGTH_TABLE``
(``BM25Similarity.java:128-135``). Quantizing at build time is mandatory
for rank parity — scoring true doc lengths produces different ranks.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "int_to_byte4",
    "byte4_to_int",
    "LENGTH_TABLE",
    "NUM_FREE_VALUES",
]


def _long_to_int4(i: np.ndarray) -> np.ndarray:
    """Vectorized ``SmallFloat.longToInt4`` for non-negative int64 arrays."""
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("only supports positive values")
    # number of significant bits; float64 log2 is exact for i < 2^52 and we
    # correct both off-by-one directions so the result is exact for all int64
    num_bits = np.zeros_like(i)
    nz = i > 0
    num_bits[nz] = np.floor(np.log2(i[nz].astype(np.float64))).astype(np.int64) + 1
    num_bits[nz & (i >> np.minimum(num_bits, 63) > 0)] += 1
    too_high = nz & (i >> np.maximum(num_bits - 1, 0) == 0)
    num_bits[too_high] -= 1
    out = i.copy()
    normal = num_bits >= 4
    shift = num_bits[normal] - 4
    enc = (i[normal] >> shift) & 0x07
    out[normal] = enc | ((shift + 1) << 3)
    return out


def _int4_to_long(i: np.ndarray) -> np.ndarray:
    """Vectorized ``SmallFloat.int4ToLong``."""
    i = np.asarray(i, dtype=np.int64)
    bits = i & 0x07
    shift = (i >> 3) - 1
    decoded = np.where(shift == -1, bits, (bits | 0x08) << np.maximum(shift, 0))
    return decoded


_MAX_INT4 = int(_long_to_int4(np.array([2**31 - 1]))[0])
NUM_FREE_VALUES = 255 - _MAX_INT4  # == 24, as in the reference


def int_to_byte4(i) -> np.ndarray:
    """Vectorized ``SmallFloat.intToByte4``: int64 array -> uint8 array."""
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("only supports positive values")
    small = i < NUM_FREE_VALUES
    out = np.empty(i.shape, dtype=np.int64)
    out[small] = i[small]
    out[~small] = NUM_FREE_VALUES + _long_to_int4(i[~small] - NUM_FREE_VALUES)
    return out.astype(np.uint8)


def byte4_to_int(b) -> np.ndarray:
    """Vectorized ``SmallFloat.byte4ToInt``: uint8 array -> int64 array."""
    i = np.asarray(b, dtype=np.int64) & 0xFF
    small = i < NUM_FREE_VALUES
    out = np.empty(i.shape, dtype=np.int64)
    out[small] = i[small]
    out[~small] = NUM_FREE_VALUES + _int4_to_long(i[~small] - NUM_FREE_VALUES)
    return out


#: ``LENGTH_TABLE[b] = byte4ToInt(b)`` — the decode table scoring uses
#: (reference ``BM25Similarity.java:128-135``). float32 because the scoring
#: kernel consumes it in float32 arithmetic.
LENGTH_TABLE = byte4_to_int(np.arange(256)).astype(np.float32)
