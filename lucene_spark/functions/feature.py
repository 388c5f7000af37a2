"""FeatureField / FeatureQuery: static-rank features indexed as a
quantized term frequency and scored with log / saturation / sigmoid
functions (reference ``core/document/FeatureField.java:164,207-216``
and the three ``FeatureFunction`` inner classes at
``FeatureField.java:277,331,408``).

The reference stores a feature value by writing the float's bit pattern,
right-shifted 15 bits, as the term frequency of a special term
(``FeatureField.java:164-166``: ``freq = floatToIntBits(v) >>> 15``) —
a 16-bit quantization keeping the sign (always 0), the 8 exponent bits
and the top 8 mantissa bits. Decoding shifts back
(``FeatureField.java:209-216``), i.e. clears the low 15 mantissa bits.

Here the encoded freq lives in a ``doc_meta`` int column (one per
feature name) — the Spark-native equivalent of a one-term postings list
whose freq carries the payload — and scoring is an Arrow-batched numpy
pass with the reference's exact float32 / float64 op order.  numpy and
DuckDB share the platform libm, so ``ln``/``pow`` agree bit-for-bit
with the SQL oracle twins (the engine-vs-Java ``Math.log`` contrast is
the same one the BM25 idf path already relies on).
"""

from __future__ import annotations

import numpy as np

#: Smallest legal feature value (Float.MIN_NORMAL): the reference ctor
#: rejects values below it (``FeatureField.java:141-151``), keeping the
#: encoded exponent non-zero so no subnormal handling is ever needed.
MIN_NORMAL = np.float32(1.1754943508222875e-38)

#: ``floatToIntBits(Float.MAX_VALUE) >>> 15`` (``FeatureField.java:207``).
MAX_FREQ = int(np.float32(np.finfo(np.float32).max).view(np.uint32)) >> 15


def encode_feature(values) -> np.ndarray:
    """Feature value -> stored term freq: ``floatToIntBits(v) >>> 15``
    (``FeatureField.java:164-166``).  Validates like the reference ctor:
    finite, and >= MIN_NORMAL (which also enforces positive)."""
    v = np.asarray(values, dtype=np.float32)
    if not np.all(np.isfinite(v)) or bool(np.any(v < MIN_NORMAL)):
        raise ValueError(
            "feature values must be finite and >= Float.MIN_NORMAL")
    return (v.view(np.uint32) >> np.uint32(15)).astype(np.int32)


def decode_feature(freq) -> np.ndarray:
    """Stored freq -> quantized feature value:
    ``intBitsToFloat(freq << 15)`` (``FeatureField.java:209-216``)."""
    f = np.asarray(freq, dtype=np.uint32)
    return (f << np.uint32(15)).view(np.float32)


def quantize(values) -> np.ndarray:
    """decode(encode(v)) — the value a stored feature scores with."""
    return decode_feature(encode_feature(values))


def feature_scores(freq: np.ndarray, function: str, weight: float,
                   pivot: float | None = None,
                   a: float | None = None) -> np.ndarray:
    """Per-doc feature scores in the reference's exact arithmetic.

    - ``log``       (``FeatureField.java:309``): float32 of
      ``weight_f64 * ln(f64(a_f32 + f))`` — the log's argument is a
      FLOAT sum (Java evaluates ``scalingFactor + decodeFeatureValue``
      in float before widening).
    - ``saturation`` (``FeatureField.java:381-385``): pure float32
      steps ``w * (1 - pivot / (f + pivot))`` (the rewritten form that
      cannot decrease with f under rounding).
    - ``sigmoid``   (``FeatureField.java:445-449``): float64
      ``w * (1 - k^a / (f^a + k^a))`` cast to float32.  For a == 2 the
      powers are computed as exact products (x*x); otherwise
      ``np.power`` (platform libm — Java's ``Math.pow`` may differ in
      the last ulp, documented divergence).
    """
    f = decode_feature(freq)
    w32 = np.float32(weight)
    if function == "saturation":
        if pivot is None:
            raise ValueError("saturation needs a pivot")
        p32 = np.float32(pivot)
        return w32 * (np.float32(1.0) - p32 / (f + p32))
    if function == "log":
        aa = np.float32(0.0 if a is None else a)
        arg = (aa + f).astype(np.float64)
        return (np.float64(w32) * np.log(arg)).astype(np.float32)
    if function == "sigmoid":
        if pivot is None or a is None:
            raise ValueError("sigmoid needs pivot and a")
        p64, a64 = np.float64(np.float32(pivot)), np.float64(np.float32(a))
        pivot_pa = p64 * p64 if a64 == 2.0 else np.power(p64, a64)
        f64 = f.astype(np.float64)
        f_pa = f64 * f64 if a64 == 2.0 else np.power(f64, a64)
        return (np.float64(w32)
                * (1.0 - pivot_pa / (f_pa + pivot_pa))).astype(np.float32)
    raise ValueError(f"unknown feature function {function!r}")
