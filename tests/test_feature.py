"""FeatureField / FeatureQuery: freq encoding and the three scoring
functions (reference ``core/document/FeatureField.java:164,207-216`` for
the encoding, ``:277,331,408`` for LogFunction / SaturationFunction /
SigmoidFunction), plus the Spark read path in
``operators/featurefield.py``.

The scalar cross-checks below re-derive the arithmetic with
``struct``-based float32 rounding — an implementation independent of the
numpy kernels they validate.
"""

from __future__ import annotations

import math
import struct
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.functions.feature import (MAX_FREQ, MIN_NORMAL,
                                            decode_feature, encode_feature,
                                            feature_scores, quantize)
from lucene_spark.operators.build import build_index
from lucene_spark.operators.delete import delete_by_term
from lucene_spark.operators.search import Searcher
from lucene_spark.oracle import OracleIndex
from lucene_spark.sources.corpus import generate_corpus


def f32(x: float) -> float:
    """Round to float32 via struct — numpy-independent."""
    return struct.unpack("f", struct.pack("f", x))[0]


def bits(x: float) -> int:
    return struct.unpack("I", struct.pack("f", x))[0]


# ---------------------------------------------------------------------------
# encoding (FeatureField.java:164-166, 207-216)
# ---------------------------------------------------------------------------

def test_encode_is_bits_shift():
    vals = [1.0, 1.5, 3.14159, 400.0, 1e-30, 6.0e37, float(MIN_NORMAL)]
    enc = encode_feature(vals)
    for v, e in zip(vals, enc):
        assert int(e) == bits(f32(v)) >> 15


def test_decode_clears_low_mantissa_bits():
    rng = np.random.default_rng(7)
    v = rng.uniform(1e-6, 1e6, 500).astype(np.float32)
    q = quantize(v)
    qb = q.view(np.uint32)
    vb = v.view(np.uint32)
    assert np.all(qb == (vb & np.uint32(0xFFFF8000)))
    # quantized value never exceeds the original and is within one step
    assert np.all(q <= v)
    step = decode_feature((vb >> 15) + 1) - q
    assert np.all(v - q < step)


def test_small_integers_quantize_exactly():
    v = np.arange(1, 512, dtype=np.float32)
    assert np.array_equal(quantize(v), v)


def test_max_freq_constant():
    assert MAX_FREQ == bits(struct.unpack("f", struct.pack("I",
                                          0x7F7FFFFF))[0]) >> 15


@pytest.mark.parametrize("bad", [0.0, -1.0, float("nan"), float("inf"),
                                 1e-39])
def test_encode_rejects_invalid(bad):
    with pytest.raises(ValueError):
        encode_feature([1.0, bad])


# ---------------------------------------------------------------------------
# scoring functions (FeatureField.java:309, 381-385, 445-449)
# ---------------------------------------------------------------------------

def _freqs():
    # legal encoded freqs only: 1 .. MAX_FREQ (larger values cannot come
    # out of encode_feature — they would decode to inf/negative)
    return np.array([1, 2, 7, 100, 4096, 30000, MAX_FREQ], dtype=np.int64)


def test_log_scalar_parity():
    w, a = 1.8, 0.5
    freq = _freqs()
    got = feature_scores(freq, "log", w, a=a)
    for fr, g in zip(freq, got):
        f = struct.unpack("f", struct.pack("I", int(fr) << 15))[0]
        exp = f32(f32(w) * math.log(f32(f32(a) + f)))
        assert float(g) == exp


def test_saturation_scalar_parity():
    w, p = 2.5, 8.0
    freq = _freqs()
    got = feature_scores(freq, "saturation", w, pivot=p)
    for fr, g in zip(freq, got):
        f = struct.unpack("f", struct.pack("I", int(fr) << 15))[0]
        exp = f32(f32(w) * f32(f32(1.0) - f32(f32(p) / f32(f + f32(p)))))
        assert float(g) == exp


def test_sigmoid_scalar_parity_a2():
    w, p, a = 1.2, 10.0, 2.0
    freq = _freqs()
    got = feature_scores(freq, "sigmoid", w, pivot=p, a=a)
    for fr, g in zip(freq, got):
        f = struct.unpack("f", struct.pack("I", int(fr) << 15))[0]
        pa = f32(p) * f32(p)
        exp = f32(f32(w) * (1.0 - pa / (f * f + pa)))
        assert float(g) == exp


def test_scores_monotone_in_freq():
    freq = np.arange(1, 5000, dtype=np.int64)
    for kw in ({"function": "log", "a": 0.5},
               {"function": "saturation", "pivot": 8.0},
               {"function": "sigmoid", "pivot": 10.0, "a": 2.0}):
        s = feature_scores(freq, weight=1.5, **kw)
        assert np.all(np.diff(s) >= 0), kw


def test_scores_bounded():
    freq = np.array([1, MAX_FREQ], dtype=np.int64)
    s = feature_scores(freq, "saturation", 3.0, pivot=1.0)
    assert np.all(s >= 0) and np.all(s <= np.float32(3.0))
    s = feature_scores(freq, "sigmoid", 3.0, pivot=5.0, a=1.3)
    assert np.all(s >= 0) and np.all(s <= np.float32(3.0))


def test_missing_params_raise():
    with pytest.raises(ValueError):
        feature_scores(np.array([1]), "saturation", 1.0)
    with pytest.raises(ValueError):
        feature_scores(np.array([1]), "sigmoid", 1.0, pivot=1.0)
    with pytest.raises(ValueError):
        feature_scores(np.array([1]), "nope", 1.0)


# ---------------------------------------------------------------------------
# Spark read path (operators/featurefield.py)
# ---------------------------------------------------------------------------

N_DOCS = 200


@pytest.fixture(scope="module")
def feat_index(spark):
    corpus = generate_corpus(N_DOCS, seed=53)
    raw = np.where(np.arange(N_DOCS) % 5 == 0, 0.0,
                   1.0 + np.arange(N_DOCS) % 50)
    enc = np.zeros(N_DOCS, dtype=np.int64)
    mask = raw > 0
    enc[mask] = encode_feature(raw[mask])
    d = tempfile.mkdtemp(prefix="lucene_spark_feat_")
    pdf = corpus.copy()
    pdf["rank_feat"] = enc
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=4)
    return d, enc, corpus


def test_feature_query_scores(spark, feat_index):
    d, enc, _ = feat_index
    s = Searcher(spark, d)
    got = {r["doc_id"]: r["score"]
           for r in s.feature_query("rank_feat", "saturation",
                                    weight=1.5, pivot=8.0).collect()}
    # docs without the feature (freq 0) never match
    assert set(got) == {i for i in range(N_DOCS) if enc[i] > 0}
    have = np.array(sorted(got))
    exp = feature_scores(enc[have], "saturation", 1.5, pivot=8.0)
    assert np.array_equal(np.array([got[int(i)] for i in have],
                                   dtype=np.float32), exp)


def test_feature_query_masks_deletes(spark, feat_index):
    import shutil
    d0, enc, corpus = feat_index
    d = tempfile.mkdtemp(prefix="lucene_spark_featdel_")
    shutil.rmtree(d)
    shutil.copytree(d0, d)  # keep the shared fixture index undeleted
    oracle = OracleIndex.build(list(zip(corpus.doc_id, corpus.content)))
    term = "else"
    victims = {doc for doc, _, _ in oracle.postings.get(term, ())}
    assert victims
    delete_by_term(spark, d, term)
    s = Searcher(spark, d)
    got = {r["doc_id"] for r in
           s.feature_query("rank_feat", "log", weight=1.0).collect()}
    assert got == {i for i in range(N_DOCS)
                   if enc[i] > 0 and i not in victims}


def test_distance_feature_scores(spark, feat_index):
    """LongPoint.newDistanceFeatureQuery parity: score =
    (float)(boost * (pivot / (pivot + (double) |v - origin|)))
    (LongDistanceFeatureQuery.java:117,307)."""
    d, enc, _ = feat_index
    s = Searcher(spark, d)
    origin, pivot, w = 8000, 1000, 2.3
    got = {r["doc_id"]: r["score"]
           for r in s.distance_feature_query("rank_feat", origin, pivot,
                                             w).collect()}
    assert set(got) == set(range(N_DOCS))
    w64 = f32(w)
    for doc in range(N_DOCS):
        dist = abs(int(enc[doc]) - origin)
        exp = f32(w64 * (float(pivot) / (float(pivot) + float(dist))))
        assert float(got[doc]) == exp


def test_distance_feature_rejects_bad_pivot(spark, feat_index):
    d, _, _ = feat_index
    s = Searcher(spark, d)
    with pytest.raises(ValueError):
        s.distance_feature_query("rank_feat", 0, 0)


def test_feature_combined_with_bm25(spark, feat_index):
    """MUST(text) + SHOULD(feature) — the reference's canonical usage
    (FeatureField.java:46-49): sum of the two float scores in double,
    cast to float."""
    from lucene_spark.plans import query as Q
    d, enc, _ = feat_index
    s = Searcher(spark, d)
    bm = {r["doc_id"]: r["score"]
          for r in s.score_all(Q.Term("while")).collect()}
    assert bm
    fs = {r["doc_id"]: r["score"]
          for r in s.feature_query("rank_feat", "log", weight=2.0,
                                   a=0.5).collect()}
    fdf = s.feature_query("rank_feat", "log", weight=2.0, a=0.5) \
           .withColumnRenamed("score", "fscore")
    comb = (s.score_all(Q.Term("while"))
            .join(fdf, "doc_id", "left")
            .select("doc_id",
                    (F.col("score").cast("double")
                     + F.coalesce(F.col("fscore"),
                                  F.lit(0.0).cast("float")).cast("double"))
                    .cast("float").alias("cscore")))
    got = {r["doc_id"]: r["cscore"] for r in comb.collect()}
    assert set(got) == set(bm)
    for doc, sc in got.items():
        exp = np.float32(np.float64(bm[doc])
                         + np.float64(fs.get(doc, np.float32(0.0))))
        assert np.float32(sc) == exp
