"""SpanNearQuery tests: matcher goldens + engine-vs-oracle parity."""

from __future__ import annotations

import tempfile

import numpy as np
import pytest

from lucene_spark.functions.spans import span_near_freq
from lucene_spark.operators.build import build_index
from lucene_spark.operators.search import Searcher
from lucene_spark.oracle import OracleIndex
from lucene_spark.plans import query as Q
from lucene_spark.sources.corpus import generate_corpus


def _pl(*lists):
    return [np.asarray(x, dtype=np.int64) for x in lists]


def test_matcher_ordered():
    # "a b a b": two ordered (a,b) chains at distance 1
    assert span_near_freq(_pl([0, 2], [1, 3]), 0, True) == 2.0
    # reversed order only: no ordered match
    assert span_near_freq(_pl([5], [1]), 10, True) == 0.0
    # wide gap: matchLength 3 -> 1/(1+3) with slop >= 3, else 0
    assert span_near_freq(_pl([0], [4]), 3, True) == pytest.approx(0.25)
    assert span_near_freq(_pl([0], [4]), 2, True) == 0.0
    # 3-term ordered chain a..b..c width 5 -> ml 2
    assert span_near_freq(_pl([0], [2], [4]), 2, True) == pytest.approx(1 / 3)
    # start tightening picks the latest valid first-clause position
    assert span_near_freq(_pl([0, 3], [4]), 0, True) == 1.0


def test_matcher_unordered():
    # out-of-order pair matches unordered
    assert span_near_freq(_pl([5], [1]), 10, False) == pytest.approx(
        1.0 / (1.0 + 3))
    # adjacent either way: three minimal windows in "a b a b"
    assert span_near_freq(_pl([0, 2], [1, 3]), 0, False) == 3.0
    # slop gates each window by its own matchLength
    assert span_near_freq(_pl([0, 9], [1, 5]), 0, False) == 1.0


def test_engine_oracle_parity(spark):
    corpus = generate_corpus(250, seed=47)
    oracle = OracleIndex.build(list(zip(corpus.doc_id, corpus.content)))
    d = tempfile.mkdtemp(prefix="lucene_spark_span_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=4)
    s = Searcher(spark, d)
    qs = [Q.SpanNear(("parse", "emit"), slop=4, in_order=True),
          Q.SpanNear(("parse", "emit"), slop=4, in_order=False),
          Q.SpanNear(("codec", "util", "index"), slop=8, in_order=False),
          Q.Or((Q.SpanNear(("mixed", "case"), slop=0),
                Q.Term("flush")))]
    matched_any = 0
    for q in qs:
        want = oracle.top_k(q, k=10)
        got = [(r["doc_id"], r["score"]) for r in s.search(q, k=10).collect()]
        assert [g[0] for g in got] == [w[0] for w in want], q
        assert np.allclose([g[1] for g in got], [w[1] for w in want],
                           rtol=0, atol=0), q
        matched_any += len(got)
    assert matched_any > 0
    # unordered is a superset of ordered at equal slop
    o = set(oracle.score(Q.SpanNear(("parse", "emit"), slop=6,
                                    in_order=True)))
    u = set(oracle.score(Q.SpanNear(("parse", "emit"), slop=6,
                                    in_order=False)))
    assert o <= u
    with pytest.raises(NotImplementedError):
        s.search(Q.SpanNear(("parse", "parse"), slop=2), k=5)
