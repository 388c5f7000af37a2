"""Surround query parser (reference queryparser/surround subset):
syntax → algebra goldens + end-to-end engine/oracle parity."""

from __future__ import annotations

import tempfile

import numpy as np
import pytest

from lucene_spark.operators.build import build_index
from lucene_spark.operators.search import Searcher
from lucene_spark.oracle import OracleIndex
from lucene_spark.plans import query as Q
from lucene_spark.plans.surround import SurroundSyntaxError, parse_surround
from lucene_spark.sources.corpus import generate_corpus


def test_parse_goldens():
    # distance ops: slop = n - 1 (DistanceQuery.java:97), W=ordered
    assert parse_surround("3W(a, b)") == \
        Q.SpanNear(("a", "b"), slop=2, in_order=True)
    assert parse_surround("n(a, b, c)") == \
        Q.SpanNear(("a", "b", "c"), slop=0, in_order=False)
    # nesting + span-context OR/NOT/wildcards
    assert parse_surround("4N(OR(a, b), c)") == \
        Q.SpanNear((Q.SpanOr((Q.Term("a"), Q.Term("b"))), "c"),
                   slop=3, in_order=False)
    assert parse_surround("2W(ab*, c)") == \
        Q.SpanNear((Q.SpanMultiTermWrapper(Q.MultiTerm("prefix", "ab")),
                    "c"), slop=1, in_order=True)
    # boolean level
    assert parse_surround("AND(a, OR(b, c))") == \
        Q.And((Q.Term("a"), Q.Or((Q.Term("b"), Q.Term("c")))))
    assert parse_surround("NOT(a, b, c)") == \
        Q.Not(Q.Term("a"), Q.Or((Q.Term("b"), Q.Term("c"))))
    assert parse_surround("a?c") == Q.MultiTerm("wildcard", "a?c")
    # operator names case-insensitive; bare distance defaults to 1
    assert parse_surround("w(a, b)") == \
        Q.SpanNear(("a", "b"), slop=0, in_order=True)
    for bad in ("", "3W(a)", "W(a b", "AND(a,)", "2W(AND(a,b), c)",
                "a b"):
        with pytest.raises(SurroundSyntaxError):
            parse_surround(bad)


def test_surround_engine_parity(spark):
    corpus = generate_corpus(200, seed=51)
    oracle = OracleIndex.build(list(zip(corpus.doc_id, corpus.content)))
    d = tempfile.mkdtemp(prefix="lucene_spark_surround_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=3)
    s = Searcher(spark, d)
    queries = ["5W(parse, emit)", "8N(parse, emit, token)",
               "AND(codec, 6N(parse, emit))",
               "4N(OR(parse, scan), emit)",
               "NOT(3N(parse, emit), codec)",
               "OR(2W(mixed, case), flush)",
               "6N(par*, emit)"]
    matched = 0
    for qs in queries:
        q = parse_surround(qs)
        want = oracle.top_k(q, k=10)
        got = [(r["doc_id"], r["score"]) for r in s.search(q, k=10).collect()]
        assert [g[0] for g in got] == [w[0] for w in want], qs
        assert np.allclose([g[1] for g in got], [w[1] for w in want],
                           rtol=0, atol=0), qs
        matched += len(got)
    assert matched > 0
