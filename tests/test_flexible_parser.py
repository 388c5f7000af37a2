"""StandardQueryParser (flexible) subset: golden parse trees + engine
parity for the ReqOpt (MUST+SHOULD) boolean shape it introduces.

Reference: ``queryparser/flexible/standard/StandardQueryParser.java:115``,
``parser/StandardSyntaxParser.jj`` (occurs modifiers, interval
functions), ``search/ReqOptSumScorer.java`` (the MUST+SHOULD scorer).
"""

from __future__ import annotations

import tempfile

import numpy as np
import pytest

from lucene_spark.plans import query as Q
from lucene_spark.plans.flexible import parse_standard
from lucene_spark.plans.parser import QueryParseError

T = Q.Term


def t(x):
    return ("term", x)


GOLDEN = [
    ("foo bar", Q.Or((T("foo"), T("bar")))),
    ("foo AND bar", Q.And((T("foo"), T("bar")))),
    ("+foo bar", Q.ReqOpt(T("foo"), T("bar"))),
    ("+foo +bar baz", Q.ReqOpt(Q.And((T("foo"), T("bar"))), T("baz"))),
    ("+foo bar -baz", Q.Not(Q.ReqOpt(T("foo"), T("bar")), T("baz"))),
    ("NOT foo bar", Q.Not(T("bar"), T("foo"))),
    ("foo AND bar baz",
     Q.ReqOpt(Q.And((T("foo"), T("bar"))), T("baz"))),
    ("+(a b) -c", Q.Not(Q.Or((T("a"), T("b"))), T("c"))),
    ('"quick brown"~2', Q.Phrase(("quick", "brown"), 2)),
    ("/ab?c/", Q.MultiTerm("regexp", "ab?c")),
    ("f:[aa TO bb]", Q.MultiTerm("range", ("aa", "bb", True, True))),
    ("{aa TO bb}", Q.MultiTerm("range", ("aa", "bb", False, False))),
    ("fn:ordered(quick brown fox)",
     Q.Interval(("ordered", (t("quick"), t("brown"), t("fox"))))),
    ("fn:maxgaps(5 fn:ordered(quick brown))",
     Q.Interval(("maxgaps", ("ordered", (t("quick"), t("brown"))), 5))),
    ("fn:maxwidth(7 fn:unordered(a b))",
     Q.Interval(("maxwidth", ("unordered", (t("a"), t("b"))), 7))),
    ("fn:atLeast(2 a b c)",
     Q.Interval(("atleast", 2, (t("a"), t("b"), t("c"))))),
    ("fn:within(a 3 b)", Q.Interval(("within", t("a"), 3, t("b")))),
    ("fn:notWithin(a 3 b)",
     Q.Interval(("not_within", t("a"), 3, t("b")))),
    ("fn:before(a b)", Q.Interval(("before", t("a"), t("b")))),
    ("fn:after(a b)", Q.Interval(("after", t("a"), t("b")))),
    ("fn:containing(fn:unordered(a b) c)",
     Q.Interval(("containing", ("unordered", (t("a"), t("b"))),
                 t("c")))),
    ("fn:containedBy(a fn:unordered(b c))",
     Q.Interval(("contained_by", t("a"),
                 ("unordered", (t("b"), t("c")))))),
    ("fn:nonOverlapping(fn:phrase(a b) c)",
     Q.Interval(("non_overlapping", ("phrase", (t("a"), t("b"))),
                 t("c")))),
    ("fn:extend(a 1 2)", Q.Interval(("extend", t("a"), 1, 2))),
    ('fn:ordered("quick brown" fox)',
     Q.Interval(("ordered", (("phrase", (t("quick"), t("brown"))),
                             t("fox"))))),
    ("fn:or(a b) AND other",
     Q.And((Q.Interval(("or", (t("a"), t("b")))), T("other")))),
]


@pytest.mark.parametrize("text,want", GOLDEN,
                         ids=[g[0] for g in GOLDEN])
def test_golden_parse_trees(text, want):
    assert parse_standard(text) == want


def test_default_operator_and():
    assert parse_standard("foo bar", default_operator="AND") == \
        Q.And((T("foo"), T("bar")))
    assert parse_standard("foo OR bar", default_operator="AND") == \
        Q.Or((T("foo"), T("bar")))


@pytest.mark.parametrize("bad", [
    "", "foo AND", "(a b", "fn:ordered", "fn:ordered(", "fn:bogus(a b)",
    "fn:maxgaps(a b)", "-foo -bar", "a ^2",
])
def test_parse_errors(bad):
    with pytest.raises(QueryParseError):
        parse_standard(bad)


def test_reqopt_engine_parity(spark):
    """ReqOptSumScorer float parity: Spark engine == OracleIndex exactly
    (required match set; optional score added where both match)."""
    from lucene_spark.operators.build import build_index
    from lucene_spark.operators.search import Searcher
    from lucene_spark.oracle import OracleIndex
    from lucene_spark.sources.corpus import generate_corpus

    corpus = generate_corpus(250, seed=37)
    oracle = OracleIndex.build(list(zip(corpus.doc_id, corpus.content)))
    d = tempfile.mkdtemp(prefix="lucene_spark_flex_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=4)
    s = Searcher(spark, d)
    for text in ("+parse token", "+parse +if flush",
                 "+parse token -codec", 'if AND return "mixed case"'):
        q = parse_standard(text)
        for mode in ("exhaustive", "auto"):
            got = [(r["doc_id"], r["score"])
                   for r in s.search(q, k=10, mode=mode).collect()]
            want = oracle.top_k(q, k=10)
            assert [g[0] for g in got] == [w[0] for w in want], (text, mode)
            assert np.allclose([g[1] for g in got],
                               [w[1] for w in want],
                               rtol=0, atol=0), (text, mode)


def test_fn_interval_engine_parity(spark):
    """fn: syntax routes into the interval kernels unchanged: parsed
    query scores == directly-constructed Interval query scores."""
    from lucene_spark.operators.build import build_index
    from lucene_spark.operators.search import Searcher
    from lucene_spark.sources.corpus import generate_corpus

    corpus = generate_corpus(250, seed=41)
    d = tempfile.mkdtemp(prefix="lucene_spark_flexiv_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=4)
    s = Searcher(spark, d)
    parsed = parse_standard("fn:maxgaps(4 fn:ordered(if return))")
    direct = Q.Interval(("maxgaps",
                         ("ordered", (("term", "if"), ("term", "return"))),
                         4))
    assert parsed == direct
    got = [(r["doc_id"], r["score"])
           for r in s.search(parsed, k=10).collect()]
    want = [(r["doc_id"], r["score"])
            for r in s.search(direct, k=10).collect()]
    assert got == want
