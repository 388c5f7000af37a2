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


# ---------------------------------------------------------------------------
# PointsConfig (flexible/standard/config/PointsConfig.java +
# PointQueryNodeProcessor / PointRangeQueryNodeProcessor /
# PointRangeQueryNodeBuilder)
# ---------------------------------------------------------------------------

_PC = {"price": "long", "qty": "int", "score": "double", "weight": "float"}


def test_points_config_parse_trees():
    P = Q.PointRange
    assert parse_standard("price:[10 TO 20]", points_config=_PC) == \
        P("price", 10, 20)
    # exclusive integer bounds: the builder's ±1
    assert parse_standard("price:{10 TO 20}", points_config=_PC) == \
        P("price", 11, 19)
    # open ends ('*') = unbounded (MIN/MAX_VALUE role)
    assert parse_standard("price:[* TO 20}", points_config=_PC) == \
        P("price", None, 19)
    # bare term on a configured field = degenerate inclusive range
    assert parse_standard("qty:7", points_config=_PC) == P("qty", 7, 7)
    # NumberFormat truncation for integer types
    assert parse_standard("qty:7.9", points_config=_PC) == P("qty", 7, 7)
    # double: nextUp/nextDown on exclusive bounds
    got = parse_standard("score:{1.5 TO 2.5}", points_config=_PC)
    import math
    assert got == Q.PointRange("score", math.nextafter(1.5, math.inf),
                               math.nextafter(2.5, -math.inf))
    # float: the adjustment happens in FLOAT precision
    got = parse_standard("weight:{1.5 TO 2.5}", points_config=_PC)
    assert got == Q.PointRange(
        "weight",
        float(np.nextafter(np.float32(1.5), np.float32(np.inf))),
        float(np.nextafter(np.float32(2.5), np.float32(-np.inf))))
    # unconfigured fields keep the TermRange behavior
    assert parse_standard("name:[a TO c]", points_config=_PC) == \
        Q.MultiTerm("range", ("a", "c", True, True))


def test_points_config_engine_parity(spark):
    """Term AND point-range == brute force: the term part scores through
    the normal kernels, the point clause semi-joins its pushed docvalues
    scan, and the MUST point adds a constant 1.0 (double sum, one
    float32 cast)."""
    import pandas as pd

    from lucene_spark.operators.build import build_index
    from lucene_spark.operators.search import Searcher
    from lucene_spark.oracle import OracleIndex
    from lucene_spark.sources.corpus import generate_corpus

    corpus = generate_corpus(250, seed=53)
    pdf = pd.DataFrame({"doc_id": corpus.doc_id,
                        "content": corpus.content})
    pdf["price"] = (pdf["doc_id"] * 37) % 100
    oracle = OracleIndex.build(list(zip(pdf.doc_id, pdf.content)))
    d = tempfile.mkdtemp(prefix="lucene_spark_points_")
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=4)
    s = Searcher(spark, d)

    q = parse_standard("parse AND price:[10 TO 40}",
                       points_config={"price": "long"})
    assert q == Q.And((T("parse"), Q.PointRange("price", 10, 39)))
    got = [(r["doc_id"], r["score"])
           for r in s.search(q, k=10).collect()]

    allowed = set(pdf.loc[(pdf.price >= 10) & (pdf.price <= 39),
                          "doc_id"])
    scored = [(d_, np.float32(np.float64(sc) + 1.0))
              for d_, sc in oracle.top_k(Q.Term("parse"), k=10_000)
              if d_ in allowed]
    scored.sort(key=lambda x: (-x[1], x[0]))
    want = scored[:10]
    assert [g[0] for g in got] == [w[0] for w in want]
    assert np.array_equal(np.array([g[1] for g in got], dtype=np.float32),
                          np.array([w[1] for w in want], dtype=np.float32))

    # standalone point query: constant score 1.0, doc_id tie-break
    got2 = [(r["doc_id"], r["score"])
            for r in s.search(Q.PointRange("price", 0, 5), k=8).collect()]
    want2 = sorted(d_ for d_ in pdf.loc[pdf.price <= 5, "doc_id"])[:8]
    assert [g[0] for g in got2] == list(want2)
    assert all(g[1] == np.float32(1.0) for g in got2)

    # MUST_NOT point: anti-join
    q3 = Q.Not(T("parse"), Q.PointRange("price", 10, 39))
    got3 = [r["doc_id"] for r in s.search(q3, k=10).collect()]
    scored3 = [(d_, sc) for d_, sc in oracle.top_k(Q.Term("parse"),
                                                   k=10_000)
               if d_ not in allowed]
    scored3.sort(key=lambda x: (-x[1], x[0]))
    assert got3 == [d_ for d_, _ in scored3[:10]]
