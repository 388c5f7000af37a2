"""CoreParser (XML query syntax): golden trees + engine parity.

Reference: ``queryparser/xml/CoreParser.java:40`` + the builders in
``queryparser/xml/builders/``.
"""

from __future__ import annotations

import tempfile

import numpy as np
import pytest

from lucene_spark.plans import query as Q
from lucene_spark.plans.parser import QueryParseError
from lucene_spark.plans.xmlparser import parse_xml

T = Q.Term

GOLDEN = [
    ("<TermQuery>Foo</TermQuery>", T("foo")),
    ('<TermQuery boost="2">foo</TermQuery>', T("foo", 2.0)),
    ("<TermsQuery>foo bar foo</TermsQuery>",
     Q.Or((T("foo"), T("bar")))),
    ("""<BooleanQuery>
          <Clause occurs="must"><TermQuery>a</TermQuery></Clause>
          <Clause occurs="should"><TermQuery>b</TermQuery></Clause>
          <Clause occurs="mustNot"><TermQuery>c</TermQuery></Clause>
        </BooleanQuery>""",
     Q.Not(Q.ReqOpt(T("a"), T("b")), T("c"))),
    ('<DisjunctionMaxQuery tieBreaker="0.3">'
     "<TermQuery>a</TermQuery><TermQuery>b</TermQuery>"
     "</DisjunctionMaxQuery>",
     Q.DisMax((T("a"), T("b")), 0.3)),
    ('<RangeQuery lowerTerm="aa" upperTerm="bb" includeUpper="false"/>',
     Q.MultiTerm("range", ("aa", "bb", True, False))),
    ("<UserQuery>a AND b</UserQuery>", Q.And((T("a"), T("b")))),
    ("<BoostingTermQuery>pay</BoostingTermQuery>",
     Q.PayloadScore("pay")),
    ('<SpanNear slop="3" inOrder="false">'
     "<SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm></SpanNear>",
     Q.SpanNear(("a", "b"), slop=3, in_order=False)),
    ("<SpanOr><SpanTerm>a</SpanTerm>"
     '<SpanNear slop="2"><SpanTerm>b</SpanTerm><SpanTerm>c</SpanTerm>'
     "</SpanNear></SpanOr>",
     Q.SpanOr((T("a"), Q.SpanNear(("b", "c"), slop=2, in_order=True)))),
    ("<SpanOrTerms>a b</SpanOrTerms>", Q.SpanOr((T("a"), T("b")))),
    ('<SpanFirst end="20"><SpanTerm>a</SpanTerm></SpanFirst>',
     Q.SpanFirst(T("a"), 20)),
    ("<SpanNot><Include><SpanTerm>a</SpanTerm></Include>"
     "<Exclude><SpanTerm>b</SpanTerm></Exclude></SpanNot>",
     Q.SpanNot(T("a"), T("b"))),
    ('<SpanPositionRange start="2" end="9">'
     "<SpanTerm>a</SpanTerm></SpanPositionRange>",
     Q.SpanPositionRange(T("a"), 2, 9)),
]


@pytest.mark.parametrize("xml,want", GOLDEN,
                         ids=[g[0][:40] for g in GOLDEN])
def test_golden_xml_trees(xml, want):
    assert parse_xml(xml) == want


@pytest.mark.parametrize("bad", [
    "not xml at all <",
    "<UnknownQuery>x</UnknownQuery>",
    "<MatchAllDocsQuery/>",
    "<PointRangeQuery/>",
    "<BooleanQuery><TermQuery>a</TermQuery></BooleanQuery>",
    '<BooleanQuery><Clause occurs="weird">'
    "<TermQuery>a</TermQuery></Clause></BooleanQuery>",
    "<TermQuery>two words</TermQuery>",
    "<SpanNot><Include><SpanTerm>a</SpanTerm></Include></SpanNot>",
])
def test_xml_parse_errors(bad):
    with pytest.raises(QueryParseError):
        parse_xml(bad)


def test_xml_engine_parity(spark):
    """Parsed XML boolean/span queries score float-identically to the
    OracleIndex (same nodes the direct API builds)."""
    from lucene_spark.operators.build import build_index
    from lucene_spark.operators.search import Searcher
    from lucene_spark.oracle import OracleIndex
    from lucene_spark.sources.corpus import generate_corpus

    corpus = generate_corpus(250, seed=53)
    oracle = OracleIndex.build(list(zip(corpus.doc_id, corpus.content)))
    d = tempfile.mkdtemp(prefix="lucene_spark_xml_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=4)
    s = Searcher(spark, d)
    xmls = [
        """<BooleanQuery>
             <Clause occurs="must"><TermQuery>parse</TermQuery></Clause>
             <Clause occurs="should"><TermQuery>token</TermQuery></Clause>
           </BooleanQuery>""",
        "<TermsQuery>if return</TermsQuery>",
        '<DisjunctionMaxQuery tieBreaker="0.5">'
        "<TermQuery>if</TermQuery><TermQuery>codec</TermQuery>"
        "</DisjunctionMaxQuery>",
        "<UserQuery>parse AND token</UserQuery>",
        '<SpanNear slop="3" inOrder="false">'
        "<SpanTerm>if</SpanTerm><SpanTerm>return</SpanTerm></SpanNear>",
    ]
    for xml in xmls:
        q = parse_xml(xml)
        got = [(r["doc_id"], r["score"])
               for r in s.search(q, k=10, mode="exhaustive").collect()]
        want = oracle.top_k(q, k=10)
        assert [g[0] for g in got] == [w[0] for w in want], xml
        assert np.allclose([g[1] for g in got], [w[1] for w in want],
                           rtol=0, atol=0), xml
