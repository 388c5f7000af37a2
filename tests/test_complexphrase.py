"""ComplexPhraseQueryParser tests: golden parse shapes + engine/oracle
search parity for phrases with wildcards, fuzzy terms and alternation
groups (reference queryparser/complexPhrase)."""

from __future__ import annotations

import tempfile

import numpy as np
import pytest

from lucene_spark.operators.build import build_index
from lucene_spark.operators.search import Searcher
from lucene_spark.oracle import OracleIndex
from lucene_spark.plans import query as Q
from lucene_spark.plans.complexphrase import (ComplexPhraseSyntaxError,
                                              parse_complex_phrase)
from lucene_spark.sources.corpus import generate_corpus


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(250, seed=17)


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex.build(list(zip(corpus.doc_id, corpus.content)))


@pytest.fixture(scope="module")
def searcher(spark, corpus):
    d = tempfile.mkdtemp(prefix="lucene_spark_cpx_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=4)
    return Searcher(spark, d)


def test_golden_parses():
    # simple in-order phrase stays a PhraseQuery (rewrite :231-247)
    q = parse_complex_phrase('"codec util"~2')
    assert q == Q.Phrase(("codec", "util"), slop=2)
    # any special clause → SpanNear
    q = parse_complex_phrase('"(john jon) peters*"')
    assert isinstance(q, Q.SpanNear) and q.in_order and q.slop == 0
    g, p = q.terms
    assert g == Q.SpanOr((Q.Term("john"), Q.Term("jon")))
    assert isinstance(p, Q.SpanMultiTermWrapper)
    assert p.query.kind == "prefix" and p.query.value == "peters"
    # fuzzy atom with explicit edits
    q = parse_complex_phrase('"jonathan~1 smith"')
    f = q.terms[0]
    assert f.query.kind == "fuzzy" and f.query.edits == 1
    # unordered mode
    q = parse_complex_phrase('"(a b) c"~3', in_order=False)
    assert isinstance(q, Q.SpanNear) and not q.in_order and q.slop == 3
    # plain phrase, unordered → SpanNear too (PhraseQuery is ordered)
    q = parse_complex_phrase('"a b"~3', in_order=False)
    assert isinstance(q, Q.SpanNear) and not q.in_order
    # single-clause phrase unwraps (:249-257)
    assert parse_complex_phrase('"peters*"') == \
        Q.MultiTerm("prefix", "peters")
    assert parse_complex_phrase('"smith"') == Q.Term("smith")
    # boolean level: default OR, +/- occurs
    q = parse_complex_phrase('alpha "b c"')
    assert isinstance(q, Q.Or)
    q = parse_complex_phrase('+alpha -beta')
    assert isinstance(q, Q.Not)
    for bad in ('""', '"(a"', '"()"', '"a )"', "-onlyneg"):
        with pytest.raises(ComplexPhraseSyntaxError):
            parse_complex_phrase(bad)


@pytest.mark.parametrize("text,in_order", [
    ('"(parse scan) emit*"~4', True),
    ('"(parse scan) token"~5', False),
    ('"par* emit"~6', True),
    ('"return~1 if"~4', False),
    ('"(import def) (if return)"~5', False),
])
def test_parity_vs_oracle(searcher, oracle, text, in_order):
    q = parse_complex_phrase(text, in_order=in_order)
    got = [(r["doc_id"], np.float32(r["score"]))
           for r in searcher.search(q, k=10).collect()]
    want = [(d, np.float32(s)) for d, s in oracle.top_k(q, k=10)]
    assert len(want) > 0, text
    assert got == want, text
