"""SimpleQueryParser: tree-shape goldens, graceful degradation, flag
gating, and end-to-end parity against the brute-force oracle."""

from __future__ import annotations

import pytest

from lucene_spark.plans.query import And, MultiTerm, Not, Or, Phrase, Term
from lucene_spark.plans.simple import ALL_FLAGS, parse_simple


def test_basic_operators():
    assert parse_simple("foo") == Term("foo")
    assert parse_simple("foo bar") == Or((Term("foo"), Term("bar")))
    assert parse_simple("foo + bar") == And((Term("foo"), Term("bar")))
    assert parse_simple("foo | bar") == Or((Term("foo"), Term("bar")))
    # + binds tighter than | (reference buildQueryTree grouping)
    assert parse_simple("a + b | c") == Or(
        (And((Term("a"), Term("b"))), Term("c")))
    assert parse_simple("a | b + c") == Or(
        (Term("a"), And((Term("b"), Term("c")))))


def test_operators_without_whitespace():
    assert parse_simple("foo+bar") == And((Term("foo"), Term("bar")))
    assert parse_simple("foo|bar") == Or((Term("foo"), Term("bar")))
    assert parse_simple("foo-bar") == Not(Term("foo"), Term("bar"))


def test_not_operator():
    assert parse_simple("-foo bar") == Not(Term("bar"), Term("foo"))
    # negation binds into its + group
    assert parse_simple("a + -b | c") == Or(
        (Not(Term("a"), Term("b")), Term("c")))
    # all-negative query matches nothing (lone MUST_NOT BooleanQuery)
    assert parse_simple("-foo") == Term("")


def test_phrase_and_slop():
    assert parse_simple('"foo bar"') == Phrase(("foo", "bar"))
    assert parse_simple('"foo bar"~3') == Phrase(("foo", "bar"), 3)
    assert parse_simple('"foo"') == Term("foo")
    # unterminated quote runs to end of string
    assert parse_simple('"foo bar') == Phrase(("foo", "bar"))


def test_prefix_and_fuzzy():
    assert parse_simple("fo*") == MultiTerm("prefix", "fo")
    assert parse_simple("foo~1") == MultiTerm("fuzzy", "foo", edits=1,
                                              scored=True)
    assert parse_simple("foo~") == MultiTerm("fuzzy", "foo", edits=2,
                                             scored=True)
    # edits clamped to the automaton max of 2
    assert parse_simple("foo~7") == MultiTerm("fuzzy", "foo", edits=2,
                                              scored=True)


def test_precedence_groups():
    assert parse_simple("(a | b) + c") == And(
        (Or((Term("a"), Term("b"))), Term("c")))
    assert parse_simple("a + (b | c)") == And(
        (Term("a"), Or((Term("b"), Term("c")))))


def test_default_operator_and():
    assert parse_simple("foo bar", default_operator="and") == And(
        (Term("foo"), Term("bar")))
    assert parse_simple("foo | bar baz", default_operator="and") == Or(
        (Term("foo"), And((Term("bar"), Term("baz")))))


def test_graceful_degradation_never_raises():
    for bad in ["", "   ", "+", "|", "-", "(", ")", "((", "))", '"',
                "a + (b", "a))", "+ + +", "~", "~2", "a ~", "\\", "-(-a)"]:
        parse_simple(bad)  # must not raise
    assert parse_simple("a + (b") == And((Term("a"), Term("b")))
    assert parse_simple("a))") == Term("a")


def test_escape_operator():
    # escaped operator chars are literal text (analyzer then splits)
    assert parse_simple(r"foo\+bar") == Or((Term("foo"), Term("bar")))
    # escaped trailing * is not a prefix query
    assert parse_simple(r"fo\*") == Term("fo")


def test_flag_gating():
    no_not = ALL_FLAGS - {"not"}
    assert parse_simple("-foo", flags=no_not) == Term("foo")
    no_prefix = ALL_FLAGS - {"prefix"}
    assert parse_simple("fo*", flags=no_prefix) == Term("fo")
    no_phrase = ALL_FLAGS - {"phrase"}
    assert parse_simple('"foo bar"', flags=no_phrase) == Or(
        (Term("foo"), Term("bar")))
    no_and = ALL_FLAGS - {"and"}
    assert parse_simple("a+b", flags=no_and) == Or((Term("a"), Term("b")))


def test_multi_token_word_uses_default_operator():
    # a word the analyzer splits becomes default-operator clauses
    assert parse_simple("foo.bar") == Or((Term("foo"), Term("bar")))
    assert parse_simple("foo.bar", default_operator="and") == And(
        (Term("foo"), Term("bar")))


@pytest.fixture(scope="module")
def engine(spark):
    import tempfile
    from lucene_spark.operators.build import build_index
    from lucene_spark.operators.search import Searcher
    from lucene_spark.oracle import OracleIndex
    from lucene_spark.sources.corpus import generate_corpus
    pdf = generate_corpus(300, seed=23)
    pdf = pdf[pdf.content.map(lambda s: s.isascii())].reset_index(drop=True)
    d = tempfile.mkdtemp(prefix="lucene_spark_simpleqp_")
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=4)
    oracle = OracleIndex.build(list(zip(pdf.doc_id, pdf.content)))
    return Searcher(spark, d), oracle


def test_end_to_end_parity(engine):
    s, oracle = engine
    for text in ["parse + emit", "parse | emit -token",
                 '"return if"~2', "parse emit flush",
                 "pars* + emit", "-parse emit | flush + token"]:
        q = parse_simple(text)
        got = [(r["doc_id"], r["score"]) for r in s.search(q, k=10).collect()]
        want = oracle.top_k(q, 10)
        assert [(d, float(x)) for d, x in want] == got, text


def test_match_none_runs_empty(engine):
    s, _ = engine
    assert s.search(parse_simple("-foo"), k=10).collect() == []
