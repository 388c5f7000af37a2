"""XML query parser (CoreParser subset).

Reference: ``queryparser/xml/CoreParser.java:40`` — an element-name →
QueryBuilder dispatch over a DOM; builders in
``queryparser/xml/builders/``. Same shape here: one recursive dispatch
from ``xml.etree`` elements onto the :mod:`plans.query` dataclasses.

Supported elements (the reference's core builder set):

* ``<TermQuery boost=…>text</TermQuery>`` (TermQueryBuilder — text is
  analyzed; multi-token analysis raises like the reference's
  single-term contract)
* ``<TermsQuery>w1 w2 …</TermsQuery>`` (TermsQueryBuilder: analyzed
  tokens as a SHOULD disjunction)
* ``<BooleanQuery>`` with ``<Clause occurs="must|should|mustNot">``
  children (BooleanQueryBuilder) → :func:`plans.query.bool_query`
* ``<DisjunctionMaxQuery tieBreaker=…>`` (DisjunctionMaxQueryBuilder)
* ``<RangeQuery lowerTerm=… upperTerm=… includeLower=… includeUpper=…/>``
  (RangeQueryBuilder → term range)
* ``<UserQuery>classic syntax</UserQuery>`` (UserInputQueryBuilder →
  the classic parser)
* ``<BoostingTermQuery>term</BoostingTermQuery>`` (BoostingTermBuilder
  → payload-scored term, :class:`plans.query.PayloadScore`)
* spans: ``<SpanTerm>``, ``<SpanOr>``, ``<SpanOrTerms>``,
  ``<SpanNear slop=… inOrder=…>``, ``<SpanFirst end=…>``,
  ``<SpanNot><Include/><Exclude/></SpanNot>``,
  ``<SpanPositionRange start=… end=…>`` (SpanQueryBuilderFactory set)

Documented out of scope: ``MatchAllDocsQuery`` / ``ConstantScoreQuery``
(no standalone constant-score node — our filter path is
``Searcher.matching_docs``), ``PointRangeQuery`` (numeric predicates are
pushed parquet scans over doc_meta, a different surface), LikeThis /
FuzzyLikeThis (the MLT operator has its own API). Field attributes are
accepted and ignored (single content field).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from ..functions.analysis import analyze_text
from . import query as Q
from .parser import QueryParseError, parse as parse_classic

_UNSUPPORTED = {"MatchAllDocsQuery", "ConstantScoreQuery",
                "PointRangeQuery", "LikeThisQuery", "FuzzyLikeThisQuery"}


def parse_xml(text: str, stopwords: frozenset[str] = frozenset()) -> Q.Query:
    """Parse a CoreParser XML document into a query tree."""
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        raise QueryParseError(f"bad XML: {e}") from e
    return _build(root, stopwords)


def _analyze_one(el, stopwords) -> str:
    terms, _, _ = analyze_text((el.text or "").strip(),
                               stopwords=stopwords)
    if len(terms) != 1:
        raise QueryParseError(
            f"<{el.tag}> needs exactly one analyzed term, got {terms}")
    return terms[0]


def _boost(el) -> float:
    return float(el.get("boost", "1.0"))


def _build(el, stopwords) -> Q.Query:
    tag = el.tag
    if tag in _UNSUPPORTED:
        raise QueryParseError(f"<{tag}> is documented out of scope")
    if tag == "TermQuery":
        return Q.Term(_analyze_one(el, stopwords), _boost(el))
    if tag == "TermsQuery":
        terms, _, _ = analyze_text((el.text or "").strip(),
                                   stopwords=stopwords)
        if not terms:
            raise QueryParseError("<TermsQuery> analyzed to nothing")
        uniq = tuple(dict.fromkeys(terms))
        if len(uniq) == 1:
            return Q.Term(uniq[0])
        return Q.Or(tuple(Q.Term(t) for t in uniq))
    if tag == "BooleanQuery":
        must, should, must_not = [], [], []
        for cl in el:
            if cl.tag != "Clause":
                raise QueryParseError(
                    f"<BooleanQuery> child must be <Clause>, got "
                    f"<{cl.tag}>")
            kids = list(cl)
            if len(kids) != 1:
                raise QueryParseError("<Clause> needs exactly one child")
            q = _build(kids[0], stopwords)
            occ = cl.get("occurs", "should")
            if occ == "must":
                must.append(q)
            elif occ == "mustNot":
                must_not.append(q)
            elif occ == "should":
                should.append(q)
            else:
                raise QueryParseError(f"bad occurs={occ!r}")
        try:
            return Q.bool_query(tuple(must), tuple(should),
                                tuple(must_not))
        except ValueError as e:
            raise QueryParseError(str(e)) from e
    if tag == "DisjunctionMaxQuery":
        clauses = tuple(_build(k, stopwords) for k in el)
        if not clauses:
            raise QueryParseError("<DisjunctionMaxQuery> needs children")
        return Q.DisMax(clauses, float(el.get("tieBreaker", "0.0")))
    if tag == "RangeQuery":
        lo, hi = el.get("lowerTerm"), el.get("upperTerm")
        if lo is None or hi is None:
            raise QueryParseError("<RangeQuery> needs lowerTerm/upperTerm")
        return Q.MultiTerm("range", (
            lo.lower(), hi.lower(),
            el.get("includeLower", "true") == "true",
            el.get("includeUpper", "true") == "true"))
    if tag == "UserQuery":
        return parse_classic((el.text or "").strip(), stopwords=stopwords)
    if tag == "BoostingTermQuery":
        return Q.PayloadScore(_analyze_one(el, stopwords),
                              boost=_boost(el))
    if tag == "SpanTerm":
        # a lone span term degrades to the term query, like the
        # reference's SpanTermQuery scoring
        return Q.Term(_analyze_one(el, stopwords))
    if tag in ("SpanOr", "SpanNear", "SpanFirst", "SpanNot",
               "SpanPositionRange", "SpanOrTerms"):
        return _build_span(el, stopwords)
    raise QueryParseError(f"unknown element <{tag}>")


def _span_child(el, stopwords):
    """A span sub-node: SpanTerm stays a bare term string inside
    SpanNear (the width-1 stream fast path); other span elements build
    their Q nodes."""
    if el.tag == "SpanTerm":
        return _analyze_one(el, stopwords)
    if el.tag in ("SpanOr", "SpanNear", "SpanFirst", "SpanNot",
                  "SpanPositionRange", "SpanOrTerms"):
        return _build_span(el, stopwords)
    raise QueryParseError(
        f"<{el.tag}> is not a span query element")


def _as_span_query(node):
    return Q.Term(node) if isinstance(node, str) else node


def _build_span(el, stopwords) -> Q.Query:
    tag = el.tag
    if tag == "SpanNear":
        kids = tuple(_span_child(k, stopwords) for k in el)
        if not kids:
            raise QueryParseError("<SpanNear> needs children")
        return Q.SpanNear(kids, slop=int(el.get("slop", "0")),
                          in_order=el.get("inOrder", "true") == "true")
    if tag == "SpanOr":
        kids = tuple(_as_span_query(_span_child(k, stopwords))
                     for k in el)
        if not kids:
            raise QueryParseError("<SpanOr> needs children")
        return Q.SpanOr(kids)
    if tag == "SpanOrTerms":
        terms, _, _ = analyze_text((el.text or "").strip(),
                                   stopwords=stopwords)
        if not terms:
            raise QueryParseError("<SpanOrTerms> analyzed to nothing")
        return Q.SpanOr(tuple(Q.Term(t)
                              for t in dict.fromkeys(terms)))
    if tag == "SpanFirst":
        kids = list(el)
        if len(kids) != 1:
            raise QueryParseError("<SpanFirst> needs one child")
        return Q.SpanFirst(_as_span_query(_span_child(kids[0],
                                                      stopwords)),
                           int(el.get("end", "1")))
    if tag == "SpanNot":
        inc = el.find("Include")
        exc = el.find("Exclude")
        if inc is None or exc is None or len(list(inc)) != 1 \
                or len(list(exc)) != 1:
            raise QueryParseError(
                "<SpanNot> needs <Include> and <Exclude>, one child each")
        return Q.SpanNot(
            _as_span_query(_span_child(list(inc)[0], stopwords)),
            _as_span_query(_span_child(list(exc)[0], stopwords)))
    if tag == "SpanPositionRange":
        kids = list(el)
        if len(kids) != 1:
            raise QueryParseError("<SpanPositionRange> needs one child")
        return Q.SpanPositionRange(
            _as_span_query(_span_child(kids[0], stopwords)),
            int(el.get("start", "0")), int(el.get("end", "1")))
    raise QueryParseError(f"unknown span element <{tag}>")
