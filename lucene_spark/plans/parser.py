"""Minimal classic-syntax query parser.

Covers the reference query-set grammar subset (reference
``queryparser/.../classic/QueryParser.jj:198-228`` — the benchmark query
files only use bare terms, AND/OR, NOT/-, parentheses and quoted phrases;
``benchmark/conf/query-terms.txt``, ``query-phrases.txt``). Terms are
re-analyzed with the same analyzer (QueryParserBase behavior), the default
operator is OR, and the field is fixed to the content column.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..functions.analysis import analyze_text
from .query import And, MultiTerm, Not, Or, Phrase, Query, Term

_TOKENS_RE = re.compile(r'"[^"]*"|\(|\)|[^\s()]+')


class QueryParseError(ValueError):
    pass


@dataclass
class _Negated:
    inner: Query


class _Dropped:
    """A clause whose text analyzed to nothing (all stopwords) — the
    classic QueryParser silently drops such clauses from the enclosing
    boolean (QueryParserBase.getFieldQuery returns null and addClause
    skips it), which is what makes QueryAutoStopWordAnalyzer work: the
    df-heavy clause vanishes, the rest of the query still runs."""


_DROPPED = _Dropped()


def _combine(positives: list[Query], negatives: list[Query],
             node) -> Query:
    if not positives:
        raise QueryParseError("query has only negative clauses")
    q: Query = positives[0] if len(positives) == 1 else node(tuple(positives))
    for n in negatives:
        q = Not(q, n)
    return q


def parse(text: str, stopwords: frozenset[str] = frozenset()) -> Query:
    toks = _TOKENS_RE.findall(text)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def advance():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_or() -> Query:
        pos_clauses: list[Query] = []
        neg_clauses: list[Query] = []

        def absorb(item):
            if item is _DROPPED:
                return
            if isinstance(item, _Negated):
                neg_clauses.append(item.inner)
            else:
                pos_clauses.append(item)

        absorb(parse_and())
        while peek() is not None and peek() != ")":
            if peek() in ("OR", "||"):
                advance()
            absorb(parse_and())  # bare juxtaposition = default OR
        if not pos_clauses and not neg_clauses:
            return _DROPPED
        return _combine(pos_clauses, neg_clauses, Or)

    def parse_and():
        first = parse_unary()
        pos_clauses: list[Query] = []
        neg_clauses: list[Query] = []
        if isinstance(first, _Negated):
            neg_clauses.append(first.inner)
        elif first is not _DROPPED:
            pos_clauses.append(first)
        while peek() in ("AND", "&&"):
            advance()
            nxt = parse_unary()
            if isinstance(nxt, _Negated):
                neg_clauses.append(nxt.inner)
            elif nxt is not _DROPPED:
                pos_clauses.append(nxt)
        if not pos_clauses and not neg_clauses:
            return _DROPPED
        if not pos_clauses:
            if len(neg_clauses) == 1:
                return _Negated(neg_clauses[0])
            return _Negated(Or(tuple(neg_clauses)))
        return _combine(pos_clauses, neg_clauses, And)

    def parse_unary():
        t = peek()
        if t is None:
            raise QueryParseError("unexpected end of query")
        if t in ("NOT", "!"):
            advance()
            nxt = parse_unary()
            if nxt is _DROPPED:
                return _DROPPED  # negation of a dropped clause drops too
            if isinstance(nxt, _Negated):
                return nxt.inner  # double negation
            return _Negated(nxt)
        if t.startswith("-") and len(t) > 1 and not t[1].isdigit():
            advance()
            a = _atom(t[1:])
            return _DROPPED if a is _DROPPED else _Negated(a)
        return parse_primary()

    def parse_primary() -> Query:
        t = advance()
        if t == "(":
            q = parse_or()
            if peek() != ")":
                raise QueryParseError("missing closing paren")
            advance()
            return q
        if t == ")":
            raise QueryParseError("unexpected )")
        if t[0] in "[{":  # term range: [a TO b] / {a TO b}
            parts = [t]
            while parts[-1][-1] not in "]}":
                if peek() is None:
                    raise QueryParseError("unterminated range")
                parts.append(advance())
            joined = " ".join(parts)
            m = re.match(r"^([\[{])\s*(\S+)\s+TO\s+(\S+?)\s*([\]}])$", joined)
            if not m:
                raise QueryParseError(f"bad range: {joined!r}")
            return MultiTerm("range", (m.group(2).lower(), m.group(3).lower(),
                                       m.group(1) == "[", m.group(4) == "]"))
        atom = _atom(t)
        nxt = peek()
        if atom is _DROPPED and nxt and re.match(r"^~\d+$", nxt):
            advance()  # consume slop of a fully-stopped phrase
            return _DROPPED
        if isinstance(atom, Phrase) and nxt and re.match(r"^~\d+$", nxt):
            advance()  # phrase slop: "a b"~2
            atom = Phrase(atom.terms, int(nxt[1:]))
        return atom

    def _atom(t: str) -> Query:
        boost = 1.0
        m = re.match(r'^(.*)\^(\d+(?:\.\d+)?)$', t)
        if m:
            t, boost = m.group(1), float(m.group(2))
        if ":" in t and not t.startswith('"'):
            t = t.split(":", 1)[1]  # field prefix; we index a single field
        if t.startswith('"') and t.endswith('"') and len(t) >= 2:
            terms, _, _ = analyze_text(t[1:-1], stopwords=stopwords)
            if not terms:
                return _DROPPED  # fully-stopped phrase: clause dropped
            return Term(terms[0], boost) if len(terms) == 1 else Phrase(tuple(terms))
        m = re.match(r"^(.+?)~(\d*)$", t)
        if m and "*" not in t and "?" not in t:  # fuzzy: word~ / word~1
            edits = int(m.group(2)) if m.group(2) else 2
            return MultiTerm("fuzzy", m.group(1).lower(), edits=edits,
                             boost=boost)
        if "*" in t or "?" in t:  # wildcard / prefix
            low = t.lower()
            if low.endswith("*") and "*" not in low[:-1] and "?" not in low:
                return MultiTerm("prefix", low[:-1], boost=boost)
            return MultiTerm("wildcard", low, boost=boost)
        terms, _, _ = analyze_text(t, stopwords=stopwords)
        if not terms:
            return _DROPPED  # stopword-only term: clause dropped
        # multi-token atom → phrase (QueryParserBase re-analysis behavior)
        return Term(terms[0], boost) if len(terms) == 1 else Phrase(tuple(terms))

    if not toks:
        raise QueryParseError("empty query")
    q = parse_or()
    if peek() is not None:
        raise QueryParseError(f"trailing input at {peek()!r}")
    if q is _DROPPED:
        # every clause was stopped away; the reference returns an empty
        # BooleanQuery (matches nothing) — we surface that as an error
        # rather than a silent empty result
        raise QueryParseError("query analyzed to nothing (all clauses "
                              "were stopwords)")
    return q
