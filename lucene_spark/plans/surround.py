"""Surround query language → span algebra.

Reference: the ``lucene/queryparser`` surround module
(``queryparser/surround/query/DistanceQuery.java`` and the ``surround``
parser package): a query language whose distance operators compile to
span queries — ``nW(...)`` = ordered within-n, ``nN(...)`` = unordered
within-n, mapped to ``SpanNearQuery(clauses, slop = n - 1, ordered)``
(``DistanceQuery.java:97``), composable with prefix boolean operators
and truncated (wildcard) terms via ``SpanMultiTermQueryWrapper``.

This is the PREFIX-operator subset of the surround grammar:

    expr     := distop | boolop | term
    distop   := [digits] ("W" | "N") "(" expr ("," expr)* ")"
    boolop   := ("AND" | "OR" | "NOT") "(" expr ("," expr)* ")"
    term     := word [* or ? wildcards]

Operator names are case-insensitive (``3w(a,b)`` ≡ ``3W(a,b)``); a
distance operator without digits means distance 1 (slop 0). Inside a
distance operator, OR maps to SpanOr, NOT to SpanNot and wildcard terms
to SpanMultiTermWrapper; AND is not a span operator (the reference
raises the same way). At the boolean level NOT(a, b, ...) means
``a AND NOT (b OR ...)``. The infix grammar and field prefixes of the
full surround parser are not implemented (documented subset).
"""

from __future__ import annotations

import re

from . import query as Q

_TOKEN = re.compile(r"\(|\)|,|[^\s(),]+")
_DIST = re.compile(r"^(\d*)([wWnN])$")


class SurroundSyntaxError(ValueError):
    pass


def parse_surround(text: str) -> Q.Query:
    """Parse a surround query string into the engine's query algebra."""
    toks = _TOKEN.findall(text)
    if not toks:
        raise SurroundSyntaxError("empty query")
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        if pos >= len(toks):
            raise SurroundSyntaxError("unexpected end of query")
        t = toks[pos]
        pos += 1
        return t

    def expect(t):
        got = take()
        if got != t:
            raise SurroundSyntaxError(f"expected {t!r}, got {got!r}")

    def parse_args(span_ctx: bool) -> list:
        expect("(")
        args = [parse_expr(span_ctx)]
        while peek() == ",":
            take()
            args.append(parse_expr(span_ctx))
        expect(")")
        return args

    def parse_expr(span_ctx: bool) -> Q.Query:
        t = take()
        up = t.upper()
        if peek() == "(":
            m = _DIST.match(t)
            if m:
                n = int(m.group(1) or 1)
                if n < 1:
                    raise SurroundSyntaxError(f"distance must be >= 1: {t}")
                ordered = m.group(2).upper() == "W"
                args = parse_args(span_ctx=True)
                if len(args) < 2:
                    raise SurroundSyntaxError(
                        f"{t}(...) needs at least two clauses")
                clauses = tuple(a.term if isinstance(a, Q.Term) else a
                                for a in args)
                return Q.SpanNear(clauses, slop=n - 1, in_order=ordered)
            if up in ("AND", "OR", "NOT"):
                args = parse_args(span_ctx=span_ctx)
                if up == "OR":
                    return Q.SpanOr(tuple(args)) if span_ctx \
                        else Q.Or(tuple(args))
                if up == "NOT":
                    if len(args) < 2:
                        raise SurroundSyntaxError("NOT needs two clauses")
                    neg = args[1] if len(args) == 2 else \
                        (Q.SpanOr(tuple(args[1:])) if span_ctx
                         else Q.Or(tuple(args[1:])))
                    return Q.SpanNot(args[0], neg) if span_ctx \
                        else Q.Not(args[0], neg)
                if span_ctx:
                    raise SurroundSyntaxError(
                        "AND is not a span operator inside W/N")
                return Q.And(tuple(args))
            raise SurroundSyntaxError(f"unknown operator {t!r}")
        term = t.lower()
        if "*" in term or "?" in term:
            if term.endswith("*") and "*" not in term[:-1] \
                    and "?" not in term:
                mt = Q.MultiTerm("prefix", term[:-1])
            else:
                mt = Q.MultiTerm("wildcard", term)
            return Q.SpanMultiTermWrapper(mt) if span_ctx else mt
        return Q.Term(term)

    out = parse_expr(False)
    if pos != len(toks):
        raise SurroundSyntaxError(f"trailing input at token {pos}: "
                                  f"{toks[pos]!r}")
    return out
