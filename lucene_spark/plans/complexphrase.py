"""ComplexPhraseQueryParser → span algebra.

Reference: ``queryparser/complexPhrase/ComplexPhraseQueryParser.java:47``
(+ the nested ``ComplexPhraseQuery.rewrite`` at ``:222-320``): a query
language where PHRASE content may itself contain wildcards, fuzzy terms
and alternation groups — ``"(john jon jonathan~) peters*"`` — rewritten
to span queries: plain words → SpanTerm, wildcard/prefix/fuzzy →
SpanMultiTermQueryWrapper, parenthesized groups → SpanOr, the whole
phrase → SpanNearQuery(clauses, slop, inOrder) (``:278-307``).

Supported grammar (documented subset — the reference feeds phrase
content through the full classic parser; field prefixes and nested
boolean operators inside phrases are out of scope):

    input  := unit+                      (units OR-combined; +x → MUST,
                                          -x → MUST_NOT; a MUST/SHOULD
                                          mix compiles to a conjunction —
                                          documented divergence from the
                                          classic ReqOptSum blend, same
                                          subset as plans/parser.py)
    unit   := ['+'|'-'] (phrase | word)
    phrase := '"' clause+ '"' ['~' digits]
    clause := group | atom
    group  := '(' atom+ ')'              → SpanOr of its atoms
    atom   := word ['*' | '~' [digits]]  (embedded ?/* → wildcard)

A pure-term ordered phrase reduces to PhraseQuery(slop) exactly like
the reference's rewrite keeps simple phrases (``:231-247``); any
special clause (or ``in_order=False``) produces the SpanNear form. A
single-clause phrase unwraps to that clause's query (``:249-257``).
"""

from __future__ import annotations

import re

from . import query as Q

_UNIT = re.compile(r'([+-]?)(\"[^\"]*\"(?:~\d+)?|\S+)')
_PHRASE = re.compile(r'^\"([^\"]*)\"(?:~(\d+))?$')
_PTOK = re.compile(r'\(|\)|[^\s()]+')
_FUZZY = re.compile(r'^(.+?)~(\d*)$')


class ComplexPhraseSyntaxError(ValueError):
    pass


def _atom(tok: str):
    """One phrase atom → a term string (plain) or a span-capable query."""
    m = _FUZZY.match(tok)
    if m and not m.group(1).endswith("\\"):
        edits = int(m.group(2)) if m.group(2) else 2
        return Q.SpanMultiTermWrapper(
            Q.MultiTerm("fuzzy", m.group(1), edits=edits))
    if tok.endswith("*") and "*" not in tok[:-1] and "?" not in tok:
        return Q.SpanMultiTermWrapper(Q.MultiTerm("prefix", tok[:-1]))
    if "*" in tok or "?" in tok:
        return Q.SpanMultiTermWrapper(Q.MultiTerm("wildcard", tok))
    return tok                                  # plain term


def _parse_phrase(body: str, slop: int, in_order: bool):
    toks = _PTOK.findall(body)
    clauses: list = []
    i = 0
    while i < len(toks):
        t = toks[i]
        if t == "(":
            j = i + 1
            group: list = []
            while j < len(toks) and toks[j] != ")":
                if toks[j] == "(":
                    raise ComplexPhraseSyntaxError("nested group")
                group.append(_atom(toks[j]))
                j += 1
            if j >= len(toks):
                raise ComplexPhraseSyntaxError("unclosed group")
            if not group:
                raise ComplexPhraseSyntaxError("empty group")
            clauses.append(Q.SpanOr(tuple(
                Q.Term(g) if isinstance(g, str) else g for g in group)))
            i = j + 1
        elif t == ")":
            raise ComplexPhraseSyntaxError("unbalanced )")
        else:
            clauses.append(_atom(t))
            i += 1
    if not clauses:
        raise ComplexPhraseSyntaxError("empty phrase")
    if len(clauses) == 1:
        c = clauses[0]
        if isinstance(c, str):
            return Q.Term(c)
        if isinstance(c, Q.SpanMultiTermWrapper):
            return c.query                      # bare multiterm (:249-257)
        return c
    if in_order and all(isinstance(c, str) for c in clauses):
        # simple phrase stays a PhraseQuery (:231-247)
        return Q.Phrase(tuple(clauses), slop=slop)
    return Q.SpanNear(tuple(clauses), slop=slop, in_order=in_order)


def parse_complex_phrase(s: str, in_order: bool = True):
    """Parse ``s``; returns a query node. ``in_order`` mirrors
    ``ComplexPhraseQueryParser.setInOrder`` (``:69-76``) and applies to
    every phrase in the input."""
    shoulds: list = []
    musts: list = []
    must_nots: list = []
    for sign, body in _UNIT.findall(s):
        pm = _PHRASE.match(body)
        if pm:
            q = _parse_phrase(pm.group(1),
                              int(pm.group(2)) if pm.group(2) else 0,
                              in_order)
        else:
            a = _atom(body)
            if isinstance(a, str):
                q = Q.Term(a)
            elif isinstance(a, Q.SpanMultiTermWrapper):
                q = a.query
            else:
                q = a
        (must_nots if sign == "-" else
         musts if sign == "+" else shoulds).append(q)
    if not shoulds and not musts:
        raise ComplexPhraseSyntaxError("no positive clauses")
    if musts:
        pos = Q.And(tuple(musts + shoulds)) if shoulds else (
            musts[0] if len(musts) == 1 else Q.And(tuple(musts)))
    else:
        pos = shoulds[0] if len(shoulds) == 1 else Q.Or(tuple(shoulds))
    for n in must_nots:
        pos = Q.Not(pos, n)
    return pos
