"""SimpleQueryParser (reference ``lucene/queryparser/src/java/org/
apache/lucene/queryparser/simple/SimpleQueryParser.java:62``).

The "end-user" query language: a character-level scanner that NEVER
throws — malformed operator usage degrades to literal text, exactly the
reference's contract ("degrades gracefully ... will not throw
exceptions for syntax errors").

Grammar (each feature individually switchable via ``flags``, mirroring
the reference's ``AND_OPERATOR``/``OR_OPERATOR``/... bitmask):

* ``+``  between clauses — AND (binds tighter than ``|``, like the
  reference's ``buildQueryTree`` grouping)
* ``|``  between clauses — OR
* whitespace — the configurable ``default_operator`` (reference
  ``setDefaultOperator``; default SHOULD/OR)
* ``-``  prefix — NOT (MUST_NOT clause)
* ``"..."`` — phrase; trailing ``~N`` — phrase slop (NEAR)
* trailing ``*`` on a word — prefix query (constant-score rewrite)
* ``~N`` after a word — fuzzy query (FuzzyQuery's default blended
  top-terms scoring, like the reference)
* ``( ... )`` — precedence grouping
* ``\\x`` — escape: the next character is literal

Graceful-degradation choices (all matching the reference's observable
behavior): an unterminated quote runs to end-of-string; an unmatched
``)`` is ignored; an unmatched ``(`` groups to end-of-string; ``~``
with no digits after a word means fuzzy with the default 2 edits; a
clause set with no positive clause compiles to a query that matches
nothing (a lone MUST_NOT BooleanQuery matches no documents).
"""

from __future__ import annotations

from ..functions.analysis import analyze_text
from .query import And, MultiTerm, Not, Or, Phrase, Query, Term

#: all features on, reference DEFAULT_FLAGS
ALL_FLAGS = frozenset({"and", "or", "not", "phrase", "prefix", "fuzzy",
                       "near", "precedence", "whitespace", "escape"})

#: token kinds: ("op", ch) | ("word", text, tilde_edits, is_prefix)
#: | ("phrase", text, slop)


def _scan(text: str, flags: frozenset[str]) -> list[tuple]:
    toks: list[tuple] = []
    i, n = 0, len(text)
    word: list[str] = []
    last_escaped = False

    def _read_int(j: int) -> tuple[int | None, int]:
        k = j
        while k < n and text[k].isdigit():
            k += 1
        return (int(text[j:k]) if k > j else None), k

    def flush(tilde: int | None = None) -> None:
        nonlocal word, last_escaped
        if not word:
            return
        w = "".join(word)
        is_prefix = ("prefix" in flags and w.endswith("*")
                     and not last_escaped)
        if is_prefix:
            w = w[:-1]
        if w or tilde is not None:
            toks.append(("word", w, tilde, is_prefix))
        word, last_escaped = [], False

    while i < n:
        c = text[i]
        if c == "\\" and "escape" in flags and i + 1 < n:
            word.append(text[i + 1])
            last_escaped = True
            i += 2
            continue
        if c.isspace():
            flush()
            i += 1
            continue
        if c == '"' and "phrase" in flags:
            flush()
            j = text.find('"', i + 1)
            if j < 0:           # unterminated: runs to end of string
                body, i = text[i + 1:], n
            else:
                body, i = text[i + 1:j], j + 1
            slop = 0
            if i < n and text[i] == "~" and "near" in flags:
                v, i2 = _read_int(i + 1)
                if v is not None:
                    slop, i = v, i2
            toks.append(("phrase", body, slop))
            continue
        if c == "~" and "fuzzy" in flags and word:
            v, i = _read_int(i + 1)
            flush(tilde=v if v is not None else 2)
            continue
        if ((c == "+" and "and" in flags) or (c == "|" and "or" in flags)
                or (c == "-" and "not" in flags)
                or (c in "()" and "precedence" in flags)):
            flush()
            toks.append(("op", c))
            i += 1
            continue
        word.append(c)
        last_escaped = False
        i += 1
    flush()
    return toks


#: MatchNoDocsQuery role: a term no analyzer can ever produce (the
#: tokenizer never emits an empty-string term), so the plan is valid and
#: matches zero documents — used for empty / all-negative inputs.
_MATCH_NONE = Term("")


def _analyzed_atom(text: str, stopwords: frozenset[str],
                   default_and: bool) -> Query | None:
    terms, _, _ = analyze_text(text, stopwords=stopwords)
    if not terms:
        return None
    if len(terms) == 1:
        return Term(terms[0])
    # newDefaultQuery → createBooleanQuery(field, text, defaultOperator)
    node = And if default_and else Or
    return node(tuple(Term(t) for t in terms))


def parse_simple(text: str, default_operator: str = "or",
                 stopwords: frozenset[str] = frozenset(),
                 flags: frozenset[str] = ALL_FLAGS) -> Query:
    """Parse ``text`` with the simple query syntax; never raises."""
    default_and = default_operator.lower() == "and"
    toks = _scan(text, flags)
    pos = [0]

    def peek():
        return toks[pos[0]] if pos[0] < len(toks) else None

    def advance():
        t = toks[pos[0]]
        pos[0] += 1
        return t

    def atom() -> tuple[Query | None, bool]:
        """Returns (query_or_None, negated)."""
        t = peek()
        if t is None:
            return None, False
        if t[0] == "op":
            ch = t[1]
            if ch == "-":
                advance()
                q, _ = atom()
                return q, True
            if ch == "(":
                advance()
                q = or_expr()
                if peek() == ("op", ")"):
                    advance()
                return q, False
            if ch == ")":       # unmatched ) — ignore gracefully
                advance()
                return atom()
            # +/| with no left operand: ignore gracefully
            advance()
            return atom()
        t = advance()
        if t[0] == "phrase":
            terms, _, _ = analyze_text(t[1], stopwords=stopwords)
            if not terms:
                return None, False
            if len(terms) == 1:
                return Term(terms[0]), False
            return Phrase(tuple(terms), t[2]), False
        _, w, tilde, is_prefix = t
        if is_prefix:
            low = w.lower()
            return (MultiTerm("prefix", low) if low else None), False
        if tilde is not None:
            low = w.lower()
            if not low:
                return None, False
            # FuzzyQuery default: blended top-terms scoring
            return MultiTerm("fuzzy", low, edits=min(tilde, 2),
                             scored=True), False
        return _analyzed_atom(w, stopwords, default_and), False

    def and_expr() -> tuple[Query | None, list[Query]]:
        """One ``+``-joined group. Returns (combined_positive_query or
        None, floating negatives). A ``-`` clause binds into its AND
        group when the group has a positive clause (reference
        buildQueryTree sub-BooleanQuery); a lone ``-`` clause floats up
        as a MUST_NOT of the enclosing OR level."""
        positives: list[Query] = []
        negatives: list[Query] = []

        def absorb():
            q, negated = atom()
            if q is None:
                return
            (negatives if negated else positives).append(q)

        absorb()
        while True:
            t = peek()
            if t == ("op", "+"):
                advance()
                absorb()
            elif (default_and and t is not None
                  and t not in (("op", "|"), ("op", ")"))):
                absorb()        # whitespace = AND when default op is AND
            else:
                break
        if not positives:
            return None, negatives
        q = positives[0] if len(positives) == 1 else And(tuple(positives))
        for neg in negatives:
            q = Not(q, neg)
        return q, []

    def or_expr() -> Query | None:
        positives: list[Query] = []
        negatives: list[Query] = []
        while True:
            q, negs = and_expr()
            if q is not None:
                positives.append(q)
            negatives.extend(negs)
            t = peek()
            if t == ("op", "|"):
                advance()
            elif t is None or t == ("op", ")"):
                break
            elif default_and:
                break
            # else: whitespace juxtaposition with default OR — loop
        if not positives:
            return _MATCH_NONE if negatives else None
        q = positives[0] if len(positives) == 1 else Or(tuple(positives))
        for neg in negatives:
            q = Not(q, neg)
        return q

    q = or_expr()
    return q if q is not None else _MATCH_NONE
