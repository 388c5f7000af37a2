"""Pattern-based tokenizer and token filter (reference
``analysis/common/.../pattern/PatternTokenizer.java`` and
``pattern/PatternReplaceFilter.java``): regex tokenization (match-group
or split mode) and per-token regex replacement.

Dialect note (documented divergence): patterns are PYTHON ``re``
dialect — the analyzer chain executes in the Arrow UDF, so the
extension point is the host language's regex engine, exactly as the
reference's is Java's. Common constructs (literals, classes,
quantifiers, groups, anchors) coincide; Java-only escapes like
``\\p{Space}`` must be written as their Python equivalents (``\\s``).
Replacement strings use JAVA ``Matcher`` syntax (``$1`` backrefs,
``\\$`` literal dollar) and are converted — the reference's tests
transcode verbatim.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


def java_replacement_to_python(repl: str) -> str:
    """Convert a Java ``Matcher`` replacement string ($N group refs,
    ``\\$``/``\\\\`` escapes) to a Python ``re`` template (\\N refs,
    escaped backslashes). Documented edge divergence: Java's
    appendReplacement stops consuming digits once the number would
    exceed the pattern's group count ("$12" with 2 groups = group 1 +
    literal '2'); both this converter and Python's \\N consume all
    digits greedily."""
    out = []
    i, n = 0, len(repl)
    while i < n:
        c = repl[i]
        if c == "\\" and i + 1 < n:
            nxt = repl[i + 1]
            # Java: backslash escapes the next char literally
            out.append(nxt.replace("\\", "\\\\"))
            i += 2
        elif c == "$" and i + 1 < n and repl[i + 1].isdigit():
            j = i + 1
            while j < n and repl[j].isdigit():
                j += 1
            out.append("\\" + repl[i + 1:j])
            i = j
        else:
            out.append(c.replace("\\", "\\\\"))
            i += 1
    return "".join(out)


def pattern_tokens(text: str, pattern: re.Pattern, group: int) -> list[str]:
    """One document through PatternTokenizer.incrementToken
    (``pattern/PatternTokenizer.java:89-133``): ``group >= 0`` emits
    that capture group of every match (zero-length matches skipped);
    ``group == -1`` is String.split functionality — the text between
    matches, zero-length tokens skipped, plus the non-empty tail."""
    if not text:
        return []
    out: list[str] = []
    if group >= 0:
        for m in pattern.finditer(text):
            s, e = m.start(group), m.end(group)
            if s == e or s < 0:
                continue
            out.append(text[s:e])
        return out
    index = 0
    for m in pattern.finditer(text):
        if m.start() - index > 0:
            out.append(text[index:m.start()])
        index = m.end()
    if len(text) - index > 0:
        out.append(text[index:])
    return out


def compile_pattern_replace(spec: tuple):
    """``(pattern, replacement, all)`` → a str→str transform with the
    reference's PatternReplaceFilter semantics (``pattern/
    PatternReplaceFilter.java:59-72``): replaceAll or replaceFirst with
    Java replacement syntax; ``replacement=None`` means the empty
    string; tokens that become empty are KEPT (the reference's
    documented behavior — see TestPatternReplaceFilter.testStripFirst)."""
    pat, repl, rall = spec
    cre = re.compile(pat)
    pyrepl = java_replacement_to_python(repl if repl is not None else "")

    def xform(t: str) -> str:
        return cre.sub(pyrepl, t, count=0 if rall else 1)

    return xform


def scandinavian_fold(t: str) -> str:
    """ScandinavianFoldingFilter (reference ``miscellaneous/
    ScandinavianFoldingFilter.java:76-121``): å/ä/æ→a, ö/ø→o (both
    cases), and the double-letter spellings aa/ae/ao→a, oe/oo→o
    (second letter deleted), single left-to-right pass over the
    mutating buffer exactly like the reference's scan."""
    if all(c not in "åäæÅÄÆöøÖØaAoO" for c in t):
        return t
    buf = list(t)
    i = 0
    while i < len(buf):
        c = buf[i]
        if c in "åäæ":
            buf[i] = "a"
        elif c in "ÅÄÆ":
            buf[i] = "A"
        elif c in "øö":
            buf[i] = "o"
        elif c in "ØÖ":
            buf[i] = "O"
        elif i < len(buf) - 1:
            nxt = buf[i + 1]
            if c in "aA" and nxt in "aAeEoO":
                del buf[i + 1]
            elif c in "oO" and nxt in "eEoO":
                del buf[i + 1]
        i += 1
    return "".join(buf)


def scandinavian_normalize(t: str, foldings=frozenset(
        ("AA", "AO", "AE", "OE", "OO"))) -> str:
    """ScandinavianNormalizer.processToken (reference ``miscellaneous/
    ScandinavianNormalizer.java:73-135``): ä→æ, ö→ø (Swedish to
    Norwegian/Danish letters) and the configured double-letter foldings
    aa/aA→å, ao/aO→å, ae/aE→æ, oe/oO per set→ø — same mutating
    left-to-right scan as the reference."""
    buf = list(t)
    i = 0
    while i < len(buf):
        c = buf[i]
        if c == "ä":
            buf[i] = "æ"
        elif c == "Ä":
            buf[i] = "Æ"
        elif c == "ö":
            buf[i] = "ø"
        elif c == "Ö":
            buf[i] = "Ø"
        elif i < len(buf) - 1:
            nxt = buf[i + 1]
            if c == "a" and (("AA" in foldings and nxt in "aA")
                             or ("AO" in foldings and nxt in "oO")):
                del buf[i + 1]
                buf[i] = "å"
            elif c == "A" and (("AA" in foldings and nxt in "aA")
                               or ("AO" in foldings and nxt in "oO")):
                del buf[i + 1]
                buf[i] = "Å"
            elif c == "a" and "AE" in foldings and nxt in "eE":
                del buf[i + 1]
                buf[i] = "æ"
            elif c == "A" and "AE" in foldings and nxt in "eE":
                del buf[i + 1]
                buf[i] = "Æ"
            elif c == "o" and (("OE" in foldings and nxt in "eE")
                               or ("OO" in foldings and nxt in "oO")):
                del buf[i + 1]
                buf[i] = "ø"
            elif c == "O" and (("OE" in foldings and nxt in "eE")
                               or ("OO" in foldings and nxt in "oO")):
                del buf[i + 1]
                buf[i] = "Ø"
        i += 1
    return "".join(buf)


def capitalization_token(t: str,
                         only_first_word: bool = True,
                         keep: frozenset = frozenset(),
                         force_first_letter: bool = True,
                         ok_prefix: tuple = (),
                         min_word_length: int = 0,
                         max_word_count: int = 2 ** 31 - 1,
                         max_token_length: int = 2 ** 31 - 1) -> str:
    """CapitalizationFilter (reference ``miscellaneous/Capitalization
    Filter.java:109-196``): title-case the token's intra-token words
    (split on chars <= ' ' and '.'). only_first_word lowercases the
    rest; keep words pass unchanged (case-SENSITIVE, first letter still
    forced when force_first_letter); ok_prefix words pass; words below
    min_word_length pass; more than max_word_count words or a token at
    least max_token_length long leaves the token untouched."""
    if len(t) >= max_token_length:
        return t
    words = []
    start = 0
    for i, c in enumerate(t):
        if c <= " " or c == ".":
            if i > start:
                words.append((start, i))
            start = i + 1
    if start < len(t):
        words.append((start, len(t)))
    if len(words) > max_word_count:
        return t
    buf = list(t)

    def process(lo, hi, word_count):
        w = t[lo:hi]
        if only_first_word and word_count > 0:
            buf[lo:hi] = list(w.lower())
            return
        if w in keep:
            if word_count == 0 and force_first_letter:
                buf[lo] = w[0].upper()
            return
        if len(w) < min_word_length:
            return
        for p in ok_prefix:
            if w.startswith(p):
                return
        buf[lo:hi] = list(w[0].upper() + w[1:].lower())

    for n, (lo, hi) in enumerate(words):
        process(lo, hi, n)
    return "".join(buf)


def compile_token_filters(specs) -> tuple:
    """Compile the generic post-normalizer token-filter chain into
    (map_fn | None, keep_fn | None, limit | None) — the analyzer applies
    maps per unique token, the keep predicate as a gap-preserving drop
    (FilteringTokenFilter semantics), and the limit as a per-document
    emission cap. Maps compose in list order and apply BEFORE the keep
    predicate; the limit is chain-final (at most one keep set and one
    limit). Specs:

    - ``("trim",)`` — TrimFilter (``miscellaneous/TrimFilter.java``):
      strip leading/trailing whitespace (matters for keyword/pattern
      tokenizers — word-boundary tokenizers never pad).
    - ``("truncate", n)`` — TruncateTokenFilter (``miscellaneous/
      TruncateTokenFilter.java:46-52``): tokens longer than n cut to
      their first n chars (n >= 1).
    - ``("keep", words)`` — KeepWordFilter (``miscellaneous/
      KeepWordFilter.java:49-52``): drop every token NOT in the set,
      position gaps preserved like StopFilter (both extend
      FilteringTokenFilter).
    - ``("limit", n)`` — LimitTokenCountFilter (``miscellaneous/
      LimitTokenCountFilter.java:38-76``): at most n tokens emitted per
      document, counted AFTER the other filters (chain-final), the
      consumeAllTokens=true composition (norms still see only emitted
      tokens — FieldInvertState counts what reaches it).
    """
    maps: list = []
    keep_set = None
    keep_preds: list = []
    limit = None
    pos_limit = None
    for spec in specs:
        kind = spec[0]
        if kind == "trim":
            maps.append(str.strip)
        elif kind == "truncate":
            n = int(spec[1])
            if n < 1:
                raise ValueError("truncate length must be >= 1")
            maps.append(lambda t, _n=n: t[:_n])
        elif kind == "capitalization":
            opts = dict(spec[1]) if len(spec) > 1 else {}
            if "keep" in opts:
                opts["keep"] = frozenset(opts["keep"])
            if "ok_prefix" in opts:
                opts["ok_prefix"] = tuple(opts["ok_prefix"])
            maps.append(lambda t, _o=opts: capitalization_token(t, **_o))
        elif kind == "protected":
            # ProtectedTermFilter / ConditionalTokenFilter
            # (miscellaneous/ProtectedTermFilter.java): terms in the
            # protect set bypass the wrapped filters, everything else
            # runs them. Wrapped specs must be pure maps.
            protect = frozenset(spec[1])
            inner_map, inner_keep, inner_limit, inner_plimit = \
                compile_token_filters(spec[2])
            if (inner_keep is not None or inner_limit is not None
                    or inner_plimit is not None):
                raise ValueError("protected wraps map filters only")
            if inner_map is None:
                raise ValueError("protected needs wrapped filters")
            maps.append(lambda t, _p=protect, _m=inner_map:
                        t if t in _p else _m(t))
        elif kind == "scandinavian_fold":
            maps.append(scandinavian_fold)
        elif kind == "scandinavian_normalize":
            foldings = (frozenset(spec[1]) if len(spec) > 1
                        else frozenset(("AA", "AO", "AE", "OE", "OO")))
            maps.append(lambda t, _f=foldings:
                        scandinavian_normalize(t, _f))
        elif kind == "keep":
            if keep_set is not None:
                raise ValueError("at most one keep filter")
            keep_set = frozenset(spec[1])
        elif kind == "date_recognizer":
            # DateRecognizerFilter (miscellaneous/DateRecognizerFilter
            # .java): keep only tokens that parse as dates, gaps
            # preserved. Format is a strptime pattern (the reference
            # takes a DateFormat); full-token match — the reference's
            # lenient prefix-parse is a documented divergence.
            fmt = spec[1] if len(spec) > 1 else "%m/%d/%Y"
            import datetime as _dt

            def _is_date(t, _f=fmt):
                try:
                    _dt.datetime.strptime(t, _f)
                    return True
                except ValueError:
                    return False
            keep_preds.append(_is_date)
        elif kind == "codepoint_count":
            # CodepointCountFilter (miscellaneous/CodepointCountFilter
            # .java): keep tokens with min <= codePointCount <= max,
            # gaps preserved (FilteringTokenFilter). Python len() IS
            # the code-point count (vs LengthFilter's UTF-16 units).
            mn, mx = int(spec[1]), int(spec[2])
            if mn < 0 or mn > mx:
                raise ValueError("bad codepoint_count bounds")
            keep_preds.append(lambda t, _a=mn, _b=mx:
                              _a <= len(t) <= _b)
        elif kind == "limit":
            if limit is not None:
                raise ValueError("at most one limit filter")
            limit = int(spec[1])
            if limit < 1:
                raise ValueError("limit must be >= 1")
        elif kind == "limit_position":
            # LimitTokenPositionFilter (miscellaneous/LimitTokenPosition
            # Filter.java, consumeAllTokens composition): tokens with
            # position > max_token_position are dropped — unlike the
            # count limit this keys on the POSITION (stopword gaps count)
            if pos_limit is not None:
                raise ValueError("at most one limit_position filter")
            pos_limit = int(spec[1])
            if pos_limit < 1:
                raise ValueError("limit_position must be >= 1")
        else:
            raise ValueError(f"unknown token filter {spec!r}")
    map_fn = None
    if maps:
        def map_fn(t, _maps=tuple(maps)):
            for m in _maps:
                t = m(t)
            return t
    keep_fn = None
    if keep_set is not None and not keep_preds:
        keep_fn = keep_set.__contains__
        return map_fn, keep_fn, limit, pos_limit
    if keep_set is not None or keep_preds:
        preds = tuple(keep_preds)
        ks = keep_set

        def keep_fn(t, _p=preds, _k=ks):
            if _k is not None and t not in _k:
                return False
            return all(p(t) for p in _p)
    return map_fn, keep_fn, limit, pos_limit


def pattern_replace_unique(uniq, spec: tuple) -> np.ndarray:
    """Vocabulary-level PatternReplaceFilter: transform each unique
    token once (map back through factorize codes at the call site)."""
    fn = compile_pattern_replace(spec)
    return np.array([fn(u) for u in uniq], dtype=object)


def capture_group_tokens(token: str, patterns, preserve_original: bool
                         ) -> list[str]:
    """PatternCaptureGroupTokenFilter for one token (reference
    ``pattern/PatternCaptureGroupTokenFilter.java:88-165``): walk every
    pattern's matches/groups emitting captures in ascending-start order
    (ties → earlier pattern), skipping empty captures and — with
    preserveOriginal — captures equal to the whole token. The FIRST
    element of the returned list carries the source position (it is the
    original when preserveOriginal or when nothing captured, else the
    first capture REPLACES the original); the rest are posInc-0
    overlaps."""
    n = len(token)
    iters = [p.finditer(token) for p in patterns]
    counts = [p.groups for p in patterns]
    cur_m: list = [None] * len(patterns)
    cur_g = [-1] * len(patterns)
    state = {"matcher": -1}

    def next_capture() -> bool:
        min_offset = None
        state["matcher"] = -1
        i = 0
        while i < len(patterns):
            if cur_g[i] == -1:
                cur_m[i] = next(iters[i], None)
                cur_g[i] = 1 if cur_m[i] is not None else 0
            if cur_g[i] != 0:
                while cur_g[i] < counts[i] + 1:
                    start = cur_m[i].start(cur_g[i])
                    end = cur_m[i].end(cur_g[i])
                    if start == end or (preserve_original and start == 0
                                        and end == n):
                        cur_g[i] += 1
                        continue
                    if min_offset is None or start < min_offset:
                        min_offset = start
                        state["matcher"] = i
                    break
                if cur_g[i] == counts[i] + 1:
                    cur_g[i] = -1
                    continue  # re-run the same i (the reference's i--)
            i += 1
        return state["matcher"] != -1

    def take() -> str:
        i = state["matcher"]
        s = token[cur_m[i].start(cur_g[i]):cur_m[i].end(cur_g[i])]
        cur_g[i] += 1
        return s

    out: list[str] = []
    if preserve_original:
        out.append(token)
        while next_capture():
            out.append(take())
    else:
        if next_capture():
            out.append(take())
            while next_capture():
                out.append(take())
        else:
            out.append(token)
    return out


def expand_capture_groups_batch(doc_idx, terms, positions, n_docs,
                                patterns, preserve_original: bool):
    """Columnar PatternCaptureGroupTokenFilter: emissions computed once
    per UNIQUE token; the first emission keeps the source position
    (posInc 1 — it replaces the original unless preserveOriginal), the
    rest land as posInc-0 overlaps. Returns (doc_idx, terms, positions,
    overlaps_per_doc)."""
    import re as _re
    pats = [p if isinstance(p, _re.Pattern) else _re.compile(p)
            for p in patterns]
    overlaps = np.zeros(n_docs, dtype=np.int64)
    if len(terms) == 0:
        return doc_idx, terms, positions, overlaps
    codes, uniq = pd.factorize(terms)
    emits_u = [capture_group_tokens(u, pats, preserve_original)
               for u in uniq]
    first_u = np.array([e[0] for e in emits_u], dtype=object)
    rest_u = [e[1:] for e in emits_u]
    rest_counts = np.fromiter((len(r) for r in rest_u), np.int64,
                              count=len(uniq))
    terms2 = first_u[codes]
    per_tok = rest_counts[codes]
    total = int(per_tok.sum())
    if total == 0:
        return doc_idx, terms2, positions, overlaps
    add_d = np.repeat(doc_idx, per_tok)
    add_p = np.repeat(positions, per_tok)
    add_t = np.empty(total, dtype=object)
    i = 0
    for c in codes:
        r = rest_u[c]
        if r:
            add_t[i:i + len(r)] = r
            i += len(r)
    overlaps = np.bincount(add_d, minlength=n_docs).astype(np.int64)
    return (np.concatenate([doc_idx, add_d]),
            np.concatenate([terms2, add_t]),
            np.concatenate([positions, add_p]),
            overlaps)


class PatternKeywordSet:
    """PatternKeywordMarkerFilter (reference ``miscellaneous/
    PatternKeywordMarkerFilter.java``): marks every token whose text
    MATCHES the pattern (Matcher.matches — full match) as a keyword so
    stemmers skip it. Duck-types the ``keyword_marker`` set argument
    (membership = regex full match, optionally unioned with explicit
    keywords, the SetKeywordMarkerFilter composition)."""

    def __init__(self, pattern: str, extra=frozenset()):
        self._pat = re.compile(pattern)
        self._extra = frozenset(extra)

    def __contains__(self, token) -> bool:
        return (token in self._extra
                or self._pat.fullmatch(token) is not None)

    def __bool__(self) -> bool:
        return True
