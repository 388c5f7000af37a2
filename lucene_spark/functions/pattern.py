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
    limit = None
    for spec in specs:
        kind = spec[0]
        if kind == "trim":
            maps.append(str.strip)
        elif kind == "truncate":
            n = int(spec[1])
            if n < 1:
                raise ValueError("truncate length must be >= 1")
            maps.append(lambda t, _n=n: t[:_n])
        elif kind == "keep":
            if keep_set is not None:
                raise ValueError("at most one keep filter")
            keep_set = frozenset(spec[1])
        elif kind == "limit":
            if limit is not None:
                raise ValueError("at most one limit filter")
            limit = int(spec[1])
            if limit < 1:
                raise ValueError("limit must be >= 1")
        else:
            raise ValueError(f"unknown token filter {spec!r}")
    map_fn = None
    if maps:
        def map_fn(t, _maps=tuple(maps)):
            for m in _maps:
                t = m(t)
            return t
    keep_fn = None
    if keep_set is not None:
        keep_fn = keep_set.__contains__
    return map_fn, keep_fn, limit


def pattern_replace_unique(uniq, spec: tuple) -> np.ndarray:
    """Vocabulary-level PatternReplaceFilter: transform each unique
    token once (map back through factorize codes at the call site)."""
    fn = compile_pattern_replace(spec)
    return np.array([fn(u) for u in uniq], dtype=object)
