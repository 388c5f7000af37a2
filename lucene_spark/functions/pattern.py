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


def pattern_replace_unique(uniq, spec: tuple) -> np.ndarray:
    """Vocabulary-level PatternReplaceFilter: transform each unique
    token once (map back through factorize codes at the call site)."""
    fn = compile_pattern_replace(spec)
    return np.array([fn(u) for u in uniq], dtype=object)
