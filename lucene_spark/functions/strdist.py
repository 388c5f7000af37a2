"""Pluggable string distances for spell suggestion (the reference's
``StringDistance`` SPI at ``suggest/.../spell/StringDistance.java`` with
its four shipped implementations). All return a float32 SIMILARITY in
the reference's convention (higher = closer), including the quirky
corner cases, which are mirrored deliberately:

* ``LevenshteinDistance.java:46-99`` — two-row DP,
  1 − d/max(|a|,|b|).
* ``LuceneLevenshteinDistance.java:47-95`` — codepoint-level OSA
  (single-transposition) DP, 1 − d/**min**(|a|,|b|); empty input
  returns max(n,m) — a raw length, >1 — exactly like the reference.
* ``JaroWinklerDistance.java:37-85`` — bounded-window match count,
  half-transpositions, common prefix UNcapped, Winkler bonus
  min(0.1, 1/maxlen)·prefix applied only when jaro ≥ threshold (0.7
  default); the three-term mean is computed in float32 like Java's
  float arithmetic.
* ``NGramDistance.java:41-107`` — gram-wise DP over the
  prefix-padded source with per-gram fractional substitution cost and
  the padded-prefix discount (tn--), 1 − d/max(|a|,|b|).

These run on BOUNDED candidate sets (the dictionary slice surviving the
pushed length-band + prefix filters), so per-pair Python is the right
tool — the heavy lifting stays in the scan, like the reference's
automaton intersection bounding DirectSpellChecker's DP calls.
"""

from __future__ import annotations

import numpy as np

__all__ = ["STRING_DISTANCES", "levenshtein_similarity",
           "lucene_levenshtein_similarity", "jaro_winkler_similarity",
           "ngram_similarity", "batch_similarity"]

_f32 = np.float32


def levenshtein_similarity(a: str, b: str) -> float:
    """LevenshteinDistance.getDistance: 1 − edits/max length."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return float(_f32(1.0)) if n == m else 0.0
    prev = list(range(n + 1))
    cur = [0] * (n + 1)
    for j in range(1, m + 1):
        cur[0] = j
        bj = b[j - 1]
        for i in range(1, n + 1):
            cost = 0 if a[i - 1] == bj else 1
            cur[i] = min(cur[i - 1] + 1, prev[i] + 1, prev[i - 1] + cost)
        prev, cur = cur, prev
    return float(_f32(1.0) - _f32(prev[n]) / _f32(max(n, m)))


def lucene_levenshtein_similarity(a: str, b: str) -> float:
    """LuceneLevenshteinDistance.getDistance: codepoint OSA DP with the
    1 − d/min(m,n) normalization; empty input returns max(n,m) raw
    (the reference's literal behavior)."""
    ap = [ord(c) for c in a]
    bp = [ord(c) for c in b]
    n, m = len(ap), len(bp)
    if n == 0 or m == 0:
        return 0.0 if n == m else float(max(n, m))
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for j in range(1, m + 1):
        t_j = bp[j - 1]
        for i in range(1, n + 1):
            cost = 0 if ap[i - 1] == t_j else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + cost)
            if (i > 1 and j > 1 and ap[i - 1] == bp[j - 2]
                    and ap[i - 2] == bp[j - 1]):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + cost)
    return float(_f32(1.0) - _f32(d[n][m]) / _f32(min(m, n)))


def jaro_winkler_similarity(a: str, b: str,
                            threshold: float = 0.7) -> float:
    """JaroWinklerDistance.getDistance (threshold default 0.7; set it
    negative for plain Jaro)."""
    if len(a) > len(b):
        mx, mn = a, b
    else:
        mx, mn = b, a
    rng = max(len(mx) // 2 - 1, 0)
    match_idx = [-1] * len(mn)
    match_flags = [False] * len(mx)
    matches = 0
    for mi, c1 in enumerate(mn):
        for xi in range(max(mi - rng, 0), min(mi + rng + 1, len(mx))):
            if not match_flags[xi] and c1 == mx[xi]:
                match_idx[mi] = xi
                match_flags[xi] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    ms1 = [mn[i] for i in range(len(mn)) if match_idx[i] != -1]
    ms2 = [mx[i] for i in range(len(mx)) if match_flags[i]]
    half_transpositions = sum(1 for x, y in zip(ms1, ms2) if x != y) // 2
    prefix = 0
    for x, y in zip(a, b):
        if x != y:
            break
        prefix += 1
    # the three-term mean in float32, like Java's float expression
    m = _f32(matches)
    j = (m / _f32(len(a)) + m / _f32(len(b))
         + (m - _f32(half_transpositions)) / m) / _f32(3.0)
    if j < threshold:
        return float(j)
    scale = min(_f32(0.1), _f32(1.0) / _f32(len(mx)))
    return float(j + scale * _f32(prefix) * (_f32(1.0) - j))


def ngram_similarity(a: str, b: str, n: int = 2) -> float:
    """NGramDistance.getDistance — gram DP with fractional costs and
    the padded-prefix discount."""
    sl, tl = len(a), len(b)
    if sl == 0 or tl == 0:
        return 1.0 if sl == tl else 0.0
    if sl < n or tl < n:
        cost = sum(1 for i in range(min(sl, tl)) if a[i] == b[i])
        return float(_f32(cost) / _f32(max(sl, tl)))
    sa = ("\0" * (n - 1)) + a                    # prefix-padded source
    p = [float(i) for i in range(sl + 1)]
    d = [0.0] * (sl + 1)
    for j in range(1, tl + 1):
        if j < n:
            t_j = ("\0" * (n - j)) + b[:j]
        else:
            t_j = b[j - n:j]
        d[0] = float(j)
        for i in range(1, sl + 1):
            cost = 0
            tn = n
            for ni in range(n):
                if sa[i - 1 + ni] != t_j[ni]:
                    cost += 1
                elif sa[i - 1 + ni] == "\0":     # padded-prefix match
                    tn -= 1
            ec = cost / tn
            d[i] = min(d[i - 1] + 1, p[i] + 1, p[i - 1] + ec)
        p, d = d, p
    return float(_f32(1.0) - _f32(p[sl]) / _f32(max(tl, sl)))


STRING_DISTANCES = {
    "levenshtein": levenshtein_similarity,
    "lucene_levenshtein": lucene_levenshtein_similarity,
    "jaro_winkler": jaro_winkler_similarity,
    "ngram": ngram_similarity,
}


def batch_similarity(name: str, word: str, terms) -> np.ndarray:
    """float32 similarities of ``word`` against a candidate term array
    (the per-pair functions applied over the bounded dictionary slice)."""
    fn = STRING_DISTANCES[name]
    return np.array([fn(word, t) for t in terms], dtype=np.float32)
