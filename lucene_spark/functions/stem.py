"""Porter stemming + the English analysis chain.

Reference: ``lucene/analysis/common/.../en/PorterStemFilter.java`` (wraps
Martin Porter's 1980 algorithm, ``en/PorterStemmer.java``),
``en/EnglishPossessiveFilter.java`` (strips trailing ``'s``), and
``en/EnglishAnalyzer.java`` (StandardTokenizer → EnglishPossessiveFilter
→ LowerCaseFilter → StopFilter(English 33) → PorterStemFilter).

This is an independent Python implementation of the published algorithm
(M.F. Porter, "An algorithm for suffix stripping", Program 14(3) 1980),
not a translation of the Java source. Words of length <= 2 are returned
unchanged, as in the original.

Spark shape: stemming is applied at the *vocabulary* level — unique
surviving tokens are stemmed once per Arrow batch and mapped back through
the factorize codes — so cost scales with |vocab|, not token count.
"""

from __future__ import annotations

import numpy as np

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences in the [C](VC)^m[V] decomposition."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if not v and prev_vowel:
            m += 1
        prev_vowel = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1))


def _cvc(w: str) -> bool:
    """stem ends consonant-vowel-consonant, final cons not w/x/y."""
    if len(w) < 3:
        return False
    return (_is_cons(w, len(w) - 3) and not _is_cons(w, len(w) - 2)
            and _is_cons(w, len(w) - 1) and w[-1] not in "wxy")


def _replace(w: str, suffix: str, repl: str, min_m: int) -> str | None:
    if not w.endswith(suffix):
        return None
    stem = w[: len(w) - len(suffix)]
    if _measure(stem) > min_m - 1:
        return stem + repl
    return w  # suffix matched but condition failed — stop this rule group


_STEP2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
          ("anci", "ance"), ("izer", "ize"), ("bli", "ble"),
          ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
          ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
          ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
          ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
          ("biliti", "ble"), ("logi", "log")]

_STEP3 = [("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
          ("ical", "ic"), ("ful", ""), ("ness", "")]

_STEP4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant",
          "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
          "ous", "ive", "ize"]


def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w

    # step 1a: plurals
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b: -ed / -ing
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        hit = None
        if w.endswith("ed") and _has_vowel(w[:-2]):
            hit = w = w[:-2]
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            hit = w = w[:-3]
        if hit is not None:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w = w + "e"

    # step 1c: y -> i when the stem has another vowel
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2 (m > 0 suffix mappings)
    for suf, repl in _STEP2:
        if w.endswith(suf):
            w = _replace(w, suf, repl, 1)
            break

    # step 3
    for suf, repl in _STEP3:
        if w.endswith(suf):
            w = _replace(w, suf, repl, 1)
            break

    # step 4: drop suffix when m > 1 ("ion" needs preceding s/t)
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    break
                w = stem
            break

    # step 5a: drop final e
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]

    # step 5b: -ll -> -l when m > 1
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def strip_possessive(word: str) -> str:
    """EnglishPossessiveFilter: drop a trailing 's / ’s."""
    if len(word) >= 2 and word[-1] in "sS" and word[-2] in "'’＇":
        return word[:-2]
    return word


def stem_terms(terms: np.ndarray, possessive: bool = True) -> np.ndarray:
    """Vocabulary-level stem: factorize → stem unique terms once → map
    back. ``terms`` is an object array of (already lowercased) tokens."""
    import pandas as pd
    codes, uniques = pd.factorize(terms)
    stemmed = np.array(
        [porter_stem(strip_possessive(u) if possessive else u)
         for u in uniques], dtype=object)
    return stemmed[codes]
