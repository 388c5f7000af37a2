"""Snowball stemmers, implemented from the published algorithm
descriptions (snowballstem.org, Snowball 2.0.0 semantics).

The reference ships machine-generated cursor-machine Java
(``analysis/common/src/java/org/tartarus/snowball/ext/*.java``); this
module re-expresses each algorithm as a plain suffix-table walk over
Python strings.  Rule data (suffix lists, vowel groupings, region
definitions) is the published algorithm data; the control flow here is
ours.  Every stemmer is verified 0-mismatch against the reference's
2000-word ``voc.txt``/``output.txt`` golden pairs
(``analysis/common/src/test/org/apache/lucene/analysis/snowball/*.zip``)
before registration; sampled pairs are committed under ``tests/data/``.

Like the light stemmers (``lightstem.py``), these run at VOCABULARY
level: the analyzer factorizes the token stream and stems each unique
token once, so per-word Python cost is amortized across the corpus.

Reference behavior citations:
  - ``org/tartarus/snowball/ext/DanishStemmer.java``
  - ``org/tartarus/snowball/ext/NorwegianStemmer.java``
  - ``org/tartarus/snowball/ext/SwedishStemmer.java``
  - ``org/tartarus/snowball/ext/EnglishStemmer.java``
  - ``analysis/snowball/SnowballFilter.java`` (filter wiring)
"""

from __future__ import annotations


def _r1_std(w: str, vowels: str) -> int:
    """Start of R1: after the first non-vowel that follows a vowel."""
    for i in range(len(w) - 1):
        if w[i] in vowels and w[i + 1] not in vowels:
            return i + 2
    return len(w)


def _r1r2_std(w: str, vowels: str) -> tuple[int, int]:
    p1 = _r1_std(w, vowels)
    if p1 >= len(w):
        return p1, len(w)
    return p1, p1 + _r1_std(w[p1:], vowels)


def _longest_suffix(w: str, suffixes, p1: int):
    """Longest suffix of ``w`` lying entirely within the region starting
    at ``p1`` (find_among_b with limit_backward = p1).  ``suffixes`` is
    pre-sorted longest-first."""
    n = len(w)
    for s in suffixes:
        if n - len(s) >= p1 and w.endswith(s):
            return s
    return None


def _bylen(*groups):
    """Flatten suffix groups into one longest-first tuple of
    (suffix, tag) pairs."""
    flat = []
    for tag, sufs in groups:
        for s in sufs:
            flat.append((s, tag))
    flat.sort(key=lambda p: -len(p[0]))
    return tuple(flat)


def _longest_tagged(w: str, table, p1: int):
    n = len(w)
    for s, tag in table:
        if n - len(s) >= p1 and w.endswith(s):
            return s, tag
    return None, None


# ---------------------------------------------------------------------------
# Scandinavian family


_DA_VOWELS = "aeiouyæåø"          # a e i o u y æ å ø
_DA_S_ENDING = set("abcdfghjklmnoprtvyzå")  # g_s_ending
_DA_MAIN = _bylen(
    (1, ["hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
         "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
         "heds", "es", "endes", "erendes", "enes", "ernes", "eres",
         "ens", "hedens", "erens", "ers", "ets", "erets", "et", "eret"]),
    (2, ["s"]),
)
_DA_PAIRS = ("gd", "dt", "gt", "kt")
_DA_OTHER = _bylen((1, ["ig", "lig", "elig", "els"]), (2, ["løst"]))
_DA_CONS = set("bcdfghjklmnpqrstvwxz")           # g_c (no vowels, no y)


def _scand_p1(w: str, vowels: str) -> int:
    """Scandinavian region: standard R1 but never before position 3."""
    if len(w) < 3:
        return len(w)
    return max(_r1_std(w, vowels), 3)


def _da_consonant_pair(w: str, p1: int) -> str:
    if _longest_suffix(w, _DA_PAIRS, p1) is not None:
        return w[:-1]
    return w


def stem_danish(w: str) -> str:
    p1 = _scand_p1(w, _DA_VOWELS)
    # main suffix
    s, tag = _longest_tagged(w, _DA_MAIN, p1)
    if s is not None:
        if tag == 1:
            w = w[: len(w) - len(s)]
        elif len(w) >= 2 and w[-2] in _DA_S_ENDING:
            w = w[:-1]
    # consonant pair: drop the final letter after gd/dt/gt/kt in R1
    w = _da_consonant_pair(w, p1)
    # other suffix: first "igst" loses "st" (unrestricted), then R1 table
    if w.endswith("igst"):
        w = w[:-2]
    s, tag = _longest_tagged(w, _DA_OTHER, p1)
    if s is not None:
        if tag == 1:
            w = w[: len(w) - len(s)]
            w = _da_consonant_pair(w, p1)
        else:
            w = w[: len(w) - 1]                  # løst -> løs
    # undouble: final consonant in R1 equal to its predecessor
    if len(w) > p1 and w[-1] in _DA_CONS and len(w) >= 2 and w[-2] == w[-1]:
        w = w[:-1]
    return w


_NO_VOWELS = "aeiouyæåø"
_NO_S_ENDING = set("bcdfghjlmnoprtvyz")
_NO_MAIN = _bylen(
    (1, ["a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
         "heten", "ar", "er", "heter", "as", "es", "edes", "endes",
         "enes", "hetenes", "ens", "hetens", "ers", "ets", "et", "het",
         "ast"]),
    (2, ["s"]),
    (3, ["erte", "ert"]),
)
_NO_PAIRS = ("dt", "vt")
_NO_OTHER = _bylen((1, ["leg", "eleg", "ig", "eig", "lig", "elig", "els",
                        "lov", "elov", "slov", "hetslov"]))


def stem_norwegian(w: str) -> str:
    p1 = _scand_p1(w, _NO_VOWELS)
    s, tag = _longest_tagged(w, _NO_MAIN, p1)
    if s is not None:
        if tag == 1:
            w = w[: len(w) - len(s)]
        elif tag == 3:
            w = w[: len(w) - len(s)] + "er"
        else:                                    # "s": valid ending, or
            prev = w[-2] if len(w) >= 2 else ""  # k preceded by non-vowel
            if prev in _NO_S_ENDING or (
                    prev == "k" and len(w) >= 3
                    and w[-3] not in _NO_VOWELS):
                w = w[:-1]
    if _longest_suffix(w, _NO_PAIRS, p1) is not None:
        w = w[:-1]
    s, _tag = _longest_tagged(w, _NO_OTHER, p1)
    if s is not None:
        w = w[: len(w) - len(s)]
    return w


_SV_VOWELS = "aeiouyäåö"          # a e i o u y ä å ö
_SV_S_ENDING = set("bcdfghjklmnoprtvy")
_SV_MAIN = _bylen(
    (1, ["a", "arna", "erna", "heterna", "orna", "ad", "e", "ade",
         "ande", "arne", "are", "aste", "en", "anden", "aren", "heten",
         "ern", "ar", "er", "heter", "or", "as", "arnas", "ernas",
         "ornas", "es", "ades", "andes", "ens", "arens", "hetens",
         "erns", "at", "andet", "het", "ast"]),
    (2, ["s"]),
)
_SV_PAIRS = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_OTHER = _bylen((1, ["ig", "lig", "els"]), (2, ["löst"]),
                   (3, ["fullt"]))


def stem_swedish(w: str) -> str:
    p1 = _scand_p1(w, _SV_VOWELS)
    s, tag = _longest_tagged(w, _SV_MAIN, p1)
    if s is not None:
        if tag == 1:
            w = w[: len(w) - len(s)]
        elif len(w) >= 2 and w[-2] in _SV_S_ENDING:
            w = w[:-1]
    if _longest_suffix(w, _SV_PAIRS, p1) is not None:
        w = w[:-1]
    s, tag = _longest_tagged(w, _SV_OTHER, p1)
    if s is not None:
        if tag == 1:
            w = w[: len(w) - len(s)]
        elif tag == 2:
            w = w[:-1]                           # löst -> lös
        else:
            w = w[:-1]                           # fullt -> full
    return w


# ---------------------------------------------------------------------------
# English (Porter2)


_EN_V = "aeiouy"
_EN_EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "andes": "andes", "atlas": "atlas", "bias": "bias",
    "cosmos": "cosmos", "howe": "howe", "news": "news", "sky": "sky",
}
_EN_EXC2 = {"succeed", "proceed", "exceed", "canning", "inning",
            "earring", "herring", "outing"}
_EN_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_EN_VALID_LI = set("cdeghkmnrt")
_EN_STEP2 = _bylen(
    (("tion",), ["tional"]), (("ence",), ["enci"]), (("ance",), ["anci"]),
    (("able",), ["abli"]), (("ent",), ["entli"]),
    (("ize",), ["izer", "ization"]),
    (("ate",), ["ational", "ation", "ator"]),
    (("al",), ["alism", "aliti", "alli"]),
    (("ful",), ["fulness", "fulli"]),
    (("ous",), ["ousli", "ousness"]),
    (("ive",), ["iveness", "iviti"]),
    (("ble",), ["biliti", "bli"]),
    (("og+l",), ["ogi"]), (("less",), ["lessli"]), (("li",), ["li"]),
)
_EN_STEP3 = _bylen(
    (("tion",), ["tional"]), (("ate",), ["ational"]), (("al",), ["alize"]),
    (("ic",), ["icate", "iciti", "ical"]), (("",), ["ful", "ness"]),
    (("ative",), ["ative"]),
)
_EN_STEP4 = _bylen(
    (1, ["al", "ance", "ence", "er", "ic", "able", "ible", "ant",
         "ement", "ment", "ent", "ism", "ate", "iti", "ous", "ive",
         "ize"]),
    (2, ["ion"]),
)


def _en_shortv(w: str, i: int) -> bool:
    """True if a short-syllable pattern ends at index i (exclusive)."""
    # (non-vowel not w/x/Y)(vowel)(non-vowel), or word-initial
    # (vowel)(non-vowel)
    if i >= 3 and w[i - 1] not in _EN_V and w[i - 1] not in "wxY" \
            and w[i - 2] in _EN_V and w[i - 3] not in _EN_V:
        return True
    return i == 2 and w[0] in _EN_V and w[1] not in _EN_V


def stem_english(w: str) -> str:
    exc = _EN_EXC1.get(w)
    if exc is not None:
        return exc
    if len(w) < 3:
        return w
    # prelude
    y_found = False
    if w.startswith("'"):
        w = w[1:]
    if w.startswith("y"):
        w = "Y" + w[1:]
        y_found = True
    chars = list(w)
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _EN_V:
            chars[i] = "Y"
            y_found = True
    w = "".join(chars)
    # mark regions (gener-/commun-/arsen- prefixes pin R1)
    p1 = None
    for pre in ("commun", "gener", "arsen"):
        if w.startswith(pre):
            p1 = len(pre)
            break
    if p1 is None:
        p1 = _r1_std(w, _EN_V)
    p2 = len(w) if p1 >= len(w) else p1 + _r1_std(w[p1:], _EN_V)
    # step 0: longest of ' 's 's'
    for s in ("'s'", "'s", "'"):
        if w.endswith(s):
            w = w[: len(w) - len(s)]
            break
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith("ss") or w.endswith("us"):
        pass
    elif w.endswith("s"):
        if any(c in _EN_V for c in w[: len(w) - 2]):
            w = w[:-1]
    # exception 2
    if w in _EN_EXC2:
        return w
    # step 1b
    for s in ("eedly", "eed"):
        if w.endswith(s):
            if len(w) - len(s) >= p1:
                w = w[: len(w) - len(s)] + "ee"
            break
    else:
        for s in ("ingly", "edly", "ing", "ed"):
            if w.endswith(s):
                stem = w[: len(w) - len(s)]
                if any(c in _EN_V for c in stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_EN_DOUBLES):
                        w = w[:-1]
                    elif len(w) == p1 and _en_shortv(w, len(w)):
                        w += "e"
                break
    # step 1c
    if len(w) > 2 and w[-1] in "yY" and w[-2] not in _EN_V:
        w = w[:-1] + "i"
    # step 2
    s, tag = _longest_tagged(w, _EN_STEP2, 0)
    if s is not None and len(w) - len(s) >= p1:
        rep = tag[0]
        if rep == "og+l":
            if w.endswith("logi"):
                w = w[:-1]
        elif rep == "li":
            if len(w) >= 3 and w[-3] in _EN_VALID_LI:
                w = w[:-2]
        else:
            w = w[: len(w) - len(s)] + rep
    # step 3
    s, tag = _longest_tagged(w, _EN_STEP3, 0)
    if s is not None and len(w) - len(s) >= p1:
        rep = tag[0]
        if rep == "ative":
            if len(w) - len(s) >= p2:
                w = w[: len(w) - len(s)]
        else:
            w = w[: len(w) - len(s)] + rep
    # step 4
    s, tag = _longest_tagged(w, _EN_STEP4, 0)
    if s is not None and len(w) - len(s) >= p2:
        if tag == 1:
            w = w[: len(w) - len(s)]
        elif len(w) >= 4 and w[-4] in "st":
            w = w[:-3]
    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= p2 or (len(w) - 1 >= p1
                                and not _en_shortv(w, len(w) - 1)):
            w = w[:-1]
    elif w.endswith("ll") and len(w) - 1 >= p2:
        w = w[:-1]
    # postlude
    if y_found:
        w = w.replace("Y", "y")
    return w


# ---------------------------------------------------------------------------
# Porter (the Snowball rendering of the 1980 algorithm)


_PT_STEP2 = _bylen(
    (("ance",), ["anci"]), (("ence",), ["enci"]), (("able",), ["abli"]),
    (("e",), ["eli"]), (("al",), ["alli", "aliti", "alism"]),
    (("ous",), ["ousli", "ousness"]), (("ent",), ["entli"]),
    (("ble",), ["biliti"]), (("ive",), ["iviti", "iveness"]),
    (("tion",), ["tional"]), (("ate",), ["ational", "ation", "ator"]),
    (("ize",), ["ization", "izer"]), (("ful",), ["fulness"]),
)
_PT_STEP3 = _bylen(
    (("al",), ["alize"]), (("ic",), ["icate", "iciti", "ical"]),
    (("",), ["ative", "ful", "ness"]),
)
_PT_STEP4 = _bylen(
    (1, ["ic", "ance", "ence", "able", "ible", "ate", "ive", "ize",
         "iti", "al", "ism", "er", "ous", "ant", "ent", "ment",
         "ement", "ou"]),
    (2, ["ion"]),
)


def _pt_shortv(w: str, i: int) -> bool:
    """Porter shortv: (non-vowel not w/x/Y)(vowel)(non-vowel) ending
    at index i (exclusive)."""
    return (i >= 3 and w[i - 1] not in _EN_V and w[i - 1] not in "wxY"
            and w[i - 2] in _EN_V and w[i - 3] not in _EN_V)


def stem_porter_snowball(w: str) -> str:
    # prelude: mark y as Y at word start and after vowels
    y_found = False
    if w.startswith("y"):
        w = "Y" + w[1:]
        y_found = True
    chars = list(w)
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _EN_V:
            chars[i] = "Y"
            y_found = True
    w = "".join(chars)
    p1, p2 = _r1r2_std(w, _EN_V)
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if len(w) - 3 >= p1:
            w = w[:-1]
    else:
        for s in ("ing", "ed"):
            if w.endswith(s):
                stem = w[: len(w) - len(s)]
                if any(c in _EN_V for c in stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_EN_DOUBLES):
                        w = w[:-1]
                    elif len(w) == p1 and _pt_shortv(w, len(w)):
                        w += "e"
                break
    # step 1c: y -> i if the stem contains a vowel
    if w.endswith(("y", "Y")) and any(c in _EN_V for c in w[:-1]):
        w = w[:-1] + "i"
    # step 2
    s, tag = _longest_tagged(w, _PT_STEP2, 0)
    if s is not None and len(w) - len(s) >= p1:
        w = w[: len(w) - len(s)] + tag[0]
    # step 3
    s, tag = _longest_tagged(w, _PT_STEP3, 0)
    if s is not None and len(w) - len(s) >= p1:
        w = w[: len(w) - len(s)] + tag[0]
    # step 4
    s, tag = _longest_tagged(w, _PT_STEP4, 0)
    if s is not None and len(w) - len(s) >= p2:
        if tag == 1:
            w = w[: len(w) - len(s)]
        elif len(w) >= 4 and w[-4] in "st":
            w = w[:-3]
    # step 5a / 5b
    if w.endswith("e"):
        if len(w) - 1 >= p2 or (len(w) - 1 >= p1
                                and not _pt_shortv(w, len(w) - 1)):
            w = w[:-1]
    if w.endswith("ll") and len(w) - 1 >= p2:
        w = w[:-1]
    if y_found:
        w = w.replace("Y", "y")
    return w


# ---------------------------------------------------------------------------
# German / German2


_DE_VOWELS = "aeiouyäöü"
_DE_S_ENDING = set("bdfghklmnrt")
_DE_ST_ENDING = set("bdfghklmnt")
_DE_STEP1 = _bylen((1, ["em", "ern", "er"]), (2, ["e", "en", "es"]),
                   (3, ["s"]))
_DE_STEP2 = _bylen((1, ["en", "er", "est"]), (2, ["st"]))
_DE_STEP3 = _bylen((1, ["end", "ung"]), (2, ["ig", "isch", "ik"]),
                   (3, ["lich", "heit"]), (4, ["keit"]))


def _de_mark(w: str) -> tuple[int, int]:
    p1 = _r1_std(w, _DE_VOWELS)
    if p1 >= len(w):
        return len(w), len(w)
    x = max(p1, 3) if len(w) >= 3 else len(w)
    p2 = p1 + _r1_std(w[p1:], _DE_VOWELS)
    return x, min(p2, len(w))


def _de_stem_marked(w: str) -> str:
    """Shared German suffix machine over a U/Y-marked word."""
    p1, p2 = _de_mark(w)
    # pass 1
    s, tag = _longest_tagged(w, _DE_STEP1, p1)
    if s is not None:
        if tag == 1:
            w = w[: len(w) - len(s)]
        elif tag == 2:
            w = w[: len(w) - len(s)]
            if w.endswith("niss"):
                w = w[:-1]
        elif len(w) >= 2 and w[-2] in _DE_S_ENDING:
            w = w[:-1]
    # pass 2
    s, tag = _longest_tagged(w, _DE_STEP2, p1)
    if s is not None:
        if tag == 1:
            w = w[: len(w) - len(s)]
        elif len(w) >= 6 and w[-3] in _DE_ST_ENDING:
            w = w[:-2]
    # pass 3 (R2)
    s, tag = _longest_tagged(w, _DE_STEP3, p2)
    if s is not None:
        if tag == 1:                              # end / ung
            w = w[: len(w) - len(s)]
            if w.endswith("ig") and not w.endswith("eig") \
                    and len(w) - 2 >= p2:
                w = w[:-2]
        elif tag == 2:                            # ig / isch / ik
            if not w[: len(w) - len(s)].endswith("e"):
                w = w[: len(w) - len(s)]
        elif tag == 3:                            # lich / heit
            w = w[: len(w) - len(s)]
            for t in ("er", "en"):
                if w.endswith(t) and len(w) - 2 >= p1:
                    w = w[:-2]
                    break
        else:                                     # keit
            w = w[: len(w) - len(s)]
            for t in ("lich", "ig"):
                if w.endswith(t) and len(w) - len(t) >= p2:
                    w = w[: len(w) - len(t)]
                    break
    return w


def _de_mark_uy(w: str) -> str:
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _DE_VOWELS \
                and chars[i + 1] in _DE_VOWELS:
            chars[i] = chars[i].upper()
    return "".join(chars)


_DE_POST = {"Y": "y", "U": "u", "ä": "a", "ö": "o", "ü": "u"}


def stem_german_snowball(w: str) -> str:
    w = _de_mark_uy(w.replace("ß", "ss"))
    w = _de_stem_marked(w)
    return "".join(_DE_POST.get(c, c) for c in w)


def stem_german2(w: str) -> str:
    # mark u/y between vowels FIRST (over the original), then fold
    # ae/oe/ue -> umlauts (qu protects the following e) and ß -> ss
    w = _de_mark_uy(w)
    out = []
    i = 0
    n = len(w)
    while i < n:
        c = w[i]
        if c == "ß":
            out.append("ss")
        elif c == "q" and i + 1 < n and w[i + 1] == "u":
            out.append("qu")
            i += 1
        elif c in "aou" and i + 1 < n and w[i + 1] == "e":
            out.append({"a": "ä", "o": "ö", "u": "ü"}[c])
            i += 1
        else:
            out.append(c)
        i += 1
    w = _de_stem_marked("".join(out))
    return "".join(_DE_POST.get(c, c) for c in w)


# ---------------------------------------------------------------------------
# Dutch


_NL_VOWELS = "aeiouyè"
_NL_NOT_S = set("aeiouyèj")                       # g_v_j
_NL_ACCENTS = str.maketrans("áäéëíïóöúü", "aaeeiioouu")
_NL_STEP4 = _bylen((1, ["end", "ing"]), (2, ["ig"]), (3, ["lijk"]),
                   (4, ["baar"]), (5, ["bar"]))


def _nl_undouble(w: str) -> str:
    if w.endswith(("dd", "kk", "tt")):
        return w[:-1]
    return w


def stem_dutch(w: str) -> str:
    w = w.translate(_NL_ACCENTS)
    if w.startswith("y"):
        w = "Y" + w[1:]
    chars = list(w)
    for i in range(1, len(chars)):
        if chars[i - 1] in _NL_VOWELS:
            if chars[i] == "i" and i + 1 < len(chars) \
                    and chars[i + 1] in _NL_VOWELS:
                chars[i] = "I"
            elif chars[i] == "y":
                chars[i] = "Y"
    w = "".join(chars)
    p1 = _r1_std(w, _NL_VOWELS)
    p2 = len(w) if p1 >= len(w) else p1 + _r1_std(w[p1:], _NL_VOWELS)
    if p1 < 3:
        p1 = 3

    e_found = False

    def en_ending(v: str) -> str:
        # caller already stripped en/ene; v is the remainder
        if len(v) >= 1 and v[-1] not in _NL_VOWELS \
                and not v.endswith("gem"):
            return _nl_undouble(v)
        return None

    # pass 1
    n = len(w)
    if w.endswith("heden") and n - 5 >= p1:
        w = w[:-5] + "heid"
    elif w.endswith("ene") and n - 3 >= p1:
        v = en_ending(w[:-3])
        if v is not None:
            w = v
    elif w.endswith("en") and n - 2 >= p1:
        v = en_ending(w[:-2])
        if v is not None:
            w = v
    elif w.endswith("se") and n - 2 >= p1 and len(w) >= 3 \
            and w[-3] not in _NL_NOT_S:
        w = w[:-2]
    elif w.endswith("s") and n - 1 >= p1 and len(w) >= 2 \
            and w[-2] not in _NL_NOT_S:
        w = w[:-1]
    # pass 2: e-ending
    if w.endswith("e") and len(w) - 1 >= p1 and len(w) >= 2 \
            and w[-2] not in _NL_VOWELS:
        w = _nl_undouble(w[:-1])
        e_found = True
    # pass 3: heid
    if w.endswith("heid") and len(w) - 4 >= p2 and not w[:-4].endswith("c"):
        w = w[:-4]
        if w.endswith("en") and len(w) - 2 >= p1:
            v = en_ending(w[:-2])
            if v is not None:
                w = v
    # pass 4
    s, tag = _longest_tagged(w, _NL_STEP4, 0)
    if s is not None and len(w) - len(s) >= p2:
        if tag == 1:                              # end / ing
            w = w[: len(w) - len(s)]
            if w.endswith("ig") and len(w) - 2 >= p2 \
                    and not w[:-2].endswith("e"):
                w = w[:-2]
            else:
                w = _nl_undouble(w)
        elif tag == 2:                            # ig
            if not w[: len(w) - len(s)].endswith("e"):
                w = w[: len(w) - len(s)]
        elif tag == 3:                            # lijk
            w = w[: len(w) - len(s)]
            if w.endswith("e") and len(w) - 1 >= p1 and len(w) >= 2 \
                    and w[-2] not in _NL_VOWELS:
                w = _nl_undouble(w[:-1])
        elif tag == 4:                            # baar
            w = w[: len(w) - len(s)]
        elif e_found:                             # bar
            w = w[: len(w) - len(s)]
    # pass 5: undouble vowel  c V V c -> c V c
    if len(w) >= 4 and w[-1] not in _NL_VOWELS and w[-1] != "I" \
            and w[-2:-1] + w[-3:-2] and w[-3:-1] in ("aa", "ee", "oo", "uu") \
            and w[-4] not in _NL_VOWELS:
        w = w[:-2] + w[-1]
    # postlude
    return w.replace("I", "i").replace("Y", "y")


# ---------------------------------------------------------------------------
# Russian


_RU_VOWELS = "аеиоуыэюя"
_RU_PGERUND_AYA = ("вшись", "вши", "в")           # require preceding а/я
_RU_PGERUND = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_RU_ADJ = ("ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ое",
           "ые", "ей", "ий", "ой", "ый", "ем", "им", "ом", "ым", "их",
           "ых", "ею", "ою", "ую", "юю", "ая", "яя")
_RU_PART_AYA = ("ем", "нн", "вш", "ющ", "щ")
_RU_PART = ("ивш", "ывш", "ующ")
_RU_VERB_AYA = ("ете", "йте", "ешь", "нно", "ла", "на", "ли", "ем",
                "ло", "но", "ет", "ют", "ны", "ть", "й", "л", "н")
_RU_VERB = ("ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли",
            "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло",
            "ено", "ят", "ует", "уют", "ит", "ыт", "ены", "ить", "ыть",
            "ишь", "ую", "ю")
_RU_NOUN = ("иями", "ями", "ами", "ией", "иям", "ием", "иях", "ию",
            "ия", "ьи", "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ий",
            "ой", "ам", "ем", "ом", "ям", "ах", "ях", "ью", "ья", "а",
            "е", "и", "й", "о", "у", "ы", "ь", "ю", "я")


def _ru_longest(w, pV, *tables):
    """Longest suffix across tagged tables; returns (suffix, table_idx)."""
    best, bi = None, -1
    for ti, tbl in enumerate(tables):
        for s in tbl:
            if (best is None or len(s) > len(best)) \
                    and len(w) - len(s) >= pV and w.endswith(s):
                best, bi = s, ti
    return best, bi


def stem_russian(w: str) -> str:
    w = w.replace("ё", "е")
    # regions
    pV = len(w)
    for i, c in enumerate(w):
        if c in _RU_VOWELS:
            pV = i + 1
            break
    p2 = len(w) if pV >= len(w) else pV + _r1r2_std(w[pV:], _RU_VOWELS)[0]

    def drop(word, suf):
        return word[: len(word) - len(suf)]

    def try_aya(word, suf):
        # delete suf only if preceded by а/я lying within the region
        i = len(word) - len(suf)
        if i - 1 >= pV and word[i - 1] in "ая":
            return drop(word, suf)
        return None

    # step 1: perfective gerund, else [reflexive] adj|verb|noun
    s, ti = _ru_longest(w, pV, _RU_PGERUND_AYA, _RU_PGERUND)
    done = False
    if s is not None:
        if ti == 1:
            w = drop(w, s)
            done = True
        else:
            v = try_aya(w, s)
            if v is not None:
                w = v
                done = True
    if not done:
        s, _ti = _ru_longest(w, pV, ("сь", "ся"))
        if s is not None:
            w = drop(w, s)
        # adjectival
        s, _ti = _ru_longest(w, pV, _RU_ADJ)
        if s is not None:
            w = drop(w, s)
            ps, pi = _ru_longest(w, pV, _RU_PART_AYA, _RU_PART)
            if ps is not None:
                if pi == 1:
                    w = drop(w, ps)
                else:
                    v = try_aya(w, ps)
                    if v is not None:
                        w = v
        else:
            # verb
            vs, vi = _ru_longest(w, pV, _RU_VERB_AYA, _RU_VERB)
            handled = False
            if vs is not None:
                if vi == 1:
                    w = drop(w, vs)
                    handled = True
                else:
                    v = try_aya(w, vs)
                    if v is not None:
                        w = v
                        handled = True
            if not handled:
                ns, _ni = _ru_longest(w, pV, _RU_NOUN)
                if ns is not None:
                    w = drop(w, ns)
    # step 2: и
    if w.endswith("и") and len(w) - 1 >= pV:
        w = w[:-1]
    # step 3: derivational (R2)
    s, _ti = _ru_longest(w, pV, ("ость", "ост"))
    if s is not None and len(w) - len(s) >= p2:
        w = drop(w, s)
    # step 4: tidy up
    s, _ti = _ru_longest(w, pV, ("ейше", "ейш"))
    if s is not None:
        w = drop(w, s)
        if w.endswith("нн") and len(w) - 1 >= pV:
            w = w[:-1]
    elif w.endswith("нн") and len(w) - 1 >= pV:
        w = w[:-1]
    elif w.endswith("ь") and len(w) - 1 >= pV:
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Romance family helpers


def _rv_romance(w: str, vowels: str) -> int:
    """Standard Romance RV: if the second letter is a consonant, after
    the next following vowel; if the first two letters are vowels, after
    the next consonant; otherwise after the third letter."""
    n = len(w)
    if n < 2:
        return n
    if w[0] in vowels:
        if w[1] not in vowels:                    # V C ...
            for i in range(2, n):
                if w[i] in vowels:
                    return i + 1
            return n
        for i in range(2, n):                     # V V ...
            if w[i] not in vowels:
                return i + 1
        return n
    if w[1] not in vowels:                        # C C ...
        for i in range(2, n):
            if w[i] in vowels:
                return i + 1
        return n
    return 3 if n >= 3 else n                     # C V x


# ---------------------------------------------------------------------------
# Spanish


_ES_VOWELS = "aeiouáéíóúü"
_ES_PRONOUNS = ("selas", "selos", "sela", "selo", "las", "les", "los",
                "nos", "la", "le", "lo", "me", "se")
_ES_GERUNDS = _bylen(
    (1, ["iéndo"]), (2, ["ándo"]), (3, ["ár"]), (4, ["ér"]), (5, ["ír"]),
    (6, ["ando", "iendo", "ar", "er", "ir"]), (7, ["yendo"]),
)
_ES_STD = _bylen(
    (1, ["ica", "osa", "ista", "anza", "able", "ible", "ico", "ismo",
         "oso", "amiento", "imiento", "icas", "osas", "istas", "anzas",
         "ables", "ibles", "icos", "ismos", "osos", "amientos",
         "imientos"]),
    (2, ["ancia", "adora", "ante", "ación", "ador", "ancias", "adoras",
         "aciones", "adores", "antes"]),
    (3, ["logía", "logías"]),
    (4, ["ución", "uciones"]),
    (5, ["encia", "encias"]),
    (6, ["amente"]),
    (7, ["mente"]),
    (8, ["idad", "idades"]),
    (9, ["iva", "ivo", "ivas", "ivos"]),
)
_ES_Y_VERB = ("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
              "yes", "ya", "ye", "yo", "yó")
_ES_VERB = _bylen(
    (1, ["en", "es", "éis", "emos"]),
    (2, ["aba", "ada", "ida", "ara", "iera", "ía", "aría", "ería",
         "iría", "ad", "ed", "id", "ase", "iese", "aste", "iste", "an",
         "aban", "aran", "ieran", "ían", "arían", "erían", "irían",
         "asen", "iesen", "aron", "ieron", "arán", "erán", "irán",
         "ado", "ido", "ando", "iendo", "ar", "er", "ir", "as", "abas",
         "adas", "idas", "aras", "ieras", "ías", "arías", "erías",
         "irías", "ases", "ieses", "abais", "arais", "ierais", "íais",
         "aríais", "eríais", "iríais", "aseis", "ieseis", "asteis",
         "isteis", "áis", "aréis", "eréis", "iréis", "ados", "idos",
         "amos", "ábamos", "áramos", "iéramos", "íamos", "aríamos",
         "eríamos", "iríamos", "aremos", "eremos", "iremos", "ásemos",
         "iésemos", "imos", "arás", "erás", "irás", "ís", "ará", "erá",
         "irá", "aré", "eré", "iré", "ió"]),
)
_ES_RESIDUAL = _bylen((1, ["a", "o", "os", "á", "í", "ó"]),
                      (2, ["e", "é"]))
_ES_POST = str.maketrans("áéíóú", "aeiou")


def stem_spanish(w: str) -> str:
    rv = _rv_romance(w, _ES_VOWELS)
    p1, p2 = _r1r2_std(w, _ES_VOWELS)
    # step 0: attached pronoun
    for pron in _ES_PRONOUNS:
        if w.endswith(pron):
            base = w[: len(w) - len(pron)]
            s, tag = _longest_tagged(base, _ES_GERUNDS, 0)
            if s is not None and len(base) - len(s) >= rv:
                if tag == 6:
                    w = base
                elif tag == 7:
                    if base[: len(base) - len(s)].endswith("u"):
                        w = base
                else:
                    rep = {1: "iendo", 2: "ando", 3: "ar", 4: "er",
                           5: "ir"}[tag]
                    w = base[: len(base) - len(s)] + rep
            break
    # step 1: standard suffix, else y-verb, else verb
    s, tag = _longest_tagged(w, _ES_STD, 0)
    stripped = False
    if s is not None:
        i = len(w) - len(s)
        if tag == 6:
            if i >= p1:
                w = w[:i]
                stripped = True
                t, ti = _longest_tagged(w, _bylen(
                    (1, ["iv"]), (2, ["ic", "ad", "os"])), p2)
                if t is not None:
                    w = w[: len(w) - len(t)]
                    if ti == 1 and w.endswith("at") and len(w) - 2 >= p2:
                        w = w[:-2]
        elif i >= p2:
            w = w[:i]
            stripped = True
            if tag == 2:
                if w.endswith("ic") and len(w) - 2 >= p2:
                    w = w[:-2]
            elif tag == 3:
                w += "log"
            elif tag == 4:
                w += "u"
            elif tag == 5:
                w += "ente"
            elif tag == 7:
                t = _longest_suffix(w, ("able", "ible", "ante"), p2)
                if t is not None:
                    w = w[: len(w) - len(t)]
            elif tag == 8:
                t = _longest_suffix(w, ("abil", "ic", "iv"), p2)
                if t is not None:
                    w = w[: len(w) - len(t)]
            elif tag == 9:
                if w.endswith("at") and len(w) - 2 >= p2:
                    w = w[:-2]
    if not stripped:
        s = _longest_suffix(w, sorted(_ES_Y_VERB, key=len, reverse=True),
                            rv)
        if s is not None and w[: len(w) - len(s)].endswith("u"):
            w = w[: len(w) - len(s)]
        else:
            s, tag = _longest_tagged(w, _ES_VERB, rv)
            if s is not None:
                w = w[: len(w) - len(s)]
                if tag == 1 and w.endswith("gu"):
                    w = w[:-1]
    # step 3: residual
    s, tag = _longest_tagged(w, _ES_RESIDUAL, 0)
    if s is not None and len(w) - len(s) >= rv:
        w = w[: len(w) - len(s)]
        if tag == 2 and w.endswith("gu") and len(w) - 1 >= rv:
            w = w[:-1]
    return w.translate(_ES_POST)


# ---------------------------------------------------------------------------
# Italian


_IT_VOWELS = "aeiouàèìòù"
_IT_AEIO = set("aeioàèìò")
_IT_ACCENTS = str.maketrans("áéíóú", "àèìòù")
_IT_PRONOUNS = ("gliela", "gliele", "glieli", "glielo", "gliene",
                "cela", "cele", "celi", "celo", "cene", "mela", "mele",
                "meli", "melo", "mene", "sene", "tela", "tele", "teli",
                "telo", "tene", "vela", "vele", "veli", "velo", "vene",
                "gli", "ci", "la", "le", "li", "lo", "mi", "ne", "si",
                "ti", "vi")
_IT_GERUNDS = _bylen((1, ["ando", "endo"]), (2, ["ar", "er", "ir"]))
_IT_STD = _bylen(
    (1, ["ica", "osa", "ista", "anza", "ice", "atrice", "iche",
         "abile", "ibile", "ante", "mente", "iste", "anze", "ici",
         "atrici", "ichi", "abili", "ibili", "ismi", "osi", "anti",
         "isti", "ico", "ismo", "oso", "ose", "istà", "istè", "istì"]),
    (2, ["azione", "atore", "azioni", "atori"]),
    (3, ["logia", "logie"]),
    (4, ["usione", "uzione", "usioni", "uzioni"]),
    (5, ["enza", "enze"]),
    (6, ["amento", "amenti", "imento", "imenti"]),
    (7, ["amente"]),
    (8, ["ità"]),
    (9, ["iva", "ive", "ivi", "ivo"]),
)
_IT_VERB = ("isca", "enda", "ata", "ita", "uta", "ava", "eva", "iva",
            "erebbe", "irebbe", "isce", "ende", "are", "ere", "ire",
            "asse", "ate", "avate", "evate", "ivate", "ete", "erete",
            "irete", "ite", "ereste", "ireste", "ute", "erai", "irai",
            "isci", "endi", "erei", "irei", "assi", "ati", "iti",
            "eresti", "iresti", "uti", "avi", "evi", "ivi", "isco",
            "ando", "endo", "Yamo", "iamo", "avamo", "evamo", "ivamo",
            "eremo", "iremo", "assimo", "ammo", "emmo", "eremmo",
            "iremmo", "immo", "ano", "iscano", "avano", "evano",
            "ivano", "eranno", "iranno", "ono", "iscono", "arono",
            "erono", "irono", "erebbero", "irebbero", "assero",
            "essero", "issero", "ato", "ito", "uto", "avo", "evo",
            "ivo", "ar", "ir", "erà", "irà", "erò", "irò")
_IT_VERB_SORTED = tuple(sorted(_IT_VERB, key=len, reverse=True))


def stem_italian(w: str) -> str:
    # prelude: fold acute accents to grave, mark qu/u/i
    w = w.translate(_IT_ACCENTS)
    out = []
    i = 0
    n = len(w)
    while i < n:
        c = w[i]
        if c == "q" and i + 1 < n and w[i + 1] == "u":
            out.append("qU")
            i += 2
            continue
        if c in "ui" and out and out[-1][-1:] in _IT_VOWELS \
                and i + 1 < n and w[i + 1] in _IT_VOWELS:
            out.append(c.upper())
        else:
            out.append(c)
        i += 1
    w = "".join(out)
    rv = _rv_romance(w, _IT_VOWELS)
    p1, p2 = _r1r2_std(w, _IT_VOWELS)
    # step 0: attached pronoun
    for pron in sorted(_IT_PRONOUNS, key=len, reverse=True):
        if w.endswith(pron):
            base = w[: len(w) - len(pron)]
            s, tag = _longest_tagged(base, _IT_GERUNDS, 0)
            if s is not None and len(base) - len(s) >= rv:
                # ando/endo: drop the pronoun; ar/er/ir: pronoun -> "e"
                w = base if tag == 1 else base + "e"
            break
    # step 1: standard suffix, else verb suffix
    s, tag = _longest_tagged(w, _IT_STD, 0)
    stripped = False
    if s is not None:
        i = len(w) - len(s)
        if tag == 6:
            if i >= rv:
                w = w[:i]
                stripped = True
        elif tag == 7:
            if i >= p1:
                w = w[:i]
                stripped = True
                t, ti = _longest_tagged(w, _bylen(
                    (1, ["iv"]), (2, ["ic", "abil", "os"])), p2)
                if t is not None:
                    w = w[: len(w) - len(t)]
                    if ti == 1 and w.endswith("at") and len(w) - 2 >= p2:
                        w = w[:-2]
        elif i >= p2:
            w = w[:i]
            stripped = True
            if tag == 2:
                if w.endswith("ic") and len(w) - 2 >= p2:
                    w = w[:-2]
            elif tag == 3:
                w += "log"
            elif tag == 4:
                w += "u"
            elif tag == 5:
                w += "ente"
            elif tag == 8:
                t = _longest_suffix(w, ("abil", "ic", "iv"), p2)
                if t is not None:
                    w = w[: len(w) - len(t)]
            elif tag == 9:
                if w.endswith("at") and len(w) - 2 >= p2:
                    w = w[:-2]
                    if w.endswith("ic") and len(w) - 2 >= p2:
                        w = w[:-2]
    if not stripped:
        s = _longest_suffix(w, _IT_VERB_SORTED, rv)
        if s is not None:
            w = w[: len(w) - len(s)]
    # step 3: vowel suffix
    if w and w[-1] in _IT_AEIO and len(w) - 1 >= rv:
        w = w[:-1]
        if w.endswith("i") and len(w) - 1 >= rv:
            w = w[:-1]
    if w.endswith("h") and len(w) >= 2 and w[-2] in "cg" \
            and len(w) - 2 >= rv:
        w = w[:-1]
    return w.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# Portuguese


_PT_VOWELS = "aeiouáâéêíóôú"
_PT_STD = _bylen(
    (1, ["ica", "ância", "adora", "osa", "ista", "eza", "ante", "ável",
         "ível", "ico", "ismo", "oso", "amento", "imento", "aça~o",
         "ador", "icas", "adoras", "osas", "istas", "ezas", "adores",
         "antes", "aço~es", "icos", "ismos", "osos", "amentos",
         "imentos"]),
    (2, ["logia", "logias"]),
    (3, ["uça~o", "uço~es"]),
    (4, ["ência", "ências"]),
    (5, ["amente"]),
    (6, ["mente"]),
    (7, ["idade", "idades"]),
    (8, ["iva", "ivo", "ivas", "ivos"]),
    (9, ["ira", "iras"]),
)
_PT_VERB = ("ada", "ida", "ia", "aria", "eria", "iria", "ara", "era",
            "ira", "ava", "asse", "esse", "isse", "aste", "este",
            "iste", "ei", "arei", "erei", "irei", "am", "iam", "ariam",
            "eriam", "iriam", "aram", "eram", "iram", "avam", "em",
            "arem", "erem", "irem", "assem", "essem", "issem", "ado",
            "ido", "ando", "endo", "indo", "ara~o", "era~o", "ira~o",
            "ar", "er", "ir", "as", "adas", "idas", "ias", "arias",
            "erias", "irias", "aras", "eras", "iras", "avas", "es",
            "ardes", "erdes", "irdes", "ares", "eres", "ires", "asses",
            "esses", "isses", "astes", "estes", "istes", "is", "ais",
            "eis", "areis", "ereis", "ireis", "áreis", "éreis",
            "íreis", "ásseis", "ésseis", "ísseis", "áveis", "íeis",
            "aríeis", "eríeis", "iríeis", "ados", "idos", "amos",
            "áramos", "éramos", "íramos", "ávamos", "íamos",
            "aríamos", "eríamos", "iríamos", "emos", "aremos",
            "eremos", "iremos", "ássemos", "êssemos", "íssemos",
            "imos", "armos", "ermos", "irmos", "ámos", "arás", "erás",
            "irás", "eu", "iu", "ou", "ará", "erá", "irá")
_PT_VERB_SORTED = tuple(sorted(_PT_VERB, key=len, reverse=True))
_PT_RESIDUAL = ("a", "i", "o", "os", "á", "í", "ó")


def stem_portuguese_snowball(w: str) -> str:
    w = w.replace("ã", "a~").replace("õ", "o~")
    rv = _rv_romance(w, _PT_VOWELS)
    p1, p2 = _r1r2_std(w, _PT_VOWELS)
    # step 1: standard suffix, else verb suffix
    s, tag = _longest_tagged(w, _PT_STD, 0)
    stripped = False
    if s is not None:
        i = len(w) - len(s)
        if tag == 5:                              # amente
            if i >= p1:
                w = w[:i]
                stripped = True
                t, ti = _longest_tagged(w, _bylen(
                    (1, ["iv"]), (2, ["ic", "ad", "os"])), p2)
                if t is not None:
                    w = w[: len(w) - len(t)]
                    if ti == 1 and w.endswith("at") and len(w) - 2 >= p2:
                        w = w[:-2]
        elif tag == 9:                            # ira(s) -> ir after e
            if i >= rv and i >= 1 and w[i - 1] == "e":
                w = w[:i] + "ir"
                stripped = True
        elif i >= p2:
            w = w[:i]
            stripped = True
            if tag == 2:
                w += "log"
            elif tag == 3:
                w += "u"
            elif tag == 4:
                w += "ente"
            elif tag == 6:
                t = _longest_suffix(w, ("ante", "avel", "ível"), p2)
                if t is not None:
                    w = w[: len(w) - len(t)]
            elif tag == 7:
                t = _longest_suffix(w, ("abil", "ic", "iv"), p2)
                if t is not None:
                    w = w[: len(w) - len(t)]
            elif tag == 8:
                if w.endswith("at") and len(w) - 2 >= p2:
                    w = w[:-2]
    if not stripped:
        s = _longest_suffix(w, _PT_VERB_SORTED, rv)
        if s is not None:
            w = w[: len(w) - len(s)]
            stripped = True
    if stripped:
        # after a removal: ci -> c (the i in RV)
        if w.endswith("ci") and len(w) - 1 >= rv:
            w = w[:-1]
    else:
        # residual suffix
        s = _longest_suffix(w, sorted(_PT_RESIDUAL, key=len,
                                      reverse=True), 0)
        if s is not None and len(w) - len(s) >= rv:
            w = w[: len(w) - len(s)]
    # residual form
    if w.endswith(("e", "é", "ê")):
        if len(w) - 1 >= rv:
            w = w[:-1]
            if (w.endswith("gu") or w.endswith("ci")) \
                    and len(w) - 1 >= rv:
                w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"
    return w.replace("a~", "ã").replace("o~", "õ")


# ---------------------------------------------------------------------------
# Finnish


_FI_V1 = "aeiouyäö"
_FI_V2 = "aeiouäö"
_FI_AEI = "aeiä"
_FI_C = set("bcdfghjklmnpqrstvwxz")
_FI_PARTICLE_END = set("aeinotuyäö")
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_FI_PARTICLES = _bylen((1, ["pa", "kaan", "han", "kin", "hän", "kään",
                            "ko", "pä", "kö"]), (2, ["sti"]))
_FI_POSS = _bylen((1, ["si"]), (2, ["ni"]), (3, ["nsa", "mme", "nne",
                                                 "nsä"]),
                  (4, ["an"]), (5, ["än"]), (6, ["en"]))
# case endings: (suffix, kind) where kind encodes the condition
_FI_CASES = _bylen(
    (("pre", "a"), ["han"]), (("pre", "e"), ["hen"]),
    (("pre", "i"), ["hin"]), (("pre", "o"), ["hon"]),
    (("pre", "ä"), ["hän"]), (("pre", "ö"), ["hön"]),
    (("long",), ["seen"]), (("vi",), ["den", "tten", "siin"]),
    (("n",), ["n"]), (("a",), ["a", "ä"]), (("tta",), ["tta", "ttä"]),
    (("plain",), ["lla", "na", "ssa", "ta", "lta", "sta", "llä", "nä",
                  "ssä", "tä", "ltä", "stä", "lle", "ine", "ksi"]),
)
_FI_OTHER = _bylen((1, ["mpa", "mpi", "mma", "mmi", "mpä", "mpä"]),
                   (-1, ["eja", "impa", "impi", "imma", "immi", "ejä",
                         "impä", "immä", "mpä", "mmä"]))


def stem_finnish(w: str) -> str:
    p1, p2 = _r1r2_std(w, _FI_V1)
    # step 1: particle etc (within R1)
    s, tag = _longest_tagged(w, _FI_PARTICLES, p1)
    if s is not None:
        i = len(w) - len(s)
        if tag == 1:
            if i >= 1 and w[i - 1] in _FI_PARTICLE_END:
                w = w[:i]
        elif i >= p2:
            w = w[:i]
    # step 2: possessive (within R1)
    s, tag = _longest_tagged(w, _FI_POSS, p1)
    if s is not None:
        i = len(w) - len(s)
        if tag == 1:
            if not w[:i].endswith("k"):
                w = w[:i]
        elif tag == 2:
            w = w[:i]
            if w.endswith("kse"):
                w = w[:-1] + "i"
        elif tag == 3:
            w = w[:i]
        elif tag == 4:
            if w[:i].endswith(("lla", "na", "ssa", "ta", "lta", "sta")):
                w = w[:i]
        elif tag == 5:
            if w[:i].endswith(("llä", "nä", "ssä", "tä", "ltä", "stä")):
                w = w[:i]
        elif w[:i].endswith(("lle", "ine")):
            w = w[:i]
    # step 3: case ending (within R1, conditional entries fall back)
    ending_removed = False
    n = len(w)
    for s, tag in _FI_CASES:
        i = n - len(s)
        if i < p1 or not w.endswith(s):
            continue
        kind = tag[0]
        # long/vi are among-level conditions: failure falls back to a
        # shorter entry; all other conditions abort the step entirely
        if kind == "long":
            if not (i >= p1 + 2 and w[i - 2: i] in _FI_LONG):
                continue
        elif kind == "vi":
            if not (i >= p1 + 2 and w[i - 1] == "i"
                    and w[i - 2] in _FI_V2):
                continue
        if kind == "pre":
            if not (i >= 1 and w[i - 1] == tag[1]):
                break
        elif kind == "tta":
            if not (i >= 1 and w[i - 1] == "e"):
                break
        elif kind == "a":
            if not (i >= 2 and w[i - 1] in _FI_V1 and w[i - 2] in _FI_C):
                break
        if kind == "n" and (w[max(0, i - 2): i] in _FI_LONG
                            or w[max(0, i - 2): i] == "ie") and i >= 1:
            i -= 1
        w = w[:i]
        ending_removed = True
        break
    # step 4: other endings (within R2)
    s, tag = _longest_tagged(w, _FI_OTHER, p2)
    if s is not None:
        i = len(w) - len(s)
        if tag == -1 or not w[:i].endswith("po"):
            w = w[:i]
    # step 5
    if ending_removed:
        if w.endswith(("i", "j")) and len(w) - 1 >= p1:
            w = w[:-1]
    else:
        if w.endswith("t") and len(w) - 1 >= p1 and len(w) >= 2 \
                and w[-2] in _FI_V1:
            w = w[:-1]
            s, tag = _longest_tagged(w, _bylen(
                (1, ["mma"]), (-1, ["imma"])), p2)
            if s is not None:
                i = len(w) - len(s)
                if tag == -1 or not w[:i].endswith("po"):
                    w = w[:i]
    # step 6: tidy (conditions must lie entirely within R1)
    if len(w) - 2 >= p1 and w[-2:] in _FI_LONG:
        w = w[:-1]
    if w and w[-1] in _FI_AEI and len(w) - 2 >= p1 and w[-2] in _FI_C:
        w = w[:-1]
    if w.endswith(("oj", "uj")) and len(w) - 2 >= p1:
        w = w[:-1]
    if w.endswith("jo") and len(w) - 2 >= p1:
        w = w[:-1]
    # undouble the final consonant before trailing vowels
    j = len(w) - 1
    while j >= 0 and w[j] in _FI_V1:
        j -= 1
    if j >= 1 and w[j] in _FI_C and w[j - 1] == w[j]:
        w = w[:j] + w[j + 1:]
    return w


# ---------------------------------------------------------------------------
# Romanian


_RO_VOWELS = "aeiouâîă"
_RO_STEP0 = _bylen(
    (1, ["ul", "ului"]), (2, ["aua"]), (3, ["ea", "ele", "elor"]),
    (4, ["ii", "iua", "iei", "iile", "ilor", "iilor"]), (5, ["ile"]),
    (6, ["atei"]), (7, ["aţia", "aţie"]),
)
_RO_COMBO = _bylen(
    (1, ["abilitate", "abilitati", "abilităi", "abilităţi"]),
    (2, ["ibilitate"]),
    (3, ["ivitate", "ivitati", "ivităi", "ivităţi"]),
    (4, ["icala", "iciva", "icale", "icitate", "icive", "icali",
         "icatori", "icitati", "icivi", "icităi", "icităţi", "ical",
         "icator", "iciv", "icală", "icivă"]),
    (5, ["ativa", "aţiune", "atoare", "ătoare", "ative", "atori",
         "ători", "ativi", "ator", "ător", "ativ", "ativă"]),
    (6, ["itiva", "iţiune", "itoare", "itive", "itivi", "itori",
         "itor", "itiv", "itivă"]),
)
_RO_STD = _bylen(
    (1, ["ica", "abila", "ibila", "oasa", "ata", "ita", "anta", "uta",
         "iva", "ic", "ice", "abile", "ibile", "oase", "ate", "itate",
         "ite", "ante", "ute", "ive", "ici", "abili", "ibili", "atori",
         "osi", "ati", "itati", "iti", "anti", "uti", "ivi", "ităi",
         "oşi", "ităţi", "abil", "ibil", "ator", "os", "at", "it",
         "ant", "ut", "iv", "ică", "abilă", "ibilă", "oasă", "ată",
         "ită", "antă", "ută", "ivă"]),
    (2, ["iune", "iuni"]),
    (3, ["ista", "isme", "iste", "isti", "işti", "ism", "ist", "istă"]),
)
_RO_VERB = _bylen(
    (1, ["ea", "ia", "esc", "ăsc", "ind", "ând", "are", "ere", "ire",
         "âre", "ase", "ise", "use", "âse", "eşte", "ăşte", "eze",
         "ai", "eai", "iai", "eşti", "ăşti", "ui", "ezi", "âi", "aşi",
         "aseşi", "iseşi", "useşi", "âseşi", "işi", "uşi", "âşi",
         "eaţi", "iaţi", "arăţi", "aserăţi", "iserăţi", "userăţi",
         "âserăţi", "irăţi", "urăţi", "ârăţi", "am", "eam", "iam",
         "asem", "isem", "usem", "âsem", "arăm", "aserăm", "iserăm",
         "userăm", "âserăm", "irăm", "urăm", "ârăm", "au", "eau",
         "iau", "indu", "ându", "ez", "ească", "ară", "aseră",
         "iseră", "useră", "âseră", "iră", "ură", "âră", "ează"]),
    (2, ["se", "sese", "sei", "seşi", "seseşi", "aţi", "eţi", "iţi",
         "âţi", "serăţi", "seserăţi", "em", "sesem", "im", "âm", "ăm",
         "serăm", "seserăm", "seră", "seseră"]),
)
_RO_VOWEL_SUF = ("ie", "a", "e", "i", "ă")


def stem_romanian(w: str) -> str:
    # prelude: u/i between vowels -> U/I
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "ui" and chars[i - 1] in _RO_VOWELS \
                and chars[i + 1] in _RO_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    rv = _rv_romance(w, _RO_VOWELS)
    p1, p2 = _r1r2_std(w, _RO_VOWELS)
    # step 0 (R1)
    s, tag = _longest_tagged(w, _RO_STEP0, 0)
    if s is not None and len(w) - len(s) >= p1:
        i = len(w) - len(s)
        if tag == 1:
            w = w[:i]
        elif tag == 2:
            w = w[:i] + "a"
        elif tag == 3:
            w = w[:i] + "e"
        elif tag == 4:
            w = w[:i] + "i"
        elif tag == 5:
            if not w[:i].endswith("ab"):
                w = w[:i] + "i"
        elif tag == 6:
            w = w[:i] + "at"
        else:
            w = w[:i] + "aţi"
    # standard suffix: repeat combo, then a_3 in R2
    removed = False
    while True:
        s, tag = _longest_tagged(w, _RO_COMBO, 0)
        if s is None or len(w) - len(s) < p1:
            break
        i = len(w) - len(s)
        w = w[:i] + {1: "abil", 2: "ibil", 3: "iv", 4: "ic", 5: "at",
                     6: "it"}[tag]
        removed = True
    s, tag = _longest_tagged(w, _RO_STD, 0)
    if s is not None and len(w) - len(s) >= p2:
        i = len(w) - len(s)
        if tag == 1:
            w = w[:i]
            removed = True
        elif tag == 2:
            if w[:i].endswith("ţ"):
                w = w[: i - 1] + "t"
                removed = True
        else:
            w = w[:i] + "ist"
            removed = True
    # verb suffix (within RV) only if nothing standard was removed
    if not removed:
        s, tag = _longest_tagged(w, _RO_VERB, rv)
        if s is not None:
            i = len(w) - len(s)
            if tag == 2:
                w = w[:i]
            elif i - 1 >= rv and (w[i - 1] not in _RO_VOWELS
                                  or w[i - 1] == "u"):
                w = w[:i]
    # vowel suffix: longest textual match, then RV gate (no fallback)
    s = _longest_suffix(w, _RO_VOWEL_SUF, 0)
    if s is not None and len(w) - len(s) >= rv:
        w = w[: len(w) - len(s)]
    return w.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# Hungarian


_HU_VOWELS = "aeiouáéíóöúüőű"
_HU_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLES = ("ccs", "ssz", "zzs", "ggy", "lly", "nny", "tty", "bb",
               "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn",
               "pp", "rr", "ss", "tt", "vv", "zz")
def _hu_p1(w: str) -> int:
    n = len(w)
    if n == 0:
        return 0
    if w[0] in _HU_VOWELS:
        i = 1
        while i < n and w[i] in _HU_VOWELS:
            i += 1
        if i >= n:
            return n
        for d in _HU_DIGRAPHS:
            if w.startswith(d, i):
                return i + len(d)
        return i + 1
    for i in range(1, n):
        if w[i] in _HU_VOWELS:
            return i + 1
    return n


def _hu_undouble(w: str) -> str:
    return w[:-2] + w[-1] if len(w) >= 2 else w


def _hu_ends_double(w: str) -> bool:
    return w.endswith(_HU_DOUBLES)


def stem_hungarian(w: str) -> str:
    p1 = _hu_p1(w)

    def in_r1(i):
        return i >= p1

    def v_ending(v):
        if v.endswith("á") and in_r1(len(v) - 1):
            return v[:-1] + "a"
        if v.endswith("é") and in_r1(len(v) - 1):
            return v[:-1] + "e"
        return v

    # instrumental: al/el in R1 after a double consonant
    if (w.endswith("al") or w.endswith("el")) and in_r1(len(w) - 2) \
            and _hu_ends_double(w[:-2]):
        w = _hu_undouble(w[:-2])
    # general cases
    s = _longest_suffix(w, _HU_CASE_SORTED, 0)
    if s is not None and in_r1(len(w) - len(s)):
        w = v_ending(w[: len(w) - len(s)])
    # special cases: án/ánként -> a, én -> e
    s, tag = _longest_tagged(w, _HU_SPECIAL, 0)
    if s is not None and in_r1(len(w) - len(s)):
        w = w[: len(w) - len(s)] + tag
    # case other: stul/stül family
    s, tag = _longest_tagged(w, _HU_OTHER, 0)
    if s is not None and in_r1(len(w) - len(s)):
        w = w[: len(w) - len(s)] + tag
    # factive: á/é in R1 after a double consonant
    if w and w[-1] in "áé" and in_r1(len(w) - 1) \
            and _hu_ends_double(w[:-1]):
        w = _hu_undouble(w[:-1])
    # owned
    s, tag = _longest_tagged(w, _HU_OWNED, 0)
    if s is not None and in_r1(len(w) - len(s)):
        w = w[: len(w) - len(s)] + tag
    # singular owner
    s, tag = _longest_tagged(w, _HU_SING_OWNER, 0)
    if s is not None and in_r1(len(w) - len(s)):
        w = w[: len(w) - len(s)] + tag
    # plural owner
    s, tag = _longest_tagged(w, _HU_PLUR_OWNER, 0)
    if s is not None and in_r1(len(w) - len(s)):
        w = w[: len(w) - len(s)] + tag
    # plural
    s, tag = _longest_tagged(w, _HU_PLURAL, 0)
    if s is not None and in_r1(len(w) - len(s)):
        w = w[: len(w) - len(s)] + tag
    return w


_HU_SPECIAL = _bylen(("a", ["ánként", "án"]), ("e", ["én"]))
_HU_OTHER = _bylen(("a", ["ástul"]), ("e", ["éstül"]),
                   ("", ["astul", "estül", "stul", "stül"]))
_HU_OWNED = _bylen(("a", ["áéi", "áké"]), ("e", ["ééi", "éké", "éé"]),
                   ("", ["aké", "eké", "oké", "öké", "éi", "ké", "é"]))
_HU_PLURAL = _bylen(("a", ["ák"]), ("e", ["ék"]),
                    ("", ["ak", "ek", "ok", "ök", "k"]))


_HU_CASE_SORTED = tuple(sorted(
    ("ba", "ra", "be", "re", "ig", "nak", "nek", "val", "vel", "ul",
     "nál", "nél", "ból", "ról", "tól", "ül", "ből", "ről", "től",
     "n", "an", "ban", "en", "ben", "képpen", "on", "ön", "képp",
     "kor", "t", "at", "et", "ként", "anként", "enként", "onként",
     "ot", "ért", "öt", "hez", "hoz", "höz", "vá", "vé"),
    key=len, reverse=True))
_HU_SING_OWNER = _bylen(
    ("", ["a", "ja", "d", "ad", "ed", "od", "öd", "e", "je", "nk",
          "unk", "ünk", "uk", "juk", "ük", "jük", "m", "am", "em",
          "om", "o"]),
    ("a", ["ád", "ánk", "ájuk", "ám", "á"]),
    ("e", ["éd", "énk", "éjük", "ém", "é"]),
)
_HU_PLUR_OWNER = _bylen(
    ("", ["id", "aid", "jaid", "eid", "jeid", "i", "ai", "jai", "ei",
          "jei", "itek", "eitek", "jeitek", "ik", "aik", "jaik", "eik",
          "jeik", "ink", "aink", "jaink", "eink", "jeink", "aitok",
          "jaitok", "im", "aim", "jaim", "eim", "jeim"]),
    ("a", ["áid", "ái", "áik", "áink", "áitok", "áim"]),
    ("e", ["éid", "éi", "éik", "éink", "éim", "éitek"]),
)


# ---------------------------------------------------------------------------
# Irish


_GA_VOWELS = "aeiouáéíóú"
_GA_INITIAL = _bylen(
    ("", ["b'", "d'", "h-", "m'", "n-", "t-"]),
    ("f", ["bhf", "d'fh", "fh"]), ("s", ["sh", "ts"]),
    ("b", ["bh", "mb"]), ("c", ["ch", "gc"]), ("d", ["dh", "nd"]),
    ("g", ["gh", "ng"]), ("p", ["bp", "ph"]), ("t", ["dt", "th"]),
    ("m", ["mh"]),
)
_GA_NOUN = _bylen(
    (1, ["íochta", "aíochta", "abh", "eabh", "ibh", "aibh", "amh",
         "eamh", "imh", "aimh", "íocht", "aíocht"]),
    (2, ["ire", "aire", "irí", "airí"]),
)
_GA_DERIV = _bylen(
    (1, ["achta", "eachta", "ach", "each", "achtúil", "eachtúil",
         "acht", "eacht"]),
    ("arc", ["arcachta", "arcacht", "arcachtaí"]),
    ("gin", ["gineach", "gineas", "ginis"]),
    ("graf", ["grafaíochta", "grafaíoch", "grafaíocht", "grafaíochtaí"]),
    ("paite", ["patacha", "paite", "patach", "pataigh"]),
    ("óid", ["óideacha", "óideach", "óidigh"]),
)
_GA_VERB = _bylen(
    (1, ["imid", "aimid", "ímid", "aímid", "faidh", "fidh"]),
    (2, ["adh", "eadh", "áil", "ain", "tear", "tar"]),
)


def stem_irish(w: str) -> str:
    # initial mutation morphology (longest prefix)
    best = None
    for s, tag in _GA_INITIAL:
        if w.startswith(s) and (best is None or len(s) > len(best[0])):
            best = (s, tag)
    if best is not None:
        w = best[1] + w[len(best[0]):]
    pv = len(w)
    for i, c in enumerate(w):
        if c in _GA_VOWELS:
            pv = i + 1
            break
    p1, p2 = _r1r2_std(w, _GA_VOWELS)
    # noun suffixes
    s, tag = _longest_tagged(w, _GA_NOUN, 0)
    if s is not None:
        i = len(w) - len(s)
        if (tag == 1 and i >= p1) or (tag == 2 and i >= p2):
            w = w[:i]
    # derivational
    s, tag = _longest_tagged(w, _GA_DERIV, 0)
    if s is not None:
        i = len(w) - len(s)
        if tag == 1:
            if i >= p2:
                w = w[:i]
        else:
            w = w[:i] + tag
    # verb suffixes
    s, tag = _longest_tagged(w, _GA_VERB, 0)
    if s is not None:
        i = len(w) - len(s)
        if (tag == 1 and i >= pv) or (tag == 2 and i >= p1):
            w = w[:i]
    return w


# ---------------------------------------------------------------------------
# Nepali


_NE_CAT1 = _bylen(
    (1, ["लाइ", "लाई", "सँग", "संग", "मार्फत", "रत", "मा", "द्वारा",
         "पछि", "ले", "सँगै", "मै"]),
    (2, ["का", "कि", "की", "कै", "को"]),
)
_NE_CAT3 = tuple(sorted(
    ["थिए", "छ", "इछ", "एछ", "िछ", "ेछ", "नेछ", "हुनेछ", "इन्छ",
     "िन्छ", "हुन्छ", "एका", "इएका", "िएका", "ेका", "नेका", "दा",
     "इदा", "िदा", "देखि", "माथि", "एकी", "इएकी", "िएकी", "ेकी",
     "देखी", "थी", "दी", "छु", "एछु", "ेछु", "नेछु", "नु", "हरु",
     "हरू", "छे", "थे", "ने", "एकै", "ेकै", "नेकै", "दै", "इदै",
     "िदै", "एको", "इएको", "िएको", "ेको", "नेको", "दो", "इदो",
     "िदो", "यो", "इयो", "भयो", "ियो", "थियो", "दियो", "थ्यो",
     "छौ", "इछौ", "एछौ", "िछौ", "ेछौ", "नेछौ", "यौ", "थियौ",
     "छ्यौ", "थ्यौ", "छन्", "इछन्", "एछन्", "िछन्", "ेछन्",
     "नेछन्", "लान्", "छिन्", "थिन्", "पर्", "इस्", "थिइस्", "छस्",
     "इछस्", "एछस्", "िछस्", "ेछस्", "नेछस्", "िस्", "थिस्",
     "छेस्", "होस्"], key=len, reverse=True))


def stem_nepali(w: str) -> str:
    s, tag = _longest_tagged(w, _NE_CAT1, 0)
    if s is not None:
        i = len(w) - len(s)
        if tag == 1 or not w[:i].endswith(("ए", "े")):
            w = w[:i]
    while True:
        if w.endswith(("ँ", "ं")):
            if w[:-1].endswith(("यौ", "छौ", "नौ", "थे")):
                w = w[:-1]
        elif w.endswith("ै") and w[:-1].endswith("त्र"):
            w = w[:-1]
        s = _longest_suffix(w, _NE_CAT3, 0)
        if s is None:
            break
        w = w[: len(w) - len(s)]
    return w


# ---------------------------------------------------------------------------
# Turkish


_TR_VOWELS = "aeiouöüı"
_TR_U = "iuüı"
_TR_HARMONY = {"a": "aouı", "e": "eiöü", "ı": "aı", "i": "ei",
               "o": "ou", "ö": "öü", "u": "ou", "ü": "öü"}


class _TrCtx:
    """Backward-mode cursor over a mutable string; positions are stored
    as distance-from-end so suffix deletions keep earlier saves valid
    (mirrors the snowball runtime's ``limit - cursor`` save discipline)."""

    __slots__ = ("s", "d", "ket", "cont")

    def __init__(self, s):
        self.s = s
        self.d = 0          # cursor distance from the end
        self.ket = 0
        self.cont = True

    def pos(self):
        return len(self.s) - self.d

    def eq(self, t):
        i = self.pos()
        if i - len(t) < 0 or self.s[i - len(t): i] != t:
            return False
        self.d += len(t)
        return True

    def grp(self, chars):
        i = self.pos()
        if i <= 0 or self.s[i - 1] not in chars:
            return False
        self.d += 1
        return True

    def among(self, entries):
        i = self.pos()
        for suf in entries:
            if i - len(suf) >= 0 and self.s.startswith(suf, i - len(suf)):
                self.d += len(suf)
                return True
        return False

    def delete(self):
        # delete [cursor, ket)
        n = len(self.s)
        self.s = self.s[: n - self.d] + self.s[n - self.ket:]
        self.d = self.ket


def _tr_harmony(ctx):
    s, i = ctx.s, ctx.pos()
    j = i - 1
    while j >= 0 and s[j] not in _TR_VOWELS:
        j -= 1
    if j < 0:
        return False
    pair = _TR_HARMONY[s[j]]
    k = j - 1
    while k >= 0:
        if s[k] in pair:
            return True
        k -= 1
    return False


def _tr_opt_cons(ctx, ch):
    # suffix preceded by an optional consonant ``ch`` which must itself
    # be preceded by a vowel; without ``ch``, the second char back must
    # be a vowel (mark_suffix_with_optional_*_consonant)
    s, i = ctx.s, ctx.pos()
    if i - 1 >= 0 and s[i - 1] == ch:
        if i - 2 >= 0 and s[i - 2] in _TR_VOWELS:
            ctx.d += 1
            return True
        return False
    return i - 2 >= 0 and s[i - 2] in _TR_VOWELS


def _tr_opt_U(ctx):
    s, i = ctx.s, ctx.pos()
    if i - 1 >= 0 and s[i - 1] in _TR_U:
        if i - 2 >= 0 and s[i - 2] not in _TR_VOWELS:
            ctx.d += 1
            return True
        return False
    return i - 2 >= 0 and s[i - 2] not in _TR_VOWELS


def _srt(*sufs):
    return tuple(sorted(sufs, key=len, reverse=True))


_TR_A0 = _srt("m", "n", "miz", "niz", "muz", "nuz", "müz", "nüz",
              "mız", "nız")
_TR_A20 = _srt("di", "ti", "dik", "tik", "duk", "tuk", "dük", "tük",
               "dık", "tık", "dim", "tim", "dum", "tum", "düm", "tüm",
               "dım", "tım", "din", "tin", "dun", "tun", "dün", "tün",
               "dın", "tın", "du", "tu", "dü", "tü", "dı", "tı")


def _m_possessives(c):
    return c.among(_TR_A0) and _tr_opt_U(c)


def _m_sU(c):
    return _tr_harmony(c) and c.grp(_TR_U) and _tr_opt_cons(c, "s")


def _m_lArI(c):
    return c.among(("leri", "ları"))


def _m_yU(c):
    return _tr_harmony(c) and c.grp(_TR_U) and _tr_opt_cons(c, "y")


def _m_nU(c):
    return _tr_harmony(c) and c.among(("ni", "nu", "nü", "nı"))


def _m_nUn(c):
    return _tr_harmony(c) and c.among(("in", "un", "ün", "ın")) \
        and _tr_opt_cons(c, "n")


def _m_yA(c):
    return _tr_harmony(c) and c.among(("a", "e")) and _tr_opt_cons(c, "y")


def _m_nA(c):
    return _tr_harmony(c) and c.among(("na", "ne"))


def _m_DA(c):
    return _tr_harmony(c) and c.among(("da", "ta", "de", "te"))


def _m_ndA(c):
    return _tr_harmony(c) and c.among(("nda", "nde"))


def _m_DAn(c):
    return _tr_harmony(c) and c.among(("dan", "tan", "den", "ten"))


def _m_ndAn(c):
    return _tr_harmony(c) and c.among(("ndan", "nden"))


def _m_ylA(c):
    return _tr_harmony(c) and c.among(("la", "le")) \
        and _tr_opt_cons(c, "y")


def _m_ki(c):
    return c.eq("ki")


def _m_ncA(c):
    return _tr_harmony(c) and c.among(("ca", "ce")) \
        and _tr_opt_cons(c, "n")


def _m_yUm(c):
    return _tr_harmony(c) and c.among(("im", "um", "üm", "ım")) \
        and _tr_opt_cons(c, "y")


def _m_sUn(c):
    return _tr_harmony(c) and c.among(("sin", "sun", "sün", "sın"))


def _m_yUz(c):
    return _tr_harmony(c) and c.among(("iz", "uz", "üz", "ız")) \
        and _tr_opt_cons(c, "y")


def _m_sUnUz(c):
    return c.among(("siniz", "sunuz", "sünüz", "sınız"))


def _m_lAr(c):
    return _tr_harmony(c) and c.among(("lar", "ler"))


def _m_nUz(c):
    return _tr_harmony(c) and c.among(("niz", "nuz", "nüz", "nız"))


def _m_DUr(c):
    return _tr_harmony(c) and c.among(
        ("dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır"))


def _m_cAsInA(c):
    return c.among(("casına", "cesine"))


def _m_yDU(c):
    return _tr_harmony(c) and c.among(_TR_A20) and _tr_opt_cons(c, "y")


def _m_ysA(c):
    return c.among(_srt("sa", "se", "sak", "sek", "sam", "sem", "san",
                        "sen")) and _tr_opt_cons(c, "y")


def _m_ymUs(c):
    return _tr_harmony(c) and c.among(("miş", "muş", "müş", "mış")) \
        and _tr_opt_cons(c, "y")


def _m_yken(c):
    return c.eq("ken") and _tr_opt_cons(c, "y")


def _try(c, v, *marks):
    """Try marks as alternatives from saved distance v; True if any."""
    for m in marks:
        c.d = v
        if m(c):
            return True
    c.d = v
    return False


def _tr_nominal_verb(c):
    c.ket = c.d
    c.cont = True
    v1 = c.d
    done = False
    if _try(c, v1, _m_ymUs, _m_yDU, _m_ysA, _m_yken):
        done = True
    if not done:
        c.d = v1
        if _m_cAsInA(c):
            v3 = c.d
            if not _try(c, v3, _m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz):
                c.d = v3
            if _m_ymUs(c):
                done = True
    if not done:
        c.d = v1
        if _m_lAr(c):
            c.delete()
            v4 = c.d
            c.ket = c.d
            if not _try(c, c.d, _m_DUr, _m_yDU, _m_ysA, _m_ymUs):
                c.d = v4
            c.cont = False
            done = True
    if not done:
        c.d = v1
        if _m_nUz(c):
            if _try(c, c.d, _m_yDU, _m_ysA):
                done = True
    if not done:
        c.d = v1
        if _try(c, v1, _m_sUnUz, _m_yUz, _m_sUn, _m_yUm):
            c.delete()
            v8 = c.d
            c.ket = c.d
            if not _m_ymUs(c):
                c.d = v8
            done = True
    if not done:
        c.d = v1
        if not _m_DUr(c):
            return False
        c.delete()
        v9 = c.d
        c.ket = c.d
        v10 = c.d
        if not _try(c, v10, _m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz):
            c.d = v10
        if not _m_ymUs(c):
            c.d = v9
    c.delete()
    return True


def _alt(c, v, *marks):
    """First mark that succeeds from saved distance v; restore v and
    return False if none do."""
    for m in marks:
        c.d = v
        if m(c):
            return True
    c.d = v
    return False


def _lar_ki_try(c, v):
    """try([mark_lAr] slice_del stem_suffix_chain_before_ki): marks and
    deletes lAr then requires the ki chain, restoring v on any failure."""
    c.ket = c.d
    if _m_lAr(c):
        c.delete()
        if not _tr_chain_before_ki(c):
            c.d = v
    else:
        c.d = v


def _tr_chain_before_ki(c):
    c.ket = c.d
    if not _m_ki(c):
        return False
    v1 = c.d
    if _m_DA(c):
        c.delete()
        v2 = c.d
        c.ket = c.d
        v3 = c.d
        if _m_lAr(c):
            c.delete()
            v4 = c.d
            if not _tr_chain_before_ki(c):
                c.d = v4
        else:
            c.d = v3
            if _m_possessives(c):
                c.delete()
                v5 = c.d
                _lar_ki_try(c, v5)
            else:
                c.d = v2
        return True
    c.d = v1
    if _m_nUn(c):
        c.delete()
        v6 = c.d
        c.ket = c.d
        v7 = c.d
        if _m_lArI(c):
            c.delete()
        else:
            c.d = v7
            c.ket = c.d
            if _alt(c, v7, _m_possessives, _m_sU):
                c.delete()
                v9 = c.d
                _lar_ki_try(c, v9)
            else:
                c.d = v7
                if not _tr_chain_before_ki(c):
                    c.d = v6
        return True
    c.d = v1
    if not _m_ndA(c):
        return False
    v10 = c.d
    if _m_lArI(c):
        c.delete()
        return True
    c.d = v10
    if _m_sU(c):
        c.delete()
        v11 = c.d
        _lar_ki_try(c, v11)
        return True
    c.d = v10
    return _tr_chain_before_ki(c)


def _tr_noun_suffixes(c):
    v1 = c.d
    # alt 1: [lAr] slice try(chain_ki)
    c.ket = c.d
    if _m_lAr(c):
        c.delete()
        v2 = c.d
        if not _tr_chain_before_ki(c):
            c.d = v2
        return True
    c.d = v1
    # alt 2: [ncA] slice try(lArI | [poss|sU] slice try(lAr-ki) |
    #                        [lAr] slice chain_ki)
    c.ket = c.d
    if _m_ncA(c):
        c.delete()
        v3 = c.d
        v4 = c.d
        c.ket = c.d
        if _m_lArI(c):
            c.delete()
        else:
            c.d = v4
            c.ket = c.d
            if _alt(c, v4, _m_possessives, _m_sU):
                c.delete()
                v6 = c.d
                _lar_ki_try(c, v6)
            else:
                c.d = v4
                c.ket = c.d
                if _m_lAr(c):
                    c.delete()
                    if not _tr_chain_before_ki(c):
                        c.d = v3
                else:
                    c.d = v3
        return True
    c.d = v1
    # alt 3: [ndA|nA] (lArI slice | sU slice try(lAr-ki) | chain_ki)
    c.ket = c.d
    if _alt(c, v1, _m_ndA, _m_nA):
        v8 = c.d
        if _m_lArI(c):
            c.delete()
            return True
        c.d = v8
        if _m_sU(c):
            c.delete()
            v9 = c.d
            _lar_ki_try(c, v9)
            return True
        c.d = v8
        if _tr_chain_before_ki(c):
            return True
    c.d = v1
    # alt 4: [ndAn|nU] (sU slice try(lAr-ki) | lArI (no delete))
    c.ket = c.d
    if _alt(c, v1, _m_ndAn, _m_nU):
        v11 = c.d
        if _m_sU(c):
            c.delete()
            v12 = c.d
            _lar_ki_try(c, v12)
            return True
        c.d = v11
        if _m_lArI(c):
            return True
    c.d = v1
    # alt 5: [DAn] slice try([poss] slice try(lAr-ki) |
    #                        [lAr] slice try(chain) | chain)
    c.ket = c.d
    if _m_DAn(c):
        c.delete()
        v13 = c.d
        c.ket = c.d
        v14 = c.d
        if _m_possessives(c):
            c.delete()
            v15 = c.d
            _lar_ki_try(c, v15)
        else:
            c.d = v14
            if _m_lAr(c):
                c.delete()
                v16 = c.d
                if not _tr_chain_before_ki(c):
                    c.d = v16
            else:
                c.d = v14
                if not _tr_chain_before_ki(c):
                    c.d = v13
        return True
    c.d = v1
    # alt 6: [nUn|ylA] slice try([lAr] slice chain |
    #                            [poss|sU] slice try(lAr-ki) | chain)
    c.ket = c.d
    if _alt(c, v1, _m_nUn, _m_ylA):
        c.delete()
        v18 = c.d
        v19 = c.d
        done = False
        c.ket = c.d
        if _m_lAr(c):
            c.delete()
            if _tr_chain_before_ki(c):
                done = True
        if not done:
            c.d = v19
            c.ket = c.d
            if _alt(c, v19, _m_possessives, _m_sU):
                c.delete()
                v21 = c.d
                _lar_ki_try(c, v21)
                done = True
        if not done:
            c.d = v19
            if not _tr_chain_before_ki(c):
                c.d = v18
        return True
    c.d = v1
    # alt 7: [lArI] slice
    c.ket = c.d
    if _m_lArI(c):
        c.delete()
        return True
    c.d = v1
    # alt 8: chain_ki
    if _tr_chain_before_ki(c):
        return True
    c.d = v1
    # alt 9: [DA|yU|yA] slice try(([poss] slice [mark lAr]) | [lAr]
    #                             then slice, chain required)
    c.ket = c.d
    if _alt(c, v1, _m_DA, _m_yU, _m_yA):
        c.delete()
        v23 = c.d
        c.ket = c.d
        v24 = c.d
        got = False
        if _m_possessives(c):
            c.delete()
            v25 = c.d
            c.ket = c.d
            if not _m_lAr(c):
                c.d = v25
            got = True
        else:
            c.d = v24
            got = _m_lAr(c)
        if got:
            c.delete()
            c.ket = c.d
            if not _tr_chain_before_ki(c):
                c.d = v23
        else:
            c.d = v23
        return True
    c.d = v1
    # final: [poss|sU] slice try(lAr-ki) — required
    c.ket = c.d
    if not _alt(c, v1, _m_possessives, _m_sU):
        return False
    c.delete()
    v27 = c.d
    _lar_ki_try(c, v27)
    return True


def stem_turkish(w: str) -> str:
    # SnowballFilter keeps the mutated buffer even when stem() aborts
    # mid-way (snowball/SnowballFilter.java ignores stem()'s return), so
    # early exits below return the partially stemmed string.
    if sum(1 for ch in w if ch in _TR_VOWELS) < 2:
        return w
    c = _TrCtx(w)
    _tr_nominal_verb(c)
    c.d = 0
    if not c.cont:
        return c.s
    _tr_noun_suffixes(c)
    s = c.s
    # postlude (skipped entirely for the reserved words)
    if s in ("ad", "soyad"):
        return s
    if s.endswith(("d", "g")):
        j = len(s) - 1
        while j >= 0 and s[j] not in _TR_VOWELS:
            j -= 1
        if j >= 0:
            v = s[j]
            s += ("ı" if v in "aı" else "i" if v in "ei"
                  else "u" if v in "ou" else "ü")
    if s and s[-1] in "bcdğ":
        s = s[:-1] + {"b": "p", "c": "ç", "d": "t", "ğ": "k"}[s[-1]]
    return s


# ---------------------------------------------------------------------------
# Lovins (English, Lovins 1968 as defined by the Snowball lovins script;
# reference ``org/tartarus/snowball/ext/LovinsStemmer.java``).
#
# Three passes over the word end: (1) remove the longest matching ending
# from the 294-entry table whose context condition holds (find_among_b
# falls back along shorter table suffixes when a longer match's
# condition fails — every shorter matching table entry is a suffix of
# the longest match, so longest-first scan over the flat table is
# equivalent); (2) undouble a final doubled b/d/g/l/m/n/p/r/s/t;
# (3) respell the new ending (35 fixed rewrites, five context-gated).
# Conditions test the STEM (the part left after removing the ending).


def _lv_A(s):  # noqa: N802 — condition letters follow the published rules
    return len(s) >= 2


def _lv_B(s):
    return len(s) >= 3


def _lv_C(s):
    return len(s) >= 4


def _lv_D(s):
    return len(s) >= 5


def _lv_E(s):
    return len(s) >= 2 and not s.endswith("e")


def _lv_F(s):
    return len(s) >= 3 and not s.endswith("e")


def _lv_G(s):
    return len(s) >= 3 and s.endswith("f")


def _lv_H(s):
    return len(s) >= 2 and (s.endswith("t") or s.endswith("ll"))


def _lv_I(s):
    return len(s) >= 2 and not s.endswith(("o", "e"))


def _lv_J(s):
    return len(s) >= 2 and not s.endswith(("a", "e"))


def _lv_K(s):
    return len(s) >= 3 and (s.endswith(("l", "i"))
                            or (s.endswith("e") and len(s) >= 3
                                and s[-3] == "u"))


def _lv_L(s):
    if len(s) < 2 or s.endswith(("u", "x")):
        return False
    return not s.endswith("s") or s.endswith("os")


def _lv_M(s):
    return len(s) >= 2 and not s.endswith(("a", "c", "e", "m"))


def _lv_N(s):
    if len(s) < 3:
        return False
    # after a third-last 's' the minimum stem length is 4
    return s[-3] != "s" or len(s) >= 4


def _lv_O(s):
    return len(s) >= 2 and s.endswith(("l", "i"))


def _lv_P(s):
    return len(s) >= 2 and not s.endswith("c")


def _lv_Q(s):
    return len(s) >= 3 and not s.endswith(("l", "n"))


def _lv_R(s):
    return len(s) >= 2 and s.endswith(("n", "r"))


def _lv_S(s):
    return len(s) >= 2 and (s.endswith("dr")
                            or (s.endswith("t") and not s.endswith("tt")))


def _lv_T(s):
    return len(s) >= 2 and (s.endswith("s")
                            or (s.endswith("t") and not s.endswith("ot")))


def _lv_U(s):
    return len(s) >= 2 and s.endswith(("l", "m", "n", "r"))


def _lv_V(s):
    return len(s) >= 2 and s.endswith("c")


def _lv_W(s):
    return len(s) >= 2 and not s.endswith(("s", "u"))


def _lv_X(s):
    return len(s) >= 2 and (s.endswith(("l", "i"))
                            or (s.endswith("e") and len(s) >= 3
                                and s[-3] == "u"))


def _lv_Y(s):
    return len(s) >= 2 and s.endswith("in")


def _lv_Z(s):
    return len(s) >= 2 and not s.endswith("f")


def _lv_AA(s):
    return len(s) >= 2 and s.endswith(
        ("d", "f", "ph", "th", "l", "er", "or", "es", "t"))


def _lv_BB(s):
    return len(s) >= 3 and not s.endswith(("met", "ryst"))


def _lv_CC(s):
    return len(s) >= 2 and s.endswith("l")


# ending -> condition-letter table (published Lovins rule data, grouped
# by condition; flattened longest-first by _bylen)
_LV_ENDINGS = _bylen(
    ("A", ["s'", "a", "ia", "ata", "ic", "aic", "aric", "istic",
           "aristic", "ivistic", "enced", "ished", "ied", "ioned",
           "arized", "oid", "aroid", "hood", "ehood", "ihood", "ward",
           "e", "ae", "icance", "ence", "icide", "otide", "able",
           "atable", "arizable", "ible", "encible", "ese", "wise",
           "ate", "entiate", "inate", "ive", "ative", "alize",
           "icalize", "ialize", "entialize", "ionalize", "arize",
           "encing", "ioning", "arizing", "yish", "i", "ical", "aical",
           "istical", "oidal", "ial", "ancial", "arial", "ential",
           "ional", "izational", "ental", "ful", "eful", "iful",
           "icism", "oidism", "icalism", "ionalism", "ativism", "ium",
           "ian", "ician", "ogen", "entiation", "ination", "isation",
           "arisation", "entation", "arization", "o", "ier", "ariser",
           "arizer", "ator", "'s", "ics", "istics", "ences", "oides",
           "acies", "ancies", "encies", "aries", "ities", "alities",
           "ivities", "nesses", "ates", "atives", "is", "ials",
           "entials", "ionals", "ians", "icians", "arisations",
           "entations", "izations", "arizations", "iers", "ators",
           "less", "eless", "ness", "ableness", "ibleness", "ateness",
           "iteness", "iveness", "ativeness", "ingness", "ishness",
           "iness", "alness", "icalness", "antialness", "entialness",
           "ionalness", "fulness", "lessness", "ousness", "eousness",
           "iousness", "itousness", "entness", "ists", "icists", "ous",
           "eous", "aceous", "antaneous", "ious", "itous", "icant",
           "ement", "izement", "ist", "icist", "alist", "icalist",
           "ialist", "ionist", "entist", "acy", "ency", "ably", "ibly",
           "iedly", "ately", "ively", "atively", "atingly", "ily",
           "lily", "arily", "ically", "aically", "istically",
           "oidally", "ially", "entially", "ionally", "entally",
           "fully", "efully", "ifully", "lessly", "ously", "eously",
           "iously", "ently", "icianry", "atory", "ity", "acity",
           "icity", "eity", "ality", "icality", "iality", "antiality",
           "entiality", "ionality", "elity", "ability", "izability",
           "arizability", "ibility", "ivity"]),
    ("AA", ["ite"]),
    ("B", ["atic", "alistic", "anced", "ance", "age", "ancing",
           "aging", "ying", "ational", "ism", "alism", "ation", "as",
           "ances", "ages", "isms", "ions", "ations", "ants",
           "acious", "ant", "y", "ancy", "ly", "ingly", "ally",
           "alistically", "ationally", "izationally", "arity"]),
    ("BB", ["allic", "al", "als"]),
    ("C", ["antic", "ented", "enting", "ish", "ent", "allically"]),
    ("CC", ["inity"]),
    ("D", ["ionate"]),
    ("E", ["ed", "ened", "elihood", "izable", "ene", "ature", "ening",
           "es", "eness", "eableness", "ariness", "edly", "ely",
           "enly", "ery"]),
    ("F", ["ized", "ize", "izing", "en", "ization", "izer", "izers",
           "ary"]),
    ("G", ["ication", "action"]),
    ("H", ["itic"]),
    ("I", ["ated", "idine", "ating"]),
    ("J", ["inism"]),
    ("K", ["arly"]),
    ("L", ["ide", "ides"]),
    ("M", ["ine", "ines"]),
    ("N", ["ing", "ings"]),
    ("O", ["ars"]),
    ("P", ["ies"]),
    ("Q", ["ion"]),
    ("R", ["one", "yl"]),
    ("S", ["on"]),
    ("T", ["or"]),
    ("U", ["um"]),
    ("V", ["us"]),
    ("W", ["s"]),
    ("X", ["ar"]),
    ("Y", ["eal", "ear", "ealy", "early"]),
    ("Z", ["eature"]),
)

_LV_CONDS = {name[4:]: fn for name, fn in list(globals().items())
             if name.startswith("_lv_")}

_LV_DOUBLES = ("bb", "dd", "gg", "ll", "mm", "nn", "pp", "rr", "ss",
               "tt")

# respell rewrites: old ending -> (new ending, forbidden stem endings)
_LV_RESPELL = _bylen(
    (("ief", ()), ["iev"]),
    (("uc", ()), ["uct"]),
    (("um", ()), ["umpt"]),
    (("rb", ()), ["rpt"]),
    (("ur", ()), ["urs"]),
    (("ister", ()), ["istr"]),
    (("meter", ()), ["metr"]),
    (("olut", ()), ["olv"]),
    (("l", ("a", "i", "o")), ["ul"]),
    (("bic", ()), ["bex"]),
    (("dic", ()), ["dex"]),
    (("pic", ()), ["pex"]),
    (("tic", ()), ["tex"]),
    (("ac", ()), ["ax"]),
    (("ec", ()), ["ex"]),
    (("ic", ()), ["ix"]),
    (("luc", ()), ["lux"]),
    (("uas", ()), ["uad"]),
    (("vas", ()), ["vad"]),
    (("cis", ()), ["cid"]),
    (("lis", ()), ["lid"]),
    (("eris", ()), ["erid"]),
    (("pans", ()), ["pand"]),
    (("ens", ("s",)), ["end"]),
    (("ons", ()), ["ond"]),
    (("lus", ()), ["lud"]),
    (("rus", ()), ["rud"]),
    (("hes", ("p", "t")), ["her"]),
    (("mis", ()), ["mit"]),
    (("ens2", ("m",)), ["ent"]),
    (("ers", ()), ["ert"]),
    (("es", ("n",)), ["et"]),
    (("ys", ()), ["yt", "yz"]),
)


def stem_lovins(w: str) -> str:
    # pass 1: longest ending whose condition holds on the stem
    for suf, cond in _LV_ENDINGS:
        if w.endswith(suf) and _LV_CONDS[cond](w[:-len(suf)]):
            w = w[:-len(suf)]
            break
    # pass 2: undouble a final doubled consonant
    if w.endswith(_LV_DOUBLES):
        w = w[:-1]
    # pass 3: respell the new ending (longest match only; a failed
    # context gate means NO respell, not a shorter one)
    for old, (new, forbidden) in _LV_RESPELL:
        if w.endswith(old):
            stem = w[:-len(old)]
            if not any(stem.endswith(f) for f in forbidden):
                w = stem + new.rstrip("2")
            break
    return w


# ---------------------------------------------------------------------------
# Kraaij–Pohlmann (Dutch; reference
# ``org/tartarus/snowball/ext/KpStemmer.java``).  The published KP
# algorithm: y-marking, a vowel-measure region (p1/p2, with "ij"
# counting as one vowel), four suffix steps, ge- prefix/infix loss with
# re-measurement, a d/t cleanup after ge-loss, final-consonant-cluster
# normalization (kt/ft/pt), and undoubling with v->f / z->s.  A removed
# suffix can trigger "lengthen_V", which restores the long vowel that
# Dutch spelling shortens in closed syllables (lop -> loop).

_KP_V = "aeiouy"               # g_v; a marked 'Y' is a consonant
_KP_VWX = "aeiouwxy"           # g_v_WX


def _kp_at(s: str, pos: int, sub: str) -> bool:
    return pos >= 0 and s[pos:pos + len(sub)] == sub


def _kp_vow(s: str, pos: int) -> bool:
    """r_V at cursor=pos: vowel or 'ij' immediately before pos."""
    return (pos >= 1 and s[pos - 1] in _KP_V) or _kp_at(s, pos - 2, "ij")


def _kp_vx(s: str, pos: int) -> bool:
    """r_VX: skip one char back, then vowel-or-ij."""
    return pos >= 1 and _kp_vow(s, pos - 1)


def _kp_cons(s: str, pos: int) -> bool:
    """r_C: not 'ij' before pos, and a non-vowel before pos."""
    if _kp_at(s, pos - 2, "ij"):
        return False
    return pos >= 1 and s[pos - 1] not in _KP_V


def _kp_measure(s: str) -> tuple[int, int]:
    n = len(s)
    i = 0
    p1 = p2 = n

    def hop(i):
        # skip consonants, then require >=1 vowel/'ij', then one consonant
        while i < n and s[i] not in _KP_V:
            i += 1
        cnt = 0
        while i < n:
            if s[i:i + 2] == "ij":
                i += 2
            elif s[i] in _KP_V:
                i += 1
            else:
                break
            cnt += 1
        if cnt < 1 or i >= n or s[i] in _KP_V:
            return None
        return i + 1

    r = hop(i)
    if r is not None:
        p1 = r
        r = hop(r)
        if r is not None:
            p2 = r
    return p1, p2


def _kp_lengthen(s: str) -> str:
    # double a short a/o/u/e in a now-closed final syllable
    n = len(s)
    if n < 2 or s[-1] in _KP_VWX:
        return s
    v = s[-2]
    if v in "aou":
        if n == 2 or s[-3] not in _KP_V:
            return s[:-1] + v + s[-1]
        return s
    if v == "e":
        if n > 2 and s[-3] in _KP_V:
            return s
        if n > 2:
            if n >= 4 and s[-4] in "aiou":
                return s
            if n >= 6 and s[-5] in "aiou" and s[-6] not in _KP_V:
                return s
        return s[:-1] + "e" + s[-1]
    return s


def _kp_step1(s, p1, p2):
    n = len(s)

    def r1(pos):
        return p1 <= pos

    if s.endswith("nde"):
        return s[:-3] + "nd"
    if s.endswith("'s"):
        return s[:-2]
    if s.endswith("ies"):                      # before 'es'/'s'
        return s[:-3] + "ie" if r1(n - 3) else None
    if s.endswith("aus"):
        if r1(n - 3) and _kp_vow(s, n - 3):
            return s[:-3] + "au"
        return None
    if s.endswith("en"):
        if _kp_at(s, n - 5, "hed") and r1(n - 5):
            return s[:-5] + "heid"
        if _kp_at(s, n - 4, "nd"):
            return s[:-2]
        if _kp_at(s, n - 3, "d") and r1(n - 3) and _kp_cons(s, n - 3):
            return s[:-3]
        if (s[n - 3:n - 2] in ("i", "j")) and _kp_vow(s, n - 3):
            return s[:-2]
        if r1(n - 2) and _kp_cons(s, n - 2):
            return _kp_lengthen(s[:-2])
        return None
    if s.endswith("es"):
        if _kp_at(s, n - 4, "ar") and r1(n - 4) and _kp_cons(s, n - 4):
            return _kp_lengthen(s[:-4])
        if _kp_at(s, n - 4, "er") and r1(n - 4) and _kp_cons(s, n - 4):
            return s[:-4]
        if r1(n - 2) and _kp_cons(s, n - 2):
            return s[:-2] + "e"
        return None
    if s.endswith("s"):
        if not r1(n - 1):
            return None
        if _kp_at(s, n - 2, "t") and r1(n - 2):
            return None
        if _kp_cons(s, n - 1):
            return s[:-1]
        return None
    return None


def _kp_step2(s, p1, p2):
    n = len(s)

    def r1(pos):
        return p1 <= pos

    if s.endswith("ische"):
        return s[:-5] + "isch" if r1(n - 5) else None
    if s.endswith("lijke"):
        return s[:-5] + "lijk" if r1(n - 5) else None
    if s.endswith("ieve"):
        if r1(n - 4) and _kp_cons(s, n - 4):
            return s[:-4] + "ief"
        return None
    if s.endswith("ene"):
        if r1(n - 3) and _kp_cons(s, n - 3):
            return _kp_lengthen(s[:-3] + "en")
        return None
    if s.endswith("je"):
        # a chain of alternatives: a failed condition falls through
        if _kp_at(s, n - 4, "'t"):
            return s[:-4]
        if _kp_at(s, n - 4, "et") and r1(n - 4) and _kp_cons(s, n - 4):
            return s[:-4]
        if _kp_at(s, n - 5, "rnt"):
            return s[:-5] + "rn"
        if _kp_at(s, n - 3, "t") and r1(n - 3) and _kp_vx(s, n - 3):
            return s[:-3]
        if _kp_at(s, n - 5, "ink"):
            return s[:-5] + "ing"
        if _kp_at(s, n - 4, "mp"):
            return s[:-4] + "m"
        if _kp_at(s, n - 3, "'") and r1(n - 3):
            return s[:-3]
        if r1(n - 2) and _kp_cons(s, n - 2):
            return s[:-2]
        return None
    if s.endswith("ge"):
        return s[:-2] + "g" if r1(n - 2) else None
    if s.endswith("de"):
        if r1(n - 2) and _kp_cons(s, n - 2):
            return s[:-2]
        return None
    if s.endswith("te"):
        return s[:-2] + "t" if r1(n - 2) else None
    if s.endswith("se"):
        return s[:-2] + "s" if r1(n - 2) else None
    if s.endswith("re"):
        return s[:-2] + "r" if r1(n - 2) else None
    if s.endswith("le"):
        if r1(n - 2):
            return _kp_lengthen(s[:-2] + "l")
        return None
    return None


def _kp_step3(s, p1, p2):
    n = len(s)

    def r1(pos):
        return p1 <= pos

    if s.endswith("iteit"):
        return _kp_lengthen(s[:-5]) if r1(n - 5) else None
    if s.endswith("heid"):
        return s[:-4] if r1(n - 4) else None
    if s.endswith("atie"):
        return s[:-4] + "eer" if r1(n - 4) else None
    if s.endswith("isme"):
        return _kp_lengthen(s[:-4]) if r1(n - 4) else None
    if s.endswith("arij"):
        if r1(n - 4) and _kp_cons(s, n - 4):
            return s[:-4] + "aar"
        return None
    if s.endswith("erij"):
        return _kp_lengthen(s[:-4]) if r1(n - 4) else None
    if s.endswith("rder"):
        return s[:-4] + "r"
    if s.endswith("ster"):
        return s[:-4] if r1(n - 4) else None
    if s.endswith("fie"):
        return _kp_lengthen(s[:-3] + "f") if p2 <= n - 3 else None
    if s.endswith("gie"):
        return _kp_lengthen(s[:-3] + "g") if p2 <= n - 3 else None
    if s.endswith("ing"):
        return _kp_lengthen(s[:-3]) if r1(n - 3) else None
    if s.endswith("sel"):
        return s[:-3] if r1(n - 3) else None
    if s.endswith("dst"):
        if r1(n - 3) and _kp_cons(s, n - 3):
            return s[:-3] + "d"
        return None
    if s.endswith("tst"):
        if r1(n - 3) and _kp_cons(s, n - 3):
            return s[:-3] + "t"
        return None
    return None


_KP_A3 = (
    ("achtiger", 3), ("achtigst", 3), ("eriger", 9), ("erigst", 9),
    ("lijker", 8), ("lijkst", 8), ("achtig", 3), ("ioneel", 1),
    ("atief", 2), ("erig", 9), ("baar", 3), ("laar", 5), ("naar", 4),
    ("raar", 6), ("tant", 7), ("end", 9),
)


def _kp_step4(s, p1, p2):
    n = len(s)

    def r1(pos):
        return p1 <= pos

    def alt1():
        for suf, var in _KP_A3:
            if not s.endswith(suf):
                continue
            pos = n - len(suf)
            if not r1(pos):
                return None
            if var == 1:
                return s[:pos] + "ie"
            if var == 2:
                return s[:pos] + "eer"
            if var == 3:
                return s[:pos]
            if var in (4, 5, 6):
                if not _kp_vow(s, pos):
                    return None
                return s[:pos] + {4: "n", 5: "l", 6: "r"}[var]
            if var == 7:
                return s[:pos] + "teer"
            if var == 8:
                return s[:pos] + "lijk"
            if not _kp_cons(s, pos):                 # var 9
                return None
            return _kp_lengthen(s[:pos])
        return None

    out = alt1()
    if out is not None:
        return out
    for suf in ("iger", "igst", "ig"):
        if s.endswith(suf):
            pos = n - len(suf)
            if r1(pos) and _kp_cons(s, pos):
                return _kp_lengthen(s[:pos])
            return None
    return None


def _kp_step1c(s, p1):
    n = len(s)
    if s.endswith("d") and p1 <= n - 1 and _kp_cons(s, n - 1):
        if _kp_at(s, n - 2, "n") and p1 <= n - 2:
            return None
        return s[:-1]
    if s.endswith("t") and p1 <= n - 1 and _kp_cons(s, n - 1):
        if _kp_at(s, n - 2, "h") and p1 <= n - 2:
            return None
        return s[:-1]
    return None


def _kp_step7(s):
    for suf, new in (("kt", "k"), ("ft", "f"), ("pt", "p")):
        if s.endswith(suf):
            return s[:-2] + new
    return None


def _kp_step6(s):
    if len(s) >= 2 and s[-1] == s[-2] and s[-1] in "bcdfghjklmnpqrstvwxz":
        return s[:-1]
    if s.endswith("v"):
        return s[:-1] + "f"
    if s.endswith("z"):
        return s[:-1] + "s"
    return None


def _kp_lose_prefix(s):
    if not s.startswith("ge") or len(s) < 5:
        return None
    i = 2
    n = len(s)
    while i < n and s[i] not in _KP_V:
        i += 1
    if i >= n:
        return None
    while i < n and s[i] in _KP_V:
        i += 1
    if i >= n:
        return None
    return s[2:]


def _kp_lose_infix(s):
    idx = s.find("ge", 1)
    if idx < 0:
        return None
    k = idx + 2
    n = len(s)
    if k + 3 > n:
        return None
    i = k
    while i < n and s[i] not in _KP_V:
        i += 1
    if i >= n:
        return None
    while i < n and s[i] in _KP_V:
        i += 1
    if i >= n:
        return None
    return s[:idx] + s[k:]


def stem_kp(w: str) -> str:
    s = w
    y_found = False
    if s.startswith("y"):
        s = "Y" + s[1:]
        y_found = True
    chars = list(s)
    for j in range(1, len(chars)):
        # a just-marked 'Y' is no longer a vowel for the next position
        if chars[j] == "y" and chars[j - 1] in _KP_V:
            chars[j] = "Y"
            y_found = True
    s = "".join(chars)
    p1, p2 = _kp_measure(s)
    stemmed = False
    for step in (_kp_step1, _kp_step2, _kp_step3, _kp_step4):
        out = step(s, p1, p2)
        if out is not None:
            s = out
            stemmed = True
    out = _kp_lose_prefix(s)
    if out is not None:
        s = out
        p1, p2 = _kp_measure(s)
        out = _kp_step1c(s, p1)
        if out is not None:
            s = out
    ge_removed = False
    out = _kp_lose_infix(s)
    if out is not None:
        s = out
        ge_removed = True
        p1, p2 = _kp_measure(s)
        out = _kp_step1c(s, p1)
        if out is not None:
            s = out
    out = _kp_step7(s)
    if out is not None:
        s = out
        stemmed = True
    if stemmed or ge_removed:
        out = _kp_step6(s)
        if out is not None:
            s = out
    if y_found:
        s = s.replace("Y", "y")
    return s


# ---------------------------------------------------------------------------
# Hindi (Lucene's Snowball hindi script after Ramanathan & Rao 2003;
# reference ``org/tartarus/snowball/ext/HindiStemmer.java``).  One
# longest-suffix strip over the 132-entry table, never consuming the
# first character; entries tagged 1 additionally require a Devanagari
# consonant immediately before the suffix.

_HI_SUFFIXES = (
    ("आइयाँ", 0), ("ाइयाँ", 0), ("अताएं", 0), ("अनाएं", 0), 
    ("अताओं", 0), ("अनाओं", 0), ("आइयां", 0), ("ाइयां", 0), 
    ("आइयों", 0), ("ाइयों", 0), ("आऊंगा", 0), ("ाऊंगा", 0), 
    ("आऊंगी", 0), ("ाऊंगी", 0), ("आएंगी", 0), ("ाएंगी", 0), 
    ("आएंगे", 0), ("ाएंगे", 0), ("इयाँ", 0), ("ियाँ", 0), 
    ("ताएं", 1), ("नाएं", 1), ("ताओं", 1), ("नाओं", 1), 
    ("इयां", 0), ("ियां", 0), ("अतीं", 0), ("आतीं", 0), 
    ("ातीं", 0), ("इयों", 0), ("ियों", 0), ("ऊंगा", 0), 
    ("ूंगा", 0), ("आएगा", 0), ("ाएगा", 0), ("ऊंगी", 0), 
    ("एंगी", 0), ("ूंगी", 0), ("ेंगी", 0), ("आएगी", 0), 
    ("ाएगी", 0), ("आओगी", 0), ("ाओगी", 0), ("एंगे", 0), 
    ("ेंगे", 0), ("आओगे", 0), ("ाओगे", 0), ("उआं", 0), ("ुआं", 0), 
    ("आईं", 0), ("ाईं", 0), ("आएं", 0), ("उएं", 0), ("ाएं", 0), 
    ("ुएं", 0), ("आओं", 0), ("उओं", 0), ("ाओं", 0), ("ुओं", 0), 
    ("तीं", 1), ("आइए", 0), ("ाइए", 0), ("अकर", 0), ("आकर", 0), 
    ("ाकर", 0), ("एगा", 0), ("ेगा", 0), ("अता", 0), ("आता", 0), 
    ("ाता", 0), ("अना", 0), ("आना", 0), ("ाना", 0), ("आया", 0), 
    ("ाया", 0), ("एगी", 0), ("ओगी", 0), ("ेगी", 0), ("ोगी", 0), 
    ("अती", 0), ("आती", 0), ("ाती", 0), ("अनी", 0), ("ओगे", 0), 
    ("ोगे", 0), ("अते", 0), ("आते", 0), ("ाते", 0), ("अने", 0), 
    ("आने", 0), ("ाने", 0), ("आँ", 0), ("ाँ", 0), ("आं", 0), 
    ("ईं", 0), ("एं", 0), ("ओं", 0), ("ां", 0), ("ीं", 0), 
    ("ें", 0), ("ों", 0), ("आई", 0), ("ाई", 0), ("आए", 0), 
    ("इए", 0), ("ाए", 0), ("िए", 0), ("आओ", 0), ("ाओ", 0), 
    ("कर", 1), ("ता", 1), ("ना", 1), ("ती", 1), ("नी", 1), 
    ("ते", 1), ("ने", 1), ("अ", 0), ("आ", 0), ("इ", 0), ("ई", 0), 
    ("उ", 0), ("ऊ", 0), ("ए", 0), ("ओ", 0), ("ा", 0), ("ि", 0), 
    ("ी", 0), ("ु", 0), ("ू", 0), ("े", 0), ("ो", 0), ("्", 0), 
)


# g_consonant: U+0915-U+0939, U+093C, U+0958-U+095F
_HI_CONS = frozenset(
    [chr(c) for c in range(0x915, 0x93A)] + ["\u093c"]
    + [chr(c) for c in range(0x958, 0x960)])


def stem_hindi_snowball(w: str) -> str:
    n = len(w)
    for suf, cons in _HI_SUFFIXES:
        pos = n - len(suf)
        if pos < 1 or not w.endswith(suf):
            continue
        if cons and not (pos >= 2 and w[pos - 1] in _HI_CONS):
            continue
        return w[:pos]
    return w


# ---------------------------------------------------------------------------
# Indonesian (Tala 2003 as defined by the Snowball indonesian script;
# reference ``org/tartarus/snowball/ext/IndonesianStemmer.java``).
# Vowel-count measure gates every step; particle and possessive
# suffixes strip first, then one first-order prefix (with nasal
# substitution meny-/peny- -> s, mem-/pem- -> p before a vowel), then a
# derivational suffix whose legality depends on WHICH prefix class was
# removed, then one second-order prefix.  Each removal decrements the
# measure by one rather than recounting.

_ID_VOWELS = "aeiou"


def _id_remove_suffix(s, prefix):
    # a_2: kan / an / i with prefix-class conditions; longest first,
    # falling back along the suffix chain when a condition fails
    if s.endswith("kan") and prefix != 3 and prefix != 2:
        return s[:-3]
    if s.endswith("an") and prefix != 1:
        return s[:-2]
    if s.endswith("i") and prefix <= 2 and not s[:-1].endswith("s"):
        return s[:-1]
    return None


def _id_first_order(s):
    # returns (new_s, prefix_class, cursor_off) or None.  cursor_off is
    # where the Snowball cursor lands after the slice: 1 when the rule
    # SUBSTITUTED a char (meny/peny -> "s", mem/pem -> "p" before a
    # vowel; slice_from leaves cursor = len(replacement)), 0 when it
    # deleted — the follow-up second-order among matches FROM that
    # offset, not from the start of the word.
    if s.startswith("meng"):
        return s[4:], 1, 0
    if s.startswith("meny"):
        if len(s) > 4 and s[4] in _ID_VOWELS:
            return "s" + s[4:], 1, 1
        if s.startswith("men"):
            return s[3:], 1, 0
    if s.startswith("peng"):
        return s[4:], 3, 0
    if s.startswith("peny"):
        if len(s) > 4 and s[4] in _ID_VOWELS:
            return "s" + s[4:], 3, 1
        if s.startswith("pen"):
            return s[3:], 3, 0
    if s.startswith("mem"):
        if len(s) > 3 and s[3] in _ID_VOWELS:
            return "p" + s[3:], 1, 1
        return s[3:], 1, 0
    if s.startswith("men"):
        return s[3:], 1, 0
    if s.startswith("pem"):
        if len(s) > 3 and s[3] in _ID_VOWELS:
            return "p" + s[3:], 3, 1
        return s[3:], 3, 0
    if s.startswith("pen"):
        return s[3:], 3, 0
    if s.startswith("ter"):
        return s[3:], 1, 0
    if s.startswith("di"):
        return s[2:], 1, 0
    if s.startswith("ke"):
        return s[2:], 3, 0
    if s.startswith("me"):
        return s[2:], 1, 0
    return None


def _id_second_order(s):
    # a_4 longest-prefix match: belajar/pelajar are PREFIX rules replaced
    # by "ajar" (pelajar leaves the prefix class untouched, case 2); then
    # ber/per, then be (KER lookahead: one non-vowel then "er") / pe.
    if s.startswith("belajar"):
        return "ajar" + s[7:], 4
    if s.startswith("ber"):
        return s[3:], 4
    if (s.startswith("be") and len(s) >= 5
            and s[2] not in _ID_VOWELS and s[3:5] == "er"):
        return s[2:], 4
    if s.startswith("pelajar"):
        return "ajar" + s[7:], None
    if s.startswith("per"):
        return s[3:], 2
    if s.startswith("pe"):
        return s[2:], 2
    return None


def stem_indonesian_snowball(w: str) -> str:
    s = w
    measure = sum(1 for ch in s if ch in _ID_VOWELS)
    if measure <= 2:
        return s
    for suf in ("kah", "lah", "pun"):
        if s.endswith(suf):
            s = s[:-3]
            measure -= 1
            break
    if measure <= 2:
        return s
    for suf in ("nya", "ku", "mu"):
        if s.endswith(suf):
            s = s[:-len(suf)]
            measure -= 1
            break
    if measure <= 2:
        return s
    first = _id_first_order(s)
    if first is not None:
        s, prefix, off = first
        measure -= 1
        if measure > 2:
            out = _id_remove_suffix(s, prefix)
            if out is not None:
                s = out
                measure -= 1
                if measure > 2:
                    second = _id_second_order(s[off:])
                    if second is not None:
                        s = s[:off] + second[0]
                        measure -= 1
        return s
    prefix = 0
    second = _id_second_order(s)
    if second is not None:
        s, p2 = second
        if p2 is not None:
            prefix = p2
        measure -= 1
    if measure > 2:
        out = _id_remove_suffix(s, prefix)
        if out is not None:
            s = out
            measure -= 1
    return s


# ---------------------------------------------------------------------------
# French (Snowball french script; reference
# ``org/tartarus/snowball/ext/FrenchStemmer.java``).  Prelude marks
# intervocalic u/i/y (and qu, ë, ï) with uppercase markers so they are
# treated as consonants by the region logic; pV has the par/col/tap and
# double-initial-vowel exceptions; the mment/ment rules intentionally
# "fail" after slicing so the verb-suffix passes re-run on the result.

_FR_V = "aeiouyàâèéêëîïôùû"
_FR_KEEP_S = set("aiouès")

_FR_STD = _bylen(
    (1, ["iqUe", "ance", "able", "isme", "iste", "eux",
         "iqUes", "ances", "ables", "ismes", "istes"]),
    (2, ["atrice", "ation", "ateur", "atrices", "ations", "ateurs"]),
    (3, ["logie", "logies"]),
    (4, ["usion", "ution", "usions", "utions"]),
    (5, ["ence", "ences"]),
    (6, ["ement", "ements"]),
    (7, ["ité", "ités"]),
    (8, ["if", "ive", "ifs", "ives"]),
    (9, ["eaux"]),
    (10, ["aux"]),
    (11, ["euse", "euses"]),
    (12, ["issement", "issements"]),
    (13, ["amment"]),
    (14, ["emment"]),
    (15, ["ment", "ments"]),
)
_FR_EMENT_FOLLOW = _bylen(
    (1, ["iv"]), (2, ["eus"]), (3, ["iqU", "abl"]), (4, ["Ièr", "ièr"]))
_FR_ITE_FOLLOW = _bylen((1, ["abil"]), (2, ["ic"]), (3, ["iv"]))
_FR_I_VERB = _bylen(
    (1, ["ira", "ie", "isse", "issante", "i", "irai", "ir", "iras", "ies",
         "îmes", "isses", "issantes", "îtes", "is", "irais", "issais",
         "irions", "issions", "irons", "issons", "issants", "it", "irait",
         "issait", "issant", "iraIent", "issaIent", "irent", "issent",
         "iront", "ît", "iriez", "issiez", "irez", "issez"]))
_FR_VERB = _bylen(
    (1, ["ions"]),
    (2, ["era", "ée", "erai", "er", "eras", "ées", "erais", "erions",
         "erons", "és", "erait", "eraIent", "èrent", "eront", "ez", "iez",
         "eriez", "erez", "é"]),
    (3, ["a", "asse", "ante", "ai", "as", "âmes", "asses", "antes", "âtes",
         "ais", "assions", "ants", "ait", "ant", "aIent", "assent", "ât",
         "assiez"]))
_FR_RESIDUAL = _bylen((1, ["ion"]), (2, ["Ière", "ière", "Ier", "ier"]),
                      (3, ["e"]))
_FR_DOUBLES = ("eill", "ell", "enn", "onn", "ett")


def _fr_prelude(w: str) -> str:
    out = list(w)
    i = 0
    while i < len(out):
        c = out[i]
        if c in _FR_V and i + 1 < len(out):
            d = out[i + 1]
            if d == "u" and i + 2 < len(out) and out[i + 2] in _FR_V:
                out[i + 1] = "U"
                continue
            if d == "i" and i + 2 < len(out) and out[i + 2] in _FR_V:
                out[i + 1] = "I"
                continue
            if d == "y":
                out[i + 1] = "Y"
                continue
        if c == "ë":
            out[i:i + 1] = ["H", "e"]
            continue
        if c == "ï":
            out[i:i + 1] = ["H", "i"]
            continue
        if c == "y" and i + 1 < len(out) and out[i + 1] in _FR_V:
            out[i] = "Y"
            continue
        if c == "q" and i + 1 < len(out) and out[i + 1] == "u":
            out[i + 1] = "U"
            continue
        i += 1
    return "".join(out)


def _fr_postlude(w: str) -> str:
    out = []
    i = 0
    n = len(w)
    while i < n:
        c = w[i]
        if c == "I":
            out.append("i")
        elif c == "U":
            out.append("u")
        elif c == "Y":
            out.append("y")
        elif c == "H":
            if i + 1 < n and w[i + 1] == "e":
                out.append("ë")
                i += 2
                continue
            if i + 1 < n and w[i + 1] == "i":
                out.append("ï")
                i += 2
                continue
            # lone H: deleted
        else:
            out.append(c)
        i += 1
    return "".join(out)


def _fr_pv(w: str) -> int:
    n = len(w)
    if n >= 3 and w[0] in _FR_V and w[1] in _FR_V:
        return 3
    if w[:3] in ("par", "col", "tap"):
        return 3
    for i in range(1, n):
        if w[i] in _FR_V:
            return i + 1
    return n


def _fr_standard_suffix(w, pV, p1, p2):
    """Returns (new_w, matched) where matched mirrors the rule's truth
    value (the mment/ment rules slice but report failure by design)."""
    suf, tag = _longest_tagged(w, _FR_STD, 0)
    if suf is None:
        return w, False
    bra = len(w) - len(suf)
    if tag == 1:
        if bra < p2:
            return w, False
        return w[:bra], True
    if tag == 2:
        if bra < p2:
            return w, False
        w = w[:bra]
        if w.endswith("ic"):
            if len(w) - 2 >= p2:
                w = w[:-2]
            else:
                w = w[:-2] + "iqU"
        return w, True
    if tag == 3:
        if bra < p2:
            return w, False
        return w[:bra] + "log", True
    if tag == 4:
        if bra < p2:
            return w, False
        return w[:bra] + "u", True
    if tag == 5:
        if bra < p2:
            return w, False
        return w[:bra] + "ent", True
    if tag == 6:                                    # ement(s): RV delete
        if bra < pV:
            return w, False
        w = w[:bra]
        s2, t2 = _longest_tagged(w, _FR_EMENT_FOLLOW, 0)
        if s2 is not None:
            b2 = len(w) - len(s2)
            if t2 == 1:                             # iv: R2, then at R2
                if b2 >= p2:
                    w = w[:b2]
                    if w.endswith("at") and len(w) - 2 >= p2:
                        w = w[:-2]
            elif t2 == 2:                           # eus: R2 del / R1 eux
                if b2 >= p2:
                    w = w[:b2]
                elif b2 >= p1:
                    w = w[:b2] + "eux"
            elif t2 == 3:                           # iqU/abl: R2 delete
                if b2 >= p2:
                    w = w[:b2]
            elif t2 == 4:                           # ièr/Ièr: RV -> i
                if b2 >= pV:
                    w = w[:b2] + "i"
        return w, True
    if tag == 7:                                    # ité(s)
        if bra < p2:
            return w, False
        w = w[:bra]
        s2, t2 = _longest_tagged(w, _FR_ITE_FOLLOW, 0)
        if s2 is not None:
            b2 = len(w) - len(s2)
            if t2 == 1:                             # abil: R2 del / abl
                w = w[:b2] if b2 >= p2 else w[:b2] + "abl"
            elif t2 == 2:                           # ic: R2 del / iqU
                w = w[:b2] if b2 >= p2 else w[:b2] + "iqU"
            elif t2 == 3:                           # iv: R2 delete
                if b2 >= p2:
                    w = w[:b2]
        return w, True
    if tag == 8:                                    # if/ive(s)
        if bra < p2:
            return w, False
        w = w[:bra]
        if w.endswith("at") and len(w) - 2 >= p2:
            w = w[:-2]
            if w.endswith("ic"):
                if len(w) - 2 >= p2:
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
        return w, True
    if tag == 9:
        return w[:bra] + "eau", True
    if tag == 10:
        if bra < p1:
            return w, False
        return w[:bra] + "al", True
    if tag == 11:                                   # euse(s)
        if bra >= p2:
            return w[:bra], True
        if bra >= p1:
            return w[:bra] + "eux", True
        return w, False
    if tag == 12:                                   # issement(s)
        if bra < p1 or bra == 0 or w[bra - 1] in _FR_V:
            return w, False
        return w[:bra], True
    if tag == 13:                                   # amment: slices, fails
        if bra < pV:
            return w, False
        return w[:bra] + "ant", False
    if tag == 14:                                   # emment
        if bra < pV:
            return w, False
        return w[:bra] + "ent", False
    # tag 15: ment(s) preceded by a vowel in RV; slices but reports fail
    if bra == 0 or w[bra - 1] not in _FR_V or bra - 1 < pV:
        return w, False
    return w[:bra], False


def _fr_i_verb_suffix(w, pV):
    suf, _ = _longest_tagged(w, _FR_I_VERB, pV)
    if suf is None:
        return w, False
    bra = len(w) - len(suf)
    # not preceded by H; preceded by a non-vowel, both inside RV
    if bra <= pV or w[bra - 1] == "H" or w[bra - 1] in _FR_V:
        return w, False
    return w[:bra], True


def _fr_verb_suffix(w, pV, p2):
    suf, tag = _longest_tagged(w, _FR_VERB, pV)
    if suf is None:
        return w, False
    bra = len(w) - len(suf)
    if tag == 1:                                    # ions: R2
        if bra < p2:
            return w, False
        return w[:bra], True
    w = w[:bra]
    if tag == 3 and w.endswith("e") and len(w) - 1 >= pV:
        w = w[:-1]
    return w, True


def _fr_residual_suffix(w, pV, p2):
    if w.endswith("s"):
        before = w[:-1]
        if before.endswith("Hi") or (
                before and before[-1] not in _FR_KEEP_S):
            w = before
    suf, tag = _longest_tagged(w, _FR_RESIDUAL, pV)
    if suf is None:
        return w, False
    bra = len(w) - len(suf)
    if tag == 1:                                    # ion: R2 + s/t before
        if bra < p2 or bra <= pV or w[bra - 1] not in "st":
            return w, False
        return w[:bra], True
    if tag == 2:
        return w[:bra] + "i", True
    return w[:bra], True


def stem_french(w: str) -> str:
    w = _fr_prelude(w)
    pV = _fr_pv(w)
    p1, p2 = _r1r2_std(w, _FR_V)
    # slices persist even when a rule reports failure (the mment/ment
    # rules rely on this: they slice, "fail", and the verb passes then
    # re-run on the modified string)
    w, ok = _fr_standard_suffix(w, pV, p1, p2)
    if not ok:
        new, ok = _fr_i_verb_suffix(w, pV)
        if ok:
            w = new
        else:
            new, ok = _fr_verb_suffix(w, pV, p2)
            if ok:
                w = new
    if ok:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        w, _ = _fr_residual_suffix(w, pV, p2)
    for d in _FR_DOUBLES:
        if w.endswith(d):
            w = w[:-1]
            break
    j = len(w)
    while j > 0 and w[j - 1] not in _FR_V:
        j -= 1
    if j < len(w) and j > 0 and w[j - 1] in "éè":
        w = w[:j - 1] + "e" + w[j:]
    return _fr_postlude(w)


# ---------------------------------------------------------------------------
# Armenian (Snowball armenian script; reference
# ``org/tartarus/snowball/ext/ArmenianStemmer.java``).  Four sequential
# suffix passes — ending (R2-gated), verb, adjective, noun — each the
# longest suffix lying entirely within [pV, end); slices accumulate.

_HY_V = "աեէըիուօ"  # ա ե է ը ի ո ւ օ

_HY_ADJECTIVE = sorted((
    "րորդ", "երորդ", "ալի", "ակի", "որակ", "եղ", "ական", "արան", "են",
    "եկեն", "երեն", "որէն", "ին", "գին", "ովին", "լայն", "վուն", "պես",
    "իվ", "ատ", "ավետ", "կոտ", "բար",
), key=len, reverse=True)
_HY_VERB = sorted((
    "ա", "ացա", "եցա", "վե", "ացրի", "ացի", "եցի", "վեցի", "ալ", "ըալ",
    "անալ", "ենալ", "ացնալ", "ել", "ըել", "նել", "ցնել", "եցնել", "չել",
    "վել", "ացվել", "եցվել", "տել", "ատել", "ոտել", "կոտել", "ված", "ում",
    "վում", "ան", "ցան", "ացան", "ացրին", "ացին", "եցին", "վեցին", "ալիս",
    "ելիս", "ավ", "ացավ", "եցավ", "ալով", "ելով", "ար", "ացար", "եցար",
    "ացրիր", "ացիր", "եցիր", "վեցիր", "աց", "եց", "ացրեց", "ալուց",
    "ելուց", "ալու", "ելու", "աք", "ցաք", "ացաք", "ացրիք", "ացիք", "եցիք",
    "վեցիք", "անք", "ցանք", "ացանք", "ացրինք", "ացինք", "եցինք", "վեցինք",
), key=len, reverse=True)
_HY_NOUN = sorted((
    "որդ", "ույթ", "ուհի", "ցի", "իլ", "ակ", "յակ", "անակ", "իկ", "ուկ",
    "ան", "պան", "ստան", "արան", "եղէն", "յուն", "ություն", "ածո", "իչ",
    "ուս", "ուստ", "գար", "վոր", "ավոր", "ոց", "անօց", "ու", "ք", "չեք",
    "իք", "ալիք", "անիք", "վածք", "ույք", "ենք", "ոնք", "ունք", "մունք",
    "իչք", "արք",
), key=len, reverse=True)
_HY_ENDING = sorted((
    "սա", "վա", "ամբ", "դ", "անդ", "ությանդ", "վանդ", "ոջդ", "երդ", "ներդ",
    "ուդ", "ը", "անը", "ությանը", "վանը", "ոջը", "երը", "ները", "ի", "վի",
    "երի", "ների", "անում", "երում", "ներում", "ն", "ան", "ության", "վան",
    "ին", "երին", "ներին", "ությանն", "երն", "ներն", "ուն", "ոջ",
    "ությանս", "վանս", "ոջս", "ով", "անով", "վով", "երով", "ներով", "եր",
    "ներ", "ց", "ից", "վանից", "ոջից", "վից", "երից", "ներից", "ցից", "ոց",
    "ուց",
), key=len, reverse=True)


def stem_armenian(w: str) -> str:
    n = len(w)
    pV = n
    for i, ch in enumerate(w):
        if ch in _HY_V:
            pV = i + 1
            break
    _, p2 = _r1r2_std(w, _HY_V)
    suf = _longest_suffix(w, _HY_ENDING, pV)
    if suf and len(w) - len(suf) >= p2:   # R2 checked after the match,
        w = w[:-len(suf)]                 # no shorter-suffix fallback
    suf = _longest_suffix(w, _HY_VERB, pV)
    if suf:
        w = w[:-len(suf)]
    suf = _longest_suffix(w, _HY_ADJECTIVE, pV)
    if suf:
        w = w[:-len(suf)]
    suf = _longest_suffix(w, _HY_NOUN, pV)
    if suf:
        w = w[:-len(suf)]
    return w


# ---------------------------------------------------------------------------
# Lithuanian (Snowball lithuanian script; reference
# ``org/tartarus/snowball/ext/LithuanianStemmer.java``).  R1 with a
# skip-leading-"a" quirk for words longer than 6 chars; conflict-fixing
# rewrites, one R1 case-ending pass, repeated R1 derivational pass, and
# č/dž/gd consonant restorations.

_LT_V = "aeiouyąėęįūų"

_LT_STEP1 = sorted((
    "a", "ia", "eria", "osna", "iosna", "uosna", "iuosna", "ysna", "ėsna",
    "e", "ie", "enie", "erie", "oje", "ioje", "uje", "iuje", "yje",
    "enyje", "eryje", "ėje", "ame", "iame", "sime", "ome", "ėme", "tumėme",
    "ose", "iose", "uose", "iuose", "yse", "enyse", "eryse", "ėse", "ate",
    "iate", "ite", "kite", "site", "ote", "tute", "ėte", "tumėte", "i",
    "ai", "iai", "eriai", "ei", "tumei", "ki", "imi", "erimi", "umi",
    "iumi", "si", "asi", "iasi", "esi", "iesi", "siesi", "isi", "aisi",
    "eisi", "tumeisi", "uisi", "osi", "ėjosi", "uosi", "iuosi", "siuosi",
    "usi", "ausi", "čiausi", "ąsi", "ėsi", "ųsi", "tųsi", "ti", "enti",
    "inti", "oti", "ioti", "uoti", "iuoti", "auti", "iauti", "yti", "ėti",
    "telėti", "inėti", "terėti", "ui", "iui", "eniui", "oj", "ėj", "k",
    "am", "iam", "iem", "im", "sim", "om", "tum", "ėm", "tumėm", "an",
    "on", "ion", "un", "iun", "ėn", "o", "io", "enio", "ėjo", "uo", "s",
    "as", "ias", "es", "ies", "is", "ais", "iais", "tumeis", "imis",
    "enimis", "omis", "iomis", "umis", "ėmis", "enis", "asis", "ysis",
    "ams", "iams", "iems", "ims", "enims", "erims", "oms", "ioms", "ums",
    "ėms", "ens", "os", "ios", "uos", "iuos", "ers", "us", "aus", "iaus",
    "ius", "ys", "enys", "erys", "ąs", "iąs", "ės", "amės", "iamės",
    "imės", "kimės", "simės", "omės", "ėmės", "tumėmės", "atės", "iatės",
    "sitės", "otės", "ėtės", "tumėtės", "įs", "ūs", "tųs", "at", "iat",
    "it", "sit", "ot", "ėt", "tumėt", "u", "au", "iau", "čiau", "iu",
    "eniu", "siu", "y", "ą", "ią", "ė", "ę", "į", "enį", "erį", "ų", "ių",
    "erų",
), key=len, reverse=True)
_LT_STEP2 = sorted((
    "ing", "aj", "iaj", "iej", "oj", "ioj", "uoj", "iuoj", "auj", "ąj",
    "iąj", "ėj", "ųj", "iųj", "ok", "iok", "iuk", "uliuk", "učiuk", "išk",
    "iul", "yl", "ėl", "am", "dam", "jam", "zgan", "ain", "esn", "op",
    "iop", "ias", "ies", "ais", "iais", "os", "ios", "uos", "iuos", "aus",
    "iaus", "ąs", "iąs", "ęs", "utėait", "ant", "iant", "siant", "int",
    "ot", "uot", "iuot", "yt", "ėt", "ykšt", "iau", "dav", "sv", "šv",
    "ykšč", "ę", "ėję",
), key=len, reverse=True)
_LT_CONFLICTS = _bylen(
    (1, ["aite", "aitės"]), (2, ["uote", "uotės"]), (3, ["ėjime"]),
    (4, ["esiu"]), (5, ["asius"]), (6, ["avime"]), (7, ["ojime"]),
    (8, ["okate", "okatės"]))
_LT_CONFLICT_REPL = {1: "aitė", 2: "uotė", 3: "ėjimas", 4: "esys",
                     5: "asys", 6: "avimas", 7: "ojimas", 8: "okatė"}


def stem_lithuanian(w: str) -> str:
    start = 1 if (len(w) > 6 and w.startswith("a")) else 0
    p1 = start + _r1_std(w[start:], _LT_V)
    suf, tag = _longest_tagged(w, _LT_CONFLICTS, 0)
    if suf is not None:
        w = w[:-len(suf)] + _LT_CONFLICT_REPL[tag]
    suf = _longest_suffix(w, _LT_STEP1, p1)
    if suf:
        w = w[:-len(suf)]
    if w.endswith("č"):
        w = w[:-1] + "t"
    elif w.endswith("dž"):
        w = w[:-2] + "d"
    while True:
        suf = _longest_suffix(w, _LT_STEP2, p1)
        if not suf:
            break
        w = w[:-len(suf)]
    if w.endswith("č"):
        w = w[:-1] + "t"
    elif w.endswith("dž"):
        w = w[:-2] + "d"
    if w.endswith("gd"):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Basque (Snowball basque script; reference
# ``org/tartarus/snowball/ext/BasqueStemmer.java``).  Three phases —
# repeat aditzak (verb), repeat izenak (noun), one adjetiboak pass.
# The Snowball ``repeat`` leaves the cursor at the slice start, so after
# a REPLACEMENT the next match applies to the prefix before the
# replacement text; we carry that as an explicit ``end`` marker.

_EU_ADITZAK = _bylen(
    (1, ["idea", "bidea", "kidea", "pidea", "kundea", "galea", "tailea",
         "tzailea", "gunea", "kunea", "tzaga", "gaia", "aldia", "taldia",
         "karia", "karria", "ka", "tzaka", "la", "mena", "pena", "kina",
         "ezina", "tezina", "kuna", "tuna", "kizuna", "era", "bera",
         "kera", "pera", "orra", "korra", "dura", "gura", "kura", "tura",
         "eta", "keta", "gailua", "eza", "erreza", "gaitza", "kaitza",
         "kuntza", "ide", "bide", "kide", "pide", "kunde", "tzake",
         "tzeke", "le", "gale", "taile", "tzaile", "gune", "kune", "tze",
         "atze", "gai", "aldi", "taldi", "ki", "ari", "kari", "lari",
         "tari", "etari", "karri", "arazi", "tarazi", "an", "ean", "rean",
         "kan", "etan", "men", "pen", "kin", "rekin", "ezin", "tezin",
         "tun", "kizun", "go", "ago", "tio", "dako", "or", "kor", "tzat",
         "du", "gailu", "tu", "atu", "aldatu", "tatu", "ez", "errez",
         "tzez", "gaitz", "kaitz"]),
    (2, ["garria", "tza", "garri"]),
    (3, ["atseden"]), (4, ["arabera"]), (5, ["baditu"]))
_EU_IZENAK = _bylen(
    (1, ["ada", "kada", "anda", "denda", "gabea", "kabea", "aldea",
         "kaldea", "taldea", "ordea", "zalea", "tzalea", "gilea", "emea",
         "kumea", "nea", "enea", "zionea", "unea", "gunea", "pea",
         "aurrea", "tea", "kotea", "artea", "ostea", "etxea", "ga",
         "anga", "gaia", "aldia", "taldia", "handia", "mendia", "geia",
         "egia", "degia", "tegia", "nahia", "ohia", "kia", "tokia", "oia",
         "koia", "aria", "karia", "laria", "taria", "eria", "keria",
         "teria", "larria", "kirria", "duria", "asia", "tia", "ezia",
         "bizia", "ontzia", "ka", "ska", "xka", "zka", "gibela", "gela",
         "kaila", "skila", "tila", "ola", "na", "kana", "ena", "garrena",
         "gerrena", "urrena", "zaina", "tzaina", "kina", "mina", "garna",
         "una", "duna", "asuna", "tasuna", "ondoa", "kondoa", "ngoa",
         "zioa", "koa", "takoa", "zkoa", "noa", "zinoa", "aroa", "taroa",
         "zaroa", "eroa", "oroa", "osoa", "toa", "ttoa", "ztoa", "txoa",
         "tzoa", "ñoa", "ra", "ara", "dara", "liara", "tiara", "tara",
         "etara", "tzara", "bera", "kera", "pera", "tzarra", "korra",
         "tra", "sa", "osa", "ta", "eta", "keta", "sta", "dua", "mendua",
         "ordua", "lekua", "burua", "durua", "tsua", "tua", "mentua",
         "estua", "txua", "zua", "tzua", "za", "eza", "eroza", "koitza",
         "antza", "gintza", "kintza", "kuntza", "gabe", "kabe", "kide",
         "alde", "kalde", "talde", "orde", "ge", "zale", "tzale", "gile",
         "eme", "kume", "ne", "zione", "une", "gune", "pe", "aurre", "te",
         "kote", "arte", "oste", "etxe", "gai", "di", "aldi", "taldi",
         "handi", "mendi", "gei", "egi", "degi", "tegi", "nahi", "ohi",
         "ki", "toki", "oi", "goi", "koi", "ari", "kari", "lari", "tari",
         "larri", "kirri", "duri", "asi", "ti", "ontzi", "ñi", "ak", "ek",
         "tarik", "gibel", "ail", "kail", "kan", "tan", "etan", "garren",
         "gerren", "urren", "zain", "tzain", "kin", "min", "dun", "asun",
         "tasun", "aizun", "ondo", "kondo", "go", "ngo", "zio", "ko",
         "tako", "etako", "eko", "tariko", "sko", "tuko", "zko", "no",
         "zino", "ro", "aro", "taro", "zaro", "ero", "giro", "oro", "oso",
         "to", "tto", "zto", "txo", "tzo", "gintzo", "ño", "zp", "ar",
         "dar", "behar", "liar", "tiar", "tar", "tzar", "kor", "os",
         "ket", "du", "mendu", "ordu", "leku", "duru", "tsu", "tu",
         "mentu", "estu", "txu", "zu", "tzu", "gintzu", "z", "ez",
         "eroz", "tz", "koitz"]),
    (2, ["garria", "ora", "tza", "garri", "ren", "or", "buru"]),
    (3, ["joka"]), (4, ["en", "ten", "tzen", "tatu"]), (5, ["trako"]),
    (6, ["minutuko"]), (7, ["zehar"]), (8, ["geldi"]), (9, ["igaro"]),
    (10, ["aurka"]))
_EU_ADJETIBOAK = _bylen(
    (1, ["keria", "la", "era", "dade", "tade", "date", "tate", "gi",
         "ki", "ik", "lanik", "rik", "larik", "ztik", "go", "ro", "ero",
         "to"]),
    (2, ["zlea"]))
_EU_IZENAK_REPL = {3: "jok", 5: "tra", 6: "minutu", 7: "zehar",
                   8: "geldi", 9: "igaro", 10: "aurka"}
_EU_ADITZAK_REPL = {3: "atseden", 4: "arabera", 5: "baditu"}


def _eu_rule(w, end, table, pV, p1, p2, repl, r1_tag=None):
    suf, tag = _longest_tagged(w[:end], table, 0)
    if suf is None:
        return w, end, False
    bra = end - len(suf)
    if tag == 1:
        if bra < pV:
            return w, end, False
        return w[:bra] + w[end:], bra, True
    if tag == 2:
        if bra < p2:
            return w, end, False
        return w[:bra] + w[end:], bra, True
    if tag == r1_tag:
        if bra < p1:
            return w, end, False
        return w[:bra] + w[end:], bra, True
    return w[:bra] + repl[tag] + w[end:], bra, True


def stem_basque(w: str) -> str:
    pV = _rv_romance(w, "aeiou")
    p1, p2 = _r1r2_std(w, "aeiou")
    end = len(w)
    while True:
        w, end, ok = _eu_rule(w, end, _EU_ADITZAK, pV, p1, p2,
                              _EU_ADITZAK_REPL)
        if not ok:
            break
    while True:
        w, end, ok = _eu_rule(w, end, _EU_IZENAK, pV, p1, p2,
                              _EU_IZENAK_REPL, r1_tag=4)
        if not ok:
            break
    suf, tag = _longest_tagged(w[:end], _EU_ADJETIBOAK, 0)
    if suf is not None:
        bra = end - len(suf)
        if tag == 1:
            if bra >= pV:
                w = w[:bra] + w[end:]
        else:
            w = w[:bra] + "z" + w[end:]
    return w


# ---------------------------------------------------------------------------
# Catalan (Snowball catalan script; reference
# ``org/tartarus/snowball/ext/CatalanStemmer.java``).  Attached-pronoun
# pass, then standard-or-verb suffix, then residual, then a forward
# cleaning pass that strips accents.

_CA_V = "aeiouàáèéíïòóúü"

_CA_PRONOUNS = sorted((
    "la", "-la", "sela", "le", "me", "-me", "se", "-te", "hi", "'hi",
    "li", "-li", "'l", "'m", "-m", "'n", "-n", "ho", "'ho", "lo", "selo",
    "'s", "las", "selas", "les", "-les", "'ls", "-ls", "'ns", "-ns",
    "ens", "los", "selos", "nos", "-nos", "vos", "us", "-us", "'t",
), key=len, reverse=True)
_CA_STD = _bylen(
    (1, ["enca", "ancia", "encia", "ència", "ícia", "inia", "íinia",
         "eria", "ària", "atòria", "alla", "ella", "ívola", "ima",
         "íssima", "ana", "ina", "era", "sfera", "ora", "dora", "adora",
         "adura", "esa", "osa", "assa", "essa", "issa", "eta", "ita",
         "ota", "ista", "ialista", "ionista", "iva", "ativa", "nça",
         "ístic", "enc", "esc", "ud", "atge", "ble", "able", "ible",
         "isme", "ialisme", "ionisme", "ivisme", "aire", "icte", "iste",
         "ici", "íci", "ari", "tori", "al", "il", "all", "ell", "ívol",
         "isam", "issem", "ìssem", "íssem", "íssim", "amen", "ìssin",
         "ar", "ificar", "egar", "ejar", "itar", "itzar", "fer", "or",
         "dor", "dur", "doras", "uds", "nces", "ancies", "encies",
         "ències", "ícies", "inies", "ínies", "eries", "àries",
         "atòries", "bles", "ables", "ibles", "imes", "íssimes",
         "formes", "ismes", "ialismes", "ines", "eres", "ores", "dores",
         "idores", "dures", "eses", "oses", "asses", "ictes", "ites",
         "otes", "istes", "ialistes", "ionistes", "ives", "atives",
         "allengües", "icis", "ícis", "aris", "toris", "ls", "als",
         "ells", "ims", "íssims", "ions", "cions", "esos", "osos",
         "assos", "issos", "ers", "ors", "dors", "adors", "idors",
         "ats", "itats", "bilitats", "ivitats", "ativitats", "ïtats",
         "ets", "ants", "ents", "ments", "aments", "ots", "uts", "ius",
         "trius", "atius", "ès", "és", "ís", "dís", "ós", "itat",
         "bilitat", "ivitat", "ativitat", "ïtat", "et", "ant", "ent",
         "ient", "ment", "ament", "isament", "ot", "isseu", "ìsseu",
         "ísseu", "triu", "íssiu", "atiu", "ó", "ió", "ció", "ació"]),
    (2, ["ada", "ades", "acions"]),
    (3, ["lógica", "logia", "logía", "logi", "lógics", "logies",
         "lógiques", "logíes", "logis"]),
    (4, ["ica", "ic", "ics", "iques"]),
    (5, ["quíssima", "quíssim", "quíssimes", "quíssims"]))
_CA_VERB = _bylen(
    (1, ["aba", "esca", "isca", "ïsca", "ada", "ida", "uda", "ïda",
         "ia", "aria", "iria", "ara", "iera", "ira", "adora", "ïra",
         "ava", "ixa", "itza", "ía", "aría", "ería", "iría", "ïa",
         "isc", "ïsc", "ad", "ed", "id", "ie", "re", "dre", "ase",
         "iese", "aste", "iste", "ii", "ini", "esqui", "eixi", "itzi",
         "am", "em", "arem", "irem", "àrem", "írem", "àssem", "éssem",
         "iguem", "ïguem", "avem", "àvem", "ávem", "irìem", "íem",
         "aríem", "iríem", "assim", "essim", "issim", "àssim", "èssim",
         "éssim", "íssim", "ïm", "an", "aban", "arian", "aran", "ieran",
         "iran", "ían", "arían", "erían", "irían", "en", "ien", "arien",
         "irien", "aren", "eren", "iren", "àren", "ïren", "asen",
         "iesen", "assen", "essen", "issen", "éssen", "ïssen", "esquen",
         "isquen", "ïsquen", "aven", "ixen", "eixen", "ïxen", "ïen",
         "in", "inin", "sin", "isin", "assin", "essin", "issin",
         "ïssin", "esquin", "eixin", "aron", "ieron", "arán", "erán",
         "irán", "iïn", "ado", "ido", "iendo", "io", "ixo", "eixo",
         "ïxo", "itzo", "ar", "tzar", "er", "eixer", "ir", "ador",
         "as", "abas", "adas", "idas", "aras", "ieras", "ías", "arías",
         "erías", "irías", "ids", "es", "ades", "ides", "udes", "ïdes",
         "atges", "ies", "aries", "iries", "ares", "ires", "adores",
         "ïres", "ases", "ieses", "asses", "esses", "isses", "ïsses",
         "ques", "esques", "ïsques", "aves", "ixes", "eixes", "ïxes",
         "ïes", "abais", "arais", "ierais", "íais", "aríais", "eríais",
         "iríais", "aseis", "ieseis", "asteis", "isteis", "inis", "sis",
         "isis", "assis", "essis", "issis", "ïssis", "esquis", "eixis",
         "itzis", "áis", "aréis", "eréis", "iréis", "ams", "ados",
         "idos", "amos", "ábamos", "áramos", "iéramos", "íamos",
         "aríamos", "eríamos", "iríamos", "aremos", "eremos", "iremos",
         "ásemos", "iésemos", "imos", "adors", "ass", "erass", "ess",
         "ats", "its", "ents", "às", "aràs", "iràs", "arás", "erás",
         "irás", "és", "arés", "ís", "iïs", "at", "it", "ant", "ent",
         "int", "ut", "ït", "au", "erau", "ieu", "ineu", "areu", "ireu",
         "àreu", "íreu", "asseu", "esseu", "eresseu", "àsseu", "ésseu",
         "igueu", "ïgueu", "àveu", "áveu", "itzeu", "ìeu", "irìeu",
         "íeu", "aríeu", "iríeu", "assiu", "issiu", "àssiu", "èssiu",
         "éssiu", "íssiu", "ïu", "ix", "eix", "ïx", "itz", "ià", "arà",
         "irà", "itzà", "ará", "erá", "irá", "irè", "aré", "eré", "iré",
         "í", "iï", "ió"]),
    (2, ["ando"]))
_CA_RESIDUAL = _bylen(
    (1, ["a", "e", "i", "ïn", "o", "ir", "s", "is", "os", "ïs", "it",
         "eu", "iu", "itz", "à", "á", "é", "ì", "í", "ï", "ó"]),
    (2, ["iqu"]))
_CA_CLEAN = str.maketrans({"à": "a", "á": "a", "è": "e", "é": "e",
                           "ì": "i", "í": "i", "ï": "i", "ò": "o",
                           "ó": "o", "ú": "u", "ü": "u", "·": "."})


def stem_catalan(w: str) -> str:
    p1, p2 = _r1r2_std(w, _CA_V)
    suf = _longest_suffix(w, _CA_PRONOUNS, 0)
    if suf and len(w) - len(suf) >= p1:
        w = w[:-len(suf)]
    suf, tag = _longest_tagged(w, _CA_STD, 0)
    matched = False
    if suf is not None:
        bra = len(w) - len(suf)
        if tag == 1 and bra >= p1:
            w, matched = w[:bra], True
        elif tag == 2 and bra >= p2:
            w, matched = w[:bra], True
        elif tag == 3 and bra >= p2:
            w, matched = w[:bra] + "log", True
        elif tag == 4 and bra >= p2:
            w, matched = w[:bra] + "ic", True
        elif tag == 5 and bra >= p1:
            w, matched = w[:bra] + "c", True
    if not matched:
        suf, tag = _longest_tagged(w, _CA_VERB, 0)
        if suf is not None:
            bra = len(w) - len(suf)
            if (tag == 1 and bra >= p1) or (tag == 2 and bra >= p2):
                w = w[:bra]
    suf, tag = _longest_tagged(w, _CA_RESIDUAL, 0)
    if suf is not None:
        bra = len(w) - len(suf)
        if bra >= p1:
            w = w[:bra] if tag == 1 else w[:bra] + "ic"
    return w.translate(_CA_CLEAN)


# ---------------------------------------------------------------------------
# Estonian (Snowball estonian script; reference
# ``org/tartarus/snowball/ext/EstonianStemmer.java``).  Whole-word verb
# exception table short-circuits everything; otherwise emphasis (gi/ki),
# verb endings (set is_verb), substantive passes when not a verb, and a
# final kpt-undoubling before a trailing vowel.

_ET_VERB_EXC = {
    "joob": "joo", "jood": "joo", "joodakse": "joo", "jooma": "joo",
    "joomata": "joo", "joome": "joo", "joon": "joo", "joote": "joo",
    "joovad": "joo", "juua": "joo", "juuakse": "joo", "jäi": "jääma",
    "jäid": "jääma", "jäime": "jääma", "jäin": "jääma", "jäite":
    "jääma", "jääb": "jääma", "jääd": "jääma", "jääda": "jääma",
    "jäädakse": "jääma", "jäädi": "jääma", "jääks": "jääma", "jääksid":
    "jääma", "jääksime": "jääma", "jääksin": "jääma", "jääksite":
    "jääma", "jääma": "jääma", "jäämata": "jääma", "jääme": "jääma",
    "jään": "jääma", "jääte": "jääma", "jäävad": "jääma", "jõi": "joo",
    "jõid": "joo", "jõime": "joo", "jõin": "joo", "jõite": "joo",
    "keeb": "keesi", "keed": "keesi", "keedakse": "keesi", "keeks":
    "keesi", "keeksid": "keesi", "keeksime": "keesi", "keeksin":
    "keesi", "keeksite": "keesi", "keema": "keesi", "keemata": "keesi",
    "keeme": "keesi", "keen": "keesi", "kees": "keesi", "keeta":
    "keesi", "keete": "keesi", "keevad": "keesi", "käia": "käisi",
    "käiakse": "käisi", "käib": "käisi", "käid": "käisi", "käidi":
    "käisi", "käiks": "käisi", "käiksid": "käisi", "käiksime": "käisi",
    "käiksin": "käisi", "käiksite": "käisi", "käima": "käisi",
    "käimata": "käisi", "käime": "käisi", "käin": "käisi", "käis":
    "käisi", "käite": "käisi", "käivad": "käisi", "laob": "ladu",
    "laod": "ladu", "laoks": "ladu", "laoksid": "ladu", "laoksime":
    "ladu", "laoksin": "ladu", "laoksite": "ladu", "laome": "ladu",
    "laon": "ladu", "laote": "ladu", "laovad": "ladu", "loeb": "luge",
    "loed": "luge", "loeks": "luge", "loeksid": "luge", "loeksime":
    "luge", "loeksin": "luge", "loeksite": "luge", "loeme": "luge",
    "loen": "luge", "loete": "luge", "loevad": "luge", "loob": "loo",
    "lood": "loo", "loodi": "loo", "looks": "loo", "looksid": "loo",
    "looksime": "loo", "looksin": "loo", "looksite": "loo", "looma":
    "loo", "loomata": "loo", "loome": "loo", "loon": "loo", "loote":
    "loo", "loovad": "loo", "luua": "loo", "luuakse": "loo", "lõi":
    "löi", "lõid": "löi", "lõime": "löi", "lõin": "löi", "lõite": "löi",
    "lööb": "löö", "lööd": "löö", "löödakse": "löö", "löödi": "löö",
    "lööks": "löö", "lööksid": "löö", "lööksime": "löö", "lööksin":
    "löö", "lööksite": "löö", "lööma": "löö", "löömata": "löö", "lööme":
    "löö", "löön": "löö", "lööte": "löö", "löövad": "löö", "lüüa":
    "löö", "lüüakse": "löö", "müüa": "müüsi", "müüakse": "müüsi",
    "müüb": "müüsi", "müüd": "müüsi", "müüdi": "müüsi", "müüks":
    "müüsi", "müüksid": "müüsi", "müüksime": "müüsi", "müüksin":
    "müüsi", "müüksite": "müüsi", "müüma": "müüsi", "müümata": "müüsi",
    "müüme": "müüsi", "müün": "müüsi", "müüs": "müüsi", "müüte":
    "müüsi", "müüvad": "müüsi", "näeb": "nägi", "näed": "nägi", "näeks":
    "nägi", "näeksid": "nägi", "näeksime": "nägi", "näeksin": "nägi",
    "näeksite": "nägi", "näeme": "nägi", "näen": "nägi", "näete":
    "nägi", "näevad": "nägi", "nägema": "nägi", "nägemata": "nägi",
    "näha": "nägi", "nähakse": "nägi", "nähti": "nägi", "põeb": "põde",
    "põed": "põde", "põeks": "põde", "põeksid": "põde", "põeksime":
    "põde", "põeksin": "põde", "põeksite": "põde", "põeme": "põde",
    "põen": "põde", "põete": "põde", "põevad": "põde", "saab": "saa",
    "saad": "saa", "saada": "saa", "saadakse": "saa", "saadi": "saa",
    "saaks": "saa", "saaksid": "saa", "saaksime": "saa", "saaksin":
    "saa", "saaksite": "saa", "saama": "saa", "saamata": "saa", "saame":
    "saa", "saan": "saa", "saate": "saa", "saavad": "saa", "sai": "saa",
    "said": "saa", "saime": "saa", "sain": "saa", "saite": "saa", "sõi":
    "söö", "sõid": "söö", "sõime": "söö", "sõin": "söö", "sõite": "söö",
    "sööb": "söö", "sööd": "söö", "söödakse": "söö", "söödi": "söö",
    "sööks": "söö", "sööksid": "söö", "sööksime": "söö", "sööksin":
    "söö", "sööksite": "söö", "sööma": "söö", "söömata": "söö", "sööme":
    "söö", "söön": "söö", "sööte": "söö", "söövad": "söö", "süüa":
    "söö", "süüakse": "söö", "teeb": "tegi", "teed": "tegi", "teeks":
    "tegi", "teeksid": "tegi", "teeksime": "tegi", "teeksin": "tegi",
    "teeksite": "tegi", "teeme": "tegi", "teen": "tegi", "teete":
    "tegi", "teevad": "tegi", "tegema": "tegi", "tegemata": "tegi",
    "teha": "tegi", "tehakse": "tegi", "tehti": "tegi", "toob": "too",
    "tood": "too", "toodi": "too", "tooks": "too", "tooksid": "too",
    "tooksime": "too", "tooksin": "too", "tooksite": "too", "tooma":
    "too", "toomata": "too", "toome": "too", "toon": "too", "toote":
    "too", "toovad": "too", "tuua": "too", "tuuakse": "too", "tõi":
    "too", "tõid": "too", "tõime": "too", "tõin": "too", "tõite": "too",
    "viia": "viima", "viiakse": "viima", "viib": "viima", "viid":
    "viima", "viidi": "viima", "viiks": "viima", "viiksid": "viima",
    "viiksime": "viima", "viiksin": "viima", "viiksite": "viima",
    "viima": "viima", "viimata": "viima", "viime": "viima", "viin":
    "viima", "viisime": "viima", "viisin": "viima", "viisite": "viima",
    "viite": "viima", "viivad": "viima", "võib": "võisi", "võid":
    "võisi", "võida": "võisi", "võidakse": "võisi", "võidi": "võisi",
    "võiks": "võisi", "võiksid": "võisi", "võiksime": "võisi",
    "võiksin": "võisi", "võiksite": "võisi", "võima": "võisi",
    "võimata": "võisi", "võime": "võisi", "võin": "võisi", "võis":
    "võisi", "võite": "võisi", "võivad": "võisi"
}

_ET_V1 = "aeiouäõöü"
_ET_RV = "aeiou"
_ET_KI = set("bdfghkpstzšž")
_ET_GI = set("aceijlmnoqruvwxäõöü")
_ET_LONGV = ("aa", "ee", "ii", "oo", "uu", "ää", "õõ", "öö", "üü")
_ET_EMPHASIS = _bylen((1, ["gi"]), (2, ["ki"]))
_ET_VERB_SUF = _bylen(
    (1, ["mata", "ksid", "nuksid", "sime", "ksime", "nuksime", "dakse",
         "takse", "site", "ksite", "nuksite", "sin", "ksin", "nuksin",
         "daks", "taks"]),
    (2, ["akse"]),
    (3, ["da", "b", "me", "n"]))
_ET_SPECIAL_NOUN = _bylen(
    (1, ["lane", "lasse", "lasi", "last"]),
    (2, ["mine", "misse", "misi", "mist"]),
    (3, ["line", "lisse", "lisi", "list"]))
_ET_CASE = sorted(("ga", "ta", "le", "sse", "l", "s", "ks", "t", "lt",
                   "st"), key=len, reverse=True)
_ET_PLURAL = _bylen(
    (1, ["ikkude", "ike", "ikke"]), (2, ["sid"]), (3, ["te"]),
    (4, ["d", "de"]))
_ET_DEGREES = _bylen((1, ["mai", "m"]), (2, ["ma"]))
_ET_NU = sorted(("va", "du", "nu", "tu"), key=len, reverse=True)


def _et_longv_before(w, pos):
    return pos >= 2 and w[pos - 2:pos] in _ET_LONGV


def stem_estonian(w: str) -> str:
    exc = _ET_VERB_EXC.get(w)
    if exc is not None:
        return exc
    p1 = _r1_std(w, _ET_V1)
    # emphasis: gi/ki
    suf, tag = _longest_tagged(w, _ET_EMPHASIS, p1)
    if suf is not None:
        bra = len(w) - 2
        if bra >= 4:
            if tag == 1:
                if (w[bra - 1] in _ET_GI
                        and not _et_longv_before(w, bra)):
                    w = w[:bra]
            else:
                if w[bra - 1] in _ET_KI:
                    w = w[:bra]
    # verb endings
    is_verb = False
    suf, tag = _longest_tagged(w, _ET_VERB_SUF, p1)
    if suf is not None:
        bra = len(w) - len(suf)
        if tag == 1:
            w, is_verb = w[:bra], True
        elif tag == 2:
            w, is_verb = w[:bra] + "a", True
        elif bra >= 1 and w[bra - 1] in _ET_V1:
            w, is_verb = w[:bra], True
    if not is_verb:
        suf, tag = _longest_tagged(w, _ET_SPECIAL_NOUN, p1)
        if suf is not None:
            bra = len(w) - len(suf)
            w = w[:bra] + {1: "lase", 2: "mise", 3: "lise"}[tag]
        suf = _longest_suffix(w, _ET_CASE, p1)
        if suf:
            bra = len(w) - len(suf)
            if ((bra >= 1 and w[bra - 1] in _ET_RV)
                    or _et_longv_before(w, bra)):
                w = w[:bra]
        suf, tag = _longest_tagged(w, _ET_PLURAL, p1)
        if suf is not None:
            bra = len(w) - len(suf)
            if tag == 1:
                w = w[:bra] + "iku"
            elif tag == 2:
                if not _et_longv_before(w, bra):
                    w = w[:bra]
            elif tag == 3:
                if bra >= 4:
                    if w[bra - 3:bra] in ("mis", "las", "lis"):
                        w = w[:bra] + "e"
                    elif not (bra >= 1 and w[bra - 1] == "t"):
                        w = w[:bra]
                    # preceded by "t": rule fails outright
                elif not (bra >= 1 and w[bra - 1] == "t"):
                    w = w[:bra] + "t"
            else:
                if ((bra >= 1 and w[bra - 1] in _ET_RV)
                        or _et_longv_before(w, bra)):
                    w = w[:bra]
        suf, tag = _longest_tagged(w, _ET_DEGREES, p1)
        if suf is not None:
            bra = len(w) - len(suf)
            if tag == 2:
                w = w[:bra]
            elif bra >= 1 and w[bra - 1] in _ET_RV:
                w = w[:bra]
        if (_longest_suffix(w, ("i",), p1)
                and len(w) >= 2 and w[-2] in _ET_RV):
            w = w[:-1]
        suf = _longest_suffix(w, _ET_NU, p1)
        if suf:
            w = w[:-len(suf)]
    # remove double kpt: trailing vowel preceded by kk/pp/tt
    if (len(w) >= 3 and w[-1] in _ET_V1
            and w[-3:-1] in ("kk", "pp", "tt")):
        w = w[:-3] + w[-2:]
    return w


# ---------------------------------------------------------------------------
# Arabic (Snowball arabic script; reference
# ``org/tartarus/snowball/ext/ArabicStemmer.java``).  Normalization of
# diacritics/digits/presentation forms, definiteness check, verb-vs-noun
# suffix branches gated by word-length floors, forward prefix chain with
# a moving offset (a replaced prefix shifts where the next step looks),
# and hamza post-normalization.

_AR_PRE_MAP = {}
for _c in "ـًٌٍَُِّْ":
    _AR_PRE_MAP[_c] = ""
for _i, _d in enumerate("٠١٢٣٤٥٦٧٨٩"):
    _AR_PRE_MAP[_d] = str(_i)
for _forms, _std in (
        ("ﺀ", "ء"), ("ﺃﺄ", "أ"), ("ﺇﺈ", "إ"), ("ﺉﺊﺋﺌ", "ئ"),
        ("ﺁﺂ", "آ"), ("ﺅﺆ", "ؤ"), ("ﺍﺎ", "ا"), ("ﺏﺐﺑﺒ", "ب"),
        ("ﺓﺔ", "ة"), ("ﺕﺖﺗﺘ", "ت"), ("ﺙﺚﺛﺜ", "ث"), ("ﺝﺞﺟﺠ", "ج"),
        ("ﺡﺢﺣﺤ", "ح"), ("ﺥﺦﺧﺨ", "خ"), ("ﺩﺪ", "د"), ("ﺫﺬ", "ذ"),
        ("ﺭﺮ", "ر"), ("ﺯﺰ", "ز"), ("ﺱﺲﺳﺴ", "س"), ("ﺵﺶﺷﺸ", "ش"),
        ("ﺹﺺﺻﺼ", "ص"), ("ﺽﺾﺿﻀ", "ض"), ("ﻁﻂﻃﻄ", "ط"),
        ("ﻅﻆﻇﻈ", "ظ"), ("ﻉﻊﻋﻌ", "ع"), ("ﻍﻎﻏﻐ", "غ"),
        ("ﻑﻒﻓﻔ", "ف"), ("ﻕﻖﻗﻘ", "ق"), ("ﻙﻚﻛﻜ", "ك"),
        ("ﻝﻞﻟﻠ", "ل"), ("ﻡﻢﻣﻤ", "م"), ("ﻥﻦﻧﻨ", "ن"),
        ("ﻩﻪﻫﻬ", "ه"), ("ﻭﻮ", "و"), ("ﻯﻰ", "ى"), ("ﻱﻲﻳﻴ", "ي"),
        ("ﻻﻼ", "لا"), ("ﻷﻸ", "لأ"), ("ﻹﻺ", "لإ"), ("ﻵﻶ", "لآ")):
    for _c in _forms:
        _AR_PRE_MAP[_c] = _std
_AR_PRE = str.maketrans(_AR_PRE_MAP)
_AR_POST = str.maketrans({"آ": "ا", "أ": "ا", "إ": "ا",
                          "ؤ": "و", "ئ": "ي"})

_AR_NOUN_1A = _bylen((1, ["ك", "ه", "ي"]),
                     (2, ["نا", "ها", "كم", "هم", "هن"]),
                     (3, ["كما", "هما"]))
_AR_VERB_1 = _bylen((1, ["ك", "ه"]),
                    (2, ["نا", "ها", "كم", "هم", "كن", "هن", "ني"]),
                    (3, ["كما", "هما", "كمو"]))
_AR_VERB_2A = _bylen((1, ["ا", "ت", "ن", "ي"]), (2, ["تا", "نا", "تن"]),
                     (3, ["ان", "ون", "ين"]), (4, ["تما"]))
_AR_PFX1 = _bylen((1, ["أأ", "أؤ"]), (2, ["أآ"]), (3, ["أا"]),
                  (4, ["أإ"]))
_AR_PFX1_REPL = {1: "أ", 2: "آ", 3: "ا", 4: "إ"}
_AR_PFX3B = _bylen((1, ["ب"]), (2, ["بب"]), (3, ["كك"]))
_AR_PFX3V = {"سي": "ي", "ست": "ت", "سن": "ن", "سأ": "أ"}
_AR_2A_MIN = {1: 4, 2: 5, 3: 5, 4: 6}   # case 3 is strict (>5)


def _ar_prefix_at(w, c, table):
    for s, tag in table:
        if w.startswith(s, c):
            return s, tag
    return None, None


def _ar_verb_branch(w):
    n1 = 0
    while True:                                  # Suffix_Verb_Step1 +
        suf, tag = _longest_tagged(w, _AR_VERB_1, 0)
        if suf is None or len(w) < 3 + tag:
            break
        w = w[:-len(suf)]
        n1 += 1
    if n1:
        suf, tag = _longest_tagged(w, _AR_VERB_2A, 0)   # Step2a
        if suf is not None and len(w) >= _AR_2A_MIN[tag] + (
                1 if tag == 3 else 0):
            return w[:-len(suf)], True
        if w.endswith("تمو") and len(w) >= 6:           # Step2c
            return w[:-3], True
        if w.endswith("و") and len(w) >= 4:
            return w[:-1], True
        if len(w) > 0:                                  # next (cursor--)
            return w, True
    if len(w) >= 5 and (w.endswith("وا") or w.endswith("تم")):
        return w[:-2], True                             # Step2b
    suf, tag = _longest_tagged(w, _AR_VERB_2A, 0)       # Step2a
    if suf is not None and len(w) >= _AR_2A_MIN[tag] + (
            1 if tag == 3 else 0):
        return w[:-len(suf)], True
    return w, False


def _ar_noun_2abc(w):
    """Step2a or Step2b or Step2c1 (shared by the 1a/1b continuations)."""
    if len(w) > 4 and w[-1] in "اوي":
        return w[:-1], True
    if len(w) >= 5 and w.endswith("ات"):
        return w[:-2], True
    if len(w) >= 4 and w.endswith("ت"):
        return w[:-1], True
    return w, False


def _ar_noun_branch(w, defined):
    done = False
    if len(w) >= 4 and w.endswith("ة"):                 # Step2c2
        w, done = w[:-1], True
    if not done and not defined:
        suf, tag = _longest_tagged(w, _AR_NOUN_1A, 0)   # Step1a
        if suf is not None and len(w) >= 3 + tag:
            w = w[:-len(suf)]
            w2, ok = _ar_noun_2abc(w)
            if ok:
                w, done = w2, True
            elif len(w) > 0:                            # cursor--
                done = True
    if not done and len(w) > 5 and w.endswith("ن"):     # Step1b
        w = w[:-1]
        w2, ok = _ar_noun_2abc(w)
        if ok:
            w, done = w2, True
    if not done and not defined:
        if len(w) > 4 and w[-1] in "اوي":               # Step2a
            w, done = w[:-1], True
    if not done and len(w) >= 5 and w.endswith("ات"):   # Step2b
        w, done = w[:-2], True
    if len(w) >= 3 and w.endswith("ي"):                 # Step3
        return w[:-1], True
    return w, False


def stem_arabic(w: str) -> str:
    is_noun = is_verb = True
    is_defined = False
    if (len(w) > 4 and (w.startswith("بال") or w.startswith("كال"))) or \
            (len(w) > 3 and (w.startswith("ال") or w.startswith("لل"))):
        is_noun, is_verb, is_defined = True, False, True
    w = w.translate(_AR_PRE)
    handled = False
    if is_verb:
        w, handled = _ar_verb_branch(w)
    if not handled and is_noun:
        w, handled = _ar_noun_branch(w, is_defined)
    if not handled and w.endswith("ى"):
        w = w[:-1] + "ي"
    # forward prefix chain with moving offset
    c = 0
    suf, tag = _ar_prefix_at(w, c, _AR_PFX1)            # Prefix_Step1
    if suf is not None and len(w) > 3:
        repl = _AR_PFX1_REPL[tag]
        w = w[:c] + repl + w[c + len(suf):]
        c += len(repl)
    if (not w.startswith("فا", c) and not w.startswith("وا", c)
            and c < len(w) and w[c] in "فو" and len(w) > 3):
        w = w[:c] + w[c + 1:]                           # Prefix_Step2
    did3 = False
    if ((w.startswith("بال", c) or w.startswith("كال", c))
            and len(w) > 5):                            # Prefix_Step3a
        w, did3 = w[:c] + w[c + 3:], True
    elif ((w.startswith("ال", c) or w.startswith("لل", c))
            and len(w) > 4):
        w, did3 = w[:c] + w[c + 2:], True
    if not did3 and is_noun and not w.startswith("با", c):
        suf, tag = _ar_prefix_at(w, c, _AR_PFX3B)       # Prefix_Step3b
        if suf is not None and len(w) > 3:
            if tag == 1:
                w, did3 = w[:c] + w[c + 1:], True
            else:
                w, did3 = w[:c] + suf[0] + w[c + 2:], True
    if not did3 and is_verb:
        two = w[c:c + 2]
        repl = _AR_PFX3V.get(two)                       # Prefix_Step3_Verb
        if repl is not None and len(w) > 4:
            w = w[:c] + repl + w[c + 2:]
            c += 1
        if w[c:c + 3] in ("تست", "نست", "يست") and len(w) > 4:
            w = w[:c] + "است" + w[c + 3:]               # Prefix_Step4_Verb
    # Normalize_post
    if w and w[-1] in "آأؤإئ":
        w = w[:-1] + "ء"
    return w.translate(_AR_POST)


# ---------------------------------------------------------------------------
# Yiddish (Snowball yiddish script; reference
# ``org/tartarus/snowball/ext/YiddishStemmer.java``).  Prelude folds
# vav/yod digraphs and final forms and strips niqqud; mark_regions
# rewrites גע/צו prefixes to ASCII "GE"/"TSU" markers and sets R1 past
# the first vowel run (floored at prefix+3, with a 3-consonant early
# exit); one big suffix pass with ablaut rewrites; markers removed last.

_YI_NIKED = "".join(chr(c) for c in (
    list(range(1456, 1464)) + [1464, 1465, 1467, 1468, 1471, 1473, 1474]))
_YI_STRIP_NIKED = str.maketrans({c: "" for c in _YI_NIKED})
_YI_VOWEL = "אויעױײ"
_YI_CONSONANT = set("בגדהזחטךכלםמןנסףפץצקרשת" "װ")
_YI_FINALS = {"ך": "כ", "ם": "מ", "ן": "נ", "ף": "פ", "ץ": "צ"}
_YI_PREFIXES = sorted((
    "אדורכ", "אהינ", "אהער", "אהײמ", "אומ", "אונטער", "איבער", "אנ",
    "אנט", "אנטקעגנ", "אנידער", "אפ", "אפיר", "אקעגנ", "אראפ", "ארומ",
    "ארונטער", "אריבער", "ארױס", "ארױפ", "ארײנ", "אװעק", "אױס", "אױפ",
    "אײנ", "בא", "בײ", "דורכ", "דער", "מיט", "נאכ", "פאר", "פארבײ",
    "פארױס", "פונאנדער", "צו", "צוזאמענ", "צונױפ", "צוריק", "צע",
), key=len, reverse=True)
_YI_CLUSTERS = ("דזש", "שטר", "שטש", "שפר")
_YI_A2 = _bylen(
    (-1, ["יע"]),
    (1, ["ונג", "סטו", "ט", "סט", "יסט", "שאפט", "הײט", "קײט", "יקײט",
         "לעכ", "עלעכ", "יזמ", "ימ", "עמ", "נ", "סטנ", "יסטנ", "ענ",
         "עלענ", "יזמענ", "ס", "נס", "עס", "עלעס", "ערס", "ענערס",
         "ע", "סטע", "עלע", "ער", "סטער"]),
    (2, ["יעס"]),
    (3, ["ענעמ", "ענס", "ענע", "ענער"]),
    (4, ["טענעמ", "טנ", "טס", "טנס", "טע", "טענע", "טער", "טענער"]),
    (5, ["גאנגענ", "גײנ"]), (6, ["נומענ"]), (7, ["שריבנ"]),
    (8, ["GEמיטנ"]), (9, ["GEביטנ"]), (10, ["GEביסנ"]), (11, ["װיזנ"]),
    (12, ["טריבנ"]), (13, ["GEליטנ"]), (14, ["קליבנ"]), (15, ["ריבנ"]),
    (16, ["GEריסנ"]), (17, ["שװיגנ"]), (18, ["שמיסנ"]), (19, ["שניטנ"]),
    (20, ["בונדנ"]), (21, ["װוטשנ"]), (22, ["זונגנ"]), (23, ["טרונקנ"]),
    (24, ["צװונגנ"]), (25, ["שלונגנ"]), (26, ["בױגנ"]), (27, ["הױבנ"]),
    (28, ["פארלױרנ"]), (29, ["שטאנענ"]), (30, ["שװױרנ"]),
    (31, ["בראכט"]), (32, ["ות"]), (33, ["גיסט", "שיסט"]))
_YI_CASE_REPL = {
    5: "גײ", 6: "נעמ", 7: "שרײב", 8: "מײד", 9: "בײט", 10: "בײס",
    11: "װײז", 12: "טרײב", 13: "לײט", 14: "קלײב", 15: "רײב", 16: "רײס",
    17: "שװײג", 18: "שמײס", 19: "שנײד", 20: "בינד", 21: "װיטש",
    22: "זינג", 23: "טרינק", 24: "צװינג", 25: "שלינג", 26: "בײג",
    27: "הײב", 28: "פארליר", 29: "שטײ", 30: "שװער", 31: "ברענג"}
_YI_REWRITES = (
    ("גאנג", "גײ"), ("נומ", "נעמ"), ("מיט", "מײד"), ("ביט", "בײט"),
    ("ביס", "בײס"), ("װיז", "װײז"), ("טריב", "טרײב"), ("ליט", "לײט"),
    ("קליב", "קלײב"), ("ריב", "רײב"), ("ריס", "רײס"), ("שװיג", "שװײג"),
    ("שמיס", "שמײס"), ("שניט", "שנײד"), ("שריב", "שרײב"),
    ("בונד", "בינד"), ("װוטש", "װיטש"), ("זונג", "זינג"),
    ("טרונק", "טרינק"), ("צװונג", "צװינג"), ("שלונג", "שלינג"),
    ("בױג", "בײג"), ("הױב", "הײב"), ("פארלױר", "פארליר"),
    ("שטאנ", "שטײ"), ("שװױר", "שװער"))
_YI_A3 = _bylen((1, ["ונג", "שאפט", "הײט", "קײט", "יקײט"]), (2, ["ל"]))
_YI_A4 = _bylen((-1, ["בליק", "גליק"]),
                (1, ["יג", "יק", "דיק", "נדיק", "ניק", "יש"]),
                (2, ["ענדיק"]))


def _yi_prelude(w: str) -> str:
    out = list(w)
    i = 0
    while i < len(out):
        c = out[i]
        nxt = out[i + 1] if i + 1 < len(out) else ""
        nn = out[i + 2] if i + 2 < len(out) else ""
        if c == "ו" and nxt == "ו" and nn != "ּ":
            out[i:i + 2] = ["װ"]
            continue
        if c == "ו" and nxt == "י" and nn != "ִ":
            out[i:i + 2] = ["ױ"]
            continue
        if c == "י" and nxt == "י" and nn != "ִ":
            out[i:i + 2] = ["ײ"]
            continue
        rep = _YI_FINALS.get(c)
        if rep is not None:
            out[i] = rep
            continue
        i += 1
    return "".join(out).translate(_YI_STRIP_NIKED)


def _yi_mark_regions(w):
    """Returns (w_with_markers, p1)."""
    c = 0
    if w.startswith("גע"):
        w = "GE" + w[2:]
        c = 2
    for pfx in _YI_PREFIXES:
        if w.startswith(pfx, c):
            c2 = c + len(pfx)
            tail = w[c2:]
            if tail in ("צוגנ", "צוקט", "צוקנ"):
                c = c2
            elif w.startswith("גע", c2):
                w = w[:c2] + "GE" + w[c2 + 2:]
                c = c2 + 2
            elif w.startswith("צו", c2):
                w = w[:c2] + "TSU" + w[c2 + 2:]
                c = c2 + 3
            break
    if c + 3 > len(w):
        return w, len(w)
    x = c + 3
    for cl in _YI_CLUSTERS:
        if w.startswith(cl, c):
            c += 3
            break
    if (c + 3 <= len(w) and all(ch in _YI_CONSONANT
                                for ch in w[c:c + 3])):
        return w, c + 3
    i = c
    n = len(w)
    while i < n and w[i] not in _YI_VOWEL:
        i += 1
    if i >= n:
        return w, n
    while i < n and w[i] in _YI_VOWEL:
        i += 1
    return w, max(i, x)


def stem_yiddish(w: str) -> str:
    w = _yi_prelude(w)
    w, p1 = _yi_mark_regions(w)
    # phase 1: the big suffix among
    suf, tag = _longest_tagged(w, _YI_A2, 0)
    if suf is not None:
        bra = len(w) - len(suf)
        if tag == 1:
            if bra >= p1:
                w = w[:bra]
        elif tag == 2:
            if bra >= p1:
                w = w[:bra] + "יע"
        elif tag == 3:
            if bra >= p1:
                w = w[:bra]
                for pat, rep in _YI_REWRITES:
                    if w.endswith(pat):
                        w = w[:-len(pat)] + rep
                        break
        elif tag == 4:
            second = False
            if bra >= p1:
                w = w[:bra]
                if w.endswith("געבראכ"):
                    w = w[:-6] + "ברענג"
                    second = True
                elif w.endswith("בראכ"):
                    w = w[:-4] + "ברענג"
                    second = True
            else:
                second = True            # R1 failed: fall to the tail del
            if second:
                for s2 in ("ענער", "ענעמ", "ענע", "נ", "ער", "נס",
                           "ע", "ס"):
                    if w.endswith(s2):
                        if len(w) - len(s2) >= p1:
                            w = w[:-len(s2)]
                        break
        elif tag == 32:
            if bra >= p1:
                w = w[:bra] + "ה"
        elif tag == 33:
            if len(w) - 1 >= p1:
                w = w[:-1]               # final ט of גיסט/שיסט
        elif tag > 0:
            w = w[:bra] + _YI_CASE_REPL[tag]
    # phase 2
    suf, tag = _longest_tagged(w, _YI_A3, 0)
    if suf is not None:
        bra = len(w) - len(suf)
        if tag == 1:
            if bra >= p1:
                w = w[:bra]
        elif bra >= p1 and bra >= 1 and w[bra - 1] in _YI_CONSONANT:
            w = w[:bra]
    # phase 3
    suf, tag = _longest_tagged(w, _YI_A4, 0)
    if suf is not None:
        bra = len(w) - len(suf)
        if tag == 1 and bra >= p1:
            w = w[:bra]
        elif tag == 2 and bra >= p1:
            # both branches of the reference's ענדיק case delete the
            # whole suffix (the fallback's נדיק test is always true)
            w = w[:bra]
    # phase 4: strip the GE/TSU markers, rightmost first
    k = len(w)
    while k > 0:
        if w[max(0, k - 2):k] == "GE":
            w = w[:k - 2] + w[k:]
            k -= 2
        elif w[max(0, k - 3):k] == "TSU":
            w = w[:k - 3] + w[k:]
            k -= 3
        else:
            k -= 1
    return w


# ---------------------------------------------------------------------------
# Tamil (Snowball tamil script; reference
# ``org/tartarus/snowball/ext/TamilStemmer.java``).  A procedural
# pipeline: fix_ending normalizations, question/pronoun prefix removal,
# question/um/common-word/vetrumai/plural/command suffix passes, then a
# tense-suffix loop; suffix alternatives are tried in script order
# (first match wins), each guarded by its own length / context tests.

_TA_P = "்"                                   # pulli
_TA_SIGNS = "ாிீுூெேை"
_TA_KCTPR = "கசடதபற"
_TA_CONS10 = "கஙசஞதநபமயவ"
_TA_A6 = "யரலளழவ"
_TA_A7 = "ஙஞணநனம"
_TA_INDEP = ("அஆஇஈஉஊ"
             "எஏஐஒஓஔ")


def _ta_ends(w, suf, not_before=None):
    """endswith + optional 'preceding char NOT in set' test (the
    Snowball negated lookbehind: vacuously true at the word start)."""
    if not w.endswith(suf):
        return False
    if not_before is not None:
        i = len(w) - len(suf) - 1
        if i >= 0 and w[i] in not_before:
            return False
    return True


def _ta_fix_va_start(w):
    for pat, rep in (("வோ", "ஓ"),
                     ("வொ", "ஒ"),
                     ("வு", "உ"),
                     ("வூ", "ஊ")):
        if w.startswith(pat):
            return rep + w[2:]
    return w


def _ta_fix_ending(w, vetrumai):
    if len(w) <= 3:
        return w, False
    P = _TA_P
    n = len(w)
    for suf in ("ந்த்", "ந்த",
                "ந்"):
        if w.endswith(suf):
            return w[:-len(suf)], True
    if (w.endswith("ய்") and n >= 3
            and w[-3] in "ிீை"):
        return w[:-2], True
    if w.endswith("ட்ப்") or \
            w.endswith("ட்க்"):
        return w[:-4] + "ள்", True
    if w.endswith("ன்ற்"):
        return w[:-4] + "ல்", True
    if w.endswith("ற்க்"):
        return w[:-4] + "ல்", True
    if w.endswith("ட்ட்"):
        return w[:-4] + "டு", True
    if vetrumai and _ta_ends(w, "த்த்",
                             not_before="ை"):
        return w[:-4] + "ம்", True
    if w.endswith("ுக்") or \
            w.endswith("ுக்க்"):
        k = 3 if w.endswith("ுக்") else 5
        return w[:-k] + P, True
    if (n >= 4 and w[-1] == P and w[-2] in _TA_KCTPR
            and w[-3] == P and w[-4] in _TA_KCTPR):
        return w[:-4], True
    if n >= 2 and w[-1] == P and w[-2] in _TA_KCTPR:
        return w[:-2], True
    if (n >= 3 and w[-1] == P and w[-3] == P
            and (w[-2] in _TA_A6 or w[-2] in _TA_A7)):
        return w[:-3] + P, True
    for suf in ("வ்", "ய", "வ"):
        if w.endswith(suf):
            return w[:-len(suf)], True
    if _ta_ends(w, "னு", not_before=_TA_SIGNS):
        return w[:-2], True
    if w.endswith("ங்"):
        if _ta_ends(w, "ங்", not_before="ை"):
            return w[:-2] + "ம்", True
        return w[:-2], True
    if (w[-1] == P and n >= 2
            and (w[-2] in _TA_SIGNS or w[-2] == P)):
        return w[:-1], True
    return w, False


def _ta_fix_endings(w, vetrumai):
    while True:
        w, ok = _ta_fix_ending(w, vetrumai)
        if not ok:
            return w


def _ta_remove_tense_suffix(w, vetrumai):
    """Returns (w, found_a_match)."""
    found = False
    if len(w) <= 4:
        return w, False
    for suf in ("கொண்டிர்",
                "படு"):                        # T1
        if w.endswith(suf):
            w, found = w[:-len(suf)], True
            break
    if not found:
        for suf, nb in (                                      # T2: delete
                ("மார்", None),
                ("மின்", None),
                ("னன்", None),
                ("னான்", None),
                ("னாள்", None),
                ("னார்", None),
                ("வன்", _TA_INDEP),
                ("னள்", None),
                ("வள்", None),
                ("னர்", None),
                ("வர்", None),
                ("ன", None), ("ப", None), ("க", None),
                ("த", None), ("ய", None),
                ("பன்", None),
                ("பள்", None),
                ("பர்", None),
                ("து", _TA_SIGNS),
                ("ிற்று", None),
                ("பம்", None),
                ("னம்", None),
                ("தும்", None),
                ("றும்", None),
                ("கும்", None),
                ("னென்", None),
                ("னை", None), ("வை", None)):
            if _ta_ends(w, suf, nb):
                w, found = w[:-len(suf)], True
                break
    if not found:
        for suf, nb in (                                      # T3: -> pulli
                ("ான்", "ச"),
                ("ாள்", None),
                ("ார்", None),
                ("ேன்", None),
                ("ா", None),
                ("ாம்", None),
                ("ெம்", None),
                ("ேம்", None),
                ("ோம்", None),
                ("கும்", None),
                ("தும்", None),
                ("டும்", None),
                ("றும்", None),
                ("ாய்", None),
                ("னென்", None),
                ("னிர்", None),
                ("ீர்", None),
                ("ீயர்", None)):
            if _ta_ends(w, suf, nb):
                w, found = w[:-len(suf)] + _TA_P, True
                break
    if not found:
        for suf in ("கு", "து"):          # T4
            if (w.endswith(suf) and len(w) > 2
                    and w[-3] == _TA_P):
                w, found = w[:-2], True
                break
    for suf in ("ாநின்ற்", # a_25
                "கின்ற்",
                "ாநின்ற",
                "கின்ற",
                "கிற்", "கிற"):
        if w.endswith(suf):
            w, found = w[:-len(suf)], True
            break
    w = _ta_fix_endings(w, vetrumai)
    return w, found


def stem_tamil(w: str) -> str:
    P = _TA_P
    vetrumai = False
    w, _ = _ta_fix_ending(w, vetrumai)
    if len(w) <= 4:
        return w
    # question prefix: எ + C + ்
    if (len(w) >= 3 and w[0] == "எ" and w[1] in _TA_CONS10
            and w[2] == P):
        w = _ta_fix_va_start(w[3:])
    # pronoun prefix: அ/இ/உ + C + ்
    if (len(w) >= 3 and w[0] in "அஇஉ"
            and w[1] in _TA_CONS10 and w[2] == P):
        w = _ta_fix_va_start(w[3:])
    # question suffixes: ா/ே/ோ -> ்
    if len(w) > 4:
        if w and w[-1] in "ாேோ":
            w = w[:-1] + P
        w = _ta_fix_endings(w, vetrumai)
    # um: ும் -> ்
    if len(w) > 4 and w.endswith("ும்"):
        w = w[:-3] + P
        w, _ = _ta_fix_ending(w, vetrumai)
    # common word endings
    if len(w) > 4:
        matched = False
        for suf, nb in (
                ("ுடன்", None),
                ("ில்லை", None),
                ("ிடம்", None),
                ("ின்றி", None),
                ("ாகி", None),
                ("ாகிய", None),
                ("ென்று", None),
                ("ுள்ள", None),
                ("ுடைய", None),
                ("ுடை", None),
                ("ெனும்", None),
                ("ல்ல", _TA_SIGNS),
                ("ென", None),
                ("ாகி", None)):
            if _ta_ends(w, suf, nb):
                w, matched = w[:-len(suf)] + P, True
                break
        if not matched:
            for suf in sorted((
                    "பட்ட",
                    "பட்டண",
                    "தான",
                    "படிதான",
                    "குரிய",
                    "படி",
                    "பற்றி",
                    "படு", "விடு",
                    "பட்டு",
                    "விட்டு",
                    "பட்டது",
                    "ெல்லாம்",
                    ), key=len, reverse=True):
                if w.endswith(suf):
                    w, matched = w[:-len(suf)], True
                    break
        if matched:
            w = _ta_fix_endings(w, vetrumai)
    # vetrumai urupukal
    if len(w) > 4:
        matched = False
        if w.endswith("னை"):                        # V1
            w, matched = w[:-2], True
        if not matched:                                       # V2
            if (_ta_ends(w, "ினை",
                         not_before=_TA_KCTPR)):
                w, matched = w[:-3] + P, True
            elif (_ta_ends(w, "ை", not_before=_TA_KCTPR)):
                w, matched = w[:-1] + P, True
            elif (w.endswith("ை") and len(w) >= 3
                    and w[-2] in _TA_KCTPR and w[-3] == P):
                w, matched = w[:-1] + P, True
        if not matched:                                       # V3
            for suf, nb, minlen in (
                    ("ொடு", None, 0),
                    ("ோடு", None, 0),
                    ("ில்", None, 0),
                    ("ிற்", None, 0),
                    ("ின்", "ம", 0),
                    ("ின்று", None, 0),
                    ("ிருந்து",
                     None, 0),
                    ("விட", None, 0),
                    ("ிடம்", None, 7),
                    ("ால்", None, 0),
                    ("ுடை", None, 0),
                    ("ாமல்", None, 0),
                    ("ல்", _TA_SIGNS, 0),
                    ("ுள்", None, 0)):
                if len(w) >= minlen and _ta_ends(w, suf, nb):
                    w, matched = w[:-len(suf)] + P, True
                    break
        if not matched:                                       # V4
            for suf, nb in (("கண்", None),
                            ("முன்", None),
                            ("மேல்", None),
                            ("மேற்", None),
                            ("கீழ்", None),
                            ("பின்", None),
                            ("து", _TA_SIGNS)):
                if _ta_ends(w, suf, nb):
                    w, matched = w[:-len(suf)], True
                    break
        if not matched and w.endswith("ீ"):              # V5
            w, matched = w[:-1] + "ி", True
        if matched:
            vetrumai = True
            if w.endswith("ின்"):
                w = w[:-3] + P
            w = _ta_fix_endings(w, vetrumai)
    # plural suffix
    if _ta_ends(w, "ுங்கள்",
                not_before=_TA_KCTPR):
        w = w[:-6] + P
    elif w.endswith("ற்கள்"):
        w = w[:-5] + "ல்"
    elif w.endswith("ட்கள்"):
        w = w[:-5] + "ள்"
    elif w.endswith("கள்"):
        w = w[:-3]
    # command suffixes
    if len(w) > 4 and (w.endswith("பி")
                       or w.endswith("வி")):
        w = w[:-2]
    # tense suffixes, repeated while something matched
    found = True
    while found:
        w, found = _ta_remove_tense_suffix(w, vetrumai)
    return w


# ---------------------------------------------------------------------------
# Greek (Snowball greek script, the Ntais/Saroukos algorithm as compiled
# by Snowball 2.0; reference ``org/tartarus/snowball/ext/GreekStemmer.java``
# — distinct from the handwritten ``el/GreekStemmer.java`` already in
# ``functions/greekstem.py``).  Backward lowercase/accent fold, then ~30
# suffix steps, each "delete suffix; if the remaining stem is exactly /
# ends with a listed stem, re-append a marker".  Three steps (step4,
# 5b, 5c) reproduce the generated code's cursor quirk where the
# insert-branch's tail check replaces the consumed chars; the ισα
# branch of steps3 raises in the reference (stale ket after slice_del)
# and is therefore left as a no-op here.

_EL2_A2 = (
    "συναθρο", "αναμπα", "ξαναπα", "περιπα", "αθρο", "δανε", "εμπα",
    "επα", "πα")
_EL2_A3 = (
    "πιπερορ", "βαθυρι", "βολβορ", "γλυκορ", "γλυκυρ", "αμπαρ",
    "πολυρ", "βαρκ", "κορν", "μαρκ", "αρρ", "γκρ", "ιμπ", "λου",
    "μαρ", "μπρ", "πρ", "β", "λ", "μ", "π", "ρ")
_EL2_A4 = (
    "ιζουμε", "ιζουνε", "ιζαμε", "ιζανε", "ιζατε", "ιζεισ", "ιζετε",
    "ιζουν", "ιζαν", "ιζει", "ιζεσ", "ιζα", "ιζε", "ιζω")
_EL2_A5 = (
    "αλ", "βι", "εν", "ζω", "λι", "υψ", "σ", "χ")
_EL2_A6 = (
    "ωθηκαμε", "ωθηκανε", "ωθηκατε", "ωθηκαν", "ωθηκεσ", "ωθηκα",
    "ωθηκε")
_EL2_A7 = (
    "συναθρο", "χαρτοπα", "αναμπα", "απεκλε", "αποκλε", "εξαρχα",
    "εσωκλε", "μετεπε", "ξαναπα", "περιπα", "αθρο", "δανε", "εκλε",
    "εμπα", "επα", "επε", "εσε", "κλε", "πε")
_EL2_A8 = (
    "γιγαντοαφ", "δημοκρατ", "πουκαμ", "γκε", "κομ", "λαρ", "ολο",
    "αν", "αφ", "γε", "γκ", "μ", "π")
_EL2_A9 = (
    "ισαμε", "ισανε", "ισατε", "ισαν", "ισεσ", "ισα", "ισε")
_EL2_A10 = (
    "συναθρο", "χαρτοπα", "αναμπα", "απεκλε", "αποκλε", "εξαρχα",
    "εσωκλε", "μετεπε", "ξαναπα", "περιπα", "αθρο", "δανε", "εκλε",
    "εμπα", "επα", "επε", "εσε", "κλε", "πε")
_EL2_A11 = (
    "ισουμε", "ισουνε", "ισεισ", "ισετε", "ισουν", "ισει", "ισω")
_EL2_A12 = (
    "συναθρο", "εσωκλε", "δανε", "ασε", "κλε", "πλε", "σε")
_EL2_A13 = (
    "ακτ", "αορ", "ασχ", "ατα", "αχν", "αχτ", "γεμ", "γυρ", "εμπ",
    "ευπ", "εχθ", "ηφα", "καθ", "κακ", "κυλ", "λυγ", "μακ", "μεγ",
    "ταχ", "φιλ", "χωρ", "απ", "αρ", "ηδ", "κτ", "σκ", "σχ", "υψ",
    "φα", "χρ", "χτ", "μ", "π")
_EL2_A14 = (
    "ιστουσ", "ιστεσ", "ιστησ", "ιστοι", "ιστοσ", "ιστου", "ιστων",
    "ιστα", "ιστε", "ιστη", "ιστο")
_EL2_A15 = (
    "μικροσε", "αποκλε", "μετασε", "εγκλε", "σε")
_EL2_A16 = (
    "αντιδανε", "δανε")
_EL2_A18 = (
    "ισμουσ", "ισμοι", "ισμοσ", "ισμου", "ισμων", "ισμο")
_EL2_A19 = (
    "σ", "χ")
_EL2_A20 = (
    "ουδακια", "αρακια", "ουδακι", "αρακι")
_EL2_A21 = (
    "τσεχοσλοβ", "κατραπ", "ναγκασ", "αλισφ", "καπακ", "μουστ",
    "αμβρ", "ανθρ", "βαμβ", "καιμ", "κλιμ", "λαβρ", "λουλ", "σλοβ",
    "σπαν", "φαρμ", "κον", "κορ", "μαλ", "μερ", "σοκ", "φυλ", "βρ",
    "πλ", "ρυ", "σκ", "σφ", "τζ", "κ", "ρ", "σ", "φ", "χ")
_EL2_A22 = (
    "ηγουμεν", "μακρυν", "τριπολ", "πατερ", "γιαν", "καρδ", "βαλ",
    "κον", "νυφ", "τοσ", "γλ", "σκ", "β", "ζ", "π")
_EL2_A23 = (
    "αρακια", "αρακι", "ιτσασ", "ιτσεσ", "ιτσων", "ακια", "ιτσα",
    "ακι")
_EL2_A24 = (
    "αιφν", "ολο", "ψαλ", "ιρ")
_EL2_A25 = (
    "παιχν", "ε")
_EL2_A26 = (
    "ιδιων", "ιδια", "ιδιο")
_EL2_A27 = (
    "φραγκ", "οβελ", "λυκ", "μην", "ιβ", "δ", "ρ")
_EL2_A28 = (
    "ισκοσ", "ισκου", "ισκε", "ισκο")
_EL2_A29 = (
    "αδεσ", "αδων")
_EL2_A30 = (
    "γιαγι", "μπαμπ", "νταντ", "πατερ", "πεθερ", "θει", "κυρ",
    "μαμ", "μαν", "οκ")
_EL2_A31 = (
    "εδεσ", "εδων")
_EL2_A32 = (
    "κρασπ", "γηπ", "δαπ", "εμπ", "μιλ", "ιπ", "οπ", "υπ")
_EL2_A33 = (
    "ουδεσ", "ουδων")
_EL2_A34 = (
    "καλιακ", "πεταλ", "λουλ", "πλεξ", "τραγ", "αρκ", "βελ", "λιχ",
    "σκ", "σπ", "φε", "φλ", "φρ", "χν", "σ")
_EL2_A35 = (
    "εων", "εωσ")
_EL2_A36 = (
    "γαλ", "παρ", "ελ", "ιδ", "δ", "θ", "ν", "π")
_EL2_A37 = (
    "ιου", "ιων", "ια")
_EL2_A38 = (
    "ικου", "ικων", "ικα", "ικο")
_EL2_A39 = (
    "αμμοχαλ", "μπαγιατ", "ποστελν", "συνομηλ", "καλλιν", "πικαντ",
    "πλιατσ", "πρωτοδ", "αντιδ", "καταδ", "συναδ", "φιλον", "φυλοδ",
    "αμαν", "ανηθ", "βρωμ", "εξωδ", "καλπ", "μουλ", "μπαν", "μπολ",
    "μποσ", "πετσ", "πιτσ", "σερτ", "τσαμ", "υποδ", "γερ", "ενδ",
    "νιτ", "ξικ", "φυσ", "χασ", "αδ", "αλ", "ηθ")
_EL2_A40 = (
    "ηθηκαμε", "ουσαμε", "αγαμε", "ηκαμε", "ησαμε")
_EL2_A41 = (
    "αποστ", "αναπ", "αποθ", "αποκ", "βουβ", "πικρ", "ξεθ", "ουλ",
    "πεθ", "ποτ", "σιχ", "χ")
_EL2_A42 = (
    "τρ", "τσ")
_EL2_A43 = (
    "ιουντανε", "ηθηκανε", "ιοντανε", "ουντανε", "ιοτανε", "οντανε",
    "ουσανε", "αγανε", "ηκανε", "ησανε", "οτανε")
_EL2_A44 = (
    "καπνοβιομηχ", "μεγλοβιομηχ", "μικροβιομηχ", "χαμηλοδαπ",
    "αμερικαν", "μουσουλμ", "ξηροκλιβ", "ολιγοδαμ", "σαρακατσ",
    "φωτοστεφ", "βαθυγαλ", "δραδουμ", "καλπουζ", "καταγαλ",
    "κοιλαρφ", "πενταρφ", "πολυδαπ", "πολυμηχ", "τσαρλατ",
    "ψηλοταβ", "ατσιγγ", "βιομηχ", "βραχυκ", "καστελ", "κορμορ",
    "λουθηρ", "μωαμεθ", "ολογαλ", "περιτρ", "πορτολ", "πουριτ",
    "υπερηφ", "υποκοπ", "ψυχοπλ", "αθιγγ", "ανοργ", "βετερ",
    "βουλκ", "βραχμ", "ενοργ", "λαοπλ", "μαιντ", "πελεκ", "περηφ",
    "πολισ", "σουλτ", "τσιγγ", "αδαπ", "αμηχ", "ανικ", "απηγ",
    "απιθ", "βασκ", "διατ", "διαφ", "διπλ", "ζωντ", "καστ", "κλιβ",
    "νταβ", "πλατ", "στεγ", "στεφ", "τραγ", "τσαγ", "τσοπ", "βασ",
    "γαλ", "γερ", "δεκ", "θυσ", "κοπ", "λιβ", "λιχ", "μελ", "ορφ",
    "ουλ", "ουρ", "πιθ", "σιγ", "ταβ", "τετ", "αγ", "ερ", "ικ",
    "πλ", "σπ", "γ", "θ", "μ", "ν", "π", "σ", "φ", "χ")
_EL2_A45 = (
    "ησετε",)
_EL2_A46 = (
    "υπερθ", "διαθ", "συνδ", "συνθ", "ωφελ", "αιν", "αιρ", "αρκ",
    "βαρ", "βολ", "εκθ", "ενδ", "ενθ", "ευθ", "ευρ", "καθ", "νετ",
    "πον", "πυρ", "ραθ", "ροθ", "ρον", "συν", "ταθ", "τιθ", "φορ",
    "χωρ", "βρ", "οδ", "σθ", "σχ")
_EL2_A47 = (
    "παρακαλ", "βαρον", "αβαρ", "εναρ", "θαρρ", "μπορ", "σερπ",
    "σκελ", "συρφ", "αβρ", "απλ", "βεν", "κοπ", "νιφ", "ντρ", "παγ",
    "τοκ", "αδ", "αθ", "αν", "εμ", "σκ", "δ", "θ", "υ")
_EL2_A48 = (
    "οντασ", "ωντασ")
_EL2_A49 = (
    "ιομαστε", "ομαστε")
_EL2_A50 = (
    "αμεταμφ", "ακαταπ", "ασυμπ", "συμπ", "απ", "π")
_EL2_A51 = (
    "παρακαλ", "εκτελ", "νισ", "προ", "αλ", "αρ", "ζ", "μ", "ξ")
_EL2_A52 = (
    "ηθηκεσ", "ηθηκα", "ηθηκε")
_EL2_A53 = (
    "σκουλ", "ναρθ", "σκωλ", "πιθ", "οθ", "σφ")
_EL2_A54 = (
    "παρακαταθ", "προσθ", "διαθ", "συνθ", "θ")
_EL2_A55 = (
    "ηκεσ", "ηκα", "ηκε")
_EL2_A56 = (
    "μαντιλ", "πανταχ", "κυματ", "ποδαρ", "βλεπ", "μαλλ", "πρωτ",
    "φρυδ", "λαχ", "ληγ", "φαγ", "ομ")
_EL2_A57 = (
    "δευτερευ", "ενδιαφερ", "καθαρευ", "υποτειν", "δεσποζ",
    "λαμπιδ", "φαρμακ", "αναρρ", "εκλιπ", "μεσαζ", "ανηκ", "βρομ",
    "αγκ", "αιθ", "λεχ", "μεδ", "πατ", "πλε", "τσα", "χαδ", "αμ",
    "δε", "λ", "μ", "ρ")
_EL2_A58 = (
    "ουσεσ", "ουσα", "ουσε")
_EL2_A59 = (
    "ναυλοχ", "ψοφ")
_EL2_A60 = (
    "σμην", "χορτ", "λοχ", "πελ", "λλ", "οφ", "πρ", "ρπ", "σφ", "φρ")
_EL2_A61 = (
    "κροκαλοπ", "προσωποπ", "σιδηροπ", "αιμοστ", "αμαλλι", "δερβεν",
    "δροσοπ", "αβαστ", "ανυστ", "αρτιπ", "ασπαρ", "νομοτ", "ουλαμ",
    "πολυφ", "προστ", "αδηφ", "αειπ", "αμαλ", "ανυπ", "απερ",
    "αποτ", "αχαρ", "διατ", "επιτ", "νεοπ", "ολοπ", "ομοτ", "παμφ",
    "συμπ", "συντ", "υποτ", "ασπ", "ναυ", "ξεφ", "ουρ", "χαρ", "αφ",
    "εν", "τρ", "λ", "μ", "π", "ρ", "τ")
_EL2_A62 = (
    "αγεσ", "αγα", "αγε")
_EL2_A63 = (
    "ησου", "ησα", "ησε")
_EL2_A64 = (
    "δωδεκαν", "μεγαλον", "ερημον", "χερσον", "επταν", "ν")
_EL2_A65 = (
    "ηστε",)
_EL2_A66 = (
    "κοινοχρ", "παλιμψ", "αειμν", "δυσχρ", "ευχρ", "απλ", "ασβ",
    "αχρ", "σβ", "χρ")
_EL2_A67 = (
    "ηθουνε", "ησουνε", "ουνε")
_EL2_A68 = (
    "στραβομουτσ", "κακομουτσ", "εξων", "σπι", "ν", "ρ")
_EL2_A69 = (
    "ηθουμε", "ησουμε", "ουμε")
_EL2_A70 = (
    "αλλοσουσ", "παρασουσ", "ωριοπλ", "ασουσ", "αζ", "φ", "χ")
_EL2_A71 = (
    "ματοσ", "ματων", "ματα")
_EL2_A72 = (
    "ιοντουσαν", "ιομασταν", "ιοσασταν", "ιουμαστε", "οντουσαν",
    "ηθηκατε", "ιεμαστε", "ιεσαστε", "ιομουνα", "ιοσαστε",
    "ιοσουνα", "ιουνται", "ιουνταν", "ομασταν", "οσασταν",
    "ουμαστε", "ηθειτε", "ηθηκαν", "ιομουν", "ιονταν", "ιοσουν",
    "ομουνα", "οσαστε", "οσουνα", "ουνται", "ουνταν", "ουσατε",
    "αγατε", "ηθεισ", "ηθουν", "ηκατε", "ησατε", "ησουν", "ιεμαι",
    "ιεσαι", "ιεται", "ιοταν", "ιουμα", "ομουν", "ονται", "ονταν",
    "οσουν", "ουμαι", "ουσαν", "αγαν", "αμαι", "ασαι", "αται",
    "ειτε", "εσαι", "εται", "ηδεσ", "ηδων", "ηθει", "ηκαν", "ησαν",
    "ησει", "ησεσ", "ομαι", "οταν", "αει", "εισ", "ηθω", "ησω",
    "ουν", "ουσ", "αν", "ασ", "αω", "ει", "εσ", "ησ", "οι", "οσ",
    "ου", "υσ", "ων", "α", "ε", "η", "ι", "ο", "υ", "ω")
_EL2_A73 = (
    "εστατ", "εστερ", "οτατ", "οτερ", "υτατ", "υτερ", "ωτατ", "ωτερ")
_EL2_A1 = _bylen((1, ['φαγια', 'φαγιων', 'φαγιου']),
    (2, ['σκαγια', 'σκαγιων', 'σκαγιου']),
    (3, ['ολογια', 'ολογιων', 'ολογιου']),
    (4, ['σογια', 'σογιων', 'σογιου']),
    (5, ['τατογια', 'τατογιων', 'τατογιου']),
    (6, ['κρεατα', 'κρεατων', 'κρεασ', 'κρεατοσ']),
    (7, ['περατα', 'περατη', 'περατων', 'περασ', 'περατοσ']),
    (8, ['τερατα', 'τερατων', 'τερασ', 'τερατοσ']),
    (9, ['φωτα', 'φωτων', 'φωτοσ', 'φωσ']),
    (10, ['καθεστωτα', 'καθεστωτων', 'καθεστωτοσ', 'καθεστωσ']),
    (11, ['γεγονοτα', 'γεγονοτων', 'γεγονοσ', 'γεγονοτοσ']))
_EL2_A1_REPL = {1: 'φα', 2: 'σκα', 3: 'ολο', 4: 'σο', 5: 'τατο', 6: 'κρε', 7: 'περ', 8: 'τερ', 9: 'φω', 10: 'καθεστ', 11: 'γεγον'}
_EL2_A17 = _bylen((1, ['αγνωστικ']),
    (2, ['ατομικ']),
    (3, ['γνωστικ']),
    (4, ['εθνικ']),
    (5, ['εκλεκτικ']),
    (6, ['σκεπτικ']),
    (7, ['τοπικ']),
    (8, ['αλεξανδριν']),
    (9, ['βυζαντιν']),
    (10, ['θεατριν']))
_EL2_A17_REPL = {1: 'αγνωστ', 2: 'ατομ', 3: 'γνωστ', 4: 'εθν', 5: 'εκλεκτ', 6: 'σκεπτ', 7: 'τοπ', 8: 'αλεξανδρ', 9: 'βυζαντ', 10: 'θεατρ'}
_EL2_LOWER = str.maketrans({'Ά': 'α', 'Α': 'α', 'ά': 'α', 'Β': 'β', 'Γ': 'γ', 'Δ': 'δ', 'Έ': 'ε', 'Ε': 'ε', 'έ': 'ε', 'Ζ': 'ζ', 'Ή': 'η', 'ΐ': 'η', 'Η': 'η', 'ή': 'η', 'ϊ': 'η', 'Θ': 'θ', 'Ί': 'ι', 'Ι': 'ι', 'Ϊ': 'ι', 'ί': 'ι', 'Κ': 'κ', 'Λ': 'λ', 'Μ': 'μ', 'Ν': 'ν', 'Ξ': 'ξ', 'Ό': 'ο', 'Ο': 'ο', 'ό': 'ο', 'Π': 'π', 'Ρ': 'ρ', 'Σ': 'σ', 'ς': 'σ', 'Τ': 'τ', 'Ύ': 'υ', 'Υ': 'υ', 'Ϋ': 'υ', 'ΰ': 'υ', 'ϋ': 'υ', 'ύ': 'υ', 'Φ': 'φ', 'Χ': 'χ', 'Ψ': 'ψ', 'Ώ': 'ω', 'Ω': 'ω', 'ώ': 'ω'})

_EL2_V = "αεηιουω"
_EL2_V2 = "αεηιοω"


def stem_greek_snowball(w: str) -> str:
    w = w.translate(_EL2_LOWER)
    if len(w) < 3:
        return w
    test1 = True
    suf, tag = _longest_tagged(w, _EL2_A1, 0)              # step1
    if suf is not None:
        w = w[:-len(suf)] + _EL2_A1_REPL[tag]
        test1 = False
    suf = _longest_suffix(w, _EL2_A4, 0)                   # steps1
    if suf:
        w, test1 = w[:-len(suf)], False
        if w in _EL2_A2:
            w += "ι"
        elif w in _EL2_A3:
            w += "ιζ"
    suf = _longest_suffix(w, _EL2_A6, 0)                   # steps2
    if suf:
        w, test1 = w[:-len(suf)], False
        if w in _EL2_A5:
            w += "ων"
    suf = _longest_suffix(w, _EL2_A9, 0)                   # steps3
    if suf:
        w, test1 = w[:-len(suf)], False
        if w == "ισα":
            pass                      # reference crashes on this path
        elif w in _EL2_A7:
            w += "ι"
        elif w in _EL2_A8:
            w += "ισ"
    suf = _longest_suffix(w, _EL2_A11, 0)                  # steps4
    if suf:
        w, test1 = w[:-len(suf)], False
        if w in _EL2_A10:
            w += "ι"
    suf = _longest_suffix(w, _EL2_A14, 0)                  # steps5
    if suf:
        w, test1 = w[:-len(suf)], False
        if w in _EL2_A12:
            w += "ι"
        elif w in _EL2_A13:
            w += "ιστ"
    suf = _longest_suffix(w, _EL2_A18, 0)                  # steps6
    if suf:
        w, test1 = w[:-len(suf)], False
        if w in _EL2_A15:
            w += "ισμ"
        elif w in _EL2_A16:
            w += "ι"
        else:
            s2, t2 = _longest_tagged(w, _EL2_A17, 0)
            if s2 is not None:
                w = w[:-len(s2)] + _EL2_A17_REPL[t2]
    suf = _longest_suffix(w, _EL2_A20, 0)                  # steps7
    if suf:
        w, test1 = w[:-len(suf)], False
        if w in _EL2_A19:
            w += "αρακ"
    suf = _longest_suffix(w, _EL2_A23, 0)                  # steps8
    if suf:
        w, test1 = w[:-len(suf)], False
        if w in _EL2_A21:
            w += "ακ"
        elif w in _EL2_A22:
            w += "ιτσ"
        elif w.endswith("κορ"):
            w += "ιτσ"
    suf = _longest_suffix(w, _EL2_A26, 0)                  # steps9
    if suf:
        w, test1 = w[:-len(suf)], False
        if w in _EL2_A24:
            w += "ιδ"
        elif _longest_suffix(w, _EL2_A25, 0):
            w += "ιδ"
    suf = _longest_suffix(w, _EL2_A28, 0)                  # steps10
    if suf:
        w, test1 = w[:-len(suf)], False
        if w in _EL2_A27:
            w += "ισκ"
    suf = _longest_suffix(w, _EL2_A29, 0)                  # step2a
    if suf:
        w = w[:-len(suf)]
        if not _longest_suffix(w, _EL2_A30, 0):
            w += "αδ"
    suf = _longest_suffix(w, _EL2_A31, 0)                  # step2b
    if suf:
        w = w[:-len(suf)]
        if _longest_suffix(w, _EL2_A32, 0):
            w += "εδ"
    suf = _longest_suffix(w, _EL2_A33, 0)                  # step2c
    if suf:
        w = w[:-len(suf)]
        if _longest_suffix(w, _EL2_A34, 0):
            w += "ουδ"
    suf = _longest_suffix(w, _EL2_A35, 0)                  # step2d
    if suf:
        w, test1 = w[:-len(suf)], False
        if w in _EL2_A36:
            w += "ε"
    suf = _longest_suffix(w, _EL2_A37, 0)                  # step3
    if suf:
        w, test1 = w[:-len(suf)], False
        if w and w[-1] in _EL2_V:
            w += "ι"
    suf = _longest_suffix(w, _EL2_A38, 0)                  # step4
    if suf:
        w, test1 = w[:-len(suf)], False
        if w and w[-1] in _EL2_V:
            stem = w
            w = w + "ικ"
            if stem[:-1] in _EL2_A39:      # quirk: replaces the vowel
                w = stem[:-1] + "ικικ"
        elif w in _EL2_A39:
            w += "ικ"
    if w == "αγαμε":                               # step5a
        w = "αγαμ"              # stale bra/ket resolve to whole-word
    suf = _longest_suffix(w, _EL2_A40, 0)
    if suf:
        w, test1 = w[:-len(suf)], False
    if w.endswith("αμε"):
        w, test1 = w[:-3], False
        if w in _EL2_A41:
            w += "αμ"
    suf = _longest_suffix(w, _EL2_A43, 0)                  # step5b
    if suf:
        w, test1 = w[:-len(suf)], False
        if w in _EL2_A42:
            w += "αγαν"
    if w.endswith("ανε"):
        w, test1 = w[:-3], False
        if w and w[-1] in _EL2_V2:
            stem = w
            w = w + "αν"
            if stem[:-1] in _EL2_A44:      # quirk tail
                w = stem[:-1] + "αναν"
        elif w in _EL2_A44:
            w += "αν"
    if w.endswith("ησετε"):                                # step5c
        w, test1 = w[:-5], False
    if w.endswith("ετε"):
        w, test1 = w[:-3], False
        if w and w[-1] in _EL2_V2:
            stem = w
            w = w + "ετ"
            if stem[:-1] in _EL2_A47:      # quirk tail
                w = stem[:-1] + "ετετ"
        else:
            m = _longest_suffix(w, _EL2_A46, 0)
            if m:
                stem = w
                w = w + "ετ"
                if stem[:-len(m)] in _EL2_A47:
                    w = stem[:-len(m)] + "ετετ"
            elif w in _EL2_A47:
                w += "ετ"
    suf = _longest_suffix(w, _EL2_A48, 0)                  # step5d
    if suf:
        w, test1 = w[:-len(suf)], False
        if w == "αρχ":
            w += "οντ"
        elif w.endswith("κρε"):
            w += "ωντ"
    suf = _longest_suffix(w, _EL2_A49, 0)                  # step5e
    if suf:
        w, test1 = w[:-len(suf)], False
        if w == "ον":
            w += "ομαστ"
    if w.endswith("ιεστε"):                                # step5f
        w, test1 = w[:-5], False
        if w in _EL2_A50:
            w += "ιεστ"
    if w.endswith("εστε"):
        w, test1 = w[:-4], False
        if w in _EL2_A51:
            w += "ιεστ"
    suf = _longest_suffix(w, _EL2_A52, 0)                  # step5g
    if suf:
        w, test1 = w[:-len(suf)], False
    suf = _longest_suffix(w, _EL2_A55, 0)
    if suf:
        w, test1 = w[:-len(suf)], False
        if _longest_suffix(w, _EL2_A53, 0):
            w += "ηκ"
        elif w in _EL2_A54:
            w += "ηκ"
    suf = _longest_suffix(w, _EL2_A58, 0)                  # step5h
    if suf:
        w, test1 = w[:-len(suf)], False
        if _longest_suffix(w, _EL2_A56, 0):
            w += "ουσ"
        elif w in _EL2_A57:
            w += "ουσ"
    suf = _longest_suffix(w, _EL2_A63, 0)                  # step5j
    if suf:
        w, test1 = w[:-len(suf)], False
        if w in _EL2_A64:
            w += "ησ"
    suf = _longest_suffix(w, _EL2_A62, 0)                  # step5i
    if suf:
        w, test1 = w[:-len(suf)], False
        if w.endswith("κολλ"):
            w += "αγ"
        elif _longest_suffix(w, _EL2_A59, 0):
            pass                             # ψοφ/ναυλοχ: no append
        elif _longest_suffix(w, _EL2_A60, 0):
            w += "αγ"
        elif w in _EL2_A61:
            w += "αγ"
    if w.endswith("ηστε"):                                 # step5k
        w, test1 = w[:-4], False
        if w in _EL2_A66:
            w += "ηστ"
    suf = _longest_suffix(w, _EL2_A67, 0)                  # step5l
    if suf:
        w, test1 = w[:-len(suf)], False
        if w in _EL2_A68:
            w += "ουν"
    suf = _longest_suffix(w, _EL2_A69, 0)                  # step5m
    if suf:
        w, test1 = w[:-len(suf)], False
        if w in _EL2_A70:
            w += "ουμ"
    suf = _longest_suffix(w, _EL2_A71, 0)                  # step6
    if suf:
        w = w[:-len(suf)] + "μα"
    if test1:
        suf = _longest_suffix(w, _EL2_A72, 0)
        if suf:
            w = w[:-len(suf)]
    suf = _longest_suffix(w, _EL2_A73, 0)                  # step7
    if suf:
        w = w[:-len(suf)]
    return w


# ---------------------------------------------------------------------------
# Serbian (Snowball serbian script; reference
# ``org/tartarus/snowball/ext/SerbianStemmer.java``).  Cyrillic-to-Latin
# fold, ijekavian-to-ekavian prelude (C-ije-C / C-je-C -> e, dj -> đ),
# R1 with a vowel-or-syllabic-r mark, then one big morphological
# rewrite (Step_1, ungated), else an R1-gated rewrite (Step_2) or an
# R1-gated deletion (Step_3).  Cases marked True in the action maps
# require the word to carry NO diacritics (ć č đ š ž) anywhere.

_SR_STEP1 = (
    ("teticima", 21), ("centara", 69), ("kustava", 29), ("tvenici",
    20), ("atcima", 58), ("avilan", 35), ("centar", 69), ("inzima",
    19), ("istara", 70), ("jacima", 5), ("lozima", 1), ("metara",
    68), ("nicima", 23), ("nstava", 22), ("pesima", 2), ("pletan",
    50), ("pravan", 44), ("stavan", 43), ("tetici", 21), ("ticima",
    24), ("utcima", 62), ("voljan", 77), ("zicima", 25), ("acaka",
    55), ("ajaca", 12), ("ajaka", 16), ("alaca", 82), ("anaka", 78),
    ("anata", 53), ("anjac", 11), ("antan", 32), ("ataka", 58),
    ("ačaka", 54), ("bilan", 33), ("bojci", 4), ("cajan", 7),
    ("dusan", 31), ("dušan", 30), ("ejaca", 14), ("ekata", 86),
    ("elaca", 83), ("esama", 67), ("eskan", 63), ("etaka", 59),
    ("gilan", 37), ("istar", 70), ("itaka", 60), ("izama", 87),
    ("kusan", 28), ("laran", 9), ("ljaca", 13), ("metar", 68),
    ("nilan", 39), ("njaca", 85), ("ojaca", 15), ("ojaka", 17),
    ("ojsci", 66), ("olaca", 84), ("otaka", 61), ("rilan", 38),
    ("silan", 36), ("sivan", 46), ("snici", 26), ("tetan", 49),
    ("tican", 65), ("tilan", 34), ("tivan", 45), ("tičan", 64),
    ("utaka", 62), ("vojci", 3), ("čajan", 6), ("čcima", 74),
    ("acak", 55), ("ajac", 12), ("alac", 82), ("alan", 40), ("aoca",
    82), ("asan", 91), ("atak", 58), ("atan", 47), ("atci", 58),
    ("ačak", 54), ("ašan", 90), ("baci", 89), ("daba", 73), ("ejac",
    14), ("ekat", 86), ("elac", 83), ("enat", 48), ("eran", 8),
    ("esan", 10), ("etak", 59), ("inzi", 19), ("itak", 60), ("itci",
    60), ("izam", 87), ("jaci", 5), ("jebe", 88), ("kuse", 27),
    ("ljac", 13), ("lozi", 1), ("maca", 75), ("naca", 76), ("njac",
    85), ("ojac", 15), ("olac", 84), ("olce", 84), ("oscu", 72),
    ("otak", 61), ("ozan", 41), ("ošću", 71), ("pesi", 2), ("raca",
    81), ("rave", 42), ("saca", 80), ("save", 52), ("usak", 57),
    ("utak", 62), ("utci", 62), ("ušak", 56), ("vaca", 79), ("šaca",
    18), ("šave", 51), ("mac", 75), ("nac", 76), ("rac", 81),
    ("sac", 80), ("vac", 79), ("čci", 74), ("šac", 18))
_SR_STEP2 = (
    ("astadosmo", 110), ("astadoste", 110), ("astajasmo", 106),
    ("astajaste", 106), ("evitijega", 92), ("evitijemu", 92),
    ("evitijima", 92), ("istadosmo", 111), ("istadoste", 111),
    ("istajasmo", 107), ("istajaste", 107), ("ostadosmo", 112),
    ("ostadoste", 112), ("ostajasmo", 108), ("ostajaste", 108),
    ("ovitijega", 93), ("ovitijemu", 93), ("ovitijima", 93),
    ("anjijega", 84), ("anjijemu", 84), ("anjijima", 84),
    ("astademo", 110), ("astadete", 110), ("astadose", 141),
    ("astadoše", 110), ("astajahu", 106), ("astajala", 106),
    ("astajale", 106), ("astajali", 106), ("astajalo", 106),
    ("astajase", 138), ("astajati", 106), ("astajaše", 106),
    ("astajemo", 106), ("astajete", 106), ("astajuci", 138),
    ("astajući", 106), ("astanemo", 110), ("astanete", 110),
    ("astanila", 110), ("astanimo", 110), ("astanite", 110),
    ("astijega", 94), ("astijemu", 94), ("astijima", 94),
    ("cajevima", 26), ("enjijega", 85), ("enjijemu", 85),
    ("enjijima", 85), ("evitijeg", 92), ("evitijem", 92),
    ("evitijih", 92), ("evitijim", 92), ("evitijoj", 92),
    ("ganijama", 9), ("ganijima", 9), ("istademo", 111),
    ("istadete", 111), ("istadose", 142), ("istadoše", 111),
    ("istajahu", 107), ("istajala", 107), ("istajale", 107),
    ("istajali", 107), ("istajalo", 107), ("istajase", 139),
    ("istajati", 107), ("istajaše", 107), ("istajemo", 107),
    ("istajete", 107), ("istajuci", 139), ("istajući", 107),
    ("istanemo", 111), ("istanete", 111), ("istanila", 111),
    ("istanimo", 111), ("istanite", 111), ("lajevima", 30),
    ("lucujemo", 121), ("lucujete", 121), ("lucujuci", 121),
    ("lučujemo", 117), ("lučujete", 117), ("lučujući", 117),
    ("manijama", 6), ("manijima", 6), ("ostademo", 112),
    ("ostadete", 112), ("ostadose", 143), ("ostadoše", 112),
    ("ostajahu", 108), ("ostajala", 108), ("ostajale", 108),
    ("ostajali", 108), ("ostajalo", 108), ("ostajase", 140),
    ("ostajati", 108), ("ostajaše", 108), ("ostajemo", 108),
    ("ostajete", 108), ("ostajuci", 140), ("ostajući", 108),
    ("ostanemo", 112), ("ostanete", 112), ("ostanila", 112),
    ("ostanimo", 112), ("ostanite", 112), ("ovitijeg", 93),
    ("ovitijem", 93), ("ovitijih", 93), ("ovitijim", 93),
    ("ovitijoj", 93), ("panijama", 7), ("panijima", 7), ("rajevima",
    31), ("ranijama", 8), ("ranijima", 8), ("snjijega", 122),
    ("snjijemu", 122), ("snjijima", 122), ("tanijama", 5),
    ("tanijima", 5), ("ćajevima", 28), ("čajevima", 27),
    ("đajevima", 29), ("šnjijega", 86), ("šnjijemu", 86),
    ("šnjijima", 86), ("ajevima", 109), ("anjijeg", 84), ("anjijem",
    84), ("anjijih", 84), ("anjijim", 84), ("anjijoj", 84),
    ("astadem", 110), ("astades", 141), ("astadeš", 110),
    ("astadoh", 110), ("astajah", 106), ("astajao", 106),
    ("astajat", 106), ("astajem", 106), ("astajes", 138),
    ("astaješ", 106), ("astajmo", 106), ("astajte", 106),
    ("astanem", 110), ("astanes", 141), ("astaneš", 110),
    ("astavsi", 141), ("astavši", 110), ("astijeg", 94), ("astijem",
    94), ("astijih", 94), ("astijim", 94), ("astijoj", 94),
    ("atijega", 120), ("atijemu", 120), ("atijima", 120),
    ("avajuci", 144), ("avajući", 97), ("avijega", 77), ("avijemu",
    77), ("avijima", 77), ("elijega", 83), ("elijemu", 83),
    ("elijima", 83), ("enjijeg", 85), ("enjijem", 85), ("enjijih",
    85), ("enjijim", 85), ("enjijoj", 85), ("evajuci", 145),
    ("evajući", 96), ("evijega", 78), ("evijemu", 78), ("evijima",
    78), ("evitega", 92), ("evitemu", 92), ("evitija", 92),
    ("evitije", 92), ("evitiji", 92), ("evitima", 92), ("evitoga",
    92), ("evitome", 92), ("evitomu", 92), ("ganijom", 9),
    ("ijalama", 47), ("ijalima", 47), ("ikatima", 68), ("injasmo",
    114), ("injaste", 114), ("irajuci", 155), ("irajući", 100),
    ("irujemo", 100), ("irujete", 100), ("irujuci", 155),
    ("irujući", 100), ("istadem", 111), ("istades", 142),
    ("istadeš", 111), ("istadoh", 111), ("istajah", 107),
    ("istajao", 107), ("istajat", 107), ("istajem", 107),
    ("istajes", 139), ("istaješ", 107), ("istajmo", 107),
    ("istajte", 107), ("istanem", 111), ("istanes", 142),
    ("istaneš", 111), ("istavsi", 142), ("istavši", 111),
    ("ivajuci", 146), ("ivajući", 98), ("ivijega", 79), ("ivijemu",
    79), ("ivijima", 79), ("jetismo", 118), ("jetiste", 118),
    ("lucismo", 121), ("luciste", 121), ("lucujem", 121),
    ("lucujes", 121), ("lucujmo", 121), ("lucujte", 121),
    ("lučismo", 117), ("lučiste", 117), ("lučujem", 117),
    ("lučuješ", 117), ("lučujmo", 117), ("lučujte", 117),
    ("manijom", 6), ("olovima", 49), ("onovima", 12), ("osijega",
    123), ("osijemu", 123), ("osijima", 123), ("ostadem", 112),
    ("ostades", 143), ("ostadeš", 112), ("ostadoh", 112),
    ("ostajah", 108), ("ostajao", 108), ("ostajat", 108),
    ("ostajem", 108), ("ostajes", 140), ("ostaješ", 108),
    ("ostajmo", 108), ("ostajte", 108), ("ostanem", 112),
    ("ostanes", 143), ("ostaneš", 112), ("ostavsi", 143),
    ("ostavši", 112), ("ovijega", 80), ("ovijemu", 80), ("ovijima",
    80), ("ovitega", 93), ("ovitemu", 93), ("ovitija", 93),
    ("ovitije", 93), ("ovitiji", 93), ("ovitima", 93), ("ovitoga",
    93), ("ovitome", 93), ("ovitomu", 93), ("ozilima", 48),
    ("ošijega", 91), ("ošijemu", 91), ("ošijima", 91), ("panijom",
    7), ("ranijom", 8), ("rarijem", 21), ("rosismo", 127),
    ("rosiste", 127), ("rosivsi", 127), ("rošismo", 90), ("rošiste",
    90), ("rošivši", 90), ("skijega", 1), ("skijemu", 1),
    ("skijima", 1), ("snjijeg", 122), ("snjijem", 123), ("snjijih",
    122), ("snjijim", 122), ("snjijoj", 122), ("tanijom", 5),
    ("ugovima", 17), ("urajuci", 156), ("urajući", 105), ("uvajuci",
    147), ("uvajući", 99), ("škijega", 2), ("škijemu", 2),
    ("škijima", 2), ("šnjijeg", 86), ("šnjijem", 86), ("šnjijih",
    86), ("šnjijim", 86), ("šnjijoj", 86), ("acasmo", 128),
    ("acaste", 128), ("acavsi", 128), ("acismo", 124), ("aciste",
    124), ("aninom", 10), ("anjega", 84), ("anjemu", 84), ("anjija",
    84), ("anjije", 84), ("anjiji", 84), ("anjiju", 84), ("anjima",
    84), ("anjoga", 84), ("anjome", 84), ("anjomu", 84), ("astade",
    110), ("astadu", 110), ("astaje", 106), ("astaju", 106),
    ("astala", 110), ("astale", 110), ("astali", 110), ("astalo",
    110), ("astane", 110), ("astanu", 110), ("astati", 110),
    ("astega", 94), ("astemo", 115), ("astemu", 94), ("astete",
    115), ("astija", 94), ("astije", 94), ("astiji", 94), ("astima",
    94), ("astimo", 115), ("astite", 115), ("astoga", 94),
    ("astome", 94), ("astomu", 94), ("astuci", 136), ("astući",
    115), ("atijeg", 120), ("atijem", 120), ("atijih", 120),
    ("atijim", 120), ("avajmo", 97), ("avajte", 97), ("avasmo", 97),
    ("avaste", 97), ("avijeg", 77), ("avijem", 77), ("avijih", 77),
    ("avijim", 77), ("avijoj", 77), ("ačasmo", 102), ("ačaste",
    102), ("ačavši", 102), ("ačismo", 101), ("ačiste", 101),
    ("basama", 135), ("basima", 135), ("bašama", 63), ("bašima",
    63), ("bijama", 32), ("bijima", 32), ("cajama", 26), ("cajeva",
    26), ("cajeve", 26), ("cajevi", 26), ("cajima", 26), ("cijama",
    33), ("cijima", 33), ("cinama", 137), ("cinima", 137),
    ("cinoga", 137), ("cinome", 137), ("cinomu", 137), ("dijama",
    34), ("dijima", 34), ("elijeg", 83), ("elijem", 83), ("elijih",
    83), ("elijim", 83), ("elijoj", 83), ("enjega", 85), ("enjemu",
    85), ("enjija", 85), ("enjije", 85), ("enjiji", 85), ("enjiju",
    85), ("enjima", 85), ("enjoga", 85), ("enjome", 85), ("enjomu",
    85), ("estama", 71), ("estima", 71), ("etavsi", 153), ("etavši",
    70), ("evajmo", 96), ("evajte", 96), ("evasmo", 96), ("evaste",
    96), ("evijeg", 78), ("evijem", 78), ("evijih", 78), ("evijim",
    78), ("evijoj", 78), ("evitem", 92), ("evitih", 92), ("evitim",
    92), ("evitog", 92), ("evitoj", 92), ("evitom", 92), ("fijama",
    40), ("fijima", 40), ("ganija", 9), ("ganije", 9), ("ganiji",
    9), ("ganiju", 9), ("gasama", 131), ("gasima", 131), ("gašama",
    64), ("gašima", 64), ("gijama", 39), ("gijima", 39), ("govima",
    20), ("ijalom", 47), ("ikatom", 68), ("injahu", 114), ("injala",
    114), ("injale", 114), ("injali", 114), ("injalo", 114),
    ("injase", 150), ("injati", 114), ("injaše", 114), ("injemo",
    114), ("injete", 114), ("irasmo", 100), ("iraste", 100),
    ("iravsi", 155), ("iravši", 100), ("irivat", 100), ("irujem",
    100), ("irujes", 155), ("iruješ", 100), ("irujmo", 100),
    ("irujte", 100), ("istade", 111), ("istadu", 111), ("istaje",
    107), ("istaju", 107), ("istala", 111), ("istale", 111),
    ("istali", 111), ("istalo", 111), ("istama", 72), ("istane",
    111), ("istanu", 111), ("istati", 111), ("istima", 72),
    ("ivajmo", 98), ("ivajte", 98), ("ivasmo", 98), ("ivaste", 98),
    ("ivijeg", 79), ("ivijem", 79), ("ivijih", 79), ("ivijim", 79),
    ("ivijoj", 79), ("ištima", 75), ("jasama", 129), ("jasima",
    129), ("jašama", 61), ("jašima", 61), ("jetila", 118),
    ("jetile", 118), ("jetili", 118), ("jetilo", 118), ("jetimo",
    118), ("jetise", 149), ("jetite", 118), ("jetiti", 118),
    ("jetiše", 118), ("kasama", 133), ("kasima", 133), ("kašama",
    62), ("kašima", 62), ("kijega", 95), ("kijemu", 95), ("kijima",
    95), ("kstama", 73), ("kstima", 73), ("lajama", 30), ("lajeva",
    30), ("lajeve", 30), ("lajevi", 30), ("lajima", 30), ("latima",
    69), ("lemama", 51), ("lemima", 51), ("lijama", 35), ("lijima",
    35), ("logama", 19), ("lovima", 82), ("lucena", 121), ("lucene",
    121), ("luceni", 121), ("luceno", 121), ("lucila", 121),
    ("lucile", 121), ("lucili", 121), ("lucilo", 121), ("lucimo",
    121), ("lucise", 121), ("lucite", 121), ("luciti", 121),
    ("lucuje", 121), ("lucuju", 121), ("lučena", 117), ("lučene",
    117), ("lučeni", 117), ("lučeno", 117), ("lučila", 117),
    ("lučile", 117), ("lučili", 117), ("lučilo", 117), ("lučimo",
    117), ("lučite", 117), ("lučiti", 117), ("lučiše", 117),
    ("lučuje", 117), ("lučuju", 117), ("manija", 6), ("manije", 6),
    ("maniji", 6), ("maniju", 6), ("mijama", 37), ("mijima", 37),
    ("movima", 81), ("nalama", 46), ("nalima", 46), ("nasama", 132),
    ("nasima", 132), ("našama", 60), ("našima", 60), ("nijama", 36),
    ("nijega", 13), ("nijemu", 13), ("nijima", 13), ("osijeg", 123),
    ("osijem", 123), ("osijih", 123), ("osijim", 123), ("osijoj",
    123), ("ostade", 112), ("ostadu", 112), ("ostaje", 108),
    ("ostaju", 108), ("ostala", 112), ("ostale", 112), ("ostali",
    112), ("ostalo", 112), ("ostama", 74), ("ostane", 112),
    ("ostanu", 112), ("ostati", 112), ("ostima", 74), ("otijem",
    22), ("ovasmo", 76), ("ovaste", 76), ("ovijeg", 80), ("ovijem",
    80), ("ovijih", 80), ("ovijim", 80), ("ovijoj", 80), ("ovitem",
    93), ("ovitih", 93), ("ovitim", 93), ("ovitog", 93), ("ovitoj",
    93), ("ovitom", 93), ("ozilom", 48), ("ošijeg", 91), ("ošijem",
    91), ("ošijih", 91), ("ošijim", 91), ("ošijoj", 91), ("panija",
    7), ("panije", 7), ("paniji", 7), ("paniju", 7), ("pijama", 41),
    ("pijima", 41), ("rajama", 31), ("rajeva", 31), ("rajeve", 31),
    ("rajevi", 31), ("rajima", 31), ("ramama", 52), ("ranija", 8),
    ("ranije", 8), ("raniji", 8), ("raniju", 8), ("rarija", 21),
    ("rariju", 21), ("rijama", 42), ("rijima", 42), ("rosila", 127),
    ("rosile", 127), ("rosili", 127), ("rosilo", 127), ("rosimo",
    127), ("rosise", 127), ("rosite", 127), ("rositi", 127),
    ("rošila", 90), ("rošile", 90), ("rošili", 90), ("rošilo", 90),
    ("rošimo", 90), ("rošite", 90), ("rošiti", 90), ("rošiše", 90),
    ("sijama", 43), ("sijima", 43), ("skijeg", 1), ("skijem", 1),
    ("skijih", 1), ("skijim", 1), ("skijoj", 1), ("snjega", 122),
    ("snjemu", 122), ("snjija", 122), ("snjije", 122), ("snjiji",
    122), ("snjiju", 122), ("snjima", 122), ("snjoga", 122),
    ("snjome", 122), ("snjomu", 122), ("stvima", 3), ("tanija", 5),
    ("tanije", 5), ("taniji", 5), ("taniju", 5), ("tasama", 130),
    ("tasima", 130), ("tašama", 59), ("tašima", 59), ("tijama", 44),
    ("tijima", 44), ("urajmo", 105), ("urajte", 105), ("urasmo",
    105), ("uraste", 105), ("uvajmo", 99), ("uvajte", 99),
    ("uvasmo", 99), ("uvaste", 99), ("vasama", 134), ("vasima",
    134), ("vašama", 65), ("vašima", 65), ("zijama", 45), ("zijima",
    45), ("ćajama", 28), ("ćajeva", 28), ("ćajeve", 28), ("ćajevi",
    28), ("ćajima", 28), ("čajama", 27), ("čajeva", 27), ("čajeve",
    27), ("čajevi", 27), ("čajima", 27), ("činama", 89), ("činima",
    89), ("činoga", 89), ("činome", 89), ("činomu", 89), ("đajama",
    29), ("đajeva", 29), ("đajeve", 29), ("đajevi", 29), ("đajima",
    29), ("škijeg", 2), ("škijem", 2), ("škijih", 2), ("škijim", 2),
    ("škijoj", 2), ("šnjega", 86), ("šnjemu", 86), ("šnjija", 86),
    ("šnjije", 86), ("šnjiji", 86), ("šnjiju", 86), ("šnjima", 86),
    ("šnjoga", 86), ("šnjome", 86), ("šnjomu", 86), ("štvima", 4),
    ("žijama", 38), ("žijima", 38), ("acahu", 128), ("acaju", 128),
    ("acala", 128), ("acale", 128), ("acali", 128), ("acalo", 128),
    ("acamo", 128), ("acana", 128), ("acane", 128), ("acani", 128),
    ("acano", 128), ("acase", 128), ("acate", 128), ("acati", 128),
    ("aceci", 124), ("acega", 124), ("acemu", 124), ("acena", 124),
    ("acene", 124), ("aceni", 124), ("aceno", 124), ("acila", 124),
    ("acile", 124), ("acili", 124), ("acilo", 124), ("acima", 124),
    ("acimo", 124), ("acise", 124), ("acite", 124), ("aciti", 124),
    ("acoga", 124), ("acome", 124), ("acomu", 124), ("ajama", 109),
    ("ajeva", 109), ("ajeve", 109), ("ajevi", 109), ("ajima", 109),
    ("ajuci", 161), ("ajući", 104), ("alama", 104), ("alima", 104),
    ("anega", 10), ("anemu", 10), ("anima", 10), ("anina", 10),
    ("anine", 10), ("aninu", 10), ("anjeg", 84), ("anjem", 84),
    ("anjih", 84), ("anjim", 84), ("anjog", 84), ("anjoj", 84),
    ("anjom", 84), ("arama", 53), ("arima", 53), ("astao", 110),
    ("astat", 110), ("astem", 94), ("astes", 136), ("asteš", 115),
    ("astih", 94), ("astim", 94), ("astog", 94), ("astoj", 94),
    ("astom", 94), ("atega", 120), ("atemu", 120), ("atija", 120),
    ("atije", 120), ("atiji", 120), ("atiju", 120), ("atima", 120),
    ("atoga", 120), ("atome", 120), ("atomu", 120), ("avahu", 97),
    ("avaju", 97), ("avala", 97), ("avale", 97), ("avali", 97),
    ("avalo", 97), ("avama", 77), ("avamo", 97), ("avana", 97),
    ("avane", 97), ("avani", 97), ("avano", 97), ("avase", 144),
    ("avate", 97), ("avati", 97), ("avaše", 97), ("avega", 77),
    ("avemu", 77), ("avija", 77), ("avije", 77), ("aviji", 77),
    ("aviju", 77), ("avima", 77), ("avoga", 77), ("avome", 77),
    ("avomu", 77), ("aćega", 14), ("aćemu", 14), ("aćima", 14),
    ("aćoga", 14), ("aćome", 14), ("aćomu", 14), ("ačahu", 102),
    ("ačaju", 102), ("ačala", 102), ("ačale", 102), ("ačali", 102),
    ("ačalo", 102), ("ačamo", 102), ("ačana", 102), ("ačane", 102),
    ("ačani", 102), ("ačano", 102), ("ačate", 102), ("ačati", 102),
    ("ačaše", 102), ("ačena", 101), ("ačene", 101), ("ačeni", 101),
    ("ačeno", 101), ("ačeći", 101), ("ačila", 101), ("ačile", 101),
    ("ačili", 101), ("ačilo", 101), ("ačimo", 101), ("ačite", 101),
    ("ačiti", 101), ("ačiše", 101), ("basem", 135), ("basom", 135),
    ("bašem", 63), ("bašom", 63), ("bijom", 32), ("cajem", 26),
    ("cijom", 33), ("cinih", 137), ("cinim", 137), ("cinog", 137),
    ("cinoj", 137), ("cinom", 137), ("dijom", 34), ("drama", 54),
    ("drima", 54), ("ecega", 125), ("ecemu", 125), ("ecima", 125),
    ("ecoga", 125), ("ecome", 125), ("ecomu", 125), ("elama", 119),
    ("elega", 83), ("elemu", 83), ("elija", 83), ("elije", 83),
    ("eliji", 83), ("eliju", 83), ("elima", 83), ("eloga", 83),
    ("elome", 83), ("elomu", 83), ("enega", 87), ("enemu", 87),
    ("enjeg", 85), ("enjem", 85), ("enjih", 85), ("enjim", 85),
    ("enjog", 85), ("enjoj", 85), ("enjom", 85), ("erama", 55),
    ("erima", 55), ("esama", 152), ("esima", 57), ("estom", 71),
    ("etama", 70), ("etemo", 70), ("etima", 70), ("etimo", 70),
    ("etuci", 153), ("etući", 70), ("evahu", 96), ("evaju", 96),
    ("evala", 96), ("evale", 96), ("evali", 96), ("evalo", 96),
    ("evama", 78), ("evamo", 96), ("evana", 96), ("evane", 96),
    ("evani", 96), ("evano", 96), ("evase", 145), ("evate", 96),
    ("evati", 96), ("evaše", 96), ("evega", 78), ("evemu", 78),
    ("evija", 78), ("evije", 78), ("eviji", 78), ("eviju", 78),
    ("evima", 78), ("evita", 92), ("evite", 92), ("eviti", 92),
    ("evito", 92), ("evitu", 92), ("evoga", 78), ("evome", 78),
    ("evomu", 78), ("ećega", 15), ("ećemu", 15), ("ećima", 15),
    ("ećoga", 15), ("ećome", 15), ("ećomu", 15), ("ešama", 66),
    ("ešima", 66), ("fijom", 40), ("gasem", 131), ("gasom", 131),
    ("gašem", 64), ("gašom", 64), ("gijom", 39), ("ijala", 47),
    ("ijale", 47), ("ijali", 47), ("ijalo", 47), ("ijalu", 47),
    ("ijemo", 116), ("ijete", 116), ("ikata", 68), ("ikate", 68),
    ("ikati", 68), ("ikato", 68), ("ikatu", 68), ("ilama", 116),
    ("ilima", 116), ("inama", 11), ("inima", 11), ("injah", 114),
    ("injao", 114), ("injat", 114), ("injem", 114), ("injes", 150),
    ("inješ", 114), ("irahu", 100), ("iraju", 100), ("irala", 100),
    ("irale", 100), ("irali", 100), ("iralo", 100), ("iramo", 100),
    ("irase", 155), ("irate", 100), ("irati", 100), ("iraše", 100),
    ("iruje", 100), ("iruju", 100), ("isama", 154), ("isima", 58),
    ("istao", 111), ("istat", 111), ("istem", 151), ("istom", 72),
    ("ivahu", 98), ("ivaju", 98), ("ivala", 98), ("ivale", 98),
    ("ivali", 98), ("ivalo", 98), ("ivama", 79), ("ivamo", 98),
    ("ivana", 98), ("ivane", 98), ("ivani", 98), ("ivano", 98),
    ("ivase", 146), ("ivate", 98), ("ivati", 98), ("ivaše", 98),
    ("ivega", 79), ("ivemu", 79), ("ivija", 79), ("ivije", 79),
    ("iviji", 79), ("iviju", 79), ("ivima", 79), ("ivoga", 79),
    ("ivome", 79), ("ivomu", 79), ("išama", 67), ("išima", 67),
    ("ištem", 75), ("jasem", 129), ("jasom", 129), ("jašem", 61),
    ("jašom", 61), ("jetih", 118), ("jetim", 118), ("jetio", 118),
    ("jetis", 149), ("jetit", 118), ("jetiš", 118), ("kasem", 133),
    ("kasom", 133), ("kašem", 62), ("kašom", 62), ("kijeg", 95),
    ("kijem", 95), ("kijih", 95), ("kijim", 95), ("kijoj", 95),
    ("kstom", 73), ("lajem", 30), ("latom", 69), ("lemom", 51),
    ("lijem", 24), ("lijom", 35), ("logom", 19), ("lovom", 82),
    ("lucen", 121), ("lucih", 121), ("lucim", 121), ("lucio", 121),
    ("lucis", 121), ("lucit", 121), ("lucuj", 121), ("lučen", 117),
    ("lučih", 117), ("lučim", 117), ("lučio", 117), ("lučit", 117),
    ("lučiš", 117), ("lučuj", 117), ("mijom", 37), ("movom", 81),
    ("nalom", 46), ("nasem", 132), ("nasom", 132), ("našem", 60),
    ("našom", 60), ("nijeg", 13), ("nijem", 13), ("nijih", 13),
    ("nijim", 13), ("nijoj", 13), ("nijom", 36), ("nismo", 103),
    ("niste", 103), ("nivsi", 158), ("nivši", 103), ("nusmo", 13),
    ("nuste", 13), ("nuvsi", 164), ("nuvši", 13), ("olima", 50),
    ("olova", 49), ("olove", 49), ("olovi", 49), ("onima", 12),
    ("onova", 12), ("onove", 12), ("onovi", 12), ("orama", 56),
    ("orima", 56), ("osega", 123), ("osemu", 123), ("osija", 123),
    ("osije", 123), ("osiji", 123), ("osiju", 123), ("osima", 123),
    ("osoga", 123), ("osome", 123), ("osomu", 123), ("ostao", 112),
    ("ostat", 112), ("ostom", 74), ("otija", 22), ("otiju", 22),
    ("ovahu", 76), ("ovala", 76), ("ovale", 76), ("ovali", 76),
    ("ovalo", 76), ("ovase", 148), ("ovati", 76), ("ovaše", 76),
    ("ovega", 80), ("ovemu", 80), ("ovija", 80), ("ovije", 80),
    ("oviji", 80), ("oviju", 80), ("ovima", 80), ("ovita", 93),
    ("ovite", 93), ("oviti", 93), ("ovito", 93), ("ovitu", 93),
    ("ovoga", 80), ("ovome", 80), ("ovomu", 80), ("ozila", 48),
    ("ozile", 48), ("ozili", 48), ("ozilu", 48), ("ošega", 91),
    ("ošemu", 91), ("ošija", 91), ("ošije", 91), ("ošiji", 91),
    ("ošiju", 91), ("ošima", 91), ("ošoga", 91), ("ošome", 91),
    ("ošomu", 91), ("pijom", 41), ("rajem", 31), ("ramom", 52),
    ("rario", 21), ("rijom", 42), ("rosih", 127), ("rosim", 127),
    ("rosio", 127), ("rosis", 127), ("rosit", 127), ("roših", 90),
    ("rošim", 90), ("rošio", 90), ("rošit", 90), ("rošiš", 90),
    ("sijem", 23), ("sijom", 43), ("skega", 1), ("skemu", 1),
    ("skija", 1), ("skije", 1), ("skiji", 1), ("skima", 1),
    ("skoga", 1), ("skome", 1), ("skomu", 1), ("snega", 159),
    ("snemu", 159), ("snjeg", 122), ("snjem", 122), ("snjih", 122),
    ("snjim", 122), ("snjog", 122), ("snjoj", 122), ("snjom", 122),
    ("stvom", 3), ("tajmo", 113), ("tajte", 113), ("tasem", 130),
    ("tasmo", 113), ("tasom", 130), ("taste", 113), ("tavsi", 160),
    ("tavši", 113), ("tašem", 59), ("tašom", 59), ("tijom", 44),
    ("ucega", 126), ("ucemu", 126), ("ucima", 126), ("ucoga", 126),
    ("ucome", 126), ("ucomu", 126), ("ugama", 18), ("ugova", 17),
    ("ugove", 17), ("ugovi", 17), ("ujemo", 25), ("ujete", 25),
    ("ujuci", 157), ("ujući", 25), ("urahu", 105), ("uraju", 105),
    ("urala", 105), ("urale", 105), ("urali", 105), ("uralo", 105),
    ("uramo", 105), ("urana", 105), ("urane", 105), ("urani", 105),
    ("urano", 105), ("urase", 156), ("urate", 105), ("urati", 105),
    ("uraše", 105), ("uvahu", 99), ("uvaju", 99), ("uvala", 99),
    ("uvale", 99), ("uvali", 99), ("uvalo", 99), ("uvamo", 99),
    ("uvana", 99), ("uvane", 99), ("uvani", 99), ("uvano", 99),
    ("uvase", 147), ("uvate", 99), ("uvati", 99), ("uvaše", 99),
    ("ućega", 16), ("ućemu", 16), ("ućima", 16), ("ućoga", 16),
    ("ućome", 16), ("ućomu", 16), ("vasem", 134), ("vasom", 134),
    ("vašem", 65), ("vašom", 65), ("zijom", 45), ("ćajem", 28),
    ("čajem", 27), ("činih", 89), ("činim", 89), ("činog", 89),
    ("činoj", 89), ("činom", 89), ("đajem", 29), ("škega", 2),
    ("škemu", 2), ("škija", 2), ("škije", 2), ("škiji", 2),
    ("škima", 2), ("škoga", 2), ("škome", 2), ("škomu", 2),
    ("šnega", 88), ("šnemu", 88), ("šnjeg", 86), ("šnjem", 86),
    ("šnjih", 86), ("šnjim", 86), ("šnjog", 86), ("šnjoj", 86),
    ("šnjom", 86), ("štvom", 4), ("žijom", 38), ("acah", 128),
    ("acam", 128), ("acan", 128), ("acao", 128), ("acas", 128),
    ("acat", 128), ("aceg", 124), ("acem", 124), ("acen", 124),
    ("acih", 124), ("acim", 124), ("acio", 124), ("acis", 124),
    ("acit", 124), ("acog", 124), ("acoj", 124), ("acom", 124),
    ("acuh", 124), ("ajem", 104), ("ajmo", 104), ("ajte", 104),
    ("aloj", 104), ("alom", 104), ("aneg", 10), ("anem", 10),
    ("anin", 10), ("anja", 84), ("anje", 84), ("anji", 84), ("anjo",
    84), ("anju", 84), ("anom", 10), ("arom", 53), ("asla", 115),
    ("asle", 115), ("asli", 115), ("aslo", 115), ("asmo", 104),
    ("asta", 94), ("aste", 94), ("asti", 94), ("asto", 94), ("astu",
    94), ("ateg", 120), ("atem", 120), ("atih", 120), ("atim", 120),
    ("atog", 120), ("atoj", 120), ("atom", 120), ("avah", 97),
    ("avaj", 97), ("avam", 97), ("avan", 97), ("avao", 97), ("avas",
    144), ("avat", 97), ("avav", 97), ("avaš", 97), ("aveg", 77),
    ("avem", 77), ("avih", 77), ("avim", 77), ("avog", 77), ("avoj",
    77), ("avom", 77), ("avsi", 161), ("avši", 104), ("aćeg", 14),
    ("aćem", 14), ("aćih", 14), ("aćim", 14), ("aćog", 14), ("aćoj",
    14), ("aćom", 14), ("aćuh", 14), ("ačah", 102), ("ačam", 102),
    ("ačan", 102), ("ačao", 102), ("ačat", 102), ("ačaš", 102),
    ("ačen", 101), ("ačih", 101), ("ačim", 101), ("ačio", 101),
    ("ačit", 101), ("ačiš", 101), ("basa", 135), ("base", 135),
    ("basi", 135), ("basu", 135), ("baša", 63), ("baše", 63),
    ("baši", 63), ("bašu", 63), ("bija", 32), ("bije", 32), ("biji",
    32), ("bijo", 32), ("biju", 32), ("caja", 26), ("caje", 26),
    ("caji", 26), ("caju", 26), ("cija", 33), ("cije", 33), ("ciji",
    33), ("cijo", 33), ("ciju", 33), ("cina", 137), ("cine", 137),
    ("cini", 137), ("cino", 137), ("cinu", 137), ("dija", 34),
    ("dije", 34), ("diji", 34), ("dijo", 34), ("diju", 34), ("drom",
    54), ("eceg", 125), ("ecem", 125), ("ecih", 125), ("ecim", 125),
    ("ecog", 125), ("ecoj", 125), ("ecom", 125), ("ecuh", 125),
    ("eleg", 83), ("elem", 83), ("elih", 83), ("elim", 83), ("elog",
    83), ("eloj", 83), ("elom", 83), ("eneg", 87), ("enem", 87),
    ("enja", 85), ("enje", 85), ("enji", 85), ("enjo", 85), ("enju",
    85), ("erom", 55), ("esem", 152), ("esom", 57), ("esta", 71),
    ("este", 71), ("esti", 71), ("esto", 71), ("estu", 71), ("etem",
    70), ("etes", 153), ("eteš", 70), ("etom", 70), ("evah", 96),
    ("evaj", 96), ("evam", 96), ("evan", 96), ("evao", 96), ("evas",
    145), ("evat", 96), ("evav", 96), ("evaš", 96), ("eveg", 78),
    ("evem", 78), ("evih", 78), ("evim", 78), ("evog", 78), ("evoj",
    78), ("evom", 78), ("ećeg", 15), ("ećem", 15), ("ećih", 15),
    ("ećim", 15), ("ećog", 15), ("ećoj", 15), ("ećom", 15), ("ećuh",
    15), ("ešem", 66), ("ešom", 66), ("fija", 40), ("fije", 40),
    ("fiji", 40), ("fijo", 40), ("fiju", 40), ("gama", 20), ("gasa",
    131), ("gase", 131), ("gasi", 131), ("gasu", 131), ("gaša", 64),
    ("gaše", 64), ("gaši", 64), ("gašu", 64), ("gija", 39), ("gije",
    39), ("giji", 39), ("gijo", 39), ("giju", 39), ("gova", 20),
    ("gove", 20), ("govi", 20), ("ieci", 162), ("ieći", 116),
    ("ijem", 116), ("ijes", 162), ("iješ", 116), ("ijmo", 116),
    ("ijte", 116), ("ilom", 116), ("inom", 11), ("irah", 100),
    ("iral", 100), ("iram", 100), ("iran", 100), ("irao", 100),
    ("iras", 155), ("irat", 100), ("iraš", 100), ("iruj", 100),
    ("isem", 154), ("ismo", 116), ("isom", 58), ("ista", 72),
    ("iste", 72), ("isti", 72), ("isto", 72), ("istu", 72), ("ivah",
    98), ("ivaj", 98), ("ivam", 98), ("ivan", 98), ("ivao", 98),
    ("ivas", 146), ("ivat", 98), ("ivav", 98), ("ivaš", 98),
    ("iveg", 79), ("ivem", 79), ("ivih", 79), ("ivim", 79), ("ivog",
    79), ("ivoj", 79), ("ivom", 79), ("ivsi", 162), ("ivši", 116),
    ("išem", 67), ("išom", 67), ("išta", 75), ("ište", 75), ("ištu",
    75), ("jasa", 129), ("jase", 129), ("jasi", 129), ("jasu", 129),
    ("jaša", 61), ("jaše", 61), ("jaši", 61), ("jašu", 61), ("kasa",
    133), ("kase", 133), ("kasi", 133), ("kasu", 133), ("kaša", 62),
    ("kaše", 62), ("kaši", 62), ("kašu", 62), ("kega", 95), ("kemu",
    95), ("kija", 95), ("kije", 95), ("kiji", 95), ("kiju", 95),
    ("kima", 95), ("koga", 95), ("kome", 95), ("komu", 95), ("ksta",
    73), ("kste", 73), ("ksti", 73), ("ksto", 73), ("kstu", 73),
    ("laja", 30), ("laje", 30), ("laji", 30), ("laju", 30), ("lata",
    69), ("late", 69), ("lati", 69), ("lato", 69), ("latu", 69),
    ("lema", 51), ("leme", 51), ("lemi", 51), ("lemo", 51), ("lemu",
    51), ("lija", 24), ("lije", 35), ("liji", 35), ("lijo", 35),
    ("liju", 24), ("loga", 19), ("loge", 19), ("logu", 19), ("lova",
    82), ("love", 82), ("lovi", 82), ("lovu", 82), ("luce", 121),
    ("luci", 121), ("luče", 117), ("luči", 117), ("mija", 37),
    ("mije", 37), ("miji", 37), ("mijo", 37), ("miju", 37), ("mova",
    81), ("move", 81), ("movi", 81), ("movu", 81), ("nala", 46),
    ("nale", 46), ("nali", 46), ("nalo", 46), ("nalu", 46), ("nasa",
    132), ("nase", 132), ("nasi", 132), ("nasu", 132), ("naša", 60),
    ("naše", 60), ("naši", 60), ("našu", 60), ("nega", 13), ("nemo",
    13), ("nemu", 13), ("nete", 13), ("nija", 13), ("nije", 13),
    ("niji", 13), ("nijo", 36), ("niju", 13), ("nila", 103),
    ("nile", 103), ("nili", 103), ("nilo", 103), ("nima", 13),
    ("nimo", 13), ("nite", 13), ("niti", 103), ("noga", 13),
    ("nome", 13), ("nomu", 13), ("nuci", 164), ("nula", 13),
    ("nule", 13), ("nuli", 13), ("nulo", 13), ("nuta", 13), ("nuti",
    13), ("nuto", 13), ("nući", 13), ("olom", 50), ("onom", 12),
    ("orom", 56), ("oseg", 123), ("osem", 123), ("osih", 123),
    ("osim", 123), ("osog", 123), ("osoj", 123), ("osom", 123),
    ("osta", 74), ("oste", 74), ("osti", 74), ("osto", 74), ("ostu",
    74), ("otio", 22), ("ovah", 76), ("ovao", 76), ("ovat", 76),
    ("oveg", 80), ("ovih", 80), ("ovim", 80), ("ovog", 80), ("ovoj",
    80), ("ovom", 80), ("ošeg", 91), ("ošem", 91), ("oših", 91),
    ("ošim", 91), ("ošog", 91), ("ošoj", 91), ("ošom", 91), ("pija",
    41), ("pije", 41), ("piji", 41), ("pijo", 41), ("piju", 41),
    ("raja", 31), ("raje", 31), ("raji", 31), ("raju", 31), ("rama",
    52), ("rame", 52), ("rami", 52), ("ramo", 52), ("ramu", 52),
    ("rija", 42), ("rije", 42), ("riji", 42), ("rijo", 42), ("riju",
    42), ("sija", 23), ("sije", 43), ("siji", 43), ("sijo", 43),
    ("siju", 23), ("skem", 1), ("skih", 1), ("skim", 1), ("skog",
    1), ("skoj", 1), ("skom", 1), ("sneg", 159), ("snem", 159),
    ("snja", 122), ("snje", 122), ("snji", 122), ("snjo", 122),
    ("snju", 122), ("stva", 3), ("stvo", 3), ("stvu", 3), ("taju",
    113), ("tala", 113), ("tale", 113), ("tali", 113), ("talo",
    113), ("tamo", 113), ("tana", 113), ("tane", 113), ("tani",
    113), ("tano", 113), ("tasa", 130), ("tase", 130), ("tasi",
    130), ("tasu", 130), ("tate", 113), ("tati", 113), ("taša", 59),
    ("taše", 59), ("taši", 59), ("tašu", 59), ("tija", 44), ("tije",
    44), ("tiji", 44), ("tijo", 44), ("tiju", 44), ("uceg", 126),
    ("ucem", 126), ("ucih", 126), ("ucim", 126), ("ucog", 126),
    ("ucoj", 126), ("ucom", 126), ("ucuh", 126), ("ugom", 18),
    ("ujem", 25), ("ujes", 157), ("uješ", 25), ("ujmo", 25),
    ("urah", 105), ("uraj", 105), ("ural", 105), ("uram", 105),
    ("uran", 105), ("urao", 105), ("uras", 156), ("urat", 105),
    ("uraš", 105), ("uvah", 99), ("uvaj", 99), ("uvam", 99),
    ("uvan", 99), ("uvao", 99), ("uvas", 147), ("uvat", 99),
    ("uvav", 99), ("uvaš", 99), ("ućeg", 16), ("ućem", 16), ("ućih",
    16), ("ućim", 16), ("ućog", 16), ("ućoj", 16), ("ućom", 16),
    ("ućuh", 16), ("vasa", 134), ("vase", 134), ("vasi", 134),
    ("vasu", 134), ("vaša", 65), ("vaše", 65), ("vaši", 65),
    ("vašu", 65), ("zija", 45), ("zije", 45), ("ziji", 45), ("zijo",
    45), ("ziju", 45), ("ćaja", 28), ("ćaje", 28), ("ćaji", 28),
    ("ćaju", 28), ("čaja", 27), ("čaje", 27), ("čaji", 27), ("čaju",
    27), ("čina", 89), ("čine", 89), ("čini", 89), ("čino", 89),
    ("činu", 89), ("đaja", 29), ("đaje", 29), ("đaji", 29), ("đaju",
    29), ("škem", 2), ("ških", 2), ("škim", 2), ("škog", 2),
    ("škoj", 2), ("škom", 2), ("šneg", 88), ("šnem", 88), ("šnja",
    86), ("šnje", 86), ("šnji", 86), ("šnjo", 86), ("šnju", 86),
    ("štva", 4), ("štvo", 4), ("štvu", 4), ("žija", 38), ("žije",
    38), ("žiji", 38), ("žijo", 38), ("žiju", 38), ("aca", 124),
    ("ace", 124), ("aci", 124), ("ahu", 104), ("aja", 109), ("aje",
    104), ("aji", 109), ("aju", 104), ("ala", 104), ("ale", 104),
    ("ali", 104), ("alo", 104), ("alu", 104), ("amo", 104), ("ana",
    10), ("ane", 10), ("ani", 10), ("ano", 104), ("anu", 10),
    ("ara", 53), ("are", 53), ("ari", 53), ("aru", 53), ("ase",
    161), ("ata", 120), ("ate", 104), ("ati", 104), ("ato", 120),
    ("atu", 120), ("ava", 77), ("ave", 77), ("avi", 77), ("avo",
    77), ("avu", 77), ("aća", 14), ("aće", 14), ("ače", 101),
    ("ači", 101), ("aše", 104), ("dra", 54), ("dre", 54), ("dri",
    54), ("dru", 54), ("eca", 125), ("ece", 125), ("ela", 83),
    ("ele", 83), ("eli", 83), ("elo", 83), ("elu", 83), ("emo",
    119), ("era", 55), ("ere", 55), ("eri", 55), ("eru", 55),
    ("esa", 57), ("ese", 57), ("esi", 152), ("esu", 57), ("eta",
    70), ("ete", 70), ("eti", 70), ("eto", 70), ("etu", 70), ("eva",
    78), ("eve", 78), ("evi", 78), ("evo", 78), ("evu", 78), ("eća",
    15), ("eće", 15), ("eša", 66), ("eše", 66), ("eši", 66), ("ešu",
    66), ("gom", 20), ("ije", 116), ("iju", 116), ("ila", 116),
    ("ile", 116), ("ili", 116), ("ilo", 116), ("ilu", 116), ("imo",
    116), ("ina", 11), ("ine", 11), ("ini", 11), ("ino", 11),
    ("inu", 11), ("isa", 58), ("ise", 58), ("isi", 154), ("isu",
    58), ("ite", 116), ("iti", 116), ("iva", 79), ("ive", 79),
    ("ivi", 79), ("ivo", 79), ("ivu", 79), ("iša", 67), ("iše", 67),
    ("iši", 67), ("išu", 67), ("keg", 95), ("kem", 95), ("kih", 95),
    ("kim", 95), ("kog", 95), ("koj", 95), ("kom", 95), ("kov", 95),
    ("lio", 24), ("neg", 13), ("nem", 13), ("nes", 164), ("neš",
    13), ("nih", 13), ("nim", 13), ("nio", 103), ("nis", 158),
    ("niš", 103), ("nog", 13), ("noj", 13), ("nom", 13), ("nuo",
    13), ("nut", 13), ("ola", 50), ("ole", 50), ("oli", 50), ("olu",
    50), ("ona", 12), ("one", 12), ("oni", 12), ("onu", 12), ("ora",
    56), ("ore", 56), ("ori", 56), ("oru", 56), ("osa", 123),
    ("ose", 123), ("osi", 123), ("osu", 123), ("ova", 80), ("ove",
    80), ("ovi", 80), ("ovo", 80), ("ovu", 80), ("oša", 91), ("oše",
    91), ("oši", 91), ("ošu", 91), ("sio", 23), ("ska", 1), ("ske",
    1), ("ski", 1), ("sko", 1), ("sku", 1), ("tah", 113), ("taj",
    113), ("tam", 113), ("tan", 113), ("tao", 113), ("tas", 160),
    ("tat", 113), ("taš", 113), ("uca", 126), ("uce", 126), ("uga",
    18), ("uge", 18), ("ugi", 18), ("ugo", 18), ("ugu", 18), ("uje",
    25), ("uju", 25), ("uća", 16), ("uće", 16), ("ška", 2), ("ške",
    2), ("ški", 2), ("ško", 2), ("šku", 2), ("ah", 104), ("aj",
    104), ("al", 104), ("am", 104), ("an", 104), ("ao", 104), ("as",
    161), ("at", 104), ("aš", 104), ("el", 119), ("em", 119), ("es",
    163), ("eš", 119), ("ga", 20), ("ge", 20), ("gi", 20), ("go",
    20), ("gu", 20), ("ih", 116), ("ij", 116), ("il", 116), ("im",
    116), ("io", 116), ("is", 162), ("it", 116), ("iš", 116), ("ka",
    95), ("ke", 95), ("ki", 95), ("ko", 95), ("ku", 95), ("na", 13),
    ("ne", 13), ("ni", 13), ("no", 13), ("nu", 13))
_SR_STEP3 = ('anih', 'anim', 'anog', 'anoj', 'enih', 'enim', 'enog', 'enoj', 'enom', 'ama', 'ani', 'ano', 'ena', 'eni', 'eno', 'enu', 'ima', 'oga', 'ost', 'og', 'om', 'a', 'e', 'i', 'o', 'u')
_SR_STEP1_ACT = {
    1: ("loga", False), 2: ("peh", False), 3: ("vojka", False), 4:
    ("bojka", False), 5: ("jak", False), 6: ("čajni", False), 7:
    ("cajni", True), 8: ("erni", False), 9: ("larni", False), 10:
    ("esni", False), 11: ("anjca", False), 12: ("ajca", False), 13:
    ("ljca", False), 14: ("ejca", False), 15: ("ojca", False), 16:
    ("ajka", False), 17: ("ojka", False), 18: ("šca", False), 19:
    ("ing", False), 20: ("tvenik", False), 21: ("tetika", False),
    22: ("nstva", False), 23: ("nik", False), 24: ("tik", False),
    25: ("zik", False), 26: ("snik", False), 27: ("kusi", False),
    28: ("kusni", False), 29: ("kustva", False), 30: ("dušni",
    False), 31: ("dusni", True), 32: ("antni", False), 33: ("bilni",
    False), 34: ("tilni", False), 35: ("avilni", False), 36:
    ("silni", False), 37: ("gilni", False), 38: ("rilni", False),
    39: ("nilni", False), 40: ("alni", False), 41: ("ozni", False),
    42: ("ravi", False), 43: ("stavni", False), 44: ("pravni",
    False), 45: ("tivni", False), 46: ("sivni", False), 47: ("atni",
    False), 48: ("enta", False), 49: ("tetni", False), 50:
    ("pletni", False), 51: ("šavi", False), 52: ("savi", True), 53:
    ("anta", False), 54: ("ačka", False), 55: ("acka", True), 56:
    ("uška", False), 57: ("uska", True), 58: ("atka", False), 59:
    ("etka", False), 60: ("itka", False), 61: ("otka", False), 62:
    ("utka", False), 63: ("eskna", False), 64: ("tični", False), 65:
    ("ticni", True), 66: ("ojska", False), 67: ("esma", False), 68:
    ("metra", False), 69: ("centra", False), 70: ("istra", False),
    71: ("osti", False), 72: ("osti", True), 73: ("dba", False), 74:
    ("čka", False), 75: ("mca", False), 76: ("nca", False), 77:
    ("voljni", False), 78: ("anki", False), 79: ("vca", False), 80:
    ("sca", False), 81: ("rca", False), 82: ("alca", False), 83:
    ("elca", False), 84: ("olca", False), 85: ("njca", False), 86:
    ("ekta", False), 87: ("izma", False), 88: ("jebi", False), 89:
    ("baci", False), 90: ("ašni", False), 91: ("asni", True)}
_SR_STEP2_ACT = {
    1: ("sk", False), 2: ("šk", False), 3: ("stv", False), 4:
    ("štv", False), 5: ("tanij", False), 6: ("manij", False), 7:
    ("panij", False), 8: ("ranij", False), 9: ("ganij", False), 10:
    ("an", False), 11: ("in", False), 12: ("on", False), 13: ("n",
    False), 14: ("ać", False), 15: ("eć", False), 16: ("uć", False),
    17: ("ugov", False), 18: ("ug", False), 19: ("log", False), 20:
    ("g", False), 21: ("rari", False), 22: ("oti", False), 23:
    ("si", False), 24: ("li", False), 25: ("uj", False), 26: ("caj",
    False), 27: ("čaj", False), 28: ("ćaj", False), 29: ("đaj",
    False), 30: ("laj", False), 31: ("raj", False), 32: ("bij",
    False), 33: ("cij", False), 34: ("dij", False), 35: ("lij",
    False), 36: ("nij", False), 37: ("mij", False), 38: ("žij",
    False), 39: ("gij", False), 40: ("fij", False), 41: ("pij",
    False), 42: ("rij", False), 43: ("sij", False), 44: ("tij",
    False), 45: ("zij", False), 46: ("nal", False), 47: ("ijal",
    False), 48: ("ozil", False), 49: ("olov", False), 50: ("ol",
    False), 51: ("lem", False), 52: ("ram", False), 53: ("ar",
    False), 54: ("dr", False), 55: ("er", False), 56: ("or", False),
    57: ("es", False), 58: ("is", False), 59: ("taš", False), 60:
    ("naš", False), 61: ("jaš", False), 62: ("kaš", False), 63:
    ("baš", False), 64: ("gaš", False), 65: ("vaš", False), 66:
    ("eš", False), 67: ("iš", False), 68: ("ikat", False), 69:
    ("lat", False), 70: ("et", False), 71: ("est", False), 72:
    ("ist", False), 73: ("kst", False), 74: ("ost", False), 75:
    ("išt", False), 76: ("ova", False), 77: ("av", False), 78:
    ("ev", False), 79: ("iv", False), 80: ("ov", False), 81: ("mov",
    False), 82: ("lov", False), 83: ("el", False), 84: ("anj",
    False), 85: ("enj", False), 86: ("šnj", False), 87: ("en",
    False), 88: ("šn", False), 89: ("čin", False), 90: ("roši",
    False), 91: ("oš", False), 92: ("evit", False), 93: ("ovit",
    False), 94: ("ast", False), 95: ("k", False), 96: ("eva",
    False), 97: ("ava", False), 98: ("iva", False), 99: ("uva",
    False), 100: ("ir", False), 101: ("ač", False), 102: ("ača",
    False), 103: ("ni", False), 104: ("a", False), 105: ("ur",
    False), 106: ("astaj", False), 107: ("istaj", False), 108:
    ("ostaj", False), 109: ("aj", False), 110: ("asta", False), 111:
    ("ista", False), 112: ("osta", False), 113: ("ta", False), 114:
    ("inj", False), 115: ("as", False), 116: ("i", False), 117:
    ("luč", False), 118: ("jeti", False), 119: ("e", False), 120:
    ("at", False), 121: ("luc", True), 122: ("snj", True), 123:
    ("os", True), 124: ("ac", True), 125: ("ec", True), 126: ("uc",
    True), 127: ("rosi", True), 128: ("aca", True), 129: ("jas",
    True), 130: ("tas", True), 131: ("gas", True), 132: ("nas",
    True), 133: ("kas", True), 134: ("vas", True), 135: ("bas",
    True), 136: ("as", True), 137: ("cin", True), 138: ("astaj",
    True), 139: ("istaj", True), 140: ("ostaj", True), 141: ("asta",
    True), 142: ("ista", True), 143: ("osta", True), 144: ("ava",
    True), 145: ("eva", True), 146: ("iva", True), 147: ("uva",
    True), 148: ("ova", True), 149: ("jeti", True), 150: ("inj",
    True), 151: ("ist", True), 152: ("es", True), 153: ("et", True),
    154: ("is", True), 155: ("ir", True), 156: ("ur", True), 157:
    ("uj", True), 158: ("ni", True), 159: ("sn", True), 160: ("ta",
    True), 161: ("a", True), 162: ("i", True), 163: ("e", True),
    164: ("n", True)}
_SR_CYR = str.maketrans({'а': 'a', 'б': 'b', 'в': 'v', 'г': 'g', 'д': 'd', 'е': 'e', 'ж': 'ž', 'з': 'z', 'и': 'i', 'к': 'k', 'л': 'l', 'м': 'm', 'н': 'n', 'о': 'o', 'п': 'p', 'р': 'r', 'с': 's', 'т': 't', 'у': 'u', 'ф': 'f', 'х': 'h', 'ц': 'c', 'ч': 'č', 'ш': 'š', 'ђ': 'đ', 'ј': 'j', 'љ': 'lj', 'њ': 'nj', 'ћ': 'ć', 'џ': 'dž'})

_SR_V = "aeiou"
_SR_SA = set("ćčđšž")
_SR_CA = set("bcdfghjklmnprstvzćčđšž")


def _sr_prelude(w: str) -> str:
    for pat in ("ije", "je"):
        i = 0
        while i < len(w):
            if (w[i] in _SR_CA and w.startswith(pat, i + 1)
                    and i + 1 + len(pat) < len(w)
                    and w[i + 1 + len(pat)] in _SR_CA):
                w = w[:i + 1] + "e" + w[i + 1 + len(pat):]
            i += 1
    return w.replace("dj", "đ")


def _sr_p1(w: str) -> int:
    n = len(w)
    p1 = n
    for i, ch in enumerate(w):
        if ch in _SR_V:
            p1 = i + 1
            if p1 < 2:
                for j in range(i + 1, n):
                    if w[j] not in _SR_V:
                        p1 = j + 1
                        break
            break
    # syllabic-r adjustment
    ri = w.find("r")
    if ri >= 0:
        c = ri + 1
        ok = c >= 2
        if not ok:
            for j in range(c, n):
                if w[j] != "r":
                    c = j + 1
                    ok = True
                    break
        if ok and p1 - c > 1:
            p1 = c
    return p1


def stem_serbian(w: str) -> str:
    w = w.translate(_SR_CYR)
    w = _sr_prelude(w)
    no_diacritics = not any(ch in _SR_SA for ch in w)
    p1 = _sr_p1(w)
    suf, tag = _longest_tagged(w, _SR_STEP1, 0)
    if suf is not None:
        repl, gate = _SR_STEP1_ACT[tag]
        if not gate or no_diacritics:
            w = w[:-len(suf)] + repl
    suf, tag = _longest_tagged(w, _SR_STEP2, 0)
    applied2 = False
    if suf is not None and len(w) - len(suf) >= p1:
        repl, gate = _SR_STEP2_ACT[tag]
        if not gate or no_diacritics:
            w = w[:-len(suf)] + repl
            applied2 = True
    if not applied2:
        suf = _longest_suffix(w, _SR_STEP3, 0)
        if suf and len(w) - len(suf) >= p1:
            w = w[:-len(suf)]
    return w


# ---------------------------------------------------------------------------
# registry


SNOWBALL_STEMMERS: dict[str, callable] = {
    "snowball_kp": stem_kp,
    "snowball_french": stem_french,
    "snowball_armenian": stem_armenian,
    "snowball_lithuanian": stem_lithuanian,
    "snowball_basque": stem_basque,
    "snowball_catalan": stem_catalan,
    "snowball_estonian": stem_estonian,
    "snowball_arabic": stem_arabic,
    "snowball_yiddish": stem_yiddish,
    "snowball_tamil": stem_tamil,
    "snowball_greek": stem_greek_snowball,
    "snowball_serbian": stem_serbian,
    "snowball_indonesian": stem_indonesian_snowball,
    "snowball_hindi": stem_hindi_snowball,
    "snowball_lovins": stem_lovins,
    "snowball_danish": stem_danish,
    "snowball_norwegian": stem_norwegian,
    "snowball_swedish": stem_swedish,
    "snowball_english": stem_english,
    "snowball_porter": stem_porter_snowball,
    "snowball_german": stem_german_snowball,
    "snowball_german2": stem_german2,
    "snowball_dutch": stem_dutch,
    "snowball_russian": stem_russian,
    "snowball_spanish": stem_spanish,
    "snowball_italian": stem_italian,
    "snowball_portuguese": stem_portuguese_snowball,
    "snowball_finnish": stem_finnish,
    "snowball_romanian": stem_romanian,
    "snowball_hungarian": stem_hungarian,
    "snowball_irish": stem_irish,
    "snowball_nepali": stem_nepali,
    "snowball_turkish": stem_turkish,
}
