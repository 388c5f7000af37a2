"""Hunspell stemmer subset: replay of every reference StemmerTestBase
expectation (tests/data/hunspell/cases.json, transcoded from the
reference test sources + fixture dictionaries by
tools/gen_hunspell_goldens.py). Comparison = stem MULTISET equality,
exactly the reference's sorted assertArrayEquals.
"""

import json
import os

import pytest

from lucene_spark.functions.hunspell import (
    HunspellDictionary,
    HunspellStemmer,
    _charset_of,
    decode_hunspell,
    hunspell_stem_batch,
)

_DIR = os.path.join(os.path.dirname(__file__), "data", "hunspell")

with open(os.path.join(_DIR, "cases.json"), encoding="utf-8") as f:
    _SUITES = json.load(f)


def _stemmer(suite):
    with open(os.path.join(_DIR, suite["aff"]), "rb") as f:
        aff_bytes = f.read()
    aff = decode_hunspell(aff_bytes)
    with open(os.path.join(_DIR, suite["dic"]), "rb") as f:
        dic = f.read().decode(_charset_of(aff_bytes), errors="replace")
    return HunspellStemmer(HunspellDictionary(
        aff, [dic], ignore_case=suite["ignore_case"]))


@pytest.mark.parametrize("suite", _SUITES,
                         ids=[s["test"] for s in _SUITES])
def test_reference_stemmer_suite(suite):
    st = _stemmer(suite)
    bad = []
    for word, expected in suite["cases"]:
        got = st.stem(word)
        if sorted(got) != sorted(expected):
            bad.append((word, expected, got))
    assert not bad, f"{suite['test']}: {bad[:5]} ({len(bad)} failures)"


def test_stem_filter_semantics():
    import numpy as np
    aff = os.path.join(_DIR, "simple.aff")
    dic = os.path.join(_DIR, "simple.dic")
    terms = np.array(["lucene", "mahoute", "xyzzy"], dtype=object)
    d = np.zeros(3, dtype=np.int64)
    p = np.arange(3, dtype=np.int64)
    rd, rt, rp, over = hunspell_stem_batch(d, terms, p, 1, aff, dic)
    # lucene -> {lucene, lucen}; mahoute -> {mahout}; xyzzy passes through
    assert sorted(rt) == ["lucen", "lucene", "mahout", "xyzzy"]
    assert int(over[0]) == 1
    # longestOnly keeps one stem per token
    rd, rt, rp, over = hunspell_stem_batch(d, terms, p, 1, aff, dic,
                                           longest_only=True)
    assert sorted(rt) == ["lucene", "mahout", "xyzzy"]
    assert int(over[0]) == 0


def test_hunspell_invert_segment():
    import pandas as pd

    from lucene_spark.operators.build import invert_segment

    aff = os.path.join(_DIR, "simple.aff")
    dic = os.path.join(_DIR, "simple.dic")
    pdf = pd.DataFrame({"doc_id": [0], "content": ["lucene mahoute zq"]})
    postings, meta, _, _ = invert_segment(
        pdf, 0, "content", "doc_id", frozenset(), True,
        hunspell=(aff, dic))
    by = postings.set_index("term")
    assert int(by.loc["lucen", "ttf"]) == 1
    assert int(by.loc["lucene", "ttf"]) == 1   # its own stem survives
    assert int(by.loc["mahout", "ttf"]) == 1
    assert "zq" in by.index                    # stemless pass-through
    assert "mahoute" not in by.index
    assert int(meta["doc_len"].iloc[0]) == 3   # overlay discounted


# ---------------------------------------------------------------------------
# Hunspell.spell (non-compound subset): reference .good/.wrong corpora
# ---------------------------------------------------------------------------

from lucene_spark.functions.hunspell import HunspellChecker

with open(os.path.join(_DIR, "spell_cases.json"), encoding="utf-8") as f:
    _SPELL = json.load(f)


def _checker(name):
    with open(os.path.join(_DIR, name + ".aff"), "rb") as f:
        aff_bytes = f.read()
    aff = decode_hunspell(aff_bytes)
    with open(os.path.join(_DIR, name + ".dic"), "rb") as f:
        dic = f.read().decode(_charset_of(aff_bytes), errors="replace")
    return HunspellChecker(HunspellDictionary(aff, [dic]))


@pytest.mark.parametrize("corpus", _SPELL,
                         ids=[s["name"] for s in _SPELL])
def test_reference_spell_corpus(corpus):
    ck = _checker(corpus["name"])
    bad = []
    for w in corpus["good"]:
        if not ck.spell(w):
            bad.append(("good-rejected", w))
    for w in corpus["wrong"]:
        if ck.spell(w):
            bad.append(("wrong-accepted", w))
    assert not bad, f"{corpus['name']}: {bad[:8]} ({len(bad)})"


# ---------------------------------------------------------------------------
# Hunspell.suggest: reference .sug corpora (suggestions for each .wrong
# word, joined ', '; empty suggestion lines dropped — TestSpellChecking)
# ---------------------------------------------------------------------------

with open(os.path.join(_DIR, "sug_cases.json"), encoding="utf-8") as f:
    _SUG = json.load(f)


@pytest.mark.parametrize("corpus", _SUG, ids=[s["name"] for s in _SUG])
def test_reference_sug_corpus(corpus):
    ck = _checker(corpus["name"])
    got = "\n".join(
        s for s in (", ".join(ck.suggest(w)) for w in corpus["wrong"])
        if s)
    assert got == corpus["sug"], (
        f"{corpus['name']}:\n--- expected ---\n{corpus['sug']}\n"
        f"--- got ---\n{got}")


def test_spell_and_suggest_series():
    import numpy as np

    from lucene_spark.functions.hunspell import (
        hunspell_spell_series,
        hunspell_suggest_series,
    )

    aff = os.path.join(_DIR, "base.aff")
    dic = os.path.join(_DIR, "base.dic")
    terms = np.array(["created", "createdd", "created", "zzz"],
                     dtype=object)
    ok = hunspell_spell_series(terms, aff, dic)
    assert list(ok) == [True, False, True, False]
    sugs = hunspell_suggest_series(terms, aff, dic)
    assert sugs[0] == [] and sugs[2] == []
    assert "created" in sugs[1]
