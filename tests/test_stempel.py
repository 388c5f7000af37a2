"""Stempel (Egothor) Polish stemmer: golden parity with the reference's
own Java implementation over the shipped ``stemmer_20000.tbl``.

``tests/data/stempel/golden.tsv`` holds 32,841 ``word<TAB>stem`` pairs
produced by running the reference's egothor/StempelStemmer classes
(compiled directly from the reference sources) against a deterministic
wordlist — Polish stopwords, synthetic inflections over 200+ roots,
diacritic fuzz, and ASCII negatives (``tools/gen_stempel_goldens.py``).
"""

import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "stempel",
                      "golden.tsv")


def _pairs():
    with open(GOLDEN, encoding="utf-8") as fh:
        for line in fh:
            w, _, s = line.rstrip("\n").partition("\t")
            yield w, (None if s == "\\0" else s)


def test_golden_replay_exact():
    from lucene_spark.functions.stempel import polish_stemmer
    st = polish_stemmer()
    bad = [(w, st.stem(w), exp) for w, exp in _pairs()
           if st.stem(w) != exp]
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_reference_testdata_cases():
    # TestPolishAnalyzer.java:33 checkOneTerm pairs
    from lucene_spark.functions.lightstem import LIGHT_STEMMERS
    stem = LIGHT_STEMMERS["stempel_polish"]
    assert stem("studenta") == "student"
    assert stem("studenci") == "student"


def test_filter_min_length_passthrough():
    # StempelFilter.java:73 — tokens shorter than 3 chars unstemmed
    from lucene_spark.functions.stempel import polish_stemmer, stem_polish
    st = polish_stemmer()
    for w in ("ab", "zł", "iż"):
        assert stem_polish(w) == w
    # but the raw stemmer itself would still operate on them
    assert st.stem("ab") is not None or True  # no exception


def test_multitrie_header_detected():
    from lucene_spark.functions.stempel import (_DATA_DIR, _MultiTrie2,
                                                load_trie)
    t = load_trie(os.path.join(_DATA_DIR, "stemmer_20000.tbl.gz"))
    assert isinstance(t, _MultiTrie2)
    assert not t.forward  # Polish table is a backward (suffix) trie
    assert len(t.tries) >= 2


def test_diff_apply_partial_on_out_of_bounds():
    # Diff.java:142 — exceptions are swallowed, partial patch kept
    from lucene_spark.functions.stempel import _utf16_units, diff_apply
    buf = list(_utf16_units("abc"))
    # delete 26 chars ('z') from a 3-char buffer -> abort, buffer kept
    diff_apply(buf, tuple(_utf16_units("Dz")))
    assert len(buf) == 3


def test_polish_analyzer_chain():
    # PolishAnalyzer: standard -> lower -> stop(carrot2) -> stempel
    from lucene_spark.functions.analysis import analyze_text
    from lucene_spark.functions.lightstem import language_analyzer_kwargs
    kw = language_analyzer_kwargs("polish")
    terms, positions, n = analyze_text("Studenci byli w Warszawie", **kw)
    # 'byli' and 'w' are stopwords; 'studenci' stems to 'student'
    assert terms[0] == "student"
    assert "w" not in terms and "byli" not in terms


def test_stopword_gap_positions():
    from lucene_spark.functions.analysis import analyze_text
    from lucene_spark.functions.lightstem import language_analyzer_kwargs
    kw = language_analyzer_kwargs("polish")
    terms, positions, n = analyze_text("studenta i studenci", **kw)
    assert terms == ["student", "student"]
    assert positions == [0, 2]  # 'i' is a stopword, leaves a gap
