"""Light/minimal stemmer family: golden parity with the reference's
published test vocabularies + analyzer-chain integration.

Fixtures in ``tests/data/stem_goldens/`` are deterministic samples of
the reference's ``*testdata.zip`` / ``nb_/nn_*.txt`` vocabularies
(``tools/sample_stem_goldens.py``); before sampling, every stemmer was
verified 0-mismatch against the FULL files (335k+ pairs total).
"""

import os

import numpy as np
import pytest

from lucene_spark.functions.lightstem import LIGHT_STEMMERS

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "data",
                          "stem_goldens")
GOLDEN_NAMES = sorted(
    fn[:-4] for fn in os.listdir(GOLDEN_DIR) if fn.endswith(".tsv"))


def _pairs(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.tsv")
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            w, _, s = line.rstrip("\n").partition("\t")
            yield w, s


def test_every_golden_file_has_a_registered_stemmer():
    assert set(GOLDEN_NAMES) <= set(LIGHT_STEMMERS)


@pytest.mark.parametrize("name", GOLDEN_NAMES)
def test_goldens(name):
    stem = LIGHT_STEMMERS[name]
    bad = [(w, stem(w), exp) for w, exp in _pairs(name) if stem(w) != exp]
    assert not bad, f"{name}: {len(bad)} mismatches, first: {bad[:5]}"


def test_english_minimal_s_stemmer():
    # en/EnglishMinimalStemmer.java semantics (Harman S-stemmer)
    stem = LIGHT_STEMMERS["english_minimal"]
    cases = {
        "queries": "query",    # -ies -> -y
        "phrases": "phrase",   # consonant+es -> strip s
        "corpus": "corpus",    # -us kept
        "stress": "stress",    # -ss kept
        "dies": "dy",          # short -ies still rewrites
        "goes": "goes",        # vowel+es kept
        "ties": "ties",        # a/e before i blocks the -ies rule? no:
                               # t not in {a,e}; 'ties' -> t+ies, s[-4]
                               # doesn't exist (len 4 > 3, s[0]='t') ->
                               # rewrites to 'ty'
        "dogs": "dog",
        "as": "as",            # len < 3 untouched
    }
    cases["ties"] = "ty"
    for w, exp in cases.items():
        assert stem(w) == exp, (w, stem(w), exp)


def test_rslp_exception_forms():
    # whole-word exceptions (Plural, flag=1): 'mais' never loses its s
    pt_min = LIGHT_STEMMERS["portuguese_minimal"]
    assert pt_min("mais") == "mais"
    assert pt_min("casas") == "casa"
    assert pt_min("balões") == "balão"
    # suffix exceptions (Adverb, flag=0) live inside the full pipeline
    full = LIGHT_STEMMERS["portuguese_rslp"]
    assert full("felizmente") != "felizmente"  # adverb strips
    assert full("experimente") == full("experimente")  # exception word


def test_norwegian_flag_model():
    bokmaal = LIGHT_STEMMERS["norwegian_light"]
    nynorsk = LIGHT_STEMMERS["norwegian_light_nynorsk"]
    # 'heiter' is a nynorsk-only ending
    assert nynorsk("hemmelegheiter") == "hemmeleg"
    assert bokmaal("hemmeligheter") == "hemmelig"


def test_analyze_text_light_chain():
    from lucene_spark.functions.analysis import analyze_text
    # lowercase -> stop -> stem, stop gaps preserved
    terms, positions, n = analyze_text(
        "Häuser und Tische", stopwords=frozenset(["und"]),
        stemmer="german_light")
    assert terms == ["haus", "tisch"]
    assert positions == [0, 2]          # gap where the stopword was
    assert n == 2


def test_analyze_text_unknown_stemmer():
    from lucene_spark.functions.analysis import analyze_text
    with pytest.raises(ValueError):
        analyze_text("abc", stemmer="klingon_light")


@pytest.mark.parametrize("name", ["german_light", "french_light",
                                  "finnish_light", "portuguese_rslp"])
def test_batch_path_matches_single_path(name):
    """The vectorized Arrow-batch analyzer (vocabulary-level stemming)
    must agree with the per-string oracle path."""
    from lucene_spark.functions.analysis import (analyze_batch,
                                                 analyze_text)
    docs = [
        "Häuser Tische abschließen und so weiter",
        "constitutionnellement les mots français était",
        "kaikkien sanojen taivutusmuodot ovat täällä",
        "as casas bonitas ficaram pequenas",
        "",
        "xyz",
    ]
    stop = frozenset(["und", "les", "as"])
    import pandas as pd
    doc_idx, terms, positions, lengths = analyze_batch(
        pd.Series(docs, dtype=object), stopwords=stop, stemmer=name)
    for i, text in enumerate(docs):
        t_exp, p_exp, n_exp = analyze_text(text, stopwords=stop,
                                           stemmer=name)
        sel = doc_idx == i
        assert list(terms[sel]) == t_exp, (name, text)
        assert list(positions[sel]) == p_exp
        assert lengths[i] == n_exp


def test_german_normalization_goldens():
    """GermanNormalizationFilter goldens from the reference's
    de/TestGermanNormalizationFilter.java."""
    from lucene_spark.functions.lightstem import german_normalize
    assert german_normalize("Schaltflächen") == "Schaltflachen"
    assert german_normalize("Schaltflaechen") == "Schaltflachen"
    assert german_normalize("dauer") == "dauer"
    assert german_normalize("weißbier") == "weissbier"
    # digraph vs diphthong: 'ae'/'oe'/'ue' fold, 'ie'/'ee' don't
    assert german_normalize("quelle") == "quelle"   # u after q is V state
    assert german_normalize("liebe") == "liebe"


def test_german_analyzer_chain_is_normalize_then_light():
    from lucene_spark.functions.lightstem import (LIGHT_STEMMERS,
                                                  german_normalize,
                                                  stem_german_light)
    full = LIGHT_STEMMERS["german"]
    for w in ["Häuser", "grösser", "schaltflaechen", "weißbier", "tische"]:
        assert full(w) == stem_german_light(german_normalize(w))


def test_language_analyzer_presets():
    """language_analyzer_kwargs composes the reference's per-language
    Analyzer chains (stop set + stemmer [+ elision]) for analyze_*."""
    from lucene_spark.functions.analysis import analyze_text
    from lucene_spark.functions.lightstem import language_analyzer_kwargs
    import pytest as _pytest

    fr = language_analyzer_kwargs("french")
    t, _, _ = analyze_text("L'église de l'art", **fr)
    assert t == ["eglis", "art"]                 # elision+stop+light stem

    de = language_analyzer_kwargs("german")
    t, _, _ = analyze_text("Die Häuser und Tische", **de)
    assert t == ["haus", "tisch"]                # stop + normalize + light

    en = language_analyzer_kwargs("english")
    t, _, _ = analyze_text("the runner's houses", **en)
    assert t == ["runner", "hous"]               # possessive + Porter

    with _pytest.raises(ValueError):
        language_analyzer_kwargs("klingon")


def test_language_preset_batch_matches_text():
    import pandas as pd
    from lucene_spark.functions.analysis import analyze_batch, analyze_text
    from lucene_spark.functions.lightstem import language_analyzer_kwargs
    docs = ["L'église de l'art, qu'elle aime",
            "les constitutions françaises", "", "o'brian"]
    kw = language_analyzer_kwargs("french")
    d, t, p, ls = analyze_batch(pd.Series(docs, dtype=object), **kw)
    for i, doc in enumerate(docs):
        et, ep, en = analyze_text(doc, **kw)
        sel = d == i
        assert list(t[sel]) == et and list(p[sel]) == ep
        assert ls[i] == en


def test_greek_analyzer_chain():
    """GreekAnalyzer chain goldens from the reference's
    el/TestGreekAnalyzer.java: GreekLowerCaseFilter (fold BEFORE stop,
    folded stop set) -> StopFilter -> GreekStemmer."""
    from lucene_spark.functions.analysis import analyze_text
    from lucene_spark.functions.lightstem import language_analyzer_kwargs
    kw = language_analyzer_kwargs("greek")
    cases = [
        ("Μία εξαιρετικά καλή και πλούσια σειρά χαρακτήρων "
         "της Ελληνικής γλώσσας",
         ["μια", "εξαιρετ", "καλ", "πλουσ", "σειρ", "χαρακτηρ",
          "ελληνικ", "γλωσσ"]),
        ("Προϊόντα (και)     [πολλαπλές] - ΑΝΑΓΚΕΣ",
         ["προιοντ", "πολλαπλ", "αναγκ"]),
        ("ΠΡΟΫΠΟΘΕΣΕΙΣ  Άψογος, ο μεστός και οι άλλοι",
         ["προυποθεσ", "αψογ", "μεστ", "αλλ"]),
    ]
    for text, exp in cases:
        t, _, _ = analyze_text(text, **kw)
        assert t == exp, (text, t, exp)


def test_greek_batch_matches_text():
    import pandas as pd
    from lucene_spark.functions.analysis import analyze_batch, analyze_text
    from lucene_spark.functions.lightstem import language_analyzer_kwargs
    kw = language_analyzer_kwargs("greek")
    docs = ["Μία εξαιρετικά καλή σειρά", "ΠΡΟΫΠΟΘΕΣΕΙΣ και οι άλλοι",
            "", "plain ascii κείμενο"]
    d, t, p, ls = analyze_batch(pd.Series(docs, dtype=object), **kw)
    for i, doc in enumerate(docs):
        et, ep, en = analyze_text(doc, **kw)
        sel = d == i
        assert list(t[sel]) == et and list(p[sel]) == ep
        assert ls[i] == en


def test_stop_sets_shape():
    """Generated stop sets (tools/gen_stop_sets.py from the published
    Snowball/CLEF lists): spot membership + all-lowercase invariant
    (chains apply them post-LowerCaseFilter)."""
    from lucene_spark.functions._stopsets import STOP_SETS
    assert STOP_SETS["english"] >= {"the", "and", "of"}
    assert STOP_SETS["german"] >= {"und", "der", "die"}
    assert STOP_SETS["french"] >= {"le", "la", "et"}
    for lang, s in STOP_SETS.items():
        assert s, lang
        assert all(w == w.lower() for w in s), lang
