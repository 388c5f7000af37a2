"""Golden token-stream tests for the analyzer (BaseTokenStreamTestCase model:
reference test-framework/.../analysis/BaseTokenStreamTestCase.java)."""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.functions.analysis import (
    ENGLISH_STOP_WORDS, analyze_batch, analyze_text,
)


def test_simple_words():
    terms, pos, length = analyze_text("Foo bar BAZ")
    assert terms == ["foo", "bar", "baz"]
    assert pos == [0, 1, 2]
    assert length == 3


def test_identifiers_and_numbers():
    terms, pos, _ = analyze_text("foo_bar2 = compute(3.14, x1, 1,000); _private")
    assert terms == ["foo_bar2", "compute", "3.14", "x1", "1,000", "_private"]
    assert pos == [0, 1, 2, 3, 4, 5]


def test_apostrophe_joins():
    terms, _, _ = analyze_text("can't won't o'clock")
    assert terms == ["can't", "won't", "o'clock"]


def test_punctuation_splits():
    terms, _, _ = analyze_text("a.b-c/d\\e:f")
    assert terms == ["a", "b", "c", "d", "e", "f"]


def test_stopwords_leave_position_gaps():
    terms, pos, length = analyze_text("the quick fox and the dog",
                                      stopwords=ENGLISH_STOP_WORDS)
    assert terms == ["quick", "fox", "dog"]
    assert pos == [1, 2, 5]          # gaps where 'the'/'and' were
    assert length == 3               # length counts survivors only


def test_overlong_token_skipped_but_counted():
    long_tok = "x" * 300
    terms, pos, length = analyze_text(f"alpha {long_tok} beta")
    assert terms == ["alpha", "beta"]
    assert pos == [0, 2]             # the 300-char token consumed position 1
    assert length == 2


def test_exactly_255_kept():
    tok = "y" * 255
    terms, _, _ = analyze_text(f"a {tok} b")
    assert terms == ["a", tok, "b"]


def test_unicode_lowercase():
    terms, _, _ = analyze_text("Ünïcode Straße CAFÉ")
    assert terms == ["ünïcode", "straße", "café"]


def test_batch_matches_scalar():
    texts = pd.Series([
        "The Quick brown FOX",
        "",
        "foo_bar 3.14 " + "z" * 400 + " tail",
        "can't stop won't stop",
        "if return import the a an",
    ])
    doc_idx, terms, positions, lengths = analyze_batch(
        texts, stopwords=ENGLISH_STOP_WORDS)
    for d in range(len(texts)):
        want_terms, want_pos, want_len = analyze_text(
            texts.iloc[d], stopwords=ENGLISH_STOP_WORDS)
        mask = doc_idx == d
        assert list(terms[mask]) == want_terms
        assert list(positions[mask]) == want_pos
        assert lengths[d] == want_len


def test_batch_empty_series():
    doc_idx, terms, positions, lengths = analyze_batch(pd.Series([], dtype=object))
    assert len(doc_idx) == 0 and len(lengths) == 0


def test_analyze_batch_non_ascii_fallback_matches_text():
    """Non-ASCII input disables the lower-before-tokenize fast path; the
    fallback must agree with the per-string analyzer exactly."""
    import pandas as pd

    from lucene_spark.functions.analysis import analyze_batch, analyze_text
    docs = ["Ünïcode Tökens MÜNCHEN straße", "plain ASCII text",
            "mixed ü ascii", ""]
    doc_idx, terms, positions, lengths = analyze_batch(pd.Series(docs))
    for i, d in enumerate(docs):
        t, p, ln = analyze_text(d)
        sel = doc_idx == i
        assert list(terms[sel]) == t, d
        assert list(positions[sel]) == p, d
        assert lengths[i] == ln, d
    assert "münchen" in set(terms)


def test_core_tokenizer_family():
    """The reference's analysis/core family: whitespace (no lowercase =
    WhitespaceAnalyzer), letter+lower (SimpleAnalyzer), keyword."""
    import pandas as pd

    from lucene_spark.functions.analysis import analyze_batch, analyze_text

    text = "Foo-Bar  baz42 QUX's"
    # WhitespaceAnalyzer: maximal non-whitespace runs, case preserved
    t, p, ln = analyze_text(text, tokenizer="whitespace", lowercase=False)
    assert t == ["Foo-Bar", "baz42", "QUX's"]
    assert p == [0, 1, 2] and ln == 3
    # SimpleAnalyzer: letter runs + lowercase (digits/punct break tokens)
    t, p, ln = analyze_text(text, tokenizer="letter")
    assert t == ["foo", "bar", "baz", "qux", "s"]
    # KeywordAnalyzer: whole input, one token
    t, p, ln = analyze_text(text, tokenizer="keyword", lowercase=False)
    assert t == [text] and ln == 1
    assert analyze_text("", tokenizer="keyword")[2] == 0
    # batch path agrees with per-string path for every variant
    docs = [text, "", "Ünïcode Tökens", "plain words here"]
    for tok in ("whitespace", "letter", "keyword"):
        for lc in (True, False):
            di, tm, ps, ls = analyze_batch(pd.Series(docs), tokenizer=tok,
                                           lowercase=lc)
            for i, d in enumerate(docs):
                tt, pp, lnn = analyze_text(d, tokenizer=tok, lowercase=lc)
                sel = di == i
                assert list(tm[sel]) == tt, (tok, lc, d)
                assert list(ps[sel]) == pp, (tok, lc, d)
                assert ls[i] == lnn, (tok, lc, d)


def test_synonym_graph_expansion_text():
    from lucene_spark.functions.analysis import (analyze_text,
                                                 expand_synonyms_text)
    terms, positions, length = analyze_text("fast quick stream fast")
    t2, p2, n_over = expand_synonyms_text(terms, positions,
                                          {"fast": ("rapid",),
                                           "stream": ("flow", "river")})
    assert length == 4
    assert n_over == 4      # rapid x2, flow, river
    # every synonym shares its source position (posInc = 0)
    pairs = sorted(zip(t2, p2))
    assert ("rapid", 0) in pairs and ("rapid", 3) in pairs
    assert ("flow", 2) in pairs and ("river", 2) in pairs
    assert sorted(zip(terms, positions)) == [x for x in pairs
                                             if x[0] in terms]


def test_synonym_graph_batch_matches_text():
    import numpy as np
    from lucene_spark.functions.analysis import (analyze_batch,
                                                 analyze_text,
                                                 expand_synonyms_batch,
                                                 expand_synonyms_text)
    import pandas as pd
    docs = ["fast stream parse", "no match here", "fast fast token"]
    syn = {"fast": ("rapid",), "token": ("lexeme",)}
    d, t, p, lens = analyze_batch(pd.Series(docs))
    d2, t2, p2, overlaps = expand_synonyms_batch(d, t, p, len(docs), syn)
    for i, doc in enumerate(docs):
        terms, positions, _ = analyze_text(doc)
        et, ep, n_over = expand_synonyms_text(terms, positions, syn)
        sel = d2 == i
        assert sorted(zip(t2[sel], p2[sel])) == sorted(zip(et, ep))
        assert overlaps[i] == n_over


def test_shingle_text_semantics():
    from lucene_spark.functions.analysis import (analyze_text,
                                                 expand_shingles_text)
    # stopword hole between "quick" and "stream" → filler token
    terms, positions, length = analyze_text(
        "fast quick the stream end", stopwords=frozenset({"the"}))
    t2, p2, n_over = expand_shingles_text(terms, positions, 2, 3)
    pairs = sorted(zip(t2[len(terms):], p2[len(terms):]))
    assert ("fast quick", 0) in pairs
    assert ("quick _ stream", 1) in pairs          # hole → FILLER_TOKEN
    assert ("stream end", 3) in pairs
    assert ("fast quick _ stream", 0) in pairs     # trigram
    assert ("quick _ stream end", 1) in pairs
    assert n_over == 5
    import pytest
    with pytest.raises(ValueError):
        expand_shingles_text(terms, positions, 1, 2)


def test_shingle_batch_matches_text():
    import numpy as np
    import pandas as pd
    from lucene_spark.functions.analysis import (analyze_batch,
                                                 analyze_text,
                                                 expand_shingles_batch,
                                                 expand_shingles_text)
    docs = ["fast the stream parse emit", "single", "",
            "a b c d", "x the the y z"]
    stop = frozenset({"the"})
    d, t, p, lens = analyze_batch(pd.Series(docs), stopwords=stop)
    for mn, mx in ((2, 2), (2, 3), (3, 4)):
        d2, t2, p2, overlaps = expand_shingles_batch(d, t, p, len(docs),
                                                     mn, mx)
        for i, doc in enumerate(docs):
            terms, positions, _ = analyze_text(doc, stopwords=stop)
            et, ep, n_over = expand_shingles_text(terms, positions, mn, mx)
            sel = d2 == i
            assert sorted(zip(t2[sel], p2[sel])) == sorted(zip(et, ep)), \
                (i, mn, mx)
            assert overlaps[i] == n_over, (i, mn, mx)


def test_ascii_folding_goldens():
    from lucene_spark.functions.analysis import fold_to_ascii
    cases = {
        "café": "cafe", "naïve": "naive", "über": "uber",
        "straße": "strasse", "ünïcode_väl": "unicode_val",
        "œuvre": "oeuvre", "øre": "ore", "łódź": "lodz",
        "þorn": "thorn", "ðelta": "delta", "ĳs": "ijs",
        "plain": "plain", "日本語": "日本語",   # non-Latin passes through
    }
    for src, want in cases.items():
        assert fold_to_ascii(src) == want, src


def test_ascii_folding_batch_matches_text():
    import pandas as pd
    from lucene_spark.functions.analysis import (analyze_batch,
                                                 analyze_text)
    docs = ["café straße Über tokens", "Ünïcode_väl plain", "",
            "łódź œuvre the naïve", "ascii only here"]
    stop = frozenset({"the"})
    d, t, p, lens = analyze_batch(pd.Series(docs), stopwords=stop,
                                  ascii_folding=True)
    for i, doc in enumerate(docs):
        et, ep, _ = analyze_text(doc, stopwords=stop, ascii_folding=True)
        sel = d == i
        assert list(t[sel]) == et and list(p[sel]) == ep, i
    assert "cafe" in set(t) and "strasse" in set(t) \
        and "unicode_val" in set(t)


def test_length_filter():
    """LengthFilter (miscellaneous/LengthFilter.java): tokens outside
    [min, max] are dropped with their position gaps kept; batch ≡ text."""
    import pandas as pd
    from lucene_spark.functions.analysis import analyze_batch, analyze_text
    t, p, ln = analyze_text("a bb ccc dddd eeeee", length_filter=(2, 4))
    assert t == ["bb", "ccc", "dddd"]
    assert p == [1, 2, 3] and ln == 3
    docs = ["a bb ccc dddd eeeee", "", "xy z wxyz"]
    d, tm, ps, ls = analyze_batch(pd.Series(docs), length_filter=(2, 4))
    for i, doc in enumerate(docs):
        tt, pp, lnn = analyze_text(doc, length_filter=(2, 4))
        sel = d == i
        assert list(tm[sel]) == tt and list(ps[sel]) == pp
        assert ls[i] == lnn
    # composes with stopwords (stop drops first, both keep gaps)
    t, p, ln = analyze_text("the bb ccc the dddd",
                            stopwords=frozenset({"the"}),
                            length_filter=(3, 99))
    assert t == ["ccc", "dddd"] and p == [2, 4]


def test_elision_goldens():
    """ElisionFilter (util/ElisionFilter.java:55-70): strip article +
    FIRST apostrophe; non-article prefixes survive. Goldens from the
    reference's util/TestElision.java (lowercased: our chain elides
    after LowerCaseFilter, valid because DEFAULT_ARTICLES sets are
    ignoreCase=true)."""
    from lucene_spark.functions.analysis import elide
    arts = frozenset(["l", "m"])
    assert elide("l'embrouille", arts) == "embrouille"
    assert elide("o'brian", arts) == "o'brian"      # non-article prefix
    assert elide("m'enfin", arts) == "enfin"
    assert elide("plop", arts) == "plop"            # no apostrophe
    # U+2019 apostrophe variant, same as '\'' in the reference loop
    assert elide("l’art", arts) == "art"
    # only the FIRST apostrophe is considered
    assert elide("o'l'x", arts) == "o'l'x"


def test_elision_analyze_text_chain():
    from lucene_spark.functions.analysis import analyze_text
    from lucene_spark.functions.lightstem import FRENCH_ARTICLES
    # FrenchAnalyzer order: elision -> lowercase -> stop (stopword match
    # happens on the ELIDED form)
    t, p, n = analyze_text("L'église de l'art, qu'elle aime",
                           stopwords=frozenset({"de", "elle"}),
                           elision=FRENCH_ARTICLES)
    assert t == ["église", "art", "aime"]
    assert p == [0, 2, 4] and n == 3


def test_elision_batch_matches_text():
    import pandas as pd
    from lucene_spark.functions.analysis import analyze_batch, analyze_text
    from lucene_spark.functions.lightstem import FRENCH_ARTICLES
    docs = ["L'église de l'art", "qu'elle aime o'brian", "", "plop"]
    stop = frozenset({"de"})
    d, t, p, ls = analyze_batch(pd.Series(docs, dtype=object),
                                stopwords=stop, elision=FRENCH_ARTICLES)
    for i, doc in enumerate(docs):
        et, ep, en = analyze_text(doc, stopwords=stop,
                                  elision=FRENCH_ARTICLES)
        sel = d == i
        assert list(t[sel]) == et and list(p[sel]) == ep
        assert ls[i] == en
