"""ReverseStringFilter + leading-wildcard acceleration.

Reference: ``analysis/common/.../reverse/ReverseStringFilter.java``
(token reversal; goldens from ``TestReverseStringFilter.java``) deployed
as Solr's ReversedWildcardFilter pattern: a reversed dictionary turns a
leading wildcard into a range-prunable prefix query.
"""

import pandas as pd

from lucene_spark.operators.build import invert_segment


def _invert(docs, store_positions=True, **kw):
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "content": docs})
    postings, doc_meta, norms, _ = invert_segment(
        pdf, 0, "content", "doc_id", frozenset(), store_positions, **kw)
    return postings


def test_reverse_goldens():
    # TestReverseStringFilter.testFilter: "Do have a nice day" ->
    # oD, evah, a, ecin, yad (lowercased here — our chain lowercases)
    p = _invert(["Do have a nice day"], reverse_tokens=True)
    assert sorted(p["term"]) == ["a", "ecin", "evah", "od", "yad"]


def test_reverse_is_bijection_on_stats():
    docs = ["customer filter order", "filter order", "order order"]
    fwd = _invert(docs).set_index("term")
    rev = _invert(docs, reverse_tokens=True).set_index("term")
    assert len(fwd) == len(rev)
    for t in fwd.index:
        assert rev.loc[t[::-1], "df"] == fwd.loc[t, "df"]
        assert rev.loc[t[::-1], "ttf"] == fwd.loc[t, "ttf"]


def test_reverse_supplementary_codepoints():
    # TestReverseStringFilter.testReverseSupplementary: surrogate pairs
    # stay intact (Python reverses code points, the UTF-16-safe result)
    p = _invert(["a\U0001D122b"], reverse_tokens=True)
    # standard tokenizer splits at the non-letter musical symbol; each
    # piece reverses independently
    assert "a" in set(p["term"]) and "b" in set(p["term"])
    p2 = _invert(["abcé"], reverse_tokens=True)
    assert list(p2["term"]) == ["écba"]


def test_reverse_composes_with_chain():
    # stemmer first, then reverse: dictionary holds reversed stems
    p = _invert(["running runs"], reverse_tokens=True, stemmer="porter")
    assert sorted(p["term"]) == ["nur", "nur"] or list(p["term"]) == ["nur"]
    # run+run collapse into one posting with tf=2
    assert list(p["term"]) == ["nur"]
    assert int(p["ttf"].iloc[0]) == 2


# --- DelimitedTermFrequencyTokenFilter --------------------------------------
def test_delimited_term_frequency():
    # TestDelimitedTermFrequencyTokenFilter.testTermFrequency:
    # "one|50 two three|100" -> tf 50/1/100, field length = 151
    p = _invert(["one|50 two three|100"], tokenizer="whitespace",
                store_positions=False, term_freq_delimiter="|")
    by = p.set_index("term")
    assert int(by.loc["one", "ttf"]) == 50
    assert int(by.loc["two", "ttf"]) == 1
    assert int(by.loc["three", "ttf"]) == 100
    assert [int(x) for x in by["df"]] == [1, 1, 1]


def test_delimited_term_frequency_invalid_suffix():
    import pytest as _pytest
    with _pytest.raises(ValueError, match="invalid term frequency"):
        _invert(["boo|fifty"], tokenizer="whitespace",
                store_positions=False, term_freq_delimiter="|")


def test_delimited_term_frequency_requires_no_positions():
    import pytest as _pytest
    with _pytest.raises(ValueError, match="store_positions"):
        _invert(["a|2"], tokenizer="whitespace", term_freq_delimiter="|")


# --- SetKeywordMarkerFilter / StemmerOverrideFilter --------------------------
def test_keyword_marker_protects_from_stemming():
    p = _invert(["filter filters table running"], stemmer="porter",
                keyword_marker=frozenset({"filter"}))
    terms = set(p["term"])
    assert "filter" in terms        # protected surface form
    assert "run" in terms           # others still stem
    assert "running" not in terms


def test_stemmer_override_forces_stem():
    p = _invert(["table tables order"], stemmer="german_light",
                stemmer_override={"table": "zqtbl"})
    terms = set(p["term"])
    assert "zqtbl" in terms         # 'table' takes the forced stem
    assert "tabl" in terms          # 'tables' (not overridden) stems
    assert "ord" in terms           # normal path unaffected
    # marker wins over override when both name a term (the reference's
    # StemmerOverrideFilter skips keyword-marked tokens)
    p2 = _invert(["table"], stemmer="german_light",
                 keyword_marker=frozenset({"table"}),
                 stemmer_override={"table": "zqtbl"})
    assert list(p2["term"]) == ["table"]


# --- Scandinavian folding / normalization ------------------------------------
def test_scandinavian_folding_goldens():
    # TestScandinavianFoldingFilter: the documented equivalences
    from lucene_spark.functions.pattern import scandinavian_fold as f
    assert f("blåbærsyltetøj") == "blabarsyltetoj"
    assert f("blåbärsyltetöj") == "blabarsyltetoj"
    assert f("blaabaarsyltetoej") == "blabarsyltetoj"
    assert f("blabarsyltetoj") == "blabarsyltetoj"
    assert f("räksmörgås") == "raksmorgas"
    assert f("ræksmørgås") == "raksmorgas"
    assert f("raeksmoergaas") == "raksmorgas"
    assert f("ráksmörgás") == "ráksmorgás"  # accents outside the set stay


def test_scandinavian_normalization_goldens():
    # TestScandinavianNormalizationFilter: to the Norwegian/Danish forms
    from lucene_spark.functions.pattern import scandinavian_normalize as n
    assert n("blåbærsyltetøj") == "blåbærsyltetøj"
    assert n("blåbärsyltetöj") == "blåbærsyltetøj"
    assert n("blaabaersyltetoej") == "blåbærsyltetøj"
    assert n("räksmörgås") == "ræksmørgås"
    assert n("raeksmoergaos") == "ræksmørgås"
    assert n("ROKSMORGAS") == "ROKSMORGAS"
    # folding subset: without AO, 'ao' stays
    assert n("raeksmoergaos", frozenset(("AE", "OE"))) == "ræksmørgaos"


def test_scandinavian_in_token_filter_chain():
    p = _invert(["blåbärsyltetöj räksmörgås"],
                token_filters=(("scandinavian_fold",),))
    assert sorted(p["term"]) == ["blabarsyltetoj", "raksmorgas"]


# --- CapitalizationFilter / DateRecognizer / ProtectedTermFilter -------------
def test_capitalization_filter_goldens():
    from lucene_spark.functions.pattern import capitalization_token as cap
    keep = frozenset(["and", "the", "it", "BIG"])
    assert cap("kiTTEN", keep=keep) == "Kitten"
    assert cap("and", keep=keep) == "And"
    assert cap("AnD", keep=keep) == "And"
    assert cap("big", keep=keep) == "Big"
    assert cap("BIG", keep=keep) == "BIG"
    assert cap("Hello thEre my Name is Ryan", keep=keep) == \
        "Hello there my name is ryan"
    assert cap("Hello thEre my Name is Ryan", keep=keep,
               only_first_word=False) == "Hello There My Name Is Ryan"
    assert cap("Hello thEre my Name is Ryan", keep=keep,
               only_first_word=False,
               min_word_length=3) == "Hello There my Name is Ryan"
    assert cap("McKinley", ok_prefix=("McK",),
               only_first_word=False) == "McKinley"
    # maxWordCount exceeded: token untouched
    assert cap("one two three", only_first_word=False,
               max_word_count=2) == "one two three"


def test_date_recognizer_keep_predicate():
    p = _invert(["note 12/24/1984 draft 01/01/2014"],
                tokenizer="whitespace",
                token_filters=(("date_recognizer", "%m/%d/%Y"),))
    assert sorted(p["term"]) == ["01/01/2014", "12/24/1984"]


def test_protected_term_filter():
    # protected terms bypass the wrapped truncate
    p = _invert(["customer order table"],
                token_filters=(("protected", ("customer",),
                                (("truncate", 4),)),))
    assert sorted(p["term"]) == ["customer", "orde", "tabl"]


def test_limit_token_position_filter():
    # LimitTokenPositionFilter: tokens past max POSITION dropped —
    # stopword gaps count toward the position (unlike the count limit)
    p = _invert(["the data big scan small"],
                token_filters=(("limit_position", 3),))
    assert sorted(p["term"]) == ["big", "data", "the"]
    # a stopword still consumes position 0, so the cap keeps fewer
    import pandas as pd
    from lucene_spark.operators.build import invert_segment
    pdf = pd.DataFrame({"doc_id": [0],
                        "content": ["the data big scan small"]})
    p2, _, _, _ = invert_segment(
        pdf, 0, "content", "doc_id", frozenset({"the"}), True,
        token_filters=(("limit_position", 3),))
    assert sorted(p2["term"]) == ["big", "data"]
