"""CJK analysis chain — goldens transcoded from the reference tests.

Reference semantics under test: ``cjk/CJKWidthFilter.java`` (width
folding + voiced-mark combination), ``cjk/CJKBigramFilter.java``
(bigram/unigram stream, script flags, offset-aligned buffering),
``cjk/CJKAnalyzer.java`` (chain order), goldens from
``TestCJKWidthFilter.java`` / ``TestCJKAnalyzer.java`` /
``TestCJKBigramFilter.java``.
"""

import os
import tempfile

import pandas as pd
import pytest

from lucene_spark.functions.cjk import (
    ALL_CJK,
    CJK_STOP_WORDS,
    HAN,
    HANGUL,
    HIRAGANA,
    KATAKANA,
    cjk_analyze_batch,
    cjk_analyze_text,
    cjk_width_fold,
)

NO_STOP = frozenset()


def terms_pos(text, **kw):
    kw.setdefault("stopwords", NO_STOP)
    t, p, _, _ = cjk_analyze_text(text, **kw)
    return t, p


def test_width_fold_goldens():
    # TestCJKWidthFilter: fullwidth ASCII + halfwidth kana with voiced
    # marks (combined where combinable)
    assert cjk_width_fold("Ｔｅｓｔ") == "Test"
    assert cjk_width_fold("１２３４") == "1234"
    assert cjk_width_fold("ｶﾀｶﾅ") == "カタカナ"
    assert cjk_width_fold("ｳﾞｨｯﾂ") == "ヴィッツ"
    assert cjk_width_fold("ﾊﾟﾅｿﾆｯｸ") == "パナソニック"
    assert cjk_width_fold("plain ascii") == "plain ascii"
    # non-combinable voiced mark falls back to U+3099
    assert cjk_width_fold("aﾞ") == "a゙"


def test_bigram_goldens_all_scripts():
    # TestCJKAnalyzer.testJa1/testJa2
    t, p = terms_pos("一二三四五六七八九十")
    assert t == ["一二", "二三", "三四", "四五", "五六",
                 "六七", "七八", "八九", "九十"]
    assert p == list(range(9))
    t, p = terms_pos("一 二三四 五六七八九 十")
    assert t == ["一", "二三", "三四", "五六", "六七", "七八", "八九", "十"]
    assert p == list(range(8))
    # testFinalOffset / testMix2
    assert terms_pos("あい")[0] == ["あい"]
    assert terms_pos("あいtest")[0] == ["あい", "test"]
    assert terms_pos("testあい    ")[0] == ["test", "あい"]
    t, p = terms_pos("あいうえおabんcかきくけ こ")
    assert t == ["あい", "いう", "うえ", "えお", "ab", "ん", "c",
                 "かき", "きく", "くけ", "こ"]
    assert p == list(range(11))
    # TestCJKBigramFilter.testAllScripts
    assert terms_pos("多くの学生が試験に落ちた。")[0] == [
        "多く", "くの", "の学", "学生", "生が", "が試",
        "試験", "験に", "に落", "落ち", "ちた"]


def test_bigram_han_only_flag():
    # TestCJKBigramFilter.testHanOnly: hiragana passes through as-is
    t, p = terms_pos("多くの学生が試験に落ちた。", flags=HAN)
    assert t == ["多", "く", "の", "学生", "が", "試験", "に", "落", "ち", "た"]
    assert p == list(range(10))


def test_unigrams_and_bigrams():
    # TestCJKBigramFilter.testUnigramsAndBigramsAllScripts — bigrams are
    # posInc=0 overlaps spanning two unigram positions
    t, p = terms_pos("多くの学生が試験に落ちた。", output_unigrams=True)
    assert t == ["多", "多く", "く", "くの", "の", "の学", "学", "学生",
                 "生", "生が", "が", "が試", "試", "試験", "験", "験に",
                 "に", "に落", "落", "落ち", "ち", "ちた", "た"]
    assert p == [0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7,
                 8, 8, 9, 9, 10, 10, 11]
    _, _, length, overlaps = cjk_analyze_text(
        "多くの学生が試験に落ちた。", stopwords=NO_STOP,
        output_unigrams=True)
    assert length == 12 and overlaps == 11
    # testUnigramsAndBigramsHanOnly
    t, p = terms_pos("多くの学生が試験に落ちた。", flags=HAN,
                     output_unigrams=True)
    assert t == ["多", "く", "の", "学", "学生", "生", "が", "試",
                 "試験", "験", "に", "落", "ち", "た"]
    assert p == [0, 1, 2, 3, 3, 4, 5, 6, 6, 7, 8, 9, 10, 11]


def test_surrogates_and_scripts():
    # TestCJKAnalyzer.testSurrogates: supplementary-plane Han bigram
    assert terms_pos("𩬅艱鍟䇹愯瀛")[0] == ["𩬅艱", "艱鍟", "鍟䇹", "䇹愯", "愯瀛"]
    # testNonIdeographic: non-CJK scripts pass through
    assert terms_pos("一 روبرت موير")[0] == ["一", "روبرت", "موير"]
    # halfwidth katakana folds then bigrams
    assert terms_pos("ｶﾀｶﾅ")[0] == ["カタ", "タカ", "カナ"]


def test_hangul_longest_match():
    # CJKBigramFilter javadoc: mixed Hangul+Latin stays ALPHANUM (not
    # bigrammed); pure Hangul runs bigram
    assert terms_pos("한국abc")[0] == ["한국abc"]
    t, _ = terms_pos("한국어")
    assert t == ["한국", "국어"]
    # hangul disabled → run passes through whole
    assert terms_pos("한국어", flags=HAN)[0] == ["한국어"]


def test_stop_filter_gaps():
    # chain ends with StopFilter: dropped tokens keep position gaps
    t, p, length, ov = cjk_analyze_text("the 学生 of data",
                                        stopwords=CJK_STOP_WORDS)
    assert t == ["学生", "data"] and p == [1, 3]
    assert length == 2 and ov == 0
    # default stop set includes the cjk additions s/t/www
    assert {"s", "t", "www", "the"} <= CJK_STOP_WORDS


def test_overlong_token_gap():
    # >255-char token: dropped at the tokenizer, position consumed,
    # bigram buffer flushed by the offset gap
    big = "x" * 300
    t, p = terms_pos(f"一二 {big} 三四")
    assert t == ["一二", "三四"] and p == [0, 2]


def test_batch_equals_text():
    texts = ["多くの学生が試験に落ちた。", "", "Ｔｅｓｔ ｳﾞｨｯﾂ data",
             "一 二三四 the 한국어", None, "plain english only"]
    doc_idx, terms, positions, lengths, overlaps = cjk_analyze_batch(
        pd.Series(texts, dtype=object), stopwords=CJK_STOP_WORDS,
        output_unigrams=True)
    off = 0
    for i, s in enumerate(texts):
        t, p, ln, ov = cjk_analyze_text(s or "",
                                        stopwords=CJK_STOP_WORDS,
                                        output_unigrams=True)
        n = len(t)
        assert list(terms[off:off + n]) == t
        assert list(positions[off:off + n]) == p
        assert (doc_idx[off:off + n] == i).all()
        assert lengths[i] == ln and overlaps[i] == ov
        off += n
    assert off == len(terms)


def test_index_parity_vs_pre_bigrammed(spark):
    """End-to-end: build_index(cjk_bigrams) over raw CJK text scores
    bit-identically to a whitespace-tokenizer index over the SAME
    stream pre-bigrammed (bigram-only mode emits every token at
    posInc 1, so the two token streams are equal by construction)."""
    from lucene_spark.operators.build import build_index
    from lucene_spark.operators.search import Searcher
    from lucene_spark.plans import query as Q
    from lucene_spark.sources.corpus import generate_corpus

    pdf = generate_corpus(120, seed=13)
    phrases = ["多くの学生", "試験に落ちた", "データ処理", "한국어 검색"]
    pdf = pdf.assign(content=[
        f"{phrases[i % 4]} {c}" if i % 3 == 0 else c
        for i, c in enumerate(pdf.content)])

    pre = pdf.assign(content=[
        " ".join(cjk_analyze_text(c, stopwords=NO_STOP)[0])
        for c in pdf.content])

    tmp = tempfile.mkdtemp(prefix="cjk_idx_")
    d_cjk, d_ws = os.path.join(tmp, "cjk"), os.path.join(tmp, "ws")
    build_index(spark, spark.createDataFrame(pdf[["doc_id", "content"]]),
                d_cjk, num_segments=4, cjk_bigrams=ALL_CJK,
                stopwords=frozenset())
    build_index(spark, spark.createDataFrame(pre[["doc_id", "content"]]),
                d_ws, num_segments=4, tokenizer="whitespace",
                stopwords=frozenset())

    s_cjk, s_ws = Searcher(spark, d_cjk), Searcher(spark, d_ws)
    for q in (Q.Term("学生"), Q.Term("試験"), Q.Term("한국"),
              Q.Phrase(("デー", "ータ")),
              Q.And((Q.Term("多く"), Q.Term("くの")))):
        a = [(r["doc_id"], r["score"])
             for r in s_cjk.search(q, k=10).collect()]
        b = [(r["doc_id"], r["score"])
             for r in s_ws.search(q, k=10).collect()]
        assert a == b and a, q
