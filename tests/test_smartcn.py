"""smartcn (SmartChineseAnalyzer / HHMM segmenter): golden parity with
the reference's own Java implementation + the JDK sentence-break DFA.

``tests/data/smartcn/golden.tsv.gz`` holds 1,114 mixed zh/latin texts
with the JDK sentence boundaries and the reference WordSegmenter token
streams (term/start/end/wordType, UTF-16 offsets), produced by
compiling and running the reference sources over the shipped coredict
plus the committed synthetic bigram table
(``tools/gen_smartcn_goldens.py`` — the reference tree ships no
bigramdict.mem, so the bigram data is deterministic-synthetic while
the ALGORITHM is verified end to end).

``sb_probes.tsv.gz`` holds 13,307 crafted boundary probes replayed
against the ``sentbreak`` DFA port.
"""

import gzip
import os

import pandas as pd
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data", "smartcn")


def _u16pref(text):
    pref = [0]
    for c in text:
        pref.append(pref[-1] + (2 if ord(c) > 0xFFFF else 1))
    return pref


def _golden_texts():
    texts = []
    cur = None
    with gzip.open(os.path.join(DATA, "golden.tsv.gz"), "rt",
                   encoding="utf-8") as f:
        for line in f:
            p = line.rstrip("\n").split("\t")
            if p[0] == "TEXT":
                cur = {"t": p[1], "sents": [], "toks": []}
                texts.append(cur)
            elif p[0] == "SENT":
                cur["sents"].append((int(p[1]), int(p[2])))
            elif p[0] == "TOK":
                cur["toks"].append((p[1], int(p[2]), int(p[3]), int(p[4])))
    return texts


def test_golden_sentences_and_tokens_exact():
    from lucene_spark.functions.sentbreak import sentence_spans
    from lucene_spark.functions.smartcn import segment_sentence
    bad_sent = bad_tok = 0
    texts = _golden_texts()
    for x in texts:
        t = x["t"]
        pref = _u16pref(t)
        spans = sentence_spans(t)
        if [(pref[a], pref[b]) for a, b in spans] != x["sents"]:
            bad_sent += 1
            continue
        toks = []
        for a, b in spans:
            for tk in segment_sentence(t[a:b], 0):
                toks.append((tk.text, pref[a + tk.start],
                             pref[a + tk.end], tk.word_type))
        if toks != x["toks"]:
            bad_tok += 1
    assert bad_sent == 0 and bad_tok == 0, (bad_sent, bad_tok, len(texts))


def test_sentence_probe_grid_exact():
    from lucene_spark.functions.sentbreak import sentence_boundaries_utf16
    bad = []
    n = 0
    with gzip.open(os.path.join(DATA, "sb_probes.tsv.gz"), "rt",
                   encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 2:
                continue
            t = "\t".join(parts[:-1])
            exp = [int(v) for v in parts[-1].split(",") if v]
            n += 1
            if sentence_boundaries_utf16(t) != exp:
                bad.append(t)
    assert n > 13000 and not bad, (len(bad), bad[:5])


# transcoded TestSmartChineseAnalyzer expectations
_CASES = [
    ("我购买了道具和服装。", ["我", "购买", "了", "道具", "和", "服装"]),
    ("我购买了道具和服装。 我购买了道具和服装。",
     ["我", "购买", "了", "道具", "和", "服装"] * 2),
    ("我购买了道具和服装　我购买了道具和服装。",
     ["我", "购买", "了", "道具", "和", "服装"] * 2),
    ("我购买 Tests 了道具和服装",
     ["我", "购买", "test", "了", "道具", "和", "服装"]),
    ("我购买 Tests 了道具和服装1234",
     ["我", "购买", "test", "了", "道具", "和", "服装", "1234"]),
    ("我购买 Ｔｅｓｔｓ 了道具和服装１２３４",
     ["我", "购买", "test", "了", "道具", "和", "服装", "1234"]),
    ("我购买︱ Tests 了道具和服装",
     ["我", "购买", "test", "了", "道具", "和", "服装"]),
    # testSurrogatePairCharacter — each astral cp is its own token
    ("\U0002cb3b\U0002cb4a\U0002cb73\U0002cb5b鿏\U0002b7fc"
     "\U0002cb2d鿔",
     ["\U0002cb3b", "\U0002cb4a", "\U0002cb73", "\U0002cb5b",
      "鿏", "\U0002b7fc", "\U0002cb2d", "鿔"]),
]


@pytest.mark.parametrize("text,expected", _CASES)
def test_analyzer_chain_transcoded(text, expected):
    from lucene_spark.functions.analysis import analyze_text
    from lucene_spark.functions.smartcn import smartcn_stop_set
    terms, _, _ = analyze_text(text, tokenizer="smartcn",
                               stemmer="porter",
                               stopwords=smartcn_stop_set())
    assert terms == expected


def test_stopwords_off_comma():
    # testChineseStopWordsOff: the IDEOGRAPHIC FULL STOP surfaces as ','
    from lucene_spark.functions.analysis import analyze_text
    terms, _, _ = analyze_text("我购买了道具和服装。",
                               tokenizer="smartcn", stemmer="porter")
    assert terms == ["我", "购买", "了", "道具", "和", "服装", ","]


def test_position_gap_after_stopword():
    # testChineseStopWords2: "Title:San" -> titl(0), san(posIncr 2)
    from lucene_spark.functions.analysis import analyze_text
    from lucene_spark.functions.smartcn import smartcn_stop_set
    terms, positions, _ = analyze_text("Title:San", tokenizer="smartcn",
                                       stemmer="porter",
                                       stopwords=smartcn_stop_set())
    assert terms == ["titl", "san"]
    assert positions == [0, 2]


def test_batch_matches_text_path():
    from lucene_spark.functions.analysis import analyze_batch, analyze_text
    from lucene_spark.functions.smartcn import smartcn_stop_set
    kw = dict(tokenizer="smartcn", stemmer="porter",
              stopwords=smartcn_stop_set())
    docs = [t for t, _ in _CASES[:6]] + ["", "pure ascii text here"]
    di, te, po, le = analyze_batch(pd.Series(docs), **kw)
    off = 0
    for i, d in enumerate(docs):
        t_exp, p_exp, n_exp = analyze_text(d, **kw)
        k = int(le[i])
        assert list(te[off:off + k]) == t_exp
        assert list(po[off:off + k]) == p_exp
        off += k


def test_stop_set_contents():
    from lucene_spark.functions.smartcn import smartcn_stop_set
    s = smartcn_stop_set()
    assert "," in s and "。" in s and "　" in s and "/" in s
    assert not any(w.startswith("//") for w in s)
