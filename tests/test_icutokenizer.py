"""ICUTokenizer port vs the COMPILED reference
(tools/gen_icu_tokenizer_goldens.py: the reference's own
analysis/icu/segmentation classes + its shipped Default.brk /
MyanmarSyllable.brk resources, run against the icu4j 77.1 jar the
local Spark distribution ships): 2000 mixed-script fuzz texts —
Latin/Cyrillic/Greek/Arabic/Hebrew/Han/Hiragana/Katakana/Hangul/Thai/
Lao/Burmese/Khmer/digits/emoji — must reproduce every token's
(start, end, type, script) EXACTLY, including the CJK dictionary
Viterbi and all four Southeast-Asian dictionary engines
(PossibleWord lookahead)."""

import base64
import gzip
import os

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "icu",
                      "icu_tokenizer_fuzz.tsv.gz")


def _load():
    out = []
    with gzip.open(GOLDEN, "rt", encoding="utf-8") as f:
        for ln in f:
            parts = ln.rstrip("\n").split("\t")
            text = base64.b64decode(parts[0]).decode("utf-8")
            exp = []
            for tok in parts[1:]:
                if not tok:
                    continue
                s, e, ty, sc = tok.rsplit(":", 3)
                exp.append((int(s), int(e), ty, int(sc)))
            out.append((text, exp))
    return out


def test_icu_tokenizer_replays_reference():
    from lucene_spark.functions.icutokenizer import icu_tokenize
    cases = _load()
    assert len(cases) == 2000
    bad = 0
    total_tokens = 0
    for text, exp in cases:
        got = [(s, e, ty, sc)
               for (_t, s, e, ty, sc) in icu_tokenize(text)]
        total_tokens += len(exp)
        if got != exp:
            bad += 1
            assert bad == 0, (text, exp[:6], got[:6])
    assert total_tokens > 15000


def test_icu_tokenizer_shapes():
    from lucene_spark.functions.icutokenizer import icu_tokenize
    # CJ dictionary segmentation (cjdict Viterbi)
    toks = [t for t, *_ in icu_tokenize("東京大学のコンピュータ")]
    assert toks == ["東京", "大学", "の", "コンピュータ"]
    # SEA dictionary segmentation (PossibleWord walk), all 4 engines
    toks = [t for t, *_ in icu_tokenize("การวิเคราะห์ข้อมูล")]
    assert toks == ["การ", "วิเคราะห์", "ข้อมูล"]
    toks = [t for t, *_ in icu_tokenize("ການວິເຄາະຂໍ້ມູນ")]
    assert toks == ["ການ", "ວິເຄາະ", "ຂໍ້ມູນ"]
    toks = [t for t, *_ in icu_tokenize("မြန်မာစာပေးစာယူ")]
    assert toks == ["မြန်မာ", "စာပေးစာယူ"]
    toks = [t for t, *_ in icu_tokenize("ការវិភាគទិន្នន័យ")]
    assert toks == ["ការវិភាគ", "ទិន្នន័យ"]
    # types and scripts
    out = icu_tokenize("data 東京 한국어 1️⃣")
    assert [(t, ty, sc) for t, _s, _e, ty, sc in out] == [
        ("data", "<ALPHANUM>", 25),
        ("東京", "<IDEOGRAPHIC>", 105),
        ("한국어", "<HANGUL>", 18),
        # trailing COMMON chars stay in the preceding run, so the
        # keycap reports the run's script (ScriptIterator semantics)
        ("1️⃣", "<EMOJI>", 18),
    ]
    # surrogates: offsets are UTF-16 units like the reference
    out = icu_tokenize("a 𝔞𝔟 b")   # mathematical fraktur, ALetter
    assert [(s, e) for _t, s, e, _ty, _sc in out] == [(0, 1), (2, 6),
                                                      (7, 8)]


def test_icu_analyzer_chain():
    from lucene_spark.functions.analysis import analyze_text
    terms, _pos, n = analyze_text("Hello 東京大学のデータ", tokenizer="icu")
    assert terms == ["hello", "東京", "大学", "の", "データ"]
    assert n == 5


def test_icu_language_preset():
    """language_analyzer_kwargs("icu") = ICUTokenizer + ICUFoldingFilter
    (the icu module's analyzer role). The fold is the golden-verified
    UTR#30 pipeline (accents stripped, case folded — including the
    katakana voicing marks UTR#30 removes)."""
    from lucene_spark.functions.analysis import analyze_text
    from lucene_spark.functions.lightstem import language_analyzer_kwargs
    kw = language_analyzer_kwargs("icu")
    terms, _pos, _n = analyze_text("Résumé 東京大学 Naïve", **kw)
    assert terms == ["resume", "東京", "大学", "naive"]
