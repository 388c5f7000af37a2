"""ICU Normalizer2 / ICUFoldingFilter parity.

``tests/data/icu/norm_golden.tsv.gz``: 4,469 fuzz strings normalized
by the REAL icu4j 77.1 (nfc / nfkc / nfkc_cf) — the Python
normalization algorithm + dumped tables must replay byte-exact.

The utr30 fold table is built from the reference's own gennorm2
sources; behavior pinned by the transcoded TestICUFoldingFilter
goldens below.
"""

import gzip
import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "icu",
                      "norm_golden.tsv.gz")


def test_norm_goldens_exact():
    from lucene_spark.functions.icunorm import normalize
    bad = []
    n = 0
    with gzip.open(GOLDEN, "rt", encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) != 4:
                continue
            s, nfc, nfkc, nfkc_cf = parts
            n += 1
            for which, exp in (("nfc", nfc), ("nfkc", nfkc),
                               ("nfkc_cf", nfkc_cf)):
                if normalize(s, which) != exp:
                    bad.append((which, s))
    assert n > 4000 and not bad, (len(bad), bad[:5])


# TestICUFoldingFilter.java:48-86 goldens (one whitespace token each)
_FOLD_CASES = [
    ("This", "this"), ("is", "is"), ("a", "a"), ("test", "test"),
    ("Ruß", "russ"),
    ("ΜΆΪΟΣ", "μαιοσ"), ("Μάϊος", "μαιοσ"),
    ("𐐖", "𐐾"),
    ("ﴳﴺﰧ", "طمطمطم"),
    ("क्‍ष", "कष"),
    ("résumé", "resume"),
    ("résumé", "resume"),
    ("৭০৬", "706"),
    ("đis", "dis"), ("cræzy", "craezy"),
    ("ELİF", "elif"),
    ("eli̇f", "elif"),
]


@pytest.mark.parametrize("src,expected", _FOLD_CASES)
def test_folding_goldens(src, expected):
    from lucene_spark.functions.icunorm import icu_fold
    assert icu_fold(src) == expected


def test_fold_consistent_with_nfkc_cf_where_unfolded():
    # where no fold file touches the decomposition chain, utr30 must
    # agree with nfkc_cf (both end in the same data file)
    from lucene_spark.functions.icunorm import icu_fold, normalize
    for s in ("HELLO", "ｆｕｌｌ", "ﬁnal", "Straße", "ΣΟΦΟΣ", "İ"):
        assert icu_fold(s) == normalize(s, "nfkc_cf").replace("̇", "") \
            or icu_fold(s) == normalize(s, "nfkc_cf")


def test_analyze_chain_icu_folding():
    from lucene_spark.functions.analysis import analyze_batch, analyze_text
    import pandas as pd
    terms, positions, n = analyze_text("Ǻngström résumé ΜΆΪΟΣ",
                                       icu_folding=True)
    assert terms == ["angstrom", "resume", "μαιοσ"]
    di, te, po, le = analyze_batch(
        pd.Series(["Ǻngström résumé", "৭০৬ Ruß"]), icu_folding=True)
    assert list(te) == ["angstrom", "resume", "706", "russ"]


def test_normalizer_role():
    # ICUNormalizer2Filter default = nfkc_cf (keeps case-folded
    # composed forms, does NOT strip accents)
    from lucene_spark.functions.analysis import analyze_text
    terms, _, _ = analyze_text("Résumé", icu_folding="nfkc_cf",
                               lowercase=False)
    assert terms == ["résumé"]


def test_hangul_roundtrip():
    from lucene_spark.functions.icunorm import normalize
    decomposed = "각"  # 각 as jamo
    assert normalize(decomposed, "nfc") == "각"
    assert normalize("각", "nfkc_cf") == "각"
    assert normalize(decomposed, "utr30") == "각"


def test_icu_normalize_char_filter():
    from lucene_spark.functions.charfilter import compile_char_filters
    f = compile_char_filters((("icu_normalize", "utr30"),))
    assert f("Ǻngström RÉSUMÉ") == "angstrom resume"
    g = compile_char_filters((("icu_normalize",),))
    assert g("Ｆｕｌｌ") == "full"
