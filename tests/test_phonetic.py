"""Phonetic encoders + PhoneticFilter overlay/replace semantics.

Vectors transcoded from the reference
``analysis/phonetic/src/test/.../TestPhoneticFilter.java`` plus the
canonical published examples for each algorithm (NARA Soundex pairs,
Caverphone 2.0 paper, the codec dependency's documented NYSIIS values).
"""

import pandas as pd

from lucene_spark.functions.phonetic import (
    caverphone2,
    nysiis,
    refined_soundex,
    soundex,
)
from lucene_spark.operators.build import invert_segment


def _invert(docs, **kw):
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "content": docs})
    postings, doc_meta, norms, _ = invert_segment(
        pdf, 0, "content", "doc_id", frozenset(), True, **kw)
    return postings, doc_meta


def test_soundex_reference_vectors():
    assert [soundex(t) for t in "aaa bbb ccc easgasg".split()] == \
        ["A000", "B000", "C000", "E220"]


def test_soundex_classic_pairs():
    assert soundex("Robert") == soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == soundex("Ashcroft") == "A261"  # H rule
    assert soundex("Tymczak") == "T522"   # vowel resets the last digit
    assert soundex("Pfister") == "P236"
    assert soundex("Honeyman") == "H555"
    assert soundex("") == "" and soundex("123") == ""


def test_refined_soundex_reference_vectors():
    assert [refined_soundex(t) for t in "aaa bbb ccc easgasg".split()] \
        == ["A0", "B1", "C3", "E034034"]


def test_caverphone2_reference_vectors():
    assert [caverphone2(t) for t in "Darda Karleen Datha Carlene".split()] \
        == ["TTA1111111", "KLN1111111", "TTA1111111", "KLN1111111"]
    assert caverphone2("Peter") == "PTA1111111"
    assert caverphone2("Stevenson") == "STFNSN1111"


def test_nysiis_reference_vectors():
    assert [nysiis(t) for t in "aaa bbb ccc easgasg".split()] == \
        ["A", "B", "C", "EASGAS"]
    assert nysiis("MACINTOSH") == "MCANT"
    assert nysiis("KNUTH") == "NAT"
    assert nysiis("PHILLIPSON") == "FALAPS"
    assert nysiis("easgasg", strict=False) == "EASGASG"


def test_phonetic_filter_inject_overlays():
    # inject=true: encoded form at the same position, norm-discounted
    p, meta = _invert(["robert rupert small"],
                      phonetic=("soundex", True))
    by = p.set_index("term")
    # encoder output is emitted raw (uppercase), like the reference
    assert int(by.loc["R163", "ttf"]) == 2    # robert + rupert overlay
    assert int(by.loc["R163", "df"]) == 1
    assert "robert" in by.index and "small" in by.index
    assert int(meta["doc_len"].iloc[0]) == 3  # overlays discounted


def test_phonetic_filter_replace():
    p, _ = _invert(["robert rupert small"],
                   phonetic=("soundex", False))
    by = p.set_index("term")
    assert int(by.loc["R163", "ttf"]) == 2
    assert "robert" not in by.index
    assert "S540" in by.index   # small replaced too


def test_phonetic_unencodable_not_injected():
    # a term that cleans to nothing produces no phonetic form
    # (PhoneticFilter swallows the encoder failure, keeps the token);
    # 'a000' DOES get an overlay because its encoding 'A000' differs
    p, _ = _invert(["42 a000"], phonetic=("soundex", True))
    assert sorted(p["term"]) == ["42", "A000", "a000"]
