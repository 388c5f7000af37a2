"""DictionaryCompoundWordTokenFilter (reference
``compound/DictionaryCompoundWordTokenFilter.java``; goldens transcoded
from ``TestCompoundWordTokenFilter.java``)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_spark.functions.compound import (decompose_token,
                                             expand_compound_batch,
                                             expand_compound_text)

_DICT_SE = frozenset(
    "Bil Dörr Motor Tak Borr Slag Hammar Pelar Glas Ögon Fodral Bas Fiol "
    "Makare Gesäll Sko Vind Rute Torkare Blad".split())

#: testDumbCompoundWordsSE — token → subwords (original-case slices,
#: case-insensitive dictionary match)
_SE_GOLDENS = {
    "Bildörr": ["Bil", "dörr"], "Bilmotor": ["Bil", "motor"],
    "Biltak": ["Bil", "tak"], "Slagborr": ["Slag", "borr"],
    "Hammarborr": ["Hammar", "borr"], "Pelarborr": ["Pelar", "borr"],
    "Glasögonfodral": ["Glas", "ögon", "fodral"],
    "Basfiolsfodral": ["Bas", "fiol", "fodral"],
    "Basfiolsfodralmakaregesäll":
        ["Bas", "fiol", "fodral", "makare", "gesäll"],
    "Skomakare": ["Sko", "makare"],
    "Vindrutetorkare": ["Vind", "rute", "torkare"],
    "Vindrutetorkarblad": ["Vind", "rute", "blad"],
    "abba": [],
}


def test_decompose_goldens():
    for tok, want in _SE_GOLDENS.items():
        assert decompose_token(tok, _DICT_SE) == want, tok


def test_decompose_longest_match():
    """testDumbCompoundWordsSELongestMatch: onlyLongestMatch keeps the
    longest dictionary hit PER START (Fiolsfodral over Fiols), later
    starts still scanned (fodral at i=8 also emitted)."""
    d = _DICT_SE | frozenset(["Fiols", "Fiolsfodral"])
    got = decompose_token("Basfiolsfodralmakaregesäll", (d, 5, 2, 15, True))
    assert got == ["Bas", "fiolsfodral", "fodral", "makare", "gesäll"]


def test_min_word_and_subword_bounds():
    # tokens shorter than minWordSize skipped entirely
    assert decompose_token("Bil", _DICT_SE) == []
    # maxSubword caps the scan window
    d = frozenset(["abcdef"])
    assert decompose_token("abcdefgh", (d, 5, 2, 5, False)) == []
    assert decompose_token("abcdefgh", (d, 5, 2, 6, False)) == ["abcdef"]
    # a dictionary word that IS the token re-emits itself (faithful)
    assert decompose_token("index", frozenset(["index"])) == ["index"]


def test_expand_stream_positions():
    """Subword overlays carry the source token's position; the golden's
    posInc pattern [1,0,0,1,0,0,...] means original-at-posInc-1 +
    overlays-at-posInc-0 — in our appended representation, same (term,
    position) multiset."""
    toks = ["Bildörr", "abba", "Skomakare"]
    t2, p2, n_over = expand_compound_text(toks, [0, 1, 2], _DICT_SE)
    assert sorted(zip(t2, p2)) == sorted(
        [("Bildörr", 0), ("Bil", 0), ("dörr", 0), ("abba", 1),
         ("Skomakare", 2), ("Sko", 2), ("makare", 2)])
    assert n_over == 4

    di = np.array([0, 0, 1], dtype=np.int64)
    tm = np.array(toks, dtype=object)
    ps = np.array([0, 1, 0], dtype=np.int64)
    d2, t2, p2, over = expand_compound_batch(di, tm, ps, 2, _DICT_SE)
    assert sorted(zip(d2.tolist(), t2.tolist(), p2.tolist())) == sorted(
        [(0, "Bildörr", 0), (0, "Bil", 0), (0, "dörr", 0), (0, "abba", 1),
         (1, "Skomakare", 0), (1, "Sko", 0), (1, "makare", 0)])
    assert over.tolist() == [2, 2]


def test_compound_invert_parity_vs_synonyms():
    """Bit-exact kernel parity: dictionary_compound ≡ index-time synonym
    expansion with the map {token: decompose(token)} — same overlay
    graph through an independent mechanism."""
    from lucene_spark.operators.build import invert_segment
    from lucene_spark.functions.analysis import analyze_text
    from lucene_spark.sources.corpus import generate_corpus

    corpus = generate_corpus(60, seed=9)
    pdf = pd.DataFrame({"doc_id": corpus.doc_id,
                        "content": corpus.content})
    words = frozenset(["scan", "index", "table", "score", "read"])
    vocab = set()
    for t in corpus.content:
        vocab.update(analyze_text(str(t))[0])
    syn = {u: decompose_token(u, words) for u in vocab}
    syn = {u: subs for u, subs in syn.items() if subs}

    a = invert_segment(pdf, 0, "content", "doc_id", frozenset(), True,
                       dictionary_compound=words)
    b = invert_segment(pdf, 0, "content", "doc_id", frozenset(), True,
                       synonyms=syn)
    for x, y in zip(a[:2], b[:2]):
        pd.testing.assert_frame_equal(
            x.reset_index(drop=True), y.reset_index(drop=True))
    assert a[3] == b[3]
