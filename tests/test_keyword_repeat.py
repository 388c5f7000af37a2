"""KeywordRepeatFilter → StemFilter → RemoveDuplicatesTokenFilter
(reference ``miscellaneous/KeywordRepeatFilter.java``,
``miscellaneous/RemoveDuplicatesTokenFilter.java``,
``TestKeywordRepeatFilter.java``): original surface tokens keep their
positions, stemmed copies land as posInc-0 overlaps, no-op stems
collapse to a single token."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from lucene_spark.functions.analysis import (analyze_batch, analyze_text,
                                             expand_keyword_repeat_batch,
                                             expand_keyword_repeat_text)


def test_keyword_repeat_goldens():
    """TestKeywordRepeatFilter.testBasic structure with the Porter
    chain: stems that differ overlay at the source position (posInc 0),
    no-op stems emit once (RemoveDuplicates). The reference golden uses
    Snowball English (birds→bird, flying→fli); Porter gives are→ar and
    flying→fly, so the expected pairs here are Porter's."""
    terms, positions, _ = analyze_text("the birds are flying")
    t2, p2, n_over = expand_keyword_repeat_text(terms, positions, "porter")
    got = sorted(zip(t2, p2))
    assert got == sorted([("the", 0), ("birds", 1), ("bird", 1),
                          ("are", 2), ("ar", 2), ("flying", 3),
                          ("fly", 3)])
    assert n_over == 3  # 'the' collapsed — stem == original


def test_keyword_repeat_composition_idempotent():
    """TestKeywordRepeatFilter.testComposition: stacking KeywordRepeat
    twice still yields one original + one stemmed copy (the duplicate
    collapse is position-scoped)."""
    terms, positions, _ = analyze_text("the birds are flying")
    t1, p1, _ = expand_keyword_repeat_text(terms, positions, "porter")
    # re-running over the expanded stream must not add anything new:
    # every (term, pos) pair already present collapses
    t2, p2, _ = expand_keyword_repeat_text(t1, p1, "porter")
    extra = sorted(zip(t2, p2))
    base = sorted(zip(t1, p1))
    # second pass adds only re-stems of already-stemmed forms that
    # change again; for this fixture Porter is idempotent on its output
    assert [x for x in extra if x not in base] == []


def test_keyword_repeat_batch_matches_text():
    texts = pd.Series(["the birds are flying", "", "filter filters table",
                       "bird"])
    doc_idx, terms, positions, lengths = analyze_batch(texts)
    d2, t2, p2, over = expand_keyword_repeat_batch(
        doc_idx, terms, positions, len(texts), "porter")
    got = sorted(zip(d2.tolist(), t2.tolist(), p2.tolist()))
    want = []
    for i, tx in enumerate(texts):
        ts, ps, _ = analyze_text(tx)
        et, ep, _ = expand_keyword_repeat_text(ts, ps, "porter")
        want.extend((i, t, p) for t, p in zip(et, ep))
    assert got == sorted(want)
    # overlap counts = added stem copies per doc ('filter' is a Porter
    # fixpoint — only filters→filter and table→tabl overlay in doc 2)
    assert over.tolist() == [3, 0, 2, 0]
    # norm lengths (surface counts) are untouched by the expansion
    assert lengths.tolist() == [4, 0, 3, 1]


def test_keyword_repeat_invert_parity_vs_synonyms():
    """Bit-exact kernel parity: keyword_repeat ≡ index-time synonym
    expansion with the map {surface: [stem]} for every changed surface —
    an independent overlay mechanism with identical graph semantics."""
    from collections import Counter

    from lucene_spark.functions.stem import porter_stem
    from lucene_spark.operators.build import invert_segment
    from lucene_spark.sources.corpus import generate_corpus

    corpus = generate_corpus(80, seed=7)
    pdf = pd.DataFrame({"doc_id": corpus.doc_id,
                        "content": corpus.content})
    vocab = set()
    for t in corpus.content:
        vocab.update(analyze_text(str(t))[0])
    syn = {u: [porter_stem(u)] for u in vocab if porter_stem(u) != u}

    a = invert_segment(pdf, 0, "content", "doc_id", frozenset(), True,
                       stemmer="porter", keyword_repeat=True)
    b = invert_segment(pdf, 0, "content", "doc_id", frozenset(), True,
                       synonyms=syn)
    for x, y in zip(a[:2], b[:2]):
        pd.testing.assert_frame_equal(
            x.reset_index(drop=True), y.reset_index(drop=True))
    assert a[2].keys() == b[2].keys()
    for k in a[2]:
        va, vb = a[2][k], b[2][k]
        if isinstance(va, (bytes, bytearray, np.ndarray)):
            assert bytes(va) == bytes(vb), k
        else:
            assert va == vb, k
    assert a[3] == b[3]  # sum_token_len includes the overlays


def test_keyword_repeat_requires_stemmer():
    from lucene_spark.operators.build import invert_segment
    pdf = pd.DataFrame({"doc_id": [0], "content": ["x"]})
    with pytest.raises(ValueError, match="requires a stemmer"):
        invert_segment(pdf, 0, "content", "doc_id", frozenset(), True,
                       keyword_repeat=True)
    with pytest.raises(ValueError, match="greek"):
        invert_segment(pdf, 0, "content", "doc_id", frozenset(), True,
                       stemmer="greek", keyword_repeat=True)
