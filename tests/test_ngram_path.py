"""NGram family + path-hierarchy tokenizers.

Token/position goldens transcoded from the reference tests:
``analysis/common/src/test/.../ngram/TestNGramTokenFilter.java``,
``TestEdgeNGramTokenFilter.java``, ``TestNGramTokenizer.java``,
``.../path/TestPathHierarchyTokenizer.java``,
``TestReversePathHierarchyTokenizer.java``.

Position convention: the reference asserts position INCREMENTS; we store
absolute positions, so a golden increment list [1,0,0,2,...] maps to
cumulative sums - 1 ([0,0,0,2,...]).
"""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.functions.ngram import (expand_ngrams_batch,
                                          ngram_tokenize,
                                          ngram_tokenize_batch,
                                          path_tokenize,
                                          path_tokenize_batch,
                                          token_ngrams)


def _filter_stream(tokens_positions, mn, mx, preserve=False, edge=False):
    """Run expand_ngrams_batch over one doc's (term, pos) stream and
    return (terms, absolute_positions, norm_len, overlaps)."""
    terms = np.array([t for t, _ in tokens_positions], dtype=object)
    pos = np.array([p for _, p in tokens_positions], dtype=np.int64)
    didx = np.zeros(len(terms), dtype=np.int64)
    d, t, p, lens, over = expand_ngrams_batch(
        didx, terms, pos, 1, mn, mx, preserve, edge)
    assert (d == 0).all()
    return list(t), list(p), int(lens[0]), int(over[0])


class TestNGramFilter:
    def test_ngrams_1_3(self):
        # TestNGramTokenFilter.testNgrams: "abcde" @1..3, posInc 1,0,0...
        t, p, ln, ov = _filter_stream([("abcde", 0)], 1, 3)
        assert t == ["a", "ab", "abc", "b", "bc", "bcd", "c", "cd",
                     "cde", "d", "de", "e"]
        assert p == [0] * 12
        assert (ln, ov) == (1, 11)

    def test_oversized(self):
        # testOversizedNgrams: min 6 > len 5 -> nothing
        t, p, ln, ov = _filter_stream([("abcde", 0)], 6, 7)
        assert t == [] and ln == 0 and ov == 0

    def test_oversized_preserve_original(self):
        t, p, ln, ov = _filter_stream([("abcde", 0)], 6, 6, preserve=True)
        assert t == ["abcde"] and p == [0] and (ln, ov) == (1, 0)

    def test_small_token_in_stream(self):
        # testSmallTokenInStream: "abc de fgh" @3..3 -> abc(+1), fgh(+2)
        t, p, ln, ov = _filter_stream(
            [("abc", 0), ("de", 1), ("fgh", 2)], 3, 3)
        assert t == ["abc", "fgh"]
        assert p == [0, 2]          # increments 1, 2
        assert (ln, ov) == (2, 0)

    def test_small_token_preserve(self):
        t, p, ln, ov = _filter_stream(
            [("abc", 0), ("de", 1), ("fgh", 2)], 3, 3, preserve=True)
        assert t == ["abc", "de", "fgh"]
        assert p == [0, 1, 2]
        assert (ln, ov) == (3, 0)

    def test_keep_short_keep_long(self):
        # testKeepShortTermKeepLongTerm: "a bcd efghi jk" @2..3
        stream = [("a", 0), ("bcd", 1), ("efghi", 2), ("jk", 3)]
        t, p, ln, ov = _filter_stream(stream, 2, 3)
        assert t == ["bc", "bcd", "cd", "ef", "efg", "fg", "fgh", "gh",
                     "ghi", "hi", "jk"]
        # golden increments [2,0,0,1,0,0,0,0,0,0,1] -> absolute 1,1,1,2*7,3
        assert p == [1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 3]
        assert (ln, ov) == (3, 8)
        t, p, ln, ov = _filter_stream(stream, 2, 3, preserve=True)
        assert t == ["a", "bc", "bcd", "cd", "ef", "efg", "fg", "fgh",
                     "gh", "ghi", "hi", "efghi", "jk"]
        assert p == [0, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2, 3]
        assert (ln, ov) == (4, 9)

    def test_gram_size_validation(self):
        with pytest.raises(ValueError):
            token_ngrams("abc", 0, 2)
        with pytest.raises(ValueError):
            token_ngrams("abc", 3, 2)


class TestEdgeNGramFilter:
    def test_front_unigram(self):
        t, p, ln, ov = _filter_stream([("abcde", 0)], 1, 1, edge=True)
        assert t == ["a"] and (ln, ov) == (1, 0)

    def test_front_range(self):
        # testFrontRangeOfNgrams: "abcde" @1..3 -> a, ab, abc
        t, p, ln, ov = _filter_stream([("abcde", 0)], 1, 3, edge=True)
        assert t == ["a", "ab", "abc"]
        assert p == [0, 0, 0]
        assert (ln, ov) == (1, 2)

    def test_oversized_preserve(self):
        t, p, ln, ov = _filter_stream([("abcde", 0)], 6, 6, edge=True,
                                      preserve=True)
        assert t == ["abcde"] and (ln, ov) == (1, 0)

    def test_filter_positions(self):
        # testFilterPositions: "abcde vwxyz" @1..3
        t, p, ln, ov = _filter_stream([("abcde", 0), ("vwxyz", 1)], 1, 3,
                                      edge=True)
        assert t == ["a", "ab", "abc", "v", "vw", "vwx"]
        assert p == [0, 0, 0, 1, 1, 1]
        assert (ln, ov) == (2, 4)

    def test_dropped_token_accumulates_increment(self):
        # testFirstTokenPositionIncrement analog: "a abc" @2..3 — "a"
        # drops, "abc" keeps its absolute position
        t, p, ln, ov = _filter_stream([("a", 0), ("abc", 1)], 2, 3,
                                      edge=True)
        assert t == ["ab", "abc"]
        assert p == [1, 1]
        assert (ln, ov) == (1, 1)

    def test_preserve_short_long_edge(self):
        # EdgeNGramTokenFilter preserveOriginal: short kept at its
        # position, long appended after the prefixes (posInc 0)
        t, p, ln, ov = _filter_stream([("a", 0), ("efghi", 1)], 2, 3,
                                      edge=True, preserve=True)
        assert t == ["a", "ef", "efg", "efghi"]
        assert p == [0, 1, 1, 1]
        assert (ln, ov) == (2, 2)


class TestNGramTokenizer:
    def test_javadoc_table(self):
        # NGramTokenizer javadoc: "abcde" @2..3, posInc all 1
        assert ngram_tokenize("abcde", 2, 3) == \
            ["ab", "abc", "bc", "bcd", "cd", "cde", "de"]

    def test_edge_tokenizer(self):
        # EdgeNGramTokenizer = edgesOnly: stream-leading prefixes
        assert ngram_tokenize("abcde", 1, 3, edge=True) == \
            ["a", "ab", "abc"]

    def test_batch_shape(self):
        d, t, p, lens = ngram_tokenize_batch(
            pd.Series(["AbC", "", None, "xy"]), 1, 2)
        assert list(t) == ["a", "ab", "b", "bc", "c", "x", "xy", "y"]
        assert list(d) == [0, 0, 0, 0, 0, 3, 3, 3]
        assert list(p) == [0, 1, 2, 3, 4, 0, 1, 2]
        assert list(lens) == [5, 0, 0, 3]


class TestPathHierarchy:
    # goldens: TestPathHierarchyTokenizer
    CASES = [
        ("/a/b/c", {}, ["/a", "/a/b", "/a/b/c"]),
        ("/a/b/c/", {}, ["/a", "/a/b", "/a/b/c", "/a/b/c/"]),
        ("a/b/c", {}, ["a", "a/b", "a/b/c"]),
        ("a/b/c/", {}, ["a", "a/b", "a/b/c", "a/b/c/"]),
        ("/", {}, ["/"]),
        ("//", {}, ["/", "//"]),
        ("/a/b/c", dict(replacement="\\"), ["\\a", "\\a\\b", "\\a\\b\\c"]),
        ("c:\\a\\b\\c", dict(delimiter="\\"),
         ["c:", "c:\\a", "c:\\a\\b", "c:\\a\\b\\c"]),
        ("/a/b/c", dict(skip=1), ["/b", "/b/c"]),
        ("/a/b/c/", dict(skip=1), ["/b", "/b/c", "/b/c/"]),
        ("a/b/c", dict(skip=1), ["/b", "/b/c"]),
        ("a/b/c/", dict(skip=1), ["/b", "/b/c", "/b/c/"]),
        ("/", dict(skip=1), []),
        ("//", dict(skip=1), ["/"]),
    ]

    @pytest.mark.parametrize("path,kw,want", CASES)
    def test_forward_goldens(self, path, kw, want):
        assert path_tokenize(path, **kw) == want

    # goldens: TestReversePathHierarchyTokenizer
    RCASES = [
        ("/a/b/c", {}, ["/a/b/c", "a/b/c", "b/c", "c"]),
        ("/a/b/c/", {}, ["/a/b/c/", "a/b/c/", "b/c/", "c/"]),
        ("a/b/c", {}, ["a/b/c", "b/c", "c"]),
        ("a/b/c/", {}, ["a/b/c/", "b/c/", "c/"]),
        ("/", {}, ["/"]),
        ("//", {}, ["//", "/"]),
        ("/a/b/c/", dict(skip=1), ["/a/b/", "a/b/", "b/"]),
        ("a/b/c", dict(skip=1), ["a/b/", "b/"]),
        ("a/b/c/", dict(skip=1), ["a/b/", "b/"]),
        ("/", dict(skip=1), []),
        ("//", dict(skip=1), ["/"]),
        ("/a/b/c/", dict(skip=2), ["/a/", "a/"]),
    ]

    @pytest.mark.parametrize("path,kw,want", RCASES)
    def test_reverse_goldens(self, path, kw, want):
        assert path_tokenize(path, reverse=True, **kw) == want

    def test_batch_one_position_stream(self):
        d, t, p, lens, over = path_tokenize_batch(
            pd.Series(["/a/b", "", "x"]))
        assert list(t) == ["/a", "/a/b", "x"]
        assert list(d) == [0, 0, 2]
        assert list(p) == [0, 0, 0]
        assert list(lens) == [1, 0, 1]
        assert list(over) == [1, 0, 0]

    def test_validation(self):
        with pytest.raises(ValueError):
            path_tokenize("/a", skip=-1)
        with pytest.raises(ValueError):
            path_tokenize("/a", delimiter="//")


class TestBuildIntegration:
    """End-to-end: the build kernel's ngram/path paths produce the same
    postings as pre-expanding the stream by hand."""

    def test_invert_segment_ngram_filter(self):
        from lucene_spark.operators.build import invert_segment
        pdf = pd.DataFrame({
            "doc_id": np.arange(4, dtype=np.int64),
            "content": ["alpha beta", "beta if gamma", "a xy", ""],
        })
        postings, doc_meta, _, _ = invert_segment(
            pdf, 0, "content", "doc_id", frozenset(), True,
            ngrams=(2, 3))
        # doc 2: "a" drops (len<2), "xy" emits 1 gram -> norm len 1
        by_doc = doc_meta.set_index("doc_id")
        assert by_doc.loc[2, "doc_len"] == 1
        # doc 0: both tokens emit; alpha -> 7 grams, beta -> 5 grams,
        # norm len = 2 emitting tokens
        assert by_doc.loc[0, "doc_len"] == 2
        # gram "be" appears in docs 0 and 1 (from beta)
        row = postings[postings.term == "be"].iloc[0]
        assert row.df == 2

    def test_invert_segment_path_tokenizer(self):
        from lucene_spark.operators.build import invert_segment
        pdf = pd.DataFrame({
            "doc_id": np.arange(3, dtype=np.int64),
            "content": ["/src/a.py", "/src/lib/b.py", "/doc/c.md"],
        })
        postings, doc_meta, _, _ = invert_segment(
            pdf, 0, "content", "doc_id", frozenset(), True,
            tokenizer="path")
        assert (doc_meta.doc_len == 1).all()  # one-position streams
        row = postings[postings.term == "/src"].iloc[0]
        assert row.df == 2
        assert "/src/lib" in set(postings.term)


def test_ngram_phrase_rewrite(spark):
    """NGramPhraseQuery.rewrite goldens (core/search/
    TestNGramPhraseQuery.java) + match-set equivalence on a real
    gram-tokenized index."""
    import tempfile

    from lucene_spark.operators.build import build_index
    from lucene_spark.operators.search import Searcher
    from lucene_spark.plans import query as Q
    from lucene_spark.plans.query import ngram_phrase_rewrite

    # --- reference rewrite-shape goldens ---
    r1 = ngram_phrase_rewrite(2, Q.Phrase(("AB", "BC")))
    assert r1 == Q.Phrase(("AB", "BC"))          # too short: unchanged
    r2 = ngram_phrase_rewrite(2, Q.Phrase(("AB", "BC", "CD")))
    assert r2.terms == ("AB", "CD") and r2.positions == (0, 2)
    r3 = ngram_phrase_rewrite(
        3, Q.Phrase(("ABC", "BCD", "CDE", "DEF", "EFG", "FGH")))
    assert r3.terms == ("ABC", "DEF", "FGH")
    assert r3.positions == (0, 3, 5)
    # sloppy / unigram / non-consecutive: unchanged
    assert ngram_phrase_rewrite(
        2, Q.Phrase(("a", "b", "c"), slop=1)).terms == ("a", "b", "c")
    assert ngram_phrase_rewrite(1, Q.Phrase(("a", "b", "c"))) == \
        Q.Phrase(("a", "b", "c"))
    gap = Q.Phrase(("a", "b", "c"), positions=(0, 2, 3))
    assert ngram_phrase_rewrite(2, gap) is gap

    # --- equivalence on a bigram-tokenized index ---
    rows = [(0, "datastream"), (1, "database"), (2, "metadata"),
            (3, "datastore"), (4, "stream data")]
    d = tempfile.mkdtemp(prefix="lucene_spark_ngp_")
    build_index(spark, spark.createDataFrame(rows, "doc_id long, content string"),
                d, num_segments=2, tokenizer=("ngram", 2, 2))
    s = Searcher(spark, d)

    def grams(word):
        return tuple(word[i:i + 2] for i in range(len(word) - 1))

    for needle in ("datast", "abase", "tadata"):
        full = Q.Phrase(grams(needle))
        rew = ngram_phrase_rewrite(2, full)
        assert len(rew.terms) < len(full.terms)
        got = sorted(r["doc_id"]
                     for r in s.matching_docs(rew).collect())
        want = sorted(r["doc_id"]
                      for r in s.matching_docs(full).collect())
        brute = sorted(i for i, t in rows if needle in t.replace(" ", "") or
                       needle in t)
        assert got == want, needle
        # the rewritten phrase still matches exactly the substring docs
        assert got == sorted(i for i, t in rows if needle in t), needle
