"""WordDelimiterGraphFilter subset.

Goldens transcoded from the reference
``analysis/common/src/test/.../miscellaneous/TestWordDelimiterGraphFilter
.java`` (testOffsets, testOffsetChange, testLotsOfConcatenating,
testLotsOfConcatenating2) and the class javadoc split examples
(``WordDelimiterGraphFilter.java:44-59``). Position convention: the
reference asserts increments; we assert absolute positions (cumsum-1).
"""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.functions.worddelim import (CATENATE_ALL,
                                              CATENATE_NUMBERS,
                                              CATENATE_WORDS,
                                              DEFAULT_FLAGS,
                                              PRESERVE_ORIGINAL,
                                              expand_worddelim_batch,
                                              wdgf_token)

ALL_CAT = DEFAULT_FLAGS | CATENATE_WORDS | CATENATE_NUMBERS | CATENATE_ALL


def _doc(tokens_positions, flags, protected=frozenset()):
    terms = np.array([t for t, _ in tokens_positions], dtype=object)
    pos = np.array([p for _, p in tokens_positions], dtype=np.int64)
    didx = np.zeros(len(terms), dtype=np.int64)
    d, t, p, lens, over = expand_worddelim_batch(
        didx, terms, pos, 1, flags, protected)
    return list(t), list(p), int(lens[0]), int(over[0])


class TestWdgfToken:
    def test_offsets_foo_bar(self):
        # testOffsets: CATENATE_ALL -> foobar, foo, bar (longer first)
        entries, k = wdgf_token("foo-bar", DEFAULT_FLAGS | CATENATE_ALL)
        assert entries == [("foobar", 0), ("foo", 0), ("bar", 1)]
        assert k == 2

    def test_trailing_delimiter_single(self):
        # testOffsetChange: "übelkeit)" -> just the trimmed word, no
        # catAll duplicate (isSingleWord branch)
        entries, k = wdgf_token("übelkeit)", DEFAULT_FLAGS | CATENATE_ALL)
        assert entries == [("übelkeit", 0)] and k == 1

    def test_javadoc_splits(self):
        assert wdgf_token("Wi-Fi", DEFAULT_FLAGS)[0] == \
            [("Wi", 0), ("Fi", 1)]
        assert wdgf_token("PowerShot", DEFAULT_FLAGS)[0] == \
            [("Power", 0), ("Shot", 1)]
        assert wdgf_token("SD500", DEFAULT_FLAGS)[0] == \
            [("SD", 0), ("500", 1)]
        assert wdgf_token("O'Neil's", DEFAULT_FLAGS)[0] == \
            [("O", 0), ("Neil", 1)]
        # javadoc: leading/trailing delimiters ignored
        assert wdgf_token("//hello---there,", DEFAULT_FLAGS)[0] == \
            [("hello", 0), ("there", 1)]

    def test_upper_to_letter_never_splits(self):
        # WordDelimiterIterator.isBreak: UPPER->letter no break
        assert wdgf_token("NFLCoder", DEFAULT_FLAGS)[0] == \
            [("NFLCoder", 0)]

    def test_catenate_words_run(self):
        # javadoc A's+B's&C's with CATENATE_WORDS: parts A,B,C + run ABC
        # at the run's FIRST position (graph semantics, per
        # testLotsOfConcatenating's increments)
        entries, k = wdgf_token("A's+B's&C's",
                                DEFAULT_FLAGS | CATENATE_WORDS)
        assert entries == [("ABC", 0), ("A", 0), ("B", 1), ("C", 2)]
        assert k == 3

    def test_powershot_catenate_dedup(self):
        # CATENATE_WORDS|CATENATE_ALL on a same-type run: one catenation
        # (concatAll skipped when subwordCount == lastConcatCount)
        entries, k = wdgf_token("PowerShot",
                                DEFAULT_FLAGS | CATENATE_WORDS
                                | CATENATE_ALL)
        assert entries == [("PowerShot", 0), ("Power", 0), ("Shot", 1)]

    def test_all_delimiters_swallowed(self):
        assert wdgf_token("--", DEFAULT_FLAGS) == ([], 0)
        assert wdgf_token("--", DEFAULT_FLAGS | PRESERVE_ORIGINAL) == \
            ([("--", 0)], 1)

    def test_protected(self):
        assert wdgf_token("Wi-Fi", DEFAULT_FLAGS,
                          frozenset(["Wi-Fi"]))[0] == [("Wi-Fi", 0)]

    def test_no_split_flags(self):
        # without SPLIT_ON_CASE_CHANGE / SPLIT_ON_NUMERICS these stay
        # whole (javadoc on the flags)
        from lucene_spark.functions.worddelim import (GENERATE_NUMBER_PARTS,
                                                      GENERATE_WORD_PARTS)
        base = GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
        assert wdgf_token("PowerShot", base)[0] == [("PowerShot", 0)]
        assert wdgf_token("j2se", base)[0] == [("j2se", 0)]
        assert wdgf_token("j2se", DEFAULT_FLAGS)[0] == \
            [("j", 0), ("2", 1), ("se", 2)]

    def test_requires_generate_parts(self):
        with pytest.raises(ValueError):
            wdgf_token("x", CATENATE_WORDS)


class TestLotsOfConcatenating:
    def test_no_preserve(self):
        # testLotsOfConcatenating: "abc-def-123-456", all flags minus
        # preserve; increments [1,0,0,1,1,0,1] -> absolute 0,0,0,1,2,2,3
        t, p, ln, ov = _doc([("abc-def-123-456", 0)], ALL_CAT)
        assert t == ["abcdef123456", "abcdef", "abc", "def", "123456",
                     "123", "456"]
        assert p == [0, 0, 0, 1, 2, 2, 3]
        assert (ln, ov) == (4, 3)

    def test_preserve(self):
        # testLotsOfConcatenating2: + PRESERVE_ORIGINAL; increments
        # [1,0,0,0,1,1,0,1]
        t, p, ln, ov = _doc([("abc-def-123-456", 0)],
                            ALL_CAT | PRESERVE_ORIGINAL)
        assert t == ["abc-def-123-456", "abcdef123456", "abcdef", "abc",
                     "def", "123456", "123", "456"]
        assert p == [0, 0, 0, 0, 1, 2, 2, 3]
        assert (ln, ov) == (4, 4)


class TestStreamRenumbering:
    def test_positions_inserted(self):
        # "big Wi-Fi deal" -> big@0, wi@1, fi@2, deal@3
        t, p, ln, ov = _doc([("big", 0), ("Wi-Fi", 1), ("deal", 2)],
                            DEFAULT_FLAGS)
        assert t == ["big", "Wi", "Fi", "deal"]
        assert p == [0, 1, 2, 3]
        assert (ln, ov) == (4, 0)

    def test_swallowed_leaves_hole(self):
        # "a -- b": the all-delimiter token is swallowed, hole at pos 1
        t, p, ln, ov = _doc([("a", 0), ("--", 1), ("b", 2)],
                            DEFAULT_FLAGS)
        assert t == ["a", "b"]
        assert p == [0, 2]
        assert (ln, ov) == (2, 0)

    def test_input_gaps_preserved(self):
        # input stream already has a gap (stopword hole at 1)
        t, p, ln, ov = _doc([("a", 0), ("x-y", 2)], DEFAULT_FLAGS)
        assert t == ["a", "x", "y"]
        assert p == [0, 2, 3]

    def test_multi_doc_batch(self):
        terms = np.array(["Wi-Fi", "solo", "a-b-c"], dtype=object)
        pos = np.array([0, 0, 1], dtype=np.int64)
        didx = np.array([0, 1, 1], dtype=np.int64)
        d, t, p, lens, over = expand_worddelim_batch(
            didx, terms, pos, 2, DEFAULT_FLAGS | CATENATE_ALL)
        assert list(t) == ["WiFi", "Wi", "Fi", "solo", "abc", "a", "b",
                           "c"]
        assert list(d) == [0, 0, 0, 1, 1, 1, 1, 1]
        assert list(p) == [0, 0, 1, 0, 1, 1, 2, 3]
        assert list(lens) == [2, 4]
        assert list(over) == [1, 1]


class TestBuildIntegration:
    def test_invert_segment_wdgf(self):
        from lucene_spark.operators.build import invert_segment
        pdf = pd.DataFrame({
            "doc_id": np.arange(3, dtype=np.int64),
            "content": ["get_user_name now", "GetUserName later",
                        "plain words"],
        })
        postings, doc_meta, _, _ = invert_segment(
            pdf, 0, "content", "doc_id", frozenset(), True,
            tokenizer="whitespace", word_delimiter=ALL_CAT)
        by_doc = doc_meta.set_index("doc_id")
        # doc 0: get,user,name (+getusername overlap), now -> norm 4
        assert by_doc.loc[0, "doc_len"] == 4
        assert by_doc.loc[1, "doc_len"] == 4
        assert by_doc.loc[2, "doc_len"] == 2
        # snake_case and CamelCase normalize to the same subword terms
        # (post-WDGF lowercase)
        for term, df in [("user", 2), ("getusername", 2), ("name", 2)]:
            row = postings[postings.term == term]
            assert len(row) == 1 and row.iloc[0].df == df, term
