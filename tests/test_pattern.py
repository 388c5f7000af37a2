"""PatternTokenizer / PatternReplaceFilter (reference
``analysis/common/.../pattern/PatternTokenizer.java``,
``pattern/PatternReplaceFilter.java``; goldens transcoded from
``TestPatternTokenizer.java`` / ``TestPatternReplaceFilter.java`` —
Java-only escapes rewritten to Python-re equivalents where noted)."""

from __future__ import annotations

import re

import pandas as pd
import pytest

from lucene_spark.functions.analysis import analyze_batch, analyze_text
from lucene_spark.functions.pattern import (compile_pattern_replace,
                                            java_replacement_to_python,
                                            pattern_tokens)

#: TestPatternTokenizer.testSplitting — (group, pattern, input, tokens);
#: the \p{Space} row is written as \s (Python-re dialect, documented)
_TOKENIZER_GOLDENS = [
    (-1, "--", "aaa--bbb--ccc", ["aaa", "bbb", "ccc"]),
    (-1, ":", "aaa:bbb:ccc", ["aaa", "bbb", "ccc"]),
    (-1, r"\s", "aaa   bbb \t\tccc  ", ["aaa", "bbb", "ccc"]),
    (-1, ":", "boo:and:foo", ["boo", "and", "foo"]),
    (-1, "o", "boo:and:foo", ["b", ":and:f"]),
    (0, ":", "boo:and:foo", [":", ":"]),
    (0, r"'([^']+)'", "aaa 'bbb' 'ccc'", ["'bbb'", "'ccc'"]),
    (1, r"'([^']+)'", "aaa 'bbb' 'ccc'", ["bbb", "ccc"]),
]


@pytest.mark.parametrize("group,pat,inp,want", _TOKENIZER_GOLDENS)
def test_pattern_tokenizer_goldens(group, pat, inp, want):
    assert pattern_tokens(inp, re.compile(pat), group) == want


#: TestPatternReplaceFilter — whitespace tokens of the shared input
_PR_INPUT = "aabfooaabfooabfoob ab caaaaaaaaab".split()
_PR_GOLDENS = [
    (("a*b", "-", True), ["-foo-foo-foo-", "-", "c-"]),      # testReplaceAll
    (("a*b", "-", False), ["-fooaabfooabfoob", "-", "c-"]),  # testReplaceFirst
    (("a*b", None, False), ["fooaabfooabfoob", "", "c"]),    # testStripFirst
    (("a*b", None, True), ["foofoofoo", "", "c"]),           # testStripAll
    # testReplaceAllWithBackRef: Java replacement "$1\$"
    (("(a*)b", "$1\\$", True),
     ["aa$fooaa$fooa$foo$", "a$", "caaaaaaaaa$"]),
]


@pytest.mark.parametrize("spec,want", _PR_GOLDENS)
def test_pattern_replace_goldens(spec, want):
    fn = compile_pattern_replace(spec)
    assert [fn(t) for t in _PR_INPUT] == want


def test_java_replacement_converter():
    assert java_replacement_to_python("$1") == r"\1"
    assert java_replacement_to_python("\\$") == "$"
    assert java_replacement_to_python("x$12y") == "x\\12y"
    assert java_replacement_to_python("a\\\\b") == "a\\\\b"


def test_analyze_pattern_tokenizer_chain():
    """Tokenize on the ORIGINAL text (case-sensitive pattern), lowercase
    and stop-filter downstream — the chain order of the reference's
    pattern-tokenizer analyzers."""
    t, p, n = analyze_text("Foo:BAR:the:Baz", tokenizer=("pattern", ":", -1),
                           stopwords=frozenset(["the"]))
    assert t == ["foo", "bar", "baz"]
    assert p == [0, 1, 3]   # stop gap kept
    assert n == 3
    # case-sensitive group mode: pattern sees pre-lowercase text
    t, p, n = analyze_text("aXbXc", tokenizer=("pattern", "([A-Z])", 1))
    assert t == ["x", "x"] and p == [0, 1]


def test_analyze_pattern_batch_matches_text():
    texts = pd.Series(["Foo:BAR:the:Baz", "", "a:bb::cc:", "nosep"])
    di, tm, ps, ln = analyze_batch(texts, tokenizer=("pattern", ":", -1),
                                   stopwords=frozenset(["the"]))
    got = sorted(zip(di.tolist(), tm.tolist(), ps.tolist()))
    want = []
    for i, tx in enumerate(texts):
        ts, pp, _ = analyze_text(tx, tokenizer=("pattern", ":", -1),
                                 stopwords=frozenset(["the"]))
        want.extend((i, t, p) for t, p in zip(ts, pp))
    assert got == sorted(want)
    assert ln.tolist() == [3, 0, 3, 1]


def test_analyze_pattern_replace_chain():
    """PatternReplaceFilter after the normalizers, before the stop
    filter; emptied tokens are kept as empty-string terms."""
    t, p, n = analyze_text("files ab keeps",
                           pattern_replace=("s$", "", False))
    assert t == ["file", "ab", "keep"]
    # emptied token kept (reference testStripFirst keeps "")
    t, p, n = analyze_text("ab foo", pattern_replace=("a*b", None, True))
    assert t == ["", "foo"] and n == 2
    # batch ≡ text
    texts = pd.Series(["files ab keeps", "ab foo"])
    di, tm, ps, ln = analyze_batch(texts, pattern_replace=("s$", "", False))
    assert sorted(zip(di.tolist(), tm.tolist())) == sorted(
        [(0, "file"), (0, "ab"), (0, "keep"), (1, "ab"), (1, "foo")])


def test_pattern_replace_invert_parity():
    """Kernel parity: pattern_replace=(s$ → x) over the corpus ≡
    building from pre-replaced text (1:1 token map — same norms, same
    positions, same stats). The replacement is non-emptying on purpose:
    a bare 's' token would faithfully become an empty-string TERM in the
    engine (reference keeps them), which plain re-joined text cannot
    express — that case is covered in test_analyze_pattern_replace_chain."""
    from lucene_spark.operators.build import invert_segment
    from lucene_spark.sources.corpus import generate_corpus

    corpus = generate_corpus(60, seed=3)
    pdf = pd.DataFrame({"doc_id": corpus.doc_id,
                        "content": corpus.content})
    # pre-replace at the raw standard-token level (the corpus has
    # punctuated identifiers — 'open;' — that the tokenizer strips
    # before the filter sees them, AND >255-char tokens that are
    # skipped-but-position-counted, so they must survive into the
    # pre-replaced text verbatim to keep the position gaps)
    from lucene_spark.functions.analysis import TOKENIZERS
    findall = TOKENIZERS["standard"].findall
    pre = pdf.copy()
    pre["content"] = [
        " ".join(w if len(w) > 255 else re.sub("s$", "x", w.lower())
                 for w in findall(str(t)))
        for t in pdf["content"]]
    a = invert_segment(pdf, 0, "content", "doc_id", frozenset(), True,
                       pattern_replace=("s$", "x", False))
    b = invert_segment(pre, 0, "content", "doc_id", frozenset(), True)
    for x, y in zip(a[:2], b[:2]):
        pd.testing.assert_frame_equal(
            x.reset_index(drop=True), y.reset_index(drop=True))
    assert a[3] == b[3]


def test_token_filters_trim_truncate():
    """TrimFilter (with the keyword tokenizer, the only chain that can
    carry padded tokens) and TruncateTokenFilter (reference
    ``TestTrimFilter.java`` / ``TestTruncateTokenFilter.java``:
    abcdefg/1234567 → abcde/12345 at length 5)."""
    t, p, n = analyze_text("  padded  ", tokenizer="keyword",
                           token_filters=(("trim",),))
    assert t == ["padded"]
    t, p, n = analyze_text("abcdefg 1234567 ab",
                           token_filters=(("truncate", 5),))
    assert t == ["abcde", "12345", "ab"]


def test_token_filters_keep_and_limit():
    """KeepWordFilter drops with gaps (FilteringTokenFilter);
    LimitTokenCountFilter caps emitted tokens per document."""
    t, p, n = analyze_text("aaa BBB ccc DDD aaa",
                           token_filters=(("keep", {"aaa", "bbb"}),))
    assert t == ["aaa", "bbb", "aaa"]
    assert p == [0, 1, 4]   # gaps where ccc/ddd dropped
    assert n == 3
    t, p, n = analyze_text("a b c d e", token_filters=(("limit", 3),))
    assert t == ["a", "b", "c"] and n == 3
    # limit counts SURVIVING tokens (chain-final)
    t, p, n = analyze_text("the a the b c the d",
                           stopwords=frozenset(["the"]),
                           token_filters=(("limit", 3),))
    assert t == ["a", "b", "c"] and p == [1, 3, 4]


def test_token_filters_batch_matches_text():
    specs = (("truncate", 4), ("keep", {"aaa", "bbbb", "cccc"}),
             ("limit", 2))
    texts = pd.Series(["aaa bbbbbb zz cccc aaa", "", "zz zz", "ccccX aaa"])
    di, tm, ps, ln = analyze_batch(texts, token_filters=specs)
    got = sorted(zip(di.tolist(), tm.tolist(), ps.tolist()))
    want = []
    for i, tx in enumerate(texts):
        ts, pp, _ = analyze_text(tx, token_filters=specs)
        want.extend((i, t, p) for t, p in zip(ts, pp))
    assert got == sorted(want)
    # doc 0: truncate → aaa bbbb zz cccc aaa; keep → aaa@0 bbbb@1 cccc@3
    # aaa@4; limit 2 → aaa@0 bbbb@1
    assert [(t, p) for d, t, p in sorted(want) if d == 0] == \
        [("aaa", 0), ("bbbb", 1)]
    assert ln.tolist() == [2, 0, 0, 2]


def test_token_filters_invert_integration():
    """token_filters thread through the build kernel: keep-set index
    has only the kept vocabulary, norms = surviving counts."""
    from lucene_spark.operators.build import invert_segment
    pdf = pd.DataFrame({"doc_id": [0, 1],
                        "content": ["keep drop keep zz", "drop drop keep"]})
    postings, doc_meta, norms, stl = invert_segment(
        pdf, 0, "content", "doc_id", frozenset(), True,
        token_filters=(("keep", {"keep", "zz"}),))
    assert sorted(postings["term"]) == ["keep", "zz"]
    assert stl == 4  # 3 keeps + 1 zz survive


#: the reference javadoc's camelCase pattern set
_CAMEL = (r"([A-Z]{2,})", r"(?<![A-Z])([A-Z][a-z]+)",
          r"(?:^|\b|(?<=[0-9_])|(?<=[A-Z]{2}))([a-z]+)", r"([0-9]+)")


def test_capture_group_goldens():
    """Transcoded from TestPatternCaptureGroupTokenFilter: multi-capture
    overlap, multi-pattern min-offset interleave, camelCase, no-match
    passthrough, preserveOriginal whole-token skip."""
    from lucene_spark.functions.pattern import capture_group_tokens as cg
    P = lambda *ps: [re.compile(p) for p in ps]
    assert cg("foobarbaz", P(r"(.(.(.)))"), False) == \
        ["foo", "oo", "o", "bar", "ar", "r", "baz", "az", "z"]
    assert cg("foobarbaz", P(r"(.(.(.)))"), True) == \
        ["foobarbaz", "foo", "oo", "o", "bar", "ar", "r", "baz", "az", "z"]
    assert cg("aaabbbaaa", P("(aaa)", "(bbb)", "(ccc)"), False) == \
        ["aaa", "bbb", "aaa"]
    assert cg("aaabbbaaa", P("(aaa)", "(bbb)", "(ccc)"), True) == \
        ["aaabbbaaa", "aaa", "bbb", "aaa"]
    assert cg("letsPartyLIKEits1999_dude", P(*_CAMEL), False) == \
        ["lets", "Party", "LIKE", "its", "1999", "dude"]
    assert cg("letsPartyLIKEits1999_dude", P(*_CAMEL), True) == \
        ["letsPartyLIKEits1999_dude", "lets", "Party", "LIKE", "its",
         "1999", "dude"]
    assert cg("xxx", P("(yyy)"), False) == ["xxx"]
    # preserveOriginal skips the capture equal to the whole token
    assert cg("aaa", P("(aaa)"), True) == ["aaa"]


def test_capture_group_batch_positions():
    """First emission keeps the source position (replaces the original
    unless preserved); the rest overlay posInc-0. Overlap counts feed
    the norm discount."""
    from lucene_spark.functions.pattern import expand_capture_groups_batch
    import numpy as np
    di = np.array([0, 0, 1], dtype=np.int64)
    tm = np.array(["getData", "plain", "xY9"], dtype=object)
    ps = np.array([0, 1, 0], dtype=np.int64)
    d2, t2, p2, over = expand_capture_groups_batch(
        di, tm, ps, 2, _CAMEL, False)
    # 'Y' alone matches no camel pattern ([A-Z][a-z]+ needs a lowercase
    # tail, [A-Z]{2,} needs a second uppercase) — faithfully dropped
    assert sorted(zip(d2.tolist(), t2.tolist(), p2.tolist())) == sorted(
        [(0, "get", 0), (0, "Data", 0), (0, "plain", 1),
         (1, "x", 0), (1, "9", 0)])
    assert over.tolist() == [1, 1]


def test_capture_group_invert_integration():
    """capture_groups through the build kernel: camel identifiers are
    searchable by fragment; norms = surface token counts."""
    from lucene_spark.operators.build import invert_segment
    pdf = pd.DataFrame({"doc_id": [0, 1],
                        "content": ["getDataValue readFile",
                                    "plain words here"]})
    postings, doc_meta, norms, stl = invert_segment(
        pdf, 0, "content", "doc_id", frozenset(), True,
        tokenizer="whitespace", capture_groups=(_CAMEL, False))
    terms = set(postings["term"])
    assert {"get", "data", "value", "read", "file",
            "plain", "words", "here"} <= terms
    assert "getdatavalue" not in terms   # replaced, not preserved
    # doc0: 2 surface tokens -> 5 emissions (3 + 2): 3 overlaps
    assert stl == 5 + 3


def test_codepoint_count_filter():
    from lucene_spark.functions.analysis import analyze_text
    terms, positions, length = analyze_text(
        "a bb ccc dddd eeeee",
        token_filters=(("codepoint_count", 2, 4),))
    assert terms == ["bb", "ccc", "dddd"]
    assert positions == [1, 2, 3]          # gaps preserved
    assert length == 3


def test_pattern_keyword_marker():
    from lucene_spark.functions.analysis import analyze_text
    from lucene_spark.functions.pattern import PatternKeywordSet
    # tokens ending 'ing' are protected from the Porter stemmer
    marker = PatternKeywordSet(r".*ing", extra={"databases"})
    terms, _, _ = analyze_text(
        "running jumped databases tables", stemmer="porter",
        keyword_marker=marker)
    assert terms == ["running", "jump", "databases", "tabl"]
