"""UAX29URLEmailTokenizer parity — the reference's own extraction
corpora (tests/data/urlemail/, see its README) must extract EXACTLY:
every URL and every email address, in order, as the reference's
TestUAX29URLEmailTokenizer asserts via its type-filtered analyzers.
"""

import os

import pandas as pd
import pytest

from lucene_spark.functions.urlemail import url_email_tokens

DATA = os.path.join(os.path.dirname(__file__), "data", "urlemail")


def _extract(textfile, typ):
    text = open(os.path.join(DATA, textfile), encoding="utf-8").read()
    return [t for t, ty in url_email_tokens(text) if ty == typ]


def _gold(goldfile):
    with open(os.path.join(DATA, goldfile), encoding="utf-8") as f:
        return [l.strip() for l in f if l.strip()]


def test_email_extraction_corpus():
    got = _extract("random.text.with.email.addresses.txt", "EMAIL")
    gold = _gold("email.addresses.from.random.text.with.email.addresses.txt")
    assert len(gold) == 265
    assert got == gold


def test_url_extraction_corpus():
    got = _extract("random.text.with.urls.txt", "URL")
    gold = _gold("urls.from.random.text.with.urls.txt")
    assert len(gold) == 643
    assert got == gold


@pytest.mark.parametrize("text,expected", [
    # testLUCENE1545-adjacent shapes + scanner dispatch basics
    ("visit http://example.com/page?q=1 now",
     [("visit", "word"), ("http://example.com/page?q=1", "URL"),
      ("now", "word")]),
    ("mailto:test@example.org",
     [("mailto", "word"), ("test@example.org", "EMAIL")]),
    # LUCENE-5391: domain-only host followed by a word char is NOT a URL
    ("example.comx", [("example", "word"), ("comx", "word")]),
    ("example.com ", [("example.com", "URL")]),
    ("example.com", [("example", "word"), ("com", "word")]),  # EOF rule
    # schemeless with required path / port / query / fragment
    ("x.fr/path more", [("x.fr/path", "URL"), ("more", "word")]),
    ("x.fr:8080 x.fr?q x.fr#f",
     [("x.fr:8080", "URL"), ("x.fr?q", "URL"), ("x.fr#f", "URL")]),
    # ftp + file schemes
    ("ftp://119.220.152.185/a/b ok",
     [("ftp://119.220.152.185/a/b", "URL"), ("ok", "word")]),
    ("file:///etc/hosts end",
     [("file:///etc/hosts", "URL"), ("end", "word")]),
    # quoted local part and bracketed IP host
    ('"odd local"@x.md y',
     [('"odd local"@x.md', "EMAIL"), ("y", "word")]),
    ("kU-l6DS@[082.015.228.189] z",
     [("kU-l6DS@[082.015.228.189]", "EMAIL"), ("z", "word")]),
])
def test_scanner_shapes(text, expected):
    assert url_email_tokens(text) == expected


def test_build_chain_integration():
    from lucene_spark.operators.build import invert_segment
    pdf = pd.DataFrame({"doc_id": [0],
                        "content": ["See HTTP://Ex.COM/Q?a=1 or a@b.cc"]})
    postings, _, _, _ = invert_segment(
        pdf, 0, "content", "doc_id", frozenset({"or"}), True,
        tokenizer="url_email")
    assert sorted(postings["term"]) == ["a@b.cc", "http://ex.com/q?a=1",
                                        "see"]


def test_type_token_filter_keep_urls():
    # TypeTokenFilter composition (miscellaneous/TypeTokenFilter.java,
    # keep-listed-types): only URL/EMAIL tokens survive, gaps preserved
    from lucene_spark.functions.analysis import analyze_text
    terms, positions, length = analyze_text(
        "Go to HTTP://Ex.COM/a and mail Bob@x.cc or read more",
        tokenizer=("url_email", "URL", "EMAIL"))
    assert terms == ["http://ex.com/a", "bob@x.cc"]
    assert positions == [2, 5]
    assert length == 2
