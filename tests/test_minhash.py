"""MinHashFilter — goldens transcoded from the reference
``analysis/common/src/test/.../minhash/TestMinHashFilter.java``
(token strings baked as code-point lists; the literals are degenerate
as characters, as the reference test itself notes).
"""

import pandas as pd

from lucene_spark.functions.minhash import (
    min_hash_tokens,
    murmur3_x64_128,
    token_hex,
)
from lucene_spark.operators.build import invert_segment

WOOF = "woof woof woof woof woof"
PUFF = "woof woof woof woof puff"
H_WOOF = "".join(chr(c) for c in
                 (8449, 54077, 64133, 32857, 8605, 41409, 54897, 26479))
H_PUFF = "".join(chr(c) for c in
                 (36347, 63457, 43013, 56843, 52284, 34231, 57934, 42302))


def test_murmur3_reference_vectors():
    # testIntHash / testStringHash
    assert murmur3_x64_128((0).to_bytes(4, "big")) == \
        (-3485513579396041028, 6383328099726337777)
    assert murmur3_x64_128(WOOF.encode("utf-16-le")) == \
        (7638079586852243959, 4378804943379391304)


def test_token_stream_single_input():
    assert min_hash_tokens([WOOF], 1, 1, 100, False) == [H_WOOF]
    assert min_hash_tokens([WOOF], 2, 1, 1, False) == [
        "".join(chr(c) for c in
                (0, 0, 8449, 54077, 64133, 32857, 8605, 41409)),
        "".join(chr(c) for c in
                (0, 1, 16887, 58164, 39536, 14926, 6529, 17276)),
    ]


def test_token_stream1():
    # two 5-shingles, single hash/bucket, setSize=100: both minima kept
    assert min_hash_tokens([WOOF, PUFF], 1, 1, 100, False) == \
        [H_WOOF, H_PUFF]


def test_token_stream_counts():
    shingles = [WOOF, PUFF]
    # testTokenStream2: 100 hashes x 1 bucket x setSize 1 -> 100 tokens
    assert len(min_hash_tokens(shingles, 100, 1, 1, False)) == 100
    # testTokenStream3: 10 hashes, setSize 10 -> 2 survivors each
    assert len(min_hash_tokens(shingles, 10, 1, 10, False)) == 20
    # testTokenStream4: 10 hashes x 10 buckets, setSize 1
    assert len(min_hash_tokens(shingles, 10, 10, 1, False)) == 20
    assert len(min_hash_tokens(shingles, 10, 10, 1, True)) == 100
    # testTokenStream5: 1 hash x 100 buckets
    assert len(min_hash_tokens(shingles, 1, 100, 1, False)) == 2
    rot = min_hash_tokens(shingles, 1, 100, 1, True)
    assert len(rot) == 100 and len(set(rot)) == 2


def test_build_integration():
    # min_hash=(k, hash_count, bucket_count, hash_set_size, rotation):
    # the indexed dictionary is exactly the emitted hash tokens; norms
    # discount the posInc=0 overlays (doc_len == 1)
    pdf = pd.DataFrame({"doc_id": [0],
                        "content": [WOOF + " " + PUFF.split()[-1]]})
    postings, meta, _, _ = invert_segment(
        pdf, 0, "content", "doc_id", frozenset(), True,
        tokenizer="whitespace", min_hash=(5, 1, 1, 100, False))
    # indexed terms use the UTF-8-safe hex transport form (the raw
    # 16-bit-group tokens contain lone surrogates parquet rejects)
    assert sorted(postings["term"]) == sorted([token_hex(H_WOOF),
                                               token_hex(H_PUFF)])
    assert int(meta["doc_len"].iloc[0]) == 1


def test_jaccard_sharing():
    # two docs sharing 1 of their shingles share exactly that token
    docs = [WOOF + " puff", WOOF + " biff"]
    pdf = pd.DataFrame({"doc_id": [0, 1], "content": docs})
    postings, _, _, _ = invert_segment(
        pdf, 0, "content", "doc_id", frozenset(), True,
        tokenizer="whitespace", min_hash=(5, 1, 1, 100, False))
    by = postings.set_index("term")
    hw = token_hex(H_WOOF)
    assert int(by.loc[hw, "df"]) == 2   # the shared shingle
    assert int(by.drop(hw)["df"].max()) == 1


# --- ConcatenateGraphFilter ---------------------------------------------------
def test_concatenate_graph():
    # TestConcatenateGraphFilter.testBasic / testWithMultipleTokens:
    # whole stream -> one token, SEP_LABEL (U+001F) joins
    SEP = chr(0x1F)
    pdf = pd.DataFrame({"doc_id": [0], "content": ["mykeyword"]})
    p, meta, _, _ = invert_segment(
        pdf, 0, "content", "doc_id", frozenset(), True,
        tokenizer="whitespace", concatenate_graph=True)
    assert list(p["term"]) == ["mykeyword"]
    pdf = pd.DataFrame({"doc_id": [0],
                        "content": ["mykeyword another keyword"]})
    p, meta, _, _ = invert_segment(
        pdf, 0, "content", "doc_id", frozenset(), True,
        tokenizer="whitespace", concatenate_graph=True)
    assert list(p["term"]) == [SEP.join(["mykeyword", "another",
                                         "keyword"])]
    assert int(meta["doc_len"].iloc[0]) == 1
    # preserved position increments: a stopword hole doubles the sep
    # (TokenStreamToAutomaton's POS_SEP-per-position encoding)
    p, _, _, _ = invert_segment(
        pdf, 0, "content", "doc_id", frozenset({"another"}), True,
        tokenizer="whitespace", concatenate_graph=True)
    assert list(p["term"]) == ["mykeyword" + SEP * 2 + "keyword"]
    # preserve off: single separator regardless of holes
    p, _, _, _ = invert_segment(
        pdf, 0, "content", "doc_id", frozenset({"another"}), True,
        tokenizer="whitespace", concatenate_graph=(" ", False))
    assert list(p["term"]) == ["mykeyword keyword"]
