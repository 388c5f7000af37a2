"""MemoryIndex (single-doc in-memory index, reference
``memory/.../MemoryIndex.java:78``): scoring parity with a 1-doc
engine-grade index, reader introspection, reset/reuse."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_spark.operators.memoryindex import MemoryIndex
from lucene_spark.plans import query as Q
from lucene_spark.plans.parser import parse


def test_basic_match_and_score():
    mi = MemoryIndex().add_field("the quick brown fox jumps")
    assert mi.matches("quick")
    assert mi.matches("quick AND fox")
    assert not mi.matches("lazy")
    assert mi.search("lazy") == 0.0
    assert mi.search(Q.Phrase(("quick", "brown"))) > 0
    assert mi.search(Q.Phrase(("brown", "quick"))) == 0.0


def test_score_equals_one_doc_oracle():
    """MemoryIndex.search == OracleIndex.score over the identical
    single-doc collection stats (float32-exact by construction)."""
    from lucene_spark.oracle import OracleIndex

    text = "alpha beta alpha gamma delta alpha beta"
    mi = MemoryIndex().add_field(text)
    oracle = OracleIndex.build([(0, text)])
    for q in (Q.Term("alpha"), Q.Or((Q.Term("beta"), Q.Term("gamma"))),
              parse('"alpha beta"~2')):
        assert mi.search(q) == float(oracle.score(q).get(0, 0.0))


def test_add_field_position_gap():
    """Successive add_field calls concatenate with a position gap: a
    phrase cannot straddle the field boundary tokens' adjacency."""
    mi = MemoryIndex().add_field("end of first").add_field("second part")
    assert mi.matches(Q.Phrase(("end", "of", "first")))
    assert mi.matches(Q.Phrase(("second", "part")))
    assert mi.positions("second") == [3]


def test_reader_introspection_and_reset():
    mi = MemoryIndex().add_field("a b a c")
    assert mi.freq("a") == 2
    assert mi.positions("a") == [0, 2]
    assert mi.terms() == ["a", "b", "c"]
    mi.reset().add_field("x y")
    assert mi.terms() == ["x", "y"]
    assert mi.freq("a") == 0


def test_stopwords_and_stemmer_chain():
    mi = MemoryIndex(stopwords=frozenset({"the"}), stemmer="porter")
    mi.add_field("the running dogs")
    assert mi.matches("run")          # porter: running -> run
    assert not mi.matches(Q.Term("the"))  # stopped at index time
    assert mi.positions("dog") == [2]  # stop gap preserved
