"""Sloppy MultiPhrase with multi-term repeats vs the reference's own
scorer: tests/data/lucene_diff/multiphrase_repeat_fuzz.tsv.gz holds
exact phraseFreq float BITS (from the explanation tree) for 140 random
MultiPhraseQuery shapes with slop and shared terms across columns
(hasMultiTermRpts hidden collisions — reference
``SloppyPhraseMatcher.java:286-466``, ``MultiPhraseQuery.java:420``)
over 400 random gapped docs. The per-doc port
(functions/sloppy.py::lucene_sloppy_multiphrase_matches) must
reproduce the match SET and every freq bit-exactly."""

import gzip
import os
import struct

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "lucene_diff",
                      "multiphrase_repeat_fuzz.tsv.gz")


def _load():
    docs = {}
    queries = []
    with gzip.open(GOLDEN, "rt", encoding="utf-8") as f:
        for line in f:
            p = line.rstrip("\n").split("\t")
            if p[0] == "DOCPOS":
                pm = {}
                for item in p[2:]:
                    t, v = item.split("=")
                    pm[t] = [int(x) for x in v.split(",")]
                docs[int(p[1])] = pm
            elif p[0].startswith("QUERY"):
                head = p[0].split(" ")
                slop = int(head[1])
                slots, qpos = [], []
                for item in head[2:]:
                    ts, qp = item.rsplit(":", 1)
                    slots.append(tuple(ts.split("|")))
                    qpos.append(int(qp))
                exp = {}
                for h in p[1:]:
                    did, bits = h.split(":")
                    exp[int(did)] = int(bits)
                queries.append((slop, slots, qpos, exp))
    return docs, queries


def _f32_bits(x: float) -> int:
    return struct.unpack("<i", struct.pack("<f", np.float32(x)))[0]


def test_multiphrase_repeat_freqs_bit_exact():
    from lucene_spark.functions.sloppy import (
        lucene_sloppy_multiphrase_freq)
    docs, queries = _load()
    assert len(queries) == 200
    total_hits = 0
    for slop, slots, qpos, exp in queries:
        got = {}
        for did in sorted(docs):
            f = lucene_sloppy_multiphrase_freq(slots, docs[did], slop,
                                               offsets=qpos)
            if f > 0.0:
                got[did] = _f32_bits(f)
        assert set(got) == set(exp), (slop, slots, qpos,
                                      set(got) ^ set(exp))
        for did, bits in exp.items():
            assert got[did] == bits, (slop, slots, qpos, did,
                                      got[did], bits)
        total_hits += len(exp)
    assert total_hits > 1000


def test_multiphrase_group_analysis_examples():
    """The javadoc hidden-collision example P1={A,B}, P2={B,C} forms
    ONE group; disjoint alternatives form none."""
    from lucene_spark.functions.sloppy import multiphrase_repeat_groups
    has, mtp, g = multiphrase_repeat_groups([("a", "b"), ("b", "c")])
    assert has and mtp and g == [(0, 1)]
    has, mtp, g = multiphrase_repeat_groups([("a", "b"), ("c", "d")])
    assert not has and not mtp and g == []
    # single-term repeats beside an unrelated multi-term slot: repeats
    # exist but none touch a multi-term slot
    has, mtp, g = multiphrase_repeat_groups([("a",), ("a",), ("b", "c")])
    assert has and not mtp and g == [(0, 1)]
    # transitive union: {a,b} {b,c} {c,d} collapse into one group
    has, mtp, g = multiphrase_repeat_groups(
        [("a", "b"), ("b", "c"), ("c", "d")])
    assert has and mtp and g == [(0, 1, 2)]
