"""Exact sloppy-phrase REPEATS walk (SloppyPhraseMatcher advanceRpts)
vs the reference's own matcher:
tests/data/lucene_diff/sloppy_repeat_fuzz.tsv.gz holds the EXACT
per-doc phraseFreq float bits the compiled reference produced for 100
random duplicate-term PhraseQuery shapes (incl. gapped builder
positions) over 400 random gapped docs."""

import gzip
import os
import struct

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "lucene_diff",
                      "sloppy_repeat_fuzz.tsv.gz")


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
                cl = [(tp.split(":")[0], int(tp.split(":")[1]))
                      for tp in head[2:]]
                hits = [(int(h.split(":")[0]), int(h.split(":")[1]))
                        for h in p[1:]]
                queries.append((slop, cl, hits))
    return docs, queries


def _fbits(x) -> int:
    return struct.unpack("<i", struct.pack("<f", np.float32(x)))[0]


def test_perdoc_repeats_walk_replays_reference():
    from lucene_spark.functions.sloppy import lucene_sloppy_repeat_freq
    docs, queries = _load()
    assert len(queries) == 100
    bad = 0
    total = 0
    for slop, clauses, exp in queries:
        got = []
        for did in sorted(docs):
            pm = docs[did]
            pls = [pm.get(t, []) for t, _ in clauses]
            if any(not p for p in pls):
                continue
            f = lucene_sloppy_repeat_freq(pls, slop,
                                          [qp for _, qp in clauses])
            if f > 0:
                got.append((did, _fbits(f)))
        total += len(exp)
        bad += got != exp
    assert bad == 0, f"{bad} of {len(queries)} queries diverge"
    assert total > 2000


def test_wave_kernel_matches_perdoc_walk():
    """batch_lucene_repeat_freqs ≡ the per-doc walk on randomized
    multi-doc inputs across every duplicate shape, incl. gapped
    offsets."""
    import random

    from lucene_spark.functions.sloppy import (batch_lucene_repeat_freqs,
                                               lucene_sloppy_repeat_matches)
    BIG = np.int64(1) << np.int64(32)
    rnd = random.Random(29)
    for trial in range(600):
        shape = rnd.choice([("a", "a", "b"), ("b", "a", "a"),
                            ("a", "b", "a"), ("a", "a", "b", "b"),
                            ("a", "b", "a", "c"), ("b", "a", "a", "a"),
                            ("a", "a"), ("a", "a", "a")])
        terms = sorted(set(shape))
        k = len(shape)
        if rnd.random() < 0.5:
            offs = list(range(k))
        else:
            offs = [0]
            for _ in range(k - 1):
                offs.append(offs[-1] + rnd.randint(1, 3))
        slop = rnd.randint(0, 7)
        n_docs = rnd.randint(1, 6)
        pos = {}
        for d in range(n_docs):
            u = list(range(22))
            rnd.shuffle(u)
            i = 0
            for t in terms:
                c = rnd.randint(0, 5)
                pos[(d, t)] = sorted(u[i:i + c])
                i += c
        pad = max(offs) + 1
        key_lists = []
        for j, t in enumerate(shape):
            parts = [d * BIG + (np.array(pos[(d, t)], dtype=np.int64)
                                - offs[j] + pad)
                     for d in range(n_docs)]
            key_lists.append(np.concatenate(parts))
        gmap: dict = {}
        for j, t in enumerate(shape):
            gmap.setdefault(t, []).append(j)
        groups = [tuple(sorted(g, key=lambda j: offs[j]))
                  for g in gmap.values() if len(g) > 1]
        got = batch_lucene_repeat_freqs(key_lists, offs, slop, n_docs,
                                        groups)
        exp = np.zeros(n_docs)
        for d in range(n_docs):
            pls = [pos[(d, t)] for t in shape]
            if any(not p for p in pls):
                continue
            ms = lucene_sloppy_repeat_matches(pls, slop, offs)
            acc = np.float32(0.0)
            one = np.float32(1.0)
            for ml in (ms or []):
                acc = np.float32(acc + one / (one + np.float32(ml)))
            exp[d] = float(acc)
        assert np.array_equal(got, exp), (trial, shape, offs, slop)


def test_single_term_closed_form_equals_exact_walk():
    """The vectorized consecutive-m-run closed form for single-term
    default-position repeats ≡ the exact advanceRpts walk (the engine
    keeps the closed form on that path)."""
    import random

    from lucene_spark.functions.sloppy import lucene_sloppy_repeat_matches
    rnd = random.Random(17)
    for _ in range(2000):
        m = rnd.randint(2, 4)
        k = rnd.randint(0, 10)
        P = sorted(rnd.sample(range(25), k))
        slop = rnd.randint(0, 8)
        ms = lucene_sloppy_repeat_matches([P] * m, slop, list(range(m)))
        if len(P) < m:
            want = []
        else:
            want = [P[i + m - 1] - (m - 1) - P[i]
                    for i in range(len(P) - m + 1)]
            want = [ml for ml in want if ml <= slop]
        assert (ms or []) == want, (P, m, slop)
