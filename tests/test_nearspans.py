"""NearSpansOrdered/Unordered ports vs the reference's own iterators:
tests/data/lucene_diff/spans_fuzz.tsv.gz holds every span (start, end,
width) the compiled reference emitted for 120 random SpanNear queries
over 400 random multi-occurrence docs (incl. posInc-0 same-position
ties where the unordered heap's tie order matters). The ports must
replay every span exactly, in order."""

import gzip
import os

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "lucene_diff",
                      "spans_fuzz.tsv.gz")


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
                ordered = head[2] == "o"
                terms = head[3:]
                spans = []
                for h in p[1:]:
                    d, s, e, w = h.split(":")
                    spans.append((int(d), int(s), int(e), int(w)))
                queries.append((slop, ordered, terms, spans))
    return docs, queries


def test_ports_replay_reference_spans_exactly():
    from lucene_spark.functions.nearspans import (ordered_near_spans,
                                                  unordered_near_spans)
    docs, queries = _load()
    assert len(queries) > 100
    bad = 0
    total_spans = 0
    for slop, ordered, terms, exp in queries:
        got = []
        for did in sorted(docs):
            pm = docs[did]
            pls = [pm.get(t, []) for t in terms]
            if any(not p for p in pls):
                continue
            fn = ordered_near_spans if ordered else unordered_near_spans
            for s, e, w in fn(pls, slop):
                got.append((did, s, e, w))
        total_spans += len(exp)
        if got != exp:
            bad += 1
            if bad <= 3:
                ldiff = next(i for i in range(max(len(got), len(exp)))
                             if i >= len(got) or i >= len(exp)
                             or got[i] != exp[i])
                print("MISMATCH", slop, ordered, terms, "at", ldiff,
                      got[ldiff:ldiff + 3], exp[ldiff:ldiff + 3])
    assert bad == 0, f"{bad} of {len(queries)} queries diverge"
    assert total_spans > 5000


def test_batched_multiset_unordered_matches_heap_walk():
    """Duplicate clause terms (distinct positions): the batched
    multiset kernel — tied cells cluster, so the pop order is
    multiset-deterministic — must equal the exact per-doc heap walk
    span-for-span, in order."""
    import numpy as np

    from lucene_spark.functions.nearspans import (batch_near_spans_exact,
                                                  unordered_near_spans)
    rng = np.random.default_rng(11)
    BIG = np.int64(1) << np.int64(32)
    for trial in range(600):
        m = int(rng.integers(1, 4))
        mult = [int(rng.integers(1, 4)) for _ in range(m)]
        if all(k == 1 for k in mult):
            mult[rng.integers(0, m)] = 2
        n_docs = int(rng.integers(1, 6))
        streams = [[] for _ in range(m)]
        perdoc = []
        for d in range(n_docs):
            perm = rng.permutation(30)
            i = 0
            ds = []
            for j in range(m):
                k = int(rng.integers(0, 6))
                pos = np.sort(perm[i:i + k]).astype(np.int64)
                i += k
                ds.append(pos)
                streams[j].append(np.int64(d) * BIG + pos)
            perdoc.append(ds)
        keys = [np.concatenate(s) for s in streams]
        if any(len(a) == 0 for a in keys):
            continue
        slop = int(rng.integers(0, 9))
        clause_keys = []
        for j in range(m):
            clause_keys.extend([keys[j]] * mult[j])
        got = batch_near_spans_exact(clause_keys, slop, False)
        exp = []
        for d, ds in enumerate(perdoc):
            if any(len(p) == 0 for p in ds):
                continue
            pls = []
            for j in range(m):
                pls.extend([ds[j]] * mult[j])
            for s, e, w in unordered_near_spans(pls, slop):
                exp.append((d * int(BIG) + s, d * int(BIG) + e, w))
        exp = np.asarray(exp, dtype=np.int64).reshape(-1, 3)
        assert np.array_equal(got, exp), (trial, mult, slop)
