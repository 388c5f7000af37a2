"""Exact interval walks vs the reference's own iterators:
tests/data/lucene_diff/intervals_fuzz.tsv.gz holds every interval
(start, end, gaps) the compiled reference emitted for 187 random
interval queries across 11 source shapes (flat ordered/unordered 2-4
term clauses, ordered over or-of-terms, nested same-kind flattening,
unordered-over-ordered, ordered-over-unordered, containing,
containedBy, and DUPLICATE clauses — RepeatingIntervalsSource sliding
windows over term AND general (equal unordered) children, ordered and
unordered) over 400 random
multi-occurrence docs with posInc-0 ties. The per-doc port, the
batched wave kernel and the declarative unordered kernel must replay
every interval exactly, in order — including the reference's build()
flattening of nested same-kind sources and NEGATIVE gaps on
overlapping posInc-0 clauses."""

import gzip
import os

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "lucene_diff",
                      "intervals_fuzz.tsv.gz")


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
                queries.append((head[1], head[2:],
                                [tuple(map(int, h.split(":")))
                                 for h in p[1:]]))
    return docs, queries


def _term_stream(pm, t):
    a = np.array(sorted(pm.get(t, [])), dtype=np.int64)
    return np.stack([a, a, np.zeros(len(a), np.int64)], axis=1)


def _tree_of(kind, terms):
    def t(x):
        return ("term", x)

    if kind in ("o", "odup"):
        return ("ordered", tuple(t(x) for x in terms))
    if kind in ("u", "udup"):
        return ("unordered", tuple(t(x) for x in terms))
    if kind == "or2":
        return ("ordered", (("orterms", (terms[0], terms[1])),
                            t(terms[2])))
    if kind == "nest":
        return ("ordered", (("ordered", (t(terms[0]), t(terms[1]))),
                            t(terms[2])))
    if kind == "unest":
        return ("unordered", (("ordered", (t(terms[0]), t(terms[1]))),
                              t(terms[2])))
    if kind == "onestu":
        return ("ordered", (("unordered", (t(terms[0]), t(terms[1]))),
                            t(terms[2])))
    if kind == "cont":
        return ("containing", ("unordered", (t(terms[0]), t(terms[1]))),
                t(terms[2]))
    if kind == "cby":
        return ("contained_by", t(terms[0]),
                ("unordered", (t(terms[1]), t(terms[2]))))
    if kind == "odupg":
        u = ("unordered", (t(terms[0]), t(terms[1])))
        return ("ordered", (u, u, t(terms[2])))
    raise ValueError(kind)


def test_engine_eval_replays_reference_exactly():
    """The ENGINE evaluation path (eval_intervals on doc-major global
    keys — flattening, the batched exact ordered kernel with its
    posInc-0 per-doc fallback, unordered windows, containing /
    contained_by masks) replays every reference emission exactly, in
    order, for all 187 fuzz queries across 11 source shapes."""
    from lucene_spark.functions.intervals import eval_intervals
    BIG = np.int64(1) << np.int64(32)
    docs, queries = _load()
    assert len(queries) == 187
    pmap = {}
    for t in ("t0", "t1", "t2", "t3"):
        parts = [np.int64(d) * BIG
                 + np.array(sorted(docs[d].get(t, [])), dtype=np.int64)
                 for d in sorted(docs)]
        pmap[t] = np.concatenate(parts)
    bad = 0
    total = 0
    for kind, terms, exp in queries:
        iv = eval_intervals(_tree_of(kind, terms), pmap)
        got = [(int(s >> 32), int(s & 0xFFFFFFFF),
                int(e & 0xFFFFFFFF), int(g)) for s, e, g in iv]
        total += len(exp)
        bad += got != exp
    assert bad == 0, f"{bad} of {len(queries)} queries diverge"
    assert total > 4000


def test_perdoc_walk_replays_reference_exactly():
    from lucene_spark.functions.intervals import (ordered_walk_exact,
                                                  unordered_intervals)
    docs, queries = _load()
    bad = 0
    total = 0
    for kind, terms, exp in queries:
        if kind not in ("o", "nest", "or2", "u"):
            continue
        got = []
        for did in sorted(docs):
            pm = docs[did]
            if kind == "u":
                ks = [np.array(sorted(pm.get(t, [])), dtype=np.int64)
                      for t in terms]
                if any(len(k) == 0 for k in ks):
                    continue
                em = [(int(r[0]), int(r[1]), int(r[2]))
                      for r in unordered_intervals(ks)]
            elif kind == "or2":
                a, b, c = terms
                u = sorted(set(pm.get(a, [])) | set(pm.get(b, [])))
                ua = np.array(u, dtype=np.int64)
                s0 = np.stack([ua, ua, np.zeros(len(ua), np.int64)],
                              axis=1)
                s1 = _term_stream(pm, c)
                if len(s0) == 0 or len(s1) == 0:
                    continue
                em = ordered_walk_exact([s0, s1])
            else:
                # "o" flat; "nest" = ORDERED(ORDERED(a,b),c) which the
                # reference build() FLATTENS to ORDERED(a,b,c)
                subs = [_term_stream(pm, t) for t in terms]
                if any(len(s) == 0 for s in subs):
                    continue
                em = ordered_walk_exact(subs)
            for s, e, g in em:
                got.append((did, s, e, g))
        total += len(exp)
        bad += got != exp
    assert bad == 0, "per-doc walk diverges"
    assert total > 3000


def test_batched_wave_kernel_matches_walk():
    """batch_ordered_exact ≡ per-doc ordered_walk_exact on randomized
    multi-doc width-1 streams (distinct positions per doc — the real
    single-term-per-position index invariant), n = 3..5 clauses."""
    from lucene_spark.functions.intervals import (batch_ordered_exact,
                                                  ordered_walk_exact)
    rng = np.random.default_rng(23)
    BIG = np.int64(1) << np.int64(32)
    for trial in range(400):
        n = int(rng.integers(3, 6))
        n_docs = int(rng.integers(1, 7))
        streams = [[] for _ in range(n)]
        perdoc = []
        for d in range(n_docs):
            perm = rng.permutation(40)
            i = 0
            doc_streams = []
            for j in range(n):
                k = int(rng.integers(0, 7))
                pos = np.sort(perm[i:i + k]).astype(np.int64)
                i += k
                doc_streams.append(pos)
                streams[j].append(np.int64(d) * BIG + pos)
            perdoc.append(doc_streams)
        keys = [np.concatenate(s) for s in streams]
        if any(len(k) == 0 for k in keys):
            continue
        got = batch_ordered_exact(keys)
        exp = []
        for d, doc_streams in enumerate(perdoc):
            if any(len(p) == 0 for p in doc_streams):
                continue
            subs = [np.stack([p, p, np.zeros(len(p), np.int64)], axis=1)
                    for p in doc_streams]
            for s, e, g in ordered_walk_exact(subs):
                exp.append((d * int(BIG) + s, d * int(BIG) + e, g))
        exp = np.asarray(exp, dtype=np.int64).reshape(-1, 3)
        assert np.array_equal(got, exp), trial


def test_two_clause_closed_form_equals_walk():
    """For n <= 2 the declarative ordered closed form ≡ the exact lazy
    walk (the engine keeps the closed form on that path)."""
    from lucene_spark.functions.intervals import (ordered_intervals,
                                                  ordered_walk_exact)
    rng = np.random.default_rng(29)
    for _ in range(500):
        perm = rng.permutation(30)
        k0, k1 = rng.integers(0, 8, 2)
        s0 = np.sort(perm[:k0]).astype(np.int64)
        s1 = np.sort(perm[k0:k0 + k1]).astype(np.int64)
        if len(s0) == 0 or len(s1) == 0:
            continue
        closed = ordered_intervals([s0, s1])
        subs = [np.stack([p, p, np.zeros(len(p), np.int64)], axis=1)
                for p in (s0, s1)]
        walk = np.asarray(ordered_walk_exact(subs),
                          dtype=np.int64).reshape(-1, 3)
        assert np.array_equal(closed, walk), (s0, s1)
