"""Span ALGEBRA vs the reference's own iterators:
tests/data/lucene_diff/spanalg_fuzz.tsv.gz holds every span (start,
end, width) the compiled reference emitted for 120 random queries over
SpanOr / SpanNot(pre,post) / SpanFirst / SpanContaining / SpanWithin /
nested SpanNear over near- and or-clauses (the general-stream NearSpans
ports), over 400 random multi-occurrence docs with posInc-0 ties.

Comparison is exact in sequence EXCEPT inside maximal runs of spans
sharing (doc, start, end), which are compared as multisets: SpanOr's
byPositionQueue breaks full (start, end) ties by heap-internal order
seeded from the byDocQueue's doc-advance history — segment-global
state the batched engine deliberately does not replicate. Such ties
require two clauses emitting the SAME extent at the SAME position:
with single-term-per-position text that forces equal widths too (order
then cannot affect the float32 freq chain); only posInc-0 co-positions
can make tied widths differ, and those appear in no scored corpus."""

import gzip
import os
from collections import Counter

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "lucene_diff",
                      "spanalg_fuzz.tsv.gz")


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
                    pm[t] = np.array([int(x) for x in v.split(",")],
                                     dtype=np.int64)
                docs[int(p[1])] = pm
            elif p[0].startswith("QUERY"):
                head = p[0].split(" ")
                queries.append((head[1], head[2:],
                                [tuple(map(int, h.split(":")))
                                 for h in p[1:]]))
    return docs, queries


def _tree_of(kind, a):
    if kind == "or":
        t, s1, o1, x, y = a
        return ("or", (("term", t),
                       ("near", (x, y), int(s1), o1 == "o")))
    if kind == "not":
        s1, x, y, e, pre, post = a
        return ("notwin", ("near", (x, y), int(s1), False),
                ("term", e), int(pre), int(post))
    if kind == "first":
        end, s1, x, y = a
        return ("first", ("near", (x, y), int(s1), False), int(end))
    if kind == "nest":
        s1, o1, s2, o2, x, y, z = a
        return ("nearspans", (("near", (x, y), int(s1), o1 == "o"),
                              ("term", z)), int(s2), o2 == "o")
    if kind == "orn":
        s1, o1, x, y, z = a
        return ("nearspans", (("or", (("term", x), ("term", y))),
                              ("term", z)), int(s1), o1 == "o")
    if kind == "contain":
        s1, x, y, little = a
        return ("contain", ("near", (x, y), int(s1), False),
                ("term", little))
    if kind == "within":
        little, s1, x, y = a
        return ("within", ("term", little),
                ("near", (x, y), int(s1), False))
    raise ValueError(kind)


def _freq_bits(rows):
    """Per-doc SpanScorer f32 freq chain (float32 += 1/(1+width)) in
    SEQUENCE order — the scoring-visible projection of an emission
    sequence."""
    import numpy as np
    out = {}
    for (did, _s, _e, w) in rows:
        acc = out.get(did, np.float32(0.0))
        out[did] = np.float32(np.float64(acc) + 1.0 / (1.0 + w))
    return {d: np.float32(v).tobytes() for d, v in out.items()}


def _tie_canon(rows):
    """Canonicalize: sort WITHIN maximal runs of equal (doc, start,
    end) — across runs the sequence must match exactly."""
    out = []
    i = 0
    while i < len(rows):
        j = i
        while j < len(rows) and rows[j][:3] == rows[i][:3]:
            j += 1
        out.extend(sorted(rows[i:j]))
        i = j
    return out


def test_span_algebra_replays_reference():
    from lucene_spark.functions.spans import eval_span_tree
    docs, queries = _load()
    assert len(queries) == 120
    bad = 0
    tie_only = 0
    total = 0
    for kind, args, exp in queries:
        tree = _tree_of(kind, args)
        got = []
        for did in sorted(docs):
            for s, e, w in eval_span_tree(tree, docs[did]):
                got.append((did, int(s), int(e), int(w)))
        total += len(exp)
        if got == exp:
            continue
        if _tie_canon(got) == _tie_canon(exp):
            # DOCUMENTED divergence class (VERDICT r4 #7): full
            # (start, end) tie order inside SpanOr/heap runs is seeded
            # by segment-global byDocQueue history the batched engine
            # does not replicate — allowed ONLY when provably
            # score-neutral: the f32 freq chain must be bit-identical
            # in both emission orders, per doc.
            assert _freq_bits(got) == _freq_bits(exp), (kind, args)
            tie_only += 1
            continue
        bad += 1
    assert bad == 0, f"{bad} of {len(queries)} queries diverge"
    # tie-order-only diffs are allowed but must stay a small posInc-0
    # minority and never change the multiset
    assert tie_only <= 12, tie_only
    assert total > 4000


def test_batch_tree_eval_matches_per_doc_on_goldens():
    """eval_span_tree_batch over global keys ≡ the per-doc evaluator on
    every golden query (emission sequence, doc-major)."""
    from lucene_spark.functions.spans import (eval_span_tree,
                                              eval_span_tree_batch)
    BIG = np.int64(1) << np.int64(32)
    docs, queries = _load()
    key_pmap = {}
    for t in ("t0", "t1", "t2", "t3"):
        parts = [np.int64(d) * BIG + docs[d].get(t, np.empty(0, np.int64))
                 for d in sorted(docs)]
        key_pmap[t] = np.concatenate(parts)
    for kind, args, _exp in queries:
        tree = _tree_of(kind, args)
        got = eval_span_tree_batch(tree, key_pmap)
        exp = []
        for did in sorted(docs):
            base = np.int64(did) << np.int64(32)
            for s, e, w in eval_span_tree(tree, docs[did]):
                exp.append((int(base + s), int(base + e), int(w)))
        exp = np.asarray(exp, dtype=np.int64).reshape(-1, 3)
        assert np.array_equal(got, exp), (kind, args)
