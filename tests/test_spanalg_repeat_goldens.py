"""Duplicate clause terms inside COMPOSITE span trees vs the
reference's own iterators: tests/data/lucene_diff/spanalg_repeat_fuzz
.tsv.gz holds every span (start, end, width) the compiled reference
emitted for 140 random queries embedding a repeated-term SpanNear
(near(a, b, a)) under SpanOr / SpanNot / SpanFirst / SpanContaining /
SpanWithin / a parent SpanNear, plus the cross-clause duplicate
SpanNear(SpanOr(a, b), a) — over 400 random multi-occurrence docs with
posInc-0 ties (reference ``queries/spans/NearSpansUnordered.java:36``,
``SpanNearQuery.java``; this corpus is what lifted the round-4
"SpanNear with duplicate clause terms" guard in
``operators/search.py::_span_tree``).

Comparison is exact in sequence EXCEPT inside maximal runs of spans
sharing (doc, start, end), compared as multisets (same tie rationale
as test_spanalg_goldens.py: byPositionQueue/heap full-extent ties are
seeded by segment-global advance history the batched engine does not
replicate; multiset equality keeps the float32 freq chain identical
unless tied extents have different widths, which needs posInc-0
co-positions)."""

import gzip
import os

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "lucene_diff",
                      "spanalg_repeat_fuzz.tsv.gz")


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
    if kind == "orrep":
        c, s1, o1, x, y = a
        return ("or", (("term", c),
                       ("near", (x, y, x), int(s1), o1 == "o")))
    if kind == "notrep":
        s1, o1, x, y, e, pre, post = a
        return ("notwin", ("near", (x, y, x), int(s1), o1 == "o"),
                ("term", e), int(pre), int(post))
    if kind == "firstrep":
        end, s1, o1, x, y = a
        return ("first", ("near", (x, y, x), int(s1), o1 == "o"),
                int(end))
    if kind == "containrep":
        s1, o1, x, y, little = a
        return ("contain", ("near", (x, y, x), int(s1), o1 == "o"),
                ("term", little))
    if kind == "withinrep":
        little, s1, o1, x, y = a
        return ("within", ("term", little),
                ("near", (x, y, x), int(s1), o1 == "o"))
    if kind == "nestrep":
        s1, o1, s2, o2, x, y, z = a
        return ("nearspans", (("near", (x, y, x), int(s1), o1 == "o"),
                              ("term", z)), int(s2), o2 == "o")
    if kind == "ornrep":
        s1, o1, x, y = a
        return ("nearspans", (("or", (("term", x), ("term", y))),
                              ("term", x)), int(s1), o1 == "o")
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
    out = []
    i = 0
    while i < len(rows):
        j = i
        while j < len(rows) and rows[j][:3] == rows[i][:3]:
            j += 1
        out.extend(sorted(rows[i:j]))
        i = j
    return out


def test_repeat_span_algebra_replays_reference():
    from lucene_spark.functions.spans import eval_span_tree
    docs, queries = _load()
    assert len(queries) == 140
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
    assert tie_only <= 20, tie_only
    assert total > 2000


def test_batch_tree_eval_matches_per_doc_on_repeat_goldens():
    """eval_span_tree_batch over global keys ≡ the per-doc evaluator on
    every duplicate-term golden query (emission sequence, doc-major) —
    the batched multiset kernel / per-doc-walk routing must not change
    what the per-doc exact ports emit."""
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
        if not np.array_equal(got, exp):
            # batch fast-path and per-doc walk may legitimately differ
            # only inside equal-(start, end) tie runs (same rationale
            # as the sequence test); multisets must agree
            g = [tuple(r) for r in got.tolist()]
            e2 = [tuple(r) for r in exp.tolist()]
            assert _tie_canon(g) == _tie_canon(e2), (kind, args)
