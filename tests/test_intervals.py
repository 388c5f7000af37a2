"""Interval query tests: brute-force minimality differentials for the
batched kernels, combinator algebra, and engine-vs-oracle parity
(modeled on the reference's TestIntervals / TestIntervalQuery)."""

from __future__ import annotations

import itertools
import tempfile

import numpy as np
import pytest

from lucene_spark.functions.intervals import (batch_interval_freqs,
                                              eval_intervals, min_extent,
                                              minimize_or,
                                              ordered_intervals,
                                              phrase_intervals,
                                              unordered_intervals)
from lucene_spark.operators.build import build_index
from lucene_spark.operators.search import Searcher
from lucene_spark.oracle import OracleIndex
from lucene_spark.plans import query as Q
from lucene_spark.sources.corpus import generate_corpus


def _antichain(valid: set[tuple[int, int]]) -> list[tuple[int, int]]:
    return sorted((s, e) for (s, e) in valid
                  if not any(s2 >= s and e2 <= e and (s2, e2) != (s, e)
                             for (s2, e2) in valid))


def _brute_ordered(lists) -> list[tuple[int, int]]:
    valid = set()
    for combo in itertools.product(*lists):
        if all(combo[i + 1] > combo[i] for i in range(len(combo) - 1)):
            valid.add((combo[0], combo[-1]))
    return _antichain(valid)


def _brute_unordered(lists) -> list[tuple[int, int]]:
    valid = set()
    for combo in itertools.product(*lists):
        valid.add((min(combo), max(combo)))
    return _antichain(valid)


def _disjoint_lists(rng, n_clauses, universe=40):
    perm = rng.permutation(universe)
    out, i = [], 0
    for _ in range(n_clauses):
        k = int(rng.integers(1, 7))
        out.append(np.sort(perm[i:i + k]).astype(np.int64))
        i += k
    return out


def test_ordered_minimal_vs_brute_force():
    rng = np.random.default_rng(3)
    for trial in range(300):
        n = int(rng.integers(2, 5))
        lists = _disjoint_lists(rng, n)
        got = ordered_intervals(lists)
        want = _brute_ordered([l.tolist() for l in lists])
        assert [(int(s), int(e)) for s, e, _ in got] == want, trial
        # gaps invariant: (end - start + 1) - n
        for s, e, g in got:
            assert g == (e - s + 1) - n


def test_ordered_emits_only_minimal():
    # the span matcher would emit [0,7] AND [5,7] here; intervals must
    # emit only the minimal [5,7] (OrderedIntervalsSource minimization)
    got = ordered_intervals([np.array([0, 5], np.int64),
                             np.array([1, 6], np.int64),
                             np.array([7], np.int64)])
    assert [(int(s), int(e)) for s, e, _ in got] == [(5, 7)]


def test_unordered_minimal_vs_brute_force():
    rng = np.random.default_rng(4)
    for trial in range(300):
        n = int(rng.integers(2, 5))
        lists = _disjoint_lists(rng, n)
        got = unordered_intervals(lists)
        want = _brute_unordered([l.tolist() for l in lists])
        assert [(int(s), int(e)) for s, e, _ in got] == want, trial


def test_phrase_intervals_consecutive():
    got = phrase_intervals([np.array([2, 9], np.int64),
                            np.array([3, 11], np.int64),
                            np.array([4, 30], np.int64)])
    assert [(int(s), int(e), int(g)) for s, e, g in got] == [(2, 4, 0)]


def test_minimize_or_antichain():
    a = np.array([[0, 5, 0], [10, 12, 0]], np.int64)
    b = np.array([[1, 3, 0], [10, 12, 0], [20, 21, 0]], np.int64)
    got = minimize_or([a, b])
    # [0,5] contains [1,3] -> dropped; [10,12] deduped
    assert [(int(s), int(e)) for s, e, _ in got] == \
        [(1, 3), (10, 12), (20, 21)]


def test_eval_tree_combinators_and_min_extent():
    BIG = np.int64(1) << np.int64(32)
    pmap = {
        "a": np.array([0, 10], np.int64),
        "b": np.array([2, 12], np.int64),
        "c": np.array([4], np.int64),
        "d": np.array([3], np.int64),
    }
    ordered = ("ordered", (("term", "a"), ("term", "b")))
    # ordered: minimal [0,2], [10,12]
    iv = eval_intervals(ordered, pmap)
    assert [(int(s), int(e), int(g)) for s, e, g in iv] == \
        [(0, 2, 1), (10, 12, 1)]
    # maxgaps 0 filters both (gap 1)
    assert len(eval_intervals(("maxgaps", ordered, 0), pmap)) == 0
    assert len(eval_intervals(("maxgaps", ordered, 1), pmap)) == 2
    # maxwidth
    assert len(eval_intervals(("maxwidth", ordered, 2), pmap)) == 0
    assert len(eval_intervals(("maxwidth", ordered, 3), pmap)) == 2
    # containing: ordered intervals containing c=4 -> none; containing d=3
    assert len(eval_intervals(("containing", ordered, ("term", "c")),
                              pmap)) == 0
    # unordered(a,b) = [0,2],[2,10]? brute: minimal windows
    unv = eval_intervals(("unordered", (("term", "a"), ("term", "b"))),
                         pmap)
    assert [(int(s), int(e)) for s, e, _ in unv] == \
        _brute_unordered([[0, 10], [2, 12]])
    # contained_by: c=4 within unordered [2,10] window
    cb = eval_intervals(
        ("contained_by", ("term", "c"),
         ("unordered", (("term", "a"), ("term", "b")))), pmap)
    assert [(int(s), int(e)) for s, e, _ in cb] == [(4, 4)]
    # not_contained_by is the complement
    ncb = eval_intervals(
        ("not_contained_by", ("term", "c"),
         ("unordered", (("term", "a"), ("term", "b")))), pmap)
    assert len(ncb) == 0
    # min extents
    assert min_extent(ordered) == 2
    assert min_extent(("maxgaps", ordered, 2)) == 2
    assert min_extent(("or", (ordered, ("term", "c")))) == 1
    assert min_extent(("containing", ordered, ("term", "c"))) == 2
    assert min_extent(("contained_by", ("term", "c"), ordered)) == 1
    # multi-doc isolation: same positions in doc 1 must not chain into
    # doc 0
    pmap2 = {"a": np.array([0, BIG + 5], np.int64),
             "b": np.array([BIG + 6], np.int64)}
    iv2 = eval_intervals(("ordered", (("term", "a"), ("term", "b"))),
                         pmap2)
    assert [(int(s >> 32), int(s & 0xFFFFFFFF), int(e & 0xFFFFFFFF))
            for s, e, _ in iv2] == [(1, 5, 6)]


def test_interval_freq_and_saturation():
    # freq = sum 1/max(len - minExtent + 1, 1)
    iv = np.array([[0, 2, 1], [10, 12, 1]], np.int64)   # doc 0, len 3
    freqs = batch_interval_freqs(iv, 2, 1)
    assert freqs[0] == pytest.approx(0.5 + 0.5, abs=0)
    from lucene_spark.functions.intervals import saturation_scores
    s = saturation_scores(np.array([1.0]), 1.0, 1.0)
    assert s[0] == np.float32(0.5)


N_DOCS = 250


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(N_DOCS, seed=19)


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex.build(list(zip(corpus.doc_id, corpus.content)))


@pytest.fixture(scope="module")
def searcher(spark, corpus):
    d = tempfile.mkdtemp(prefix="lucene_spark_intervals_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=4)
    return Searcher(spark, d)


_TREES = [
    ("ordered", (("term", "return"), ("term", "import"))),
    ("maxgaps", ("ordered", (("term", "return"), ("term", "import"))), 4),
    ("unordered", (("term", "return"), ("term", "class"))),
    ("maxwidth", ("unordered", (("term", "return"), ("term", "class"))), 8),
    ("containing", ("unordered", (("term", "return"), ("term", "class"))),
     ("term", "import")),
    ("contained_by", ("term", "import"),
     ("unordered", (("term", "return"), ("term", "class")))),
    ("not_containing",
     ("unordered", (("term", "return"), ("term", "class"))),
     ("term", "import")),
    ("ordered", (("orterms", ("return", "scan")), ("term", "import"))),
    ("phrase", (("term", "return"), ("term", "import"))),
    ("or", (("ordered", (("term", "return"), ("term", "import"))),
            ("term", "def"))),
    ("atleast", 2, (("term", "return"), ("term", "import"),
                    ("term", "class"))),
    ("before", ("term", "return"), ("term", "import")),
    ("after", ("term", "class"), ("term", "return")),
    ("within", ("term", "return"), 3, ("term", "import")),
    ("not_within", ("term", "return"), 3, ("term", "import")),
    ("unordered_no_overlaps", ("term", "return"), ("term", "import")),
]


@pytest.mark.parametrize("tree", _TREES, ids=[str(i) for i in
                                              range(len(_TREES))])
def test_interval_engine_matches_oracle(searcher, oracle, tree):
    q = Q.Interval(tree)
    got = [(r["doc_id"], r["score"])
           for r in searcher.search(q, k=10).collect()]
    want = oracle.top_k(q, k=10)
    assert len(want) > 0, f"vacuous parity case: {tree}"
    assert [g[0] for g in got] == [w[0] for w in want], tree
    for (d1, s1), (d2, s2) in zip(got, want):
        assert np.float32(s1) == np.float32(s2), (tree, d1)


def test_interval_pivot_and_boost(searcher, oracle):
    q = Q.Interval(("ordered", (("term", "return"), ("term", "import"))),
                   pivot=2.5, boost=1.7)
    got = [(r["doc_id"], r["score"])
           for r in searcher.search(q, k=10).collect()]
    want = oracle.top_k(q, k=10)
    assert [(d, np.float32(s)) for d, s in got] == \
        [(d, np.float32(s)) for d, s in want]


def test_interval_prefix_source_matches_oracle(searcher, oracle):
    """MultiTermIntervalsSource: a prefix leaf expands against the term
    dictionary into an or-of-terms stream, identically in engine and
    oracle."""
    q = Q.Interval(("ordered", (("prefix", "ret"), ("term", "import"))))
    got = [(r["doc_id"], np.float32(r["score"]))
           for r in searcher.search(q, k=10).collect()]
    want = [(d, np.float32(s)) for d, s in oracle.top_k(q, k=10)]
    assert got == want and len(got) > 0
    # wildcard kind
    q2 = Q.Interval(("unordered", (("wildcard", "clas?"),
                                   ("term", "class"))))
    got2 = [(r["doc_id"], np.float32(r["score"]))
            for r in searcher.search(q2, k=10).collect()]
    want2 = [(d, np.float32(s)) for d, s in oracle.top_k(q2, k=10)]
    assert got2 == want2


def test_extend_and_overlap_combinators():
    """Intervals.extend (pad bounds, clamp at doc position 0, gaps
    unchanged) and nonOverlapping/overlapping difference sources."""
    import numpy as np

    BIG = np.int64(1) << np.int64(32)
    pmap = {"a": np.array([1, 10, BIG + 2], np.int64),
            "b": np.array([4, BIG + 3], np.int64)}
    ext = eval_intervals(("extend", ("term", "a"), 2, 3), pmap)
    # doc 0: [1,1]->[0(clamped),4]; [10,10]->[8,13]; doc 1: [2,2]->[0,5]
    assert [(int(s >> 32), int(s & 0xFFFFFFFF), int(e & 0xFFFFFFFF),
             int(g)) for s, e, g in ext] == \
        [(0, 0, 4, 0), (0, 8, 13, 0), (1, 0, 5, 0)]
    assert min_extent(("extend", ("term", "a"), 2, 3)) == 6
    # non_overlapping: a-intervals not overlapping any b-interval
    novl = eval_intervals(("non_overlapping", ("term", "a"),
                           ("term", "b")), pmap)
    assert [(int(s & 0xFFFFFFFF)) for s, _, _ in novl] == [1, 10, 2]
    # widen b to overlap a@1 in doc 0 and a@2 in doc 1
    pmap2 = {"a": pmap["a"],
             "b": np.array([1, BIG + 2], np.int64)}
    novl2 = eval_intervals(("non_overlapping", ("term", "a"),
                            ("term", "b")), pmap2)
    assert [(int(s >> 32), int(s & 0xFFFFFFFF))
            for s, _, _ in novl2] == [(0, 10)]
    ovl2 = eval_intervals(("overlapping", ("term", "a"),
                           ("term", "b")), pmap2)
    assert [(int(s >> 32), int(s & 0xFFFFFFFF))
            for s, _, _ in ovl2] == [(0, 1), (1, 2)]
    # cross-doc isolation: b in doc 1 must not suppress a in doc 0
    pmap3 = {"a": np.array([5], np.int64),
             "b": np.array([BIG + 5], np.int64)}
    assert len(eval_intervals(("non_overlapping", ("term", "a"),
                               ("term", "b")), pmap3)) == 1


def test_extend_engine_matches_oracle(searcher, oracle):
    q = Q.Interval(("containing",
                    ("extend", ("term", "return"), 1, 2),
                    ("term", "import")))
    got = [(r["doc_id"], np.float32(r["score"]))
           for r in searcher.search(q, k=10).collect()]
    want = [(d, np.float32(s)) for d, s in oracle.top_k(q, k=10)]
    assert got == want


def _brute_atleast(lists, m) -> list[tuple[int, int]]:
    """Containment-minimal windows holding positions from >= m distinct
    streams (the predicate is monotone, so minimality = antichain)."""
    allp = sorted({p for l in lists for p in l})
    valid = set()
    for s in allp:
        for e in allp:
            if e < s:
                continue
            cov = sum(1 for l in lists if any(s <= p <= e for p in l))
            if cov >= m:
                valid.add((s, e))
    return _antichain(valid)


def test_atleast_minimal_vs_brute_force():
    from lucene_spark.functions.intervals import atleast_intervals
    rng = np.random.default_rng(11)
    for trial in range(200):
        n = int(rng.integers(2, 5))
        m = int(rng.integers(1, n + 1))
        # non-disjoint lists: streams may share positions (an or-of-terms
        # clause and a term clause can coincide)
        lists = [np.sort(rng.choice(30, size=int(rng.integers(1, 6)),
                                    replace=False)).astype(np.int64)
                 for _ in range(n)]
        got = atleast_intervals(lists, m)
        want = _brute_atleast([l.tolist() for l in lists], m)
        assert [(int(s), int(e)) for s, e, _ in got] == want, (trial, m)
        for s, e, g in got:
            assert g == (e - s + 1) - m


def test_atleast_multi_doc_and_edge_cases():
    from lucene_spark.functions.intervals import atleast_intervals
    BIG = np.int64(1) << np.int64(32)
    # doc 0 has only 2 of 3 streams; doc 1 has all 3
    lists = [np.array([1, BIG + 1], np.int64),
             np.array([4, BIG + 2], np.int64),
             np.array([BIG + 8], np.int64)]
    got = atleast_intervals(lists, 2)
    assert [(int(s >> 32), int(s & 0xFFFFFFFF), int(e & 0xFFFFFFFF))
            for s, e, _ in got] == [(0, 1, 4), (1, 1, 2), (1, 2, 8)]
    # m greater than the number of streams: no match
    assert len(atleast_intervals(lists, 4)) == 0
    # empty stream is skipped, not fatal
    lists2 = [np.array([1], np.int64), np.empty(0, np.int64),
              np.array([3], np.int64)]
    assert [(int(s), int(e)) for s, e, _ in
            atleast_intervals(lists2, 2)] == [(1, 3)]


def test_before_after_within_brute_force():
    """Sugar factories against a direct positional characterization:
    before = src points left of some ref start; after = right of some
    ref end; within d = |src - ref| <= d for some ref (term leaves)."""
    rng = np.random.default_rng(12)
    for trial in range(100):
        universe = 30
        src = np.sort(rng.choice(universe, 5, replace=False)).astype(np.int64)
        ref = np.sort(rng.choice(universe, 4, replace=False)).astype(np.int64)
        pmap = {"s": src, "r": ref}
        before = eval_intervals(("before", ("term", "s"), ("term", "r")),
                                pmap)
        want_b = [p for p in src.tolist() if p <= max(ref) - 1]
        assert [int(s) for s, _, _ in before] == want_b, trial
        after = eval_intervals(("after", ("term", "s"), ("term", "r")),
                               pmap)
        want_a = [p for p in src.tolist() if p >= min(ref) + 1]
        assert [int(s) for s, _, _ in after] == want_a, trial
        d = int(rng.integers(0, 6))
        within = eval_intervals(("within", ("term", "s"), d, ("term", "r")),
                                pmap)
        want_w = [p for p in src.tolist()
                  if any(abs(p - q) <= d for q in ref.tolist())]
        assert [int(s) for s, _, _ in within] == want_w, (trial, d)
        notw = eval_intervals(("not_within", ("term", "s"), d,
                               ("term", "r")), pmap)
        want_nw = [p for p in src.tolist() if p not in want_w]
        assert [int(s) for s, _, _ in notw] == want_nw, (trial, d)


def test_fuzzy_interval_leaf_matches_oracle(searcher, oracle):
    """Intervals.fuzzyTerm: dictionary expansion to an or-of-terms
    stream, same expansion on both sides."""
    q = Q.Interval(("ordered", (("fuzzy", "return", 1), ("term", "import"))))
    got = [(r["doc_id"], np.float32(r["score"]))
           for r in searcher.search(q, k=10).collect()]
    want = [(d, np.float32(s)) for d, s in oracle.top_k(q, k=10)]
    assert got == want and len(got) > 0


def test_atleast_engine_matches_oracle_with_maxgaps(searcher, oracle):
    q = Q.Interval(("maxgaps",
                    ("atleast", 2, (("term", "return"), ("term", "import"),
                                    ("term", "class"))), 5))
    got = [(r["doc_id"], np.float32(r["score"]))
           for r in searcher.search(q, k=10).collect()]
    want = [(d, np.float32(s)) for d, s in oracle.top_k(q, k=10)]
    assert got == want and len(got) > 0


def _brute_nested(lists_by_leaf, tree):
    """Set-of-intervals brute force over a nested tree of term leaves:
    ordered = all in-order chains (next.start > prev.end), unordered =
    all combos' spanning windows; each node's emission is the
    containment antichain of its valid windows."""
    kind = tree[0]
    if kind == "term":
        return [(p, p) for p in lists_by_leaf[tree[1]]]
    subs = [_brute_nested(lists_by_leaf, c) for c in tree[1]]
    valid = set()
    for combo in itertools.product(*subs):
        if kind == "ordered":
            if all(combo[i + 1][0] > combo[i][1]
                   for i in range(len(combo) - 1)):
                valid.add((combo[0][0], combo[-1][1]))
        else:
            valid.add((min(c[0] for c in combo),
                       max(c[1] for c in combo)))
    return _antichain(valid)


def test_nested_interval_sources_vs_brute_force():
    rng = np.random.default_rng(21)
    shapes = [
        ("ordered", (("ordered", (("term", "a"), ("term", "b"))),
                     ("term", "c"))),
        ("unordered", (("ordered", (("term", "a"), ("term", "b"))),
                       ("term", "c"))),
        ("ordered", (("term", "c"),
                     ("unordered", (("term", "a"), ("term", "b"))))),
        ("unordered", (("unordered", (("term", "a"), ("term", "b"))),
                       ("ordered", (("term", "c"), ("term", "d"))))),
        ("ordered", (("ordered", (("term", "a"), ("term", "b"))),
                     ("ordered", (("term", "c"), ("term", "d"))))),
    ]
    from lucene_spark.functions.intervals import ordered_walk_exact

    def flatten(tree):
        if tree[0] in ("ordered", "unordered"):
            kids = []
            for c in tree[1]:
                c = flatten(c)
                if c[0] == tree[0]:
                    kids.extend(c[1])
                else:
                    kids.append(c)
            return (tree[0], tuple(kids))
        return tree

    for trial in range(150):
        lists = {t: np.sort(rng.choice(40, size=int(rng.integers(1, 6)),
                                       replace=False)).astype(np.int64)
                 for t in "abcd"}
        for tree in shapes:
            got = eval_intervals(tree, lists)
            flat = flatten(tree)
            if flat[0] == "ordered" and \
                    all(c[0] == "term" for c in flat[1]):
                # same-kind nesting flattens (reference build()); >= 3
                # term clauses take the exact lastStart-minimizing walk,
                # a SUBSET of the brute containment antichain
                subs = [np.stack([lists[c[1]], lists[c[1]],
                                  np.zeros(len(lists[c[1]]), np.int64)],
                                 axis=1) for c in flat[1]]
                want = [(int(s), int(e))
                        for s, e, _ in ordered_walk_exact(subs)]
            else:
                want = _brute_nested(
                    {t: l.tolist() for t, l in lists.items()}, flat)
            assert [(int(s), int(e)) for s, e, _ in got] == want, \
                (trial, tree)


def test_nested_interval_multi_doc_and_gaps():
    BIG = np.int64(1) << np.int64(32)
    pmap = {"a": np.array([1, 12, BIG + 2], np.int64),
            "b": np.array([3, 14, BIG + 4], np.int64),
            "c": np.array([6, 20, BIG + 9], np.int64)}
    t = ("ordered", (("ordered", (("term", "a"), ("term", "b"))),
                     ("term", "c")))
    iv = eval_intervals(t, pmap)
    # ORDERED(ORDERED(a,b),c) flattens to ORDERED(a,b,c) (reference
    # build()): gaps = extent - 3 per flat emission — doc 1 chain
    # [2,4,9]: (9-2+1) - 3 = 5
    assert [(int(s >> 32), int(s & 0xFFFFFFFF), int(e & 0xFFFFFFFF),
             int(g)) for s, e, g in iv] == \
        [(0, 1, 6, 3), (0, 12, 20, 6), (1, 2, 9, 5)]
    assert min_extent(t) == 3


def test_nested_interval_engine_matches_oracle(searcher, oracle):
    trees = [
        ("ordered", (("ordered", (("term", "return"), ("term", "if"))),
                     ("term", "import"))),
        ("unordered", (("ordered", (("term", "return"), ("term", "if"))),
                       ("term", "import"))),
        ("maxgaps", ("ordered", (
            ("ordered", (("term", "return"), ("term", "if"))),
            ("term", "import"))), 4),
    ]
    for tree in trees:
        q = Q.Interval(tree)
        got = [(r["doc_id"], np.float32(r["score"]))
               for r in searcher.search(q, k=10).collect()]
        want = [(d, np.float32(s)) for d, s in oracle.top_k(q, k=10)]
        assert len(want) > 0, tree
        assert got == want, tree


def test_block_over_nested_and_analyzed_text():
    from lucene_spark.functions.intervals import block_over
    BIG = np.int64(1) << np.int64(32)
    # phrase(or(a,b), c): union first slot, exact next-start chaining
    pmap = {"a": np.array([1, 10], np.int64),
            "b": np.array([4, BIG + 0], np.int64),
            "c": np.array([2, 5, BIG + 1], np.int64)}
    t = ("phrase", (("orterms", ("a", "b")), ("term", "c")))
    iv = eval_intervals(t, pmap)
    assert [(int(s >> 32), int(s & 0xFFFFFFFF), int(e & 0xFFFFFFFF),
             int(g)) for s, e, g in iv] == \
        [(0, 1, 2, 0), (0, 4, 5, 0), (1, 0, 1, 0)]
    # nested: phrase(ordered(a,c), c) — block over a non-stream child
    pmap2 = {"a": np.array([0], np.int64),
             "c": np.array([2, 3], np.int64)}
    t2 = ("phrase", (("ordered", (("term", "a"), ("term", "c"))),
                     ("term", "c")))
    # ordered(a,c) minimal = [0,2]; block next must start at 3 → [0,3]
    iv2 = eval_intervals(t2, pmap2)
    assert [(int(s), int(e), int(g)) for s, e, g in iv2] == [(0, 3, 0)]
    assert min_extent(t2) == 3
    # analyzedText sugar == maxgaps(ordered(...), g)
    t3 = ("analyzed_text", "Foo, bar!", 1, True)
    pmap3 = {"foo": np.array([0, 7], np.int64),
             "bar": np.array([2, 12], np.int64)}
    iv3 = eval_intervals(t3, pmap3)
    want = eval_intervals(
        ("maxgaps", ("ordered", (("term", "foo"), ("term", "bar"))), 1),
        pmap3)
    assert (iv3 == want).all() and len(iv3) == 1
    # empty analysis never matches
    assert len(eval_intervals(("analyzed_text", "", 0, True), pmap3)) == 0
