"""Minimal-interval query algebra (the reference's ``queries/intervals``
package, Vigna's lazy minimal-interval semantics).

Reference: ``lucene/queries/src/java/org/apache/lucene/queries/intervals/
IntervalQuery.java:59`` (scoring), ``Intervals.java`` (factory),
``OrderedIntervalsSource.java:135-174`` (ordered minimization),
``UnorderedIntervalsSource.java`` / ``MinimizingConjunctionIntervalsSource``
(unordered minimal windows), ``FilteredIntervalsSource.java:31-77``
(maxgaps / maxwidth), ``ContainingIntervalsSource.java`` /
``ContainedByIntervalsSource.java``, ``IntervalScorer.java:66-75``
(freq = Σ 1 / max(length - minExtent + 1, 1)).

Unlike the span module (whose greedy matcher deliberately mirrors
SpanNearQuery's overlapping emissions), interval iterators emit ONLY
minimal intervals — no emitted interval properly contains another from
the same source. All kernels below are batched across every document at
once on doc-major global keys ``doc << 32 | position`` (positions
< 2^31, so doc key ranges are disjoint and wider than any interval —
the same embedding the batched span kernels use):

* ordered, n <= 2 — closed form of the reference's lazy loop: the
  minimal intervals are [f, R(f)] for the LAST alive f of each
  distinct (doc, R) — one vectorized pass (provably ≡ the lazy walk
  at n <= 2).
* ordered, n >= 3 — :func:`batch_ordered_exact`, the wave-lockstep
  closed form of the exact lastStart-minimizing walk.
* unordered — the double-minimal complete windows (both-side minimal),
  shared with the sloppy-phrase kernel (fuzz-pinned ≡ the reference's
  queue walk for 2-4 clauses).
* phrase (BlockIntervalsSource) — consecutive chain via key probes.

Scope (documented): ordered/unordered clauses may be ANY interval
sub-source (nested ordered-inside-ordered etc. — the width-1 stream
case keeps its dedicated closed-form kernels; general children run
through :func:`ordered_over` / :func:`unordered_over`, which exploit
the containment-antichain property of minimal-interval streams);
phrase/atleast clauses are POSITION STREAMS (a term or an OR of
terms). Combinators (maxgaps/maxwidth/containing/contained_by/not_*/
or/extend/non_overlapping/overlapping/offset) compose freely on
interval streams, and the sugar factories before/after/within/
not_within/unordered_no_overlaps desugar into those exactly as
``Intervals.java`` composes them. Duplicate clause terms collapse into
:func:`repeating_intervals` sliding windows exactly as the reference's
build() deduplication does (adjacent-equal for ordered, global for
unordered — RepeatingIntervalsSource), and compositions containing a
Repeating clause run the exact per-doc walks (ordered lastStart /
unordered queue incl. heap tie order).

EXACTNESS (fuzz-pinned against the compiled reference, tests/data/
lucene_diff/intervals_fuzz.tsv.gz + test_intervals_exact.py): ordered
is the reference's lazy lastStart-minimizing walk EXACTLY —
:func:`ordered_walk_exact` is a line-for-line port of
OrderedIntervalsSource.nextInterval (:117-186), and the n >= 3 stream
path runs its wave-batched closed form :func:`batch_ordered_exact`
(n <= 2 keeps the declarative closed form, which provably coincides).
Nested same-kind sources FLATTEN exactly as the reference's build()
does (ORDERED(ORDERED(a,b),c) = ORDERED(a,b,c)). Unordered's
declarative double-minimal windows replay the reference's walk
verbatim (fuzz: 2-4 clauses, all exact incl. posInc-0 negative gaps).
The real-Lucene differential q65-q70 incl. the 3-clause q67 asserts
bit-identical scores.
"""

from __future__ import annotations

import numpy as np

from .spans import _batch_double_minimal

_EMPTY = np.empty((0, 3), dtype=np.int64)

#: Interval arrays are (m, 3) int64: [start_key, end_key, gaps] with
#: INCLUSIVE end positions (the reference's Interval convention), rows
#: sorted by (start_key, end_key), doc-major.


def _stream_keys(node, pmap: dict[str, np.ndarray]) -> np.ndarray:
    """Sorted global position keys of a width-1 stream node."""
    kind = node[0]
    if kind == "term":
        return pmap.get(node[1], np.empty(0, np.int64))
    if kind == "orterms":
        parts = [pmap.get(t, np.empty(0, np.int64)) for t in node[1]]
        parts = [p for p in parts if len(p)]
        if not parts:
            return np.empty(0, np.int64)
        # distinct terms never share a position, so this is a disjoint
        # sorted union
        return np.sort(np.concatenate(parts))
    raise TypeError(f"ordered/unordered clause must be a position "
                    f"stream (term | orterms), got {node!r}")


def _is_stream(node) -> bool:
    return node[0] in ("term", "orterms")


def ordered_intervals(streams: list[np.ndarray]) -> np.ndarray:
    """Minimal ordered intervals over width-1 clause streams
    (OrderedIntervalsSource.java:135 role): [f, R(f)] where R(f) is the
    greedy strictly-increasing chain end and f is the last alive start
    with that (doc, R). gaps = (R - f + 1) - n_clauses."""
    n = len(streams)
    if n == 0 or any(len(s) == 0 for s in streams):
        return _EMPTY
    first = streams[0]
    if n == 1:
        return np.stack([first, first,
                         np.zeros(len(first), np.int64)], axis=1)
    doc_of = first >> 32
    alive = np.ones(len(first), dtype=bool)
    prev = first
    for j in range(1, n):
        a = streams[j]
        idx = np.searchsorted(a, prev, side="right")
        alive &= idx < len(a)
        nxt = a[np.clip(idx, 0, len(a) - 1)]
        alive &= (nxt >> 32) == doc_of
        prev = nxt
    fs, rs, ds = first[alive], prev[alive], doc_of[alive]
    if len(fs) == 0:
        return _EMPTY
    # minimal: last alive start per distinct (doc, chain end) — chain
    # ends are nondecreasing within a doc, so comparing neighbours works
    keep = np.ones(len(fs), dtype=bool)
    keep[:-1] = (rs[1:] > rs[:-1]) | (ds[1:] != ds[:-1])
    gaps = (rs[keep] - fs[keep] + 1) - n
    return np.stack([fs[keep], rs[keep], gaps], axis=1)


def unordered_intervals(streams: list[np.ndarray]) -> np.ndarray:
    """Minimal unordered intervals (overlap allowed) over width-1 clause
    streams: the double-minimal complete windows. gaps = len - n."""
    n = len(streams)
    if n == 0 or any(len(s) == 0 for s in streams):
        return _EMPTY
    if n == 1:
        s = streams[0]
        return np.stack([s, s, np.zeros(len(s), np.int64)], axis=1)
    L, R = _batch_double_minimal(streams)
    if len(L) == 0:
        return _EMPTY
    # no clamp: the reference reports NEGATIVE gaps when posInc-0
    # clauses overlap inside the window (slop bookkeeping, fuzz-pinned)
    gaps = R - L + 1 - n
    return np.stack([L, R, gaps], axis=1)


def phrase_intervals(streams: list[np.ndarray]) -> np.ndarray:
    """BlockIntervalsSource: clause j at exactly start + j (consecutive
    width-1 sub-intervals); gaps = 0."""
    n = len(streams)
    if n == 0 or any(len(s) == 0 for s in streams):
        return _EMPTY
    first = streams[0]
    ok = np.ones(len(first), dtype=bool)
    for j in range(1, n):
        a = streams[j]
        probe = first + np.int64(j)
        idx = np.searchsorted(a, probe)
        hit = (idx < len(a)) & (a[np.clip(idx, 0, len(a) - 1)] == probe)
        ok &= hit
    fs = first[ok]
    if len(fs) == 0:
        return _EMPTY
    return np.stack([fs, fs + n - 1, np.zeros(len(fs), np.int64)], axis=1)


def minimize_or(parts: list[np.ndarray]) -> np.ndarray:
    """Disjunction with minimal-interval suppression: the union of the
    child interval sets minus any interval that properly contains
    another (and exact duplicates) — the emitted set is an antichain
    under containment, like DisjunctionIntervalsSource's unwatch/minimize
    behavior."""
    parts = [p for p in parts if len(p)]
    if not parts:
        return _EMPTY
    allv = np.concatenate(parts)
    order = np.lexsort((allv[:, 1], allv[:, 0]))
    allv = allv[order]
    # same start: the shortest wins (longer ones contain it)
    first_of_start = np.ones(len(allv), dtype=bool)
    first_of_start[1:] = allv[1:, 0] != allv[:-1, 0]
    allv = allv[first_of_start]
    if len(allv) <= 1:
        return allv
    # drop i if some j with start_j > start_i has end_j <= end_i:
    # suffix-min of ends over strictly later starts
    ends = allv[:, 1]
    suff = np.minimum.accumulate(ends[::-1])[::-1]
    # first index with start > start_i  (starts now strictly increasing)
    nxt = np.arange(1, len(allv) + 1)
    contains_other = np.zeros(len(allv), dtype=bool)
    valid = nxt < len(allv)
    contains_other[valid] = suff[nxt[valid]] <= ends[valid]
    return allv[~contains_other]


def _overlap_mask(src: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """bool over src rows: overlaps some ref interval (inclusive ends:
    s <= e2 and s2 <= e). Doc-safe on global keys (disjoint doc
    ranges)."""
    if len(src) == 0 or len(ref) == 0:
        return np.zeros(len(src), dtype=bool)
    order = np.argsort(ref[:, 0], kind="mergesort")
    starts = ref[order, 0]
    pmax_end = np.maximum.accumulate(ref[order, 1])
    idx = np.searchsorted(starts, src[:, 1], side="right")
    ok = idx > 0
    m = np.where(ok, pmax_end[np.maximum(idx - 1, 0)],
                 np.iinfo(np.int64).min)
    return ok & (m >= src[:, 0])


def _containment_mask(big: np.ndarray, little: np.ndarray) -> np.ndarray:
    """bool over big rows: contains some little ([s2,e2] ⊆ [s,e])."""
    if len(big) == 0 or len(little) == 0:
        return np.zeros(len(big), dtype=bool)
    order = np.argsort(little[:, 0], kind="mergesort")
    ls, le = little[order, 0], little[order, 1]
    suffix_min = np.minimum.accumulate(le[::-1])[::-1]
    idx = np.searchsorted(ls, big[:, 0], side="left")
    ok = idx < len(ls)
    m = np.where(ok, suffix_min[np.minimum(idx, len(ls) - 1)],
                 np.iinfo(np.int64).max)
    return ok & (m <= big[:, 1])


def _within_mask(little: np.ndarray, big: np.ndarray) -> np.ndarray:
    """bool over little rows: contained by some big."""
    if len(little) == 0 or len(big) == 0:
        return np.zeros(len(little), dtype=bool)
    order = np.argsort(big[:, 0], kind="mergesort")
    bs, be = big[order, 0], big[order, 1]
    prefix_max = np.maximum.accumulate(be)
    idx = np.searchsorted(bs, little[:, 0], side="right")
    ok = idx > 0
    m = np.where(ok, prefix_max[np.maximum(idx - 1, 0)],
                 np.iinfo(np.int64).min)
    return ok & (m >= little[:, 1])


#: "Unbounded" one-sided extension (Intervals.before/after use
#: Integer.MAX_VALUE). Positions are < 2^31, so pos + _BIGEXT stays inside
#: the owning doc's 32-bit key range — extended intervals never cross docs.
_BIGEXT = (1 << 31) - 1


def desugar(tree):
    """Rewrite the reference's convenience factories into core kinds,
    exactly as ``Intervals.java`` composes them:

    * ``("before", src, ref)`` → ``containedBy(src, extend(offset(ref,
      before=True), MAX, 0))`` (Intervals.java:490)
    * ``("after", src, ref)`` → ``containedBy(src, extend(offset(ref,
      before=False), 0, MAX))`` (Intervals.java:496)
    * ``("within", src, positions, ref)`` → ``containedBy(src,
      extend(ref, positions, positions))`` (Intervals.java:417)
    * ``("not_within", minuend, positions, sub)`` →
      ``nonOverlapping(minuend, extend(sub, positions, positions))``
      (Intervals.java:402)
    * ``("unordered_no_overlaps", a, b)`` → ``or(ordered(a, b),
      ordered(b, a))`` (Intervals.java:354)
    """
    kind = tree[0]
    if kind == "before":
        return ("contained_by", tree[1],
                ("extend", ("offset", tree[2], True), _BIGEXT, 0))
    if kind == "after":
        return ("contained_by", tree[1],
                ("extend", ("offset", tree[2], False), 0, _BIGEXT))
    if kind == "within":
        return ("contained_by", tree[1],
                ("extend", tree[3], int(tree[2]), int(tree[2])))
    if kind == "not_within":
        return ("non_overlapping", tree[1],
                ("extend", tree[3], int(tree[2]), int(tree[2])))
    if kind == "unordered_no_overlaps":
        return ("or", (("ordered", (tree[1], tree[2])),
                       ("ordered", (tree[2], tree[1]))))
    if kind == "analyzed_text":
        # Intervals.analyzedText (Intervals.java:517): run the standard
        # analyzer over the text and build ordered/unordered-with-maxgaps
        # over the resulting token stream
        from .analysis import analyze_text
        terms = analyze_text(str(tree[1]))[0]
        if not terms:
            return ("orterms", ())         # empty source, never matches
        inner = (("term", terms[0]) if len(terms) == 1 else
                 ("ordered" if tree[3] else "unordered",
                  tuple(("term", t) for t in terms)))
        return ("maxgaps", inner, int(tree[2]))
    return tree


def _flatten_same(children, kind: str) -> tuple:
    """OrderedIntervalsSource.build / UnorderedIntervalsSource.build
    flatten same-kind children into the parent's clause list
    (``OrderedIntervalsSource.java:40-49``): ORDERED(ORDERED(a, b), c)
    IS ORDERED(a, b, c) in the reference (fuzz-pinned — the nested
    goldens replay exactly as the flat walk). Recursive; filter
    wrappers (maxgaps/containing/...) are different sources and do NOT
    flatten."""
    out = []
    for c in children:
        if c[0] == kind:
            out.extend(_flatten_same(c[1], kind))
        else:
            out.append(c)
    return tuple(out)


def _group_emission(child, k: int, pmap) -> np.ndarray:
    """Emission stream of one deduplicated clause group: the child's
    own emissions (width-1 rows for streams), wrapped in
    :func:`repeating_intervals` when the group collapsed k > 1 equal
    sources."""
    if _is_stream(child):
        s = _stream_keys(child, pmap)
        iv = np.stack([s, s, np.zeros(len(s), np.int64)], axis=1) \
            if len(s) else _EMPTY
    else:
        iv = _norm_antichain(eval_intervals(child, pmap))
    return repeating_intervals(iv, k) if k > 1 else iv


def _ordered_over_exact(ivs: list[np.ndarray],
                        force_walk: bool = False) -> np.ndarray:
    """Reference-exact ordered conjunction over general SUB-INTERVAL
    streams: per-doc :func:`ordered_walk_exact` (the cold path — flat
    term/orterms clauses take the batched kernels; this covers e.g.
    ordered(unordered(...), term) mixes). n <= 2 keeps the closed-form
    :func:`ordered_over` (lazy walk ≡ declarative there) unless
    ``force_walk`` (repeating clauses: sliding-window streams are not
    covered by the n=2 equivalence argument)."""
    n = len(ivs)
    if n == 0 or any(len(v) == 0 for v in ivs):
        return _EMPTY
    if n <= 2 and not force_walk:
        return ordered_over(ivs)
    return _per_doc_over(ivs, ordered_walk_exact)


def _per_doc_over(ivs: list[np.ndarray], walk) -> np.ndarray:
    """Split doc-major clause emission arrays per doc (docs holding
    every clause), run the exact per-doc ``walk`` on local positions,
    re-key and concatenate in doc order (within-doc emission order
    preserved)."""
    docsets = []
    split = []
    for v in ivs:
        docs = v[:, 0] >> np.int64(32)
        cuts = np.nonzero(docs[1:] != docs[:-1])[0] + 1
        blocks = np.split(v, cuts)
        uniq = docs[np.concatenate(([0], cuts))]
        split.append(dict(zip(uniq.tolist(), blocks)))
        docsets.append(set(uniq.tolist()))
    common = sorted(set.intersection(*docsets))
    parts = []
    for d in common:
        base = np.int64(d) << np.int64(32)
        subs = []
        for sp in split:
            b = sp[d].copy()
            b[:, 0] -= base
            b[:, 1] -= base
            subs.append(b)
        em = walk(subs)
        if em:
            arr = np.asarray(em, dtype=np.int64).reshape(-1, 3)
            arr[:, 0] += base
            arr[:, 1] += base
            parts.append(arr)
    return np.concatenate(parts) if parts else _EMPTY


def repeating_intervals(child_iv: np.ndarray, k: int) -> np.ndarray:
    """RepeatingIntervalsSource's DuplicateIntervalIterator
    (``queries/intervals/RepeatingIntervalsSource.java``): the
    reference's build() collapses EQUAL clause sources into a sliding
    window of k consecutive child emissions — emission j =
    [child_j.start, child_{j+k-1}.end]. gaps replays the reference's
    own width() arithmetic, which sums ``start - end + 1`` per cached
    line (k for width-1 term inners): gaps = extent - Σ(s_i - e_i + 1).
    Windows never cross a doc (nextDoc clears the cache)."""
    m = len(child_iv) - k + 1
    if m <= 0:
        return np.empty((0, 4), dtype=np.int64)
    s = child_iv[:m, 0]
    e = child_iv[k - 1:, 1]
    same = (s >> np.int64(32)) == (e >> np.int64(32))
    line = child_iv[:, 0] - child_iv[:, 1] + 1
    csum = np.concatenate([np.zeros(1, np.int64), np.cumsum(line)])
    wsum = csum[k:] - csum[:-k]
    gaps = (e - s + 1) - wsum
    # 4th column: the iterator's width() — parent conjunctions subtract
    # THIS (not the extent) in their slop bookkeeping
    out = np.stack([s, e, gaps, wsum], axis=1)
    return out[same]


def _dedup_adjacent(children) -> list:
    """OrderedIntervalsSource.deduplicate: ADJACENT equal sources
    collapse into (source, count) groups."""
    groups: list = []
    for c in children:
        if groups and groups[-1][0] == c:
            groups[-1][1] += 1
        else:
            groups.append([c, 1])
    return groups


def _dedup_global(children) -> list:
    """UnorderedIntervalsSource.deduplicate: ALL equal sources collapse
    (LinkedHashMap — first-occurrence order)."""
    order: list = []
    counts: dict = {}
    for c in children:
        if c not in counts:
            order.append(c)
            counts[c] = 0
        counts[c] += 1
    return [[c, counts[c]] for c in order]


def _norm_antichain(iv: np.ndarray) -> np.ndarray:
    """Normalize an interval array to a containment antichain (idempotent
    for kernel outputs; extend/offset clamping can produce same-start or
    nested rows, which would break the monotone-chain arguments below)."""
    return minimize_or([iv]) if len(iv) else iv


def ordered_over(ivs: list[np.ndarray]) -> np.ndarray:
    """Minimal ordered conjunction over arbitrary SUB-INTERVAL streams
    (OrderedIntervalsSource.java:135-174 over nested sources): clause
    j+1's first interval with start > prev.end. Each input is a
    containment antichain, so starts and ends are both strictly
    increasing — the greedy chain end R(i0) is nondecreasing in the
    first-clause index, and the minimal set is the last chain per
    distinct (doc, R), exactly like the width-1 closed form.
    gaps = (R - L + 1) - Σ chosen sub-widths (the iterator's
    slop -= subIterator.width() bookkeeping — a sub-interval's INTERNAL
    gaps count as part of its width, not as outer gaps)."""
    n = len(ivs)
    if n == 0 or any(len(v) == 0 for v in ivs):
        return _EMPTY
    if n == 1:
        return ivs[0]
    first = ivs[0]
    doc_of = first[:, 0] >> np.int64(32)
    alive = np.ones(len(first), dtype=bool)
    prev_end = first[:, 1]
    wsum = first[:, 1] - first[:, 0] + 1
    for j in range(1, n):
        a = ivs[j]
        idx = np.searchsorted(a[:, 0], prev_end, side="right")
        alive &= idx < len(a)
        idxc = np.clip(idx, 0, len(a) - 1)
        nxt_s, nxt_e = a[idxc, 0], a[idxc, 1]
        alive &= (nxt_s >> np.int64(32)) == doc_of
        prev_end = nxt_e
        wsum = wsum + (nxt_e - nxt_s + 1)
    fs = first[:, 0][alive]
    rs, ds, ws = prev_end[alive], doc_of[alive], wsum[alive]
    if len(fs) == 0:
        return _EMPTY
    keep = np.ones(len(fs), dtype=bool)
    keep[:-1] = (rs[1:] > rs[:-1]) | (ds[1:] != ds[:-1])
    gaps = (rs[keep] - fs[keep] + 1) - ws[keep]
    return np.stack([fs[keep], rs[keep], gaps], axis=1)


def ordered_walk_exact(subs: list) -> list:
    """Exact per-doc port of the reference's lazy ordered-interval
    iterator (``queries/intervals/OrderedIntervalsSource.java:117-186``,
    nextInterval + reset) over general sub-interval streams — each sub
    an (m, >=2) array of (start, end[, ...]) rows in ITS OWN emission
    order, LOCAL positions, one document. Returns [(start, end, gaps)]
    in emission order; gaps = extent - Σ chosen sub extents (the
    iterator's ``slop -= subIterator.width()`` bookkeeping :159-162).

    Semantics (the lastStart minimization that the declarative
    antichain kernels do NOT reproduce for >= 3 clauses): each call
    builds a FORCED greedy chain (every sub advances at least once —
    sub-intervals are never reused across emissions), then maximizes
    the first clause's start while the intermediate rebuild stays
    below lastStart = the last sub's current start."""
    n = len(subs)
    if n == 0 or any(len(s) == 0 for s in subs):
        return []
    arrs = [np.asarray(s, dtype=np.int64).reshape(len(s), -1)
            for s in subs]
    if n == 1:
        return [(int(r[0]), int(r[1]),
                 int(r[2]) if r.shape[0] > 2 else 0) for r in arrs[0]]
    INF = np.iinfo(np.int64).max
    idx = [0] + [-1] * (n - 1)          # reset(): sub[0].nextInterval()

    def start(j):
        k = idx[j]
        if k < 0:
            return -1
        if k >= len(arrs[j]):
            return INF
        return int(arrs[j][k, 0])

    def end(j):
        k = idx[j]
        if k < 0:
            return -1
        if k >= len(arrs[j]):
            return INF
        return int(arrs[j][k, 1])

    def next_interval():
        rec = None
        last_start = INF
        minimizing = False
        i = 1
        while True:
            while True:
                if end(i - 1) >= last_start:
                    return rec
                if i == n or (minimizing and start(i) > end(i - 1)):
                    break
                while True:
                    if end(i) >= last_start:
                        return rec
                    idx[i] += 1
                    if idx[i] >= len(arrs[i]):
                        return rec          # NO_MORE_INTERVALS
                    if start(i) > end(i - 1):
                        break
                i += 1
            s0 = start(0)
            if s0 == INF:
                return rec
            e = end(n - 1)
            slop = e - s0 + 1
            for j in range(n):
                # sub width(): 4-column rows (Repeating) carry their own
                # width; default is the extent (IntervalIterator.java:74)
                row = arrs[j][idx[j]]
                slop -= int(row[3]) if row.shape[0] > 3 \
                    else end(j) - start(j) + 1
            rec = (s0, e, slop)
            last_start = start(n - 1)
            i = 1
            idx[0] += 1
            if idx[0] >= len(arrs[0]):
                return rec
            minimizing = True

    out = []
    while True:
        r = next_interval()
        if r is None:
            return out
        out.append(r)


def unordered_walk_exact(subs: list) -> list:
    """Exact per-doc port of the reference's unordered interval
    iterator (``queries/intervals/UnorderedIntervalsSource.java``
    UnorderedIntervalIterator.nextInterval/reset) over general
    sub-interval streams ((m, >=2) arrays of (start, end[, gaps,
    width]) rows in emission order, LOCAL positions, one document).
    Returns [(start, end, slop)] in emission order. The queue orders by
    (start asc, end DESC) with heap-internal tie order (replicated via
    the reference PriorityQueue's upHeap/downHeap — the nearspans
    _LuceneHeap); end is the RUNNING queueEnd maximum; slop =
    (end - start + 1) - Σ current sub widths (a 4th column carries a
    Repeating sub's own width)."""
    from .nearspans import _LuceneHeap
    n = len(subs)
    if n == 0:
        return []
    arrs = []
    for s in subs:
        a = np.asarray(s, dtype=np.int64)
        arrs.append(a.reshape(len(a), -1) if a.size else
                    np.empty((0, 3), dtype=np.int64))
    idx = [0] * n

    def row_width(j):
        r = arrs[j][idx[j]]
        return int(r[3]) if r.shape[0] > 3 else int(r[1]) - int(r[0]) + 1

    def less(a, b):
        # a.start < b.start || (a.start == b.start && a.end >= b.end)
        return (a[0] < b[0]) or (a[0] == b[0] and a[1] >= b[1])

    pq = _LuceneHeap(less)
    queue_end = -1
    # reset(): advance each sub once in order; a sub with no intervals
    # leaves the queue short -> no emissions
    for j in range(n):
        if len(arrs[j]) == 0:
            break
        cell = [int(arrs[j][0, 0]), int(arrs[j][0, 1]), j]
        pq.add(cell)
        if cell[1] > queue_end:
            queue_end = cell[1]
    out = []
    if len(pq.heap) - 1 < n:
        return out
    start = end = -1

    def advance_top():
        # PriorityQueue.pop (root <- last, downHeap), advance, re-add —
        # the exact reference sequence; in-place root replacement would
        # leave a different heap arrangement and change tie order
        nonlocal queue_end
        h = pq.heap
        top = h[1]
        last = h.pop()
        if len(h) > 1:
            h[1] = last
            pq.update_top()
        j = top[2]
        idx[j] += 1
        if idx[j] >= len(arrs[j]):
            return False
        top[0] = int(arrs[j][idx[j], 0])
        top[1] = int(arrs[j][idx[j], 1])
        pq.add(top)
        if top[1] > queue_end:
            queue_end = top[1]
        return True

    while True:
        # one nextInterval() call
        while len(pq.heap) - 1 == n and pq.heap[1][0] == start:
            advance_top()
        if len(pq.heap) - 1 < n:
            return out
        rec = None
        while True:
            start = pq.heap[1][0]
            end = queue_end
            slop = (end - start + 1) - sum(row_width(j) for j in range(n))
            rec = (start, end, slop)
            if pq.heap[1][1] == end:
                break
            advance_top()
            if not (len(pq.heap) - 1 == n and end == queue_end):
                break
        out.append(rec)
        if len(pq.heap) - 1 < n:
            return out


def batch_ordered_exact(streams: list[np.ndarray]) -> np.ndarray:
    """Batched reference-exact ordered intervals over WIDTH-1 clause
    streams (sorted doc-major global keys), for n >= 3 clauses (n <= 2
    keeps :func:`ordered_intervals` — the lazy walk and the declarative
    closed form coincide there, proven + fuzz-checked). Wave-lockstep
    vectorization of :func:`ordered_walk_exact`: every active document
    advances one emission per wave, all clause probes are shared
    searchsorted passes. Per-doc closed form of one wave (derivation
    pinned by the fuzz differential ``test_intervals_exact.py``):

    * phase A (forced chain): c_i = first S_i key > max(q_i, c_{i-1});
      every sub advances at least once past its consumed pointer q_i —
      emitted chains never share a sub-interval.
    * phase B (lastStart minimization): the emitted start f* is the
      last S_0 key < B_1 where B_{n-1} = R = c_{n-1} and
      B_i = last S_i key < B_{i+1} — the maximal start whose floored
      greedy rebuild keeps every intermediate below R.
    * post-state: q_0-successor f'' = first S_0 key > f*; intermediates
      advance to the floored rebuild of f'' up to the first level
      reaching >= R (d_i = max(c_i, first S_i key > d_{i-1}) while the
      previous level stayed < R; levels beyond keep c_i).
    """
    n = len(streams)
    if n == 0 or any(len(s) == 0 for s in streams):
        return _EMPTY
    BIG = np.int64(1) << np.int64(32)
    INF = np.iinfo(np.int64).max

    # posInc-0 can duplicate a position WITHIN one clause stream; the
    # wave kernel's value-space succ() skips the second copy while the
    # reference's index-based iterators consume both — those docs take
    # the exact per-doc walk (never triggers on standard-analyzed text)
    dup = None
    for s in streams:
        d = np.unique((s[1:][s[1:] == s[:-1]]) >> np.int64(32))
        dup = d if dup is None else np.union1d(dup, d)
    if dup is not None and len(dup):
        clean = []
        for s in streams:
            di = np.searchsorted(dup, s >> np.int64(32))
            isdup = (di < len(dup)) & \
                (dup[np.clip(di, 0, len(dup) - 1)] == (s >> np.int64(32)))
            clean.append(s[~isdup])
        fast = (batch_ordered_exact(clean)
                if all(len(s) for s in clean) else _EMPTY)
        parts = [fast] if len(fast) else []
        for d in dup:
            lo_k = np.int64(d) << np.int64(32)
            hi_k = np.int64(d + 1) << np.int64(32)
            subs = []
            dead = False
            for s in streams:
                i0 = np.searchsorted(s, lo_k, side="left")
                i1 = np.searchsorted(s, hi_k, side="left")
                if i0 == i1:
                    dead = True
                    break
                p = s[i0:i1] - lo_k
                subs.append(np.stack([p, p, np.zeros(len(p), np.int64)],
                                     axis=1))
            if dead:
                continue
            em = ordered_walk_exact(subs)
            if em:
                arr = np.asarray(em, dtype=np.int64).reshape(-1, 3)
                arr[:, 0] += lo_k
                arr[:, 1] += lo_k
                parts.append(arr)
        if not parts:
            return _EMPTY
        allem = np.concatenate(parts)
        order = np.argsort(allem[:, 0] >> np.int64(32), kind="stable")
        return allem[order]

    def succ(a, x):
        """First key of a STRICTLY greater than x (INF if none)."""
        i = np.searchsorted(a, x, side="right")
        v = a[np.clip(i, 0, len(a) - 1)]
        return np.where(i < len(a), v, INF)

    def pred(a, x):
        """Last key of a strictly less than x (-1 if none)."""
        i = np.searchsorted(a, x, side="left") - 1
        v = a[np.clip(i, 0, len(a) - 1)]
        return np.where(i >= 0, v, np.int64(-1))

    # active docs = docs where every clause is present
    common = None
    for s in streams:
        d = np.unique(s >> np.int64(32))
        common = d if common is None else \
            common[np.isin(common, d, assume_unique=True)]
    if common is None or len(common) == 0:
        return _EMPTY
    base = common * BIG
    f = succ(streams[0], base - 1)      # first S_0 key per doc
    q = [base - 1 for _ in range(1, n)]  # consumed pointers, subs 1..
    alive = (f >> np.int64(32)) == common
    parts = []
    while alive.any():
        # phase A: forced greedy chain
        prev = f
        cs = []
        ok = alive.copy()
        for j in range(1, n):
            c = succ(streams[j], np.maximum(q[j - 1], prev))
            ok &= (c != INF) & ((c >> np.int64(32)) == common)
            cs.append(c)
            prev = c
        if not ok.any():
            break
        R = cs[-1]
        # phase B backward bounds: B_{n-1} = R; B_i = last S_i key < B_{i+1}
        B = R
        for j in range(n - 2, 0, -1):
            B = pred(streams[j], B)
        fstar = pred(streams[0], B)
        # fstar >= f guaranteed for ok docs (f's own chain witnesses)
        gaps = (R - fstar + 1) - n
        em = np.stack([fstar, R, gaps], axis=1)
        parts.append((np.nonzero(ok)[0], em[ok]))
        # post-state: advance sub[0] past fstar, rebuild intermediates —
        # the failing candidate's cascade runs only while the previous
        # level stayed < R (the end() >= lastStart return), and not at
        # all when the new sub[0] start is already >= R
        f2 = succ(streams[0], fstar)
        chain_alive = f2 < R
        dprev = f2
        for j in range(1, n - 1):
            dj = np.where(cs[j - 1] > dprev, cs[j - 1],
                          succ(streams[j], dprev))
            q[j - 1] = np.where(ok, np.where(chain_alive, dj, cs[j - 1]),
                                q[j - 1])
            chain_alive = chain_alive & (dj < R)
            dprev = dj
        # the last sub (n-1) never advances during minimization
        q[n - 2] = np.where(ok, R, q[n - 2])
        f = np.where(ok, f2, f)
        alive = ok & (f != INF) & ((f >> np.int64(32)) == common)
    if not parts:
        return _EMPTY
    # stitch waves back into per-doc emission order: emissions per doc
    # have strictly increasing starts across waves, so a stable sort on
    # start key within doc-major order is the emission order
    allem = np.concatenate([p[1] for p in parts])
    order = np.lexsort((allem[:, 1], allem[:, 0]))
    return allem[order]


def unordered_over(ivs: list[np.ndarray]) -> np.ndarray:
    """Minimal unordered conjunction over arbitrary SUB-INTERVAL streams
    (UnorderedIntervalsSource over nested sources, overlaps allowed):
    the containment-minimal windows holding one whole interval from
    every clause. Per candidate right end R (any clause interval's
    end), each clause's tightest choice is its LAST interval with
    end <= R (antichain ⇒ also the max-start one); the window is
    [min_j start_j, R] and the antichain filter keeps the minimal set.
    gaps = (R - L + 1) - Σ chosen sub-widths."""
    n = len(ivs)
    if n == 0 or any(len(v) == 0 for v in ivs):
        return _EMPTY
    if n == 1:
        return ivs[0]
    ends = np.unique(np.concatenate([v[:, 1] for v in ivs]))
    edoc = ends >> np.int64(32)
    ok = np.ones(len(ends), dtype=bool)
    lmat = np.empty((n, len(ends)), dtype=np.int64)
    wmat = np.empty((n, len(ends)), dtype=np.int64)
    for j, a in enumerate(ivs):
        idx = np.searchsorted(a[:, 1], ends, side="right") - 1
        ok &= idx >= 0
        idxc = np.clip(idx, 0, len(a) - 1)
        s, e = a[idxc, 0], a[idxc, 1]
        ok &= (s >> np.int64(32)) == edoc
        lmat[j] = s
        # sub width(): Repeating rows (4 columns) carry the iterator's
        # own width; default = extent
        wmat[j] = a[idxc, 3] if a.shape[1] > 3 else e - s + 1
    if not ok.any():
        return _EMPTY
    L = lmat.min(axis=0)[ok]
    W = wmat.sum(axis=0)[ok]
    R = ends[ok]
    cand = np.stack([L, R, (R - L + 1) - W], axis=1)
    return minimize_or([cand])


def block_over(ivs: list[np.ndarray]) -> np.ndarray:
    """BlockIntervalsSource over arbitrary SUB-INTERVAL streams
    (BlockIntervalsSource.java:115): each sub-interval starts exactly at
    prev.end + 1. Antichain children have unique starts, so the chain
    per first interval is deterministic (exact searchsorted probe);
    gaps() = 0 always (BlockIntervalsSource.java:110-112)."""
    n = len(ivs)
    if n == 0 or any(len(v) == 0 for v in ivs):
        return _EMPTY
    if n == 1:
        return ivs[0]
    first = ivs[0]
    alive = np.ones(len(first), dtype=bool)
    prev_end = first[:, 1]
    for j in range(1, n):
        a = ivs[j]
        probe = prev_end + 1
        idx = np.searchsorted(a[:, 0], probe)
        idxc = np.clip(idx, 0, len(a) - 1)
        alive &= (idx < len(a)) & (a[idxc, 0] == probe)
        prev_end = a[idxc, 1]
    fs, rs = first[:, 0][alive], prev_end[alive]
    if len(fs) == 0:
        return _EMPTY
    return np.stack([fs, rs, np.zeros(len(fs), np.int64)], axis=1)


def atleast_intervals(streams: list[np.ndarray], m: int) -> np.ndarray:
    """Minimal m-of-n windows over width-1 clause streams
    (MinimumShouldMatchIntervalsSource.java:156): every containment-
    minimal window [L, R] holding positions from >= m distinct streams.
    The predicate is monotone under window inclusion, so the emitted set
    is the containment antichain: for each candidate right end R (any
    stream position) the tightest left end is the m-th largest of the
    per-stream "last position <= R" values; the antichain filter then
    drops windows that properly contain another. gaps = (R - L + 1) - m
    (width() minus the m unit widths, the iterator's slop bookkeeping)."""
    n = len(streams)
    streams = [s for s in streams if len(s)]
    if m <= 0 or len(streams) < m:
        return _EMPTY
    if m == 1:
        return minimize_or(
            [np.stack([s, s, np.zeros(len(s), np.int64)], axis=1)
             for s in streams])
    P = np.unique(np.concatenate(streams))
    pdoc = P >> np.int64(32)
    f = np.full((len(streams), len(P)), np.int64(-1), dtype=np.int64)
    for j, s in enumerate(streams):
        idx = np.searchsorted(s, P, side="right") - 1
        val = s[np.clip(idx, 0, len(s) - 1)]
        ok = (idx >= 0) & ((val >> np.int64(32)) == pdoc)
        f[j] = np.where(ok, val, np.int64(-1))
    f.sort(axis=0)
    L = f[len(streams) - m]          # m-th largest per candidate end
    ok = L >= 0
    if not ok.any():
        return _EMPTY
    Ls, Rs = L[ok], P[ok]
    cand = np.stack([Ls, Rs, (Rs - Ls + 1) - m], axis=1)
    return minimize_or([cand])


def eval_intervals(tree, pmap: dict[str, np.ndarray]) -> np.ndarray:
    """Evaluate a compiled interval tree against doc-major global
    position keys; returns the (start_key, end_key, gaps) interval array
    of the root source, sorted by start, doc-major."""
    tree = desugar(tree)
    kind = tree[0]
    if kind in ("term", "orterms"):
        k = _stream_keys(tree, pmap)
        if len(k) == 0:
            return _EMPTY
        return np.stack([k, k, np.zeros(len(k), np.int64)], axis=1)
    if kind == "ordered":
        children = _flatten_same(tree[1], "ordered")
        groups = _dedup_adjacent(children)
        if len(groups) == len(children):        # no duplicates
            if all(_is_stream(c) for c in children):
                streams = [_stream_keys(c, pmap) for c in children]
                if len(children) <= 2:
                    # lazy walk ≡ declarative closed form for n <= 2
                    # (proven + fuzz-pinned, test_intervals_exact.py)
                    return ordered_intervals(streams)
                return batch_ordered_exact(streams)
            return _ordered_over_exact(
                [_norm_antichain(eval_intervals(c, pmap))
                 for c in children])
        srcs = [_group_emission(c, k, pmap) for c, k in groups]
        if len(srcs) == 1:
            return srcs[0][:, :3]   # build() returns the lone Repeating
        return _ordered_over_exact(srcs, force_walk=True)
    if kind == "unordered":
        children = _flatten_same(tree[1], "unordered")
        groups = _dedup_global(children)
        if len(groups) == len(children):
            if all(_is_stream(c) for c in children):
                return unordered_intervals(
                    [_stream_keys(c, pmap) for c in children])
            return unordered_over([_norm_antichain(eval_intervals(c, pmap))
                                   for c in children])
        srcs = [_group_emission(c, k, pmap) for c, k in groups]
        if len(srcs) == 1:
            return srcs[0][:, :3]
        # repeating clauses: posInc-0 ties break the double-minimal
        # antichain model (the reference queue emits contained windows
        # too) — run the exact per-doc queue walk
        return _per_doc_over(srcs, unordered_walk_exact)
    if kind == "phrase":
        if all(_is_stream(c) for c in tree[1]):
            return phrase_intervals(
                [_stream_keys(c, pmap) for c in tree[1]])
        return block_over([_norm_antichain(eval_intervals(c, pmap))
                           for c in tree[1]])
    if kind == "maxgaps":
        iv = eval_intervals(tree[1], pmap)
        return iv[iv[:, 2] <= tree[2]] if len(iv) else iv
    if kind == "maxwidth":
        iv = eval_intervals(tree[1], pmap)
        if len(iv) == 0:
            return iv
        return iv[(iv[:, 1] - iv[:, 0] + 1) <= tree[2]]
    if kind == "containing":
        big = eval_intervals(tree[1], pmap)
        small = eval_intervals(tree[2], pmap)
        return big[_containment_mask(big, small)]
    if kind == "not_containing":
        big = eval_intervals(tree[1], pmap)
        small = eval_intervals(tree[2], pmap)
        return big[~_containment_mask(big, small)]
    if kind == "contained_by":
        small = eval_intervals(tree[1], pmap)
        big = eval_intervals(tree[2], pmap)
        return small[_within_mask(small, big)]
    if kind == "not_contained_by":
        small = eval_intervals(tree[1], pmap)
        big = eval_intervals(tree[2], pmap)
        return small[~_within_mask(small, big)]
    if kind == "extend":
        iv = eval_intervals(tree[1], pmap)
        if len(iv) == 0:
            return iv
        before, after = int(tree[2]), int(tree[3])
        out = iv.copy()
        # clamp start at the doc's position 0 (ExtendedIntervalIterator
        # Math.max(0, start - before) — doc-relative, so clamp against
        # the doc's key base); gaps are the delegate's, unchanged
        base = (iv[:, 0] >> 32) << np.int64(32)
        out[:, 0] = np.maximum(iv[:, 0] - before, base)
        out[:, 1] = iv[:, 1] + after
        return out
    if kind == "non_overlapping":
        minuend = eval_intervals(tree[1], pmap)
        sub = eval_intervals(tree[2], pmap)
        return minuend[~_overlap_mask(minuend, sub)]
    if kind == "overlapping":
        src = eval_intervals(tree[1], pmap)
        ref = eval_intervals(tree[2], pmap)
        return src[_overlap_mask(src, ref)]
    if kind == "or":
        return minimize_or([eval_intervals(c, pmap) for c in tree[1]])
    if kind == "offset":
        # OffsetIntervalsSource.java:50-83: each delegate interval [s, e]
        # becomes the width-1 point max(0, s-1) (before) / e+1 (after)
        iv = eval_intervals(tree[1], pmap)
        if len(iv) == 0:
            return iv
        if tree[2]:
            base = (iv[:, 0] >> np.int64(32)) << np.int64(32)
            p = np.maximum(iv[:, 0] - 1, base)
        else:
            p = iv[:, 1] + 1
        p = np.sort(p)
        return np.stack([p, p, np.zeros(len(p), np.int64)], axis=1)
    if kind == "atleast":
        return atleast_intervals(
            [_stream_keys(c, pmap) for c in tree[2]], int(tree[1]))
    raise TypeError(f"unknown interval tree node {tree!r}")


def min_extent(tree) -> int:
    """IntervalsSource.minExtent of a compiled tree (the scoring
    normalizer: freq contribution = 1 / max(length - minExtent + 1, 1),
    IntervalScorer.java:72)."""
    tree = desugar(tree)
    kind = tree[0]
    if kind in ("term", "orterms", "offset"):
        return 1
    if kind == "atleast":
        # sum of the minShouldMatch smallest sub-extents
        # (MinimumShouldMatchIntervalsSource.java:103-113)
        return sum(sorted(min_extent(c) for c in tree[2])[:int(tree[1])])
    if kind in ("ordered", "unordered"):
        # mirror build(): flatten same-kind children, collapse equal
        # sources into Repeating groups — Repeating.minExtent is the
        # CHILD's minExtent (RepeatingIntervalsSource.java), counted
        # once per group
        children = _flatten_same(tree[1], kind)
        groups = (_dedup_adjacent(children) if kind == "ordered"
                  else _dedup_global(children))
        return sum(min_extent(c) for c, _k in groups)
    if kind == "phrase":
        return sum(min_extent(c) for c in tree[1])
    if kind in ("maxgaps", "maxwidth"):
        return min_extent(tree[1])
    if kind == "extend":
        return min_extent(tree[1]) + int(tree[2]) + int(tree[3])
    if kind in ("non_overlapping", "overlapping"):
        return min_extent(tree[1])
    if kind in ("containing", "not_containing"):
        return min_extent(tree[1])            # big side
    if kind in ("contained_by", "not_contained_by"):
        return min_extent(tree[1])            # small side
    if kind == "or":
        return min(min_extent(c) for c in tree[1])
    raise TypeError(f"unknown interval tree node {tree!r}")


def interval_tree_terms(tree) -> list[str]:
    """All leaf terms of a compiled interval tree (postings to fetch)."""
    tree = desugar(tree)
    kind = tree[0]
    if kind == "offset":
        return interval_tree_terms(tree[1])
    if kind == "atleast":
        out = []
        for c in tree[2]:
            out.extend(interval_tree_terms(c))
        return out
    if kind == "term":
        return [tree[1]]
    if kind == "orterms":
        return list(tree[1])
    if kind in ("ordered", "unordered", "phrase", "or"):
        out = []
        for c in tree[1]:
            out.extend(interval_tree_terms(c))
        return out
    if kind in ("maxgaps", "maxwidth"):
        return interval_tree_terms(tree[1])
    if kind == "extend":
        return interval_tree_terms(tree[1])
    if kind in ("non_overlapping", "overlapping"):
        return (interval_tree_terms(tree[1])
                + interval_tree_terms(tree[2]))
    if kind in ("containing", "not_containing", "contained_by",
                "not_contained_by"):
        return (interval_tree_terms(tree[1])
                + interval_tree_terms(tree[2]))
    raise TypeError(f"unknown interval tree node {tree!r}")


def batch_interval_freqs(iv: np.ndarray, minext: int,
                         n_docs: int) -> np.ndarray:
    """Per-doc IntervalScorer freq: Σ 1 / max(length - minExtent + 1, 1)
    over the root source's intervals (IntervalScorer.java:66-75),
    accumulated sequentially in emission order."""
    out = np.zeros(n_docs, dtype=np.float32)  # float freq += double
    if len(iv):
        length = (iv[:, 1] - iv[:, 0] + 1).astype(np.float64)
        denom = np.maximum(length - minext + 1, 1.0)
        np.add.at(out, (iv[:, 0] >> 32).astype(np.int64), 1.0 / denom)
    return out.astype(np.float64)


def saturation_scores(freqs: np.ndarray, pivot: float,
                      weight: float) -> np.ndarray:
    """IntervalScoreFunction.SaturationFunction (float32 order):
    ``weight * (1 - pivot / (pivot + freq))`` — written exactly as the
    reference to keep monotonicity under rounding
    (IntervalScoreFunction.java:66-76). ``freqs`` is float64 here; the
    reference accumulates in float32 — a documented divergence shared
    verbatim with the SQL oracle."""
    p = np.float32(pivot)
    f = freqs.astype(np.float32)
    return (np.float32(weight)
            * (np.float32(1.0) - p / (p + f))).astype(np.float32)


def resolve_multi_term_sources(tree, expander):
    """MultiTermIntervalsSource role (reference ``queries/intervals/
    MultiTermIntervalsSource.java``): replace ``("prefix", p)`` /
    ``("wildcard", w)`` leaves with ``("orterms", terms)`` via the
    caller's term-dictionary ``expander(kind, value) -> iterable[str]``
    — the Searcher uses its term_stats dictionary, the python oracle its
    in-memory postings keys, so both sides expand identically."""
    tree = desugar(tree)
    kind = tree[0]
    if kind in ("prefix", "wildcard"):
        return ("orterms", tuple(expander(kind, tree[1])))
    if kind == "fuzzy":
        # Intervals.fuzzyTerm (Intervals.java:218) — same dictionary
        # expansion as the fuzzy MultiTermQuery
        return ("orterms", tuple(expander("fuzzy", (tree[1], tree[2]))))
    if kind == "offset":
        return (kind, resolve_multi_term_sources(tree[1], expander),
                tree[2])
    if kind == "atleast":
        return (kind, tree[1],
                tuple(resolve_multi_term_sources(c, expander)
                      for c in tree[2]))
    if kind in ("term", "orterms"):
        return tree
    if kind in ("ordered", "unordered", "phrase", "or"):
        return (kind, tuple(resolve_multi_term_sources(c, expander)
                            for c in tree[1]))
    if kind in ("maxgaps", "maxwidth"):
        return (kind, resolve_multi_term_sources(tree[1], expander),
                tree[2])
    if kind == "extend":
        return (kind, resolve_multi_term_sources(tree[1], expander),
                tree[2], tree[3])
    if kind in ("non_overlapping", "overlapping"):
        return (kind, resolve_multi_term_sources(tree[1], expander),
                resolve_multi_term_sources(tree[2], expander))
    if kind in ("containing", "not_containing", "contained_by",
                "not_contained_by"):
        return (kind, resolve_multi_term_sources(tree[1], expander),
                resolve_multi_term_sources(tree[2], expander))
    raise TypeError(f"unknown interval tree node {tree!r}")
