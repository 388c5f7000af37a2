"""Exact ports of the reference's span-near iterators —
``queries/spans/NearSpansOrdered.java`` and ``NearSpansUnordered.java``
— over TERM clauses (SpanTermQuery streams: start = position,
end = position + 1).

Groundwork for replacing the engine's declarative span windows (the
real-Lucene differential q56-q61 proved those diverge in match
multiplicity/width on multi-occurrence docs; match DOC SETS agree).
Integration plan (round 5): route SpanNear scoring through these
semantics with a lockstep batched kernel like functions/sloppy.py,
and re-express the span twins as the same walks.

Semantics proven here (fuzz-verified against the compiled reference
iterators — tests/data/lucene_diff/spans_fuzz.tsv.gz):

* ORDERED (:62-126): for EVERY next start of sub[0], stretchToOrder
  advances each later sub (forward-only, stateful across the doc)
  until its start >= previous end; width = sum of internal gaps;
  emit [start0, lastEnd) when width <= allowedSlop. One candidate per
  sub[0] position; sub state ratchets, which for monotone targets is
  exactly a fresh first->= search.
* UNORDERED (:70-143): a PriorityQueue over the clause currents
  ordered by (start, end) — ties fall to the HEAP's internal order,
  which we replicate with the reference PriorityQueue's upHeap/
  downHeap — emits a match at every state where
  maxEnd - minStart - totalSpanLength <= slop, with the SpanScorer
  weight width = maxEnd - minStart (a RUNNING max end), then advances
  the min clause; the walk ends when a clause exhausts.
"""

from __future__ import annotations

import numpy as np


def ordered_near_spans(pos_lists, slop: int) -> list:
    """NearSpansOrdered matches over term-clause position lists.
    Returns [(start, end_exclusive, width)] in emission order."""
    n = len(pos_lists)
    if n == 0 or any(len(p) == 0 for p in pos_lists):
        return []
    first = list(pos_lists[0])
    subs = [list(p) for p in pos_lists]
    idx = [0] * n                 # stateful, forward-only
    out = []
    for p0 in first:
        prev_end = p0 + 1
        ok = True
        width = 0
        for i in range(1, n):
            a = subs[i]
            j = idx[i]
            while j < len(a) and a[j] < prev_end:
                j += 1
            idx[i] = j
            if j >= len(a):
                ok = False
                break
            width += a[j] - prev_end
            prev_end = a[j] + 1
        if not ok:
            break                 # oneExhaustedInCurrentDoc
        if width <= slop:
            out.append((p0, prev_end, width))
    return out


class _LuceneHeap:
    """The reference util.PriorityQueue (upHeap/downHeap, 1-based
    array) with NearSpansUnordered.positionsOrdered as lessThan —
    tie behavior (equal (start, end)) is heap-internal and must be
    replicated exactly."""

    def __init__(self, less):
        self.heap = [None]        # 1-based
        self.less = less

    def add(self, e):
        self.heap.append(e)
        self._up(len(self.heap) - 1)

    def top(self):
        return self.heap[1]

    def update_top(self):
        self._down(1)

    def _up(self, i):
        h, less = self.heap, self.less
        node = h[i]
        j = i >> 1
        while j > 0 and less(node, h[j]):
            h[i] = h[j]
            i = j
            j >>= 1
        h[i] = node

    def _down(self, i):
        h, less = self.heap, self.less
        n = len(h) - 1
        node = h[i]
        j = i << 1
        k = j + 1
        if k <= n and less(h[k], h[j]):
            j = k
        while j <= n and less(h[j], node):
            h[i] = h[j]
            i = j
            j = i << 1
            k = j + 1
            if k <= n and less(h[k], h[j]):
                j = k
        h[i] = node
    # matches PriorityQueue.java upHeap/downHeap exactly


def unordered_near_spans(pos_lists, slop: int) -> list:
    """NearSpansUnordered matches over term-clause position lists.
    Returns [(min_start, running_max_end, width)] in emission order —
    width = maxEnd - minStart (the SpanScorer weight input)."""
    n = len(pos_lists)
    if n == 0 or any(len(p) == 0 for p in pos_lists):
        return []
    subs = [list(p) for p in pos_lists]
    idx = [0] * n

    # clause state objects: [start, end, clause]
    def less(a, b):
        return (a[1] < b[1]) if a[0] == b[0] else (a[0] < b[0])

    pq = _LuceneHeap(less)
    max_end = -1
    total_len = 0
    states = []
    for j in range(n):
        s = subs[j][0]
        e = s + 1
        pq.add([s, e, j])
        if e > max_end:
            max_end = e
        total_len += e - s
    out = []
    while True:
        top = pq.top()
        if (max_end - top[0] - total_len) <= slop:
            out.append((top[0], max_end, max_end - top[0]))
        # advance the min clause
        j = top[2]
        idx[j] += 1
        if idx[j] >= len(subs[j]):
            return out
        old_len = top[1] - top[0]
        top[0] = subs[j][idx[j]]
        top[1] = top[0] + 1
        total_len += (top[1] - top[0]) - old_len
        if top[1] > max_end:
            max_end = top[1]
        pq.update_top()


def spans_freq_f32(spans) -> float:
    """SpanScorer freq over emitted spans: float32 += double
    1/(1+width) per step (SpanScorer.java:106)."""
    acc = np.float32(0.0)
    for _, _, w in spans:
        acc = np.float32(np.float64(acc) + 1.0 / (1.0 + w))
    return float(acc)
