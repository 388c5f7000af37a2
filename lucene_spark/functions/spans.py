"""Span proximity matching (SpanNearQuery role).

Reference: ``lucene/queries/src/java/org/apache/lucene/queries/spans/``
— ``SpanNearQuery`` matches documents where all clause terms occur
within ``slop`` positions, ordered (``NearSpansOrdered``) or unordered
(``NearSpansUnordered``), scored through the phrase machinery with
``sloppyFreq = 1/(1 + matchLength)`` per match.

Documented simplification (shared verbatim by the engine kernel and the
python oracle, so differential tests are exact):

* ordered   — greedy leftmost chains: take the current first-clause
  occurrence, chain each later clause to its first position AFTER the
  previous link, tighten the start forward, emit, then advance the
  first-clause pointer past the used start (non-overlapping starts).
* unordered — classic minimal-window sweep over the merged position
  list: every left-minimal complete window is counted once.
* matchLength = (window width) − (number of clauses); a window
  contributes ``1/(1 + matchLength)`` when matchLength <= slop.
* duplicate clause terms are not supported (the reference's repeat
  handling in spans is out of scope).
"""

from __future__ import annotations

import numpy as np


def sloppy_phrase_freq(pos_lists: list[np.ndarray], slop: int) -> float:
    """Accumulated sloppy frequency of an n-term sloppy phrase in one doc
    (``SloppyPhraseMatcher.java:53`` role — minimal-interval semantics).

    Clause ``j``'s positions are offset-adjusted by ``-j`` (the reference's
    ``PhrasePositions.position = pos - offset``), then every minimal
    complete window over the adjusted lists is counted once:
    a window [L, R] is minimal iff it is complete (every clause present)
    and shrinking from EITHER side breaks completeness —
    ``L = min_j max{a_j <= R}`` and ``R = max_j min{a_j >= L}``
    (equivalently: it contains no proper complete sub-window).
    matchLength = R - L; a window contributes ``1/(1 + matchLength)``
    when matchLength <= slop. Duplicate clause terms (the reference's
    repeats machinery) are not supported.
    """
    n = len(pos_lists)
    if n == 0 or any(len(p) == 0 for p in pos_lists):
        return 0.0
    adj = [np.asarray(p, dtype=np.int64) - j
           for j, p in enumerate(pos_lists)]
    if n == 1:
        return float(len(adj[0]))
    rs = np.unique(np.concatenate(adj))
    # L(R) = min over clauses of the largest adjusted pos <= R
    ok = np.ones(len(rs), dtype=bool)
    lmat = np.empty((n, len(rs)), dtype=np.int64)
    for j, a in enumerate(adj):
        idx = np.searchsorted(a, rs, side="right") - 1
        ok &= idx >= 0
        lmat[j] = a[np.clip(idx, 0, len(a) - 1)]
    rs_v, l_v = rs[ok], lmat.min(axis=0)[ok]
    if len(rs_v) == 0:
        return 0.0
    # right-minimal check: R == max over clauses of smallest pos >= L
    good = np.ones(len(rs_v), dtype=bool)
    rmat = np.empty((n, len(rs_v)), dtype=np.int64)
    for j, a in enumerate(adj):
        idx = np.searchsorted(a, l_v, side="left")
        good &= idx < len(a)
        rmat[j] = a[np.clip(idx, 0, len(a) - 1)]
    valid = good & (rmat.max(axis=0) == rs_v)
    if not valid.any():
        return 0.0
    pairs = np.unique(np.stack([l_v[valid], rs_v[valid]], axis=1), axis=0)
    ml = pairs[:, 1] - pairs[:, 0]
    ml = ml[ml <= slop]
    return float(np.sum(1.0 / (1.0 + ml)))


_EMPTY_SPANS = np.empty((0, 3), dtype=np.int64)


def term_spans(positions) -> np.ndarray:
    """(start, end, width) triples of one term's occurrences (TermSpans
    role: span [p, p+1), width 0 — ``TermSpans.java:107``)."""
    p = np.asarray(positions, dtype=np.int64)
    if len(p) == 0:
        return _EMPTY_SPANS
    return np.stack([p, p + 1, np.zeros(len(p), dtype=np.int64)], axis=1)


def near_spans(pos_lists: list[np.ndarray], slop: int,
               in_order: bool) -> np.ndarray:
    """(start, end, width) triples of SpanNear matches in one document —
    the emission points of the matchers documented above; ``end`` is
    last-matched-position + 1, ``width`` the matchLength."""
    n = len(pos_lists)
    if n == 0 or any(len(p) == 0 for p in pos_lists):
        return _EMPTY_SPANS
    if n == 1:
        return term_spans(pos_lists[0])
    out: list[tuple[int, int, int]] = []
    if in_order:
        first = pos_lists[0]
        i0 = 0
        while i0 < len(first):
            chain = [int(first[i0])]
            dead = False
            for j in range(1, n):
                lst = pos_lists[j]
                k = int(np.searchsorted(lst, chain[-1], side="right"))
                if k >= len(lst):
                    dead = True
                    break
                chain.append(int(lst[k]))
            if dead:
                break
            # tighten the start: latest first-clause position still
            # before the second link
            while i0 + 1 < len(first) and int(first[i0 + 1]) < chain[1]:
                i0 += 1
            chain[0] = int(first[i0])
            ml = (chain[-1] - chain[0] + 1) - n
            if ml <= slop:
                out.append((chain[0], chain[-1] + 1, ml))
            i0 += 1
    else:
        # unordered: minimal-window sweep over merged (position, clause)
        merged = sorted((int(p), j) for j, lst in enumerate(pos_lists)
                        for p in lst)
        need = n
        counts = [0] * n
        left = 0
        for right in range(len(merged)):
            _, jr = merged[right]
            if counts[jr] == 0:
                need -= 1
            counts[jr] += 1
            if need:
                continue
            # shrink to the left-minimal complete window
            while True:
                pl, jl = merged[left]
                if counts[jl] > 1:
                    counts[jl] -= 1
                    left += 1
                else:
                    break
            # clamp: distinct terms cannot share a position in a real
            # index, but degenerate inputs must not divide by zero
            ml = max(merged[right][0] - merged[left][0] + 1 - n, 0)
            if ml <= slop:
                out.append((merged[left][0], merged[right][0] + 1, ml))
            # drop the left element; window is no longer complete
            counts[merged[left][1]] -= 1
            need += 1
            left += 1
    if not out:
        return _EMPTY_SPANS
    return np.asarray(out, dtype=np.int64).reshape(-1, 3)


def near_spans_over(span_lists: list[np.ndarray], slop: int,
                    in_order: bool) -> np.ndarray:
    """SpanNear over arbitrary CLAUSE SPAN STREAMS (the reference's
    nested ``SpanNearQuery(SpanQuery...)``). Generalizes the term
    matchers: with term-span inputs it emits exactly what
    :func:`near_spans` emits (fuzz-verified).

    * ordered — greedy leftmost chains: clause j+1's first span with
      ``start >= prev.end``; start tightened forward; matchWidth = Σ
      inter-span gaps (``NearSpansOrdered.java:116``).
    * unordered — left-minimal complete windows over the merged
      span stream; matchWidth = (max end in window) − (window start) − n.
    """
    n = len(span_lists)
    if n == 0 or any(len(s) == 0 for s in span_lists):
        return _EMPTY_SPANS
    if n == 1:
        return span_lists[0]
    out: list[tuple[int, int, int]] = []
    if in_order:
        first = span_lists[0]
        i0 = 0
        while i0 < len(first):
            chain = [first[i0]]
            dead = False
            for j in range(1, n):
                lst = span_lists[j]
                k = int(np.searchsorted(lst[:, 0], chain[-1][1],
                                        side="left"))
                if k >= len(lst):
                    dead = True
                    break
                chain.append(lst[k])
            if dead:
                # General span streams (e.g. SpanOr clauses of differing
                # widths) have non-monotonic ends in start order, so a
                # failed chain from first[i0] does NOT imply later first
                # spans fail — advance and keep scanning. (For term spans
                # ends ARE monotonic and the extra iterations are no-ops.)
                i0 += 1
                continue
            while i0 + 1 < len(first) and first[i0 + 1][1] <= chain[1][0]:
                i0 += 1
            chain[0] = first[i0]
            ml = int(sum(int(chain[j + 1][0]) - int(chain[j][1])
                         for j in range(n - 1)))
            if ml <= slop:
                out.append((int(chain[0][0]), int(chain[-1][1]), ml))
            i0 += 1
    else:
        merged = sorted((int(s[0]), int(s[1]), j)
                        for j, lst in enumerate(span_lists) for s in lst)
        need = n
        counts = [0] * n
        left = 0
        for right in range(len(merged)):
            jr = merged[right][2]
            if counts[jr] == 0:
                need -= 1
            counts[jr] += 1
            if need:
                continue
            while True:
                jl = merged[left][2]
                if counts[jl] > 1:
                    counts[jl] -= 1
                    left += 1
                else:
                    break
            wstart = merged[left][0]
            wend = max(e for _, e, _ in merged[left:right + 1])
            ml = max(wend - wstart - n, 0)
            if ml <= slop:
                out.append((wstart, wend, ml))
            counts[merged[left][2]] -= 1
            need += 1
            left += 1
    if not out:
        return _EMPTY_SPANS
    arr = np.asarray(out, dtype=np.int64).reshape(-1, 3)
    order = np.lexsort((arr[:, 1], arr[:, 0]))
    return arr[order]


def or_spans(span_lists: list[np.ndarray]) -> np.ndarray:
    """Union of clause span streams, (start, end) ordered
    (SpanOrQuery's SpanDisiPriorityQueue merge role)."""
    parts = [s for s in span_lists if len(s)]
    if not parts:
        return _EMPTY_SPANS
    allsp = np.concatenate(parts)
    order = np.lexsort((allsp[:, 1], allsp[:, 0]))
    return allsp[order]


def not_spans(include: np.ndarray, exclude: np.ndarray) -> np.ndarray:
    """Spans of ``include`` that do not overlap any ``exclude`` span
    (SpanNotQuery with pre = post = 0): [s,e) overlaps [s2,e2) iff
    s < e2 and s2 < e."""
    if len(include) == 0 or len(exclude) == 0:
        return include
    starts = np.sort(exclude[:, 0])
    # prefix max of ends in start order
    order = np.argsort(exclude[:, 0], kind="mergesort")
    ends_sorted = exclude[order, 1]
    pmax = np.maximum.accumulate(ends_sorted)
    # candidates: exclude spans with start < include end
    idx = np.searchsorted(starts, include[:, 1], side="left")
    has_overlap = (idx > 0) & (pmax[np.maximum(idx - 1, 0)] > include[:, 0])
    return include[~has_overlap]


def first_spans(spans: np.ndarray, end: int) -> np.ndarray:
    """Spans ending at position <= ``end`` (SpanFirstQuery.java:38-42)."""
    if len(spans) == 0:
        return spans
    return spans[spans[:, 1] <= end]


def _containment(big: np.ndarray, little: np.ndarray) -> np.ndarray:
    """bool mask over ``big``: span i contains SOME little span
    ([s2,e2] within [s,e] iff s <= s2 and e2 <= e)."""
    if len(big) == 0 or len(little) == 0:
        return np.zeros(len(big), dtype=bool)
    order = np.argsort(little[:, 0], kind="mergesort")
    ls = little[order, 0]
    # prefix min of ends in start order: a little span starting >= s with
    # end <= e exists iff min(end of littles in [s..]) over suffix <= e…
    # suffix min of ends for littles with start >= big.start:
    le = little[order, 1]
    suffix_min = np.minimum.accumulate(le[::-1])[::-1]
    idx = np.searchsorted(ls, big[:, 0], side="left")
    ok = idx < len(ls)
    m = np.where(ok, suffix_min[np.minimum(idx, len(ls) - 1)],
                 np.iinfo(np.int64).max)
    return ok & (m <= big[:, 1])


def containing_spans(big: np.ndarray, little: np.ndarray) -> np.ndarray:
    """SpanContainingQuery (``queries/spans/SpanContainingQuery.java``):
    BIG spans that contain at least one little span; each emitted once
    with its own width."""
    return big[_containment(big, little)]


def within_spans(little: np.ndarray, big: np.ndarray) -> np.ndarray:
    """SpanWithinQuery (``queries/spans/SpanWithinQuery.java``): LITTLE
    spans contained in at least one big span."""
    if len(little) == 0 or len(big) == 0:
        return _EMPTY_SPANS
    order = np.argsort(big[:, 0], kind="mergesort")
    bs = big[order, 0]
    be = big[order, 1]
    # little [s2,e2] within some big iff exists big with start <= s2 and
    # end >= e2: prefix max of big ends over bigs with start <= s2
    prefix_max = np.maximum.accumulate(be)
    idx = np.searchsorted(bs, little[:, 0], side="right")
    ok = idx > 0
    m = np.where(ok, prefix_max[np.maximum(idx - 1, 0)],
                 np.iinfo(np.int64).min)
    return little[ok & (m >= little[:, 1])]


def spans_freq(spans: np.ndarray) -> float:
    """SpanScorer freq accumulation: Σ 1/(1 + width) over emitted spans
    (``SpanScorer.java:106``)."""
    if len(spans) == 0:
        return 0.0
    return float(np.sum(1.0 / (1.0 + spans[:, 2].astype(np.float64))))


def eval_span_tree(tree, pmap: dict[str, np.ndarray]) -> np.ndarray:
    """Evaluate a compiled span tree against one document's
    term → sorted-positions map. Tree grammar (nested tuples):

      ("term", t) | ("near", terms, slop, in_order)
      | ("nearspans", (child, ...), slop, in_order)   — nested SpanNear
      | ("or", (child, ...)) | ("not", include, exclude)
      | ("first", child, end)
      | ("contain", big, little) | ("within", little, big)
    """
    kind = tree[0]
    if kind == "term":
        return term_spans(pmap.get(tree[1], ()))
    if kind == "near":
        return near_spans([pmap.get(t, np.empty(0, np.int64))
                           for t in tree[1]], tree[2], tree[3])
    if kind == "nearspans":
        return near_spans_over([eval_span_tree(c, pmap) for c in tree[1]],
                               tree[2], tree[3])
    if kind == "or":
        return or_spans([eval_span_tree(c, pmap) for c in tree[1]])
    if kind == "not":
        return not_spans(eval_span_tree(tree[1], pmap),
                         eval_span_tree(tree[2], pmap))
    if kind == "first":
        return first_spans(eval_span_tree(tree[1], pmap), tree[2])
    if kind == "contain":
        return containing_spans(eval_span_tree(tree[1], pmap),
                                eval_span_tree(tree[2], pmap))
    if kind == "within":
        return within_spans(eval_span_tree(tree[1], pmap),
                            eval_span_tree(tree[2], pmap))
    raise TypeError(f"unknown span tree node {tree!r}")


def span_tree_terms(tree, positive_only: bool = False) -> list[str]:
    """Leaf terms of a span tree; ``positive_only`` drops exclude sides
    (the reference builds the similarity weight from include termStates
    only, ``SpanNotQuery.java:117``)."""
    kind = tree[0]
    if kind == "term":
        return [tree[1]]
    if kind == "near":
        return list(tree[1])
    if kind == "nearspans":
        out = []
        for c in tree[1]:
            out.extend(span_tree_terms(c, positive_only))
        return out
    if kind == "or":
        out = []
        for c in tree[1]:
            out.extend(span_tree_terms(c, positive_only))
        return out
    if kind == "not":
        inc = span_tree_terms(tree[1], positive_only)
        if positive_only:
            return inc
        return inc + span_tree_terms(tree[2], positive_only)
    if kind == "first":
        return span_tree_terms(tree[1], positive_only)
    if kind in ("contain", "within"):
        # SpanContainQuery extracts termStates from BOTH sides
        return (span_tree_terms(tree[1], positive_only)
                + span_tree_terms(tree[2], positive_only))
    raise TypeError(f"unknown span tree node {tree!r}")


def span_near_freq(pos_lists: list[np.ndarray], slop: int,
                   in_order: bool) -> float:
    """Accumulated sloppy frequency of SpanNear matches in one document.

    ``pos_lists``: one sorted int array of positions per clause term.
    """
    return spans_freq(near_spans(pos_lists, slop, in_order))
