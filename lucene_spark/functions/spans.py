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


def sloppy_phrase_freq(pos_lists: list[np.ndarray], slop: int,
                       offsets: list[int] | None = None) -> float:
    """Accumulated sloppy frequency of an n-term sloppy phrase in one doc
    (``SloppyPhraseMatcher.java:53`` role — minimal-interval semantics).

    Clause ``j``'s positions are offset-adjusted by ``-offsets[j]``
    (default ``-j``; explicit builder positions pass their own — the
    reference's ``PhrasePositions.position = pos - offset``), then every minimal
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
    offs = list(offsets) if offsets else list(range(n))
    adj = [np.asarray(p, dtype=np.int64) - offs[j]
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
    return _f32_sum_f32(sloppy_weights(ml))



def sloppy_weights(ml) -> np.ndarray:
    """SloppyPhraseMatcher.sloppyWeight (:169): ``1f/(1f+matchLength)``
    computed in float32 — the PHRASE freq weight."""
    return np.float32(1.0) / (np.float32(1.0)
                              + np.asarray(ml).astype(np.float32))


def _f32_sum_f32(w) -> float:
    """PhraseScorer freq accumulation (PhraseScorer.java:78):
    ``float freq += float sloppyWeight()`` — a strict left-to-right
    float32 chain (cumsum with a float32 accumulator), in window order
    (minimal windows are non-nested, so (L, R) order == match order).
    Bit-identical to the real Lucene accumulation — pinned by the
    lucene_diff goldens."""
    w = np.asarray(w, dtype=np.float32)
    return float(np.cumsum(w, dtype=np.float32)[-1]) if len(w) else 0.0


def _f32_sum_f64(w) -> float:
    """SpanScorer.java:106 / IntervalScorer.java:72 accumulation:
    ``float freq += <double weight>`` — Java compound assignment widens
    freq to double, adds the exact double weight, narrows back to
    float32 EVERY step. np.add.at on a float32 target with float64
    operands performs exactly this per element."""
    w = np.asarray(w, dtype=np.float64)
    if not len(w):
        return 0.0
    acc = np.zeros(1, dtype=np.float32)
    np.add.at(acc, np.zeros(len(w), dtype=np.int64), w)
    return float(acc[0])

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
    """(start, end, width) triples of SpanNear matches in one document,
    in the reference iterators' EMISSION ORDER — the exact
    NearSpansOrdered/NearSpansUnordered ports (functions/nearspans.py,
    fuzz-verified span-for-span against the compiled reference,
    tests/data/lucene_diff/spans_fuzz.tsv.gz). ``end`` is exclusive;
    ``width`` is the reference's width() (ordered: sum of internal
    gaps; unordered: maxEnd - minStart), the SpanScorer weight input."""
    n = len(pos_lists)
    if n == 0 or any(len(p) == 0 for p in pos_lists):
        return _EMPTY_SPANS
    if n == 1:
        return term_spans(pos_lists[0])
    from .nearspans import ordered_near_spans, unordered_near_spans
    fn = ordered_near_spans if in_order else unordered_near_spans
    out = fn(pos_lists, slop)
    if not out:
        return _EMPTY_SPANS
    return np.asarray(out, dtype=np.int64).reshape(-1, 3)


def near_spans_over(span_lists: list[np.ndarray], slop: int,
                    in_order: bool) -> np.ndarray:
    """SpanNear over arbitrary CLAUSE SPAN STREAMS (the reference's
    nested ``SpanNearQuery(SpanQuery...)``) — the exact general-stream
    NearSpans ports (functions/nearspans.py): each clause stream is
    consumed in ITS OWN emission order; the output is the reference
    iterator's emission order (starts non-decreasing, ends free).

    * ordered — one candidate per sub[0] span; stretchToOrder ratchets
      each later sub to its first span with ``start >= prev.end``;
      width = Σ inter-span gaps (``NearSpansOrdered.java:116``).
    * unordered — the SpanTotalLengthEndPositionWindow heap walk with
      RUNNING maxEnd / totalSpanLength; width = maxEnd − minStart.
    """
    n = len(span_lists)
    if n == 0 or any(len(s) == 0 for s in span_lists):
        return _EMPTY_SPANS
    if n == 1:
        return span_lists[0]
    from .nearspans import (ordered_near_spans_over,
                            unordered_near_spans_over)
    fn = ordered_near_spans_over if in_order else unordered_near_spans_over
    out = fn(span_lists, slop)
    if not out:
        return _EMPTY_SPANS
    return np.asarray(out, dtype=np.int64).reshape(-1, 3)


def or_spans(span_lists: list[np.ndarray]) -> np.ndarray:
    """Union of clause span streams, (start, end) ordered
    (SpanOrQuery's SpanDisiPriorityQueue merge role)."""
    parts = [s for s in span_lists if len(s)]
    if not parts:
        return _EMPTY_SPANS
    allsp = np.concatenate(parts)
    order = np.lexsort((allsp[:, 1], allsp[:, 0]))
    return allsp[order]


def not_spans(include: np.ndarray, exclude: np.ndarray,
              pre: int = 0, post: int = 0) -> np.ndarray:
    """Spans of ``include`` that do not overlap any ``exclude`` span
    within ``pre`` tokens before / ``post`` tokens after
    (SpanNotQuery(include, exclude, pre, post) — pre = post = 0 is the
    plain exclusion): the include span dilated to
    [s - pre, e + post) must not overlap [s2, e2); overlap iff
    s - pre < e2 and s2 < e + post."""
    if len(include) == 0 or len(exclude) == 0:
        return include
    starts = np.sort(exclude[:, 0])
    # prefix max of ends in start order
    order = np.argsort(exclude[:, 0], kind="mergesort")
    ends_sorted = exclude[order, 1]
    pmax = np.maximum.accumulate(ends_sorted)
    # candidates: exclude spans with start < dilated include end
    idx = np.searchsorted(starts, include[:, 1] + post, side="left")
    has_overlap = (idx > 0) & (pmax[np.maximum(idx - 1, 0)]
                               > include[:, 0] - pre)
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
    return _f32_sum_f64(1.0 / (1.0 + spans[:, 2].astype(np.float64)))


def eval_span_tree(tree, pmap: dict[str, np.ndarray]) -> np.ndarray:
    """Evaluate a compiled span tree against one document's
    term → sorted-positions map. Tree grammar (nested tuples):

      ("term", t) | ("near", terms, slop, in_order)
      | ("nearspans", (child, ...), slop, in_order)   — nested SpanNear
      | ("or", (child, ...)) | ("not", include, exclude)
      | ("notwin", include, exclude, pre, post)
      | ("first", child, end) | ("posrange", child, start, end)
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
    if kind == "notwin":
        return not_spans(eval_span_tree(tree[1], pmap),
                         eval_span_tree(tree[2], pmap),
                         tree[3], tree[4])
    if kind == "first":
        return first_spans(eval_span_tree(tree[1], pmap), tree[2])
    if kind == "posrange":
        sp = eval_span_tree(tree[1], pmap)
        if len(sp) == 0:
            return sp
        return sp[(sp[:, 0] >= tree[2]) & (sp[:, 1] <= tree[3])]
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
    if kind in ("not", "notwin"):
        inc = span_tree_terms(tree[1], positive_only)
        if positive_only:
            return inc
        return inc + span_tree_terms(tree[2], positive_only)
    if kind in ("first", "posrange"):
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


# ---------------------------------------------------------------------------
# Batched (cross-document vectorized) kernels
#
# The per-doc matchers above pay one Python call + small-array numpy
# overhead per candidate document — fine for rare-term conjunctions,
# quadratic-feeling for two COMMON terms where the candidate set is a
# large fraction of the segment. The kernels below run ONE numpy pass
# over every candidate document at once: positions are embedded into
# global keys ``(doc - lo) * 2^32 + adjusted_position + pad`` so all
# per-clause arrays stay sorted doc-major, and doc boundaries are
# enforced by explicit same-doc guards (a window whose left edge falls
# in a different doc than its right edge is rejected, which is exactly
# the per-doc behavior). Differential-equality with the per-doc
# matchers is asserted by hypothesis tests.
# ---------------------------------------------------------------------------

_KEY_BIG = np.int64(1) << np.int64(32)


def _batch_double_minimal(key_lists: list[np.ndarray]
                          ) -> tuple[np.ndarray, np.ndarray]:
    """All double-minimal complete windows over per-clause SORTED global
    key arrays, across every document at once. Returns unique (L, R) key
    pairs with both edges in the same document.

    Same characterization as :func:`sloppy_phrase_freq`:
    ``L = min_j max{a_j <= R}``, ``R = max_j min{a_j >= L}``; cross-doc
    candidates self-reject — a clause with no key <= R inside R's doc
    contributes an earlier-doc key to the min, tripping the same-doc
    guard, and a clause with no key >= L inside the doc contributes a
    later-doc key to the max, breaking ``R == max``.
    """
    n = len(key_lists)
    if n == 0 or any(len(a) == 0 for a in key_lists):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    rs = np.unique(np.concatenate(key_lists))
    ok = np.ones(len(rs), dtype=bool)
    lmat = np.empty((n, len(rs)), dtype=np.int64)
    for j, a in enumerate(key_lists):
        idx = np.searchsorted(a, rs, side="right") - 1
        ok &= idx >= 0
        lmat[j] = a[np.clip(idx, 0, len(a) - 1)]
    l_v = lmat.min(axis=0)
    ok &= (l_v >> 32) == (rs >> 32)          # same-doc guard (left)
    rs_v, l_v = rs[ok], l_v[ok]
    if len(rs_v) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    good = np.ones(len(rs_v), dtype=bool)
    rmat = np.empty((n, len(rs_v)), dtype=np.int64)
    for j, a in enumerate(key_lists):
        idx = np.searchsorted(a, l_v, side="left")
        good &= idx < len(a)
        rmat[j] = a[np.clip(idx, 0, len(a) - 1)]
    valid = good & (rmat.max(axis=0) == rs_v)
    if not valid.any():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    pairs = np.unique(np.stack([l_v[valid], rs_v[valid]], axis=1), axis=0)
    return pairs[:, 0], pairs[:, 1]


def _accumulate_by_doc(doc_idx: np.ndarray, contrib: np.ndarray,
                       n_docs: int) -> np.ndarray:
    """Per-doc float32 freq accumulation (np.add.at is sequential and
    per-element computes in the COMMON dtype then narrows to the out
    dtype): float32 contrib reproduces PhraseScorer's float += float;
    float64 contrib reproduces SpanScorer's float += double."""
    out = np.zeros(n_docs, dtype=np.float32)
    if len(doc_idx):
        np.add.at(out, doc_idx, contrib)
    return out.astype(np.float64)


def batch_sloppy_phrase_freqs(pos_key_lists: list[np.ndarray], slop: int,
                              n_docs: int) -> np.ndarray:
    """Per-doc accumulated sloppy-phrase frequency over ALL documents in
    one pass (vectorized :func:`sloppy_phrase_freq`).

    ``pos_key_lists[j]`` = sorted ``doc_idx * 2^32 + (pos - j) + pad``
    keys of clause j (pad >= number of clauses keeps adjusted positions
    non-negative; the CALLER applies identical pad to every clause so
    widths are unaffected). Returns a float64 array of length n_docs.
    """
    L, R = _batch_double_minimal(pos_key_lists)
    if len(L) == 0:
        return np.zeros(n_docs, dtype=np.float64)
    ml = R - L                                # same doc: offsets cancel
    keep = ml <= slop
    return _accumulate_by_doc((R[keep] >> 32).astype(np.int64),
                              sloppy_weights(ml[keep]), n_docs)


def batch_unordered_near_freqs(pos_key_lists: list[np.ndarray], slop: int,
                               n_docs: int) -> np.ndarray:
    """Per-doc accumulated UNORDERED SpanNear frequency in one pass —
    reference-exact (functions/nearspans.py batched event-walk kernel;
    width = maxEnd − minStart, match when width − n <= slop)."""
    return batch_spans_freqs(batch_near_spans(pos_key_lists, slop, False),
                             n_docs)


def batch_ordered_near_freqs(pos_key_lists: list[np.ndarray], slop: int,
                             n_docs: int) -> np.ndarray:
    """Per-doc accumulated ORDERED SpanNear frequency in one pass —
    reference-exact (one emission per first-clause position whose
    stretched chain fits; width = Σ internal gaps)."""
    return batch_spans_freqs(batch_near_spans(pos_key_lists, slop, True),
                             n_docs)


def batch_near_spans(pos_key_lists: list[np.ndarray], slop: int,
                     in_order: bool) -> np.ndarray:
    """Batched :func:`near_spans`: (start_key, end_key, width) triples of
    SpanNear matches across ALL documents, doc-major, reference emission
    order within each doc (the exact batched kernels of
    functions/nearspans.py). Keys embed ``doc << 32 | pos``; ends are
    ``doc << 32 | pos + 1`` (positions < 2^31, so an end never crosses
    its doc's key range)."""
    from .nearspans import batch_near_spans_exact
    return batch_near_spans_exact(pos_key_lists, slop, in_order)


def _split_by_doc(spans: np.ndarray) -> tuple[np.ndarray, list[np.ndarray]]:
    """Split a doc-major global-key span array into per-doc blocks;
    returns (doc ids, list of per-doc LOCAL-position span arrays)."""
    if len(spans) == 0:
        return np.empty(0, np.int64), []
    docs = spans[:, 0] >> 32
    cuts = np.nonzero(docs[1:] != docs[:-1])[0] + 1
    blocks = np.split(spans, cuts)
    uniq = docs[np.concatenate(([0], cuts))]
    local = []
    for d, b in zip(uniq, blocks):
        off = np.int64(d) << np.int64(32)
        local.append(b - np.array([off, off, 0], dtype=np.int64))
    return uniq, local


def eval_span_tree_batch(tree, key_pmap: dict[str, np.ndarray]
                         ) -> np.ndarray:
    """Batched :func:`eval_span_tree`: evaluates the whole segment at once
    on GLOBAL-KEY span arrays (``doc << 32 | pos``). The or/not/first/
    contain/within combinators operate on global keys unchanged — doc
    boundaries self-enforce because any two docs' key ranges are disjoint
    and wider than any position (< 2^31):

    * overlap/containment between spans of different docs is impossible
      (a later doc's start key exceeds an earlier doc's end key), so the
      sorted prefix/suffix-extrema tricks of :func:`not_spans` /
      :func:`containing_spans` / :func:`within_spans` are doc-safe as-is;
    * ``first`` recovers the local end position as ``end_key - (doc<<32)``.

    Nested ``nearspans`` over general streams keeps the per-doc matcher
    (its greedy chain is stateful per doc); every other node is one numpy
    pass. Within-doc emission order matches the per-doc evaluator, so
    sequential per-doc accumulation is bit-identical."""
    kind = tree[0]
    if kind == "term":
        k = key_pmap.get(tree[1])
        if k is None or len(k) == 0:
            return _EMPTY_SPANS
        return np.stack([k, k + 1, np.zeros(len(k), np.int64)], axis=1)
    if kind == "near":
        return batch_near_spans(
            [key_pmap.get(t, np.empty(0, np.int64)) for t in tree[1]],
            tree[2], tree[3])
    if kind == "nearspans":
        children = [eval_span_tree_batch(c, key_pmap) for c in tree[1]]
        # per-doc fallback: intersect the docs present in every child
        doc_sets = []
        split = []
        for ch in children:
            docs, local = _split_by_doc(ch)
            split.append(dict(zip(docs.tolist(), local)))
            doc_sets.append(set(docs.tolist()))
        common = sorted(set.intersection(*doc_sets)) if doc_sets else []
        parts = []
        for d in common:
            sp = near_spans_over([split[i][d] for i in range(len(split))],
                                 tree[2], tree[3])
            if len(sp):
                off = np.int64(d) << np.int64(32)
                parts.append(sp + np.array([off, off, 0], dtype=np.int64))
        return np.concatenate(parts) if parts else _EMPTY_SPANS
    if kind == "or":
        return or_spans([eval_span_tree_batch(c, key_pmap)
                         for c in tree[1]])
    if kind == "not":
        return not_spans(eval_span_tree_batch(tree[1], key_pmap),
                         eval_span_tree_batch(tree[2], key_pmap))
    if kind == "notwin":
        # global doc-major keys: dilation by a few positions never
        # crosses the 2^32 doc spacing (positions ≪ 2^32)
        return not_spans(eval_span_tree_batch(tree[1], key_pmap),
                         eval_span_tree_batch(tree[2], key_pmap),
                         tree[3], tree[4])
    if kind == "first":
        sp = eval_span_tree_batch(tree[1], key_pmap)
        if len(sp) == 0:
            return sp
        local_end = sp[:, 1] - ((sp[:, 0] >> 32) << np.int64(32))
        return sp[local_end <= tree[2]]
    if kind == "posrange":
        sp = eval_span_tree_batch(tree[1], key_pmap)
        if len(sp) == 0:
            return sp
        doc_base = (sp[:, 0] >> 32) << np.int64(32)
        ls = sp[:, 0] - doc_base
        le = sp[:, 1] - doc_base
        return sp[(ls >= tree[2]) & (le <= tree[3])]
    if kind == "contain":
        return containing_spans(eval_span_tree_batch(tree[1], key_pmap),
                                eval_span_tree_batch(tree[2], key_pmap))
    if kind == "within":
        return within_spans(eval_span_tree_batch(tree[1], key_pmap),
                            eval_span_tree_batch(tree[2], key_pmap))
    raise TypeError(f"unknown span tree node {tree!r}")


def batch_spans_freqs(spans: np.ndarray, n_docs: int) -> np.ndarray:
    """Per-doc SpanScorer freq accumulation over a doc-major global-key
    span array (sequential within doc — bit-identical to
    :func:`spans_freq` per doc): float32 target += double weight."""
    out = np.zeros(n_docs, dtype=np.float32)
    if len(spans):
        np.add.at(out, (spans[:, 0] >> 32).astype(np.int64),
                  1.0 / (1.0 + spans[:, 2].astype(np.float64)))
    return out.astype(np.float64)


def multiset_sloppy_freq(terms: list[str], pos_by_term: dict,
                         slop: int, offsets: list[int] | None = None,
                         ml_n: int | None = None) -> float:
    """Sloppy phrase frequency WITH duplicate clause terms for one doc.

    Clauses naming the same term share one occurrence stream; a window
    [L, R] (adjusted space: clause j covers it iff
    ``L + off_j <= orig <= R + off_j``) is complete only under an
    INJECTIVE assignment of stream occurrences to that term's clauses.
    freq = Σ 1/(1 + (R - L)) over the containment-minimal complete
    windows with R - L <= slop — the same declarative minimal-interval
    semantics as :func:`sloppy_phrase_freq`, generalized to multisets.
    ``ml_n`` switches the matchLength convention to the unordered
    SpanNear one, ``(R - L + 1) - n`` (NearSpansUnordered role), for
    duplicate-clause span queries.
    Divergence note: the reference's repeats machinery
    (``SloppyPhraseMatcher.java:53`` advanceRpts/collision handling) is
    an order-dependent iterative matcher; this is its declarative
    counterpart, differential-tested against explicit assignment
    enumeration.

    Feasibility of a window is checked per term group by greedy interval
    matching: clause intervals ``[L+o, R+o]`` are nested-ordered in o,
    so assigning each (in o order) the smallest unused occurrence that
    fits is exchange-argument optimal.
    """
    n = len(terms)
    offs = list(offsets) if offsets else list(range(n))
    groups = []
    by_term: dict[str, list[int]] = {}
    for j, t in enumerate(terms):
        by_term.setdefault(t, []).append(j)
    for t, idxs in by_term.items():
        P = np.asarray(pos_by_term.get(t, ()), dtype=np.int64)
        if len(P) < len(idxs):
            return 0.0
        groups.append((P, sorted(offs[j] for j in idxs)))

    def feasible(L: int, R: int) -> bool:
        for P, golds in groups:
            k = 0
            for o in golds:
                k = max(k, int(np.searchsorted(P, L + o, side="left")))
                if k >= len(P) or P[k] > R + o:
                    return False
                k += 1
        return True

    events = np.unique(np.concatenate(
        [P - o for P, golds in groups for o in golds]))
    freq = 0.0
    last_l = None
    for ri in range(len(events)):
        R = int(events[ri])
        # max feasible L <= R (feasibility anti-monotone in L)
        lo_i, hi_i = 0, ri
        if not feasible(int(events[0]), R):
            continue
        while lo_i < hi_i:                     # invariant: lo_i feasible
            mid = (lo_i + hi_i + 1) // 2
            if feasible(int(events[mid]), R):
                lo_i = mid
            else:
                hi_i = mid - 1
        L = int(events[lo_i])
        if last_l is not None and L <= last_l:
            continue                            # contained in a kept one
        last_l = L
        ml = (R - L) if ml_n is None else max(R - L + 1 - ml_n, 0)
        if ml <= slop:
            if ml_n is None:  # phrase: float += float (sloppyWeight)
                freq = float(np.float32(np.float32(freq)
                                        + sloppy_weights(ml)))
            else:             # span: float += double
                freq = float(np.float32(freq + 1.0 / (1 + ml)))
    return freq


def brute_multiset_sloppy_freq(terms: list[str], pos_by_term: dict,
                               slop: int,
                               offsets: list[int] | None = None,
                               ml_n: int | None = None) -> float:
    """Test twin: enumerate every injective assignment explicitly, take
    the containment antichain of the tight windows, sum sloppy weights.
    Exponential — tiny inputs only."""
    from itertools import permutations
    n = len(terms)
    offs = list(offsets) if offsets else list(range(n))
    by_term: dict[str, list[int]] = {}
    for j, t in enumerate(terms):
        by_term.setdefault(t, []).append(j)
    group_choices = []
    for t, idxs in by_term.items():
        P = list(pos_by_term.get(t, ()))
        if len(P) < len(idxs):
            return 0.0
        group_choices.append((idxs, [list(pm) for pm in
                                     permutations(P, len(idxs))]))
    windows = set()

    def rec(gi, assign):
        if gi == len(group_choices):
            adj = [assign[j] - offs[j] for j in range(n)]
            windows.add((min(adj), max(adj)))
            return
        idxs, perms = group_choices[gi]
        for pm in perms:
            for j, p in zip(idxs, pm):
                assign[j] = p
            rec(gi + 1, assign)

    rec(0, [0] * n)
    minimal = [w for w in windows
               if not any(v != w and v[0] >= w[0] and v[1] <= w[1]
                          for v in windows)]
    def _ml(l, r):
        return (r - l) if ml_n is None else max(r - l + 1 - ml_n, 0)
    kept = sorted((l, r) for l, r in minimal if _ml(l, r) <= slop)
    freq = np.float32(0.0)
    for l, r in kept:
        if ml_n is None:  # phrase: float += float sloppyWeight
            freq = np.float32(freq + sloppy_weights(_ml(l, r)))
        else:             # span: float += double
            freq = np.float32(np.float64(freq) + 1.0 / (1 + _ml(l, r)))
    return float(freq)


def _group_envelopes(keys: np.ndarray, offs: list[int]) -> np.ndarray:
    """Pareto envelope stream of one duplicate-term group.

    ``keys``: the term's sorted global position keys (doc-major,
    positions pre-padded so ``key - off`` never borrows doc bits);
    ``offs``: the group's sorted clause offsets. An injective
    assignment p_1 < … < p_k (clause j takes p_j, in offset order —
    exchange-argument WLOG) fits a window [L, R] in adjusted space iff
    L <= min_j(p_j - o_j) and R >= max_j(p_j - o_j), so the group is
    EXACTLY an interval stream of (m, M) envelopes; only the Pareto
    frontier (max m, min M) matters. For every candidate lower bound
    L (all values p - o_j — the only points where a constraint can be
    tight), the M-minimal assignment is the greedy chain
    p_j = smallest occurrence >= max(p_{j-1} + 1, L + o_j), computed
    for ALL candidates at once with one searchsorted per clause.
    Returns the antichain-normalized (m, 3) [start, end, 0] stream.
    """
    from .intervals import _norm_antichain
    k = len(offs)
    if k == 1:
        p = keys - np.int64(offs[0])
        return np.stack([p, p, np.zeros(len(p), np.int64)], axis=1)
    cands = np.unique(np.concatenate(
        [keys - np.int64(o) for o in offs]))
    doc = cands >> np.int64(32)
    prev = np.full(len(cands), np.iinfo(np.int64).min, np.int64)
    mval = np.full(len(cands), np.iinfo(np.int64).min, np.int64)
    valid = np.ones(len(cands), dtype=bool)
    for o in offs:
        need = np.maximum(prev + 1, cands + np.int64(o))
        idx = np.searchsorted(keys, need, side="left")
        valid &= idx < len(keys)
        p = keys[np.clip(idx, 0, len(keys) - 1)]
        valid &= (p >> np.int64(32)) == doc
        prev = p
        mval = np.maximum(mval, p - np.int64(o))
    if not valid.any():
        return np.empty((0, 3), dtype=np.int64)
    # cands are unique-sorted, so rows are start-sorted already;
    # _norm_antichain (minimize_or) does its own canonical sort
    env = np.stack([cands[valid], mval[valid],
                    np.zeros(int(valid.sum()), np.int64)], axis=1)
    return _norm_antichain(env)


def batch_multiset_sloppy_freqs(keys_by_term: dict, offs_by_term: dict,
                                slop: int, n_docs: int,
                                ml_n: int | None = None) -> np.ndarray:
    """Duplicate-clause sloppy frequency for ALL docs in one vectorized
    pass — the batched exact twin of :func:`multiset_sloppy_freq`.

    Each duplicate-term group becomes its Pareto envelope interval
    stream (:func:`_group_envelopes`); the complete minimal windows are
    then the unordered containment-minimal windows over those streams
    (``intervals.unordered_over`` — one whole envelope per group inside
    the window), which is precisely the injective-multiset window
    antichain. freq = Σ 1/(1+ml) per window, ml = width (phrase
    convention) or max(width+1-ml_n, 0) (NearSpansUnordered
    matchLength). Differential-tested against the per-doc matcher.

    100 TB shape: every step is a searchsorted / antichain scan over
    doc-major key arrays — no per-candidate-doc Python loop, so a
    repeated COMMON term costs the same class of work as the plain
    sloppy kernel.
    """
    from .intervals import unordered_over
    freqs = np.zeros(n_docs, dtype=np.float64)
    out32 = np.zeros(n_docs, dtype=np.float32)
    streams = []
    for t, keys in keys_by_term.items():
        if len(keys) == 0:
            return freqs
        env = _group_envelopes(keys, sorted(offs_by_term[t]))
        if len(env) == 0:
            return freqs
        streams.append(env)
    wins = unordered_over(streams)
    if len(wins) == 0:
        return freqs
    width = wins[:, 1] - wins[:, 0]
    ml = width if ml_n is None else np.maximum(width + 1 - ml_n, 0)
    keep = ml <= slop
    if not keep.any():
        return freqs
    w = (sloppy_weights(ml[keep]) if ml_n is None
         else 1.0 / (1.0 + ml[keep]))
    np.add.at(out32, (wins[keep, 0] >> np.int64(32)).astype(np.int64), w)
    return out32.astype(np.float64)
