"""TermAutomatonQuery path-counting kernel.

Reference: ``sandbox/src/java/org/apache/lucene/sandbox/search/
TermAutomatonQuery.java`` + ``TermAutomatonScorer.java:221-338``
(countMatches): an NFA over token positions — each concrete-term token
transitions ``state → step(state, termID)`` from its position to the
next; ANY arcs advance one position at a time across every intermediate
position (``:267-293``); a fresh match may start at any token
(``step(0, termID)``, ``:321-330``). PosState keeps states WITH
MULTIPLICITY (``PosState.add`` appends, no dedup — ``:376-389``), so
``freq`` counts accepting PATH events: it increments once per
(path, accepting concrete-term transition) — accepts reached via ANY
arcs alone do not count (the any-advance loop has no isAccept check).

The Spark-side kernel replicates that algorithm with a counts DP
(state → multiplicity per position) per candidate document. Candidate
docs = union of the involved terms' postings, exactly the scorer's
DisiPriorityQueue; the DP is linear in the doc's involved-token count.
"""

from __future__ import annotations

import numpy as np


def run_term_automaton(positions: np.ndarray, tids: np.ndarray,
                       trans: dict, any_trans: dict,
                       accepts: frozenset) -> int:
    """Count accepting path events for ONE doc.

    positions/tids: the doc's involved tokens sorted by (position, tid).
    trans: {(state, tid): (target, ...)}; any_trans: {state: (target,
    ...)} for ANY arcs; accepts: accepting state set. Returns freq."""
    freq = 0
    frontier: dict[int, dict[int, int]] = {}   # pos -> {state: count}
    last_pos = -1
    for pos, tid in zip(positions, tids):
        pos = int(pos)
        if last_pos != -1 and any_trans and pos > last_pos:
            p = last_pos
            while p < pos:
                cur = frontier.get(p)
                if not cur:
                    if p > last_pos:
                        break                     # petered out (:272-276)
                    p += 1
                    continue
                nxt = frontier.setdefault(p + 1, {})
                for st, cnt in cur.items():
                    for tgt in any_trans.get(st, ()):
                        nxt[tgt] = nxt.get(tgt, 0) + cnt
                p += 1
        cur = frontier.get(pos)
        nxt = frontier.setdefault(pos + 1, {})
        if cur:
            for st, cnt in cur.items():
                for tgt in trans.get((st, int(tid)), ()):
                    nxt[tgt] = nxt.get(tgt, 0) + cnt
                    if tgt in accepts:
                        freq += cnt
        for tgt in trans.get((0, int(tid)), ()):  # fresh start (:321-330)
            nxt[tgt] = nxt.get(tgt, 0) + 1
            if tgt in accepts:
                freq += 1
        # drop frontiers that can no longer fire (all tokens are ≥ pos)
        for stale in [p for p in frontier if p < pos]:
            del frontier[stale]
        last_pos = pos
    return freq


def batch_term_automaton_freqs(doc_keys: list[np.ndarray],
                               n_docs: int, trans: dict, any_trans: dict,
                               accepts: frozenset) -> np.ndarray:
    """Per-doc freqs over a segment range: ``doc_keys[tid]`` holds the
    involved term tid's (local_doc << 32 | position) keys. Returns
    float64[n_docs]."""
    parts_k, parts_t = [], []
    for tid, keys in enumerate(doc_keys):
        if len(keys):
            parts_k.append(keys)
            parts_t.append(np.full(len(keys), tid, dtype=np.int64))
    freqs = np.zeros(n_docs, dtype=np.float64)
    if not parts_k:
        return freqs
    k = np.concatenate(parts_k)
    t = np.concatenate(parts_t)
    order = np.lexsort((t, k))
    k, t = k[order], t[order]
    docs = k >> 32
    pos = k & 0xFFFFFFFF
    bounds = np.nonzero(np.diff(docs))[0] + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(k)]))
    for s, e in zip(starts, ends):
        d = int(docs[s])
        freqs[d] = run_term_automaton(pos[s:e], t[s:e], trans,
                                      any_trans, accepts)
    return freqs


def brute_path_count(tokens: list[str], term_of: dict, trans: dict,
                     any_trans: dict, accepts: frozenset) -> int:
    """Independent test twin: explicitly enumerate every path over the
    FULL token sequence (ANY matches any token, concrete arcs match
    their term), counting accept events reached via concrete arcs.
    Exponential — tiny inputs only."""
    freq = 0

    def walk(state: int, i: int, via_concrete: bool):
        nonlocal freq
        if via_concrete and state in accepts:
            freq += 1
        if i >= len(tokens):
            return
        tid = term_of.get(tokens[i], -1)
        if tid >= 0:
            for tgt in trans.get((state, tid), ()):
                walk(tgt, i + 1, True)
        for tgt in any_trans.get(state, ()):
            walk(tgt, i + 1, False)

    for i, tok in enumerate(tokens):
        tid = term_of.get(tok, -1)
        if tid >= 0:
            for tgt in trans.get((0, tid), ()):
                walk(tgt, i + 1, True)
    return freq
