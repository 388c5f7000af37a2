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


def wave_term_automaton_freqs(doc_keys: list[np.ndarray], n_docs: int,
                              trans: dict, any_trans: dict,
                              accepts: frozenset) -> np.ndarray:
    """Position-wave BATCHED path counting: every candidate doc advances
    through the same DP simultaneously — no per-doc Python loop.

    The per-doc recurrence (see :func:`run_term_automaton`) collapses to
    linear algebra over the tiny state space: with V_i the frontier
    vector entering the doc's i-th involved position p_i,

        W_i     = Σ_tokens(p_i, tid) (V_i + e_0) · M_tid   (+ accepts)
        V_{i+1} = (W_i + V_i · M_any) · M_any^(p_{i+1} - p_i - 1)

    where M_tid / M_any are the 0/1 transition matrices and e_0 the
    fresh-start unit vector (each token opens its own fresh path, the
    scorer's ``step(0, termID)``). The wave runs over the i-th involved
    POSITION GROUP of every doc at once (rounds = max distinct involved
    positions in any doc); gap walks become cached matrix powers applied
    per distinct gap length; without ANY arcs a positive gap simply
    kills the frontier. Work: O(rounds × active_docs × states²) in
    vectorized numpy. Differential twin: the per-doc DP
    (:func:`run_term_automaton`), fuzz-tested equal.
    """
    freqs = np.zeros(n_docs, dtype=np.float64)
    parts_k, parts_t = [], []
    for tid, keys in enumerate(doc_keys):
        if len(keys):
            parts_k.append(keys)
            parts_t.append(np.full(len(keys), tid, dtype=np.int64))
    if not parts_k:
        return freqs
    k = np.concatenate(parts_k)
    t = np.concatenate(parts_t)
    order = np.lexsort((t, k))
    k, t = k[order], t[order]
    docs = (k >> np.int64(32)).astype(np.int64)
    pos = (k & np.int64(0xFFFFFFFF)).astype(np.int64)

    n_states = 1 + max(
        [s for s, _ in trans] + [tg for v in trans.values() for tg in v]
        + list(any_trans) + [tg for v in any_trans.values() for tg in v]
        + list(accepts))
    M_tid = {}
    for (st, td), tgts in trans.items():
        m = M_tid.setdefault(int(td),
                             np.zeros((n_states, n_states), np.float64))
        for tg in tgts:
            m[st, tg] += 1.0
    M_any = np.zeros((n_states, n_states), np.float64)
    for st, tgts in any_trans.items():
        for tg in tgts:
            M_any[st, tg] += 1.0
    acc = np.zeros(n_states, np.float64)
    for a in accepts:
        acc[a] = 1.0
    pow_cache: dict[int, np.ndarray] = {0: np.eye(n_states)}

    def any_pow(g: int) -> np.ndarray:
        if g not in pow_cache:
            pow_cache[g] = np.linalg.matrix_power(M_any, g)
        return pow_cache[g]

    # position groups: one per (doc, position); a group's wave round is
    # its ordinal among its doc's groups
    new_grp = np.ones(len(k), dtype=bool)
    new_grp[1:] = (docs[1:] != docs[:-1]) | (pos[1:] != pos[:-1])
    grp_of_tok = np.cumsum(new_grp) - 1
    g_first = np.nonzero(new_grp)[0]
    g_doc = docs[g_first]
    g_pos = pos[g_first]
    new_doc = np.ones(len(g_doc), dtype=bool)
    new_doc[1:] = g_doc[1:] != g_doc[:-1]
    gidx = np.arange(len(g_doc)) - np.maximum.accumulate(
        np.where(new_doc, np.arange(len(g_doc)), 0))

    cand, g_row = np.unique(g_doc, return_inverse=True)
    V = np.zeros((len(cand), n_states), np.float64)
    last_pos = np.full(len(cand), -1, np.int64)
    out = np.zeros(len(cand), np.float64)
    has_any = bool(any_trans)

    # one stable sort each: groups by round, tokens by their group's round
    g_order = np.argsort(gidx, kind="stable")
    g_bounds = np.searchsorted(gidx[g_order],
                               np.arange(int(gidx.max()) + 2))
    tok_gidx = gidx[grp_of_tok]
    t_order = np.argsort(tok_gidx, kind="stable")
    t_bounds = np.searchsorted(tok_gidx[t_order],
                               np.arange(int(gidx.max()) + 2))

    for r in range(int(gidx.max()) + 1):
        gs = g_order[g_bounds[r]:g_bounds[r + 1]]
        rows = g_row[gs]
        p_now = g_pos[gs]
        gaps = p_now - last_pos[rows] - 1
        started = last_pos[rows] >= 0
        if has_any:
            for g in np.unique(gaps[started]):
                m = started & (gaps == g)
                V[rows[m]] = V[rows[m]] @ any_pow(int(g))
        else:
            dead = started & (gaps > 0)
            if dead.any():
                V[rows[dead]] = 0.0
        ts = t_order[t_bounds[r]:t_bounds[r + 1]]
        tok_rows = g_row[grp_of_tok[ts]]
        tok_tids = t[ts]
        slot_of = np.empty(len(cand), np.int64)
        slot_of[rows] = np.arange(len(rows))
        src = V[rows].copy()
        src[:, 0] += 1.0                     # fresh start per token
        W = np.zeros((len(rows), n_states), np.float64)
        for td in np.unique(tok_tids):
            if int(td) not in M_tid:
                continue            # term with no arcs: token is inert
            m = tok_tids == td
            sl = slot_of[tok_rows[m]]
            stepped = src[sl] @ M_tid[int(td)]
            np.add.at(W, sl, stepped)
            np.add.at(out, tok_rows[m], stepped @ acc)
        if has_any:
            W += V[rows] @ M_any
        V[rows] = W
        last_pos[rows] = p_now

    freqs[cand] = out
    return freqs
