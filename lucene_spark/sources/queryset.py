"""Reference-style query-set generator (FIXTURES.md §2).

Shape modeled on the reference's benchmark query files
(``lucene/benchmark/conf/query-terms.txt`` / ``query-phrases.txt`` and
``byTask/feeds/EnwikiQueryMaker.java:42``): single terms sampled at known
df percentiles (so WAND pivots, impact skips and exhaustive paths all get
exercised), 2-3 term AND conjunctions, OR disjunctions, quoted phrases,
plus some absent terms. Deterministic given (term_stats, seed).
"""

from __future__ import annotations

import numpy as np


def generate_query_set(term_dfs: dict[str, int], seed: int = 42,
                       n_term: int = 20, n_and: int = 20,
                       n_or: int = 15, n_phrase: int = 5) -> dict[str, str]:
    """{query_id: classic-syntax query string} over the given vocabulary.

    ``term_dfs``: term -> document frequency (e.g. collected from the
    term_stats table). Terms are drawn from high/mid/low df percentiles.
    """
    rng = np.random.RandomState(seed)
    terms = sorted(term_dfs, key=lambda t: (-term_dfs[t], t))
    if not terms:
        return {}

    def pick(lo_pct: float, hi_pct: float) -> str:
        lo = int(len(terms) * lo_pct)
        hi = max(int(len(terms) * hi_pct), lo + 1)
        return terms[lo + int(rng.randint(hi - lo))]

    out: dict[str, str] = {}
    bands = [(0.0, 0.1), (0.1, 0.4), (0.4, 0.8), (0.8, 1.0)]
    for i in range(n_term):
        if i % 5 == 4:
            out[f"term_{i:02d}"] = f"zz_absent_{i}"   # absent term
        else:
            lo, hi = bands[i % len(bands)]
            out[f"term_{i:02d}"] = pick(lo, hi)
    for i in range(n_and):
        n = 2 + (i % 2)
        picked = [pick(*bands[(i + j) % len(bands)]) for j in range(n)]
        out[f"and_{i:02d}"] = " AND ".join(dict.fromkeys(picked))
    for i in range(n_or):
        n = 2 + (i % 2)
        picked = [pick(*bands[(i + j + 1) % len(bands)]) for j in range(n)]
        out[f"or_{i:02d}"] = " OR ".join(dict.fromkeys(picked))
    for i in range(n_phrase):
        a, b = pick(0.0, 0.3), pick(0.0, 0.5)
        out[f"phrase_{i:02d}"] = f'"{a} {b}"'
    return out
