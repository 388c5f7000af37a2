"""DictionaryCompoundWordTokenFilter (reference
``analysis/common/.../compound/DictionaryCompoundWordTokenFilter.java:
67-95`` over ``compound/CompoundWordTokenFilterBase.java``): brute-force
dictionary decomposition of compound words — "Donaudampfschiff" emits
Donau/dampf/schiff so a query for "schiff" matches. The original token
keeps its position (posInc 1); every subword is a posInc-0 overlap at
the same position, in (start, growing-length) scan order. Dictionary
matching is case-insensitive (the reference's CharArraySet); emitted
subword text is the original-case slice of the token.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: CompoundWordTokenFilterBase.java:31-37
DEFAULT_MIN_WORD_SIZE = 5
DEFAULT_MIN_SUBWORD_SIZE = 2
DEFAULT_MAX_SUBWORD_SIZE = 15


def _norm_spec(spec) -> tuple:
    """Accept a bare word set (reference defaults) or a full
    (words, min_word, min_sub, max_sub, only_longest) tuple."""
    if isinstance(spec, (set, frozenset)):
        return (frozenset(spec), DEFAULT_MIN_WORD_SIZE,
                DEFAULT_MIN_SUBWORD_SIZE, DEFAULT_MAX_SUBWORD_SIZE, False)
    words, mw, ms, xs, ol = spec
    return frozenset(words), int(mw), int(ms), int(xs), bool(ol)


def decompose_token(token: str, spec) -> list[str]:
    """Subwords of one token per DictionaryCompoundWordTokenFilter
    .decompose (:67-95): every dictionary substring of length
    [minSubword, maxSubword] at every start (tokens shorter than
    minWordSize skipped entirely — base class :85); with
    onlyLongestMatch, the longest match PER START position."""
    words, min_word, min_sub, max_sub, only_longest = _norm_spec(spec)
    n = len(token)
    if n < min_word:
        return []
    low = token.lower()
    lowset = {w.lower() for w in words}
    out: list[str] = []
    for i in range(0, n - min_sub + 1):
        best_j = 0
        for j in range(min_sub, max_sub + 1):
            if i + j > n:
                break
            if low[i:i + j] in lowset:
                if only_longest:
                    best_j = j        # j ascending → last hit is longest
                else:
                    out.append(token[i:i + j])
        if only_longest and best_j:
            out.append(token[i:i + best_j])
    return out


def expand_compound_text(terms, positions, spec):
    """Single-stream twin of :func:`expand_compound_batch`. Returns
    (terms, positions, n_overlap); subword overlays appended (inversion
    lexsorts, so order is irrelevant)."""
    out_t, out_p = list(terms), list(positions)
    n_over = 0
    for t, p in zip(terms, positions):
        for sub in decompose_token(t, spec):
            out_t.append(sub)
            out_p.append(p)
            n_over += 1
    return out_t, out_p, n_over


def expand_compound_batch(doc_idx, terms, positions, n_docs, spec):
    """Columnar decomposition: subwords computed once per UNIQUE token
    (compounds repeat heavily in real corpora), then gathered back
    through factorize codes. Returns (doc_idx, terms, positions,
    overlaps_per_doc) with subword overlays appended — overlap counts
    feed FieldInvertState.numOverlap so discountOverlaps norms stay the
    surface-token count while tf/df/ttf include the subwords."""
    overlaps = np.zeros(n_docs, dtype=np.int64)
    if len(terms) == 0:
        return doc_idx, terms, positions, overlaps
    codes, uniq = pd.factorize(terms)
    subs_u = [decompose_token(u, spec) for u in uniq]
    counts_u = np.fromiter((len(s) for s in subs_u), np.int64,
                           count=len(uniq))
    per_tok = counts_u[codes]
    total = int(per_tok.sum())
    if total == 0:
        return doc_idx, terms, positions, overlaps
    add_d = np.repeat(doc_idx, per_tok)
    add_p = np.repeat(positions, per_tok)
    add_t = np.empty(total, dtype=object)
    i = 0
    for c in codes:
        s = subs_u[c]
        if s:
            add_t[i:i + len(s)] = s
            i += len(s)
    overlaps = np.bincount(add_d, minlength=n_docs).astype(np.int64)
    return (np.concatenate([doc_idx, add_d]),
            np.concatenate([terms, add_t]),
            np.concatenate([positions, add_p]),
            overlaps)
