"""WordDelimiterGraphFilter — subword splitting for compound identifiers.

Reference: ``analysis/common/.../miscellaneous/WordDelimiterGraphFilter
.java`` (position graph, catenation, preserve-original semantics) and
``WordDelimiterIterator.java`` (the split rules). This is the filter that
makes code-corpus search work: ``Wi-Fi`` → ``Wi, Fi``; ``PowerShot`` →
``Power, Shot``; ``SD500`` → ``SD, 500``; ``O'Neil's`` → ``O, Neil``.

Supported subset: GENERATE_WORD_PARTS and GENERATE_NUMBER_PARTS are
always on (the catenate-only configurations drive ``wordPos`` through a
different bookkeeping path — ``WordDelimiterGraphFilter.java:539-542`` —
and are out of scope); CATENATE_WORDS / CATENATE_NUMBERS / CATENATE_ALL /
PRESERVE_ORIGINAL / SPLIT_ON_CASE_CHANGE / SPLIT_ON_NUMERICS /
STEM_ENGLISH_POSSESSIVE and protected words are all implemented with the
reference's exact semantics:

* split rules (``WordDelimiterIterator.isBreak:225-243``): delimiter
  chars (non-alphanumeric) always split and are dropped; same-type runs
  never split; UPPER→letter never splits (so ``NFLCoder`` stays one
  part); lower→UPPER splits only under SPLIT_ON_CASE_CHANGE;
  letter↔digit splits only under SPLIT_ON_NUMERICS.
* leading/trailing delimiters trimmed (``setBounds:262-275``); trailing
  ``'s`` stripped per subword under STEM_ENGLISH_POSSESSIVE
  (``endsWithPossessive``).
* a token that is one single subword after trimming is emitted alone —
  no catenations duplicate it (``bufferWordParts`` isSingleWord branch,
  line 276-279); a token with NO subwords (all delimiters) is swallowed,
  leaving a position hole (``incrementToken:375-381``), unless
  PRESERVE_ORIGINAL keeps the original.
* positions (the GRAPH part, ``incrementToken:423-426``): each part
  occupies its own NEW position (the filter inserts positions into the
  stream); a catenation sits at the position of its FIRST part with
  posInc 0 (overlap); PRESERVE_ORIGINAL emits the original first at the
  first part's position. Verified against the
  ``testLotsOfConcatenating`` increments ``[1,0,0,1,1,0,1]``.
* catenations: maximal same-type (ALPHA/DIGIT) part runs, written only
  when the run has ≥ 2 parts (``flushConcatenation:544``); CATENATE_ALL
  writes the all-part concatenation unless it equals the last flushed
  run (``bufferWordParts:317``, the PowerShot dedup).
* emission order: original first, then parts/catenations by (start
  offset asc, end offset desc) (``PositionSorter:445-460``).

Char classes use Python ``str.isdigit``/``isalpha``/``isupper`` in place
of ``Character.isDigit/isLetter/isUpperCase`` — identical on the
charsets we index (documented subset, same stance as the analyzer's
UAX#29 subset). ``_`` and all punctuation are delimiters, exactly what
snake_case identifier splitting needs.

Norm accounting (``FieldInvertState``): every part consumes a position
(posInc > 0) and counts toward the discounted norm length; catenations
and preserved originals are posInc-0 overlaps.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

GENERATE_WORD_PARTS = 1
GENERATE_NUMBER_PARTS = 2
CATENATE_WORDS = 4
CATENATE_NUMBERS = 8
CATENATE_ALL = 16
PRESERVE_ORIGINAL = 32
SPLIT_ON_CASE_CHANGE = 64
SPLIT_ON_NUMERICS = 128
STEM_ENGLISH_POSSESSIVE = 256

#: the reference's default full flag set for index-time identifier work
DEFAULT_FLAGS = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
                 | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
                 | STEM_ENGLISH_POSSESSIVE)

_LOWER, _UPPER, _DIGIT, _DELIM = 1, 2, 4, 8
_ALPHA = _LOWER | _UPPER

__all__ = [
    "GENERATE_WORD_PARTS", "GENERATE_NUMBER_PARTS", "CATENATE_WORDS",
    "CATENATE_NUMBERS", "CATENATE_ALL", "PRESERVE_ORIGINAL",
    "SPLIT_ON_CASE_CHANGE", "SPLIT_ON_NUMERICS",
    "STEM_ENGLISH_POSSESSIVE", "DEFAULT_FLAGS",
    "wdgf_token", "expand_worddelim_batch",
]


def _ctype(ch: str) -> int:
    if ch.isdigit():
        return _DIGIT
    if ch.isalpha():
        return _UPPER if ch.isupper() else _LOWER
    return _DELIM


def _is_break(last: int, cur: int, split_case: bool,
              split_num: bool) -> bool:
    """WordDelimiterIterator.isBreak:225-243."""
    if last & cur:
        return False
    if not split_case and (last & _ALPHA) and (cur & _ALPHA):
        return False
    if (last & _UPPER) and (cur & _ALPHA):
        return False
    if not split_num and (((last & _ALPHA) and cur == _DIGIT)
                          or (last == _DIGIT and (cur & _ALPHA))):
        return False
    return True


def _subwords(token: str, split_case: bool, split_num: bool,
              possessive: bool):
    """(start, end) spans of the subwords + the trimmed bounds."""
    n = len(token)
    types = [_ctype(c) for c in token]
    sb = 0
    while sb < n and types[sb] == _DELIM:
        sb += 1
    eb = n
    while eb > sb and types[eb - 1] == _DELIM:
        eb -= 1

    def ends_possessive(pos: int) -> bool:
        # endsWithPossessive: "...X's" with X alpha, at a subword end
        return (possessive and pos > 2 and token[pos - 2] == "'"
                and token[pos - 1] in ("s", "S")
                and (types[pos - 3] & _ALPHA) != 0
                and (pos == eb or types[pos] == _DELIM))

    parts = []
    cur = sb
    skip_poss = False
    while cur < eb:
        if skip_poss:
            cur += 2
            skip_poss = False
        last = 0
        while cur < eb and (last := types[cur]) == _DELIM:
            cur += 1
        if cur >= eb:
            break
        end = cur + 1
        while end < eb:
            t = types[end]
            if _is_break(last, t, split_case, split_num):
                break
            last = t
            end += 1
        if end < eb - 1 and ends_possessive(end + 2):
            skip_poss = True
        parts.append((cur, end))
        cur = end
    has_final_possessive = ends_possessive(eb)
    return parts, sb, eb, has_final_possessive


def wdgf_token(token: str, flags: int = DEFAULT_FLAGS,
               protected: frozenset = frozenset()):
    """Emit list for one input token: ``(entries, n_positions)`` where
    entries are ``(term, rel_pos)`` in the reference's emission order and
    ``n_positions`` is how many positions the token consumes (0 = the
    token is swallowed, leaving a hole)."""
    if not (flags & GENERATE_WORD_PARTS) or not (flags
                                                 & GENERATE_NUMBER_PARTS):
        raise ValueError("subset: GENERATE_WORD_PARTS and "
                         "GENERATE_NUMBER_PARTS must both be set")
    split_case = bool(flags & SPLIT_ON_CASE_CHANGE)
    split_num = bool(flags & SPLIT_ON_NUMERICS)
    possessive = bool(flags & STEM_ENGLISH_POSSESSIVE)
    n = len(token)
    if n == 0:
        return [], 0
    parts, sb, eb, final_poss = _subwords(token, split_case, split_num,
                                          possessive)
    # fast path: no delimiters and no internal breaks -> token unchanged
    # (WordDelimiterGraphFilter.java:367-372, incl. protected words)
    if len(parts) == 1 and parts[0] == (0, n):
        return [(token, 0)], 1
    if token in protected:
        return [(token, 0)], 1
    if not parts:
        # all delimiters: swallowed (hole), unless preserved
        if flags & PRESERVE_ORIGINAL:
            return [(token, 0)], 1
        return [], 0
    # isSingleWord (WordDelimiterIterator:251-258): one subword spanning
    # the trimmed bounds (minus a final possessive) -> part only, no
    # catenations, but PRESERVE_ORIGINAL still buffers the original
    single = (len(parts) == 1 and parts[0][0] == sb
              and parts[0][1] == (eb - 2 if final_poss else eb))
    buffered = []            # (start_off, end_off, term, rel_pos)
    if flags & PRESERVE_ORIGINAL:
        buffered.append((-1, n + 1, token, 0))   # sorts first
    if single:
        s, e = parts[0]
        buffered.append((s, e, token[s:e], 0))
        n_pos = 1
    else:
        word_pos = 0
        concat = []          # [(start_off, end_off, rel_pos, type)]
        concat_type = 0
        last_concat_count = 0

        def flush_concat(buf):
            nonlocal last_concat_count
            last_concat_count = len(buf)
            if len(buf) != 1:
                s0, _, rel0, _ = buf[0]
                _, e1, _, _ = buf[-1]
                term = "".join(token[s:e] for s, e, _, _ in buf)
                buffered.append((s0, e1, term, rel0))

        cat_all = []
        for (s, e) in parts:
            wtype = _DIGIT if _ctype(token[s]) == _DIGIT else _ALPHA
            if concat and not (concat_type & wtype):
                flush_concat(concat)
                concat = []
            want_cat = ((flags & CATENATE_WORDS) and wtype == _ALPHA) or \
                       ((flags & CATENATE_NUMBERS) and wtype == _DIGIT)
            if want_cat:
                if not concat:
                    concat_type = wtype
                concat.append((s, e, word_pos, wtype))
            if flags & CATENATE_ALL:
                cat_all.append((s, e, word_pos, wtype))
            buffered.append((s, e, token[s:e], word_pos))
            word_pos += 1
        if concat:
            flush_concat(concat)
        if cat_all and len(cat_all) > last_concat_count:
            s0, _, rel0, _ = cat_all[0]
            _, e1, _, _ = cat_all[-1]
            buffered.append((s0, e1,
                             "".join(token[s:e] for s, e, _, _ in cat_all),
                             rel0))
        n_pos = word_pos
    # PositionSorter: start offset asc, end offset desc (original first
    # via its -1 sentinel start)
    head = buffered[:1] if (flags & PRESERVE_ORIGINAL) else []
    tail = buffered[1:] if (flags & PRESERVE_ORIGINAL) else buffered
    tail.sort(key=lambda b: (b[0], -b[1]))
    return [(term, rel) for _, _, term, rel in head + tail], n_pos


def expand_worddelim_batch(doc_idx, terms, positions, n_docs: int,
                           flags: int = DEFAULT_FLAGS,
                           protected: frozenset = frozenset()):
    """WordDelimiterGraphFilter over an analyzed token stream.

    Unlike the overlap-only expansions, this filter INSERTS positions
    (each subword takes its own), so downstream absolute positions are
    renumbered: token *i*'s first part lands at
    ``sum(deltas[..i]) - 1 + sum(extra_positions of j < i)`` where
    ``delta`` preserves input gaps (holes stay holes,
    ``WordDelimiterGraphFilter.java:375`` swallow case included).

    Returns ``(doc_idx, terms, positions, lengths, overlaps)`` —
    ``lengths`` counts positions consumed (parts; the discounted norm),
    ``overlaps`` the posInc-0 surplus (catenations + preserved
    originals)."""
    total = len(terms)
    if total == 0:
        z = np.zeros(n_docs, np.int64)
        return doc_idx, terms, positions, z, z.copy()
    codes, uniq = pd.factorize(terms)
    entry_lists = []
    k_u = np.zeros(len(uniq), np.int64)
    for j, u in enumerate(uniq):
        entries, k = wdgf_token(u, flags, protected)
        entry_lists.append(entries)
        k_u[j] = k
    emis_u = np.fromiter((len(e) for e in entry_lists), np.int64,
                         count=len(uniq))
    flat_terms = np.empty(int(emis_u.sum()), dtype=object)
    flat_rels = np.empty(int(emis_u.sum()), dtype=np.int64)
    offs_u = np.zeros(len(uniq), np.int64)
    i = 0
    for j, entries in enumerate(entry_lists):
        offs_u[j] = i
        for term, rel in entries:
            flat_terms[i] = term
            flat_rels[i] = rel
            i += 1

    k_tok = k_u[codes]
    # per-token input deltas (gaps preserved); doc boundaries via doc_idx
    doc_start = np.empty(total, dtype=bool)
    doc_start[0] = True
    doc_start[1:] = doc_idx[1:] != doc_idx[:-1]
    delta = np.empty(total, dtype=np.int64)
    delta[doc_start] = positions[doc_start] + 1
    ns = ~doc_start
    delta[ns] = positions[ns] - positions[np.nonzero(ns)[0] - 1]
    extra = np.where(k_tok > 0, k_tok - 1, 0)
    cs_delta = np.cumsum(delta)
    ecs_extra = np.concatenate(([0], np.cumsum(extra)[:-1]))
    start_ix = np.nonzero(doc_start)[0]
    seg_of = np.repeat(np.arange(len(start_ix)),
                       np.diff(np.concatenate((start_ix, [total]))))
    base_delta = (cs_delta[start_ix] - delta[start_ix])[seg_of]
    base_extra = ecs_extra[start_ix][seg_of]
    first_pos = cs_delta - base_delta - 1 + (ecs_extra - base_extra)

    cnts = emis_u[codes]
    out_total = int(cnts.sum())
    starts_out = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    gather = (np.arange(out_total, dtype=np.int64)
              - np.repeat(starts_out, cnts)
              + np.repeat(offs_u[codes], cnts))
    out_terms = flat_terms[gather]
    out_pos = np.repeat(first_pos, cnts) + flat_rels[gather]
    out_doc = np.repeat(doc_idx, cnts)
    lengths = np.bincount(doc_idx, weights=k_tok,
                          minlength=n_docs).astype(np.int64)
    emitted = np.bincount(out_doc, minlength=n_docs).astype(np.int64)
    return out_doc, out_terms, out_pos, lengths, emitted - lengths
