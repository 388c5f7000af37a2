"""MinHashFilter — index-time MinHash tokens for Jaccard search.

Reference: ``analysis/common/.../minhash/MinHashFilter.java`` — the
whole token stream (canonically 5-word shingles) collapses into a set
of MinHash tokens: each input token's 128-bit MurmurHash3 x64 variant
(over UTF-16LE bytes, the reference's embedded implementation of the
public Appleby algorithm) is re-hashed per hash index via
``combineOrdered`` with murmur(int32_be(i)), routed to
``(val2 >>> 32) / bucketSize`` of ``bucket_count`` buckets, and each
bucket keeps the ``hash_set_size`` unsigned-smallest pairs. With
rotation (and set size 1) empty buckets borrow the next non-empty
bucket's minimum — keeping every document the same number of tokens so
index-level Jaccard estimates stay unbiased. Emission encodes each
surviving pair as 8 UTF-16 code units (hash-index prefix chars when
hash_count > 1), all at one position (posInc 1 then 0 — overlays).

Everything is pinned to the reference's own test vectors
(``TestMinHashFilter``): the two murmur goldens and the exact emitted
token strings for (1,1,100), (2,1,1) and the 512-bucket rotation case.

Indexed through ``build_index(min_hash=(k, hash_count, bucket_count,
hash_set_size, with_rotation))`` where ``k`` is the shingle width
(space-joined k-grams of the analyzed stream, the reference pipeline's
ShingleFilter with outputUnigrams=false); searching shared MinHash
tokens approximates Jaccard similarity through the ordinary inverted
index (the module's LSH-for-search purpose, complementing
``pipeline/dedup.py``'s dedup-oriented MinHash+LSH).
"""

from __future__ import annotations

import numpy as np

__all__ = ["murmur3_x64_128", "min_hash_tokens", "expand_minhash_batch"]

_M = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & _M
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & _M
    h ^= h >> 33
    return h


def murmur3_x64_128(key: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3 x64 128 (Appleby's public algorithm, matching the
    reference's embedded copy). Returns (val1, val2) as SIGNED 64-bit
    ints — Java long semantics."""
    length = len(key)
    h1 = seed & 0xFFFFFFFF
    h2 = seed & 0xFFFFFFFF
    rounded = length & ~15
    for i in range(0, rounded, 16):
        k1 = int.from_bytes(key[i:i + 8], "little")
        k2 = int.from_bytes(key[i + 8:i + 16], "little")
        k1 = (k1 * _C1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M
        h1 = (h1 * 5 + 0x52DCE729) & _M
        k2 = (k2 * _C2) & _M
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M
        h2 = (h2 * 5 + 0x38495AB5) & _M
    tail = key[rounded:]
    if tail:
        k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
        k2 = int.from_bytes(tail[8:].ljust(8, b"\0"), "little")
        if len(tail) > 8:
            k2 = (k2 * _C2) & _M
            k2 = _rotl(k2, 33)
            k2 = (k2 * _C1) & _M
            h2 ^= k2
        k1 = (k1 * _C1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M

    def _signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v
    return _signed(h1), _signed(h2)


def _int_hash(i: int) -> tuple[int, int]:
    return murmur3_x64_128(i.to_bytes(4, "big", signed=True))


def _combine(a: tuple[int, int], b: tuple[int, int]) -> tuple[int, int]:
    # combineOrdered over (0,0) then a then b: result = a*37 + b
    def _w(x):
        x &= _M
        return x - (1 << 64) if x >= (1 << 63) else x
    return _w(a[0] * 37 + b[0]), _w(a[1] * 37 + b[1])


def _unsigned_key(pair: tuple[int, int]) -> tuple[int, int]:
    # LongPair.compareTo: unsigned val2, then unsigned val1
    return (pair[1] & _M, pair[0] & _M)


def _chars(x: int, n: int, start_shift: int) -> list[str]:
    return [chr((x >> (start_shift - 16 * k)) & 0xFFFF) for k in range(n)]


def min_hash_tokens(tokens, hash_count: int = 1, bucket_count: int = 512,
                    hash_set_size: int = 1,
                    with_rotation: bool | None = None) -> list[str]:
    """The filter's end-of-stream emission for one document's token
    stream, in the reference's (hash asc, bucket asc, set asc) order."""
    if with_rotation is None:
        with_rotation = bucket_count > 1  # MinHashFilterFactory default
    bucket_size = ((1 << 32) // bucket_count
                   + (1 if (1 << 32) % bucket_count else 0))
    int_hashes = [_int_hash(i) for i in range(hash_count)]
    sets: list[list[list]] = [[[] for _ in range(bucket_count)]
                              for _ in range(hash_count)]
    for tok in tokens:
        base = murmur3_x64_128(tok.encode("utf-16-le"))
        for i in range(hash_count):
            re = _combine(base, int_hashes[i])
            bucket = ((re[1] & _M) >> 32) // bucket_size
            s = sets[i][int(bucket)]
            key = _unsigned_key(re)
            if any(k == key for k, _ in s):
                continue  # TreeSet: duplicates rejected
            if len(s) >= hash_set_size:
                worst = max(s)
                if key >= worst[0]:
                    continue
                s.remove(worst)
            s.append((key, re))
    if with_rotation and hash_set_size == 1:
        for i in range(hash_count):
            row = sets[i]
            for b in range(bucket_count):
                if not row[b]:
                    for off in range(1, bucket_count):
                        src = row[(b + off) % bucket_count]
                        if src:
                            row[b] = [min(src)]
                            break
    out: list[str] = []
    for i in range(hash_count):
        for b in range(bucket_count):
            for _, pair in sorted(sets[i][b]):
                t = []
                if hash_count > 1:
                    t.extend(_chars(i & 0xFFFFFFFF, 2, 16))
                t.extend(_chars(pair[1] & _M, 4, 48))  # high = val2
                if hash_count > 1:
                    t.extend(_chars(pair[0] & _M, 2, 48))  # long0,long1(low)
                else:
                    t.extend(_chars(pair[0] & _M, 4, 48))
                out.append("".join(t))
    return out


def token_hex(token: str) -> str:
    """Storage encoding: the reference's token chars are raw 16-bit
    groups and routinely land in the surrogate range — legal as Java
    index terms (byte arrays) but NOT valid UTF-8 for our parquet
    dictionary. Each char maps to 4 hex digits (bijective, order-
    preserving), so the indexed term is the same identity in a
    UTF-8-safe transport form."""
    return "".join(format(ord(c), "04x") for c in token)


def expand_minhash_batch(doc_idx, terms, positions, n_docs, k: int,
                         hash_count: int, bucket_count: int,
                         hash_set_size: int, with_rotation):
    """Per-doc: space-joined k-shingles of the analyzed stream →
    MinHash tokens (hex transport form, :func:`token_hex`), all at
    position 0 (posInc 1 then 0 — overlays discounted from norms but
    counted in sumTotalTermFreq)."""
    out_d, out_t = [], []
    lengths = np.zeros(n_docs, dtype=np.int64)
    overlaps = np.zeros(n_docs, dtype=np.int64)
    if len(terms):
        order = np.lexsort((positions, doc_idx))
        d_s, t_s = doc_idx[order], terms[order]
        bounds = np.concatenate(
            ([0], np.flatnonzero(np.diff(d_s)) + 1, [len(d_s)]))
        for a, b in zip(bounds[:-1], bounds[1:]):
            doc = int(d_s[a])
            toks = list(t_s[a:b])
            shingles = [" ".join(toks[j:j + k])
                        for j in range(len(toks) - k + 1)]
            if not shingles:
                continue
            hashes = [token_hex(t) for t in
                      min_hash_tokens(shingles, hash_count, bucket_count,
                                      hash_set_size, with_rotation)]
            out_d.append(np.full(len(hashes), doc, dtype=np.int64))
            out_t.append(np.array(hashes, dtype=object))
            lengths[doc] = 1                    # first token posInc=1
            overlaps[doc] = len(hashes) - 1     # the rest overlay
    if not out_d:
        return (np.zeros(0, np.int64), np.zeros(0, dtype=object),
                np.zeros(0, np.int64), lengths, overlaps)
    new_d = np.concatenate(out_d)
    new_t = np.concatenate(out_t)
    return (new_d, new_t, np.zeros(len(new_d), np.int64), lengths,
            overlaps)
