"""CJK analysis chain: width folding + bigramming (CJKAnalyzer parity).

Mirrors the reference chain (``analysis/common/.../cjk/CJKAnalyzer.java``:
StandardTokenizer → CJKWidthFilter → LowerCaseFilter → CJKBigramFilter →
StopFilter):

  * the CJK-aware tokenizer emits Han ideographs and Hiragana as
    single-codepoint tokens, Katakana as runs, and keeps Hangul inside
    the word-character class (UAX#29 ALetter) so mixed Hangul+Latin
    tokens stay ALPHANUM and are NOT bigrammed — exactly the
    StandardTokenizer behavior the CJKBigramFilter javadoc documents
    (``cjk/CJKBigramFilter.java:44-50``; grammar
    ``standard/StandardTokenizerImpl.jflex:87-95,220-279``). Script
    classes are a documented subset of the full Unicode property sets
    (main BMP blocks + Han supplementary planes); golden tests pin the
    reference test corpus.
  * CJKWidthFilter (``cjk/CJKWidthFilter.java:46-120``): fullwidth
    ASCII → basic latin (−0xFEE0); halfwidth katakana → standard kana
    via the KANA_NORM table, with halfwidth voiced/semi-voiced marks
    (U+FF9E/U+FF9F) combined into the preceding kana through the
    KANA_COMBINE tables when combinable, else mapped to the combining
    marks U+3099/U+309A.
  * CJKBigramFilter (``cjk/CJKBigramFilter.java:150-235``): contiguous
    (offset-aligned) codepoints of the enabled scripts form bigrams;
    a lone CJK codepoint is emitted as a unigram; non-CJK (and
    disabled-script) tokens pass through unchanged. With
    ``output_unigrams`` the stream is A, AB, B, BC, C where bigrams are
    posInc=0 overlaps spanning two positions (flushBigram sets
    posIncrement 0 / positionLength 2).
  * StopFilter last, position gaps kept (``analysis/StopFilter.java``);
    the default stop set is the CJKAnalyzer ``stopwords.txt`` list.

Everything is plain-Python token work (no per-row Spark UDFs — the batch
entry point runs inside the same Arrow-batched ``mapInPandas`` kernel as
the standard analyzer). Bigrams are position-dependent so there is no
vocabulary-level shortcut like the stemmer chains use; the documented
cost is per-token Python on CJK fields only.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .analysis import MAX_TOKEN_LENGTH

#: CJKBigramFilter script flags (cjk/CJKBigramFilter.java:55-62)
HAN = 1
HIRAGANA = 2
KATAKANA = 4
HANGUL = 8
ALL_CJK = HAN | HIRAGANA | KATAKANA | HANGUL

#: CJKAnalyzer default stop set (resources/.../cjk/stopwords.txt):
#: the classic English list + 's', 't', 'www'
CJK_STOP_WORDS = frozenset(
    "a and are as at be but by for if in into is it no not of on or s such "
    "t that the their then there these they this to was will with www"
    .split())

# --- script classes (documented subsets, see module docstring) ---------
_HAN = ("㐀-䶿一-鿿豈-龎"
        "\U00020000-\U0002a6df\U0002a700-\U0002ebef\U0002f800-\U0002fa1f")
_HIRA = "ぁ-ゖゝゞ"
#: katakana runs include the prolonged-sound marks (U+30FC / U+FF70) and
#: the halfwidth forms incl. voiced marks U+FF9E/U+FF9F (WB: they extend
#: the preceding kana run)
_KATA = "ァ-ヺー-ヿㇰ-ㇿｦ-ｰｱ-ﾟ"
_HANGUL = "ᄀ-ᇿ㄰-㆏가-힣"
_CJK_ALL = _HAN + _HIRA + _KATA

#: word chars excluding the carved-out CJK scripts (Hangul stays in)
_W = rf"(?:(?![{_CJK_ALL}])\w)"
_WSTART = rf"(?:(?![{_CJK_ALL}\d])\w)"

#: number | katakana run | hiragana single | han single | word
CJK_TOKEN_PATTERN = (
    rf"(?P<num>\d{_W}*(?:[.,]\d{_W}*)*)"
    rf"|(?P<kata>[{_KATA}]+)"
    rf"|(?P<hira>[{_HIRA}])"
    rf"|(?P<han>[{_HAN}])"
    rf"|(?P<word>{_WSTART}{_W}*(?:['’]{_W}+)*)"
)
_CJK_TOKEN_RE = re.compile(CJK_TOKEN_PATTERN, re.UNICODE)
_HANGUL_RE = re.compile(rf"[{_HANGUL}]+\Z")

_GROUP_FLAG = {"kata": KATAKANA, "hira": HIRAGANA, "han": HAN}

# --- CJKWidthFilter tables (cjk/CJKWidthFilter.java:46-120) -------------
_KANA_NORM = [
    0x30fb, 0x30f2, 0x30a1, 0x30a3, 0x30a5, 0x30a7, 0x30a9, 0x30e3, 0x30e5,
    0x30e7, 0x30c3, 0x30fc, 0x30a2, 0x30a4, 0x30a6, 0x30a8, 0x30aa, 0x30ab,
    0x30ad, 0x30af, 0x30b1, 0x30b3, 0x30b5, 0x30b7, 0x30b9, 0x30bb, 0x30bd,
    0x30bf, 0x30c1, 0x30c4, 0x30c6, 0x30c8, 0x30ca, 0x30cb, 0x30cc, 0x30cd,
    0x30ce, 0x30cf, 0x30d2, 0x30d5, 0x30d8, 0x30db, 0x30de, 0x30df, 0x30e0,
    0x30e1, 0x30e2, 0x30e4, 0x30e6, 0x30e8, 0x30e9, 0x30ea, 0x30eb, 0x30ec,
    0x30ed, 0x30ef, 0x30f3, 0x3099, 0x309a,
]
_KANA_COMBINE_VOICED = [
    78, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0,
    1, 0, 1, 0, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1, 0,
    0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 8, 8, 8, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1,
]
_KANA_COMBINE_HALF_VOICED = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 2, 0,
    0, 2, 0, 0, 2, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
]

_WIDTH_RE = re.compile("[！-～･-ﾟ]")


def cjk_width_fold(s: str) -> str:
    """CJKWidthFilter: fullwidth ASCII → latin, halfwidth kana →
    standard kana with voiced-mark combination (in stream order, so a
    mark combines with the already-folded preceding kana)."""
    if not _WIDTH_RE.search(s):
        return s
    out: list[str] = []
    for ch in s:
        o = ord(ch)
        if 0xFF01 <= o <= 0xFF5E:
            out.append(chr(o - 0xFEE0))
        elif 0xFF65 <= o <= 0xFF9F:
            if o >= 0xFF9E and out:
                prev = ord(out[-1])
                if 0x30A6 <= prev <= 0x30FD:
                    d = (_KANA_COMBINE_HALF_VOICED[prev - 0x30A6]
                         if o == 0xFF9F
                         else _KANA_COMBINE_VOICED[prev - 0x30A6])
                    if d:
                        out[-1] = chr(prev + d)
                        continue
            out.append(chr(_KANA_NORM[o - 0xFF65]))
        else:
            out.append(ch)
    return "".join(out)


def tokenize_cjk(text: str):
    """CJK-aware standard tokenization: yields (raw, start, end, flag)
    where flag is the script bigram flag (HAN/HIRAGANA/KATAKANA/HANGUL)
    or 0 for pass-through tokens (ALPHANUM/NUM). Longest-match Hangul
    semantics come from post-classification: a word token that is pure
    Hangul gets the HANGUL flag, a mixed one stays ALPHANUM (flag 0)."""
    for m in _CJK_TOKEN_RE.finditer(text or ""):
        g = m.lastgroup
        flag = _GROUP_FLAG.get(g, 0)
        raw = m.group()
        if g == "word" and _HANGUL_RE.match(raw):
            flag = HANGUL
        yield raw, m.start(), m.end(), flag


def cjk_bigram_stream(tokens, flags: int = ALL_CJK,
                      output_unigrams: bool = False):
    """CJKBigramFilter over a (term, start, end, flag) stream. Yields
    (term, posinc) pairs; ``term is None`` marks a skipped-overlong
    position gap. Terms arriving here are already width-folded and
    lowercased (the reference chain order). Buffered codepoints of
    enabled scripts bigram across token boundaries only when offsets
    are contiguous (``CJKBigramFilter.java:refill/lastEndOffset``)."""
    out: list = []
    buf: list[str] = []
    last_end = -1

    def flush():
        n = len(buf)
        if n == 1:
            out.append((buf[0], 1))
        elif n >= 2:
            if output_unigrams:
                # A, AB(posInc 0), B, BC(posInc 0), C — flushBigram sets
                # posIncrement 0 when unigrams are also output
                for i in range(n):
                    out.append((buf[i], 1))
                    if i + 1 < n:
                        out.append((buf[i] + buf[i + 1], 0))
            else:
                for i in range(n - 1):
                    out.append((buf[i] + buf[i + 1], 1))
        buf.clear()

    for term, start, end, flag in tokens:
        if flag and (flags & flag):
            if buf and start != last_end:
                flush()
            buf.extend(term)
            last_end = end
        else:
            flush()
            out.append((term, 1))
    flush()
    return out


def cjk_analyze_text(text: str,
                     stopwords: frozenset = CJK_STOP_WORDS,
                     flags: int = ALL_CJK,
                     output_unigrams: bool = False,
                     max_token_length: int = MAX_TOKEN_LENGTH):
    """Full CJKAnalyzer chain for one string. Returns
    (terms, positions, length, overlaps): surviving terms with their
    positions (stop/overlong gaps kept), the norm length (posInc>0
    survivors) and the overlap count (posInc==0 survivors — nonzero
    only with ``output_unigrams``)."""
    toks = []
    for raw, start, end, flag in tokenize_cjk(text):
        if len(raw) > max_token_length:
            # tokenizer-level skip-and-count (StandardTokenizer:156-166):
            # drop BEFORE the bigram filter; the offset gap flushes the
            # bigram buffer, the position is consumed
            toks.append((None, start, end, 0))
            continue
        low = cjk_width_fold(raw).lower()
        toks.append((low, start, end, flag))
    terms: list[str] = []
    positions: list[int] = []
    pos = -1
    overlaps = 0
    for term, posinc in cjk_bigram_stream(toks, flags, output_unigrams):
        pos += posinc
        if term is None or term in stopwords:
            continue
        terms.append(term)
        positions.append(pos)
        if posinc == 0:
            overlaps += 1
    return terms, positions, len(terms) - overlaps, overlaps


def cjk_analyze_batch(texts: pd.Series,
                      stopwords: frozenset = CJK_STOP_WORDS,
                      flags: int = ALL_CJK,
                      output_unigrams: bool = False,
                      max_token_length: int = MAX_TOKEN_LENGTH):
    """Batch CJK analysis with the same output contract as
    ``analyze_batch`` plus the overlap counts:
    (doc_idx, terms, positions, lengths, overlaps)."""
    vals = texts.to_numpy(dtype=object)
    n_docs = len(vals)
    doc_idx_parts: list[np.ndarray] = []
    term_parts: list[list] = []
    pos_parts: list[list] = []
    lengths = np.zeros(n_docs, np.int64)
    overlaps = np.zeros(n_docs, np.int64)
    for i, s in enumerate(vals):
        if not isinstance(s, str) or not s:
            continue
        t, p, ln, ov = cjk_analyze_text(s, stopwords, flags,
                                        output_unigrams, max_token_length)
        if t:
            doc_idx_parts.append(np.full(len(t), i, np.int64))
            term_parts.append(t)
            pos_parts.append(p)
        lengths[i] = ln
        overlaps[i] = ov
    if not term_parts:
        return (np.empty(0, np.int64), np.empty(0, dtype=object),
                np.empty(0, np.int64), lengths, overlaps)
    doc_idx = np.concatenate(doc_idx_parts)
    terms = np.array([t for part in term_parts for t in part], dtype=object)
    positions = np.array([p for part in pos_parts for p in part], np.int64)
    return doc_idx, terms, positions, lengths, overlaps
