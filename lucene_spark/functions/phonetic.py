"""Phonetic encoders + PhoneticFilter overlay semantics.

Reference: ``lucene/analysis/phonetic/.../PhoneticFilter.java`` — a
token filter wrapping a commons-codec phonetic ``Encoder``. With
``inject=true`` the encoded form is emitted as a posInc=0 overlay
alongside the original (only when the encoding is non-empty and differs
from the term); with ``inject=false`` it replaces the term. Encoders
here re-implement the PUBLIC algorithms the reference delegates to
commons-codec for, pinned to the reference test vectors
(``TestPhoneticFilter.testAlgorithms``):

  * :func:`soundex` — American Soundex, commons-codec semantics
    including the H/W look-back rule and the quirk that a (char)0
    mapping code terminates encoding early.
  * :func:`refined_soundex` — first letter + every collapsed code digit
    (no length cap, '0' digits kept).
  * :func:`caverphone2` — Caverphone 2.0 (David Hood, University of
    Otago, 2004): the published ordered replacement cascade padded to
    10 with '1'.
  * :func:`nysiis` — the New York State Identification and Intelligence
    System code, commons-codec rule order (strict = 6-char truncation).

Tokens that clean to nothing (no ASCII letters) or fail to encode
produce no phonetic form — the reference filter swallows encoder
exceptions and passes the token through.

DoubleMetaphone / Metaphone / Beider-Morse / Daitch-Mokotoff are out of
scope (SURVEY §9): their rule tables are large and the reference's test
vectors pin too little of them to claim parity.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

__all__ = [
    "soundex",
    "refined_soundex",
    "caverphone2",
    "nysiis",
    "ENCODERS",
    "expand_phonetic_batch",
    "replace_phonetic_batch",
]

_NON_ALPHA = re.compile(r"[^A-Z]")

#: A..Z -> soundex digit (commons-codec US_ENGLISH_MAPPING)
_SOUNDEX_MAP = "01230120022455012623010202"
#: A..Z -> refined soundex digit (US_ENGLISH_MAPPING_STRING)
_REFINED_MAP = "01360240043788015936020505"


def _clean(value: str) -> str:
    return _NON_ALPHA.sub("", value.upper())


def soundex(value: str) -> str:
    """American Soundex, commons-codec Soundex.US_ENGLISH behavior:
    H and W are skipped entirely WITHOUT resetting the last digit (so
    same-code consonants across an intervening H/W collapse — Ashcraft
    → A261), while vowels reset it (Tymczak → T522)."""
    s = _clean(value)
    if not s:
        return s
    out = [s[0]]
    last = _SOUNDEX_MAP[ord(s[0]) - 65]
    for ch in s[1:]:
        if len(out) >= 4:
            break
        if ch == "H" or ch == "W":
            continue  # silent: ignored, last digit unchanged
        digit = _SOUNDEX_MAP[ord(ch) - 65]
        if digit != "0" and digit != last:
            out.append(digit)
        last = digit
    return "".join(out).ljust(4, "0")


def refined_soundex(value: str) -> str:
    """commons-codec RefinedSoundex: first letter, then every code digit
    with consecutive duplicates collapsed — zeros kept, no cap."""
    s = _clean(value)
    if not s:
        return s
    out = [s[0]]
    last = None
    for ch in s:
        code = _REFINED_MAP[ord(ch) - 65]
        if code != last:
            out.append(code)
            last = code
    return "".join(out)


#: Caverphone 2.0 replacement cascade (Hood 2004), applied in order.
_CAVERPHONE2_RULES: tuple = (
    ("e$", ""),
    ("^cough", "cou2f"), ("^rough", "rou2f"), ("^tough", "tou2f"),
    ("^enough", "enou2f"), ("^trough", "trou2f"), ("^gn", "2n"),
    ("mb$", "m2"),
    ("cq", "2q"), ("ci", "si"), ("ce", "se"), ("cy", "sy"),
    ("tch", "2ch"), ("c", "k"), ("q", "k"), ("x", "k"), ("v", "f"),
    ("dg", "2g"), ("tio", "sio"), ("tia", "sia"), ("d", "t"),
    ("ph", "fh"), ("b", "p"), ("sh", "s2"), ("z", "s"),
    ("^[aeiou]", "A"), ("[aeiou]", "3"),
    ("j", "y"), ("^y3", "Y3"), ("^y", "A"), ("y", "3"),
    ("3gh3", "3kh3"), ("gh", "22"), ("g", "k"),
    ("s+", "S"), ("t+", "T"), ("p+", "P"), ("k+", "K"), ("f+", "F"),
    ("m+", "M"), ("n+", "N"),
    ("w3", "W3"), ("wh3", "Wh3"), ("w$", "3"), ("w", "2"),
    ("^h", "A"), ("h", "2"),
    ("r3", "R3"), ("r$", "3"), ("r", "2"),
    ("l3", "L3"), ("l$", "3"), ("l", "2"),
    ("2", ""), ("3$", "A"), ("3", ""),
)
_CAVERPHONE2_COMPILED = tuple((re.compile(p), r)
                              for p, r in _CAVERPHONE2_RULES)


def caverphone2(value: str) -> str:
    """Caverphone 2.0 — ten-character code padded with '1'."""
    t = re.sub(r"[^a-z]", "", value.lower())
    if not t:
        return t
    for rx, rep in _CAVERPHONE2_COMPILED:
        t = rx.sub(rep, t)
    return (t + "1" * 10)[:10]


_VOWELS = frozenset("AEIOU")


def nysiis(value: str, strict: bool = True) -> str:
    """NYSIIS, commons-codec rule order; ``strict`` truncates to 6."""
    s = _clean(value)
    if not s:
        return s
    # 1. transcode first characters
    if s.startswith("MAC"):
        s = "MCC" + s[3:]
    elif s.startswith("KN"):
        s = "NN" + s[2:]
    elif s.startswith("K"):
        s = "C" + s[1:]
    elif s.startswith(("PH", "PF")):
        s = "FF" + s[2:]
    elif s.startswith("SCH"):
        s = "SSS" + s[3:]
    # 2. transcode last characters
    if s.endswith(("EE", "IE")):
        s = s[:-2] + "Y"
    elif s.endswith(("DT", "RT", "RD", "NT", "ND")):
        s = s[:-2] + "D"
    # 3. first character of key = first character of name
    key = [s[0]]
    chars = list(s)
    i = 1
    while i < len(chars):
        nxt = chars[i + 1] if i + 1 < len(chars) else ""
        curr = chars[i]
        if curr == "E" and nxt == "V":
            chars[i], chars[i + 1] = "A", "F"
        elif curr in _VOWELS:
            chars[i] = "A"
        elif curr == "Q":
            chars[i] = "G"
        elif curr == "Z":
            chars[i] = "S"
        elif curr == "M":
            chars[i] = "N"
        elif curr == "K":
            if nxt == "N":
                chars[i] = "N"
            else:
                chars[i] = "C"
        elif curr == "S" and "".join(chars[i:i + 3]) == "SCH":
            chars[i:i + 3] = ["S", "S", "S"]
        elif curr == "P" and nxt == "H":
            chars[i:i + 2] = ["F", "F"]
        elif curr == "H" and (chars[i - 1] not in _VOWELS
                              or (nxt and nxt not in _VOWELS)):
            chars[i] = chars[i - 1]
        elif curr == "W" and chars[i - 1] in _VOWELS:
            chars[i] = chars[i - 1]
        if chars[i] and chars[i] != key[-1]:
            key.append(chars[i])
        i += 1
    out = "".join(key)
    # 4. trailing-S / AY / trailing-A rules on the key
    if len(out) > 1 and out.endswith("S"):
        out = out[:-1]
    if out.endswith("AY"):
        out = out[:-2] + "Y"
    if len(out) > 1 and out.endswith("A"):
        out = out[:-1]
    return out[:6] if strict else out


ENCODERS = {
    "soundex": soundex,
    "refined_soundex": refined_soundex,
    "caverphone2": caverphone2,
    "nysiis": nysiis,
}


def _encode_unique(uniq, encoder_name: str):
    enc = ENCODERS.get(encoder_name)
    if enc is None:
        raise ValueError(f"unknown phonetic encoder {encoder_name!r}")
    out = []
    for u in uniq:
        try:
            v = enc(u)
        except Exception:   # reference filter swallows encoder errors
            v = None
        # emit only when non-empty and different (PhoneticFilter.java:75)
        out.append(v if v and v != u else None)
    return out


def expand_phonetic_batch(doc_idx, terms, positions, n_docs,
                          encoder_name: str):
    """PhoneticFilter inject=true: phonetic forms as posInc=0 overlays
    at the source position (same graph shape as index-time synonyms;
    the inversion lexsorts so emission order is irrelevant)."""
    overlaps = np.zeros(n_docs, dtype=np.int64)
    if len(terms) == 0:
        return doc_idx, terms, positions, overlaps
    codes, uniq = pd.factorize(terms)
    enc_u = _encode_unique(uniq, encoder_name)
    extra_t, extra_d, extra_p = [], [], []
    for j, v in enumerate(enc_u):
        if v is None:
            continue
        sel = codes == j
        extra_t.append(np.full(int(sel.sum()), v, dtype=object))
        extra_d.append(doc_idx[sel])
        extra_p.append(positions[sel])
    if not extra_t:
        return doc_idx, terms, positions, overlaps
    add_d = np.concatenate(extra_d)
    overlaps = np.bincount(add_d, minlength=n_docs).astype(np.int64)
    return (np.concatenate([doc_idx, add_d]),
            np.concatenate([terms, np.concatenate(extra_t)]),
            np.concatenate([positions, np.concatenate(extra_p)]),
            overlaps)


def replace_phonetic_batch(terms, encoder_name: str):
    """PhoneticFilter inject=false: the encoding replaces the term
    (unchanged when it encodes to itself or fails to encode)."""
    if len(terms) == 0:
        return terms
    codes, uniq = pd.factorize(terms)
    enc_u = _encode_unique(uniq, encoder_name)
    rep = np.array([v if v is not None else u
                    for u, v in zip(uniq, enc_u)], dtype=object)
    return rep[codes]
