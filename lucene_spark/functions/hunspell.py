"""Hunspell dictionary stemming (the HunspellStemFilter subset).

Reference: ``lucene/analysis/common/src/java/org/apache/lucene/analysis/
hunspell/`` — ``Dictionary.java`` (.aff/.dic parsing), ``Stemmer.java``
(affix-stripping stem enumeration), ``AffixCondition.java`` (the
condition compiler with its strip-overlap splitting), and
``HunspellStemFilter.java`` (token-level semantics). This module
re-implements the SIMPLE-WORD stemming path:

* .aff options: FLAG (UTF-8 / long / num), PFX/SFX rules with strip,
  continuation classes, conditions (incl. the strip-overlap split and
  bracket-class regexes with literal dashes), AF flag aliases,
  NEEDAFFIX/PSEUDOROOT, CIRCUMFIX, ONLYINCOMPOUND, FULLSTRIP,
  COMPLEXPREFIXES, IGNORE, ICONV/OCONV, KEEPCASE, CHECKSHARPS,
  LANG (Turkic alternate casing);
* .dic: flag vectors (aliased or literal), ``st:`` morphological stem
  exceptions, hidden title-case entries for MIXED/UPPER words,
  multi-word entries (a space only starts the morph part before an
  ``xx:`` field — Dictionary.morphBoundary);
* stemming: dictionary roots + prefix/suffix stripping with cross
  product, twofold suffixes via continuation classes, prefix+suffix
  interplay (flag checks on either side), circumfix pairing, needaffix
  pseudo-stems, and upper/title case variation (incl. the sharp-s
  expansion and the apostrophe rule).

Also implemented: :class:`HunspellChecker` — Hunspell.java
``spell()`` INCLUDING compounds: FORBIDDENWORD/KEEPCASE gating with
the sharp-s title exception and the abort-on-case-reject processor
contract, number tolerance, trailing dots, case variation with
null-case sharp-s variants, BREAK recursion (default '-' table), the
COMPOUNDFLAG/BEGIN/MIDDLE/END part walk with per-context affix/root
gating (COMPOUNDPERMITFLAG/COMPOUNDFORBIDFLAG/ONLYINCOMPOUND),
COMPOUNDRULE flag-pattern matching (*/? over homonym flag sets),
CHECKCOMPOUNDCASE/DUP/TRIPLE + SIMPLIFIEDTRIPLE junction rules,
CHECKCOMPOUNDREP (REP-table misspelling probes), CHECKCOMPOUNDPATTERN
(incl. replacement expansion and the '0'-root anchors), FORCEUCASE,
COMPOUNDMIN/COMPOUNDWORDMAX, and the space-separated-pair rejection.
Out of scope (documented): the suggesters.

Verification: every reference ``StemmerTestBase`` expectation is
transcoded mechanically from the reference test sources + fixture
dictionaries by ``tools/gen_hunspell_goldens.py`` into
``tests/data/hunspell/cases.json`` and replayed exactly (multiplicity
included) by ``tests/test_hunspell.py``.
"""

from __future__ import annotations

import re
from functools import lru_cache

import numpy as np
import pandas as pd

__all__ = ["HunspellDictionary", "HunspellStemmer", "HunspellChecker",
           "hunspell_stem_batch"]

FLAG_UNSET = "\x00"
HIDDEN_FLAG = chr(65511)     # Hunspell's ONLYUPCASEFLAG


class _StopStem(Exception):
    """RootProcessor returned False — abandon the whole stem search."""


# ---------------------------------------------------------------------------
# flag parsing strategies (Dictionary.FlagParsingStrategy)
# ---------------------------------------------------------------------------

def _parse_flags_simple(raw: str) -> tuple:
    return tuple(raw)


def _parse_flags_long(raw: str) -> tuple:
    # pairs of chars become one flag char (packed like the reference:
    # (first << 8) | second), odd trailing char kept as-is
    out = []
    i = 0
    while i + 1 < len(raw):
        out.append(chr((ord(raw[i]) << 8) | (ord(raw[i + 1]) & 0xFF)))
        i += 2
    if i < len(raw):
        out.append(raw[i])
    return tuple(out)


def _parse_flags_num(raw: str) -> tuple:
    out = []
    for part in raw.split(","):
        part = part.strip()
        if part.isdigit():
            out.append(chr(int(part)))
    return tuple(out)


_FLAG_MODES = {
    None: _parse_flags_simple,
    "long": _parse_flags_long,
    "num": _parse_flags_num,
    "UTF-8": _parse_flags_simple,
}


# ---------------------------------------------------------------------------
# affix conditions (AffixCondition.compile)
# ---------------------------------------------------------------------------

def _is_regexp(cond: str) -> bool:
    return "[" in cond or "." in cond or "-" in cond


def _skip_char_pattern(cond: str, pos: int) -> int:
    if cond[pos] == "[":
        pos = cond.index("]", pos + 1)
    return pos + 1


def _count_char_patterns(cond: str) -> int:
    n = 0
    i = 0
    while i < len(cond):
        i = _skip_char_pattern(cond, i)
        n += 1
    return n


def _skip_char_patterns(cond: str, count: int) -> int:
    pos = 0
    for _ in range(count):
        pos = _skip_char_pattern(cond, pos)
    return pos


def _escape_dash(rx: str) -> str:
    if "-" not in rx:
        return rx
    out = []
    i = 0
    while i < len(rx):
        c = rx[i]
        if c == "-":
            out.append("\\-")
        else:
            out.append(c)
            if c == "\\" and i + 1 < len(rx):
                out.append(rx[i + 1])
                i += 1
        i += 1
    return "".join(out)


def _full_match(rx: str, s: str) -> bool:
    try:
        return re.fullmatch(_escape_dash(rx), s) is not None
    except re.error:
        return False


_ALWAYS_TRUE = lambda stem: True       # noqa: E731
_ALWAYS_FALSE = lambda stem: False     # noqa: E731


def compile_condition(kind: str, strip: str, condition: str):
    """AffixCondition.compile: the condition covers strip+stem; the
    strip-covering char patterns are checked against the strip at
    PARSE time, the remainder against the stem's first/last chars."""
    is_suffix = kind == "SFX"
    if condition == ".":
        return _ALWAYS_TRUE
    if not _is_regexp(condition):
        if is_suffix and condition.endswith(strip):
            tail = condition[:len(condition) - len(strip)]
            return (lambda stem, t=tail: stem.endswith(t))
        if not is_suffix and condition.startswith(strip):
            head = condition[len(strip):]
            return (lambda stem, h=head: stem.startswith(h))
        return _ALWAYS_FALSE
    last_bracket = condition.rfind("[")
    if last_bracket >= 0 and "]" not in condition[last_bracket + 1:]:
        condition = condition + "]"     # unclosed [ tolerated
    try:
        cond_chars = _count_char_patterns(condition)
    except ValueError:
        return _ALWAYS_FALSE
    if cond_chars <= len(strip):
        rx = ".*" + condition if not is_suffix else condition + ".*"
        return _ALWAYS_TRUE if _full_match(rx, strip) else _ALWAYS_FALSE
    if not is_suffix:
        split = _skip_char_patterns(condition, len(strip))
        if not _full_match(condition[:split], strip):
            return _ALWAYS_FALSE
        return _regex_condition(is_suffix, condition[split:],
                                cond_chars - len(strip))
    split = _skip_char_patterns(condition, cond_chars - len(strip))
    if not _full_match(condition[split:], strip):
        return _ALWAYS_FALSE
    return _regex_condition(is_suffix, condition[:split],
                            cond_chars - len(strip))


def _regex_condition(is_suffix: bool, condition: str, char_count: int):
    try:
        pat = re.compile(_escape_dash(condition))
    except re.error:
        return _ALWAYS_FALSE

    if is_suffix:
        return (lambda stem, p=pat, n=char_count:
                len(stem) >= n and p.fullmatch(stem, len(stem) - n)
                is not None)
    return (lambda stem, p=pat, n=char_count:
            len(stem) >= n and p.fullmatch(stem[:n]) is not None)


# ---------------------------------------------------------------------------
# dictionary
# ---------------------------------------------------------------------------

class _Affix:
    __slots__ = ("kind", "flag", "strip", "append", "append_flags",
                 "condition", "cross", "aid")

    def __init__(self, kind, flag, strip, append, append_flags,
                 condition, cross, aid):
        self.kind = kind
        self.flag = flag
        self.strip = strip
        self.append = append
        self.append_flags = append_flags   # frozenset of flag chars
        self.condition = condition
        self.cross = cross
        self.aid = aid


def _strip_bom(s: str) -> str:
    return s[1:] if s.startswith("﻿") else s


_CHARSETS = {
    "UTF-8": "utf-8", "ISO8859-1": "latin-1", "ISO8859-2": "iso8859-2",
    "ISO8859-3": "iso8859-3", "ISO8859-4": "iso8859-4",
    "ISO8859-5": "iso8859-5", "ISO8859-6": "iso8859-6",
    "ISO8859-7": "iso8859-7", "ISO8859-8": "iso8859-8",
    "ISO8859-9": "iso8859-9", "ISO8859-10": "iso8859-10",
    "ISO8859-13": "iso8859-13", "ISO8859-15": "iso8859-15",
    "KOI8-R": "koi8-r", "KOI8-U": "koi8-u",
    "microsoft-cp1251": "cp1251", "ISCII-DEVANAGARI": "latin-1",
}


def _charset_of(aff_bytes: bytes) -> str:
    """The .aff's SET declaration picks the charset for BOTH files —
    hunspell's default is ISO8859-1 (the reference Dictionary's initial
    decoder), which is why fixtures without SET aren't UTF-8."""
    for raw in aff_bytes.split(b"\n"):
        s = raw.strip()
        if s.startswith(b"SET"):
            parts = s.split()
            if len(parts) > 1:
                return _CHARSETS.get(
                    parts[1].decode("ascii", "replace"), "latin-1")
            break
    return "latin-1"


def decode_hunspell(data: bytes) -> str:
    return data.decode(_charset_of(data), errors="replace")


def load_hunspell_file(path: str) -> str:
    with open(path, "rb") as f:
        return decode_hunspell(f.read())


class HunspellDictionary:
    """Parsed .aff + .dic pair (SIMPLE-WORD stemming subset)."""

    def __init__(self, aff_text: str, dic_texts, ignore_case=False):
        self.ignore_case = ignore_case
        self.flag_parse = _parse_flags_simple
        self.aliases: list[str] | None = None
        self.prefixes: dict[str, list[_Affix]] = {}
        self.suffixes: dict[str, list[_Affix]] = {}
        self.needaffix = FLAG_UNSET
        self.circumfix = FLAG_UNSET
        self.onlyincompound = FLAG_UNSET
        self.keepcase = FLAG_UNSET
        self.forbiddenword = FLAG_UNSET
        self.compound_flag = FLAG_UNSET
        self.compound_begin = FLAG_UNSET
        self.compound_middle = FLAG_UNSET
        self.compound_end = FLAG_UNSET
        self.compound_permit = FLAG_UNSET
        self.compound_forbid = FLAG_UNSET
        self.force_ucase = FLAG_UNSET
        self.no_suggest = FLAG_UNSET
        self.sub_standard = FLAG_UNSET
        self.try_chars = ""
        self.neighbor_keys = ("qwertyuiop", "asdfghjkl", "zxcvbnm")
        self.enable_split_suggestions = True
        self.max_diff = 5
        self.max_ngram_suggestions = 4
        self.only_max_diff = False
        self.language = None
        #: MAP table: list of alternative lists
        self.map_table: list[list[str]] = []
        self.compound_min = 3
        self.compound_max = 2 ** 31 - 1
        self.check_compound_case = False
        self.check_compound_dup = False
        self.check_compound_rep = False
        self.check_compound_triple = False
        self.simplified_triple = False
        #: COMPOUNDRULE patterns as parsed flag strings (with * and ?)
        self.compound_rules: list[str] = []
        #: CHECKCOMPOUNDPATTERN rows: (end_chars, end_flags,
        #: begin_chars, begin_flags, replacement|None)
        self.check_compound_patterns: list[tuple] = []
        #: REP table rows: (pattern, replacement, must_start, must_end)
        self.rep_table: list[tuple] = []
        #: BREAK table (starting, ending, middle) — hunspell default '-'
        self.breaks = (("-",), ("-",), ("-",))
        self.full_strip = False
        self.complex_prefixes = False
        self.check_sharp_s = False
        self.alternate_casing = False
        self.ignore: str | None = None
        self.iconv: list[tuple[str, str]] | None = None
        self.oconv: list[tuple[str, str]] | None = None
        #: flags appearing in any affix's continuation classes, per kind
        self.second_stage_prefix_flags: set[str] = set()
        self.second_stage_suffix_flags: set[str] = set()
        #: word -> list of (flags frozenset, stem_exception|None)
        self.entries: dict[str, list] = {}
        self.morph_aliases: list[str] | None = None
        self._parse_aff(_strip_bom(aff_text))
        for dic in dic_texts:
            self._parse_dic(_strip_bom(dic))
        # WordStorage.flushGroup: a hidden (title-cased) form is kept
        # only when the word has NO non-hidden form
        for word, forms in self.entries.items():
            if any(HIDDEN_FLAG not in fl for fl, _ in forms):
                forms[:] = [(fl, ex) for fl, ex in forms
                            if HIDDEN_FLAG not in fl]

    # -- .aff ---------------------------------------------------------------
    def _parse_aff(self, text: str):
        lines = text.splitlines()
        i = 0
        n = len(lines)
        seen_conditions: dict[tuple, object] = {}
        aid = 0
        while i < n:
            raw = lines[i]
            i += 1
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            first = parts[0]
            if first == "FLAG" and len(parts) > 1:
                self.flag_parse = _FLAG_MODES.get(parts[1],
                                                  _parse_flags_simple)
            elif first == "AF":
                if self.aliases is None:
                    self.aliases = []
                    self._alias_total = int(parts[1])
                else:
                    self.aliases.append(parts[1] if len(parts) > 1
                                        else "")
            elif first == "AM":
                if self.morph_aliases is None:
                    self.morph_aliases = []
                else:
                    self.morph_aliases.append(
                        " ".join(parts[1:]) if len(parts) > 1 else "")
            elif first == "COMPLEXPREFIXES":
                self.complex_prefixes = True
            elif first == "FULLSTRIP":
                self.full_strip = True
            elif first == "CHECKSHARPS":
                self.check_sharp_s = True
            elif first in ("NEEDAFFIX", "PSEUDOROOT"):
                self.needaffix = self._one_flag(parts)
            elif first == "CIRCUMFIX":
                self.circumfix = self._one_flag(parts)
            elif first == "ONLYINCOMPOUND":
                self.onlyincompound = self._one_flag(parts)
            elif first == "KEEPCASE":
                self.keepcase = self._one_flag(parts)
            elif first == "FORBIDDENWORD":
                self.forbiddenword = self._one_flag(parts)
            elif first == "COMPOUNDFLAG":
                self.compound_flag = self._one_flag(parts)
            elif first == "COMPOUNDBEGIN":
                self.compound_begin = self._one_flag(parts)
            elif first == "COMPOUNDMIDDLE":
                self.compound_middle = self._one_flag(parts)
            elif first in ("COMPOUNDEND", "COMPOUNDLAST"):
                self.compound_end = self._one_flag(parts)
            elif first == "COMPOUNDPERMITFLAG":
                self.compound_permit = self._one_flag(parts)
            elif first == "COMPOUNDFORBIDFLAG":
                self.compound_forbid = self._one_flag(parts)
            elif first == "FORCEUCASE":
                self.force_ucase = self._one_flag(parts)
            elif first == "NOSUGGEST":
                self.no_suggest = self._one_flag(parts)
            elif first == "SUBSTANDARD":
                self.sub_standard = self._one_flag(parts)
            elif first == "TRY":
                self.try_chars = parts[1]
            elif first == "KEY":
                self.neighbor_keys = tuple(parts[1].split("|"))
            elif first == "NOSPLITSUGS":
                self.enable_split_suggestions = False
            elif first == "MAXNGRAMSUGS":
                self.max_ngram_suggestions = int(parts[1])
            elif first == "MAXDIFF":
                v = int(parts[1])
                if 0 <= v <= 10:
                    self.max_diff = v
            elif first == "ONLYMAXDIFF":
                self.only_max_diff = True
            elif first == "MAP":
                count = int(parts[1])
                for _ in range(count):
                    row = lines[i].split()
                    i += 1
                    if len(row) < 2:
                        continue
                    entry, j, s = [], 0, row[1]
                    while j < len(s):
                        if s[j] == "(":
                            close = s.index(")", j)
                            entry.append(s[j + 1:close])
                            j = close + 1
                        else:
                            entry.append(s[j])
                            j += 1
                    self.map_table.append(entry)
            elif first == "COMPOUNDMIN":
                self.compound_min = max(1, int(parts[1]))
            elif first == "COMPOUNDWORDMAX":
                self.compound_max = max(1, int(parts[1]))
            elif first == "CHECKCOMPOUNDCASE":
                self.check_compound_case = True
            elif first == "CHECKCOMPOUNDDUP":
                self.check_compound_dup = True
            elif first == "CHECKCOMPOUNDREP":
                self.check_compound_rep = True
            elif first == "CHECKCOMPOUNDTRIPLE":
                self.check_compound_triple = True
            elif first == "SIMPLIFIEDTRIPLE":
                self.simplified_triple = True
            elif first == "COMPOUNDRULE":
                count = int(parts[1])
                for _ in range(count):
                    row = lines[i].split()
                    i += 1
                    if len(row) > 1:
                        self.compound_rules.append(
                            self._parse_compound_rule(row[1]))
            elif first == "CHECKCOMPOUNDPATTERN":
                count = int(parts[1])
                for _ in range(count):
                    row = lines[i].split()
                    i += 1
                    if len(row) < 3:
                        continue
                    def _split_cf(s):
                        sep = s.find("/")
                        if sep < 0:
                            return s, frozenset()
                        return (s[:sep],
                                frozenset(self.flag_parse(s[sep + 1:])))
                    ec, ef = _split_cf(row[1])
                    bc, bf = _split_cf(row[2])
                    rep = row[3] if len(row) > 3 else None
                    self.check_compound_patterns.append(
                        (ec, ef, bc, bf, rep))
            elif first == "REP":
                count = int(parts[1])
                for _ in range(count):
                    row = lines[i].split()
                    i += 1
                    if len(row) < 3:
                        continue
                    pat, rep = row[1], row[2].replace("_", " ")
                    must_start = pat.startswith("^")
                    must_end = pat.endswith("$")
                    pat = pat[1 if must_start else 0:
                              len(pat) - (1 if must_end else 0)]
                    self.rep_table.append((pat, rep, must_start,
                                           must_end))
            elif first == "BREAK":
                count = int(parts[1])
                starting, ending, middle = [], [], []
                for _ in range(count):
                    row = lines[i].split()
                    i += 1
                    if len(row) < 2:
                        continue
                    b = row[1]
                    if b.startswith("^"):
                        starting.append(b[1:])
                    elif b.endswith("$"):
                        ending.append(b[:-1])
                    else:
                        middle.append(b)
                self.breaks = (tuple(starting), tuple(ending),
                               tuple(middle))
            elif first == "IGNORE":
                self.ignore = parts[1]
            elif first == "LANG":
                lang = parts[1].split("_")[0].lower() if len(parts) > 1 \
                    else ""
                self.language = lang
                self.alternate_casing = lang in ("tr", "az")
            elif first in ("ICONV", "OCONV"):
                count = int(parts[1])
                table = []
                for _ in range(count):
                    row = lines[i].split()
                    i += 1
                    if len(row) >= 3:
                        table.append((row[1], row[2]))
                # longest-pattern-first greedy application
                table.sort(key=lambda kv: -len(kv[0]))
                if first == "ICONV":
                    self.iconv = table
                else:
                    self.oconv = table
            elif first in ("PFX", "SFX") and len(parts) >= 4:
                cross = parts[2] == "Y"
                try:
                    count = int(parts[3])
                except ValueError:
                    continue
                for _ in range(count):
                    rule = lines[i].split()
                    i += 1
                    if len(rule) < 4:
                        continue
                    flag = self._one_flag(rule)
                    strip = "" if rule[2] == "0" else rule[2]
                    affix_arg = rule[3]
                    append_flags = frozenset()
                    slash = affix_arg.rfind("/")
                    if slash != -1:
                        flag_part = affix_arg[slash + 1:]
                        affix_arg = affix_arg[:slash]
                        if self.aliases:
                            flag_part = self.aliases[int(flag_part) - 1]
                        append_flags = frozenset(
                            self.flag_parse(flag_part))
                        target = (self.second_stage_prefix_flags
                                  if first == "PFX"
                                  else self.second_stage_suffix_flags)
                        target.update(append_flags)
                    if affix_arg == "0":
                        affix_arg = ""
                    if self.ignore and any(c in self.ignore
                                           for c in affix_arg):
                        affix_arg = "".join(c for c in affix_arg
                                            if c not in self.ignore)
                    condition = rule[4] if len(rule) > 4 else "."
                    ckey = (first, strip, condition)
                    cond = seen_conditions.get(ckey)
                    if cond is None:
                        cond = compile_condition(first, strip, condition)
                        seen_conditions[ckey] = cond
                    ax = _Affix(first, flag, strip, affix_arg,
                                append_flags, cond, cross, aid)
                    aid += 1
                    target = (self.prefixes if first == "PFX"
                              else self.suffixes)
                    target.setdefault(affix_arg, []).append(ax)

    def _parse_compound_rule(self, rule: str) -> str:
        """CompoundRule's parse: flag runs (possibly parenthesized for
        long/num flag modes) with '*'/'?' modifiers kept verbatim."""
        out = []
        pos = 0
        while pos < len(rule):
            lparen = rule.find("(", pos)
            if lparen < 0:
                out.extend(self.flag_parse(rule[pos:]))
                break
            out.extend(self.flag_parse(rule[pos:lparen]))
            rparen = rule.index(")", lparen + 1)
            out.extend(self.flag_parse(rule[lparen + 1:rparen]))
            pos = rparen + 1
            if pos < len(rule) and rule[pos] in "*?":
                out.append(rule[pos])
                pos += 1
        return "".join(out)

    def _one_flag(self, parts) -> str:
        flags = self.flag_parse(parts[1])
        return flags[0] if flags else FLAG_UNSET

    # -- .dic ---------------------------------------------------------------
    def _parse_dic(self, text: str):
        lines = text.splitlines()
        for raw in lines[1:]:             # first line = entry count
            line = raw
            if not line or line[0] in ("#", "\t"):
                continue
            # Dictionary.morphBoundary: a tab always starts the morph
            # part; a space only when followed by an ``xx:`` morph
            # field — so dic entries may contain spaces ("forty four")
            end = self._morph_boundary(line)
            body_raw = line[:end]
            morph = line[end + 1:] if end < len(line) else None
            body = []
            i = 0
            while i < len(body_raw):
                ch = body_raw[i]
                if ch == "\\" and i + 1 < len(body_raw):
                    body.append(body_raw[i + 1])
                    i += 2
                    continue
                if ch == "/" and i > 0:
                    body.append("\x1f")
                else:
                    body.append(ch)
                i += 1
            body = "".join(body)
            flag_sep = body.find("\x1f")
            if flag_sep >= 0:
                word = body[:flag_sep]
                flag_part = body[flag_sep + 1:].replace("\x1f", "")
                if self.aliases and flag_part.isdigit():
                    flag_part = self.aliases[int(flag_part) - 1]
                flags = frozenset(self.flag_parse(flag_part))
            else:
                word = body
                flags = frozenset()
            if self._needs_input_cleaning(word):
                word = self._clean_input(word)
            if not word:
                continue
            exception = None
            if morph:
                morph = morph.strip()
                # AM alias: a bare number resolves via the alias table
                if self.morph_aliases and morph.isdigit():
                    morph = self.morph_aliases[int(morph) - 1]
                for field in morph.split():
                    if not (len(field) > 3 and field[0].isalpha()
                            and field[1].isalpha() and field[2] == ":"):
                        continue
                    if field.startswith("ph:"):
                        self._add_phonetic_rep(word, field[3:])
                    elif field.startswith("st:") and exception is None:
                        exception = field[3:]
            self.entries.setdefault(word, []).append((flags, exception))
            case = _word_case(word)
            if case == "MIXED" or (case == "UPPER" and flags):
                hidden = word[0].upper() + self._case_fold_str(word[1:])
                self.entries.setdefault(hidden, []).append(
                    (flags | {HIDDEN_FLAG}, exception))

    def _add_phonetic_rep(self, word: str, ph: str):
        """Dictionary.addPhoneticRepEntries: a ``ph:`` morph field adds
        REP entries mapping the phonetic misspelling to the word (or an
        explicit ``pattern->replacement``); a trailing ``*`` strips the
        last char of both (prefix-matching forms); TITLE words with
        lowercase patterns also add the title-cased pattern (plus the
        lowercase word for de/hu)."""
        arrow = ph.find("->")
        if arrow > 0:
            pattern, replacement = ph[:arrow], ph[arrow + 2:]
        else:
            pattern, replacement = ph, word

        if (pattern.endswith("*") and len(pattern) > 2
                and len(replacement) > 1):
            pattern = pattern[:-2]
            replacement = replacement[:-1]

        def add(pat, rep):
            must_start = pat.startswith("^")
            must_end = pat.endswith("$")
            pat = pat[1 if must_start else 0:
                      len(pat) - (1 if must_end else 0)]
            self.rep_table.append((pat, rep.replace("_", " "),
                                   must_start, must_end))

        if (_word_case(word) == "TITLE"
                and _word_case(pattern) == "LOWER"):
            if self.language in ("de", "hu"):
                add(pattern, self._case_fold_str(replacement))
            add(pattern[0].upper() + self._case_fold_str(pattern[1:]),
                replacement)
        add(pattern, replacement)

    @staticmethod
    def _morph_boundary(line: str) -> int:
        for i, ch in enumerate(line):
            if ch == "\t":
                return i
            if (ch == " " and i > 0 and i + 3 < len(line)
                    and line[i + 1].isalpha() and line[i + 2].isalpha()
                    and line[i + 3] == ":"):
                return i
        return len(line)

    # -- input cleaning (IGNORE / ICONV / ignoreCase) -----------------------
    def _needs_input_cleaning(self, word: str) -> bool:
        if not (self.ignore or self.iconv or self.ignore_case):
            return False
        for ch in word:
            if ((self.ignore and ch in self.ignore)
                    or (self.ignore_case and self.case_fold(ch) != ch)
                    or (self.iconv and any(p.startswith(ch) or ch in p
                                           for p, _ in self.iconv))):
                return True
        return False

    def _clean_input(self, word: str) -> str:
        out = []
        for ch in word:
            if self.ignore and ch in self.ignore:
                continue
            if self.ignore_case and self.iconv is None:
                ch = self.case_fold(ch)
            out.append(ch)
        s = "".join(out)
        if self.iconv is not None:
            s = self._apply_conv(s, self.iconv)
            if self.ignore_case:
                s = self._case_fold_str(s)
        return s

    @staticmethod
    def _apply_conv(s: str, table) -> str:
        # ConvTable.applyMappings: at each position the longest
        # matching pattern replaces (greedy, single pass)
        out = []
        i = 0
        while i < len(s):
            for pat, rep in table:
                if s.startswith(pat, i):
                    out.append("-" if rep == "_" else rep)
                    i += len(pat)
                    break
            else:
                out.append(s[i])
                i += 1
        return "".join(out)

    def case_fold(self, ch: str) -> str:
        """Dictionary.caseFold — Java's CHAR-LEVEL toLowerCase (simple
        1:1 mapping): 'İ' folds to plain 'i' (Python's full lowercase
        would add a combining dot), Turkic mode dotless-folds I."""
        if self.alternate_casing:
            if ch == "I":
                return "ı"
            if ch == "İ":
                return "i"
        if ch == "İ":
            return "i"
        low = ch.lower()
        return low if len(low) == 1 else ch

    def _case_fold_str(self, s: str) -> str:
        return "".join(self.case_fold(c) for c in s)

    def is_second_stage_suffix(self, flag: str) -> bool:
        return flag in self.second_stage_suffix_flags

    def is_second_stage_prefix(self, flag: str) -> bool:
        return flag in self.second_stage_prefix_flags


def _char_case(c: str) -> str:
    """WordCase.charCase: a lowercase char counts as LOWER only when
    its CHAR-LEVEL uppercase differs — 'ß' has none (Java
    toUpperCase('ß') == 'ß'), so it is case-NEUTRAL and 'MÜßIG' is an
    UPPER word."""
    if c.isupper():
        return "U"
    u = c.upper()
    if c.islower() and len(u) == 1 and u != c:
        return "L"
    return "N"


def _word_case(word: str) -> str:
    """WordCase.caseOf: NEUTRAL / LOWER / TITLE / UPPER / MIXED."""
    start = _char_case(word[0])
    seen_u = seen_l = False
    for ch in word[1:]:
        cc = _char_case(ch)
        seen_u = seen_u or cc == "U"
        seen_l = seen_l or cc == "L"
        if seen_u and seen_l:
            break
    if seen_l and seen_u:
        return "MIXED"
    if start == "L":
        return "MIXED" if seen_u else "LOWER"
    if start == "U":
        return "UPPER" if not seen_l else "TITLE"
    return "LOWER" if seen_l else ("UPPER" if seen_u else "NEUTRAL")


class HunspellStemmer:
    """Stemmer.java SIMPLE-WORD path: dictionary roots + recursive
    affix stripping with the reference's exact flag gating."""

    def __init__(self, dictionary: HunspellDictionary):
        self.d = dictionary

    # -- public -------------------------------------------------------------
    def stem(self, word: str) -> list[str]:
        d = self.d
        if d._needs_input_cleaning(word):
            word = d._clean_input(word)
        if not word:
            return []
        out: list[str] = []

        def emit(stem, flags, exception):
            out.append(self._new_stem(stem, exception))
            return True

        self._do_stem(word, emit)
        if self.case_of(word) in ("UPPER", "TITLE"):
            for variant, _ in self._case_variants(word,
                                                  self.case_of(word)):
                self._do_stem(variant, emit)
        return out

    def case_of(self, word: str) -> str:
        """Stemmer.caseOf: ignoreCase dictionaries (and lowercase-first
        words) never case-vary."""
        if self.d.ignore_case or not word or word[0].islower():
            return "MIXED"
        return _word_case(word)

    def unique_stems(self, word: str) -> list[str]:
        stems = self.stem(word)
        seen = set()
        out = []
        for s in stems:
            key = s.lower() if self.d.ignore_case else s
            if key not in seen:
                seen.add(key)
                out.append(s)
        return out

    # -- case variation (Stemmer.varyCase) ----------------------------------
    def _case_variants(self, word: str, case: str):
        """(variant, original_case) pairs in the reference's varyCase
        order; sharp-s expansions carry original_case=None (varySharpS
        passes null — they bypass the keepcase check entirely)."""
        d = self.d
        variants = []
        title = None
        if case == "UPPER":
            title = word[0] + d._case_fold_str(word[1:])
            apos = self._capitalize_after_apostrophe(title)
            if apos:
                variants.append((apos, case))
            variants.append((title, case))
            if d.check_sharp_s:
                variants.extend((v, None)
                                for v in self._sharp_s_variants(title))
        # isDotICaseChangeDisallowed: a leading dotted İ never lowers
        # outside Turkic dictionaries (Stemmer.varyCase)
        if word[0] == "İ" and not d.alternate_casing:
            return variants
        base = title if title is not None else word
        lower = d.case_fold(base[0]) + base[1:]
        variants.append((lower, case))
        if case == "UPPER" and d.check_sharp_s:
            variants.extend((v, None)
                            for v in self._sharp_s_variants(lower))
        return variants

    @staticmethod
    def _capitalize_after_apostrophe(word: str):
        # single quote mid-word: capitalize the next char (O'Brian)
        for i in range(1, len(word) - 1):
            if word[i] == "'":
                return word[:i + 1] + word[i + 1].upper() + word[i + 2:]
        return None

    @staticmethod
    def _sharp_s_variants(word: str):
        """varySharpS: every subset of 'ss' occurrences replaced by ß
        (recursion depth-capped at 5), the unchanged source skipped."""
        def expand(start, depth):
            if depth > 5:
                return [word[start:]]
            ss = word.find("ss", start)
            if ss < 0:
                return None
            prefix = word[start:ss]
            tails = expand(ss + 2, depth + 1)
            if tails is None:
                tails = [word[ss + 2:]]
            return [prefix + "ss" + t for t in tails] + \
                   [prefix + "ß" + t for t in tails]

        result = expand(0, 0)
        if result is None:
            return []
        return [s for s in result if s != word]

    # -- core (Stemmer.doStem / stem / applyAffix) --------------------------
    def _do_stem(self, word: str, emit, context: str = "SIMPLE"):
        """Stemmer.doStem: dictionary roots + the affix recursion;
        ``emit(stem_text, entry_flags, exception)`` returns False to
        STOP the whole search (the reference RootProcessor contract).
        ``context`` is the WordContext (SIMPLE / COMPOUND_BEGIN /
        COMPOUND_MIDDLE / COMPOUND_END / COMPOUND_RULE_END)."""
        d = self.d
        for flags, exception in d.entries.get(word, ()):
            if d.needaffix in flags:
                continue
            if (context in ("COMPOUND_BEGIN", "COMPOUND_MIDDLE")
                    and d.compound_forbid != FLAG_UNSET
                    and d.compound_forbid in flags):
                raise _StopStem          # doStem returns false
            if not self._root_compatible(context, None, flags):
                continue
            if not emit(word, flags, exception):
                raise _StopStem
        self._stem_rec(word, previous=None, prev_flag=FLAG_UNSET,
                       prefix=None, depth=0, do_prefix=True,
                       prev_was_prefix=False, emit=emit,
                       context=context)

    def _root_compatible(self, context, last_affix, flags) -> bool:
        """Stemmer.isRootCompatibleWithContext."""
        d = self.d
        compound = context != "SIMPLE"
        if not compound and d.onlyincompound != FLAG_UNSET \
                and d.onlyincompound in flags:
            return False
        if compound and context != "COMPOUND_RULE_END":
            cflag = {"COMPOUND_BEGIN": d.compound_begin,
                     "COMPOUND_MIDDLE": d.compound_middle,
                     "COMPOUND_END": d.compound_end}[context]
            def appended(f):
                return (last_affix is not None and f != FLAG_UNSET
                        and f in last_affix.append_flags)
            return ((cflag != FLAG_UNSET and cflag in flags)
                    or appended(cflag)
                    or (d.compound_flag != FLAG_UNSET
                        and d.compound_flag in flags)
                    or appended(d.compound_flag))
        return True

    def _new_stem(self, stem: str, exception) -> str:
        s = exception if exception is not None else stem
        if self.d.oconv is not None:
            s = HunspellDictionary._apply_conv(s, self.d.oconv)
        return s

    def _stem_rec(self, word, previous, prev_flag, prefix, depth,
                  do_prefix, prev_was_prefix, emit,
                  context: str = "SIMPLE"):
        d = self.d
        n = len(word)
        if do_prefix and d.prefixes:
            limit = n + 1 if d.full_strip else n
            for i in range(0, limit):
                for ax in d.prefixes.get(word[:i], ()):
                    if ax is previous:
                        continue
                    if not self._affix_compatible(ax, prev_flag, depth,
                                                  True, False, context):
                        continue
                    stripped = self._strip_affix(word, i, ax, True)
                    if stripped is None:
                        continue
                    self._apply_affix(stripped, ax, previous, prefix,
                                      depth, True, emit, context)
        if d.suffixes:
            limit = 0 if d.full_strip else 1
            for i in range(n, limit - 1, -1):
                for ax in d.suffixes.get(word[i:], ()):
                    if ax is previous:
                        continue
                    if not self._affix_compatible(ax, prev_flag, depth,
                                                  False,
                                                  prev_was_prefix,
                                                  context):
                        continue
                    stripped = self._strip_affix(word, n - i, ax, False)
                    if stripped is None:
                        continue
                    self._apply_affix(stripped, ax, previous, prefix,
                                      depth, False, emit, context)

    def _strip_affix(self, word, affix_len, ax, is_prefix):
        de_len = len(word) - affix_len
        if len(ax.strip) + de_len == 0:
            return None
        stem = word[affix_len:] if is_prefix else word[:de_len]
        if not ax.condition(stem):
            return None
        if not ax.strip:
            return stem
        return (ax.strip + stem) if is_prefix else (stem + ax.strip)

    def _affix_compatible(self, ax, prev_flag, depth, is_prefix,
                          prev_was_prefix, context: str = "SIMPLE"):
        d = self.d
        if context != "SIMPLE":
            # Stemmer.isAffixCompatible compound gating
            if (not is_prefix and d.compound_forbid != FLAG_UNSET
                    and d.compound_forbid in ax.append_flags):
                return False
            allowed = (context == "COMPOUND_BEGIN" if is_prefix
                       else context in ("COMPOUND_END",
                                        "COMPOUND_RULE_END"))
            if not allowed and not (d.compound_permit != FLAG_UNSET
                                    and d.compound_permit
                                    in ax.append_flags):
                return False
            if (context == "COMPOUND_END" and not is_prefix
                    and not prev_was_prefix
                    and d.onlyincompound != FLAG_UNSET
                    and d.onlyincompound in ax.append_flags):
                return False
        elif d.onlyincompound != FLAG_UNSET \
                and d.onlyincompound in ax.append_flags:
            return False
        if depth == 0:
            return True
        if ax.cross:
            return prev_was_prefix or (prev_flag != FLAG_UNSET
                                       and prev_flag in ax.append_flags)
        return False

    def _needs_another_affix(self, ax, previous, is_suffix, prefix):
        d = self.d
        circ = d.circumfix
        if circ != FLAG_UNSET and is_suffix:
            pfx_circ = prefix is not None and circ in prefix.append_flags
            if pfx_circ != (circ in ax.append_flags):
                return True
        if d.needaffix != FLAG_UNSET and d.needaffix in ax.append_flags:
            return (not is_suffix or previous is None
                    or d.needaffix in previous.append_flags)
        return False

    def _apply_affix(self, stripped, ax, previous, prefix, depth,
                     is_prefix, emit, context: str = "SIMPLE"):
        d = self.d
        flag = ax.flag
        skip_lookup = self._needs_another_affix(ax, previous,
                                                not is_prefix, prefix)
        if not skip_lookup:
            for flags, exception in d.entries.get(stripped, ()):
                if not (flag in flags
                        or (prefix is not None
                            and flag in prefix.append_flags)):
                    continue
                chained_prefix = (d.complex_prefixes and depth == 1
                                  and is_prefix)
                if not chained_prefix and prefix is not None:
                    if not (prefix.flag in flags
                            or prefix.flag in ax.append_flags):
                        continue
                if not self._root_compatible(context, ax, flags):
                    continue
                if not emit(stripped, flags, exception):
                    raise _StopStem

        if ax.cross and depth <= 1:
            if depth == 0:
                if is_prefix:
                    prefix = ax
                    do_prefix = (d.complex_prefixes
                                 and d.is_second_stage_prefix(flag))
                elif (not d.complex_prefixes
                      and d.is_second_stage_suffix(flag)):
                    do_prefix = False
                else:
                    return
            else:
                do_prefix = False
                if is_prefix and d.complex_prefixes:
                    prefix = ax
                elif (is_prefix or d.complex_prefixes
                      or not d.is_second_stage_suffix(flag)):
                    return
            self._stem_rec(stripped, previous=ax, prev_flag=flag,
                           prefix=prefix, depth=depth + 1,
                           do_prefix=do_prefix,
                           prev_was_prefix=is_prefix, emit=emit,
                           context=context)


# ---------------------------------------------------------------------------
# HunspellStemFilter token semantics
# ---------------------------------------------------------------------------

@lru_cache(maxsize=16)
def _load_dictionary(aff_path: str, dic_path: str,
                     ignore_case: bool) -> HunspellStemmer:
    with open(aff_path, "rb") as f:
        aff_bytes = f.read()
    aff = decode_hunspell(aff_bytes)
    enc = _charset_of(aff_bytes)
    with open(dic_path, "rb") as f:
        dic = f.read().decode(enc, errors="replace")
    return HunspellStemmer(HunspellDictionary(aff, [dic], ignore_case))


def hunspell_stem_batch(doc_idx, terms, positions, n_docs,
                        aff_path: str, dic_path: str,
                        dedup: bool = True, longest_only: bool = False,
                        ignore_case: bool = False):
    """HunspellStemFilter (reference ``HunspellStemFilter.java``): a
    token with no stems passes through; otherwise the stems replace it
    (first at the source position, the rest posInc=0 overlays);
    ``longestOnly`` keeps only the longest stem (ties: the reference
    sorts by length only, first-found wins)."""
    if len(terms) == 0:
        return (doc_idx, terms, positions,
                np.zeros(n_docs, dtype=np.int64))
    stemmer = _load_dictionary(aff_path, dic_path, ignore_case)
    uniq = pd.factorize(terms)[1]
    code_lists = []
    for u in uniq:
        stems = (stemmer.unique_stems(u) if dedup else stemmer.stem(u))
        if not stems:
            code_lists.append([u])
        elif longest_only:
            code_lists.append([max(stems, key=len)])
        else:
            code_lists.append(stems)
    from .phonetic import _multi_code_batch
    return _multi_code_batch(doc_idx, terms, positions, n_docs,
                             code_lists, inject=False)



# ---------------------------------------------------------------------------
# compound spelling (Hunspell.java checkCompounds/checkCompoundRules)
# ---------------------------------------------------------------------------

class _CompoundPart:
    """Hunspell.CompoundPart: one accepted compound piece. ``tail`` is
    (chars, offset, length) — the CharsRef the piece was found in."""
    __slots__ = ("prev", "tail", "length", "root", "pattern", "index")

    def __init__(self, prev, tail, length, root, pattern):
        self.prev = prev
        self.tail = tail                  # (chars, offset, length)
        self.length = length
        self.root = root                  # (stem_text, flags)
        self.pattern = pattern
        self.index = 1 if prev is None else prev.index + 1


def _cp_charsmatch(chars, offset, pattern):
    if offset < 0 or offset + len(pattern) > len(chars):
        return False
    return chars[offset:offset + len(pattern)] == pattern


class _CompoundMixin:
    """Compound methods mixed into HunspellChecker (kept separate for
    readability; reference Hunspell.java:160-450)."""

    def _check_compounds_any(self, word: str, original_case) -> bool:
        d = self.d
        if d.compound_rules and self._check_compound_rules(
                word, 0, len(word), []):
            return True
        if (d.compound_begin != FLAG_UNSET
                or d.compound_flag != FLAG_UNSET):
            return self._check_compounds((word, 0, len(word)),
                                         original_case, None)
        return False

    # -- COMPOUNDFLAG / BEGIN / MIDDLE / END ---------------------------------
    def _check_compounds(self, word, original_case, prev) -> bool:
        d = self.d
        if prev is not None and prev.index > d.compound_max - 2:
            return False
        chars, offset, length = word
        limit = length - d.compound_min + 1
        for break_pos in range(d.compound_min, limit):
            context = ("COMPOUND_BEGIN" if prev is None
                       else "COMPOUND_MIDDLE")
            break_offset = offset + break_pos
            if self._may_break(chars, offset, length, break_offset):
                stem = self._find_root_at(chars, offset, break_pos,
                                          original_case, context)
                if (stem is None and d.simplified_triple
                        and chars[break_offset - 1]
                        == chars[break_offset]):
                    stem = self._find_root_at(chars, offset,
                                              break_pos + 1,
                                              original_case, context)
                if (stem is not None
                        and not (d.forbiddenword != FLAG_UNSET
                                 and d.forbiddenword in stem[1])
                        and (prev is None
                             or self._may_compound(prev, stem,
                                                   break_pos,
                                                   original_case))):
                    part = _CompoundPart(prev, word, break_pos, stem,
                                         None)
                    if self._check_compounds_after(original_case, part):
                        return True
            if self._check_pattern_replacements(word, break_pos,
                                                original_case, prev):
                return True
        return False

    def _check_pattern_replacements(self, word, pos, original_case,
                                    prev) -> bool:
        chars, offset, length = word
        for pat in self.d.check_compound_patterns:
            ec, ef, bc, bf, rep = pat
            if rep is None:
                continue
            if not _cp_charsmatch(chars, offset + pos, rep):
                continue
            expanded_chars = (chars[:offset + pos] + ec + bc
                              + chars[offset + pos + len(rep):
                                      offset + length])
            expanded = (expanded_chars, offset,
                        length - len(rep) + len(ec) + len(bc))
            break_pos = pos + len(ec)
            context = ("COMPOUND_BEGIN" if prev is None
                       else "COMPOUND_MIDDLE")
            stem = self._find_root_at(expanded[0], expanded[1],
                                      break_pos, original_case,
                                      context)
            if stem is not None:
                part = _CompoundPart(prev, expanded, break_pos, stem,
                                     pat)
                if self._check_compounds_after(original_case, part):
                    return True
        return False

    def _check_compounds_after(self, original_case, prev) -> bool:
        d = self.d
        chars, offset, length = prev.tail
        break_pos = prev.length
        remaining = length - break_pos
        break_offset = offset + break_pos
        last = self._find_root_at(chars, break_offset, remaining,
                                  original_case, "COMPOUND_END")
        if (last is not None
                and not (d.forbiddenword != FLAG_UNSET
                         and d.forbiddenword in last[1])
                and not (d.check_compound_dup and prev.root == last)
                and not self._force_ucase_problem(last, original_case,
                                                  chars[offset])
                and self._may_compound(prev, last, remaining,
                                       original_case)):
            return True
        tail = (chars, break_offset, remaining)
        return self._check_compounds(tail, original_case, prev)

    def _force_ucase_problem(self, root, original_case,
                             first_char) -> bool:
        if original_case in ("TITLE", "UPPER"):
            return False
        if original_case is None and first_char.isupper():
            return False
        return (self.d.force_ucase != FLAG_UNSET
                and self.d.force_ucase in root[1])

    # -- CompoundPart.mayCompound --------------------------------------------
    def _may_compound(self, prev, next_root, next_len,
                      original_case) -> bool:
        d = self.d
        chars, offset, _ = prev.tail
        if prev.pattern is not None:
            if not self._pattern_prohibits(prev.pattern, prev.tail,
                                           prev.length, prev.root,
                                           next_root):
                return False
        else:
            for pat in d.check_compound_patterns:
                if self._pattern_prohibits(pat, prev.tail, prev.length,
                                           prev.root, next_root):
                    return False
        if d.check_compound_rep and self._misspelled_simple(
                prev, prev.length + next_len, original_case):
            return False
        space_sep = (chars[offset:offset + prev.length] + " "
                     + chars[offset + prev.length:
                             offset + prev.length + next_len])
        return self._check_simple(space_sep, None) is not True

    def _pattern_prohibits(self, pat, tail, break_pos, root_before,
                           root_after) -> bool:
        """CheckCompoundPattern.prohibitsCompounding — True when the
        pattern FORBIDS this junction (note _may_compound uses it with
        inverted polarity for the enabling pattern)."""
        ec, ef, bc, bf, _rep = pat
        chars, offset, _ = tail
        if ec == "0":
            if not _cp_charsmatch(chars,
                                  offset + break_pos
                                  - len(root_before[0]),
                                  root_before[0]):
                return False
        elif not _cp_charsmatch(chars, offset + break_pos - len(ec),
                                ec):
            return False
        if bc == "0":
            if not _cp_charsmatch(chars, offset + break_pos,
                                  root_after[0]):
                return False
        elif not _cp_charsmatch(chars, offset + break_pos, bc):
            return False
        if ef and not ef <= root_before[1]:
            return False
        if bf and not bf <= root_after[1]:
            return False
        return True

    def _misspelled_simple(self, prev, length, original_case) -> bool:
        chars, offset, _ = prev.tail
        word = chars[offset:offset + length]
        for pat, rep, must_start, must_end in self.d.rep_table:
            if must_start or must_end:
                continue                  # isMiddle() only
            pos = word.find(pat)
            while pos >= 0:
                sug = word[:pos] + rep + word[pos + len(pat):]
                if self._find_root_at(sug, 0, len(sug), original_case,
                                      "SIMPLE") is not None:
                    return True
                pos = word.find(pat, pos + 1)
        return False

    def _may_break(self, chars, offset, length, break_offset) -> bool:
        d = self.d
        if d.check_compound_case:
            a, b = chars[break_offset - 1], chars[break_offset]
            if (a.isupper() or b.isupper()) and a != "-" and b != "-":
                return False
        if (d.check_compound_triple
                and chars[break_offset - 1] == chars[break_offset]):
            if ((break_offset > offset + 1
                 and chars[break_offset - 2] == chars[break_offset - 1])
                    or (break_offset < length - 1
                        and chars[break_offset]
                        == chars[break_offset + 1])):
                return False
        return True

    # -- COMPOUNDRULE ---------------------------------------------------------
    def _check_compound_rules(self, word, offset, length,
                              words) -> bool:
        d = self.d
        if len(words) >= 100:
            return False
        limit = length - d.compound_min + 1
        for break_pos in range(d.compound_min, limit):
            piece = word[offset:offset + break_pos]
            forms = d.entries.get(piece)
            if forms is None:
                continue
            flag_sets = [fl for fl, _ in forms]
            words.append(flag_sets)
            if any(self._rule_match(r, words, fully=False)
                   for r in d.compound_rules):
                if self._check_last_rule_part(word, offset + break_pos,
                                              length - break_pos,
                                              words):
                    words.pop()
                    return True
                if self._check_compound_rules(word, offset + break_pos,
                                              length - break_pos,
                                              words):
                    words.pop()
                    return True
            words.pop()
        return False

    def _check_last_rule_part(self, word, start, length,
                              words) -> bool:
        d = self.d
        slot = [frozenset()]
        words.append(slot)
        found = [False]

        def emit(stem, flags, exception):
            slot[0] = flags
            if any(self._rule_match(r, words, fully=True)
                   for r in d.compound_rules):
                found[0] = True
                return False
            return True

        try:
            self.stemmer._do_stem(word[start:start + length], emit,
                                  context="COMPOUND_RULE_END")
        except _StopStem:
            pass
        words.pop()
        return found[0]

    def _rule_match(self, rule, words, fully: bool,
                    pi: int = 0, wi: int = 0) -> bool:
        """CompoundRule.match over per-part flag-set LISTS (a part
        matches a flag when ANY of its homonym entries carries it)."""
        def has(widx, flag):
            return any(flag in fl for fl in words[widx])

        if pi >= len(rule):
            return wi >= len(words)
        if wi >= len(words) and not fully:
            return True
        flag = rule[pi]
        if pi < len(rule) - 1 and rule[pi + 1] == "*":
            start = wi
            while wi < len(words) and has(wi, flag):
                wi += 1
            while wi >= start:
                if self._rule_match(rule, words, fully, pi + 2, wi):
                    return True
                wi -= 1
            return False
        current = wi < len(words) and has(wi, flag)
        if pi < len(rule) - 1 and rule[pi + 1] == "?":
            if current and self._rule_match(rule, words, fully,
                                            pi + 2, wi + 1):
                return True
            return self._rule_match(rule, words, fully, pi + 2, wi)
        return current and self._rule_match(rule, words, fully,
                                            pi + 1, wi + 1)

    # -- context-aware root lookup --------------------------------------------
    def _find_root_at(self, chars, offset, length, original_case,
                      context):
        return self._find_root(chars[offset:offset + length],
                               original_case, context)


# ---------------------------------------------------------------------------
# spell checking (Hunspell.java)
# ---------------------------------------------------------------------------

class HunspellChecker(_CompoundMixin):
    """Hunspell.spell (reference ``hunspell/Hunspell.java:66-140``),
    the non-compound subset: dictionary/affix analysis with
    FORBIDDENWORD and KEEPCASE gating (incl. the sharp-s title
    exception and the abort-on-non-hidden-case-reject processor
    contract), number tolerance, trailing-dot handling, case variation,
    and BREAK recursion (default table '-'). COMPOUND* spelling is out
    of scope (documented)."""

    def __init__(self, dictionary: HunspellDictionary):
        self.d = dictionary
        self.stemmer = HunspellStemmer(dictionary)

    # -- public -------------------------------------------------------------
    def spell(self, word: str) -> bool:
        if not word:
            return True
        if self.d._needs_input_cleaning(word):
            word = self.d._clean_input(word)
        if word.endswith("."):
            length = len(word) - 1
            while length > 0 and word[length - 1] == ".":
                length -= 1
            return (self._spell_clean(word[:length])
                    or self._spell_clean(word[:length + 1]))
        return self._spell_clean(word)

    def _spell_clean(self, word: str) -> bool:
        if _is_number(word):
            return True
        simple = self._check_simple(word, None)
        if simple is not None:
            return simple
        if self._check_compounds_any(word, None):
            return True
        wc = self.stemmer.case_of(word)
        if wc in ("UPPER", "TITLE"):
            for variant, oc in self.stemmer._case_variants(word, wc):
                if self._check_word(variant, oc):
                    return True
        if any(self.d.breaks) and not self._too_many_breaks(word):
            return self._try_breaks(word)
        return False

    # -- suggestions (Hunspell.suggest) ---------------------------------------
    def suggest(self, word: str) -> list[str]:
        """Hunspell.suggest: ModifyingSuggester edits first; n-gram
        root expansion when no good edit exists; dash-chunk repairs;
        case re-adjustment + OCONV on output."""
        d = self.d
        if len(word) >= 100:
            return []
        if d._needs_input_cleaning(word):
            word = d._clean_input(word)
        word_case = _word_case(word) if word else "NEUTRAL"
        if d.force_ucase != FLAG_UNSET and word_case == "LOWER":
            title = word[0].upper() + d._case_fold_str(word[1:])
            if self.spell(title):
                return [title]
        suggestions = _OrderedSet()
        sub = _SuggestChecker(d)
        modifier = _ModifyingSuggester(sub, suggestions)
        has_good = modifier.suggest(word, word_case)
        if not has_good and d.max_ngram_suggestions > 0:
            suggestions.update(_GeneratingSuggester(sub).suggest(
                d._case_fold_str(word), word_case, suggestions))
        if "-" in word and not any("-" in s for s in suggestions):
            suggestions.update(self._dash_chunks(word))
        return self._postprocess(word, word_case, suggestions)

    def _dash_chunks(self, word: str) -> list[str]:
        out = []
        chunk_start = 0
        while chunk_start < len(word):
            chunk_end = word.find("-", chunk_start)
            if chunk_end < 0:
                chunk_end = len(word)
            if chunk_end > chunk_start:
                chunk = word[chunk_start:chunk_end]
                if not self.spell(chunk):
                    for sug in self.suggest(chunk):
                        replaced = (word[:chunk_start] + sug
                                    + word[chunk_end:])
                        if self.spell(replaced):
                            out.append(replaced)
            chunk_start = chunk_end + 1
        return out

    def _postprocess(self, word, word_case, suggestions) -> list[str]:
        d = self.d
        result = _OrderedSet()
        for cand in suggestions:
            result.add(self._adjust_case(cand, word_case, word))
            if (word_case == "UPPER" and d.check_sharp_s
                    and "ß" in cand):
                result.add(cand)
        out = []
        for s in result:
            if d.oconv is not None:
                s = HunspellDictionary._apply_conv(s, d.oconv)
            out.append(s)
        return out

    def _adjust_case(self, candidate, original_case, original) -> str:
        if original_case == "UPPER":
            upper = candidate.upper()
            if " " in upper or self.spell(upper):
                return upper
        if original and original[0].isupper():
            title = candidate[0].upper() + candidate[1:]
            if " " in title or self.spell(title):
                return title
        return candidate

    # -- roots with case/forbidden gating ------------------------------------
    def _find_root(self, word: str, original_case,
                   context: str = "SIMPLE"):
        """findStem: the first acceptable root; a non-hidden entry that
        FAILS the case check aborts the search (the reference processor
        returns hasFlag(HIDDEN) there). Case is only checked outside
        COMPOUND_MIDDLE/END contexts."""
        found = []
        check_case = context not in ("COMPOUND_MIDDLE", "COMPOUND_END")

        def emit(stem, flags, exception):
            if check_case and not self._accept_case(original_case,
                                                    flags, stem):
                return HIDDEN_FLAG in flags
            if self._accepts_stem(flags):
                found.append((stem, flags))
            return False              # stop even when not accepted

        try:
            self.stemmer._do_stem(word, emit, context=context)
        except _StopStem:
            pass
        return found[0] if found else None

    def _accept_case(self, original_case, flags, root: str) -> bool:
        """Hunspell.acceptCase: keepcase entries only match their
        written case — except CHECKSHARPS dictionaries, where a
        TITLE-cased word may match an ß-carrying keepcase root."""
        keep = (self.d.keepcase != FLAG_UNSET
                and self.d.keepcase in flags)
        if original_case is not None:
            if (keep and self.d.check_sharp_s
                    and original_case == "TITLE" and "ß" in root):
                return True
            return not keep
        return HIDDEN_FLAG not in flags

    def _accepts_stem(self, flags) -> bool:
        """Hook the suggestion speller overrides (Hunspell.acceptsStem)."""
        return True

    def _check_simple(self, word: str, original_case):
        root = self._find_root(word, original_case)
        if root is not None:
            return not (self.d.forbiddenword != FLAG_UNSET
                        and self.d.forbiddenword in root[1])
        return None

    def _check_word(self, word: str, original_case) -> bool:
        simple = self._check_simple(word, original_case)
        if simple is not None:
            return simple
        return self._check_compounds_any(word, original_case)

    # -- BREAK (Hunspell.tryBreaks) ------------------------------------------
    def _too_many_breaks(self, word: str) -> bool:
        occurrences = 0
        for br in self.d.breaks[2]:
            pos = word.find(br)
            while pos >= 0:
                occurrences += 1
                if occurrences >= 10:
                    return True
                pos = word.find(br, pos + len(br))
        return False

    def _try_breaks(self, word: str) -> bool:
        starting, ending, middle = self.d.breaks
        for br in starting:
            if len(word) > len(br) and word.startswith(br):
                if self.spell(word[len(br):]):
                    return True
        for br in ending:
            if len(word) > len(br) and word.endswith(br):
                if self.spell(word[:-len(br)]):
                    return True
        for br in middle:
            pos = word.find(br)
            if self._breakable_at(word, br, pos):
                return True
            if pos > 0 and self._breakable_at(word, br,
                                              word.find(br, pos + 1)):
                return True
        return False

    def _breakable_at(self, word: str, br: str, pos: int) -> bool:
        return (pos > 0 and pos < len(word) - len(br)
                and self.spell(word[:pos])
                and self.spell(word[pos + len(br):]))


def _is_number(s: str) -> bool:
    """Hunspell.isNumber: digits with single '.'/','/'-' separators,
    each followed by another digit."""
    i = 0
    n = len(s)
    if n == 0:
        return False
    while i < n:
        c = s[i]
        if c.isdigit() and c.isascii():
            i += 1
        elif c in ".,-":
            if (i == 0 or i >= n - 1 or not
                    (s[i + 1].isdigit() and s[i + 1].isascii())):
                return False
            i += 2
        else:
            return False
    return True


# ---------------------------------------------------------------------------
# suggestions (Hunspell.suggest + ModifyingSuggester + GeneratingSuggester)
# ---------------------------------------------------------------------------

_MAX_CHAR_DISTANCE = 4


class _SuggestChecker(HunspellChecker):
    """The suggestion speller: roots flagged NOSUGGEST/SUBSTANDARD are
    not accepted (Hunspell.doSuggest's acceptsStem override)."""

    def _accepts_stem(self, flags) -> bool:
        d = self.d
        return not ((d.no_suggest != FLAG_UNSET
                     and d.no_suggest in flags)
                    or (d.sub_standard != FLAG_UNSET
                        and d.sub_standard in flags))


class _OrderedSet:
    """LinkedHashSet stand-in: add() returns True when new."""

    def __init__(self):
        self._d: dict = {}

    def add(self, item) -> bool:
        if item in self._d:
            return False
        self._d[item] = None
        return True

    def update(self, items):
        for it in items:
            self.add(it)

    def __iter__(self):
        return iter(self._d)

    def __contains__(self, item):
        return item in self._d

    def __len__(self):
        return len(self._d)

    def clear(self):
        self._d.clear()


class _ModifyingSuggester:
    """ModifyingSuggester.java: char-edit candidate generation (case
    variations, REP/MAP tables, swaps, keyboard neighbors, removals,
    insertions, moves, replacements, de-duplications, splits)."""

    def __init__(self, speller: HunspellChecker, result: _OrderedSet):
        self.speller = speller
        self.result = result
        self.try_chars = speller.d.try_chars

    def suggest(self, word: str, word_case: str) -> bool:
        d = self.speller.d
        low = d._case_fold_str(word) if word_case != "LOWER" else word
        if word_case in ("UPPER", "MIXED"):
            self._try(low)
        has_good = self._variations(word)
        if word_case == "TITLE":
            has_good |= self._variations(low)
        elif word_case == "UPPER":
            has_good |= self._variations(low)
            has_good |= self._variations(
                word[0].upper() + d._case_fold_str(word[1:]))
        elif word_case == "MIXED":
            dot = word.find(".")
            if (0 < dot < len(word) - 1
                    and _word_case(word[dot + 1:]) == "TITLE"):
                self.result.add(word[:dot + 1] + " " + word[dot + 1:])
            capitalized = word[0].isupper()
            if capitalized:
                has_good |= self._variations(
                    d.case_fold(word[0]) + word[1:])
            has_good |= self._variations(low)
            if capitalized:
                has_good |= self._variations(
                    low[0].upper() + d._case_fold_str(low[1:]))
            adjusted = []
            for candidate in self.result:
                s = self._capitalize_after_space(word, candidate)
                if s == candidate:
                    adjusted.append(s)
                else:
                    adjusted.insert(0, s)
            self.result.clear()
            self.result.update(adjusted)
        return has_good

    @staticmethod
    def _capitalize_after_space(misspelled, candidate):
        space = candidate.find(" ")
        tail = len(candidate) - space - 1
        if (space > 0
                and misspelled[len(misspelled) - tail:]
                != candidate[space + 1:]):
            return (candidate[:space + 1]
                    + candidate[space + 1].upper()
                    + candidate[space + 2:])
        return candidate

    def _variations(self, word: str) -> bool:
        has_good = self._try(word.upper())
        has_good |= self._rep(word)
        if self.speller.d.map_table:
            self._map_replacements(word, "", 0)
        self._swapping_chars(word)
        self._long_swap(word)
        self._neighbor_keys(word)
        self._removing_char(word)
        self._adding_char(word)
        self._moving_char(word)
        self._replacing_char(word)
        self._two_duplicate_chars(word)
        good_split = self._dictionary_splits(word)
        if good_split:
            copy = list(self.result)
            self.result.clear()
            self.result.update(good_split)
            if has_good:
                self.result.update(copy)
            has_good = True
        if not has_good and self.speller.d.enable_split_suggestions:
            self._splitting(word)
        return has_good

    def _rep(self, word: str) -> bool:
        before = len(self.result)
        for pat, rep, must_start, must_end in self.speller.d.rep_table:
            if must_start:
                if (word == pat if must_end
                        else word.startswith(pat)):
                    cands = [rep + word[len(pat):]]
                else:
                    cands = []
            elif must_end:
                cands = ([word[:-len(pat)] + rep]
                         if word.endswith(pat) else [])
            else:
                cands = []
                pos = word.find(pat)
                while pos >= 0:
                    cands.append(word[:pos] + rep
                                 + word[pos + len(pat):])
                    pos = word.find(pat, pos + 1)
            for cand in cands:
                cand = cand.strip()
                if self._try(cand):
                    continue
                if " " in cand and all(
                        self.speller._check_simple(p, None) is True
                        for p in cand.split(" ")):
                    self.result.add(cand)
        return len(self.result) > before

    def _map_replacements(self, word, accumulated, offset):
        if offset == len(word):
            self._try(accumulated)
            return
        for entries in self.speller.d.map_table:
            for entry in entries:
                if word.startswith(entry, offset):
                    for replacement in entries:
                        if replacement != entry:
                            self._map_replacements(
                                word, accumulated + replacement,
                                offset + len(entry))
        self._map_replacements(word, accumulated + word[offset],
                               offset + 1)

    def _swapping_chars(self, word):
        n = len(word)
        for i in range(n - 1):
            self._try(word[:i] + word[i + 1] + word[i]
                      + word[i + 2:])
        if n in (4, 5):
            c = list(word)
            c[0], c[1] = word[1], word[0]
            c[-1], c[-2] = word[-2], word[-1]
            self._try("".join(c))
            if n == 5:
                c[0] = word[0]
                c[1] = word[2]
                c[2] = word[1]
                self._try("".join(c))

    def _neighbor_keys(self, word):
        for i, ch in enumerate(word):
            up = ch.upper()
            if up != ch and len(up) == 1:
                self._try(word[:i] + up + word[i + 1:])
            for group in self.speller.d.neighbor_keys:
                if ch in group:
                    for g in group:
                        if g != ch:
                            self._try(word[:i] + g + word[i + 1:])

    def _long_swap(self, word):
        n = len(word)
        for i in range(n):
            for j in range(i + 2, min(n, i + _MAX_CHAR_DISTANCE + 1)):
                self._try(word[:i] + word[j] + word[i + 1:j]
                          + word[i] + word[j + 1:])

    def _removing_char(self, word):
        if len(word) == 1:
            return
        for i in range(len(word)):
            self._try(word[:i] + word[i + 1:])

    def _adding_char(self, word):
        for i in range(len(word) + 1):
            for ch in self.try_chars:
                self._try(word[:i] + ch + word[i:])

    def _moving_char(self, word):
        n = len(word)
        for i in range(n):
            prefix = word[:i]
            for j in range(i + 2, min(n, i + _MAX_CHAR_DISTANCE + 1)):
                self._try(prefix + word[i + 1:j] + word[i] + word[j:])
                self._try(prefix + word[j] + word[i:j] + word[j + 1:])
            if i < n - 1:
                self._try(prefix + word[i + 1:] + word[i])

    def _replacing_char(self, word):
        for i, ch in enumerate(word):
            for t in self.try_chars:
                if t != ch:
                    self._try(word[:i] + t + word[i + 1:])

    def _two_duplicate_chars(self, word):
        dup = 0
        for i in range(2, len(word)):
            if word[i] == word[i - 2]:
                dup += 1
                if dup == 3 or (dup == 2 and i >= 4):
                    self._try(word[:i - 1] + word[i + 1:])
                    dup = 0
            else:
                dup = 0

    def _dictionary_splits(self, word):
        out = []
        for i in range(1, len(word) - 1):
            w1, w2 = word[:i], word[i:]
            spaced = w1 + " " + w2
            if self.speller._check_word(spaced, None):
                out.append(spaced)
            if self._split_by_dash():
                dashed = w1 + "-" + w2
                if self.speller._check_word(dashed, None):
                    out.append(dashed)
        return out

    def _splitting(self, word):
        for i in range(1, len(word)):
            w1, w2 = word[:i], word[i:]
            if (self.speller._check_simple(w1, None) is True
                    and self.speller._check_simple(w2, None) is True):
                self.result.add(w1 + " " + w2)
                if (len(w1) > 1 and len(w2) > 1
                        and self._split_by_dash()):
                    self.result.add(w1 + "-" + w2)

    def _split_by_dash(self):
        tc = self.speller.d.try_chars
        return "-" in tc or "a" in tc

    def _try(self, candidate: str) -> bool:
        return (self.speller._check_word(candidate, None)
                and self.result.add(candidate))


# -- n-gram machinery (GeneratingSuggester statics) --------------------------

def _common_prefix(s1: str, s2: str) -> int:
    i = 0
    limit = min(len(s1), len(s2))
    while i < limit and s1[i] == s2[i]:
        i += 1
    return i


def _index_of_substring(haystack, haystack_pos, needle, needle_pos,
                        length) -> int:
    sub = needle[needle_pos:needle_pos + length]
    pos = haystack.find(sub, haystack_pos)
    return pos if pos >= 0 else -1


def _ngram_score(n, s1, s2, weighted: bool) -> int:
    l1 = len(s1)
    score = 0
    last_starts = [0] * l1
    for j in range(1, n + 1):
        ns = 0
        for i in range(0, l1 - j + 1):
            if last_starts[i] >= 0:
                pos = _index_of_substring(s2, last_starts[i], s1, i, j)
                last_starts[i] = pos
                if pos >= 0:
                    ns += 1
                    continue
            if weighted:
                ns -= 1
                if i == 0 or i == l1 - j:
                    ns -= 1          # side weight
        score += ns
        if ns < 2 and not weighted:
            break
    return score


def _longer_worse_penalty(l1, l2) -> int:
    return max((l2 - l1) - 2, 0)


def _any_mismatch_ngram(n, s1, s2, weighted: bool) -> int:
    return _ngram_score(n, s1, s2, weighted) - max(
        abs(len(s2) - len(s1)) - 2, 0)


def _lcs(s1, s2) -> int:
    lengths = [0] * (len(s2) + 1)
    for i in range(1, len(s1) + 1):
        prev = 0
        for j in range(1, len(s2) + 1):
            cur = lengths[j]
            lengths[j] = (prev + 1 if s1[i - 1] == s2[j - 1]
                          else max(cur, lengths[j - 1]))
            prev = cur
    return lengths[len(s2)]


def _common_char_position_score(s1, s2) -> int:
    num = 0
    diff = 0
    dp1 = dp2 = -1
    i = 0
    for i in range(min(len(s1), len(s2))):
        if s1[i] == s2[i]:
            num += 1
        else:
            if diff == 0:
                dp1 = i
            elif diff == 1:
                dp2 = i
            diff += 1
    i = min(len(s1), len(s2))
    common = 1 if num > 0 else 0
    if (diff == 2 and i == len(s1) and i == len(s2)
            and s1[dp1] == s2[dp2] and s1[dp2] == s2[dp1]):
        return common + 10
    return common


class _GeneratingSuggester:
    """GeneratingSuggester.java: n-gram-scored dictionary roots,
    affix-expanded against the misspelled word's own prefixes/suffixes,
    re-ranked by the hunspell similarity formula."""

    MAX_ROOTS = 100
    MAX_WORDS = 100
    MAX_GUESSES = 200
    MAX_ROOT_LENGTH_DIFF = 4

    def __init__(self, speller: HunspellChecker):
        self.speller = speller
        self.d = speller.d

    def suggest(self, word: str, original_case, prev) -> list:
        roots = self._similar_roots(word, original_case)
        expanded = self._expand_roots(word, roots)
        ranked = self._rank(word, expanded)
        return self._most_relevant(ranked, prev)

    # -- root discovery -------------------------------------------------------
    def _similar_roots(self, word, original_case):
        d = self.d
        ignore_title = (original_case == "LOWER"
                        and d.language != "de")
        exclude = {HIDDEN_FLAG}
        for f in (d.no_suggest, d.forbiddenword, d.onlyincompound):
            if f != FLAG_UNSET:
                exclude.add(f)
        scored = []
        for root_word in sorted(d.entries):
            if abs(len(root_word) - len(word)) > \
                    self.MAX_ROOT_LENGTH_DIFF or not root_word:
                continue
            forms = [fl for fl, _ in d.entries[root_word]
                     if not (fl & exclude)]
            if not forms:
                continue
            if (ignore_title and root_word[0].isupper()
                    and _word_case(root_word) == "TITLE"):
                continue
            folded = d._case_fold_str(root_word)
            sc = _ngram_score(3, word, folded, False)
            if sc == 0:
                continue
            sc += _common_prefix(word, root_word) \
                - _longer_worse_penalty(len(word), len(root_word))
            for fl in forms:
                scored.append((sc, root_word, fl))
        # top MAX_ROOTS by score (ties: later-sorted words win the heap
        # eviction like the reference's PriorityQueue; order by score
        # desc then word asc for the final list)
        scored.sort(key=lambda t: (-t[0], t[1]))
        return scored[:self.MAX_ROOTS]

    # -- affix expansion ------------------------------------------------------
    def _expand_roots(self, misspelled, roots):
        thresh = self._threshold(misspelled)
        expanded = []
        seen = set()
        for sc, root_word, flags in roots:
            for guess in self._expand_root(root_word, flags,
                                           misspelled):
                lower = self.d._case_fold_str(guess)
                s = (_any_mismatch_ngram(len(misspelled), misspelled,
                                         lower, False)
                     + _common_prefix(misspelled, guess))
                if s > thresh and (guess, s) not in seen:
                    seen.add((guess, s))
                    expanded.append((s, guess))
        expanded.sort(key=lambda t: (-t[0], t[1]))
        return expanded[:self.MAX_GUESSES]

    @staticmethod
    def _threshold(word):
        thresh = 0
        for sp in range(1, 4):
            mw = list(word)
            for k in range(sp, len(word), 4):
                mw[k] = "*"
            thresh += _any_mismatch_ngram(len(word), word,
                                          "".join(mw), False)
        return thresh // 3 - 1 if thresh >= 0 else -(-thresh // 3) - 1

    def _expand_root(self, root_word, root_flags, misspelled):
        d = self.d
        result = _OrderedSet()
        cross_products = []
        if not (d.needaffix != FLAG_UNSET
                and d.needaffix in root_flags):
            result.add(root_word)

        def compatible(ax):
            if ax.flag not in root_flags:
                return False
            for f in (d.needaffix, d.circumfix, d.onlyincompound):
                if f != FLAG_UNSET and f in ax.append_flags:
                    return False
            return True

        # suffixes of the MISSPELLED word, ascending length (incl. "")
        for k in range(0, len(misspelled) + 1):
            append = misspelled[len(misspelled) - k:]
            for ax in d.suffixes.get(append, ()):
                strip_len = len(ax.strip)
                stem_len = len(root_word) - strip_len
                if not compatible(ax):
                    continue
                if stem_len < 0 or not ax.condition(
                        root_word[:stem_len]):
                    continue
                with_suffix = root_word[:stem_len] + append
                result.add(with_suffix)
                if ax.cross:
                    cross_products.append(with_suffix)
        # cross-product prefixes
        for k in range(0, len(misspelled) + 1):
            prefix = misspelled[:k]
            for ax in d.prefixes.get(prefix, ()):
                if ax.flag not in root_flags or not ax.cross:
                    continue
                strip_len = len(ax.strip)
                for suffixed in cross_products:
                    stem_len = len(suffixed) - strip_len
                    if stem_len >= 0 and ax.condition(
                            suffixed[strip_len:strip_len + stem_len]):
                        result.add(prefix + suffixed[strip_len:])
        # pure prefixes
        for k in range(0, len(misspelled) + 1):
            prefix = misspelled[:k]
            for ax in d.prefixes.get(prefix, ()):
                strip_len = len(ax.strip)
                stem_len = len(root_word) - strip_len
                if (compatible(ax) and stem_len >= 0
                        and ax.condition(root_word[strip_len:])):
                    result.add(prefix + root_word[strip_len:])
        return list(result)[:self.MAX_WORDS]

    # -- ranking ---------------------------------------------------------------
    def _rank(self, word, expanded):
        fact = (10.0 - self.d.max_diff) / 5.0
        ranked = []
        seen = set()
        for sc, guess in expanded:
            lower = self.d._case_fold_str(guess)
            if lower == word:
                ranked.append((sc + 2000, guess))
                break
            re_score = (_any_mismatch_ngram(2, word, lower, True)
                        + _any_mismatch_ngram(2, lower, word, True))
            score = (2 * _lcs(word, lower)
                     - abs(len(word) - len(lower))
                     + _common_char_position_score(word, lower)
                     + _common_prefix(word, lower)
                     + _any_mismatch_ngram(4, word, lower, False)
                     + re_score
                     + (-1000 if re_score
                        < (len(word) + len(lower)) * fact else 0))
            if (score, guess) not in seen:
                seen.add((score, guess))
                ranked.append((score, guess))
        ranked.sort(key=lambda t: (-t[0], t[1]))
        return ranked

    def _most_relevant(self, ranked, prev):
        out = []
        has_excellent = False
        for score, guess in ranked:
            if score > 1000:
                has_excellent = True
            elif has_excellent:
                break
            bad = score < -100
            if bad and (out or self.d.only_max_diff):
                break
            if (not any(p in guess for p in prev)
                    and not any(p in guess for p in out)
                    and self.speller._check_word(guess, None)):
                out.append(guess)
                if len(out) >= self.d.max_ngram_suggestions:
                    break
            if bad:
                break
        return out


@lru_cache(maxsize=16)
def _load_checker(aff_path: str, dic_path: str) -> HunspellChecker:
    with open(aff_path, "rb") as f:
        aff_bytes = f.read()
    aff = decode_hunspell(aff_bytes)
    with open(dic_path, "rb") as f:
        dic = f.read().decode(_charset_of(aff_bytes), errors="replace")
    return HunspellChecker(HunspellDictionary(aff, [dic]))


def hunspell_spell_series(terms, aff_path: str, dic_path: str):
    """Vocabulary-level spell check for a token Series/array → boolean
    ndarray (the distributed spell-audit shape: factorize once per
    Arrow batch, one spell() call per DISTINCT token — Heaps' law makes
    this sublinear in corpus size; dictionaries load once per executor
    via the lru_cache, shipped with --files on a real cluster)."""
    ck = _load_checker(aff_path, dic_path)
    codes, uniq = pd.factorize(np.asarray(terms, dtype=object))
    ok = np.array([ck.spell(u) for u in uniq], dtype=bool)
    out = np.zeros(len(codes), dtype=bool)
    mask = codes >= 0
    out[mask] = ok[codes[mask]]
    return out


def hunspell_suggest_series(terms, aff_path: str, dic_path: str,
                            max_suggestions: int = 5):
    """Per-distinct-token suggestions → list-of-lists aligned with the
    input (empty list for correctly spelled tokens)."""
    ck = _load_checker(aff_path, dic_path)
    codes, uniq = pd.factorize(np.asarray(terms, dtype=object))
    per_uniq = [([] if ck.spell(u)
                 else ck.suggest(u)[:max_suggestions]) for u in uniq]
    return [per_uniq[c] if c >= 0 else [] for c in codes]
