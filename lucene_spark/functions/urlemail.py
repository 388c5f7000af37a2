"""UAX29URLEmailTokenizer — URLs and emails as single tokens.

Reference: ``analysis/common/.../email/UAX29URLEmailTokenizerImpl.jflex``
— the grammar macros (RFC 3986/5321-derived URL and EMAIL productions
over the IANA TLD list) transcribed to Python regexes, with the
scanner's dispatch semantics reproduced:

  * longest match wins across {URL, bare-strict-host, EMAIL, word},
    ties by that rule order (the jflex file order);
  * LUCENE-5391 avoid-bad-URL: a bare strict host whose LONGEST match
    is followed by ``[-\\w]`` is NOT a URL — the text re-lexes as words
    (emulated by suppressing the bare-host candidate at that position);
  * a bare host at end-of-input is not a URL (the jflex rule requires
    one lookahead character);
  * ``mailto:addr@host`` yields ``mailto`` as a word and the address as
    an EMAIL (falls out of the word pattern naturally here).

Non-URL/EMAIL text falls back to the engine's standard word pattern
(documented UAX#29 subset — ``functions/analysis.py``); the reference's
emoji and script-specific word rules are out of scope. Parity is pinned
by the reference's own extraction corpora
(``random.text.with.{urls,email.addresses}.txt`` vs their expected
token lists) in ``tests/test_urlemail.py``.

The TLD alternation (1489 entries, longest-first so the regex engine
emulates the DFA's longest-match) lives in ``_tlds.py``, generated from
the reference's ASCIITLD.jflex (public IANA data).

Throughput: the grammar regexes are only attempted at non-whitespace
runs containing one of ``.@:["`` (a URL always carries ``.``/``:``/
``[``, an EMAIL ``@`` or a quoted local part — they cannot cross
whitespace); plain stretches batch through the standard word pattern.
Single core: ~7 MB/s plain prose, ~2-3 MB/s URL/email-dense text
(vs ~20 MB/s for the standard tokenizer) — the scan parallelizes per
doc across executors like every analyzer stage.
"""

from __future__ import annotations

import re

from ._tlds import TLDS
from .analysis import TOKEN_PATTERN

__all__ = ["url_email_tokens", "URL_RE", "EMAIL_RE"]

_TLD_ALT = "|".join(TLDS)
# "." ( TLD ) "."?  — accept trailing root (empty) domain
_ASCIITLD = r"\.(?i:%s)\.?" % _TLD_ALT

_DOMAIN_LABEL = r"[A-Za-z0-9](?:[-A-Za-z0-9]*[A-Za-z0-9])?"
_DOMAIN_SEQ = rf"{_DOMAIN_LABEL}(?:\.{_DOMAIN_LABEL})*"
_DOMAIN_STRICT = rf"{_DOMAIN_SEQ}(?:{_ASCIITLD})"
_DOMAIN_LOOSE = _DOMAIN_SEQ

# longest-first so the backtracking engine emulates DFA longest-match
_IPV4_OCTET = r"(?:2(?:5[0-5]|[0-4][0-9])|1[0-9][0-9]|0?[1-9][0-9]|0{0,2}[0-9])"
_IPV4 = rf"{_IPV4_OCTET}(?:\.{_IPV4_OCTET}){{3}}"
_H16 = r"[0-9A-Fa-f]{1,4}"
_LS32 = rf"(?:{_IPV4}|{_H16}:{_H16})"
_IPV6 = "(?:" + "|".join((
    rf"(?:{_H16}:){{6}}{_LS32}",
    rf"::(?:{_H16}:){{5}}{_LS32}",
    rf"(?:{_H16})?::(?:{_H16}:){{4}}{_LS32}",
    rf"(?:(?:{_H16}:)?{_H16})?::(?:{_H16}:){{3}}{_LS32}",
    rf"(?:(?:{_H16}:){{0,2}}{_H16})?::(?:{_H16}:){{2}}{_LS32}",
    rf"(?:(?:{_H16}:){{0,3}}{_H16})?::{_H16}:{_LS32}",
    rf"(?:(?:{_H16}:){{0,4}}{_H16})?::{_LS32}",
    rf"(?:(?:{_H16}:){{0,5}}{_H16})?::{_H16}",
    rf"(?:(?:{_H16}:){{0,6}}{_H16})?::",
)) + ")"

_UNRESERVED = r"[-._~A-Za-z0-9]"
_PCT = r"%[0-9A-Fa-f]{2}"
_SUBDELIMS = r"[!$&'()*+,;=]"
_LOGIN_SEG = rf"(?:{_UNRESERVED}|{_PCT}|{_SUBDELIMS})*"
_LOGIN = rf"{_LOGIN_SEG}(?::{_LOGIN_SEG})?@"
_QUERY = rf"\?(?:{_UNRESERVED}|{_PCT}|{_SUBDELIMS}|[:@/?])*"
_FRAGMENT = rf"\#(?:{_UNRESERVED}|{_PCT}|{_SUBDELIMS}|[:@/?])*"
_PORT = r":[0-9]{1,5}"
_HOST_STRICT = rf"(?:\[{_IPV6}\]|{_IPV4}|{_DOMAIN_STRICT})"
_HOST_LOOSE = rf"(?:\[{_IPV6}\]|{_IPV4}|{_DOMAIN_LOOSE})"
_AUTH_LOOSE = rf"(?:{_LOGIN})?{_HOST_LOOSE}(?:{_PORT})?"

_HTTP_SEG = rf"(?:{_UNRESERVED}|{_PCT}|[;:@&=])*"
_HTTP_PATH = rf"(?:/{_HTTP_SEG})+"
_HTTP_FULL = (rf"(?i:https?)://(?:{_LOGIN})?{_HOST_LOOSE}(?:{_PORT})?"
              rf"(?:{_HTTP_PATH})?(?:{_QUERY})?(?:{_FRAGMENT})?")
# host + at least one of port/path/query/fragment
_HTTP_NOSCHEME = (rf"{_HOST_STRICT}"
                  rf"(?:{_PORT}(?:{_HTTP_PATH})?(?:{_QUERY})?(?:{_FRAGMENT})?"
                  rf"|(?:{_PORT})?{_HTTP_PATH}(?:{_QUERY})?(?:{_FRAGMENT})?"
                  rf"|(?:{_PORT})?(?:{_HTTP_PATH})?{_QUERY}(?:{_FRAGMENT})?"
                  rf"|(?:{_PORT})?(?:{_HTTP_PATH})?(?:{_QUERY})?{_FRAGMENT})")

_FTP_SEG = rf"(?:{_UNRESERVED}|{_PCT}|[?:@&=])*"
_FTP_PATH = rf"/{_FTP_SEG}(?:/{_FTP_SEG})*"
_FTP = (rf"(?i:ftp)://{_AUTH_LOOSE}{_FTP_PATH}"
        rf"(?:;(?i:type)=[aAiIdD])?(?:{_FRAGMENT})?")
_FILE = rf"(?i:file)://(?:{_HOST_LOOSE})?{_FTP_PATH}(?:{_FRAGMENT})?"

URL_RE = re.compile(rf"(?:{_HTTP_FULL}|{_FTP}|{_FILE}|{_HTTP_NOSCHEME})")
_BARE_HOST_RE = re.compile(_HOST_STRICT)

_EMAIL_QUOTED = (r'"(?:[\x01-\x08\x0B\x0C\x0E-\x21\x23-\x5B\x5D-\x7E]'
                 r'|\\[\x00-\x7F])*"')
_EMAIL_ATOM = r"[A-Za-z0-9!#$%&'*+\-/=?^_`{|}~]"
_EMAIL_LABEL = rf"(?:{_EMAIL_ATOM}+|{_EMAIL_QUOTED})"
_EMAIL_LOCAL = rf"{_EMAIL_LABEL}(?:\.{_EMAIL_LABEL})*"
_EMAIL_LITERAL_TEXT = (r'(?:[\x01-\x08\x0B\x0C\x0E-\x5A\x5E-\x7F]'
                       r'|\\[\x00-\x7F])')
_EMAIL_BRACKET = rf"\[{_EMAIL_LITERAL_TEXT}*\]"
EMAIL_RE = re.compile(
    rf"{_EMAIL_LOCAL}@(?:{_DOMAIN_STRICT}|{_EMAIL_BRACKET})")

_WORD_RE = re.compile(TOKEN_PATTERN, re.UNICODE)
_SKIP_RE = re.compile(r"\s+")
_WORDCHAR_RE = re.compile(r"[-\w]")
# fast-path gate: every URL contains '.', ':' or '[' and every EMAIL
# contains '@' (or starts a quoted local part) before the next
# whitespace — a non-whitespace run without any of these can only be
# plain words, so the expensive grammar regexes are skipped entirely
_MAYBE_SPECIAL_RE = re.compile(r'[^.@:\["\s]*[.@:\["]')


def url_email_tokens(text: str):
    """Scan ``text`` into (token, type) pairs; type in
    {'URL', 'EMAIL', 'word'}."""
    out = []
    i, n = 0, len(text)
    while i < n:
        m = _SKIP_RE.match(text, i)
        if m is not None:
            i = m.end()
            continue
        if _MAYBE_SPECIAL_RE.match(text, i) is None:
            # batch the whole plain stretch up to the next non-ws run
            # that contains a special char: no URL/EMAIL can start
            # before it (they cannot cross whitespace), and no word can
            # span the boundary (the boundary is a run start)
            m = _MAYBE_SPECIAL_RE.search(text, i)
            bound = m.start() if m is not None else n
            for w in _WORD_RE.finditer(text, i, bound):
                out.append((w.group(), "word"))
            i = bound if bound > i else i + 1
            continue
        best, best_type, best_prio = None, None, 9
        m_url = URL_RE.match(text, i)
        if m_url is not None and m_url.end() > i:
            best, best_type, best_prio = m_url.end(), "URL", 0
        m_host = _BARE_HOST_RE.match(text, i)
        if m_host is not None and m_host.end() > i:
            # LUCENE-5391: the longest bare-host match must be followed
            # by a non-word char (and must not sit at end-of-input)
            e = m_host.end()
            if e < n and not _WORDCHAR_RE.match(text, e):
                if e > (best or 0):
                    best, best_type, best_prio = e, "URL", 1
        m_email = EMAIL_RE.match(text, i)
        if m_email is not None and m_email.end() > (best or 0):
            best, best_type, best_prio = m_email.end(), "EMAIL", 2
        m_word = _WORD_RE.match(text, i)
        if m_word is not None and m_word.end() > (best or 0):
            best, best_type, best_prio = m_word.end(), "word", 3
        if best is None:
            i += 1
            continue
        out.append((text[i:best], best_type))
        i = best
    return out
