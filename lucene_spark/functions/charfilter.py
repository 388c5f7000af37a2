"""Char filters — pre-tokenizer text normalizers (HTML strip + mapping).

Reference: ``analysis/common/.../charfilter/HTMLStripCharFilter.jflex``
(the generated scanner in HTMLStripCharFilter.java), ``MappingCharFilter
.java`` and ``NormalizeCharMap.java``. A char filter runs in
``Analyzer.initReader`` — BEFORE the tokenizer — so here it is a plain
``str -> str`` transform applied per document inside the same Arrow batch
UDF that runs the analyzer chain (no extra Spark stage, no per-token
Python).

``html_strip`` re-expresses the reference's jflex state machine as a
hand-written scanner with the same observable output:

  * start/end tags: inline elements (the jflex ``InlineElment`` set:
    a/b/i/span/em/strong/...) are deleted outright, every other tag is
    replaced by ``\\n`` (BLOCK_LEVEL_*_TAG_REPLACEMENT), ``<br>`` in any
    form becomes ``\\n``;
  * ``<script>``/``<style>`` elements lose their entire content
    (replaced by one ``\\n``), honouring embedded ``<!-- -->`` comments
    with quoted strings so a ``</script>`` inside a JS string literal
    does not close the element;
  * comments ``<!-- ... -->`` (including the ``<!---`` 3-dash form and
    nested ``<!--#`` server-side includes with quoted sections) and
    ``<! ... >`` declarations vanish without replacement; ``<![CDATA[
    ... ]]>`` keeps its content verbatim; ``<? ... ?>``/``<? ... />``
    processing instructions vanish;
  * character entities decode: the HTML 4.0 named set (identical to
    Python's ``html.entities.entitydefs`` — verified 253/253 against the
    reference table, with the reference's ``nbsp -> ' '`` override and
    ``apos``), the six accepted uppercase variants (QUOT/COPY/GT/LT/REG/
    AMP), decimal/hex numeric references bounded at U+10FFFF (lone
    surrogates -> U+FFFD, paired surrogate references combined), and
    anything unrecognized passes through verbatim;
  * ``escaped_tags``: tag names (case-insensitive) whose start/end tags
    are emitted verbatim instead of stripped — for script/style the
    element content is still dropped (reference ``escapeSCRIPT``
    semantics, see TestHTMLStripCharFilter.testEscapeScript);
  * malformed input degrades exactly like the reference where a ``<``
    before the closing ``>`` inhibits tag recognition and unterminated
    constructs are emitted verbatim (goldens transcoded from
    TestHTMLStripCharFilter.testMalformedHTML).

Offset correction is intentionally out of scope: this engine stores
term-vector offsets only for the plain standard chain, and the build
path rejects ``char_filters`` + offset-bearing term vectors.

``mapping_char_filter`` is NormalizeCharMap's greedy longest-match
rewrite (single left-to-right pass, no rescanning of replacement text —
``aaaa`` with ``aa->a`` gives ``aa``, matching
TestMappingCharFilter.testChained's single-pass expectations).
"""

from __future__ import annotations

import html.entities
import re

__all__ = [
    "html_strip",
    "compile_mapping",
    "mapping_char_filter",
    "compile_char_filters",
    "HTML_ENTITIES",
]

# ---------------------------------------------------------------------------
# Entity table: HTML 4.0 set (== html.entities.entitydefs, verified against
# the reference's HTMLCharacterEntities.jflex table) + XML apos + the
# reference's nbsp->' ' override + the six uppercase variants it accepts.
# ---------------------------------------------------------------------------
HTML_ENTITIES: dict[str, str] = dict(html.entities.entitydefs)
HTML_ENTITIES["apos"] = "'"
HTML_ENTITIES["nbsp"] = " "
for _lc in ("quot", "copy", "gt", "lt", "reg", "amp"):
    HTML_ENTITIES[_lc.upper()] = HTML_ENTITIES[_lc]

# InlineElment set from HTMLStripCharFilter.jflex:116 — deleted with no
# replacement; all other element names substitute '\n'.
_INLINE = frozenset((
    "a", "b", "i", "q", "s", "u", "abbr", "acronym", "basefont", "bdo",
    "big", "cite", "code", "dfn", "em", "font", "img", "input", "kbd",
    "label", "samp", "select", "small", "span", "strike", "strong",
    "sub", "sup", "textarea", "tt", "var",
))

_SPECIAL = re.compile(r"[<&]")

# XML Name production (jflex: [:_ID_Start][-.:_ID_Continue]*); Python's
# [^\W\d] ~= ID_Start (letters + underscore), \w adds the digits.
_NAME = re.compile(r"(?:[:_]|[^\W\d])[-.:_\w]*")

_SQ = r"'(?:\\.|[^'])*'"
_DQ = r'"(?:\\.|[^"])*"'
# ServerSideInclude: "<!--#" ( [^'"] | SingleQuoted | DoubleQuoted )* "-->"
_SSI = r"<!--#(?:%s|%s|[^'\"])*?-->" % (_SQ, _DQ)
_EVENT_SUFFIX = ("abort|blur|change|click|dblclick|error|focus|keydown|"
                 "keypress|keyup|load|mousedown|mousemove|mouseout|"
                 "mouseover|mouseup|reset|select|submit|unload")
_EVENT = r"(?i:on(?:%s))\s*=\s*(?:%s|%s)" % (_EVENT_SUFFIX, _SQ, _DQ)
# OpenTagContent: quoted on[event] values and SSIs may contain < and >;
# everything else inside a tag may not.
_OTC = r"(?:%s|%s|[^<>])*" % (_EVENT, _SSI)

_PI = re.compile(r"\?[^>]*[/?]>", re.S)
_START_TAIL = re.compile(r"(?:(?:=\s*|\s+)%s)?\s*/?>" % _OTC, re.S)
_BR_FULL = re.compile(r"\s*[bB][rR](?:(?:=\s*|\s+)%s)?\s*/?>" % _OTC, re.S)
_SCRIPT_OPEN = re.compile(
    r"\s*[sS][cC][rR][iI][pP][tT](?:\s+%s)?\s*>" % _OTC, re.S)
_STYLE_OPEN = re.compile(
    r"\s*[sS][tT][yY][lL][eE](?:\s+%s)?\s*>" % _OTC, re.S)
_WS = re.compile(r"\s+")
_END_BR = re.compile(r"[bB][rR]\s*>")
_END_TAIL = re.compile(r"\s*>")

_ENT_NAMED = re.compile(r"&([A-Za-z][A-Za-z0-9]*);")
_ENT_DEC = re.compile(r"&#([0-9]+);")
_ENT_HEX = re.compile(r"&#[xX]([0-9A-Fa-f]+);")
# Paired UTF-16 surrogate references (dec/hex high + dec/hex low).
_ENT_SURROGATE_PAIR = re.compile(
    r"&#(?:(5[56][0-9]{3})|[xX]([dD][89abAB][0-9A-Fa-f]{2}));"
    r"&#(?:(5[67][0-9]{3})|[xX]([dD][c-fC-F][0-9A-Fa-f]{2}));")

_SCRIPT_NEXT = re.compile(r"<!--|</\s*[sS][cC][rR][iI][pP][tT]\s*>")
_STYLE_NEXT = re.compile(r"<!--|</\s*[sS][tT][yY][lL][eE]\s*>")
_COMMENT_NEXT = re.compile(r"-->|<!--#")
_EMBEDDED_COMMENT_NEXT = re.compile(r"-->|<!--#|['\"]")
_SQ_TAIL = re.compile(r"(?:\\.|[^'])*'", re.S)
_DQ_TAIL = re.compile(r'(?:\\.|[^"])*"', re.S)


def _skip_quoted(text: str, i: int, quote: str) -> int:
    """Past a quoted section starting AFTER the opening quote at i."""
    m = (_SQ_TAIL if quote == "'" else _DQ_TAIL).match(text, i)
    return m.end() if m else len(text)


def _skip_ssi(text: str, i: int) -> int:
    """SERVER_SIDE_INCLUDE state: i points after '<!--#'."""
    n = len(text)
    while i < n:
        c = text[i]
        if text.startswith("-->", i):
            return i + 3
        if c == "'" or c == '"':
            i = _skip_quoted(text, i + 1, c)
        else:
            i += 1
    return n


def _skip_comment(text: str, i: int) -> int:
    """COMMENT state: i points after '<!--'. Nothing is emitted."""
    n = len(text)
    while i < n:
        m = _COMMENT_NEXT.search(text, i)
        if m is None:
            return n
        if m.group() == "-->":
            return m.end()
        i = _skip_ssi(text, m.end())
    return n


def _skip_embedded_comment(text: str, i: int) -> int:
    """SCRIPT_COMMENT / STYLE_COMMENT: like COMMENT but quote-aware."""
    n = len(text)
    while i < n:
        m = _EMBEDDED_COMMENT_NEXT.search(text, i)
        if m is None:
            return n
        g = m.group()
        if g == "-->":
            return m.end()
        if g == "<!--#":
            i = _skip_ssi(text, m.end())
        else:
            i = _skip_quoted(text, m.end(), g)
    return n


def _element_body(text: str, i: int, out: list, nxt: re.Pattern,
                  escaped: bool) -> int:
    """SCRIPT/STYLE content: dropped; close tag -> '\\n' (verbatim when
    the tag is escaped). i points after the open tag's '>'."""
    n = len(text)
    while i < n:
        m = nxt.search(text, i)
        if m is None:
            return n
        if m.group() == "<!--":
            i = _skip_embedded_comment(text, m.end())
        else:  # close tag
            out.append(m.group() if escaped else "\n")
            return m.end()
    return n


def _decode_entity(text: str, i: int, out: list) -> int:
    """AMPERSAND/NUMERIC_CHARACTER states; i points at '&'. On any
    non-match the reference emits the consumed prefix verbatim and
    rescans only text it already treats as plain — output-equivalent to
    emitting '&' and rescanning from i+1."""
    m = _ENT_SURROGATE_PAIR.match(text, i)
    if m is not None:
        hi = int(m.group(1)) if m.group(1) else int(m.group(2), 16)
        lo = int(m.group(3)) if m.group(3) else int(m.group(4), 16)
        if 0xD800 <= hi <= 0xDBFF and 0xDC00 <= lo <= 0xDFFF:
            out.append(chr(0x10000 + ((hi - 0xD800) << 10) + (lo - 0xDC00)))
            return m.end()
    m = _ENT_DEC.match(text, i)
    if m is not None:
        if len(m.group(1)) <= 7 and int(m.group(1)) <= 0x10FFFF:
            cp = int(m.group(1))
            out.append("�" if 0xD800 <= cp <= 0xDFFF else chr(cp))
        else:
            out.append(m.group())  # out-of-range: verbatim
        return m.end()
    m = _ENT_HEX.match(text, i)
    if m is not None:
        if len(m.group(1)) <= 6 and int(m.group(1), 16) <= 0x10FFFF:
            cp = int(m.group(1), 16)
            out.append("�" if 0xD800 <= cp <= 0xDFFF else chr(cp))
        else:
            out.append(m.group())
        return m.end()
    m = _ENT_NAMED.match(text, i)
    if m is not None:
        sub = HTML_ENTITIES.get(m.group(1))
        if sub is not None:
            out.append(sub)
            return m.end()
    out.append("&")
    return i + 1


def _end_tag(text: str, i: int, out: list, esc: frozenset) -> int:
    """LEFT_ANGLE_BRACKET_SLASH: i points at '<', text[i+1] == '/'."""
    j = i + 2
    mws = _WS.match(text, j)
    if mws is not None:
        j = mws.end()
    mbr = _END_BR.match(text, j)
    if mbr is not None:
        out.append(text[i:mbr.end()] if "br" in esc else "\n")
        return mbr.end()
    mname = _NAME.match(text, j)
    if mname is None:
        out.append(text[i:j])  # '</' (+ws) verbatim, rescan after
        return j
    tail = _END_TAIL.match(text, mname.end())
    if tail is None:
        out.append(text[i:mname.end()])  # tag recognition failed
        return mname.end()
    name = mname.group().lower()
    if name in esc:
        out.append(text[i:tail.end()])
    elif name not in _INLINE:
        out.append("\n")
    return tail.end()


def _start_tag(text: str, i: int, out: list, esc: frozenset) -> int:
    """LEFT_ANGLE_BRACKET (+SPACE / tag-tail states): text[i] == '<'.
    jflex longest-match across the competing first-step rules: the full
    br/script/style/PI patterns vs the bare element Name."""
    j = i + 1
    mpi = _PI.match(text, j)
    if mpi is not None:
        return mpi.end()  # processing instruction: dropped
    mbr = _BR_FULL.match(text, j)
    mscript = _SCRIPT_OPEN.match(text, j)
    mstyle = _STYLE_OPEN.match(text, j)
    mws = _WS.match(text, j)
    k = mws.end() if mws is not None else j
    mname = _NAME.match(text, k)
    name_len = (k - j) + len(mname.group()) if mname is not None else -1

    best = max(m.end() - j if m is not None else -1
               for m in (mbr, mscript, mstyle))
    if best >= 0 and best >= name_len:
        if mbr is not None and mbr.end() - j == best:
            out.append(text[i:mbr.end()] if "br" in esc else "\n")
            return mbr.end()
        if mscript is not None and mscript.end() - j == best:
            escaped = "script" in esc
            if escaped:
                out.append(text[i:mscript.end()])
            return _element_body(text, mscript.end(), out, _SCRIPT_NEXT,
                                 escaped)
        escaped = "style" in esc
        if escaped:
            out.append(text[i:mstyle.end()])
        return _element_body(text, mstyle.end(), out, _STYLE_NEXT, escaped)

    if mname is None:
        out.append(text[i:k] if k > j else "<")
        return k if k > j else i + 1
    tail = _START_TAIL.match(text, mname.end())
    if tail is None:
        out.append(text[i:mname.end()])  # '<' (+ws) + name verbatim
        return mname.end()
    name = mname.group().lower()
    if name in esc:
        out.append(text[i:tail.end()])
    elif name not in _INLINE:
        out.append("\n")
    return tail.end()


def _bang(text: str, i: int, out: list) -> int:
    """BANG state: text[i:i+2] == '<!'."""
    if text.startswith("--", i + 2):
        return _skip_comment(text, i + 4)
    if text.startswith("[CDATA[", i + 2):
        end = text.find("]]>", i + 9)
        if end < 0:
            out.append(text[i + 9:])  # unterminated: content verbatim
            return len(text)
        out.append(text[i + 9:end])
        return end + 3
    # declaration: silently dropped through the first '>'; unterminated
    # angle-bang emits everything verbatim (testUnclosedAngleBang)
    end = text.find(">", i + 2)
    if end < 0:
        out.append(text[i:])
        return len(text)
    return end + 1


def html_strip(text: str, escaped_tags=None) -> str:
    """Strip HTML/XML markup, matching HTMLStripCharFilter's output."""
    if not text:
        return text
    esc = (frozenset(t.lower() for t in escaped_tags)
           if escaped_tags else frozenset())
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        m = _SPECIAL.search(text, i)
        if m is None:
            out.append(text[i:])
            break
        if m.start() > i:
            out.append(text[i:m.start()])
        i = m.start()
        if text[i] == "&":
            i = _decode_entity(text, i, out)
            continue
        nxt = text[i + 1:i + 2]
        if nxt == "!":
            i = _bang(text, i, out)
        elif nxt == "/":
            i = _end_tag(text, i, out, esc)
        elif nxt == "":
            out.append("<")
            i += 1
        else:
            i = _start_tag(text, i, out, esc)
    return "".join(out)


# ---------------------------------------------------------------------------
# MappingCharFilter
# ---------------------------------------------------------------------------

def compile_mapping(pairs):
    """NormalizeCharMap: greedy longest-match single-pass rewriting
    (reference ``charfilter/MappingCharFilter.java`` — the FST walk
    always takes the longest matching input sequence; replacement text
    is never rescanned). ``pairs`` is a dict or iterable of (match,
    replacement) with non-empty match strings."""
    table = dict(pairs)
    if any(not k for k in table):
        raise ValueError("mapping match strings must be non-empty")
    # Longest alternative first == FST longest-match at each position.
    alt = "|".join(re.escape(k)
                   for k in sorted(table, key=len, reverse=True))
    rx = re.compile(alt)
    def _apply(text: str) -> str:
        if not text:
            return text
        return rx.sub(lambda m: table[m.group()], text)
    return _apply


def mapping_char_filter(text: str, pairs) -> str:
    return compile_mapping(pairs)(text)


def compile_char_filters(specs):
    """Compile a char-filter chain spec into one ``str -> str`` callable.

    ``specs`` is a tuple of entries, applied in order:
      ``("html_strip",)`` or ``("html_strip", (escaped, tags...))``
      ``("mapping", ((match, replacement), ...))``
    Returns None for an empty spec.
    """
    if not specs:
        return None
    fns = []
    for spec in specs:
        kind = spec[0]
        if kind == "html_strip":
            escaped = frozenset(spec[1]) if len(spec) > 1 and spec[1] else None
            fns.append(lambda t, _e=escaped: html_strip(t, _e))
        elif kind == "mapping":
            fns.append(compile_mapping(spec[1]))
        elif kind == "hyphenated_words":
            # HyphenatedWordsFilter (reference ``miscellaneous/
            # HyphenatedWordsFilter.java``) re-expressed pre-tokenizer:
            # a token's TRAILING hyphen joins it to the next whitespace-
            # separated token ("ecologi-\ncal" -> "ecological"); internal
            # hyphens and a stream-final trailing hyphen survive — the
            # emitted token sequence (and compacted positions) equals the
            # reference filter's over a whitespace tokenizer.
            fns.append(_HYPHEN_JOIN)
        elif kind == "icu_normalize":
            # ICUNormalizer2CharFilter (icu/ICUNormalizer2CharFilter
            # .java): normalize the raw text BEFORE the tokenizer.
            # spec = ("icu_normalize",) -> nfkc_cf, or
            # ("icu_normalize", "nfc"|"nfkc"|"nfkc_cf"|"utr30").
            # (This engine's char filters don't track offset deltas —
            # same documented trait as html_strip.)
            from .icunorm import normalize as _icu_norm
            which = spec[1] if len(spec) > 1 else "nfkc_cf"
            fns.append(lambda t, _w=which: _icu_norm(t, _w))
        else:
            raise ValueError(f"unknown char filter {kind!r}")
    if len(fns) == 1:
        return fns[0]
    def _chain(text: str) -> str:
        for f in fns:
            text = f(text)
        return text
    return _chain


_HYPHEN_RE = re.compile(r"-\s+")


def _HYPHEN_JOIN(text: str) -> str:
    return _HYPHEN_RE.sub("", text) if text else text
