"""Light / minimal stemmer family for 12 languages.

Each stemmer is a pure function ``lowercase token -> stem`` implementing a
published algorithm; all are applied at the *vocabulary* level inside the
analyzer Arrow UDF (each unique token stemmed once per batch, mapped back
through factorize codes — see ``analysis.py``), so per-token Python cost
never touches the hot path.

Algorithms and their reference counterparts (cited for parity checking —
these are independent Python implementations of the published rules, not
translations of the Java classes):

* German light / minimal, French light, Portuguese light, Hungarian
  light — J. Savoy, "Light Stemming Approaches for the French,
  Portuguese, German and Hungarian Languages", ACM SAC 2006 (UniNE).
  Reference: ``analysis/common/.../de/GermanLightStemmer.java``,
  ``de/GermanMinimalStemmer.java``, ``fr/FrenchLightStemmer.java``,
  ``pt/PortugueseLightStemmer.java``, ``hu/HungarianLightStemmer.java``.
* French minimal — J. Savoy, "A stemming procedure and stopword list
  for general French corpora" (JASIS 50, 1999).
  Reference: ``fr/FrenchMinimalStemmer.java``.
* Spanish / Italian / Russian / Swedish / Finnish light — J. Savoy,
  "Report on CLEF-2003 monolingual tracks" (UniNE light stemmers).
  Reference: ``es/SpanishLightStemmer.java``, ``it/ItalianLightStemmer
  .java``, ``ru/RussianLightStemmer.java``, ``sv/SwedishLightStemmer
  .java``, ``fi/FinnishLightStemmer.java``.
* Norwegian light / minimal — reference ``no/NorwegianLightStemmer
  .java``, ``no/NorwegianMinimalStemmer.java`` (Bokmål / Nynorsk flag
  model preserved).
* English minimal (plural-only, "S-stemmer") — D. Harman, "How
  effective is suffixing?" (JASIS 42, 1991) as specialised in
  ``en/EnglishMinimalStemmer.java``.
* Portuguese / Galician minimal — the Plural step of RSLP: V. Orengo &
  C. Huyck, "A Stemming Algorithm for the Portuguese Language", SPIRE
  2001; rule tables from the reference's published ``portuguese.rslp``
  / ``galician.rslp`` resource data (data, not code).
  Reference: ``pt/RSLPStemmerBase.java``, ``pt/PortugueseMinimalStemmer
  .java``, ``gl/GalicianMinimalStemmer.java``.
* Spanish plural — ``es/SpanishPluralStemmer.java`` (invariant /
  special-case lists are published resource data).

Every stemmer is golden-tested against the reference's published test
vocabularies (``tests/data/stem_goldens/``, deterministically sampled
from the ``*testdata.zip`` fixtures) — see ``tests/test_lightstem.py``.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# character normalization tables


def _tr(pairs: dict[str, str]) -> dict[int, str]:
    table: dict[str, str] = {}
    for srcs, dst in pairs.items():
        for ch in srcs:
            table[ch] = dst
    return str.maketrans(table)


# Romance-language accent folding (the UniNE stemmers share this shape)
_ROMANCE_NORM = _tr({"àáâä": "a", "òóôö": "o", "èéêë": "e",
                     "ùúûü": "u", "ìíîï": "i"})
_DE_LIGHT_NORM = _tr({"äàáâ": "a", "öòóô": "o", "ïìíî": "i", "üùúû": "u"})
_DE_MIN_NORM = _tr({"ä": "a", "ö": "o", "ü": "u"})
_FR_NORM = _tr({"àáâ": "a", "ô": "o", "èéê": "e", "ùû": "u",
                "î": "i", "ç": "c"})
_PT_NORM = _tr({"àáâäã": "a", "òóôöõ": "o", "èéêë": "e",
                "ùúûü": "u", "ìíîï": "i", "ç": "c"})
_FI_NORM = _tr({"äå": "a", "ö": "o"})
_HU_NORM = _tr({"á": "a", "ëé": "e", "í": "i", "óőõö": "o",
                "úűũûü": "u"})

_VOWELS = frozenset("aeiou")
_VOWELS_Y = frozenset("aeiouy")


def _collapse_runs(w: str, letters: frozenset[str] | None = None) -> str:
    """Collapse consecutive runs of the same character to one occurrence.

    ``letters=None`` collapses any alphabetic run (French light norm);
    a set restricts collapsing to runs of those characters (Finnish
    k/p/t).
    """
    out = [w[0]]
    for ch in w[1:]:
        if ch == out[-1] and (ch in letters if letters is not None
                              else ch.isalpha()):
            continue
        out.append(ch)
    return "".join(out)


# ---------------------------------------------------------------------------
# German

_DE_ST_END = frozenset("bdfghklmnt")


def stem_german_light(w: str) -> str:
    """UniNE German light: fold umlauts/accents, two suffix passes."""
    w = w.translate(_DE_LIGHT_NORM)
    n = len(w)
    if n > 5 and w.endswith("ern"):
        w = w[:-3]
    elif n > 4 and w[-2] == "e" and w[-1] in "mnrs":
        w = w[:-2]
    elif n > 3 and w[-1] == "e":
        w = w[:-1]
    elif n > 3 and w[-1] == "s" and w[-2] in _DE_ST_END:
        w = w[:-1]
    n = len(w)
    if n > 5 and w.endswith("est"):
        return w[:-3]
    if n > 4 and (w.endswith("er") or w.endswith("en")):
        return w[:-2]
    if n > 4 and w.endswith("st") and w[-3] in _DE_ST_END:
        return w[:-2]
    return w


def german_normalize(w: str) -> str:
    """GermanNormalizationFilter (de/GermanNormalizationFilter.java):
    snowball German2 folding — umlauts to base vowels, ß -> ss, and
    'e' deleted after an a/o/u that wasn't preceded by a vowel-state
    blocker (so 'ae'/'oe'/'ue' digraphs fold, 'ie'/'ee' don't)."""
    N, V, U = 0, 1, 2
    state = N
    out: list[str] = []
    for c in w:
        if c in "ao":
            state = U
        elif c == "u":
            state = U if state == N else V
        elif c == "e":
            if state == U:
                state = V
                continue                              # delete the e
            state = V
        elif c in "iqy":
            state = V
        elif c == "ä":
            c = "a"
            state = V
        elif c == "ö":
            c = "o"
            state = V
        elif c == "ü":
            c = "u"
            state = V
        elif c == "ß":
            out.append("s")
            c = "s"
            state = N
        else:
            state = N
        out.append(c)
    return "".join(out)


def stem_german(w: str) -> str:
    """GermanAnalyzer chain role: normalization then light stem
    (de/GermanAnalyzer.java:135-137)."""
    return stem_german_light(german_normalize(w))


def stem_german_minimal(w: str) -> str:
    """UniNE German minimal: plural/case endings only, words >= 5 chars."""
    if len(w) < 5:
        return w
    w = w.translate(_DE_MIN_NORM)
    n = len(w)
    if n > 6 and w.endswith("nen"):
        return w[:-3]
    if n > 5 and w[-2:] in ("en", "se", "es", "er"):
        return w[:-2]
    if w[-1] in "nesr":
        return w[:-1]
    return w


# ---------------------------------------------------------------------------
# French


def _fr_light_norm(w: str) -> str:
    if len(w) > 4:
        w = _collapse_runs(w.translate(_FR_NORM))
    if len(w) > 4 and w.endswith("ie"):
        w = w[:-2]
    if len(w) > 4:
        if w[-1] == "r":
            w = w[:-1]
        if w[-1] == "e":
            w = w[:-1]
        if w[-1] == "e":
            w = w[:-1]
        if w[-1] == w[-2] and w[-1].isalpha():
            w = w[:-1]
    return w


def stem_french_light(w: str) -> str:
    """UniNE French light (Savoy SAC 2006): plural strip, derivational
    suffix rewrites (-issement -> -ir, -ateur -> -er, ...), then the
    normalization pass (accent fold, run collapse, final -ie/-r/-e)."""
    if len(w) > 5 and w[-1] == "x":
        if w[-3:-1] == "au" and w[-4] != "e":
            w = w[:-2] + "l"          # -aux -> -al (x handled next)
        else:
            w = w[:-1]
    if len(w) > 3 and w[-1] == "x":
        w = w[:-1]
    if len(w) > 3 and w[-1] == "s":
        w = w[:-1]
    n = len(w)
    if n > 9 and w.endswith("issement"):
        return _fr_light_norm(w[:n - 7] + "r")       # -issement -> -ir
    if n > 8 and w.endswith("issant"):
        return _fr_light_norm(w[:n - 5] + "r")       # -issant -> -ir
    if n > 6 and w.endswith("ement"):
        w = w[:n - 4]                                 # -ement -> -e
        if len(w) > 3 and w.endswith("ive"):
            w = w[:-2] + "f"                          # -ive -> -if
        return _fr_light_norm(w)
    if n > 11 and w.endswith("ficatrice"):
        return _fr_light_norm(w[:n - 7] + "er")      # -ficatrice -> -fier
    if n > 10 and w.endswith("ficateur"):
        return _fr_light_norm(w[:n - 6] + "er")      # -ficateur -> -fier
    if n > 9 and w.endswith("catrice"):
        return _fr_light_norm(w[:n - 7] + "quer")    # -catrice -> -quer
    if n > 8 and w.endswith("cateur"):
        return _fr_light_norm(w[:n - 6] + "quer")    # -cateur -> -quer
    if n > 8 and w.endswith("atrice"):
        return _fr_light_norm(w[:n - 6] + "er")      # -atrice -> -er
    if n > 7 and w.endswith("ateur"):
        return _fr_light_norm(w[:n - 5] + "er")      # -ateur -> -er
    if n > 6 and w.endswith("trice"):
        w = w[:n - 4] + "eur"                         # -trice -> -teur
        n = len(w)
    if n > 5 and w.endswith("ième"):
        return _fr_light_norm(w[:n - 4])
    if n > 7 and w.endswith("teuse"):
        return _fr_light_norm(w[:n - 3] + "r")       # -teuse -> -ter
    if n > 6 and w.endswith("teur"):
        return _fr_light_norm(w[:n - 2] + "r")       # -teur -> -ter
    if n > 5 and w.endswith("euse"):
        return _fr_light_norm(w[:n - 2])             # -euse -> -eu
    if n > 8 and w.endswith("ère"):
        return _fr_light_norm(w[:n - 3] + "er")      # -ère -> -er
    if n > 7 and w.endswith("ive"):
        return _fr_light_norm(w[:n - 2] + "f")       # -ive -> -if
    if n > 4 and (w.endswith("folle") or w.endswith("molle")):
        return _fr_light_norm(w[:n - 3] + "u")       # folle/molle -> fou/mou
    if n > 9 and w.endswith("nnelle"):
        return _fr_light_norm(w[:n - 5])
    if n > 9 and w.endswith("nnel"):
        return _fr_light_norm(w[:n - 3])
    if n > 4 and w.endswith("ète"):
        w = w[:n - 3] + "et"                          # -ète -> -et
        n = len(w)
    if n > 8 and w.endswith("ique"):
        w = w[:n - 4]
        n = len(w)
    if n > 8 and w.endswith("esse"):
        return _fr_light_norm(w[:n - 3])
    if n > 7 and w.endswith("inage"):
        return _fr_light_norm(w[:n - 3])
    if n > 9 and w.endswith("isation"):
        w = w[:n - 7]
        if len(w) > 5 and w.endswith("ual"):
            w = w[:-2] + "el"                         # -ual -> -uel
        return _fr_light_norm(w)
    if n > 9 and w.endswith("isateur"):
        return _fr_light_norm(w[:n - 7])
    if n > 8 and w.endswith("ation"):
        return _fr_light_norm(w[:n - 5])
    if n > 8 and w.endswith("ition"):
        return _fr_light_norm(w[:n - 5])
    return _fr_light_norm(w)


def stem_french_minimal(w: str) -> str:
    """Savoy 1999 French minimal: plural -x/-s, then -r/-e/-é and a
    final doubled letter, words >= 6 chars."""
    if len(w) < 6:
        return w
    if w[-1] == "x":
        if w[-3:-1] == "au":
            return w[:-2] + "l"                       # -aux -> -al
        return w[:-1]
    if w[-1] == "s":
        w = w[:-1]
    if w[-1] == "r":
        w = w[:-1]
    if w[-1] == "e":
        w = w[:-1]
    if w[-1] == "é":
        w = w[:-1]
    if w[-1] == w[-2] and w[-1].isalpha():
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Spanish / Italian


def stem_spanish_light(w: str) -> str:
    """UniNE Spanish light: accent fold, final vowel / plural strip."""
    if len(w) < 5:
        return w
    w = w.translate(_ROMANCE_NORM)
    c = w[-1]
    if c in "oae":
        return w[:-1]
    if c == "s":
        if w.endswith("eses"):
            return w[:-2]
        if w.endswith("ces"):
            return w[:-3] + "z"                       # -ces -> -z
        if w[-2] in "oae":
            return w[:-2]
    return w


def stem_italian_light(w: str) -> str:
    """UniNE Italian light: accent fold, final vowel (with -i elision)."""
    if len(w) < 6:
        return w
    w = w.translate(_ROMANCE_NORM)
    c, p = w[-1], w[-2]
    if c == "e":
        return w[:-2] if p in "ih" else w[:-1]
    if c == "i":
        return w[:-2] if p in "hi" else w[:-1]
    if c in "ao":
        return w[:-2] if p == "i" else w[:-1]
    return w


# Spanish plural stemmer: published invariant / special-case word lists
# (resource data from es/SpanishPluralStemmer.java).
_ES_INVARIANTS = frozenset("""
abrebotellas abrecartas abrelatas afueras albatros albricias aledaños
alexis alicates analisis andurriales antitesis añicos apendicitis
apocalipsis arcoiris aries bilis boletus boris brindis cactus canutas
caries cascanueces cascarrabias ciempies cifosis cortaplumas corpus
cosmos cosquillas creces crisis cuatrocientas cuatrocientos cuelgacapas
cuentacuentos cuentapasos cumpleaños doscientas doscientos dosis enseres
entonces esponsales estatus exequias fauces forceps fotosintesis gafas
gafotas gargaras gris honorarios ictus jueves lapsus lavacoches
lavaplatos limpiabotas lunes maitines martes mondadientes novecientas
novecientos nupcias ochocientas ochocientos pais paris parabrisas
paracaidas parachoques paraguas pararrayos pisapapeles piscis
portaaviones portamaletas portamantas quinientas quinientos
quitamanchas recogepelotas rictus rompeolas sacacorchos sacapuntas
saltamontes salvavidas seis seiscientas seiscientos setecientas
setecientos sintesis tenis tifus trabalenguas vacaciones venus versus
viacrucis virus viveres volandas
""".split())

_ES_SPECIALS = frozenset("""
yoes noes sies clubes faralaes albalaes itemes albumes sandwiches
relojes bojes contrarreloj carcajes
""".split())


def stem_spanish_plural(w: str) -> str:
    """Spanish plural-only stemmer (es/SpanishPluralStemmer.java): accent
    fold, invariant / special-case lists, then plural ending rules.
    The q/gu guard keeps the reference's operator grouping (a bare
    ``q`` at position -4 short-circuits) so goldens match exactly."""
    if len(w) < 4:
        return w
    w = w.translate(_ROMANCE_NORM)
    if w in _ES_INVARIANTS:
        return w
    if w in _ES_SPECIALS:
        return w[:-2]
    if w[-1] != "s":
        return w
    if w[-2] not in _VOWELS:
        return w[:-1]
    if w[-4] == "q" or (w[-4] == "g" and w[-3] == "u" and w[-2] in "ie"):
        return w[:-1]
    if w[-4] in _VOWELS and w[-3] == "r" and w[-2] == "e":
        return w[:-2]
    if w[-4] in _VOWELS and w[-3] in "dlnx" and w[-2] == "e":
        return w[:-2]
    if w[-3] in "yu" and w[-2] == "e":
        return w[:-2]
    if w[-4] in "ulrtn" and w[-3] == "i" and w[-2] == "e":
        return w[:-2]
    if w[-3] == "s" and w[-2] == "e":
        return w[:-2]
    if w[-3] in _VOWELS and w[-2] == "i":
        return w[:-2] + "y"                           # jerseis -> jersey
    if w[-3] == "d" and w[-2] == "i":
        return w[:-2] + "y"                           # brandis -> brandy
    if w[-3] == "c" and w[-2] == "e":
        return w[:-3] + "z"                           # voces -> voz
    if w[-2] in _VOWELS:
        return w[:-1]
    return w


# ---------------------------------------------------------------------------
# Portuguese light


def _pt_remove_suffix(w: str) -> str:
    n = len(w)
    if n > 4 and w.endswith("es") and w[-3] in "rslz":
        return w[:-2]
    if n > 3 and w.endswith("ns"):
        return w[:-2] + "m"                           # -ns -> -m
    if n > 4 and (w.endswith("eis") or w.endswith("éis")):
        return w[:-3] + "el"                          # -eis -> -el
    if n > 4 and w.endswith("ais"):
        return w[:-2] + "l"                           # -ais -> -al
    if n > 4 and w.endswith("óis"):
        return w[:-3] + "ol"                          # -óis -> -ol
    if n > 4 and w.endswith("is"):
        return w[:-1] + "l"                           # -is -> -il
    if n > 3 and (w.endswith("ões") or w.endswith("ães")):
        return w[:-3] + "ão"                          # -ões/-ães -> -ão
    if n > 6 and w.endswith("mente"):
        return w[:-5]
    if n > 3 and w[-1] == "s":
        return w[:-1]
    return w


def _pt_norm_feminine(w: str) -> str:
    n = len(w)
    if n > 7 and (w.endswith("inha") or w.endswith("iaca")
                  or w.endswith("eira")):
        return w[:-1] + "o"
    if n > 6:
        if w[-3:] in ("osa", "ica", "ida", "ada", "iva", "ama"):
            return w[:-1] + "o"
        if w.endswith("ona"):
            return w[:-3] + "ão"                      # -ona -> -ão
        if w.endswith("ora"):
            return w[:-1]
        if w.endswith("esa"):
            return w[:-3] + "ês"                      # -esa -> -ês
        if w.endswith("na"):
            return w[:-1] + "o"
    return w


def stem_portuguese_light(w: str) -> str:
    """UniNE Portuguese light: plural suffix rewrite, feminine
    normalization, final-vowel strip, accent fold."""
    if len(w) < 4:
        return w
    w = _pt_remove_suffix(w)
    if len(w) > 3 and w[-1] == "a":
        w = _pt_norm_feminine(w)
    if len(w) > 4 and w[-1] in "eao":
        w = w[:-1]
    return w.translate(_PT_NORM)


# ---------------------------------------------------------------------------
# RSLP plural steps (Portuguese / Galician minimal)


def _rslp_step(lang: str, name: str):
    """Compile one RSLP step from the generated rule tables
    (``_rslp_rules.py``, transcoded from the published portuguese.rslp /
    galician.rslp data by ``tools/gen_rslp_rules.py``).

    Step semantics (pt/RSLPStemmerBase.java): skip words shorter than
    the step's min size or not ending in one of its entry conditions;
    rules apply in order, first match wins; a rule matches when the
    stem left after suffix removal is long enough and the word isn't in
    the rule's exception list (whole-word or suffix form per the step's
    flag).
    """
    from ._rslp_rules import RSLP_STEPS
    min_word, whole_word_exc, conds, raw_rules = RSLP_STEPS[lang][name]
    rules = [(sfx, min_stem, repl,
              frozenset(exc) if whole_word_exc else tuple(exc))
             for sfx, min_stem, repl, exc in raw_rules]

    def apply(w: str) -> str:
        if len(w) < min_word or (conds and not w.endswith(conds)):
            return w
        for suffix, min_stem, repl, exc in rules:
            if len(w) - len(suffix) >= min_stem and w.endswith(suffix):
                if whole_word_exc:
                    if w in exc:
                        continue
                elif exc and w.endswith(exc):
                    continue
                return w[:len(w) - len(suffix)] + repl
        return w
    return apply


_PT_PLURAL = _rslp_step("pt", "Plural")
_GL_PLURAL = _rslp_step("gl", "Plural")


def stem_portuguese_minimal(w: str) -> str:
    """RSLP Plural step only (pt/PortugueseMinimalStemmer.java)."""
    return _PT_PLURAL(w)


def stem_galician_minimal(w: str) -> str:
    """RSLP-Galician Plural step only (gl/GalicianMinimalStemmer.java)."""
    return _GL_PLURAL(w)


# full RSLP / RSLG pipelines (pt/PortugueseStemmer.java,
# gl/GalicianStemmer.java): fixed step graph over the same tables

_PT_RSLP_NORM = _tr({"àáâãäå": "a", "ç": "c", "èéêë": "e", "ìíîï": "i",
                     "ñ": "n", "òóôõö": "o", "ùúûü": "u", "ýÿ": "y"})
_GL_RSLG_NORM = _tr({"á": "a", "éê": "e", "í": "i", "ó": "o", "ú": "u"})

_PT_STEP = {name: _rslp_step("pt", name)
            for name in ("Plural", "Adverb", "Feminine", "Augmentative",
                         "Noun", "Verb", "Vowel")}
_GL_STEP = {name: _rslp_step("gl", name)
            for name in ("Plural", "Unification", "Adverb",
                         "Augmentative", "Noun", "Verb", "Vowel")}


def stem_portuguese_rslp(w: str) -> str:
    """Full RSLP (Orengo & Huyck SPIRE 2001): plural, adverb, feminine,
    augmentative; then noun OR verb OR final-vowel (first step that
    fires wins), and accent removal."""
    w = _PT_STEP["Augmentative"](_PT_STEP["Feminine"](
        _PT_STEP["Adverb"](_PT_STEP["Plural"](w))))
    w2 = _PT_STEP["Noun"](w)
    if w2 == w:
        w2 = _PT_STEP["Verb"](w)
        if w2 == w:
            w2 = _PT_STEP["Vowel"](w)
    return w2.translate(_PT_RSLP_NORM)


def stem_galician(w: str) -> str:
    """Full RSLG (the RSLP project's Galician adaptation): plural,
    unification, adverb, augmentative-to-fixpoint; noun else verb;
    final vowel; accent removal."""
    w = _GL_STEP["Adverb"](_GL_STEP["Unification"](
        _GL_STEP["Plural"](w)))
    while True:
        w2 = _GL_STEP["Augmentative"](w)
        if w2 == w:
            break
        w = w2
    w2 = _GL_STEP["Noun"](w)
    if w2 == w:
        w2 = _GL_STEP["Verb"](w)
    return _GL_STEP["Vowel"](w2).translate(_GL_RSLG_NORM)


# ---------------------------------------------------------------------------
# Russian

_RU_4 = ("иями", "оями")
_RU_3 = ("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему",
         "ери", "ими", "ого", "ому", "ыми", "оев")
_RU_2 = ("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв",
         "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев",
         "ий", "им", "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми")
_RU_1 = frozenset("аеиоуйыяь")


def stem_russian_light(w: str) -> str:
    """UniNE Russian light: case-ending strip + adjective normalize."""
    n = len(w)
    if n > 6 and w.endswith(_RU_4):
        w = w[:-4]
    elif n > 5 and w.endswith(_RU_3):
        w = w[:-3]
    elif n > 4 and w.endswith(_RU_2):
        w = w[:-2]
    elif n > 3 and w[-1] in _RU_1:
        w = w[:-1]
    if len(w) > 3:
        if w[-1] in "ьи":
            return w[:-1]
        if w[-1] == "н" and w[-2] == "н":
            return w[:-1]
    return w


# ---------------------------------------------------------------------------
# Swedish

_SV_5 = ("elser", "heten")
_SV_4 = ("arne", "erna", "ande", "else", "aste", "orna", "aren")
_SV_3 = ("are", "ast", "het")
_SV_2 = ("ar", "er", "or", "en", "at", "te", "et")


def stem_swedish_light(w: str) -> str:
    """UniNE Swedish light: genitive -s, then noun/adjective endings."""
    if len(w) > 4 and w[-1] == "s":
        w = w[:-1]
    n = len(w)
    if n > 7 and w.endswith(_SV_5):
        return w[:-5]
    if n > 6 and w.endswith(_SV_4):
        return w[:-4]
    if n > 5 and w.endswith(_SV_3):
        return w[:-3]
    if n > 4 and w.endswith(_SV_2):
        return w[:-2]
    if n > 3 and w[-1] in "taen":
        return w[:-1]
    return w


def stem_swedish_minimal(w: str) -> str:
    """Swedish minimal stemmer — definite/plural noun endings only
    (sv/SwedishMinimalStemmer.java)."""
    if len(w) > 4 and w[-1] == "s":
        w = w[:-1]
    n = len(w)
    if n > 6 and w.endswith(("arne", "erna", "arna", "orna", "aren")):
        return w[:-4]
    if n > 5 and w.endswith("are"):
        return w[:-3]
    if n > 4 and w.endswith(("ar", "at", "er", "et", "or", "en")):
        return w[:-2]
    if n > 3 and w[-1] in "aen":
        return w[:-1]
    return w


# ---------------------------------------------------------------------------
# Norwegian (Bokmål / Nynorsk flag model as in the reference)

BOKMAAL = 1
NYNORSK = 2


def stem_norwegian_light(w: str, flags: int = BOKMAAL) -> str:
    """Norwegian light stemmer; ``flags`` selects Bokmål and/or Nynorsk
    ending sets (no/NorwegianLightStemmer.java)."""
    bm = bool(flags & BOKMAAL)
    nn = bool(flags & NYNORSK)
    if len(w) > 4 and w[-1] == "s":
        w = w[:-1]
    n = len(w)
    if n > 7 and ((bm and w.endswith(("heter", "heten")))
                  or (nn and w.endswith("heita"))):
        return w[:-5]
    if n > 8 and nn and w.endswith(("heiter", "leiken", "leikar")):
        return w[:-6]
    if n > 5 and (w.endswith("dom") or (bm and w.endswith("het"))):
        return w[:-3]
    if n > 6 and nn and w.endswith(("heit", "semd", "leik")):
        return w[:-4]
    if n > 7 and w.endswith(("elser", "elsen")):
        return w[:-5]
    if n > 6 and ((bm and w.endswith(("ende", "este", "eren")))
                  or (nn and w.endswith(("ande", "aste", "aren")))
                  or w.endswith("else")):
        return w[:-4]
    if n > 5 and ((bm and w.endswith(("ere", "est")))
                  or (nn and w.endswith(("are", "ast", "ane")))
                  or w.endswith("ene")):
        return w[:-3]
    if n > 4 and (w.endswith(("er", "en", "et", "te"))
                  or (nn and w.endswith("ar"))
                  or (bm and w.endswith("st"))):
        return w[:-2]
    if n > 3 and w[-1] in "aen":
        return w[:-1]
    return w


def stem_norwegian_minimal(w: str, flags: int = BOKMAAL) -> str:
    """Norwegian minimal stemmer (no/NorwegianMinimalStemmer.java)."""
    nn = bool(flags & NYNORSK)
    if len(w) > 4 and w[-1] == "s":
        w = w[:-1]
    n = len(w)
    if n > 5 and (w.endswith("ene") or (nn and w.endswith("ane"))):
        return w[:-3]
    if n > 4 and (w.endswith(("er", "en", "et"))
                  or (nn and w.endswith("ar"))):
        return w[:-2]
    if n > 3 and w[-1] in "ae":
        return w[:-1]
    return w


# ---------------------------------------------------------------------------
# Finnish


def _fi_step1(w: str) -> str:
    while len(w) > 8:
        if w.endswith("kin"):
            w = w[:-3]
            continue
        if w.endswith("ko"):
            w = w[:-2]
            continue
        break
    if len(w) > 11:
        if w.endswith("dellinen"):
            return w[:-8]
        if w.endswith("dellisuus"):
            return w[:-9]
    return w


def _fi_step2(w: str) -> str:
    if len(w) > 5:
        if w.endswith(("lla", "tse", "sti")):
            return w[:-3]
        if w.endswith("ni"):
            return w[:-2]
        if w.endswith("aa"):
            return w[:-1]
    return w


def _fi_step3(w: str) -> str:
    n = len(w)
    if n > 8:
        if w.endswith("nnen"):
            return w[:-4] + "s"
        if w.endswith("ntena"):
            return w[:-5] + "s"
        if w.endswith("tten"):
            return w[:-4]
        if w.endswith("eiden"):
            return w[:-5]
    if n > 6:
        if w.endswith(("neen", "niin", "seen", "teen", "inen")):
            return w[:-4]
        if w[-3] == "h" and w[-2] in _VOWELS_Y and w[-1] == "n":
            return w[:-3]
        if w.endswith("den"):
            return w[:-3] + "s"
        if w.endswith("ksen"):
            return w[:-4] + "s"
        if w.endswith(("ssa", "sta", "lla", "lta", "tta", "ksi", "lle")):
            return w[:-3]
    if n > 5:
        if w.endswith(("na", "ne")):
            return w[:-2]
        if w.endswith("nei"):
            return w[:-3]
    if n > 4:
        if w.endswith(("ja", "ta")):
            return w[:-2]
        if w[-1] == "a":
            return w[:-1]
        if w[-1] == "n" and w[-2] in _VOWELS_Y:
            return w[:-2]
        if w[-1] == "n":
            return w[:-1]
    return w


def _fi_norm1(w: str) -> str:
    if len(w) > 5 and w.endswith("hde"):
        w = w[:-3] + "ksi"
    if len(w) > 4 and (w.endswith("ei") or w.endswith("at")):
        return w[:-2]
    if len(w) > 3 and w[-1] in "tsjeai":
        return w[:-1]
    return w


def _fi_norm2(w: str) -> str:
    if len(w) > 8 and w[-1] in "eou":
        w = w[:-1]
    if len(w) > 4:
        if w[-1] == "i":
            w = w[:-1]
        if len(w) > 4:
            w = _collapse_runs(w, frozenset("kpt"))
    return w


def stem_finnish_light(w: str) -> str:
    """UniNE Finnish light: particle strip, case-ending strip, two
    normalization passes (incl. k/p/t gemination collapse)."""
    if len(w) < 4:
        return w
    w = w.translate(_FI_NORM)
    return _fi_norm2(_fi_norm1(_fi_step3(_fi_step2(_fi_step1(w)))))


# ---------------------------------------------------------------------------
# Hungarian

_HU_CASE3 = ("nak", "nek", "val", "vel", "ert", "rol", "ban", "ben",
             "bol", "nal", "nel", "hoz", "hez", "tol")
_HU_CASE2 = ("at", "et", "ot", "va", "ve", "ra", "re", "ba", "be",
             "ul", "ig")


def _hu_remove_case(w: str) -> str:
    n = len(w)
    if n > 6 and w.endswith("kent"):
        return w[:-4]
    if n > 5:
        if w.endswith(_HU_CASE3):
            return w[:-3]
        if w.endswith(("al", "el")) and w[-3] not in _VOWELS_Y \
                and w[-3] == w[-4]:
            return w[:-3]
    if n > 4:
        if w.endswith(_HU_CASE2):
            return w[:-2]
        if w.endswith(("on", "en")) and w[-3] not in _VOWELS_Y:
            return w[:-2]
        if w[-1] in "tn":
            return w[:-1]
        if w[-1] in "ae" and w[-2] == w[-3] and w[-2] not in _VOWELS_Y:
            return w[:-2]
    return w


def _hu_remove_possessive(w: str) -> str:
    n = len(w)
    if n > 6:
        if w[-5] not in _VOWELS_Y and w.endswith(("atok", "otok",
                                                  "etek")):
            return w[:-4]
        if w.endswith(("itek", "itok")):
            return w[:-4]
    if n > 5:
        if w[-4] not in _VOWELS_Y and w.endswith(("unk", "tok", "tek")):
            return w[:-3]
        if w[-4] in _VOWELS_Y and w.endswith("juk"):
            return w[:-3]
        if w.endswith("ink"):
            return w[:-3]
    if n > 4:
        if w[-3] not in _VOWELS_Y and w.endswith(("am", "em", "om",
                                                  "ad", "ed", "od",
                                                  "uk")):
            return w[:-2]
        if w[-3] in _VOWELS_Y and w.endswith(("nk", "ja", "je")):
            return w[:-2]
        if w.endswith(("im", "id", "ik")):
            return w[:-2]
    if n > 3:
        if w[-1] in "ae" and w[-2] not in _VOWELS_Y:
            return w[:-1]
        if w[-1] in "md" and w[-2] in _VOWELS_Y:
            return w[:-1]
        if w[-1] == "i":
            return w[:-1]
    return w


def _hu_remove_plural(w: str) -> str:
    n = len(w)
    if n > 3 and w[-1] == "k":
        if w[-2] in "aoe" and n > 4:
            return w[:-2]
        return w[:-1]
    return w


def stem_hungarian_light(w: str) -> str:
    """UniNE Hungarian light (Savoy SAC 2006): accent fold, case /
    possessive / plural strip, final-vowel normalize."""
    w = w.translate(_HU_NORM)
    w = _hu_remove_plural(_hu_remove_possessive(_hu_remove_case(w)))
    if len(w) > 3 and w[-1] in "aeio":
        return w[:-1]
    return w


# ---------------------------------------------------------------------------
# Czech (Dolamic & Savoy, "Indexing and stemming approaches for the
# Czech language", IP&M 2009; reference cz/CzechStemmer.java)

_CZ_3 = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
         "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
         "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
_CZ_2 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
         "mi", "ou")
_CZ_1 = frozenset("aeiouůyáéíýě")


def stem_czech(w: str) -> str:
    """Czech aggressive stemmer: case endings, possessives, then
    palatalization-undo normalization."""
    n = len(w)
    if n > 7 and w.endswith("atech"):
        w = w[:-5]
    elif n > 6 and w.endswith(("ětem", "etem", "atům")):
        w = w[:-4]
    elif n > 5 and w.endswith(_CZ_3):
        w = w[:-3]
    elif n > 4 and w.endswith(_CZ_2):
        w = w[:-2]
    elif n > 3 and w[-1] in _CZ_1:
        w = w[:-1]
    if len(w) > 5 and w.endswith(("ov", "in", "ův")):
        w = w[:-2]
    if not w:
        return w
    if w.endswith("čt"):
        return w[:-2] + "ck"
    if w.endswith("št"):
        return w[:-2] + "sk"
    if w[-1] in "cč":
        return w[:-1] + "k"
    if w[-1] in "zž":
        return w[:-1] + "h"
    if len(w) > 1 and w[-2] == "e":
        return w[:-2] + w[-1]                         # e-insertion undo
    if len(w) > 2 and w[-2] == "ů":
        return w[:-2] + "o" + w[-1]                   # ů -> o
    return w


# ---------------------------------------------------------------------------
# Latvian (light stemmer from the reference lv/LatvianStemmer.java:
# affix table gated by whole-word vowel count, plus palatalization undo)

_LV_VOWELS = frozenset("aeiouāīēū")
# (affix, min vowel count in the word, fires palatalization-undo)
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False), ("īm", 1, False),
    ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False), ("ie", 1, False),
    ("u", 1, True), ("a", 1, True), ("i", 1, True), ("e", 1, False),
    ("ā", 1, False), ("ē", 1, False), ("ī", 1, False), ("ū", 1, False),
    ("o", 1, False), ("s", 0, False), ("š", 0, False),
)


def _lv_unpalatalize(stem: str, removed: str) -> str:
    if removed == "u":
        if stem.endswith("kš"):
            return stem[:-2] + "kst"                  # kš -> kst
        if stem.endswith("ņņ"):
            return stem[:-2] + "nn"
    if stem.endswith(("pj", "bj", "mj", "vj")):
        return stem[:-1]                              # drop the j
    for src, dst in (("šņ", "sn"), ("žņ", "zn"), ("šļ", "sl"),
                     ("žļ", "zl"), ("ļņ", "ln"), ("ļļ", "ll")):
        if stem.endswith(src):
            return stem[:-2] + dst
    if stem and stem[-1] == "č":
        return stem[:-1] + "c"
    if stem and stem[-1] == "ļ":
        return stem[:-1] + "l"
    if stem and stem[-1] == "ņ":
        return stem[:-1] + "n"
    return stem


def stem_latvian(w: str) -> str:
    nv = sum(1 for c in w if c in _LV_VOWELS)
    for affix, vc, palatalizes in _LV_AFFIXES:
        if nv > vc and len(w) >= len(affix) + 3 and w.endswith(affix):
            stem = w[:len(w) - len(affix)]
            return _lv_unpalatalize(stem, affix[0]) if palatalizes \
                else stem
    return w


# ---------------------------------------------------------------------------
# Bulgarian (light stemmer from Nakov's BulStem as specialised by the
# reference bg/BulgarianStemmer.java)


def _bg_remove_article(w: str) -> str:
    n = len(w)
    if n > 6 and w.endswith("ият"):
        return w[:-3]
    if n > 5 and w.endswith(("ът", "то", "те", "та", "ия")):
        return w[:-2]
    if n > 4 and w.endswith("ят"):
        return w[:-2]
    return w


def _bg_remove_plural(w: str) -> str:
    n = len(w)
    if n > 6:
        if w.endswith("овци"):
            return w[:-3]                             # -> о
        if w.endswith("ове"):
            return w[:-3]
        if w.endswith("еве"):
            return w[:-3] + "й"                       # -> й
    if n > 5:
        if w.endswith("ища"):
            return w[:-3]
        if w.endswith("та"):
            return w[:-2]
        if w.endswith("ци"):
            return w[:-2] + "к"                       # -> к
        if w.endswith("зи"):
            return w[:-2] + "г"                       # -> г
        if w[-3] == "е" and w[-1] == "и":
            return w[:-3] + "я" + w[-2]               # е..и -> я..
    if n > 4:
        if w.endswith("си"):
            return w[:-2] + "х"                       # -> х
        if w.endswith("и"):
            return w[:-1]
    return w


def stem_bulgarian(w: str) -> str:
    if len(w) < 4:
        return w
    if len(w) > 5 and w.endswith("ища"):
        return w[:-3]
    w = _bg_remove_plural(_bg_remove_article(w))
    if len(w) > 3:
        if w.endswith("я"):
            w = w[:-1]
        if w.endswith(("а", "о", "е")):
            w = w[:-1]
    if len(w) > 4 and w.endswith("ен"):
        w = w[:-2] + "н"                              # ен -> н
    if len(w) > 5 and w[-2] == "ъ":
        w = w[:-2] + w[-1]                            # ъN -> N
    return w


# ---------------------------------------------------------------------------
# Hindi (lightweight Devanagari stemmer: Ramanathan & Rao 2003 as
# specialised by the reference hi/HindiStemmer.java)

_HI_5 = ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")
_HI_4 = ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
         "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
         "ियों", "ियां")
_HI_3 = ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
         "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
         "ुआं")
_HI_2 = ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं",
         "ती", "ता", "ाँ", "ां", "ों", "ें")
_HI_1 = ("ो", "े", "ू", "ु", "ी", "ि", "ा")


def stem_hindi(w: str) -> str:
    n = len(w)
    if n > 6 and w.endswith(_HI_5):
        return w[:-5]
    if n > 5 and w.endswith(_HI_4):
        return w[:-4]
    if n > 4 and w.endswith(_HI_3):
        return w[:-3]
    if n > 3 and w.endswith(_HI_2):
        return w[:-2]
    if n > 2 and w.endswith(_HI_1):
        return w[:-1]
    return w


# ---------------------------------------------------------------------------
# Indonesian (Asian, Williams & Tahaghoghi, "Stemming Indonesian",
# ACSC 2005 as specialised by the reference id/IndonesianStemmer.java)


def stem_indonesian(w: str, derivational: bool = True) -> str:
    syl = sum(1 for c in w if c in _VOWELS)
    removed: set[str] = set()

    def fire(new_w: str, flag: str | None = None) -> str:
        nonlocal syl
        syl -= 1
        if flag:
            removed.add(flag)
        return new_w

    def first_order(w: str) -> str:
        if w.startswith("meng"):
            return fire(w[4:], "meng")
        if w.startswith("meny") and len(w) > 4 and w[4] in _VOWELS:
            return fire("s" + w[4:], "meng")          # meny+V -> s+V
        if w.startswith(("men", "mem")):
            return fire(w[3:], "meng")
        if w.startswith("me"):
            return fire(w[2:], "meng")
        if w.startswith("peng"):
            return fire(w[4:], "peng")
        if w.startswith("peny") and len(w) > 4 and w[4] in _VOWELS:
            return fire("s" + w[4:], "peng")
        if w.startswith("peny"):
            return fire(w[4:], "peng")
        if w.startswith("pen") and len(w) > 3 and w[3] in _VOWELS:
            return fire("t" + w[3:], "peng")          # pen+V -> t+V
        if w.startswith(("pen", "pem")):
            return fire(w[3:], "peng")
        if w.startswith("di"):
            return fire(w[2:], "di")
        if w.startswith("ter"):
            return fire(w[3:], "ter")
        if w.startswith("ke"):
            return fire(w[2:], "ke")
        return w

    def second_order(w: str) -> str:
        if w.startswith("ber") or w == "belajar":
            return fire(w[3:], "ber")
        if (w.startswith("be") and len(w) > 4 and w[2] not in _VOWELS
                and w[3] == "e" and w[4] == "r"):
            return fire(w[2:], "ber")
        if w.startswith("per") or w == "pelajar":
            return fire(w[3:])
        if w.startswith("pe"):
            return fire(w[2:], "pe")
        return w

    def suffix(w: str) -> str:
        if (w.endswith("kan") and "ke" not in removed
                and "peng" not in removed and "pe" not in removed):
            return fire(w[:-3])
        if (w.endswith("an") and "di" not in removed
                and "meng" not in removed and "ter" not in removed):
            return fire(w[:-2])
        if (w.endswith("i") and not w.endswith("si")
                and "ber" not in removed and "ke" not in removed
                and "peng" not in removed):
            return fire(w[:-1])
        return w

    if syl > 2 and w.endswith(("kah", "lah", "pun")):
        w = fire(w[:-3])
    if syl > 2:
        if w.endswith(("ku", "mu")):
            w = fire(w[:-2])
        elif w.endswith("nya"):
            w = fire(w[:-3])
    if not derivational:
        return w

    old = w
    if syl > 2:
        w = first_order(w)
    if w != old:                                      # first-order fired
        old = w
        if syl > 2:
            w = suffix(w)
        if w != old and syl > 2:                      # suffix fired too
            w = second_order(w)
    else:
        if syl > 2:
            w = second_order(w)
        if syl > 2:
            w = suffix(w)
    return w


# ---------------------------------------------------------------------------
# Arabic (Larkey, Ballesteros & Connell light-10 stemmer; reference
# ar/ArabicStemmer.java + ar/ArabicNormalizer.java)

_AR_ALEF, _AR_HEH, _AR_YEH = "ا", "ه", "ي"
_AR_TEH_MARBUTA = "ة"
_AR_PREFIXES = ("ال", "وال",
                "بال", "كال",
                "فال", "لل", "و")
_AR_SUFFIXES = ("ها", "ان", "ات",
                "ون", "ين", "يه",
                "ية", "ه", "ة", "ي")
_AR_NORM = str.maketrans({
    "آ": _AR_ALEF, "أ": _AR_ALEF, "إ": _AR_ALEF,
    "ى": _AR_YEH, _AR_TEH_MARBUTA: _AR_HEH,
    "ـ": None, "ً": None, "ٌ": None, "ٍ": None,
    "َ": None, "ُ": None, "ِ": None, "ّ": None,
    "ْ": None,
})


def normalize_arabic(w: str) -> str:
    """ArabicNormalizer: hamza forms -> alef, dotless yeh -> yeh, teh
    marbuta -> heh, strip tatweel + harakat."""
    return w.translate(_AR_NORM)


def stem_arabic_only(w: str) -> str:
    """Light-10: one prefix strip (wa- needs >= 3 chars left, others
    >= 2), then suffix strips in list order (each needs >= 2 left)."""
    for p in _AR_PREFIXES:
        need = 4 if len(p) == 1 else len(p) + 2
        if len(w) >= need and w.startswith(p):
            w = w[len(p):]
            break
    for s in _AR_SUFFIXES:
        if len(w) >= len(s) + 2 and w.endswith(s):
            w = w[:len(w) - len(s)]
    return w


def stem_arabic(w: str) -> str:
    """ArabicAnalyzer chain role: normalize then stem."""
    return stem_arabic_only(normalize_arabic(w))


# ---------------------------------------------------------------------------
# English minimal (plural-only S-stemmer)


def stem_english_minimal(w: str) -> str:
    """Harman's S-stemmer as specialised by the reference: strips
    plural -s with -ies -> -y, leaving -ss/-us and vowel+es forms."""
    n = len(w)
    if n < 3 or w[-1] != "s":
        return w
    p = w[-2]
    if p in "us":
        return w
    if p == "e":
        if n > 3 and w[-3] == "i" and w[-4] not in "ae":
            return w[:-3] + "y"                       # -ies -> -y
        if w[-3] in "iaoe":
            return w
    return w[:-1]


# ---------------------------------------------------------------------------
# registry — names usable as ``stemmer=`` in the analyzer chain


def _nn(fn):
    return lambda w: fn(w, NYNORSK)


LIGHT_STEMMERS: dict[str, callable] = {
    "german_light": stem_german_light,
    "german_minimal": stem_german_minimal,
    "french_light": stem_french_light,
    "french_minimal": stem_french_minimal,
    "spanish_light": stem_spanish_light,
    "spanish_plural": stem_spanish_plural,
    "italian_light": stem_italian_light,
    "portuguese_light": stem_portuguese_light,
    "portuguese_minimal": stem_portuguese_minimal,
    "portuguese_rslp": stem_portuguese_rslp,
    "galician_minimal": stem_galician_minimal,
    "galician": stem_galician,
    "russian_light": stem_russian_light,
    "swedish_light": stem_swedish_light,
    "swedish_minimal": stem_swedish_minimal,
    "norwegian_light": stem_norwegian_light,
    "norwegian_minimal": stem_norwegian_minimal,
    "norwegian_light_nynorsk": _nn(stem_norwegian_light),
    "norwegian_minimal_nynorsk": _nn(stem_norwegian_minimal),
    "finnish_light": stem_finnish_light,
    "hungarian_light": stem_hungarian_light,
    "english_minimal": stem_english_minimal,
    "czech": stem_czech,
    "latvian": stem_latvian,
    "bulgarian": stem_bulgarian,
    "hindi": stem_hindi,
    "indonesian": stem_indonesian,
    "indonesian_inflectional": lambda w: stem_indonesian(w, False),
    "arabic": stem_arabic,
    "german": stem_german,
}

from .greekstem import stem_greek  # noqa: E402  (registry extension)

LIGHT_STEMMERS["greek"] = stem_greek

from .snowball import SNOWBALL_STEMMERS  # noqa: E402  (registry extension)

LIGHT_STEMMERS.update(SNOWBALL_STEMMERS)


def _stem_stempel_polish(w):
    # lazy: the 2.2 MB trie parses once per process, on first use
    from .stempel import stem_polish
    return stem_polish(w)


LIGHT_STEMMERS["stempel_polish"] = _stem_stempel_polish


# ---------------------------------------------------------------------------
# per-language analyzer presets (the reference's <Lang>Analyzer
# compositions: standard tokenizer -> [elision] -> lowercase -> stop ->
# [normalization+]stem). ru/sv/no/fi/hu default analyzers use full
# Snowball stemmers in the reference; the presets substitute the UniNE
# light stemmers (documented, retrieval-equivalent class).

FRENCH_ARTICLES = frozenset(
    ("l", "m", "t", "qu", "n", "s", "j", "d", "c", "jusqu", "quoiqu",
     "lorsqu", "puisqu"))
ITALIAN_ARTICLES = frozenset(
    ("c", "l", "all", "dall", "dell", "nell", "sull", "coll", "pell",
     "gl", "agl", "dagl", "degl", "negl", "sugl", "un", "m", "t", "s",
     "v", "d"))
CATALAN_ARTICLES = frozenset(("d", "l", "m", "n", "s", "t"))
IRISH_ARTICLES = frozenset(("d", "m", "b"))


def language_analyzer_kwargs(language: str) -> dict:
    """Analyzer kwargs (``stopwords`` / ``stemmer`` / ``elision``) for
    :func:`analysis.analyze_text`, :func:`analysis.analyze_batch` and
    ``build_index`` matching the reference's per-language Analyzer.

    Reference chains: ``de/GermanAnalyzer.java`` (normalization+light),
    ``fr/FrenchAnalyzer.java`` (elision+light), ``it/ItalianAnalyzer
    .java`` (elision+light), ``es|pt|cz|bg|lv|id|gl`` (stop+their
    stemmer), ``en/EnglishAnalyzer.java`` (possessive+Porter).
    """
    from ._stopsets import STOP_SETS
    chains = {
        "german": ("german", "german", None),
        "french": ("french", "french_light", FRENCH_ARTICLES),
        "spanish": ("spanish", "spanish_light", None),
        "italian": ("italian", "italian_light", ITALIAN_ARTICLES),
        "portuguese": ("portuguese", "portuguese_light", None),
        "galician": ("galician", "galician", None),
        "russian": ("russian", "russian_light", None),
        "swedish": ("swedish", "swedish_light", None),
        "norwegian": ("norwegian", "norwegian_light", None),
        "finnish": ("finnish", "finnish_light", None),
        "hungarian": ("hungarian", "hungarian_light", None),
        "czech": ("czech", "czech", None),
        "bulgarian": ("bulgarian", "bulgarian", None),
        "latvian": ("latvian", "latvian", None),
        "hindi": ("hindi", "hindi", None),
        "indonesian": ("indonesian", "indonesian", None),
        "arabic": ("arabic", "arabic", None),
        "english": ("english", "porter", None),
        "greek": (None, "greek", None),
        "polish": (None, "stempel_polish", None),
        "smart_chinese": (None, "porter", None),
        "icu": (None, None, None),
    }
    if language not in chains:
        raise ValueError(f"unknown language {language!r} "
                         f"(have: {sorted(chains)})")
    stop_key, stemmer, elision = chains[language]
    if language == "greek":
        # el/GreekAnalyzer.java: GreekLowerCaseFilter -> stop -> stem;
        # the stop set ships folded and the analyze paths fold before
        # the stop filter when stemmer == "greek"
        from .greekstem import GREEK_STOP_WORDS
        stops = GREEK_STOP_WORDS
    elif language == "polish":
        # pl/PolishAnalyzer.java:135 — standard -> lower -> stop(carrot2
        # list) -> stempel over the shipped stemmer_20000.tbl
        from .stempel import polish_stop_set
        stops = polish_stop_set()
    elif language == "smart_chinese":
        # SmartChineseAnalyzer.java:124 — HMMChineseTokenizer ->
        # PorterStemFilter -> StopFilter(punctuation list)
        from .smartcn import smartcn_stop_set
        return {"tokenizer": "smartcn", "stemmer": "porter",
                "stopwords": smartcn_stop_set()}
    elif language == "icu":
        # the icu module's analyzer role: ICUTokenizer (script runs +
        # UAX#29 + CJ/Thai dictionary engines) -> ICUFoldingFilter
        # (functions/icutokenizer.py, functions/icunorm.py)
        return {"tokenizer": "icu", "icu_folding": True,
                "stopwords": frozenset()}
    else:
        stops = STOP_SETS[stop_key]
    kw = {"stopwords": stops, "stemmer": stemmer}
    if elision is not None:
        kw["elision"] = elision
    return kw
