"""Greek analysis: GreekLowerCaseFilter folding + GreekStemmer.

Reference: ``analysis/common/.../el/GreekLowerCaseFilter.java`` (final
sigma σ-standardization + tonos/dialytika removal) and
``el/GreekStemmer.java`` (the 23-rule cascade of Ntais' "Development of
a Stemmer for the Greek Language" — a published algorithm; rule
structure, exception sets and add-back buffers transcribed 1:1,
including the Java ``&&``/``||`` precedence quirks in rule0 and rule8,
which are load-bearing behavior).

The stemmer operates on a char buffer whose tail retains removed
characters (the ``len += n`` add-backs restore ORIGINAL suffix bytes);
rules 8/10/11/18/19 also overwrite buffer positions. We mirror that
with an explicit list-of-chars + length model.

Input contract (``GreekStemFilter.java:33-36``): case-folded Greek with
final sigma → σ and diacritics removed. :func:`greek_fold` applies that
folding and is composed into the registered ``stemmer="greek"`` chain so
the standard analyzer's plain ``str.lower()`` output is accepted.
"""

from __future__ import annotations

__all__ = ["greek_fold", "stem_greek"]

#: GreekLowerCaseFilter.java:53-113 — applied AFTER generic lowercase
#: (the capital forms arrive already lowered; both spellings mapped)
_FOLD = str.maketrans({
    "ς": "σ",                                  # final sigma
    "Ά": "α", "ά": "α",              # alpha tonos
    "Έ": "ε", "έ": "ε",              # epsilon tonos
    "Ή": "η", "ή": "η",              # eta tonos
    "Ί": "ι", "Ϊ": "ι", "ί": "ι",
    "ϊ": "ι", "ΐ": "ι",              # iota forms
    "Ύ": "υ", "Ϋ": "υ", "ύ": "υ",
    "ϋ": "υ", "ΰ": "υ",              # upsilon forms
    "Ό": "ο", "ό": "ο",              # omicron tonos
    "Ώ": "ω", "ώ": "ω",              # omega tonos
    "΢": "ς",                                  # reserved (bwcompat)
})


def greek_fold(s: str) -> str:
    """Case-fold for Greek: generic lowercase, then the
    GreekLowerCaseFilter switch (σ-standardize, strip tonos/dialytika).
    Python's context-sensitive final-sigma lowering is neutralized by
    the ς→σ mapping, so this matches Java's per-codepoint chain."""
    return s.lower().translate(_FOLD)


#: GreekAnalyzer default stop set (reference ``el/stopwords.txt``,
#: already folded — matched AFTER GreekLowerCaseFilter in the chain)
GREEK_STOP_WORDS = frozenset(
    "ο η το οι τα του τησ των τον την και κι κ ειμαι εισαι ειναι "
    "ειμαστε ειστε στο στον στη στην μα αλλα απο για προσ με σε ωσ "
    "παρα αντι κατα μετα θα να δε δεν μη μην επι ενω εαν αν τοτε που "
    "πωσ ποιοσ ποια ποιο ποιοι ποιεσ ποιων ποιουσ αυτοσ αυτη αυτο "
    "αυτοι αυτων αυτουσ αυτεσ αυτα εκεινοσ εκεινη εκεινο εκεινοι "
    "εκεινεσ εκεινα εκεινων εκεινουσ οπωσ ομωσ ισωσ οσο οτι".split())

_VOWELS = frozenset("αεηιουω")
_VOWELS_NO_Y = frozenset("αεηιοω")

_EXC4 = frozenset(["θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"])
_EXC6 = frozenset([
    "αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ", "φυσ",
    "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
    "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ",
    "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
    "υποδ", "φιλον", "φυλοδ", "χασ"])
_EXC7 = frozenset([
    "αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ", "πεθ",
    "πικρ", "ποτ", "σιχ", "χ"])
_EXC8A = frozenset(["τρ", "τσ"])
_EXC8B = frozenset([
    "βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ", "καστελ",
    "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ", "π",
    "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ", "τσαρλατ",
    "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "γαλ",
    "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ",
    "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ",
    "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ",
    "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ",
    "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ",
    "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ",
    "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ",
    "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ", "στεφ", "ταβ", "τετ",
    "υπερηφ", "υποκοπ", "χαμηλοδαπ", "ψηλοταβ"])
_EXC9 = frozenset([
    "αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ", "βαρον",
    "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ", "παρακαλ", "σερπ", "σκελ",
    "συρφ", "τοκ", "υ", "δ", "εμ", "θαρρ", "θ"])
_EXC12A = frozenset(["π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"])
_EXC12B = frozenset([
    "αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ", "προ", "νισ"])
_EXC13 = frozenset(["διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"])
_EXC14 = frozenset([
    "φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ", "λαμπιδ", "λεχ",
    "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν", "αμ", "αιθ",
    "ανηκ", "δεσποζ", "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε",
    "τσα"])
_EXC15A = frozenset([
    "αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ",
    "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ",
    "ξεφ", "νεοπ", "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ",
    "συμπ", "συντ", "τ", "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ",
    "αποτ", "αρτιπ", "διατ", "εν", "επιτ", "κροκαλοπ", "σιδηροπ", "λ",
    "ναυ", "ουλαμ", "ουρ", "π", "τρ", "μ"])
_EXC15B = frozenset(["ψοφ", "ναυλοχ"])
_EXC16 = frozenset(["ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον",
                    "επταν"])
_EXC17 = frozenset([
    "ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ", "ευχρ",
    "κοινοχρ", "παλιμψ"])
_EXC18 = frozenset(["ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ",
                    "εξων"])
_EXC19 = frozenset(["παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ",
                    "ασουσ"])


def stem_greek(word: str) -> str:
    """GreekStemmer.stem (``el/GreekStemmer.java:42-73``)."""
    word = greek_fold(word)
    if len(word) < 4:
        return word
    s = list(word)
    n = len(s)

    def ew(ln, suffix):
        return ln >= len(suffix) and s[ln - len(suffix):ln] == list(suffix)

    def pre(ln):
        return "".join(s[:ln])

    def vowel(ln):
        return ln > 0 and s[ln - 1] in _VOWELS

    def vowel_no_y(ln):
        return ln > 0 and s[ln - 1] in _VOWELS_NO_Y

    def rule0(ln):
        if ln > 9 and (ew(ln, "καθεστωτοσ") or ew(ln, "καθεστωτων")):
            return ln - 4
        if ln > 8 and (ew(ln, "γεγονοτοσ") or ew(ln, "γεγονοτων")):
            return ln - 4
        if ln > 8 and ew(ln, "καθεστωτα"):
            return ln - 3
        if ln > 7 and (ew(ln, "τατογιου") or ew(ln, "τατογιων")):
            return ln - 4
        if ln > 7 and ew(ln, "γεγονοτα"):
            return ln - 3
        if ln > 7 and ew(ln, "καθεστωσ"):
            return ln - 2
        # NOTE: Java precedence — (ln > 6 and σκαγιου) or the rest
        if ((ln > 6 and ew(ln, "σκαγιου")) or ew(ln, "σκαγιων")
                or ew(ln, "ολογιου") or ew(ln, "ολογιων")
                or ew(ln, "κρεατοσ") or ew(ln, "κρεατων")
                or ew(ln, "περατοσ") or ew(ln, "περατων")
                or ew(ln, "τερατοσ") or ew(ln, "τερατων")):
            return ln - 4
        if ln > 6 and ew(ln, "τατογια"):
            return ln - 3
        if ln > 6 and ew(ln, "γεγονοσ"):
            return ln - 2
        if ln > 5 and (ew(ln, "φαγιου") or ew(ln, "φαγιων")
                       or ew(ln, "σογιου") or ew(ln, "σογιων")):
            return ln - 4
        if ln > 5 and (ew(ln, "σκαγια") or ew(ln, "ολογια")
                       or ew(ln, "κρεατα") or ew(ln, "περατα")
                       or ew(ln, "τερατα")):
            return ln - 3
        if ln > 4 and (ew(ln, "φαγια") or ew(ln, "σογια")
                       or ew(ln, "φωτοσ") or ew(ln, "φωτων")):
            return ln - 3
        if ln > 4 and (ew(ln, "κρεασ") or ew(ln, "περασ")
                       or ew(ln, "τερασ")):
            return ln - 2
        if ln > 3 and ew(ln, "φωτα"):
            return ln - 2
        if ln > 2 and ew(ln, "φωσ"):
            return ln - 1
        return ln

    def rule1(ln):
        if ln > 4 and (ew(ln, "αδεσ") or ew(ln, "αδων")):
            ln -= 4
            if not (ew(ln, "οκ") or ew(ln, "μαμ") or ew(ln, "μαν")
                    or ew(ln, "μπαμπ") or ew(ln, "πατερ")
                    or ew(ln, "γιαγι") or ew(ln, "νταντ") or ew(ln, "κυρ")
                    or ew(ln, "θει") or ew(ln, "πεθερ")):
                ln += 2
        return ln

    def rule2(ln):
        if ln > 4 and (ew(ln, "εδεσ") or ew(ln, "εδων")):
            ln -= 4
            if (ew(ln, "οπ") or ew(ln, "ιπ") or ew(ln, "εμπ")
                    or ew(ln, "υπ") or ew(ln, "γηπ") or ew(ln, "δαπ")
                    or ew(ln, "κρασπ") or ew(ln, "μιλ")):
                ln += 2
        return ln

    def rule3(ln):
        if ln > 5 and (ew(ln, "ουδεσ") or ew(ln, "ουδων")):
            ln -= 5
            if (ew(ln, "αρκ") or ew(ln, "καλιακ") or ew(ln, "πεταλ")
                    or ew(ln, "λιχ") or ew(ln, "πλεξ") or ew(ln, "σκ")
                    or ew(ln, "σ") or ew(ln, "φλ") or ew(ln, "φρ")
                    or ew(ln, "βελ") or ew(ln, "λουλ") or ew(ln, "χν")
                    or ew(ln, "σπ") or ew(ln, "τραγ") or ew(ln, "φε")):
                ln += 3
        return ln

    def rule4(ln):
        if ln > 3 and (ew(ln, "εωσ") or ew(ln, "εων")):
            ln -= 3
            if pre(ln) in _EXC4:
                ln += 1
        return ln

    def rule5(ln):
        if ln > 2 and ew(ln, "ια"):
            ln -= 2
            if vowel(ln):
                ln += 1
        elif ln > 3 and (ew(ln, "ιου") or ew(ln, "ιων")):
            ln -= 3
            if vowel(ln):
                ln += 1
        return ln

    def rule6(ln):
        removed = False
        if ln > 3 and (ew(ln, "ικα") or ew(ln, "ικο")):
            ln -= 3
            removed = True
        elif ln > 4 and (ew(ln, "ικου") or ew(ln, "ικων")):
            ln -= 4
            removed = True
        if removed and (vowel(ln) or pre(ln) in _EXC6):
            ln += 2
        return ln

    def rule7(ln):
        if ln == 5 and ew(ln, "αγαμε"):
            return ln - 1
        if ln > 7 and ew(ln, "ηθηκαμε"):
            ln -= 7
        elif ln > 6 and ew(ln, "ουσαμε"):
            ln -= 6
        elif ln > 5 and (ew(ln, "αγαμε") or ew(ln, "ησαμε")
                         or ew(ln, "ηκαμε")):
            ln -= 5
        if ln > 3 and ew(ln, "αμε"):
            ln -= 3
            if pre(ln) in _EXC7:
                ln += 2
        return ln

    def rule8(ln):
        removed = False
        if ln > 8 and ew(ln, "ιουντανε"):
            ln -= 8
            removed = True
        # NOTE: Java precedence — (ln > 7 and ιοντανε) or ουντανε or ...
        elif ((ln > 7 and ew(ln, "ιοντανε")) or ew(ln, "ουντανε")
                or ew(ln, "ηθηκανε")):
            ln -= 7
            removed = True
        elif ((ln > 6 and ew(ln, "ιοτανε")) or ew(ln, "οντανε")
                or ew(ln, "ουσανε")):
            ln -= 6
            removed = True
        elif ((ln > 5 and ew(ln, "αγανε")) or ew(ln, "ησανε")
                or ew(ln, "οτανε") or ew(ln, "ηκανε")):
            ln -= 5
            removed = True
        if removed and pre(ln) in _EXC8A:
            ln += 4
            s[ln - 4:ln] = list("αγαν")
        if ln > 3 and ew(ln, "ανε"):
            ln -= 3
            if vowel_no_y(ln) or pre(ln) in _EXC8B:
                ln += 2
        return ln

    def rule9(ln):
        if ln > 5 and ew(ln, "ησετε"):
            ln -= 5
        if ln > 3 and ew(ln, "ετε"):
            ln -= 3
            if (pre(ln) in _EXC9 or vowel_no_y(ln)
                    or ew(ln, "οδ") or ew(ln, "αιρ") or ew(ln, "φορ")
                    or ew(ln, "ταθ") or ew(ln, "διαθ") or ew(ln, "σχ")
                    or ew(ln, "ενδ") or ew(ln, "ευρ") or ew(ln, "τιθ")
                    or ew(ln, "υπερθ") or ew(ln, "ραθ") or ew(ln, "ενθ")
                    or ew(ln, "ροθ") or ew(ln, "σθ") or ew(ln, "πυρ")
                    or ew(ln, "αιν") or ew(ln, "συνδ") or ew(ln, "συν")
                    or ew(ln, "συνθ") or ew(ln, "χωρ") or ew(ln, "πον")
                    or ew(ln, "βρ") or ew(ln, "καθ") or ew(ln, "ευθ")
                    or ew(ln, "εκθ") or ew(ln, "νετ") or ew(ln, "ρον")
                    or ew(ln, "αρκ") or ew(ln, "βαρ") or ew(ln, "βολ")
                    or ew(ln, "ωφελ")):
                ln += 2
        return ln

    def rule10(ln):
        if ln > 5 and (ew(ln, "οντασ") or ew(ln, "ωντασ")):
            ln -= 5
            if ln == 3 and ew(ln, "αρχ"):
                ln += 3
                s[ln - 3] = "ο"
            if ew(ln, "κρε"):
                ln += 3
                s[ln - 3] = "ω"
        return ln

    def rule11(ln):
        if ln > 6 and ew(ln, "ομαστε"):
            ln -= 6
            if ln == 2 and ew(ln, "ον"):
                ln += 5
        elif ln > 7 and ew(ln, "ιομαστε"):
            ln -= 7
            if ln == 2 and ew(ln, "ον"):
                ln += 5
                s[ln - 5:ln] = list("ομαστ")
        return ln

    def rule12(ln):
        if ln > 5 and ew(ln, "ιεστε"):
            ln -= 5
            if pre(ln) in _EXC12A:
                ln += 4
        if ln > 4 and ew(ln, "εστε"):
            ln -= 4
            if pre(ln) in _EXC12B:
                ln += 3
        return ln

    def rule13(ln):
        if ln > 6 and ew(ln, "ηθηκεσ"):
            ln -= 6
        elif ln > 5 and (ew(ln, "ηθηκα") or ew(ln, "ηθηκε")):
            ln -= 5
        removed = False
        if ln > 4 and ew(ln, "ηκεσ"):
            ln -= 4
            removed = True
        elif ln > 3 and (ew(ln, "ηκα") or ew(ln, "ηκε")):
            ln -= 3
            removed = True
        if removed and (pre(ln) in _EXC13 or ew(ln, "σκωλ")
                        or ew(ln, "σκουλ") or ew(ln, "ναρθ")
                        or ew(ln, "σφ") or ew(ln, "οθ")
                        or ew(ln, "πιθ")):
            ln += 2
        return ln

    def rule14(ln):
        removed = False
        if ln > 5 and ew(ln, "ουσεσ"):
            ln -= 5
            removed = True
        elif ln > 4 and (ew(ln, "ουσα") or ew(ln, "ουσε")):
            ln -= 4
            removed = True
        if removed and (pre(ln) in _EXC14 or vowel(ln)
                        or ew(ln, "ποδαρ") or ew(ln, "βλεπ")
                        or ew(ln, "πανταχ") or ew(ln, "φρυδ")
                        or ew(ln, "μαντιλ") or ew(ln, "μαλλ")
                        or ew(ln, "κυματ") or ew(ln, "λαχ")
                        or ew(ln, "ληγ") or ew(ln, "φαγ")
                        or ew(ln, "ομ") or ew(ln, "πρωτ")):
            ln += 3
        return ln

    def rule15(ln):
        removed = False
        if ln > 4 and ew(ln, "αγεσ"):
            ln -= 4
            removed = True
        elif ln > 3 and (ew(ln, "αγα") or ew(ln, "αγε")):
            ln -= 3
            removed = True
        if removed:
            cond1 = (pre(ln) in _EXC15A or ew(ln, "οφ") or ew(ln, "πελ")
                     or ew(ln, "χορτ") or ew(ln, "λλ") or ew(ln, "σφ")
                     or ew(ln, "ρπ") or ew(ln, "φρ") or ew(ln, "πρ")
                     or ew(ln, "λοχ") or ew(ln, "σμην"))
            cond2 = pre(ln) in _EXC15B or ew(ln, "κολλ")
            if cond1 and not cond2:
                ln += 2
        return ln

    def rule16(ln):
        removed = False
        if ln > 4 and ew(ln, "ησου"):
            ln -= 4
            removed = True
        elif ln > 3 and (ew(ln, "ησε") or ew(ln, "ησα")):
            ln -= 3
            removed = True
        if removed and pre(ln) in _EXC16:
            ln += 2
        return ln

    def rule17(ln):
        if ln > 4 and ew(ln, "ηστε"):
            ln -= 4
            if pre(ln) in _EXC17:
                ln += 3
        return ln

    def rule18(ln):
        removed = False
        if ln > 6 and (ew(ln, "ησουνε") or ew(ln, "ηθουνε")):
            ln -= 6
            removed = True
        elif ln > 4 and ew(ln, "ουνε"):
            ln -= 4
            removed = True
        if removed and pre(ln) in _EXC18:
            ln += 3
            s[ln - 3:ln] = list("ουν")
        return ln

    def rule19(ln):
        removed = False
        if ln > 6 and (ew(ln, "ησουμε") or ew(ln, "ηθουμε")):
            ln -= 6
            removed = True
        elif ln > 4 and ew(ln, "ουμε"):
            ln -= 4
            removed = True
        if removed and pre(ln) in _EXC19:
            ln += 3
            s[ln - 3:ln] = list("ουμ")
        return ln

    def rule20(ln):
        if ln > 5 and (ew(ln, "ματων") or ew(ln, "ματοσ")):
            ln -= 3
        elif ln > 4 and ew(ln, "ματα"):
            ln -= 2
        return ln

    def rule21(ln):
        if ln > 9 and ew(ln, "ιοντουσαν"):
            return ln - 9
        if ln > 8 and (ew(ln, "ιομασταν") or ew(ln, "ιοσασταν")
                       or ew(ln, "ιουμαστε") or ew(ln, "οντουσαν")):
            return ln - 8
        if ln > 7 and (ew(ln, "ιεμαστε") or ew(ln, "ιεσαστε")
                       or ew(ln, "ιομουνα") or ew(ln, "ιοσαστε")
                       or ew(ln, "ιοσουνα") or ew(ln, "ιουνται")
                       or ew(ln, "ιουνταν") or ew(ln, "ηθηκατε")
                       or ew(ln, "ομασταν") or ew(ln, "οσασταν")
                       or ew(ln, "ουμαστε")):
            return ln - 7
        if ln > 6 and (ew(ln, "ιομουν") or ew(ln, "ιονταν")
                       or ew(ln, "ιοσουν") or ew(ln, "ηθειτε")
                       or ew(ln, "ηθηκαν") or ew(ln, "ομουνα")
                       or ew(ln, "οσαστε") or ew(ln, "οσουνα")
                       or ew(ln, "ουνται") or ew(ln, "ουνταν")
                       or ew(ln, "ουσατε")):
            return ln - 6
        if ln > 5 and (ew(ln, "αγατε") or ew(ln, "ιεμαι")
                       or ew(ln, "ιεται") or ew(ln, "ιεσαι")
                       or ew(ln, "ιοταν") or ew(ln, "ιουμα")
                       or ew(ln, "ηθεισ") or ew(ln, "ηθουν")
                       or ew(ln, "ηκατε") or ew(ln, "ησατε")
                       or ew(ln, "ησουν") or ew(ln, "ομουν")
                       or ew(ln, "ονται") or ew(ln, "ονταν")
                       or ew(ln, "οσουν") or ew(ln, "ουμαι")
                       or ew(ln, "ουσαν")):
            return ln - 5
        if ln > 4 and (ew(ln, "αγαν") or ew(ln, "αμαι")
                       or ew(ln, "ασαι") or ew(ln, "αται")
                       or ew(ln, "ειτε") or ew(ln, "εσαι")
                       or ew(ln, "εται") or ew(ln, "ηδεσ")
                       or ew(ln, "ηδων") or ew(ln, "ηθει")
                       or ew(ln, "ηκαν") or ew(ln, "ησαν")
                       or ew(ln, "ησει") or ew(ln, "ησεσ")
                       or ew(ln, "ομαι") or ew(ln, "οταν")):
            return ln - 4
        if ln > 3 and (ew(ln, "αει") or ew(ln, "εισ") or ew(ln, "ηθω")
                       or ew(ln, "ησω") or ew(ln, "ουν")
                       or ew(ln, "ουσ")):
            return ln - 3
        if ln > 2 and (ew(ln, "αν") or ew(ln, "ασ") or ew(ln, "αω")
                       or ew(ln, "ει") or ew(ln, "εσ") or ew(ln, "ησ")
                       or ew(ln, "οι") or ew(ln, "οσ") or ew(ln, "ου")
                       or ew(ln, "υσ") or ew(ln, "ων")):
            return ln - 2
        if ln > 1 and vowel(ln):
            return ln - 1
        return ln

    def rule22(ln):
        if ew(ln, "εστερ") or ew(ln, "εστατ"):
            return ln - 5
        if (ew(ln, "οτερ") or ew(ln, "οτατ") or ew(ln, "υτερ")
                or ew(ln, "υτατ") or ew(ln, "ωτερ") or ew(ln, "ωτατ")):
            return ln - 4
        return ln

    for rule in (rule0, rule1, rule2, rule3, rule4, rule5, rule6, rule7,
                 rule8, rule9, rule10, rule11, rule12, rule13, rule14,
                 rule15, rule16, rule17, rule18, rule19, rule20):
        n = rule(n)
    if n == len(s):
        n = rule21(n)
    return pre(rule22(n))
