"""Transcode the reference's StemmerTestBase expectations into a JSON
fixture.

Walks every ``Test*.java`` in the reference hunspell test tree that
extends StemmerTestBase, extracts the ``init(...)`` fixture names and
every ``assertStemsTo("word", stems...)`` call, and copies the fixture
.aff/.dic pairs next to the cases. The pytest suite replays each case
exactly (stem multiset equality, like the reference's sorted
assertArrayEquals).

Tests whose fixtures exercise out-of-scope machinery (compounds) are
skipped explicitly below.

Usage: python tools/gen_hunspell_goldens.py
"""

import json
import os
import re
import shutil

REF = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
       "lucene/analysis/hunspell")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "tests", "data", "hunspell")

# out-of-scope features (documented in functions/hunspell.py)
SKIP: set = set()

INIT_RE = re.compile(r'init\(\s*(true\s*,\s*)?((?:"[^"]+"\s*,?\s*)+)\)')
CASE_RE = re.compile(r'assertStemsTo\(\s*("(?:[^"\\]|\\.)*")'
                     r'((?:\s*,\s*"(?:[^"\\]|\\.)*")*)\s*\)')
STR_RE = re.compile(r'"((?:[^"\\]|\\.)*)"')


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\",
            '"': '"', "'": "'"}


def _unescape(s: str) -> str:
    """Java string-literal unescape that leaves literal non-ASCII
    chars untouched (bytes-roundtrip unicode_escape would mangle them)."""
    def sub(m):
        g = m.group(1)
        if g.startswith("u"):
            return chr(int(g[1:], 16))
        return _ESCAPES.get(g, g)
    return re.sub(r"\\(u[0-9a-fA-F]{4}|.)", sub, s)


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    suites = []
    copied = set()
    for fn in sorted(os.listdir(REF)):
        if not (fn.startswith("Test") and fn.endswith(".java")):
            continue
        src = open(os.path.join(REF, fn), encoding="utf-8").read()
        if "extends StemmerTestBase" not in src:
            continue
        if fn in SKIP:
            continue
        m = INIT_RE.search(src)
        if not m:
            continue
        ignore_case = bool(m.group(1))
        files = STR_RE.findall(m.group(2))
        aff = files[0]
        dics = files[1:]
        if len(dics) != 1:
            continue                     # multi-dic init: out of scope
        cases = []
        for cm in CASE_RE.finditer(src):
            word = _unescape(STR_RE.findall(cm.group(1))[0])
            stems = [_unescape(s) for s in STR_RE.findall(cm.group(2))]
            cases.append([word, stems])
        if not cases:
            continue
        for f in files:
            srcf = os.path.join(REF, f)
            if not os.path.exists(srcf):
                break
            if f not in copied:
                shutil.copy(srcf, os.path.join(OUT_DIR, f))
                copied.add(f)
        else:
            suites.append({"test": fn, "aff": aff, "dic": dics[0],
                           "ignore_case": ignore_case, "cases": cases})
    # spell-check corpora (.good/.wrong) for non-COMPOUND dictionaries
    spell = []
    for fn in sorted(os.listdir(REF)):
        if not (fn.endswith(".good") or fn.endswith(".wrong")):
            continue
        name = fn.rsplit(".", 1)[0]
        if any(s["name"] == name for s in spell):
            continue
        aff = os.path.join(REF, name + ".aff")
        dic = os.path.join(REF, name + ".dic")
        if not (os.path.exists(aff) and os.path.exists(dic)):
            continue
        entry = {"name": name, "good": [], "wrong": []}
        for kind in ("good", "wrong"):
            p = os.path.join(REF, f"{name}.{kind}")
            if os.path.exists(p):
                with open(p, "rb") as f:
                    entry[kind] = [ln.strip() for ln in
                                   f.read().decode("utf-8", "replace")
                                   .splitlines() if ln.strip()]
        for f2 in (name + ".aff", name + ".dic"):
            if f2 not in copied:
                shutil.copy(os.path.join(REF, f2),
                            os.path.join(OUT_DIR, f2))
                copied.add(f2)
        spell.append(entry)
    with open(os.path.join(OUT_DIR, "spell_cases.json"), "w",
              encoding="utf-8") as f:
        json.dump(spell, f, ensure_ascii=False, indent=1)
    nspell = sum(len(s["good"]) + len(s["wrong"]) for s in spell)
    print(f"{len(spell)} spell corpora, {nspell} words")

    # suggestion corpora (.sug expectations over the .wrong words)
    sug = []
    for fn in sorted(os.listdir(REF)):
        if not fn.endswith(".sug"):
            continue
        name = fn[:-4]
        aff = os.path.join(REF, name + ".aff")
        dic = os.path.join(REF, name + ".dic")
        wrong = os.path.join(REF, name + ".wrong")
        if not (os.path.exists(aff) and os.path.exists(dic)
                and os.path.exists(wrong)):
            continue
        with open(os.path.join(REF, fn), "rb") as f:
            expected = f.read().decode("utf-8", "replace").strip()
        with open(wrong, "rb") as f:
            wrong_words = [ln.strip() for ln in
                           f.read().decode("utf-8", "replace")
                           .splitlines() if ln.strip()]
        for f2 in (name + ".aff", name + ".dic"):
            if f2 not in copied:
                shutil.copy(os.path.join(REF, f2),
                            os.path.join(OUT_DIR, f2))
                copied.add(f2)
        sug.append({"name": name, "wrong": wrong_words,
                    "sug": expected})
    with open(os.path.join(OUT_DIR, "sug_cases.json"), "w",
              encoding="utf-8") as f:
        json.dump(sug, f, ensure_ascii=False, indent=1)
    print(f"{len(sug)} sug corpora")

    out = os.path.join(OUT_DIR, "cases.json")
    with open(out, "w", encoding="utf-8") as f:
        json.dump(suites, f, ensure_ascii=False, indent=1)
    ncases = sum(len(s["cases"]) for s in suites)
    print(f"{len(suites)} suites, {ncases} cases, "
          f"{len(copied)} fixture files -> {out}")


if __name__ == "__main__":
    main()
