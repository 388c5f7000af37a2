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
    out = os.path.join(OUT_DIR, "cases.json")
    with open(out, "w", encoding="utf-8") as f:
        json.dump(suites, f, ensure_ascii=False, indent=1)
    ncases = sum(len(s["cases"]) for s in suites)
    print(f"{len(suites)} suites, {ncases} cases, "
          f"{len(copied)} fixture files -> {out}")


if __name__ == "__main__":
    main()
