"""One-time generator for the tranche-2 stemmer goldens
(``tests/data/stem_goldens/{czech,latvian,bulgarian,hindi,indonesian,
indonesian_inflectional,arabic}.tsv``).

These languages have no ``*testdata.zip`` vocabulary in the reference;
their behavioral spec lives as inline pairs in the reference's test
sources (``assertAnalyzesTo`` / ``checkOneTerm`` / ``check`` calls).
This script extracts those pairs (lowercasing inputs where the
reference analyzer chain lowercases before stemming — all but Arabic),
verifies them 0-mismatch against ``lucene_spark.functions.lightstem``,
and writes the TSV fixtures.

Usage: python tools/extract_stem_test_pairs.py [ref_root]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _assert_pairs(path):
    src = open(path, encoding="utf-8").read()
    return re.findall(
        r'assertAnalyzesTo\(\w+, "([^"]+)", new String\[\] \{"([^"]+)"\}',
        src)


def _check1_pairs(path, var=None):
    src = open(path, encoding="utf-8").read()
    pat = r'checkOneTerm\((%s), "([^"]+)", "([^"]+)"\)' % (var or r"\w+")
    return [(a, b) for _, a, b in re.findall(pat, src)]


def _check_pairs(path):
    src = open(path, encoding="utf-8").read()
    return re.findall(r'check\("([^"]+)", "([^"]+)"\)', src)


def main() -> None:
    from lucene_spark.functions.lightstem import LIGHT_STEMMERS
    ref = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    t = (f"{ref}/lucene/analysis/common/src/test/org/apache/lucene/"
         "analysis")
    sources = [
        ("czech", _assert_pairs(f"{t}/cz/TestCzechStemmer.java"), True),
        ("latvian", _check1_pairs(f"{t}/lv/TestLatvianStemmer.java"),
         True),
        ("bulgarian", _assert_pairs(f"{t}/bg/TestBulgarianStemmer.java"),
         True),
        ("hindi", _check_pairs(f"{t}/hi/TestHindiStemmer.java"), True),
        ("indonesian",
         _check1_pairs(f"{t}/id/TestIndonesianStemmer.java", "a"), True),
        ("indonesian_inflectional",
         _check1_pairs(f"{t}/id/TestIndonesianStemmer.java", "b"), True),
        # Arabic has no case; the reference checks non-Arabic words pass
        # through unchanged (incl. capitalised), so keep case as-is
        ("arabic", _check_pairs(f"{t}/ar/TestArabicStemFilter.java"),
         False),
    ]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "stem_goldens")
    os.makedirs(out_dir, exist_ok=True)
    for name, pairs, lower in sources:
        stem = LIGHT_STEMMERS[name]
        pairs = [((w.strip().lower() if lower else w.strip()), e.strip())
                 for w, e in pairs]
        bad = [(w, stem(w), e) for w, e in pairs if stem(w) != e]
        if bad:
            raise SystemExit(f"{name}: {len(bad)} mismatches: {bad[:5]}")
        seen, out = set(), []
        for w, e in pairs:
            if w not in seen:
                seen.add(w)
                out.append((w, e))
        with open(os.path.join(out_dir, f"{name}.tsv"), "w",
                  encoding="utf-8") as fh:
            for w, e in out:
                fh.write(f"{w}\t{e}\n")
        print(f"{name}: {len(out)} pairs")


if __name__ == "__main__":
    main()
