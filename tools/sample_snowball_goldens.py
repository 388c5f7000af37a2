"""One-time generator for ``tests/data/stem_goldens/snowball_*.tsv``.

For every Snowball vocabulary archive shipped by the reference's
``TestSnowballVocab`` (``analysis/common/src/test/.../snowball/*.zip``:
2000 voc.txt/output.txt pairs per language), this script first verifies
our :mod:`lucene_spark.functions.snowball` stemmer 0-mismatch against
the FULL 2000-pair file, then deterministically samples MAX_PAIRS pairs
(every k-th line) into a committed fixture so the pytest suite stays
self-contained and small.

Usage: python tools/sample_snowball_goldens.py [ref_snowball_test_dir]
"""

from __future__ import annotations

import io
import os
import sys
import zipfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lucene_spark.functions.snowball import SNOWBALL_STEMMERS  # noqa: E402

MAX_PAIRS = 400

DEFAULT_DIR = ("/root/reference/lucene/analysis/common/src/test/org/"
               "apache/lucene/analysis/snowball")

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                       "stem_goldens")


def read_zip(path: str) -> list[tuple[str, str]]:
    with zipfile.ZipFile(path) as zf:
        voc = io.TextIOWrapper(zf.open("voc.txt"), encoding="utf-8")
        out = io.TextIOWrapper(zf.open("output.txt"), encoding="utf-8")
        pairs = [(v.rstrip("\n"), o.rstrip("\n"))
                 for v, o in zip(voc, out)]
    return [(v, o) for v, o in pairs if v]


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_DIR
    failures = 0
    for zip_name in sorted(os.listdir(src)):
        if not zip_name.endswith(".zip"):
            continue
        lang = zip_name[:-4]
        key = f"snowball_{lang}"
        fn = SNOWBALL_STEMMERS.get(key)
        if fn is None:
            print(f"{key}: NOT IMPLEMENTED — skipped")
            continue
        pairs = read_zip(os.path.join(src, zip_name))
        bad = [(v, o, fn(v)) for v, o in pairs if fn(v) != o]
        if bad:
            failures += 1
            print(f"{key}: {len(bad)}/{len(pairs)} MISMATCH "
                  f"(first: {bad[0]!r}) — fixture NOT written")
            continue
        step = max(1, len(pairs) // MAX_PAIRS)
        sample = pairs[::step][:MAX_PAIRS]
        out_path = os.path.join(OUT_DIR, f"{key}.tsv")
        with open(out_path, "w", encoding="utf-8") as f:
            for v, o in sample:
                f.write(f"{v}\t{o}\n")
        print(f"{key}: {len(pairs)}/{len(pairs)} exact -> "
              f"{len(sample)} sampled pairs")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
