"""One-time generator for ``tests/data/stem_goldens/*.tsv``.

Deterministically samples the reference's published stemmer test
vocabularies (the ``*testdata.zip`` fixtures used by its
``assertVocabulary`` tests, plus the small ``nb_/nn_*.txt`` /
``minimal.txt`` files) down to at most MAX_PAIRS word\tstem pairs per
language (every k-th data line). The full files were verified 0-mismatch
against ``lucene_spark.functions.lightstem`` before sampling; the
committed samples keep the suite self-contained and small.

Usage: python tools/sample_stem_goldens.py <extracted_dir> [ref_root]
where <extracted_dir> holds the unzipped *.txt vocabularies.
"""

from __future__ import annotations

import os
import sys

MAX_PAIRS = 600

BIG = {
    "german_light": "delight.txt",
    "german_minimal": "deminimal.txt",
    "french_light": "frlight.txt",
    "french_minimal": "frminimal.txt",
    "spanish_light": "eslight.txt",
    "spanish_plural": "esplural.txt",
    "italian_light": "itlight.txt",
    "portuguese_light": "ptlight.txt",
    "portuguese_minimal": "ptminimal.txt",
    "portuguese_rslp": "ptrslp.txt",
    "galician": "gl.txt",
    "russian_light": "rulight.txt",
    "swedish_light": "svlight.txt",
    "finnish_light": "filight.txt",
    "hungarian_light": "hulight.txt",
}
SMALL = {
    "norwegian_light": "no/nb_light.txt",
    "norwegian_light_nynorsk": "no/nn_light.txt",
    "norwegian_minimal": "no/nb_minimal.txt",
    "norwegian_minimal_nynorsk": "no/nn_minimal.txt",
    "swedish_minimal": "sv/minimal.txt",
}


def pairs_of(path: str):
    for line in open(path, encoding="utf-8"):
        line = line.rstrip("\n")
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) == 2:
            yield parts[0], parts[1]


def main() -> None:
    src = sys.argv[1]
    ref = sys.argv[2] if len(sys.argv) > 2 else "/root/reference"
    tdir = (f"{ref}/lucene/analysis/common/src/test/org/apache/lucene/"
            "analysis")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "stem_goldens")
    os.makedirs(out_dir, exist_ok=True)
    for name, fn in sorted(BIG.items()):
        rows = list(pairs_of(os.path.join(src, fn)))
        step = max(1, len(rows) // MAX_PAIRS)
        sample = rows[::step][:MAX_PAIRS]
        with open(os.path.join(out_dir, f"{name}.tsv"), "w",
                  encoding="utf-8") as fh:
            for w, s in sample:
                fh.write(f"{w}\t{s}\n")
        print(f"{name}: {len(sample)} of {len(rows)}")
    for name, rel in sorted(SMALL.items()):
        rows = list(pairs_of(os.path.join(tdir, rel)))
        with open(os.path.join(out_dir, f"{name}.tsv"), "w",
                  encoding="utf-8") as fh:
            for w, s in rows:
                fh.write(f"{w}\t{s}\n")
        print(f"{name}: {len(rows)} (full)")


if __name__ == "__main__":
    main()
