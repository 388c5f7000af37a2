"""Golden-fixture generator for the 13 Snowball languages that ship NO
voc.txt/output.txt archive in the reference (``TestSnowballVocab`` only
covers 20 of the 33 ``org.tartarus.snowball.ext`` stemmers).

For each language this builds a deterministic synthetic vocabulary —
seed words from the reference's own per-language resources (stopword
lists, our committed light-stemmer fixture inputs, the French light
test archive) crossed with the stemmer's OWN rule-table string literals
(every ``Among`` constant, so every suffix/prefix rule path gets
exercised), plus truncations to hit the region/min-length boundaries —
then stems it with the REFERENCE implementation (the self-contained
``org/tartarus/snowball`` Java package compiled on demand with the JDK
that ships for Spark) and writes ``word\tstem`` golden pairs to
``tests/data/stem_goldens/snowball_<lang>.tsv``.

The committed fixtures are reference-produced test DATA (same trust
model as the published vocab archives); no reference code enters the
repo.  Usage: python tools/gen_snowball_goldens.py [lang ...]
"""

from __future__ import annotations

import hashlib
import io
import os
import re
import subprocess
import sys
import zipfile

REF = "/root/reference/lucene/analysis/common/src"
EXT = f"{REF}/java/org/tartarus/snowball/ext"
RES = f"{REF}/resources/org/apache/lucene/analysis"
TESTS = f"{REF}/test/org/apache/lucene/analysis"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                       "stem_goldens")
WORK = "/tmp/snbj"

MAX_PAIRS = 2000

# language -> (Java stemmer class prefix, seed sources)
LANGS = {
    "french": ("French", [("zip", f"{TESTS}/fr/frlighttestdata.zip"),
                          ("stop", f"{RES}/snowball/french_stop.txt")]),
    "catalan": ("Catalan", [("stop", f"{RES}/ca/stopwords.txt")]),
    "basque": ("Basque", [("stop", f"{RES}/eu/stopwords.txt")]),
    "estonian": ("Estonian", [("stop", f"{RES}/et/stopwords.txt")]),
    "lithuanian": ("Lithuanian", [("stop", f"{RES}/lt/stopwords.txt")]),
    "serbian": ("Serbian", [("stop", f"{RES}/sr/stopwords.txt")]),
    "armenian": ("Armenian", [("stop", f"{RES}/hy/stopwords.txt")]),
    "greek": ("Greek", [("stop", f"{RES}/el/stopwords.txt"),
                        ("tsv", "greek.tsv")]),
    "hindi": ("Hindi", [("stop", f"{RES}/hi/stopwords.txt"),
                        ("tsv", "hindi.tsv")]),
    "indonesian": ("Indonesian", [("stop", f"{RES}/id/stopwords.txt"),
                                  ("tsv", "indonesian.tsv")]),
    "arabic": ("Arabic", [("stop", f"{RES}/ar/stopwords.txt"),
                          ("tsv", "arabic.tsv")]),
    "tamil": ("Tamil", [("stop", f"{RES}/ta/stopwords.txt")]),
    "yiddish": ("Yiddish", []),
}

DRIVER = """package driver;
import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.io.PrintStream;
import java.nio.charset.StandardCharsets;
import org.tartarus.snowball.SnowballStemmer;
public class StemDriver {
  public static void main(String[] args) throws Exception {
    Class<?> cls = Class.forName("org.tartarus.snowball.ext." + args[0] + "Stemmer");
    SnowballStemmer st = (SnowballStemmer) cls.getDeclaredConstructor().newInstance();
    BufferedReader in = new BufferedReader(new InputStreamReader(System.in, StandardCharsets.UTF_8));
    PrintStream out = new PrintStream(System.out, false, "UTF-8");
    String line;
    while ((line = in.readLine()) != null) {
      if (line.isEmpty()) continue;
      st.setCurrent(line);
      st.stem();
      out.println(line + "\\t" + st.getCurrent());
    }
    out.flush();
  }
}
"""


def ensure_compiled():
    classes = os.path.join(WORK, "classes")
    if os.path.exists(os.path.join(
            classes, "org/tartarus/snowball/SnowballStemmer.class")):
        return classes
    src = os.path.join(WORK, "src")
    os.makedirs(os.path.join(src, "driver"), exist_ok=True)
    subprocess.run(["cp", "-r",
                    f"{REF}/java/org/tartarus", os.path.join(src, "org_")],
                   check=False)
    # cp -r of the package dir
    subprocess.run(f"mkdir -p {src}/org && cp -r {REF}/java/org/tartarus "
                   f"{src}/org/", shell=True, check=True)
    with open(os.path.join(src, "driver", "StemDriver.java"), "w") as f:
        f.write(DRIVER)
    files = subprocess.run(
        f"find {src} -name '*.java'", shell=True, check=True,
        capture_output=True, text=True).stdout.split()
    subprocess.run(["javac", "-d", classes] + files, check=True)
    return classes


def load_seeds(sources):
    seeds = []
    for kind, path in sources:
        if kind == "stop":
            if not os.path.exists(path):
                continue
            for ln in open(path, encoding="utf-8"):
                ln = ln.split("|")[0].split("#")[0].strip()
                if ln:
                    seeds.extend(ln.split())
        elif kind == "tsv":
            p = os.path.join(OUT_DIR, path)
            for ln in open(p, encoding="utf-8"):
                w = ln.split("\t")[0].strip()
                if w:
                    seeds.append(w)
        elif kind == "zip":
            with zipfile.ZipFile(path) as zf:
                name = zf.namelist()[0]
                txt = io.TextIOWrapper(zf.open(name), encoding="utf-8")
                for ln in txt:
                    w = ln.split("\t")[0].split()[0] if ln.strip() else ""
                    if w and not w.startswith("#"):
                        seeds.append(w)
    return seeds


def h(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")


def build_vocab(lang, java_cls, seeds):
    src = open(f"{EXT}/{java_cls}Stemmer.java", encoding="utf-8").read()
    literals = re.findall(r'new Among\("([^"]*)"', src)
    literals = [re.sub(r"\\u([0-9a-fA-F]{4})",
                       lambda m: chr(int(m.group(1), 16)), x)
                for x in literals]
    literals = sorted({x for x in literals if x}, key=lambda x: (len(x), x))
    vocab = set(seeds)
    vocab.update(literals)
    base = sorted(set(seeds), key=lambda w: h(lang + w))[:400]
    if not base:
        base = literals[:100]
    for b in base:
        for lit in literals:
            if h(b + "|" + lit) % max(1, len(literals) // 12) == 0:
                vocab.add(b + lit)
                vocab.add(lit + b)
        vocab.add(b + b[-2:] if len(b) >= 2 else b)
        if len(b) > 3:
            vocab.add(b[:-1])
            vocab.add(b[:-2])
    # cross the literals themselves (rule-boundary interactions)
    for a in literals[:60]:
        for c in literals[:60]:
            if h(a + "#" + c) % 23 == 0:
                vocab.add(a + c)
    words = sorted(vocab)
    words = sorted(words, key=lambda w: h(lang + "!" + w))[:MAX_PAIRS]
    return sorted(words)


def main():
    langs = sys.argv[1:] or list(LANGS)
    classes = ensure_compiled()
    for lang in langs:
        java_cls, sources = LANGS[lang]
        seeds = load_seeds(sources)
        vocab = build_vocab(lang, java_cls, seeds)
        proc = subprocess.run(
            ["java", "-cp", classes, "driver.StemDriver", java_cls],
            input="\n".join(vocab), capture_output=True, text=True,
            check=True)
        pairs = [ln for ln in proc.stdout.split("\n") if ln]
        out_path = os.path.join(OUT_DIR, f"snowball_{lang}.tsv")
        with open(out_path, "w", encoding="utf-8") as f:
            for ln in pairs:
                f.write(ln + "\n")
        print(f"snowball_{lang}: {len(pairs)} golden pairs "
              f"({len(seeds)} seeds)")


if __name__ == "__main__":
    main()
