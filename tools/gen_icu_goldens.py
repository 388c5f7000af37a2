"""Generate ICU normalization tables + goldens.

Three standard Normalizer2 instances (nfc / nfkc / nfkc_cf) are dumped
from the REAL icu4j 77.1 jar the local Spark distribution ships:
per-code-point combining class, full decomposition, and the
composition-pair table (derived from raw round-trip decompositions) —
plus fuzz-string normalize() goldens that pin the whole algorithm.

The utr30 (ICUFoldingFilter) table is built directly from the
reference's OWN gennorm2 source files
(``analysis/icu/src/data/utr30/*.txt``, processed in gennorm2's
sorted-filename order with later-file-overrides semantics): the
shipped ``utr30.nrm`` binary is an older ICU data format the available
icu4j cannot load, so the sources are the ground truth here. The fold
semantics are pinned by the reference's TestICUFoldingFilter goldens
(transcoded in tests/test_icunorm.py).

Usage:  python tools/gen_icu_goldens.py
"""

import gzip
import os
import random
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ICU_JAR = os.path.join(
    os.path.dirname(os.path.abspath(__import__("pyspark").__file__)),
    "jars", "icu4j-77.1.jar")
UTR30_DIR = "/root/reference/lucene/analysis/icu/src/data/utr30"
DATA_DIR = os.path.join(REPO, "lucene_spark", "functions", "icu_data")
GOLDEN_DIR = os.path.join(REPO, "tests", "data", "icu")

DUMP_JAVA = """
import com.ibm.icu.text.Normalizer2;
import java.io.*;
import java.util.zip.GZIPOutputStream;

public class IcuDump {
  static void dump(Normalizer2 n2, String name, String dir) throws Exception {
    PrintWriter w = new PrintWriter(new OutputStreamWriter(
        new GZIPOutputStream(new FileOutputStream(dir + "/" + name + ".tsv.gz")),
        "UTF-8"));
    w.println("hangul_compose\\t" + n2.composePair(0x1100, 0x1161));
    for (int cp = 0; cp <= 0x10FFFF; cp++) {
      if (cp >= 0xD800 && cp <= 0xDFFF) continue;
      int ccc = n2.getCombiningClass(cp);
      String full = n2.getDecomposition(cp);
      String raw = n2.getRawDecomposition(cp);
      if (ccc == 0 && full == null && raw == null) continue;
      StringBuilder sb = new StringBuilder();
      sb.append(Integer.toHexString(cp)).append('\\t').append(ccc).append('\\t');
      if (full != null) {
        if (full.isEmpty()) sb.append('-');
        boolean first = true;
        for (int i = 0; i < full.length(); ) {
          int c = full.codePointAt(i);
          if (!first) sb.append(' ');
          sb.append(Integer.toHexString(c));
          first = false;
          i += Character.charCount(c);
        }
      } else sb.append('=');
      sb.append('\\t');
      if (raw != null && raw.codePointCount(0, raw.length()) == 2) {
        int a = raw.codePointAt(0);
        int b = raw.codePointAt(Character.charCount(a));
        if (n2.composePair(a, b) == cp) {
          sb.append(Integer.toHexString(a)).append(' ')
            .append(Integer.toHexString(b));
        } else sb.append('=');
      } else sb.append('=');
      w.println(sb);
    }
    w.flush(); w.close();
  }

  public static void main(String[] a) throws Exception {
    dump(Normalizer2.getNFCInstance(), "nfc", a[0]);
    dump(Normalizer2.getNFKCInstance(), "nfkc", a[0]);
    dump(Normalizer2.getNFKCCasefoldInstance(), "nfkc_cf", a[0]);
    System.out.println("dumped");
  }
}
"""

GOLDEN_JAVA = """
import com.ibm.icu.text.Normalizer2;
import java.io.*;
import java.nio.charset.StandardCharsets;

public class IcuNormGolden {
  public static void main(String[] a) throws Exception {
    Normalizer2[] n = {Normalizer2.getNFCInstance(),
                       Normalizer2.getNFKCInstance(),
                       Normalizer2.getNFKCCasefoldInstance()};
    BufferedReader r = new BufferedReader(
        new InputStreamReader(System.in, StandardCharsets.UTF_8));
    PrintWriter w = new PrintWriter(
        new OutputStreamWriter(System.out, StandardCharsets.UTF_8));
    String line;
    while ((line = r.readLine()) != null) {
      StringBuilder sb = new StringBuilder(line);
      for (Normalizer2 n2 : n) sb.append('\\t').append(n2.normalize(line));
      w.println(sb);
    }
    w.flush();
  }
}
"""


def build_fuzz_corpus() -> list:
    rnd = random.Random(20260819)
    # code-point pools stressing every normalization path
    marks = (list(range(0x300, 0x370)) + [0x94D, 0x9BE, 0x9D7, 0xB3E,
             0x102E, 0x1161, 0x11A8, 0x3099, 0x309A, 0xFB1E, 0x200D,
             0x200C, 0xAD, 0x34F, 0x645, 0x654, 0x655, 0x93C])
    bases = ([ord(c) for c in
              "aAeEoOuUiIcCnNsSzZgGkKyYdDhHrRtTwW"] +
             [0xC5, 0xE5, 0xC9, 0xE9, 0x112, 0x1E0A, 0x1FB, 0x212B,
              0x391, 0x3B1, 0x410, 0x430, 0x5D0, 0x627, 0x905, 0x3042,
              0x30A2, 0xFF71, 0xAC00, 0xD4DB, 0x1100, 0x1112, 0x1161,
              0x1175, 0x11A8, 0x11C2, 0x4E00, 0xF900, 0xFA0C, 0x2F800,
              0x10400, 0x10428, 0x1D400, 0x1D7CE, 0xFB00, 0xFB4F,
              0xFDFA, 0xFEFB, 0x33AF, 0x3371, 0x2460, 0x24EA, 0x2160,
              0xFF21, 0xFF41, 0xFF10, 0x660, 0x9E6, 0x96, 0x2010,
              0x5E, 0xA8, 0xB4, 0x37A, 0x1FBD, 0x132, 0x13F, 0x149,
              0xDF, 0x130, 0x131, 0x17F, 0x3C2, 0x3A3, 0x1E9E])
    texts = []
    for _ in range(4000):
        n = rnd.randint(1, 12)
        cps = []
        for _ in range(n):
            r = rnd.random()
            if r < 0.45:
                cps.append(rnd.choice(bases))
            elif r < 0.8:
                cps.append(rnd.choice(marks))
            elif r < 0.9:
                cps.append(rnd.randint(0x20, 0x2FFF))
            else:
                cps.append(rnd.choice(
                    [rnd.randint(0xAC00, 0xD7A3),
                     rnd.randint(0xF900, 0xFAD9),
                     rnd.randint(0xFB00, 0xFEFF),
                     rnd.randint(0x1D400, 0x1D7FF),
                     rnd.randint(0x2F800, 0x2FA1D)]))
        s = "".join(chr(c) for c in cps if not 0xD800 <= c <= 0xDFFF)
        s = s.replace("\n", " ").replace("\r", " ").replace("\t", " ")
        if s:
            texts.append(s)
    # every single interesting cp alone and doubled
    for cp in sorted(set(bases + marks)):
        texts.append(chr(cp))
        texts.append(chr(cp) * 2)
    # classic sequences
    texts += ["résumé", "résumé", "ΜΆΪΟΣ", "Μάϊος", "Ruß",
              "ELİF", "eli̇f", "đis is cræzy", "ﴳﴺﰧ",
              "क्‍ष", "৭০৬", "Ǻ",
              "각", "각", "q̣̇",
              "̣̇q", "가각갂갃간"]
    return texts


def _parse_hex_seq(s: str) -> tuple:
    return tuple(int(x, 16) for x in s.split())


def build_utr30():
    """gennorm2 emulation: merge the 8 source files in sorted-name
    order (later files override per code point), compute the recursive
    mapping closure, derive composition pairs from two-way mappings."""
    ccc = {}
    mapping = {}   # cp -> (tuple_of_cps, twoway: bool)
    files = sorted(os.listdir(UTR30_DIR))
    for fn in files:
        if not fn.endswith(".txt"):
            continue
        with open(os.path.join(UTR30_DIR, fn), encoding="utf-8") as f:
            for line in f:
                line = line.split("#")[0].strip()
                if not line or line.startswith("*"):
                    continue
                if ":" in line and ">" not in line and "=" not in line:
                    rng, v = line.split(":")
                    v = int(v)
                    if ".." in rng:
                        a, b = rng.split("..")
                        for cp in range(int(a, 16), int(b, 16) + 1):
                            ccc[cp] = v
                    else:
                        ccc[int(rng, 16)] = v
                    continue
                twoway = False
                if "=" in line and ">" not in line:
                    lhs, rhs = line.split("=")
                    twoway = True
                elif ">" in line:
                    lhs, rhs = line.split(">")
                else:
                    raise ValueError(f"{fn}: unparsed line {line!r}")
                tgt = _parse_hex_seq(rhs) if rhs.strip() else ()
                lhs = lhs.strip()
                if ".." in lhs:
                    a, b = lhs.split("..")
                    for cp in range(int(a, 16), int(b, 16) + 1):
                        mapping[cp] = (tgt, twoway)
                else:
                    mapping[int(lhs, 16)] = (tgt, twoway)

    def closure(cp, depth=0):
        if depth > 50:
            raise RuntimeError(f"mapping cycle at {cp:x}")
        m = mapping.get(cp)
        if m is None:
            if 0xAC00 <= cp <= 0xD7A3:  # algorithmic Hangul decomp
                s = cp - 0xAC00
                out = [0x1100 + s // 588, 0x1161 + (s % 588) // 28]
                if s % 28:
                    out.append(0x11A7 + s % 28)
                return tuple(out)
            return (cp,)
        out = []
        for t in m[0]:
            out.extend(closure(t, depth + 1))
        return tuple(out)

    os.makedirs(DATA_DIR, exist_ok=True)
    with gzip.open(os.path.join(DATA_DIR, "utr30.tsv.gz"), "wt",
                   encoding="utf-8") as w:
        w.write("hangul_compose\t%d\n" % 0xAC00)  # algorithmic, like nfc
        cps = sorted(set(ccc) | set(mapping))
        for cp in cps:
            c = ccc.get(cp, 0)
            m = mapping.get(cp)
            if m is None:
                full = "="
                pair = "="
            else:
                fl = closure(cp)
                full = " ".join(f"{x:x}" for x in fl) if fl else "-"
                pair = "="
                if m[1] and len(m[0]) == 2:
                    pair = f"{m[0][0]:x} {m[0][1]:x}"
            w.write(f"{cp:x}\t{c}\t{full}\t{pair}\n")
    print("utr30 table:", len(cps), "entries")


def main():
    os.makedirs(DATA_DIR, exist_ok=True)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    build = tempfile.mkdtemp(prefix="icu_build_")
    try:
        for name, src in (("IcuDump", DUMP_JAVA),
                          ("IcuNormGolden", GOLDEN_JAVA)):
            with open(os.path.join(build, name + ".java"), "w") as f:
                f.write(src)
        java_home = os.environ.get("JAVA_HOME", "")
        subprocess.run([os.path.join(java_home, "bin", "javac"), "-cp",
                        ICU_JAR, "-d", build,
                        os.path.join(build, "IcuDump.java"),
                        os.path.join(build, "IcuNormGolden.java")],
                       check=True)
        subprocess.run([os.path.join(java_home, "bin", "java"), "-cp",
                        build + ":" + ICU_JAR, "IcuDump", DATA_DIR],
                       check=True)
        texts = build_fuzz_corpus()
        proc = subprocess.run(
            [os.path.join(java_home, "bin", "java"), "-cp",
             build + ":" + ICU_JAR, "IcuNormGolden"],
            input="\n".join(texts).encode("utf-8"),
            stdout=subprocess.PIPE, check=True)
        with gzip.open(os.path.join(GOLDEN_DIR, "norm_golden.tsv.gz"),
                       "wb") as f:
            f.write(proc.stdout)
        print(f"norm goldens: {len(texts)} strings")
    finally:
        import shutil
        shutil.rmtree(build, ignore_errors=True)
    build_utr30()


if __name__ == "__main__":
    main()
