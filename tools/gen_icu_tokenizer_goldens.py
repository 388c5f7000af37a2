"""ICUTokenizer goldens + data tables.

Part 1 — goldens: compile the REFERENCE's `analysis/icu/segmentation`
classes (ICUTokenizer, CompositeBreakIterator, ScriptIterator,
BreakIteratorWrapper, DefaultICUTokenizerConfig with its own
Default.brk / MyanmarSyllable.brk resources) against lucene-core and
the icu4j 77.1 jar the local Spark ships, then tokenize a
deterministic mixed-script fuzz corpus and record every token as
(start, end, type, script-code) — the authoritative target for the
Python port (``functions/icutokenizer.py``).

Part 2 — tables (written to ``lucene_spark/functions/icu_data/``):
  * ``scripts.tsv.gz``  — RLE runs of UScript.getScript over all code
    points (ScriptIterator's script classifier).
  * ``cjdict.tsv.gz``   — the CJK dictionary: every (word, cost) entry
    iterated out of icu4j's own BytesTrie/CharsTrie
    (com.ibm.icu.impl.breakiter.DictionaryData), the CjkBreakEngine
    Viterbi input.
  * ``hira2kata.tsv.gz`` — per-codepoint Hiragana->Katakana NFKC-style
    mapping used by CjkBreakEngine's preprocessing.

Usage:  python tools/gen_icu_tokenizer_goldens.py
"""

import gzip
import os
import random
import subprocess
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORE_SRC = "/root/reference/lucene/core/src/java"
ICU_SRC = "/root/reference/lucene/analysis/icu/src/java"
ICU_RES = "/root/reference/lucene/analysis/icu/src/resources"
ICU_JAR = os.path.join(
    os.path.dirname(os.path.abspath(__import__("pyspark").__file__)),
    "jars", "icu4j-77.1.jar")
DATA_DIR = os.path.join(REPO, "lucene_spark", "functions", "icu_data")
GOLDEN = os.path.join(REPO, "tests", "data", "icu",
                      "icu_tokenizer_fuzz.tsv.gz")

MAIN_JAVA = r"""
import java.io.*;
import java.nio.charset.StandardCharsets;
import java.util.*;
import org.apache.lucene.analysis.icu.segmentation.ICUTokenizer;
import org.apache.lucene.analysis.tokenattributes.*;
import com.ibm.icu.lang.UScript;

public class ICUTokFuzzMain {
  public static void main(String[] a) throws Exception {
    BufferedReader r = new BufferedReader(new InputStreamReader(
        new FileInputStream(a[0]), StandardCharsets.UTF_8));
    PrintWriter out = new PrintWriter(new OutputStreamWriter(
        new FileOutputStream(a[1]), StandardCharsets.UTF_8));
    String line;
    while ((line = r.readLine()) != null) {
      String text = new String(java.util.Base64.getDecoder().decode(line),
                               StandardCharsets.UTF_8);
      ICUTokenizer tok = new ICUTokenizer();
      tok.setReader(new StringReader(text));
      CharTermAttribute term = tok.addAttribute(CharTermAttribute.class);
      OffsetAttribute off = tok.addAttribute(OffsetAttribute.class);
      TypeAttribute typ = tok.addAttribute(TypeAttribute.class);
      org.apache.lucene.analysis.icu.tokenattributes.ScriptAttribute scr =
          tok.addAttribute(
            org.apache.lucene.analysis.icu.tokenattributes.ScriptAttribute.class);
      tok.reset();
      StringBuilder sb = new StringBuilder();
      while (tok.incrementToken()) {
        sb.append(off.startOffset()).append(':').append(off.endOffset())
          .append(':').append(typ.type()).append(':')
          .append(scr.getCode()).append('\t');
      }
      tok.end(); tok.close();
      out.println(sb.toString().trim());
    }
    out.flush(); out.close();
  }
}
"""

DUMP_JAVA = r"""
import java.io.*;
import java.util.zip.GZIPOutputStream;
import com.ibm.icu.lang.UScript;
import com.ibm.icu.text.Normalizer2;

public class ICUDumpMain {
  public static void main(String[] a) throws Exception {
    // scripts.tsv: RLE runs of UScript.getScript
    try (PrintWriter w = new PrintWriter(new OutputStreamWriter(
        new GZIPOutputStream(new FileOutputStream(a[0] + "/scripts.tsv.gz")),
        "UTF-8"))) {
      int runStart = 0, runScript = UScript.getScript(0);
      for (int cp = 1; cp <= 0x10FFFF; cp++) {
        int s = UScript.getScript(cp);
        if (s != runScript) {
          w.println(runStart + "\t" + (cp - 1) + "\t" + runScript);
          runStart = cp; runScript = s;
        }
      }
      w.println(runStart + "\t" + 0x10FFFF + "\t" + runScript);
    }
    // hira2kata: CjkBreakEngine normalizes Hiragana to Katakana via
    // simple codepoint shift inside [u3041,u309e] -> +0x60
    try (PrintWriter w = new PrintWriter(new OutputStreamWriter(
        new GZIPOutputStream(new FileOutputStream(a[0] + "/hira2kata.tsv.gz")),
        "UTF-8"))) {
      for (int cp = 0x3041; cp <= 0x309E; cp++) {
        w.println(cp + "\t" + (cp + 0x60));
      }
    }
    // cjdict: iterate the trie out of DictionaryData (package-private
    // => pure reflection)
    Class<?> dd = Class.forName(
        "com.ibm.icu.impl.breakiter.DictionaryData");
    java.lang.reflect.Method m =
        dd.getDeclaredMethod("loadDictionaryFor", String.class);
    m.setAccessible(true);
    Object dict = m.invoke(null, "Hani");
    // DictionaryData wraps either BytesDictionaryMatcher or
    // CharsDictionaryMatcher; reflect the trie field out
    System.out.println("dict class: " + dict.getClass().getName());
    java.lang.reflect.Field[] fs = dict.getClass().getDeclaredFields();
    try (PrintWriter w = new PrintWriter(new OutputStreamWriter(
        new GZIPOutputStream(new FileOutputStream(a[0] + "/cjdict.tsv.gz")),
        "UTF-8"))) {
      for (java.lang.reflect.Field f : fs) {
        f.setAccessible(true);
        Object v = f.get(dict);
        if (v instanceof CharSequence) {
          // CharsDictionaryMatcher stores the serialized trie chars
          // and builds a CharsTrie per matches() call — do the same
          v = new com.ibm.icu.util.CharsTrie((CharSequence) v, 0);
        }
        if (v instanceof com.ibm.icu.util.CharsTrie) {
          com.ibm.icu.util.CharsTrie t = (com.ibm.icu.util.CharsTrie) v;
          for (com.ibm.icu.util.CharsTrie.Entry e : t) {
            w.println(e.chars + "\t" + e.value);
          }
          System.out.println("dumped CharsTrie");
        } else if (v instanceof com.ibm.icu.util.BytesTrie) {
          com.ibm.icu.util.BytesTrie t = (com.ibm.icu.util.BytesTrie) v;
          java.lang.reflect.Field tf = dict.getClass()
              .getDeclaredField("transform");
          tf.setAccessible(true);
          int transform = tf.getInt(dict);
          int offset = transform & 0x1fffffff;  // TRANSFORM_OFFSET_MASK
          for (com.ibm.icu.util.BytesTrie.Entry e : t) {
            StringBuilder sb = new StringBuilder();
            for (int i = 0; i < e.bytesLength(); i++) {
              sb.appendCodePoint((e.byteAt(i) & 0xff) + offset);
            }
            w.println(sb + "\t" + e.value);
          }
          System.out.println("dumped BytesTrie offset=" + offset);
        }
      }
    }
  }
}
"""

# mixed-script sample pools (codepoint ranges / literal snippets)
POOLS = {
    "latin": "the quick brown fox analyzer index search spark merge "
             "query token data stream naïve café résumé Zürich",
    "cyrillic": "быстрый анализ поиска индекс данных поток слияние",
    "greek": "γρήγορη ανάλυση ευρετήριο δεδομένων ροή",
    "arabic": "تحليل سريع فهرس بيانات تدفق دمج",
    "hebrew": "ניתוח מהיר אינדקס נתונים זרם",
    "han": "中华人民共和国北京大学计算机科学技术研究所自然语言处理",
    "hiragana": "これはにほんごのぶんしょうですとうきょうだいがく",
    "katakana": "コンピュータサイエンストウキョウデータベースシステム",
    "halfkana": "ﾃﾞｰﾀﾍﾞｰｽ ｺﾝﾋﾟｭｰﾀ ｼｽﾃﾑﾃﾞｰﾀ",
    "mixed_ja": "東京大学のコンピュータでデータを処理します",
    "hangul": "한국어 형태소 분석기 데이터베이스 시스템",
    "thai": "การวิเคราะห์ข้อมูลอย่างรวดเร็ว",
    "thai2": "ปัญญาประดิษฐ์เรียนรู้ภาษาไทยฯลฯ",
    "lao": "ການວິເຄາະຂໍ້ມູນຢ່າງວ່ອງໄວ",
    "burmese": "မြန်မာစာပေးစာယူအချက်အလက်",
    "khmer": "ការវិភាគទិន្នន័យយ៉ាងរហ័ស",
    "digits": "123 45.67 8,901 ２０２６ 42nd",
    "emoji": "🙂 👍🏽 🇺🇸 1️⃣ ©️ test🚀go",
    "punct": ". , ; : ( ) [ ] \" ' — … · ～",
}


def gen_corpus(n: int = 1500):
    rnd = random.Random(20260825)
    keys = list(POOLS)
    lines = []
    for _ in range(n):
        parts = []
        for _k in range(rnd.randint(1, 6)):
            pool = POOLS[rnd.choice(keys)].split()
            parts.append(" ".join(rnd.choice(pool)
                                  for _ in range(rnd.randint(1, 4))))
        sep = rnd.choice([" ", "", " ", " , ", "\n", " "])
        lines.append(sep.join(parts))
    # targeted shapes: pure CJ runs of random length from the han pool
    han = POOLS["han"] + POOLS["hiragana"] + POOLS["katakana"]
    han = han.replace(" ", "")
    for _ in range(500):
        i = rnd.randint(0, len(han) - 2)
        j = min(len(han), i + rnd.randint(1, 12))
        lines.append(han[i:j])
    return lines


def main():
    os.makedirs(DATA_DIR, exist_ok=True)
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    build = tempfile.mkdtemp(prefix="icutok_")
    core = os.path.join(build, "core")
    os.makedirs(core)
    java_home = os.environ.get("JAVA_HOME", "")
    javac = os.path.join(java_home, "bin", "javac")
    java = os.path.join(java_home, "bin", "java")

    srcs = []
    for root, _, files in os.walk(CORE_SRC):
        srcs += [os.path.join(root, f) for f in files
                 if f.endswith(".java") and f != "module-info.java"]
    lst = os.path.join(build, "srcs.txt")
    with open(lst, "w") as f:
        f.write("\n".join(srcs))
    subprocess.run([javac, "-nowarn", "-d", core, "-encoding", "UTF-8",
                    "@" + lst], check=True)

    isrcs = []
    for root, _, files in os.walk(ICU_SRC):
        # only the segmentation package + ScriptAttribute are needed;
        # the charfilter/collation classes need modules not on the
        # classpath here
        if ("segmentation" not in root
                and "tokenattributes" not in root):
            continue
        isrcs += [os.path.join(root, f) for f in files
                  if f.endswith(".java") and f != "module-info.java"
                  and f != "ICUTokenizerFactory.java"]
    ilst = os.path.join(build, "isrcs.txt")
    with open(ilst, "w") as f:
        f.write("\n".join(isrcs))
    subprocess.run([javac, "-nowarn", "-cp", core + ":" + ICU_JAR,
                    "-d", core, "-encoding", "UTF-8", "@" + ilst],
                   check=True)
    # the segmentation classes load .brk resources from their package
    seg_res = os.path.join(
        ICU_RES, "org/apache/lucene/analysis/icu/segmentation")
    seg_out = os.path.join(
        core, "org/apache/lucene/analysis/icu/segmentation")
    for fn in os.listdir(seg_res):
        with open(os.path.join(seg_res, fn), "rb") as fi, \
                open(os.path.join(seg_out, fn), "wb") as fo:
            fo.write(fi.read())

    for name, src in (("ICUTokFuzzMain", MAIN_JAVA),
                      ("ICUDumpMain", DUMP_JAVA)):
        p = os.path.join(build, name + ".java")
        with open(p, "w") as f:
            f.write(src)
        subprocess.run([javac, "-cp", core + ":" + ICU_JAR, "-d", build,
                        p], check=True)

    subprocess.run([java, "-cp", build + ":" + core + ":" + ICU_JAR,
                    "ICUDumpMain", DATA_DIR], check=True)

    import base64
    lines = gen_corpus()
    inp = os.path.join(build, "input.txt")
    with open(inp, "w") as f:
        for ln in lines:
            f.write(base64.b64encode(ln.encode("utf-8")).decode() + "\n")
    outp = os.path.join(build, "out.tsv")
    subprocess.run([java, "-cp", build + ":" + core + ":" + ICU_JAR,
                    "ICUTokFuzzMain", inp, outp], check=True)
    with open(outp, "rb") as f, gzip.open(GOLDEN, "wb") as g:
        raw = f.read().decode("utf-8").splitlines()
        assert len(raw) == len(lines)
        buf = []
        for text, toks in zip(lines, raw):
            b64 = base64.b64encode(text.encode("utf-8")).decode()
            buf.append(b64 + "\t" + toks)
        g.write(("\n".join(buf) + "\n").encode())
    print("wrote", GOLDEN, len(lines), "texts; tables in", DATA_DIR)


if __name__ == "__main__":
    main()
