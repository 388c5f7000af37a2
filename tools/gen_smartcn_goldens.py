"""Generate smartcn (SmartChineseAnalyzer / HHMM) fixtures by compiling
and running the REFERENCE's own Java implementation.

The cn.smart + cn.smart.hhmm packages are dependency-free Java apart
from the three Lucene TokenStream classes (tokenizer/analyzer/factory,
which we don't need) and the @SuppressForbidden annotation (stubbed).
We compile them with javac, put the reference's coredict.mem /
bigramdict.mem on the classpath, and run two drivers:

1. DUMP — reads the two .mem blobs (plain Java serialization of the
   dictionary arrays) and rewrites them as a portable big-endian binary
   (DataOutputStream) that the Python engine parses:
   lucene_spark/functions/smartcn_data/{coredict,bigramdict}.bin.gz
2. GOLDEN — for a deterministic corpus of mixed zh/latin/digit/
   punctuation texts, emits the JDK sentence boundaries
   (java.text.BreakIterator, Locale.ROOT — exactly what
   HMMChineseTokenizer uses) and each sentence's WordSegmenter token
   stream (term/start/end/type after SegTokenFilter):
   tests/data/smartcn/golden.tsv

Usage:  python tools/gen_smartcn_goldens.py
"""

import gzip
import os
import random
import shutil
import struct
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/lucene/analysis/smartcn/src"
SMART = os.path.join(REF, "java/org/apache/lucene/analysis/cn/smart")
RES = os.path.join(REF, "resources/org/apache/lucene/analysis/cn/smart")

SUPPRESS_STUB = """
package org.apache.lucene.util;
import java.lang.annotation.*;
@Retention(RetentionPolicy.CLASS)
@Target({ElementType.CONSTRUCTOR, ElementType.METHOD, ElementType.TYPE, ElementType.FIELD})
public @interface SuppressForbidden { String reason(); }
"""

DUMP_JAVA = """
import java.io.*;
import java.util.zip.GZIPOutputStream;

public class SmartcnDumpMain {
  public static void main(String[] args) throws Exception {
    // coredict.mem: wordIndexTable(short[]), charIndexTable(char[]),
    //               wordItem_charArrayTable(char[][][]), wordItem_frequencyTable(int[][])
    try (ObjectInputStream in = new ObjectInputStream(
             SmartcnDumpMain.class.getResourceAsStream(
                 "/org/apache/lucene/analysis/cn/smart/hhmm/coredict.mem"));
         DataOutputStream out = new DataOutputStream(new GZIPOutputStream(
             new BufferedOutputStream(new FileOutputStream(args[0]))))) {
      short[] wordIndexTable = (short[]) in.readObject();
      char[] charIndexTable = (char[]) in.readObject();
      char[][][] wordItems = (char[][][]) in.readObject();
      int[][] freqs = (int[][]) in.readObject();
      out.writeInt(wordIndexTable.length);
      for (short s : wordIndexTable) out.writeShort(s);
      out.writeInt(charIndexTable.length);
      for (char c : charIndexTable) out.writeChar(c);
      out.writeInt(wordItems.length);
      for (int i = 0; i < wordItems.length; i++) {
        if (wordItems[i] == null) { out.writeInt(-1); continue; }
        out.writeInt(wordItems[i].length);
        for (int j = 0; j < wordItems[i].length; j++) {
          char[] w = wordItems[i][j];
          if (w == null) { out.writeInt(-1); }
          else { out.writeInt(w.length); for (char c : w) out.writeChar(c); }
          out.writeInt(freqs[i][j]);
        }
      }
    }
    System.out.println("dumped");
  }
}
"""

# Converts the portable bigram table (built deterministically in
# Python below — the reference tree does NOT ship bigramdict.mem) into
# the Java-serialized .mem blob BigramDictionary.load() expects, so the
# reference's own lookup/probing code runs over the same table.
BIGRAM_CONVERT_JAVA = """
import java.io.*;
import java.util.zip.GZIPInputStream;

public class SmartcnBigramConvertMain {
  public static void main(String[] args) throws Exception {
    DataInputStream in = new DataInputStream(new GZIPInputStream(
        new BufferedInputStream(new FileInputStream(args[0]))));
    int n = in.readInt();
    long[] hashes = new long[n];
    for (int i = 0; i < n; i++) hashes[i] = in.readLong();
    int[] freqs = new int[n];
    for (int i = 0; i < n; i++) freqs[i] = in.readInt();
    in.close();
    try (ObjectOutputStream out = new ObjectOutputStream(
             new BufferedOutputStream(new FileOutputStream(args[1])))) {
      out.writeObject(hashes);
      out.writeObject(freqs);
    }
    System.out.println("converted");
  }
}
"""

GOLDEN_JAVA = """
import java.io.*;
import java.nio.charset.StandardCharsets;
import java.text.BreakIterator;
import java.util.List;
import java.util.Locale;
import org.apache.lucene.analysis.cn.smart.WordSegmenter;
import org.apache.lucene.analysis.cn.smart.hhmm.SegToken;

public class SmartcnGoldenMain {
  public static void main(String[] args) throws Exception {
    WordSegmenter seg = new WordSegmenter();
    BreakIterator bi = BreakIterator.getSentenceInstance(Locale.ROOT);
    BufferedReader r = new BufferedReader(
        new InputStreamReader(System.in, StandardCharsets.UTF_8));
    PrintWriter w = new PrintWriter(
        new OutputStreamWriter(System.out, StandardCharsets.UTF_8));
    String line;
    while ((line = r.readLine()) != null) {
      w.println("TEXT\\t" + line);
      bi.setText(line);
      int start = bi.first();
      for (int end = bi.next(); end != BreakIterator.DONE;
           start = end, end = bi.next()) {
        w.println("SENT\\t" + start + "\\t" + end);
        String sentence = line.substring(start, end);
        List<SegToken> toks = seg.segmentSentence(sentence, start);
        for (SegToken t : toks) {
          w.println("TOK\\t" + new String(t.charArray) + "\\t"
              + t.startOffset + "\\t" + t.endOffset + "\\t" + t.wordType);
        }
      }
      w.println("END");
    }
    w.flush();
  }
}
"""

# WordSegmenter is package-private; widen access in our build copy.
PUBLIC_FIXES = {
    "WordSegmenter.java": [("class WordSegmenter", "public class WordSegmenter")],
}


def build_corpus(sample_words, sample_chars):
    """Deterministic mixed-script corpus. sample_words/chars come from
    the dumped dictionary so fuzz follows real trie paths. Returns
    (texts, adjacent_word_pairs) — the pairs seed the synthetic bigram
    table so the goldens exercise weighted Viterbi decisions."""
    rnd = random.Random(20260819)
    texts = []
    pairs = []

    # the reference's own test sentences (TestSmartChineseAnalyzer.java)
    texts += [
        "我购买了道具和服装。",
        "我购买了道具和服装",
        "我购买 Tests 了道具和服装",
        ",",
        "我购买了道具和服装。我购买了道具和服装。",
        "这是一个测试的句子！这也是；还有更多吗？",
        "一二三四五六七八九十",
        "某某某说：“你好世界。”然后离开了。",
        "价格是3.14元，数量是42个。",
        "Ｔｅｓｔｓ ｔｅｓｔ ＦＵＬＬ ｗｉｄｔｈ１２３",
        "ｔｅｓｔ 1234 ｔｅｓｔｓ？１２３４",
        "abc def U.S. and Mrs. Smith went to 3.5 miles.",
        "𩬅𠀀𪛖 surrogate 𠀁pairs混合",
        "空格　全角空格\\tmix",
    ]
    # dictionary-word concatenations (with/without punctuation)
    for _ in range(400):
        n = rnd.randint(2, 10)
        parts = [rnd.choice(sample_words) for _ in range(n)]
        pairs.extend(zip(parts, parts[1:]))
        t = "".join(parts)
        if rnd.random() < 0.5:
            t += rnd.choice("。！？…；，")
        if rnd.random() < 0.3:
            # splice latin/digits in the middle
            t = t[: len(t) // 2] + rnd.choice(
                [" abc ", "42", " Test9 ", "ＡＢＣ", "１２３", ".", "! "]
            ) + t[len(t) // 2:]
        texts.append(t)
    # random hanzi soup (non-dictionary paths, singles)
    for _ in range(300):
        n = rnd.randint(1, 24)
        texts.append("".join(rnd.choice(sample_chars) for _ in range(n)))
    # multi-sentence texts
    for _ in range(200):
        segs = []
        for _ in range(rnd.randint(2, 5)):
            k = rnd.randint(1, 6)
            ws = [rnd.choice(sample_words) for _ in range(k)]
            pairs.extend(zip(ws, ws[1:]))
            segs.append("".join(ws) + rnd.choice("。！？"))
        texts.append("".join(segs))
    # punctuation/space/other soup
    alphabet = ("。！？，、；：“”（）abcXYZ019 　.!?,;-@#%未串始末"
                "ｱｶﾅ①②АБгдαβ")
    for _ in range(200):
        n = rnd.randint(1, 30)
        texts.append("".join(rnd.choice(alphabet) for _ in range(n)))
    # strip newlines/tabs (protocol is line-based; tab is SPACE_LIKE anyway)
    return [t.replace("\t", " ").replace("\n", " ") for t in texts], pairs


def build_synthetic_bigram(core_bin, bigram_bin, corpus_pairs):
    """The reference tree ships no bigramdict.mem, so its own analyzer
    cannot run here with real bigram data. Build a deterministic table
    over real dictionary words (reference insert semantics:
    BigramDictionary.loadFromFile:198-214 + getAvaliableIndex), commit
    it, and feed the SAME table to the Java golden run."""
    from lucene_spark.functions.smartcn import (
        PRIME_BIGRAM_LENGTH, _hash1, _hash2, _jmod, _load_core_dict)
    P = PRIME_BIGRAM_LENGTH
    words_by_char, _ = _load_core_dict(core_bin)
    all_words = []
    for ch in sorted(words_by_char):
        tails, _f = words_by_char[ch]
        for t in tails:
            all_words.append(ch + t)
    hashes = [0] * P
    freqs = [0] * P

    def insert(word, f):
        units = [ord(c) for c in word]
        hash_id = _hash1(units)
        h1 = _jmod(hash_id, P)
        h2 = _jmod(_hash2(units), P)
        if h1 < 0:
            h1 += P
        if h2 < 0:
            h2 += P
        index = h1
        i = 1
        while hashes[index] != 0 and hashes[index] != hash_id and i < P:
            index = (h1 + i * h2) % P
            i += 1
        if i < P and (hashes[index] == 0 or hashes[index] == hash_id):
            if hashes[index] == 0:
                hashes[index] = hash_id
            freqs[index] += f

    # 60% of the corpus's real adjacent word pairs get a bigram count
    for i, (w1, w2) in enumerate(sorted(set(corpus_pairs))):
        if i % 5 < 3:
            insert(w1 + "@" + w2, (i % 997) + 1)
        if i % 3 == 0:
            insert("始##始@" + w1, (i % 497) + 5)
        if i % 4 == 0:
            insert(w2 + "@末##末", (i % 397) + 3)
        if i % 6 == 0:
            insert(w1 + "@未##串", (i % 297) + 2)
        if i % 7 == 0:
            insert("未##数@" + w2, (i % 197) + 2)
        if i % 8 == 0:
            insert(w1 + "@,", (i % 97) + 1)
            insert(",@" + w2, (i % 93) + 1)
    # plus a broad deterministic sweep over the dictionary
    rnd = random.Random(42)
    sample = rnd.sample(all_words, min(20000, len(all_words)))
    for i, w in enumerate(sample):
        insert(w + "@" + sample[(i * 7 + 1) % len(sample)], (i % 797) + 1)
    # single hanzi adjacencies (the per-char fallback paths)
    chars = [c for c in sorted(words_by_char) if 0x4E00 <= ord(c) <= 0x9FA5]
    csample = rnd.sample(chars, min(3000, len(chars)))
    for i, c in enumerate(csample):
        insert(c + "@" + csample[(i + 1) % len(csample)], (i % 397) + 1)

    with gzip.open(bigram_bin, "wb") as f:
        f.write(struct.pack(">i", P))
        f.write(struct.pack(f">{P}q", *hashes))
        f.write(struct.pack(f">{P}i", *freqs))


def main():
    data_dir = os.path.join(REPO, "lucene_spark", "functions", "smartcn_data")
    golden_dir = os.path.join(REPO, "tests", "data", "smartcn")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(golden_dir, exist_ok=True)

    build = tempfile.mkdtemp(prefix="smartcn_build_")
    try:
        src = os.path.join(build, "src")
        pkg = os.path.join(src, "org/apache/lucene/analysis/cn/smart")
        util = os.path.join(src, "org/apache/lucene/util")
        os.makedirs(os.path.join(pkg, "hhmm"))
        os.makedirs(util)
        skip = {"HMMChineseTokenizer.java", "HMMChineseTokenizerFactory.java",
                "SmartChineseAnalyzer.java", "package-info.java"}
        for name in os.listdir(SMART):
            if name.endswith(".java") and name not in skip:
                with open(os.path.join(SMART, name), encoding="utf-8") as f:
                    code = f.read()
                for old, new in PUBLIC_FIXES.get(name, []):
                    code = code.replace(old, new, 1)
                with open(os.path.join(pkg, name), "w", encoding="utf-8") as f:
                    f.write(code)
        for name in os.listdir(os.path.join(SMART, "hhmm")):
            if name.endswith(".java") and name != "package-info.java":
                shutil.copy(os.path.join(SMART, "hhmm", name),
                            os.path.join(pkg, "hhmm"))
        with open(os.path.join(util, "SuppressForbidden.java"), "w") as f:
            f.write(SUPPRESS_STUB)
        with open(os.path.join(src, "SmartcnDumpMain.java"), "w") as f:
            f.write(DUMP_JAVA)
        with open(os.path.join(src, "SmartcnBigramConvertMain.java"), "w") as f:
            f.write(BIGRAM_CONVERT_JAVA)
        with open(os.path.join(src, "SmartcnGoldenMain.java"), "w") as f:
            f.write(GOLDEN_JAVA)

        classes = os.path.join(build, "classes")
        res_pkg = os.path.join(classes, "org/apache/lucene/analysis/cn/smart/hhmm")
        os.makedirs(res_pkg)
        shutil.copy(os.path.join(RES, "hhmm", "coredict.mem"), res_pkg)

        java_home = os.environ.get("JAVA_HOME", "")
        javac = os.path.join(java_home, "bin", "javac")
        java = os.path.join(java_home, "bin", "java")
        srcs = []
        for root, _, files in os.walk(src):
            srcs += [os.path.join(root, f) for f in files if f.endswith(".java")]
        subprocess.run([javac, "-d", classes, "-encoding", "UTF-8"] + srcs,
                       check=True)

        core_bin = os.path.join(data_dir, "coredict.bin.gz")
        bigram_bin = os.path.join(data_dir, "bigramdict.bin.gz")
        subprocess.run([java, "-cp", classes, "SmartcnDumpMain",
                        core_bin], check=True)
        print("core dict dump:", os.path.getsize(core_bin))

        # sample dictionary words/chars for the fuzz corpus
        sys.path.insert(0, REPO)
        from lucene_spark.functions.smartcn import _load_core_dict
        words_by_char, _ = _load_core_dict(core_bin)
        rnd = random.Random(7)
        all_words = []
        all_chars = []
        for ch in sorted(words_by_char):
            words, _f = words_by_char[ch]
            all_chars.append(ch)
            for w in words:
                all_words.append(ch + w)
        sample_words = rnd.sample(all_words, 3000)
        hanzi_chars = [c for c in all_chars if 0x4E00 <= ord(c) <= 0x9FA5]
        sample_chars = rnd.sample(hanzi_chars, 1500)

        texts, pairs = build_corpus(sample_words, sample_chars)

        # synthetic bigram table (the reference ships no bigramdict.mem
        # here) — built in Python, converted to .mem for the Java run
        build_synthetic_bigram(core_bin, bigram_bin, pairs)
        mem_path = os.path.join(res_pkg, "bigramdict.mem")
        subprocess.run([java, "-cp", classes, "SmartcnBigramConvertMain",
                        bigram_bin, mem_path], check=True)
        print("bigram table:", os.path.getsize(bigram_bin))
        proc = subprocess.run(
            [java, "-cp", classes, "SmartcnGoldenMain"],
            input="\n".join(texts).encode("utf-8"),
            stdout=subprocess.PIPE, check=True)
        golden = os.path.join(golden_dir, "golden.tsv")
        with open(golden, "wb") as f:
            f.write(proc.stdout)
        print(f"wrote {len(texts)} texts -> {golden} "
              f"({os.path.getsize(golden)} bytes)")
    finally:
        shutil.rmtree(build, ignore_errors=True)


if __name__ == "__main__":
    main()
