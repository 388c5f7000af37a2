"""Dump UAX#29 word-break property tables from the icu4j 77.1 jar:

  * ``wordbreak.tsv.gz``  — RLE runs of UProperty.WORD_BREAK values,
    header line mapping value -> ICU value name (ALetter, Katakana, …)
  * ``uax29_sets.tsv.gz`` — RLE ranges for the binary sets the
    ICUTokenizer port needs: Emoji, Extended_Pictographic (the
    BreakIteratorWrapper emoji override), icu-whitespace
    (UCharacter.isWhitespace — the 4kB chunk safe-end rule).

Usage:  python tools/gen_icu_wb_tables.py
"""

import os
import subprocess
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ICU_JAR = os.path.join(
    os.path.dirname(os.path.abspath(__import__("pyspark").__file__)),
    "jars", "icu4j-77.1.jar")
DATA_DIR = os.path.join(REPO, "lucene_spark", "functions", "icu_data")

JAVA = r"""
import java.io.*;
import java.util.zip.GZIPOutputStream;
import com.ibm.icu.lang.UCharacter;
import com.ibm.icu.lang.UProperty;

public class WBDump {
  public static void main(String[] a) throws Exception {
    try (PrintWriter w = new PrintWriter(new OutputStreamWriter(
        new GZIPOutputStream(
            new FileOutputStream(a[0] + "/wordbreak.tsv.gz")), "UTF-8"))) {
      int max = UCharacter.getIntPropertyMaxValue(UProperty.WORD_BREAK);
      StringBuilder hdr = new StringBuilder("#names");
      for (int v = 0; v <= max; v++) {
        hdr.append('\t').append(v).append('=').append(
            UCharacter.getPropertyValueName(UProperty.WORD_BREAK, v,
                UProperty.NameChoice.LONG));
      }
      w.println(hdr);
      int runStart = 0;
      int runVal = UCharacter.getIntPropertyValue(0, UProperty.WORD_BREAK);
      for (int cp = 1; cp <= 0x10FFFF; cp++) {
        int v = UCharacter.getIntPropertyValue(cp, UProperty.WORD_BREAK);
        if (v != runVal) {
          if (runVal != 0) w.println(runStart + "\t" + (cp - 1) + "\t" + runVal);
          runStart = cp; runVal = v;
        }
      }
      if (runVal != 0) w.println(runStart + "\t" + 0x10FFFF + "\t" + runVal);
    }
    try (PrintWriter w = new PrintWriter(new OutputStreamWriter(
        new GZIPOutputStream(
            new FileOutputStream(a[0] + "/uax29_sets.tsv.gz")), "UTF-8"))) {
      String[] names = {"emoji", "extpict", "whitespace",
                        "complex_context", "gcb_control", "thai_sa",
                        "thai_sa_mark", "lao_sa", "lao_sa_mark",
                        "mymr_sa", "mymr_sa_mark", "khmr_sa",
                        "khmr_sa_mark"};
      com.ibm.icu.text.UnicodeSet thaiSa = new com.ibm.icu.text.UnicodeSet(
          "[[:Thai:]&[:LineBreak=SA:]]").freeze();
      com.ibm.icu.text.UnicodeSet thaiSaM = new com.ibm.icu.text.UnicodeSet(
          "[[:Thai:]&[:LineBreak=SA:]&[:M:]]").freeze();
      com.ibm.icu.text.UnicodeSet laoSa = new com.ibm.icu.text.UnicodeSet(
          "[[:Laoo:]&[:LineBreak=SA:]]").freeze();
      com.ibm.icu.text.UnicodeSet laoSaM = new com.ibm.icu.text.UnicodeSet(
          "[[:Laoo:]&[:LineBreak=SA:]&[:M:]]").freeze();
      com.ibm.icu.text.UnicodeSet mySa = new com.ibm.icu.text.UnicodeSet(
          "[[:Mymr:]&[:LineBreak=SA:]]").freeze();
      com.ibm.icu.text.UnicodeSet mySaM = new com.ibm.icu.text.UnicodeSet(
          "[[:Mymr:]&[:LineBreak=SA:]&[:M:]]").freeze();
      com.ibm.icu.text.UnicodeSet khSa = new com.ibm.icu.text.UnicodeSet(
          "[[:Khmr:]&[:LineBreak=SA:]]").freeze();
      com.ibm.icu.text.UnicodeSet khSaM = new com.ibm.icu.text.UnicodeSet(
          "[[:Khmr:]&[:LineBreak=SA:]&[:M:]]").freeze();
      for (String name : names) {
        int runStart = -1;
        for (int cp = 0; cp <= 0x10FFFF; cp++) {
          boolean in;
          if (name.equals("emoji")) {
            in = UCharacter.hasBinaryProperty(cp, UProperty.EMOJI);
          } else if (name.equals("extpict")) {
            in = UCharacter.hasBinaryProperty(cp,
                UProperty.EXTENDED_PICTOGRAPHIC);
          } else if (name.equals("complex_context")) {
            in = UCharacter.getIntPropertyValue(cp, UProperty.LINE_BREAK)
                == com.ibm.icu.lang.UCharacter.LineBreak.COMPLEX_CONTEXT;
          } else if (name.equals("gcb_control")) {
            in = UCharacter.getIntPropertyValue(cp,
                UProperty.GRAPHEME_CLUSTER_BREAK)
                == com.ibm.icu.lang.UCharacter.GraphemeClusterBreak.CONTROL;
          } else if (name.equals("thai_sa")) {
            in = thaiSa.contains(cp);
          } else if (name.equals("thai_sa_mark")) {
            in = thaiSaM.contains(cp);
          } else if (name.equals("lao_sa")) {
            in = laoSa.contains(cp);
          } else if (name.equals("lao_sa_mark")) {
            in = laoSaM.contains(cp);
          } else if (name.equals("mymr_sa")) {
            in = mySa.contains(cp);
          } else if (name.equals("mymr_sa_mark")) {
            in = mySaM.contains(cp);
          } else if (name.equals("khmr_sa")) {
            in = khSa.contains(cp);
          } else if (name.equals("khmr_sa_mark")) {
            in = khSaM.contains(cp);
          } else {
            in = UCharacter.isWhitespace(cp);
          }
          if (in && runStart < 0) runStart = cp;
          if (!in && runStart >= 0) {
            w.println(name + "\t" + runStart + "\t" + (cp - 1));
            runStart = -1;
          }
        }
        if (runStart >= 0) w.println(name + "\t" + runStart + "\t" + 0x10FFFF);
      }
    }
  }
}
"""


def main():
    os.makedirs(DATA_DIR, exist_ok=True)
    build = tempfile.mkdtemp(prefix="wbdump_")
    java_home = os.environ.get("JAVA_HOME", "")
    p = os.path.join(build, "WBDump.java")
    with open(p, "w") as f:
        f.write(JAVA)
    subprocess.run([os.path.join(java_home, "bin", "javac"), "-cp",
                    ICU_JAR, "-d", build, p], check=True)
    subprocess.run([os.path.join(java_home, "bin", "java"), "-cp",
                    build + ":" + ICU_JAR, "WBDump", DATA_DIR],
                   check=True)
    print("wrote wordbreak.tsv.gz + uax29_sets.tsv.gz in", DATA_DIR)


if __name__ == "__main__":
    main()
