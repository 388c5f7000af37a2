// Beider-Morse golden-fixture generator: runs the REAL commons-codec
// 1.19 PhoneticEngine (the implementation the reference's
// BeiderMorseFilter wraps) over a word list on stdin and emits:
//
//   word \t gen_approx_concat \t gen_exact_concat \t ash_approx_concat
//        \t sep_approx_concat \t gen_approx_noconcat \t gen_approx_german
//
// Exceptions are emitted as "!ERR" (the reference filter never sees
// them — BM encodes everything — but keep the sentinel for safety).
//
// Usage:
//   javac -cp <commons-codec.jar> tools/GenBM.java -d /tmp/phon
//   java  -cp <commons-codec.jar>:/tmp/phon GenBM < words.txt > golden.tsv

import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.nio.charset.StandardCharsets;
import java.util.Collections;
import org.apache.commons.codec.language.bm.Languages;
import org.apache.commons.codec.language.bm.NameType;
import org.apache.commons.codec.language.bm.PhoneticEngine;
import org.apache.commons.codec.language.bm.RuleType;

public class GenBM {
  interface Enc { String apply(String s) throws Exception; }

  static String safe(Enc e, String s) {
    try {
      String v = e.apply(s);
      return v == null ? "" : v;
    } catch (Exception ex) {
      return "!ERR";
    }
  }

  public static void main(String[] args) throws Exception {
    PhoneticEngine genApprox = new PhoneticEngine(NameType.GENERIC, RuleType.APPROX, true);
    PhoneticEngine genExact = new PhoneticEngine(NameType.GENERIC, RuleType.EXACT, true);
    PhoneticEngine ashApprox = new PhoneticEngine(NameType.ASHKENAZI, RuleType.APPROX, true);
    PhoneticEngine sepApprox = new PhoneticEngine(NameType.SEPHARDIC, RuleType.APPROX, true);
    PhoneticEngine genApproxNc = new PhoneticEngine(NameType.GENERIC, RuleType.APPROX, false);
    Languages.LanguageSet german =
        Languages.LanguageSet.from(Collections.singleton("german"));

    BufferedReader in = new BufferedReader(
        new InputStreamReader(System.in, StandardCharsets.UTF_8));
    StringBuilder out = new StringBuilder(1 << 20);
    String line;
    while ((line = in.readLine()) != null) {
      final String w = line;
      if (w.isEmpty() || w.indexOf('\t') >= 0) continue;
      out.setLength(0);
      out.append(w)
         .append('\t').append(safe(genApprox::encode, w))
         .append('\t').append(safe(genExact::encode, w))
         .append('\t').append(safe(ashApprox::encode, w))
         .append('\t').append(safe(sepApprox::encode, w))
         .append('\t').append(safe(genApproxNc::encode, w))
         .append('\t').append(safe(s -> genApprox.encode(s, german), w));
      System.out.println(out);
    }
    System.out.flush();
  }
}
