// Golden-fixture generator for the phonetic encoder family.
//
// Runs the REAL commons-codec 1.19 encoders (the library the reference's
// lucene/analysis/phonetic module delegates to) over a word list on stdin
// and emits one tab-separated row per word:
//
//   word \t metaphone4 \t metaphone8 \t dm_pri4 \t dm_alt4 \t dm_pri8
//        \t dm_alt8 \t cologne \t daitch_mokotoff \t soundex \t refined
//        \t caverphone2 \t nysiis
//
// Encoder exceptions are emitted as the sentinel "!ERR" (the reference's
// PhoneticFilter swallows them and passes the token through).
//
// Usage:
//   javac -cp <commons-codec.jar> tools/GenPhonetic.java -d /tmp/phon
//   java  -cp <commons-codec.jar>:/tmp/phon GenPhonetic < words.txt > golden.tsv

import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.nio.charset.StandardCharsets;
import org.apache.commons.codec.language.Caverphone2;
import org.apache.commons.codec.language.ColognePhonetic;
import org.apache.commons.codec.language.DaitchMokotoffSoundex;
import org.apache.commons.codec.language.DoubleMetaphone;
import org.apache.commons.codec.language.Metaphone;
import org.apache.commons.codec.language.Nysiis;
import org.apache.commons.codec.language.RefinedSoundex;
import org.apache.commons.codec.language.Soundex;

public class GenPhonetic {
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
    Metaphone m4 = new Metaphone();
    Metaphone m8 = new Metaphone();
    m8.setMaxCodeLen(8);
    DoubleMetaphone dm4 = new DoubleMetaphone();
    DoubleMetaphone dm8 = new DoubleMetaphone();
    dm8.setMaxCodeLen(8);
    ColognePhonetic cologne = new ColognePhonetic();
    DaitchMokotoffSoundex dms = new DaitchMokotoffSoundex();
    Soundex sdx = Soundex.US_ENGLISH;
    RefinedSoundex rs = RefinedSoundex.US_ENGLISH;
    Caverphone2 cav = new Caverphone2();
    Nysiis nys = new Nysiis(true);

    BufferedReader in = new BufferedReader(
        new InputStreamReader(System.in, StandardCharsets.UTF_8));
    StringBuilder out = new StringBuilder(1 << 20);
    String line;
    while ((line = in.readLine()) != null) {
      final String w = line;
      if (w.isEmpty() || w.indexOf('\t') >= 0) continue;
      out.setLength(0);
      out.append(w)
         .append('\t').append(safe(m4::metaphone, w))
         .append('\t').append(safe(m8::metaphone, w))
         .append('\t').append(safe(dm4::doubleMetaphone, w))
         .append('\t').append(safe(s -> dm4.doubleMetaphone(s, true), w))
         .append('\t').append(safe(dm8::doubleMetaphone, w))
         .append('\t').append(safe(s -> dm8.doubleMetaphone(s, true), w))
         .append('\t').append(safe(cologne::colognePhonetic, w))
         .append('\t').append(safe(dms::soundex, w))
         .append('\t').append(safe(sdx::soundex, w))
         .append('\t').append(safe(rs::soundex, w))
         .append('\t').append(safe(cav::encode, w))
         .append('\t').append(safe(nys::encode, w));
      System.out.println(out);
    }
    System.out.flush();
  }
}
