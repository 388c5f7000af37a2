"""Generate stempel (Egothor) stemmer golden fixtures by running the
REFERENCE's own Java implementation against the shipped Polish stemmer
table (`stemmer_20000.tbl`).

The org.egothor.stemmer package is dependency-free Java (only the two
CLI tools Compile/DiffIt import Lucene, and we don't need them), so we
compile it directly with javac together with StempelStemmer and a tiny
stdin->stdout driver, then push a deterministic wordlist through it:

* the full Polish stopword list + the reference test words,
* synthetic Polish inflections (roots x a large suffix table),
* seeded fuzz over the Polish alphabet (incl. diacritics),
* ASCII source-code-ish tokens (negative paths through the trie).

Output: tests/data/stempel/golden.tsv with ``word<TAB>stem`` lines
(stem == ``\\0`` when Java returned null).  The pytest suite replays
the Python implementation against this file (exact match required).

Usage:  python tools/gen_stempel_goldens.py [out_tsv]
"""

import os
import random
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/lucene/analysis/stempel/src"
EGOTHOR = os.path.join(REF, "java/org/egothor/stemmer")
STEMPEL = os.path.join(REF, "java/org/apache/lucene/analysis/stempel")
TBL = os.path.join(REF, "resources/org/apache/lucene/analysis/pl/stemmer_20000.tbl")
STOPWORDS = os.path.join(REF, "resources/org/apache/lucene/analysis/pl/stopwords.txt")

MAIN_JAVA = """
import java.io.*;
import java.nio.charset.StandardCharsets;
import org.apache.lucene.analysis.stempel.StempelStemmer;

public class StempelGoldenMain {
  public static void main(String[] args) throws Exception {
    StempelStemmer st = new StempelStemmer(new FileInputStream(args[0]));
    BufferedReader r = new BufferedReader(
        new InputStreamReader(System.in, StandardCharsets.UTF_8));
    PrintWriter w = new PrintWriter(
        new OutputStreamWriter(System.out, StandardCharsets.UTF_8));
    String line;
    while ((line = r.readLine()) != null) {
      StringBuilder s = st.stem(line);
      w.println(line + "\\t" + (s == null ? "\\\\0" : s.toString()));
    }
    w.flush();
  }
}
"""

# Polish roots + inflectional/derivational suffixes: stresses the
# backward trie along real Polish morpheme paths.
ROOTS = """student nauczyciel komputer program miasto kobieta dziecko
praca woda ogien ksiazka krol czlowiek pies kot dom las reka noga oko
serce slowo jezyk czas rok dzien noc swiat kraj narod wojna pokoj
szkola uniwersytet profesor doktor minister prezydent krolowa matka
ojciec brat siostra syn corka zona maz przyjaciel wrog gosc pan pani
chlopiec dziewczyna morze rzeka gora pole droga ulica most kosciol
zamek wiez okno drzwi stol krzeslo lozko kuchnia pokoj ogrod drzewo
kwiat trawa ptak ryba kon krowa swinia owca koza kura jajko mleko
chleb maslo ser mieso zupa herbata kawa cukier sol pieprz pisa czyta
mowi robi widzi slysz mysl wie chce moze musi powinien lubi kocha
nienawidzi boi cieszy smuci gniewa dziwi pamieta zapomina uczy
studiuje pracuje odpoczywa spi budzi wstaje siada stoi lezy idzie
biegnie jedzie leci plywa skacze tanczy spiewa gra maluje rysuje
fotografuje buduje niszczy naprawia psuje otwiera zamyka wlacza
wylacza kupuje sprzedaje placi kosztuje zarabia wydaje oszczedza
pozycza oddaje bierze daje dostaje wysyla odbiera przynosi zanosi
niebieski czerwony zielony zolty czarny bialy szary brazowy rozowy
fioletowy pomaranczowy duzy maly wysoki niski dlugi krotki szeroki
waski gruby cienki ciezki lekki twardy miekki goracy zimny cieply
chlodny mokry suchy czysty brudny nowy stary mlody piekny brzydki
dobry zly madry glupi bogaty biedny silny slaby zdrowy chory szybki
wolny latwy trudny prosty skomplikowany wazny ciekawy nudny smieszny
smutny wesoly szczesliwy""".split()

SUFFIXES = """a y e u o i ow om ami ach owi em ie mi | ego emu ym im
ych ich ymi imi a e o | owie owie owcy anie enie cie nie acja acji
acje acjom acjami acjach osc osci osciom osciami osciach arz arza
arze arzy arzom ak aka aki akow ek ka ko ik ika iki ike nik nika
niki nikow ec ca ce cy stwo stwa stwie stw ota oty ocie izm izmu
izmie ista isty iscie ur ura urze | uje ujesz ujemy ujecie uja owac
owal owala owali owano awszy lszy acy aca ace etc | am asz amy acie
aja al ala alo aly ali alem isz imy icie il ila ilo ily ili ilem
iwszy""".replace("|", " ").split()

# test words from TestPolishAnalyzer / classic examples
SEEDS = """studenta studenci student byl była było profesora ksiazki
ksiazek ludzie ludzi czlowieka najwiekszego najpiekniejsza
warszawskiego krakowskie gdanskich""".split()

POLISH_ALPHA = "aąbcćdeęfghijklłmnńoóprsśtuwyzźż"


def build_wordlist() -> list[str]:
    words: list[str] = []
    seen = set()

    def add(w):
        if w and w not in seen:
            seen.add(w)
            words.append(w)

    for w in SEEDS:
        add(w)
    with open(STOPWORDS, encoding="utf-8") as f:
        for line in f:
            line = line.split("#")[0].strip()
            if line:
                add(line)
    for root in ROOTS:
        add(root)
        for suf in SUFFIXES:
            add(root + suf)
    # diacritic-swapped variants of a sample (trie has diacritic paths)
    rnd = random.Random(20260819)
    swaps = {"a": "ą", "e": "ę", "c": "ć", "l": "ł", "n": "ń",
             "o": "ó", "s": "ś", "z": "ż"}
    for root in ROOTS[::3]:
        w = "".join(swaps.get(ch, ch) if rnd.random() < 0.3 else ch
                    for ch in root)
        add(w)
        for suf in SUFFIXES[::5]:
            add(w + suf)
    # seeded fuzz over the Polish alphabet, lengths 1..16
    for _ in range(6000):
        n = rnd.randint(1, 16)
        add("".join(rnd.choice(POLISH_ALPHA) for _ in range(n)))
    # ASCII code-ish tokens (negative paths)
    for t in """return if else while class def import public static void
               main args string hashmap arraylist foobar xyzzy qwerty
               getvalue setvalue tostring equals hashcode""".split():
        add(t)
    return words


def main():
    out_tsv = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "tests", "data", "stempel", "golden.tsv")
    os.makedirs(os.path.dirname(out_tsv), exist_ok=True)

    build = tempfile.mkdtemp(prefix="stempel_build_")
    try:
        src = os.path.join(build, "src")
        ego_dst = os.path.join(src, "org/egothor/stemmer")
        stp_dst = os.path.join(src, "org/apache/lucene/analysis/stempel")
        os.makedirs(ego_dst)
        os.makedirs(stp_dst)
        for name in os.listdir(EGOTHOR):
            # Compile/DiffIt are CLI tools importing Lucene; not needed
            if name.endswith(".java") and name not in (
                    "Compile.java", "DiffIt.java", "package-info.java"):
                shutil.copy(os.path.join(EGOTHOR, name), ego_dst)
        shutil.copy(os.path.join(STEMPEL, "StempelStemmer.java"), stp_dst)
        with open(os.path.join(src, "StempelGoldenMain.java"), "w") as f:
            f.write(MAIN_JAVA)

        classes = os.path.join(build, "classes")
        os.makedirs(classes)
        javac = os.path.join(os.environ.get("JAVA_HOME", ""), "bin", "javac")
        java = os.path.join(os.environ.get("JAVA_HOME", ""), "bin", "java")
        subprocess.run(
            [javac, "-d", classes, "-encoding", "UTF-8",
             os.path.join(src, "StempelGoldenMain.java")]
            + [os.path.join(ego_dst, n) for n in os.listdir(ego_dst)]
            + [os.path.join(stp_dst, "StempelStemmer.java")],
            check=True)

        words = build_wordlist()
        proc = subprocess.run(
            [java, "-cp", classes, "StempelGoldenMain", TBL],
            input="\n".join(words).encode("utf-8"),
            stdout=subprocess.PIPE, check=True)
        out = proc.stdout.decode("utf-8")
        with open(out_tsv, "w", encoding="utf-8") as f:
            f.write(out)
        n = out.count("\n")
        print(f"wrote {n} goldens -> {out_tsv}")
    finally:
        shutil.rmtree(build, ignore_errors=True)


if __name__ == "__main__":
    main()
