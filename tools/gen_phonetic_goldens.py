"""Generate phonetic golden fixtures with the REAL commons-codec 1.19
encoders (the library the reference's analysis/phonetic module wraps;
bundled with the local pyspark distribution).

Vocabulary = classic phonetic test names + crafted digraph edge cases
+ distinct corpus tokens from the sf0.01 documents table + seeded fuzz
strings over a digraph-stressing alphabet. Output is one TSV the pytest
suite replays against the Python encoders (exact match required).

Usage:  python tools/gen_phonetic_goldens.py [out_tsv]
"""

import os
import random
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CODEC_JAR = os.path.join(
    os.path.dirname(os.path.abspath(__import__("pyspark").__file__)),
    "jars", "commons-codec-1.19.0.jar")

# Classic phonetic-literature names + the reference's own test vectors.
NAMES = """
international Kuczewski Smith Schmidt Snider Schneider Jose Cabrillo
Gough Ghislane Xavier Caesar cagney Chianti orchestra architect
chemistry school sugar island isle science scene Ashcraft Ashcroft
Tymczak Pfister Honeyman Robert Rupert Darda Karleen Datha Carlene
Peter Stevenson MACINTOSH KNUTH PHILLIPSON Thompson Thomson Washington
Lee Gutierrez Jackson VanDeusen Deusen Knight Wright Philip Phillip
Bryan Brian Bryce Brown Browne Allricht Eberhard Engebrethson
Heimbach Hanselmann Hildebrand Hildebrandt Lind Lukaschowsky
McDonnell McGee Opnian Oppenheimer Riedemanas Zita Zitzmeinn
Wiberg Wibel Uhrbach Uhr Auerbach Maurice Aubrey Cambrillo Heidi
Katherine Kathryn Knies Pniewski Czarkowska czerny focaccia
bellocchio bacchus accident accede succeed bacci bertucci mac caffrey
mac gregor hochmeier chmiel wachtler wechsler tichner Jankelowicz
Filipowicz Wewski Wowski Zhao Zhivago horowitz Moskowitz regnia
hoch ach drachen aufenthalt breaux broughton caesar jose san jacinto
sanjacinto resnais artois edge edgar ghent gnarl gnome sign signed
campbell raspberry thumb dumb laugh cough enough rough tough through
thorough waugh schooner schermerhorn schenker smith schmidt jean john
filipowicz ghiradelli ghoul whirl whale who whom jankelowicz yankelovich
dabrowski dombrowski wicz witz zhou jia jianu island carlisle carlysle
thames charac charis chorus chym chia chemo germ gym gyn gift gib
uomo womo vanwagner llama lima maria aidan danger ranger manger anger
finger tangier bungalow angel angle jugal agnize resign design
Ömer Müller Jürgen Größe Bäcker Schäfer weiß strauß ßtrange
Wikipedia breschnew müller-lüdenscheidt mueller lüdenscheidt
""".split()

# crafted edge shapes: affixes and digraph clusters at word
# start / middle / end, non-letters, empty-ish tokens
EDGES = []
for core in ["ch", "sch", "gh", "gn", "kn", "pn", "wr", "ps", "wh",
             "cc", "cg", "ck", "cz", "dg", "tch", "th", "sh", "sio",
             "tia", "cia", "sz", "zh", "mb", "ae", "x", "q", "j",
             "witz", "wicz", "eau", "ough", "augh", "umb", "gned",
             "ier", "er", "es", "ois", "aggi", "oggi", "alle", "ille",
             "illo", "white", "wh", "hu", "uo", "om"]:
    EDGES += [core, core + "a", "a" + core, "a" + core + "a",
              core + "o", "o" + core, core.upper(),
              core.capitalize() + "er"]
EDGES += ["12345", "#$%@#^%&", "a1b2", "x", "X", "", "'", "o'neil",
          "d'arcy", "l'été", "naïve", "café", "señor", "jalapeño",
          # multi-word shapes the DM/DoubleMetaphone context rules key on
          "san jacinto", "van gelder", "von schmidt", "mac caffrey",
          "mac gregor", "van ness", "la chaise", " padded ",
          # digit/letter interleave probes for lastChar semantics
          "m1n", "n2m", "mn", "nm", "a1a", "s1t", "c1h", "1ch", "ab1",
          "mc1lelland", "x1x", "e1i", "rz1", "t1s",
          # Daitch-Mokotoff folding + branching probes
          "ćwik", "łukasz", "żółć", "śliwa", "źrebak", "ţara", "ągę",
          "mojżesz", "rzeszów", "przemyśl", "auerbach", "ohrbach",
          "lipshitz", "lipschutz", "lewinsky", "levinsky", "szlamawicz",
          "shlamovitz", "peters", "peterson", "moskowitz", "moskovitz",
          "jackson", "jackson-jackson", "golden", "goldberg", "ay", "aj",
          "oyoy", "euler", "ujejski", "mnm", "nmn", "xx", "ck", "rs",
          "jjj", "cks", "chch"]
# lowercase forms of the driver-entry injection names (pinned verbatim)
EDGES += ["kuczewski", "gough", "ghislane", "michael", "thomas",
          "xavier", "knight", "wright"]


def corpus_tokens(limit=15000):
    import duckdb
    sf = os.environ.get("PHON_SF_DIR", "/root/testdata/sf0.01")
    path = os.path.join(sf, "documents.parquet")
    rows = duckdb.sql(f"""
        SELECT DISTINCT tok FROM (
          SELECT unnest(regexp_split_to_array(lower(text),
                        '[^a-z0-9'']+')) AS tok
          FROM read_parquet('{path}')
        ) WHERE length(tok) BETWEEN 1 AND 24
        ORDER BY tok LIMIT {limit}
    """).fetchall()
    return [r[0] for r in rows]


def fuzz(n=25000, seed=0xC0DEC):
    rng = random.Random(seed)
    # digraph-stressing alphabet: heavy on the letters with special rules
    alpha = ("cghsztwxjq" * 4) + "aeiouy" * 3 + "bdfklmnprv" + "ßäöü'"
    out = []
    for _ in range(n):
        ln = rng.randint(1, 10)
        w = "".join(rng.choice(alpha) for _ in range(ln))
        if rng.random() < 0.3:
            w = w.capitalize()
        if rng.random() < 0.05:
            w = w.upper()
        out.append(w)
    return out


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "tests", "data", "phonetic", "golden.tsv")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    words = []
    seen = set()
    for w in NAMES + EDGES + corpus_tokens() + fuzz():
        if w and "\t" not in w and w not in seen:
            seen.add(w)
            words.append(w)
    classes = os.path.join("/tmp", "phon")
    subprocess.run(["javac", "-cp", CODEC_JAR,
                    os.path.join(REPO, "tools", "GenPhonetic.java"),
                    "-d", classes], check=True)
    proc = subprocess.run(
        ["java", "-cp", f"{CODEC_JAR}:{classes}", "GenPhonetic"],
        input="\n".join(words).encode("utf-8"),
        capture_output=True, check=True)
    with open(out_path, "wb") as f:
        f.write(b"# word\tmetaphone4\tmetaphone8\tdm_pri4\tdm_alt4\t"
                b"dm_pri8\tdm_alt8\tcologne\tdaitch_mokotoff\tsoundex\t"
                b"refined\tcaverphone2\tnysiis\n")
        f.write(proc.stdout)
    print(f"{len(words)} words -> {out_path}")


if __name__ == "__main__":
    main()
