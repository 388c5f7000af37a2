"""Generate Beider-Morse golden fixtures with the REAL commons-codec
1.19 PhoneticEngine (bundled with the local pyspark distribution).

Vocabulary = surname lists across the BM language space + the phonetic
module's name set + prefix/apostrophe shapes + seeded fuzz (letters
incl. the diacritics the rule files key on). Output TSV replayed by
tests/test_beidermorse.py (exact match required).

Usage:  python tools/gen_bm_goldens.py [out_tsv]
"""

import os
import random
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CODEC_JAR = os.path.join(
    os.path.dirname(os.path.abspath(__import__("pyspark").__file__)),
    "jars", "commons-codec-1.19.0.jar")

NAMES = """
Beider Morse angelo d'angelo dangelo del angelo de la cruz van gogh
von schmidt da silva dos santos della rossa washington Renault Tronc
Durand Gang Champ Barbier Murat Constant abram abrams abramson achter
adler amsel andersen anderson auerbach baier bauer baum baumann becker
berg berger bergman berkowitz bernstein birnbaum blau blum blumenfeld
brandt braun breuer brodsky bruck buchholz cohen cohn davidson
dreyfus drucker edelman ehrlich eisenberg engel epstein fabian falk
feld feldman fink fischer frank freud fried friedman fuchs geller
glick goldberg goldman goldstein gottlieb greenbaum gross grossman
gutman halpern hammer heller herman herzog hirsch hoffman horn
horowitz kahn kaplan katz kaufman klein koch koenig kohn kramer
krause kruger landau lang lehman levi levin levine lewin lieberman
lipschitz lowenstein maier mandel marcus margolis mayer meier melamed
mendel meyer miller moses nadel nagel neuman newman nussbaum
oppenheim pearl perlman pick pollak rabinowitz reich reiter rosen
rosenbaum rosenberg rosenthal roth rothman rubin sachs salomon
schapiro schein scher schlesinger schneider schoen schreiber schulman
schultz schwartz segal shapiro siegel silber simon singer sokol
solomon sonnenberg spector spiegel spielberg stein steinberg stern
strauss tausig teitelbaum unger wasserman weber weil weinberg weiner
weinstein weiss wexler wolf zimmerman zucker kowalski nowak wojcik
kaminski lewandowski zielinski szymanski wozniak dabrowski kozlowski
jankowski mazur krawczyk kaczmarek piotrowski grabowski zajac pawlowski
michalski krol wieczorek jablonski wrobel nowakowski majewski olszewski
stepien malinowski jaworski adamczyk dudek nowicki pawlak gorski
witkowski walczak sikora baran rutkowski michalak szewczyk ostrowski
tomaszewski pietrzak zalewski wronski jasinski bukowski popescu ionescu
dumitrescu stanescu georgescu constantinescu marinescu stefanescu
papadopoulos nikolaidis georgiou dimitriou christodoulou economou
fernandez rodriguez gonzalez hernandez lopez martinez sanchez perez
gomez martin ruiz diaz alvarez moreno munoz alonso gutierrez romero
navarro torres dominguez vazquez ramos gil serrano blanco suarez
ortega delgado castro ortiz rubio marin sanz iglesias medina garrido
cortes castillo santos lozano guerrero cano prieto mendez calvo gallego
cruz vidal leon herrera marquez pena flores cabrera campos vega fuentes
carrasco diez caballero reyes nieto aguilar pascual herrero montero
lorenzo hidalgo gimenez ibanez ferrer duran santiago benitez mora
vicente vargas arias carmona crespo roman pastor soto saez velasco
moya soler parra esteban bravo gallardo rojas tchaikovsky dostoevsky
tolstoy pushkin chekhov lermontov turgenev gogol nabokov solzhenitsyn
pasternak bulgakov akhmatova tsvetaeva mandelstam brodsky müller
lüdenscheidt größe bäcker schäfer weiß strauß françois élodie
amélie zoë noël
""".split()

# the driver-entry injection names (codes pinned verbatim)
NAMES += ["kuczewski", "smith", "jose", "jankelowicz", "filipowicz",
          "gough", "ghislane", "michael", "thomas", "xavier", "knight",
          "wright", "euler"]

EDGES = ["d'angelo", "d'artagnan", "o'neil", "de la fontaine",
         "van der berg", "de los santos", "abu hassan", "ben david",
         "bar kochba", "12345", "a1b2", "x", "", "-", "--", "a-b",
         "jean-pierre", "marie-claire", "   padded   ", "de", "van",
         "d'", "del "]


def fuzz(n=12000, seed=0xBE1DE2):
    rng = random.Random(seed)
    alpha = ("aeiou" * 3 + "bcdfghjklmnpqrstvwxyz" * 2
             + "äöüßéèêçñăşţżźłćśčšž'")
    out = []
    for _ in range(n):
        ln = rng.randint(1, 12)
        w = "".join(rng.choice(alpha) for _ in range(ln))
        if rng.random() < 0.15:
            w = w.capitalize()
        if rng.random() < 0.08:
            i = rng.randint(0, len(w))
            w = w[:i] + " " + w[i:]
        if rng.random() < 0.08:
            i = rng.randint(0, len(w))
            w = w[:i] + "-" + w[i:]
        out.append(w)
    return out


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "tests", "data", "phonetic", "bm_golden.tsv")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    words, seen = [], set()
    for w in NAMES + EDGES + fuzz():
        if w and "\t" not in w and w not in seen:
            seen.add(w)
            words.append(w)
    classes = "/tmp/phon"
    subprocess.run(["javac", "-encoding", "UTF-8", "-cp", CODEC_JAR,
                    os.path.join(REPO, "tools", "GenBM.java"),
                    "-d", classes], check=True)
    proc = subprocess.run(
        ["java", "-Dfile.encoding=UTF-8", "-cp",
         f"{CODEC_JAR}:{classes}", "GenBM"],
        input="\n".join(words).encode("utf-8"),
        capture_output=True, check=True)
    with open(out_path, "wb") as f:
        f.write(b"# word\tgen_approx\tgen_exact\tash_approx\tsep_approx"
                b"\tgen_approx_noconcat\tgen_approx_german\n")
        f.write(proc.stdout)
    print(f"{len(words)} words -> {out_path}")


if __name__ == "__main__":
    main()
