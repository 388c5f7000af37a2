"""StringDistance SPI — goldens transcoded from the reference's
TestJaroWinklerDistance / TestLevenshteinDistance / TestNGramDistance /
suggest-module semantics, plus the scored SpellChecker path."""

from __future__ import annotations

import pytest

from lucene_spark.functions.strdist import (STRING_DISTANCES,
                                            jaro_winkler_similarity,
                                            levenshtein_similarity,
                                            lucene_levenshtein_similarity,
                                            ngram_similarity)


@pytest.fixture(scope="module")
def corpus():
    from lucene_spark.sources.corpus import generate_corpus
    return generate_corpus(250, seed=13)


@pytest.fixture(scope="module")
def searcher(spark, corpus):
    import tempfile

    from lucene_spark.operators.build import build_index
    from lucene_spark.operators.search import Searcher
    d = tempfile.mkdtemp(prefix="lucene_spark_strd_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=4)
    return Searcher(spark, d)


def test_jaro_winkler_goldens():
    """suggest/src/test/.../spell/TestJaroWinklerDistance.java."""
    d = jaro_winkler_similarity
    assert d("al", "al") == 1.0
    assert 0.961 < d("martha", "marhta") < 0.962
    assert 0.832 < d("jones", "johnson") < 0.833
    assert 0.958 < d("abcvwxyz", "cabvwxyz") < 0.959
    assert 0.84 < d("dwayne", "duane") < 0.841
    assert 0.813 < d("dixon", "dicksonx") < 0.814
    assert d("fvie", "ten") == 0.0
    assert d("zac ephron", "zac efron") > d("zac ephron", "kai ephron")
    assert (d("brittney spears", "britney spears")
            > d("brittney spears", "brittney startzman"))
    # the bonus applies when j >= threshold (the reference's CODE at
    # JaroWinklerDistance.java:73 — its javadoc's "negative threshold
    # gives plain Jaro" describes the opposite branch): threshold above
    # 1 disables the bonus, negative threshold always applies it
    assert d("martha", "marhta", threshold=2.0) < d("martha", "marhta")
    assert d("martha", "marhta", threshold=-1) == d("martha", "marhta")


def test_levenshtein_goldens():
    """TestLevenshteinDistance.java."""
    d = levenshtein_similarity
    assert d("al", "al") == 1.0
    assert abs(d("martha", "marhta") - 0.6666) < 0.001
    assert abs(d("jones", "johnson") - 0.4285) < 0.001
    assert abs(d("abcvwxyz", "cabvwxyz") - 0.75) < 0.001
    assert abs(d("dwayne", "duane") - 0.666) < 0.001
    assert abs(d("dixon", "dicksonx") - 0.5) < 0.001
    assert d("six", "ten") == 0.0
    assert abs(d("zac ephron", "zac efron")
               - d("zac ephron", "kai ephron")) < 0.001
    assert (d("brittney spears", "britney spears")
            > d("brittney spears", "brittney startzman"))
    assert d("", "al") == 0.0
    assert d("", "") == 1.0


@pytest.mark.parametrize("n,cases", [
    (1, [(("al", "al"), 1.0), (("a", "a"), 1.0), (("b", "a"), 0.0),
         (("martha", "marhta"), 0.6666), (("jones", "johnson"), 0.4285),
         (("natural", "contrary"), 0.25),
         (("abcvwxyz", "cabvwxyz"), 0.75), (("dwayne", "duane"), 0.666),
         (("dixon", "dicksonx"), 0.5), (("six", "ten"), 0.0)]),
    (2, [(("al", "al"), 1.0), (("a", "a"), 1.0), (("b", "a"), 0.0),
         (("a", "aa"), 0.5), (("martha", "marhta"), 0.6666),
         (("jones", "johnson"), 0.4285), (("natural", "contrary"), 0.25),
         (("abcvwxyz", "cabvwxyz"), 0.625), (("dwayne", "duane"), 0.5833),
         (("dixon", "dicksonx"), 0.5), (("six", "ten"), 0.0)]),
])
def test_ngram_goldens(n, cases):
    """TestNGramDistance.java testGetDistance1/2."""
    for (a, b), want in cases:
        assert abs(ngram_similarity(a, b, n) - want) < 0.001, (a, b, n)
    d1 = ngram_similarity("zac ephron", "zac efron", n)
    d2 = ngram_similarity("zac ephron", "kai ephron", n)
    assert (abs(d1 - d2) < 0.001) if n == 1 else (d1 > d2)


def test_lucene_levenshtein_osa():
    """LuceneLevenshteinDistance.java:47-95 — OSA transposition counts
    as ONE edit; normalization by min length; empty-string quirk."""
    d = lucene_levenshtein_similarity
    # marhta: one transposition → d=1, sim = 1 - 1/6
    assert abs(d("martha", "marhta") - (1 - 1 / 6)) < 1e-6
    # OSA vs unrestricted DL: 'bcda'→'cddbdb' differs (OSA=5, DL=4):
    assert abs(d("bcda", "cddbdb") - (1 - 5 / 4)) < 1e-6
    assert d("", "") == 0.0            # the reference's literal quirk
    assert d("", "ab") == 2.0          # returns max(n, m) raw
    assert d("ab", "ab") == 1.0


def test_spell_suggest_scored(spark, searcher, corpus):
    """SpellChecker.suggestSimilar ranking (score desc, df desc, term)
    across all four metrics — engine vs a driver-side replay over the
    same candidate slice."""
    from lucene_spark.operators.suggest import spell_suggest_scored

    dfs = {r["term"]: int(r["df"])
           for r in searcher.term_stats.select("term", "df").collect()}
    word = "sparc"
    for metric in STRING_DISTANCES:
        got = [(r["term"], r["score"], r["df"]) for r in
               spell_suggest_scored(searcher, word, k=5,
                                    distance=metric).collect()]
        fn = STRING_DISTANCES[metric]
        cand = [(t, float(fn(word, t)), c) for t, c in dfs.items()
                if t != word and abs(len(t) - len(word)) <= 2
                and t.startswith(word[0])]
        import numpy as np
        want = sorted(((t, np.float32(s), c) for t, s, c in cand),
                      key=lambda r: (-r[1], -r[2], r[0]))[:5]
        assert [(t, c) for t, _, c in got] == [(t, c) for t, _, c in want], \
            metric
        for (_, gs, _), (_, ws, _) in zip(got, want):
            assert abs(gs - float(ws)) < 1e-6, metric
    with pytest.raises(ValueError):
        spell_suggest_scored(searcher, word, distance="hamming")
