"""Porter stemmer + EnglishAnalyzer chain tests.

Goldens follow the reference implementation's own documented examples
(``en/PorterStemmer.java`` step comments) and the published algorithm's
vocabulary (Porter 1980)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_spark.functions.analysis import (ENGLISH_STOP_WORDS,
                                             analyze_batch, analyze_text)
from lucene_spark.functions.stem import (porter_stem, stem_terms,
                                         strip_possessive)

# (input, expected) — from PorterStemmer.java step comments + the paper
GOLDENS = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("disabled", "disabl"),
    ("matting", "mat"), ("mating", "mate"), ("meeting", "meet"),
    ("milling", "mill"), ("messing", "mess"), ("meetings", "meet"),
    ("plastered", "plaster"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("failing", "fail"), ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"),
    ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("valenci", "valenc"),
    ("digitizer", "digit"), ("radicalli", "radic"),
    ("differentli", "differ"), ("vileli", "vile"),
    ("analogousli", "analog"), ("vietnamization", "vietnam"),
    ("predication", "predic"), ("operator", "oper"),
    ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("hopefulness", "hope"), ("callousness", "callous"),
    ("formaliti", "formal"), ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"), ("formative", "form"),
    ("formalize", "formal"), ("electriciti", "electr"),
    ("electrical", "electr"), ("hopeful", "hope"), ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"),
    ("adjustment", "adjust"), ("dependent", "depend"),
    ("adoption", "adopt"), ("communism", "commun"),
    ("activate", "activ"), ("angulariti", "angular"),
    ("homologous", "homolog"), ("effective", "effect"),
    ("bowdlerize", "bowdler"), ("probate", "probat"), ("rate", "rate"),
    ("controll", "control"), ("roll", "roll"),
    ("cease", "ceas"), ("a", "a"), ("be", "be"),
]


def test_porter_goldens():
    bad = [(w, porter_stem(w), e) for w, e in GOLDENS if porter_stem(w) != e]
    assert not bad, bad


def test_possessive_filter():
    assert strip_possessive("lucene's") == "lucene"
    assert strip_possessive("it's") == "it"
    assert strip_possessive("its") == "its"
    assert strip_possessive("'s") == ""


def test_stem_terms_vocab_level():
    arr = np.array(["meetings", "running", "meetings", "lucene's"],
                   dtype=object)
    out = stem_terms(arr)
    assert out.tolist() == ["meet", "run", "meet", "lucen"]


def test_analyze_text_english_chain():
    # possessive strip happens BEFORE the stop filter: "it's" -> "it" ->
    # stopped (gap kept); stemming after the stop filter
    terms, positions, length = analyze_text(
        "It's the dog's meetings", stopwords=ENGLISH_STOP_WORDS,
        stemmer="porter")
    assert terms == ["dog", "meet"]
    assert positions == [2, 3]       # gaps where it's/the were dropped
    assert length == 2


def test_english_index_end_to_end(spark):
    """Build with the EnglishAnalyzer chain (stop + possessive + Porter):
    distributed engine is rank- and score-identical to the oracle with the
    same chain, and stemming actually conflates word forms."""
    import tempfile

    from lucene_spark.operators.build import build_index
    from lucene_spark.operators.search import Searcher
    from lucene_spark.oracle import OracleIndex
    from lucene_spark.plans import query as Q
    from lucene_spark.sources.corpus import generate_corpus

    corpus = generate_corpus(150, seed=31)
    d = tempfile.mkdtemp(prefix="lucene_spark_en_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=4,
                stopwords=ENGLISH_STOP_WORDS, stemmer="porter")
    oracle = OracleIndex.build(list(zip(corpus.doc_id, corpus.content)),
                               stopwords=ENGLISH_STOP_WORDS,
                               stemmer="porter")
    s = Searcher(spark, d)
    # query terms are stemmed vocabulary entries
    q = Q.Or((Q.Term(porter_stem("parse")), Q.Term(porter_stem("token"))))
    got = [(r["doc_id"], r["score"]) for r in s.search(q, k=10).collect()]
    want = oracle.top_k(q, k=10)
    assert got and [g[0] for g in got] == [w[0] for w in want]
    assert np.allclose([g[1] for g in got], [w[1] for w in want],
                       rtol=0, atol=0)


def test_analyze_batch_matches_analyze_text():
    docs = ["It's the dog's meetings",
            "Relational databases are conditional",
            "hopping and falling caresses",
            ""]
    doc_idx, terms, positions, lengths = analyze_batch(
        pd.Series(docs), stopwords=ENGLISH_STOP_WORDS, stemmer="porter")
    for i, d in enumerate(docs):
        t, p, ln = analyze_text(d, stopwords=ENGLISH_STOP_WORDS,
                                stemmer="porter")
        sel = doc_idx == i
        assert list(terms[sel]) == t, d
        assert list(positions[sel]) == p, d
        assert lengths[i] == ln, d
