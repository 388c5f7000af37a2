"""TermAutomatonQuery tests: the counts-DP kernel vs explicit path
enumeration (fuzz), plus engine ≡ oracle search parity (reference
sandbox/search/TermAutomatonQuery.java + TermAutomatonScorer.java)."""

from __future__ import annotations

import random
import tempfile

import numpy as np
import pytest

from lucene_spark.functions.automaton import (brute_path_count,
                                              run_term_automaton)
from lucene_spark.operators.build import build_index
from lucene_spark.operators.search import Searcher
from lucene_spark.oracle import OracleIndex
from lucene_spark.plans import query as Q
from lucene_spark.sources.corpus import generate_corpus


def _dp_freq(tokens, term_of, trans, anyt, accepts):
    """Run the kernel the way the scorer sees a doc: involved tokens
    only, sorted by position."""
    toks = [(p, term_of[t]) for p, t in enumerate(tokens)
            if t in term_of]
    toks.sort()
    return run_term_automaton(
        np.array([p for p, _ in toks], dtype=np.int64),
        np.array([ti for _, ti in toks], dtype=np.int64),
        trans, anyt, accepts)


def test_dp_simple_shapes():
    term_of = {"a": 0, "b": 1}
    # a . b   (a ANY b): 0 -a-> 1 -ANY-> 2 -b-> 3(accept)
    trans = {(0, 0): (1,), (2, 1): (3,)}
    anyt = {1: (2,)}
    acc = frozenset({3})
    assert _dp_freq(["a", "x", "b"], term_of, trans, anyt, acc) == 1
    assert _dp_freq(["a", "b"], term_of, trans, anyt, acc) == 0
    assert _dp_freq(["a", "x", "x", "b"], term_of, trans, anyt, acc) == 0
    assert _dp_freq(["a", "x", "b", "a", "x", "b"],
                    term_of, trans, anyt, acc) == 2
    # direct phrase a b
    trans2 = {(0, 0): (1,), (1, 1): (2,)}
    acc2 = frozenset({2})
    assert _dp_freq(["a", "b", "a", "b"], term_of, trans2, {}, acc2) == 2
    # branching NFA duplicates count as separate paths:
    # 0 -a-> {1, 2}; 1 -b-> 3; 2 -b-> 3  → "a b" yields freq 2
    trans3 = {(0, 0): (1, 2), (1, 1): (3,), (2, 1): (3,)}
    assert _dp_freq(["a", "b"], term_of, trans3, {}, frozenset({3})) == 2


def test_dp_matches_brute_paths_fuzz():
    """500 random automatons × random docs: counts DP ≡ explicit path
    enumeration."""
    rng = random.Random(5)
    alphabet = ["a", "b", "c", "x"]       # x never a query term
    for _ in range(500):
        n_states = rng.randint(2, 5)
        terms = ["a", "b", "c"][: rng.randint(1, 3)]
        term_of = {t: i for i, t in enumerate(terms)}
        trans: dict = {}
        anyt: dict = {}
        for _ in range(rng.randint(1, 7)):
            frm = rng.randrange(n_states)
            to = rng.randrange(n_states)
            if rng.random() < 0.25:
                anyt.setdefault(frm, ())
                anyt[frm] = anyt[frm] + (to,)
            else:
                key = (frm, term_of[rng.choice(terms)])
                trans.setdefault(key, ())
                trans[key] = trans[key] + (to,)
        accepts = frozenset(rng.sample(range(n_states),
                                       rng.randint(1, n_states)))
        tokens = [rng.choice(alphabet) for _ in range(rng.randint(0, 9))]
        want = brute_path_count(tokens, term_of, trans, anyt, accepts)
        got = _dp_freq(tokens, term_of, trans, anyt, accepts)
        assert got == want, (tokens, trans, anyt, accepts)


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(250, seed=23)


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex.build(list(zip(corpus.doc_id, corpus.content)))


@pytest.fixture(scope="module")
def searcher(spark, corpus):
    d = tempfile.mkdtemp(prefix="lucene_spark_tauto_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=4)
    return Searcher(spark, d)


AUTOMATONS = [
    # "if return" as a direct chain
    Q.TermAutomaton(((0, 1, "if"), (1, 2, "return")), (2,)),
    # "if ANY return" (gap of exactly one arbitrary token)
    Q.TermAutomaton(((0, 1, "if"), (1, 2, None), (2, 3, "return")), (3,)),
    # union branch: (if|while) def
    Q.TermAutomaton(((0, 1, "if"), (0, 1, "while"), (1, 2, "def")), (2,)),
    # self-loop ANY: "if (ANY)* return" up to engine semantics
    Q.TermAutomaton(((0, 1, "if"), (1, 1, None), (1, 2, "return")), (2,)),
    # df=0 arc never fires but query still works
    Q.TermAutomaton(((0, 1, "if"), (0, 1, "zzz_absent"),
                     (1, 2, "return")), (2,)),
]


@pytest.mark.parametrize("q", AUTOMATONS)
def test_parity_vs_oracle(searcher, oracle, q):
    got = [(r["doc_id"], np.float32(r["score"]))
           for r in searcher.search(q, k=10).collect()]
    want = [(d, np.float32(s)) for d, s in oracle.top_k(q, k=10)]
    assert len(want) > 0, q
    assert got == want, q


def test_all_absent_matches_nothing(searcher):
    q = Q.TermAutomaton(((0, 1, "zzz_absent"),), (1,))
    assert searcher.search(q, k=5).count() == 0


def test_wave_kernel_matches_per_doc_fuzz():
    """wave_term_automaton_freqs ≡ the per-doc DP over random automatons
    (with/without ANY arcs, multi-target transitions, inert terms)."""
    import random

    import numpy as np

    from lucene_spark.functions.automaton import (
        batch_term_automaton_freqs, wave_term_automaton_freqs)

    rng = random.Random(19)
    BIG = np.int64(1) << np.int64(32)
    for _ in range(600):
        n_states = rng.randint(2, 5)
        n_tids = rng.randint(1, 3)
        trans: dict = {}
        for _ in range(rng.randint(1, 6)):
            key = (rng.randrange(n_states), rng.randrange(n_tids))
            tg = rng.randrange(n_states)
            trans.setdefault(key, [])
            if tg not in trans[key]:
                trans[key].append(tg)
        trans = {k: tuple(v) for k, v in trans.items()}
        anyt: dict = {}
        if rng.random() < 0.5:
            for _ in range(rng.randint(1, 3)):
                st, tg = rng.randrange(n_states), rng.randrange(n_states)
                anyt.setdefault(st, [])
                if tg not in anyt[st]:
                    anyt[st].append(tg)
            anyt = {k: tuple(v) for k, v in anyt.items()}
        accepts = frozenset(rng.sample(range(n_states),
                                       rng.randint(1, n_states)))
        n_docs = rng.randint(1, 4)
        doc_keys = []
        for _ in range(n_tids):
            ks = [d * int(BIG) + p for d in range(n_docs)
                  for p in rng.sample(range(12), rng.randint(0, 5))]
            doc_keys.append(np.array(sorted(ks), dtype=np.int64))
        want = batch_term_automaton_freqs(doc_keys, n_docs, trans, anyt,
                                          accepts)
        got = wave_term_automaton_freqs(doc_keys, n_docs, trans, anyt,
                                        accepts)
        assert np.allclose(got, want), (trans, anyt, accepts)
