"""REAL-Lucene differential: the BASELINE.json headline metric is
"BM25 top-10 rank-identical match rate on the reference query set" —
this suite compares the engine against the reference itself, not just
the SQL twins.

``tests/data/lucene_diff/golden.tsv`` holds, for 45 queries spanning
every core scoring shape (term/boost, AND/OR/msm, MUST+SHOULD,
MUST_NOT, exact/sloppy/repeated phrase, dismax, synonym,
prefix/wildcard/fuzzy/range), the top-10 (doc_id, float-bits score)
and total hit count produced by the reference's own lucene-core
(compiled from /root/reference with javac, StandardAnalyzer, single
forceMerged segment over the sf0.001 documents fixture —
``tools/gen_lucene_goldens.py``).

The engine side replays through the float32-exact scoring oracle
(which the Spark engine is pinned to by the existing parity suites)
and requires BIT-IDENTICAL scores and identical ranking.
"""

import os
import struct

import duckdb
import pytest

from lucene_spark.oracle import OracleIndex
from lucene_spark.plans import query as Q

DATA = os.path.join(os.path.dirname(__file__), "data", "lucene_diff")
SF_DIR = "/root/testdata/sf0.001"


def _bits(score: float) -> int:
    return struct.unpack(">i", struct.pack(">f", score))[0]


def _parse_sim(name):
    """Engine Similarity SPI instance for a simterm golden query."""
    from lucene_spark.functions import similarity as S
    return {
        "classic": lambda: S.ClassicSimilarity(),
        "lmd": lambda: S.LMDirichletSimilarity(),
        "lmjm": lambda: S.LMJelinekMercerSimilarity(0.7),
        "dfr_inl2": lambda: S.DFRInL2Similarity(),
        "boolean": lambda: S.BooleanSimilarity(),
        "dfi": lambda: S.DFISimilarity(),
        "ib_ll": lambda: S.IBSimilarity("ll", "df", "h2"),
        "ax_f2log": lambda: S.AxiomaticSimilarity("f2log"),
        "indri": lambda: S.IndriDirichletSimilarity(),
        "multi": lambda: S.MultiSimilarity([S.BM25Similarity(),
                                            S.ClassicSimilarity()]),
    }[name]()


def _parse_query(parts):
    kind = parts[1]
    T = lambda t: Q.Term(t)
    if kind == "term":
        boost = float(parts[3]) if len(parts) > 3 else 1.0
        return Q.Term(parts[2], boost=boost)
    if kind == "and":
        return Q.And(tuple(T(t) for t in parts[2:]))
    if kind == "or":
        return Q.Or(tuple(T(t) for t in parts[3:]), int(parts[2]))
    if kind == "reqopt":
        return Q.ReqOpt(T(parts[2]), T(parts[3]))
    if kind == "not":
        return Q.Not(T(parts[2]), T(parts[3]))
    if kind == "phrase":
        return Q.Phrase(tuple(parts[3:]), slop=int(parts[2]))
    if kind == "dismax":
        return Q.DisMax(tuple(T(t) for t in parts[3:]), float(parts[2]))
    if kind == "synonym":
        return Q.Synonym(tuple(parts[2:]))
    if kind == "prefix":
        return Q.MultiTerm("prefix", parts[2])
    if kind == "wildcard":
        return Q.MultiTerm("wildcard", parts[2])
    if kind == "fuzzy":
        return Q.MultiTerm("fuzzy", parts[3], edits=int(parts[2]),
                           scored=True)
    if kind == "range":
        return Q.MultiTerm("range", (parts[2], parts[3], True, True))
    if kind == "gapphrase":
        pts = [p.split(":") for p in parts[3:]]
        return Q.Phrase(tuple(t for _, t in pts), slop=int(parts[2]),
                        positions=tuple(int(pos) for pos, _ in pts))
    if kind == "multiphrase":
        return Q.MultiPhrase(tuple(tuple(p.split("|")) for p in parts[2:]))
    if kind == "mpslop":
        # sloppy MultiPhraseQuery incl. shared terms across columns
        # (hasMultiTermRpts, SloppyPhraseMatcher.java:286-466)
        return Q.MultiPhrase(tuple(tuple(p.split("|"))
                                   for p in parts[3:]),
                             slop=int(parts[2]))
    if kind == "filterq":
        return Q.ReqFilter(T(parts[2]), T(parts[3]))
    if kind == "filteror":
        # SHOULD+FILTER with msm=0: the FILTER alone defines the match
        # set and SHOULD becomes optional scoring (BooleanWeight) —
        # composed as ReqOpt over a zero-boost filter term
        return Q.ReqOpt(Q.Term(parts[4], boost=0.0),
                        Q.Or((T(parts[2]), T(parts[3]))))
    if kind == "common":
        return Q.CommonTerms(tuple(parts[3:]),
                             max_term_frequency=float(parts[2]))
    if kind == "nested":
        return Q.ReqOpt(T(parts[2]), Q.Or((T(parts[3]), T(parts[4]))))
    if kind == "spannear":
        return Q.SpanNear(tuple(parts[4:]), slop=int(parts[2]),
                          in_order=parts[3] == "1")
    if kind == "spanor":
        return Q.SpanOr(tuple(parts[2:]))
    if kind == "spanfirst":
        return Q.SpanFirst(parts[3], int(parts[2]))
    if kind in ("iordered", "iunordered"):
        which = "ordered" if kind == "iordered" else "unordered"
        return Q.Interval((which, tuple(("term", t) for t in parts[2:])))
    if kind == "imaxgaps":
        return Q.Interval(
            ("maxgaps",
             ("unordered", tuple(("term", t) for t in parts[3:])),
             int(parts[2])))
    raise ValueError(kind)


@pytest.fixture(scope="module")
def oracle():
    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    return OracleIndex.build([(int(d), t or "") for d, t in rows])


def _goldens():
    out = []
    queries = {}
    with open(os.path.join(DATA, "queries.tsv"), encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if parts and parts[0]:
                queries[parts[0]] = parts
    with open(os.path.join(DATA, "golden.tsv"), encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            qid, total = parts[0], int(parts[1])
            hits = []
            for h in parts[2:]:
                d, b = h.split(":")
                hits.append((int(d), int(b)))
            out.append((qid, queries[qid], total, hits))
    return out


# EMPTY: every freq-divergence class is closed. SpanNear (q56-q61)
# with the exact NearSpansOrdered/Unordered ports; ordered intervals
# (q67) with the exact lastStart-minimizing walk; duplicate-clause
# span/interval scoring (q97-q104); and sloppy-phrase REPEATS
# (q105-q108) with the exact advanceRpts collision walk
# (functions/sloppy.py lucene_sloppy_repeat_matches +
# batch_lucene_repeat_freqs, golden-pinned by
# sloppy_repeat_fuzz.tsv.gz).
_KNOWN_FREQ_DIVERGENT: set = set()

# Java's Math.log and glibc's log differ by 1 ulp on some arguments
# (verified bit-for-bit on doc 44's H2 argument: Java ...707d vs glibc
# ...707c). Environmental, not algorithmic: ranks must still be
# identical and scores within a few ulps.
_KNOWN_LIBM_DIVERGENT = {"q77"}


@pytest.mark.parametrize("qid,qparts,total,hits",
                         _goldens(), ids=lambda v: v if isinstance(v, str) else "")
def test_rank_and_score_identical(qid, qparts, total, hits, oracle):
    if qparts[1] == "simterm":
        q = Q.Term(qparts[3])
        sim = _parse_sim(qparts[2])
        got = [(d, _bits(s)) for d, s in oracle.top_k(q, k=10, sim=sim)]
        if qid in _KNOWN_LIBM_DIVERGENT:
            assert [d for d, _ in got] == [d for d, _ in hits], qid
            assert all(abs(b1 - b2) <= 4 for (_, b1), (_, b2)
                       in zip(got, hits)), qid
        else:
            assert got == hits, f"{qid}: {got[:4]} != {hits[:4]}"
        assert len(oracle.score(q, sim=sim)) == total, qid
        return
    q = _parse_query(qparts)
    if qid in _KNOWN_FREQ_DIVERGENT:
        # doc MATCH SET must still be exactly the reference's
        assert len(oracle.score(q)) == total, qid
        return
    got = [(d, _bits(s)) for d, s in oracle.top_k(q, k=10)]
    assert got == hits, f"{qid}: {got[:4]} != {hits[:4]}"
    assert len(oracle.score(q)) == total, qid
