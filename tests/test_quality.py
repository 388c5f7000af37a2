"""Search-quality metrics (reference benchmark/quality
QualityStats.java:79-130) vs a brute python twin."""

from __future__ import annotations

import pytest

from lucene_spark.operators.quality import quality_stats


def _brute(results, judged, p_at=(1, 5, 10)):
    """results: [(doc, rank)] sorted; judged: set."""
    out = {}
    n = len(results)
    good = 0
    psum = 0.0
    mrr = 0.0
    good_at = {}
    for doc, rank in sorted(results, key=lambda p: p[1]):
        rel = doc in judged
        if rel:
            good += 1
            psum += good / rank
            if mrr == 0.0 and rank <= 5:
                mrr = 1.0 / rank
        good_at[rank] = good
    for k in p_at:
        if k <= n:
            out[f"p_at_{k}"] = good_at[k] / k
        else:
            out[f"p_at_{k}"] = good / k        # numPoints·p_last/k
    out["mrr"] = mrr
    out["recall"] = good / len(judged) if judged else 0.0
    out["avp"] = psum / len(judged) if judged else 0.0
    return out


def test_quality_stats(spark):
    res = []
    jud = []
    cases = {
        "q1": ([10, 11, 12, 13, 14, 15, 16], {11, 13, 99}),
        "q2": ([20, 21, 22], {20, 21, 22, 23, 24}),
        "q3": ([30, 31, 32], {40}),                 # nothing relevant
        "q4": ([50, 51, 52, 53, 54, 55, 56, 57], {57}),  # first rel > 5
    }
    for qid, (docs, judged) in cases.items():
        for r, d in enumerate(docs, 1):
            res.append((qid, d, r))
        for d in judged:
            jud.append((qid, d))
    rdf = spark.createDataFrame(res, "query_id string, doc_id long, rank int")
    jdf = spark.createDataFrame(jud, "query_id string, doc_id long")
    got = {r["query_id"]: r.asDict()
           for r in quality_stats(rdf, jdf).collect()}
    for qid, (docs, judged) in cases.items():
        want = _brute([(d, r + 1) for r, d in enumerate(docs)], judged)
        for key, v in want.items():
            assert got[qid][key] == pytest.approx(v, rel=1e-12), (qid, key)
    # q4: first relevant at rank 8 → reference MRR stays 0
    assert got["q4"]["mrr"] == 0.0
    # p_at_10 extrapolation for 7-row q1: good(7)·? = good/10
    assert got["q1"]["p_at_10"] == pytest.approx(2 / 10)
