"""The BASELINE.md headline gate: 100% rank-identical top-10 (docIDs AND
float32 scores, exact) on the full reference-style query set — terms at
df percentiles, AND/OR conjunctions, phrases, absent terms (FIXTURES.md
§2-3's golden_topk contract) — executed as one batch job."""

from __future__ import annotations

import tempfile

import numpy as np
import pytest

from lucene_spark.operators.build import build_index
from lucene_spark.operators.search import Searcher
from lucene_spark.oracle import OracleIndex
from lucene_spark.plans.parser import QueryParseError, parse
from lucene_spark.sources.corpus import generate_corpus
from lucene_spark.sources.queryset import generate_query_set

N_DOCS = 500


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(N_DOCS, seed=42)


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex.build(list(zip(corpus.doc_id, corpus.content)))


@pytest.fixture(scope="module")
def searcher(spark, corpus):
    d = tempfile.mkdtemp(prefix="lucene_spark_qset_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=8)
    return Searcher(spark, d)


def test_full_query_set_rank_identical(searcher, oracle):
    dfs = {t: oracle.df(t) for t in oracle.postings}
    workload_text = generate_query_set(dfs, seed=42)
    assert len(workload_text) == 60
    workload = {}
    for qid, text in workload_text.items():
        try:
            workload[qid] = parse(text)
        except QueryParseError:
            pytest.fail(f"reference query failed to parse: {text!r}")

    batch = searcher.search_many(workload, k=10).collect()
    by_q: dict[str, list] = {qid: [] for qid in workload}
    for r in batch:
        by_q[r["query_id"]].append((r["rank"], r["doc_id"], r["score"]))

    mismatches = []
    for qid, q in workload.items():
        want = oracle.top_k(q, k=10)
        got = sorted(by_q[qid])
        if [g[1] for g in got] != [w[0] for w in want]:
            mismatches.append((qid, "docids", got, want))
            continue
        if not np.array_equal(np.float32([g[2] for g in got]),
                              np.float32([w[1] for w in want])):
            mismatches.append((qid, "scores", got, want))
    assert not mismatches, mismatches[:3]
    # the match-rate metric the baseline demands: 100%
    assert len([q for q in workload if q not in
                {m[0] for m in mismatches}]) == len(workload)
