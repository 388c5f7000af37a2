"""Deletes / liveDocs: search masking, stale-stats semantics, merge purge.

Semantics mirrored from the reference: deletes mask results at collection
time (liveDocs in IndexSearcher's BulkScorer.score call) while postings
and collection statistics stay untouched until a merge purges them — so
pre-merge scores of surviving docs are IDENTICAL to pre-delete scores,
and post-force-merge scores equal a fresh index over the live corpus.
"""

from __future__ import annotations

import tempfile

import numpy as np
import pytest

from lucene_spark.operators.build import build_index
from lucene_spark.operators.delete import delete_by_term, load_deletes
from lucene_spark.operators.merge import force_merge
from lucene_spark.operators.search import Searcher
from lucene_spark.oracle import OracleIndex
from lucene_spark.plans import query as Q
from lucene_spark.sources.catalog import SnapshotCatalog
from lucene_spark.sources.corpus import generate_corpus

N_DOCS = 200
DEL_TERM = "flush"        # docs containing this term get deleted
QUERY_TERM = "parse"


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(N_DOCS, seed=23)


@pytest.fixture(scope="module")
def oracle_full(corpus):
    return OracleIndex.build(list(zip(corpus.doc_id, corpus.content)))


@pytest.fixture(scope="module")
def deleted_index(spark, corpus):
    d = tempfile.mkdtemp(prefix="lucene_spark_del_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=4)
    delete_by_term(spark, d, DEL_TERM)
    return d


def _deleted_doc_ids(oracle_full):
    return {doc for doc, _, _ in oracle_full.postings.get(DEL_TERM, ())}


def test_deleted_docs_masked_with_stale_stats(spark, deleted_index,
                                              oracle_full):
    """Pre-merge: surviving docs keep their pre-delete scores exactly
    (stats stale, like Lucene NRT deletes); deleted docs never surface."""
    s = Searcher(spark, deleted_index)
    gone = _deleted_doc_ids(oracle_full)
    assert gone  # the fixture term must actually delete something
    for q in (Q.Term(QUERY_TERM),
              Q.Or((Q.Term(QUERY_TERM), Q.Term(DEL_TERM))),
              Q.Not(Q.Term(QUERY_TERM), Q.Term("codec"))):
        for mode in ("exhaustive", "auto"):
            got = [(r["doc_id"], r["score"])
                   for r in s.search(q, k=10, mode=mode).collect()]
            want = [(d, sc) for d, sc in oracle_full.top_k(q, k=10 + len(gone))
                    if d not in gone][:10]
            assert [g[0] for g in got] == [w[0] for w in want], (q, mode)
            assert np.allclose([g[1] for g in got], [w[1] for w in want],
                               rtol=0, atol=0), (q, mode)


def test_count_excludes_deleted(spark, deleted_index, oracle_full):
    s = Searcher(spark, deleted_index)
    gone = _deleted_doc_ids(oracle_full)
    matches = set(oracle_full.score(Q.Term(QUERY_TERM)).keys())
    assert s.count(Q.Term(QUERY_TERM)) == len(matches - gone)
    assert s.count(Q.Term(DEL_TERM)) == 0


def test_update_documents(spark):
    """updateDocument role: replaced docs surface only with their new
    content; after force_merge the index equals a fresh oracle over the
    updated corpus exactly."""
    import pandas as pd

    from lucene_spark.operators.delete import update_documents

    corpus = generate_corpus(120, seed=29)
    d = tempfile.mkdtemp(prefix="lucene_spark_upd_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=3)

    upd_ids = [5, 6, 7]
    newdocs = corpus[corpus.doc_id.isin(upd_ids)].copy()
    newdocs["content"] = ["zzupdated marker doc five",
                          "zzupdated marker doc six",
                          "zzupdated marker doc seven"]
    update_documents(spark, d, spark.createDataFrame(newdocs))

    s = Searcher(spark, d)
    got = sorted(r["doc_id"] for r in
                 s.search(Q.Term("zzupdated"), k=10).collect())
    assert got == upd_ids
    # old content of the replaced docs no longer matches
    old_terms = set(corpus[corpus.doc_id == 5].content.iloc[0].split())
    marker = next(iter(old_terms - {"zzupdated"}))
    assert 5 not in {r["doc_id"] for r in
                     s.search(Q.Term(marker), k=120).collect()} \
        or marker in newdocs.content.iloc[0]

    force_merge(spark, d, max_segments=1)
    updated = pd.concat([corpus[~corpus.doc_id.isin(upd_ids)], newdocs])
    oracle_upd = OracleIndex.build(list(zip(updated.doc_id,
                                            updated.content)))
    s2 = Searcher(spark, d)
    for q in (Q.Term("zzupdated"), Q.Term("parse")):
        got = [(r["doc_id"], r["score"])
               for r in s2.search(q, k=10).collect()]
        want = oracle_upd.top_k(q, k=10)
        assert [g[0] for g in got] == [w[0] for w in want], q
        assert np.allclose([g[1] for g in got], [w[1] for w in want],
                           rtol=0, atol=0), q
    snap = SnapshotCatalog(d).load()
    assert snap.field_stats["doc_count"] == len(updated)


def test_merge_purges_deletes(spark, corpus, deleted_index, oracle_full):
    """force_merge drops tombstoned docs, compacts docIDs, recomputes
    stats — results must equal a fresh oracle over the live corpus."""
    force_merge(spark, deleted_index, max_segments=1)
    catalog = SnapshotCatalog(deleted_index)
    snap = catalog.load()
    assert len(snap.seg_ids) == 1
    assert not load_deletes(catalog, snap)          # tombstones purged
    gone = _deleted_doc_ids(oracle_full)
    live = corpus[~corpus.doc_id.isin(gone)]
    assert snap.field_stats["doc_count"] == len(live)

    oracle_live = OracleIndex.build(list(zip(live.doc_id, live.content)))
    assert snap.field_stats["sum_total_term_freq"] == oracle_live.sum_ttf

    s = Searcher(spark, deleted_index)
    for q in (Q.Term(QUERY_TERM), Q.And((Q.Term("codec"), Q.Term("util"))),
              Q.Phrase(("mixed", "case"))):
        got = [(r["doc_id"], r["score"])
               for r in s.search(q, k=10).collect()]
        want = oracle_live.top_k(q, k=10)
        assert [g[0] for g in got] == [w[0] for w in want], q
        assert np.allclose([g[1] for g in got], [w[1] for w in want],
                           rtol=0, atol=0), q
    assert s.count(Q.Term(DEL_TERM)) == 0
