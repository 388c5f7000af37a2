"""Soft deletes + retention-aware merges.

Reference semantics (``index/PendingSoftDeletes.java:34``,
``index/SoftDeletesRetentionMergePolicy.java:51``): soft-deleted docs are
masked from every search exactly like hard deletes, stay physically
present and revivable until a merge, and a merge purges them UNLESS the
retention query keeps them — retained docs are carried into the merged
segment, still masked, and still revivable afterwards.
"""

from __future__ import annotations

import tempfile

import numpy as np
import pytest

from lucene_spark.operators.build import build_index
from lucene_spark.operators.checkindex import check_index
from lucene_spark.operators.delete import (load_deletes, soft_delete_by_ids,
                                           soft_delete_by_term,
                                           soft_undelete_by_ids)
from lucene_spark.operators.merge import force_merge
from lucene_spark.operators.search import Searcher
from lucene_spark.oracle import OracleIndex
from lucene_spark.plans import query as Q
from lucene_spark.sources.catalog import SnapshotCatalog
from lucene_spark.sources.corpus import generate_corpus

N_DOCS = 200
DEL_TERM = "flush"
QUERY_TERM = "parse"


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(N_DOCS, seed=31)


@pytest.fixture(scope="module")
def oracle_full(corpus):
    return OracleIndex.build(list(zip(corpus.doc_id, corpus.content)))


def _soft_deleted_ids(oracle_full):
    return {doc for doc, _, _ in oracle_full.postings.get(DEL_TERM, ())}


def _build_soft(spark, corpus, tmpprefix):
    d = tempfile.mkdtemp(prefix=tmpprefix)
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=4)
    soft_delete_by_term(spark, d, DEL_TERM)
    return d


def test_soft_deletes_mask_like_hard(spark, corpus, oracle_full):
    """Readers can't distinguish soft from hard tombstones: surviving
    docs keep pre-delete scores (stale stats), soft-deleted never
    surface."""
    d = _build_soft(spark, corpus, "lucene_spark_soft_")
    s = Searcher(spark, d)
    gone = _soft_deleted_ids(oracle_full)
    assert gone
    got = [(r["doc_id"], r["score"])
           for r in s.search(Q.Term(QUERY_TERM), k=10).collect()]
    want = [(doc, sc) for doc, sc in
            oracle_full.top_k(Q.Term(QUERY_TERM), k=10 + len(gone))
            if doc not in gone][:10]
    assert [g[0] for g in got] == [w[0] for w in want]
    assert np.allclose([g[1] for g in got], [w[1] for w in want],
                       rtol=0, atol=0)
    assert s.count(Q.Term(DEL_TERM)) == 0
    # the hard tombstone table stays empty — classes are independent
    catalog = SnapshotCatalog(d)
    snap = catalog.load()
    assert not load_deletes(catalog, snap)
    assert load_deletes(catalog, snap, key="soft_deletes")


def test_soft_undelete_revives(spark, corpus, oracle_full):
    """Reviving every soft delete restores the exact pre-delete index
    view (the reference revives by clearing the soft-deletes DV)."""
    d = _build_soft(spark, corpus, "lucene_spark_softrev_")
    catalog = SnapshotCatalog(d)
    soft = load_deletes(catalog, catalog.load(), key="soft_deletes")
    soft_undelete_by_ids(spark, d, soft)
    snap = catalog.load()
    assert not load_deletes(catalog, snap, key="soft_deletes")
    s = Searcher(spark, d)
    got = [(r["doc_id"], r["score"])
           for r in s.search(Q.Term(DEL_TERM), k=10).collect()]
    want = oracle_full.top_k(Q.Term(DEL_TERM), k=10)
    assert [g[0] for g in got] == [w[0] for w in want]
    assert np.allclose([g[1] for g in got], [w[1] for w in want],
                       rtol=0, atol=0)


def test_merge_purges_soft_without_retention(spark, corpus, oracle_full):
    """No retention policy → merge reclaims soft deletes exactly like
    hard ones: post-merge index equals a fresh build over live docs."""
    d = _build_soft(spark, corpus, "lucene_spark_softpurge_")
    force_merge(spark, d, max_segments=1)
    catalog = SnapshotCatalog(d)
    snap = catalog.load()
    assert not load_deletes(catalog, snap, key="soft_deletes")
    gone = _soft_deleted_ids(oracle_full)
    live = corpus[~corpus.doc_id.isin(gone)]
    assert snap.field_stats["doc_count"] == len(live)
    oracle_live = OracleIndex.build(list(zip(live.doc_id, live.content)))
    s = Searcher(spark, d)
    got = [(r["doc_id"], r["score"])
           for r in s.search(Q.Term(QUERY_TERM), k=10).collect()]
    want = oracle_live.top_k(Q.Term(QUERY_TERM), k=10)
    assert [g[0] for g in got] == [w[0] for w in want]
    assert np.allclose([g[1] for g in got], [w[1] for w in want],
                       rtol=0, atol=0)
    check_index(d)   # raises on any violation


def test_merge_retains_soft_with_retention(spark, corpus, oracle_full):
    """Retention predicate keeps matching soft-deleted docs through the
    merge: they stay physical (counted in num_docs/stats), stay masked,
    and remain revivable under their NEW doc ids."""
    d = _build_soft(spark, corpus, "lucene_spark_softret_")
    catalog = SnapshotCatalog(d)
    gone = _soft_deleted_ids(oracle_full)
    retained_ids = set(corpus[corpus.doc_id.isin(gone)
                              & (corpus.lang == "java")].doc_id)
    force_merge(spark, d, max_segments=1, soft_retention="lang = 'java'")
    snap = catalog.load()
    assert len(snap.seg_ids) == 1
    # physical: retained docs counted; purged soft deletes gone
    live_plus_retained = corpus[~corpus.doc_id.isin(gone - retained_ids)]
    assert snap.field_stats["doc_count"] == len(live_plus_retained)
    soft = load_deletes(catalog, snap, key="soft_deletes")
    n_soft = sum(len(v) for v in soft.values())
    assert n_soft == len(retained_ids)
    check_index(d)   # raises on any violation

    # masked: search equals the stale view with ALL soft deletes hidden
    # but stats now over live+retained (merge recomputed them)
    s = Searcher(spark, d)
    assert s.count(Q.Term(DEL_TERM)) == 0
    oracle_lr = OracleIndex.build(list(zip(live_plus_retained.doc_id,
                                           live_plus_retained.content)))
    got = [(r["doc_id"], r["score"])
           for r in s.search(Q.Term(QUERY_TERM), k=10).collect()]
    want = [(doc, sc) for doc, sc in
            oracle_lr.top_k(Q.Term(QUERY_TERM), k=10 + len(retained_ids))
            if doc not in retained_ids][:10]
    assert [g[0] for g in got] == [w[0] for w in want]
    assert np.allclose([g[1] for g in got], [w[1] for w in want],
                       rtol=0, atol=0)

    # revivable: undelete the retained docs post-merge → they surface
    soft_undelete_by_ids(spark, d, soft)
    s2 = Searcher(spark, d)
    revived = {r["doc_id"] for r in
               s2.search(Q.Term(DEL_TERM), k=N_DOCS).collect()}
    assert revived == retained_ids


def test_soft_delete_by_ids_and_mixed_classes(spark, corpus, oracle_full):
    """Hard + soft tombstones coexist; merge purges hard and honors
    retention for soft in the same pass."""
    from lucene_spark.operators.delete import delete_by_ids

    d = tempfile.mkdtemp(prefix="lucene_spark_softmix_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=4)
    # hard-delete two docs, soft-delete two others (by global id)
    from lucene_spark.operators.delete import locate_global_ids
    catalog = SnapshotCatalog(d)
    snap = catalog.load()
    hard_g, soft_g = [0, 1], [2, 3]
    delete_by_ids(spark, d,
                  locate_global_ids(catalog, snap, hard_g, spark=spark))
    snap = catalog.load()
    soft_delete_by_ids(spark, d,
                       locate_global_ids(catalog, snap, soft_g,
                                         spark=spark))
    s = Searcher(spark, d)
    visible = {r["doc_id"] for r in
               s.search(Q.MatchAll(), k=N_DOCS, mode="exhaustive")
               .collect()} if hasattr(Q, "MatchAll") else None
    if visible is not None:
        assert {0, 1, 2, 3}.isdisjoint(visible)
    force_merge(spark, d, max_segments=1, soft_retention="doc_id >= 0")
    snap = catalog.load()
    assert snap.field_stats["doc_count"] == N_DOCS - 2  # hard purged
    soft = load_deletes(catalog, snap, key="soft_deletes")
    assert sum(len(v) for v in soft.values()) == 2      # soft retained
    check_index(d)   # raises on any violation
