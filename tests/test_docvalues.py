"""Numeric DocValues updates: overlay read, last-write-wins, merge bake.

Semantics mirrored from the reference: ``IndexWriter.updateNumericDocValue
(Term, field, value)`` (``index/BufferedUpdates.java:63``,
``index/NumericDocValuesFieldUpdates.java:38``) updates a per-doc numeric
field without reindexing; readers resolve the latest update generation
over the base values (``index/ReadersAndUpdates.java:287``), and merges
bake updates into the merged segment so overlay generations disappear.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from lucene_spark.operators.build import build_index
from lucene_spark.operators.docvalues import update_numeric_docvalue
from lucene_spark.operators.merge import force_merge, merge_segments
from lucene_spark.operators.search import Searcher
from lucene_spark.oracle import OracleIndex
from lucene_spark.sources.catalog import SnapshotCatalog
from lucene_spark.sources.corpus import generate_corpus

N_DOCS = 200
TERM_A = "else"
TERM_B = "while"
FIELD = "popularity"


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(N_DOCS, seed=31)


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex.build(list(zip(corpus.doc_id, corpus.content)))


def _matching(oracle, term):
    return {doc for doc, _, _ in oracle.postings.get(term, ())}


@pytest.fixture()
def dv_index(spark, corpus):
    d = tempfile.mkdtemp(prefix="lucene_spark_dv_")
    df = (spark.createDataFrame(corpus)
          .withColumn(FIELD, (F.col("doc_id") % 7).cast("long")))
    build_index(spark, df, d, num_segments=4)
    return d


def _expected(oracle, updates):
    """{doc_id: value} after applying ``updates`` = [(term, value)] in
    order, over base doc_id % 7."""
    exp = {i: i % 7 for i in range(N_DOCS)}
    for term, value in updates:
        for doc in _matching(oracle, term):
            exp[doc] = value
    return exp


def _resolved(spark, index_dir):
    s = Searcher(spark, index_dir)
    pdf = s.docvalues(FIELD).select("doc_id", "value").toPandas()
    return dict(zip(pdf.doc_id.astype(int), pdf.value.astype(int)))


def test_update_overlay_read(spark, dv_index, oracle):
    update_numeric_docvalue(spark, dv_index, TERM_A, FIELD, 100)
    assert _matching(oracle, TERM_A)  # fixture term must hit something
    assert _resolved(spark, dv_index) == _expected(oracle, [(TERM_A, 100)])


def test_last_write_wins(spark, dv_index, oracle):
    update_numeric_docvalue(spark, dv_index, TERM_A, FIELD, 100)
    update_numeric_docvalue(spark, dv_index, TERM_B, FIELD, 200)
    both = _matching(oracle, TERM_A) & _matching(oracle, TERM_B)
    assert both  # overlap required for the test to bite
    assert _resolved(spark, dv_index) == \
        _expected(oracle, [(TERM_A, 100), (TERM_B, 200)])


def test_force_merge_bakes_all(spark, dv_index, oracle):
    update_numeric_docvalue(spark, dv_index, TERM_A, FIELD, 100)
    exp = _expected(oracle, [(TERM_A, 100)])
    force_merge(spark, dv_index, max_segments=1)
    snap = SnapshotCatalog(dv_index).load()
    # every overlay row baked into the merged doc_meta → no overlay left
    assert not (snap.extra or {}).get("dv_updates")
    assert _resolved(spark, dv_index) == exp
    # the BASE column itself now holds the updated values
    s = Searcher(spark, dv_index)
    pdf = s.doc_meta.select("doc_id", FIELD).toPandas()
    assert dict(zip(pdf.doc_id.astype(int),
                    pdf[FIELD].astype(int))) == exp


def test_partial_merge_carries_survivors(spark, dv_index, oracle):
    update_numeric_docvalue(spark, dv_index, TERM_A, FIELD, 100)
    exp = _expected(oracle, [(TERM_A, 100)])
    snap = SnapshotCatalog(dv_index).load()
    seg_ids = snap.seg_ids
    merge_segments(spark, dv_index, seg_ids[:2])
    snap2 = SnapshotCatalog(dv_index).load()
    # overlay still present iff an un-merged segment had updated docs
    assert _resolved(spark, dv_index) == exp
    # a second merge of everything retires the rest
    force_merge(spark, dv_index, max_segments=1)
    assert not (SnapshotCatalog(dv_index).load().extra or {}) \
        .get("dv_updates")
    assert _resolved(spark, dv_index) == exp
    assert snap2.snapshot_id > snap.snapshot_id


def test_field_exists_query(spark, tmp_path):
    """FieldExistsQuery role: live docs with a non-null docvalues field;
    deletes masked."""
    from lucene_spark.operators.build import build_index
    from lucene_spark.operators.delete import delete_by_term
    from lucene_spark.operators.search import Searcher

    rows = [(i, f"doc number {i} waffle" if i % 3 == 0 else f"doc {i}",
             (i * 10 if i % 2 == 0 else None)) for i in range(30)]
    d = str(tmp_path / "fex")
    build_index(spark, spark.createDataFrame(
        rows, "doc_id long, content string, score_hint long"),
        d, num_segments=2)
    s = Searcher(spark, d)
    got = sorted(r["doc_id"] for r in s.field_exists("score_hint").collect())
    assert got == [i for i in range(30) if i % 2 == 0]
    # tombstoned docs drop out
    delete_by_term(spark, d, "waffle")
    s2 = Searcher(spark, d)
    got2 = sorted(r["doc_id"]
                  for r in s2.field_exists("score_hint").collect())
    assert got2 == [i for i in range(30) if i % 2 == 0 and i % 3 != 0]


def test_docvalues_in_set(spark, tmp_path):
    """DocValuesNumbersQuery role (sandbox/search/DocValuesNumbersQuery
    .java): docs whose numeric docvalue is in a set — overlay-resolved,
    deletes masked."""
    from lucene_spark.operators.build import build_index
    from lucene_spark.operators.delete import delete_by_term
    from lucene_spark.operators.docvalues import update_numeric_docvalue
    from lucene_spark.operators.search import Searcher

    rows = [(i, f"doc number {i} waffle" if i % 3 == 0 else f"doc {i}",
             i * 10) for i in range(30)]
    d = str(tmp_path / "dvset")
    build_index(spark, spark.createDataFrame(
        rows, "doc_id long, content string, score_hint long"),
        d, num_segments=2)
    s = Searcher(spark, d)
    got = sorted((r["doc_id"], r["value"])
                 for r in s.docvalues_in_set("score_hint",
                                             [20, 50, 70, 999]).collect())
    assert got == [(2, 20), (5, 50), (7, 70)]
    # overlay: docs containing 'number' (i%3==0) now carry 999
    update_numeric_docvalue(spark, d, "number", "score_hint", 999)
    s2 = Searcher(spark, d)
    got2 = sorted((r["doc_id"], r["value"])
                  for r in s2.docvalues_in_set("score_hint",
                                               [20, 50, 999]).collect())
    want = ([(i, 999) for i in range(30) if i % 3 == 0]
            + [(2, 20), (5, 50)])
    assert got2 == sorted(want)
    # tombstones mask
    delete_by_term(spark, d, "waffle")
    s3 = Searcher(spark, d)
    got3 = sorted((r["doc_id"], r["value"])
                  for r in s3.docvalues_in_set("score_hint",
                                               [20, 50, 999]).collect())
    assert got3 == [(2, 20), (5, 50)]
