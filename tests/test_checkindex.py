"""CheckIndex library/CLI: passes on healthy indexes (fresh, deleted,
merged), fails on corruption."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest

from lucene_spark.operators.build import build_index
from lucene_spark.operators.checkindex import CheckIndexError, check_index
from lucene_spark.operators.delete import delete_by_term
from lucene_spark.operators.merge import force_merge
from lucene_spark.sources.catalog import SnapshotCatalog
from lucene_spark.sources.corpus import generate_corpus


@pytest.fixture(scope="module")
def idx(spark):
    corpus = generate_corpus(150, seed=41)
    d = tempfile.mkdtemp(prefix="lucene_spark_chk_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=3)
    return d


def test_check_fresh_index(idx):
    totals = check_index(idx)
    assert totals["segments"] == 3
    assert totals["num_docs"] == 150
    assert totals["num_deleted"] == 0


def test_check_after_delete_and_merge(spark, idx):
    delete_by_term(spark, idx, "flush")
    totals = check_index(idx)
    assert totals["num_deleted"] > 0
    assert totals["num_docs"] == 150          # stats stale until merge
    force_merge(spark, idx, max_segments=1)
    totals = check_index(idx)
    assert totals["segments"] == 1
    assert totals["num_deleted"] == 0
    assert totals["num_docs"] < 150


def test_check_distributed_mode(spark, idx):
    """spark= fans the same per-segment check out as executor tasks:
    identical totals, and corruption raises through the task boundary."""
    assert check_index(idx, spark=spark) == check_index(idx)


def test_check_detects_corruption(spark):
    corpus = generate_corpus(60, seed=43)
    d = tempfile.mkdtemp(prefix="lucene_spark_bad_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=1)
    catalog = SnapshotCatalog(d)
    seg_dir = catalog.segment_dir(catalog.load().seg_ids[0])
    p = os.path.join(seg_dir, "postings.parquet")
    pdf = pd.read_parquet(p)
    pdf.loc[0, "df"] = int(pdf.loc[0, "df"]) + 1   # lie about df
    pdf.to_parquet(p)
    with pytest.raises(CheckIndexError):
        check_index(d)
    with pytest.raises(CheckIndexError):
        check_index(d, spark=spark)
