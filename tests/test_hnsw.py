"""Per-shard HNSW ANN: determinism, recall, exactness hook, degree caps.

Reference behavior mirrored: one graph per segment/shard
(``util/hnsw/HnswGraphBuilder.java:58``), per-leaf search + merge-by-score
(``search/AbstractKnnVectorQuery.java``), diversity neighbor selection.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark.pipeline import simsearch
from lucene_spark.pipeline.hnsw import _ShardGraph, build_hnsw, hnsw_topk


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(11)
    vecs = rng.randn(80, 16).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(80, dtype=np.int64),
                        "embedding": [v.tolist() for v in vecs]})
    return spark.createDataFrame(pdf), vecs


def test_local_graph_degree_caps_and_determinism():
    rng = np.random.RandomState(3)
    vecs = rng.randn(50, 8)
    ids = np.arange(50, dtype=np.int64)
    g1 = _ShardGraph(vecs, ids, M=4, ef_construction=20)
    g2 = _ShardGraph(vecs, ids, M=4, ef_construction=20)
    assert [a for a in g1.adj] == [a for a in g2.adj]
    assert g1.entry == g2.entry and g1.top == g2.top
    for node, per_level in enumerate(g1.adj):
        for layer, nbrs in enumerate(per_level):
            cap = 8 if layer == 0 else 4
            assert len(nbrs) <= cap
            assert node not in nbrs          # no self loops
            assert len(set(nbrs)) == len(nbrs)


def test_hnsw_exact_with_full_beam(spark, vectors):
    """ef ≥ shard size → the beam walks the whole connected component:
    results must equal brute force exactly (the driver-entry hook)."""
    emb_df, _ = vectors
    q = emb_df.where(F.col("vec_id") < 5)
    graph = build_hnsw(emb_df, num_shards=2, M=8, ef_construction=40)
    got = hnsw_topk(graph, q, k=4, ef=80, M=8).toPandas()
    exp = simsearch.brute_force_topk(emb_df, q, k=4).toPandas()
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    exp = exp.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got.neighbor_id.tolist() == exp.neighbor_id.tolist()
    assert np.array_equal(got.cos.to_numpy(), exp.cos.to_numpy())


def test_hnsw_recall_at_moderate_ef(spark, vectors):
    emb_df, _ = vectors
    q = emb_df.where(F.col("vec_id") < 10)
    graph = build_hnsw(emb_df, num_shards=2, M=8, ef_construction=40)
    got = hnsw_topk(graph, q, k=3, ef=12, M=8).toPandas()
    exp = simsearch.brute_force_topk(emb_df, q, k=3).toPandas()
    hits = 0
    for qid in range(10):
        g = set(got[got.query_id == qid].neighbor_id)
        e = set(exp[exp.query_id == qid].neighbor_id)
        hits += len(g & e)
    assert hits / 30 >= 0.9


def test_graph_table_deterministic(spark, vectors):
    emb_df, _ = vectors
    a = build_hnsw(emb_df, num_shards=2, M=8).toPandas()
    b = build_hnsw(emb_df, num_shards=2, M=8).toPandas()
    a = a.sort_values("vec_id").reset_index(drop=True)
    b = b.sort_values("vec_id").reset_index(drop=True)
    assert a.vec_id.tolist() == b.vec_id.tolist()
    assert a.level.tolist() == b.level.tolist()
    for x, y in zip(a.neighbors, b.neighbors):
        assert [list(map(int, lv)) for lv in x] \
            == [list(map(int, lv)) for lv in y]
