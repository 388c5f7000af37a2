"""Tiered merge correctness + streaming incremental build."""

import os
import tempfile

import numpy as np
import pytest

from lucene_spark.operators.build import build_index
from lucene_spark.operators.merge import force_merge, maintain, merge_segments, plan_merges
from lucene_spark.operators.search import Searcher
from lucene_spark.oracle import OracleIndex
from lucene_spark.plans.parser import parse
from lucene_spark.sources.corpus import generate_corpus
from lucene_spark.sources.catalog import SnapshotCatalog

MQUERIES = ["parse OR emit OR token", "codec AND util", '"mixed case"',
            "scan -flush", "if"]


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(300, seed=42)


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex.build(list(zip(corpus.doc_id, corpus.content)))


def _assert_parity(searcher, oracle, queries=MQUERIES, k=10):
    for qtext in queries:
        got = [(r.doc_id, np.float32(r.score)) for r in
               searcher.search(qtext, k=k).collect()]
        want = [(d, np.float32(s)) for d, s in oracle.top_k(parse(qtext), k=k)]
        assert got == want, qtext


def test_plan_merges():
    segs = [{"seg_id": i, "num_docs": 100 + i} for i in range(25)]
    merges = plan_merges(segs, segs_per_tier=10, max_merge_at_once=10)
    assert len(merges) == 2 and all(len(m) == 10 for m in merges)
    assert plan_merges(segs[:8]) == []


def test_merge_preserves_results(spark, corpus, oracle):
    d = tempfile.mkdtemp(prefix="merge_idx_")
    snap = build_index(spark, spark.createDataFrame(corpus), d, num_segments=12)
    assert len(snap.seg_ids) == 12
    # merge the first 6 segments
    snap2 = merge_segments(spark, d, snap.seg_ids[:6])
    assert len(snap2.seg_ids) == 7
    se = Searcher(spark, d)
    _assert_parity(se, oracle)
    # stats unchanged by merge
    assert se.doc_count == oracle.doc_count
    assert se.sum_ttf == oracle.sum_ttf
    # old snapshot is still a readable point-in-time view
    se_old = Searcher(spark, d, snapshot_id=snap.snapshot_id)
    _assert_parity(se_old, oracle, queries=["parse OR emit OR token"])
    # force-merge to one segment → still rank-identical
    snap3 = force_merge(spark, d, max_segments=1)
    assert len(snap3.seg_ids) == 1
    _assert_parity(Searcher(spark, d), oracle)
    # merged segment invariants: one docBase-contiguous segment
    import pandas as pd
    seg = snap3.seg_ids[0]
    norms = pd.read_parquet(os.path.join(d, "segments", f"seg={seg}", "norms.parquet"))
    assert int(norms.iloc[0]["num_docs"]) == len(corpus)
    meta = pd.read_parquet(os.path.join(d, "segments", f"seg={seg}", "doc_meta.parquet"))
    assert sorted(meta["local_doc_id"]) == list(range(len(corpus)))


def test_capped_force_merge(spark, corpus, oracle):
    """max_merged_docs caps the docs routed through any single merge:
    force_merge converges to the fewest segments the cap allows, every
    intermediate merge stays under the cap, CheckIndex passes and results
    are rank/score-identical."""
    from lucene_spark.operators.checkindex import check_index

    d = tempfile.mkdtemp(prefix="capped_merge_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=12)
    # 300 docs / cap 120 → no merge may exceed 120 docs; the index cannot
    # reach 1 segment, but must reach ceil(300/120) = 3
    snap = force_merge(spark, d, max_segments=1, max_merged_docs=120)
    assert 3 <= len(snap.seg_ids) <= 5
    assert all(s["num_docs"] <= 120 for s in snap.segments
               if s.get("origin") == "merge")
    totals = check_index(d)
    assert totals["num_docs"] == len(corpus)
    _assert_parity(Searcher(spark, d), oracle)
    # cap=None restores the reference's literal merge-everything behavior
    snap2 = force_merge(spark, d, max_segments=1, max_merged_docs=None)
    assert len(snap2.seg_ids) == 1
    _assert_parity(Searcher(spark, d), oracle,
                   queries=["parse OR emit OR token"])


def test_maintain_tiered(spark, corpus, oracle):
    d = tempfile.mkdtemp(prefix="tiered_idx_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=24)
    snap = maintain(spark, d, segs_per_tier=10, max_merge_at_once=10)
    assert len(snap.seg_ids) <= 10
    _assert_parity(Searcher(spark, d), oracle, queries=["parse OR emit OR token"])


def test_streaming_incremental(spark, corpus, oracle):
    from lucene_spark.streaming.incremental import start_incremental_build

    src = tempfile.mkdtemp(prefix="stream_src_")
    d = tempfile.mkdtemp(prefix="stream_idx_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    full = spark.createDataFrame(corpus)
    schema = full.schema
    # batch 1 lands before the stream starts
    full.filter("doc_id < 150").coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    q = start_incremental_build(spark, stream, d, segments_per_batch=4,
                                checkpoint_dir=ckpt)
    q.awaitTermination(120)
    snap1 = SnapshotCatalog(d).load()
    assert snap1.field_stats["doc_count"] == 150
    # batch 2 arrives; availableNow stream restarted from checkpoint
    full.filter("doc_id >= 150").coalesce(1).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(schema).parquet(src)
    q2 = start_incremental_build(spark, stream2, d, segments_per_batch=4,
                                 checkpoint_dir=ckpt)
    q2.awaitTermination(120)
    snap2 = SnapshotCatalog(d).load()
    assert snap2.field_stats["doc_count"] == len(corpus)
    # the incrementally-built index is rank-identical to the batch oracle
    _assert_parity(Searcher(spark, d), oracle)


def test_add_indexes(spark, corpus, oracle):
    """addIndexes(Directory): import a foreign index's segments without
    re-indexing; the union index is rank/score-identical to an oracle
    over the combined corpus, and CheckIndex passes."""
    from lucene_spark.operators.checkindex import check_index
    from lucene_spark.operators.merge import add_indexes

    half_a = corpus[corpus.doc_id < 150]
    half_b = corpus[corpus.doc_id >= 150]
    da = tempfile.mkdtemp(prefix="lucene_spark_addA_")
    db = tempfile.mkdtemp(prefix="lucene_spark_addB_")
    build_index(spark, spark.createDataFrame(half_a), da, num_segments=3)
    build_index(spark, spark.createDataFrame(half_b), db, num_segments=2)
    snap = add_indexes(spark, da, db)
    assert len(snap.seg_ids) == 5
    assert snap.field_stats["doc_count"] == len(corpus)
    totals = check_index(da)
    assert totals["num_docs"] == len(corpus)
    _assert_parity(Searcher(spark, da), oracle)


def test_add_indexes_preserves_deletes(spark, corpus, oracle):
    """addIndexes must carry the source's live-docs (the reference copies
    segments as-is INCLUDING .liv): docs deleted in the source stay
    deleted after import, with seg ids remapped."""
    from lucene_spark.operators.delete import delete_by_term
    from lucene_spark.operators.merge import add_indexes

    half_a = corpus[corpus.doc_id < 150]
    half_b = corpus[corpus.doc_id >= 150]
    da = tempfile.mkdtemp(prefix="lucene_spark_addDA_")
    db = tempfile.mkdtemp(prefix="lucene_spark_addDB_")
    build_index(spark, spark.createDataFrame(half_a), da, num_segments=2)
    build_index(spark, spark.createDataFrame(half_b), db, num_segments=2)
    deleted_b = {r.doc_id for r in
                 Searcher(spark, db).search("codec", k=300).collect()}
    live_a = {r.doc_id for r in
              Searcher(spark, da).search("codec OR util", k=300).collect()}
    assert deleted_b and live_a
    delete_by_term(spark, db, "codec")      # tombstones in the SOURCE
    add_indexes(spark, da, db)
    hits = {r.doc_id for r in
            Searcher(spark, da).search("codec OR util", k=300).collect()}
    assert not (hits & deleted_b)
    assert live_a <= hits


def test_multi_searcher(spark, corpus, oracle):
    """MultiReader role: two independent indexes searched as one with
    aggregated global stats — rank/score-identical to an oracle over the
    combined corpus, without copying any files."""
    from lucene_spark.operators.search import MultiSearcher

    half_a = corpus[corpus.doc_id < 150]
    half_b = corpus[corpus.doc_id >= 150]
    da = tempfile.mkdtemp(prefix="lucene_spark_mrA_")
    db = tempfile.mkdtemp(prefix="lucene_spark_mrB_")
    build_index(spark, spark.createDataFrame(half_a), da, num_segments=3)
    build_index(spark, spark.createDataFrame(half_b), db, num_segments=2)
    ms = MultiSearcher(spark, [da, db])
    assert ms.doc_count == len(corpus)
    _assert_parity(ms, oracle)
    # count + dictionary probes work through the aggregated stats
    assert ms.count("parse") == len(oracle.score(parse("parse")))

    # deletes in one sub-index mask through the composite (stale stats:
    # surviving scores unchanged)
    from lucene_spark.operators.delete import delete_by_term
    half_a_ids = set(int(x) for x in half_a.doc_id)
    del_term = next(t for t in ("flush", "scan", "codec", "emit", "parse")
                    if set(oracle.score(parse(t))) & half_a_ids)
    delete_by_term(spark, da, del_term)
    gone = set(oracle.score(parse(del_term))) & half_a_ids
    assert gone
    ms2 = MultiSearcher(spark, [da, db])
    got = [(r.doc_id, np.float32(r.score)) for r in
           ms2.search("parse OR emit OR token", k=10).collect()]
    want = [(d, np.float32(s)) for d, s in
            oracle.top_k(parse("parse OR emit OR token"), k=10 + len(gone))
            if d not in gone][:10]
    assert got == want
    assert ms2.count(del_term) == len(set(oracle.score(parse(del_term)))
                                      - gone)


def test_sorting_merge_preserves_index_sort(spark, tmp_path):
    """Sorting merge (MergeState/IndexSorter): merging sorted segments
    keeps the merged segment physically key-ordered, so index_sort
    survives and sorted_top_k stays early-terminating; BM25 scores are
    unchanged (local order is score-invariant); CheckIndex's
    strictly-ascending-per-term invariant holds on the re-sorted
    postings; tombstoned docs are purged from the merged order."""
    from lucene_spark.operators.checkindex import check_index
    from lucene_spark.operators.delete import delete_by_term
    from lucene_spark.plans import query as Q

    corpus2 = generate_corpus(90, seed=5)
    corpus2 = corpus2.assign(n_chars=corpus2.content.str.len())
    d = str(tmp_path / "srt")
    build_index(spark, spark.createDataFrame(corpus2), d, num_segments=4,
                sort_field="n_chars", sort_ascending=False)
    full_oracle = OracleIndex.build(
        list(zip(corpus2.doc_id, corpus2.content)))
    gone = set(full_oracle.score(parse("flush")))
    assert gone   # the delete must actually hit something
    delete_by_term(spark, d, "flush")
    snap = SnapshotCatalog(d).load()
    merge_segments(spark, d, sorted(snap.seg_ids)[:3])
    s2 = Searcher(spark, d)
    assert "index_sort" in (s2.snapshot.extra or {})
    check_index(d)
    live = corpus2[~corpus2.doc_id.isin(gone)]
    want = [(int(r.doc_id), int(r.n_chars)) for r in
            live.sort_values(["n_chars", "doc_id"],
                             ascending=[False, True])
            .head(7).itertuples()]
    got = [(r["doc_id"], r["n_chars"])
           for r in s2.sorted_top_k(7).collect()]
    assert got == want
    # second-generation merge (merged + fresh segment): stays sorted,
    # purges the remaining tombstones so stats equal the live corpus
    merge_segments(spark, d, sorted(SnapshotCatalog(d).load().seg_ids))
    s3 = Searcher(spark, d)
    assert "index_sort" in (s3.snapshot.extra or {})
    check_index(d)
    assert [(r["doc_id"], r["n_chars"])
            for r in s3.sorted_top_k(7).collect()] == want
    live_oracle = OracleIndex.build(
        list(zip(live.doc_id, live.content)))
    q = Q.Or((Q.Term("parse"), Q.Term("emit")))
    got_s = [(r["doc_id"], np.float32(r["score"]))
             for r in s3.search(q, k=10).collect()]
    want_s = [(doc, np.float32(sc))
              for doc, sc in live_oracle.top_k(q, k=10)]
    assert got_s == want_s


def test_concurrent_merge_scheduler(spark, corpus, oracle):
    """ConcurrentMergeScheduler: a round's disjoint merges run as
    parallel Spark jobs; serialized commit-time snapshot re-reads make
    the final segment layout identical to the sequential schedule, and
    results/stats stay oracle-exact."""
    import tempfile

    from lucene_spark.operators.checkindex import check_index

    d = tempfile.mkdtemp(prefix="cms_idx_")
    snap = build_index(spark, spark.createDataFrame(corpus), d,
                       num_segments=24)
    assert len(snap.seg_ids) == 24
    snap2 = maintain(spark, d, segs_per_tier=10, max_merge_at_once=10,
                     max_concurrent=3)
    assert len(snap2.seg_ids) <= 10
    # both concurrent merges committed (neither generation lost)
    origins = [s for s in snap2.segments if s.get("origin") == "merge"]
    assert len(origins) == 2
    check_index(d)
    _assert_parity(Searcher(spark, d), oracle)


def test_split_index(spark, corpus):
    """IndexSplitter (misc/index/IndexSplitter.java): carve segments out
    into a standalone index — file-level copy, stats recomputed over the
    kept segments, tombstones sliced; the split index is rank/score
    identical to an oracle built over exactly the kept docs (minus
    deletions), and CheckIndex passes. Source untouched."""
    from lucene_spark.operators.checkindex import check_index
    from lucene_spark.operators.delete import delete_by_term
    from lucene_spark.operators.merge import split_index

    d = tempfile.mkdtemp(prefix="lucene_spark_split_src_")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=4)
    # tombstone some docs so the slice path is exercised
    delete_by_term(spark, d, "flush")
    sub_all = OracleIndex.build(list(zip(corpus.doc_id, corpus.content)))
    victims = [int(x) for x in sub_all.score(parse("flush")).keys()]
    out = tempfile.mkdtemp(prefix="lucene_spark_split_out_")
    import shutil as _sh
    _sh.rmtree(out)
    keep = [0, 2]
    snap = split_index(spark, d, out, keep)
    assert sorted(snap.seg_ids) == keep
    # build_index shards docs by doc_id % num_segments; tombstoned docs
    # stay in collection stats until merge (stale-stats .liv semantics),
    # so the oracle indexes ALL kept docs and victims are filtered from
    # the collected results only
    kept_docs = corpus[(corpus.doc_id % 4).isin(keep)]
    sub_oracle = OracleIndex.build(
        list(zip(kept_docs.doc_id, kept_docs.content)))
    vict = set(victims)
    s = Searcher(spark, out)
    for qtext in MQUERIES:
        got = [(r.doc_id, np.float32(r.score)) for r in
               s.search(qtext, k=10).collect()]
        scores = [(dd, np.float32(sc))
                  for dd, sc in sub_oracle.score(parse(qtext)).items()
                  if dd not in vict]
        scores.sort(key=lambda p: (-float(p[1]), p[0]))
        assert got == scores[:10], qtext
    totals = check_index(out)
    assert totals["num_docs"] == len(kept_docs)
    # source snapshot unchanged
    src_snap = SnapshotCatalog(d).load()
    assert len(src_snap.seg_ids) == 4
    import pytest as _pytest
    with _pytest.raises(ValueError):
        split_index(spark, d, out, [0])      # dest already an index
    with _pytest.raises(ValueError):
        split_index(spark, d, tempfile.mkdtemp(), [99])


def test_streaming_exact_dedup(spark, corpus):
    """Streaming dedup: duplicates across micro-batches are dropped
    exactly once; survivors = one row per distinct text; result matches
    the batch pipeline's fingerprint set."""
    from lucene_spark.streaming.dedup import streaming_exact_dedup

    # plant duplicates: corpus + first 50 docs re-ingested with new ids
    base = corpus[["doc_id", "content"]].rename(
        columns={"content": "text"})
    dup = base.head(50).copy()
    dup["doc_id"] = dup["doc_id"] + 100000
    src = tempfile.mkdtemp(prefix="sdedup_src_")
    out = tempfile.mkdtemp(prefix="sdedup_out_")
    ckpt = tempfile.mkdtemp(prefix="sdedup_ckpt_")
    sdf = spark.createDataFrame(base)
    ddf = spark.createDataFrame(dup)
    sdf.coalesce(2).write.mode("append").parquet(src)
    ddf.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(sdf.schema) \
        .option("maxFilesPerTrigger", "1").parquet(src)
    q = streaming_exact_dedup(stream, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    n_distinct = base.text.nunique()
    assert got.count() == n_distinct
    assert got.select("fingerprint").distinct().count() == n_distinct
    # every distinct text survived exactly once
    import hashlib
    want = {hashlib.md5(t.encode()).hexdigest() for t in base.text}
    assert {r["fingerprint"] for r in got.collect()} == want


def test_multi_pass_split(spark, corpus):
    """MultiPassIndexSplitter: round-robin doc split via complement
    tombstones — every part keeps all segments, masks foreign docs, and
    searches rank/score-identically to a stale-stats oracle over the
    full corpus restricted to its share; parts partition the doc set."""
    from lucene_spark.operators.checkindex import check_index
    from lucene_spark.operators.merge import multi_pass_split

    src = tempfile.mkdtemp(prefix="lucene_spark_mps_src_")
    build_index(spark, spark.createDataFrame(corpus), src, num_segments=4)
    outs = []
    for i in range(3):
        o = tempfile.mkdtemp(prefix=f"lucene_spark_mps_{i}_")
        import shutil as _sh
        _sh.rmtree(o)
        outs.append(o)
    snaps = multi_pass_split(spark, src, outs)
    assert len(snaps) == 3
    full_oracle = OracleIndex.build(list(zip(corpus.doc_id, corpus.content)))
    seen: set = set()
    for i, o in enumerate(outs):
        s = Searcher(spark, o)
        share = {int(d) for d in corpus.doc_id if d % 3 == i}
        got_docs = {r.doc_id for r in
                    s.search("parse OR emit OR token", k=10000).collect()}
        assert got_docs <= share
        # stale-stats semantics: scores equal the full oracle's, results
        # filtered to the share
        for qtext in MQUERIES[:3]:
            got = [(r.doc_id, np.float32(r.score)) for r in
                   s.search(qtext, k=10).collect()]
            scores = [(d, np.float32(sc)) for d, sc in
                      full_oracle.score(parse(qtext)).items() if d in share]
            scores.sort(key=lambda p: (-float(p[1]), p[0]))
            assert got == scores[:10], (i, qtext)
        assert not (seen & share)
        seen |= share
        check_index(o)
    assert seen == {int(d) for d in corpus.doc_id}


def test_pk_split(spark, corpus):
    """PKIndexSplitter: query-based two-way split via complement
    tombstones — matching docs in the first index, the rest in the
    second; both search with stale full-corpus stats (like
    MultiPassIndexSplitter) and CheckIndex stays green."""
    from lucene_spark.operators.checkindex import check_index
    from lucene_spark.operators.merge import pk_split
    from lucene_spark.plans import query as Q

    src = tempfile.mkdtemp(prefix="lucene_spark_pks_src_")
    build_index(spark, spark.createDataFrame(corpus), src, num_segments=4)
    out1 = tempfile.mkdtemp(prefix="lucene_spark_pks_1_")
    out2 = tempfile.mkdtemp(prefix="lucene_spark_pks_2_")
    import shutil as _sh
    _sh.rmtree(out1)
    _sh.rmtree(out2)
    term = "parse"
    snap1, snap2 = pk_split(spark, src, out1, out2, Q.Term(term))
    from lucene_spark.functions.analysis import analyze_text
    match = {int(d) for d, t in zip(corpus.doc_id, corpus.content)
             if term in set(analyze_text(str(t))[0])}
    rest = {int(d) for d in corpus.doc_id} - match
    full_oracle = OracleIndex.build(list(zip(corpus.doc_id, corpus.content)))
    for out, share in ((out1, match), (out2, rest)):
        s = Searcher(spark, out)
        got_docs = {r.doc_id for r in
                    s.search("parse OR emit OR token", k=10000).collect()}
        assert got_docs <= share
        for qtext in MQUERIES[:3]:
            got = [(r.doc_id, np.float32(r.score)) for r in
                   s.search(qtext, k=10).collect()]
            scores = [(d, np.float32(sc)) for d, sc in
                      full_oracle.score(parse(qtext)).items() if d in share]
            scores.sort(key=lambda p: (-float(p[1]), p[0]))
            assert got == scores[:10], qtext
        check_index(out)


def test_rearrange_index(spark, corpus):
    """IndexRearranger: one output segment per selector, each holding
    exactly the selected docs; the rearranged index is CheckIndex-green
    and scores rank/score-identically to a fresh build over the same
    corpus (stats re-baked by the per-part merges)."""
    from lucene_spark.operators.checkindex import check_index
    from lucene_spark.operators.merge import rearrange_index

    src_d = tempfile.mkdtemp(prefix="lucene_spark_rra_src_")
    build_index(spark, spark.createDataFrame(corpus), src_d, num_segments=4)
    dest = tempfile.mkdtemp(prefix="lucene_spark_rra_dst_")
    import shutil as _sh
    _sh.rmtree(dest)
    n = len(corpus)
    cuts = [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]
    sels = [spark.createDataFrame([(int(d),) for d in range(lo, hi)],
                                  "doc_id long") for lo, hi in cuts]
    snap = rearrange_index(spark, src_d, dest, sels)
    assert len(snap.seg_ids) == 3
    check_index(dest)
    s = Searcher(spark, dest)
    # segment composition: each segment holds exactly its selector's docs
    seg_docs: dict = {}
    for r in s.doc_meta.select("seg_id", "doc_id").collect():
        seg_docs.setdefault(r["seg_id"], set()).add(r["doc_id"])
    shares = [set(range(lo, hi)) for lo, hi in cuts]
    assert set(map(frozenset, seg_docs.values())) \
        == set(map(frozenset, shares))
    # fresh-stats score parity vs the oracle over the same corpus
    oracle = OracleIndex.build(list(zip(corpus.doc_id, corpus.content)))
    for qtext in MQUERIES[:3]:
        got = [(r.doc_id, np.float32(r.score)) for r in
               s.search(qtext, k=10).collect()]
        assert got == oracle.top_k(parse(qtext), 10), qtext
