"""Benchmark driver: index-build throughput + BM25 search latency +
pipeline operators, printed as ONE JSON line.

Env knobs: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default 32), ``BENCH_CORPUS_DOCS`` (default 400000),
``BENCH_SCALING`` (default 1 → rebuild at cpus/4 and cpus/16 and report
N→4N scaling efficiencies — the BASELINE.md north-rule evidence),
``BENCH_TMPDIR`` (default /dev/shm when present — the sandbox disk writes
at ~210 MB/s and serializes every parallelism level at ~34k docs/s;
shuffle + index on tmpfs measures the ENGINE, not the disk; a real cluster
has per-executor local SSDs, which 4N executors scale by 4x).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("BENCH_CORPUS_DOCS", "400000"))
DO_SCALING = os.environ.get("BENCH_SCALING", "1") == "1"
TMPDIR = os.environ.get("BENCH_TMPDIR",
                        "/dev/shm" if os.path.isdir("/dev/shm") else None)


def _session(cpus: int):
    from lucene_spark.session import get_session
    conf = {"spark.driver.memory": "24g",
            "spark.sql.adaptive.coalescePartitions.enabled": "false"}
    if TMPDIR:
        conf["spark.local.dir"] = os.path.join(TMPDIR, "spark_local")
    return get_session(master=f"local[{cpus}]", app_name=f"bench_{cpus}",
                       shuffle_partitions=max(cpus, 8), **conf)


def _write_corpus_parquet(pdf, path: str, num_files: int = 32) -> None:
    """Corpus to parquet OUTSIDE the timed region — the build job reads a
    parallel parquet scan (the realistic input shape: the north star reads
    an Iceberg table), not a driver-serialized pandas frame."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    n = len(pdf)
    step = (n + num_files - 1) // num_files
    for i in range(0, n, step):
        pq.write_table(tbl.slice(i, step),
                       os.path.join(path, f"part-{i // step:04d}.parquet"))


def _build_corpus_index(spark, corpus_path: str, index_dir: str,
                        num_segments: int, warmup_df=None,
                        repeats: int = 2) -> float:
    """Returns BEST wall seconds over ``repeats`` fresh builds. A small
    warmup build first absorbs one-time JVM codegen + Python worker pool
    startup; best-of-N filters the sandbox's co-tenant noise spikes (the
    box shows ~3 cores of invisible background load that comes and goes)."""
    from lucene_spark.operators.build import build_index
    if warmup_df is not None:
        # enough warmup groups to fork the full Python worker pool
        wdir = index_dir + "_warmup"
        shutil.rmtree(wdir, ignore_errors=True)
        build_index(spark, warmup_df, wdir,
                    num_segments=int(spark.sparkContext.defaultParallelism) * 2,
                    content_col="content", doc_id_col="doc_id")
        shutil.rmtree(wdir, ignore_errors=True)
    df = spark.read.parquet(corpus_path)
    best = float("inf")
    for _ in range(repeats):
        shutil.rmtree(index_dir, ignore_errors=True)
        t0 = time.time()
        build_index(spark, df, index_dir, num_segments=num_segments,
                    content_col="content", doc_id_col="doc_id",
                    store_positions=True)
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    from lucene_spark.operators.search import Searcher
    from lucene_spark.pipeline import dedup, simsearch
    from lucene_spark.plans import query as Q
    from lucene_spark.sources.corpus import generate_corpus
    from pyspark.sql import functions as F

    queries: dict[str, float] = {}
    tmp = tempfile.mkdtemp(prefix="lucene_spark_bench_", dir=TMPDIR)
    corpus_path = os.path.join(tmp, "corpus")
    _write_corpus_parquet(generate_corpus(N_DOCS), corpus_path, num_files=64)
    warmup_pdf = generate_corpus(4000, seed=7)

    # --- single-core kernel throughput (host-cap-resistant) ------------
    # The sandbox VM enforces a varying AGGREGATE cpu cap: multi-core
    # phases can read 10x slow while a lone core runs full speed. This
    # metric times the pure build kernel (tokenize → invert → encode) on
    # one core, giving a stable cross-round signal of engine speed.
    from lucene_spark.operators.build import invert_segment
    kpdf = generate_corpus(20000, seed=11)
    invert_segment(kpdf.head(2000), 0, "content", "doc_id",
                   frozenset(), True)  # warm
    kbest = float("inf")
    for _ in range(2):
        t0 = time.time()
        invert_segment(kpdf, 0, "content", "doc_id", frozenset(), True)
        kbest = min(kbest, time.time() - t0)
    queries["kernel_docs_per_sec_1core"] = round(len(kpdf) / kbest, 1)
    # host-throttle signal: the same single-core kernel measured 9,623
    # docs/s under full burst budget (BENCH.md §4). The ratio lets any
    # reader normalize a throttled run's absolute numbers — the VM's
    # aggregate CPU cap varies 3-20x across a day (BENCH.md caveat).
    queries["host_throttle_factor"] = round(
        9623.0 / max(len(kpdf) / kbest, 1.0), 2)

    spark = _session(CPUS)
    warmup_df = spark.createDataFrame(warmup_pdf)
    # 4 segments per core: wave balance beats per-group overhead here, and
    # the same segment count at every parallelism level keeps the scaling
    # comparison apples-to-apples (identical output index shape).
    num_segments = max(CPUS * 4, 16)

    # --- index build throughput at full parallelism --------------------
    idx_dir = os.path.join(tmp, "idx")
    t_build = _build_corpus_index(spark, corpus_path, idx_dir, num_segments,
                                  warmup_df=warmup_df)
    queries["build_index"] = round(t_build, 3)
    docs_per_sec = N_DOCS / t_build

    # --- search latencies over the built index -------------------------
    s = Searcher(spark, idx_dir)
    search_cases = {
        "q_term": (Q.Term("parse"), "auto"),
        "q_term_common": (Q.Term("if"), "auto"),
        "q_and": (Q.And((Q.Term("index"), Q.Term("merge"))), "auto"),
        "q_or": (Q.Or((Q.Term("token"), Q.Term("flush"))), "auto"),
        "q_or_exhaustive": (Q.Or((Q.Term("token"), Q.Term("flush"))),
                            "exhaustive"),
        "q_phrase": (Q.Phrase(("return", "if")), "auto"),
        # two COMMON terms with slop — the r2-flagged per-doc-loop shape,
        # now one vectorized minimal-window pass per segment
        "q_sloppy_common": (Q.Phrase(("if", "return"), slop=3), "auto"),
        "q_interval_ordered": (Q.Interval(
            ("maxgaps", ("ordered", (("term", "if"), ("term", "return"))),
             4)), "auto"),
        # duplicate-clause repeats: the injective-multiset per-doc path
        # on a COMMON doubled term — its worst realistic shape
        "q_repeat_sloppy": (Q.Phrase(("if", "if"), slop=3), "auto"),
    }
    for name, (q, mode) in search_cases.items():
        best = float("inf")
        for _ in range(3):  # best-of-3 vs co-tenant noise (r01's q_and
            t0 = time.time()   # outlier was a throttle spike in best-of-2)
            s.search(q, k=10, mode=mode).collect()
            best = min(best, time.time() - t0)
        queries[name] = round(best, 3)

    # --- batch search: the reference-style 60-query workload in ONE job
    from lucene_spark.sources.queryset import generate_query_set
    term_dfs = {r["term"]: int(r["df"])
                for r in s.term_stats.orderBy("term").limit(4000).collect()}
    workload = generate_query_set(term_dfs)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        s.search_many(workload, k=10).count()
        best = min(best, time.time() - t0)
    queries["q_batch60"] = round(best, 3)
    queries["q_batch60_qps"] = round(len(workload) / best, 1)

    # --- pipeline operators over driver testdata -----------------------
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    t0 = time.time()
    dedup.minhash_near_duplicates(docs, threshold=0.8).count()
    queries["p_minhash_lsh"] = round(time.time() - t0, 3)

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    t0 = time.time()
    simsearch.brute_force_topk(emb, emb.where(F.col("vec_id") < 20),
                               k=5).count()
    queries["p_cosine_topk"] = round(time.time() - t0, 3)

    # monitor (reverse search): map-side-only matcher over the doc table
    from lucene_spark.streaming.monitor import Monitor
    docs_tbl = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    mon = Monitor({"q1": "data", "q2": "data AND query", "q3": '"dup dup"'})
    t0 = time.time()
    n_docs_mon = docs_tbl.count()
    mon.match_batch(docs_tbl).count()
    dt = time.time() - t0
    queries["p_monitor"] = round(dt, 3)
    queries["p_monitor_docs_per_sec"] = round(n_docs_mon / max(dt, 1e-9), 1)

    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0.1)

    # --- scaling evidence: same build at cpus/4 and cpus/16 ------------
    # Two N→4N pairs: (cpus/4 → cpus) and (cpus/16 → cpus/4). The small
    # pair is the faithful stand-in for N vs 4N *executors*: on one box the
    # big pair shares a single memory-bandwidth/disk budget, which a real
    # 4N-executor cluster multiplies by 4 (see BENCH.md for the analysis).
    efficiency = {}
    throughputs = {CPUS: docs_per_sec}
    if DO_SCALING and CPUS >= 8:
        spark.stop()
        levels = [CPUS // 4] + ([CPUS // 16] if CPUS >= 32 else [])
        for lvl in levels:
            s = _session(lvl)
            t_lvl = _build_corpus_index(
                s, corpus_path, os.path.join(tmp, f"idx_{lvl}"),
                num_segments, warmup_df=s.createDataFrame(warmup_pdf))
            s.stop()
            throughputs[lvl] = N_DOCS / t_lvl
            queries[f"build_index_c{lvl}"] = round(t_lvl, 3)
        for small, big in zip(sorted(throughputs), sorted(throughputs)[1:]):
            eff = round(throughputs[big] / (throughputs[small]
                                            * (big / small)), 3)
            efficiency[f"{small}to{big}"] = eff
            queries[f"scaling_efficiency_{small}to{big}"] = eff
    else:
        spark.stop()

    shutil.rmtree(tmp, ignore_errors=True)
    out = {
        "metric": "index_build_docs_per_sec",
        "value": round(docs_per_sec, 1),
        "unit": "docs/sec",
        "queries": queries,
        "sf": sf,
        "corpus_docs": N_DOCS,
        "cpus": CPUS,
    }
    if efficiency:
        out["scaling_efficiency"] = efficiency
    print(json.dumps(out))


if __name__ == "__main__":
    main()
