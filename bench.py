"""Benchmark driver: index-build throughput + BM25 search latency +
pipeline operators, printed as ONE JSON line.

Env knobs: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default 32), ``BENCH_CORPUS_DOCS`` (default 100000),
``BENCH_SCALING`` (default 1 → also build at cpus/4 and report N→4N
scaling efficiency, the BASELINE.md north-rule evidence).
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
N_DOCS = int(os.environ.get("BENCH_CORPUS_DOCS", "100000"))
DO_SCALING = os.environ.get("BENCH_SCALING", "1") == "1"


def _session(cpus: int):
    from lucene_spark.session import get_session
    return get_session(master=f"local[{cpus}]", app_name=f"bench_{cpus}",
                       shuffle_partitions=max(cpus, 8))


def _build_corpus_index(spark, pdf, index_dir: str, num_segments: int) -> float:
    """Returns wall seconds for build+commit (fresh index dir)."""
    from lucene_spark.operators.build import build_index
    shutil.rmtree(index_dir, ignore_errors=True)
    df = spark.createDataFrame(pdf)
    t0 = time.time()
    build_index(spark, df, index_dir, num_segments=num_segments,
                content_col="content", doc_id_col="doc_id",
                store_positions=True)
    return time.time() - t0


def main() -> None:
    from lucene_spark.operators.search import Searcher
    from lucene_spark.pipeline import dedup, simsearch
    from lucene_spark.plans import query as Q
    from lucene_spark.sources.corpus import generate_corpus
    from pyspark.sql import functions as F

    queries: dict[str, float] = {}
    tmp = tempfile.mkdtemp(prefix="lucene_spark_bench_")
    corpus_pdf = generate_corpus(N_DOCS)

    spark = _session(CPUS)
    num_segments = max(CPUS * 2, 16)

    # --- index build throughput at full parallelism --------------------
    idx_dir = os.path.join(tmp, "idx")
    t_build = _build_corpus_index(spark, corpus_pdf, idx_dir, num_segments)
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
    }
    for name, (q, mode) in search_cases.items():
        t0 = time.time()
        s.search(q, k=10, mode=mode).collect()
        queries[name] = round(time.time() - t0, 3)

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

    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0.1)

    # --- scaling evidence: same build at cpus/4 ------------------------
    efficiency = None
    if DO_SCALING and CPUS >= 8:
        spark.stop()
        small = max(CPUS // 4, 2)
        spark_small = _session(small)
        t_small = _build_corpus_index(spark_small, corpus_pdf,
                                      os.path.join(tmp, "idx_small"),
                                      num_segments)
        spark_small.stop()
        tp_small = N_DOCS / t_small
        efficiency = round((docs_per_sec / tp_small) / (CPUS / small), 3)
        queries["build_index_smallN"] = round(t_small, 3)
        queries["scaling_efficiency"] = efficiency
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
    if efficiency is not None:
        out["scaling_efficiency_NtoQuarterN"] = efficiency
    print(json.dumps(out))


if __name__ == "__main__":
    main()
