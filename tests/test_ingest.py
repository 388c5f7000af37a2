"""Ingest helpers: deterministic dense doc-id assignment + format readers."""

from __future__ import annotations

import os
import tempfile

from lucene_spark.sources.corpus import generate_corpus
from lucene_spark.sources.ingest import assign_doc_ids, read_corpus


def test_assign_doc_ids_dense_and_deterministic(spark):
    pdf = generate_corpus(300, seed=61).drop(columns=["doc_id"])
    df = spark.createDataFrame(pdf)
    out = assign_doc_ids(df, ["repo", "path", "commit"]).toPandas()
    assert sorted(out["doc_id"]) == list(range(300))
    # ids follow the natural-key sort order
    by_key = out.sort_values(["repo", "path", "commit"])
    assert by_key["doc_id"].tolist() == list(range(300))
    # deterministic across partitionings
    out2 = assign_doc_ids(df.repartition(7), ["repo", "path", "commit"]) \
        .toPandas().sort_values(["repo", "path", "commit"])
    assert by_key["doc_id"].tolist() == out2["doc_id"].tolist()
    assert by_key["content"].tolist() == out2["content"].tolist()


def test_cli_build_assigns_ids(spark):
    """cli build on a corpus WITHOUT doc_id: ids assigned scalably, the
    index builds, and search answers."""
    from lucene_spark import cli

    pdf = generate_corpus(80, seed=63).drop(columns=["doc_id"])
    d = tempfile.mkdtemp(prefix="lucene_spark_clibuild_")
    src = os.path.join(d, "corpus_parquet")
    os.makedirs(src, exist_ok=True)
    pdf.to_parquet(os.path.join(src, "part-0.parquet"))
    idx = os.path.join(d, "idx")
    assert cli.main(["build", "--input", src, "--index", idx,
                     "--segments", "2"]) == 0
    assert cli.main(["search", "--index", idx, "--query", "parse OR emit",
                     "--k", "3"]) == 0


def test_read_corpus_jsonl_and_index(spark):
    """jsonl corpus → deterministic ids → index builds and searches."""
    from lucene_spark.operators.build import build_index
    from lucene_spark.operators.search import Searcher
    from lucene_spark.oracle import OracleIndex
    from lucene_spark.plans.parser import parse

    pdf = generate_corpus(120, seed=62).drop(columns=["doc_id"])
    d = tempfile.mkdtemp(prefix="lucene_spark_ingest_")
    src = os.path.join(d, "corpus.jsonl")
    pdf.to_json(src, orient="records", lines=True)
    df = read_corpus(spark, src, fmt="json")
    assert "doc_id" in df.columns
    rows = df.select("doc_id", "content").toPandas()
    oracle = OracleIndex.build(list(zip(rows.doc_id, rows.content)))
    idx = os.path.join(d, "idx")
    build_index(spark, df, idx, num_segments=3)
    s = Searcher(spark, idx)
    for qtext in ("parse OR emit", "codec AND util"):
        got = [(r.doc_id, float(r.score)) for r in
               s.search(qtext, k=10).collect()]
        want = [(dd, float(sc)) for dd, sc in
                oracle.top_k(parse(qtext), k=10)]
        assert got == want, qtext


def test_read_corpus_csv_existing_id_cast(spark, tmp_path):
    """A CSV-supplied doc_id column arrives as StringType; read_corpus must
    cast it to long to honor the engine's int64 doc_id contract."""
    import csv

    from lucene_spark.sources.ingest import read_corpus

    p = tmp_path / "c.csv"
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["doc_id", "content"])
        for i in range(5):
            w.writerow([str(i * 10), f"some text {i}"])
    df = read_corpus(spark, str(p), fmt="csv")
    assert dict(df.dtypes)["doc_id"] == "bigint"
    assert sorted(r["doc_id"] for r in df.collect()) == [0, 10, 20, 30, 40]


def test_cli_classify_and_split(spark):
    """cli classify (NaiveBayes argmax) and split (both splitter modes)
    run end to end."""
    from lucene_spark import cli
    from lucene_spark.sources.catalog import SnapshotCatalog

    pdf = generate_corpus(60, seed=65)
    pdf["lang"] = [f"c{int(d) % 2}" for d in pdf.doc_id]
    d = tempfile.mkdtemp(prefix="lucene_spark_clicls_")
    src = os.path.join(d, "docs_parquet")
    os.makedirs(src, exist_ok=True)
    pdf.rename(columns={"content": "text"}).to_parquet(
        os.path.join(src, "part-0.parquet"))
    idx = os.path.join(d, "idx")
    assert cli.main(["build", "--input", src, "--index", idx,
                     "--segments", "2", "--content-col", "text"]) == 0
    assert cli.main(["classify", "--index", idx, "--docs", src,
                     "--doc-ids", "0,1,2"]) == 0
    out1 = os.path.join(d, "split_one")
    assert cli.main(["split", "--index", idx, "--out", out1,
                     "--segments", "0"]) == 0
    assert SnapshotCatalog(out1).load().seg_ids == [0]
    out2 = os.path.join(d, "split_multi")
    assert cli.main(["split", "--index", idx, "--out", out2,
                     "--parts", "2"]) == 0
    assert SnapshotCatalog(out2 + "-part0").load() is not None
    assert SnapshotCatalog(out2 + "-part1").load() is not None
