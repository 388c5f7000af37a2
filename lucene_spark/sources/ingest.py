"""Ingest helpers: normalize raw corpora into the engine's input shape.

The engine's contract (SURVEY §1.3) is a DataFrame with a UNIQUE int64
``doc_id`` (the global docID and tie-break order — Lucene's docBase +
local id role) plus the content column. Real corpora (an Iceberg table
of ``(repo, path, commit, lang, content)``, jsonl dumps, csv exports)
don't carry one, and the obvious candidates are wrong at scale:
``monotonically_increasing_id`` depends on partitioning (not stable
across runs), and hashing the natural key into 63 bits collides with
near-certainty at 10^12 rows (birthday bound).

:func:`assign_doc_ids` assigns DENSE, DETERMINISTIC ids from the sort
order of a natural key, without a global single-partition pass:

  1. range-partition by the key and sort within partitions (the only
     wide shuffle — the same one an index build would do anyway);
  2. per-partition row counts → driver (one small row per partition);
  3. each partition adds its exclusive prefix-sum offset locally.

Same input + same key ⇒ same ids, any cluster size or partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: The north-star source-code table shape (BASELINE.json input_hint).
CORPUS_COLUMNS = ("repo", "path", "commit", "lang", "content")


def assign_doc_ids(df: DataFrame, key_cols: list[str] | None = None,
                   id_col: str = "doc_id") -> DataFrame:
    """Add a dense deterministic int64 ``id_col`` ordered by ``key_cols``
    (default: every existing column — full-row order). The key must be
    unique per row for ids to be reproducible row-for-row."""
    import pandas as pd

    keys = list(key_cols) if key_cols else list(df.columns)
    ranged = (df.repartitionByRange(*[F.col(k) for k in keys])
                .sortWithinPartitions(*keys))

    def _tag(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_pid"] = pid
            yield pdf

    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields) + ", _pid int"
    # persist pins the sampled range boundaries across the two passes
    tagged = ranged.mapInPandas(_tag, schema).persist()
    counts = {int(r["_pid"]): int(r["n"]) for r in
              tagged.groupBy("_pid").agg(F.count("*").alias("n"))
                    .collect()}
    offsets = {}
    run = 0
    for pid in sorted(counts):
        offsets[pid] = run
        run += counts[pid]

    def _assign(batches):
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(keys, kind="mergesort")
            base = offsets[int(pdf["_pid"].iloc[0])] + seen
            pdf[id_col] = pd.RangeIndex(base, base + len(pdf)).astype("int64")
            seen += len(pdf)
            yield pdf.drop(columns=["_pid"])

    out_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                           for f in df.schema.fields) + f", `{id_col}` long"
    # localCheckpoint materializes the assigned table (disk-spillable) and
    # truncates lineage so the persisted ``tagged`` scan can be released
    # here instead of leaking executor storage for the plan's lifetime.
    # At 10^12-row scale, write the returned table straight to a staging
    # parquet/Iceberg table (the CLI build does) — ids are final here.
    out = tagged.mapInPandas(_assign, out_schema).localCheckpoint(eager=True)
    tagged.unpersist()
    return out


def read_corpus(spark, path: str, fmt: str = "parquet",
                content_col: str = "content",
                key_cols: list[str] | None = None,
                id_col: str = "doc_id") -> DataFrame:
    """Read a raw corpus (``parquet`` / ``json`` jsonl / ``csv`` with
    header) and attach deterministic doc ids. ``key_cols`` defaults to
    the (repo, path, commit) natural key when those columns exist,
    else every column."""
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "json":
        df = spark.read.json(path)
    elif fmt == "csv":
        df = spark.read.option("header", "true").csv(path)
    else:
        raise ValueError(f"unknown format {fmt!r}")
    if content_col not in df.columns:
        raise ValueError(f"missing content column {content_col!r}")
    if id_col in df.columns:
        # an existing id column must satisfy the engine's int64 contract —
        # CSV reads everything as string, so cast explicitly (a non-numeric
        # id surfaces as nulls here rather than as a downstream type error)
        from pyspark.sql.types import LongType
        if not isinstance(df.schema[id_col].dataType, LongType):
            df = df.withColumn(id_col, F.col(id_col).cast("long"))
        return df
    if key_cols is None:
        natural = [c for c in ("repo", "path", "commit") if c in df.columns]
        key_cols = natural or list(df.columns)
    return assign_doc_ids(df, key_cols, id_col)
