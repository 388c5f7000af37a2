"""Training-shard assignment and writing.

The last step of a training-data pipeline: pack documents into shards
of ~``tokens_per_shard`` tokens in a STABLE global order (doc_id), so
reruns produce identical shards and downstream loaders can seek.

Scale shape — the naive formulation is a running token sum over the
globally-ordered corpus, which as a Spark window (`Window.orderBy` with
no partition) collapses to ONE task. This implementation uses the
classic two-pass distributed cumsum instead:

  1. range-repartition by doc_id (already sorted within partitions),
  2. per-partition token totals → driver (one tiny row per partition),
  3. exclusive prefix offsets broadcast back,
  4. within-partition running sum + offset = exact global running sum.

Driver state is O(partitions), not O(docs); every heavy step is
map-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_shards(df: DataFrame, tokens_per_shard: int,
                  id_col: str = "doc_id",
                  text_col: str = "text",
                  num_partitions: int | None = None) -> DataFrame:
    """Add ``n_tokens``, ``token_offset`` (exact global running sum of
    tokens BEFORE this doc in doc_id order) and ``shard_id``
    (= token_offset // tokens_per_shard) columns. Deterministic: same
    input → same shards, any cluster size."""
    if tokens_per_shard <= 0:
        raise ValueError("tokens_per_shard must be positive")
    work = df.withColumn(
        "n_tokens", F.size(F.split(F.col(text_col), " ")))
    parts = (work.repartitionByRange(
                 *( [num_partitions] if num_partitions else [] ),
                 F.col(id_col))
             .sortWithinPartitions(id_col))

    # pass 1: per-partition totals, keyed by partition id
    def totals(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        tot = 0
        lo = None
        for pdf in batches:
            if len(pdf):
                tot += int(pdf["n_tokens"].sum())
                first = int(pdf[id_col].iloc[0])
                lo = first if lo is None else min(lo, first)
        yield pd.DataFrame({"pid": [pid], "tot": [tot],
                            "lo": [-1 if lo is None else lo]})

    stats = (parts.mapInPandas(totals, "pid int, tot long, lo long")
             .collect())
    # exclusive prefix offsets in doc_id-range order (range partitioner
    # orders partitions by key range; empty partitions sort last)
    ordered = sorted(stats, key=lambda r: (r["lo"] < 0, r["lo"]))
    offsets = {}
    run = 0
    for r in ordered:
        offsets[int(r["pid"])] = run
        run += int(r["tot"])

    bshard = int(tokens_per_shard)

    def assign(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        for pdf in batches:
            if not len(pdf):
                continue
            csum = pdf["n_tokens"].cumsum().to_numpy()
            off = base + csum - pdf["n_tokens"].to_numpy()
            pdf = pdf.copy()
            pdf["token_offset"] = off.astype(np.int64)
            pdf["shard_id"] = (off // bshard).astype(np.int64)
            base += int(csum[-1])
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in parts.schema.fields)
    schema += ", token_offset long, shard_id long"
    return parts.mapInPandas(assign, schema)


def write_shards(df: DataFrame, out_dir: str, tokens_per_shard: int,
                 id_col: str = "doc_id", text_col: str = "text",
                 num_partitions: int | None = None):
    """Assign shards and write ``out_dir/shard_id=N/`` parquet,
    partitioned by shard — the layout a data loader streams."""
    assigned = assign_shards(df, tokens_per_shard, id_col, text_col,
                             num_partitions)
    (assigned.write.mode("overwrite")
     .partitionBy("shard_id").parquet(out_dir))
    return assigned
