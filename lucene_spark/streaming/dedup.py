"""Streaming deduplication for training-data ingest.

The batch pipeline's exact dedup (``pipeline/dedup.py``) re-expressed
for Structured Streaming: an unbounded document stream is deduplicated
on its content fingerprint before it ever reaches the index build or a
training shard — the shape a 100 TB ingest actually runs (dedup close
to the source, one pass, bounded state).

Two modes:

* unbounded exact (``watermark=None``): ``dropDuplicates`` on the md5
  fingerprint — state grows with the distinct-document count (Spark
  keeps one state row per key; at web scale pair with a TTL'd state
  store or the watermarked mode).
* watermarked (``watermark=("ts_col", "10 minutes")``):
  ``dropDuplicatesWithinWatermark`` — duplicates arriving within the
  watermark window are dropped, state is evicted after it, so state
  size is bounded by the window's distinct inflow. This is the
  documented trade-off of near-duplicate ingest firehoses (same
  document re-crawled hours apart survives; the batch MinHash pass
  downstream catches those).

First-writer-wins: among duplicate fingerprints the first STREAM
arrival survives, like the batch pipeline's min(doc_id) representative
— but by arrival order, which is the streaming-native tie-break.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def streaming_exact_dedup(stream_df, out_dir: str, checkpoint_dir: str,
                          text_col: str = "text",
                          watermark: tuple | None = None,
                          trigger_available_now: bool = True):
    """Deduplicate ``stream_df`` on ``md5(text_col)`` and append
    survivors (all input columns + ``fingerprint``) to ``out_dir`` as
    parquet, exactly-once via the checkpoint. Returns the
    StreamingQuery."""
    dedup = stream_df.withColumn(
        "fingerprint", F.md5(F.col(text_col).cast("string")))
    if watermark is not None:
        ts_col, delay = watermark
        dedup = (dedup.withWatermark(ts_col, delay)
                 .dropDuplicatesWithinWatermark(["fingerprint"]))
    else:
        dedup = dedup.dropDuplicates(["fingerprint"])
    writer = (dedup.writeStream
              .format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
