"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
typed metadata struct; Spark never interprets the bytes. Metadata
extraction (length, digest) is pure JVM expression; decode / feature
extraction runs as Arrow-batched ``mapInPandas`` so each task processes
whole record batches.

The actual decoders (PIL/libav/etc.) are NOT available in this
environment, so :func:`decode_features` is STUBBED: ``fake=True`` yields a
deterministic fake feature vector derived from the payload bytes (making
the Spark-side plumbing — schema, batching, partition behavior — fully
testable); ``fake=False`` raises ``NotImplementedError`` at the point the
real decoder would run.

Scale notes: payload bytes dominate I/O — keep them in their own parquet
column so metadata-only queries prune it (ReadSchema check); decode
parallelism is governed by input splits, no shuffle is introduced.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

FEATURE_SCHEMA = ("doc_id long, media_type string, payload_len int, "
                  "features array<float>")


def attach_payload(df: DataFrame, text_col: str = "text",
                   media_type: str = "application/octet-stream") -> DataFrame:
    """Demonstration payload: the UTF-8 bytes of a text column as the
    opaque binary (real pipelines read image/audio bytes from the lake)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")) \
             .withColumn("media_type", F.lit(media_type))


def extract_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata from the opaque payload — pure JVM expressions."""
    return (df.withColumn("payload_len", F.length(F.col(payload_col)))
              .withColumn("payload_md5", F.md5(F.col(payload_col))))


def decode_features(df: DataFrame, fake: bool = False,
                    id_col: str = "doc_id",
                    payload_col: str = "payload",
                    batch_hint: int = 1024) -> DataFrame:
    """Decode + feature-extract each payload via ``mapInPandas``.

    Real decoders are unavailable here: with ``fake=False`` this raises
    ``NotImplementedError`` inside the UDF (the marked stub point); with
    ``fake=True`` it emits a deterministic FEATURE_DIM-float vector from
    the payload bytes, exercising the identical Arrow batch path.
    """
    use_fake = bool(fake)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake:
                raise NotImplementedError(
                    "media decoder not available in this environment; "
                    "plug a real decoder here (PIL/torchaudio/pyav)")
            feats = []
            for buf in pdf[payload_col]:
                raw = np.frombuffer(bytes(buf), dtype=np.uint8)
                pad = (-len(raw)) % FEATURE_DIM
                raw = np.pad(raw, (0, pad))
                feats.append((raw.reshape(-1, FEATURE_DIM)
                              .mean(axis=0) / 255.0).astype(np.float32))
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "media_type": pdf["media_type"],
                "payload_len": pdf[payload_col].map(len).astype("int32"),
                "features": feats,
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)
