"""Benchmark decontamination for training-data pipelines.

The standard LLM-training hygiene pass: flag (and drop) corpus
documents that share verbatim n-grams with an evaluation/benchmark set,
so test data never leaks into training shards. (Not a Lucene reference
operator — part of this repo's training-pipeline surface, like the
dedup family it builds on.)

Scale shape: the benchmark set's n-grams are DISTINCT and typically
tiny relative to the corpus (thousands of eval docs vs billions of
training docs), so the contaminated-doc scan is one inner join keyed by
the shingle string — Spark broadcasts the benchmark side when small and
falls back to a shuffle join at larger eval sets; either way the corpus
is touched once, map-side exploded, never self-joined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import doc_shingles


def contamination_flags(docs_df: DataFrame, bench_df: DataFrame,
                        text_col: str = "text", n: int = 8,
                        min_hits: int = 1,
                        id_col: str = "doc_id") -> DataFrame:
    """Corpus docs sharing at least ``min_hits`` distinct ``n``-gram
    shingles with ANY benchmark doc. Returns ``(doc_id, hits long)`` —
    the flagged docs with their distinct-overlapping-shingle count.

    Both sides shingle with the same tokenizer as the dedup family
    (lowercased whitespace n-grams; short docs contribute their whole
    token string)."""
    corpus = doc_shingles(docs_df.select(F.col(id_col).alias("id"),
                                         F.col(text_col).alias("text")),
                          "text", id_col="id", n=n)
    bench = (doc_shingles(bench_df.select(F.col(id_col).alias("id"),
                                          F.col(text_col).alias("text")),
                          "text", id_col="id", n=n)
             .select("shingle").distinct())
    return (corpus.join(bench, "shingle")
            .groupBy(F.col("id").alias(id_col))
            .agg(F.countDistinct("shingle").alias("hits"))
            .where(F.col("hits") >= min_hits))


def decontaminate(docs_df: DataFrame, bench_df: DataFrame,
                  text_col: str = "text", n: int = 8,
                  min_hits: int = 1,
                  id_col: str = "doc_id") -> DataFrame:
    """``docs_df`` minus the contaminated docs (left-anti join on the
    flags) — the pass a training shard writer runs before sharding."""
    flagged = contamination_flags(docs_df, bench_df, text_col, n,
                                  min_hits, id_col).select(id_col)
    return docs_df.join(flagged, id_col, "left_anti")
