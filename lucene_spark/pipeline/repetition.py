"""Intra-document repetition signals for training-data quality filters.

The Gopher/C4 rule family: documents dominated by repeated n-grams are
boilerplate/spam and get filtered before training. Two standard
signals per document:

  * ``dup_{n}gram_frac`` — fraction of the doc's n-gram OCCURRENCES
    whose n-gram appears more than once in the doc
  * ``top_{n}gram_frac`` — fraction of occurrences claimed by the
    single most frequent n-gram

Pure Catalyst (transform/sequence gram construction + two map-side-
combined aggregations) — no UDF; short docs (< n tokens) contribute
their whole token string as one gram, like the dedup family."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repetition_stats(df: DataFrame, text_col: str = "text", n: int = 3,
                     id_col: str = "doc_id") -> DataFrame:
    """``(id_col, dup_{n}gram_frac double, top_{n}gram_frac double)``."""
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = F.split(F.lower(F.col(text_col)), " ")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    exploded = df.select(F.col(id_col), F.explode(grams).alias("g"))
    per_gram = exploded.groupBy(id_col, "g").agg(F.count("*").alias("c"))
    return (per_gram.groupBy(id_col)
            .agg((F.sum(F.when(F.col("c") > 1, F.col("c"))
                        .otherwise(F.lit(0))).cast("double")
                  / F.sum("c")).alias(f"dup_{n}gram_frac"),
                 (F.max("c").cast("double")
                  / F.sum("c")).alias(f"top_{n}gram_frac")))
