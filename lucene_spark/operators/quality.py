"""Search-quality evaluation (the reference ``benchmark/quality``
package: ``QualityStats.java:79-130``): precision@k, MRR, recall and
average precision of ranked result lists against judgment sets —
computed for EVERY query in one DataFrame job (the reference's
QualityBenchmark loops queries on one thread).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def quality_stats(results_df: DataFrame, judgments_df: DataFrame,
                  p_at: tuple = (1, 5, 10)) -> DataFrame:
    """Per-query quality stats.

    ``results_df``: (query_id, doc_id, rank) ranked hits (rank 1-based,
    dense per query). ``judgments_df``: (query_id, doc_id) relevant
    pairs (the Judge role). Returns one row per query:

      * ``p_at_k`` = |relevant in top k| / k (``getPrecisionAt`` —
        including the n > numPoints extrapolation
        ``numPoints·p_last / n``, ``QualityStats.java:108-117``)
      * ``mrr`` = 1/rank of the first relevant hit IF it lands in the
        top 5, else 0 (``:86-88`` — the reference only sets MRR within
        the 5 top scores)
      * ``recall`` = |relevant retrieved| / |relevant existing| (``:98``)
      * ``avp`` = Σ over relevant hits of precision-at-their-rank,
        / |relevant existing| (``getAvp``, ``:120-122``)

    Pure Catalyst: one left join flags relevance, one window computes
    the running relevant count, per-query aggregations do the rest —
    evaluating 10^6 queries is one shuffle on query_id."""
    rel = (judgments_df.select("query_id", "doc_id")
           .withColumn("_rel", F.lit(1)))
    flagged = (results_df.select("query_id", "doc_id", "rank")
               .join(rel, ["query_id", "doc_id"], "left")
               .withColumn("_rel", F.coalesce(F.col("_rel"), F.lit(0))))
    w = (Window.partitionBy("query_id").orderBy("rank")
         .rowsBetween(Window.unboundedPreceding, 0))
    flagged = flagged.withColumn("_good", F.sum("_rel").over(w))
    totals = (judgments_df.groupBy("query_id")
              .agg(F.count("*").alias("_max_good")))
    aggs = [
        F.max("rank").alias("_n"),
        F.sum("_rel").alias("_found"),
        # Σ p@r over relevant ranks (AVP numerator)
        F.sum(F.when(F.col("_rel") == 1,
                     F.col("_good").cast("double") / F.col("rank"))
              ).alias("_psum"),
        # first relevant rank within top 5 → MRR
        F.min(F.when((F.col("_rel") == 1) & (F.col("rank") <= 5),
                     F.col("rank"))).alias("_first5"),
    ]
    per_q = flagged.groupBy("query_id").agg(*aggs)
    # p@k columns (with the n>numPoints extrapolation)
    for k in p_at:
        gk = flagged.where(F.col("rank") <= k).groupBy("query_id") \
            .agg(F.max("_good").alias(f"_g{k}"), F.max("rank")
                 .alias(f"_n{k}"))
        per_q = per_q.join(gk, "query_id", "left")
    out = per_q.join(totals, "query_id", "left")
    cols = [F.col("query_id")]
    for k in p_at:
        # if k <= n: good(k)/k; else numPoints·p_last/k = good(n)/k
        cols.append(
            F.when(F.col(f"_n{k}") >= k,
                   F.col(f"_g{k}").cast("double") / k)
            .otherwise(F.coalesce(F.col(f"_g{k}"), F.lit(0))
                       .cast("double") / k).alias(f"p_at_{k}"))
    cols.append((F.lit(1.0) / F.col("_first5")).alias("_mrr_raw"))
    cols.append((F.col("_found").cast("double")
                 / F.col("_max_good")).alias("recall"))
    cols.append((F.coalesce(F.col("_psum"), F.lit(0.0))
                 / F.col("_max_good")).alias("avp"))
    res = out.select(*cols)
    return res.withColumn("mrr", F.coalesce(F.col("_mrr_raw"),
                                            F.lit(0.0))).drop("_mrr_raw")
