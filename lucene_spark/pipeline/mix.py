"""Deterministic domain mixing for training-data pipelines.

Given target mixture weights over a domain column (the "data recipe" —
e.g. 60% web / 30% code / 10% papers BY TOKENS), downsample each domain
so realized token shares match the recipe at the largest total the
corpus supports: T* = min_d tokens_d / w_d, keep-rate_d =
w_d · T* / tokens_d (the binding domain keeps everything).

Selection is a uniform content hash (md5 of the doc id) under the
per-domain rate cut — deterministic, order-free, cluster-size-free,
the same pattern as the sampled facets / IVF training subsets. Two
passes: one map-side token-total aggregation (D tiny rows to the
driver), one hash-filtered scan. Realized shares converge to the recipe
as corpora grow (hash sampling is by DOC, so finite corpora wobble by
the doc-length variance — documented)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mixture_rates(df: DataFrame, weights: dict,
                  domain_col: str = "source",
                  text_col: str = "text") -> dict:
    """Per-domain keep rates realizing ``weights`` at the largest
    feasible total. Domains absent from ``weights`` get rate 0."""
    if not weights or abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError("weights must sum to 1")
    tok = (df.groupBy(domain_col)
           .agg(F.sum(F.size(F.split(F.col(text_col), " ")))
                .alias("toks")).collect())
    totals = {r[domain_col]: int(r["toks"]) for r in tok}
    missing = [d for d in weights if d not in totals]
    if missing:
        raise ValueError(f"domains absent from corpus: {missing}")
    t_star = min(totals[d] / w for d, w in weights.items() if w > 0)
    return {d: (weights[d] * t_star / totals[d] if d in weights else 0.0)
            for d in totals}


def sample_to_mixture(df: DataFrame, weights: dict,
                      domain_col: str = "source",
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """The kept subset of ``df`` under :func:`mixture_rates` — docs
    whose md5(id) 8-hex prefix falls below their domain's rate cut."""
    rates = mixture_rates(df, weights, domain_col, text_col)
    # rate >= 1 keeps everything: 'g' sorts above every hex digit (a
    # "100000000" 9-char cut would lexicographically EXCLUDE prefixes
    # >= '1' — the classic hex-compare trap)
    cuts = [(d, "g" if r >= 1.0 else format(int(r * 16**8), "08x"))
            for d, r in sorted(rates.items())]
    cut_col = F.lit("00000000")
    for d, cut in cuts:
        cut_col = F.when(F.col(domain_col) == d, F.lit(cut)) \
            .otherwise(cut_col)
    return df.where(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8) < cut_col)
