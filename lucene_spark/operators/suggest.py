"""Suggest / spell-correction over the term dictionary.

Reference: the ``lucene/suggest`` module — prefix completion
(``suggest/.../analyzing/AnalyzingSuggester.java``, weight-ordered
completions of an analyzed prefix) and direct spell checking
(``suggest/.../spell/DirectSpellChecker.java``, candidate terms within a
Levenshtein edit budget drawn straight from the index's term dictionary,
no separate spell index).

Spark-first shape: the committed ``term_stats`` table IS the term
dictionary (term, df, ttf). Both operators are a filtered scan of that
table + `ORDER BY ... LIMIT k` — Catalyst pushes the prefix predicate
into the parquet scan (the FST-prefix-walk role), and at 100 TB the
dictionary is tiny relative to the corpus (|vocabulary| ≪ |postings|),
so these run as single narrow jobs with no shuffle beyond the top-k.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suggest_prefix(searcher, prefix: str, k: int = 10) -> DataFrame:
    """Prefix completion ranked by popularity (df as the suggest weight —
    the AnalyzingSuggester's weight-ordered completion, with document
    frequency standing in for the user-supplied weight field).

    Returns (term, weight) — df-descending, term-ascending tie-break.
    """
    return (searcher.term_stats
            .filter(F.col("term").startswith(prefix))
            .select("term", F.col("df").cast("long").alias("weight"))
            .orderBy(F.desc("weight"), F.asc("term"))
            .limit(k))


def spell_suggest(searcher, word: str, k: int = 5, max_edits: int = 2,
                  prefix_len: int = 1, min_df: int = 1) -> DataFrame:
    """Spelling corrections for ``word`` from the term dictionary
    (DirectSpellChecker semantics: candidates share the first
    ``prefix_len`` chars and lie within ``max_edits`` Levenshtein edits;
    the word itself is excluded; ranked by edit distance, then df, then
    term).

    The length band ``|len(term) - len(word)| <= max_edits`` and the
    shared-prefix predicate are cheap pushdown filters that bound the
    Levenshtein evaluation to a sliver of the dictionary (the automaton
    intersection's role in the reference).

    Returns (term, distance, df).
    """
    ts = searcher.term_stats
    cand = (ts.filter(F.col("term") != word)
              .filter(F.col("df") >= min_df)
              .filter(F.abs(F.length("term") - F.lit(len(word)))
                      <= max_edits))
    if prefix_len > 0:
        cand = cand.filter(
            F.col("term").startswith(word[:prefix_len]))
    return (cand.withColumn("distance",
                            F.levenshtein(F.col("term"), F.lit(word)))
                .filter(F.col("distance") <= max_edits)
                .select("term", F.col("distance").cast("int"),
                        F.col("df").cast("long").alias("df"))
                .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
                .limit(k))


def spell_suggest_scored(searcher, word: str, k: int = 5,
                         distance: str = "levenshtein",
                         max_edits: int = 2, prefix_len: int = 1,
                         min_df: int = 1,
                         min_score: float = 0.0) -> DataFrame:
    """SpellChecker.suggestSimilar with a pluggable StringDistance
    (reference ``suggest/.../spell/SpellChecker.java:63-76`` — default
    metric LevenshteinDistance — ranked by SuggestWordQueue order:
    score desc, then df desc, then term asc,
    ``spell/SuggestWordScoreComparator.java:34-45``).

    The same pushed length-band + shared-prefix filters bound the
    candidate slice as in :func:`spell_suggest`; the chosen
    ``StringDistance`` similarity (``functions/strdist.py`` — classic /
    lucene_levenshtein OSA / jaro_winkler / ngram) runs only on that
    bounded slice. ``levenshtein`` stays fully JVM-side via the builtin;
    the other metrics score the slice with an Arrow-batched pandas UDF.

    Returns (term, score float32, df).
    """
    from ..functions.strdist import STRING_DISTANCES
    if distance not in STRING_DISTANCES:
        raise ValueError(f"unknown distance {distance!r}; "
                         f"one of {sorted(STRING_DISTANCES)}")
    ts = searcher.term_stats
    cand = (ts.filter(F.col("term") != word)
              .filter(F.col("df") >= min_df)
              .filter(F.abs(F.length("term") - F.lit(len(word)))
                      <= max_edits))
    if prefix_len > 0:
        cand = cand.filter(F.col("term").startswith(word[:prefix_len]))
    if distance == "levenshtein":
        # classic similarity = 1 − edits/max(len): double math, one
        # float32 cast (the ints are double-exact, so this equals the
        # reference's float expression) — the builtin keeps the whole
        # slice JVM-side
        score = (F.lit(1.0)
                 - F.levenshtein(F.col("term"), F.lit(word)).cast("double")
                 / F.greatest(F.length("term"),
                              F.lit(len(word))).cast("double"))
        cand = cand.withColumn("score", score.cast("float"))
    else:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("float")
        def _sim(terms: pd.Series) -> pd.Series:
            from lucene_spark.functions.strdist import batch_similarity
            return pd.Series(batch_similarity(distance, word,
                                              terms.to_numpy()))
        cand = cand.withColumn("score", _sim(F.col("term")))
    return (cand.filter(F.col("score") >= min_score)
                .select("term", "score",
                        F.col("df").cast("long").alias("df"))
                .orderBy(F.desc("score"), F.desc("df"), F.asc("term"))
                .limit(k))


def fuzzy_suggest(searcher, typed: str, k: int = 10, max_edits: int = 1,
                  non_fuzzy_prefix: int = 1,
                  min_fuzzy_length: int = 3) -> DataFrame:
    """FuzzySuggester role (reference ``suggest/.../analyzing/
    FuzzySuggester.java:50-85`` defaults: maxEdits=1, nonFuzzyPrefix=1,
    minFuzzyLength=3): completions whose key has SOME prefix within
    ``max_edits`` Levenshtein edits of the typed text. The reference
    intersects a Levenshtein automaton of the typed bytes with the
    completion FST; here the equivalent predicate is
    ``min over L in [len(typed)-e, len(typed)+e] of
    lev(term[:L], typed) <= e`` (a fuzzy prefix match must align the
    typed text against a term prefix of length within e of its own),
    with the first ``non_fuzzy_prefix`` chars required to match exactly
    and typed text shorter than ``min_fuzzy_length`` falling back to
    exact prefix completion. Ranked by weight (df) desc, term asc.

    Scale shape: the shared-prefix + length-band predicates push into
    the term_stats scan; Levenshtein runs JVM-side (Catalyst
    ``levenshtein``), then one TakeOrderedAndProject."""
    if len(typed) < min_fuzzy_length or max_edits == 0:
        return suggest_prefix(searcher, typed, k)
    ts = searcher.term_stats
    if non_fuzzy_prefix > 0:
        ts = ts.filter(F.col("term").startswith(typed[:non_fuzzy_prefix]))
    n = len(typed)
    dists = [F.levenshtein(F.substring(F.col("term"), 1, L),
                           F.lit(typed))
             for L in range(max(1, n - max_edits), n + max_edits + 1)]
    best = F.least(*dists) if len(dists) > 1 else dists[0]
    return (ts.filter(F.length("term") >= n - max_edits)
            .filter(best <= max_edits)
            .select("term", F.col("df").cast("long").alias("weight"))
            .orderBy(F.desc("weight"), F.asc("term"))
            .limit(k))


def free_text_suggest(shingle_searcher, context: str, k: int = 10,
                      alpha: float = 0.4) -> DataFrame:
    """FreeTextSuggester role (reference ``suggest/.../analyzing/
    FreeTextSuggester.java:91-124``): predict the next word after
    ``context`` from a bigram-shingled index with stupid-backoff
    smoothing (ALPHA = 0.4, ``:124``): a next-word seen after the
    context scores ``count(context word) / count(context)``; unseen
    words back off to ``ALPHA · count(word) / totalTokens``. The
    shingle dictionary's ttf IS the corpus bigram count, so the whole
    model is two pushed-filter scans of term_stats — the reference
    builds a dedicated ngram FST; here the index's own shingles serve.

    Returns (term, score double) — the suggested next words, score
    desc, term asc."""
    ts = shingle_searcher.term_stats
    ctx_count = (ts.filter(F.col("term") == context)
                 .agg(F.sum("ttf")).collect()[0][0]) or 0
    # unigram-model denominator: total UNIGRAM tokens (the reference
    # keeps per-order totals; sum_ttf would also count shingles)
    total = (ts.filter(~F.col("term").contains(" "))
             .agg(F.sum("ttf")).collect()[0][0]) or 1
    big = (ts.filter(F.col("term").startswith(context + " "))
           .select(F.expr(f"substring(term, {len(context) + 2})")
                   .alias("term"),
                   (F.col("ttf").cast("double")
                    / F.lit(float(max(ctx_count, 1)))).alias("score")))
    # backoff: unigrams not already predicted (no space in term)
    uni = (ts.filter(~F.col("term").contains(" "))
           .join(big.select("term"), "term", "left_anti")
           .select("term",
                   (F.lit(float(alpha)) * F.col("ttf").cast("double")
                    / F.lit(float(total))).alias("score")))
    return (big.unionByName(uni)
            .orderBy(F.desc("score"), F.asc("term"))
            .limit(k))


def word_break_suggest(searcher, word: str, k: int = 10,
                       min_break_length: int = 1,
                       min_suggestion_freq: int = 1) -> DataFrame:
    """WordBreakSpellChecker.suggestWordBreaks (reference
    ``suggest/.../spell/WordBreakSpellChecker.java:71,238-300``),
    maxChanges=1 subset (the default — one break): every split point i
    in [minBreakWordLength, len-minBreakWordLength] whose left AND right
    parts are dictionary terms with df >= minSuggestionFrequency.
    Ranked by summed df desc, then left part asc (a deterministic stand-
    in for the reference's frequency-sort methods; multi-break recursion
    out of scope, documented).

    The split candidates are O(len(word)) strings enumerated driver-side
    (like the reference's loop); dictionary lookup is ONE pushed
    ``term IN (...)`` scan of term_stats."""
    n = len(word)
    lo = max(1, min_break_length)
    cands = [(word[:i], word[i:]) for i in range(lo, n - lo + 1)]
    if not cands:
        return searcher.spark.createDataFrame(
            [], "left string, right string, df_left long, df_right long")
    probe = sorted({t for pair in cands for t in pair})
    dfs = {r["term"]: int(r["df"]) for r in
           searcher.term_stats.filter(F.col("term").isin(probe))
           .select("term", "df").collect()}
    rows = [(lft, rgt, dfs.get(lft, 0), dfs.get(rgt, 0))
            for lft, rgt in cands
            if dfs.get(lft, 0) >= min_suggestion_freq
            and dfs.get(rgt, 0) >= min_suggestion_freq]
    rows.sort(key=lambda r: (-(r[2] + r[3]), r[0]))
    return searcher.spark.createDataFrame(
        rows[:k], "left string, right string, df_left long, df_right long")


def word_combine_suggest(searcher, terms: list[str], k: int = 10,
                         max_changes: int = 1,
                         max_combine_length: int = 20,
                         min_suggestion_freq: int = 1) -> DataFrame:
    """WordBreakSpellChecker.suggestWordCombinations (reference
    ``WordBreakSpellChecker.java:145-215``): adjacent input terms i..j
    (j-i <= maxChanges, combined length <= maxCombineWordLength) whose
    concatenation is a dictionary term with df >= minSuggestionFrequency.
    Returns (start int, end int, combined string, df long), df desc then
    start asc."""
    cands = []
    for i in range(len(terms)):
        comb = terms[i]
        for j in range(i + 1, min(len(terms), i + 1 + max_changes)):
            comb = comb + terms[j]
            if len(comb) > max_combine_length:
                break
            cands.append((i, j, comb))
    if not cands:
        return searcher.spark.createDataFrame(
            [], "start int, end int, combined string, df long")
    probe = sorted({c for _, _, c in cands})
    dfs = {r["term"]: int(r["df"]) for r in
           searcher.term_stats.filter(F.col("term").isin(probe))
           .select("term", "df").collect()}
    rows = [(i, j, c, dfs.get(c, 0)) for i, j, c in cands
            if dfs.get(c, 0) >= min_suggestion_freq]
    rows.sort(key=lambda r: (-r[3], r[0]))
    return searcher.spark.createDataFrame(
        rows[:k], "start int, end int, combined string, df long")


def infix_suggest(searcher, fragment: str, k: int = 10) -> DataFrame:
    """AnalyzingInfixSuggester role (reference ``suggest/.../analyzing/
    AnalyzingInfixSuggester.java``: completions match when any indexed
    token PREFIX-matches the typed fragment, anywhere in the suggestion
    — not just at its start), restricted to the single-token dictionary
    (documented subset): terms containing ``fragment`` anywhere, with a
    prefix match ranking first like the reference's exact-first sort,
    then weight (df) desc, term asc.

    One pushed ``contains`` scan of term_stats + TakeOrderedAndProject."""
    ts = searcher.term_stats
    return (ts.filter(F.col("term").contains(fragment))
            .select("term", F.col("df").cast("long").alias("weight"),
                    F.col("term").startswith(fragment).alias("_pfx"))
            .orderBy(F.desc("_pfx"), F.desc("weight"), F.asc("term"))
            .limit(k)
            .drop("_pfx"))


BLENDERS = ("linear", "reciprocal", "exponential_reciprocal")


def blended_infix_suggest(suggestions_df: DataFrame, key: str, k: int = 10,
                          blender: str = "linear",
                          exponent: float = 2.0,
                          text_col: str = "text",
                          weight_col: str = "weight") -> DataFrame:
    """BlendedInfixSuggester.lookup (reference ``suggest/.../analyzing/
    BlendedInfixSuggester.java:60-268``): suggestions matching every
    query token (last token as a PREFIX unless ``key`` ends with a
    space), re-weighted by the position of the FIRST matching token:

      linear                    weight · (1 − 0.10·pos)
      reciprocal                weight / (1 + pos)
      exponential_reciprocal    weight / (1 + pos)^exponent

    with the reference's exact quirks: coefficient pinned to 1 when the
    suggestion text startsWith the key, weight 0 → 1, |weight| < 10
    scaled ×10 before the long truncation, score = (long)(weight·coef).

    The reference blends only the top num·numFactor FST hits (an
    approximation knob); here the scan blends EVERY match — a strict
    superset whose top-k equals the reference's whenever numFactor
    covers the candidate set. One explode + min-aggregation per doc, no
    per-suggestion state.

    Returns (text, score long, weight) ordered score desc, text asc.
    """
    if blender not in BLENDERS:
        raise ValueError(f"unknown blender {blender!r}; one of {BLENDERS}")
    toks = key.lower().split()
    if not toks:
        raise ValueError("empty key")
    trailing = key.endswith(" ")
    exact = toks if trailing else toks[:-1]
    prefix = None if trailing else toks[-1]

    tok = (suggestions_df
           .select(text_col, weight_col,
                   F.posexplode(F.split(F.lower(F.col(text_col)), " "))
                   .alias("pos", "tk")))
    is_match = F.lit(False)
    for t in exact:
        is_match = is_match | (F.col("tk") == t)
    if prefix is not None:
        is_match = is_match | F.col("tk").startswith(prefix)
    first = (tok.where(is_match)
             .groupBy(text_col, weight_col)
             .agg(F.min("pos").alias("first_pos"),
                  F.collect_set(F.col("tk")).alias("_mtk")))
    # allTermsRequired (the lookup default): every exact token present,
    # and the prefix token prefix-present
    for t in exact:
        first = first.where(F.array_contains(F.col("_mtk"), t))
    if prefix is not None:
        first = first.where(F.exists(
            F.col("_mtk"), lambda x: x.startswith(prefix)))
    p = F.col("first_pos").cast("double")
    if blender == "linear":
        coef = F.lit(1.0) - F.lit(0.10) * p
    elif blender == "reciprocal":
        coef = F.lit(1.0) / (F.lit(1.0) + p)
    else:
        coef = F.lit(1.0) / F.pow(F.lit(1.0) + p, F.lit(float(exponent)))
    coef = F.when(F.lower(F.col(text_col)).startswith(key.lower()),
                  F.lit(1.0)).otherwise(coef)
    w = F.col(weight_col).cast("double")
    w = F.when(w == 0, F.lit(1.0)).otherwise(w)
    w = F.when((w < 10.0) & (w > -10.0), w * 10.0).otherwise(w)
    return (first
            .withColumn("score", (w * coef).cast("long"))
            .select(F.col(text_col).alias("text"), "score",
                    F.col(weight_col).cast("long").alias("weight"))
            .orderBy(F.desc("score"), F.asc("text"))
            .limit(k))
