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
