"""Text analysis for training-data pipelines: token counts, quality
scores, language ID, fingerprints.

All operators are single-pass column expressions over the document table —
pure ``pyspark.sql.functions`` (whole-stage codegen, no shuffle, no Python).
At 100 TB these run at scan speed with full column pruning; the only columns
read are the ones referenced.

The tokenizer here is the whitespace tokenizer (training corpora arrive
pre-normalized); for raw source code use the full analyzer chain in
:mod:`lucene_spark.functions.analysis`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language keyword lists for the n-gram/stopword language-ID
#: heuristic. Deliberately small and deterministic — the heuristic is the
#: operator; swap lists for a real deployment.
LANG_KEYWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "en": ("the", "a", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los", "es"),
    "fr": ("le", "la", "et", "les", "des", "est"),
}

#: English stopword subset used by the quality score (ratio feature).
QUALITY_STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
)


def tokens(text_col) -> Column:
    """Whitespace tokens, lowercased."""
    return F.split(F.lower(F.col(text_col) if isinstance(text_col, str)
                           else text_col), " ")


def _count_in(tokens_col: Column, words: tuple[str, ...]) -> Column:
    """Number of tokens (with multiplicity) that appear in ``words``."""
    lits = ", ".join("'" + w.replace("'", "''") + "'" for w in words)
    wordset = F.expr(f"array({lits})")
    return F.size(F.filter(tokens_col, lambda t: F.array_contains(wordset, t)))


#: BPE-style pre-tokenization regex (the GPT-2-family shape, simplified
#: to the JVM/duckdb-portable subset): letter runs, digit runs, and runs
#: of non-alphanumeric non-space symbols each form one subtoken.
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+"


def with_token_counts(df, text_col: str = "text"):
    """Adds ``n_tokens`` / ``n_distinct`` (whitespace tokens) and
    ``n_subtokens`` (BPE-ish regex pre-tokenization count — the unit a
    subword tokenizer would split further; still a pure JVM expression,
    no Python)."""
    toks = tokens(text_col)
    sub = F.regexp_extract_all(
        F.col(text_col) if isinstance(text_col, str) else text_col,
        F.lit(BPE_TOKEN_RE), 0)
    return (df.withColumn("n_tokens", F.size(toks))
              .withColumn("n_distinct", F.size(F.array_distinct(toks)))
              .withColumn("n_subtokens", F.size(sub)))


def with_quality_score(df, text_col: str = "text"):
    """Heuristic document quality in [0, 1]:

      0.3 * min(1, n_tokens/100)            (enough content)
    + 0.4 * n_distinct/n_tokens             (lexical diversity)
    + 0.3 * (1 - stopword_ratio)            (information density)

    Computed in float64 with a fixed expression shape so results are
    deterministic (raw double; fixed-point-project downstream if you need
    an engine-independent representation).
    """
    toks = tokens(text_col)
    n = F.size(toks).cast("double")
    nd = F.size(F.array_distinct(toks)).cast("double")
    nstop = _count_in(toks, QUALITY_STOPWORDS).cast("double")
    score = (F.lit(0.3) * F.least(F.lit(1.0), n / F.lit(100.0))
             + F.lit(0.4) * (nd / n)
             + F.lit(0.3) * (F.lit(1.0) - nstop / n))
    return df.withColumn("quality", score)


def with_lang_id(df, text_col: str = "text", out_col: str = "lang_pred"):
    """Stopword-overlap language ID: count keyword hits per language, pick
    the argmax (ties and zero hits → ``'und'``, then alphabetical order).
    One scan, no shuffle."""
    toks = tokens(text_col)
    hit_cols = {lang: _count_in(toks, words)
                for lang, words in sorted(LANG_KEYWORDS.items())}
    best = F.greatest(*hit_cols.values())
    pred = F.lit("und")
    # alphabetical priority: first language reaching the max wins
    for lang in sorted(LANG_KEYWORDS, reverse=True):
        pred = F.when((best > 0) & (hit_cols[lang] == best), F.lit(lang)) \
                .otherwise(pred)
    return df.withColumn(out_col, pred)


def with_fingerprints(df, text_col: str = "text"):
    """Two deterministic document fingerprints:

    * ``fp_exact``  — md5 of the raw text (exact-dup key);
    * ``fp_bag``    — md5 of the sorted distinct token bag (order/count
      insensitive near-dup key, a cheap SimHash stand-in);
    * ``fp_roll``   — rolling-hash fingerprint: the lexicographic MIN of
      the md5s of every 8-char window (winnowing-lite / Karp-Rabin role:
      stable under edits outside the minimizing window). One expression,
      O(len) hashes per doc — fingerprinting cost, not scan cost; at
      corpus scale it still runs map-side with no shuffle.
    """
    toks = tokens(text_col)
    bag = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    roll = F.expr(
        f"array_min(transform(sequence(1, greatest(length({text_col}) - 7,"
        f" 1)), i -> md5(substring({text_col}, i, 8))))")
    return (df.withColumn("fp_exact", F.md5(F.col(text_col)))
              .withColumn("fp_bag", F.md5(bag))
              .withColumn("fp_roll", roll))


def fingerprint_token(terms, max_output_token_size: int = 1024,
                      separator: str = " ") -> str | None:
    """FingerprintFilter for one token stream (reference
    ``miscellaneous/FingerprintFilter.java:83-170``): de-duplicate,
    sort by UTF-16 code-unit order (the reference's char[] comparator —
    ``str.encode('utf-16-be')`` as the key reproduces it exactly), join
    with ``separator``; None when the stream is empty or the joined
    length exceeds ``maxOutputTokenSize`` (strict >, so == max still
    emits). Length here is codepoints vs Java's UTF-16 units —
    divergent only for astral-plane text (documented)."""
    seen = dict.fromkeys(terms)
    if not seen:
        return None
    out = separator.join(sorted(seen, key=lambda s: s.encode("utf-16-be")))
    if len(out) > max_output_token_size:
        return None
    return out


def with_fingerprint_token(df, text_col: str = "text",
                           out_col: str = "fingerprint",
                           max_output_token_size: int = 1024,
                           separator: str = " "):
    """Distributed FingerprintFilter over whitespace tokens — the
    clustering/linking fingerprint as ONE Catalyst expression chain
    (split → filter-empties → array_distinct → array_sort →
    array_join), no UDF, rides any scan. Spark's string sort is UTF-8
    binary = codepoint order; identical to the reference's UTF-16
    comparator for all non-astral text (documented above)."""
    toks = F.filter(F.split(F.col(text_col), " "),
                    lambda x: x != F.lit(""))
    arr = F.array_sort(F.array_distinct(toks))
    fp = F.array_join(arr, separator)
    return df.withColumn(
        out_col,
        F.when(F.size(arr) == 0, F.lit(None).cast("string"))
        .when(F.length(fp) > int(max_output_token_size),
              F.lit(None).cast("string"))
        .otherwise(fp))
