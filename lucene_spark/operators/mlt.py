"""MoreLikeThis: find documents similar to a given document.

Reference: ``lucene/queries/.../mlt/MoreLikeThis.java`` — re-analyze the
seed document's stored text, keep "interesting" terms (tf >= minTermFreq,
df >= minDocFreq), rank them by tf·idf with the classic TFIDF idf
``ln((docCount + 1) / (df + 1)) + 1`` (``search/similarities/
TFIDFSimilarity.java`` idf), take the top ``maxQueryTerms``, and issue
them as a SHOULD (OR) query scored by the searcher's similarity.

Spark-first shape: the seed doc's text is one row of the source table
(the "stored fields"); its analysis is driver-side (one document). The
dfs for its candidate terms come from the broadcast-scale ``term_stats``
dictionary in one narrow lookup, and the final retrieval is the normal
distributed top-k search — so MLT costs one dictionary probe plus one
search, independent of corpus size.
"""

from __future__ import annotations

import math
from collections import Counter

from ..functions.analysis import analyze_text
from ..plans import query as Q


def interesting_terms(searcher, text: str, max_query_terms: int = 25,
                      min_term_freq: int = 2, min_doc_freq: int = 5,
                      stopwords: frozenset[str] = frozenset()
                      ) -> list[tuple[str, float]]:
    """Top terms of ``text`` by tf·idf against the index's global stats.

    Returns [(term, selection_score)] ordered (score desc, term asc) —
    MoreLikeThis.retrieveTerms / createQueue semantics with the classic
    idf ``ln((N + 1) / (df + 1)) + 1``.
    """
    terms, _, _ = analyze_text(text, stopwords=stopwords)
    tfs = Counter(terms)
    cands = [t for t, f in tfs.items() if f >= min_term_freq]
    if not cands:
        return []
    dfs = searcher._global_dfs(sorted(cands))
    n = searcher.doc_count
    scored = []
    for t in cands:
        df = dfs.get(t, 0)
        if df < min_doc_freq:
            continue
        idf = math.log((n + 1) / (df + 1)) + 1.0
        scored.append((t, float(tfs[t]) * idf))
    scored.sort(key=lambda p: (-p[1], p[0]))
    return scored[:max_query_terms]


def more_like_this(searcher, docs_df, doc_id: int, k: int = 10,
                   max_query_terms: int = 25, min_term_freq: int = 2,
                   min_doc_freq: int = 5, id_col: str = "doc_id",
                   text_col: str = "text", mode: str = "auto"):
    """Top-k documents similar to ``doc_id`` (seed doc included if it
    matches — the reference does not auto-exclude it either).

    Returns the searcher's usual (doc_id, score, rank) DataFrame.
    """
    from pyspark.sql import functions as F
    row = (docs_df.filter(F.col(id_col) == doc_id)
                  .select(text_col).limit(1).collect())
    if not row:
        raise ValueError(f"doc {doc_id} not found")
    sel = interesting_terms(searcher, row[0][0], max_query_terms,
                            min_term_freq, min_doc_freq)
    if not sel:
        return searcher.search(Q.Term("\x00none\x00"), k)
    return searcher.search(Q.Or(tuple(Q.Term(t) for t, _ in sel)), k,
                           mode=mode)
