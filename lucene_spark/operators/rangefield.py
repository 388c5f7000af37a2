"""Range fields — documents carrying [min, max] interval values, queried
by interval relation (reference ``core/document/RangeFieldQuery.java``
QueryType enum; the LongRange/IntRange/FloatRange/DoubleRange field
family at ``document/LongRange.java`` etc. all share this matcher).

Relations, per dimension (``RangeFieldQuery.java:121-360``):

  INTERSECTS  doc.min <= q.max AND doc.max >= q.min
  WITHIN      doc.min >= q.min AND doc.max <= q.max
  CONTAINS    doc.min <= q.min AND doc.max >= q.max
  CROSSES     INTERSECTS AND NOT WITHIN   (``:351-353``)

A multi-dimensional range matches when EVERY dimension satisfies the
relation (``:387-392``); CROSSES composes the all-dims INTERSECTS with
the negated all-dims WITHIN, like the reference.

Spark-first: each relation is a pure Catalyst conjunction over the
(min, max) columns, so it rides the parquet scan as pushed comparison
filters — no UDF, no kernel. At 100 TB the scan prunes row groups on
the min/max statistics exactly like the reference's BKD internal-node
``compare`` pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RELATIONS = ("intersects", "within", "contains", "crosses")


def _dim_pred(relation: str, lo: Column, hi: Column,
              qlo, qhi) -> Column:
    if relation == "intersects":
        return (lo <= F.lit(qhi)) & (hi >= F.lit(qlo))
    if relation == "within":
        return (lo >= F.lit(qlo)) & (hi <= F.lit(qhi))
    if relation == "contains":
        return (lo <= F.lit(qlo)) & (hi >= F.lit(qhi))
    raise ValueError(f"unknown relation {relation!r}")


def range_field_predicate(relation: str, dims: list[tuple],
                          query: list[tuple]) -> Column:
    """Catalyst predicate for one relation over N dimensions.

    ``dims``  — [(min_col, max_col), …] per dimension (Column or name)
    ``query`` — [(qmin, qmax), …] literal query range per dimension
    """
    if relation not in RELATIONS:
        raise ValueError(f"unknown relation {relation!r}; "
                         f"one of {RELATIONS}")
    if len(dims) != len(query) or not dims:
        raise ValueError("dims and query must align and be non-empty")
    cols = [(F.col(lo) if isinstance(lo, str) else lo,
             F.col(hi) if isinstance(hi, str) else hi)
            for lo, hi in dims]
    for (qlo, qhi) in query:
        if qlo > qhi:
            raise ValueError(f"inverted query range [{qlo}, {qhi}]")

    def all_dims(rel: str) -> Column:
        pred = None
        for (lo, hi), (qlo, qhi) in zip(cols, query):
            p = _dim_pred(rel, lo, hi, qlo, qhi)
            pred = p if pred is None else (pred & p)
        return pred

    if relation == "crosses":
        return all_dims("intersects") & ~all_dims("within")
    return all_dims(relation)


def range_field_query(ranges_df: DataFrame, relation: str,
                      query: list[tuple],
                      dims: list[tuple] | None = None,
                      doc_id_col: str = "doc_id") -> DataFrame:
    """Docs whose range field satisfies ``relation`` vs the query range —
    the LongRange.new{Intersects,Within,Contains,Crosses}Query factories
    (``document/LongRange.java:140-186``). NULL-min/max rows (docs
    without the field) never match, like missing points."""
    dims = dims or [("rmin", "rmax")]
    pred = range_field_predicate(relation, dims, query)
    return ranges_df.where(pred).select(doc_id_col)


def multi_range_query(points_df: DataFrame, ranges: list[tuple],
                      value_col: str,
                      doc_id_col: str = "doc_id") -> DataFrame:
    """MultiRangeQuery (reference ``sandbox/search/MultiRangeQuery
    .java``): docs whose POINT value falls in ANY of the clause ranges
    — the union-of-ranges disjunction that the reference pushes through
    one BKD visit (its rewrite merges overlapping clauses; Catalyst's
    OR-of-ranges predicate likewise prunes row groups once per scan,
    so the clause list rides a single pass over the column)."""
    if not ranges:
        raise ValueError("at least one range clause required")
    v = F.col(value_col)
    pred = None
    for lo, hi in ranges:
        if lo > hi:
            raise ValueError(f"inverted range [{lo}, {hi}]")
        p = (v >= F.lit(lo)) & (v <= F.lit(hi))
        pred = p if pred is None else (pred | p)
    return points_df.where(pred).select(doc_id_col)
