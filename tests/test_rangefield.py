"""Range fields (document/RangeFieldQuery.java relations) — engine vs a
per-doc brute-force replay of the reference matcher."""

from __future__ import annotations

import pytest

from lucene_spark.operators.rangefield import (RELATIONS,
                                               range_field_query)


def _brute(relation, doc, query):
    def dim(rel, d, q):
        lo, hi = d
        qlo, qhi = q
        if rel == "intersects":
            return lo <= qhi and hi >= qlo
        if rel == "within":
            return lo >= qlo and hi <= qhi
        return lo <= qlo and hi >= qhi        # contains

    def all_dims(rel):
        return all(dim(rel, d, q) for d, q in zip(doc, query))

    if relation == "crosses":
        return all_dims("intersects") and not all_dims("within")
    return all_dims(relation)


@pytest.fixture(scope="module")
def ranges(spark):
    rows = []
    for i in range(200):
        lo = (i * 13) % 97
        rows.append((i, lo, lo + (i % 25), (i * 7) % 50, (i * 7) % 50 + i % 9))
    return (rows, spark.createDataFrame(
        rows, "doc_id long, rmin long, rmax long, smin long, smax long"))


@pytest.mark.parametrize("relation", RELATIONS)
def test_range_field_1d(ranges, relation):
    rows, df = ranges
    q = [(30, 44)]
    got = sorted(r["doc_id"] for r in
                 range_field_query(df, relation, q).collect())
    want = sorted(i for i, lo, hi, _, _ in rows
                  if _brute(relation, [(lo, hi)], q))
    assert got == want
    assert got  # every relation matches something on this fixture


@pytest.mark.parametrize("relation", RELATIONS)
def test_range_field_2d(ranges, relation):
    rows, df = ranges
    q = [(30, 60), (10, 40)]
    got = sorted(r["doc_id"] for r in range_field_query(
        df, relation, q, dims=[("rmin", "rmax"), ("smin", "smax")])
        .collect())
    want = sorted(i for i, lo, hi, s0, s1 in rows
                  if _brute(relation, [(lo, hi), (s0, s1)], q))
    assert got == want


def test_range_field_validation(ranges):
    _, df = ranges
    with pytest.raises(ValueError):
        range_field_query(df, "touches", [(1, 2)])
    with pytest.raises(ValueError):
        range_field_query(df, "within", [(5, 2)])
    with pytest.raises(ValueError):
        range_field_query(df, "within", [])


def test_range_field_pushdown(ranges):
    """The relation predicate must reach the scan as pushed filters —
    the BKD internal-node pruning analogue at scale."""
    _, df = ranges
    plan = range_field_query(df, "within", [(30, 60)]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan


def test_multi_range_query(ranges):
    """sandbox/search/MultiRangeQuery.java: union of point ranges."""
    from lucene_spark.operators.rangefield import multi_range_query
    rows, df = ranges
    clauses = [(10, 20), (18, 25), (90, 95)]
    got = sorted(r["doc_id"] for r in
                 multi_range_query(df, clauses, "rmin").collect())
    want = sorted(i for i, lo, _, _, _ in rows
                  if any(a <= lo <= b for a, b in clauses))
    assert got == want and got
    import pytest as _pt
    with _pt.raises(ValueError):
        multi_range_query(df, [], "rmin")
    with _pt.raises(ValueError):
        multi_range_query(df, [(5, 1)], "rmin")
