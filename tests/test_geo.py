"""LatLonPoint-role geo queries: brute-force differentials for box /
distance / nearest over synthetic coordinates."""

from __future__ import annotations

import math

import numpy as np
import pytest

from lucene_spark.operators import geo


@pytest.fixture(scope="module")
def points(spark):
    rows = [(int(i),
             float((i * 37 % 18000) / 100.0 - 90.0),
             float((i * 73 % 36000) / 100.0 - 180.0))
            for i in range(500)]
    return rows, spark.createDataFrame(rows, "doc_id long, lat double, "
                                             "lon double")


def test_box_query_matches_brute(spark, points):
    rows, df = points
    got = sorted(r["doc_id"] for r in
                 geo.box_query(df, -10, 40, -60, 10).collect())
    want = sorted(d for d, la, lo in rows
                  if -10 <= la <= 40 and -60 <= lo <= 10)
    assert got == want and len(want) > 0


def test_box_query_dateline_wrap(spark, points):
    rows, df = points
    got = sorted(r["doc_id"] for r in
                 geo.box_query(df, -90, 90, 170, -170).collect())
    want = sorted(d for d, la, lo in rows if lo >= 170 or lo <= -170)
    assert got == want


def test_distance_query_two_phase(spark, points):
    rows, df = points
    clat, clon, r = 12.5, -33.25, 25.0
    k = math.cos(math.radians(clat))
    got = sorted(x["doc_id"] for x in
                 geo.distance_query(df, clat, clon, r).collect())
    want = sorted(d for d, la, lo in rows
                  if (la - clat) ** 2 + ((lo - clon) * k) ** 2 <= r * r)
    assert got == want and len(want) > 0


def test_nearest_matches_brute_and_box_hint(spark, points):
    rows, df = points
    clat, clon = 12.5, -33.25
    k = math.cos(math.radians(clat))

    def key(la, lo):
        return (la - clat) ** 2 + ((lo - clon) * k) ** 2

    want = sorted(((key(la, lo), d) for d, la, lo in rows))[:10]
    got = [(r["sort_key"], r["doc_id"])
           for r in geo.nearest(df, clat, clon, k=10).collect()]
    assert [g[1] for g in got] == [w[1] for w in want]
    assert np.allclose([g[0] for g in got], [w[0] for w in want],
                       rtol=0, atol=0)
    # a wide-enough box hint returns the same top-k (the scale path)
    hinted = [r["doc_id"] for r in
              geo.nearest(df, clat, clon, k=10, box_hint=30.0).collect()]
    assert hinted == [w[1] for w in want]


def _pip_brute(rings, la, lo):
    """Independent classic crossing-number test (division form)."""
    inside = False
    for ring in rings:
        n = len(ring)
        for i in range(n):
            y1, x1 = ring[i]
            y2, x2 = ring[(i + 1) % n]
            if (y1 > la) != (y2 > la):
                xint = (x2 - x1) * (la - y1) / (y2 - y1) + x1
                if lo < xint:
                    inside = not inside
    return inside


POLY = [[(-20.137, -70.211), (45.313, -55.107), (38.271, 5.733),
         (-5.431, 12.377), (-30.913, -40.529)]]
POLY_HOLE = POLY + [[(-18.617, -37.413), (-13.231, -35.917),
                     (-15.819, -29.713)]]


def test_polygon_query_matches_brute(spark, points):
    rows, df = points
    got = sorted(r["doc_id"] for r in
                 geo.polygon_query(df, POLY).collect())
    want = sorted(d for d, la, lo in rows if _pip_brute(POLY, la, lo))
    assert got == want and 0 < len(want) < len(rows)


def test_polygon_query_hole(spark, points):
    rows, df = points
    got = sorted(r["doc_id"] for r in
                 geo.polygon_query(df, POLY_HOLE).collect())
    want = sorted(d for d, la, lo in rows if _pip_brute(POLY_HOLE, la, lo))
    in_hole = [d for d, la, lo in rows if _pip_brute(POLY[:1], la, lo)
               and not _pip_brute(POLY_HOLE, la, lo)]
    assert got == want and len(in_hole) > 0


def test_polygon_sql_twin_agrees(spark, points):
    """The SQL twin evaluated by DuckDB must match the Catalyst
    predicate doc-for-doc (bit-identical IEEE arithmetic)."""
    import duckdb
    rows, df = points
    got = sorted(r["doc_id"] for r in
                 geo.polygon_query(df, POLY_HOLE).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(doc_id BIGINT, lat DOUBLE, lon DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?, ?)", rows)
    pred = geo.point_in_polygon_sql(POLY_HOLE)
    want = [r[0] for r in con.execute(
        f"SELECT doc_id FROM pts WHERE {pred} ORDER BY doc_id").fetchall()]
    assert got == want
