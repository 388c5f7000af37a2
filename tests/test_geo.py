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
