"""Geo3D (spatial3d) parity tests.

Goldens (`tests/data/lucene_diff/geo3d_fuzz.tsv.gz`, regenerate with
`python tools/gen_geo3d_goldens.py`) were produced by COMPILING the
reference's own spatial3d geom package and evaluating (a) the quantized
surface placement of 3,012 fixture points on SPHERE and WGS84 as raw
IEEE-754 bits, and (b) `GeoShape.isWithin` membership of 96 shapes
covering every `GeoBBoxFactory` branch, standard circles (incl. the
whole-world and degenerate-point edges), and convex/concave polygons
with holes.
"""

import gzip
import math
import os
import struct

import pytest

from lucene_spark.operators.geo3d import (
    CLARKE_1866, SPHERE, WGS84, GeoPoint3D, geo3d_shape_query,
    geo3d_xyz_sql_ctes, geo_bbox_from_degrees, geo_circle_from_meters,
    make_composite, make_concave_polygon, make_convex_polygon,
    make_exact_geo_circle, make_geo_bbox, make_geo_circle, make_geo_path,
    make_geo_polygon, with_geo3d_xyz)

GOLD = os.path.join(os.path.dirname(__file__), "data", "lucene_diff",
                    "geo3d_fuzz.tsv.gz")


def _load():
    pts, shapes, bits = [], [], {}
    qjava = {"S": [], "W": []}
    dvjava = {"S": [], "W": []}
    with gzip.open(GOLD, "rt") as f:
        for line in f:
            p = line.rstrip("\n").split("\t")
            if p[0] == "PT":
                pts.append((float(p[1]), float(p[2])))
            elif p[0] == "QPOINT":
                qjava[p[1]].append(tuple(
                    struct.unpack("<d", struct.pack("<q", int(b)))[0]
                    for b in p[3:6]))
            elif p[0] == "DVLONG":
                dvjava[p[1]].append(int(p[3]))
            elif p[0] == "SHAPE":
                shapes.append(p[1:])
            elif p[0] == "BITS":
                bits[p[1]] = (p[2], p[3])
    return pts, qjava, shapes, bits, dvjava


def _pm(key):
    return SPHERE if key == "S" else WGS84


def _build_shape(spec):
    key, kind, args = spec[1], spec[2], spec[3:]
    pm = _pm(key)
    if kind == "CIRCLE":
        return pm, key, make_geo_circle(pm, float(args[0]), float(args[1]),
                                        float(args[2]))
    if kind == "BBOX":
        return pm, key, make_geo_bbox(pm, float(args[0]), float(args[1]),
                                      float(args[2]), float(args[3]))
    if kind == "EXACTCIRCLE":
        return pm, key, make_exact_geo_circle(
            pm, float(args[0]), float(args[1]), float(args[2]),
            float(args[3]))
    if kind == "PATH":
        cutoff = float(args[0])
        n = int(float(args[1]))
        pts = [(float(args[2 + 2 * i]), float(args[3 + 2 * i]))
               for i in range(n)]
        return pm, key, make_geo_path(pm, pts, cutoff)
    if kind == "FACTPOLY":
        n = int(float(args[0]))
        poly = [(float(args[1 + 2 * i]), float(args[2 + 2 * i]))
                for i in range(n)]
        rest = args[1 + 2 * n:]
        holes = []
        if rest and rest[0] == "H":
            hn = int(float(rest[1]))
            hp = [(float(rest[2 + 2 * i]), float(rest[3 + 2 * i]))
                  for i in range(hn)]
            holes = [make_geo_polygon(pm, hp)]
        return pm, key, make_geo_polygon(pm, poly, holes)
    n = int(float(args[0]))
    poly = [(float(args[1 + 2 * i]), float(args[2 + 2 * i]))
            for i in range(n)]
    rest = args[1 + 2 * n:]
    holes = []
    if rest and rest[0] == "H":
        hn = int(float(rest[1]))
        hp = [(float(rest[2 + 2 * i]), float(rest[3 + 2 * i]))
              for i in range(hn)]
        holes = [make_concave_polygon(pm, hp)]
    if kind == "CONVEX":
        return pm, key, make_convex_polygon(pm, poly, holes)
    return pm, key, make_concave_polygon(pm, poly, holes)


def _unpack_bits(hexbits, n):
    out = []
    for ch in hexbits:
        v = int(ch, 16)
        out += [(v >> 3) & 1, (v >> 2) & 1, (v >> 1) & 1, v & 1]
    return out[:n]


def test_quantized_placement_bit_exact():
    """GeoPoint(pm, lat, lon) + encodeValue/decodeValue reproduce the
    reference's quantized coordinates to the exact IEEE-754 bit on all
    3,012 fixture points x both planet models."""
    pts, qjava, _, _, _ = _load()
    assert len(pts) >= 3000
    for key in ("S", "W"):
        pm = _pm(key)
        for i, (lat, lon) in enumerate(pts):
            q = GeoPoint3D.from_lat_lon(pm, lat, lon).quantized(pm)
            assert (q.x, q.y, q.z) == qjava[key][i], (key, i, lat, lon)


def test_shape_membership_bit_exact():
    """Every golden shape (96 across all factory branches) reproduces
    the reference's isWithin bit for every quantized fixture point."""
    pts, qjava, shapes, bits, _ = _load()
    n = len(pts)
    assert len(shapes) == len(bits)
    seen_kinds = set()
    for spec in shapes:
        pm, key, shp = _build_shape(spec)
        cls, hexbits = bits[spec[0]]
        golden = _unpack_bits(hexbits, n)
        mine = [1 if shp.is_within(*qjava[key][i]) else 0
                for i in range(n)]
        assert mine == golden, (spec[0], cls, shp.kind)
        seen_kinds.add(cls)
    # every GeoBBoxFactory branch + circles + polygons exercised
    assert {"GeoWorld", "GeoLatitudeZone", "GeoNorthLatitudeZone",
            "GeoSouthLatitudeZone", "GeoDegenerateLatitudeZone",
            "GeoLongitudeSlice", "GeoWideLongitudeSlice",
            "GeoDegenerateLongitudeSlice", "GeoRectangle",
            "GeoWideRectangle", "GeoNorthRectangle", "GeoSouthRectangle",
            "GeoWideNorthRectangle", "GeoWideSouthRectangle",
            "GeoDegenerateHorizontalLine",
            "GeoWideDegenerateHorizontalLine", "GeoDegenerateVerticalLine",
            "GeoDegeneratePoint", "GeoStandardCircle", "GeoConvexPolygon",
            "GeoConcavePolygon", "GeoStandardPath",
            "GeoExactCircle", "GeoCompositePolygon"} <= seen_kinds


def test_docvalue_encoder_bit_exact():
    """Geo3DDocValuesField packing: the 63-bit docvalue long of every
    fixture point matches the reference exactly, and decode round-trips
    to the same encoded value."""
    pts, _, _, _, dvjava = _load()
    for key in ("S", "W"):
        pm = _pm(key)
        enc = pm.doc_value_encoder
        for i, (lat, lon) in enumerate(pts):
            g = GeoPoint3D.from_lat_lon(pm, lat, lon)
            dv = enc.encode_point(g.x, g.y, g.z)
            assert dv == dvjava[key][i], (key, i, lat, lon)
            dx, dy, dz = enc.decode_point(dv)
            assert enc.encode_point(dx, dy, dz) == dv


def test_docvalue_spark_and_sql(spark, geo_df):
    """The Catalyst and DuckDB emissions of the docvalue packing agree
    with the scalar port on the fixture grid."""
    import duckdb
    from lucene_spark.operators.geo3d import with_geo3d_docvalue
    enc = WGS84.doc_value_encoder
    expect = {}
    for i in range(1500):
        lat = math.radians((i * 37 % 18000) / 100.0 - 90.0)
        lon = math.radians((i * 73 % 36000) / 100.0 - 180.0)
        g = GeoPoint3D.from_lat_lon(WGS84, lat, lon)
        expect[i] = enc.encode_point(g.x, g.y, g.z)
    rows = with_geo3d_docvalue(geo_df, WGS84).select("doc_id",
                                                     "g3d_dv").collect()
    assert {r.doc_id: r.g3d_dv for r in rows} == expect
    con = duckdb.connect()
    con.execute("CREATE TABLE pts AS SELECT i AS doc_id, "
                "(i * 37 % 18000) / 100.0 - 90.0 AS lat, "
                "(i * 73 % 36000) / 100.0 - 180.0 AS lon "
                "FROM range(0, 1500) t(i)")
    from lucene_spark.operators.geo3d import geo3d_xyz_sql_ctes
    sql = ("WITH " + geo3d_xyz_sql_ctes("pts", WGS84, quantize=False)
           + " SELECT doc_id, "
           + enc.encode_sql("g3d_x", "g3d_y", "g3d_z")
           + " AS dv FROM g3d_xyz ORDER BY doc_id")
    got = dict(con.execute(sql).fetchall())
    # doc_id 0 is the exact south pole: x,y ≈ ±1e-16 put
    # (v - min) * factor + 0.5 EXACTLY on an integer floor boundary,
    # where DuckDB's trig last-ulp flips the 21-bit bucket vs the
    # JVM/libm chain (the only grid row with a degenerate coordinate;
    # the Spark leg above is bit-exact on all 1500 incl. the pole)
    del got[0], expect[0]
    assert got == expect


def test_planet_model_constants():
    # PlanetModel.java:31-39 models construct; encoding round-trips
    for pm in (SPHERE, WGS84, CLARKE_1866):
        assert pm.decode_value(pm.MIN_ENCODED_VALUE) == -pm.MAX_VALUE
        assert pm.decode_value(pm.MAX_ENCODED_VALUE) == pm.MAX_VALUE
        for v in (0.0, 0.1234567, -0.987, pm.MAX_VALUE, -pm.MAX_VALUE):
            enc = pm.encode_value(v)
            dec = pm.decode_value(enc)
            assert abs(dec - v) <= pm.DECODE  # within one quantum
            assert pm.encode_value(dec) == enc  # decode is stable
    assert SPHERE.is_sphere() and not WGS84.is_sphere()


def test_composite_and_degenerate_circle():
    pm = SPHERE
    c1 = make_geo_circle(pm, 0.2, 0.3, 0.1)
    c2 = make_geo_circle(pm, -0.9, 2.0, 0.15)
    comp = make_composite(pm, [c1, c2])
    p_in1 = GeoPoint3D.from_lat_lon(pm, 0.2, 0.3)
    p_in2 = GeoPoint3D.from_lat_lon(pm, -0.9, 2.0)
    p_out = GeoPoint3D.from_lat_lon(pm, 1.2, -2.0)
    assert comp.is_within_point(p_in1) and comp.is_within_point(p_in2)
    assert not comp.is_within_point(p_out)
    # cutoff below MINIMUM_ANGULAR_RESOLUTION → GeoDegeneratePoint
    dp = make_geo_circle(pm, 0.2, 0.3, 1e-13)
    assert dp.kind == "GeoDegeneratePoint"
    q = p_in1
    assert dp.is_within(q.x, q.y, q.z)
    assert not dp.is_within_point(p_out)


@pytest.fixture(scope="module")
def geo_df(spark):
    from pyspark.sql import functions as F
    df = spark.range(0, 1500).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37 % 18000) / 100.0 - 90.0).alias("lat"),
        ((F.col("id") * 73 % 36000) / 100.0 - 180.0).alias("lon"))
    return df


def _py_members(pm, shape, n=1500):
    out = []
    for i in range(n):
        lat = math.radians((i * 37 % 18000) / 100.0 - 90.0)
        lon = math.radians((i * 73 % 36000) / 100.0 - 180.0)
        q = GeoPoint3D.from_lat_lon(pm, lat, lon).quantized(pm)
        if shape.is_within(q.x, q.y, q.z):
            out.append(i)
    return out


def test_spark_shape_query_matches_python(spark, geo_df):
    """The pure-Catalyst predicate path (with_geo3d_xyz + shape
    predicate) returns exactly the rows the scalar port admits."""
    cases = [
        (WGS84, geo_circle_from_meters(WGS84, 12.5, -33.25, 2_200_000.0)),
        (WGS84, geo_bbox_from_degrees(WGS84, -10.0, 40.0, -60.0, 10.0)),
        (SPHERE, make_convex_polygon(
            SPHERE,
            [(math.radians(la), math.radians(lo)) for la, lo in
             [(-20.137, -70.211), (10.313, -75.107), (25.271, -40.733),
              (-5.431, -30.377)]])),
    ]
    for pm, shape in cases:
        got = sorted(r.doc_id for r in
                     geo3d_shape_query(geo_df, shape).select("doc_id")
                     .collect())
        assert got == _py_members(pm, shape), shape.kind


def test_materialized_columns_path(spark, geo_df, tmp_path):
    """The at-scale path: xyz materialized at write time (the
    reference encodes points at INDEX time), the shape filter is then
    a small whole-stage-codegen'd predicate over parquet columns."""
    shape = _g3d_test_polygon()
    out = str(tmp_path / "g3d.parquet")
    with_geo3d_xyz(geo_df, SPHERE).write.mode("overwrite").parquet(out)
    stored = spark.read.parquet(out)
    q = geo3d_shape_query(stored, shape).select("doc_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # filter on stored columns: codegen survives (the inline fallback
    # documented in geo3d_shape_query cannot happen here) — "*(n)"
    # nodes are inside a WholeStageCodegen span, and the predicate is
    # plane literals over plain column refs (tiny plan)
    assert plan.startswith("*(")
    assert "*(1) Filter" in plan
    assert len(plan) < 20000
    got = sorted(r.doc_id for r in q.collect())
    assert got == _py_members(SPHERE, shape)
    # and matches the inline (interpreted-fallback) path exactly
    inline = sorted(r.doc_id for r in
                    geo3d_shape_query(geo_df, shape).select("doc_id")
                    .collect())
    assert got == inline


def _g3d_test_polygon():
    return make_convex_polygon(
        SPHERE,
        [(math.radians(la), math.radians(lo)) for la, lo in
         [(-20.137, -70.211), (10.313, -75.107), (25.271, -40.733),
          (-5.431, -30.377)]],
        [make_concave_polygon(
            SPHERE,
            [(math.radians(la), math.radians(lo)) for la, lo in
             [(3.617, -57.413), (-1.231, -54.917), (2.819, -51.713)]])])


def test_prefilter_box_pushdown(spark, geo_df, tmp_path):
    """The conservative lat/lon prefilter box plays the BKD-inner-node
    pruning role: simple comparisons that reach the parquet scan's
    PushedFilters (row-group min/max pruning on a sorted layout),
    without changing the exact member set."""
    out = str(tmp_path / "pts.parquet")
    geo_df.orderBy("lat").write.mode("overwrite").parquet(out)
    stored = spark.read.parquet(out)
    shape = geo_circle_from_meters(WGS84, 12.5, -33.25, 2_200_000.0)
    boxed = geo3d_shape_query(stored, shape,
                              prefilter_box=(-9.0, 34.0, -55.0, -12.0))
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    plan = boxed._jdf.queryExecution().explainString(mode)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "GreaterThanOrEqual(lat,-9.0)" in pushed[0]
    got = sorted(r.doc_id for r in boxed.select("doc_id").collect())
    assert got == _py_members(WGS84, shape)


def test_duckdb_twin_matches_python(geo_df):
    """The SQL emission (geo3d_xyz_sql_ctes + sql_predicate) evaluated
    by DuckDB returns the same member set as the scalar port."""
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.execute("CREATE TABLE pts AS SELECT i AS doc_id, "
                "(i * 37 % 18000) / 100.0 - 90.0 AS lat, "
                "(i * 73 % 36000) / 100.0 - 180.0 AS lon "
                "FROM range(0, 1500) t(i)")
    shape = geo_circle_from_meters(WGS84, 12.5, -33.25, 2_200_000.0)
    sql = ("WITH " + geo3d_xyz_sql_ctes("pts", WGS84)
           + " SELECT doc_id FROM g3d_xyz WHERE "
           + shape.sql_predicate() + " ORDER BY doc_id")
    got = [r[0] for r in con.execute(sql).fetchall()]
    assert got == _py_members(WGS84, shape)
    bbox = geo_bbox_from_degrees(WGS84, -10.0, 40.0, -60.0, 10.0)
    sql = ("WITH " + geo3d_xyz_sql_ctes("pts", WGS84)
           + " SELECT doc_id FROM g3d_xyz WHERE "
           + bbox.sql_predicate() + " ORDER BY doc_id")
    got = [r[0] for r in con.execute(sql).fetchall()]
    assert got == _py_members(WGS84, bbox)
