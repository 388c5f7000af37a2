"""Geo-spatial point queries (LatLonPoint role).

Reference: ``lucene/core/src/java/org/apache/lucene/document/
LatLonPoint.java:78`` — ``newBoxQuery`` / ``newDistanceQuery`` /
``nearest``. The reference indexes (lat, lon) into a 2-D BKD tree and
answers box/distance queries by tree descent with an exact per-hit
check; distance sorting uses a monotone surrogate (``SloppyMath
.haversinSortKey``) and converts to meters only for the returned top-k.

Spark-first mapping (SURVEY §4.2 pattern — replace the bespoke tree
with columnar statistics):

* **Box query** — a pure Catalyst range filter on the lat/lon columns.
  Parquet row-group min/max statistics prune non-overlapping row groups
  (the BKD inner-node reject/accept role), and the residual comparison
  is whole-stage-codegen'd — no UDF, no Python.
* **Distance query** — the reference's own two-phase shape: a bounding
  BOX prefilter (pushed down like above) + an exact distance predicate
  on the survivors.
* **Nearest (top-k)** — distance sort + ``TakeOrderedAndProject``
  (partial top-k per partition, k·P rows to the merge). At scale,
  seed the search with a bounding box around the query point and widen
  on under-fill (the reference's ``NearestNeighbor`` grows its search
  radius the same way); the ``box_hint`` parameter is that seam.

Documented simplification: the distance surrogate is the
**equirectangular sort key** ``dlat² + (dlon·cos(lat_c))²`` with the
center's cosine inlined as a Python-computed literal — monotone in true
distance near the center like the reference's haversin sort key, but
built from IEEE arithmetic only (no per-engine libm transcendentals),
so the engine and the DuckDB oracle agree bit-for-bit. Callers needing
meters apply the haversine to the returned k rows (k is tiny).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def box_query(df: DataFrame, min_lat: float, max_lat: float,
              min_lon: float, max_lon: float,
              lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """LatLonPoint.newBoxQuery: rows inside the [min, max] lat/lon box
    (inclusive, like the reference). Crossing the dateline
    (min_lon > max_lon) splits into the two wrapped ranges, as
    ``LatLonPoint.newBoxQuery`` does."""
    lat = F.col(lat_col)
    lon = F.col(lon_col)
    cond = (lat >= min_lat) & (lat <= max_lat)
    if min_lon <= max_lon:
        cond &= (lon >= min_lon) & (lon <= max_lon)
    else:   # dateline crossing: [min_lon, 180] ∪ [-180, max_lon]
        cond &= (lon >= min_lon) | (lon <= max_lon)
    return df.filter(cond)


def distance_sort_key(center_lat: float, center_lon: float,
                      lat_col: str = "lat",
                      lon_col: str = "lon") -> Column:
    """Monotone distance surrogate (SloppyMath.haversinSortKey role):
    ``(lat-clat)² + ((lon-clon)·K)²`` with K = cos(center_lat) inlined
    as a literal — pure IEEE arithmetic, bit-identical across engines."""
    k = math.cos(math.radians(center_lat))
    dlat = F.col(lat_col) - F.lit(float(center_lat))
    dlon = (F.col(lon_col) - F.lit(float(center_lon))) * F.lit(float(k))
    return dlat * dlat + dlon * dlon


def distance_sort_key_sql(center_lat: float, center_lon: float,
                          lat_expr: str = "lat",
                          lon_expr: str = "lon") -> str:
    """The identical surrogate as a SQL string (oracle twin of
    :func:`distance_sort_key` — same literals, same op order)."""
    k = repr(math.cos(math.radians(center_lat)))
    return (f"(({lat_expr}) - {float(center_lat)!r}) * "
            f"(({lat_expr}) - {float(center_lat)!r}) + "
            f"((({lon_expr}) - {float(center_lon)!r}) * {k}) * "
            f"((({lon_expr}) - {float(center_lon)!r}) * {k})")


def distance_query(df: DataFrame, center_lat: float, center_lon: float,
                   radius_deg: float,
                   lat_col: str = "lat",
                   lon_col: str = "lon") -> DataFrame:
    """LatLonPoint.newDistanceQuery (two-phase): a bounding-box
    prefilter that Catalyst pushes to the scan, then the exact
    sort-key predicate on the survivors. ``radius_deg`` is the radius
    in sort-key degrees (callers convert meters via ~111,195 m/deg)."""
    k = math.cos(math.radians(center_lat))
    dlon = radius_deg / max(k, 1e-9)
    boxed = box_query(df, center_lat - radius_deg, center_lat + radius_deg,
                      max(center_lon - dlon, -180.0),
                      min(center_lon + dlon, 180.0), lat_col, lon_col)
    key = distance_sort_key(center_lat, center_lon, lat_col, lon_col)
    return boxed.filter(key <= float(radius_deg) * float(radius_deg))


def nearest(df: DataFrame, center_lat: float, center_lon: float,
            k: int = 10, id_col: str = "doc_id",
            lat_col: str = "lat", lon_col: str = "lon",
            box_hint: float | None = None) -> DataFrame:
    """LatLonPoint.nearest: top-k rows by the distance sort key,
    tie-broken by id. ``box_hint`` (degrees) seeds a bounding-box
    prefilter — the scale path; the caller widens and retries on
    under-fill exactly like the reference's growing search radius.
    Output: (id, lat, lon, sort_key, rank)."""
    from pyspark.sql.window import Window
    src = df
    if box_hint is not None:
        src = box_query(df, center_lat - box_hint, center_lat + box_hint,
                        center_lon - box_hint, center_lon + box_hint,
                        lat_col, lon_col)
    key = distance_sort_key(center_lat, center_lon, lat_col, lon_col)
    order = [F.asc("sort_key"), F.asc(id_col)]
    # orderBy().limit(k) plans as TakeOrderedAndProject (partial top-k
    # per partition, k rows to the merge); the rank window then runs
    # over only those k rows — never a global single-partition sort
    topk = (src.select(id_col, lat_col, lon_col, key.alias("sort_key"))
            .orderBy(*order).limit(k))
    return (topk.withColumn("rank", F.row_number()
                            .over(Window.orderBy(*order)))
            .select(id_col, lat_col, lon_col, "sort_key",
                    F.col("rank").cast("int").alias("rank")))


def point_in_polygon(rings, lat_col: str = "lat",
                     lon_col: str = "lon") -> Column:
    """Even-odd (crossing-number) point-in-polygon predicate as a pure
    Catalyst expression (``Polygon2D.contains`` role, reference
    ``lucene/core/src/java/org/apache/lucene/geo/Polygon2D.java``).

    ``rings`` is a list of rings, each a list of (lat, lon) vertices;
    holes are simply additional rings — the even-odd rule XORs their
    crossings, which is exactly how the reference's tree treats holes.

    Vertices are compile-time constants, so each edge's ray-crossing
    test is emitted division-free with the inequality direction
    resolved in Python from the sign of ``dlat`` (no runtime divide →
    no NULL/Inf divergence between engines): the edge straddles the
    scan line iff ``(lat < y1) != (lat < y2)``, and the crossing is to
    the right of the point iff ``dx*(lat-y1) - (lon-x1)*dy`` has the
    sign of ``dy``. All operands are IEEE doubles with literals baked
    in, so the engine and the SQL twin agree bit-for-bit. Horizontal
    edges never straddle and are dropped at build time.

    Boundary semantics: strict/non-strict mix of the classic crossing
    formulation — deterministic, but points exactly ON an edge are not
    guaranteed either way (the reference makes its own exact on-edge
    choice); callers with on-edge points should nudge vertices.
    """
    lat = F.col(lat_col)
    lon = F.col(lon_col)
    acc = F.lit(False)
    for ring in rings:
        n = len(ring)
        for i in range(n):
            y1, x1 = float(ring[i][0]), float(ring[i][1])
            y2, x2 = float(ring[(i + 1) % n][0]), float(ring[(i + 1) % n][1])
            if y1 == y2:
                continue
            dy = y2 - y1
            dx = x2 - x1
            straddle = (lat < F.lit(y1)) != (lat < F.lit(y2))
            cross = (F.lit(dx) * (lat - F.lit(y1))
                     - (lon - F.lit(x1)) * F.lit(dy))
            edge = straddle & ((cross > 0) if dy > 0 else (cross < 0))
            acc = acc != edge
    return acc


def point_in_polygon_sql(rings, lat_expr: str = "lat",
                         lon_expr: str = "lon") -> str:
    """The identical even-odd predicate as a SQL string (oracle twin of
    :func:`point_in_polygon` — same literals, same op order)."""
    la, lo = f"({lat_expr})", f"({lon_expr})"
    acc = "FALSE"
    for ring in rings:
        n = len(ring)
        for i in range(n):
            y1, x1 = float(ring[i][0]), float(ring[i][1])
            y2, x2 = float(ring[(i + 1) % n][0]), float(ring[(i + 1) % n][1])
            if y1 == y2:
                continue
            dy = y2 - y1
            dx = x2 - x1
            op = ">" if dy > 0 else "<"
            edge = (f"(({la} < {y1!r}) <> ({la} < {y2!r})) AND "
                    f"(({dx!r} * ({la} - {y1!r}) - ({lo} - {x1!r}) * "
                    f"{dy!r}) {op} 0)")
            acc = f"({acc}) <> ({edge})"
    return acc


def polygon_query(df: DataFrame, rings,
                  lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """LatLonPoint.newPolygonQuery (two-phase, like the reference's BKD
    descent): a bounding-box prefilter over ALL rings' vertices that
    Catalyst pushes to the parquet scan (row-group min/max pruning —
    the Polygon2D outer-box reject), then the exact even-odd predicate
    on the survivors, whole-stage-codegen'd — no UDF."""
    lats = [v[0] for ring in rings for v in ring]
    lons = [v[1] for ring in rings for v in ring]
    boxed = box_query(df, min(lats), max(lats), min(lons), max(lons),
                      lat_col, lon_col)
    return boxed.filter(point_in_polygon(rings, lat_col, lon_col))
