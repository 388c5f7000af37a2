"""Geo3D (spatial3d) shape queries over (lat, lon) point columns.

Reference: ``lucene/spatial3d/src/java/org/apache/lucene/spatial3d/``
— ``Geo3DPoint.java:104-232`` (points are (x, y, z) ints on a
``PlanetModel``; a shape query decodes each dimension and calls
``GeoShape.isWithin``, ``PointInShapeIntersectVisitor.java:71-78``),
``Geo3DUtil.java:152-189`` (distance/box/polygon conversions),
``geom/PlanetModel.java:116-148,251-295`` (scalings + the int
encoding), ``geom/GeoPoint.java:62-110`` (surface placement),
``geom/Plane.java:49-113,259-283``, ``geom/SidedPlane.java:288-296``
(membership = sidedness with a 1e-12 tolerance), and the shape
classes cited per factory branch below.

Spark-first mapping
-------------------
The reference walks a 3-D BKD tree whose leaves call
``shape.isWithin(x, y, z)`` on quantized coordinates.  Here the
shape is constructed DRIVER-side into a handful of plane constants
(each ``SidedPlane`` is four doubles + a sign), and membership
compiles to a pure Catalyst boolean expression over the quantized
(x, y, z) columns — whole-stage codegen end to end, no UDF, no
Python on the scan path.  At 100 TB the predicate is embarrassingly
parallel and, when the xyz columns are materialized at write time,
parquet row-group min/max statistics prune non-overlapping file
ranges exactly like the BKD inner nodes the reference descends.

Exactness
---------
Point placement (``sin``/``cos``/ellipsoid magnitude), the int
quantization (``encodeValue``/``decodeValue``), plane construction
(including the Gram-Schmidt refinement loop of
``geom/Vector.java:86-167``), and the 1e-12 sidedness tolerance are
ported operation-for-operation, so membership of the quantized point
set matches the reference bit-for-bit up to libm's ``sin``/``cos``
(JVM vs C library, same caveat as the documented q77 differential
ulp).  Scope: the full ``GeoBBoxFactory`` family, standard AND exact
(Vincenty surface-distance) circles, convex/concave/composite
polygons with holes, the full ``GeoPolygonFactory.makeGeoPolygon``
tiler (``newPolygonQuery`` end-to-end), ``GeoStandardPath`` buffers,
and the ``Geo3DDocValuesField`` 21-bit packing.  Out of scope with
rationale: ``GeoComplexPolygon`` (the tiler's TileException fallback
for pathological coplanarities — raises ``NotImplementedError``
rather than silently approximating) and ``GeoDegeneratePath``
(zero-width lines match nothing meaningful on quantized points).
"""

from __future__ import annotations

import math
import struct
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# geom/Vector.java:26-34
MINIMUM_RESOLUTION = 1.0e-12
MINIMUM_ANGULAR_RESOLUTION = math.pi * MINIMUM_RESOLUTION
_GRAM_SCHMIDT_ENVELOPE = MINIMUM_RESOLUTION * 0.5
# Geo3DUtil.java:38
RADIANS_PER_DEGREE = math.pi / 180.0


def _signum(v: float) -> float:
    if v > 0.0:
        return 1.0
    if v < 0.0:
        return -1.0
    return 0.0


def _next_safe_double(x: float) -> float:
    """PlanetModel.getNextSafeDouble: smallest double >= x whose low 32
    mantissa bits are clear, so int*DECODE/DECODE round-trips."""
    bits = struct.unpack("<q", struct.pack("<d", x))[0]
    bits += 0x7FFFFFFF
    bits &= ~0x7FFFFFFF
    return struct.unpack("<d", struct.pack("<q", bits))[0]


class PlanetModel:
    """geom/PlanetModel.java:116-148 — an ellipsoid x²/a²+y²/a²+z²/c²=1
    scaled so the mean radius is 1, plus the 32-bit value encoding."""

    _dv_encoder: Optional["DocValueEncoder"] = None

    def __init__(self, semi_major_axis: float, semi_minor_axis: float):
        self.a = semi_major_axis
        self.b = semi_minor_axis
        self.mean_radius = (2.0 * semi_major_axis + semi_minor_axis) / 3.0
        self.xy_scaling = semi_major_axis / self.mean_radius
        self.z_scaling = semi_minor_axis / self.mean_radius
        self.inverse_xy_scaling = 1.0 / self.xy_scaling
        self.inverse_z_scaling = 1.0 / self.z_scaling
        self.inverse_xy_scaling_squared = (
            self.inverse_xy_scaling * self.inverse_xy_scaling)
        self.inverse_z_scaling_squared = (
            self.inverse_z_scaling * self.inverse_z_scaling)
        # PlanetModel.java:140-144 (BITS = 32)
        self.MAX_VALUE = max(self.xy_scaling, self.z_scaling)
        mul = float(0x1 << 32) / (2.0 * self.MAX_VALUE)
        self.DECODE = _next_safe_double(1.0 / mul)
        self.scale = (2.0 * self.xy_scaling + self.z_scaling) / 3.0
        self.inverse_scale = 1.0 / self.scale
        self.scaled_flattening = ((self.xy_scaling - self.z_scaling)
                                  * self.inverse_xy_scaling)
        self.square_ratio = ((self.xy_scaling * self.xy_scaling
                              - self.z_scaling * self.z_scaling)
                             / (self.z_scaling * self.z_scaling))
        self.MIN_ENCODED_VALUE = self.encode_value(-self.MAX_VALUE)
        self.MAX_ENCODED_VALUE = self.encode_value(self.MAX_VALUE)
        self._minimum_pole_distance: Optional[float] = None

    def is_sphere(self) -> bool:
        return self.xy_scaling == self.z_scaling

    @property
    def doc_value_encoder(self) -> "DocValueEncoder":
        enc = getattr(self, "_dv_encoder", None)
        if enc is None:
            enc = DocValueEncoder(self)
            self._dv_encoder = enc
        return enc

    @property
    def minimum_pole_distance(self) -> float:
        # PlanetModel.java:138-139 (lazy here — needs surface_distance)
        if self._minimum_pole_distance is None:
            np_ = GeoPoint3D(0.0, 0.0, self.z_scaling)
            sp = GeoPoint3D(0.0, 0.0, -self.z_scaling)
            mnx = GeoPoint3D(-self.xy_scaling, 0.0, 0.0)
            mxx = GeoPoint3D(self.xy_scaling, 0.0, 0.0)
            self._minimum_pole_distance = min(
                self.surface_distance(np_, sp),
                self.surface_distance(mnx, mxx))
        return self._minimum_pole_distance

    def surface_point_on_bearing(self, from_pt: "GeoPoint3D", dist: float,
                                 bearing: float) -> "GeoPoint3D":
        """PlanetModel.surfacePointOnBearing — Vincenty direct problem
        on the scaled ellipsoid (distances in scaled-radian units)."""
        lat = from_pt.latitude()
        lon = from_pt.longitude()
        sin_a1, cos_a1 = math.sin(bearing), math.cos(bearing)
        tan_u1 = (1.0 - self.scaled_flattening) * math.tan(lat)
        cos_u1 = 1.0 / math.sqrt(1.0 + tan_u1 * tan_u1)
        sin_u1 = tan_u1 * cos_u1
        sigma1 = math.atan2(tan_u1, cos_a1)
        sin_alpha = cos_u1 * sin_a1
        cos_sq_alpha = 1.0 - sin_alpha * sin_alpha
        u_sq = cos_sq_alpha * self.square_ratio
        A = 1.0 + u_sq / 16384.0 * (4096.0 + u_sq
                                    * (-768.0 + u_sq * (320.0 - 175.0 * u_sq)))
        B = u_sq / 1024.0 * (256.0 + u_sq * (-128.0 + u_sq
                                             * (74.0 - 47.0 * u_sq)))
        sigma = dist / (self.z_scaling * self.inverse_scale * A)
        iterations = 0
        while True:
            cos2_sigma_m = math.cos(2.0 * sigma1 + sigma)
            sin_sigma = math.sin(sigma)
            cos_sigma = math.cos(sigma)
            delta_sigma = (B * sin_sigma
                           * (cos2_sigma_m + B / 4.0
                              * (cos_sigma
                                 * (-1.0 + 2.0 * cos2_sigma_m * cos2_sigma_m)
                                 - B / 6.0 * cos2_sigma_m
                                 * (-3.0 + 4.0 * sin_sigma * sin_sigma)
                                 * (-3.0 + 4.0 * cos2_sigma_m
                                    * cos2_sigma_m))))
            sigma_p = sigma
            sigma = (dist / (self.z_scaling * self.inverse_scale * A)
                     + delta_sigma)
            iterations += 1
            if (abs(sigma - sigma_p) < MINIMUM_RESOLUTION
                    or iterations >= 100):
                break
        x = sin_u1 * sin_sigma - cos_u1 * cos_sigma * cos_a1
        phi2 = math.atan2(
            sin_u1 * cos_sigma + cos_u1 * sin_sigma * cos_a1,
            (1.0 - self.scaled_flattening)
            * math.sqrt(sin_alpha * sin_alpha + x * x))
        lam = math.atan2(sin_sigma * sin_a1,
                         cos_u1 * cos_sigma - sin_u1 * sin_sigma * cos_a1)
        C = (self.scaled_flattening / 16.0 * cos_sq_alpha
             * (4.0 + self.scaled_flattening * (4.0 - 3.0 * cos_sq_alpha)))
        L = lam - ((1.0 - C) * self.scaled_flattening * sin_alpha
                   * (sigma + C * sin_sigma
                      * (cos2_sigma_m + C * cos_sigma
                         * (-1.0 + 2.0 * cos2_sigma_m * cos2_sigma_m))))
        lam2 = math.fmod(lon + L + 3.0 * math.pi, 2.0 * math.pi) - math.pi
        return GeoPoint3D.from_lat_lon(self, phi2, lam2)

    def surface_distance(self, pt1: "GeoPoint3D",
                         pt2: "GeoPoint3D") -> float:
        """PlanetModel.surfaceDistance — Vincenty inverse problem
        (scaled-radian units; multiply by mean_radius for meters)."""
        L = pt2.longitude() - pt1.longitude()
        U1 = math.atan((1.0 - self.scaled_flattening)
                       * math.tan(pt1.latitude()))
        U2 = math.atan((1.0 - self.scaled_flattening)
                       * math.tan(pt2.latitude()))
        sin_u1, cos_u1 = math.sin(U1), math.cos(U1)
        sin_u2, cos_u2 = math.sin(U2), math.cos(U2)
        cu1cu2, cu1su2 = cos_u1 * cos_u2, cos_u1 * sin_u2
        su1su2, su1cu2 = sin_u1 * sin_u2, sin_u1 * cos_u2
        lam = L
        iter_limit = 0
        while True:
            sin_lambda, cos_lambda = math.sin(lam), math.cos(lam)
            sin_sigma = math.sqrt(
                (cos_u2 * sin_lambda) * (cos_u2 * sin_lambda)
                + (cu1su2 - su1cu2 * cos_lambda)
                * (cu1su2 - su1cu2 * cos_lambda))
            if sin_sigma == 0.0:
                return 0.0
            cos_sigma = su1su2 + cu1cu2 * cos_lambda
            sigma = math.atan2(sin_sigma, cos_sigma)
            sin_alpha = cu1cu2 * sin_lambda / sin_sigma
            cos_sq_alpha = 1.0 - sin_alpha * sin_alpha
            try:
                q = 2.0 * su1su2 / cos_sq_alpha
            except ZeroDivisionError:
                # IEEE semantics like the Java division: 0/0 → NaN,
                # x/0 → ±Inf (geometrically unreachable)
                n = 2.0 * su1su2
                q = math.nan if n == 0.0 else math.copysign(math.inf, n)
            cos2_sigma_m = cos_sigma - q
            if math.isnan(cos2_sigma_m):
                cos2_sigma_m = 0.0  # equatorial line: cosSqAlpha=0
            C = (self.scaled_flattening / 16.0 * cos_sq_alpha
                 * (4.0 + self.scaled_flattening
                    * (4.0 - 3.0 * cos_sq_alpha)))
            lambda_p = lam
            lam = L + ((1.0 - C) * self.scaled_flattening * sin_alpha
                       * (sigma + C * sin_sigma
                          * (cos2_sigma_m + C * cos_sigma
                             * (-1.0 + 2.0 * cos2_sigma_m
                                * cos2_sigma_m))))
            iter_limit += 1
            if (abs(lam - lambda_p) < MINIMUM_RESOLUTION
                    or iter_limit >= 100):
                break
        u_sq = cos_sq_alpha * self.square_ratio
        A = 1.0 + u_sq / 16384.0 * (4096.0 + u_sq
                                    * (-768.0 + u_sq * (320.0 - 175.0 * u_sq)))
        B = u_sq / 1024.0 * (256.0 + u_sq * (-128.0 + u_sq
                                             * (74.0 - 47.0 * u_sq)))
        delta_sigma = (B * sin_sigma
                       * (cos2_sigma_m + B / 4.0
                          * (cos_sigma
                             * (-1.0 + 2.0 * cos2_sigma_m * cos2_sigma_m)
                             - B / 6.0 * cos2_sigma_m
                             * (-3.0 + 4.0 * sin_sigma * sin_sigma)
                             * (-3.0 + 4.0 * cos2_sigma_m
                                * cos2_sigma_m))))
        return (self.z_scaling * self.inverse_scale * A
                * (sigma - delta_sigma))

    # PlanetModel.java:251-276
    def encode_value(self, x: float) -> int:
        if x > self.MAX_VALUE:
            raise ValueError("value=%r is out-of-bounds" % x)
        if x == self.MAX_VALUE:
            x = math.nextafter(x, -math.inf)
        if x < -self.MAX_VALUE:
            raise ValueError("value=%r is out-of-bounds" % x)
        return int(math.floor(x / self.DECODE))

    # PlanetModel.java:278-295
    def decode_value(self, x: int) -> float:
        if x == self.MIN_ENCODED_VALUE:
            return -self.MAX_VALUE
        if x == self.MAX_ENCODED_VALUE:
            return self.MAX_VALUE
        return (x + 0.5) * self.DECODE

    # geom/Vector.java:544-557
    def ellipsoid_magnitude(self, ux: float, uy: float, uz: float) -> float:
        return 1.0 / math.sqrt(
            ux * ux * self.inverse_xy_scaling_squared
            + uy * uy * self.inverse_xy_scaling_squared
            + uz * uz * self.inverse_z_scaling_squared)

    def z_ellipsoid_magnitude(self, z: float) -> float:
        """geom/Vector.java:562-567 (z-only variant used by the
        horizontal Plane(planetModel, sinLat) constructor)."""
        return 1.0 / math.sqrt(
            (1.0 - z * z) * self.inverse_xy_scaling_squared
            + z * z * self.inverse_z_scaling_squared)


class DocValueEncoder:
    """PlanetModel.DocValueEncoder (PlanetModel.java:~330-520) — packs
    a surface point into one long: 21 bits per axis, each axis scaled
    to its planet range by floor((v - min) * factor + 0.5)."""

    _INVERSE_MAX = 1.0 / float(0x1FFFFF)

    def __init__(self, pm: "PlanetModel"):
        self.pm = pm
        self.min_x = -pm.xy_scaling
        self.max_x = pm.xy_scaling
        self.min_y = -pm.xy_scaling
        self.max_y = pm.xy_scaling
        self.min_z = -pm.z_scaling
        self.max_z = pm.z_scaling
        self.inverse_x_factor = (self.max_x - self.min_x) * self._INVERSE_MAX
        self.inverse_y_factor = (self.max_y - self.min_y) * self._INVERSE_MAX
        self.inverse_z_factor = (self.max_z - self.min_z) * self._INVERSE_MAX
        self.x_factor = 1.0 / self.inverse_x_factor
        self.y_factor = 1.0 / self.inverse_y_factor
        self.z_factor = 1.0 / self.inverse_z_factor

    def _enc(self, v: float, vmin: float, vmax: float, factor: float,
             axis: str) -> int:
        if v > vmax:
            raise ValueError("%s value exceeds planet model maximum" % axis)
        if v < vmin:
            raise ValueError("%s value less than planet model minimum"
                             % axis)
        return int(math.floor((v - vmin) * factor + 0.5))

    def encode_point(self, x: float, y: float, z: float) -> int:
        xe = self._enc(x, self.min_x, self.max_x, self.x_factor, "x")
        ye = self._enc(y, self.min_y, self.max_y, self.y_factor, "y")
        ze = self._enc(z, self.min_z, self.max_z, self.z_factor, "z")
        return (((xe & 0x1FFFFF) << 42) | ((ye & 0x1FFFFF) << 21)
                | (ze & 0x1FFFFF))

    def decode_point(self, dv: int) -> Tuple[float, float, float]:
        return (((dv >> 42) & 0x1FFFFF) * self.inverse_x_factor + self.min_x,
                ((dv >> 21) & 0x1FFFFF) * self.inverse_y_factor + self.min_y,
                (dv & 0x1FFFFF) * self.inverse_z_factor + self.min_z)

    def encode_col(self, x: Column, y: Column, z: Column) -> Column:
        """The same packing as a Catalyst expression (the
        Geo3DDocValuesField write-time value)."""
        def enc(v, vmin, factor):
            return F.floor((v - F.lit(vmin)) * F.lit(factor)
                           + F.lit(0.5)).cast("long")
        xe = enc(x, self.min_x, self.x_factor)
        ye = enc(y, self.min_y, self.y_factor)
        ze = enc(z, self.min_z, self.z_factor)
        return (F.shiftleft(xe.bitwiseAND(F.lit(0x1FFFFF)), 42)
                .bitwiseOR(F.shiftleft(ye.bitwiseAND(F.lit(0x1FFFFF)), 21))
                .bitwiseOR(ze.bitwiseAND(F.lit(0x1FFFFF))))

    def encode_sql(self, x: str, y: str, z: str) -> str:
        def enc(v, vmin, factor):
            return ("CAST(floor(({v} - {mn!r}) * {f!r} + 0.5) AS BIGINT)"
                    .format(v=v, mn=vmin, f=factor))
        return ("((({xe} & 2097151) << 42) | (({ye} & 2097151) << 21) | "
                "({ze} & 2097151))"
                .format(xe=enc(x, self.min_x, self.x_factor),
                        ye=enc(y, self.min_y, self.y_factor),
                        ze=enc(z, self.min_z, self.z_factor)))


SPHERE = PlanetModel(1.0, 1.0)
WGS84 = PlanetModel(6378137.0, 6356752.314245)
CLARKE_1866 = PlanetModel(6378206.4, 6356583.8)


def _check_lat_deg(v: float) -> None:
    # org.apache.lucene.geo.GeoUtils.checkLatitude (Geo3DUtil callers)
    if math.isnan(v) or v < -90.0 or v > 90.0:
        raise ValueError("invalid latitude %r; must be between -90.0 and "
                         "90.0" % v)


def _check_lon_deg(v: float) -> None:
    if math.isnan(v) or v < -180.0 or v > 180.0:
        raise ValueError("invalid longitude %r; must be between -180.0 "
                         "and 180.0" % v)


class GeoPoint3D:
    """geom/GeoPoint.java:62-110 — a point on the planet surface.
    Latitude/longitude are cached when constructed from them (the
    reference's lazy fields), else recomputed per :249-272."""

    __slots__ = ("x", "y", "z", "_lat", "_lon")

    def __init__(self, x: float, y: float, z: float,
                 lat: Optional[float] = None, lon: Optional[float] = None):
        self.x, self.y, self.z = x, y, z
        self._lat, self._lon = lat, lon

    def latitude(self) -> float:
        if self._lat is None:
            self._lat = math.asin(self.z / self.magnitude())
        return self._lat

    def longitude(self) -> float:
        if self._lon is None:
            if (abs(self.x) < MINIMUM_RESOLUTION
                    and abs(self.y) < MINIMUM_RESOLUTION):
                self._lon = 0.0
            else:
                self._lon = math.atan2(self.y, self.x)
        return self._lon

    @classmethod
    def from_lat_lon(cls, pm: PlanetModel, lat: float,
                     lon: float) -> "GeoPoint3D":
        sin_lat, cos_lat = math.sin(lat), math.cos(lat)
        sin_lon, cos_lon = math.sin(lon), math.cos(lon)
        out = cls.from_trig(pm, sin_lat, sin_lon, cos_lat, cos_lon)
        out._lat, out._lon = lat, lon
        return out

    @classmethod
    def from_trig(cls, pm: PlanetModel, sin_lat: float, sin_lon: float,
                  cos_lat: float, cos_lon: float) -> "GeoPoint3D":
        ux = cos_lat * cos_lon
        uy = cos_lat * sin_lon
        uz = sin_lat
        mag = pm.ellipsoid_magnitude(ux, uy, uz)
        return cls(ux * mag, uy * mag, uz * mag)

    def magnitude(self) -> float:
        return math.sqrt(self.x * self.x + self.y * self.y + self.z * self.z)

    def quantized(self, pm: PlanetModel) -> "GeoPoint3D":
        """The decode(encode(·)) coordinates the reference's query
        actually tests (PointInShapeIntersectVisitor.java:71-78)."""
        return GeoPoint3D(pm.decode_value(pm.encode_value(self.x)),
                          pm.decode_value(pm.encode_value(self.y)),
                          pm.decode_value(pm.encode_value(self.z)))


def _perpendicular(ax: float, ay: float, az: float,
                   bx: float, by: float, bz: float
                   ) -> Tuple[float, float, float]:
    """geom/Vector.java:86-167 — normalized cross product with the
    Gram-Schmidt refinement loop (plane must contain both inputs to
    within half the minimum resolution)."""
    tx = ay * bz - az * by
    ty = az * bx - ax * bz
    tz = ax * by - ay * bx
    mag = math.sqrt(tx * tx + ty * ty + tz * tz)
    if mag == 0.0:
        raise ValueError("Degenerate/parallel vector constructed")
    inv = 1.0 / mag
    nx, ny, nz = tx * inv, ty * inv, tz * inv
    i = 0
    while True:
        dot_a = ax * nx + ay * ny + az * nz
        dot_b = bx * nx + by * ny + bz * nz
        if (abs(dot_a) < _GRAM_SCHMIDT_ENVELOPE
                and abs(dot_b) < _GRAM_SCHMIDT_ENVELOPE):
            break
        if abs(dot_a) > abs(dot_b):
            cx, cy, cz, dot = ax, ay, az, dot_a
        else:
            cx, cy, cz, dot = bx, by, bz, dot_b
        nx, ny, nz = nx - dot * cx, ny - dot * cy, nz - dot * cz
        mag = math.sqrt(nx * nx + ny * ny + nz * nz)
        inv = 1.0 / mag
        nx, ny, nz = nx * inv, ny * inv, nz * inv
        i += 1
        # Java: if (i++ > 10) throw — the 12th adjustment trips the
        # guard, i.e. old-i > 10 ⇔ new-i > 11
        if i > 11:
            raise ValueError("Plane could not be constructed")
    return nx, ny, nz


class Plane:
    """geom/Plane.java:49-113 — Ax+By+Cz+D with normalized (A,B,C).
    (In the reference Plane extends Vector, so A/B/C double as x/y/z —
    mirrored here via properties for code that treats the normal as a
    point, e.g. the path cutoff-plane construction.)"""

    __slots__ = ("A", "B", "C", "D")

    def __init__(self, A: float, B: float, C: float, D: float):
        self.A, self.B, self.C, self.D = A, B, C, D

    @property
    def x(self) -> float:
        return self.A

    @property
    def y(self) -> float:
        return self.B

    @property
    def z(self) -> float:
        return self.C

    @classmethod
    def horizontal(cls, pm: PlanetModel, sin_lat: float) -> "Plane":
        # Plane.java:84-88
        return cls(0.0, 0.0, 1.0,
                   -sin_lat * pm.z_ellipsoid_magnitude(sin_lat))

    @classmethod
    def vertical(cls, x: float, y: float) -> "Plane":
        # Plane.java:95-99 (through (x, y, 0) and the Z axis)
        return cls(y, -x, 0.0, 0.0)

    @classmethod
    def through_origin(cls, a: GeoPoint3D, b: GeoPoint3D) -> "Plane":
        # Plane.java:73-77
        nx, ny, nz = _perpendicular(a.x, a.y, a.z, b.x, b.y, b.z)
        return cls(nx, ny, nz, 0.0)

    @classmethod
    def normalized_z_plane(cls, *points: GeoPoint3D) -> Optional["Plane"]:
        # Plane.java:137-148,203-208: pick the point with the greatest
        # x-y distance, plane through it and the Z axis.
        best_dist, best = 0.0, None
        for p in points:
            d = p.x * p.x + p.y * p.y
            if d > best_dist:
                best_dist, best = d, p
        x, y = best.x, best.y
        if abs(x) < MINIMUM_RESOLUTION and abs(y) < MINIMUM_RESOLUTION:
            return None
        denom = 1.0 / math.sqrt(x * x + y * y)
        return cls(y * denom, -x * denom, 0.0, 0.0)

    def evaluate(self, x: float, y: float, z: float) -> float:
        return self.A * x + self.B * y + self.C * z + self.D

    def evaluate_is_zero(self, x: float, y: float, z: float) -> bool:
        return abs(self.evaluate(x, y, z)) < MINIMUM_RESOLUTION

    def find_intersections(self, pm: PlanetModel, q: "Plane",
                           bounds: Sequence["SidedPlane"] = (),
                           more_bounds: Sequence["SidedPlane"] = ()
                           ) -> List[GeoPoint3D]:
        """geom/Plane.java:779-963 — intersect this plane with plane q
        on the ellipsoid: Cramer-solved line + quadratic, candidates
        filtered by the sided bounds.  Driver-side shape construction
        only (never per row)."""
        lvx = self.B * q.C - self.C * q.B
        lvy = self.C * q.A - self.A * q.C
        lvz = self.A * q.B - self.B * q.A
        if (abs(lvx) < MINIMUM_RESOLUTION and abs(lvy) < MINIMUM_RESOLUTION
                and abs(lvz) < MINIMUM_RESOLUTION):
            return []
        min_res_sq = MINIMUM_RESOLUTION * MINIMUM_RESOLUTION
        denom_yz = self.B * q.C - self.C * q.B
        denom_xz = self.A * q.C - self.C * q.A
        denom_xy = self.A * q.B - self.B * q.A
        if abs(denom_yz) >= abs(denom_xz) and abs(denom_yz) >= abs(denom_xy):
            if abs(denom_yz) < min_res_sq:
                return []
            denom = 1.0 / denom_yz
            x0 = 0.0
            y0 = (-self.D * q.C - self.C * -q.D) * denom
            z0 = (self.B * -q.D + self.D * q.B) * denom
        elif abs(denom_xz) >= abs(denom_xy) and abs(denom_xz) >= abs(denom_yz):
            if abs(denom_xz) < min_res_sq:
                return []
            denom = 1.0 / denom_xz
            x0 = (-self.D * q.C - self.C * -q.D) * denom
            y0 = 0.0
            z0 = (self.A * -q.D + self.D * q.A) * denom
        else:
            if abs(denom_xy) < min_res_sq:
                return []
            denom = 1.0 / denom_xy
            x0 = (-self.D * q.B - self.B * -q.D) * denom
            y0 = (self.A * -q.D + self.D * q.A) * denom
            z0 = 0.0
        A = (lvx * lvx * pm.inverse_xy_scaling_squared
             + lvy * lvy * pm.inverse_xy_scaling_squared
             + lvz * lvz * pm.inverse_z_scaling_squared)
        B = 2.0 * (lvx * x0 * pm.inverse_xy_scaling_squared
                   + lvy * y0 * pm.inverse_xy_scaling_squared
                   + lvz * z0 * pm.inverse_z_scaling_squared)
        C = (x0 * x0 * pm.inverse_xy_scaling_squared
             + y0 * y0 * pm.inverse_xy_scaling_squared
             + z0 * z0 * pm.inverse_z_scaling_squared - 1.0)
        disc = B * B - 4.0 * A * C
        out: List[GeoPoint3D] = []

        def _ok(px: float, py: float, pz: float) -> bool:
            return (all(b.is_within(px, py, pz) for b in bounds)
                    and all(b.is_within(px, py, pz) for b in more_bounds))

        if abs(disc) < min_res_sq:
            t = -B / (2.0 * A)
            px, py, pz = lvx * t + x0, lvy * t + y0, lvz * t + z0
            if _ok(px, py, pz):
                out.append(GeoPoint3D(px, py, pz))
        elif disc > 0.0:
            inv2a = 1.0 / (2.0 * A)
            sq = math.sqrt(disc)
            for t in ((-B + sq) * inv2a, (-B - sq) * inv2a):
                px, py, pz = lvx * t + x0, lvy * t + y0, lvz * t + z0
                if _ok(px, py, pz):
                    out.append(GeoPoint3D(px, py, pz))
        return out


class SidedPlane(Plane):
    """geom/SidedPlane.java — a plane plus the sign of the inside."""

    __slots__ = ("sig_num",)

    def __init__(self, A: float, B: float, C: float, D: float,
                 check: GeoPoint3D, on_side: bool = True):
        super().__init__(A, B, C, D)
        sig = _signum(self.evaluate(check.x, check.y, check.z))
        if sig == 0.0:
            raise ValueError("Cannot determine sidedness: point on plane")
        self.sig_num = sig if on_side else -sig

    @classmethod
    def from_plane(cls, p: Plane, check: GeoPoint3D,
                   on_side: bool = True) -> "SidedPlane":
        return cls(p.A, p.B, p.C, p.D, check, on_side)

    @classmethod
    def horizontal(cls, check: GeoPoint3D, pm: PlanetModel,
                   sin_lat: float) -> "SidedPlane":
        return cls.from_plane(Plane.horizontal(pm, sin_lat), check)

    @classmethod
    def vertical(cls, check: GeoPoint3D, x: float, y: float) -> "SidedPlane":
        return cls.from_plane(Plane.vertical(x, y), check)

    @classmethod
    def normal(cls, check: GeoPoint3D, vx: float, vy: float, vz: float,
               d: float) -> "SidedPlane":
        return cls(vx, vy, vz, d, check)

    @classmethod
    def through_origin(cls, check: GeoPoint3D, a: GeoPoint3D, b: GeoPoint3D,
                       on_side: bool = True) -> "SidedPlane":
        return cls.from_plane(Plane.through_origin(a, b), check, on_side)

    @classmethod
    def perpendicular(cls, inside: GeoPoint3D, normal_plane: Plane,
                      p1: GeoPoint3D, p2: GeoPoint3D
                      ) -> Optional["SidedPlane"]:
        # SidedPlane.java:211-228
        dx, dy, dz = p1.x - p2.x, p1.y - p2.y, p1.z - p2.z
        nx, ny, nz = _perpendicular(normal_plane.A, normal_plane.B,
                                    normal_plane.C, dx, dy, dz)
        d = -(nx * p1.x + ny * p1.y + nz * p1.z)
        try:
            return cls(nx, ny, nz, d, inside)
        except ValueError:
            return None

    def reversed(self) -> "SidedPlane":
        # SidedPlane.java:34-38 (copy constructor flips the side)
        out = SidedPlane.__new__(SidedPlane)
        Plane.__init__(out, self.A, self.B, self.C, self.D)
        out.sig_num = -self.sig_num
        return out

    @classmethod
    def three_point(cls, inside: GeoPoint3D, p1, p2, p3
                    ) -> Optional["SidedPlane"]:
        # SidedPlane.java:231-285: three attempts with different
        # difference-vector pairs until one succeeds
        for a, b, through in (
                ((p1.x - p2.x, p1.y - p2.y, p1.z - p2.z),
                 (p2.x - p3.x, p2.y - p3.y, p2.z - p3.z), p2),
                ((p1.x - p3.x, p1.y - p3.y, p1.z - p3.z),
                 (p3.x - p2.x, p3.y - p2.y, p3.z - p2.z), p3),
                ((p3.x - p1.x, p3.y - p1.y, p3.z - p1.z),
                 (p1.x - p2.x, p1.y - p2.y, p1.z - p2.z), p1)):
            try:
                nx, ny, nz = _perpendicular(a[0], a[1], a[2],
                                            b[0], b[1], b[2])
                d = -(nx * through.x + ny * through.y + nz * through.z)
                return cls(nx, ny, nz, d, inside)
            except ValueError:
                continue
        return None

    def is_within(self, x: float, y: float, z: float) -> bool:
        # SidedPlane.java:288-296
        ev = self.evaluate(x, y, z)
        if abs(ev) < MINIMUM_RESOLUTION:
            return True
        return _signum(ev) == self.sig_num


# ---------------------------------------------------------------------------
# Membership predicate tree: one structure, three backends (scalar python
# for tests/goldens, a Catalyst Column for the engine, an ANSI-SQL string
# for DuckDB oracle twins).  Plane constants are embedded as literals, so
# the per-row work in every backend is multiply-add + compare only.
# ---------------------------------------------------------------------------

class _Node:
    def test(self, x: float, y: float, z: float) -> bool:
        raise NotImplementedError

    def col(self, x: Column, y: Column, z: Column) -> Column:
        raise NotImplementedError

    def sql(self, x: str, y: str, z: str) -> str:
        raise NotImplementedError


class _True(_Node):
    def test(self, x, y, z):
        return True

    def col(self, x, y, z):
        return F.lit(True)

    def sql(self, x, y, z):
        return "TRUE"


class _False(_Node):
    """Matches nothing (e.g. an empty GeoCompositePolygon — the
    reference's any-of loop over zero shapes)."""

    def test(self, x, y, z):
        return False

    def col(self, x, y, z):
        return F.lit(False)

    def sql(self, x, y, z):
        return "FALSE"


def _lin_sql(p: Plane, x: str, y: str, z: str) -> str:
    return ("({A!r} * {x} + {B!r} * {y} + {C!r} * {z} + {D!r})"
            .format(A=p.A, B=p.B, C=p.C, D=p.D, x=x, y=y, z=z))


def _lin_col(p: Plane, x: Column, y: Column, z: Column) -> Column:
    return (F.lit(p.A) * x + F.lit(p.B) * y + F.lit(p.C) * z + F.lit(p.D))


class _PlaneWithin(_Node):
    def __init__(self, plane: SidedPlane):
        self.plane = plane

    def test(self, x, y, z):
        return self.plane.is_within(x, y, z)

    def col(self, x, y, z):
        ev = _lin_col(self.plane, x, y, z)
        return (F.abs(ev) < F.lit(MINIMUM_RESOLUTION)) | \
            (F.signum(ev) == F.lit(self.plane.sig_num))

    def sql(self, x, y, z):
        ev = _lin_sql(self.plane, x, y, z)
        return ("(abs({ev}) < {eps!r} OR sign({ev}) = {sig!r})"
                .format(ev=ev, eps=MINIMUM_RESOLUTION,
                        sig=self.plane.sig_num))


class _PlaneIsZero(_Node):
    def __init__(self, plane: Plane):
        self.plane = plane

    def test(self, x, y, z):
        return self.plane.evaluate_is_zero(x, y, z)

    def col(self, x, y, z):
        return F.abs(_lin_col(self.plane, x, y, z)) < \
            F.lit(MINIMUM_RESOLUTION)

    def sql(self, x, y, z):
        return ("abs({ev}) < {eps!r}"
                .format(ev=_lin_sql(self.plane, x, y, z),
                        eps=MINIMUM_RESOLUTION))


class _PointIdentical(_Node):
    """GeoDegeneratePoint membership (GeoPoint.java:306-310)."""

    def __init__(self, point: GeoPoint3D):
        self.point = point

    def test(self, x, y, z):
        return (abs(self.point.x - x) < MINIMUM_RESOLUTION
                and abs(self.point.y - y) < MINIMUM_RESOLUTION
                and abs(self.point.z - z) < MINIMUM_RESOLUTION)

    def col(self, x, y, z):
        eps = F.lit(MINIMUM_RESOLUTION)
        return ((F.abs(F.lit(self.point.x) - x) < eps)
                & (F.abs(F.lit(self.point.y) - y) < eps)
                & (F.abs(F.lit(self.point.z) - z) < eps))

    def sql(self, x, y, z):
        e = repr(MINIMUM_RESOLUTION)
        return ("(abs({px!r} - {x}) < {e} AND abs({py!r} - {y}) < {e} "
                "AND abs({pz!r} - {z}) < {e})"
                .format(px=self.point.x, py=self.point.y, pz=self.point.z,
                        x=x, y=y, z=z, e=e))


class _ZNear(_Node):
    """GeoDegenerateLatitudeZone.isWithin: |z - sinLat| < 1e-10."""

    def __init__(self, sin_latitude: float):
        self.sin_latitude = sin_latitude

    def test(self, x, y, z):
        return abs(z - self.sin_latitude) < 1e-10

    def col(self, x, y, z):
        return F.abs(z - F.lit(self.sin_latitude)) < F.lit(1e-10)

    def sql(self, x, y, z):
        return "abs({z} - {s!r}) < 1e-10".format(z=z, s=self.sin_latitude)


class _And(_Node):
    def __init__(self, *kids: _Node):
        self.kids = kids

    def test(self, x, y, z):
        return all(k.test(x, y, z) for k in self.kids)

    def col(self, x, y, z):
        if not self.kids:
            return F.lit(True)
        out = self.kids[0].col(x, y, z)
        for k in self.kids[1:]:
            out = out & k.col(x, y, z)
        return out

    def sql(self, x, y, z):
        if not self.kids:
            return "TRUE"
        return "(" + " AND ".join(k.sql(x, y, z) for k in self.kids) + ")"


class _Or(_Node):
    def __init__(self, *kids: _Node):
        self.kids = kids

    def test(self, x, y, z):
        return any(k.test(x, y, z) for k in self.kids)

    def col(self, x, y, z):
        if not self.kids:
            return F.lit(False)
        out = self.kids[0].col(x, y, z)
        for k in self.kids[1:]:
            out = out | k.col(x, y, z)
        return out

    def sql(self, x, y, z):
        if not self.kids:
            return "FALSE"
        return "(" + " OR ".join(k.sql(x, y, z) for k in self.kids) + ")"


class GeoShape3D:
    """A shape = planet model + membership tree."""

    def __init__(self, pm: PlanetModel, membership: _Node, kind: str):
        self.planet_model = pm
        self.membership = membership
        self.kind = kind

    def is_within(self, x: float, y: float, z: float) -> bool:
        return self.membership.test(x, y, z)

    def is_within_point(self, p: GeoPoint3D) -> bool:
        return self.membership.test(p.x, p.y, p.z)

    def predicate(self, x: Column, y: Column, z: Column) -> Column:
        return self.membership.col(x, y, z)

    def sql_predicate(self, x: str = "g3d_x", y: str = "g3d_y",
                      z: str = "g3d_z") -> str:
        return self.membership.sql(x, y, z)


# ---------------------------------------------------------------------------
# Shape factories
# ---------------------------------------------------------------------------

def make_geo_circle(pm: PlanetModel, lat: float, lon: float,
                    cutoff_angle: float) -> GeoShape3D:
    """GeoCircleFactory.makeGeoCircle + GeoStandardCircle.java:50-117.
    Angles in radians."""
    if cutoff_angle < MINIMUM_ANGULAR_RESOLUTION:
        return GeoShape3D(
            pm, _PointIdentical(GeoPoint3D.from_lat_lon(pm, lat, lon)),
            "GeoDegeneratePoint")
    if lat < -math.pi * 0.5 or lat > math.pi * 0.5:
        raise ValueError("Latitude out of bounds")
    if lon < -math.pi or lon > math.pi:
        raise ValueError("Longitude out of bounds")
    if cutoff_angle < 0.0 or cutoff_angle > math.pi:
        raise ValueError("Cutoff angle out of bounds")
    if cutoff_angle < MINIMUM_RESOLUTION:
        raise ValueError("Cutoff angle cannot be effectively zero")
    center = GeoPoint3D.from_lat_lon(pm, lat, lon)
    upper_lat, upper_lon = lat + cutoff_angle, lon
    if upper_lat > math.pi * 0.5:
        upper_lon += math.pi
        if upper_lon > math.pi:
            upper_lon -= 2.0 * math.pi
        upper_lat = math.pi - upper_lat
    lower_lat, lower_lon = lat - cutoff_angle, lon
    if lower_lat < -math.pi * 0.5:
        lower_lon += math.pi
        if lower_lon > math.pi:
            lower_lon -= 2.0 * math.pi
        lower_lat = -math.pi - lower_lat
    upper = GeoPoint3D.from_lat_lon(pm, upper_lat, upper_lon)
    lower = GeoPoint3D.from_lat_lon(pm, lower_lat, lower_lon)
    if abs(cutoff_angle - math.pi) < MINIMUM_RESOLUTION:
        return GeoShape3D(pm, _True(), "GeoStandardCircle(world)")
    normal_plane = Plane.normalized_z_plane(upper, lower, center)
    circle_plane = SidedPlane.perpendicular(center, normal_plane,
                                            upper, lower)
    if circle_plane is None:
        raise ValueError("Couldn't construct circle plane (too small?)")
    return GeoShape3D(pm, _PlaneWithin(circle_plane), "GeoStandardCircle")


def geo_circle_from_meters(pm: PlanetModel, lat_deg: float, lon_deg: float,
                           radius_meters: float) -> GeoShape3D:
    """Geo3DUtil.fromDistance:152-162 — radians = meters / meanRadius
    (checkLatitude/checkLongitude like the reference)."""
    _check_lat_deg(lat_deg)
    _check_lon_deg(lon_deg)
    return make_geo_circle(pm, lat_deg * RADIANS_PER_DEGREE,
                           lon_deg * RADIANS_PER_DEGREE,
                           radius_meters / pm.mean_radius)


def make_exact_geo_circle(pm: PlanetModel, lat: float, lon: float,
                          radius: float,
                          accuracy: float = 0.0) -> GeoShape3D:
    """GeoCircleFactory.makeExactGeoCircle + GeoExactCircle.java:55-191
    — a SURFACE-distance circle on the ellipsoid: the boundary is
    approximated by adaptively split plane sectors (Vincenty bearing
    points, three-point sided planes) until interpolated edge points
    evaluate within ``accuracy``; membership = any slice's
    (circlePlane ∧ sectorPlane1 ∧ sectorPlane2).  Radius in
    scaled-radian surface units, like the reference."""
    if radius < MINIMUM_ANGULAR_RESOLUTION:
        return GeoShape3D(
            pm, _PointIdentical(GeoPoint3D.from_lat_lon(pm, lat, lon)),
            "GeoDegeneratePoint")
    if lat < -math.pi * 0.5 or lat > math.pi * 0.5:
        raise ValueError("Latitude out of bounds")
    if lon < -math.pi or lon > math.pi:
        raise ValueError("Longitude out of bounds")
    if radius < 0.0:
        raise ValueError("Radius out of bounds")
    if radius < MINIMUM_RESOLUTION:
        raise ValueError("Radius cannot be effectively zero")
    if pm.minimum_pole_distance - radius < MINIMUM_RESOLUTION:
        raise ValueError(
            "Radius out of bounds: cannot exceed minimumPoleDistance %r"
            % pm.minimum_pole_distance)
    center = GeoPoint3D.from_lat_lon(pm, lat, lon)
    actual_accuracy = max(accuracy, MINIMUM_RESOLUTION)

    def _slice(p1: GeoPoint3D, b1: float, p2: GeoPoint3D, b2: float,
               mid: GeoPoint3D, bm: float, must_split: bool):
        plane = SidedPlane.three_point(center, p1, p2, mid)
        if plane is None:
            raise ValueError("Circle too small or accuracy too high")
        if plane.is_within(-center.x, -center.y, -center.z):
            raise ValueError("Could not construct a valid plane for this "
                             "planet model")
        return (plane, p1, b1, p2, b2, mid, bm, must_split)

    north = pm.surface_point_on_bearing(center, radius, 0.0)
    south = pm.surface_point_on_bearing(center, radius, math.pi)
    east = pm.surface_point_on_bearing(center, radius, math.pi * 0.5)
    west = pm.surface_point_on_bearing(center, radius, math.pi * 1.5)
    if pm.z_scaling > pm.xy_scaling:
        slices = [
            _slice(east, math.pi * 0.5, west, math.pi * -0.5, north, 0.0,
                   True),
            _slice(west, math.pi * 1.5, east, math.pi * 0.5, south,
                   math.pi, True)]
    else:
        slices = [
            _slice(north, 0.0, south, math.pi, east, math.pi * 0.5, True),
            _slice(south, math.pi, north, math.pi * 2.0, west,
                   math.pi * 1.5, True)]

    nodes: List[_Node] = []
    while slices:
        (plane, p1, b1, p2, b2, mid, bm, must_split) = slices.pop()
        ib1 = (b1 + bm) * 0.5
        interp1 = pm.surface_point_on_bearing(center, radius, ib1)
        ib2 = (b2 + bm) * 0.5
        interp2 = pm.surface_point_on_bearing(center, radius, ib2)
        if (not must_split
                and abs(plane.evaluate(interp1.x, interp1.y,
                                       interp1.z)) < actual_accuracy
                and abs(plane.evaluate(interp2.x, interp2.y,
                                       interp2.z)) < actual_accuracy):
            # CircleSlice: sector planes through each endpoint + center,
            # sided by the middle boundary point
            s1 = SidedPlane.through_origin(mid, p1, center)
            s2 = SidedPlane.through_origin(mid, p2, center)
            nodes.append(_And(_PlaneWithin(plane), _PlaneWithin(s1),
                              _PlaneWithin(s2)))
        else:
            slices.append(_slice(p1, b1, mid, bm, interp1, ib1, False))
            slices.append(_slice(mid, bm, p2, b2, interp2, ib2, False))
    return GeoShape3D(pm, _Or(*nodes), "GeoExactCircle")


def _rect_common(pm: PlanetModel, top_lat: float, bottom_lat: float,
                 left_lon: float, right_lon: float):
    sin_top, cos_top = math.sin(top_lat), math.cos(top_lat)
    sin_bot, cos_bot = math.sin(bottom_lat), math.cos(bottom_lat)
    sin_left, cos_left = math.sin(left_lon), math.cos(left_lon)
    sin_right, cos_right = math.sin(right_lon), math.cos(right_lon)
    middle_lat = (top_lat + bottom_lat) * 0.5
    sin_mid_lat = math.sin(middle_lat)
    cos_mid_lat = math.cos(middle_lat)
    while left_lon > right_lon:
        right_lon += math.pi * 2.0
    middle_lon = (left_lon + right_lon) * 0.5
    sin_mid_lon = math.sin(middle_lon)
    cos_mid_lon = math.cos(middle_lon)
    center = GeoPoint3D.from_trig(pm, sin_mid_lat, sin_mid_lon,
                                  cos_mid_lat, cos_mid_lon)
    return (sin_top, cos_top, sin_bot, cos_bot, sin_left, cos_left,
            sin_right, cos_right, sin_mid_lon, cos_mid_lon, center)


def make_geo_bbox(pm: PlanetModel, top_lat: float, bottom_lat: float,
                  left_lon: float, right_lon: float) -> GeoShape3D:
    """GeoBBoxFactory.makeGeoBBox:37-155 — full branch dispatch; each
    branch's membership is the cited shape class's isWithin.  Angles in
    radians (clamped like the factory)."""
    PI = math.pi
    if top_lat > PI * 0.5:
        top_lat = PI * 0.5
    if bottom_lat < -PI * 0.5:
        bottom_lat = -PI * 0.5
    if left_lon < -PI:
        left_lon = -PI
    if right_lon > PI:
        right_lon = PI
    eps = MINIMUM_ANGULAR_RESOLUTION

    def _hplane(check: GeoPoint3D, sin_lat: float) -> _PlaneWithin:
        return _PlaneWithin(SidedPlane.horizontal(check, pm, sin_lat))

    def _vplane(check: GeoPoint3D, cos_lon: float,
                sin_lon: float) -> _PlaneWithin:
        return _PlaneWithin(SidedPlane.vertical(check, cos_lon, sin_lon))

    # Full longitude range → latitude zones (GeoLatitudeZone.java:87-88,
    # GeoNorthLatitudeZone.java:67, GeoSouthLatitudeZone.java:66,
    # GeoDegenerateLatitudeZone.java:52-54, GeoWorld)
    if ((abs(left_lon + PI) < eps and abs(right_lon - PI) < eps)
            or (abs(right_lon + PI) < eps and abs(left_lon - PI) < eps)):
        if abs(top_lat - PI * 0.5) < eps and abs(bottom_lat + PI * 0.5) < eps:
            return GeoShape3D(pm, _True(), "GeoWorld")
        if abs(top_lat - bottom_lat) < eps:
            if (abs(top_lat - PI * 0.5) < eps
                    or abs(top_lat + PI * 0.5) < eps):
                return GeoShape3D(
                    pm, _PointIdentical(GeoPoint3D.from_lat_lon(
                        pm, top_lat, 0.0)), "GeoDegeneratePoint")
            return GeoShape3D(pm, _ZNear(math.sin(top_lat)),
                              "GeoDegenerateLatitudeZone")
        if abs(top_lat - PI * 0.5) < eps:
            sin_bot = math.sin(bottom_lat)
            middle_lat = (PI * 0.5 + bottom_lat) * 0.5
            sin_mid = math.sin(middle_lat)
            interior = GeoPoint3D.from_trig(
                pm, sin_mid, 0.0, math.sqrt(1.0 - sin_mid * sin_mid), 1.0)
            return GeoShape3D(pm, _hplane(interior, sin_bot),
                              "GeoNorthLatitudeZone")
        if abs(bottom_lat + PI * 0.5) < eps:
            sin_top = math.sin(top_lat)
            middle_lat = (top_lat - PI * 0.5) * 0.5
            sin_mid = math.sin(middle_lat)
            interior = GeoPoint3D.from_trig(
                pm, sin_mid, 0.0, math.sqrt(1.0 - sin_mid * sin_mid), 1.0)
            return GeoShape3D(pm, _hplane(interior, sin_top),
                              "GeoSouthLatitudeZone")
        sin_top, sin_bot = math.sin(top_lat), math.sin(bottom_lat)
        middle_lat = (top_lat + bottom_lat) * 0.5
        sin_mid = math.sin(middle_lat)
        interior = GeoPoint3D.from_trig(
            pm, sin_mid, 0.0, math.sqrt(1.0 - sin_mid * sin_mid), 1.0)
        return GeoShape3D(
            pm, _And(_hplane(interior, sin_top), _hplane(interior, sin_bot)),
            "GeoLatitudeZone")

    extent = right_lon - left_lon
    if extent < 0.0:
        extent += PI * 2.0

    # Full latitude range → longitude slices (GeoLongitudeSlice.java:85-94,
    # GeoWideLongitudeSlice.java:93-96, GeoDegenerateLongitudeSlice.java:51-58)
    if top_lat == PI * 0.5 and bottom_lat == -PI * 0.5:
        if abs(left_lon - right_lon) < eps:
            sin_lon, cos_lon = math.sin(left_lon), math.cos(left_lon)
            interior = GeoPoint3D.from_trig(pm, 0.0, sin_lon, 1.0, cos_lon)
            return GeoShape3D(
                pm, _And(_PlaneIsZero(Plane.vertical(cos_lon, sin_lon)),
                         _PlaneWithin(SidedPlane.vertical(
                             interior, -sin_lon, cos_lon))),
                "GeoDegenerateLongitudeSlice")
        sin_left, cos_left = math.sin(left_lon), math.cos(left_lon)
        sin_right, cos_right = math.sin(right_lon), math.cos(right_lon)
        if extent >= PI:
            rl = right_lon
            while left_lon > rl:
                rl += PI * 2.0
            middle_lon = (left_lon + rl) * 0.5
            if middle_lon > PI:
                middle_lon -= PI * 2.0
            elif middle_lon < -PI:
                middle_lon += PI * 2.0
            center = GeoPoint3D.from_lat_lon(pm, 0.0, middle_lon)
            return GeoShape3D(
                pm, _Or(_vplane(center, cos_left, sin_left),
                        _vplane(center, cos_right, sin_right)),
                "GeoWideLongitudeSlice")
        rl = right_lon
        while left_lon > rl:
            rl += PI * 2.0
        middle_lon = (left_lon + rl) * 0.5
        sin_mid_lon, cos_mid_lon = math.sin(middle_lon), math.cos(middle_lon)
        center = GeoPoint3D.from_trig(pm, 0.0, sin_mid_lon, 1.0, cos_mid_lon)
        backing = SidedPlane.normal(center, cos_mid_lon, sin_mid_lon,
                                    0.0, 0.0)
        return GeoShape3D(
            pm, _And(_PlaneWithin(backing),
                     _vplane(center, cos_left, sin_left),
                     _vplane(center, cos_right, sin_right)),
            "GeoLongitudeSlice")

    # Degenerate vertical line (GeoDegenerateVerticalLine.java:101-113)
    if abs(left_lon - right_lon) < eps:
        if abs(top_lat - bottom_lat) < eps:
            return GeoShape3D(
                pm, _PointIdentical(GeoPoint3D.from_lat_lon(
                    pm, top_lat, left_lon)), "GeoDegeneratePoint")
        sin_top = math.sin(top_lat)
        sin_bot = math.sin(bottom_lat)
        sin_lon, cos_lon = math.sin(left_lon), math.cos(left_lon)
        middle_lat = (top_lat + bottom_lat) * 0.5
        sin_mid_lat, cos_mid_lat = math.sin(middle_lat), math.cos(middle_lat)
        center = GeoPoint3D.from_trig(pm, sin_mid_lat, sin_lon,
                                      cos_mid_lat, cos_lon)
        return GeoShape3D(
            pm, _And(_PlaneIsZero(Plane.vertical(cos_lon, sin_lon)),
                     _PlaneWithin(SidedPlane.vertical(
                         center, -sin_lon, cos_lon)),
                     _hplane(center, sin_top), _hplane(center, sin_bot)),
            "GeoDegenerateVerticalLine")

    if extent >= PI:
        # Wide family (GeoWideRectangle.java isWithin, GeoWideNorthRectangle,
        # GeoWideSouthRectangle, GeoWideDegenerateHorizontalLine)
        if abs(top_lat - bottom_lat) < eps:
            if abs(top_lat - PI * 0.5) < eps:
                return GeoShape3D(
                    pm, _PointIdentical(GeoPoint3D.from_lat_lon(
                        pm, top_lat, 0.0)), "GeoDegeneratePoint")
            if abs(bottom_lat + PI * 0.5) < eps:
                return GeoShape3D(
                    pm, _PointIdentical(GeoPoint3D.from_lat_lon(
                        pm, bottom_lat, 0.0)), "GeoDegeneratePoint")
            (sin_top, cos_top, sin_bot, cos_bot, sin_left, cos_left,
             sin_right, cos_right, sin_mid_lon, cos_mid_lon,
             center) = _rect_common(pm, top_lat, top_lat,
                                    left_lon, right_lon)
            return GeoShape3D(
                pm, _And(_PlaneIsZero(Plane.horizontal(pm, sin_top)),
                         _Or(_vplane(center, cos_left, sin_left),
                             _vplane(center, cos_right, sin_right))),
                "GeoWideDegenerateHorizontalLine")
        if abs(top_lat - PI * 0.5) < eps:
            (sin_top, cos_top, sin_bot, cos_bot, sin_left, cos_left,
             sin_right, cos_right, sin_mid_lon, cos_mid_lon,
             center) = _rect_common(pm, PI * 0.5, bottom_lat,
                                    left_lon, right_lon)
            return GeoShape3D(
                pm, _And(_hplane(center, sin_bot),
                         _Or(_vplane(center, cos_left, sin_left),
                             _vplane(center, cos_right, sin_right))),
                "GeoWideNorthRectangle")
        if abs(bottom_lat + PI * 0.5) < eps:
            (sin_top, cos_top, sin_bot, cos_bot, sin_left, cos_left,
             sin_right, cos_right, sin_mid_lon, cos_mid_lon,
             center) = _rect_common(pm, top_lat, -PI * 0.5,
                                    left_lon, right_lon)
            return GeoShape3D(
                pm, _And(_hplane(center, sin_top),
                         _Or(_vplane(center, cos_left, sin_left),
                             _vplane(center, cos_right, sin_right))),
                "GeoWideSouthRectangle")
        (sin_top, cos_top, sin_bot, cos_bot, sin_left, cos_left,
         sin_right, cos_right, sin_mid_lon, cos_mid_lon,
         center) = _rect_common(pm, top_lat, bottom_lat, left_lon, right_lon)
        return GeoShape3D(
            pm, _And(_hplane(center, sin_top), _hplane(center, sin_bot),
                     _Or(_vplane(center, cos_left, sin_left),
                         _vplane(center, cos_right, sin_right))),
            "GeoWideRectangle")

    if abs(top_lat - bottom_lat) < eps:
        if abs(top_lat - PI * 0.5) < eps:
            return GeoShape3D(
                pm, _PointIdentical(GeoPoint3D.from_lat_lon(pm, top_lat,
                                                            0.0)),
                "GeoDegeneratePoint")
        if abs(bottom_lat + PI * 0.5) < eps:
            return GeoShape3D(
                pm, _PointIdentical(GeoPoint3D.from_lat_lon(pm, bottom_lat,
                                                            0.0)),
                "GeoDegeneratePoint")
        # GeoDegenerateHorizontalLine.java:102-115
        (sin_top, cos_top, sin_bot, cos_bot, sin_left, cos_left,
         sin_right, cos_right, sin_mid_lon, cos_mid_lon,
         center) = _rect_common(pm, top_lat, top_lat, left_lon, right_lon)
        return GeoShape3D(
            pm, _And(_PlaneIsZero(Plane.horizontal(pm, sin_top)),
                     _vplane(center, cos_left, sin_left),
                     _vplane(center, cos_right, sin_right)),
            "GeoDegenerateHorizontalLine")
    if abs(top_lat - PI * 0.5) < eps:
        # GeoNorthRectangle.java:133-150
        (sin_top, cos_top, sin_bot, cos_bot, sin_left, cos_left,
         sin_right, cos_right, sin_mid_lon, cos_mid_lon,
         center) = _rect_common(pm, PI * 0.5, bottom_lat,
                                left_lon, right_lon)
        backing = SidedPlane.normal(center, cos_mid_lon, sin_mid_lon,
                                    0.0, 0.0)
        return GeoShape3D(
            pm, _And(_PlaneWithin(backing), _hplane(center, sin_bot),
                     _vplane(center, cos_left, sin_left),
                     _vplane(center, cos_right, sin_right)),
            "GeoNorthRectangle")
    if abs(bottom_lat + PI * 0.5) < eps:
        # GeoSouthRectangle.java:125-140
        (sin_top, cos_top, sin_bot, cos_bot, sin_left, cos_left,
         sin_right, cos_right, sin_mid_lon, cos_mid_lon,
         center) = _rect_common(pm, top_lat, -PI * 0.5,
                                left_lon, right_lon)
        backing = SidedPlane.normal(center, cos_mid_lon, sin_mid_lon,
                                    0.0, 0.0)
        return GeoShape3D(
            pm, _And(_PlaneWithin(backing), _hplane(center, sin_top),
                     _vplane(center, cos_left, sin_left),
                     _vplane(center, cos_right, sin_right)),
            "GeoSouthRectangle")
    # GeoRectangle.java:103-112
    (sin_top, cos_top, sin_bot, cos_bot, sin_left, cos_left,
     sin_right, cos_right, sin_mid_lon, cos_mid_lon,
     center) = _rect_common(pm, top_lat, bottom_lat, left_lon, right_lon)
    backing = SidedPlane.normal(center, cos_mid_lon, sin_mid_lon, 0.0, 0.0)
    return GeoShape3D(
        pm, _And(_PlaneWithin(backing),
                 _hplane(center, sin_top), _hplane(center, sin_bot),
                 _vplane(center, cos_left, sin_left),
                 _vplane(center, cos_right, sin_right)),
        "GeoRectangle")


def geo_bbox_from_degrees(pm: PlanetModel, min_lat: float, max_lat: float,
                          min_lon: float, max_lon: float) -> GeoShape3D:
    """Geo3DUtil.fromBox:173-189 (degrees → radians → factory, with
    the reference's checkLatitude/checkLongitude validation)."""
    _check_lat_deg(min_lat)
    _check_lat_deg(max_lat)
    _check_lon_deg(min_lon)
    _check_lon_deg(max_lon)
    return make_geo_bbox(pm, max_lat * RADIANS_PER_DEGREE,
                         min_lat * RADIANS_PER_DEGREE,
                         min_lon * RADIANS_PER_DEGREE,
                         max_lon * RADIANS_PER_DEGREE)


def _polygon_edges(pm: PlanetModel, points: Sequence[GeoPoint3D],
                   on_side: bool) -> List[SidedPlane]:
    """GeoConvexPolygon.done:215-275 / GeoConcavePolygon (same walk,
    opposite sidedness): edge i is the great-circle plane through
    points[i], points[i+1]; the sidedness check point is the next
    point NOT on that plane.  Includes the reference's brother-bounds
    validation ("polygon has a side that is more than 180 degrees" /
    "Constructed planes are all coplanar") — for the concave role the
    checks run against the REVERSED planes, as the reference checks
    invertedEdges."""
    n = len(points)
    if n < 3:
        raise ValueError("Polygon needs at least three points")
    edges: List[SidedPlane] = []
    for i in range(n):
        start, end = points[i], points[(i + 1) % n]
        plane = Plane.through_origin(start, end)
        check = None
        for j in range(n):
            cand = points[(j + i + 2) % n]
            if not plane.evaluate_is_zero(cand.x, cand.y, cand.z):
                check = cand
                break
        if check is None:
            raise ValueError("Polygon points are all coplanar")
        edges.append(SidedPlane.from_plane(plane, check, on_side))
    # GeoConvexPolygon.java:245-275 (convex) / GeoConcavePolygon's
    # mirrored loop over invertedEdges (concave)
    check_planes = edges if on_side else [e.reversed() for e in edges]
    for i in range(n):
        e = check_planes[i]
        b1 = (i + 1) % n
        while _planes_numerically_identical(check_planes[b1], e):
            if b1 == i:
                raise ValueError("Constructed planes are all coplanar")
            b1 = (b1 + 1) % n
        b2 = (i - 1) % n
        while _planes_numerically_identical(check_planes[b2], e):
            if b2 == i:
                raise ValueError("Constructed planes are all coplanar")
            b2 = (b2 - 1) % n
        k = b2
        while True:
            k = (k + 1) % n
            if k == b1:
                break
            p = points[k]
            if (not check_planes[b1].is_within(p.x, p.y, p.z)
                    or not check_planes[b2].is_within(p.x, p.y, p.z)):
                raise ValueError(
                    ("Convex" if on_side else "Concave")
                    + " polygon has a side that is more than 180 degrees")
    return edges


def _convex_from_points(pm: PlanetModel, pts: Sequence[GeoPoint3D],
                        holes: Sequence[GeoShape3D] = ()) -> GeoShape3D:
    kids: List[_Node] = [_PlaneWithin(e)
                         for e in _polygon_edges(pm, pts, True)]
    kids.extend(h.membership for h in holes)
    return GeoShape3D(pm, _And(*kids), "GeoConvexPolygon")


def _concave_from_points(pm: PlanetModel, pts: Sequence[GeoPoint3D],
                         holes: Sequence[GeoShape3D] = ()) -> GeoShape3D:
    local = _Or(*[_PlaneWithin(e)
                  for e in _polygon_edges(pm, pts, False)])
    if holes:
        return GeoShape3D(pm, _And(local, *[h.membership for h in holes]),
                          "GeoConcavePolygon")
    return GeoShape3D(pm, local, "GeoConcavePolygon")


def make_convex_polygon(pm: PlanetModel,
                        lat_lon_points: Sequence[Tuple[float, float]],
                        holes: Sequence[GeoShape3D] = ()) -> GeoShape3D:
    """GeoConvexPolygon.java:215-239,379-396: membership = inside every
    edge plane AND inside every hole (geo3d holes share the outer
    winding sense, so a 'hole' shape covers the hole's complement).
    Points in radians, no repeated last point."""
    return _convex_from_points(
        pm, [GeoPoint3D.from_lat_lon(pm, lat, lon)
             for lat, lon in lat_lon_points], holes)


def make_concave_polygon(pm: PlanetModel,
                         lat_lon_points: Sequence[Tuple[float, float]],
                         holes: Sequence[GeoShape3D] = ()) -> GeoShape3D:
    """GeoConcavePolygon.java (SidedPlane(check, onSide=false, ...);
    isWithin = inside ANY edge plane, then every hole)."""
    return _concave_from_points(
        pm, [GeoPoint3D.from_lat_lon(pm, lat, lon)
             for lat, lon in lat_lon_points], holes)


def make_composite(pm: PlanetModel,
                   shapes: Sequence[GeoShape3D]) -> GeoShape3D:
    """GeoBaseCompositeShape.isWithin:104-111 — union (any-of)."""
    return GeoShape3D(pm, _Or(*[s.membership for s in shapes]),
                      "GeoCompositeShape")


# ---------------------------------------------------------------------------
# GeoPolygonFactory — the makeGeoPolygon tiler (GeoPolygonFactory.java).
# Arbitrary simple polygons (clockwise-from-inside winding, like ESRI) are
# decomposed into one optional concave part plus convex parts.  All of this
# runs driver-side at shape-construction time; the resulting membership is
# the usual plane-predicate tree.
# ---------------------------------------------------------------------------

class _TileError(Exception):
    """GeoPolygonFactory.TileException — tiling failed; the reference
    falls back to GeoComplexPolygon (out of scope here)."""


class _JavaRandom:
    """java.util.Random's 48-bit LCG — pickPole consumes a Random(1234)
    stream, so pole selection must match the reference bit-for-bit."""

    def __init__(self, seed: int):
        self._seed = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

    def _next(self, bits: int) -> int:
        self._seed = (self._seed * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        return self._seed >> (48 - bits)

    def next_int(self, bound: int) -> int:
        if bound & -bound == bound:
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            if bits - val + (bound - 1) < (1 << 31):
                return val

    def next_double(self) -> float:
        return ((self._next(26) << 27) + self._next(27)) * (2.0 ** -53)


def _cross_evaluate_is_zero(a, b, p) -> bool:
    """Vector.crossProductEvaluateIsZero — Gram-Schmidt-refined normal
    of (a x b) dotted with p is 'zero'."""
    tx = a.y * b.z - a.z * b.y
    ty = a.z * b.x - a.x * b.z
    tz = a.x * b.y - a.y * b.x
    mag = math.sqrt(tx * tx + ty * ty + tz * tz)
    if mag == 0.0:
        return True
    inv = 1.0 / mag
    nx, ny, nz = tx * inv, ty * inv, tz * inv
    i = 0
    while True:
        dot_a = a.x * nx + a.y * ny + a.z * nz
        dot_b = b.x * nx + b.y * ny + b.z * nz
        if (abs(dot_a) < _GRAM_SCHMIDT_ENVELOPE
                and abs(dot_b) < _GRAM_SCHMIDT_ENVELOPE):
            break
        if abs(dot_a) > abs(dot_b):
            cx, cy, cz, dot = a.x, a.y, a.z, dot_a
        else:
            cx, cy, cz, dot = b.x, b.y, b.z, dot_b
        nx, ny, nz = nx - dot * cx, ny - dot * cy, nz - dot * cz
        mag = math.sqrt(nx * nx + ny * ny + nz * nz)
        inv = 1.0 / mag
        nx, ny, nz = nx * inv, ny * inv, nz * inv
        i += 1
        # Java: if (i++ > 10) throw — the 12th adjustment trips the
        # guard, i.e. old-i > 10 ⇔ new-i > 11
        if i > 11:
            raise ValueError("Plane could not be constructed")
    return abs(nx * p.x + ny * p.y + nz * p.z) < MINIMUM_RESOLUTION


def _are_points_coplanar(a, b, c) -> bool:
    # Plane.arePointsCoplanar
    return (_cross_evaluate_is_zero(a, b, c)
            or _cross_evaluate_is_zero(a, c, b)
            or _cross_evaluate_is_zero(b, c, a))


def _numerically_identical(a, b) -> bool:
    # Vector.isNumericallyIdentical(Vector)
    dx, dy, dz = a.x - b.x, a.y - b.y, a.z - b.z
    return dx * dx + dy * dy + dz * dz < MINIMUM_RESOLUTION ** 2


def _planes_numerically_identical(p: Plane, q: Plane) -> bool:
    # Plane.isNumericallyIdentical(Plane) — parallel + same offset
    c1 = p.B * q.C - p.C * q.B
    c2 = p.C * q.A - p.A * q.C
    c3 = p.A * q.B - p.B * q.A
    if c1 * c1 + c2 * c2 + c3 * c3 >= MINIMUM_RESOLUTION ** 2:
        return False
    denom = 1.0 / (q.A * q.A + q.B * q.B + q.C * q.C)
    return p.evaluate_is_zero(-q.A * q.D * denom, -q.B * q.D * denom,
                              -q.C * q.D * denom)


def _planes_functionally_identical(p: Plane, q: Plane) -> bool:
    # Plane.isFunctionallyIdentical — looser parallelism constraint
    c1 = p.B * q.C - p.C * q.B
    c2 = p.C * q.A - p.A * q.C
    c3 = p.A * q.B - p.B * q.A
    if c1 * c1 + c2 * c2 + c3 * c3 >= 5 * MINIMUM_RESOLUTION:
        return False
    denom = 1.0 / (q.A * q.A + q.B * q.B + q.C * q.C)
    return p.evaluate_is_zero(-q.A * q.D * denom, -q.B * q.D * denom,
                              -q.C * q.D * denom)


def _create_surface_point(pm: PlanetModel, x: float, y: float,
                          z: float) -> GeoPoint3D:
    # PlanetModel.createSurfacePoint
    t = math.sqrt(1.0 / (x * x * pm.inverse_xy_scaling_squared
                         + y * y * pm.inverse_xy_scaling_squared
                         + z * z * pm.inverse_z_scaling_squared))
    return GeoPoint3D(t * x, t * y, t * z)


def _factory_filter_points(
        inp: Sequence[GeoPoint3D]) -> Optional[List[GeoPoint3D]]:
    """GeoPolygonFactory.filterPoints:634-677 — drop consecutive
    numerically-identical points, walking the ring."""
    n = len(inp)

    def legal(i):
        while i < 0:
            i += n
        while i >= n:
            i -= n
        return i

    start_index = -1
    compare = inp[0]
    for i in range(n - 1):
        the_point = inp[legal(-i - 1)]
        if not _numerically_identical(the_point, compare):
            start_index = legal(-i)
            break
    if start_index == -1:
        return None
    out: List[GeoPoint3D] = []
    current_index = start_index
    while True:
        current = inp[current_index]
        out.append(current)
        while True:
            current_index = legal(current_index + 1)
            if current_index == start_index:
                break
            if not _numerically_identical(inp[current_index], current):
                break
        if current_index == start_index:
            break
    if len(out) < 3:
        return None
    return out


def _factory_filter_edges(points: List[GeoPoint3D], leniency: float
                          ) -> Optional[List[GeoPoint3D]]:
    """GeoPolygonFactory.filterEdges + findSafePath:687-768 — merge
    consecutive coplanar runs (leniency is accepted for API parity; the
    coplanarity test itself is the strict arePointsCoplanar, as in the
    reference's default-0 path)."""
    n = len(points)

    def legal(i):
        while i < 0:
            i += n
        while i >= n:
            i -= n
        return i

    for start_index in range(n):
        # findSafePath
        path: List[Tuple[GeoPoint3D, int]] = []
        failed = False
        i = start_index
        while i < start_index + n:
            start_point = points[legal(i - 1)]
            end_index = legal(i)
            end_point = points[end_index]
            if _numerically_identical(start_point, end_point):
                i += 1
                continue
            broke = False
            while True:
                next_index = legal(end_index + 1)
                next_point = points[next_index]
                if _numerically_identical(start_point, next_point):
                    failed = True
                    break
                if not _are_points_coplanar(start_point, end_point,
                                            next_point):
                    break
                if end_index == start_index:
                    failed = True
                    break
                end_index = next_index
                end_point = next_point
                i += 1
            if failed:
                break
            if path and end_index == start_index:
                broke = True
            if broke:
                break
            path.append((end_point, end_index))
            i += 1
        if failed or len(path) < 2:
            continue
        return [p for p, _ in path]
    return None


def _pick_pole(rng: _JavaRandom, pm: PlanetModel,
               points: List[GeoPoint3D]) -> GeoPoint3D:
    # GeoPolygonFactory.pickPole:778-831
    close = points[rng.next_int(len(points))]
    angle = rng.next_double() * math.pi * 2.0 - math.pi

    def arc(a, b):
        dot = a.x * b.x + a.y * b.y + a.z * b.z
        v = dot / (a.magnitude() * b.magnitude())
        return math.acos(max(-1.0, min(1.0, v)))

    max_arc = arc(points[0], points[1])
    trial = arc(points[0], points[2])
    if trial > max_arc:
        max_arc = trial
    arc_distance = max_arc - rng.next_double() * max_arc
    x = math.cos(arc_distance)
    sin_arc = math.sin(arc_distance)
    y = math.cos(angle) * sin_arc
    z = math.sin(angle) * sin_arc
    sin_lat = math.sin(close.latitude())
    cos_lat = math.cos(close.latitude())
    sin_lon = math.sin(close.longitude())
    cos_lon = math.cos(close.longitude())
    x1 = x * cos_lat - z * sin_lat
    y1 = y
    z1 = x * sin_lat + z * cos_lat
    x2 = x1 * cos_lon - y1 * sin_lon
    y2 = x1 * sin_lon + y1 * cos_lon
    z2 = z1
    return _create_surface_point(pm, x2, y2, z2)


def _compute_angle(point: GeoPoint3D, sin_lat: float, cos_lat: float,
                   sin_lon: float, cos_lon: float) -> Optional[float]:
    # GeoPolygonFactory.computeAngle:924-962
    x1 = point.x * cos_lon + point.y * sin_lon
    y1 = -point.x * sin_lon + point.y * cos_lon
    z1 = point.z
    y2 = y1
    z2 = -x1 * sin_lat + z1 * cos_lat
    if math.sqrt(y2 * y2 + z2 * z2) < MINIMUM_RESOLUTION:
        return None
    return math.atan2(z2, y2)


def _is_inside_polygon(point: GeoPoint3D,
                       poly_points: List[GeoPoint3D]) -> Optional[bool]:
    # GeoPolygonFactory.isInsidePolygon:842-912 (winding sum; True =
    # counter-clockwise = outside)
    lat, lon = point.latitude(), point.longitude()
    sin_lat, cos_lat = math.sin(lat), math.cos(lat)
    sin_lon, cos_lon = math.sin(lon), math.cos(lon)
    arc_distance = 0.0
    prev_angle: Optional[float] = None
    for poly_point in poly_points + [poly_points[0]]:
        angle = _compute_angle(poly_point, sin_lat, cos_lat, sin_lon,
                               cos_lon)
        if angle is None:
            return None
        if prev_angle is not None:
            delta = angle - prev_angle
            if delta < -math.pi:
                delta += math.pi * 2.0
            if delta > math.pi:
                delta -= math.pi * 2.0
            if abs(delta - math.pi) < MINIMUM_ANGULAR_RESOLUTION:
                return None
            arc_distance += delta
        prev_angle = angle
    if abs(arc_distance) < MINIMUM_ANGULAR_RESOLUTION:
        return None
    return arc_distance > 0.0


class _FEdge:
    __slots__ = ("start", "end", "plane", "internal")

    def __init__(self, start, end, plane, internal):
        self.start, self.end = start, end
        self.plane, self.internal = plane, internal


class _EdgeBuffer:
    """GeoPolygonFactory.EdgeBuffer:1804-1901 — ring of unconsumed
    edges with identity-keyed prev/next links."""

    def __init__(self, point_list, internal_edges, start_start, start_end,
                 start_plane):
        self.prev: dict = {}
        self.next: dict = {}
        self.edges: set = set()
        start_edge = _FEdge(point_list[start_start], point_list[start_end],
                            start_plane, internal_edges.get(start_start,
                                                            False))
        current = start_edge
        start_i, end_i = start_start, start_end
        n = len(point_list)
        while True:
            if current.end is start_edge.start:
                self.prev[id(start_edge)] = current
                self.next[id(current)] = start_edge
                self.edges.add(id(start_edge))
                break
            start_i = end_i
            end_i += 1
            if end_i >= n:
                end_i -= n
            new_point = point_list[end_i]
            is_within = current.plane.is_within(new_point.x, new_point.y,
                                                new_point.z)
            new_plane = SidedPlane.through_origin(
                current.start, point_list[start_i], new_point,
                on_side=is_within)
            new_edge = _FEdge(point_list[start_i], point_list[end_i],
                              new_plane, internal_edges.get(start_i, False))
            self.prev[id(new_edge)] = current
            self.next[id(current)] = new_edge
            self.edges.add(id(new_edge))
            current = new_edge
        self.one_edge = start_edge
        self.edges.add(id(start_edge))
        self._objs = {}  # keep edges alive keyed by id
        e = start_edge
        while True:
            self._objs[id(e)] = e
            e = self.next[id(e)]
            if e is start_edge:
                break

    def size(self):
        return len(self.edges)

    def pick_one(self):
        return self.one_edge

    def get_next(self, e):
        return self.next[id(e)]

    def get_previous(self, e):
        return self.prev[id(e)]

    def iterate(self):
        e = self.pick_one()
        if e is None:
            return
        first = e
        while True:
            yield e
            e = self.get_next(e)
            if e is first:
                break

    def replace(self, remove_list, new_edge):
        previous = self.prev[id(remove_list[0])]
        nxt = self.next[id(remove_list[-1])]
        self.edges.add(id(new_edge))
        self._objs[id(new_edge)] = new_edge
        self.prev[id(new_edge)] = previous
        self.next[id(previous)] = new_edge
        self.prev[id(nxt)] = new_edge
        self.next[id(new_edge)] = nxt
        for edge in remove_list:
            if edge is self.one_edge:
                self.one_edge = new_edge
            self.edges.discard(id(edge))
            self.prev.pop(id(edge), None)
            self.next.pop(id(edge), None)

    def clear(self):
        self.edges.clear()
        self.prev.clear()
        self.next.clear()
        self.one_edge = None


def _edge_set_within(point, edge_set) -> bool:
    # GeoPolygonFactory.isWithin(point, edgeSet):1693-1700
    return all(e.plane.is_within(point.x, point.y, point.z)
               for e in edge_set)


def _extended_within(point, edge_set, extension, return_boundary) -> bool:
    # GeoPolygonFactory.isWithin:1672-1684
    if not extension.plane.is_within(point.x, point.y, point.z):
        return False
    if return_boundary is not None and not return_boundary.is_within(
            point.x, point.y, point.z):
        return False
    return _edge_set_within(point, edge_set)


def _find_convex_polygon(pm, current_edge, parts, edge_buffer, holes,
                         test_point):
    """GeoPolygonFactory.findConvexPolygon:1384-1661.  Returns None on
    test-point violation (the Java null), else True/False."""
    included: List[_FEdge] = [current_edge]
    included_ids = {id(current_edge)}
    first_edge = current_edge
    last_edge = current_edge

    # walk forward
    while True:
        if first_edge.start is last_edge.end:
            break
        new_last = edge_buffer.get_next(last_edge)
        if _are_points_coplanar(last_edge.start, last_edge.end,
                                new_last.end):
            break
        if _planes_functionally_identical(last_edge.plane, new_last.plane):
            raise _TileError("Two adjacent edge planes are effectively "
                             "parallel despite filtering")
        if _edge_set_within(new_last.end, included):
            if first_edge.start is not new_last.end:
                if (_are_points_coplanar(first_edge.end, first_edge.start,
                                         new_last.end)
                        or _are_points_coplanar(first_edge.start,
                                                new_last.end,
                                                new_last.start)):
                    break
                return_boundary = SidedPlane.through_origin(
                    first_edge.end, first_edge.start, new_last.end)
            else:
                return_boundary = None
            found_point_inside = False
            for edge in edge_buffer.iterate():
                if id(edge) not in included_ids and edge is not new_last:
                    if edge.start is not new_last.end and _extended_within(
                            edge.start, included, new_last,
                            return_boundary):
                        found_point_inside = True
                        break
                    if edge.end is not first_edge.start and \
                            _extended_within(edge.end, included, new_last,
                                             return_boundary):
                        found_point_inside = True
                        break
            if not found_point_inside:
                included.append(new_last)
                included_ids.add(id(new_last))
                last_edge = new_last
                continue
        break

    # walk backward
    while True:
        if first_edge.start is last_edge.end:
            break
        new_first = edge_buffer.get_previous(first_edge)
        if _are_points_coplanar(new_first.start, new_first.end,
                                first_edge.end):
            break
        if _planes_functionally_identical(first_edge.plane,
                                          new_first.plane):
            raise _TileError("Two adjacent edge planes are effectively "
                             "parallel despite filtering")
        if _edge_set_within(new_first.start, included):
            if new_first.start is not last_edge.end:
                if (_are_points_coplanar(last_edge.start, last_edge.end,
                                         new_first.start)
                        or _are_points_coplanar(last_edge.end,
                                                new_first.start,
                                                new_first.end)):
                    break
                return_boundary = SidedPlane.through_origin(
                    last_edge.start, last_edge.end, new_first.start)
            else:
                return_boundary = None
            found_point_inside = False
            for edge in edge_buffer.iterate():
                if id(edge) not in included_ids and edge is not new_first:
                    if edge.start is not last_edge.end and \
                            _extended_within(edge.start, included,
                                             new_first, return_boundary):
                        found_point_inside = True
                        break
                    if (edge.end is not new_first.start
                            and _extended_within(edge.end, included,
                                                 new_first,
                                                 return_boundary)):
                        found_point_inside = True
                        break
            if not found_point_inside:
                included.append(new_first)
                included_ids.add(id(new_first))
                first_edge = new_first
                continue
        break

    if len(included) < 2:
        return False

    points: List[GeoPoint3D] = []
    if first_edge.start is last_edge.end:
        # degenerate cycle: consumes the whole buffer
        if len(included) < 3:
            return False
        if _planes_functionally_identical(first_edge.plane,
                                          last_edge.plane):
            raise _TileError("Two adjacent edge planes are effectively "
                             "parallel despite filtering")
        edge = first_edge
        points.append(edge.start)
        while True:
            if edge is last_edge:
                break
            points.append(edge.end)
            edge = edge_buffer.get_next(edge)
        edge_buffer.clear()
    else:
        return_sided = SidedPlane.through_origin(
            first_edge.end, first_edge.start, last_edge.end, on_side=False)
        return_edge = _FEdge(first_edge.start, last_edge.end, return_sided,
                             True)
        if (_planes_functionally_identical(return_edge.plane,
                                           last_edge.plane)
                or _planes_functionally_identical(return_edge.plane,
                                                  first_edge.plane)):
            raise _TileError("Two adjacent edge planes are effectively "
                             "parallel despite filtering")
        edges: List[_FEdge] = []
        edge = first_edge
        points.append(edge.start)
        while True:
            points.append(edge.end)
            edges.append(edge)
            if edge is last_edge:
                break
            edge = edge_buffer.get_next(edge)
        edge_buffer.replace(edges, return_edge)

    try:
        if test_point is not None and holes:
            test_poly = _convex_from_points(pm, points, ())
            if test_poly.is_within_point(test_point):
                return None
        real = _convex_from_points(pm, points, holes)
        if test_point is not None and not holes:
            if real.is_within_point(test_point):
                return None
        parts.append(real)
        return True
    except ValueError as e:
        raise _TileError(str(e))


def _make_concave_part(pm, parts, seen_concave, edge_buffer, holes,
                       test_point):
    # GeoPolygonFactory.makeConcavePolygon:1299-1369
    if edge_buffer.size() == 0:
        return True
    if seen_concave[0]:
        raise ValueError("Illegal polygon; polygon edges intersect each "
                         "other")
    seen_concave[0] = True
    if edge_buffer.size() < 3:
        raise ValueError("Illegal polygon; polygon edges intersect each "
                         "other")
    points: List[GeoPoint3D] = []
    edge = edge_buffer.pick_one()
    for _ in range(edge_buffer.size()):
        points.append(edge.start)
        edge = edge_buffer.get_next(edge)
    try:
        if test_point is not None and holes:
            test_poly = _concave_from_points(pm, points, ())
            if test_poly.is_within_point(test_point):
                return False
        real = _concave_from_points(pm, points, holes)
        if test_point is not None and not holes:
            if real.is_within_point(test_point):
                return False
        parts.append(real)
        return True
    except ValueError as e:
        raise _TileError(str(e))


def _build_polygon_shape(parts, seen_concave, pm, points_list,
                         internal_edges, start_point_index, end_point_index,
                         starting_edge, holes, test_point):
    """GeoPolygonFactory.buildPolygonShape:989-1285."""
    edge_buffer = _EdgeBuffer(points_list, internal_edges,
                              start_point_index, end_point_index,
                              starting_edge)
    stopping_point = edge_buffer.pick_one()
    current_edge = stopping_point
    while True:
        if current_edge is None:
            break
        found_it = _find_convex_polygon(pm, current_edge, parts,
                                        edge_buffer, holes, test_point)
        if found_it is None:
            return False
        if found_it:
            stopping_point = edge_buffer.pick_one()
            current_edge = stopping_point
            continue
        current_edge = edge_buffer.get_next(current_edge)
        if current_edge is stopping_point:
            break

    found_bad_edge = False
    for check_edge in list(edge_buffer.iterate()):
        flipped = check_edge.plane.reversed()
        for confirm_edge in edge_buffer.iterate():
            if confirm_edge is check_edge:
                continue
            the_point = None
            if (check_edge.start is not confirm_edge.start
                    and check_edge.end is not confirm_edge.start
                    and not flipped.is_within(confirm_edge.start.x,
                                              confirm_edge.start.y,
                                              confirm_edge.start.z)):
                the_point = confirm_edge.start
            elif (check_edge.start is not confirm_edge.end
                  and check_edge.end is not confirm_edge.end
                  and not flipped.is_within(confirm_edge.end.x,
                                            confirm_edge.end.y,
                                            confirm_edge.end.z)):
                the_point = confirm_edge.end
            if the_point is not None:
                found_bad_edge = True
                if _are_points_coplanar(check_edge.start, check_edge.end,
                                        the_point):
                    continue
                # triangle tile of (start, end, thePoint)
                third_points = [check_edge.start, check_edge.end,
                                the_point]
                try:
                    parts.append(_convex_from_points(pm, third_points,
                                                     holes))
                except ValueError as e:
                    raise _TileError(str(e))
                # part preceding the bad edge, back to thePoint
                loop_edge = edge_buffer.get_previous(check_edge)
                first_part: List[GeoPoint3D] = []
                while True:
                    first_part.append(loop_edge.end)
                    if loop_edge.end is the_point:
                        break
                    loop_edge = edge_buffer.get_previous(loop_edge)
                if not _build_polygon_shape(
                        parts, seen_concave, pm, first_part, {},
                        len(first_part) - 1, 0,
                        SidedPlane.through_origin(
                            check_edge.end, check_edge.start, the_point,
                            on_side=False),
                        holes, test_point):
                    return False
                second_part: List[GeoPoint3D] = []
                loop_edge = edge_buffer.get_next(check_edge)
                while True:
                    second_part.append(loop_edge.start)
                    if loop_edge.start is the_point:
                        break
                    loop_edge = edge_buffer.get_next(loop_edge)
                if not _build_polygon_shape(
                        parts, seen_concave, pm, second_part, {},
                        len(second_part) - 1, 0,
                        SidedPlane.through_origin(
                            check_edge.start, check_edge.end, the_point,
                            on_side=False),
                        holes, test_point):
                    return False
                return True
    if found_bad_edge:
        raise _TileError("Could not tile polygon; pathological "
                         "coplanarity")
    return _make_concave_part(pm, parts, seen_concave, edge_buffer, holes,
                              test_point)


def _generate_geo_polygon(pm, filtered, holes, test_point,
                          test_point_inside) -> GeoShape3D:
    """GeoPolygonFactory.generateGeoPolygon:543-626 — try one siding of
    the initial edge; use the test point to decide whether to keep the
    result or rebuild with the complement siding."""
    initial = SidedPlane.through_origin(test_point, filtered[0],
                                        filtered[1])

    def build(start_plane, tp):
        parts: List[GeoShape3D] = []
        seen = [False]
        ok = _build_polygon_shape(parts, seen, pm, filtered, {}, 0, 1,
                                  start_plane, holes, tp)
        return ok, parts

    def as_shape(parts):
        return GeoShape3D(pm, _Or(*[p.membership for p in parts]),
                          "GeoCompositePolygon")

    ok, parts = build(initial, test_point)
    if not ok:
        if test_point_inside:
            _, parts = build(initial, None)
            return as_shape(parts)
        _, parts = build(initial.reversed(), None)
        return as_shape(parts)
    if not test_point_inside:
        return as_shape(parts)
    _, parts = build(initial.reversed(), None)
    return as_shape(parts)


def make_geo_polygon(pm: PlanetModel,
                     lat_lon_points: Sequence[Tuple[float, float]],
                     holes: Sequence[GeoShape3D] = ()
                     ) -> Optional[GeoShape3D]:
    """GeoPolygonFactory.makeGeoPolygon:302-365 — the reference's
    standard polygon entry point (Geo3DPoint.newPolygonQuery →
    Geo3DUtil.fromPolygon): an arbitrary SIMPLE polygon whose winding
    determines the inside (clockwise-from-inside, like ESRI), tiled
    into convex parts plus at most one concave part.  Points in
    radians, no repeated last point; note the reference's conversion
    REVERSES the API point order before reaching the factory
    (Geo3DUtil.fromPolygon:218-222).  Degenerate input (fewer than 3
    distinct/non-coplanar points after filtering) returns ``None``,
    exactly like the reference — callers decide (fromPolygon skips
    None holes and maps a None outer ring to a match-nothing shape).

    The TileException fallback (pathological coplanarities) routes to
    GeoComplexPolygon in the reference, which is out of scope here —
    it raises NotImplementedError.  (The >100-edge shortcut belongs
    only to the PolygonDescription overload, :190 — this path tiles
    any size, like the reference's List<GeoPoint> overload.)"""
    pts = [GeoPoint3D.from_lat_lon(pm, lat, lon)
           for lat, lon in lat_lon_points]
    first_filtered = _factory_filter_points(pts)
    if first_filtered is None:
        return None
    filtered = _factory_filter_edges(first_filtered, 0.0)
    if filtered is None:
        return None
    holes = list(holes)
    try:
        center = _create_surface_point(
            pm, sum(p.x for p in filtered), sum(p.y for p in filtered),
            sum(p.z for p in filtered))
        is_center_inside = _is_inside_polygon(center, filtered)
        if is_center_inside is not None:
            return _generate_geo_polygon(pm, filtered, holes, center,
                                         is_center_inside)
        rng = _JavaRandom(1234)
        for _ in range(1000000):
            pole = _pick_pole(rng, pm, filtered)
            is_pole_inside = _is_inside_polygon(pole, filtered)
            if is_pole_inside is not None:
                return _generate_geo_polygon(pm, filtered, holes, pole,
                                             is_pole_inside)
        raise ValueError("cannot find a point that is inside the polygon")
    except _TileError as e:
        raise NotImplementedError(
            "polygon tiling failed (%s); the reference falls back to "
            "GeoComplexPolygon, which is out of scope" % e)


def geo_polygon_from_degrees(
        pm: PlanetModel,
        lat_lon_deg_points: Sequence[Tuple[float, float]],
        hole_point_lists: Sequence[Sequence[Tuple[float, float]]] = ()
) -> GeoShape3D:
    """Geo3DUtil.fromPolygon:197-227 (Geo3DPoint.newPolygonQuery):
    degree points, WITHOUT the repeated last point, are REVERSED and
    fed to GeoPolygonFactory.makeGeoPolygon; holes use the same
    winding sense as the outer ring and are built recursively.
    Like the reference (:79-84,204-207), degenerate holes are skipped
    and a degenerate outer ring yields an empty composite (matches
    nothing)."""
    holes = [h for h in (geo_polygon_from_degrees(pm, hp)
                         for hp in hole_point_lists)
             if h is not None and h.kind != "GeoCompositePolygon(empty)"]
    pts = [(la * RADIANS_PER_DEGREE, lo * RADIANS_PER_DEGREE)
           for la, lo in reversed(list(lat_lon_deg_points))]
    shape = make_geo_polygon(pm, pts, holes)
    if shape is None:
        return GeoShape3D(pm, _False(), "GeoCompositePolygon(empty)")
    return shape


class _PathSegment:
    """GeoStandardPath.java PathSegment: four sided planes bounding the
    buffered great-circle segment, corners via plane-plane-ellipsoid
    intersection."""

    def __init__(self, pm: PlanetModel, start: GeoPoint3D, end: GeoPoint3D,
                 ncp: Plane, cutoff_offset: float):
        self.start, self.end = start, end
        self.upper = SidedPlane.normal(start, ncp.A, ncp.B, ncp.C,
                                       -cutoff_offset)
        self.lower = SidedPlane.normal(start, ncp.A, ncp.B, ncp.C,
                                       cutoff_offset)
        self.start_cut = SidedPlane.through_origin(end, ncp, start)
        self.end_cut = SidedPlane.through_origin(start, ncp, end)

        def _one(pts: List[GeoPoint3D]) -> GeoPoint3D:
            if len(pts) == 0:
                raise ValueError("Some segment boundary points are off the "
                                 "ellipsoid; path too wide")
            if len(pts) > 1:
                raise ValueError("Ambiguous boundary points; path too short")
            return pts[0]

        self.ULHC = _one(self.upper.find_intersections(
            pm, self.start_cut, [self.lower], [self.end_cut]))
        self.URHC = _one(self.upper.find_intersections(
            pm, self.end_cut, [self.lower], [self.start_cut]))
        self.LLHC = _one(self.lower.find_intersections(
            pm, self.start_cut, [self.upper], [self.end_cut]))
        self.LRHC = _one(self.lower.find_intersections(
            pm, self.end_cut, [self.upper], [self.start_cut]))

    def node(self) -> _Node:
        return _And(_PlaneWithin(self.start_cut),
                    _PlaneWithin(self.end_cut),
                    _PlaneWithin(self.upper), _PlaneWithin(self.lower))


def make_geo_path(pm: PlanetModel,
                  lat_lon_points: Sequence[Tuple[float, float]],
                  cutoff_angle: float) -> GeoShape3D:
    """GeoPathFactory.makeGeoPath + GeoStandardPath.java:102-220 — a
    great-circle path buffered by ``cutoff_angle``: membership is the
    union of per-vertex endpoint caps (single- or dual-circle, cut off
    by the adjoining segments' reversed edge planes) and per-segment
    four-plane slabs.  Points in radians.

    The degenerate zero-width path (GeoDegeneratePath) is out of scope
    — on quantized point sets an exact line membership matches nothing
    meaningful; pass a positive width."""
    if cutoff_angle < MINIMUM_ANGULAR_RESOLUTION:
        raise NotImplementedError(
            "GeoDegeneratePath (zero-width path) is out of scope — see "
            "docstring; pass cutoff_angle >= MINIMUM_ANGULAR_RESOLUTION")
    if cutoff_angle <= 0.0 or cutoff_angle > math.pi * 0.5:
        raise ValueError("Cutoff angle out of bounds")
    sin_angle = math.sin(cutoff_angle)
    raw = [GeoPoint3D.from_lat_lon(pm, lat, lon)
           for lat, lon in lat_lon_points]
    if not raw:
        raise ValueError("Path must have at least one point")
    # GeoPathFactory.filterPoints: drop consecutive numerically-identical
    points: List[GeoPoint3D] = []
    for i in range(len(raw) - 1):
        dx = raw[i].x - raw[i + 1].x
        dy = raw[i].y - raw[i + 1].y
        dz = raw[i].z - raw[i + 1].z
        if dx * dx + dy * dy + dz * dz >= MINIMUM_RESOLUTION ** 2:
            points.append(raw[i])
    points.append(raw[-1])

    cutoff_offset = sin_angle * min(pm.xy_scaling, pm.z_scaling)
    segments: List[_PathSegment] = []
    last = None
    for end in points:
        if last is not None:
            ncp = Plane.through_origin(last, end)
            segments.append(_PathSegment(pm, last, end, ncp, cutoff_offset))
        last = end

    if not segments:
        # single point → plain circle cap (GeoStandardPath.java:128-166)
        p = points[0]
        lat = math.asin(p.z / p.magnitude())
        if abs(p.x) < MINIMUM_RESOLUTION and abs(p.y) < MINIMUM_RESOLUTION:
            lon = 0.0
        else:
            lon = math.atan2(p.y, p.x)
        upper_lat, upper_lon = lat + cutoff_angle, lon
        if upper_lat > math.pi * 0.5:
            upper_lon += math.pi
            if upper_lon > math.pi:
                upper_lon -= 2.0 * math.pi
            upper_lat = math.pi - upper_lat
        lower_lat, lower_lon = lat - cutoff_angle, lon
        if lower_lat < -math.pi * 0.5:
            lower_lon += math.pi
            if lower_lon > math.pi:
                lower_lon -= 2.0 * math.pi
            lower_lat = -math.pi - lower_lat
        upper = GeoPoint3D.from_lat_lon(pm, upper_lat, upper_lon)
        lower = GeoPoint3D.from_lat_lon(pm, lower_lat, lower_lon)
        normal_plane = Plane.normalized_z_plane(upper, lower, p)
        circle = SidedPlane.perpendicular(p, normal_plane, upper, lower)
        if circle is None:
            raise ValueError("Couldn't construct circle plane")
        return GeoShape3D(pm, _PlaneWithin(circle), "GeoStandardPath")

    nodes: List[_Node] = []

    def _cap(center: GeoPoint3D, normal_plane: Plane, top: GeoPoint3D,
             bottom: GeoPoint3D, cutoffs: List[SidedPlane]) -> _Node:
        circle = SidedPlane.perpendicular(center, normal_plane, top, bottom)
        if circle is None:
            raise ValueError("Couldn't construct endpoint circle plane")
        return _And(_PlaneWithin(circle),
                    *[_PlaneWithin(c) for c in cutoffs])

    # start endpoint (GeoStandardPath.java:173-184)
    s0 = segments[0]
    nodes.append(_cap(s0.start, s0.start_cut, s0.ULHC, s0.LLHC,
                      [s0.start_cut.reversed()]))
    # interior endpoints (:186-214)
    for i in range(1, len(segments)):
        prev, cur = segments[i - 1], segments[i]
        if (prev.end_cut.is_within(cur.ULHC.x, cur.ULHC.y, cur.ULHC.z)
                and prev.end_cut.is_within(cur.LLHC.x, cur.LLHC.y,
                                           cur.LLHC.z)
                and cur.start_cut.is_within(prev.URHC.x, prev.URHC.y,
                                            prev.URHC.z)
                and cur.start_cut.is_within(prev.LRHC.x, prev.LRHC.y,
                                            prev.LRHC.z)):
            # colinear: one circle, both cutoffs (:192-202)
            nodes.append(_cap(cur.start, prev.end_cut, cur.ULHC, cur.LLHC,
                              [prev.end_cut.reversed(),
                               cur.start_cut.reversed()]))
        else:
            # CutoffDualCircleSegmentEndpoint (:952-996)
            if not prev.end_cut.is_within(cur.ULHC.x, cur.ULHC.y,
                                          cur.ULHC.z):
                c1 = SidedPlane.three_point(cur.start, prev.URHC, prev.LRHC,
                                            cur.ULHC)
            elif not prev.end_cut.is_within(cur.LLHC.x, cur.LLHC.y,
                                            cur.LLHC.z):
                c1 = SidedPlane.three_point(cur.start, prev.URHC, prev.LRHC,
                                            cur.LLHC)
            else:
                raise ValueError("Dual-circle endpoint with colinear "
                                 "segments")
            if not cur.start_cut.is_within(prev.URHC.x, prev.URHC.y,
                                           prev.URHC.z):
                c2 = SidedPlane.three_point(cur.start, cur.ULHC, cur.LLHC,
                                            prev.URHC)
            elif not cur.start_cut.is_within(prev.LRHC.x, prev.LRHC.y,
                                             prev.LRHC.z):
                c2 = SidedPlane.three_point(cur.start, cur.ULHC, cur.LLHC,
                                            prev.LRHC)
            else:
                raise ValueError("Dual-circle endpoint with colinear "
                                 "segments")
            if c1 is None or c2 is None:
                raise ValueError("Couldn't construct dual endpoint circles")
            nodes.append(_And(_PlaneWithin(prev.end_cut.reversed()),
                              _PlaneWithin(cur.start_cut.reversed()),
                              _Or(_PlaneWithin(c1), _PlaneWithin(c2))))
    # final endpoint (:215-219)
    sl = segments[-1]
    nodes.append(_cap(sl.end, sl.end_cut, sl.URHC, sl.LRHC,
                      [sl.end_cut.reversed()]))
    nodes.extend(s.node() for s in segments)
    return GeoShape3D(pm, _Or(*nodes), "GeoStandardPath")


def geo_path_from_meters(pm: PlanetModel,
                         lat_lon_deg_points: Sequence[Tuple[float, float]],
                         path_width_meters: float) -> GeoShape3D:
    """Geo3DUtil.fromPath:123-141 — width is divided by
    meanRadius * xyScaling (unlike circles, which use meanRadius);
    checkLatitude/checkLongitude per point like the reference."""
    for la, lo in lat_lon_deg_points:
        _check_lat_deg(la)
        _check_lon_deg(lo)
    radius = path_width_meters / (pm.mean_radius * pm.xy_scaling)
    return make_geo_path(
        pm, [(la * RADIANS_PER_DEGREE, lo * RADIANS_PER_DEGREE)
             for la, lo in lat_lon_deg_points], radius)


# ---------------------------------------------------------------------------
# DataFrame API
# ---------------------------------------------------------------------------

def _xyz_exprs(pm: PlanetModel, lat: Column, lon: Column,
               quantize: bool) -> Tuple[Column, Column, Column]:
    lat_r = lat * F.lit(RADIANS_PER_DEGREE)
    lon_r = lon * F.lit(RADIANS_PER_DEGREE)
    sin_lat, cos_lat = F.sin(lat_r), F.cos(lat_r)
    sin_lon, cos_lon = F.sin(lon_r), F.cos(lon_r)
    ux = cos_lat * cos_lon
    uy = cos_lat * sin_lon
    uz = sin_lat
    inv_xy2 = F.lit(pm.inverse_xy_scaling_squared)
    inv_z2 = F.lit(pm.inverse_z_scaling_squared)
    mag = F.lit(1.0) / F.sqrt(ux * ux * inv_xy2 + uy * uy * inv_xy2
                              + uz * uz * inv_z2)
    out = []
    for u in (ux, uy, uz):
        v = u * mag
        if quantize:
            # encodeValue: the only input reaching the == MAX_VALUE branch
            # is exactly MAX_VALUE (surface magnitudes never exceed it and
            # nothing lands in (nextDown(MAX), MAX)), and there
            # floor(MAX/DECODE) >= MAX_ENCODED_VALUE — so the branch
            # collapses to a least() with a single reference to v, keeping
            # the codegen'd expression tree half the size.
            enc = F.least(F.floor(v / F.lit(pm.DECODE)),
                          F.lit(pm.MAX_ENCODED_VALUE))
            v = (F.when(enc == F.lit(pm.MIN_ENCODED_VALUE),
                        F.lit(-pm.MAX_VALUE))
                 .when(enc == F.lit(pm.MAX_ENCODED_VALUE),
                       F.lit(pm.MAX_VALUE))
                 .otherwise((enc.cast("double") + F.lit(0.5))
                            * F.lit(pm.DECODE)))
        out.append(v)
    return out[0], out[1], out[2]


def with_geo3d_xyz(df: DataFrame, pm: PlanetModel = WGS84,
                   lat_col: str = "lat", lon_col: str = "lon",
                   quantize: bool = True,
                   prefix: str = "g3d_") -> DataFrame:
    """Adds ``g3d_x/y/z`` columns: the planet-surface coordinates the
    reference indexes (``Geo3DPoint.java:104,227``), after the int
    encode/decode quantization its queries actually test
    (``quantize=True``, the default).  Pure Catalyst — at write time
    these become parquet columns whose row-group stats prune shape
    queries like BKD inner nodes."""
    x, y, z = _xyz_exprs(pm, F.col(lat_col), F.col(lon_col), quantize)
    return df.withColumn(prefix + "x", x).withColumn(prefix + "y", y) \
             .withColumn(prefix + "z", z)


def geo3d_xyz_sql_ctes(source: str, pm: PlanetModel = WGS84,
                       lat: str = "lat", lon: str = "lon",
                       quantize: bool = True) -> str:
    """The same xyz + quantization computation as ANSI SQL, for DuckDB
    oracle twins: returns two chained CTE bodies
    ``g3d_trig AS (...), g3d_xyz AS (...)`` where ``g3d_xyz`` carries
    every ``source`` column plus g3d_x, g3d_y, g3d_z."""
    trig = ("g3d_trig AS (SELECT *, "
            "sin({lat} * {rad!r}) AS s_lat, cos({lat} * {rad!r}) AS c_lat, "
            "sin({lon} * {rad!r}) AS s_lon, cos({lon} * {rad!r}) AS c_lon "
            "FROM {src})"
            .format(lat=lat, lon=lon, rad=RADIANS_PER_DEGREE, src=source))
    mag = ("(1.0 / sqrt(((c_lat * c_lon) * (c_lat * c_lon)) * {ixy!r} + "
           "((c_lat * s_lon) * (c_lat * s_lon)) * {ixy!r} + "
           "(s_lat * s_lat) * {iz!r}))"
           .format(ixy=pm.inverse_xy_scaling_squared,
                   iz=pm.inverse_z_scaling_squared))
    parts = []
    for name, unit in (("x", "(c_lat * c_lon)"), ("y", "(c_lat * s_lon)"),
                       ("z", "s_lat")):
        v = "({u} * {m})".format(u=unit, m=mag)
        if quantize:
            # same least() collapse of encodeValue's == MAX branch as the
            # Catalyst emission (see _xyz_exprs)
            enc = ("CAST(least(floor({v} / {dec!r}), {me}) AS BIGINT)"
                   .format(v=v, me=pm.MAX_ENCODED_VALUE, dec=pm.DECODE))
            v = ("(CASE WHEN {e} = {mine} THEN {negmax!r} "
                 "WHEN {e} = {maxe} THEN {mx!r} "
                 "ELSE (CAST({e} AS DOUBLE) + 0.5) * {dec!r} END)"
                 .format(e=enc, mine=pm.MIN_ENCODED_VALUE,
                         maxe=pm.MAX_ENCODED_VALUE, negmax=-pm.MAX_VALUE,
                         mx=pm.MAX_VALUE, dec=pm.DECODE))
        parts.append("{v} AS g3d_{n}".format(v=v, n=name))
    return (trig + ",\ng3d_xyz AS (SELECT *, " + ", ".join(parts)
            + " FROM g3d_trig)")


def _dv_roundtrip_col(v: Column, vmin: float, factor: float,
                      inverse_factor: float) -> Column:
    """decode(encode(v)) on the DocValueEncoder 21-bit grid, as a
    Catalyst expression."""
    enc = F.floor((v - F.lit(vmin)) * F.lit(factor) + F.lit(0.5))
    return enc.cast("double") * F.lit(inverse_factor) + F.lit(vmin)


def _dv_roundtrip_sql(v: str, vmin: float, factor: float,
                      inverse_factor: float) -> str:
    return ("(floor(({v} - {mn!r}) * {f!r} + 0.5) * {inv!r} + {mn!r})"
            .format(v=v, mn=vmin, f=factor, inv=inverse_factor))


def with_geo3d_docvalue(df: DataFrame, pm: PlanetModel = WGS84,
                        lat_col: str = "lat", lon_col: str = "lon",
                        out_col: str = "g3d_dv") -> DataFrame:
    """Geo3DDocValuesField role: the packed 63-bit docvalue long of
    each row's (unquantized) surface point — the value the reference
    stores for sort/updatable-filter use.  Pure Catalyst."""
    x, y, z = _xyz_exprs(pm, F.col(lat_col), F.col(lon_col),
                         quantize=False)
    tmp = df.select(
        "*", F.explode(F.array(F.struct(
            x.alias("x"), y.alias("y"), z.alias("z")))).alias("_g3dp"))
    dv = pm.doc_value_encoder.encode_col(
        F.col("_g3dp.x"), F.col("_g3dp.y"), F.col("_g3dp.z"))
    return tmp.withColumn(out_col, dv).drop("_g3dp")


def geo3d_shape_query(df: DataFrame, shape: GeoShape3D,
                      lat_col: str = "lat", lon_col: str = "lon",
                      quantize: bool = True,
                      prefix: str = "g3d_",
                      prefilter_box: Optional[Tuple[float, float, float,
                                                    float]] = None
                      ) -> DataFrame:
    """Geo3DPoint.newShapeQuery role: rows whose quantized surface
    point is within the shape.

    If the frame already carries materialized ``g3d_x/y/z`` columns
    (the reference's own architecture — Geo3DPoint encodes at INDEX
    time, so at scale you add them once at write time via
    ``with_geo3d_xyz``), the filter is a tiny whole-stage-codegen'd
    predicate over those columns.

    Plane predicates are compound expressions, so they are NOT pushed
    to the parquet reader as data filters — the BKD-inner-node
    pruning role is played by ``prefilter_box``: a conservative
    ``(min_lat, max_lat, min_lon, max_lon)`` degree box around the
    shape, applied as SIMPLE comparisons on the lat/lon columns ahead
    of the exact membership predicate.  Those comparisons DO push down
    (``PushedFilters`` on the scan) and engage row-group min/max
    pruning on a lat- or lon-sorted layout — the standard
    two-phase shape the reference itself uses for LatLonPoint
    (box prefilter + exact residual, ``operators/geo.py``).

    Otherwise the placement is computed inline BEHIND A GENERATOR
    BARRIER: a bare projection would be re-inlined by predicate
    pushdown, duplicating the ~40-node trig tree into every plane test
    (a 96-plane exact circle overflows codegen, and the plan string
    alone can exhaust driver heap).  ``explode`` of a one-element
    struct array is a deterministic no-op per row that Catalyst cannot
    push a filter through, so the placement is computed exactly once
    and the whole chain (Project → Generate → Filter) stays inside one
    whole-stage-codegen span."""
    if prefilter_box is not None:
        min_lat, max_lat, min_lon, max_lon = prefilter_box
        cond = ((F.col(lat_col) >= F.lit(min_lat))
                & (F.col(lat_col) <= F.lit(max_lat)))
        if min_lon <= max_lon:
            cond &= ((F.col(lon_col) >= F.lit(min_lon))
                     & (F.col(lon_col) <= F.lit(max_lon)))
        else:   # dateline crossing
            cond &= ((F.col(lon_col) >= F.lit(min_lon))
                     | (F.col(lon_col) <= F.lit(max_lon)))
        df = df.filter(cond)
    cols = set(df.columns)
    if {prefix + "x", prefix + "y", prefix + "z"} <= cols:
        return df.filter(shape.predicate(
            F.col(prefix + "x"), F.col(prefix + "y"), F.col(prefix + "z")))
    x, y, z = _xyz_exprs(shape.planet_model, F.col(lat_col),
                         F.col(lon_col), quantize)
    pt = prefix + "pt"
    tmp = df.select(
        "*", F.explode(F.array(F.struct(
            x.alias("x"), y.alias("y"), z.alias("z")))).alias(pt))
    return tmp.filter(shape.predicate(
        F.col(pt + ".x"), F.col(pt + ".y"), F.col(pt + ".z"))).drop(pt)


def geo3d_distance_query(df: DataFrame, lat_deg: float, lon_deg: float,
                         radius_meters: float, pm: PlanetModel = WGS84,
                         lat_col: str = "lat",
                         lon_col: str = "lon") -> DataFrame:
    """Geo3DPoint.newDistanceQuery role (Geo3DUtil.fromDistance)."""
    return geo3d_shape_query(
        df, geo_circle_from_meters(pm, lat_deg, lon_deg, radius_meters),
        lat_col=lat_col, lon_col=lon_col)


def geo3d_nearest(df: DataFrame, lat_deg: float, lon_deg: float, k: int,
                  pm: PlanetModel = WGS84, lat_col: str = "lat",
                  lon_col: str = "lon",
                  tiebreak: Optional[Sequence[str]] = None) -> DataFrame:
    """Geo3DPointSortField role with DistanceStyle.ARC
    (``Geo3DPointDistanceComparator.java:114-177``: the comparator
    decodes the 21-bit-per-axis DOCVALUE point — not the 32-bit BKD
    quantization — then ``GeoPoint.arcDistance``:
    safeAcos(dot / (|center|·|point|))): adds ``arc_rad`` and returns
    the k nearest rows.  Catalyst sort + limit = per-partition top-k
    below the exchange (TakeOrderedAndProject), k·P rows to the merge."""
    center = GeoPoint3D.from_lat_lon(pm, lat_deg * RADIANS_PER_DEGREE,
                                     lon_deg * RADIANS_PER_DEGREE)
    cmag = center.magnitude()
    xe, ye, ze = _xyz_exprs(pm, F.col(lat_col), F.col(lon_col),
                            quantize=False)
    # the sort sees decode(encode(·)) on the DocValueEncoder grid
    enc = pm.doc_value_encoder
    xe = _dv_roundtrip_col(xe, enc.min_x, enc.x_factor,
                           enc.inverse_x_factor)
    ye = _dv_roundtrip_col(ye, enc.min_y, enc.y_factor,
                           enc.inverse_y_factor)
    ze = _dv_roundtrip_col(ze, enc.min_z, enc.z_factor,
                           enc.inverse_z_factor)
    # same generator barrier as geo3d_shape_query: placement computed
    # once, the arc expression references plain struct fields
    tmp = df.select(
        "*", F.explode(F.array(F.struct(
            xe.alias("x"), ye.alias("y"), ze.alias("z")))).alias("_g3d"))
    x, y, z = F.col("_g3d.x"), F.col("_g3d.y"), F.col("_g3d.z")
    dot = F.lit(center.x) * x + F.lit(center.y) * y + F.lit(center.z) * z
    pmag = F.sqrt(x * x + y * y + z * z)
    cosv = dot / (F.lit(cmag) * pmag)
    # Tools.safeAcos: clamp to [-1, 1]
    arc = F.acos(F.least(F.greatest(cosv, F.lit(-1.0)), F.lit(1.0)))
    ties = list(tiebreak) if tiebreak is not None else [lat_col, lon_col]
    return (tmp.withColumn("arc_rad", arc).drop("_g3d")
            .orderBy(F.col("arc_rad").asc(),
                     *[F.col(c).asc() for c in ties])
            .limit(k))
