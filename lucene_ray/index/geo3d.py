"""Geo3D: spherical (unit-sphere) geometry shapes and membership tests.

Reference: lucene/spatial3d/src/java/org/apache/lucene/spatial3d/geom/ —
``GeoPoint`` (unit-vector model of a lat/lon), ``GeoStandardCircle``
(cap: within iff the angular distance to the center is <= the cutoff),
``GeoConvexPolygon`` (within iff on the inner side of every edge's great
circle — ``SidedPlane.isWithin``), ``GeoStandardPath`` (within iff
within ``width`` angular distance of the path's centerline arcs or
endpoint caps).  PlanetModel: SPHERE (the WGS84 ellipsoid scaling of
``PlanetModel.java`` is a documented deviation).

Engine shape: everything reduces to dot products of unit vectors with
precomputed plane normals / cap centers, so membership is a handful of
vectorized numpy expressions per shape, and the SAME expressions (same
operation order, same double constants via ``repr``) are emitted as SQL
for the oracle (``sql_expr``).  asin/acos never appear — comparisons use
precomputed cos/sin thresholds, the same discipline as the haversine
sort-key arm (pipelines/fulltext.py GEO_DISTANCE notes).

Index integration (documented deviation from the reference's 3-D BKD
``Geo3DPoint``): candidate pruning uses the existing 2-dim lat/lon point
tree with each shape's CONSERVATIVE lat/lon bounds (floor/ceil outward),
then the exact spherical test runs on the candidates — tree prunes, leaf
verifies, so results are independent of the pruning bounds.
"""

from __future__ import annotations

import math

import numpy as np

TO_RAD = float(np.pi / 180.0)


def latlon_to_xyz(lat_deg, lon_deg):
    """Unit-sphere (x, y, z) from degree arrays — the GeoPoint model:
    x = cos(lat)cos(lon), y = cos(lat)sin(lon), z = sin(lat)."""
    lat = lat_deg * TO_RAD
    lon = lon_deg * TO_RAD
    clat = np.cos(lat)
    return clat * np.cos(lon), clat * np.sin(lon), np.sin(lat)


def _xyz_scalar(lat_deg: float, lon_deg: float) -> tuple[float, float, float]:
    lat = lat_deg * TO_RAD
    lon = lon_deg * TO_RAD
    clat = math.cos(lat)
    return clat * math.cos(lon), clat * math.sin(lon), math.sin(lat)


def _dot_sql(n: tuple[float, float, float]) -> str:
    """SQL for dot((x,y,z), n) over per-doc columns x/y/z — the literal
    doubles via repr so engine and oracle share constants exactly."""
    return f"(x * {n[0]!r} + y * {n[1]!r} + z * {n[2]!r})"


class Geo3DCircle:
    """GeoStandardCircle: within iff dot(p, center) >= cos(radius)."""

    def __init__(self, lat: float, lon: float, radius_rad: float):
        self.lat, self.lon, self.radius = float(lat), float(lon), float(radius_rad)
        self.center = _xyz_scalar(lat, lon)
        self.cos_r = math.cos(self.radius)

    def is_within(self, x, y, z):
        c = self.center
        return x * c[0] + y * c[1] + z * c[2] >= self.cos_r

    def sql_expr(self) -> str:
        return f"{_dot_sql(self.center)} >= {self.cos_r!r}"

    def latlon_bounds(self):
        rdeg = self.radius / TO_RAD
        lat0, lat1 = self.lat - rdeg, self.lat + rdeg
        if lat0 <= -90.0 or lat1 >= 90.0:
            return (max(lat0, -90.0), min(lat1, 90.0), -180.0, 180.0, False)
        # widest longitude extent of a cap not containing a pole
        coslat = min(math.cos(self.lat * TO_RAD), math.cos(lat0 * TO_RAD),
                     math.cos(lat1 * TO_RAD))
        dlon = rdeg / max(coslat, 1e-12) + 1e-9
        lon0, lon1 = self.lon - dlon, self.lon + dlon
        if dlon >= 180.0:
            return (lat0, lat1, -180.0, 180.0, False)
        wrap = lon0 < -180.0 or lon1 > 180.0
        if wrap:
            lon0 = (lon0 + 540.0) % 360.0 - 180.0
            lon1 = (lon1 + 540.0) % 360.0 - 180.0
        return (lat0, lat1, lon0, lon1, wrap)


class Geo3DConvexPolygon:
    """GeoConvexPolygon: within iff on the inner side of every edge plane
    (normal = cross(v_i, v_{i+1}); orientation fixed at construction so
    the vertex centroid tests inside)."""

    def __init__(self, vertices: list[tuple[float, float]]):
        self.vertices = [(float(a), float(b)) for a, b in vertices]
        vs = [_xyz_scalar(a, b) for a, b in self.vertices]
        cx = sum(v[0] for v in vs)
        cy = sum(v[1] for v in vs)
        cz = sum(v[2] for v in vs)
        normals = []
        for i in range(len(vs)):
            a, b = vs[i], vs[(i + 1) % len(vs)]
            n = (
                a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0],
            )
            if n[0] * cx + n[1] * cy + n[2] * cz < 0:
                n = (-n[0], -n[1], -n[2])
            normals.append(n)
        self.normals = normals

    def is_within(self, x, y, z):
        m = None
        for n in self.normals:
            side = x * n[0] + y * n[1] + z * n[2] >= 0.0
            m = side if m is None else (m & side)
        return m

    def sql_expr(self) -> str:
        return "(" + " AND ".join(f"{_dot_sql(n)} >= 0.0" for n in self.normals) + ")"

    def latlon_bounds(self):
        lats = [a for a, _ in self.vertices]
        lons = [b for _, b in self.vertices]
        # great-circle edges bulge poleward of the chord by at most the
        # edge sagitta; a generous fixed margin keeps the bound superset
        # (exact verify makes over-coverage harmless)
        margin = 10.0
        lat0 = max(-90.0, min(lats) - margin)
        lat1 = min(90.0, max(lats) + margin)
        lon0 = min(lons) - margin
        lon1 = max(lons) + margin
        if lon1 - lon0 >= 360.0 - 2 * margin:
            return (lat0, lat1, -180.0, 180.0, False)
        wrap = lon0 < -180.0 or lon1 > 180.0
        if wrap:
            lon0 = (lon0 + 540.0) % 360.0 - 180.0
            lon1 = (lon1 + 540.0) % 360.0 - 180.0
        return (lat0, lat1, lon0, lon1, wrap)


class Geo3DPath:
    """GeoStandardPath: within iff within ``width`` angular distance of a
    centerline arc (|dot(p, segment unit normal)| <= sin(width), between
    the segment's endpoint planes) or of an endpoint (dot(p, e) >=
    cos(width))."""

    def __init__(self, points: list[tuple[float, float]], width_rad: float):
        self.points = [(float(a), float(b)) for a, b in points]
        self.width = float(width_rad)
        self.sin_w = math.sin(self.width)
        self.cos_w = math.cos(self.width)
        vs = [_xyz_scalar(a, b) for a, b in self.points]
        self.endpoints = vs
        self.segments = []  # (unit_normal, perp_a, perp_b)
        for a, b in zip(vs, vs[1:]):
            n = (
                a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0],
            )
            ln = math.sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2])
            n = (n[0] / ln, n[1] / ln, n[2] / ln)
            # "between" half-spaces: perp_a = n x a points from a toward b
            pa = (
                n[1] * a[2] - n[2] * a[1],
                n[2] * a[0] - n[0] * a[2],
                n[0] * a[1] - n[1] * a[0],
            )
            pb = (
                b[1] * n[2] - b[2] * n[1],
                b[2] * n[0] - b[0] * n[2],
                b[0] * n[1] - b[1] * n[0],
            )
            self.segments.append((n, pa, pb))

    def is_within(self, x, y, z):
        m = None
        for n, pa, pb in self.segments:
            d = x * n[0] + y * n[1] + z * n[2]
            hit = (
                (np.abs(d) <= self.sin_w)
                & (x * pa[0] + y * pa[1] + z * pa[2] >= 0.0)
                & (x * pb[0] + y * pb[1] + z * pb[2] >= 0.0)
            )
            m = hit if m is None else (m | hit)
        for e in self.endpoints:
            hit = x * e[0] + y * e[1] + z * e[2] >= self.cos_w
            m = hit if m is None else (m | hit)
        return m

    def sql_expr(self) -> str:
        parts = []
        for n, pa, pb in self.segments:
            parts.append(
                f"(abs({_dot_sql(n)}) <= {self.sin_w!r}"
                f" AND {_dot_sql(pa)} >= 0.0 AND {_dot_sql(pb)} >= 0.0)"
            )
        for e in self.endpoints:
            parts.append(f"({_dot_sql(e)} >= {self.cos_w!r})")
        return "(" + " OR ".join(parts) + ")"

    def latlon_bounds(self):
        wdeg = self.width / TO_RAD
        lats = [a for a, _ in self.points]
        lons = [b for _, b in self.points]
        margin = wdeg + 10.0
        lat0 = max(-90.0, min(lats) - margin)
        lat1 = min(90.0, max(lats) + margin)
        lon0, lon1 = min(lons) - margin, max(lons) + margin
        if lon1 - lon0 >= 360.0 - 2 * margin:
            return (lat0, lat1, -180.0, 180.0, False)
        wrap = lon0 < -180.0 or lon1 > 180.0
        if wrap:
            lon0 = (lon0 + 540.0) % 360.0 - 180.0
            lon1 = (lon1 + 540.0) % 360.0 - 180.0
        return (lat0, lat1, lon0, lon1, wrap)
