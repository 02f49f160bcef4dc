"""Geo3D unit-sphere shapes (reference spatial3d/geom GeoStandardCircle /
GeoConvexPolygon / GeoStandardPath): membership differentials against
independent spherical trigonometry, bounds-superset invariants, and the
tree-pruned pipeline parity."""

import math

import numpy as np

from lucene_ray.index.geo3d import (
    Geo3DCircle,
    Geo3DConvexPolygon,
    Geo3DPath,
    latlon_to_xyz,
)


def _cloud(n=20000, seed=3):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-89, 89, n)
    lon = rng.uniform(-180, 180, n)
    return lat, lon, latlon_to_xyz(lat, lon)


def _in_bounds(lat, lon, b):
    lat0, lat1, lon0, lon1, wrap = b
    latm = (lat >= lat0) & (lat <= lat1)
    lonm = ((lon >= lon0) | (lon <= lon1)) if wrap else ((lon >= lon0) & (lon <= lon1))
    return latm & lonm


def test_circle_matches_angular_distance():
    lat, lon, (x, y, z) = _cloud()
    c = Geo3DCircle(20, 30, 0.5)
    got = c.is_within(x, y, z)
    ang = np.arccos(
        np.clip(
            np.sin(np.radians(20)) * np.sin(np.radians(lat))
            + np.cos(np.radians(20))
            * np.cos(np.radians(lat))
            * np.cos(np.radians(lon - 30)),
            -1,
            1,
        )
    )
    assert (got == (ang <= 0.5)).all()
    assert not (got & ~_in_bounds(lat, lon, c.latlon_bounds())).any()


def test_polar_cap_bounds_cover_all_longitudes():
    lat, lon, (x, y, z) = _cloud()
    c = Geo3DCircle(-89.0, 0.0, 0.4)
    b = c.latlon_bounds()
    assert b[2] == -180.0 and b[3] == 180.0
    assert not (c.is_within(x, y, z) & ~_in_bounds(lat, lon, b)).any()


def test_polygon_membership_and_bounds():
    lat, lon, (x, y, z) = _cloud()
    p = Geo3DConvexPolygon([(0, 0), (40, 10), (10, 50)])
    cx, cy, cz = latlon_to_xyz(np.array([15.0]), np.array([20.0]))
    assert bool(p.is_within(cx, cy, cz)[0])
    ax, ay, az = latlon_to_xyz(np.array([-15.0]), np.array([-160.0]))
    assert not bool(p.is_within(ax, ay, az)[0])
    m = p.is_within(x, y, z)
    assert 0.005 < m.mean() < 0.05
    assert not (m & ~_in_bounds(lat, lon, p.latlon_bounds())).any()


def test_path_membership_vs_brute_arc_distance():
    lat, lon, (x, y, z) = _cloud()
    pt = Geo3DPath([(-30, -170), (0, -140), (25, -100)], 0.2)
    m = pt.is_within(x, y, z)
    assert not (m & ~_in_bounds(lat, lon, pt.latlon_bounds())).any()
    pts3 = [
        np.array(latlon_to_xyz(np.array([a]), np.array([b]))).ravel()
        for a, b in pt.points
    ]

    def seg_dist(p, a, b):
        n = np.cross(a, b)
        n = n / np.linalg.norm(n)
        pa, pb = np.cross(n, a), np.cross(b, n)
        if np.dot(p, pa) >= 0 and np.dot(p, pb) >= 0:
            return math.asin(min(abs(float(np.dot(p, n))), 1.0))
        return min(
            math.acos(float(np.clip(np.dot(p, a), -1, 1))),
            math.acos(float(np.clip(np.dot(p, b), -1, 1))),
        )

    rng = np.random.default_rng(11)
    for i in rng.integers(0, len(lat), 500):
        p3 = np.array([x[i], y[i], z[i]])
        brute = min(seg_dist(p3, a, b) for a, b in zip(pts3, pts3[1:])) <= 0.2
        assert brute == bool(m[i]), i


def test_pipeline_tree_pruning_equals_full_scan(tmp_path, ray_session):
    # tree-pruned + exact-verify counts == brute membership over all docs
    from lucene_ray.pipelines import fulltext as ft

    counts = ft.geo3d_counts("/root/testdata/sf0.001").to_pydict()
    ids = np.arange(100000)
    import duckdb

    n = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()[0]
    ids = np.arange(n)
    lat = ((ids * 37) % 18000) / 100.0 - 90.0
    lon = ((ids * 53) % 36000) / 100.0 - 180.0
    x, y, z = latlon_to_xyz(lat, lon)
    for qid, shape in enumerate(ft._geo3d_shapes()):
        brute = int(np.count_nonzero(shape.is_within(x, y, z)))
        assert counts["cnt"][qid] == brute, qid
        assert brute > 0, f"shape {qid} vacuous"
