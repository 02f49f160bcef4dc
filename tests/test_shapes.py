"""Shape index: tessellation, exact predicates, per-segment relations.

Differential strategy: every vectorized predicate is checked against an
INDEPENDENT scalar implementation built from different primitives
(segment-intersection orientation tests instead of SAT; crossing-number
instead of sign-consistency), and the tessellation is checked by exact
area conservation plus a point-coverage partition test on random
star-shaped polygons (always simple by construction).
"""

import numpy as np
import pytest

from lucene_ray.index.shapes import (
    ShapeReader,
    point_in_tri_mask,
    tessellate,
    tri_box_intersect_mask,
    write_shape_artifact,
)

rng = np.random.default_rng(0xC0FFEE)


def shoelace2(xs, ys):
    x2 = np.roll(xs, -1)
    y2 = np.roll(ys, -1)
    return abs(int(np.sum(np.asarray(xs, np.int64) * y2 - x2 * ys)))


def tri_area2(t):
    ax, ay, bx, by, cx, cy = (int(v) for v in t)
    return abs((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))


def simple_star_polygon(n, radius):
    """star_polygon, retried until integer rounding didn't break
    simplicity (rounding near-collinear rays can cross edges ~0.1% of
    the time at small radii — tessellate correctly refuses those)."""
    for _ in range(20):
        xs, ys = star_polygon(n, radius)
        if len(xs) < 3:
            continue
        try:
            tessellate(xs, ys)
        except ValueError:
            continue
        return xs, ys
    raise AssertionError("could not generate a simple star polygon")


def star_polygon(n, radius=1000):
    """Random star-shaped (hence simple) integer polygon."""
    angles = np.sort(rng.uniform(0, 2 * np.pi, n))
    # drop near-coincident angles: integer rounding of two rays closer
    # than ~0.05 rad can swap their order and self-intersect the polygon
    keep_a = np.concatenate([[True], np.diff(angles) > 0.05])
    angles = angles[keep_a]
    n = len(angles)
    radii = rng.integers(radius // 4, radius, n)
    xs = np.round(radii * np.cos(angles)).astype(np.int64)
    ys = np.round(radii * np.sin(angles)).astype(np.int64)
    # drop consecutive duplicates after rounding
    keep = np.ones(n, bool)
    for i in range(n):
        if xs[i] == xs[i - 1] and ys[i] == ys[i - 1]:
            keep[i] = False
    return xs[keep], ys[keep]


# --- scalar reference predicates (independent construction) ----------------


def _orient(ax, ay, bx, by, cx, cy):
    v = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    return (v > 0) - (v < 0)


def _on_seg(ax, ay, bx, by, px, py):
    return (
        _orient(ax, ay, bx, by, px, py) == 0
        and min(ax, bx) <= px <= max(ax, bx)
        and min(ay, by) <= py <= max(ay, by)
    )


def _segs_intersect(p1, p2, p3, p4):
    d1 = _orient(*p3, *p4, *p1)
    d2 = _orient(*p3, *p4, *p2)
    d3 = _orient(*p1, *p2, *p3)
    d4 = _orient(*p1, *p2, *p4)
    if d1 != d2 and d3 != d4:
        return True
    for a, b, p in ((p3, p4, p1), (p3, p4, p2), (p1, p2, p3), (p1, p2, p4)):
        if _on_seg(*a, *b, *p):
            return True
    return False


def _pt_in_tri_scalar(t, px, py):
    ax, ay, bx, by, cx, cy = (int(v) for v in t)
    d1 = _orient(ax, ay, bx, by, px, py)
    d2 = _orient(bx, by, cx, cy, px, py)
    d3 = _orient(cx, cy, ax, ay, px, py)
    return not ((-1 in (d1, d2, d3)) and (1 in (d1, d2, d3)))


def _tri_box_scalar(t, qxlo, qxhi, qylo, qyhi):
    ax, ay, bx, by, cx, cy = (int(v) for v in t)
    verts = [(ax, ay), (bx, by), (cx, cy)]
    if any(qxlo <= x <= qxhi and qylo <= y <= qyhi for x, y in verts):
        return True
    corners = [(qxlo, qylo), (qxhi, qylo), (qxhi, qyhi), (qxlo, qyhi)]
    if any(_pt_in_tri_scalar(t, x, y) for x, y in corners):
        return True
    tri_edges = [(verts[0], verts[1]), (verts[1], verts[2]), (verts[2], verts[0])]
    box_edges = [(corners[i], corners[(i + 1) % 4]) for i in range(4)]
    return any(
        _segs_intersect(*e1, *e2) for e1 in tri_edges for e2 in box_edges
    )


def _pt_in_poly_strict(xs, ys, px, py):
    """Crossing-number; returns None when (px, py) lies on an edge."""
    n = len(xs)
    inside = False
    for i in range(n):
        ax, ay = int(xs[i]), int(ys[i])
        bx, by = int(xs[(i + 1) % n]), int(ys[(i + 1) % n])
        if _on_seg(ax, ay, bx, by, px, py):
            return None
        if (ay > py) != (by > py):
            # exact rational comparison: px < ax + (py-ay)(bx-ax)/(by-ay)
            lhs = (px - ax) * (by - ay)
            rhs = (py - ay) * (bx - ax)
            if (by - ay > 0 and lhs < rhs) or (by - ay < 0 and lhs > rhs):
                inside = not inside
    return inside


# --- tessellation ------------------------------------------------------------


def test_tessellate_rectangle():
    tris = tessellate([0, 10, 10, 0], [0, 0, 6, 6])
    assert tris.shape == (2, 6)
    assert sum(tri_area2(t) for t in tris) == 2 * 10 * 6


def test_tessellate_orientation_normalized():
    cw = tessellate([0, 0, 10, 10], [0, 6, 6, 0])  # clockwise input
    assert sum(tri_area2(t) for t in cw) == 2 * 10 * 6


def test_tessellate_collinear_clipped():
    # midpoint on the bottom edge: degenerate ear must be dropped
    tris = tessellate([0, 5, 10, 10, 0], [0, 0, 0, 6, 6])
    assert sum(tri_area2(t) for t in tris) == 2 * 10 * 6
    assert all(tri_area2(t) > 0 for t in tris)


@pytest.mark.parametrize("n", [5, 8, 12, 23])
def test_tessellate_star_area_and_coverage(n):
    for _ in range(5):
        xs, ys = star_polygon(n)
        if len(xs) < 3:
            continue
        tris = tessellate(xs, ys)
        assert sum(tri_area2(t) for t in tris) == shoelace2(xs, ys)
        # coverage partition: triangle-union membership == polygon
        # membership at random probe points (boundary probes skipped)
        for _p in range(40):
            px = int(rng.integers(-1100, 1100))
            py = int(rng.integers(-1100, 1100))
            ref = _pt_in_poly_strict(xs, ys, px, py)
            if ref is None:
                continue
            got = bool(point_in_tri_mask(tris, px, py).any())
            # triangles tile the polygon exactly: union membership must
            # agree with polygon membership away from the boundary
            assert got == ref, (px, py, xs.tolist(), ys.tolist())


def test_tessellate_rejects_tiny():
    with pytest.raises(ValueError):
        tessellate([0, 1], [0, 1])


# --- exact predicates --------------------------------------------------------


def test_tri_box_sat_vs_scalar():
    tris = rng.integers(-50, 50, size=(400, 6)).astype(np.int64)
    boxes = np.sort(rng.integers(-50, 50, size=(20, 2, 2)), axis=1)
    for qx, qy in ((b[:, 0], b[:, 1]) for b in boxes):
        got = tri_box_intersect_mask(tris, int(qx[0]), int(qx[1]), int(qy[0]), int(qy[1]))
        want = np.array(
            [_tri_box_scalar(t, int(qx[0]), int(qx[1]), int(qy[0]), int(qy[1])) for t in tris]
        )
        np.testing.assert_array_equal(got, want)


def test_point_in_tri_vs_scalar():
    tris = rng.integers(-30, 30, size=(300, 6)).astype(np.int64)
    for _ in range(30):
        px, py = (int(v) for v in rng.integers(-35, 35, 2))
        got = point_in_tri_mask(tris, px, py)
        want = np.array([_pt_in_tri_scalar(t, px, py) for t in tris])
        np.testing.assert_array_equal(got, want)


# --- artifact + relations ----------------------------------------------------


def _brute_relate(polys, qxlo, qxhi, qylo, qyhi, relation):
    out = []
    for d, poly in enumerate(polys):
        if poly is None:
            continue
        tris = tessellate(*poly)
        hit = [bool(_tri_box_scalar(t, qxlo, qxhi, qylo, qyhi)) for t in tris]
        within = all(
            qxlo <= min(t[0], t[2], t[4])
            and max(t[0], t[2], t[4]) <= qxhi
            and qylo <= min(t[1], t[3], t[5])
            and max(t[1], t[3], t[5]) <= qyhi
            for t in tris
        )
        if relation == "intersects" and any(hit):
            out.append(d)
        elif relation == "disjoint" and not any(hit):
            out.append(d)
        elif relation == "within" and within:
            out.append(d)
    return np.array(out, np.int64)


def test_shape_reader_relations(tmp_path):
    polys = []
    for d in range(300):
        if d % 17 == 0:
            polys.append(None)  # docs without shapes
            continue
        if d % 3 == 0:
            x0, y0 = (d * 37) % 900, (d * 91) % 800
            w, h = 8 + d % 73, 8 + d % 61
            polys.append(([x0, x0 + w, x0 + w, x0], [y0, y0, y0 + h, y0 + h]))
        else:
            xs, ys = simple_star_polygon(5 + d % 7, radius=120)
            polys.append((xs + (d * 13) % 700, ys + (d * 29) % 600))
    path = str(tmp_path / "shapes-test.npz")
    write_shape_artifact(path, polys)
    r = ShapeReader.from_file(path)
    for qxlo, qxhi, qylo, qyhi in [
        (100, 400, 100, 400),
        (0, 50, 0, 50),
        (-200, 950, -150, 900),
        (500, 510, 500, 510),
    ]:
        for rel in ("intersects", "within", "disjoint"):
            got = r.query_box(qxlo, qxhi, qylo, qyhi, rel)
            want = _brute_relate(polys, qxlo, qxhi, qylo, qyhi, rel)
            np.testing.assert_array_equal(got, want, err_msg=f"{rel}")
    # CONTAINS(point)
    for px, py in [(120, 130), (455, 333), (0, 0), (899, 799)]:
        got = r.query_point(px, py)
        want = [
            d
            for d, poly in enumerate(polys)
            if poly is not None
            and bool(point_in_tri_mask(tessellate(*poly), px, py).any())
        ]
        np.testing.assert_array_equal(got, np.array(want, np.int64))


def test_shape_reader_bkd_prunes(tmp_path):
    polys = [
        ([x0, x0 + 10, x0 + 10, x0], [0, 0, 10, 10]) for x0 in range(0, 200000, 20)
    ]
    path = str(tmp_path / "shapes-prune.npz")
    write_shape_artifact(path, polys)
    r = ShapeReader.from_file(path)
    cand, stats = r.tree.intersect((None, 0, None, 0), (101, None, 11, None))
    # the traversal must not scan the whole triangle set for a tiny box
    assert stats["points_scanned"] + stats["points_bulk"] < len(r.tris) // 4
    assert len(r.query_box(0, 100, 0, 10, "intersects")) == 6


def test_shape_dv_twin_matches_tree_path(tmp_path):
    """LatLonShapeDocValuesQuery twin: the no-tree doc-values verification
    path must equal the BKD path for every relation and CONTAINS point."""
    polys = []
    for d in range(200):
        if d % 11 == 0:
            polys.append(None)
            continue
        xs, ys = simple_star_polygon(4 + d % 9, radius=150)
        polys.append((xs + (d * 31) % 500, ys + (d * 17) % 400))
    path = str(tmp_path / "shapes-dv.npz")
    write_shape_artifact(path, polys)
    r = ShapeReader.from_file(path)
    for box in [(0, 200, 0, 200), (-100, 600, -50, 450), (250, 260, 250, 260)]:
        for rel in ("intersects", "within", "disjoint"):
            np.testing.assert_array_equal(
                r.query_box(*box, rel), r.query_box_dv(*box, rel), err_msg=rel
            )


# --- polygon-geometry relations (LatLonShapeQuery with a Polygon) -----------


def _pt_in_poly_incl(xs, ys, px, py):
    r = _pt_in_poly_strict(xs, ys, px, py)
    return True if r is None else r


def _tri_poly_scalar(t, xs, ys):
    """(intersects, within) for one triangle — independent primitives."""
    ax, ay, bx, by, cx, cy = (int(v) for v in t)
    verts = [(ax, ay), (bx, by), (cx, cy)]
    n = len(xs)
    pedges = [
        ((int(xs[i]), int(ys[i])), (int(xs[(i + 1) % n]), int(ys[(i + 1) % n])))
        for i in range(n)
    ]
    tedges = [(verts[0], verts[1]), (verts[1], verts[2]), (verts[2], verts[0])]
    v_in = [_pt_in_poly_incl(xs, ys, x, y) for x, y in verts]
    inter = (
        any(v_in)
        or any(_pt_in_tri_scalar(t, int(px), int(py)) for px, py in zip(xs, ys))
        or any(_segs_intersect(*e1, *e2) for e1 in tedges for e2 in pedges)
    )
    proper = any(
        _orient(*e2[0], *e2[1], *e1[0]) * _orient(*e2[0], *e2[1], *e1[1]) < 0
        and _orient(*e1[0], *e1[1], *e2[0]) * _orient(*e1[0], *e1[1], *e2[1]) < 0
        for e1 in tedges
        for e2 in pedges
    )
    return inter, all(v_in) and not proper


def test_tri_polygon_masks_vs_scalar():
    from lucene_ray.index.shapes import tri_polygon_masks

    for trial in range(12):
        xs, ys = simple_star_polygon(6 + trial % 5, radius=300)
        xs, ys = xs + 200, ys + 150
        poly = np.stack([xs, ys], axis=1)
        tris = []
        for d in range(150):
            x0, y0 = (d * 41) % 900 - 100, (d * 67) % 800 - 100
            tris.append([x0, y0, x0 + 5 + d % 40, y0 + 2, x0 + 3, y0 + 4 + d % 50])
        tris = np.asarray(tris, np.int64)
        inter, win = tri_polygon_masks(tris, poly)
        for i, t in enumerate(tris):
            si, sw = _tri_poly_scalar(t, xs, ys)
            assert inter[i] == si, (trial, i, t)
            assert win[i] == sw, (trial, i, t)


def test_tri_polygon_within_nonconvex_degenerate_crossings():
    """A triangle edge that leaves a non-convex polygon through reflex
    vertices (no PROPER crossing ever fires) must not be 'within'; edge
    tangency at a reflex vertex and rim-hugging must stay within."""
    from lucene_ray.index.shapes import tri_polygon_masks

    notch = np.array([[0, 0], [10, 0], [10, 10], [6, 10], [5, 5], [4, 10], [0, 10]])
    # edge (2,8)-(8,8) passes over the open notch: partially outside
    inter, win = tri_polygon_masks(np.array([[2, 8, 8, 8, 5, 1]]), notch)
    assert inter[0] and not win[0]
    # fully-inside and rim-hugging triangles stay within
    assert tri_polygon_masks(np.array([[1, 1, 3, 1, 2, 3]]), notch)[1][0]
    assert tri_polygon_masks(np.array([[0, 0, 4, 0, 2, 2]]), notch)[1][0]
    # edge passing exactly THROUGH the reflex vertex, tangentially (both
    # boundary neighbours on one side) — still fully inside
    assert tri_polygon_masks(np.array([[2, 4, 8, 6, 5, 1]]), notch)[1][0]
    # slit polygon whose slit-wall vertices (6,8),(4,8) sit exactly ON the
    # triangle edge y=8: the exit/re-enter is entirely through vertices
    slit = np.array(
        [[0, 0], [10, 0], [10, 10], [7, 10], [6, 8], [5, 4], [4, 8], [3, 10], [0, 10]]
    )
    inter, win = tri_polygon_masks(np.array([[1, 8, 9, 8, 5, 1]]), slit)
    assert inter[0] and not win[0]


def test_shape_reader_polygon_relations(tmp_path):
    from lucene_ray.index.shapes import tri_polygon_masks  # noqa: F401

    polys = []
    for d in range(250):
        if d % 19 == 0:
            polys.append(None)
            continue
        if d % 3 == 0:
            x0, y0 = (d * 37) % 900, (d * 91) % 800
            w, h = 8 + d % 73, 8 + d % 61
            polys.append(([x0, x0 + w, x0 + w, x0], [y0, y0, y0 + h, y0 + h]))
        else:
            xs, ys = simple_star_polygon(5 + d % 7, radius=120)
            polys.append((xs + (d * 13) % 700, ys + (d * 29) % 600))
    path = str(tmp_path / "shapes-poly.npz")
    write_shape_artifact(path, polys)
    r = ShapeReader.from_file(path)
    queries = []
    for t in range(4):
        xs, ys = simple_star_polygon(7, radius=280)
        queries.append(np.stack([xs + 150 + 120 * t, ys + 200], axis=1))
    # a huge polygon containing everything, and a far-away one
    queries.append(np.array([[-5000, -5000], [5000, -5000], [5000, 5000], [-5000, 5000]]))
    queries.append(np.array([[90000, 90000], [90010, 90000], [90005, 90010]]))
    has_shape = np.array([d for d, p in enumerate(polys) if p is not None])
    for poly in queries:
        for rel in ("intersects", "within", "disjoint"):
            got = r.query_polygon(poly, rel)
            dv = r.query_polygon_dv(poly, rel)
            np.testing.assert_array_equal(got, dv, err_msg=rel)
            # brute: per-doc fold over scalar triangle relations
            want = []
            xs, ys = poly[:, 0], poly[:, 1]
            for d, p in enumerate(polys):
                if p is None:
                    continue
                rels = [_tri_poly_scalar(t, xs, ys) for t in tessellate(*p)]
                if rel == "intersects" and any(i for i, _ in rels):
                    want.append(d)
                elif rel == "disjoint" and not any(i for i, _ in rels):
                    want.append(d)
                elif rel == "within" and all(w for _, w in rels):
                    want.append(d)
            np.testing.assert_array_equal(got, np.array(want, np.int64), err_msg=rel)
    # sanity: the world polygon contains every shaped doc, the far one none
    np.testing.assert_array_equal(r.query_polygon(queries[4], "within"), has_shape)
    assert len(r.query_polygon(queries[5], "intersects")) == 0


def test_shape_reader_line_relations(tmp_path):
    polys = []
    for d in range(200):
        if d % 11 == 0:
            polys.append(None)
            continue
        x0, y0 = (d * 37) % 900, (d * 91) % 800
        w, h = 8 + d % 73, 8 + d % 61
        polys.append(([x0, x0 + w, x0 + w, x0], [y0, y0, y0 + h, y0 + h]))
    path = str(tmp_path / "shapes-line.npz")
    write_shape_artifact(path, polys)
    r = ShapeReader.from_file(path)
    lines = [
        np.array([[0, 0], [900, 800]]),
        np.array([[100, 50], [100, 750], [600, 750]]),
        np.array([[20000, 20000], [20010, 20010]]),  # far away
    ]
    for line in lines:
        for rel in ("intersects", "disjoint"):
            got = r.query_line(line, rel)
            want = []
            for d, p in enumerate(polys):
                if p is None:
                    continue
                tedges_hit = False
                for t in tessellate(*p):
                    verts = [(int(t[0]), int(t[1])), (int(t[2]), int(t[3])),
                             (int(t[4]), int(t[5]))]
                    tedges = [(verts[0], verts[1]), (verts[1], verts[2]),
                              (verts[2], verts[0])]
                    seg_hit = any(
                        _segs_intersect(
                            (int(line[i][0]), int(line[i][1])),
                            (int(line[i + 1][0]), int(line[i + 1][1])),
                            *e,
                        )
                        for i in range(len(line) - 1)
                        for e in tedges
                    )
                    v_hit = any(
                        _pt_in_tri_scalar(t, int(px), int(py)) for px, py in line
                    )
                    if seg_hit or v_hit:
                        tedges_hit = True
                        break
                if (rel == "intersects") == tedges_hit:
                    want.append(d)
            np.testing.assert_array_equal(got, np.array(want, np.int64), err_msg=rel)
