"""BKD-style point tree (index/points.py): brute-force differential,
CELL_INSIDE/OUTSIDE pruning evidence, persisted-artifact idempotence, and
tree-vs-fallback scorer equivalence."""

from __future__ import annotations

import os

import numpy as np
import pytest

from lucene_ray.index.points import LEAF_SIZE, PointTree, build_point_index, point_file


@pytest.fixture(scope="module")
def tree_and_vals():
    rng = np.random.default_rng(123)
    vals = rng.integers(0, 5000, size=(50_000, 2)).astype(np.int64)
    return PointTree.build(vals, np.arange(len(vals), dtype=np.int64), leaf_size=256), vals


def test_intersect_matches_brute_force(tree_and_vals):
    tree, vals = tree_and_vals
    rng = np.random.default_rng(7)
    for _ in range(50):
        lo = [int(rng.integers(0, 5000)) if rng.random() > 0.25 else None for _ in range(2)]
        hi = [int(rng.integers(0, 5001)) if rng.random() > 0.25 else None for _ in range(2)]
        got, _ = tree.intersect(tuple(lo), tuple(hi))
        m = np.ones(len(vals), bool)
        for d in range(2):
            if lo[d] is not None:
                m &= vals[:, d] >= lo[d]
            if hi[d] is not None:
                m &= vals[:, d] < hi[d]
        assert np.array_equal(got, np.nonzero(m)[0])


def test_pruning_is_real(tree_and_vals):
    tree, vals = tree_and_vals
    # narrow box: almost everything must be pruned without a value compare
    _, stats = tree.intersect((10, 10), (50, 50))
    assert stats["points_scanned"] < len(vals) // 10
    # open box: the root is CELL_INSIDE -> one node, zero comparisons
    docs, stats = tree.intersect((None, None), (None, None))
    assert len(docs) == len(vals)
    assert stats == {"nodes_visited": 1, "points_scanned": 0, "points_bulk": len(vals)}
    # half-open box on one dim: bulk >> scanned (inside subtrees collected
    # wholesale, only boundary leaves compare values)
    _, stats = tree.intersect((2500, None), (None, None))
    assert stats["points_bulk"] > stats["points_scanned"]


def test_subtree_contiguity_invariant(tree_and_vals):
    tree, _ = tree_and_vals
    n = tree.nodes
    for node in range(len(n["start"])):
        l, r = n["left"][node], n["right"][node]
        if l >= 0:
            # children partition the parent's contiguous slice
            assert n["start"][l] == n["start"][node]
            assert n["end"][l] == n["start"][r]
            assert n["end"][r] == n["end"][node]


def test_persisted_index_and_scorer_equivalence(ray_session):
    from lucene_ray.pipelines import fulltext as ft
    from lucene_ray.search.query import PointBoxQuery, TermQuery, bool_query
    from lucene_ray.search.searcher import IndexSearcher

    sf = "/root/testdata/sf0.001"
    idx = ft.ensure_index(sf)
    paths = build_point_index(idx, ft.POINT_FIELDS)
    assert paths and all(os.path.exists(p) for p in paths)
    mtimes = [os.path.getmtime(p) for p in paths]
    # idempotent: a rebuild call touches nothing
    build_point_index(idx, ft.POINT_FIELDS)
    assert [os.path.getmtime(p) for p in paths] == mtimes

    searcher = IndexSearcher(idx)
    box = PointBoxQuery(ft.POINT_FIELDS, (150, 50), (350, 480))
    q = bool_query(must=[TermQuery("window")], filter=[box])
    with_tree = searcher.search(q, 10)

    # drop the trees from the readers -> fallback stored-column scan
    for r in searcher.readers:
        r._point_trees = {tuple(ft.POINT_FIELDS): None}
    without_tree = searcher.search(q, 10)
    assert [(d, float(s)) for d, s in with_tree] == [
        (d, float(s)) for d, s in without_tree
    ]
    assert len(with_tree) > 0


@pytest.mark.parametrize(
    "center,r2",
    [((2500, 2500), 1_000_000), ((0, 0), 4_000_000), ((4900, 100), 250_000)],
)
def test_distance_matches_brute_force(tree_and_vals, center, r2):
    """intersect_distance == the full integer scan, values and order."""
    tree, vals = tree_and_vals
    docs, d2, stats = tree.intersect_distance(center, r2)
    diff = vals.astype(np.int64) - np.asarray(center, np.int64)
    bd = (diff * diff).sum(axis=1)
    want = np.nonzero(bd <= r2)[0]
    assert docs.tolist() == sorted(want.tolist())
    assert d2.tolist() == bd[docs].tolist()


def test_distance_pruning_is_real(tree_and_vals):
    """A small radius must SKIP most cells (points_scanned+bulk << n) and
    a bulk-take region must appear for a radius covering the space."""
    tree, vals = tree_and_vals
    _, _, tight = tree.intersect_distance((2500, 2500), 10_000)
    assert tight["points_scanned"] + tight["points_bulk"] < len(vals) * 0.05
    _, _, wide = tree.intersect_distance((2500, 2500), 5000**2 * 2)
    assert wide["points_bulk"] > 0.9 * len(vals)


def test_polygon_query_brute_differential():
    """BKD polygon traversal == per-point ray cast over everything, on a
    non-convex polygon; inside cells must be bulk-collected."""
    import numpy as np

    from lucene_ray.index.points import PointTree, point_in_polygon

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 1000, size=(4000, 2))
    tree = PointTree.build(vals, np.arange(4000), leaf_size=64)
    # non-convex "arrow" polygon
    poly = np.array(
        [[100, 100], [800, 100], [800, 800], [450, 450], [100, 800]], np.int64
    )
    got, stats = tree.intersect_polygon(poly)
    want = np.sort(np.nonzero(point_in_polygon(vals, poly))[0])
    assert np.array_equal(got, want)
    assert len(want) > 100
    assert stats["points_bulk"] > 0           # inside cells bulk-taken
    assert stats["points_scanned"] < 4000     # pruning really happened


def test_polygon_boundary_and_degenerate():
    import numpy as np

    from lucene_ray.index.points import point_in_polygon

    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.int64)
    pts = np.array(
        [[5, 5], [0, 0], [10, 5], [5, 10], [11, 5], [-1, -1], [10, 10]], np.int64
    )
    got = point_in_polygon(pts, sq).tolist()
    assert got == [True, True, True, True, False, False, True]


def test_multi_range_query_union_dedupes(ray_session):
    """PointMultiRangeQuery (sandbox MultiRangeQuery): tree path == the
    stored-column fallback, and overlapping ranges count each doc once."""
    import numpy as np

    from lucene_ray.pipelines import fulltext as ft
    from lucene_ray.search.query import PointMultiRangeQuery
    from lucene_ray.search.searcher import IndexSearcher

    sf = "/root/testdata/sf0.001"
    idx = ft.ensure_index(sf)
    from lucene_ray.index.points import build_point_index

    build_point_index(idx, ft.POINT_FIELDS)
    searcher = IndexSearcher(idx)
    # overlapping ranges: [100,300) U [200,400) == [100,400)
    q = PointMultiRangeQuery(
        ft.POINT_FIELDS, (((100, None), (300, None)), ((200, None), (400, None)))
    )
    import duckdb

    want = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf}/documents.parquet')"
        " WHERE n_chars >= 100 AND n_chars < 400"
    ).fetchone()[0]
    assert searcher.count(q) == want
    # fallback (no tree loaded) agrees: fabricate by querying a field pair
    # that has no persisted tree
    q2 = PointMultiRangeQuery(
        ("n_chars", "n_chars"),
        (((100, None), (300, None)), ((200, None), (400, None))),
    )
    assert searcher.count(q2) == want


def test_nearest_matches_brute_force(tree_and_vals):
    tree, vals = tree_and_vals
    rng = np.random.default_rng(99)
    for _ in range(20):
        c = tuple(int(x) for x in rng.integers(-500, 5500, size=2))
        k = int(rng.integers(1, 30))
        docs, d2, stats = tree.nearest(c, k)
        diff = vals - np.asarray(c, np.int64)
        bd2 = (diff * diff).sum(axis=1)
        order = np.lexsort((np.arange(len(vals)), bd2))[:k]
        assert np.array_equal(docs, order), (c, k)
        assert np.array_equal(d2, bd2[order])
        # best-first pruning is real: nowhere near a full scan
        assert stats["points_scanned"] < len(vals) // 5, stats


def test_nearest_tie_prefers_lower_docid():
    # four points equidistant from the center: ties resolve by docid
    vals = np.array([[0, 1], [0, -1], [1, 0], [-1, 0], [5, 5]], np.int64)
    ids = np.array([40, 30, 20, 10, 5], np.int64)
    tree = PointTree.build(vals, ids, leaf_size=2)
    docs, d2, _ = tree.nearest((0, 0), 3)
    assert d2.tolist() == [1, 1, 1]
    assert docs.tolist() == [10, 20, 30]


def test_nearest_k_exceeds_points():
    vals = np.array([[2, 2], [9, 9]], np.int64)
    tree = PointTree.build(vals, np.array([1, 0], np.int64), leaf_size=2)
    docs, d2, _ = tree.nearest((0, 0), 10)
    assert docs.tolist() == [1, 0]
    assert d2.tolist() == [8, 162]


def test_nearest_no_int64_overflow():
    # coordinates near the int64 extremes: raw int64 diff^2 would wrap;
    # the overflow-safe cell bounds + object-int leaf math must not
    big = np.int64(2**40)
    vals = np.array([[big, big], [-big, -big], [big - 3, big], [0, 0]], np.int64)
    tree = PointTree.build(vals, np.arange(4, dtype=np.int64), leaf_size=2)
    docs, d2, _ = tree.nearest((int(big), int(big)), 2)
    assert docs.tolist() == [0, 2]
    assert d2.tolist() == [0, 9]
    # nearest to the far corner: the -big point wins over the +big cluster
    docs, _d2, _ = tree.nearest((-int(big), -int(big)), 1)
    assert docs.tolist() == [1]


def test_in_set_matches_brute_force(tree_and_vals):
    tree, vals = tree_and_vals
    rng = np.random.default_rng(41)
    for _ in range(15):
        values = rng.integers(0, 5000, size=rng.integers(1, 20)).tolist()
        dim = int(rng.integers(0, 2))
        got, stats = tree.in_set(dim, values)
        want = np.nonzero(np.isin(vals[:, dim], np.unique(values)))[0]
        assert np.array_equal(got, want)
        # value-range pruning bites hard when the set is small relative
        # to the domain (a dense random set legitimately touches most
        # cells, so only small sets assert a scan bound)
        if len(values) <= 3:
            assert stats["points_scanned"] < len(vals) // 2
    # empty set / absent values
    docs, _ = tree.in_set(0, [])
    assert len(docs) == 0
    docs, _ = tree.in_set(0, [99999])
    assert len(docs) == 0


def test_in_set_single_traversal_beats_per_value():
    # a set of 50 values: the shared traversal must visit FEWER nodes
    # than 50 separate single-value intersects (the MergePointVisitor
    # point of PointInSetQuery.java)
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 100_000, size=(50_000, 2)).astype(np.int64)
    tree = PointTree.build(vals, np.arange(len(vals), dtype=np.int64), leaf_size=256)
    values = rng.integers(0, 100_000, size=50).tolist()
    _, shared = tree.in_set(0, values)
    per_value_nodes = 0
    for v in values:
        _, st = tree.intersect((int(v), None), (int(v) + 1, None))
        per_value_nodes += st["nodes_visited"]
    assert shared["nodes_visited"] < per_value_nodes


def test_range_field_relations_brute(tmp_path):
    """RangeFieldQuery QueryType semantics (document/RangeFieldQuery.java):
    the 2-dim (lo, hi) tree traversals vs a brute interval check, incl.
    CROSSES = intersects and not within and not contains."""
    import numpy as np

    from lucene_ray.index.points import PointTree

    rng = np.random.default_rng(7)
    lo = rng.integers(0, 500, 2000).astype(np.int64)
    hi = lo + rng.integers(0, 200, 2000).astype(np.int64)
    tree = PointTree.build(
        np.stack([lo, hi], axis=1), np.arange(2000, dtype=np.int64)
    )
    for qlo, qhi in [(100, 300), (0, 700), (250, 251), (600, 650)]:
        inter, _ = tree.intersect((None, qlo), (qhi + 1, None))
        within, _ = tree.intersect((qlo, None), (None, qhi + 1))
        contains, _ = tree.intersect((None, qhi), (qlo + 1, None))
        crosses = np.setdiff1d(
            inter, np.union1d(within, contains), assume_unique=True
        )
        b_i = (lo <= qhi) & (hi >= qlo)
        b_w = (lo >= qlo) & (hi <= qhi)
        b_c = (lo <= qlo) & (hi >= qhi)
        np.testing.assert_array_equal(inter, np.flatnonzero(b_i))
        np.testing.assert_array_equal(within, np.flatnonzero(b_w))
        np.testing.assert_array_equal(contains, np.flatnonzero(b_c))
        np.testing.assert_array_equal(
            crosses, np.flatnonzero(b_i & ~b_w & ~b_c)
        )


def test_histogram_matches_brute_force_and_bulk_counts(tree_and_vals):
    # HistogramCollector + PointTreeBulkCollector twin: tree histogram ==
    # per-value floorDiv recount, with real bulk (no-visit) cell counting
    tree, vals = tree_and_vals
    for width in (37, 64, 1000):
        b, c, stats = tree.histogram(0, width)
        eb, ec = np.unique(vals[:, 0] // width, return_counts=True)
        assert np.array_equal(b, eb) and np.array_equal(c, ec)
        assert stats["points_bulk"] + stats["points_scanned"] == len(vals)
    # wide buckets: most cells land inside one bucket -> mostly bulk
    _, _, stats = tree.histogram(0, 1000)
    assert stats["points_bulk"] > stats["points_scanned"]


def test_histogram_max_buckets_guard(tree_and_vals):
    tree, _ = tree_and_vals
    with pytest.raises(ValueError, match="max_buckets"):
        tree.histogram(0, 1, max_buckets=16)  # 5000 distinct buckets
    with pytest.raises(ValueError):
        tree.histogram(0, 0)


def test_geo_cap_boxes_are_supersets_and_prune():
    # LatLonPointDistanceQuery analogue: the encoded cap boxes must
    # contain every sort-key match (verify is exact, box is a superset)
    from lucene_ray.pipelines.fulltext import (
        _geo_cap_boxes,
        _geo_sortkey,
        _geo_values,
        geo_sortkey_threshold,
    )

    rng = np.random.default_rng(42)
    ids = rng.integers(0, 10**6, size=30_000).astype(np.int64)
    lat = ((ids * 37) % 18000) / 100.0 - 90.0
    lon = ((ids * 53) % 36000) / 100.0 - 180.0
    elat = np.floor(lat / 90.0 * 2147483648.0).astype(np.int64)
    elon = np.floor(lon / 180.0 * 2147483648.0).astype(np.int64)
    pruned_somewhere = False
    for _ in range(40):
        qlat = float(rng.uniform(-89, 89))
        qlon = float(rng.uniform(-180, 180))
        radius = float(rng.uniform(5e4, 3e6))
        boxes = _geo_cap_boxes(qlat, qlon, radius)
        in_box = np.zeros(len(ids), bool)
        for la0, la1, lo0, lo1 in boxes:
            in_box |= (elat >= la0) & (elat <= la1) & (elon >= lo0) & (elon <= lo1)
        match = _geo_sortkey(lat, lon, qlat, qlon) <= geo_sortkey_threshold(radius)
        assert not (match & ~in_box).any()  # superset
        if in_box.sum() < len(ids):
            pruned_somewhere = True
    assert pruned_somewhere


def test_sortable_encodings_are_order_isomorphic():
    # NumericUtils.doubleToSortableLong / floatToSortableInt twins
    from lucene_ray.pipelines.fulltext import (
        double_to_sortable_long,
        float_to_sortable_int,
    )

    rng = np.random.default_rng(9)
    v = np.concatenate(
        [
            rng.normal(0, 1e6, 5000),
            rng.normal(0, 1e-6, 5000),
            np.array([0.0, -0.0, 1.5, -1.5, np.finfo(np.float64).max,
                      -np.finfo(np.float64).max]),
        ]
    )
    enc = double_to_sortable_long(v)
    order_v = np.argsort(v, kind="stable")
    order_e = np.argsort(enc, kind="stable")
    assert np.array_equal(v[order_v], v[order_e])  # same total order
    f = v.astype(np.float32)
    encf = float_to_sortable_int(f)
    assert np.array_equal(
        np.sort(f), f[np.argsort(encf, kind="stable")]
    )
