"""RandomSamplingFacetsCollector analogue: the deterministic md5 sample
gate matches DuckDB's md5_number_lower bit-for-bit (so the oracle can
reproduce the sample), and amortization is integer floor of the
inverse-rate scale-back (facet/RandomSamplingFacetsCollector.java
createSample + amortizeFacetCounts, deviations documented at the
definition site)."""

import duckdb
import numpy as np

from lucene_ray.pipelines.fulltext import SAMPLE_FACET_PCT, _sample_gate


def test_sample_gate_duckdb_parity():
    ids = np.arange(0, 5000, dtype=np.int64)
    got = _sample_gate(ids, SAMPLE_FACET_PCT)
    want = (
        duckdb.sql(
            "select md5_number_lower('graft' || cast(range as varchar)) % 100 "
            f"< {SAMPLE_FACET_PCT} from range(5000)"
        )
        .fetchnumpy()
    )
    want = next(iter(want.values()))
    assert np.array_equal(got, want)
    # the gate actually samples (neither empty nor everything)
    rate = got.mean()
    assert 0.25 < rate < 0.42  # pct=33 +- sampling noise


def test_amortization_is_integer_floor():
    # pinned values: a formula change (e.g. round-half-up) fails these
    assert [n * 100 // SAMPLE_FACET_PCT for n in (0, 1, 33, 34, 99, 100)] == [
        0, 3, 100, 103, 300, 303,
    ]
    for n in (0, 1, 32, 33, 34, 99, 100, 12345):
        a = n * 100 // SAMPLE_FACET_PCT
        # floor semantics: a*pct <= n*100 < (a+1)*pct
        assert a * SAMPLE_FACET_PCT <= n * 100 < (a + 1) * SAMPLE_FACET_PCT


def test_gate_stable_under_permutation():
    ids = np.array([42, 7, 999, 123456789], dtype=np.int64)
    a = _sample_gate(ids, SAMPLE_FACET_PCT)
    b = _sample_gate(ids[::-1].copy(), SAMPLE_FACET_PCT)[::-1]
    assert np.array_equal(a, b)


def test_dynamic_numeric_ranges_reference_golden():
    """computeDynamicNumericRanges pinned to the reference's
    TestDynamicRangeUtil golden vectors (count, weight, min, max,
    centroid) — basic, all-same-values, all-same-weights cases."""
    from lucene_ray.pipelines.fulltext import compute_dynamic_numeric_ranges

    v = np.arange(1, 1001, dtype=np.int64)
    w = np.arange(0, 1000, dtype=np.int64)  # zero weight rows NOT skipped
    # here: the skip happens upstream in the facet pass; the reference
    # test feeds weight 0 directly and it lands in the first range
    got = compute_dynamic_numeric_ranges(v, w, 4)
    want = [  # (count, weight, min, max, centroid)
        (501, 125250, 1, 501, 251.0),
        (207, 125028, 502, 708, 605.0),
        (159, 125133, 709, 867, 788.0),
        (133, 124089, 868, 1000, 934.0),
    ]
    assert [(c, ws, mn, mx, vs / c) for c, ws, mn, mx, vs in got] == want

    v = np.full(100, 50, dtype=np.int64)
    w = np.arange(0, 100, dtype=np.int64)
    got = compute_dynamic_numeric_ranges(v, w, 4)
    assert [(c, ws, mn, mx, vs / c) for c, ws, mn, mx, vs in got] == [
        (51, 1275, 50, 50, 50.0),
        (21, 1281, 50, 50, 50.0),
        (16, 1272, 50, 50, 50.0),
        (12, 1122, 50, 50, 50.0),
    ]

    v = np.arange(0, 100, dtype=np.int64)
    w = np.full(100, 50, dtype=np.int64)
    got = compute_dynamic_numeric_ranges(v, w, 4)
    assert [(c, ws, mn, mx, vs / c) for c, ws, mn, mx, vs in got] == [
        (25, 1250, 0, 24, 12.0),
        (25, 1250, 25, 49, 37.0),
        (25, 1250, 50, 74, 62.0),
        (25, 1250, 75, 99, 87.0),
    ]
