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
