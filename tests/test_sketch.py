"""HyperLogLog sketch: accuracy envelope, merge associativity, hash
determinism (ops/sketch.py; Flajolet et al. 2007 + HLL-in-practice
small-range correction)."""

from __future__ import annotations

import numpy as np

from lucene_ray.ops.sketch import M, hll_estimate, hll_merge, hll_partial, splitmix64


def test_hll_accuracy_envelope():
    for n in (1, 10, 100, 5000, 50000):
        vals = np.arange(n, dtype=np.int64) * 2654435761 + 42
        est = hll_estimate(hll_partial(vals))
        assert abs(est - n) / n <= 0.05, (n, est)


def test_hll_merge_equals_single_pass():
    vals = np.arange(20000, dtype=np.int64) * 31 + 7
    whole = hll_partial(vals)
    merged = np.zeros(M, np.uint8)
    for part in np.array_split(vals, 13):
        merged = hll_merge(merged, hll_partial(part))
    assert (whole == merged).all()
    # duplicates never change the registers (distinctness)
    dup = hll_merge(whole, hll_partial(vals[:500]))
    assert (dup == whole).all()


def test_splitmix64_deterministic_and_dispersed():
    x = np.arange(1000, dtype=np.int64).view(np.uint64)
    h1, h2 = splitmix64(x), splitmix64(x)
    assert (h1 == h2).all()
    assert len(np.unique(h1)) == 1000
    # top bits well spread: all 16 high nibbles hit
    assert len(np.unique(h1 >> np.uint64(60))) == 16


def test_count_min_upper_bound_and_linearity():
    """CM estimates NEVER undercount, overcount stays within eps*N for the
    planted Zipf stream, and partial tables merge by plain addition."""
    from lucene_ray.ops.sketch import CM_W, cm_merge, cm_partial, cm_query

    rng = np.random.default_rng(5)
    keys = rng.zipf(1.3, 200000).astype(np.int64) % 10000
    uniq, true = np.unique(keys, return_counts=True)
    whole = cm_partial(keys)
    merged = None
    for part in np.array_split(keys, 9):
        t = cm_partial(part)
        merged = t if merged is None else cm_merge(merged, t)
    assert (whole == merged).all()
    est = cm_query(whole, uniq)
    assert (est >= true).all()  # one-sided error
    # eps = e / w within constant slop; N = stream length
    overs = est - true
    assert overs.max() <= 3 * np.e * len(keys) / CM_W
    # the true heavy hitter's estimate is tight in relative terms
    top = uniq[np.argmax(true)]
    assert cm_query(whole, np.array([top]))[0] <= true.max() * 1.05
