"""HalfFloatPoint encoding (reference sandbox/document/HalfFloatPoint.java
+ TestHalfFloatPoint goldens)."""

import numpy as np

from lucene_ray.index.halffloat import (
    half_bits,
    half_to_sortable_short,
    next_down,
    next_up,
    sortable_short_to_half,
)


def test_bit_goldens():
    assert half_bits([0.0])[0] == 0
    assert half_bits([-0.0])[0] == 1 << 15
    # Float.MIN_VALUE rounds to zero in half precision
    assert half_bits([1.4e-45])[0] == 0


def test_sortable_order_is_numeric_order():
    vals = np.array(
        [-np.inf, -65504.0, -2.5, -0.0, 0.0, 2.0**-24, 1.0, 1.25, 2048.0, np.inf],
        dtype=np.float32,
    )
    s = half_to_sortable_short(vals)
    assert (np.diff(s.astype(np.int32)) >= 0).all()
    # round-trip for exactly-representable values
    back = sortable_short_to_half(s[1:-1])
    assert np.allclose(back, vals[1:-1], rtol=0, atol=0)


def test_next_up_down():
    # nextUp walks sortable space: -0 -> +0 -> smallest subnormal
    assert next_up(-0.0) == 0.0 and not np.signbit(next_up(-0.0))
    up = next_up(0.0)
    assert 0 < up < 1e-7  # 2^-24 = 5.9604645e-8
    assert next_down(up) == 0.0
    assert next_down(0.0) == -0.0 and np.signbit(next_down(0.0))
    assert next_up(np.inf) == np.inf
    assert np.isnan(next_up(np.nan))
    # one half-float ulp at 1.0 is 2^-10
    assert next_up(1.0) == 1.0 + 2.0**-10
    assert next_down(1.0) == 1.0 - 2.0**-11


def test_inexact_float_snaps_to_neighbor():
    # 1.1 is not a half float: nextUp returns the nearest half ABOVE it
    u = next_up(1.1)
    assert u > 1.1
    assert half_to_sortable_short([u])[0] - half_to_sortable_short([1.1])[0] <= 1
