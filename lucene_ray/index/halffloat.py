"""HalfFloatPoint: IEEE-754 half floats as sortable 16-bit points.

Reference: lucene/sandbox/src/java/org/apache/lucene/sandbox/document/
HalfFloatPoint.java — float -> half conversion with round-to-nearest-
even (numpy's float16 cast implements the same IEEE rounding the
reference's shift-and-round does), sortableShortBits
(``bits ^ ((bits >> 15) & 0x7fff)`` so the unsigned order of the
encoded short equals the numeric order, negatives reversed), and
nextUp/nextDown walking one step in sortable space.
"""

from __future__ import annotations

import numpy as np


def half_bits(v) -> np.ndarray:
    """float -> raw half-float bit pattern (uint16), RNE rounding
    (halfFloatToShortBits)."""
    return np.asarray(v, dtype=np.float16).view(np.uint16)


def sortable_short_bits(bits: np.ndarray) -> np.ndarray:
    """bits ^ ((bits >> 15) & 0x7fff) on int16 (sortableShortBits)."""
    b = bits.astype(np.uint16).view(np.int16)
    return b ^ ((b >> 15) & np.int16(0x7FFF))


def half_to_sortable_short(v) -> np.ndarray:
    """halfFloatToSortableShort: float values -> int16 sort keys."""
    return sortable_short_bits(half_bits(v))


def sortable_short_to_half(s) -> np.ndarray:
    """Inverse: int16 sort keys -> float32 half-float values."""
    b = np.asarray(s, dtype=np.int16)
    raw = b ^ ((b >> 15) & np.int16(0x7FFF))
    return raw.view(np.float16).astype(np.float32)


def next_up(v: float) -> float:
    """HalfFloatPoint.nextUp: one step up in sortable space — so
    nextUp(-0) is +0, exactly like the reference (no Math.nextUp
    shortcut)."""
    if np.isnan(v) or v == np.inf:
        return float(v)
    s = int(half_to_sortable_short([v])[0])
    r = float(sortable_short_to_half([s])[0])
    if r <= v:
        r = float(sortable_short_to_half([s + 1])[0])
    return r


def next_down(v: float) -> float:
    if np.isnan(v) or v == -np.inf:
        return float(v)
    s = int(half_to_sortable_short([v])[0])
    r = float(sortable_short_to_half([s])[0])
    if r >= v:
        r = float(sortable_short_to_half([s - 1])[0])
    return r
