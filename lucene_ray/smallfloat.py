"""Bit-exact reimplementation of Lucene's SmallFloat norm encoding.

Reference: lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-167
(longToInt4 / int4ToLong / intToByte4 / byte4ToInt).  Norms are one byte per
doc: ``intToByte4(fieldLength)`` (IndexingChain.java:1150-1166 via
Similarity.computeNorm, Similarity.java:153-163).
"""

from __future__ import annotations

import numpy as np


def long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError("Only supports positive values, got %d" % i)
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    return encoded | ((shift + 1) << 3)


def int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


MAX_INT4 = long_to_int4(2**31 - 1)
NUM_FREE_VALUES = 255 - MAX_INT4  # == 24


def int_to_byte4(i: int) -> int:
    """Returns the encoded norm as an unsigned byte value 0..255."""
    if i < 0:
        raise ValueError("Only supports positive values, got %d" % i)
    if i < NUM_FREE_VALUES:
        return i
    return (NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)) & 0xFF


def byte4_to_int(b: int) -> int:
    """``b`` is the unsigned byte value 0..255."""
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + int4_to_long(b - NUM_FREE_VALUES)


# Exhaustive decode table (BM25Similarity.java LENGTH_TABLE:112-118)
LENGTH_TABLE = np.array([byte4_to_int(b) for b in range(256)], dtype=np.float32)

# Vectorized encoder: int_to_byte4 is monotonic non-decreasing, so encode via
# searchsorted over the decode table's step boundaries.
_DECODE_INT = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)


def int_to_byte4_array(lengths: np.ndarray) -> np.ndarray:
    """Vectorized int_to_byte4 over a non-negative int array -> uint8."""
    # For length L the encoded byte is the largest b with decode(b) <= L.
    idx = np.searchsorted(_DECODE_INT, lengths, side="right") - 1
    return idx.astype(np.uint8)
