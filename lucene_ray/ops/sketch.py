"""HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet, Meunier
2007 "HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm"; the small-range linear-counting correction from
Heule/Nunkesser/Hall 2013 "HyperLogLog in Practice").

Dense layout, p = 12 (m = 4096 uint8 registers, ~0.81/sqrt(m) ≈ 1.3%
standard error).  Hashing is splitmix64 — deterministic, vectorized, no
Python loops.  The sketch is a combine-safe PARTIAL: per-batch registers
merge by elementwise max, so the Ray plan is map_batches(partial) ->
groupby(keys).map_groups(max-merge) -> estimate; register blobs are 4 KB
per group per block, never row-scaled.

This is the "novel sketch" operator shape: at 100 TB the registers ride
the shuffle instead of the raw keys, turning COUNT(DISTINCT ...) into a
fixed-size exchange.
"""

from __future__ import annotations

import numpy as np

P = 12
M = 1 << P
_ALPHA = 0.7213 / (1.0 + 1.079 / M)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain constants)."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hll_partial(values: np.ndarray) -> np.ndarray:
    """(M,) uint8 registers for one batch of int64 values."""
    reg = np.zeros(M, dtype=np.uint8)
    if len(values) == 0:
        return reg
    h = splitmix64(np.asarray(values, np.int64).view(np.uint64))
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = h << np.uint64(P)  # remaining 64-P bits, left-aligned
    # rho = position of the leftmost 1-bit in the remaining bits (1-based);
    # all-zero rest -> 64 - P + 1
    nz = rest != 0
    lz = np.full(len(h), 64 - P, dtype=np.int64)
    r = rest[nz]
    # count leading zeros via float64 exponent is unsafe >2^53; do it in
    # 4-bit nibble steps (vectorized, exact)
    shift = np.zeros(r.shape, np.uint64)
    acc = np.zeros(r.shape, np.int64)
    cur = r
    for step in (32, 16, 8, 4, 2, 1):
        mask = cur < (np.uint64(1) << np.uint64(64 - step))
        acc += np.where(mask, step, 0)
        cur = np.where(mask, cur << np.uint64(step), cur)
    lz[nz] = acc
    rho = np.minimum(lz + 1, 64 - P + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rho)
    return reg


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(reg: np.ndarray) -> float:
    """Bias-corrected estimate with the small-range linear-counting
    switch (E <= 2.5m and empty registers exist)."""
    reg = np.asarray(reg, np.float64)
    e = _ALPHA * M * M / np.sum(np.exp2(-reg))
    zeros = int((reg == 0).sum())
    if e <= 2.5 * M and zeros:
        return float(M * np.log(M / zeros))
    return float(e)


# --- Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data
# stream summary: the count-min sketch and its applications") -------------

CM_D = 4
CM_W = 2048


def _cm_hashes(keys: np.ndarray) -> np.ndarray:
    """(n, CM_D) row indices: one splitmix64 per row seed (pairwise
    independent enough for the CM guarantee in practice)."""
    cols = []
    for d in range(CM_D):
        seed = np.uint64((d * 0x9E3779B97F4A7C15 + 1) & 0xFFFFFFFFFFFFFFFF)
        h = splitmix64(keys.astype(np.int64).view(np.uint64) ^ seed)
        cols.append((h % np.uint64(CM_W)).astype(np.int64))
    return np.stack(cols, axis=1)


def cm_partial(keys: np.ndarray, counts: np.ndarray | None = None) -> np.ndarray:
    """(CM_D, CM_W) int64 table for one batch (counts default 1 each)."""
    tab = np.zeros((CM_D, CM_W), np.int64)
    if len(keys) == 0:
        return tab
    if counts is None:
        counts = np.ones(len(keys), np.int64)
    idx = _cm_hashes(np.asarray(keys))
    for d in range(CM_D):
        np.add.at(tab[d], idx[:, d], counts)
    return tab


def cm_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b  # CM tables are linear — partials just sum


def cm_query(tab: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point estimates (upper bounds, min over rows) for each key."""
    idx = _cm_hashes(np.asarray(keys))
    ests = np.stack([tab[d][idx[:, d]] for d in range(CM_D)], axis=1)
    return ests.min(axis=1)
