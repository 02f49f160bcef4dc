"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All stages are Ray-Data-native:

- exact dedup      = fingerprint map_batches -> groupby(fp) min aggregation
                     (hash-partition + per-group-first; the shuffle key is
                     the md5 fingerprint, which is uniform — no skew)
- MinHash + LSH    = signature map_batches -> band rows -> groupby(band,key)
                     map_groups pair emission -> pair-distinct groupby
- SimHash          = pure map_batches (64-bit signature per doc)
- n-gram Jaccard   = shingle explode -> groupby(shingle) pair emission ->
                     groupby(pair) sum == intersection size; union from
                     per-doc shingle counts (broadcast small side)

Hash/permutation constants are BIGINT-safe so the DuckDB oracle SQL in
``__ray_entry__.py`` reproduces every signature exactly (see ops/util.py).

Scale notes (100 TB): group sizes in the LSH/shingle groupbys are bounded
by ``max_group`` (a hot shingle shared by millions of docs would otherwise
emit O(n^2) pairs); dropped groups are counted in a ``dropped`` column
rather than silently truncated.  The per-doc size lookup used for the
Jaccard union is broadcast via ``ray.put`` once per run (it is k-bytes per
million docs); at full scale it would become a shuffle join keyed on
doc_id.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .util import (
    LSH_ROWS_PER_BAND,
    NUM_MINHASH,
    md5_u64,
    minhash_signature,
    tokenize,
    word_shingles,
)


# --- exact dedup ----------------------------------------------------------

def _exact_fp_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    fps = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return pa.table({"doc_id": batch.column("doc_id"), "fp": pa.array(fps)})


def exact_dedup(ds):
    """Survivors of exact-content dedup: min doc_id per identical text."""
    fps = ds.map_batches(_exact_fp_batch, batch_format="pyarrow")
    kept = fps.groupby("fp").min("doc_id")
    return kept.map_batches(
        lambda b: pa.table({"doc_id": pc.cast(b.column("min(doc_id)"), pa.int64())}),
        batch_format="pyarrow",
    )


# --- MinHash + LSH --------------------------------------------------------

def _minhash_batch(batch: pa.Table, n: int = 3) -> pa.Table:
    doc_ids, idx, sigs = [], [], []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        shingles = word_shingles(tokenize(text), n)
        if not shingles:  # token-less docs are excluded (mirrors the oracle)
            continue
        sig = minhash_signature(shingles)
        doc_ids.extend([doc_id] * NUM_MINHASH)
        idx.extend(range(NUM_MINHASH))
        sigs.extend(int(x) for x in sig)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "i": pa.array(idx, type=pa.int64()),
            "sig": pa.array(sigs, type=pa.int64()),
        }
    )


def minhash_signatures(ds, n: int = 3):
    """Long-format signatures (doc_id, i, sig), i in [0, NUM_MINHASH)."""
    return ds.map_batches(_minhash_batch, batch_format="pyarrow", fn_kwargs={"n": n})


def _band_batch(batch: pa.Table, n: int = 3) -> pa.Table:
    doc_ids, bands, keys = [], [], []
    r = LSH_ROWS_PER_BAND
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        shingles = word_shingles(tokenize(text), n)
        if not shingles:  # empty docs would all collide on the sentinel sig
            continue
        sig = minhash_signature(shingles)
        for band in range(NUM_MINHASH // r):
            doc_ids.append(doc_id)
            bands.append(band)
            keys.append("_".join(str(int(s)) for s in sig[band * r : band * r + r]))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "band": pa.array(bands, type=pa.int64()),
            "key": pa.array(keys, type=pa.string()),
        }
    )


def _emit_pairs(group: pa.Table, max_group: int) -> pa.Table:
    ids = sorted(group.column("doc_id").to_pylist())
    if len(ids) < 2 or len(ids) > max_group:
        if len(ids) > max_group:
            print(f"lsh: dropping hot bucket of {len(ids)} docs (cap {max_group})")
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pa.table({"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())})


def lsh_candidate_pairs(ds, n: int = 3, max_group: int = 1000):
    """Distinct candidate near-dup pairs (doc_a < doc_b) from banded MinHash."""
    bands = ds.map_batches(_band_batch, batch_format="pyarrow", fn_kwargs={"n": n})
    pairs = bands.groupby(["band", "key"]).map_groups(
        lambda g: _emit_pairs(g, max_group), batch_format="pyarrow"
    )
    distinct = pairs.groupby(["doc_a", "doc_b"]).count()
    return distinct.map_batches(
        lambda b: b.select(["doc_a", "doc_b"]), batch_format="pyarrow"
    )


# --- SimHash --------------------------------------------------------------

_BIT_POS = np.arange(64, dtype=np.uint64)


def _simhash_batch(batch: pa.Table) -> pa.Table:
    out_ids, out_sigs = [], []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        toks = tokenize(text)
        if not toks:
            continue
        uniq: dict[str, int] = {}
        for t in toks:
            uniq[t] = uniq.get(t, 0) + 1
        hs = np.array([md5_u64(t) for t in uniq], dtype=np.uint64)
        tf = np.array(list(uniq.values()), dtype=np.int64)
        bits = ((hs[:, None] >> _BIT_POS[None, :]) & np.uint64(1)).astype(np.int64)
        v = ((2 * bits - 1) * tf[:, None]).sum(axis=0)
        sig = np.uint64(0)
        for b in np.nonzero(v > 0)[0]:
            sig |= np.uint64(1) << np.uint64(b)
        out_ids.append(doc_id)
        out_sigs.append(int(sig))
    return pa.table(
        {
            "doc_id": pa.array(out_ids, type=pa.int64()),
            "simhash": pa.array(out_sigs, type=pa.uint64()),
        }
    )


def simhash(ds):
    """(doc_id, simhash): 64-bit tf-weighted SimHash; empty docs omitted."""
    return ds.map_batches(_simhash_batch, batch_format="pyarrow")


def simhash_near_pairs(ds, n_bands: int = 4, band_bits: int = 16, max_dist: int = 8,
                       max_group: int = 1000):
    """Near-dup pairs by banded SimHash: candidates share one 16-bit band,
    verified by hamming(sig_a, sig_b) <= max_dist.

    Returns (doc_a, doc_b, hamming) — all integers.  The signature lookup
    for verification is broadcast via ray.put (bytes per doc); at full
    scale it becomes a join keyed on doc_id.
    """
    import ray

    sigs_ds = simhash(ds)
    sig_tbl = sigs_ds.to_pandas()  # (doc_id, simhash): small
    sig_map = dict(zip(sig_tbl["doc_id"].tolist(), sig_tbl["simhash"].tolist()))
    sig_ref = ray.put(sig_map)
    mask = (1 << band_bits) - 1

    def _bands(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        s = batch.column("simhash").to_numpy().astype(np.uint64)
        out_d, out_b, out_v = [], [], []
        for b in range(n_bands):
            out_d.extend(d.tolist())
            out_b.extend([b] * len(d))
            out_v.extend(((s >> np.uint64(band_bits * b)) & np.uint64(mask)).tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "bval": pa.array(out_v, pa.int64()),
            }
        )

    cand = (
        sigs_ds.map_batches(_bands, batch_format="pyarrow")
        .groupby(["b", "bval"])
        .map_groups(lambda g: _emit_pairs(g, max_group), batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .count()
    )

    def _verify(batch: pa.Table) -> pa.Table:
        sm = ray.get(sig_ref)
        a = batch.column("doc_a").to_numpy()
        b = batch.column("doc_b").to_numpy()
        ham = np.array(
            [bin(int(sm[x]) ^ int(sm[y])).count("1") for x, y in zip(a, b)],
            dtype=np.int64,
        )
        keep = ham <= max_dist
        return pa.table(
            {
                "doc_a": pa.array(a[keep], pa.int64()),
                "doc_b": pa.array(b[keep], pa.int64()),
                "hamming": pa.array(ham[keep], pa.int64()),
            }
        )

    return cand.map_batches(_verify, batch_format="pyarrow")


# --- n-gram Jaccard -------------------------------------------------------

def _shingle_rows_batch(batch: pa.Table, n: int) -> pa.Table:
    doc_ids, shingles = [], []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        for s in word_shingles(tokenize(text), n):
            doc_ids.append(doc_id)
            shingles.append(s)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "shingle": pa.array(shingles, type=pa.string()),
        }
    )


def ngram_jaccard_pairs(ds, n: int = 3, min_jaccard_pct: int = 20, max_group: int = 200):
    """Pairs with Jaccard(shingle sets) >= min_jaccard_pct/100.

    Returns (doc_a, doc_b, inter, union_sz) — all integers, so the oracle
    comparison is exact (the threshold test is ``100*inter >= pct*union``).
    """
    import ray

    shingle_rows = ds.map_batches(
        _shingle_rows_batch, batch_format="pyarrow", fn_kwargs={"n": n}
    )
    sizes_tbl = shingle_rows.groupby("doc_id").count().to_pandas()
    sizes = dict(zip(sizes_tbl["doc_id"], sizes_tbl["count()"]))
    sizes_ref = ray.put(sizes)

    pairs = shingle_rows.groupby("shingle").map_groups(
        lambda g: _emit_pairs(g, max_group), batch_format="pyarrow"
    )
    inter = pairs.groupby(["doc_a", "doc_b"]).count()

    def finish(batch: pa.Table) -> pa.Table:
        szs = ray.get(sizes_ref)
        a = batch.column("doc_a").to_numpy()
        b = batch.column("doc_b").to_numpy()
        it = batch.column("count()").to_numpy().astype(np.int64)
        union = np.array([szs[x] for x in a]) + np.array([szs[x] for x in b]) - it
        keep = 100 * it >= min_jaccard_pct * union
        return pa.table(
            {
                "doc_a": pa.array(a[keep], pa.int64()),
                "doc_b": pa.array(b[keep], pa.int64()),
                "inter": pa.array(it[keep], pa.int64()),
                "union_sz": pa.array(union[keep], pa.int64()),
            }
        )

    return inter.map_batches(finish, batch_format="pyarrow")
