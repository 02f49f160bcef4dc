"""SemDeDup — semantic deduplication over document embeddings.

Reference: Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication" (arXiv 2303.09540): embed every
doc, k-means-cluster the embeddings, and WITHIN each cluster drop all but
one member of every group of high-cosine near-duplicates, keeping the
example with the LOWEST cosine similarity to the cluster centroid (the
paper's keep rule — "edge" points carry more information than the
cluster-typical ones).

Embedding here is the deterministic HASHING TRICK over the token stream
(Weinberger et al. 2009, feature hashing): component b of a doc's vector
is the count of its tokens with md5(token) % dim == b.  All-integer, so
the cosine threshold is evaluated EXACTLY — ``cos(a, b) >= tau`` (tau² =
TAU_NUM/TAU_DEN) as ``TAU_DEN·dot² >= TAU_NUM·|a|²·|b|² and dot > 0`` —
and DuckDB reproduces edges bit-for-bit (dots/norms stay well under
2^53).

Distributed shapes:
- ``semantic_duplicate_clusters_bucketed`` is the arm the driver oracle
  CHECKS and the 100-TB path: sign-bucketed exact edges (md5-derived
  integer hyperplanes; one keyed exchange, per-bucket matmuls, no
  corpus broadcast or driver materialization) into the same distributed
  min-label propagation as the Jaccard dedup
  (ops/dedup.components_from_pairs).  The oracle applies the identical
  bucket restriction, so the arm is hash-exact by construction.
- ``semantic_duplicate_clusters`` is the all-pairs EXACT baseline (full
  hashed-TF matrix broadcast once via ``ray.put``): driver-scale only,
  kept as the recall GATE for the bucketed arm and the k-means drops.
- ``semdedup_drops`` is the paper's k-means formulation: clusters,
  within-cluster exact edges, the lowest-centroid-cosine keep rule.
  Its recall against the exact arm is gated in the driver callable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DIM = 64
# tau = 0.9 -> tau^2 as an exact rational
TAU_NUM = 81
TAU_DEN = 100


def list_matrix(col: pa.ChunkedArray | pa.Array, dim: int, dtype=np.int64) -> np.ndarray:
    """Decode a fixed-width list<float> column to an (n, dim) matrix via
    flatten+reshape — no per-row Python objects (vs to_pylist)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.zeros((0, dim), dtype=dtype)
    flat = np.asarray(arr.flatten(), dtype=dtype)
    return flat.reshape(len(arr), dim)


def hashed_tf_counts(batch: pa.Table, dim: int = DIM) -> tuple[np.ndarray, np.ndarray]:
    """(ids, int64 (n, dim) matrix) hashed-TF token counts, md5 bucketing
    identical to the oracle's ``md5_number_lower(tok) % dim``.  The raw
    integer form — use this when the consumer matmuls (dsir weights,
    edge tests) to skip the Arrow list<float32> round-trip."""
    from .dedup import _duck
    from .util import TOKEN_PATTERN

    sub = batch.select(["doc_id", "text"])  # noqa: F841 — duckdb scan
    tf = (
        _duck()
        .execute(
            f"""
            with toks as (
              select doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')),
                     '{TOKEN_PATTERN}')) tok
              from sub)
            select doc_id, cast(md5_number_lower(tok) % {dim} as bigint) b,
                   count(*)::bigint c
            from toks group by 1, 2
            """
        )
        .arrow()
    )
    ids = batch.column("doc_id").to_numpy()
    pos = {int(d): i for i, d in enumerate(ids)}
    mat = np.zeros((len(ids), dim), dtype=np.int64)
    mat[
        [pos[int(d)] for d in tf.column("doc_id").to_pylist()],
        tf.column("b").to_numpy(),
    ] = tf.column("c").to_numpy()
    return ids, mat


def hashed_tf_batch(batch: pa.Table, dim: int = DIM) -> pa.Table:
    """(vec_id, embedding list<float>) hashed-TF vectors — integer-valued
    floats (token counts); Arrow form of hashed_tf_counts for pipelines
    that ship the vectors through the object store."""
    ids, mat = hashed_tf_counts(batch, dim)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in mat],
                pa.list_(pa.float32()),
            ),
        }
    )


def hashed_tf(ds, dim: int = DIM):
    return ds.map_batches(
        hashed_tf_batch, batch_format="pyarrow", fn_kwargs={"dim": dim}
    )


def _edges_int(ids_a, mat_a, ids_b, mat_b) -> tuple[np.ndarray, np.ndarray]:
    """Exact-threshold cosine edges between two int matrices (a rows x b
    rows), keeping doc_a < doc_b: TAU_DEN·dot² >= TAU_NUM·|a|²·|b|².

    The dot runs in float64 BLAS and is EXACT: every partial sum is an
    integer <= dim·max_count² (~1e10 worst case on real text) < 2^53, so
    the cast back to int64 is lossless — ~100x over numpy's non-BLAS
    int64 matmul.  The threshold comparison itself stays in int64."""
    dot = (mat_a.astype(np.float64) @ mat_b.astype(np.float64).T).astype(np.int64)
    n2a = (mat_a * mat_a).sum(axis=1)
    n2b = (mat_b * mat_b).sum(axis=1)
    # int64-safe: dot <= dim * max_count^2 (~1e5 on real text), so
    # TAU_DEN * dot^2 and TAU_NUM * |a|^2 * |b|^2 stay far below 2^63
    ok = (dot > 0) & (TAU_DEN * dot * dot >= TAU_NUM * n2a[:, None] * n2b[None, :])
    ok &= ids_a[:, None] < ids_b[None, :]
    ai, bi = np.nonzero(ok)
    return ids_a[ai], ids_b[bi]


def _edges_int_blocked(
    ids, mat, block: int = 2048
) -> tuple[np.ndarray, np.ndarray]:
    """Within-group exact edges with BOUNDED memory: one (block x n)
    stripe of the dot matrix in flight at a time (a full n x n int64
    matrix at a 100k-doc bucket would be 80 GB; a 2048-row stripe is
    ~1.6 GB worst-case).  Same result as _edges_int(ids, mat, ids, mat)."""
    outs_a, outs_b = [], []
    for s in range(0, len(ids), block):
        a, b = _edges_int(ids[s : s + block], mat[s : s + block], ids, mat)
        outs_a.append(a)
        outs_b.append(b)
    if not outs_a:
        e = np.empty(0, np.int64)
        return e, e
    return np.concatenate(outs_a), np.concatenate(outs_b)


def semantic_pair_edges(tf_ds, dim: int = DIM):
    """(doc_a, doc_b) exact cosine>=tau pairs.  The full matrix rides one
    ``ray.put``; each batch matmuls against it — the O(n²) verification
    baseline (see module docstring), not the scale path."""
    import ray

    full = tf_ds.to_pandas()  # bounded: the driver corpus (stated above)
    full_ids = full["vec_id"].to_numpy()
    full_mat = np.stack(full["embedding"].to_numpy()).astype(np.int64)
    ref = ray.put((full_ids, full_mat))

    def _cand(batch: pa.Table) -> pa.Table:
        fids, fmat = ray.get(ref)
        ids = batch.column("vec_id").to_numpy()
        mat = list_matrix(batch.column("embedding"), fmat.shape[1])
        a, b = _edges_int(ids, mat, fids, fmat)
        return pa.table(
            {
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
            }
        )

    return tf_ds.map_batches(_cand, batch_format="pyarrow")


def semantic_duplicate_clusters(docs_ds, dim: int = DIM, tf=None):
    """EXACT semantic components (doc_id, cluster_id, cluster_size):
    hashed-TF → exact threshold edges → distributed min-label
    propagation (the same component machinery as the Jaccard arm).
    Pass a materialized ``tf`` (from hashed_tf) to share the tokenize +
    hash scan with semdedup_drops."""
    from .dedup import components_from_pairs

    if tf is None:
        tf = hashed_tf(docs_ds, dim).materialize()
    pairs = semantic_pair_edges(tf, dim).materialize()
    return components_from_pairs(pairs)


def semdedup_drops(docs_ds, k: int = 16, iters: int = 5, dim: int = DIM, tf=None):
    """The SemDeDup SCALE path: k-means clusters, within-cluster exact
    threshold edges, local components, and the paper's keep rule (keep
    the member with the LOWEST cosine to the cluster centroid; ties by
    doc_id).  Returns (doc_id,) rows for every DROPPED doc.  Pass a
    materialized ``tf`` to share the tokenize + hash scan with the exact
    arm."""
    import ray

    from .ann import kmeans

    if tf is None:
        tf = hashed_tf(docs_ds, dim).materialize()
    cents = kmeans(tf, k=k, iters=iters)
    c_ref = ray.put(cents)

    def _assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        mat = list_matrix(batch.column("embedding"), c.shape[1], dtype=np.float64)
        d2 = ((mat * mat).sum(axis=1)[:, None]
              - 2 * mat @ c.T
              + (c * c).sum(axis=1)[None, :])
        return batch.append_column(
            "cell", pa.array(np.argmin(d2, axis=1).astype(np.int64), pa.int64())
        )

    def _dedup_cell(group: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        ids = group.column("vec_id").to_numpy()
        mat = list_matrix(group.column("embedding"), c.shape[1])
        a, b = _edges_int(ids, mat, ids, mat)
        if not len(a):
            return pa.table({"doc_id": pa.array([], pa.int64())})
        # local components: union-find over the cluster's edges
        parent = {int(i): int(i) for i in np.unique(np.concatenate((a, b)))}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(a.tolist(), b.tolist()):
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)
        comp: dict[int, list[int]] = {}
        for x in parent:
            comp.setdefault(find(x), []).append(x)
        # keep rule: LOWEST cosine to the cluster centroid survives
        cell = int(group.column("cell")[0].as_py())
        cent = c[cell]
        cn = np.linalg.norm(cent)
        pos = {int(i): j for j, i in enumerate(ids)}
        dropped: list[int] = []
        for members in comp.values():
            sims = []
            for m in sorted(members):
                v = mat[pos[m]].astype(np.float64)
                nv = np.linalg.norm(v)
                sims.append((float(v @ cent / (nv * cn)) if nv * cn > 0 else 0.0, m))
            keep = min(sims)[1]  # lowest sim, tie -> lowest doc_id
            dropped.extend(m for _s, m in sims if m != keep)
        return pa.table({"doc_id": pa.array(sorted(dropped), pa.int64())})

    return (
        tf.map_batches(_assign, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(_dedup_cell, batch_format="pyarrow")
    )


# --- sign-bucketed SCALE path (the driver-checked arm) ----------------------
# Bucket keys: sign bits of EXACT integer dot products between the
# hashed-TF vector and N_PLANES md5-derived integer hyperplanes, with
# deterministic MULTI-PROBE: a plane whose |dot| is under the margin
# (dot² < WILD_M2·|v|², integer-exact) is a WILDCARD, and the doc lands
# in every bucket consistent with its non-wildcard signs (<= 2^N_PLANES
# rows, typically 2-4x).  Near-duplicate pairs disagree on a plane only
# when BOTH dots are confidently away from zero — rare at cosine >= 0.9 —
# so recall is high and every rule is SQL-reproducible: the oracle
# computes the same dots from the token stream and applies the same
# wildcard test.  Edges are computed ONLY within buckets
# (groupby(bucket).map_groups — per-bucket cost, no corpus broadcast, no
# driver materialization); duplicate edges from shared probes are
# harmless to the component propagation.  The all-pairs
# semantic_pair_edges above remains as the driver-scale recall GATE.

# N_PLANES sizes the bucket space (2^N_PLANES buckets).  4 suits the
# driver corpora (and the oracle SQL is tied to it); at 100-TB scale the
# knob RISES (e.g. 12-16 planes -> 4k-65k buckets) so per-bucket
# populations stay bounded — tools/stress_ops.py at 1M docs shows the
# 16-bucket setting saturating its hot-bucket caps, which is the signal
# to raise it.
N_PLANES = 4
WILD_M2 = 90_000  # margin² coefficient: wildcard iff dot² < 90000 · |v|²


def _hyperplanes(dim: int = DIM) -> np.ndarray:
    from .util import md5_u64

    return np.array(
        [
            [(md5_u64(f"sem|{p}|{b}") % 2001) - 1000 for b in range(dim)]
            for p in range(N_PLANES)
        ],
        np.int64,
    )


_H = _hyperplanes()


def probe_buckets(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(row_idx, bucket) pairs: every bucket k in [0, 2^N_PLANES) whose
    bit p matches sign(dot_p) on all non-wildcard planes."""
    dots = mat @ _H.T  # exact int64: |dot| <= dim * max_count * 1000
    n2 = (mat * mat).sum(axis=1)
    pos = dots > 0
    wild = dots * dots < WILD_M2 * n2[:, None]
    rows, buckets = [], []
    for k in range(1 << N_PLANES):
        bits = np.array([(k >> p) & 1 for p in range(N_PLANES)], bool)
        ok = ((bits[None, :] == pos) | wild).all(axis=1)
        idx = np.nonzero(ok)[0]
        rows.append(idx)
        buckets.append(np.full(len(idx), k, np.int64))
    return np.concatenate(rows), np.concatenate(buckets)


def semantic_pair_edges_bucketed(tf_ds, dim: int = DIM, max_bucket: int = 100_000):
    """(doc_a, doc_b) exact cosine>=tau pairs restricted to docs sharing
    a probe bucket — the scale path: one keyed exchange, per-bucket
    matmuls; pairs sharing several buckets emit duplicate edge rows."""

    def _bucketize(batch: pa.Table) -> pa.Table:
        mat = list_matrix(batch.column("embedding"), dim)
        rows, buckets = probe_buckets(mat)
        out = batch.take(rows)
        return out.append_column("bucket", pa.array(buckets, pa.int64()))

    def _bucket_edges(group: pa.Table) -> pa.Table:
        if len(group) > max_bucket:  # never at driver scale; logged drop
            print(
                f"semantic_pair_edges_bucketed: hot bucket capped "
                f"{len(group)} -> {max_bucket}"
            )
            group = group.sort_by("vec_id").slice(0, max_bucket)
        ids = group.column("vec_id").to_numpy()
        mat = list_matrix(group.column("embedding"), dim)
        a, b = _edges_int_blocked(ids, mat)
        return pa.table(
            {"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())}
        )

    return (
        tf_ds.map_batches(_bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_bucket_edges, batch_format="pyarrow")
    )


def semantic_duplicate_clusters_bucketed(docs_ds, dim: int = DIM, tf=None):
    """Scale-path semantic components (doc_id, cluster_id, cluster_size):
    hashed-TF -> sign-bucketed exact edges -> distributed min-label
    propagation.  This is the driver-checked arm; its oracle applies the
    SAME bucket restriction."""
    from .dedup import components_from_pairs

    if tf is None:
        tf = hashed_tf(docs_ds, dim).materialize()
    pairs = semantic_pair_edges_bucketed(tf, dim).materialize()
    return components_from_pairs(pairs)
