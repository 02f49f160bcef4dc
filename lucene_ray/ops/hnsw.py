"""HNSW approximate nearest-neighbor graphs, one graph PER PARTITION.

Reference mapping (util/hnsw/HnswGraphBuilder.java:1,
Lucene99HnswVectorsFormat): Lucene builds an independent HNSW graph per
SEGMENT and a query searches every segment's graph, merging top-k — the
same shape here: the corpus is split into partitions, one Ray task builds
one graph (CPU-bound, embarrassingly parallel), and a query fans out over
the per-partition graphs and merges (TopDocs.merge discipline).

The graph itself follows the HNSW paper (Malkov & Yashunin 2016, public):
- multi-layer with geometric level assignment (mL = 1/ln(M)),
- insert: greedy descent from the entry point through upper layers, then
  beam search (efConstruction) + neighbor-diversity pruning per layer,
- search: greedy descent + beam (efSearch) on layer 0.

Approximate by nature — no SQL oracle (the driver records the weaker
rows-only check); recall is pinned by tests against the exact brute-force
top-k (>= 0.9 at the default parameters on the synthetic embeddings).

Determinism: level assignment and all tie-breaks derive from hashed
vector ids (no RNG state), so builds are reproducible across runs and
partitioning is deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import _emb_matrix

M = 16  # max neighbors per node per layer (HnswGraphBuilder default)
EF_CONSTRUCTION = 100
EF_SEARCH = 64


class HnswGraph:
    """In-memory HNSW over a (n, dim) float64 matrix (cosine)."""

    def __init__(self, ids: np.ndarray, mat: np.ndarray):
        self.ids = ids
        n = len(ids)
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0] = 1.0
        self.vec = mat / nrm[:, None]  # unit vectors: cosine == dot
        # deterministic level per node from the id hash
        h = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        u = (h.astype(np.float64) + 1.0) / float(1 << 24)
        ml = 1.0 / np.log(M)
        self.level = np.minimum((-np.log(u) * ml).astype(np.int64), 8)
        self.max_level = int(self.level.max()) if n else 0
        # adjacency: per layer, list[node] -> int64 array of neighbors
        self.nbrs: list[list[np.ndarray]] = [
            [np.empty(0, dtype=np.int64) for _ in range(n)]
            for _ in range(self.max_level + 1)
        ]
        self.entry = -1
        for i in np.argsort(-self.level, kind="stable"):  # top levels first
            self._insert(int(i))

    # -- distance helpers (cosine similarity, higher = closer)
    def _sims(self, q: np.ndarray, cand: np.ndarray) -> np.ndarray:
        return self.vec[cand] @ q

    def _greedy(self, q: np.ndarray, start: int, layer: int) -> int:
        cur = start
        cur_sim = float(self.vec[cur] @ q)
        improved = True
        while improved:
            improved = False
            nb = self.nbrs[layer][cur]
            if len(nb):
                sims = self._sims(q, nb)
                j = int(np.argmax(sims))
                if sims[j] > cur_sim:
                    cur, cur_sim = int(nb[j]), float(sims[j])
                    improved = True
        return cur

    def _beam(self, q: np.ndarray, start: int, layer: int, ef: int):
        """Best-first beam search; returns (nodes, sims) sorted sim desc."""
        visited = {start}
        start_sim = float(self.vec[start] @ q)
        frontier = [(start, start_sim)]  # max-candidates (unsorted list)
        best: list[tuple[int, float]] = [(start, start_sim)]
        while frontier:
            # pop the most promising candidate
            k = max(range(len(frontier)), key=lambda i: frontier[i][1])
            node, sim = frontier.pop(k)
            worst = min(b[1] for b in best) if len(best) >= ef else -np.inf
            if sim < worst:
                break
            nb = [int(x) for x in self.nbrs[layer][node] if int(x) not in visited]
            if not nb:
                continue
            visited.update(nb)
            sims = self._sims(q, np.asarray(nb, dtype=np.int64))
            for x, s in zip(nb, sims):
                s = float(s)
                if len(best) < ef or s > min(b[1] for b in best):
                    best.append((x, s))
                    frontier.append((x, s))
                    if len(best) > ef:
                        best.remove(min(best, key=lambda b: (b[1], -b[0])))
        best.sort(key=lambda b: (-b[1], self.ids[b[0]]))
        return best

    def _select_diverse(self, q_vec: np.ndarray, cand: list[tuple[int, float]], m: int):
        """Heuristic neighbor selection (HnswGraphBuilder diversity check):
        keep a candidate only if it is closer to the new node than to every
        already-kept neighbor."""
        kept: list[int] = []
        for node, sim in cand:
            ok = True
            for kn in kept:
                if float(self.vec[node] @ self.vec[kn]) > sim:
                    ok = False
                    break
            if ok:
                kept.append(node)
            if len(kept) >= m:
                break
        return kept

    def _insert(self, i: int) -> None:
        if self.entry < 0:
            self.entry = i
            return
        q = self.vec[i]
        lvl = int(self.level[i])
        cur = self.entry
        for layer in range(int(self.level[self.entry]), lvl, -1):
            if layer <= self.max_level and layer < len(self.nbrs):
                cur = self._greedy(q, cur, layer)
        for layer in range(min(lvl, int(self.level[self.entry])), -1, -1):
            cand = self._beam(q, cur, layer, EF_CONSTRUCTION)
            m = M if layer > 0 else 2 * M
            kept = self._select_diverse(q, cand, m)
            self.nbrs[layer][i] = np.asarray(kept, dtype=np.int64)
            for kn in kept:  # backlinks with pruning
                nb = self.nbrs[layer][kn]
                if len(nb) < m:
                    self.nbrs[layer][kn] = np.append(nb, i)
                else:
                    allc = np.append(nb, i)
                    sims = self._sims(self.vec[kn], allc)
                    order = np.argsort(-sims, kind="stable")
                    self.nbrs[layer][kn] = allc[order[:m]]
            cur = cand[0][0]
        if lvl > int(self.level[self.entry]):
            self.entry = i

    def search(self, q: np.ndarray, k: int, ef: int = EF_SEARCH):
        """[(external id, cosine sim)] top-k."""
        if self.entry < 0:
            return []
        qn = q / (np.linalg.norm(q) or 1.0)
        cur = self.entry
        for layer in range(int(self.level[self.entry]), 0, -1):
            cur = self._greedy(qn, cur, layer)
        best = self._beam(qn, cur, 0, max(ef, k))
        return [(int(self.ids[n]), float(s)) for n, s in best[:k]]


def hnsw_topk(
    ds,
    queries,
    k: int = 10,
    partitions: int = 4,
    ef_search: int = EF_SEARCH,
) -> pa.Table:
    """(query_id, rnk, neighbor_id): per-partition HNSW graphs built in
    parallel Ray tasks (the per-segment graph model), searched fan-out,
    merged by (sim desc, neighbor_id asc).  Self-matches excluded."""
    import ray

    q_ids, q_mat, _ = queries
    q_ref = ray.put((q_ids, q_mat))

    def _part(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        part = (ids % partitions).astype(np.int32)
        return batch.append_column("part", pa.array(part))

    def _build_and_search(group: pa.Table) -> pa.Table:
        qi, qm = ray.get(q_ref)
        ids = group.column("vec_id").to_numpy().astype(np.int64)
        mat = _emb_matrix(group)
        g = HnswGraph(ids, mat)
        rows_q, rows_n, rows_s = [], [], []
        for j, qid in enumerate(qi):
            for nid, sim in g.search(qm[j], k + 1, ef_search):
                if nid == int(qid):
                    continue
                rows_q.append(int(qid))
                rows_n.append(nid)
                rows_s.append(sim)
        return pa.table(
            {
                "query_id": pa.array(rows_q, pa.int64()),
                "neighbor_id": pa.array(rows_n, pa.int64()),
                "sim": pa.array(rows_s, pa.float64()),
            }
        )

    cands = (
        ds.map_batches(_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_build_and_search, batch_format="pyarrow")
    )
    from .ann import _finish_topk

    return _finish_topk(cands, k)
