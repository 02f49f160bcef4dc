"""HNSW approximate nearest-neighbor: PERSISTED per-partition graphs.

Reference mapping (util/hnsw/HnswGraphBuilder.java:1,
codecs/lucene99/Lucene99HnswVectorsWriter.java): Lucene builds an
independent HNSW graph per SEGMENT, WRITES it with the segment, and a
query loads the per-segment graphs and merges top-k — the same
build/query split here:

- ``build_hnsw_index(ds, out_dir, partitions)``: one Ray task per
  partition builds a graph (CPU-bound, embarrassingly parallel) and
  persists it as ``part=K/graph.npz`` (ids + unit vectors + levels +
  per-layer neighbor arrays + entry point),
- ``hnsw_index_topk(out_dir, queries, k)``: loads the persisted graphs
  (ZERO graph construction), searches each in a parallel Ray task, and
  merges by (sim desc, neighbor_id) — TopDocs.merge discipline.

The graph follows the HNSW paper (Malkov & Yashunin 2016, public):
multi-layer with geometric level assignment (mL = 1/ln(M)); insert =
greedy descent through upper layers + efConstruction beam + neighbor
diversity pruning; search = greedy descent + efSearch beam on layer 0.

The build is VECTORIZED: fixed-capacity int32 neighbor tables (no
per-link reallocation), heap-based beams, an epoch-stamped visited
array (no per-insert clearing), and one float32 matmul per beam hop.

Approximate by nature — no SQL oracle (the driver records the weaker
rows-only check); recall is pinned by tests against the exact
brute-force top-k (>= 0.9 at the default parameters).

Determinism: level assignment and all tie-breaks derive from hashed
vector ids (no RNG state), so builds are reproducible across runs and
partitioning is deterministic.
"""

from __future__ import annotations

import heapq
import io
import json
import os

import numpy as np
import pyarrow as pa

from .ann import _emb_matrix

M = 16  # max neighbors per node per layer (HnswGraphBuilder default)
EF_CONSTRUCTION = 100
EF_SEARCH = 64
MAX_LEVEL = 8


def _levels_for_ids(ids: np.ndarray) -> np.ndarray:
    """Deterministic per-node level from the id hash (no RNG)."""
    h = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
    u = (h.astype(np.float64) + 1.0) / float(1 << 24)
    ml = 1.0 / np.log(M)
    return np.minimum((-np.log(u) * ml).astype(np.int64), MAX_LEVEL)


class HnswGraph:
    """In-memory HNSW over an (n, dim) matrix (cosine via unit vectors).

    Neighbor storage per layer: ``nbr`` int32 (n_layer, cap) +
    ``cnt`` int32 (n_layer,); upper layers are compact (only nodes with
    level >= L) with an int32 ``idx_map`` from global node -> layer row.
    """

    def __init__(self, ids: np.ndarray, mat: np.ndarray, build: bool = True):
        self.ids = np.asarray(ids, dtype=np.int64)
        n = len(self.ids)
        mat = np.asarray(mat, dtype=np.float32)
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0] = 1.0
        self.vec = (mat / nrm[:, None]).astype(np.float32)
        self.level = _levels_for_ids(self.ids)
        self.max_level = int(self.level.max()) if n else 0
        self.entry = -1
        # layer tables
        self.nbr: list[np.ndarray] = []
        self.cnt: list[np.ndarray] = []
        self.idx_map: list[np.ndarray] = []  # global node -> row in layer table
        for layer in range(self.max_level + 1):
            cap = 2 * M if layer == 0 else M
            members = np.nonzero(self.level >= layer)[0].astype(np.int32)
            imap = np.full(n, -1, dtype=np.int32)
            imap[members] = np.arange(len(members), dtype=np.int32)
            self.nbr.append(np.full((len(members), cap), -1, dtype=np.int32))
            self.cnt.append(np.zeros(len(members), dtype=np.int32))
            self.idx_map.append(imap)
        # epoch-stamped visited set (allocated once, O(1) reset per beam)
        self._vtag = np.zeros(n, dtype=np.int64)
        self._vgen = 0
        if build and n:
            for i in np.argsort(-self.level, kind="stable"):  # top levels first
                self._insert(int(i))

    # -- neighbor access
    def _neighbors(self, node: int, layer: int) -> np.ndarray:
        row = self.idx_map[layer][node]
        return self.nbr[layer][row, : self.cnt[layer][row]]

    def _greedy(self, q: np.ndarray, start: int, layer: int) -> int:
        cur = start
        cur_sim = float(self.vec[cur] @ q)
        while True:
            nb = self._neighbors(cur, layer)
            if not len(nb):
                return cur
            sims = self.vec[nb] @ q
            j = int(np.argmax(sims))
            if sims[j] <= cur_sim:
                return cur
            cur, cur_sim = int(nb[j]), float(sims[j])

    _BEAM_FANOUT = 8  # frontier candidates expanded per matmul

    def _beam(self, q: np.ndarray, start: int, layer: int, ef: int,
              patience: int | None = None):
        """Best-first beam; returns [(node, sim)] sorted (sim desc, id asc).

        Expands up to _BEAM_FANOUT frontier candidates per iteration so
        neighbor scoring is one larger matmul instead of many tiny ones
        (same beam semantics: every expanded candidate was >= the current
        floor when popped; the visited tag dedupes).

        ``patience``: early exit when the result queue SATURATES
        (reference search/PatienceKnnVectorQuery.java +
        HnswQueueSaturationCollector.java: no queue growth across more
        than ``patience`` consecutive candidate expansions stops the
        search; the 0.995 saturation ratio degenerates to "no adds" at
        our batch granularity, counted per expanded candidate).  The
        exit count rides ``self.last_beam_stats``."""
        self._vgen += 1
        gen = self._vgen
        tag = self._vtag
        # multi-start (SeededHnswGraphSearcher: seed nodes replace the
        # entry point's queue); the single-entry path is the 1-seed case
        starts = np.atleast_1d(np.asarray(start, dtype=np.int64))
        tag[starts] = gen
        s0s = self.vec[starts] @ q
        cand = [(-float(s), int(n)) for s, n in zip(s0s, starts)]
        heapq.heapify(cand)  # max-heap via negation
        best = [(float(s), int(n)) for s, n in zip(s0s, starts)]
        heapq.heapify(best)  # min-heap, size <= ef
        while len(best) > ef:
            heapq.heappop(best)
        fanout = self._BEAM_FANOUT
        saturated = 0
        expanded_total = 0
        early_exit = False
        while cand:
            if patience is not None and saturated > patience:
                early_exit = True
                break
            floor = best[0][0] if len(best) >= ef else -np.inf
            gathered = []
            n_expanded = 0
            while cand and len(gathered) < fanout:
                neg, node = heapq.heappop(cand)
                if -neg < floor:
                    cand.clear()  # every remaining candidate is worse
                    break
                n_expanded += 1
                nb = self._neighbors(node, layer)
                if len(nb):
                    gathered.append(nb)
            expanded_total += n_expanded
            if not gathered:
                if patience is not None:
                    saturated += n_expanded
                continue
            nb = np.concatenate(gathered) if len(gathered) > 1 else gathered[0]
            nb = nb[tag[nb] != gen]
            if len(nb) > 1:
                nb = np.unique(nb)  # dedupe across the gathered frontiers
            if not len(nb):
                # all gathered neighbors already visited: zero queue growth,
                # counts toward saturation like the no-gathered path above
                if patience is not None:
                    saturated += n_expanded
                continue
            tag[nb] = gen
            sims = self.vec[nb] @ q
            adds = 0
            if len(best) >= ef:
                # prefilter on the current floor: only candidates that can
                # enter ``best`` are pushed (the floor only rises, so the
                # kept set is a superset of the strictly-needed ones)
                keep = sims > floor
                if not keep.any():
                    if patience is not None:
                        saturated += n_expanded
                    continue
                nb, sims = nb[keep], sims[keep]
            for s, x in zip(sims.tolist(), nb.tolist()):
                if len(best) < ef:
                    heapq.heappush(best, (s, x))
                    heapq.heappush(cand, (-s, x))
                    adds += 1
                    if len(best) >= ef:
                        floor = best[0][0]
                elif s > floor:
                    heapq.heapreplace(best, (s, x))
                    heapq.heappush(cand, (-s, x))
                    adds += 1
                    floor = best[0][0]
            if patience is not None:
                saturated = saturated + n_expanded if adds == 0 else 0
        self.last_beam_stats = {
            "expanded": expanded_total,
            "early_exit": early_exit,
        }
        out = sorted(best, key=lambda b: (-b[0], self.ids[b[1]]))
        return [(x, s) for s, x in out]

    def _select_diverse(self, cand: list[tuple[int, float]], m: int) -> list[int]:
        """HnswGraphBuilder diversity heuristic: keep a candidate only if it
        is closer to the new node than to every already-kept neighbor.
        One (|cand| x |cand|) matmul replaces per-candidate scoring."""
        nodes = np.fromiter((c[0] for c in cand), dtype=np.int64, count=len(cand))
        sims_to_new = np.fromiter((c[1] for c in cand), dtype=np.float32, count=len(cand))
        cross = self.vec[nodes] @ self.vec[nodes].T  # candidate-candidate sims
        kept_rows: list[int] = []
        for j in range(len(nodes)):
            if kept_rows and bool((cross[j, kept_rows] > sims_to_new[j]).any()):
                continue
            kept_rows.append(j)
            if len(kept_rows) >= m:
                break
        return [int(nodes[j]) for j in kept_rows]

    def _link(self, layer: int, a: int, b: int, cap: int) -> None:
        """Backlink b -> a with sim-ranked truncation when the row is full."""
        row = self.idx_map[layer][a]
        c = int(self.cnt[layer][row])
        if c < cap:
            self.nbr[layer][row, c] = b
            self.cnt[layer][row] = c + 1
            return
        allc = np.empty(c + 1, dtype=np.int32)
        allc[:c] = self.nbr[layer][row, :c]
        allc[c] = b
        sims = self.vec[allc] @ self.vec[a]
        order = np.argsort(-sims, kind="stable")[:cap]
        self.nbr[layer][row, :cap] = allc[order]

    def _insert(self, i: int) -> None:
        if self.entry < 0:
            self.entry = i
            return
        q = self.vec[i]
        lvl = int(self.level[i])
        entry_lvl = int(self.level[self.entry])
        cur = self.entry
        for layer in range(entry_lvl, lvl, -1):
            cur = self._greedy(q, cur, layer)
        for layer in range(min(lvl, entry_lvl), -1, -1):
            cand = self._beam(q, cur, layer, EF_CONSTRUCTION)
            cap = 2 * M if layer == 0 else M
            kept = self._select_diverse(cand, M)
            row = self.idx_map[layer][i]
            self.nbr[layer][row, : len(kept)] = np.asarray(kept, dtype=np.int32)
            self.cnt[layer][row] = len(kept)
            for kn in kept:
                self._link(layer, int(kn), i, cap)
            cur = cand[0][0]
        if lvl > entry_lvl:
            self.entry = i

    def search(self, q: np.ndarray, k: int, ef: int = EF_SEARCH,
               accept: np.ndarray | None = None,
               seeds: np.ndarray | None = None,
               patience: int | None = None):
        """[(external id, cosine sim)] top-k.

        ``accept`` (bool mask over EXTERNAL ids) is the filtered-kNN path
        (reference KnnFloatVectorQuery with a filter Query: traversal
        crosses non-matching nodes, only accepted docs are collected).
        Deviation (documented): instead of the reference's visited-node
        budget that flips to exact search, the beam over-fetches (4x ef)
        and falls back to EXACT scoring over the accepted vectors when
        fewer than k accepted hits survive — same contract (exact results
        under very selective filters), simpler budget rule."""
        if self.entry < 0:
            return []
        qn = (q / (np.linalg.norm(q) or 1.0)).astype(np.float32)
        # SeededKnnVectorQuery (search/SeededKnnVectorQuery.java +
        # util/hnsw/SeededHnswGraphSearcher.java): seed EXTERNAL ids become
        # the layer-0 entry points, skipping the upper-layer greedy
        # descent; with no valid seed the search falls back to the
        # ordinary entry point (the reference's behavior when the seed
        # query matches nothing in the segment)
        cur: int | np.ndarray
        if seeds is not None and len(seeds):
            nodes = np.nonzero(np.isin(self.ids, np.asarray(seeds)))[0]
            if len(nodes):
                cur = nodes
            else:
                seeds = None
        if seeds is None or not len(seeds):
            cur = self.entry
            for layer in range(int(self.level[self.entry]), 0, -1):
                cur = self._greedy(qn, cur, layer)
        if accept is None:
            best = self._beam(qn, cur, 0, max(ef, k), patience=patience)
            return [(int(self.ids[n]), float(s)) for n, s in best[:k]]
        best = self._beam(qn, cur, 0, max(4 * ef, 4 * k), patience=patience)
        hits = [
            (int(self.ids[n]), float(s))
            for n, s in best
            if accept[int(self.ids[n])]
        ][:k]
        if len(hits) >= k:
            return hits
        # exact fallback over the accepted subset
        ok = np.nonzero(accept[self.ids])[0]
        if len(ok) == 0:
            return []
        sims = self.vec[ok] @ qn
        order = np.lexsort((self.ids[ok], -sims))[:k]
        return [(int(self.ids[ok[i]]), float(sims[i])) for i in order]

    # -- persistence (Lucene99HnswVectorsWriter analogue: the graph is an
    # index artifact written once at build time, loaded read-only at query)
    def to_npz_bytes(self) -> bytes:
        arrays = {
            "ids": self.ids,
            "vec": self.vec,
            "level": self.level,
            "entry": np.asarray([self.entry], dtype=np.int64),
        }
        for layer in range(self.max_level + 1):
            arrays[f"nbr_{layer}"] = self.nbr[layer]
            arrays[f"cnt_{layer}"] = self.cnt[layer]
        buf = io.BytesIO()
        np.savez_compressed(buf, **arrays)
        return buf.getvalue()

    @classmethod
    def from_npz_bytes(cls, data: bytes) -> "HnswGraph":
        z = np.load(io.BytesIO(data))
        g = cls.__new__(cls)
        g.ids = z["ids"]
        g.vec = z["vec"]
        g.level = z["level"]
        g.entry = int(z["entry"][0])
        g.max_level = int(g.level.max()) if len(g.ids) else 0
        n = len(g.ids)
        g.nbr, g.cnt, g.idx_map = [], [], []
        for layer in range(g.max_level + 1):
            members = np.nonzero(g.level >= layer)[0].astype(np.int32)
            imap = np.full(n, -1, dtype=np.int32)
            imap[members] = np.arange(len(members), dtype=np.int32)
            g.nbr.append(z[f"nbr_{layer}"])
            g.cnt.append(z[f"cnt_{layer}"])
            g.idx_map.append(imap)
        g._vtag = np.zeros(n, dtype=np.int64)
        g._vgen = 0
        return g


# ---------------------------------------------------------------------------
# persisted index: build / query split
# ---------------------------------------------------------------------------

def build_hnsw_index(ds, out_dir: str, partitions: int = 4) -> dict:
    """Build a PERSISTED per-partition HNSW index: hash-partition by
    vec_id, build one graph per partition in parallel Ray tasks, write
    each as ``part=K/graph.npz``.  Returns manifest metadata.

    At 100 TB this is the per-segment graph build of
    Lucene99HnswVectorsWriter: partitions are independent, the build
    resumes per-partition (a part dir whose graph.npz already exists is
    skipped — valid because vec_id % partitions is deterministic), and
    query-side work never constructs a graph.  ``out_dir`` is per-corpus:
    point different corpora at different dirs."""
    os.makedirs(out_dir, exist_ok=True)

    def _part(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        part = (ids % partitions).astype(np.int32)
        return batch.append_column("part", pa.array(part))

    def _build_and_save(group: pa.Table) -> pa.Table:
        part = int(group.column("part")[0].as_py())
        ids = group.column("vec_id").to_numpy().astype(np.int64)
        pdir = os.path.join(out_dir, f"part={part}")
        final = os.path.join(pdir, "graph.npz")
        if os.path.exists(final):  # resume: this partition is already built
            g = None
            max_level = -1
        else:
            mat = _emb_matrix(group)
            g = HnswGraph(ids, mat)
            max_level = g.max_level
            os.makedirs(pdir, exist_ok=True)
            tmp = os.path.join(pdir, ".graph.npz.tmp")
            with open(tmp, "wb") as f:
                f.write(g.to_npz_bytes())
            os.replace(tmp, final)
        return pa.table(
            {
                "part": pa.array([part], pa.int64()),
                "n": pa.array([len(ids)], pa.int64()),
                "max_level": pa.array([max_level], pa.int64()),
                "resumed": pa.array([g is None], pa.bool_()),
            }
        )

    stats = (
        ds.map_batches(_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_build_and_save, batch_format="pyarrow")
        .to_pandas()
    )
    meta = {
        "partitions": int(partitions),
        "M": M,
        "ef_construction": EF_CONSTRUCTION,
        "parts": {int(r.part): int(r.n) for r in stats.itertuples()},
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def hnsw_index_topk(index_dir: str, queries, k: int = 10, ef_search: int = EF_SEARCH):
    """(query_id, rnk, neighbor_id): search the PERSISTED graphs — one Ray
    task per partition loads ``graph.npz`` and beam-searches it; no graph
    construction happens on this path.  Self-matches excluded."""
    import glob

    import ray
    import ray.data as rd

    from .ann import _finish_topk

    q_ids, q_mat, _ = queries
    q_ref = ray.put((np.asarray(q_ids), np.asarray(q_mat)))

    @ray.remote
    def _search_part(path: str) -> pa.Table:
        with open(path, "rb") as f:
            g = HnswGraph.from_npz_bytes(f.read())
        qi, qm = ray.get(q_ref)
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

    paths = sorted(glob.glob(os.path.join(index_dir, "part=*", "graph.npz")))
    tables = ray.get([_search_part.remote(p) for p in paths])
    cands = rd.from_arrow(pa.concat_tables(tables))
    return _finish_topk(cands, k)


def hnsw_topk(
    ds,
    queries,
    k: int = 10,
    partitions: int = 4,
    ef_search: int = EF_SEARCH,
) -> pa.Table:
    """One-shot convenience (build transient graphs + search, no
    persistence) — per-partition graphs in parallel Ray tasks, fan-out
    search, merged by (sim desc, neighbor_id asc).  For repeated query
    workloads use build_hnsw_index + hnsw_index_topk instead."""
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
