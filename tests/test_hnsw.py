"""Persisted HNSW index: build/query split (Lucene99HnswVectorsWriter /
HnswGraphSearcher analogue), resume, and persisted == transient parity."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.ops import ann, hnsw


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(42)
    n, dim = 1200, 24
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([r.tolist() for r in mat], pa.list_(pa.float32())),
        }
    )
    qids = list(range(8))
    qmat = mat[qids].astype(np.float64)
    queries = (np.array(qids), qmat, np.linalg.norm(qmat, axis=1))
    return tbl, queries


def test_persisted_matches_transient(ray_session, corpus, tmp_path_factory):
    import ray.data as rd

    tbl, queries = corpus
    idx = str(tmp_path_factory.mktemp("hnsw") / "idx")
    meta = hnsw.build_hnsw_index(rd.from_arrow(tbl).repartition(3), idx, partitions=3)
    assert sorted(meta["parts"]) == [0, 1, 2]
    got_p = hnsw.hnsw_index_topk(idx, queries, k=10).to_pandas()
    got_t = hnsw.hnsw_topk(
        rd.from_arrow(tbl).repartition(3), queries, k=10, partitions=3
    ).to_pandas()
    assert got_p.equals(got_t)  # same graphs, same merge discipline


def test_query_needs_no_source_and_no_build(ray_session, corpus, tmp_path_factory):
    """Build once, query twice: the second query answers from graph.npz
    alone — the parquet source is DELETED before it runs, so any rebuild
    attempt would fail loudly."""
    import ray.data as rd

    tbl, queries = corpus
    root = tmp_path_factory.mktemp("hnsw_split")
    src = str(root / "embeddings.parquet")
    pq.write_table(tbl, src)
    idx = str(root / "idx")
    hnsw.build_hnsw_index(rd.read_parquet(src), idx, partitions=2)

    first = hnsw.hnsw_index_topk(idx, queries, k=10).to_pandas()
    os.remove(src)  # no source data -> graph construction is impossible
    second = hnsw.hnsw_index_topk(idx, queries, k=10).to_pandas()
    assert first.equals(second)
    assert len(second) > 0


def test_build_resumes_finished_partitions(ray_session, corpus, tmp_path_factory):
    """A partition whose graph.npz exists is NOT rebuilt (kill-resume at
    the partition level, like the segment-build resume path)."""
    import ray.data as rd

    tbl, queries = corpus
    idx = str(tmp_path_factory.mktemp("hnsw_resume") / "idx")
    hnsw.build_hnsw_index(rd.from_arrow(tbl).repartition(2), idx, partitions=2)
    mtimes = {
        p: os.path.getmtime(os.path.join(idx, p, "graph.npz"))
        for p in os.listdir(idx)
        if p.startswith("part=")
    }
    # simulate a crash that lost one partition
    shutil.rmtree(os.path.join(idx, "part=1"))
    hnsw.build_hnsw_index(rd.from_arrow(tbl).repartition(2), idx, partitions=2)
    assert os.path.getmtime(os.path.join(idx, "part=0", "graph.npz")) == mtimes["part=0"]
    assert os.path.exists(os.path.join(idx, "part=1", "graph.npz"))
    got = hnsw.hnsw_index_topk(idx, queries, k=10).to_pandas()
    assert len(got) > 0


def test_persisted_recall_vs_brute(ray_session, corpus, tmp_path_factory):
    import ray.data as rd

    tbl, queries = corpus
    idx = str(tmp_path_factory.mktemp("hnsw_recall") / "idx")
    hnsw.build_hnsw_index(rd.from_arrow(tbl).repartition(2), idx, partitions=2)
    got = hnsw.hnsw_index_topk(idx, queries, k=10).to_pandas()
    brute = ann.brute_topk(rd.from_arrow(tbl), queries, k=10).to_pandas()
    truth = {q: set(g["neighbor_id"]) for q, g in brute.groupby("query_id")}
    mine = {q: set(g["neighbor_id"]) for q, g in got.groupby("query_id")}
    recalls = [len(truth[q] & mine.get(q, set())) / 10 for q in truth]
    assert np.mean(recalls) >= 0.9, recalls


# --- index-integrated KnnFloatVectorQuery (index/vectors.py) --------------

SF = "/root/testdata/sf0.001"


def _brute_topk(qid: int, k: int = 10) -> list[int]:
    e = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    ids = e.column("vec_id").to_numpy()
    mat = np.stack(e.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float32)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qv = mat[list(ids).index(qid)]
    sims = mat @ qv
    return [int(ids[i]) for i in np.argsort(-sims) if int(ids[i]) != qid][:k]


def test_knn_index_integrated_recall_and_no_rebuild(ray_session):
    from lucene_ray.index import manifest as mf
    from lucene_ray.index.vectors import vector_file
    from lucene_ray.pipelines import fulltext as ft

    t = ft.knn_index_topk(SF, [0, 1, 2], k=10).to_pandas()
    idx = ft.ensure_index(SF)
    files = [
        vector_file(s["dir"], "embedding")
        for s in mf.read_manifest(idx)["segments"]
    ]
    assert files and all(os.path.exists(f) for f in files)
    mtimes = [os.path.getmtime(f) for f in files]
    recalls = [
        len(set(t[t.query_id == q].neighbor_id) & set(_brute_topk(q))) / 10
        for q in (0, 1, 2)
    ]
    assert min(recalls) >= 0.9
    # second run: graphs answered from the artifacts, zero construction
    ft.knn_index_topk(SF, [0], k=5)
    assert [os.path.getmtime(f) for f in files] == mtimes


def test_knn_respects_deletes(ray_session, tmp_path):
    from lucene_ray.index.deletes import clone_for_deletes, delete_by_key
    from lucene_ray.pipelines import fulltext as ft
    from lucene_ray.search.query import KnnFloatVectorQuery
    from lucene_ray.search.searcher import IndexSearcher

    src = ft.ensure_index(SF)
    t = ft.knn_index_topk(SF, [0], k=5).to_pandas()
    victim = int(t[t.query_id == 0].iloc[0].neighbor_id)

    clone = str(tmp_path / "knn_clone")
    clone_for_deletes(src, clone)
    delete_by_key(clone, "doc_id", [victim])
    s = IndexSearcher(clone)
    q_ids, q_mat, _ = ann.load_queries(os.path.join(SF, "embeddings.parquet"), [0])
    hits = s.search(
        KnnFloatVectorQuery("embedding", tuple(map(float, q_mat[0])), 6), 6
    )
    assert victim not in [d for d, _ in hits]
    assert len(hits) > 0


def test_sq8_quantization_roundtrip_and_recall():
    """ScalarQuantizer analogue: int8 round-trip error bounded by scale/2
    per component, and the quantized top-k keeps high recall vs exact on
    a small clustered set."""
    import numpy as np
    import pyarrow as pa

    from lucene_ray.ops.ann import quantize_sq8

    rng = np.random.default_rng(7)
    mat = rng.normal(size=(200, 16)).astype(np.float64)
    q, lo, scale = quantize_sq8(mat)
    assert q.dtype == np.uint8
    deq = lo + q.astype(np.float64) * scale
    assert np.abs(deq - mat).max() <= scale / 2 + 1e-12
    # constant matrix: scale degenerates to the 1.0 fallback, no NaNs
    q2, lo2, scale2 = quantize_sq8(np.full((3, 4), 2.5))
    assert scale2 == 1.0 and (lo2 + q2.astype(float) * scale2 == 2.5).all()


def test_sq8_topk_recall_on_dataset(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lucene_ray.ops.ann import brute_topk, sq8_topk

    rng = np.random.default_rng(11)
    n, d = 400, 24
    mat = rng.normal(size=(n, d))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(mat.tolist(), pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(tbl)
    q_ids = np.array([0, 1, 2], np.int64)
    q_mat = mat[:3]
    queries = (q_ids, q_mat, np.linalg.norm(q_mat, axis=1))
    exact = brute_topk(ds, queries, k=10).to_pandas()
    sq = sq8_topk(rd.from_arrow(tbl), queries, k=10).to_pandas()
    e = exact.groupby("query_id")["neighbor_id"].apply(set)
    s = sq.groupby("query_id")["neighbor_id"].apply(set)
    for qi in e.index:
        assert len(e[qi] & s.get(qi, set())) / len(e[qi]) >= 0.8


def test_filtered_knn_accept_mask():
    """Filtered HNSW search: only accepted external ids may be returned;
    a very selective filter flips to the exact fallback and still returns
    the true filtered top-k."""
    import numpy as np

    from lucene_ray.ops.hnsw import HnswGraph

    rng = np.random.default_rng(3)
    n, d = 300, 16
    mat = rng.normal(size=(n, d)).astype(np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    g = HnswGraph(np.arange(n, dtype=np.int64), mat)
    q = mat[0]
    accept = np.zeros(n, bool)
    accept[::7] = True  # ~43 accepted
    hits = g.search(q, 10, accept=accept)
    assert hits and all(accept[i] for i, _ in hits)
    # exact filtered reference
    ok = np.nonzero(accept)[0]
    sims = mat[ok] @ q
    order = np.lexsort((ok, -sims))[:10]
    exact = [int(ok[i]) for i in order]
    got = [i for i, _ in hits]
    assert len(set(got) & set(exact)) >= 8  # recall gate on a tiny set
    # ultra-selective: 3 accepted -> exact fallback returns all of them
    accept2 = np.zeros(n, bool)
    accept2[[5, 50, 250]] = True
    hits2 = g.search(q, 10, accept=accept2)
    assert sorted(i for i, _ in hits2) == [5, 50, 250]


def test_seeded_knn_entry_points():
    """SeededHnswGraphSearcher analogue: seed external ids start the
    layer-0 beam; invalid seeds fall back to the ordinary entry point;
    seeding never hurts recall of the true nearest neighbor when the
    seed IS near the query."""
    import numpy as np

    from lucene_ray.ops.hnsw import HnswGraph

    rng = np.random.default_rng(11)
    n, d = 400, 16
    mat = rng.normal(size=(n, d)).astype(np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    # external ids deliberately non-contiguous (segment-local remapping)
    ids = np.arange(1000, 1000 + n, dtype=np.int64)
    g = HnswGraph(ids, mat)
    q = mat[7]
    plain = g.search(q, 10)
    assert plain[0][0] == 1007  # self is the nearest

    # seeding with the true nearest finds it immediately
    seeded = g.search(q, 10, seeds=np.array([1007], np.int64))
    assert seeded[0][0] == 1007
    # seeded result quality >= plain on the top hit score
    assert seeded[0][1] >= plain[0][1] - 1e-6

    # seeds not present in the graph fall back to the normal descent
    fb = g.search(q, 10, seeds=np.array([999999], np.int64))
    assert fb == plain

    # multiple far-apart seeds still converge (multi-start beam)
    multi = g.search(q, 10, seeds=ids[[50, 150, 250, 350]])
    exact_top = int(ids[int(np.argmax(mat @ q))])
    assert multi[0][0] == exact_top or multi[0][1] >= plain[0][1] - 0.05


def test_patience_early_exit_and_recall():
    """PatienceKnnVectorQuery semantics: the saturation early exit fires
    (fewer candidate expansions than the unbounded beam), never changes
    the result type/shape, and with the reference default patience the
    top-k stays high-recall vs exact brute force."""
    rng = np.random.default_rng(13)
    # clustered data: saturation happens quickly inside a cluster
    centers = rng.normal(size=(8, 32))
    mat = np.concatenate(
        [c + 0.05 * rng.normal(size=(250, 32)) for c in centers]
    ).astype(np.float32)
    ids = np.arange(len(mat), dtype=np.int64)
    g = hnsw.HnswGraph(ids, mat)
    q = mat[3] + 0.01 * rng.normal(size=32).astype(np.float32)

    plain = g.search(q, 10, ef=64)
    exp_plain = g.last_beam_stats["expanded"]
    assert not g.last_beam_stats["early_exit"]

    pat = g.search(q, 10, ef=64, patience=max(7, 3))
    stats = g.last_beam_stats
    assert len(pat) == 10
    # recall of the patience run vs the unbounded beam
    overlap = len({d for d, _ in pat} & {d for d, _ in plain})
    assert overlap >= 8
    # patience=0 exits as early as possible and must still return k hits
    tiny = g.search(q, 10, ef=64, patience=0)
    assert len(tiny) == 10
    assert g.last_beam_stats["expanded"] <= exp_plain

    # exact brute recall with the reference default patience
    qn = q / np.linalg.norm(q)
    vn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    exact = set(np.argsort(-(vn @ qn))[:10].tolist())
    got = {d for d, _ in pat}
    assert len(got & exact) >= 8
