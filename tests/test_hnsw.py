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
