"""Directory seam (lucene_ray.store): build to a shared remote prefix,
serve from a different "node" (fresh local cache), merge + delete remotely.

The "remote" filesystem is fsspec's file:// scheme — same byte-store
protocol as s3://, shared across Ray worker processes (memory:// is
per-process and can't serve a multi-worker build).  Reference:
lucene/core/src/java/org/apache/lucene/store/Directory.java:1.
"""

import os

import numpy as np
import pyarrow as pa

from lucene_ray import store
from lucene_ray.index import manifest as mf
from lucene_ray.index.build import build_index, build_index_local
from lucene_ray.index.deletes import add_documents, delete_by_key
from lucene_ray.index.merge import force_merge
from lucene_ray.index.segment import SegmentReader
from lucene_ray.search.query import TermQuery
from lucene_ray.search.searcher import DistributedSearcher, IndexSearcher

from lucene_ray.corpus import generate_corpus


def synth_corpus(tmp_path, n_docs, seed):
    import pyarrow.parquet as pq

    d = tmp_path / f"corpus_{seed}"
    d.mkdir(exist_ok=True)
    pq.write_table(
        generate_corpus(n_docs, seed=seed), str(d / "part-0000.parquet"),
        row_group_size=64,
    )
    return str(d)


def _remote_root(tmp_path, name):
    p = tmp_path / name
    p.mkdir()
    return f"file://{p}"


def test_store_helpers_roundtrip(tmp_path):
    root = _remote_root(tmp_path, "helpers")
    store.write_bytes_atomic(f"{root}/a/b.bin", b"xyz")
    assert store.exists(f"{root}/a/b.bin")
    assert store.read_bytes(f"{root}/a/b.bin") == b"xyz"
    store.np_save(f"{root}/a/arr.npy", np.arange(5))
    assert store.np_load(f"{root}/a/arr.npy").tolist() == [0, 1, 2, 3, 4]
    tbl = pa.table({"x": [1, 2, 3]})
    store.pq_write(tbl, f"{root}/a/t.parquet")
    assert store.pq_read(f"{root}/a/t.parquet").num_rows == 3
    assert store.listdir(f"{root}/a") == ["arr.npy", "b.bin", "t.parquet"]
    assert store.glob_names(f"{root}/a/*.npy") == ["arr.npy"]


def test_build_remote_matches_local(ray_session, tmp_path, monkeypatch):
    monkeypatch.setenv("LUCENE_RAY_CACHE_DIR", str(tmp_path / "cache_a"))
    corpus = synth_corpus(tmp_path, n_docs=300, seed=7)
    remote = f"{_remote_root(tmp_path, 'remote')}/index"
    local = str(tmp_path / "local_index")

    man_r = build_index(corpus, remote, docs_per_segment=100, content_column="content")
    man_l = build_index_local(
        corpus, local, docs_per_segment=100, content_column="content"
    )
    assert len(man_r["segments"]) == len(man_l["segments"])
    # no segment data landed physically at the URL-as-literal-path
    assert not os.path.exists(f"file:{os.sep}")

    s_local = IndexSearcher(local)
    # "different node": empty read-through cache, index only on shared storage
    monkeypatch.setenv("LUCENE_RAY_CACHE_DIR", str(tmp_path / "cache_b"))
    s_remote = IndexSearcher(remote)
    for term in ("import", "return", "def", "zzz_absent"):
        hr = s_remote.search(TermQuery(term), k=10)
        hl = s_local.search(TermQuery(term), k=10)
        assert [(d, float(s)) for d, s in hr] == [(d, float(s)) for d, s in hl]
    # the cache actually holds the localized copies
    cached = os.listdir(os.path.join(str(tmp_path / "cache_b"), "dirs"))
    assert len(cached) >= len(man_r["segments"])


def test_remote_merge_delete_add(ray_session, tmp_path, monkeypatch):
    monkeypatch.setenv("LUCENE_RAY_CACHE_DIR", str(tmp_path / "cache"))
    corpus = synth_corpus(tmp_path, n_docs=240, seed=11)
    remote = f"{_remote_root(tmp_path, 'rmd')}/index"
    build_index(
        corpus,
        remote,
        docs_per_segment=60,
        content_column="content",
        meta_columns=("repo", "path"),
    )
    before = IndexSearcher(remote).search(TermQuery("import"), k=5)

    man = force_merge(remote, max_segments=1)
    assert len(man["segments"]) == 1
    monkeypatch.setenv("LUCENE_RAY_CACHE_DIR", str(tmp_path / "cache2"))
    after = IndexSearcher(remote).search(TermQuery("import"), k=5)
    assert [float(s) for _, s in after] == [float(s) for _, s in before]

    # delete-by-key writes livedocs + a new generation on the remote root
    sr = SegmentReader(mf.read_manifest(remote)["segments"][0]["dir"])
    victim = sr.stored_column("path")[0].as_py()
    man2 = delete_by_key(remote, "path", [victim])
    assert any(s.get("livedocs") for s in man2["segments"])
    assert store.exists(s["livedocs"]) if (s := man2["segments"][0]).get("livedocs") else True

    # add_documents appends a fresh remote segment
    tbl = pa.table(
        {
            "text": ["remote seam merge probe xyzzyplugh"],
            "repo": ["r"],
            "path": ["p/new"],
        }
    )
    man3 = add_documents(remote, tbl, content_column="text", meta_columns=("repo", "path"))
    assert len(man3["segments"]) == 2
    hits = IndexSearcher(remote).search(TermQuery("xyzzyplugh"), k=3)
    assert len(hits) == 1


def test_distributed_searcher_remote(ray_session, tmp_path, monkeypatch):
    monkeypatch.setenv("LUCENE_RAY_CACHE_DIR", str(tmp_path / "cache"))
    corpus = synth_corpus(tmp_path, n_docs=200, seed=3)
    remote = f"{_remote_root(tmp_path, 'dist')}/index"
    build_index(corpus, remote, docs_per_segment=50, content_column="content")
    ds = DistributedSearcher(remote, num_workers=2)
    local_hits = IndexSearcher(remote).search(TermQuery("import"), k=8)
    dist_hits = ds.search(TermQuery("import"), k=8)
    assert [(d, float(s)) for d, s in dist_hits] == [
        (d, float(s)) for d, s in local_hits
    ]


def test_remote_build_resume_skips_complete_segments(ray_session, tmp_path, monkeypatch):
    """Checkpoint/resume against the SHARED prefix: a rerun over a
    partially-built remote index skips segments whose lineage signature
    matches (segment_is_complete reads meta.json through the seam)."""
    monkeypatch.setenv("LUCENE_RAY_CACHE_DIR", str(tmp_path / "cache"))
    corpus = synth_corpus(tmp_path, n_docs=200, seed=21)
    remote = f"{_remote_root(tmp_path, 'resume')}/index"
    man1 = build_index(corpus, remote, docs_per_segment=50, content_column="content")
    assert man1["skipped_segments"] == []
    # delete ONE remote segment to simulate a partial/failed run
    victim = man1["segments"][1]
    store.rmtree(victim["dir"])
    assert not store.exists(f"{victim['dir']}/meta.json")
    man2 = build_index(corpus, remote, docs_per_segment=50, content_column="content")
    # only the destroyed segment was rebuilt; the other three were skipped
    assert len(man2["skipped_segments"]) == len(man1["segments"]) - 1
    assert victim["name"] not in man2["skipped_segments"]
    r1 = IndexSearcher(remote).search(TermQuery("import"), k=10)
    local = str(tmp_path / "local_ref")
    build_index_local(corpus, local, docs_per_segment=50, content_column="content")
    r2 = IndexSearcher(local).search(TermQuery("import"), k=10)
    assert [(d, float(s)) for d, s in r1] == [(d, float(s)) for d, s in r2]


def test_cache_prune_lru(tmp_path, monkeypatch):
    import time

    monkeypatch.setenv("LUCENE_RAY_CACHE_DIR", str(tmp_path / "cache"))
    root = _remote_root(tmp_path, "prune")
    for i in range(4):
        store.write_bytes_atomic(f"{root}/d{i}/meta.json", b"x" * 10_000)
    local = []
    for i in range(4):
        local.append(store.localize_dir(f"{root}/d{i}"))
        time.sleep(0.02)
    # re-touch d0: it becomes most-recent and must SURVIVE the prune
    store.localize_dir(f"{root}/d0")
    freed = store.prune_cache(max_bytes=25_000)
    assert freed > 0
    assert os.path.exists(local[0])  # most recently used
    assert os.path.exists(local[3])
    assert not os.path.exists(local[1])  # oldest evicted
    # evicted dirs re-localize transparently
    again = store.localize_dir(f"{root}/d1")
    assert os.path.exists(os.path.join(again, "meta.json"))
