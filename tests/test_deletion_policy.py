"""Commit-point deletion policy: old generations and their orphaned
artifacts disappear, the surviving commit keeps working."""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from lucene_ray.index import manifest as mf
from lucene_ray.index.deletes import delete_by_query, update_numeric_docvalue
from lucene_ray.index.deletion_policy import prune_generations
from lucene_ray.pipelines import fulltext as ft
from lucene_ray.search.query import TermQuery
from lucene_ray.search.searcher import IndexSearcher

SF = "/root/testdata/sf0.001"


def _fresh_idx(tmp_path):
    from lucene_ray.index.build import build_index

    src = str(tmp_path / "docs.parquet")
    pq.write_table(
        pq.read_table(os.path.join(SF, "documents.parquet")), src,
        row_group_size=150,
    )
    idx = str(tmp_path / "idx")
    build_index(src, idx, content_column="text",
                meta_columns=("doc_id", "lang", "source", "n_chars"),
                docs_per_segment=150)
    return idx


def test_prune_generations(tmp_path, ray_session):
    idx = _fresh_idx(tmp_path)
    g0 = mf.latest_generation(idx)
    delete_by_query(idx, TermQuery("spark"))          # g0+1 (livedocs)
    update_numeric_docvalue(idx, TermQuery("merge"), "n_chars", 7)  # g0+2 (dvu)
    n_before = IndexSearcher(idx).count(TermQuery("merge"))
    assert mf.latest_generation(idx) == g0 + 2
    assert os.path.isdir(os.path.join(idx, "livedocs"))

    rep = prune_generations(idx, keep_last=1)
    assert rep["dropped_generations"] == [g0, g0 + 1]
    # old manifests are gone; the survivor still searches identically
    with pytest.raises(FileNotFoundError):
        mf.read_manifest(idx, g0)
    s = IndexSearcher(idx)
    assert s.generation == g0 + 2
    assert s.count(TermQuery("spark")) == 0          # delete still applied
    assert s.count(TermQuery("merge")) == n_before   # dv overlay intact
    # livedocs referenced by the survivor are kept
    man = mf.read_manifest(idx)
    for seg in man["segments"]:
        if seg.get("livedocs"):
            assert os.path.exists(seg["livedocs"])
        for p in (seg.get("dv_updates") or {}).values():
            assert os.path.exists(p)


def test_prune_removes_pre_merge_segments(tmp_path, ray_session):
    from lucene_ray.index.merge import force_merge

    idx = _fresh_idx(tmp_path)
    old_dirs = [s["dir"] for s in mf.read_manifest(idx)["segments"]]
    force_merge(idx, max_segments=1)
    assert len(mf.read_manifest(idx)["segments"]) == 1
    rep = prune_generations(idx, keep_last=1)
    assert rep["removed_dirs"] >= len(old_dirs)
    for d in old_dirs:
        assert not os.path.exists(d)
    s = IndexSearcher(idx)
    assert s.count(TermQuery("spark")) > 0
    from lucene_ray.index.check import check_index

    assert check_index(idx, use_ray=False)["ok"]


def test_snapshot_pins_commit_point(tmp_path, ray_session):
    """SnapshotDeletionPolicy: a snapshotted generation survives pruning
    (with its artifacts), searches point-in-time, and becomes prunable
    again after release()."""
    from lucene_ray.index.deletion_policy import release_snapshot, snapshot

    idx = _fresh_idx(tmp_path)
    g0 = mf.latest_generation(idx)
    n_spark = IndexSearcher(idx).count(TermQuery("spark"))
    pinned = snapshot(idx)                       # pin the pre-delete commit
    assert pinned == g0

    delete_by_query(idx, TermQuery("spark"))     # g0+1
    delete_by_query(idx, TermQuery("merge"))     # g0+2

    rep = prune_generations(idx, keep_last=1)
    # g0 survives (snapshotted), g0+1 dropped
    assert g0 in rep["kept_generations"]
    assert g0 + 1 in rep["dropped_generations"]
    pit = IndexSearcher(idx, generation=g0)
    assert pit.count(TermQuery("spark")) == n_spark

    # refcounting: double-snapshot needs double-release
    snapshot(idx, g0)
    release_snapshot(idx, g0)
    rep2 = prune_generations(idx, keep_last=1)
    assert g0 in rep2["kept_generations"]
    release_snapshot(idx, g0)
    rep3 = prune_generations(idx, keep_last=1)
    assert rep3["dropped_generations"] == [g0]
    with pytest.raises(FileNotFoundError):
        mf.read_manifest(idx, g0)
    with pytest.raises(ValueError):
        release_snapshot(idx, g0)                # already fully released
    # survivor intact
    s = IndexSearcher(idx)
    assert s.count(TermQuery("spark")) == 0 and s.count(TermQuery("merge")) == 0
