"""Block join (join/ToParentBlockJoinQuery, ToChildBlockJoinQuery,
CheckJoinIndex): kernel aggregation vs brute force, block-structure
validation over the real built index, and to_child fan-out."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.index.segment import SegmentReader
from lucene_ray.pipelines import fulltext as ft
from lucene_ray.search.blockjoin import (
    SCORE_SCALE,
    check_join_index,
    children_of,
    parent_docids,
    to_parent_partials,
)

SF = "/root/testdata/sf0.001"


def test_to_parent_partials_vs_brute():
    rng = np.random.default_rng(7)
    parents = np.array([4, 9, 10, 15], dtype=np.int64)  # block sizes 4,4,0,4
    child_docs = np.array([0, 2, 3, 5, 8, 11, 12, 14], dtype=np.int64)
    scores = rng.random(len(child_docs)).astype(np.float32) * 5
    pids, mx, mn, sum_i, cnt = to_parent_partials(child_docs, scores, parents)
    # brute: group children by their enclosing parent
    import collections

    groups = collections.defaultdict(list)
    for d, s in zip(child_docs, scores):
        p = parents[np.searchsorted(parents, d)]
        groups[int(p)].append(np.float32(s))
    assert pids.tolist() == sorted(groups)
    for i, p in enumerate(pids):
        g = groups[int(p)]
        assert mx[i] == max(g)
        assert mn[i] == min(g)
        assert cnt[i] == len(g)
        assert sum_i[i] == sum(
            int(round(float(np.float32(s)) * SCORE_SCALE)) for s in g
        )


def test_to_parent_partials_child_after_last_parent_raises():
    with pytest.raises(ValueError):
        to_parent_partials(
            np.array([5], dtype=np.int64),
            np.ones(1, np.float32),
            np.array([3], dtype=np.int64),
        )


def test_children_of():
    parents = np.array([2, 3, 7], dtype=np.int64)
    kids = children_of(np.array([2, 7], dtype=np.int64), parents)
    assert kids.tolist() == [0, 1, 4, 5, 6]
    assert children_of(np.empty(0, np.int64), parents).tolist() == []


class _FakeReader:
    def __init__(self, parent, source, doc_id):
        self._cols = {
            "parent": parent,
            "source": source,
            "doc_id": doc_id,
        }
        self.max_doc = len(parent)

    def stored_column(self, f):
        return pa.array(self._cols[f])


def test_check_join_index_catches_violations():
    # valid: 2 children + parent, 1 child + parent
    ok = _FakeReader(
        [0, 0, 1, 0, 1], ["a", "a", "a", "b", "b"], [0, 1, -1, 16, -1]
    )
    check_join_index(ok, bucket_width=16)
    # segment not ending in a parent
    with pytest.raises(ValueError, match="end with a parent"):
        check_join_index(
            _FakeReader([0, 1, 0], ["a", "a", "a"], [0, -1, 1]), 16
        )
    # child source differs from its parent's
    with pytest.raises(ValueError, match="source mismatch"):
        check_join_index(
            _FakeReader([0, 0, 1], ["a", "b", "b"], [0, 1, -1]), 16
        )
    # children from two different buckets in one block
    with pytest.raises(ValueError, match="bucket mismatch"):
        check_join_index(
            _FakeReader([0, 0, 1], ["a", "a", "a"], [0, 99, -1]), 16
        )


def test_built_block_index_passes_check(ray_session):
    idx = ft.ensure_block_index(SF)
    from lucene_ray.index import manifest as mf

    man = mf.read_manifest(idx)
    assert len(man["segments"]) >= 2  # blocks pack into multiple segments
    n_parents = 0
    for s in man["segments"]:
        r = SegmentReader(s["dir"])
        check_join_index(r, ft.BLOCK_BUCKET)
        n_parents += len(parent_docids(r))
    # every (source, bucket) group of the corpus got exactly one parent
    import duckdb

    n_blocks = duckdb.sql(
        f"SELECT count(DISTINCT (source, doc_id // {ft.BLOCK_BUCKET}))"
        f" FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    assert n_parents == n_blocks


def test_block_join_modes_consistent(ray_session):
    t = ft.block_join_topk(SF).to_pandas()
    modes = set(t["mode"])
    assert modes == {
        "block_max",
        "block_min",
        "block_total",
        "block_avg",
        "block_none",
        "block_children",
        "block_child_scores",
    }
    # none-mode ranks are docid-ascending (constant score)
    none = t[t["mode"] == "block_none"].sort_values(["qid", "rnk"])
    for _, g in none.groupby("qid"):
        assert g["doc_id"].is_monotonic_increasing
    # to_child children are docid-ascending from the matched blocks
    kids = t[t["mode"] == "block_children"].sort_values("rnk")
    assert kids["doc_id"].is_monotonic_increasing


def test_parent_children_block_join():
    from lucene_ray.search.blockjoin import parent_children

    parents = np.array([4, 9, 10, 15], dtype=np.int64)
    child_matches = np.array([0, 2, 5, 8, 11, 14], dtype=np.int64)
    # parent 4's block is docs 0..3
    assert parent_children(4, child_matches, parents).tolist() == [0, 2]
    # parent 9's block is docs 5..8
    assert parent_children(9, child_matches, parents).tolist() == [5, 8]
    # parent 10 has an EMPTY block (no children)
    assert parent_children(10, child_matches, parents).tolist() == []
    # parent 15's block is 11..14
    assert parent_children(15, child_matches, parents).tolist() == [11, 14]
    with pytest.raises(ValueError):
        parent_children(7, child_matches, parents)  # not a parent
