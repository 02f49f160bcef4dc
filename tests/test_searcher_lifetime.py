"""SearcherLifetimeManager (search/SearcherLifetimeManager.java):
point-in-time leasing across commits, PruneByAge, snapshot pinning."""
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.corpus import generate_corpus
from lucene_ray.index.build import build_index_local
from lucene_ray.index.deletes import add_documents, delete_by_query
from lucene_ray.index.deletion_policy import prune_generations
from lucene_ray.search.query import TermQuery
from lucene_ray.search.searcher import (
    IndexSearcher,
    SearcherLifetimeManager,
    open_if_changed,
)


@pytest.fixture()
def idx(tmp_path):
    d = tmp_path / "c"
    d.mkdir()
    pq.write_table(generate_corpus(120, seed=7), str(d / "c.parquet"), row_group_size=30)
    out = str(tmp_path / "idx")
    build_index_local(str(d), out, docs_per_segment=30)
    return out


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_point_in_time_across_commits(idx):
    clock = FakeClock()
    mgr = SearcherLifetimeManager(clock=clock)
    s0 = IndexSearcher(idx)
    before = s0.search(TermQuery("def"), 10)
    token = mgr.record(s0)
    assert token == s0.generation
    assert mgr.record(s0) == token  # idempotent

    # the index moves on: a delete changes results for NEW searchers
    delete_by_query(idx, TermQuery("def"))
    fresh = open_if_changed(s0)
    assert fresh is not None
    assert fresh.search(TermQuery("def"), 10) != before

    # but the leased token still serves the first page's view
    leased = mgr.acquire(token)
    assert leased is s0
    assert leased.search(TermQuery("def"), 10) == before


def test_prune_by_age_and_snapshot_pin(idx):
    clock = FakeClock()
    mgr = SearcherLifetimeManager(clock=clock)
    s0 = IndexSearcher(idx)
    token = mgr.record(s0)

    # pin survives prune_generations while the lease is live
    rows = pa.table(
        {
            "repo": ["r"], "path": ["p"], "commit": ["c"], "lang": ["py"],
            "content": ["def fresh_fn(): pass"],
        }
    )
    add_documents(idx, rows, content_column="content")
    add_documents(idx, rows, content_column="content")
    prune_generations(idx, keep_last=1)
    assert mgr.acquire(token).search(TermQuery("def"), 3)  # still readable
    snaps = json.load(open(os.path.join(idx, "snapshots.json")))
    assert str(token) in snaps or token in {int(k) for k in snaps}

    # age out: prune releases the pin and acquire returns None
    clock.t = 601.0
    assert mgr.prune(600.0) == [token]
    assert mgr.acquire(token) is None
    snaps = json.load(open(os.path.join(idx, "snapshots.json")))
    assert str(token) not in snaps and token not in {int(k) for k in snaps if str(k).isdigit()}

    # young leases survive a prune
    s1 = IndexSearcher(idx)
    t1 = mgr.record(s1)
    assert mgr.prune(600.0) == []
    assert mgr.acquire(t1) is s1
