"""Ray Data build pipelines: fused and shuffle modes must produce
identical indexes (same stats, same query results), and the distributed
searcher must agree with the in-process one."""

import math
import os

import pyarrow.parquet as pq
import pytest

from lucene_ray.corpus import generate_corpus
from lucene_ray.index.build import build_index, build_index_local
from lucene_ray.search.query import TermQuery, bool_query
from lucene_ray.search.searcher import DistributedSearcher, IndexSearcher


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    tbl = generate_corpus(400, seed=3)
    pq.write_table(tbl, d + "/part-0000.parquet", row_group_size=64)
    return d


QUERIES = [
    TermQuery("import"),
    bool_query(should=[TermQuery("import"), TermQuery("return"), TermQuery("def")]),
    bool_query(should=[TermQuery("the"), TermQuery("func")], min_should_match=1),
]


def _results(index_dir):
    s = IndexSearcher(index_dir)
    return [
        [(d, float(x)) for d, x in s.search(q, 10)] for q in QUERIES
    ], s.collection_stats


def test_fused_and_shuffle_modes_match_local(ray_session, corpus_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("ray_idx")
    local_dir = str(root / "local")
    fused_dir = str(root / "fused")
    shuffle_dir = str(root / "shuffle")
    build_index_local(corpus_dir, local_dir, docs_per_segment=120)
    build_index(corpus_dir, fused_dir, docs_per_segment=120, mode="fused")
    build_index(corpus_dir, shuffle_dir, docs_per_segment=120, mode="shuffle",
                write_doc_tables=False)
    r_local, cs_local = _results(local_dir)
    r_fused, cs_fused = _results(fused_dir)
    r_shuffle, cs_shuffle = _results(shuffle_dir)
    assert cs_local == cs_fused == cs_shuffle
    assert r_local == r_fused == r_shuffle


def test_distributed_searcher_matches(ray_session, corpus_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("dsearch") / "index")
    build_index_local(corpus_dir, idx, docs_per_segment=80)
    s = IndexSearcher(idx)
    ds = DistributedSearcher(idx, num_workers=3)
    for q in QUERIES:
        a = [(d, float(x)) for d, x in s.search(q, 10)]
        b = [(d, float(x)) for d, x in ds.search(q, 10)]
        assert a == b, q
