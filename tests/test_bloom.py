"""Bloom-filtered term dictionary (BloomFilteringPostingsFormat +
FuzzySet analogue): never false-negative, low fpp, lookup short-circuit,
CheckIndex invariant."""

import os

import numpy as np
import pyarrow.parquet as pq

from lucene_ray.index import bloom
from lucene_ray.index.check import check_index
from lucene_ray.index.segment import SegmentReader
from lucene_ray.search.query import TermQuery
from lucene_ray.search.searcher import IndexSearcher

SF = "/root/testdata/sf0.001"


def _build(tmp_path):
    from lucene_ray.index.build import build_index

    src = str(tmp_path / "docs.parquet")
    pq.write_table(pq.read_table(os.path.join(SF, "documents.parquet")), src,
                   row_group_size=200)
    idx = str(tmp_path / "idx")
    build_index(src, idx, content_column="text",
                meta_columns=("doc_id", "lang", "source", "n_chars"),
                docs_per_segment=200)
    return idx


def test_bloom_kernel_properties():
    keys = [f"term{i:05d}".encode() for i in range(5000)]
    offs = np.zeros(len(keys) + 1, dtype=np.int64)
    np.cumsum([len(k) for k in keys], out=offs[1:])
    data = np.frombuffer(b"".join(keys), dtype=np.uint8)
    words = bloom.build_bloom_from_dict(offs, data)
    # power-of-two sizing at ~10 bits/key
    assert (len(words) * 64) & (len(words) * 64 - 1) == 0
    # never false-negative
    assert all(bloom.contains(words, k) for k in keys)
    # fpp on absent keys stays near the k=7 / 10-bits design point (~1%)
    absent = [f"absent{i:05d}".encode() for i in range(5000)]
    fp = sum(bloom.contains(words, k) for k in absent)
    assert fp / len(absent) < 0.03


def test_bloom_rides_the_segment(tmp_path, ray_session):
    idx = _build(tmp_path)
    seg_dirs = [
        os.path.join(idx, d) for d in sorted(os.listdir(idx))
        if d.startswith("seg_")
    ]
    assert seg_dirs
    for d in seg_dirs:
        assert os.path.exists(os.path.join(d, "bloom.npy"))
    r = SegmentReader(seg_dirs[0])
    # every dictionary term passes; an absent term short-circuits
    for i in range(r.n_terms):
        assert bloom.contains(r._bloom(), r._term_at(i))
    assert r.term_id("qqqqzzzz-not-a-token") is None
    assert getattr(r, "bloom_skips", 0) >= 1
    # search results are unaffected
    s = IndexSearcher(idx)
    assert s.count(TermQuery("spark")) > 0
    assert s.count(TermQuery("qqqqzzzz-not-a-token")) == 0
    check_index(idx)


def test_pre_bloom_segment_falls_through(tmp_path, ray_session):
    idx = _build(tmp_path)
    seg = os.path.join(
        idx, sorted(d for d in os.listdir(idx) if d.startswith("seg_"))[0]
    )
    os.remove(os.path.join(seg, "bloom.npy"))
    r = SegmentReader(seg)
    assert r._bloom() is None
    assert r.term_id("spark") is not None
    check_index(idx)
