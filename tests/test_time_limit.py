"""TimeLimitingCollector analogue: injectable clock, partial results,
strict TimeExceededException — deterministic via a fake tick counter."""

import os

import pyarrow.parquet as pq
import pytest

from lucene_ray.search.query import TermQuery
from lucene_ray.search.searcher import IndexSearcher, TimeExceededException

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    from lucene_ray.index.build import build_index

    tmp = tmp_path_factory.mktemp("tl")
    src = str(tmp / "docs.parquet")
    pq.write_table(pq.read_table(os.path.join(SF, "documents.parquet")), src,
                   row_group_size=100)
    out = str(tmp / "idx")
    build_index(src, out, content_column="text",
                meta_columns=("doc_id", "lang", "source", "n_chars"),
                docs_per_segment=100)
    return out


class Ticker:
    """Fake clock: advances one tick per call (the TimerThread counter)."""

    def __init__(self):
        self.t = 0

    def __call__(self):
        self.t += 1
        return self.t


def test_no_timeout_matches_plain_search(idx):
    s = IndexSearcher(idx)
    want = s.search(TermQuery("spark"), 10)
    hits, terminated, n = s.search_with_time_limit(
        TermQuery("spark"), 10, timeout=10**9)
    assert not terminated and n == len(s.readers)
    assert hits == want


def test_partial_results_and_segment_budget(idx):
    s = IndexSearcher(idx)
    assert len(s.readers) > 2
    # each segment costs ~1 tick; budget of 3 ticks stops after ~2 segments
    hits, terminated, n = s.search_with_time_limit(
        TermQuery("spark"), 10, timeout=3, clock=Ticker())
    assert terminated
    assert 0 < n < len(s.readers)
    # the partial hits are exactly a search over the first n segments
    # (same full-index weight/stats, no pruning floor)
    from lucene_ray.search.collector import merge_top_docs
    from lucene_ray.search.searcher import search_segment

    q = TermQuery("spark")
    w = s.make_weight(q)
    per_seg = [
        search_segment(r, q, w, 10, float("inf"), "COMPLETE")
        for r in s.readers[:n]
    ]
    bases = [seg["doc_base"] for seg in s.manifest["segments"]]
    assert hits == merge_top_docs(per_seg, 10, bases)


def test_strict_mode_raises_with_partial_hits(idx):
    s = IndexSearcher(idx)
    with pytest.raises(TimeExceededException) as ei:
        s.search_with_time_limit(TermQuery("spark"), 10, timeout=3,
                                 clock=Ticker(), partial=False)
    exc = ei.value
    assert exc.timeout == 3 and exc.elapsed > 3
    assert exc.segments_searched > 0
    assert len(exc.partial_hits) > 0
