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


def test_count_fast_paths(idx):
    """Weight#count shortcuts: TermQuery count == doc_freq sum and
    MatchAll count == maxDoc on delete-free segments — identical to the
    iterated count, no postings decode."""
    from lucene_ray.search.query import MatchAllDocsQuery

    s = IndexSearcher(idx)
    want = sum(r.term_stats("spark")[0] for r in s.readers)
    assert s.count(TermQuery("spark")) == want
    assert s.count(MatchAllDocsQuery()) == sum(r.max_doc for r in s.readers)

    # with deletes the fast path must NOT apply: counts honor live masks
    from lucene_ray.index.deletes import delete_by_query

    n_both = 0  # docs matching both terms, to predict the drop
    for r in s.readers:
        import numpy as np

        from lucene_ray.index import postings as codec

        t1, t2 = r.term_id("spark"), r.term_id("merge")
        if t1 is None or t2 is None:
            continue
        d1, _ = codec.decode_term(r.enc, t1)
        d2, _ = codec.decode_term(r.enc, t2)
        n_both += len(np.intersect1d(d1, d2))
    delete_by_query(idx, TermQuery("merge"))
    s2 = IndexSearcher(idx)
    assert s2.count(TermQuery("spark")) == want - n_both
    assert s2.count(MatchAllDocsQuery()) == sum(
        int(r.live.sum()) if r.live is not None else r.max_doc
        for r in s2.readers
    )
