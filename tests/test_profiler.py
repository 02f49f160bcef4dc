"""QueryProfiler: bit-identical hits + a sane timing/count breakdown."""

from lucene_ray.pipelines import fulltext as ft
from lucene_ray.search.profiler import QueryProfilerSearcher
from lucene_ray.search.query import TermQuery, bool_query
from lucene_ray.search.searcher import IndexSearcher

SF = "/root/testdata/sf0.001"


def test_profile_search_matches_plain(ray_session):
    idx = ft.ensure_index(SF)
    plain = IndexSearcher(idx)
    prof = QueryProfilerSearcher(idx)
    for q in (
        TermQuery("spark"),
        bool_query(should=[TermQuery("join"), TermQuery("merge")]),
        bool_query(must=[TermQuery("window")], must_not=[TermQuery("batch")]),
    ):
        want = plain.search(q, 10)
        got, profile = prof.profile_search(q, 10)
        assert got == want
        assert profile["n_segments"] == len(plain.readers)
        assert len(profile["segments"]) == profile["n_segments"]
        assert profile["total_ns"] >= profile["create_weight_ns"]
        assert profile["total_ns"] >= sum(s["score_ns"] for s in profile["segments"])
        assert profile["total_hits_collected"] >= len(got)
        assert all(s["score_ns"] >= 0 and s["n_hits"] >= 0 for s in profile["segments"])
