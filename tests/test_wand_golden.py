"""Golden tests ported from the reference TestWANDScorer
(lucene/core/src/test/org/apache/lucene/search/TestWANDScorer.java:90-530):
exact (doc, score) sequences for boolean SHOULD combinations of
constant-score term queries with boosts, minShouldMatch, FILTER and
MUST_NOT, under min-competitive-score feedback.
"""

import numpy as np
import pytest

from lucene_ray.search.query import (
    BoostQuery,
    ConstantScoreQuery,
    TermQuery,
    bool_query,
    build_scorer,
)
from lucene_ray.search.scorers import NO_MORE_DOCS
from lucene_ray.search.searcher import IndexSearcher

from .util import index_from_token_docs

# TestWANDScorer.testBasics corpus (:94-101): doc -> multi-valued "foo"
DOCS = [["A", "B"], ["A"], [], ["A", "B", "C"], ["B"], ["B", "C"]]


@pytest.fixture(scope="module")
def searcher(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wand") / "index")
    index_from_token_docs(DOCS, d)
    return IndexSearcher(d)


def csq(term, boost=None):
    q = ConstantScoreQuery(TermQuery(term))
    return BoostQuery(q, boost) if boost else q


def iterate(scorer, min_competitive=None):
    out = []
    if min_competitive is not None:
        scorer.set_min_competitive_score(np.float32(min_competitive))
    doc = scorer.advance(0)
    while doc != NO_MORE_DOCS:
        out.append((doc, float(scorer.score())))
        doc = scorer.next_doc()
    return out


def make_scorer(searcher, q, score_mode="TOP_SCORES"):
    weight = searcher.make_weight(q)
    return build_scorer(q, weight, searcher.readers[0], 1.0, score_mode, top_level=True)


def test_basics_disjunction(searcher):
    # 2*A OR B OR 3*C  (TestWANDScorer.java:115-150)
    q = bool_query(should=[csq("A", 2), csq("B"), csq("C", 3)])
    assert iterate(make_scorer(searcher, q)) == [
        (0, 3.0),
        (1, 2.0),
        (3, 6.0),
        (4, 1.0),
        (5, 4.0),
    ]
    # setMinCompetitiveScore(4) (:152-163)
    assert iterate(make_scorer(searcher, q), min_competitive=4) == [(3, 6.0), (5, 4.0)]
    # collect first, then raise the floor to 10 (:165-175)
    s = make_scorer(searcher, q)
    assert s.advance(0) == 0 and float(s.score()) == 3.0
    s.set_min_competitive_score(np.float32(10))
    assert s.next_doc() == NO_MORE_DOCS


def test_filtered_disjunction(searcher):
    # MUST[2*A OR B] FILTER[C]  (:178-215)
    q = bool_query(must=[bool_query(should=[csq("A", 2), csq("B")])],
                   filter=[TermQuery("C")])
    assert iterate(make_scorer(searcher, q)) == [(3, 3.0), (5, 1.0)]
    # with floor 2 (:217-227)
    assert iterate(make_scorer(searcher, q), min_competitive=2) == [(3, 3.0)]


def test_filtered_disjunction_with_must_not(searcher):
    # MUST[2*A OR B] MUST_NOT[C]  (:229-263)
    q = bool_query(must=[bool_query(should=[csq("A", 2), csq("B")])],
                   must_not=[TermQuery("C")])
    assert iterate(make_scorer(searcher, q)) == [(0, 3.0), (1, 2.0), (4, 1.0)]
    # floor 3 (:265-280)
    assert iterate(make_scorer(searcher, q), min_competitive=3) == [(0, 3.0)]


def test_disjunction_min_should_match_2(searcher):
    # 2*A OR B OR 3*C, msm=2  (testBasicsWithDisjunctionAndMinShouldMatch :293-350)
    q = bool_query(should=[csq("A", 2), csq("B"), csq("C", 3)], min_should_match=2)
    assert iterate(make_scorer(searcher, q)) == [(0, 3.0), (3, 6.0), (5, 4.0)]
    assert iterate(make_scorer(searcher, q), min_competitive=4) == [(3, 6.0), (5, 4.0)]
    s = make_scorer(searcher, q)
    assert s.advance(0) == 0 and float(s.score()) == 3.0
    s.set_min_competitive_score(np.float32(10))
    assert s.next_doc() == NO_MORE_DOCS


def test_disjunction_msm_non_scoring_mode(searcher):
    # COMPLETE_NO_SCORES iteration (testBasics...NonScoringMode :404-461)
    q = bool_query(should=[csq("A", 2), csq("B"), csq("C", 3)], min_should_match=2)
    s = make_scorer(searcher, q, score_mode="COMPLETE_NO_SCORES")
    docs = []
    d = s.advance(0)
    while d != NO_MORE_DOCS:
        docs.append(d)
        d = s.next_doc()
    assert docs == [0, 3, 5]


def test_filtered_disjunction_min_should_match(tmp_path):
    # corpus variant (:463-530): docs with D values
    docs = [["A", "B"], ["A", "C", "D"], [], ["A", "B", "C", "D"], ["B"], ["C", "D"]]
    d = str(tmp_path / "index")
    index_from_token_docs(docs, d)
    s = IndexSearcher(d)
    q = bool_query(
        must=[bool_query(should=[csq("A", 2), csq("B"), csq("D", 4)], min_should_match=2)],
        filter=[TermQuery("C")],
    )
    assert iterate(make_scorer(s, q)) == [(1, 6.0), (3, 7.0)]
    assert iterate(make_scorer(s, q), min_competitive=7) == [(3, 7.0)]


def test_search_api_matches_golden(searcher):
    q = bool_query(should=[csq("A", 2), csq("B"), csq("C", 3)])
    hits = searcher.search(q, 6)
    assert [(d, float(s)) for d, s in hits] == [
        (3, 6.0),
        (5, 4.0),
        (0, 3.0),
        (1, 2.0),
        (4, 1.0),
    ]
