"""PhraseWildcardQuery collection-phase semantics (reference
sandbox/search/PhraseWildcardQuery.java): budget split, segment order,
early stop, and single-term pruning."""
import numpy as np

from lucene_ray.pipelines.fulltext import (
    PW_PHRASES,
    ensure_index,
    phrase_wildcard_collect,
    phrase_wildcard_topk,
)
from lucene_ray.search.searcher import IndexSearcher

SF = "/root/testdata/sf0.001"


def _searcher():
    return IndexSearcher(ensure_index(SF, index_options="positions"))


def test_ample_budget_expands_everywhere(ray_session):
    s = _searcher()
    slots = (("prefix", "jo"), ("prefix", "ord"))
    idf, seg_slots, total = phrase_wildcard_collect(s, slots, 1000)
    assert total > 0 and idf > 0
    # with an ample budget every segment that survives pruning has both
    # slots populated; expansions include the literal words
    alive = [ss for ss in seg_slots if any(len(x) for x in ss)]
    assert alive
    for ss in alive:
        assert all(len(x) > 0 for x in ss)
    assert any("join" in ss[0] for ss in alive)
    assert any("order" in ss[1] for ss in alive)


def test_zero_budget_per_term_early_stops(ray_session):
    # maxExpansionsForTerm = 1 // 2 = 0 -> first multi-term collects
    # nothing -> earlyStopWeight (rewrite():199-204)
    s = _searcher()
    assert phrase_wildcard_collect(s, (("prefix", "jo"), ("prefix", "ord")), 1) is None


def test_budget_counts_segment_term_pairs_and_stops(ray_session):
    s = _searcher()
    slots = (("prefix", "jo"), ("prefix", "ord"))
    got = phrase_wildcard_collect(s, slots, 2)
    assert got is not None
    _idf, seg_slots, total = got
    assert total == 2  # 1 credit per multi-term (integer split), both used
    # each multi-term expanded exactly one (segment, term) pair, in the
    # smallest-vocab segment still in the list
    per_pos = [sum(len(ss[p]) for ss in seg_slots) for p in range(2)]
    assert per_pos == [1, 1]
    n_terms = [r.n_terms for r in s.readers]
    first_seg = next(i for i, ss in enumerate(seg_slots) if len(ss[0]))
    assert n_terms[first_seg] == min(n_terms)
    # lexicographic TermsEnum order: the single expansion is the
    # lexicographically first matching dictionary term of that segment
    r = s.readers[first_seg]
    from lucene_ray.pipelines.fulltext import _pw_expand_tids

    want = r.term_string(int(_pw_expand_tids(r, ("prefix", "jo"))[0]))
    assert seg_slots[first_seg][0] == (want,)


def test_truncated_idf_never_exceeds_ample(ray_session):
    s = _searcher()
    slots = (("prefix", "jo"), ("prefix", "ord"))
    ample = phrase_wildcard_collect(s, slots, 1000)
    tight = phrase_wildcard_collect(s, slots, 4)
    assert tight is not None and ample is not None
    assert tight[0] <= ample[0] and tight[2] <= ample[2]


def test_single_term_absent_everywhere_early_stops(ray_session):
    s = _searcher()
    assert (
        phrase_wildcard_collect(s, (("term", "zzzznothere"), ("prefix", "jo")), 100)
        is None
    )


def test_topk_budget_independence_when_ample(ray_session):
    a = phrase_wildcard_topk(SF, max_expansions=1000).to_pandas()
    b = phrase_wildcard_topk(SF, max_expansions=10**6).to_pandas()
    assert a.equals(b)
    assert set(a.qid.unique()) == set(range(len(PW_PHRASES)))
