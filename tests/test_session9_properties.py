"""Property tests for the session-9 analyzers: structural invariants a
maximal-munch scanner / hierarchy tokenizer must satisfy on ANY input
(the repo's hypothesis-differential pattern)."""

import hypothesis.strategies as st
from hypothesis import given, settings

from lucene_ray.analysis.analyzers import (
    CJKBigramAnalyzer,
    PathHierarchyAnalyzer,
)
from lucene_ray.analysis.classic import classic_scan

TEXT = st.text(
    alphabet=st.sampled_from("abcXY z019.-_/@'&一二ア"), max_size=40
)


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_classic_scan_is_a_partition(text):
    """Tokens are non-overlapping ascending spans; every character
    outside a token matches no rule at that position (true maximal
    munch never skips a matchable char)."""
    spans = classic_scan(text)
    last_end = 0
    for tok, typ, s, e in spans:
        assert s >= last_end and e > s
        assert text[s:e] == tok
        last_end = e


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_path_hierarchy_prefix_suffix_structure(text):
    fwd = PathHierarchyAnalyzer().tokens(text)
    rev = PathHierarchyAnalyzer(reverse=True).tokens(text)
    if text:
        # forward: each token is a prefix of the next; last == full text
        for a, b in zip(fwd, fwd[1:]):
            assert b.startswith(a)
        assert fwd[-1] == text
        # reverse: each token is a suffix-of-the-previous' tail region;
        # first token is the full text, later ones are suffixes of it
        assert rev[0] == text
        for t in rev[1:]:
            assert text.endswith(t)
        # token counts agree when no empty edge component exists: the
        # reference forward tokenizer folds a LEADING delimiter into the
        # first token while reverse counts it as a boundary, and
        # symmetrically for a trailing delimiter
        if not text.startswith("/") and not text.endswith("/"):
            assert len(fwd) == len(rev)
    else:
        assert fwd == [] and rev == []


@settings(max_examples=200, deadline=None)
@given(TEXT, st.integers(min_value=0, max_value=4))
def test_path_hierarchy_skip_monotone(text, skip):
    """skip=k yields at most as many tokens as skip=0, and every
    emitted span still ends at the same boundaries."""
    base = PathHierarchyAnalyzer()._spans(text)
    skipped = PathHierarchyAnalyzer(skip=skip)._spans(text)
    assert len(skipped) <= len(base)
    ends_base = {e for _s, e in base}
    assert all(e in ends_base for _s, e in skipped)


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_cjk_bigram_reconstructs_runs(text):
    """Overlapping bigrams of one run chain correctly: each consecutive
    bigram pair shares its middle character."""
    an = CJKBigramAnalyzer()
    toks = an._doc_tokens(text)
    for (t1, p1, _s1, _e1), (t2, p2, _s2, _e2) in zip(toks, toks[1:]):
        if len(t1) == 2 and len(t2) == 2 and p2 == p1 + 1:
            # consecutive bigrams within a run overlap by one char
            if _s2 < _e1:  # same run (offsets overlap)
                assert t1[1] == t2[0]
