"""SpanQuery family: algebra semantics + brute-force parity.

Reference: lucene/queries/src/java/org/apache/lucene/queries/spans
(SpanTermQuery, SpanNearQuery, SpanOrQuery, SpanNotQuery, SpanFirstQuery,
SpanContainingQuery, SpanWithinQuery; Test* files in the same package).
The brute oracle below enumerates span sets independently (itertools over
token lists), so it cross-checks the vectorized per-step joins."""

from __future__ import annotations

import itertools

import pytest

from lucene_ray.analysis.analyzers import make_analyzer
from lucene_ray.corpus import generate_corpus
from lucene_ray.index.build import build_index_local
from lucene_ray.index.manifest import read_manifest
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.search.spans import (
    SpanContaining,
    SpanFirst,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanPositionRange,
    SpanTerm,
    SpanWithin,
    span_matches_segment,
)


@pytest.fixture(scope="module")
def span_idx(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("sp_corpus")
    pq.write_table(
        generate_corpus(250, seed=29), str(d / "c.parquet"), row_group_size=64
    )
    out = str(tmp_path_factory.mktemp("sp_idx"))
    build_index_local(str(d), out, docs_per_segment=64, index_options="positions")
    return out


# --- brute-force span-set oracle --------------------------------------------


def _brute_spans(toks: list[str], node) -> set[tuple[int, int]]:
    if isinstance(node, SpanTerm):
        return {(i, i) for i, t in enumerate(toks) if t == node.term}
    if isinstance(node, SpanOr):
        out: set = set()
        for c in node.children:
            out |= _brute_spans(toks, c)
        return out
    if isinstance(node, SpanNear):
        child = [sorted(_brute_spans(toks, c)) for c in node.children]
        if any(not c for c in child):
            return set()
        out = set()
        for combo in itertools.product(*child):
            wsum = sum(e - s + 1 for s, e in combo)
            if node.in_order:
                if any(combo[i][1] >= combo[i + 1][0] for i in range(len(combo) - 1)):
                    continue
                s, e = combo[0][0], combo[-1][1]
            else:
                s = min(c[0] for c in combo)
                e = max(c[1] for c in combo)
            if (e - s + 1) - wsum <= node.slop:
                out.add((s, e))
        return out
    if isinstance(node, SpanNot):
        inc = _brute_spans(toks, node.include)
        exc = _brute_spans(toks, node.exclude)
        return {
            (s, e)
            for s, e in inc
            if not any(s2 <= e + node.post and e2 >= s - node.pre for s2, e2 in exc)
        }
    if isinstance(node, SpanFirst):
        return {(s, e) for s, e in _brute_spans(toks, node.child) if e < node.end}
    if isinstance(node, SpanPositionRange):
        return {
            (s, e)
            for s, e in _brute_spans(toks, node.child)
            if s >= node.start and e < node.end
        }
    if isinstance(node, SpanContaining):
        big = _brute_spans(toks, node.big)
        lit = _brute_spans(toks, node.little)
        return {
            (s, e) for s, e in big if any(s <= s2 and e2 <= e for s2, e2 in lit)
        }
    assert isinstance(node, SpanWithin)
    lit = _brute_spans(toks, node.little)
    big = _brute_spans(toks, node.big)
    return {(s, e) for s, e in lit if any(s2 <= s and e <= e2 for s2, e2 in big)}


T = SpanTerm

CASES = [
    SpanNear((T("def"), T("return")), slop=3, in_order=True),
    SpanNear((T("def"), T("return")), slop=3, in_order=False),
    SpanNear((T("import"), T("def"), T("return")), slop=6, in_order=True),
    SpanPositionRange(SpanNear((T("def"), T("return")), slop=4, in_order=False), 1, 40),
    SpanNear((SpanOr((T("def"), T("class"))), T("return")), slop=2, in_order=True),
    SpanNot(
        SpanNear((T("def"), T("return")), slop=5, in_order=False),
        T("import"),
        pre=1,
        post=1,
    ),
    SpanFirst(T("return"), 6),
    SpanContaining(
        SpanNear((T("return"), T("import")), slop=6, in_order=True), T("ne_bi")
    ),
    SpanWithin(
        T("ne_bi"), SpanNear((T("return"), T("import")), slop=6, in_order=False)
    ),
    # depth-2 nesting: near whose clause is itself a near
    SpanNear(
        (T("import"), SpanNear((T("def"), T("return")), slop=3, in_order=False)),
        slop=4,
        in_order=True,
    ),
]


def test_span_counts_brute(span_idx):
    texts = generate_corpus(250, seed=29).column("content").to_pylist()
    a = make_analyzer("standard")
    toklists = [a.tokens(t) for t in texts]
    s = IndexSearcher(span_idx)
    man = read_manifest(span_idx)
    for node in CASES:
        expected = {}
        for i, toks in enumerate(toklists):
            sp = _brute_spans(toks, node)
            if sp:
                expected[i] = len(sp)
        got = {}
        for reader, seg in zip(s.readers, man["segments"]):
            d, n = span_matches_segment(reader, node)
            for dd, nn in zip(d, n):
                got[int(dd) + seg["doc_base"]] = int(nn)
        assert got == expected, node
    # the fixture must actually exercise every combinator non-trivially
    assert all(
        any(
            _brute_spans(toks, node)
            for toks in toklists
        )
        for node in CASES
    )


def test_span_semantics_hand():
    """Hand-checked algebra on one synthetic doc — pins the brute oracle
    itself (positions: a@0 b@1 c@2 a@3 d@4 b@5 e@6 a@7)."""
    toks = "a b c a d b e a".split()
    near = SpanNear((T("a"), T("b")), slop=1, in_order=True)
    # a@0 b@1 (width 0), a@3 b@5 (width 1); a@0 b@5 too wide, a@7 no b after
    assert _brute_spans(toks, near) == {(0, 1), (3, 5)}
    un = SpanNear((T("a"), T("b")), slop=1, in_order=False)
    # unordered adds b@1 a@3 -> (1, 3) and b@5 a@7 -> (5, 7)
    assert _brute_spans(toks, un) == {(0, 1), (3, 5), (1, 3), (5, 7)}
    assert _brute_spans(toks, SpanFirst(T("a"), 4)) == {(0, 0), (3, 3)}
    # c@2 touches neither [0, 1] nor [3, 5] at pre=post=0
    assert _brute_spans(toks, SpanNot(near, T("c"))) == {(0, 1), (3, 5)}
    # pre=1 expands (3, 5) to [2, 5], which now covers c@2
    assert _brute_spans(toks, SpanNot(near, T("c"), pre=1)) == {(0, 1)}
    assert _brute_spans(toks, SpanContaining(un, T("c"))) == {(1, 3)}
    assert _brute_spans(toks, SpanWithin(T("c"), un)) == {(2, 2)}


def test_span_not_pre_post():
    toks = "x a b c y".split()
    inc = SpanNear((T("a"), T("b")), slop=0, in_order=True)
    assert _brute_spans(toks, SpanNot(inc, T("c"))) == {(1, 2)}
    # post=1 pulls c@3 into the buffer of span (1,2)
    assert _brute_spans(toks, SpanNot(inc, T("c"), post=1)) == set()
    assert _brute_spans(toks, SpanNot(inc, T("x"), pre=1)) == set()


def test_span_requires_positions(tmp_path):
    import pyarrow.parquet as pq

    d = tmp_path / "c"
    d.mkdir()
    pq.write_table(generate_corpus(40, seed=30), str(d / "c.parquet"))
    idx = str(tmp_path / "idx")
    build_index_local(str(d), idx, docs_per_segment=64)  # no positions
    s = IndexSearcher(idx)
    with pytest.raises(ValueError, match="positions"):
        span_matches_segment(s.readers[0], SpanTerm("def"))


def test_span_score_query_scoring(span_idx):
    """SpanScoreQuery scores = BM25 over distinct-span counts with idf
    summed over every term occurrence in the tree; TOP_SCORES == COMPLETE
    through the PrecomputedScorer path, and spans compose inside booleans."""
    import numpy as np

    from lucene_ray.search.query import SpanScoreQuery, TermQuery, bool_query

    s = IndexSearcher(span_idx)
    for node in CASES[:4]:
        q = SpanScoreQuery(node)
        pruned = s.search(q, 10)
        complete = s.search(q, 10, total_hits_threshold=np.inf, score_mode="COMPLETE")
        assert [(d, np.float32(sc)) for d, sc in pruned] == [
            (d, np.float32(sc)) for d, sc in complete
        ], node
        assert pruned and all(sc > 0 for _, sc in pruned)
        scores = [float(sc) for _, sc in pruned]
        assert scores == sorted(scores, reverse=True)
    # manual score check on the top hit of one query
    from lucene_ray.index.manifest import read_manifest
    from lucene_ray.search.spans import span_matches_segment, span_terms
    from lucene_ray.smallfloat import LENGTH_TABLE

    node = CASES[0]
    q = SpanScoreQuery(node)
    doc, score = s.search(q, 1)[0]
    man = read_manifest(span_idx)
    w = s.make_weight(q)
    sim = w.phrase_sim_scorer(span_terms(node), 1.0)
    for reader, seg in zip(s.readers, man["segments"]):
        d, n = span_matches_segment(reader, node)
        for dd, nn in zip(d, n):
            if int(dd) + seg["doc_base"] == doc:
                expect = sim.score(float(nn), int(np.asarray(reader.norms)[dd]))
                assert np.float32(score) == expect
                break
        else:
            continue
        break
    else:
        raise AssertionError("top hit not found")
    # spans as a boolean clause
    bq = bool_query(must=[SpanScoreQuery(CASES[0])], must_not=[TermQuery("import")])
    hits = s.search(bq, 10)
    span_docs = {d for d, _ in s.search(SpanScoreQuery(CASES[0]), 10**6,
                                        total_hits_threshold=np.inf,
                                        score_mode="COMPLETE")}
    imp_docs = {d for d, _ in s.search(TermQuery("import"), 10**6,
                                       total_hits_threshold=np.inf,
                                       score_mode="COMPLETE")}
    assert {d for d, _ in hits} <= span_docs - imp_docs


def test_span_char_spans_highlighting(tmp_path):
    """span_char_spans maps match spans to ORIGINAL-text char ranges: the
    slice of the source text under each char span contains exactly the
    matched tokens."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "alpha beta gamma delta",
        "beta alpha xx beta gamma",
        "nothing here",
    ]
    src = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table({"doc_id": [0, 1, 2], "content": texts}), src
    )
    idx = str(tmp_path / "idx")
    build_index_local(str(src), idx, meta_columns=(), index_options="offsets")
    s = IndexSearcher(idx)
    from lucene_ray.search.spans import span_char_spans

    node = SpanNear((SpanTerm("beta"), SpanTerm("gamma")), slop=1, in_order=True)
    got = span_char_spans(s.readers[0], node)
    # doc 0: "beta gamma" adjacent; doc 1: "beta gamma" at the end
    assert set(got) == {0, 1}
    for d, spans in got.items():
        for cs, ce in spans:
            frag = texts[d][cs:ce]
            assert frag.startswith("beta") and frag.endswith("gamma"), frag
    with pytest.raises(ValueError, match="offsets"):
        idx2 = str(tmp_path / "idx2")
        build_index_local(str(src), idx2, meta_columns=(), index_options="positions")
        span_char_spans(IndexSearcher(idx2).readers[0], node)


def test_span_near_combiners_hypothesis():
    """Property fuzz: the vectorized partial-join combiners equal the
    itertools brute enumeration for random small interval sets."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lucene_ray.search.spans import _near_ordered_full, _near_unordered_full

    iv = st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 3)).map(
            lambda t: (t[0], t[0] + t[1])
        ),
        min_size=1,
        max_size=4,
    ).map(lambda l: np.asarray(sorted(set(l)), np.int64).reshape(-1, 2))

    @settings(max_examples=150, deadline=None)
    @given(
        ivs=st.lists(iv, min_size=2, max_size=3),
        slop=st.integers(0, 6),
        ordered=st.booleans(),
    )
    def check(ivs, slop, ordered):
        import numpy as np  # noqa: F811

        got = (
            _near_ordered_full(ivs, slop) if ordered else _near_unordered_full(ivs, slop)
        )
        want = set()
        for combo in itertools.product(*[list(map(tuple, iv_)) for iv_ in ivs]):
            wsum = sum(e - s + 1 for s, e in combo)
            if ordered:
                if any(combo[i][1] >= combo[i + 1][0] for i in range(len(combo) - 1)):
                    continue
                s, e = combo[0][0], combo[-1][1]
            else:
                s = min(c[0] for c in combo)
                e = max(c[1] for c in combo)
            if (e - s + 1) - wsum <= slop:
                want.add((s, e))
        assert {tuple(r) for r in got.tolist()} == want

    import numpy as np

    check()


def test_span_and_covering_inside_booleans_differential(span_idx):
    """Randomized TOP_SCORES == COMPLETE differential for boolean trees
    mixing SpanScoreQuery clauses with plain terms — the
    PrecomputedScorer clause path under WAND pruning.  (CoveringQuery's
    boolean path is exercised in test_covering_query_semantics — this
    fixture's corpus has no numeric stored column for its min source.)"""
    import numpy as np

    from lucene_ray.search.query import SpanScoreQuery, TermQuery, bool_query

    s = IndexSearcher(span_idx)
    rng = np.random.default_rng(17)
    terms = ["def", "return", "import", "class", "ne_bi", "wamurifa"]
    for trial in range(25):
        clauses = []
        n = rng.integers(2, 4)
        for _ in range(n):
            kind = rng.integers(0, 2)
            if kind == 0:
                clauses.append(TermQuery(terms[rng.integers(0, len(terms))]))
            else:
                clauses.append(SpanScoreQuery(CASES[int(rng.integers(0, 4))]))
        if rng.random() < 0.5:
            q = bool_query(should=list(clauses))
        else:
            q = bool_query(must=[clauses[0]], should=list(clauses[1:]))
        pruned = s.search(q, 10)
        complete = s.search(q, 10, total_hits_threshold=np.inf, score_mode="COMPLETE")
        assert [(d, np.float32(sc)) for d, sc in pruned] == [
            (d, np.float32(sc)) for d, sc in complete
        ], (trial, q)
