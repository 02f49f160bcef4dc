"""TermAutomatonQuery: DP vs an independent brute-force path matcher,
construction validation, and oracle-compiler sanity."""

import numpy as np
import pytest

from lucene_ray.pipelines import fulltext as ft
from lucene_ray.search.automaton import (
    ANY,
    TermAutomatonQuery as TA,
    term_automaton_matches_segment,
)

SF = "/root/testdata/sf0.001"


def test_validation():
    with pytest.raises(ValueError, match="forward"):
        TA(2, ((1, 1, "x"),), (1,))
    with pytest.raises(ValueError, match="initial"):
        TA(3, ((0, 1, ANY), (1, 2, "x")), (2,))
    with pytest.raises(ValueError, match="accept"):
        TA(3, ((0, 1, "x"), (1, 2, ANY)), (2,))
    with pytest.raises(ValueError, match="no accept"):
        TA(2, ((0, 1, "x"),), ())


def test_paths_enumeration():
    q = TA(3, ((0, 1, "join"), (0, 1, "merge"), (1, 2, "order")), (2,))
    assert sorted(q.paths()) == [("join", "order"), ("merge", "order")]
    diamond = TA(
        5,
        ((0, 1, "window"), (1, 4, "group"), (1, 2, ANY), (2, 4, "group")),
        (4,),
    )
    assert sorted(diamond.paths(), key=len) == [
        ("window", "group"),
        ("window", ANY, "group"),
    ]


def _brute(tokens_by_doc: dict[int, list[str]], q: TA) -> set[int]:
    out = set()
    for doc, toks in tokens_by_doc.items():
        for path in q.paths():
            L = len(path)
            for s in range(len(toks) - L + 1):
                if all(
                    lab is ANY or toks[s + i] == lab
                    for i, lab in enumerate(path)
                ):
                    out.add(doc)
                    break
    return out


def test_dp_vs_brute_on_real_segment(ray_session):
    import pyarrow.parquet as pq

    from lucene_ray.analysis.analyzers import make_analyzer
    from lucene_ray.index import manifest as mf
    from lucene_ray.index.segment import SegmentReader

    idx = ft.ensure_index(SF, index_options="positions")
    man = mf.read_manifest(idx)
    a = make_analyzer("standard")
    corpus = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(corpus["doc_id"].to_pylist(), corpus["text"].to_pylist()))
    for q in ft._automaton_queries():
        got = set()
        for seg in man["segments"]:
            r = SegmentReader(seg["dir"])
            d = term_automaton_matches_segment(r, q)
            got |= {int(x) + seg["doc_base"] for x in d}
        toks = {d: a.tokens(t) for d, t in texts.items()}
        assert got == _brute(toks, q), q


def test_random_automatons_vs_brute_hypothesis():
    """Random acyclic automatons over a tiny synthetic vocabulary: the
    packed-key DP agrees with the brute path matcher on every doc."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    VOCAB = ["a", "b", "c"]
    rng_docs = [
        "a b c a b".split(),
        "c c b a".split(),
        "b".split(),
        "a a a a a a".split(),
        "c a b c a b c".split(),
        [],
    ]

    labels = st.sampled_from(VOCAB + [None])

    @st.composite
    def automatons(draw):
        n = draw(st.integers(2, 5))
        n_tr = draw(st.integers(1, 6))
        trans = []
        for _ in range(n_tr):
            f = draw(st.integers(0, n - 2))
            t = draw(st.integers(f + 1, n - 1))
            lab = draw(labels)
            if f == 0 and lab is None:
                lab = draw(st.sampled_from(VOCAB))
            if t == n - 1 and lab is None:  # accept = n-1 below
                lab = draw(st.sampled_from(VOCAB))
            trans.append((f, t, lab))
        return TA(n, tuple(trans), (n - 1,))

    class _FakeReader:
        has_positions = True
        live = None

        def __init__(self, docs):
            self._docs = docs
            self._vocab = sorted({t for d in docs for t in d})

        def term_id(self, term):
            try:
                return self._vocab.index(term)
            except ValueError:
                return None

        def decode_term_cached(self, tid):
            # not used by the automaton path
            raise AssertionError

        def term_positions(self, tid):
            term = self._vocab[tid]
            return [
                np.array([i for i, t in enumerate(d) if t == term], np.int64)
                for d in self._docs
                if term in d
            ]

    # the automaton kernel uses decode_term + term_positions via
    # _flat_occurrences; give it a real decode seam
    from lucene_ray.search import automaton as am

    def fake_flat(reader, term):
        docs, poss = [], []
        for di, d in enumerate(reader._docs):
            for i, t in enumerate(d):
                if t == term:
                    docs.append(di)
                    poss.append(i)
        return np.array(docs, np.int64), np.array(poss, np.int64)

    @settings(max_examples=150, deadline=None)
    @given(automatons())
    def run(q):
        r = _FakeReader(rng_docs)
        orig = am._flat_occurrences
        am._flat_occurrences = fake_flat
        try:
            got = set(am.term_automaton_matches_segment(r, q).tolist())
        finally:
            am._flat_occurrences = orig
        want = _brute({i: d for i, d in enumerate(rng_docs)}, q)
        assert got == want, (q, got, want)

    run()
