"""BP doc reordering (misc/index/BPIndexReorderer.java, Dhulipala et al.
2016 recursive graph bisection): the permutation clusters docs sharing
terms, the log-gap objective shrinks, and the reordered merge preserves
search results exactly (CheckIndex-validated)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index import bp
from lucene_ray.index.build import build_index_local
from lucene_ray.search.query import TermQuery
from lucene_ray.search.searcher import IndexSearcher


def _csr(doc_terms: list[list[int]], n_terms: int):
    indptr = np.concatenate(
        ([0], np.cumsum([len(x) for x in doc_terms]))
    ).astype(np.int64)
    indices = np.array([t for ts in doc_terms for t in ts], np.int64)
    return indptr, indices, n_terms


def test_bp_clusters_shuffled_topics():
    # docs from two disjoint topics in shuffled order; BP must separate
    # them into pure halves.  (A PERFECTLY alternating assignment is the
    # degenerate symmetric start where df_left == df_right for every
    # term, all biases are 0 and the annealing stop `gain <= iter` fires
    # at iter 0 — the reference stalls identically, so the test uses a
    # shuffle that breaks the symmetry like real data does.)
    rng = np.random.default_rng(11)
    assign = np.array([0, 1] * 16)
    rng.shuffle(assign)
    topics = [[0, 1, 2], [3, 4, 5]]
    doc_terms = [topics[a] for a in assign]
    indptr, indices, n_terms = _csr(doc_terms, 6)
    order = bp.bp_permutation(indptr, indices, n_terms)
    assert sorted(order.tolist()) == list(range(32))  # a permutation
    for half in (order[:16], order[16:]):
        assert len({int(assign[d]) for d in half}) == 1  # pure topic
    before = bp.log_gap_cost(indptr, indices, n_terms, np.arange(32))
    after = bp.log_gap_cost(indptr, indices, n_terms, order)
    assert after < before / 3


def test_bp_random_never_hurts_much_and_is_deterministic():
    rng = np.random.default_rng(17)
    doc_terms = [
        sorted(rng.choice(40, size=rng.integers(2, 8), replace=False).tolist())
        for _ in range(200)
    ]
    indptr, indices, n_terms = _csr(doc_terms, 40)
    o1 = bp.bp_permutation(indptr, indices, n_terms)
    o2 = bp.bp_permutation(indptr, indices, n_terms)
    assert np.array_equal(o1, o2)  # deterministic
    base = bp.log_gap_cost(indptr, indices, n_terms, np.arange(200))
    got = bp.log_gap_cost(indptr, indices, n_terms, o1)
    assert got <= base  # the objective never regresses


def test_log_gap_cost_prefers_clustered():
    # one term on docs {0, 50}: cost log2(1) + log2(50) vs adjacent
    indptr, indices, n_terms = _csr(
        [[0]] + [[] for _ in range(49)] + [[0]] + [[] for _ in range(9)], 1
    )
    spread = bp.log_gap_cost(indptr, indices, n_terms, np.arange(60))
    order = np.concatenate(([0, 50], np.setdiff1d(np.arange(60), [0, 50])))
    packed = bp.log_gap_cost(indptr, indices, n_terms, order)
    assert packed < spread


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    root = tmp_path_factory.mktemp("bp")
    corpus = str(root / "corpus")
    os.makedirs(corpus)
    rng = np.random.default_rng(3)
    topics = [
        ["spark", "join", "merge", "window", "scan"],
        ["alpha", "beta", "gamma", "delta", "epsilon"],
        ["red", "green", "blue", "cyan", "magenta"],
    ]
    texts = []
    for i in range(600):
        words = rng.choice(topics[i % 3], size=12, replace=True).tolist()
        texts.append(" ".join(words))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(600), pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(tbl, corpus + "/part-0000.parquet", row_group_size=97)
    idx = str(root / "index")
    build_index_local(
        corpus,
        idx,
        docs_per_segment=200,
        content_column="text",
        meta_columns=("doc_id",),
    )
    return idx


def _by_content(searcher, term, k=10_000):
    """Sorted [(stored doc_id, f32 score)] — docids change across the
    reordering merge, the stored doc_id column is the stable identity."""
    out = []
    for gdoc, score in searcher.search(term if not isinstance(term, str) else TermQuery(term), k):
        for seg, r in zip(searcher.manifest["segments"], searcher.readers):
            if seg["doc_base"] <= gdoc < seg["doc_base"] + seg["max_doc"]:
                col = r.stored_column("doc_id").to_numpy(zero_copy_only=False)
                out.append((int(col[gdoc - seg["doc_base"]]), float(score)))
                break
    return sorted(out)


def test_bp_reorder_merge_preserves_search(built, ray_session):
    from lucene_ray.index.check import check_index

    before = IndexSearcher(built)
    assert len(before.readers) > 1
    want = {t: _by_content(before, t) for t in ("spark", "alpha", "red")}
    man = bp.bp_reorder_merge(built, min_doc_freq=2)
    assert len(man["segments"]) == 1
    check_index(built)
    after = IndexSearcher(built)
    for t, hits in want.items():
        assert _by_content(after, t) == hits

    # the permutation clustered the topic docs: postings of a topic term
    # span a contiguous-ish range -> log-gap cost must shrink vs docid
    # order of the same merged segment
    r = after.readers[0]
    from lucene_ray.index.postings import decode_term

    costs = []
    for t in ("spark", "alpha", "red"):
        tid = r.term_id(t)
        docs, _ = decode_term(r.enc, tid)
        gaps = np.diff(np.concatenate(([-1], docs)))
        costs.append(np.log2(gaps).sum())
    # each topic holds 200 of 600 docs; clustered postings cost ~200*1 bit,
    # interleaved ~200*log2(3) — assert we are near the clustered regime
    assert sum(costs) < 3 * 200 * 1.3


def test_bp_refuses_sorted_index(tmp_path, ray_session):
    corpus = str(tmp_path / "c")
    os.makedirs(corpus)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(50), pa.int64()),
            "n_chars": pa.array([i * 3 for i in range(50)], pa.int64()),
            "text": pa.array(["a b c"] * 50),
        }
    )
    pq.write_table(tbl, corpus + "/p.parquet")
    idx = str(tmp_path / "i")
    from lucene_ray.index.build import build_index

    build_index(
        corpus + "/p.parquet",
        idx,
        docs_per_segment=25,
        content_column="text",
        meta_columns=("doc_id", "n_chars"),
        index_sort=("n_chars", "desc"),
    )
    with pytest.raises(ValueError, match="index sort"):
        bp.bp_reorder_merge(idx)
