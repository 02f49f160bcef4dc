"""MemoryIndex (lucene/memory analogue): in-RAM single-doc segment must be
score-identical to the same document indexed on disk."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.build import build_index_local
from lucene_ray.index.memory import MemoryIndex
from lucene_ray.search.query import (
    BooleanQuery,
    BoostQuery,
    FuzzyQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    bool_query,
)
from lucene_ray.search.searcher import IndexSearcher

TEXT = "the quick brown fox jumps over the lazy dog quick quick fox"


@pytest.fixture(scope="module")
def disk_idx(tmp_path_factory):
    d = tmp_path_factory.mktemp("mem_corpus")
    tbl = pa.table(
        {
            "repo": ["r"],
            "path": ["p"],
            "commit": ["c"],
            "lang": ["en"],
            "content": [TEXT],
        }
    )
    pq.write_table(tbl, str(d / "c.parquet"))
    out = str(tmp_path_factory.mktemp("mem_idx"))
    build_index_local(str(d), out, docs_per_segment=10, index_options="positions")
    return out


QUERIES = [
    TermQuery("quick"),
    TermQuery("dog"),
    TermQuery("missing"),
    bool_query(should=[TermQuery("fox"), TermQuery("lazy")]),
    bool_query(must=[TermQuery("fox")], must_not=[TermQuery("missing")]),
    BoostQuery(TermQuery("quick"), 2.5),
    PhraseQuery(("quick", "brown", "fox")),
    PhraseQuery(("brown", "quick")),      # absent order
    PhraseQuery(("lazy", "dog")),
    PrefixQuery("qu"),
    FuzzyQuery("quik", 1),
]


def test_memory_scores_equal_disk(disk_idx):
    mi = MemoryIndex(TEXT)
    searcher = IndexSearcher(disk_idx)
    for q in QUERIES:
        hits = searcher.search(q, 1, total_hits_threshold=np.inf, score_mode="COMPLETE")
        want = float(hits[0][1]) if hits else 0.0
        got = mi.search(q)
        assert np.float32(got) == np.float32(want), q


def test_memory_matches_predicate():
    mi = MemoryIndex(TEXT)
    assert mi.matches(PhraseQuery(("quick", "brown", "fox")))
    assert not mi.matches(PhraseQuery(("fox", "brown")))
    assert mi.matches(bool_query(must=[TermQuery("dog")]))
    assert not mi.matches(TermQuery("zebra"))


def test_memory_percolation_loop():
    """The MemoryIndex percolation shape: registered queries x documents."""
    registered = {
        "q_fox_phrase": PhraseQuery(("brown", "fox")),
        "q_lazy": TermQuery("lazy"),
        "q_both": bool_query(must=[TermQuery("cat"), TermQuery("dog")]),
    }
    docs = {
        1: TEXT,
        2: "a cat and a dog live here",
        3: "nothing relevant at all",
    }
    got = {
        (d, name)
        for d, text in docs.items()
        for name, q in registered.items()
        if MemoryIndex(text).matches(q)
    }
    assert got == {(1, "q_fox_phrase"), (1, "q_lazy"), (2, "q_both")}


def test_exact_percolator_equals_vectorized(ray_session):
    """Cross-validation of BOTH percolation paths: the MemoryIndex exact
    actor-pool stage must reduce to the same (qid, n, sum, min, max)
    partials as the vectorized polars matchers on the same query set."""
    import ray.data as rd

    from lucene_ray.ops import monitor

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    vec = monitor.percolate_counts(ds).to_pandas()
    ds2 = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    exact = monitor.percolate_counts_exact(ds2).to_pandas()
    assert vec.to_dict("records") == exact.to_dict("records")


def test_memory_index_offsets_flag():
    """term_offset_spans on a MemoryIndex raises ValueError (not
    AttributeError) — has_offsets is explicitly False (ADVICE r3)."""
    import pytest

    from lucene_ray.index.memory import MemoryIndex

    mi = MemoryIndex("hello world hello")
    r = mi.reader()
    assert r.has_offsets is False
    with pytest.raises(ValueError):
        r.term_offset_spans(0)


def test_presearch_percolator_parity_and_pruning(ray_session):
    """TermFilteredPresearcher analogue: identical percolate_counts output
    through the candidate-pruned path, and with a large registry of
    mostly-absent terms the evaluated (query, doc) pairs collapse."""
    import ray.data as rd

    from lucene_ray.ops import monitor

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    base = monitor.percolate_counts(ds).to_pandas()
    pre = monitor.percolate_counts_presearch(
        rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    ).to_pandas()
    assert pre.equals(base)

    # big synthetic registry: 400 queries over absent terms + the 5 real
    big = list(monitor.MONITOR_QUERIES) + [
        ("term", f"zzqx{i}") for i in range(200)
    ] + [("and", [f"zzqa{i}", f"zzqb{i}"]) for i in range(200)]
    p = monitor.PresearchPercolator(big)
    import pyarrow.parquet as pq

    batch = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    out = p(batch)
    assert out.num_rows == len(big)
    # absent-term queries were never evaluated: pruning >= 95%
    stats = p.last_stats
    assert stats["evaluated_pairs"] < 0.05 * stats["possible_pairs"]
    # and the real queries still match exactly what match_batch says
    ref = monitor.match_batch(batch, list(monitor.MONITOR_QUERIES))
    assert out.slice(0, len(monitor.MONITOR_QUERIES)).equals(ref)


def test_query_decomposer_semantics():
    """QueryDecomposer (monitor/QueryDecomposer.java): pure disjunctions
    split per clause (recursively), everything else is atomic; the or_of
    evaluator equals the union of its clauses."""
    import pyarrow.parquet as pq

    from lucene_ray.ops import monitor

    assert monitor.decompose(("or", ["a", "b"])) == [("term", "a"), ("term", "b")]
    assert monitor.decompose(
        ("or_of", (("and", ["x", "y"]), ("or", ["p", "q"])))
    ) == [("and", ["x", "y"]), ("term", "p"), ("term", "q")]
    assert monitor.decompose(("and", ["x", "y"])) == [("and", ["x", "y"])]

    batch = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    q = ("or_of", (("and", ["merge", "sort"]), ("phrase", ["window", "batch"])))
    combined = monitor.match_batch(batch, [q]).to_pylist()[0]
    subs = monitor.match_batch(batch, list(monitor.decompose(q))).to_pylist()
    # the union of the decomposed clauses covers exactly the parent match
    assert combined["n_matches"] <= sum(s["n_matches"] for s in subs)
    assert combined["min_doc"] == min(s["min_doc"] for s in subs)
    assert combined["max_doc"] == max(s["max_doc"] for s in subs)
    # presearcher path with a decomposed registry == evaluate-everything
    p = monitor.PresearchPercolator([q])
    assert len(p.subs) == 2 and p.sub_parent == [0, 0]
    assert p(batch).to_pylist() == monitor.match_batch(batch, [q]).to_pylist()
