"""IndexOrDocValuesQuery: cost-based index-vs-doc-values filter execution
(reference search/IndexOrDocValuesQuery.java + TestIndexOrDocValuesQuery):
both sides must produce identical results; the planner picks the dv side
only when the lead clause is much more selective than the index-side
match set (threshold = indexCost >>> 3)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_ray.corpus import generate_corpus
from lucene_ray.index.build import build_index_local
from lucene_ray.index.points import build_point_index
from lucene_ray.search import query as q
from lucene_ray.search.query import (
    IndexOrDocValuesQuery,
    PointBoxQuery,
    StoredFieldRange,
    TermQuery,
    bool_query,
)
from lucene_ray.search.searcher import IndexSearcher

FIELDS = ("n_chars", "doc_id")


@pytest.fixture(scope="module")
def built(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("iodv")
    corpus_dir = str(root / "corpus")
    os.makedirs(corpus_dir)
    tbl = generate_corpus(600, seed=23)
    import pyarrow as pa

    texts = tbl.column("content")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": texts,
            "n_chars": pa.array(
                [len(t) for t in texts.to_pylist()], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, corpus_dir + "/part-0000.parquet", row_group_size=97)
    index_dir = str(root / "index")
    build_index_local(
        corpus_dir,
        index_dir,
        docs_per_segment=200,
        content_column="text",
        meta_columns=("doc_id", "n_chars"),
    )
    build_point_index(index_dir, FIELDS)
    return tbl, IndexSearcher(index_dir)


def _iodv(lo, hi):
    return IndexOrDocValuesQuery(
        index_query=PointBoxQuery(FIELDS, (lo, None), (hi, None)),
        dv_query=StoredFieldRange("n_chars", lo, hi),
    )


def _reset():
    q.INDEX_OR_DV_STATS["index"] = 0
    q.INDEX_OR_DV_STATS["dv"] = 0


def _rare_and_common_terms(tbl, searcher):
    """(rare, common): a term with tiny df and one matching most docs.
    Terms come pre-lowercased from the analyzer's own view so they
    survive tokenization."""
    texts = tbl.column("text").to_pylist()
    from collections import Counter

    df = Counter()
    for t in texts:
        df.update({w for w in t.lower().split() if w.isalpha() and len(w) > 2})
    common = max(df, key=lambda w: df[w])
    rare = min((w for w in df if df[w] >= 1), key=lambda w: (df[w], w))
    return rare, common


def test_results_identical_on_both_paths(built):
    tbl, searcher = built
    rare, common = _rare_and_common_terms(tbl, searcher)
    for term in (rare, common):
        for lo, hi in ((100, 400), (None, 300), (250, None)):
            base = bool_query(
                must=[TermQuery(term)],
                filter=[StoredFieldRange("n_chars", lo, hi)],
            )
            iodv = bool_query(must=[TermQuery(term)], filter=[_iodv(lo, hi)])
            expect = searcher.search(base, 50)
            got = searcher.search(iodv, 50)
            assert got == expect, (term, lo, hi)


def test_selective_lead_picks_dv(built):
    tbl, searcher = built
    rare, _ = _rare_and_common_terms(tbl, searcher)
    _reset()
    # wide range (index cost ~ most docs) + rare lead -> dv verification
    hits = searcher.search(
        bool_query(must=[TermQuery(rare)], filter=[_iodv(1, 10_000)]), 10
    )
    assert q.INDEX_OR_DV_STATS["dv"] > 0
    assert q.INDEX_OR_DV_STATS["index"] == 0
    assert len(hits) > 0


def test_wide_lead_picks_index(built):
    tbl, searcher = built
    _, common = _rare_and_common_terms(tbl, searcher)
    _reset()
    # narrow range + very common lead -> index intersect
    searcher.search(
        bool_query(must=[TermQuery(common)], filter=[_iodv(100, 110)]), 10
    )
    assert q.INDEX_OR_DV_STATS["index"] > 0
    assert q.INDEX_OR_DV_STATS["dv"] == 0


def test_standalone_filter_uses_index(built):
    _, searcher = built
    _reset()
    # no lead clause at all: the reference's bulkScorer() case -> index
    hits = searcher.search(bool_query(filter=[_iodv(100, 400)]), 10)
    assert q.INDEX_OR_DV_STATS["index"] > 0
    assert q.INDEX_OR_DV_STATS["dv"] == 0
    assert len(hits) > 0


def test_estimate_count_brackets_truth(built):
    """BKD estimatePointCount: exact on inside/outside cells, within the
    crossing-leaf slack otherwise (never > 2x off given leaf halving)."""
    tbl, searcher = built
    readers = searcher.readers if hasattr(searcher, "readers") else []
    checked = 0
    for r in getattr(searcher, "readers", []):
        tree = r.point_tree(FIELDS)
        if tree is None:
            continue
        for lo, hi in ((100, 400), (None, 300), (250, None), (10_000, 20_000)):
            exact = len(tree.intersect((lo, None), (hi, None))[0])
            est = tree.estimate_count((lo, None), (hi, None))
            slack = tree.values.shape[0]  # crossing leaves bound
            assert est >= exact // 2 - 1
            assert est <= exact + slack
            if exact == 0:
                # outside-only traversal stays exact
                assert est <= tree.values.shape[0] // 2
            checked += 1
    assert checked > 0


def test_docvalues_terms_query(built):
    """DocValuesTermsQuery (sandbox/search/DocValuesTermsQuery.java): the
    doc-values twin of TermInSetQuery — set membership on the stored
    column, identical to a union of per-value equality filters, and
    usable as the dv side of IndexOrDocValuesQuery against a
    semantically-equal multi-range index side (the pairing the reference
    javadoc recommends)."""
    from lucene_ray.search.query import (
        DocValuesTermsQuery,
        PointMultiRangeQuery,
        StoredFieldFilter,
        TermQuery,
        bool_query,
    )

    tbl, searcher = built
    vals = sorted(set(tbl.column("n_chars").to_pylist()))[:5]
    dv = DocValuesTermsQuery("n_chars", tuple(vals))
    got = searcher.search(bool_query(filter=[dv]), 10_000)
    want_docs = set()
    for v in vals:
        for d, _s in searcher.search(
            bool_query(filter=[StoredFieldFilter("n_chars", v)]), 10_000
        ):
            want_docs.add(d)
    assert {d for d, _ in got} == want_docs
    assert len(got) > 0

    # IndexOrDocValuesQuery pairing: [v, v+1) boxes == the value set
    rare, _ = _rare_and_common_terms(tbl, searcher)
    boxes = tuple(((v, None), (v + 1, None)) for v in vals)
    pair = q.IndexOrDocValuesQuery(
        index_query=PointMultiRangeQuery(FIELDS, boxes),
        dv_query=dv,
    )
    base = searcher.search(bool_query(must=[TermQuery(rare)], filter=[dv]), 50)
    _reset()
    via_pair = searcher.search(
        bool_query(must=[TermQuery(rare)], filter=[pair]), 50
    )
    assert via_pair == base
    assert q.INDEX_OR_DV_STATS["dv"] + q.INDEX_OR_DV_STATS["index"] > 0
