"""Soft deletes (index/SoftDeletesDirectoryReaderWrapper.java +
IndexWriter.softUpdateDocument): wrapped searchers hide marked docs,
the unwrapped view retains them, point-in-time generations unaffected,
and hard liveDocs compose."""
import pyarrow.parquet as pq
import pytest

from lucene_ray.corpus import generate_corpus
from lucene_ray.index.build import build_index_local
from lucene_ray.index.deletes import delete_by_query
from lucene_ray.index.softdeletes import (
    soft_delete_by_query,
    soft_deleted_docids,
    wrap_soft_deletes,
)
from lucene_ray.search.query import MatchAllDocsQuery, TermQuery, bool_query
from lucene_ray.search.searcher import IndexSearcher


@pytest.fixture()
def idx(tmp_path):
    d = tmp_path / "c"
    d.mkdir()
    pq.write_table(generate_corpus(120, seed=5), str(d / "c.parquet"), row_group_size=30)
    out = str(tmp_path / "idx")
    build_index_local(str(d), out, docs_per_segment=30)
    return out


def test_wrapped_hides_unwrapped_retains(idx):
    s0 = IndexSearcher(idx)
    n_all = s0.count(MatchAllDocsQuery())
    n_def = s0.count(TermQuery("def"))
    assert n_def > 0

    soft_delete_by_query(idx, TermQuery("def"))
    s1 = IndexSearcher(idx)
    # unwrapped searcher (retention view): nothing disappears
    assert s1.count(MatchAllDocsQuery()) == n_all
    assert s1.count(TermQuery("def")) == n_def
    # wrapped: soft-deleted docs vanish from counts AND rankings
    w = wrap_soft_deletes(s1)
    assert w.count(TermQuery("def")) == 0
    assert w.count(MatchAllDocsQuery()) == n_all - n_def
    hidden = {
        int(d) + seg["doc_base"]
        for r, seg in zip(s1.readers, s1.manifest["segments"])
        for d in soft_deleted_docids(seg)
    }
    assert len(hidden) == n_def
    got = {d for d, _ in w.search(MatchAllDocsQuery(), n_all)}
    assert got.isdisjoint(hidden)

    # point-in-time: the pre-mark generation still sees everything
    old = IndexSearcher(idx, generation=s0.generation)
    assert wrap_soft_deletes(old).count(TermQuery("def")) == n_def


def test_soft_and_hard_deletes_compose(idx):
    s = IndexSearcher(idx)
    n_all = s.count(MatchAllDocsQuery())
    n_ret = s.count(TermQuery("return"))
    n_def_only = s.count(TermQuery("def")) - s.count(
        bool_query(
            must=[TermQuery("def"), TermQuery("return")]
        )
    )
    delete_by_query(idx, TermQuery("return"))  # hard
    soft_delete_by_query(idx, TermQuery("def"))  # soft (some overlap ok)
    w = wrap_soft_deletes(IndexSearcher(idx))
    assert w.count(TermQuery("return")) == 0
    assert w.count(TermQuery("def")) == 0
    assert w.count(MatchAllDocsQuery()) <= n_all - n_ret - n_def_only
