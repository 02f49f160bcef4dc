"""Salted-exchange build: hot-partition term-range salting must be
result-identical to the fused build and CheckIndex-clean."""

from __future__ import annotations

import uuid

import pytest

from lucene_ray.corpus import generate_corpus
from lucene_ray.index.build import build_index
from lucene_ray.index.check import check_index
from lucene_ray.search.query import TermQuery, bool_query
from lucene_ray.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("salt_corpus")
    pq.write_table(generate_corpus(500, seed=27), str(d / "c.parquet"), row_group_size=64)
    return str(d)


def _results(idx):
    s = IndexSearcher(idx)
    out = []
    for q in [
        TermQuery("def"),
        TermQuery("return"),
        bool_query(should=[TermQuery("import"), TermQuery("func"), TermQuery("const")]),
    ]:
        out.append([(d, float(sc)) for d, sc in s.search(q, 15)])
    cs = s.collection_stats
    return out, (cs.doc_count, cs.sum_total_term_freq, cs.sum_doc_freq)


def test_salted_shuffle_matches_fused(ray_session, corpus, tmp_path):
    fused = str(tmp_path / f"f-{uuid.uuid4().hex[:6]}")
    salted = str(tmp_path / f"s-{uuid.uuid4().hex[:6]}")
    build_index(corpus, fused, docs_per_segment=128, mode="fused",
                write_doc_tables=False, resume=False)
    build_index(corpus, salted, docs_per_segment=128, mode="shuffle", term_salt=4,
                write_doc_tables=False, resume=False)
    assert check_index(salted, raise_on_error=False, use_ray=False)["ok"]
    assert _results(fused) == _results(salted)


def test_positions_cross_mode(ray_session, corpus, tmp_path):
    """Phrase results identical across fused / shuffle / salted-shuffle
    positions builds (the list column rides the exchange)."""
    import uuid

    from lucene_ray.search.query import PhraseQuery

    phrases = [("def", "return"), ("return", "return")]
    results = {}
    for label, kw in [
        ("fused", dict(mode="fused")),
        ("shuffle", dict(mode="shuffle")),
        ("salted", dict(mode="shuffle", term_salt=4)),
    ]:
        idx = str(tmp_path / f"p-{label}-{uuid.uuid4().hex[:6]}")
        build_index(corpus, idx, docs_per_segment=128, index_options="positions",
                    write_doc_tables=False, resume=False, **kw)
        assert check_index(idx, raise_on_error=False, use_ray=False)["ok"], label
        s = IndexSearcher(idx)
        results[label] = [
            [(d, float(sc)) for d, sc in s.search(PhraseQuery(p), 10)] for p in phrases
        ]
    assert results["shuffle"] == results["fused"] == results["salted"]
    assert any(any(r) for r in results["fused"])
