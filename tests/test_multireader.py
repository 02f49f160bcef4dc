"""MultiReader view: search over two indexes == search over their
addIndexes union (same stats, same results), with no copying."""

import os

import pyarrow.parquet as pq
import pytest

from lucene_ray.index.addindexes import add_indexes
from lucene_ray.index.build import build_index
from lucene_ray.search.multireader import MultiIndexSearcher
from lucene_ray.search.query import TermQuery
from lucene_ray.search.searcher import IndexSearcher

SF = "/root/testdata/sf0.001"
META = ("doc_id", "lang", "source", "n_chars")


def _halves(tmp):
    corpus = pq.read_table(os.path.join(SF, "documents.parquet"))
    half = corpus.num_rows // 2
    idxs = []
    for name, rows in (("a", corpus.slice(0, half)), ("b", corpus.slice(half))):
        src = os.path.join(tmp, f"{name}.parquet")
        pq.write_table(rows, src, row_group_size=100)
        idx = os.path.join(tmp, f"idx_{name}")
        build_index(src, idx, content_column="text", meta_columns=META,
                    docs_per_segment=150)
        idxs.append(idx)
    return idxs


def test_multireader_equals_addindexes(tmp_path, ray_session):
    a, b = _halves(str(tmp_path))
    multi = MultiIndexSearcher([a, b])
    # union via copy for the reference result
    import shutil

    u = str(tmp_path / "union")
    shutil.copytree(a, u)
    add_indexes(u, [b])
    union = IndexSearcher(u)
    assert multi.collection_stats == union.collection_stats
    for term in ("spark", "join", "window"):
        assert multi.search(TermQuery(term), 25) == union.search(TermQuery(term), 25)
        assert multi.count(TermQuery(term)) == union.count(TermQuery(term))


def test_multireader_rejects_incompatible(tmp_path, ray_session):
    a, _b = _halves(str(tmp_path))
    src = os.path.join(str(tmp_path), "c.parquet")
    pq.write_table(
        pq.read_table(os.path.join(SF, "documents.parquet")).slice(0, 100), src
    )
    c = os.path.join(str(tmp_path), "idx_c")
    build_index(src, c, content_column="text", meta_columns=META,
                analyzer="english_minimal", docs_per_segment=150)
    with pytest.raises(ValueError, match="incompatible analyzer"):
        MultiIndexSearcher([a, c])
