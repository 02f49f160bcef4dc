"""Numeric doc-values updates (IndexWriter.updateNumericDocValue): sidecar
overlays, point-in-time isolation, newest-wins merging, and filter/facet
visibility through the searcher."""

import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.deletes import update_numeric_docvalue
from lucene_ray.pipelines import fulltext as ft
from lucene_ray.search.query import StoredFieldRange, TermQuery, bool_query
from lucene_ray.search.searcher import IndexSearcher

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def idx(tmp_path):
    src = ft.ensure_index(SF)
    dst = str(tmp_path / "idx")
    shutil.copytree(src, dst)
    return dst


def _count_nchars_ge(searcher, lo):
    return searcher.count(
        bool_query(filter=[StoredFieldRange("n_chars", lo, 1 << 60)])
    )


def test_update_changes_filters_and_is_point_in_time(idx, ray_session):
    s0 = IndexSearcher(idx)
    gen0 = s0.generation
    n_spark = s0.count(TermQuery("spark"))
    before = _count_nchars_ge(s0, 10**6)
    assert before == 0
    man = update_numeric_docvalue(idx, TermQuery("spark"), "n_chars", 10**6)
    assert man["generation"] == gen0 + 1
    s1 = IndexSearcher(idx)
    # every spark doc now clears the huge threshold
    assert _count_nchars_ge(s1, 10**6) == n_spark
    # point-in-time: the old generation still serves old values
    s_old = IndexSearcher(idx, generation=gen0)
    assert _count_nchars_ge(s_old, 10**6) == 0


def test_repeated_updates_newest_wins(idx, ray_session):
    update_numeric_docvalue(idx, TermQuery("spark"), "n_chars", 10**6)
    update_numeric_docvalue(idx, TermQuery("spark"), "n_chars", 2 * 10**6)
    s = IndexSearcher(idx)
    n_spark = s.count(TermQuery("spark"))
    assert _count_nchars_ge(s, 2 * 10**6) == n_spark
    assert _count_nchars_ge(s, 10**6) == n_spark  # none left at 1e6 only
    # disjoint second update merges with the first overlay
    update_numeric_docvalue(idx, TermQuery("merge"), "n_chars", 3 * 10**6)
    s2 = IndexSearcher(idx)
    spark_and_merge = s2.count(
        bool_query(should=[TermQuery("spark"), TermQuery("merge")])
    )
    assert _count_nchars_ge(s2, 10**6) == spark_and_merge


def test_no_match_is_noop(idx, ray_session):
    s0 = IndexSearcher(idx)
    man = update_numeric_docvalue(
        idx, TermQuery("zzz_not_a_term"), "n_chars", 5
    )
    assert man["generation"] == s0.generation


def test_checkindex_validates_dv_overlays(idx, ray_session):
    import io

    import numpy as np

    from lucene_ray.index.check import CheckIndexError, check_index

    update_numeric_docvalue(idx, TermQuery("spark"), "n_chars", 7)
    rep = check_index(idx, use_ray=False)
    assert rep["ok"]
    # tamper: descending docids in the overlay
    from lucene_ray.index import manifest as mf

    man = mf.read_manifest(idx)
    path = next(
        s["dv_updates"]["n_chars"] for s in man["segments"] if s.get("dv_updates")
    )
    buf = io.BytesIO()
    np.savez_compressed(
        buf, docids=np.array([5, 3]), values=np.array([1, 2])
    )
    with open(path, "wb") as f:
        f.write(buf.getvalue())
    import pytest as _pytest

    with _pytest.raises(CheckIndexError, match="ascending"):
        check_index(idx, use_ray=False)


def test_distributed_searcher_sees_updates(idx, ray_session):
    from lucene_ray.search.searcher import DistributedSearcher

    update_numeric_docvalue(idx, TermQuery("spark"), "n_chars", 10**6)
    d = DistributedSearcher(idx, num_workers=2)
    n_spark = IndexSearcher(idx).count(TermQuery("spark"))
    hits = d.search(
        bool_query(
            must=[TermQuery("spark")],
            filter=[StoredFieldRange("n_chars", 10**6, 1 << 60)],
        ),
        k=1000,
    )
    assert len(hits) == n_spark
