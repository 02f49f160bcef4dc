"""SemDeDup (Abbas et al. 2023, arXiv 2303.09540): hashed-TF embedding
parity with the oracle kernel, integer-exact cosine thresholding, the
within-cluster keep rule (lowest centroid similarity survives), and
coverage on planted duplicates."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.ops import semdedup as sd


def test_hashed_tf_matches_duckdb():
    batch = pa.table(
        {
            "doc_id": pa.array([7, 9, 11], pa.int64()),
            "text": pa.array(["alpha beta alpha", "gamma_1 DELTA", None]),
        }
    )
    out = sd.hashed_tf_batch(batch)
    assert out.column("vec_id").to_pylist() == [7, 9, 11]
    mats = {
        i: np.asarray(v, dtype=np.int64)
        for i, v in zip(out.column("vec_id").to_pylist(),
                        out.column("embedding").to_pylist())
    }
    want = duckdb.sql(
        "select cast(md5_number_lower(t) % 64 as bigint) b, c from (values "
        "('alpha', 2), ('beta', 1)) v(t, c)"
    ).fetchall()
    v7 = np.zeros(64, np.int64)
    for b, c in want:
        v7[b] = c
    assert np.array_equal(mats[7], v7)
    assert mats[9].sum() == 2  # gamma_1 + delta (lowercased, _ kept)
    assert mats[11].sum() == 0  # null text -> zero vector


def test_edges_int_matches_float_cosine():
    rng = np.random.default_rng(5)
    mat = rng.integers(0, 9, size=(40, 64)).astype(np.int64)
    ids = np.arange(40, dtype=np.int64)
    a, b = sd._edges_int(ids, mat, ids, mat)
    got = set(zip(a.tolist(), b.tolist()))
    norms = np.linalg.norm(mat.astype(np.float64), axis=1)
    cos = (mat @ mat.T) / np.outer(norms, norms)
    tau = np.sqrt(sd.TAU_NUM / sd.TAU_DEN)
    want = {
        (i, j)
        for i in range(40)
        for j in range(i + 1, 40)
        if cos[i, j] >= tau - 1e-12 and (mat[i] @ mat[j]) > 0
    }
    # integer comparator == float comparator away from the boundary;
    # ON the boundary the integer form is the definition
    assert got == want


def _docs_table(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )


def test_keep_rule_lowest_centroid_sim(ray_session):
    import ray.data as rd

    # three identical docs (one component) + one distinct doc; k=1 puts
    # everything in a single cluster, identical members tie on centroid
    # similarity -> lowest doc_id survives, the other two drop
    docs = _docs_table(
        ["spark join merge window"] * 3
        + ["completely different words entirely elsewhere"]
    )
    drops = sd.semdedup_drops(rd.from_arrow(docs), k=1).to_pandas()
    assert sorted(drops["doc_id"]) == [1, 2]


def test_planted_coverage_and_no_false_drops(ray_session):
    import ray.data as rd

    base_a = "alpha beta gamma delta epsilon zeta theta iota kappa lam mu nu"
    base_b = "one two three four five six seven eight nine ten eleven twelve"
    pairs = [
        base_a + " omega",
        base_a + " sigma",  # near-dup of 0 (12 of 13 tokens shared)
        base_b + " red",
        base_b + " blue",   # near-dup of 2
        "totally unrelated text goes here now",
        "other singleton content with nothing shared",
    ]
    ds = rd.from_arrow(_docs_table(pairs))
    exact = sd.semantic_duplicate_clusters(ds).to_pandas()
    assert set(exact["doc_id"]) == {0, 1, 2, 3}
    assert exact["cluster_id"].nunique() == 2
    drops = sd.semdedup_drops(ds, k=2).to_pandas()
    # no false drops, and with k=2 the two planted pairs are recovered
    assert set(drops["doc_id"]) <= {0, 1, 2, 3}
    assert len(drops) == 2  # one survivor per component


def test_exact_arm_matches_sql_components(ray_session):
    import ray.data as rd

    texts = [
        "a b c d e f g h i j",
        "a b c d e f g h i k",
        "a b c d e f g h j k",
        "z y x w v u t s r q",
    ]
    d = _docs_table(texts)  # noqa: F841 — duckdb scan
    got = (
        sd.semantic_duplicate_clusters(rd.from_arrow(d))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        with recursive
        toks as (select doc_id, unnest(regexp_extract_all(lower(coalesce(text,'')),
                 '[a-z0-9_]+')) tok from d),
        tf as (select doc_id, cast(md5_number_lower(tok) % {sd.DIM} as bigint) b,
               count(*)::bigint c from toks group by 1,2),
        n2 as (select doc_id, sum(c*c)::bigint n2 from tf group by 1),
        dots as (select a.doc_id da, b.doc_id db_, sum(a.c*b.c)::bigint dot
                 from tf a join tf b on a.b=b.b and a.doc_id<b.doc_id group by 1,2),
        p as (select da, db_ from dots join n2 x on x.doc_id=da
              join n2 y on y.doc_id=db_
              where dot>0 and {sd.TAU_DEN}*dot*dot >= {sd.TAU_NUM}*x.n2*y.n2),
        e as (select da a, db_ b from p union all select db_, da from p),
        nodes as (select distinct a node from e),
        reach(node,lbl) as (select node, node from nodes union
                            select e.b, r.lbl from reach r join e on e.a=r.node),
        lab as (select node, min(lbl) cluster_id from reach group by node)
        select node::bigint doc_id, cluster_id::bigint cluster_id,
               (count(*) over (partition by cluster_id))::bigint cluster_size
        from lab order by doc_id
        """
    ).df()
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)
