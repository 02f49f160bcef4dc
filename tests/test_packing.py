"""Sequence packing: first-fit invariants, determinism under
repartitioning, and an exact hand-computed case."""

import numpy as np
import ray.data as rd

from lucene_ray.ops.packing import pack_bucket, pack_sequences

SF = "/root/testdata/sf0.001"


def test_pack_bucket_exact():
    ids = np.arange(6)
    toks = np.array([100, 300, 200, 512, 600, 10])
    seq, off = pack_bucket(ids, toks, budget=512)
    # 100+300 fit; +200 would overflow -> new seq; 512 exactly fills and
    # closes; 600 over-long gets its own and closes; 10 starts fresh
    assert seq.tolist() == [0, 0, 1, 2, 3, 4]
    assert off.tolist() == [0, 100, 0, 0, 0, 0]


def test_pack_sequences_invariants(ray_session):
    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    out = pack_sequences(ds, budget=256, bucket_size=64).to_pandas()
    assert len(out) == 500  # every doc packed exactly once
    assert (out["bucket"] == out["doc_id"] // 64).all()
    for (_b, _s), g in out.groupby(["bucket", "seq"]):
        g = g.sort_values("doc_id")
        # offsets are the running token prefix inside the sequence
        assert (g["offset"].to_numpy()
                == np.concatenate([[0], g["n_tokens"].cumsum().to_numpy()[:-1]])).all()
        total = int(g["n_tokens"].sum())
        # a multi-doc sequence never exceeds the budget
        if len(g) > 1:
            assert total <= 256 or total - int(g["n_tokens"].iloc[-1]) < 256
    # determinism: a different partitioning yields the identical packing
    out2 = (
        pack_sequences(ds.repartition(7), budget=256, bucket_size=64)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.sort_values("doc_id").reset_index(drop=True).equals(out2)
