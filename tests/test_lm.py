"""Bigram-LM quality scoring (CCNet-style gate): brute-force exactness,
order-independent integer sums, and the training-mix gate wiring."""

import collections
import re

import numpy as np
import pyarrow.parquet as pq
import ray.data as rd

from lucene_ray.ops import lm
from lucene_ray.ops.util import TOKEN_PATTERN

SF = "/root/testdata/sf0.001"


def _brute_scores():
    rx = re.compile(TOKEN_PATTERN)
    corpus = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    toks = {r["doc_id"]: rx.findall((r["text"] or "").lower()) for r in corpus}
    big, uni, vocab = collections.Counter(), collections.Counter(), set()
    for ts in toks.values():
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] += 1
            uni[a] += 1
    V = len(vocab)
    out = {}
    for d, ts in toks.items():
        q = nb = 0
        for a, b in zip(ts, ts[1:]):
            lp = np.float32(np.log((big[(a, b)] + 1.0) / (uni[a] + V)))
            q += int(np.round(np.float64(lp) * lm.LM_SCALE))
            nb += 1
        if nb:
            out[d] = (nb, q)
    return out


def test_lm_scores_exact(ray_session):
    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = lm.lm_scores(ds).to_pandas()
    want = _brute_scores()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        nb, q = want[int(r["doc_id"])]
        assert (int(r["n_bigrams"]), int(r["lm_logprob_q"])) == (nb, q)


def test_lm_scores_deterministic_under_partitioning(ray_session):
    # the 2^-40 integer discipline makes combine order irrelevant: a
    # repartitioned input yields bit-identical sums
    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    a = lm.lm_scores(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        lm.lm_scores(ds.repartition(13))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_training_mix_lm_gate_drops(ray_session):
    # the gate keeps exactly the docs whose integer average clears the bar
    from lucene_ray.ops.clean import training_mix

    ds = rd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    kept = set(training_mix(ds).to_pandas()["doc_id"])
    want = _brute_scores()
    # every kept doc with bigrams clears the threshold
    for d in kept:
        if d in want:
            nb, q = want[d]
            assert q >= lm.LM_MIN_AVG_Q * nb
    # and the gate actually fired: some doc below the bar exists
    assert any(q < lm.LM_MIN_AVG_Q * nb for nb, q in want.values())


def test_legacy_bm25_is_scaled_bm25():
    """LegacyBM25Similarity == (k1+1) * BM25 in f32 (the reference
    delegates with boost * (k1 + 1))."""
    import numpy as np

    from lucene_ray.search.bm25 import (
        BM25Similarity,
        CollectionStatistics,
        TermStatistics,
    )
    from lucene_ray.search.similarities import LegacyBM25Similarity

    cs = CollectionStatistics(1000, 1000, 50000, 20000)
    ts = TermStatistics("t", 37, 99)
    plain = BM25Similarity().scorer(1.0, cs, ts)
    legacy = LegacyBM25Similarity().scorer(1.0, cs, ts)
    for freq, nb in ((1, 10), (3, 99), (17, 200)):
        got = legacy.score(freq, nb)
        ref = plain.score(freq, nb)
        # exact f32 relation: same shape with weight scaled by (k1+1)
        w = np.float32(np.float32(2.2) * plain.idf)
        ni = plain.cache[nb & 0xFF]
        expect = np.float32(w - w / (np.float32(1) + np.float32(freq) * ni))
        assert got == expect
        assert got > ref  # strictly larger, same ordering
