"""Semantic validity of the dedup / ANN operators on PLANTED duplicates.

The DuckDB oracles prove Ray==SQL equivalence; these tests prove the
operators actually FIND what they exist to find: planted near-duplicate
documents surface as LSH candidates / SimHash pairs / high-Jaccard pairs,
and IVF with partial probing still recalls most true neighbors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.ops import ann, dedup


@pytest.fixture(scope="module")
def planted_docs(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(99)
    vocab = [f"w{i}" for i in range(500)]
    texts = []
    for i in range(40):
        words = [vocab[j] for j in rng.integers(0, 500, size=60)]
        texts.append(" ".join(words))
    # plant near-dups: docs 40..44 are copies of 0..4 with ONE word changed
    for i in range(5):
        words = texts[i].split()
        words[7] = "changed"
        texts.append(" ".join(words))
    # and one exact duplicate of doc 10
    texts.append(texts[10])
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    return rd.from_arrow(tbl), texts


def test_exact_dedup_drops_planted_copy(planted_docs):
    ds, texts = planted_docs
    kept = set(dedup.exact_dedup(ds).to_pandas()["doc_id"])
    assert len(kept) == len(texts) - 1
    assert 10 in kept and 45 not in kept  # copy of doc 10 loses to min doc_id


def test_lsh_finds_planted_near_dups(planted_docs):
    ds, _ = planted_docs
    pairs = set(
        map(tuple, dedup.lsh_candidate_pairs(ds).to_pandas()[["doc_a", "doc_b"]].values)
    )
    for i in range(5):
        assert (i, 40 + i) in pairs, f"planted near-dup {i} not found"
    assert (10, 45) in pairs  # exact dup certainly collides


def test_jaccard_scores_planted_pairs_high(planted_docs):
    ds, _ = planted_docs
    df = dedup.ngram_jaccard_pairs(ds, min_jaccard_pct=50, max_group=10**6).to_pandas()
    pairs = {(a, b): (i, u) for a, b, i, u in df.values}
    for i in range(5):
        assert (i, 40 + i) in pairs
        inter, union = pairs[(i, 40 + i)]
        assert inter / union > 0.8  # one word changed in 60 -> jaccard high


def test_simhash_pairs_find_planted(planted_docs):
    ds, _ = planted_docs
    df = dedup.simhash_near_pairs(ds, max_dist=10, max_group=10**6).to_pandas()
    pairs = set(map(tuple, df[["doc_a", "doc_b"]].values))
    assert (10, 45) in pairs  # exact dup: hamming 0
    found = sum((i, 40 + i) in pairs for i in range(5))
    assert found >= 3  # near-dups usually land within 10 bits


def test_kmeans_ivf(ray_session):
    import ray.data as rd

    path = "/root/testdata/sf0.01/embeddings.parquet"
    q = ann.load_queries(path, [0, 1, 2, 3, 4])
    cents = ann.kmeans(rd.read_parquet(path), k=8, iters=3)
    assert cents.shape == (8, 64) and np.isfinite(cents).all()
    # centroids must actually move from the seed vectors (iterations ran)
    seed = ann.kmeans(rd.read_parquet(path), k=8, iters=0)
    assert not np.allclose(cents, seed)
    # full probe == exact brute force
    brute = ann.brute_topk(rd.read_parquet(path), q, k=10).to_pandas()
    full = ann.ivf_topk_kmeans(rd.read_parquet(path), q, cents, k=10, nprobe=8).to_pandas()
    assert full.equals(brute)
    # partial probe: decent recall on learned cells
    part = ann.ivf_topk_kmeans(rd.read_parquet(path), q, cents, k=10, nprobe=3).to_pandas()
    truth = {qid: set(g["neighbor_id"]) for qid, g in brute.groupby("query_id")}
    got = {qid: set(g["neighbor_id"]) for qid, g in part.groupby("query_id")}
    recalls = [len(truth[qid] & got.get(qid, set())) / 10 for qid in truth]
    assert np.mean(recalls) >= 0.3


def test_ivf_partial_probe_recall(ray_session):
    import ray.data as rd

    path = "/root/testdata/sf0.01/embeddings.parquet"
    ds = rd.read_parquet(path)
    q = ann.load_queries(path, [0, 1, 2, 3, 4])
    brute = ann.brute_topk(rd.read_parquet(path), q, k=10).to_pandas()
    ivf = ann.ivf_topk(rd.read_parquet(path), q, k=10, nprobe=4).to_pandas()
    truth = {
        qid: set(g["neighbor_id"]) for qid, g in brute.groupby("query_id")
    }
    got = {qid: set(g["neighbor_id"]) for qid, g in ivf.groupby("query_id")}
    recalls = [len(truth[qid] & got.get(qid, set())) / 10 for qid in truth]
    assert np.mean(recalls) >= 0.3  # 4/10 partitions probed on random vectors
    # and full probing is exact
    full = ann.ivf_topk(rd.read_parquet(path), q, k=10, nprobe=10).to_pandas()
    assert full.equals(brute)


def test_ivf_scan_reduction(ray_session):
    """IVF must prune rows BEFORE scoring: scanned rows scale with
    nprobe/ncells (VERDICT r1 item 2)."""
    import ray.data as rd

    path = "/root/testdata/sf0.01/embeddings.parquet"
    q = ann.load_queries(path, [0, 1, 2, 3, 4])
    _, full_stats = ann.ivf_topk(
        rd.read_parquet(path), q, k=10, nprobe=10, return_stats=True
    )
    assert full_stats["scanned_rows"] == full_stats["total_rows"] > 0
    _, part_stats = ann.ivf_topk(
        rd.read_parquet(path), q, k=10, nprobe=2, return_stats=True
    )
    # 5 queries x 2 probes: the probed union must be well under the corpus
    frac = part_stats["scanned_rows"] / part_stats["total_rows"]
    assert frac < 0.95, frac
    # kmeans variant prunes too
    cents = ann.kmeans(rd.read_parquet(path), k=8, iters=2)
    _, ks = ann.ivf_topk_kmeans(
        rd.read_parquet(path), q, cents, k=10, nprobe=1, return_stats=True
    )
    assert 0 < ks["scanned_rows"] < ks["total_rows"]


def test_near_dup_pairs_lsh_recall(ray_session):
    """Planted embedding near-dups must be found by the hyperplane-LSH
    banding path, and the result must equal the numpy all-pairs truth."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    base = rng.standard_normal((60, 32))
    # plant 6 near-dup pairs: tiny perturbations of rows 0..5
    planted = base[:6] + 0.01 * rng.standard_normal((6, 32))
    mat = np.vstack([base, planted])
    ids = np.arange(len(mat), dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array([r.astype(np.float32).tolist() for r in mat],
                                  pa.list_(pa.float32())),
        }
    )
    # float32 round-trip like the parquet tables so truth matches exactly
    m = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    n = m / np.linalg.norm(m, axis=1, keepdims=True)
    s = n @ n.T
    iu, ju = np.triu_indices(len(m), 1)
    truth = {(int(a), int(b)) for a, b in zip(iu[s[iu, ju] >= 0.95], ju[s[iu, ju] >= 0.95])}
    assert len(truth) >= 6  # all planted pairs are above tau

    got = ann.near_dup_pairs(rd.from_arrow(tbl).repartition(4), tau=0.95)
    got_pairs = set(map(tuple, got.to_pandas()[["doc_a", "doc_b"]].values))
    assert got_pairs == truth


def test_scrub_pii_planted():
    from lucene_ray.ops import text

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                ["mail a.b@x.io twice c@d.org ip 10.0.0.1 card 1234567890123", "clean"]
            ),
        }
    )
    r = t and text.scrub_pii_batch(t).to_pylist()
    assert r[0]["n_email"] == 2 and r[0]["n_ipv4"] == 1 and r[0]["n_longnum"] == 1
    assert r[1]["n_email"] == r[1]["n_ipv4"] == r[1]["n_longnum"] == 0
    # scrubbed text actually changed vs unscrubbed md5
    import hashlib

    assert r[0]["clean_sha"] != hashlib.md5(t.column("text")[0].as_py().encode()).hexdigest()
    assert r[1]["clean_sha"] == hashlib.md5(b"clean").hexdigest()


def test_stratified_sample_deterministic_rates():
    from lucene_ray.ops import text

    n = 4000
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array((["en", "de", "fr", "zz"] * (n // 4))),
        }
    )
    a = text.stratified_sample_batch(t, {"en": 50, "de": 10, "fr": 100}, "lang")
    b = text.stratified_sample_batch(t, {"en": 50, "de": 10, "fr": 100}, "lang")
    assert a.equals(b)  # deterministic
    import collections

    c = collections.Counter(a.column("lang").to_pylist())
    assert c["fr"] == n // 4          # 100%
    assert "zz" not in c              # unlisted group -> 0
    assert abs(c["en"] / (n / 4) - 0.5) < 0.1
    assert abs(c["de"] / (n / 4) - 0.1) < 0.06


def test_hopping_counts_double_cover(ray_session):
    import ray.data as rd

    from lucene_ray.ops import events

    ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet")
    tot_events = ds.count()
    hop = events.hopping_counts(ds).to_pandas()
    # every event is counted in exactly window/hop = 2 windows
    assert hop["n_events"].sum() == 2 * tot_events
    tum = events.windowed_counts(
        rd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ).to_pandas()
    assert tum["n_events"].sum() == tot_events


def test_persisted_ivf_index(ray_session, tmp_path):
    """Persisted IVF: cell-partitioned parquet + centroid sidecar; full
    probe == brute force; partial probe reads ONLY the probed partitions
    from storage (scanned == total of what was read, < corpus)."""
    import ray.data as rd

    path = "/root/testdata/sf0.01/embeddings.parquet"
    q = ann.load_queries(path, [0, 1, 2, 3, 4])
    idx = str(tmp_path / "ivf")
    info = ann.build_ivf_index(rd.read_parquet(path), idx, k=8, iters=3)
    assert info["k"] == 8
    import os

    cells = [d for d in os.listdir(idx) if d.startswith("cell=")]
    assert len(cells) > 1  # actually partitioned
    full = ann.ivf_index_topk(idx, q, k=10, nprobe=8).to_pandas()
    brute = ann.brute_topk(rd.read_parquet(path), q, k=10).to_pandas()
    assert full.equals(brute)
    _, st = ann.ivf_index_topk(idx, q, k=10, nprobe=1, return_stats=True)
    n_total = rd.read_parquet(path).count()
    assert 0 < st["total_rows"] < n_total  # storage-level partition pruning


def test_hnsw_recall_and_determinism(ray_session):
    """Per-partition HNSW graphs: recall@10 >= 0.9 vs exact brute force on
    a 2000-vector synthetic set, and builds are deterministic."""
    import ray.data as rd

    from lucene_ray.ops import hnsw

    rng = np.random.default_rng(123)
    n, dim = 2000, 32
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([r.tolist() for r in mat], pa.list_(pa.float32())),
        }
    )
    qids = list(range(10))
    m = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    qmat = m[qids]
    queries = (np.array(qids), qmat, np.linalg.norm(qmat, axis=1))

    got1 = hnsw.hnsw_topk(rd.from_arrow(tbl).repartition(4), queries,
                          k=10, partitions=4).to_pandas()
    got2 = hnsw.hnsw_topk(rd.from_arrow(tbl).repartition(4), queries,
                          k=10, partitions=4).to_pandas()
    assert got1.equals(got2)  # deterministic build + search

    brute = ann.brute_topk(rd.from_arrow(tbl), queries, k=10).to_pandas()
    truth = {q: set(g["neighbor_id"]) for q, g in brute.groupby("query_id")}
    got = {q: set(g["neighbor_id"]) for q, g in got1.groupby("query_id")}
    recalls = [len(truth[q] & got.get(q, set())) / 10 for q in truth]
    assert np.mean(recalls) >= 0.9, recalls


def test_duplicate_clusters_transitive_chain(ray_session):
    """A~B and B~C but A!~C must still land in ONE component (the label
    needs >= 2 propagation rounds to cross the chain)."""
    import ray.data as rd

    base = [f"w{i}" for i in range(12)]
    a = " ".join(base)
    # B shares 8/12 words with A and 8/12 with C; A and C share only 4
    b = " ".join(base[4:] + [f"x{i}" for i in range(4)])
    c = " ".join(base[8:] + [f"x{i}" for i in range(8)])
    other = "entirely different words nothing shared with the chain docs"
    ds = rd.from_items(
        [
            {"doc_id": 1, "text": a},
            {"doc_id": 2, "text": b},
            {"doc_id": 3, "text": c},
            {"doc_id": 9, "text": other},
        ]
    )
    pairs = dedup.ngram_jaccard_pairs(ds, min_jaccard_pct=20, max_group=10**6).to_pandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].values))
    assert (1, 2) in got and (2, 3) in got and (1, 3) not in got, got

    out = dedup.duplicate_clusters(ds).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [1, 2, 3]
    assert set(out["cluster_id"]) == {1}
    assert list(out["cluster_size"]) == [3, 3, 3]


def test_duplicate_clusters_planted(planted_docs, ray_session):
    ds, texts = planted_docs
    out = dedup.duplicate_clusters(ds).to_pandas()
    by_doc = dict(zip(out["doc_id"], out["cluster_id"]))
    for i in range(5):
        assert by_doc.get(40 + i) == by_doc.get(i) == i
    assert by_doc.get(45) == by_doc.get(10) == 10


def test_pq_adc_recall_and_determinism(ray_session):
    """Product quantization: 64 floats -> 8 uint8 codes, ADC top-k recall
    vs exact brute cosine must stay high on the bench embeddings, and the
    whole train/encode/query chain must be deterministic."""
    import ray.data as rd

    emb = "/root/testdata/sf0.001/embeddings.parquet"
    qs = ann.load_queries(emb, [1, 2, 3, 4])

    def run():
        books = ann.pq_train(rd.read_parquet(emb), m=8, k_codes=256, iters=8)
        codes = ann.pq_encode(rd.read_parquet(emb), books).materialize()
        adc = ann.pq_topk(codes, qs, books, k=10).to_pandas()
        rr = ann.pq_topk_rerank(
            rd.read_parquet(emb), codes, qs, books, k=10, shortlist=50
        ).to_pandas()
        return books, adc, rr

    books1, adc1, rr1 = run()
    books2, adc2, rr2 = run()
    assert np.array_equal(books1, books2)
    assert adc1.equals(adc2) and rr1.equals(rr2)

    brute = ann.brute_topk(rd.read_parquet(emb), qs, k=10).to_pandas()

    def recall(got):
        rs = []
        for qid in [1, 2, 3, 4]:
            want = set(brute[brute.query_id == qid]["neighbor_id"])
            have = set(got[got.query_id == qid]["neighbor_id"])
            rs.append(len(want & have) / len(want))
        return np.mean(rs), rs

    adc_r, adc_detail = recall(adc1)
    assert adc_r >= 0.6, adc_detail  # pure 32x-compressed scan
    rr_r, rr_detail = recall(rr1)
    assert rr_r == 1.0, rr_detail  # ADC shortlist + exact re-rank


def test_ivfpq_index_recall_and_pruning(ray_session, tmp_path):
    """IVFADC: persisted coarse-cell + residual-PQ-code index; the query
    reads only probed partitions and scores only codes.  Recall vs brute
    must stay high at full probe (quantization-only error) and the scan
    must shrink with nprobe."""
    import ray.data as rd

    emb = "/root/testdata/sf0.001/embeddings.parquet"
    out = str(tmp_path / "ivfpq")
    info = ann.build_ivfpq_index(
        rd.read_parquet(emb), out, k_cells=8, m=8, k_codes=64, iters=6
    )
    assert info["k_cells"] == 8
    qs = ann.load_queries(emb, [1, 2, 3, 4])
    brute = ann.brute_topk(rd.read_parquet(emb), qs, k=10).to_pandas()

    got_full, stats_full = ann.ivfpq_index_topk(out, qs, k=10, nprobe=8, return_stats=True)
    got_full = got_full.to_pandas()
    rec = []
    for q in [1, 2, 3, 4]:
        w = set(brute[brute.query_id == q]["neighbor_id"])
        h = set(got_full[got_full.query_id == q]["neighbor_id"])
        rec.append(len(w & h) / len(w))
    assert np.mean(rec) >= 0.5, rec  # 32x-compressed codes, full probe

    got_p, stats_p = ann.ivfpq_index_topk(out, qs, k=10, nprobe=2, return_stats=True)
    assert stats_p["scanned_rows"] < stats_full["scanned_rows"]
    # determinism
    again, _ = ann.ivfpq_index_topk(out, qs, k=10, nprobe=2, return_stats=True)
    assert got_p.to_pandas().equals(again.to_pandas())


def test_watermark_drops_late_events(ray_session):
    """Out-of-order arrivals: events whose ts lags the running-max-ts
    watermark (arrival order = event_id) by more than the allowed lateness
    must be DROPPED; the distributed prefix-max two-pass must equal an
    exact driver-side recompute.  The natural testdata is arrival-ordered
    (nothing late), so this plants genuine stragglers."""
    import pandas as pd
    import ray.data as rd

    from lucene_ray.ops import events as ev

    rng = np.random.default_rng(5)
    n = 5000
    base = pd.Timestamp("2026-01-01")
    ts = base + pd.to_timedelta(np.sort(rng.integers(0, 72 * 3600, n)), unit="s")
    ts = ts.to_numpy().copy()
    # plant stragglers: 200 random events arrive late by 15-120 minutes
    # (their ts is far behind the watermark at their arrival slot)
    late_idx = rng.choice(np.arange(500, n), size=200, replace=False)
    ts[late_idx] -= np.array(
        rng.integers(15, 120, size=200) * 60, dtype="timedelta64[s]"
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, 50, n),
            "event_type": rng.choice(["click", "view", "buy"], n),
            "value": rng.random(n) * 100,
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    got = (
        ev.watermark_windowed_counts(ds)
        .to_pandas()
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )

    # exact recompute
    ts_us = df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    run = np.maximum.accumulate(
        np.concatenate(([np.iinfo(np.int64).min], ts_us))
    )[:-1]
    on_time = ts_us + 10 * 60 * 1_000_000 >= run
    assert 0 < (~on_time).sum() <= 200  # stragglers really dropped
    kept = df[on_time].copy()
    kept["window_start"] = kept["ts"].dt.floor("h")
    kept["cents"] = np.floor(kept["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    want = (
        kept.groupby(["event_type", "window_start"], as_index=False)
        .agg(n_events=("cents", "size"), sum_cents=("cents", "sum"))
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    want["n_events"] = want["n_events"].astype(np.int64)
    assert got.to_dict("records") == want.to_dict("records")


def test_watermark_hierarchical_prefix(ray_session):
    """Two-level watermark prefix: tiny buckets on >=1e5 events must keep
    the driver-side table at n_buckets/super_factor rows and still match a
    single-process running-max reference."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from lucene_ray.ops.events import watermark_windowed_counts

    rng = np.random.default_rng(42)
    n = 100_000
    base = np.datetime64("2025-01-01T00:00:00", "us")
    # arrival order event_id; event time wanders with occasional big lags
    steps = rng.integers(0, 3_000_000, n).astype("timedelta64[us]")
    ts = base + np.cumsum(steps)
    lag = rng.integers(0, 40 * 60, n) * np.timedelta64(1_000_000, "us")
    ts = ts - lag  # some events arrive late beyond the 10-min allowance
    etype = rng.choice(["click", "view"], n)
    value = rng.uniform(0, 10, n)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts),
            "event_type": pa.array(etype),
            "value": pa.array(value),
        }
    )

    stats: dict = {}
    got = (
        watermark_windowed_counts(
            rd.from_arrow(tbl), bucket=8, super_factor=16, _stats_out=stats
        )
        .to_pandas()
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    n_buckets = int(np.ceil(n / 8))
    assert stats["driver_rows"] <= int(np.ceil(n_buckets / 16))

    # single-process reference (arrival order == event_id order already)
    df = tbl.to_pandas()
    ts_us = df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    run = np.maximum.accumulate(
        np.concatenate(([np.iinfo(np.int64).min], ts_us))
    )[:-1]
    allowed_us = 10 * 60 * 1_000_000
    kept = df[ts_us + allowed_us >= run].copy()
    kept["window_start"] = kept["ts"].dt.floor("h")
    kept["cents"] = np.floor(kept["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    want = (
        kept.groupby(["event_type", "window_start"], as_index=False)
        .agg(n_events=("cents", "size"), sum_cents=("cents", "sum"))
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    want["n_events"] = want["n_events"].astype(np.int64)
    assert len(got) == len(want)
    got["window_start"] = got["window_start"].astype("datetime64[us]")
    want["window_start"] = want["window_start"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_drop_duplicate_windows(ray_session):
    """Lee-et-al-style substring dedup: duplicated W-token windows keep
    only their first (doc_id, ordinal) occurrence; texts rebuild without
    the dropped spans."""
    import pyarrow as pa
    import ray.data as rd

    from lucene_ray.ops.dedup import drop_duplicate_windows

    w = 4
    boiler = "alpha beta gamma delta"  # one exact window
    docs = [
        f"{boiler} unique one two three",          # doc 0 owns the window
        f"{boiler} other words here now",          # doc 1: window dropped
        "totally fresh text with nothing shared",  # untouched
        f"start pad pad pad {boiler}",             # doc 3: window dropped
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": docs})
    )
    out = (
        drop_duplicate_windows(ds, window=w)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_dropped_windows"].tolist() == [0, 1, 0, 1]
    assert out.loc[0, "text"] == docs[0]  # first occurrence intact
    assert "alpha" not in out.loc[1, "text"] and "other" in out.loc[1, "text"]
    assert out.loc[2, "text"] == docs[2]
    # doc 3's second window (tokens 4..7) was the boilerplate
    assert out.loc[3, "text"] == "start pad pad pad"


def test_contamination_batch_semantics():
    """Benchmark decontamination: position-counted n-gram overlap against
    the broadcast eval-gram set, brute-force recount parity, zero-token
    and sub-n docs get 0."""
    import pyarrow as pa

    from lucene_ray.ops import text as tx

    bench = frozenset({"a b c d e", "x y z w v"})
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    "a b c d e f a b c d e",   # gram at pos 0 and 6 -> 2 hits
                    "q r s t u",                # no overlap
                    "x y z w v",                # exactly one bench gram
                    "tiny doc",                 # shorter than n
                    None,                       # null text
                ]
            ),
        }
    )
    out = tx.contamination_batch(docs, bench).to_pydict()
    assert out["doc_id"] == [1, 2, 3, 4, 5]
    assert out["contam_hits"] == [2, 0, 1, 0, 0]
    assert out["contam_flag"] == [1, 0, 1, 0, 0]

    # benchmark_grams builds prefix grams deterministically
    import pyarrow.parquet as pq
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "documents.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(tx.CONTAM_BENCH_DOC_IDS), pa.int64()),
                    "text": pa.array(["one two three four five six seven"] * 3),
                }
            ),
            p,
        )
        grams = tx.benchmark_grams(p)
    assert "one two three four five" in grams
    assert "three four five six seven" in grams
    # prefix cap: gram 7..11 would need token 11 -> absent
    assert len(grams) == 3


def test_token_budget_sample_semantics(ray_session):
    """Token-budget domain mixing: greedy fill in deterministic md5-hash
    order, crossing doc kept, unbudgeted langs dropped, exact parity with
    a single-process DuckDB window recount."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from lucene_ray.ops import text as tx

    docs = pa.table(
        {
            "doc_id": pa.array(range(200), pa.int64()),
            "lang": pa.array((["en"] * 3 + ["de", "zh"]) * 40),
            "text": pa.array(
                [f"tok{i} " + "word " * (i % 17) for i in range(200)]
            ),
        }
    )
    budgets = {"en": 300, "de": 100}
    got = (
        tx.token_budget_sample(rd.from_arrow(docs), budgets)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    d = docs  # noqa: F841 — duckdb replacement scan
    want = duckdb.sql(
        """
        with per as (
          select doc_id, lang,
                 md5_number_lower('graft'||cast(doc_id as varchar)) h,
                 cast(len(regexp_extract_all(lower(coalesce(text,'')),
                      '[a-z0-9_]+')) as bigint) toks
          from d where lang in ('en','de')),
        w as (
          select doc_id, lang, toks,
                 coalesce(sum(toks) over (partition by lang order by h, doc_id
                   rows between unbounded preceding and 1 preceding),0) prefix
          from per)
        select doc_id, lang, toks as n_tokens from w
        where prefix < (case lang when 'en' then 300 else 100 end)
        order by doc_id
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # budgets bit: each selected domain overshoots by at most one doc
    sums = got.groupby("lang")["n_tokens"].sum()
    assert sums["en"] >= 300 and sums["de"] >= 100  # crossing doc kept
    last_tok = got.groupby("lang")["n_tokens"].max()
    assert sums["en"] - last_tok["en"] < 300
    assert sums["de"] - last_tok["de"] < 100
    # unbudgeted lang never appears
    assert set(got["lang"]) == {"en", "de"}


def test_sample_family_schema_and_modes(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from lucene_ray.ops import text as tx

    docs = pa.table(
        {
            "doc_id": pa.array(range(60), pa.int64()),
            "lang": pa.array(["en", "de", "zh"] * 20),
            "text": pa.array(["alpha beta gamma"] * 60),
        }
    )
    out = tx.sample_family(
        rd.from_arrow(docs), {"en": 100, "de": 50}, {"en": 30, "de": 9}
    ).to_pandas()
    assert sorted(out.columns) == ["doc_id", "lang", "mode", "n_tokens"]
    assert set(out["mode"]) == {"pct", "budget"}
    b = out[out["mode"] == "budget"]
    # 3 tokens per doc: en budget 30 -> 10 docs, de budget 9 -> 3 docs
    assert b.groupby("lang")["doc_id"].count().to_dict() == {"de": 3, "en": 10}
    assert (out["n_tokens"] == 3).all()


def test_interval_join_clicks_semantics(ray_session):
    """Stream-stream interval join: (p.ts - 60min, p.ts] boundary rules,
    per-user isolation, purchases with no clicks get 0."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from lucene_ray.ops import events as ev

    t0 = pd.Timestamp("2024-01-01 12:00:00")
    rows = [
        # user 1: purchase at 12:00; clicks at 11:00 (excluded, == lower
        # bound), 11:00:01 (in), 12:00 (in, == upper bound), 12:01 (after)
        (1, 1, "purchase", t0),
        (2, 1, "click", t0 - pd.Timedelta(minutes=60)),
        (3, 1, "click", t0 - pd.Timedelta(minutes=60) + pd.Timedelta(seconds=1)),
        (4, 1, "click", t0),
        (5, 1, "click", t0 + pd.Timedelta(minutes=1)),
        # user 2's click must not leak into user 1's window
        (6, 2, "click", t0 - pd.Timedelta(minutes=1)),
        (7, 2, "purchase", t0 + pd.Timedelta(hours=5)),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
        }
    )
    out = (
        ev.interval_join_clicks(rd.from_arrow(tbl))
        .to_pandas()
        .set_index("event_id")["n_clicks"]
    )
    assert out[1] == 2  # 11:00:01 and 12:00
    assert out[7] == 0  # user 2's click is 6h before their purchase


def test_dsir_importance_weights():
    """DSIR (Xie et al. 2023): target-looking docs outweigh off-target
    docs, weights are exact integer dots (brute recount), and the
    benchmark/target docs themselves rank at the top."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.ops import text as tx
    from lucene_ray.ops.semdedup import hashed_tf_batch

    target_text = "alpha beta gamma delta " * 5
    docs = {
        7: target_text,                     # target doc (CONTAM_BENCH ids)
        42: target_text,
        99: target_text,
        1: "alpha beta gamma delta epsilon",   # target-like
        2: "zz yy xx ww vv uu tt ss",           # off-target
        3: "",                                   # empty -> weight 0
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(docs), pa.int64()),
            "text": pa.array([docs[i] for i in sorted(docs)]),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "documents.parquet")
        pq.write_table(tbl, p)
        scores = tx.dsir_scores(p)
    assert scores.dtype == np.int64 and len(scores) == tx.DSIR_DIM
    out = tx.dsir_weight_batch(tbl, scores).to_pydict()
    w = dict(zip(out["doc_id"], out["dsir_weight"]))
    assert w[1] > w[2]          # target-like beats off-target
    assert w[2] < 0             # off-target features have negative ratios
    assert w[3] == 0            # empty doc
    assert w[7] > w[1]          # the target docs themselves rank highest
    # brute recount: integer dot of hashed counts with the score table
    tf = hashed_tf_batch(tbl, dim=tx.DSIR_DIM)
    for i, v in zip(tf.column("vec_id").to_pylist(),
                    tf.column("embedding").to_pylist()):
        assert w[i] == int(np.asarray(v, np.int64) @ scores)


def test_late_interaction_maxsim(ray_session):
    """Late-interaction MaxSim: the vectorized kernel equals a per-pair
    loop recompute, and the Ray op's ranking matches a driver-side brute
    recompute over the full corpus."""
    import ray.data as rd

    path = "/root/testdata/sf0.001/embeddings.parquet"
    q = ann.load_queries(path, [0, 1, 2])
    # kernel == loop recompute on a small slice
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    mat = np.array(
        [np.asarray(v, np.float64) for v in tbl.column("embedding").to_pylist()]
    )
    d3 = ann.multi_vectors(mat[:20])
    q3 = ann.multi_vectors(q[1])
    fast = ann.late_scores(d3, q3)
    for qi in range(q3.shape[0]):
        for di in range(d3.shape[0]):
            total = 0.0
            for t in range(q3.shape[1]):
                best = -np.inf
                for u in range(d3.shape[1]):
                    a, b = q3[qi, t], d3[di, u]
                    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
                    best = max(best, (1.0 + cos) / 2.0)
                total += best
            assert fast[di, qi] == pytest.approx(total, rel=1e-12)

    # op ranking == full brute recompute
    got = ann.late_interaction_topk(rd.read_parquet(path), q, k=10).to_pandas()
    full3 = ann.multi_vectors(mat)
    scores = ann.late_scores(full3, q3)  # (n, 3)
    ids = tbl.column("vec_id").to_numpy()
    for j, qid in enumerate(q[0]):
        col = scores[:, j].copy()
        col[ids == qid] = -np.inf
        order = np.lexsort((ids, -col))[:10]
        expect = ids[order].tolist()
        mine = got[got["query_id"] == qid].sort_values("rnk")["neighbor_id"].tolist()
        assert mine == expect


def test_late_rescorer_replaces_first_pass(ray_session):
    """With first_n >= corpus size the rescored ranking equals the full
    late-interaction ranking (MaxSim REPLACES the first-pass score), and
    with a small first_n the output is confined to the nominate set."""
    import ray.data as rd

    path = "/root/testdata/sf0.001/embeddings.parquet"
    q = ann.load_queries(path, [0, 1, 2])
    full = ann.late_interaction_topk(rd.read_parquet(path), q, k=10).to_pandas()
    wide = ann.late_rescored_topk(
        rd.read_parquet(path), q, k=10, first_n=10**6
    ).to_pandas()
    assert wide.equals(full)
    narrow = ann.late_rescored_topk(
        rd.read_parquet(path), q, k=10, first_n=15
    ).to_pandas()
    first = ann.brute_topk(rd.read_parquet(path), q, k=15).to_pandas()
    nom = {qid: set(g["neighbor_id"]) for qid, g in first.groupby("query_id")}
    for qid, g in narrow.groupby("query_id"):
        assert set(g["neighbor_id"]) <= nom[qid]
        assert len(g) == 10
