"""Ops stress: the LLM-data-pipeline operators at 10x bench scale.

Generates a deterministic 1M-doc synthetic documents table (vectorized
Arrow string synthesis — no Python row loops), then times the headline
data ops end to end with the streaming executor:

- dedup_minhash: MinHash signature + banded-LSH candidate pairs
- text_stats:    the fused per-doc token/quality profile
- semantic:      hashed-TF + multi-probe sign-bucketed exact dedup edges

Prints one JSON line.  Usage:
    python tools/stress_ops.py [n_docs] [num_cpus]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _gen_corpus(out_dir: str, n_docs: int, part: int = 100_000) -> None:
    """Deterministic (doc_id, text) parquet parts: ~60 vocab words per doc
    chosen by a splitmix-style hash; ~5% of docs are exact duplicates of
    doc_id - 1 (plants real dedup work)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    vocab = pa.array([f"w{i:05d}" for i in range(10_000)], pa.large_utf8())
    for p0 in range(0, n_docs, part):
        ids = np.arange(p0, min(p0 + part, n_docs), dtype=np.uint64)
        src = np.where(ids % 20 == 19, ids - 1, ids)  # 5% exact dups
        lens = (40 + (src * np.uint64(2654435761)) % np.uint64(41)).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(lens)))
        j = np.concatenate([np.arange(n, dtype=np.uint64) for n in lens])
        d = np.repeat(src, lens)
        # splitmix-style mix: (d, j) -> word.  A plain linear form
        # (d*A + j*B) makes every doc a shift of one cyclic sequence —
        # catastrophic artificial shingle overlap
        x = d * np.uint64(0x9E3779B97F4A7C15) + j * np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(31)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(29)
        widx = (x % np.uint64(len(vocab))).astype(np.int64)
        flat = vocab.take(pa.array(widx))
        lst = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), flat
        )
        text = pc.binary_join(lst, pa.scalar(" ", pa.large_utf8()))
        tbl = pa.table({"doc_id": pa.array(ids.astype(np.int64)), "text": text})
        pq.write_table(
            tbl, os.path.join(out_dir, f"part-{p0:09d}.parquet"),
            row_group_size=20_000,
        )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    import ray.data as rd

    from lucene_ray.ops import dedup, semdedup, text

    corpus = f"/tmp/stress-ops-{n_docs}"
    t0 = time.time()
    if not os.path.exists(os.path.join(corpus, "_DONE")):
        _gen_corpus(corpus, n_docs)
        open(os.path.join(corpus, "_DONE"), "w").write("ok")
    gen_sec = round(time.time() - t0, 1)

    def docs():
        return rd.read_parquet(corpus)

    out = {"n_docs": n_docs, "gen_sec": gen_sec, "num_cpus": num_cpus}

    t0 = time.time()
    pairs = dedup.lsh_candidate_pairs(docs(), max_group=10**6).materialize()
    out["dedup_minhash_sec"] = round(time.time() - t0, 1)
    out["lsh_candidate_pairs"] = pairs.count()

    t0 = time.time()
    stats = text.doc_stats(docs()).materialize()
    out["text_stats_sec"] = round(time.time() - t0, 1)
    out["text_stats_rows"] = stats.count()

    t0 = time.time()
    tf = semdedup.hashed_tf(docs()).materialize()
    edges = semdedup.semantic_pair_edges_bucketed(tf).materialize()
    out["semantic_edges_sec"] = round(time.time() - t0, 1)
    out["semantic_edges"] = edges.count()

    out["docs_per_sec_dedup"] = round(n_docs / max(out["dedup_minhash_sec"], 0.1), 1)
    out["docs_per_sec_text"] = round(n_docs / max(out["text_stats_sec"], 0.1), 1)
    print(json.dumps(out))
    ray.shutdown()
    if os.environ.get("STRESS_OPS_KEEP") != "1":
        shutil.rmtree(corpus, ignore_errors=True)


if __name__ == "__main__":
    main()
