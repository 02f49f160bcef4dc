"""Stress run: build + merge + query + CheckIndex over an N-doc synthetic
corpus (default 300k, 3x the bench size).  Prints one JSON line.

Usage: python tools/stress_build.py [n_docs] [num_cpus]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    import bench
    from lucene_ray.corpus import ensure_corpus
    from lucene_ray.index.build import build_index
    from lucene_ray.index.check import check_index
    from lucene_ray.index.merge import force_merge
    from lucene_ray.search.query import TermQuery, bool_query
    from lucene_ray.search.searcher import DistributedSearcher

    t0 = time.time()
    corpus = ensure_corpus(9.9, row_group_size=512, n_docs=n_docs)
    gen_sec = round(time.time() - t0, 1)

    bench._warm_cluster(num_cpus)
    idx = f"/tmp/stress-{uuid.uuid4().hex[:8]}"
    t0 = time.time()
    man = build_index(corpus, idx, docs_per_segment=1024, write_doc_tables=False, resume=False)
    build_sec = round(time.time() - t0, 1)
    built_docs = sum(s["max_doc"] for s in man["segments"])
    n_postings = sum(s["metrics"].get("n_postings", 0) for s in man["segments"])

    t0 = time.time()
    force_merge(idx, max_segments=32)
    merge_sec = round(time.time() - t0, 1)

    rep = check_index(idx, raise_on_error=False)

    searcher = DistributedSearcher(idx, num_workers=8)
    qs = [TermQuery(w) for w in ("def", "return", "import", "func")] + [
        bool_query(should=[TermQuery("const"), TermQuery("static"), TermQuery("class")])
    ]
    for q in qs:
        searcher.search(q, 10)
    t0 = time.time()
    lat = []
    for q in qs * 5:
        t = time.time()
        searcher.search(q, 10)
        lat.append((time.time() - t) * 1000)
    lat.sort()

    print(
        json.dumps(
            {
                "n_docs": built_docs,
                "n_postings": n_postings,
                "gen_sec": gen_sec,
                "build_sec": build_sec,
                "files_per_sec": round(built_docs / build_sec, 1),
                "merge_sec": merge_sec,
                "check_ok": rep["ok"],
                "p50_ms": round(lat[len(lat) // 2], 2),
                "num_cpus": num_cpus,
            }
        )
    )
    shutil.rmtree(idx, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
