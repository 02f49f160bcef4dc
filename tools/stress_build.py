"""Stress run: build + deletes + merge + query + CheckIndex over an N-doc
synthetic corpus (default 600k, 6x the bench size).  Round-3 shape
(VERDICT r2 #10): positions index_options (PFoR doc/freq blocks + position
streams), delete_by_query before the merge (exercises live-docs carry +
expunge renumbering in the sectioned streaming merge), then CheckIndex and
warm p50 over term/boolean/PHRASE queries.  Prints one JSON line.

Round-5 shape (VERDICT r4 #3): ``--remote`` routes the whole run — build,
deletes, merge, CheckIndex, queries — through the fsspec store seam
(``file://`` root, the same byte-store protocol as ``s3://``), proving
the 10x-scale design through the remote Directory instead of local
paths.

Usage: python tools/stress_build.py [n_docs] [num_cpus] [--remote]
           [--docs-per-segment=N]

``--docs-per-segment`` (default 1024, the bench shape) should grow with
the corpus: segment count drives per-searcher open-file/mmap counts and
per-segment scheduling overhead, so a 10x corpus wants ~10x segment size
(the same block-size-scales-with-data rule the 100-TB design follows).
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    remote = "--remote" in sys.argv[1:]
    dps = 1024
    for a in sys.argv[1:]:
        if a.startswith("--docs-per-segment="):
            dps = int(a.split("=", 1)[1])
    n_docs = int(args[0]) if len(args) > 0 else 600_000
    num_cpus = int(args[1]) if len(args) > 1 else 32

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    import bench
    from lucene_ray.index import manifest as mf
    from lucene_ray.corpus import ensure_corpus
    from lucene_ray.index.build import build_index
    from lucene_ray.index.check import check_index
    from lucene_ray.index.deletes import delete_by_query, live_doc_count
    from lucene_ray.index.merge import force_merge
    from lucene_ray.search.query import PhraseQuery, TermQuery, bool_query
    from lucene_ray.search.searcher import DistributedSearcher

    t0 = time.time()
    corpus = ensure_corpus(9.9, row_group_size=512, n_docs=n_docs)
    gen_sec = round(time.time() - t0, 1)

    bench._warm_cluster(num_cpus)
    local_dir = f"/tmp/stress-{uuid.uuid4().hex[:8]}"
    idx = f"file://{local_dir}" if remote else local_dir
    t0 = time.time()
    man = build_index(
        corpus,
        idx,
        docs_per_segment=dps,
        write_doc_tables=False,
        resume=False,
        index_options="positions",
    )
    build_sec = round(time.time() - t0, 1)
    built_docs = sum(s["max_doc"] for s in man["segments"])
    n_postings = sum(s["metrics"].get("n_postings", 0) for s in man["segments"])

    # deletes BEFORE the merge: the sectioned streaming merge must expunge
    # deleted docids and renumber postings + positions
    t0 = time.time()
    # "package" is a go-only keyword in the synthetic corpus -> deletes
    # roughly the go sixth of the docs, a heavy expunge load for the merge
    del_man = delete_by_query(idx, TermQuery("package"))
    delete_sec = round(time.time() - t0, 1)
    n_deleted = sum(s.get("del_count", 0) for s in del_man["segments"])

    t0 = time.time()
    force_merge(idx, max_segments=32)
    merge_sec = round(time.time() - t0, 1)
    live_after = live_doc_count(mf.read_manifest(idx))

    rep = check_index(idx, raise_on_error=False)

    searcher = DistributedSearcher(idx, num_workers=8)
    qs = [TermQuery(w) for w in ("def", "return", "import", "func")] + [
        bool_query(should=[TermQuery("const"), TermQuery("static"), TermQuery("class")]),
        PhraseQuery(("return", "nil")),
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
                "index_options": "positions",
                "gen_sec": gen_sec,
                "build_sec": build_sec,
                "files_per_sec": round(built_docs / build_sec, 1),
                "n_deleted": n_deleted,
                "delete_sec": delete_sec,
                "live_after_merge": live_after,
                "merge_sec": merge_sec,
                "check_ok": rep["ok"],
                "p50_ms": round(lat[len(lat) // 2], 2),
                "num_cpus": num_cpus,
                "store": "remote(file://)" if remote else "local",
                "docs_per_segment": dps,
            }
        )
    )
    shutil.rmtree(local_dir, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
