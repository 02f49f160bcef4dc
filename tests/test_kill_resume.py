"""Kill-and-rerun: a build killed mid-flight resumes from completed
segments and converges to the same index (north-rule checkpoint/resume:
per-segment lineage signatures, atomic segment writes, manifest-last)."""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import pytest

from lucene_ray.corpus import generate_corpus

BUILD_SCRIPT = r"""
import sys, ray
ray.init(address="local", num_cpus=2, include_dashboard=False)
from lucene_ray.index.build import build_index
man = build_index(sys.argv[1], sys.argv[2], docs_per_segment=64,
                  write_doc_tables=False)
print("DONE", len(man["segments"]), len(man.get("skipped_segments", [])))
ray.shutdown()
"""


def test_kill_and_rerun_resumes(tmp_path):
    import pyarrow.parquet as pq

    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(generate_corpus(2000, seed=41), str(d / "c.parquet"), row_group_size=64)
    idx = str(tmp_path / "idx")

    env = dict(os.environ)
    # first run: kill while segments are being written
    p = subprocess.Popen(
        [sys.executable, "-c", BUILD_SCRIPT, str(d), idx],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        env=env,
        cwd="/root/repo",
    )
    deadline = time.time() + 120
    killed = False
    while time.time() < deadline:
        done = [
            f
            for f in (os.listdir(idx) if os.path.isdir(idx) else [])
            if f.startswith("seg_") and not f.endswith("tmp")
        ]
        if len(done) >= 3:  # some segments committed, more to go (32 total)
            p.send_signal(signal.SIGKILL)
            killed = True
            break
        if p.poll() is not None:
            break
        time.sleep(0.3)
    p.wait()
    assert killed, "build finished before the kill window — enlarge the corpus"
    partial = {f for f in os.listdir(idx) if f.startswith("seg_")}
    assert partial and not any(f for f in os.listdir(idx) if f.startswith("manifest-"))

    # rerun: must skip the completed segments and commit a manifest
    out = subprocess.run(
        [sys.executable, "-c", BUILD_SCRIPT, str(d), idx],
        capture_output=True,
        text=True,
        env=env,
        cwd="/root/repo",
        check=True,
    )
    line = next(l for l in out.stdout.splitlines() if l.startswith("DONE"))
    _, n_segs, n_skipped = line.split()
    assert int(n_segs) == 32
    assert int(n_skipped) >= 3  # the pre-kill segments were reused

    # and the resumed index is valid + queryable
    from lucene_ray.index.check import check_index
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    assert check_index(idx, raise_on_error=False, use_ray=False)["ok"]
    hits = IndexSearcher(idx).search(TermQuery("def"), 10)
    assert len(hits) == 10
