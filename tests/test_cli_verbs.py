"""CLI verbs for the round-3 index utilities (sync, split)."""

from __future__ import annotations

import json
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from lucene_ray.corpus import generate_corpus
from lucene_ray.index.build import build_index_local


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    root = tmp_path_factory.mktemp("cliv")
    d = root / "c"
    d.mkdir()
    pq.write_table(generate_corpus(120, seed=13), str(d / "c.parquet"))
    out = str(root / "idx")
    build_index_local(str(d), out, docs_per_segment=40)
    return out


def test_cli_sync(idx, tmp_path, capsys):
    from lucene_ray.cli import main

    dst = str(tmp_path / "replica")
    assert main(["sync", "--src", idx, "--dst", dst]) == 0
    stats = json.loads(capsys.readouterr().out.strip())
    assert stats["copied"] > 0 and stats["skipped"] == 0
    assert main(["sync", "--src", idx, "--dst", dst]) == 0
    stats2 = json.loads(capsys.readouterr().out.strip())
    assert stats2["copied"] == 0 and stats2["skipped"] == stats["copied"]


def test_cli_split_subprocess(idx, tmp_path):
    outs = [str(tmp_path / f"p{i}") for i in range(2)]
    r = subprocess.run(
        [sys.executable, "-m", "lucene_ray.cli", "split", "--index", idx,
         "--out", ",".join(outs)],
        capture_output=True, text=True, timeout=300,
        env={**__import__("os").environ, "RAY_GRAFT_CPUS": "4"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert sum(p["docs"] for p in out["parts"]) == 120
