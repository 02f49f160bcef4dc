"""Source ingestion: JSONL/CSV -> canonical corpus -> searchable index."""

from __future__ import annotations

import json
import os

import pyarrow as pa

from lucene_ray.corpus import generate_corpus
from lucene_ray.index.build import build_index_local
from lucene_ray.search.query import TermQuery
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.ingest import convert_file, ingest


def _write_sources(d, rows):
    jl = d / "a.jsonl"
    with open(jl, "w") as f:
        for r in rows[:30]:
            f.write(
                json.dumps(
                    {"repo": r["repo"], "path": r["path"], "commit": r["commit"],
                     "lang": r["lang"], "body": r["content"]}
                )
                + "\n"
            )
    import csv

    cf = d / "b.csv"
    with open(cf, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["repo", "path", "commit", "lang", "body"])
        w.writeheader()
        for r in rows[30:60]:
            w.writerow(
                {"repo": r["repo"], "path": r["path"], "commit": r["commit"],
                 "lang": r["lang"], "body": r["content"].replace("\n", " ")}
            )
    return jl, cf


def test_ingest_build_search(tmp_path, ray_session):
    rows = generate_corpus(60, seed=7).to_pylist()
    src = tmp_path / "src"
    src.mkdir()
    _write_sources(src, rows)
    out = tmp_path / "corpus"
    rep = ingest(str(src), str(out), column_map={"body": "content"})
    assert (rep["files"], rep["rows"], rep["skipped"], rep["n_errors"]) == (2, 60, 0, 0)
    # idempotent rerun
    rep2 = ingest(str(src), str(out), column_map={"body": "content"})
    assert rep2["skipped"] == 2 and rep2["n_errors"] == 0

    idx = tmp_path / "idx"
    build_index_local(str(out), str(idx), docs_per_segment=32)
    hits = IndexSearcher(str(idx)).search(TermQuery("def"), 5)
    assert hits


def test_convert_file_format_detect(tmp_path):
    rows = generate_corpus(5, seed=8).to_pylist()
    src = tmp_path / "s"
    src.mkdir()
    jl, cf = _write_sources(src, rows * 12)
    out = tmp_path / "o"
    out.mkdir()
    r1 = convert_file(str(jl), str(out), column_map={"body": "content"})
    r2 = convert_file(str(cf), str(out), column_map={"body": "content"})
    assert not r1["skipped"] and not r2["skipped"]
    import pyarrow.parquet as pq

    s = pq.read_schema(str(out / "a.parquet"))
    assert "content" in s.names and "body" not in s.names


def test_ingest_quarantines_bad_files(tmp_path, ray_session):
    """A malformed source file becomes an error row; good files convert."""
    import json

    from lucene_ray.sources.ingest import ingest

    src = tmp_path / "src"
    src.mkdir()
    (src / "good.jsonl").write_text(
        "\n".join(json.dumps({"content": f"doc {i}", "repo": "r"}) for i in range(5))
    )
    (src / "bad.jsonl").write_text('{"content": "ok"}\n{broken json!!\n')
    out = str(tmp_path / "out")
    res = ingest(str(src), out)
    assert res["files"] == 2
    assert res["rows"] == 5
    assert res["n_errors"] == 1
    # errors live in the quarantine table, not a driver-side list
    import pyarrow.parquet as pq
    qdir = res["quarantine_dir"]
    qtbl = pa.concat_tables(
        [pq.read_table(os.path.join(qdir, f)) for f in sorted(os.listdir(qdir))]
    )
    assert qtbl.num_rows == 1 and "bad" in qtbl.column("file")[0].as_py()
