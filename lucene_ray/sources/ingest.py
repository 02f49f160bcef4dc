"""Source ingestion: JSONL / CSV / parquet -> canonical corpus layout.

The build pipeline plans docIDs from sorted parquet row groups, so any
other source format is first converted 1:1 (one output parquet per input
file, same stem) — which keeps docID assignment deterministic, makes the
conversion embarrassingly parallel (one Ray task per file), and resumable
(existing outputs with matching row counts are skipped).

Reference analogue: the benchmark content sources (Reuters / line-file
doc makers, benchmark/byTask/feeds/) that feed IndexFiles-style ingestion.

    ingest(src_dir, out_dir, fmt="jsonl", column_map={"text": "content"})
    build_index(out_dir, index_dir)
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

FORMATS = ("jsonl", "csv", "parquet")


def _read_one(path: str, fmt: str) -> pa.Table:
    if fmt == "jsonl":
        from pyarrow import json as pa_json

        return pa_json.read_json(path)
    if fmt == "csv":
        from pyarrow import csv as pa_csv

        return pa_csv.read_csv(path)
    if fmt == "parquet":
        return pq.read_table(path)
    raise ValueError(f"unknown format: {fmt}")


def _detect_fmt(path: str) -> str:
    ext = os.path.splitext(path)[1].lstrip(".").lower()
    return {"jsonl": "jsonl", "json": "jsonl", "csv": "csv", "parquet": "parquet"}.get(
        ext, "jsonl"
    )


def convert_file(
    path: str,
    out_dir: str,
    fmt: str | None = None,
    column_map: dict[str, str] | None = None,
    row_group_size: int = 2048,
) -> dict:
    """Convert one source file to <out_dir>/<stem>.parquet (idempotent)."""
    fmt = fmt or _detect_fmt(path)
    stem = os.path.splitext(os.path.basename(path))[0]
    out_path = os.path.join(out_dir, f"{stem}.parquet")
    tbl = _read_one(path, fmt)
    if column_map:
        tbl = tbl.rename_columns([column_map.get(c, c) for c in tbl.column_names])
    if os.path.exists(out_path):
        try:
            if pq.read_metadata(out_path).num_rows == tbl.num_rows:
                return {"file": out_path, "rows": tbl.num_rows, "skipped": True}
        except Exception:
            pass
    tmp = out_path + ".tmp"
    pq.write_table(tbl, tmp, row_group_size=row_group_size)
    os.replace(tmp, out_path)
    return {"file": out_path, "rows": tbl.num_rows, "skipped": False}


def ingest(
    src: str | list[str],
    out_dir: str,
    fmt: str | None = None,
    column_map: dict[str, str] | None = None,
    row_group_size: int = 2048,
) -> dict:
    """Parallel 1:1 conversion of a directory (or file list) of sources.
    Returns {files, rows, skipped}."""
    import ray.data as rd

    if isinstance(src, str):
        files = sorted(
            os.path.join(src, f)
            for f in os.listdir(src)
            if not f.startswith(".") and os.path.isfile(os.path.join(src, f))
        )
    else:
        files = sorted(src)
    os.makedirs(out_dir, exist_ok=True)

    def _task(batch: pa.Table) -> pa.Table:
        rows = []
        for r in batch.to_pylist():
            # per-FILE error isolation: a malformed source becomes an error
            # row instead of killing the whole ingestion (the bad-record
            # quarantine every at-scale pipeline needs)
            try:
                res = convert_file(r["path"], out_dir, fmt, column_map, row_group_size)
                res["error"] = ""
            except Exception as e:  # noqa: BLE001 — quarantine, don't crash
                res = {
                    "file": r["path"],
                    "rows": 0,
                    "skipped": False,
                    "error": f"{type(e).__name__}: {e}"[:500],
                }
            rows.append(res)
        return pa.Table.from_pylist(rows)

    out = (
        rd.from_items([{"path": p} for p in files])
        .map_batches(_task, batch_size=1, batch_format="pyarrow", num_cpus=1)
        .take_all()
    )
    errors = [
        {"file": r["file"], "error": r["error"]} for r in out if r["error"]
    ]
    return {
        "files": len(out),
        "rows": sum(r["rows"] for r in out),
        "skipped": sum(1 for r in out if r["skipped"]),
        "errors": errors,
    }
