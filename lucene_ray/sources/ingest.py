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

    res = rd.from_items([{"path": p} for p in files]).map_batches(
        _task, batch_size=1, batch_format="pyarrow", num_cpus=1
    )

    # summary as a Ray AGGREGATE (one tiny row per batch -> one global sum):
    # at 10^12 files the per-file rows never reach the driver
    def _summarize(batch: pa.Table) -> pa.Table:
        import numpy as np

        err = np.array([bool(e) for e in batch.column("error").to_pylist()])
        return pa.table(
            {
                "files": pa.array([len(batch)], pa.int64()),
                "rows": pa.array(
                    [int(np.sum(batch.column("rows").to_numpy()))], pa.int64()
                ),
                "skipped": pa.array(
                    [int(np.sum(batch.column("skipped").to_numpy()))], pa.int64()
                ),
                "n_errors": pa.array([int(err.sum())], pa.int64()),
            }
        )

    # error rows land in a QUARANTINE table beside the output (resumable
    # runs re-attempt quarantined files since their outputs don't exist)
    quarantine_dir = os.path.join(out_dir, "_quarantine")

    def _route(batch: pa.Table) -> pa.Table:
        import numpy as np

        err = np.array([bool(e) for e in batch.column("error").to_pylist()])
        if err.any():
            os.makedirs(quarantine_dir, exist_ok=True)
            bad = batch.filter(pa.array(err)).select(["file", "error"])
            import uuid as _uuid

            pq.write_table(
                bad, os.path.join(quarantine_dir, f"errs-{_uuid.uuid4().hex[:12]}.parquet")
            )
        return _summarize(batch)

    # materialize once (tiny: one summary row per batch) so the four sums
    # don't re-run the conversion
    parts = res.map_batches(_route, batch_format="pyarrow").materialize()
    tot = {"files": 0, "rows": 0, "skipped": 0, "n_errors": 0}
    for k in tot:
        v = parts.sum(k)
        tot[k] = int(v) if v is not None else 0
    tot["quarantine_dir"] = quarantine_dir
    return tot
