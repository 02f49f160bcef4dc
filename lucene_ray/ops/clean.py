"""End-to-end corpus cleaning pipeline: quality filter -> exact dedup ->
partitioned Parquet sink.

The composition a training-data pipeline actually runs before indexing:

    docs -> quality signals (vectorized map_batches, polars kernels)
         -> keep is_quality == 1           (vectorized mask, no row fns)
         -> exact-dedup survivors among the kept docs
            (md5 groupby -> min doc_id; survivor set broadcast via
            ray.put — at 100 TB this becomes a shuffle join on doc_id)
         -> write_parquet partitioned by hash bucket (one directory per
            bucket => a failed run resumes per-partition; never one
            giant file)

Returns a single summary row of exact integers so the DuckDB oracle can
check the whole pipeline: (n_docs, n_quality, n_kept).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc

from .text import quality_stats_batch

N_OUTPUT_BUCKETS = 16


def _quality_filter(batch: pa.Table) -> pa.Table:
    q = quality_stats_batch(batch)
    mask = pc.equal(q.column("is_quality"), 1)
    return batch.filter(mask)


def clean_corpus(ds, out_dir: str | None = None) -> pa.Table:
    """(n_docs, n_quality, n_kept) summary; optionally writes the cleaned
    corpus as bucket-partitioned parquet under ``out_dir``."""
    import ray

    n_docs = ds.count()
    quality = ds.map_batches(_quality_filter, batch_format="pyarrow")

    def _fp(batch: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5((t or "").encode()).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table({"doc_id": batch.column("doc_id"), "fp": pa.array(fps)})

    survivors = (
        quality.map_batches(_fp, batch_format="pyarrow").groupby("fp").min("doc_id")
    ).to_pandas()
    keep = set(int(x) for x in survivors["min(doc_id)"])
    keep_ref = ray.put(keep)
    n_quality = int(quality.count())

    if out_dir:
        def _keep(batch: pa.Table) -> pa.Table:
            ks = ray.get(keep_ref)
            mask = pa.array([d in ks for d in batch.column("doc_id").to_pylist()])
            out = batch.filter(mask)
            bucket = pc.cast(
                pc.bit_wise_and(out.column("doc_id"), N_OUTPUT_BUCKETS - 1),
                pa.int32(),
            )
            return out.append_column("bucket", bucket)

        import shutil

        # overwrite semantics: a rerun must not append duplicate files
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)
        quality.map_batches(_keep, batch_format="pyarrow").write_parquet(
            out_dir, partition_cols=["bucket"]
        )

    return pa.table(
        {
            "n_docs": pa.array([int(n_docs)], pa.int64()),
            "n_quality": pa.array([n_quality], pa.int64()),
            "n_kept": pa.array([len(keep)], pa.int64()),
        }
    )
