"""End-to-end corpus cleaning pipeline: quality filter -> exact dedup ->
partitioned Parquet sink.

The composition a training-data pipeline actually runs before indexing:

    docs -> quality signals (vectorized map_batches, polars kernels)
         -> keep is_quality == 1           (vectorized mask, no row fns)
         -> exact-dedup survivors among the kept docs: the md5
            fingerprint groupby carries the FULL doc rows and each group
            keeps its min-doc_id row — one shuffle, no survivor-id set on
            the driver, no second pass over the corpus
         -> write_parquet partitioned by hash bucket (one directory per
            bucket => a failed run resumes per-partition; never one
            giant file)

Returns a single summary row of exact integers so the DuckDB oracle can
check the whole pipeline: (n_docs, n_quality, n_kept).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _duck
from .text import quality_stats_batch


N_OUTPUT_BUCKETS = 16


def _quality_filter(batch: pa.Table) -> pa.Table:
    from .util import strip_schema_metadata

    q = quality_stats_batch(batch)
    mask = pc.equal(q.column("is_quality"), 1)
    return strip_schema_metadata(batch.filter(mask))


def _fp_append(batch: pa.Table) -> pa.Table:
    """Append the md5 content fingerprint (DuckDB vectorized kernel)."""
    sub = batch.select(["text"])  # noqa: F841 — DuckDB replacement scan
    fp = _duck().execute("select md5(coalesce(text, '')) fp from sub").arrow()
    return batch.append_column("fp", fp.column("fp"))


def _keep_min_doc(group: pa.Table) -> pa.Table:
    """One surviving row per fingerprint group: the min doc_id."""
    ids = group.column("doc_id")
    winner = pc.index(ids, pc.min(ids)).as_py()
    return group.slice(winner, 1)


def clean_corpus(ds, out_dir: str | None = None) -> pa.Table:
    """(n_docs, n_quality, n_kept) summary; optionally writes the cleaned
    corpus as bucket-partitioned parquet under ``out_dir``."""
    from .util import strip_schema_metadata

    ds = ds.map_batches(strip_schema_metadata, batch_format="pyarrow")
    n_docs = ds.count()
    quality = ds.map_batches(_quality_filter, batch_format="pyarrow")
    n_quality = int(quality.count())

    kept = (
        quality.map_batches(_fp_append, batch_format="pyarrow")
        .groupby("fp")
        .map_groups(_keep_min_doc, batch_format="pyarrow")
    )

    if out_dir:

        def _bucketize(batch: pa.Table) -> pa.Table:
            out = batch.drop_columns(["fp"])
            bucket = pc.cast(
                pc.bit_wise_and(out.column("doc_id"), N_OUTPUT_BUCKETS - 1),
                pa.int32(),
            )
            return out.append_column("bucket", bucket)

        import shutil

        # overwrite semantics: a rerun must not append duplicate files
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)
        kept.map_batches(_bucketize, batch_format="pyarrow").write_parquet(
            out_dir, partition_cols=["bucket"]
        )
        # count what actually landed (doubles as a sink sanity check)
        import pyarrow.parquet as pq

        n_kept = pq.read_table(out_dir, columns=["doc_id"]).num_rows
    else:
        n_kept = int(kept.count())

    return pa.table(
        {
            "n_docs": pa.array([int(n_docs)], pa.int64()),
            "n_quality": pa.array([n_quality], pa.int64()),
            "n_kept": pa.array([int(n_kept)], pa.int64()),
        }
    )
