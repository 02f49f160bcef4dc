"""Sequence packing for LLM training — concatenate documents into
fixed-token-budget training sequences (the T5/GPT pretraining "packing"
step; Raffel et al. 2020 §2.2, Krell et al. 2021 "Efficient Sequence
Packing" for the bin-packing framing).

Distributed shape: documents partition into contiguous doc_id buckets
(``bucket = doc_id // bucket_size``) and packing runs INDEPENDENTLY per
bucket (docs never pack across buckets): one vectorized token-count
map_batches, then one uniform-key ``groupby(bucket).map_groups`` —
deterministic output ids regardless of task scheduling, and the bucket
is the unit of resumability (one output partition per bucket) at 100 TB.

Inside a bucket the policy is deterministic sequential first-fit: walk
docs in doc_id order, start a new sequence whenever the running token
total would exceed the budget; a doc that alone reaches the budget
closes its sequence (truncation is the trainer's call downstream).

Output: (doc_id, bucket, seq, offset, n_tokens) — sequence ordinal
within the bucket and the doc's token offset inside its sequence.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from .util import TOKEN_PATTERN


def _token_counts(batch: pa.Table) -> pa.Table:
    df = (
        pl.from_arrow(batch.select(["doc_id", "text"]))
        .with_columns(
            pl.col("text")
            .fill_null("")
            .str.to_lowercase()
            .str.extract_all(TOKEN_PATTERN)
            .list.len()
            .cast(pl.Int64)
            .alias("n_tokens")
        )
        .select(["doc_id", "n_tokens"])
    )
    return df.to_arrow().cast(
        pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64())])
    )


def pack_bucket(
    doc_ids: np.ndarray, n_tokens: np.ndarray, budget: int
) -> tuple[np.ndarray, np.ndarray]:
    """Sequential first-fit within one bucket: returns (seq, offset)
    arrays aligned with the docs (which must be doc_id-sorted)."""
    seq = np.zeros(len(doc_ids), dtype=np.int64)
    off = np.zeros(len(doc_ids), dtype=np.int64)
    cur_seq = 0
    cur_fill = 0
    for i, n in enumerate(n_tokens):
        n = int(n)
        if cur_fill > 0 and cur_fill + n > budget:
            cur_seq += 1
            cur_fill = 0
        seq[i] = cur_seq
        off[i] = cur_fill
        cur_fill += n
        if cur_fill >= budget:  # full (or an over-long doc): close it out
            cur_seq += 1
            cur_fill = 0
    return seq, off


def pack_sequences(ds, budget: int = 512, bucket_size: int = 64):
    """(doc_id, bucket, seq, offset, n_tokens) Dataset: deterministic
    sequence packing of the documents dataset ``ds`` (doc_id, text)."""
    counted = ds.map_batches(_token_counts, batch_format="pyarrow").map_batches(
        lambda b: b.append_column(
            "bucket",
            pa.array(
                (np.asarray(b.column("doc_id")) // bucket_size).astype("int64")
            ),
        ),
        batch_format="pyarrow",
    )

    def _pack_group(df):
        import pandas as pd

        df = df.sort_values("doc_id")
        seq, off = pack_bucket(
            df["doc_id"].to_numpy(), df["n_tokens"].to_numpy(), budget
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "bucket": df["bucket"].to_numpy(),
                "seq": seq,
                "offset": off,
                "n_tokens": df["n_tokens"].to_numpy(),
            }
        )

    return counted.groupby("bucket").map_groups(_pack_group)
