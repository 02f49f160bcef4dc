"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Real image/audio codecs are not available in this container, so the decode
kernel is a clearly-marked deterministic STUB (``FakeImageDecoder``), but
everything around it is the real Ray-side design:

- payloads are an opaque ``binary`` Arrow column (zero-copy through the
  object store; never converted to Python objects in bulk),
- decode / feature-extract runs as a STATEFUL ACTOR-POOL ``map_batches``
  stage (``concurrency=N``) — the decoder "model" is constructed once per
  actor in ``__init__``, exactly how a torchvision/PIL/ffmpeg stage would
  hold its codec state,
- batch sizes stay small because each payload may be megabytes (callers
  pass ``batch_size``; the default 64 assumes <= ~4 MB payloads).

The fake decode derives (width, height, channels, feature hash) from the
md5 of the payload bytes so results are deterministic and SQL-checkable
(DuckDB md5_number_lower/upper over the same bytes).  Swapping in a real
decoder only replaces ``FakeImageDecoder.decode``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .util import md5_u64, md5_u64_hi


def attach_payload(ds, text_col: str = "text"):
    """Materialize the opaque binary column (here: utf-8 bytes of ``text``;
    in production this is the raw image/audio bytes read from storage)."""

    def _to_bin(batch: pa.Table) -> pa.Table:
        payload = pc.cast(batch.column(text_col), pa.large_binary())
        return batch.append_column("payload", payload)

    return ds.map_batches(_to_bin, batch_format="pyarrow")


class FakeImageDecoder:
    """STUB decoder (no image libs in this container).

    A real implementation would do ``PIL.Image.open(io.BytesIO(payload))``
    here and raise ``NotImplementedError`` paths would disappear; the
    deterministic fake keeps the full pipeline testable: dimensions and a
    64-bit feature fingerprint derive from the payload's md5.
    """

    def __init__(self, target_size: int = 224):
        # actor-pool init: in production this loads the codec / model once
        self.target_size = target_size

    def decode(self, payload: bytes) -> tuple[int, int, int, int]:
        w = 128 + md5_u64(payload) % 896
        h = 128 + md5_u64_hi(payload) % 896
        return int(w), int(h), 3, md5_u64(payload + b"|feat")

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, chans, feats = [], [], [], []
        for payload in batch.column("payload").to_pylist():
            w, h, c, f = self.decode(payload or b"")
            widths.append(w)
            heights.append(h)
            chans.append(c)
            feats.append(f)
        n_bytes = pc.binary_length(batch.column("payload"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bytes": pc.cast(n_bytes, pa.int64()),
                "width": pa.array(widths, pa.int64()),
                "height": pa.array(heights, pa.int64()),
                "channels": pa.array(chans, pa.int64()),
                "feat": pa.array(np.array(feats, dtype=np.uint64), pa.uint64()),
            }
        )


def decode_stats(ds, concurrency: int | tuple[int, int] = (1, 4), batch_size: int = 64):
    """payload -> (doc_id, n_bytes, width, height, channels, feat) via the
    actor-pool decode stage."""
    with_payload = attach_payload(ds)
    return with_payload.map_batches(
        FakeImageDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
