"""Test helpers: build tiny indexes directly from token lists."""

from __future__ import annotations

import os
from collections import Counter

import numpy as np

from lucene_ray.index import manifest as mf
from lucene_ray.index.segment import build_segment
from lucene_ray.smallfloat import int_to_byte4


def index_from_token_docs(
    docs: list[list[str]],
    index_dir: str,
    n_segments: int = 1,
) -> None:
    """Build an index where doc i contains exactly ``docs[i]`` as its token
    stream (bypasses the analyzer).  Norm = intToByte4(len(tokens))."""
    os.makedirs(index_dir, exist_ok=True)
    per_seg = (len(docs) + n_segments - 1) // n_segments
    seg_entries = []
    doc_base = 0
    for si in range(n_segments):
        chunk = docs[si * per_seg : (si + 1) * per_seg]
        if not chunk:
            break
        terms, docids, tfs = [], [], []
        norms = np.zeros(len(chunk), dtype=np.uint8)
        for li, toks in enumerate(chunk):
            norms[li] = int_to_byte4(len(toks))
            for t, c in sorted(Counter(toks).items()):
                terms.append(t)
                docids.append(li)
                tfs.append(c)
        name = f"seg_{si:06d}"
        seg_dir = os.path.join(index_dir, name)
        meta = {
            "name": name,
            "max_doc": len(chunk),
            "doc_base": doc_base,
            "lineage": {"signature": f"test-{si}"},
        }
        build_segment(
            np.array(terms, dtype=object),
            np.array(docids, dtype=np.int32),
            np.array(tfs, dtype=np.int32),
            norms,
            None,
            seg_dir,
            meta,
        )
        import json

        with open(os.path.join(seg_dir, "meta.json")) as f:
            m = json.load(f)
        seg_entries.append(
            {
                "name": name,
                "dir": seg_dir,
                "doc_base": doc_base,
                "max_doc": len(chunk),
                "stats": m["stats"],
                "lineage": m["lineage"],
            }
        )
        doc_base += len(chunk)
    mf.write_manifest(
        index_dir,
        {"generation": 1, "analyzer": "none", "segments": seg_entries},
    )
