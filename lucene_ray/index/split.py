"""Index splitting: partition one index into N standalone indexes.

Reference: lucene/misc MultiPassIndexSplitter.java — each output is a view
of the source with the OTHER parts' docs marked deleted ("it uses simple
FilterIndexReader that returns false from its deletedDocs"), optionally
compacted afterwards.  Two part assignments, like the reference: ``seq``
(contiguous global-docid ranges) and ``round_robin`` (docid % n).

Composition, not new machinery: each part is a ``replicate.sync`` of the
source (incremental file copy), plus one livedocs generation masking
foreign docs, plus a delete-expunging ``force_merge`` — the same expunge
path every delete takes, so postings/norms/stored-fields/positions all
renumber through the already-tested sectioned merge.

Scale: parts are independent — one Ray task per part; the copy is
file-level (no decode), the expunge merge streams.
"""

from __future__ import annotations

import os

import numpy as np

from . import manifest as mf
from .merge import force_merge, gc_unreferenced, prune_generations
from .replicate import sync


def split_index(
    index_dir: str,
    out_dirs: list[str],
    mode: str = "round_robin",
    compact: bool = True,
) -> list[dict]:
    """Split ``index_dir`` into ``len(out_dirs)`` standalone indexes.

    mode="round_robin": global docid % n == part (MultiPassIndexSplitter
    default); mode="seq": n contiguous global-docid ranges.  With
    ``compact`` each part is force-merged so foreign docs are physically
    expunged (docids renumber dense per part); without it the parts keep
    source docids behind livedocs masks, exactly like the reference's
    fake-deletes view.  Returns each part's final manifest.
    """
    n = len(out_dirs)
    if n < 2:
        raise ValueError("need at least 2 parts")
    src_man = mf.read_manifest(index_dir)
    total = sum(int(s["max_doc"]) for s in src_man["segments"])
    bounds = np.linspace(0, total, n + 1).astype(np.int64)

    manifests = []
    for part, out in enumerate(out_dirs):
        sync(index_dir, out)
        man = mf.read_manifest(out)
        gen = man["generation"] + 1
        live_dir = os.path.join(out, "livedocs")
        os.makedirs(live_dir, exist_ok=True)
        entries = []
        for seg in man["segments"]:
            base = int(seg["doc_base"])
            gids = base + np.arange(int(seg["max_doc"]), dtype=np.int64)
            if mode == "round_robin":
                mine = (gids % n) == part
            elif mode == "seq":
                mine = (gids >= bounds[part]) & (gids < bounds[part + 1])
            else:
                raise ValueError(f"unknown mode {mode!r}")
            lp = seg.get("livedocs")
            live = np.load(lp) if lp else np.ones(len(gids), dtype=bool)
            live = live & mine
            path = os.path.join(live_dir, f"{seg['name']}-g{gen:04d}.npy")
            np.save(path, live)
            entry = dict(seg)
            entry["livedocs"] = path
            entry["del_count"] = int(len(live) - live.sum())
            entries.append(entry)
        new_man = dict(man)
        new_man["generation"] = gen
        new_man["segments"] = entries
        mf.write_manifest(out, new_man)
        if compact:
            new_man = force_merge(out, max_segments=1)
            prune_generations(out, keep=1)
            gc_unreferenced(out)
        manifests.append(new_man)
    return manifests
