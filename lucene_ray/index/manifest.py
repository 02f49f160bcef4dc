"""Index manifest: segment listing, generations, lineage, resume.

The manifest is the ``segments_N`` analogue (reference index/SegmentInfos.
java:56-135): a JSON commit point listing segments in ordinal order (the
order is semantically significant — it is the tie-break for equal scores,
SURVEY §7.5).  Each entry carries the segment's partial collection stats,
its lineage (input fragment list + row ranges) and build metrics, which is
the "per-partition lineage + metrics" requirement of the north rule.

Write protocol: per-segment directories are written atomically by their
build tasks (segment.py); the manifest generation file is written LAST and
renamed into place — the durability point (IndexWriter.commit analogue,
SegmentInfos two-phase commit).  Resume: a rerun skips partitions whose
segment directory already exists with a matching lineage signature
(``segment_is_complete``).
"""

from __future__ import annotations

import json
import os

import numpy as np

from .. import store


def manifest_path(index_dir: str, gen: int) -> str:
    return os.path.join(index_dir, f"manifest-{gen:06d}.json")


def latest_generation(index_dir: str) -> int | None:
    gens = []
    for name in store.glob_names(os.path.join(index_dir, "manifest-*.json")):
        try:
            gens.append(int(name[len("manifest-") : -len(".json")]))
        except ValueError:
            continue
    return max(gens) if gens else None


def read_manifest(index_dir: str, gen: int | None = None) -> dict:
    if gen is None:
        gen = latest_generation(index_dir)
        if gen is None:
            raise FileNotFoundError(f"no manifest in {index_dir}")
    return store.read_json(manifest_path(index_dir, gen))


def write_manifest(index_dir: str, manifest: dict) -> str:
    gen = int(manifest["generation"])
    path = manifest_path(index_dir, gen)
    store.write_json_atomic(path, manifest, default=_json_default)
    return path


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    raise TypeError(type(o))


def collection_stats_from(manifest: dict) -> dict:
    """Final aggregation of the per-segment partial stats (partial+final
    pattern, SURVEY §2.6 CollectionStatistics row)."""
    max_doc = doc_count = sum_ttf = sum_df = 0
    for seg in manifest["segments"]:
        s = seg["stats"]
        max_doc += s["max_doc"]
        doc_count += s["doc_count"]
        sum_ttf += s["sum_total_term_freq"]
        sum_df += s["sum_doc_freq"]
    return {
        "max_doc": max_doc,
        "doc_count": doc_count,
        "sum_total_term_freq": sum_ttf,
        "sum_doc_freq": sum_df,
    }


def segment_is_complete(seg_dir: str, lineage_sig: str) -> bool:
    """True if a prior run already produced this segment for the same input
    (checkpoint/resume, FIXTURES F7)."""
    meta_path = os.path.join(seg_dir, "meta.json")
    if not store.exists(meta_path):
        return False
    try:
        meta = store.read_json(meta_path)
        return meta.get("lineage", {}).get("signature") == lineage_sig
    except (json.JSONDecodeError, OSError, ValueError):
        return False
