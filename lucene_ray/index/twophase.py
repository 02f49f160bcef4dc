"""Two-phase commit: prepareCommit / commit / rollback.

Reference: lucene/core/src/java/org/apache/lucene/index/IndexWriter.java
(``prepareCommit()`` / ``commit()`` / ``rollback()``) and
``SegmentInfos.java`` (``prepareCommit`` writes ``pending_segments_N``,
``finishCommit`` renames it to ``segments_N``).  The analogue here:

- ``prepare_commit`` writes ``pending-manifest-{gen}.json`` — segment
  directories referenced by it may already exist on shared storage, but
  readers only glob ``manifest-*.json`` so nothing is visible yet.  Only
  ONE commit may be in flight (a second prepare raises, like the
  reference's "prepareCommit was already called with no corresponding
  call to commit").
- ``commit_pending`` re-validates the generation is still the next one
  (a concurrent committer loses, like the reference's write.lock would
  have prevented) and atomically publishes the manifest, then removes
  the pending file.  The publish IS the durability point.
- ``rollback_pending`` discards the pending manifest and physically
  removes every artifact it referenced that no COMMITTED generation
  references — the IndexFileDeleter decref sweep on rollback.

External transaction coordinators get the standard contract: after
``prepare_commit`` returns, ``commit_pending`` cannot fail for lack of
durability (the pending bytes are already on the store); crashing
between the two leaves a pending file a recovering coordinator can
either commit or roll back.
"""

from __future__ import annotations

import os

from .. import store
from . import manifest as mf
from .deletion_policy import _referenced, _rm_file


def pending_path(index_dir: str, gen: int) -> str:
    return os.path.join(index_dir, f"pending-manifest-{gen:06d}.json")


def pending_generation(index_dir: str) -> int | None:
    """Generation of the in-flight pending commit, if any."""
    gens = []
    for name in store.glob_names(os.path.join(index_dir, "pending-manifest-*.json")):
        try:
            gens.append(int(name[len("pending-manifest-") : -len(".json")]))
        except ValueError:
            continue
    return max(gens) if gens else None


def prepare_commit(index_dir: str, manifest: dict) -> dict:
    """Stage ``manifest`` as the pending next commit point.  Returns a
    token ``{"generation": gen, "path": pending_path}``."""
    inflight = pending_generation(index_dir)
    if inflight is not None:
        raise RuntimeError(
            f"prepareCommit already called (pending generation {inflight}) "
            "with no corresponding commit/rollback"
        )
    gen = int(manifest["generation"])
    latest = mf.latest_generation(index_dir)
    if latest is not None and gen <= latest:
        raise ValueError(
            f"pending generation {gen} must exceed the committed {latest}"
        )
    path = pending_path(index_dir, gen)
    store.write_json_atomic(path, manifest, default=mf._json_default)
    return {"generation": gen, "path": path}


def commit_pending(index_dir: str, gen: int | None = None) -> dict:
    """Publish the pending manifest as the new commit point (finishCommit).
    Returns the committed manifest."""
    if gen is None:
        gen = pending_generation(index_dir)
        if gen is None:
            raise RuntimeError("commit called with no pending commit")
    path = pending_path(index_dir, gen)
    man = store.read_json(path)
    latest = mf.latest_generation(index_dir)
    if latest is not None and int(man["generation"]) <= latest:
        raise ValueError(
            f"generation {man['generation']} was superseded by {latest}; "
            "roll back and re-prepare"
        )
    mf.write_manifest(index_dir, man)
    _rm_file(path)
    return man


def rollback_pending(index_dir: str, gen: int | None = None) -> dict:
    """Discard the pending commit and remove every artifact only it
    referenced (segment dirs, docs fragments, livedocs, dv sidecars).
    Returns a summary dict."""
    if gen is None:
        gen = pending_generation(index_dir)
        if gen is None:
            return {"rolled_back": None, "removed_dirs": 0, "removed_files": 0}
    path = pending_path(index_dir, gen)
    pend_dirs, pend_files = _referenced(store.read_json(path))

    keep_dirs: set = set()
    keep_files: set = set()
    for name in store.glob_names(os.path.join(index_dir, "manifest-*.json")):
        g = int(name[len("manifest-") : -len(".json")])
        d, f = _referenced(mf.read_manifest(index_dir, g))
        keep_dirs |= d
        keep_files |= f

    dead_files = pend_files - keep_files
    dead_dirs = pend_dirs - keep_dirs
    for p in sorted(dead_files):
        if store.exists(p):
            store.rmtree(p) if store.isdir(p) else _rm_file(p)
    for p in sorted(dead_dirs):
        if store.exists(p):
            store.rmtree(p)
    _rm_file(path)
    return {
        "rolled_back": gen,
        "removed_dirs": len(dead_dirs),
        "removed_files": len(dead_files),
    }
