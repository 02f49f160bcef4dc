"""Soft deletes — delete-as-doc-values, reversibly hiding docs.

Reference: index/SoftDeletesDirectoryReaderWrapper.java (liveDocs
derived from EXISTENCE of a value for the configured soft-deletes
field: ``DocValuesFieldExistsQuery``-style iteration over the dv field,
hard liveDocs ANDed in), IndexWriterConfig.setSoftDeletesField +
IndexWriter.softUpdateDocument (the delete half writes a doc-values
update instead of flipping liveDocs), and
SoftDeletesRetentionMergePolicy.java (docs matching a retention query
keep their soft-deleted bodies through merges).

Here the soft-deletes field is a numeric doc-values UPDATE overlay
(index/deletes.update_numeric_docvalue — per-segment sorted
docids+values sidecars committed as a new manifest generation), so:

- marking is ``soft_delete_by_query`` — one overlay write, segments
  immutable, point-in-time readers unaffected (the reference's NRT
  story);
- a WRAPPED searcher hides marked docs by ANDing "has no overlay
  entry" into each reader's live mask (shallow reader copies share the
  immutable postings/norms/stored arrays, exactly the
  open_if_changed liveDocs-wrap pattern);
- the UNWRAPPED searcher still sees the docs — the retention view that
  makes soft deletes reversible and replicable, unlike livedocs.
"""

from __future__ import annotations

import copy
import io

import numpy as np

from .. import store
from .deletes import update_numeric_docvalue

SOFT_DELETES_FIELD = "__soft_deletes"


def soft_delete_by_query(index_dir: str, query, field: str = SOFT_DELETES_FIELD) -> dict:
    """softUpdateDocument's delete half: matching docs gain a value for
    the soft-deletes field (overlay value 1) in the next generation; no
    liveDocs change, nothing is expunged."""
    return update_numeric_docvalue(index_dir, query, field, 1)


def soft_deleted_docids(seg: dict, field: str = SOFT_DELETES_FIELD) -> np.ndarray:
    """Local docids holding a value for the soft-deletes field (the
    wrapper's existence check) — empty when the segment has no overlay."""
    path = seg.get("dv_updates", {}).get(field)
    if not path:
        return np.empty(0, np.int64)
    from .deletes import load_dv_overlay

    return load_dv_overlay(store, path)[0]


def wrap_soft_deletes(searcher, field: str = SOFT_DELETES_FIELD):
    """SoftDeletesDirectoryReaderWrapper: a searcher whose per-segment
    live masks additionally exclude soft-deleted docs (hard liveDocs
    ANDed with not-soft-deleted).  Readers are shallow copies sharing
    every immutable array with the wrapped searcher; the original keeps
    serving the unfiltered (retention) view."""
    new = copy.copy(searcher)
    new.readers = []
    for r, seg in zip(searcher.readers, searcher.manifest["segments"]):
        sd = soft_deleted_docids(seg, field)
        if not len(sd):
            new.readers.append(r)
            continue
        clone = copy.copy(r)
        live = (
            r.live.copy()
            if getattr(r, "live", None) is not None
            else np.ones(r.max_doc, dtype=bool)
        )
        live[sd] = False
        clone.live = live
        new.readers.append(clone)
    return new
