"""Index-time block join: parent/child doc blocks in one segment space.

Reference: lucene/join/src/java/org/apache/lucene/search/join/
``ToParentBlockJoinQuery.java`` (child hits aggregate to the enclosing
parent with ScoreMode Max/Total/Avg/Min/None),
``ToChildBlockJoinQuery.java`` (a matched parent fans out to its child
docids), ``CheckJoinIndex.java`` (block-structure validation),
``BitSetProducer`` (the cached parent-docid set).

Block contract (``IndexWriter.addDocuments``): a block's child docs
occupy consecutive docids immediately BEFORE their parent doc, and a
block never splits across segments.  The derived block corpus realizes
the contract structurally: parquet row groups are cut only at block
boundaries and ``plan_segments`` packs whole row groups into segments,
so every segment boundary is a block boundary (see
``pipelines.fulltext.ensure_block_corpus``).

The parent set is a sorted docid array derived from the stored
``parent`` marker column (the BitSetProducer analogue).  Parent lookup
for child docids is ONE vectorized ``np.searchsorted`` (children precede
their parent, so the first parent docid > child is the block's parent),
and per-parent aggregation is ``reduceat`` over the sorted child hits —
no per-row Python in the hot path.
"""

from __future__ import annotations

import numpy as np

# float32 child scores quantize exactly onto the 2^-40 dyadic grid, making
# the Total/Avg score modes order-independent integer sums (the same
# discipline as pipelines.fulltext.join_topk / JOIN_SCORE_SCALE).
SCORE_SCALE = float(1 << 40)


def parent_docids(reader) -> np.ndarray:
    """Sorted docids of parent docs in one segment (stored ``parent``
    marker column -> the BitSetProducer analogue)."""
    marker = reader.stored_column("parent").to_numpy(zero_copy_only=False)
    return np.nonzero(np.asarray(marker, dtype=np.int64) == 1)[0].astype(np.int64)


def check_join_index(reader, bucket_width: int) -> None:
    """CheckJoinIndex analogue: every doc belongs to a block that ends in
    a parent, and all children between two consecutive parents share the
    parent's block key (source, doc_id // bucket_width).  Raises
    ValueError on violation."""
    parents = parent_docids(reader)
    if len(parents) == 0:
        raise ValueError("segment has no parent docs")
    if parents[-1] != reader.max_doc - 1:
        raise ValueError("segment does not end with a parent doc")
    src = reader.stored_column("source").to_numpy(zero_copy_only=False)
    did = reader.stored_column("doc_id").to_numpy(zero_copy_only=False)
    prev = -1
    for p in parents:
        kids = np.arange(prev + 1, p)
        if len(kids):
            ksrc = src[kids]
            if not (ksrc == src[p]).all():
                raise ValueError(f"block at parent {p}: child source mismatch")
            kb = np.asarray(did[kids], dtype=np.int64) // bucket_width
            if not (kb == kb[0]).all():
                raise ValueError(f"block at parent {p}: child bucket mismatch")
        prev = p


def to_parent_partials(
    child_docs: np.ndarray, child_scores: np.ndarray, parents: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Aggregate sorted child hits to their block parents in one pass.

    Returns ``(pids, mx, mn, sum_i, cnt)``: per matched parent docid, the
    float32 max / min child score, the exact 2^-40 integer-surrogate score
    sum, and the child match count — everything every ScoreMode needs
    (ToParentBlockJoinQuery.BlockJoinScorer.setScoreAndFreq computes the
    same running aggregates while iterating one block's children)."""
    if len(child_docs) == 0:
        e = np.empty(0, dtype=np.int64)
        return e, np.empty(0, np.float32), np.empty(0, np.float32), e, e
    s32 = child_scores.astype(np.float32)
    s_int = np.round(s32.astype(np.float64) * SCORE_SCALE).astype(np.int64)
    pidx = np.searchsorted(parents, child_docs)  # first parent > child
    if pidx[-1] >= len(parents):
        raise ValueError("child doc after the last parent (broken block)")
    starts = np.concatenate([[0], np.nonzero(np.diff(pidx))[0] + 1])
    pids = parents[pidx[starts]]
    mx = np.maximum.reduceat(s32, starts)
    mn = np.minimum.reduceat(s32, starts)
    sum_i = np.add.reduceat(s_int, starts)
    cnt = np.diff(np.concatenate([starts, [len(child_docs)]])).astype(np.int64)
    return pids, mx, mn, sum_i, cnt


def parent_children(
    parent_doc: int, child_match_docs: np.ndarray, parents: np.ndarray
) -> np.ndarray:
    """ParentChildrenBlockJoinQuery (reference join/
    ParentChildrenBlockJoinQuery.java): the child documents of ONE
    specific parent that also match the child filter — the block run
    (previous parent + 1 .. parent - 1) intersected with the filter's
    matches.  Raises when ``parent_doc`` is not a parent (the reference
    returns no matches for a non-parent, but a wrong docid here is
    always a caller bug in our batch pipelines)."""
    idx = int(np.searchsorted(parents, parent_doc))
    if idx >= len(parents) or parents[idx] != parent_doc:
        raise ValueError(f"doc {parent_doc} is not a parent docid")
    lo = int(parents[idx - 1]) + 1 if idx > 0 else 0
    kids = np.arange(lo, parent_doc, dtype=np.int64)
    return np.intersect1d(kids, np.asarray(child_match_docs, dtype=np.int64))


def children_of(matched_parents: np.ndarray, parents: np.ndarray) -> np.ndarray:
    """ToChildBlockJoinQuery: the child docids of the matched parents —
    each parent's children are the docid run (previous parent + 1 .. p-1).
    Returns the children in ascending docid order."""
    if len(matched_parents) == 0:
        return np.empty(0, dtype=np.int64)
    pos = np.searchsorted(parents, matched_parents)
    lo = np.where(pos > 0, parents[pos - 1] + 1, 0)
    runs = [np.arange(a, p) for a, p in zip(lo, matched_parents)]
    return np.concatenate(runs).astype(np.int64) if runs else np.empty(0, np.int64)
