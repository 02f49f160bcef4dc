"""Prefix suggester over the term dictionary (lucene/suggest analogue).

Semantics: HighFrequencyDictionary + WFSTCompletionLookup — completions
are the indexed terms under the prefix, weighted by collection doc freq,
top-N by (weight DESC, term ASC).  The reference walks an FST byte prefix
(suggest/fst/WFSTCompletionLookup.java:188-260 lookup;
spell/HighFrequencyDictionary.java term+docFreq source); this engine's
sorted term dictionary gives the same pruning via the [prefix, prefix+FF)
term-id range, so a segment touches only the completions' dictionary
rows, never its postings.

Distribution shape: one task per segment emits (qid, term, df) partials
for every prefix, a Ray groupby sums across segments (vocabulary-bounded,
not corpus-bounded), then per-block partial top-N keeps candidate rows
tiny before the driver's final merge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..index.segment import SegmentReader


def segment_completions(
    reader: SegmentReader, prefixes: list[str]
) -> tuple[list[int], list[str], list[int]]:
    """(qid, term, doc_freq) rows for every dictionary term under each
    prefix in this segment — a dictionary range scan, no postings decode."""
    qids: list[int] = []
    terms: list[str] = []
    weights: list[int] = []
    df = np.asarray(reader.enc.doc_freq)
    for qid, p in enumerate(prefixes):
        lo = p.encode("utf-8")
        hi = lo + b"\xff\xff\xff\xff"
        for tid in reader.term_id_range(lo, hi):
            qids.append(qid)
            terms.append(reader.term_string(tid))
            weights.append(int(df[tid]))
    return qids, terms, weights


def partial_topn(batch: pa.Table, n: int) -> pa.Table:
    """Per-block top-N by (weight DESC, term ASC) within each qid — exact
    pre-reduction because rows are already (qid, term)-unique finals."""
    import pandas as pd

    df = batch.to_pandas()
    df = df.sort_values(["qid", "weight", "term"], ascending=[True, False, True])
    out = df.groupby("qid", sort=True).head(n)
    return pa.Table.from_pandas(out, preserve_index=False)
