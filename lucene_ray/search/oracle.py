"""Brute-force scoring oracle (FIXTURES F2/F3 acceptance arm).

Scores every query over fully-decoded postings with the same float32 BM25
SimScorer but no compression or pruning in the path: per-doc score = float32
cast of the double sum of per-clause float32 scores (the WANDScorer
double-accumulator shape).  Every engine top-k must match rank-identically.
"""

from __future__ import annotations

import numpy as np

from ..index.postings import decode_term
from .bm25 import CollectionStatistics, TermStatistics
from .collector import merge_top_docs
from .query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    MatchAllDocsQuery,
    TermQuery,
    Weight,
)

F32 = np.float32


def _clause_scores(q, weight: Weight, reader, boost: float) -> tuple[np.ndarray, np.ndarray]:
    """(matching local docids, float32 scores) for a leaf/compound query."""
    if isinstance(q, TermQuery):
        tid = reader.term_id(q.term)
        if tid is None:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=F32)
        docs, freqs = decode_term(reader.enc, tid)
        sim = weight.sim_scorer(q.term, boost)
        norms = np.asarray(reader.norms)[docs]
        return docs, sim.score_bulk(freqs, norms)
    if isinstance(q, BoostQuery):
        return _clause_scores(q.query, weight, reader, boost * q.boost)
    if isinstance(q, ConstantScoreQuery):
        docs, _ = _clause_scores(q.query, weight, reader, 1.0)
        return docs, np.full(len(docs), F32(boost), dtype=F32)
    if isinstance(q, MatchAllDocsQuery):
        docs = np.arange(reader.max_doc, dtype=np.int64)
        return docs, np.full(len(docs), F32(boost), dtype=F32)
    if isinstance(q, BooleanQuery):
        docs, scores, _ = _boolean_matches(q, weight, reader, boost)
        return docs, scores
    raise TypeError(repr(q))


def _boolean_matches(q: BooleanQuery, weight, reader, boost):
    max_doc = reader.max_doc
    sum_scores = np.zeros(max_doc, dtype=np.float64)
    should_count = np.zeros(max_doc, dtype=np.int32)
    must_mask = np.ones(max_doc, dtype=bool)
    has_must = False
    not_mask = np.zeros(max_doc, dtype=bool)
    n_should = 0
    for c in q.clauses:
        if c.occur in ("SHOULD", "MUST"):
            docs, scores = _clause_scores(c.query, weight, reader, boost)
            present = np.zeros(max_doc, dtype=bool)
            present[docs] = True
            sum_scores[docs] += scores.astype(np.float64)
            if c.occur == "SHOULD":
                n_should += 1
                should_count[docs] += 1
            else:
                has_must = True
                must_mask &= present
        elif c.occur == "FILTER":
            docs, _ = _clause_scores(c.query, weight, reader, 1.0)
            present = np.zeros(max_doc, dtype=bool)
            present[docs] = True
            has_must = True
            must_mask &= present
        elif c.occur == "MUST_NOT":
            docs, _ = _clause_scores(c.query, weight, reader, 1.0)
            not_mask[docs] = True
    msm = max(q.min_should_match, 0 if has_must or n_should == 0 else 1)
    match = ~not_mask
    if has_must:
        match &= must_mask
        if q.min_should_match > 0:
            match &= should_count >= q.min_should_match
    else:
        match &= should_count >= max(msm, 1)
    docs = np.flatnonzero(match).astype(np.int64)
    return docs, sum_scores[docs].astype(F32), should_count


def brute_force_topk(searcher, query, k: int) -> list[tuple[int, np.float32]]:
    """Global top-k [(global docid, score)] with (score desc, seg, doc)
    tie-break — same contract as IndexSearcher.search."""
    weight = searcher.make_weight(query)
    per_segment = []
    for reader in searcher.readers:
        docs, scores = _clause_scores(query, weight, reader, 1.0)
        if len(docs) > k:
            # partial top-k per segment keeps the merge cheap
            order = np.lexsort((docs, -scores.astype(np.float64)))[: max(k, 1)]
        else:
            order = np.lexsort((docs, -scores.astype(np.float64)))
        per_segment.append([(int(docs[i]), F32(scores[i])) for i in order])
    doc_bases = [seg["doc_base"] for seg in searcher.manifest["segments"]]
    return merge_top_docs(per_segment, k, doc_bases)
