"""IndexSearcher: stats phase + per-segment top-k + merge.

Mirrors the reference flow (search/IndexSearcher.java:612-850): build
index-wide CollectionStatistics/TermStatistics once per query, score each
segment independently with dynamic pruning, reduce with TopDocs.merge
tie-break (score desc, segment ordinal asc, docID asc).

Two execution modes:
- in-process (used by tests / oracle comparisons),
- ``DistributedSearcher``: a pool of Ray actors each owning a slice of
  segments (the IndexSearcher leaf-slice analogue, :106-108) — the actor
  holds open SegmentReaders (mmap) across queries.
"""

from __future__ import annotations

import numpy as np

from ..index.manifest import collection_stats_from, read_manifest
from .. import store
from ..index.segment import SegmentReader
from .bm25 import BM25Similarity, CollectionStatistics, TermStatistics
from .collector import TopKCollector, merge_top_docs
from .multiterm import _multi_term_matches, phrase_matches_segment
from .query import Query, Weight, build_scorer, collect_terms
from .scorers import NO_MORE_DOCS

DEFAULT_TOTAL_HITS_THRESHOLD = 1000  # IndexSearcher.java:100

# Dense bulk scoring is used for pure-SHOULD disjunctions (and single terms)
# on segments up to this many docs — the BooleanScorer/TermScorer
# nextDocsAndScores analogue (reference search/TermScorer.java:134-167 bulk
# block scoring; search/MaxScoreBulkScorer.java dense windows).  The gate is
# a MEMORY bound (float64 acc + int32 counts = 12B/doc => 48MB at 4M docs,
# fine inside a query actor), not a speed crossover: in this Python engine
# the vectorized dense scan beats the per-doc WAND loop at every feasible
# segment size — block-max pruning only wins for compiled per-doc scorers
# like the reference's.  WAND remains the COMPLETE-mode verification arm
# and the fallback above the gate (where a windowed dense scorer with
# per-window impact bounds would be the next step).
BULK_MAX_DOC = 1 << 22


class TimeExceededException(Exception):
    """search/TimeLimitingCollector.TimeExceededException analogue: the
    allowed budget, the elapsed time, and how many segments finished;
    ``partial_hits`` carries the top-k collected before the deadline."""

    def __init__(self, timeout: float, elapsed: float, segments_searched: int):
        super().__init__(
            f"Elapsed time: {elapsed!r} exceeded allowed search time: "
            f"{timeout!r} after {segments_searched} segments"
        )
        self.timeout = timeout
        self.elapsed = elapsed
        self.segments_searched = segments_searched
        self.partial_hits: list = []


def _leaf_term(q: Query, boost: float = 1.0):
    """(term, boost) for a (possibly boost-wrapped) TermQuery leaf, else None.
    Nested BooleanQuery is NOT a leaf: its score is float32-cast before the
    outer sum, so flattening it would change float32 results."""
    from .query import BoostQuery, TermQuery

    if isinstance(q, TermQuery):
        return (q.term, boost)
    if isinstance(q, BoostQuery):
        return _leaf_term(q.query, boost * q.boost)
    return None


def _flatten_should_terms(q: Query):
    """([(term, boost)], min_should_match) if ``q`` is a single term or a
    pure-SHOULD disjunction of term leaves, else None."""
    from .query import SHOULD, BooleanQuery

    leaf = _leaf_term(q)
    if leaf is not None:
        return [leaf], 0
    if isinstance(q, BooleanQuery):
        out = []
        for c in q.clauses:
            if c.occur != SHOULD:
                return None
            sub = _leaf_term(c.query)
            if sub is None:
                return None
            out.append(sub)
        return (out, q.min_should_match) if out else None
    return None


def _bulk_search_segment(reader, terms_boosts, min_should_match, weight, k):
    """Exact dense top-k: float64 accumulator of float32 clause scores,
    final cast to float32 (the WANDScorer double-accumulator shape), ties
    broken (score desc, docid asc) like TopScoreDocCollector."""
    max_doc = reader.max_doc
    acc = None
    counts = None
    norms = np.asarray(reader.norms)
    for term, boost in terms_boosts:
        tid = reader.term_id(term)
        if tid is None:
            continue
        docs, freqs = reader.decode_term_cached(tid)
        scores = weight.sim_scorer(term, boost).score_bulk(freqs, norms[docs])
        if acc is None:
            acc = np.zeros(max_doc, dtype=np.float64)
            counts = np.zeros(max_doc, dtype=np.int32)
        acc[docs] += scores.astype(np.float64)
        counts[docs] += 1
    if acc is None:
        return []
    mask = counts >= max(min_should_match, 1)
    if reader.live is not None:
        mask &= reader.live
    cand = np.nonzero(mask)[0]
    if len(cand) == 0:
        return []
    sc = acc[cand].astype(np.float32)
    if len(cand) > k:
        kth = np.partition(-sc, k - 1)[k - 1]  # k-th best score, negated
        keep = -sc <= kth  # everything scoring >= the k-th (ties included)
        cand, sc = cand[keep], sc[keep]
    order = np.lexsort((cand, -sc))[:k]
    return [(int(cand[i]), np.float32(sc[i])) for i in order]


class IndexSearcher:
    def __init__(
        self,
        index_dir: str,
        generation: int | None = None,
        mmap: bool = True,
        similarity=None,
        _reuse: dict | None = None,
    ):
        self.index_dir = index_dir
        self.mmap = mmap
        self.manifest = read_manifest(index_dir, generation)
        self.generation = int(self.manifest["generation"])
        self.readers = []
        for seg in self.manifest["segments"]:
            key = (seg["dir"], seg.get("livedocs"))
            cached = _reuse.get(key) if _reuse else None
            self.readers.append(
                cached if cached is not None else SegmentReader(seg["dir"], mmap=mmap)
            )
        for reader, seg in zip(self.readers, self.manifest["segments"]):
            lp = seg.get("livedocs")
            if lp and reader.live is None:
                reader.live = store.np_load(lp)
            # numeric doc-values update overlays (per generation; the
            # stored-column cache keys on the overlay path)
            reader.dv_updates = seg.get("dv_updates", {})
        cs = collection_stats_from(self.manifest)
        self.collection_stats = CollectionStatistics(
            max_doc=cs["max_doc"],
            doc_count=cs["doc_count"],
            sum_total_term_freq=cs["sum_total_term_freq"],
            sum_doc_freq=cs["sum_doc_freq"],
        )
        self.similarity = similarity if similarity is not None else BM25Similarity()

    def term_statistics(self, terms: set[str]) -> dict[str, TermStatistics]:
        """TermStates.build analogue: sum df/ttf across segments."""
        out = {}
        for t in sorted(terms):
            df = ttf = 0
            for r in self.readers:
                d, f = r.term_stats(t)
                df += d
                ttf += f
            out[t] = TermStatistics(t, df, ttf)
        return out

    def make_weight(self, query: Query) -> Weight:
        terms = collect_terms(query)
        return Weight(
            collection_stats=self.collection_stats,
            term_stats=self.term_statistics(terms),
            similarity=self.similarity,
        )

    def compute_feature_pivot(self, field: str) -> float:
        """FeatureField.computePivotFeatureValue (FeatureField.java): pivot
        = decodeFeatureValue(float32(ttf / df)) where ttf sums the
        feature's ENCODED postings freqs and df counts docs carrying it.
        Per-segment partials (one tiny (sum, n) pair each), final here —
        the CollectionStatistics partial+final shape."""
        from .query import decode_feature_value, encode_feature_value

        ttf = 0
        df = 0
        for r in self.readers:
            v = (
                r.stored_column(field)
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
            m = v > 0
            if getattr(r, "live", None) is not None:
                m &= r.live
            ttf += int(encode_feature_value(v[m]).sum())
            df += int(m.sum())
        if df == 0:
            return 1.0  # reference: term absent, any legal value
        avg_freq = np.float32(np.float64(ttf) / df)  # (float)((double)ttf/df)
        return float(decode_feature_value(np.array([int(avg_freq)]))[0])

    def _rewrite_features(self, query: Query) -> Query:
        """Query.rewrite analogue for SaturationFunction's pivot=None:
        resolve the pivot once per query (FeatureField SaturationFunction
        .rewrite).  Walks BooleanQuery/BoostQuery wrappers — the javadoc
        composition shapes."""
        import dataclasses

        from .query import BooleanQuery, BoostQuery, FeatureQuery

        if isinstance(query, FeatureQuery):
            if query.function == "satu" and query.pivot is None:
                return dataclasses.replace(
                    query, pivot=self.compute_feature_pivot(query.field)
                )
            return query
        if isinstance(query, BoostQuery):
            inner = self._rewrite_features(query.query)
            return dataclasses.replace(query, query=inner) if inner is not query.query else query
        if isinstance(query, BooleanQuery):
            new_clauses = tuple(
                dataclasses.replace(c, query=self._rewrite_features(c.query))
                for c in query.clauses
            )
            if any(n.query is not o.query for n, o in zip(new_clauses, query.clauses)):
                return dataclasses.replace(query, clauses=new_clauses)
            return query
        return query

    def search(
        self,
        query: Query,
        k: int,
        total_hits_threshold: float = DEFAULT_TOTAL_HITS_THRESHOLD,
        score_mode: str = "TOP_SCORES",
    ) -> list[tuple[int, np.float32]]:
        """Top-k as [(global docid, float32 score)].

        ``score_mode="COMPLETE"`` (with threshold=inf) disables all pruning —
        the exhaustive arm of the CheckHits.checkTopScores differential
        (SURVEY §5.3).
        """
        query = self._rewrite_features(query)
        weight = self.make_weight(query)
        per_segment = []
        # cross-segment min-competitive carry (MaxScoreAccumulator.java:
        # 23-41): once k hits exist, their k-th score floors every later
        # segment's pruning — ties lose to earlier segments, so exact
        floor = -np.inf
        scores_so_far: list[float] = []
        for reader in self.readers:
            hits = search_segment(
                reader, query, weight, k, total_hits_threshold, score_mode,
                floor=floor,
            )
            per_segment.append(hits)
            if score_mode == "TOP_SCORES":
                scores_so_far.extend(float(s) for _, s in hits)
                if len(scores_so_far) >= k:
                    scores_so_far.sort(reverse=True)
                    del scores_so_far[k:]
                    floor = max(floor, scores_so_far[k - 1])
        doc_bases = [seg["doc_base"] for seg in self.manifest["segments"]]
        return merge_top_docs(per_segment, k, doc_bases)

    def search_with_time_limit(
        self,
        query: Query,
        k: int,
        timeout: float,
        clock=None,
        partial: bool = True,
    ):
        """TimeLimitingCollector analogue (search/TimeLimitingCollector.
        java): the clock is checked at segment (leaf) granularity — the
        natural bulk unit of this engine's vectorized scorers, standing in
        for the reference's per-doc collect() check.  ``clock`` is
        injectable (the reference's TimerThread counter seam) and defaults
        to time.monotonic.  With ``partial=True`` returns
        ``(hits, terminated_early, segments_searched)`` — the partial
        top-k collected before the deadline (the reference pattern of
        catching TimeExceededException and reading the collector's
        TopDocs).  With ``partial=False`` raises TimeExceededException
        with ``.partial_hits`` attached."""
        import time as _time

        clock = clock if clock is not None else _time.monotonic
        weight = self.make_weight(query)
        t0 = clock()
        per_segment = []
        floor = -np.inf
        scores_so_far: list[float] = []
        doc_bases = [seg["doc_base"] for seg in self.manifest["segments"]]
        terminated = False
        for reader in self.readers:
            elapsed = clock() - t0
            if elapsed > timeout:
                if not partial:
                    exc = TimeExceededException(timeout, elapsed, len(per_segment))
                    exc.partial_hits = merge_top_docs(per_segment, k, doc_bases)
                    raise exc
                terminated = True
                break
            hits = search_segment(reader, query, weight, k,
                                  DEFAULT_TOTAL_HITS_THRESHOLD, "TOP_SCORES",
                                  floor=floor)
            per_segment.append(hits)
            scores_so_far.extend(float(s) for _, s in hits)
            if len(scores_so_far) >= k:
                scores_so_far.sort(reverse=True)
                del scores_so_far[k:]
                floor = max(floor, scores_so_far[k - 1])
        merged = merge_top_docs(per_segment, k, doc_bases)
        return merged, terminated, len(per_segment)

    def search_after(
        self,
        query: Query,
        k: int,
        after: tuple[float, int] | None,
    ) -> list[tuple[int, np.float32]]:
        """Pagination (IndexSearcher.searchAfter analogue): the next k hits
        strictly after ``after = (score, global docid)`` in (score desc,
        docid asc) order.  Implemented as over-fetch + filter: exact
        because our per-segment paths return ties deterministically."""
        if after is None:
            return self.search(query, k)
        a_score, a_doc = np.float32(after[0]), int(after[1])
        # fetch enough to cover everything at/above the after-score
        fetch = k
        while True:
            fetch = fetch * 4 + len(self.readers) * k
            hits = self.search(query, fetch)
            worse = [
                (d, s)
                for d, s in hits
                if (s < a_score) or (s == a_score and d > a_doc)
            ]
            if len(worse) >= k or len(hits) < fetch:
                return worse[:k]

    def count(self, query: Query) -> int:
        """Exhaustive match count (non-scoring)."""
        from .query import (
            FuzzyQuery,
            MultiPhraseQuery,
            PhraseQuery,
            PrefixQuery,
            RegexpQuery,
            TermInSetQuery,
            TermRangeQuery,
            WildcardQuery,
        )

        weight = self.make_weight(query)
        total = 0
        if isinstance(query, MultiPhraseQuery):
            from .multiterm import multi_phrase_matches_segment

            for reader in self.readers:
                docs, _ = multi_phrase_matches_segment(reader, query.slots)
                total += len(docs)
            return total
        if isinstance(query, PhraseQuery):
            for reader in self.readers:
                if query.slop > 0:
                    from .multiterm import sloppy_phrase_matches_segment

                    docs, _ = sloppy_phrase_matches_segment(
                        reader, query.terms, query.slop
                    )
                else:
                    docs, _ = phrase_matches_segment(reader, query.terms)
                total += len(docs)
            return total
        if isinstance(
            query,
            (PrefixQuery, TermRangeQuery, WildcardQuery, FuzzyQuery,
             RegexpQuery, TermInSetQuery),
        ):
            from .cache import cached_filter_docs

            for reader in self.readers:
                docs = cached_filter_docs(
                    reader, query, lambda r=reader: _multi_term_matches(r, query)
                )
                if reader.live is not None and len(docs):
                    docs = docs[reader.live[docs]]
                total += len(docs)
            return total
        from .query import MatchAllDocsQuery, TermQuery

        for reader in self.readers:
            # Weight#count fast paths (search/TermQuery.java count,
            # MatchAllDocsQuery.java count): on a delete-free segment a
            # term's count IS its doc_freq and match-all's is maxDoc —
            # no postings decode, no iteration
            if reader.live is None:
                if isinstance(query, TermQuery):
                    df, _ = reader.term_stats(query.term)
                    total += df
                    continue
                if isinstance(query, MatchAllDocsQuery):
                    total += reader.max_doc
                    continue
            scorer = build_scorer(query, weight, reader, 1.0, "COMPLETE_NO_SCORES", False)
            if scorer is None:
                continue
            live = reader.live
            doc = scorer.advance(0)
            while doc != NO_MORE_DOCS:
                if live is None or live[doc]:
                    total += 1
                doc = scorer.next_doc()
        return total


def _function_score_search_segment(reader, query, weight: Weight, k: int):
    """FunctionScoreQuery: inner dense COMPLETE scores remapped by the
    DoubleValuesSource product (double math, float32 cast —
    queries/function/FunctionScoreQuery.java boostByValue)."""
    from .oracle import _clause_scores

    docs, scores = _clause_scores(query.query, weight, reader, 1.0)
    if reader.live is not None and len(docs):
        m = reader.live[docs]
        docs, scores = docs[m], scores[m]
    if len(docs) == 0:
        return []
    if getattr(query, "expression", ""):
        from .expressions import compile_expression

        expr = compile_expression(query.expression)
        bindings = {"_score": scores.astype(np.float64)}
        for name in expr.variables:
            if name == "_score":
                continue
            bindings[name] = (
                reader.stored_column(name)
                .to_numpy(zero_copy_only=False)[docs]
                .astype(np.float64)
            )
        sc = expr.evaluate(bindings).astype(np.float32)
    else:
        v = reader.stored_column(query.field).to_numpy(zero_copy_only=False)[docs]
        sc = (
            scores.astype(np.float64) * np.log(1.0 + v.astype(np.float64))
        ).astype(np.float32)
    if len(docs) > k:
        kth = np.partition(-sc, k - 1)[k - 1]
        keep = -sc <= kth
        docs, sc = docs[keep], sc[keep]
    order = np.lexsort((docs, -sc))[:k]
    return [(int(docs[i]), np.float32(sc[i])) for i in order]


def _synonym_search_segment(reader, query, weight: Weight, k: int):
    """Dense SynonymScorer analogue: per-doc freq = sum(boost * tf) over
    the member terms (float32 — boosts restricted to exact binary fractions
    keep the sum bit-stable), scored once by the blended SimScorer
    (SynonymQuery.java SynonymScorer.freq())."""
    freq = np.zeros(reader.max_doc, dtype=np.float32)
    for term, boost in query.term_boosts():
        tid = reader.term_id(term)
        if tid is None:
            continue
        docs, tfs = reader.decode_term_cached(tid)
        freq[docs] += np.float32(boost) * tfs.astype(np.float32)
    if reader.live is not None:
        freq[~reader.live] = 0
    cand = np.nonzero(freq)[0]
    if len(cand) == 0:
        return []
    sim = weight.synonym_sim_scorer(query.terms, 1.0)
    sc = sim.score_bulk(freq[cand], np.asarray(reader.norms)[cand])
    if len(cand) > k:
        kth = np.partition(-sc, k - 1)[k - 1]
        keep = -sc <= kth
        cand, sc = cand[keep], sc[keep]
    order = np.lexsort((cand, -sc))[:k]
    return [(int(cand[i]), np.float32(sc[i])) for i in order]


def _dismax_search_segment(reader, query, weight: Weight, k: int):
    """Dense DisjunctionMax top-k via the shared dismax kernel
    (query.dismax_dense_matches); ties by docid."""
    from .query import dismax_dense_matches

    cand, sc = dismax_dense_matches(query, weight, reader)
    if len(cand) == 0:
        return []
    if len(cand) > k:
        kth = np.partition(-sc, k - 1)[k - 1]
        keep = -sc <= kth
        cand, sc = cand[keep], sc[keep]
    order = np.lexsort((cand, -sc))[:k]
    return [(int(cand[i]), np.float32(sc[i])) for i in order]


def _blended_search_segment(reader, query, weight: Weight, k: int):
    """Dense BlendedTermQuery top-k via the shared stats-equalized kernel
    (query.blended_dense_matches); ties by docid."""
    from .query import blended_dense_matches

    cand, sc = blended_dense_matches(query, weight, reader)
    if len(cand) == 0:
        return []
    if len(cand) > k:
        kth = np.partition(-sc, k - 1)[k - 1]
        keep = -sc <= kth
        cand, sc = cand[keep], sc[keep]
    order = np.lexsort((cand, -sc))[:k]
    return [(int(cand[i]), np.float32(sc[i])) for i in order]


def _multi_phrase_search_segment(reader, query, weight: Weight, k: int):
    from .multiterm import multi_phrase_matches_segment

    docs, freqs = multi_phrase_matches_segment(reader, query.slots)
    if len(docs) == 0:
        return []
    flat = tuple(t for alts in query.slots for t in alts)
    sim = weight.phrase_sim_scorer(flat, 1.0)
    sc = sim.score_bulk(freqs, np.asarray(reader.norms)[docs])
    if len(docs) > k:
        kth = np.partition(-sc, k - 1)[k - 1]
        keep = -sc <= kth
        docs, sc = docs[keep], sc[keep]
    order = np.lexsort((docs, -sc))[:k]
    return [(int(docs[i]), np.float32(sc[i])) for i in order]


def _phrase_search_segment(reader, query, weight: Weight, k: int):
    if getattr(query, "slop", 0) > 0:
        from .multiterm import sloppy_phrase_matches_segment

        docs, freqs = sloppy_phrase_matches_segment(reader, query.terms, query.slop)
    else:
        docs, freqs = phrase_matches_segment(reader, query.terms)
    if len(docs) == 0:
        return []
    sim = weight.phrase_sim_scorer(query.terms, 1.0)
    norms = np.asarray(reader.norms)[docs]
    sc = sim.score_bulk(freqs, norms)
    if len(docs) > k:
        kth = np.partition(-sc, k - 1)[k - 1]
        keep = -sc <= kth
        docs, sc = docs[keep], sc[keep]
    order = np.lexsort((docs, -sc))[:k]
    return [(int(docs[i]), np.float32(sc[i])) for i in order]


def _windowed_bulk_search_segment(
    reader, terms_boosts, min_should_match, weight, k, window: int = 1 << 20,
    floor: float = -np.inf,
):
    """Exact top-k for pure-SHOULD queries on segments ABOVE the dense gate:
    fixed-size doc windows, dense float64 accumulation per window, windows
    whose summed per-term impact bound cannot beat the current k-th score
    are SKIPPED without decoding (MaxScoreBulkScorer dense-window analogue,
    reference search/MaxScoreBulkScorer.java:28 INNER_WINDOW; bounds from
    the CompetitiveImpactAccumulator skylines, MaxScoreCache.java:74-89).

    Later windows hold strictly larger docids, so an equal-score candidate
    there loses the (score desc, docid asc) tie — skipping on bound <= kth
    is exact.
    """
    from ..index.postings import decode_block

    enc = reader.enc
    norms = np.asarray(reader.norms)
    max_doc = reader.max_doc

    terms = []
    for term, boost in terms_boosts:
        tid = reader.term_id(term)
        if tid is None:
            continue
        sim = weight.sim_scorer(term, boost)
        bs, bc = int(enc.block_start[tid]), int(enc.block_count[tid])
        sd = int(enc.singleton_doc[tid])
        if sd >= 0:
            terms.append(
                {"sim": sim, "sing": (sd, int(enc.singleton_freq[tid])), "bs": 0,
                 "bc": 0, "last": None, "bmax": None}
            )
            continue
        last = np.asarray(enc.block_last_doc[bs : bs + bc], dtype=np.int64)
        # per-block max score from the impact skylines (valid upper bound:
        # every (freq, norm) in the block is dominated by a skyline pair)
        i0 = int(enc.block_imp_start[bs])
        i1 = int(enc.block_imp_start[bs + bc - 1] + enc.block_imp_count[bs + bc - 1])
        pair_scores = sim.score_bulk(
            np.asarray(enc.imp_freq[i0:i1], dtype=np.int64),
            np.asarray(enc.imp_norm[i0:i1], dtype=np.int64),
        )
        starts = np.asarray(enc.block_imp_start[bs : bs + bc], dtype=np.int64) - i0
        bmax = np.maximum.reduceat(pair_scores, starts)
        terms.append({"sim": sim, "sing": None, "bs": bs, "bc": bc, "last": last, "bmax": bmax})
    if not terms:
        return []

    out_docs: list[np.ndarray] = []
    out_scores: list[np.ndarray] = []
    # ``floor`` carries the GLOBAL k-th score from earlier segments (the
    # MaxScoreAccumulator analogue, search/MaxScoreAccumulator.java:23-41):
    # a window whose bound cannot beat it is skipped even before this
    # segment has k local hits — exact, because later segments lose ties.
    kth = float(floor)
    have = 0
    for w0 in range(0, max_doc, window):
        w1 = min(w0 + window, max_doc)
        # upper bound for this window
        bound = 0.0
        spans = []
        for t in terms:
            if t["sing"] is not None:
                sd, sf = t["sing"]
                if w0 <= sd < w1:
                    bound += float(t["sim"].score(sf, int(norms[sd])))
                spans.append(None)
                continue
            last = t["last"]
            lo = int(np.searchsorted(last, w0))  # first block with last_doc >= w0
            hi = int(np.searchsorted(last, w1 - 1)) + 1  # blocks starting <= w1-1
            hi = min(hi, t["bc"])
            spans.append((lo, hi))
            if lo < hi:
                bound += float(t["bmax"][lo:hi].max())
        if (have >= k or kth > -np.inf) and bound <= kth:
            continue
        acc = np.zeros(w1 - w0, dtype=np.float64)
        counts = np.zeros(w1 - w0, dtype=np.int32)
        for t, span in zip(terms, spans):
            if t["sing"] is not None:
                sd, sf = t["sing"]
                if w0 <= sd < w1:
                    acc[sd - w0] += float(t["sim"].score(sf, int(norms[sd])))
                    counts[sd - w0] += 1
                continue
            lo, hi = span
            if lo >= hi:
                continue
            bs = t["bs"]
            for b in range(bs + lo, bs + hi):
                prev = int(t["last"][b - bs - 1]) if b > bs else -1
                docs, freqs = decode_block(enc, b, prev)
                m = (docs >= w0) & (docs < w1)
                if not m.any():
                    continue
                d = docs[m]
                sc = t["sim"].score_bulk(freqs[m], norms[d])
                acc[d - w0] += sc.astype(np.float64)
                counts[d - w0] += 1
        mask = counts >= max(min_should_match, 1)
        if reader.live is not None:
            mask &= reader.live[w0:w1]
        cand = np.nonzero(mask)[0]
        if len(cand) == 0:
            continue
        sc32 = acc[cand].astype(np.float32)
        if len(cand) > k:
            kth_local = np.partition(-sc32, k - 1)[k - 1]
            keep = -sc32 <= kth_local
            cand, sc32 = cand[keep], sc32[keep]
        out_docs.append(cand + w0)
        out_scores.append(sc32)
        have += len(cand)
        if have >= k:
            all_sc = np.concatenate(out_scores)
            if len(all_sc) >= k:
                kth = max(kth, float(-np.partition(-all_sc, k - 1)[k - 1]))
    if not out_docs:
        return []
    docs = np.concatenate(out_docs)
    scores = np.concatenate(out_scores)
    order = np.lexsort((docs, -scores))[:k]
    return [(int(docs[i]), np.float32(scores[i])) for i in order]


def _indri_and_search_segment(reader, query, weight: Weight, k: int):
    """IndriAndScorer.scoreDoc (search/IndriAndScorer.java:44-69): union
    match set; every clause scores every matched doc (freq=0 smoothing
    when absent, TermScorer.smoothingScore); boost-weighted mean — per-
    clause f32 score widened to double, boost-multiplied, summed, divided
    by boostSum, one final f32 cast (the reference's arithmetic)."""
    boosts = query.boosts or tuple(1.0 for _ in query.terms)
    norms = np.asarray(reader.norms)
    max_doc = reader.max_doc
    freqs_by_term: list[np.ndarray | None] = []
    union_mask = np.zeros(max_doc, dtype=bool)
    for t in query.terms:
        tid = reader.term_id(t)
        if tid is None:
            freqs_by_term.append(None)
            continue
        docs, fr = reader.decode_term_cached(tid)
        f = np.zeros(max_doc, dtype=np.int64)
        f[docs] = fr
        union_mask[docs] = True
        freqs_by_term.append(f)
    if reader.live is not None:
        union_mask &= reader.live
    docs = np.nonzero(union_mask)[0]
    if len(docs) == 0:
        return []
    total = np.zeros(len(docs), dtype=np.float64)
    boost_sum = 0.0
    nb = norms[docs]
    zeros = np.zeros(len(docs), dtype=np.int64)
    for t, b, f in zip(query.terms, boosts, freqs_by_term):
        sim = weight.sim_scorer(t, 1.0)
        fr = f[docs] if f is not None else zeros
        total += sim.score_bulk(fr, nb).astype(np.float64) * float(b)
        boost_sum += float(b)
    if boost_sum == 0:
        return []
    sc = (total / boost_sum).astype(np.float32)
    order = np.lexsort((docs, -sc))[:k]
    return [(int(docs[i]), np.float32(sc[i])) for i in order]


def search_segment(
    reader: SegmentReader,
    query: Query,
    weight: Weight,
    k: int,
    total_hits_threshold: float,
    score_mode: str,
    allow_bulk: bool = True,
    floor: float = -np.inf,
) -> list[tuple[int, np.float32]]:
    from .query import (
        BlendedTermQuery,
        DisjunctionMaxQuery,
        FunctionScoreQuery,
        FuzzyQuery,
        IndriAndQuery,
        MultiPhraseQuery,
        PhraseQuery,
        PrefixQuery,
        RegexpQuery,
        SynonymQuery,
        TermInSetQuery,
        TermRangeQuery,
        WildcardQuery,
    )

    if isinstance(query, IndriAndQuery):
        return _indri_and_search_segment(reader, query, weight, k)
    if isinstance(query, FunctionScoreQuery):
        return _function_score_search_segment(reader, query, weight, k)
    if isinstance(query, SynonymQuery):
        return _synonym_search_segment(reader, query, weight, k)
    if isinstance(query, PhraseQuery):
        return _phrase_search_segment(reader, query, weight, k)
    if isinstance(query, MultiPhraseQuery):
        return _multi_phrase_search_segment(reader, query, weight, k)
    if isinstance(
        query,
        (PrefixQuery, TermRangeQuery, WildcardQuery, FuzzyQuery, RegexpQuery,
         TermInSetQuery),
    ):
        from .cache import cached_filter_docs

        docs = cached_filter_docs(
            reader, query, lambda: _multi_term_matches(reader, query)
        )
        if reader.live is not None and len(docs):
            docs = docs[reader.live[docs]]
        # constant score 1.0; ties by docID => top-k = k smallest docids
        return [(int(d), np.float32(1.0)) for d in docs[:k]]
    if isinstance(query, DisjunctionMaxQuery) and score_mode == "TOP_SCORES":
        # COMPLETE mode falls through to build_scorer's PrecomputedScorer
        # path so the differential test exercises an independent code path
        return _dismax_search_segment(reader, query, weight, k)
    if isinstance(query, BlendedTermQuery) and score_mode == "TOP_SCORES":
        return _blended_search_segment(reader, query, weight, k)
    if allow_bulk and score_mode == "TOP_SCORES":
        flat = _flatten_should_terms(query)
        if flat is not None:
            if reader.max_doc <= BULK_MAX_DOC:
                return _bulk_search_segment(reader, flat[0], flat[1], weight, k)
            return _windowed_bulk_search_segment(
                reader, flat[0], flat[1], weight, k, floor=floor
            )
    scorer = build_scorer(query, weight, reader, 1.0, score_mode, top_level=True)
    if scorer is None:
        return []
    collector = TopKCollector(k, total_hits_threshold)
    if floor > -np.inf and score_mode == "TOP_SCORES":
        mc = np.nextafter(np.float32(floor), np.float32(np.inf), dtype=np.float32)
        collector.min_competitive = mc
        scorer.set_min_competitive_score(mc)
    live = reader.live
    doc = scorer.advance(0)
    while doc != NO_MORE_DOCS:
        if live is None or live[doc]:
            collector.collect(doc, scorer.score())
        if score_mode == "TOP_SCORES":
            mc = collector.competitive_score()
            if mc is not None:
                scorer.set_min_competitive_score(mc)
        doc = scorer.next_doc()
    return collector.top_docs()


# --- distributed search over Ray actors ---------------------------------

class SegmentSearchWorker:
    """Owns a contiguous slice of segments; created once, reused per query
    (stateful actor: open mmaps + term dictionaries, SURVEY §7.3)."""

    def __init__(
        self,
        seg_dirs: list[str],
        seg_ords: list[int],
        livedocs: list[str | None] | None = None,
        dv_updates: list[dict | None] | None = None,
    ):
        self.readers = [SegmentReader(d) for d in seg_dirs]
        if livedocs:
            for reader, lp in zip(self.readers, livedocs):
                if lp:
                    reader.live = store.np_load(lp)
        if dv_updates:
            for reader, du in zip(self.readers, dv_updates):
                if du:
                    reader.dv_updates = du
        self.ords = seg_ords

    def term_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        out = {}
        for t in terms:
            df = ttf = 0
            for r in self.readers:
                d, f = r.term_stats(t)
                df += d
                ttf += f
            out[t] = (df, ttf)
        return out

    def search(
        self,
        query: Query,
        weight_stats: dict,
        k: int,
        total_hits_threshold: float,
        score_mode: str,
    ) -> list[tuple[int, list[tuple[int, float]]]]:
        weight = Weight(
            collection_stats=CollectionStatistics(**weight_stats["collection"]),
            term_stats={
                t: TermStatistics(t, df, ttf)
                for t, (df, ttf) in weight_stats["terms"].items()
            },
        )
        out = []
        for ord_, reader in zip(self.ords, self.readers):
            hits = search_segment(reader, query, weight, k, total_hits_threshold, score_mode)
            out.append((ord_, [(d, float(s)) for d, s in hits]))
        return out


class DistributedSearcher:
    """Query coordinator: phase A gather term stats, phase B broadcast the
    query to the actor pool, phase C TopDocs.merge (SURVEY §3.2)."""

    def __init__(self, index_dir: str, num_workers: int = 4, generation: int | None = None):
        import ray

        self.index_dir = index_dir
        self.num_workers = num_workers
        self.manifest = read_manifest(index_dir, generation)
        segs = self.manifest["segments"]
        cs = collection_stats_from(self.manifest)
        self.collection_stats = cs
        self.doc_bases = [s["doc_base"] for s in segs]
        n = min(num_workers, max(1, len(segs)))
        Worker = ray.remote(SegmentSearchWorker)
        self.workers = []
        for i in range(n):
            mine = [(j, s) for j, s in enumerate(segs) if j % n == i]
            dirs = [s["dir"] for _, s in mine]
            ords = [j for j, _ in mine]
            lives = [s.get("livedocs") for _, s in mine]
            dvus = [s.get("dv_updates") for _, s in mine]
            if dirs:
                self.workers.append(Worker.remote(dirs, ords, lives, dvus))
        # per-term (df, ttf) cache: the index is immutable, so term stats
        # never change — caching drops the phase-A RPC round for repeated
        # terms (TermStates is rebuilt per query in the reference only
        # because its readers are cheap in-process)
        self._term_stats_cache: dict[str, tuple[int, int]] = {}

    def refresh(self) -> bool:
        """Service-level NRT refresh (SearcherManager.maybeRefresh
        analogue): when a newer manifest generation exists, rebuild the
        actor pool against it (workers re-localize only NEW segments —
        unchanged ones hit the node's read-through cache) and drop the
        term-stats cache.  Returns True if anything changed."""
        from ..index.manifest import latest_generation

        gen = latest_generation(self.index_dir)
        if gen is None or gen == int(self.manifest["generation"]):
            return False
        self.__init__(self.index_dir, num_workers=self.num_workers, generation=gen)
        return True

    def search(
        self,
        query: Query,
        k: int,
        total_hits_threshold: float = DEFAULT_TOTAL_HITS_THRESHOLD,
        score_mode: str = "TOP_SCORES",
    ) -> list[tuple[int, np.float32]]:
        import ray

        terms = sorted(collect_terms(query))
        missing = [t for t in terms if t not in self._term_stats_cache]
        if missing:
            stats_parts = ray.get([w.term_stats.remote(missing) for w in self.workers])
            agg = {t: [0, 0] for t in missing}
            for part in stats_parts:
                for t, (df, ttf) in part.items():
                    agg[t][0] += df
                    agg[t][1] += ttf
            for t, v in agg.items():
                self._term_stats_cache[t] = (v[0], v[1])
        weight_stats = {
            "collection": self.collection_stats,
            "terms": {t: self._term_stats_cache[t] for t in terms},
        }
        results = ray.get(
            [
                w.search.remote(query, weight_stats, k, total_hits_threshold, score_mode)
                for w in self.workers
            ]
        )
        per_segment: list[list[tuple[int, np.float32]]] = [[] for _ in self.doc_bases]
        for part in results:
            for ord_, hits in part:
                per_segment[ord_] = [(d, np.float32(s)) for d, s in hits]
        return merge_top_docs(per_segment, k, self.doc_bases)


def _find_reader(searcher: "IndexSearcher", doc: int):
    for reader, seg in zip(searcher.readers, searcher.manifest["segments"]):
        base = int(seg["doc_base"])
        if base <= doc < base + reader.max_doc:
            return reader, doc - base
    raise ValueError(f"docid {doc} out of range")


def _explain_node(searcher: "IndexSearcher", q, weight: Weight, reader, local: int):
    """One query node's Explanation dict (None = no match for this doc)."""
    from .query import BooleanQuery, BoostQuery, ConstantScoreQuery, TermQuery

    if isinstance(q, TermQuery):
        return _explain_term(searcher, q.term, 1.0, weight, reader, local)
    if isinstance(q, BoostQuery):
        inner = _explain_node(searcher, q.query, weight, reader, local)
        if inner is None:
            return None
        if isinstance(q.query, TermQuery):
            return _explain_term(searcher, q.query.term, q.boost, weight, reader, local)
        val = np.float32(np.float64(inner["value"]) * q.boost)
        return {
            "value": float(val),
            "description": f"boost({q.boost}) * inner score",
            "details": [inner],
        }
    if isinstance(q, ConstantScoreQuery):
        inner = _explain_node(searcher, q.query, weight, reader, local)
        if inner is None:
            return None
        return {
            "value": float(np.float32(getattr(q, "score", 1.0))),
            "description": "ConstantScore",
            "details": [],
        }
    if isinstance(q, BooleanQuery):
        details = []
        for c in q.clauses:
            if c.occur == "MUST_NOT":
                sub = _explain_node(searcher, c.query, weight, reader, local)
                if sub is not None:
                    return None
                continue
            sub = _explain_node(searcher, c.query, weight, reader, local)
            if sub is None:
                if c.occur in ("MUST", "FILTER"):
                    return None
                continue
            # FILTER matches are required but never contribute score
            if c.occur in ("MUST", "SHOULD"):
                details.append(sub)
        should_present = [c for c in q.clauses if c.occur == "SHOULD"]
        matched_should = sum(
            1
            for c in should_present
            if _explain_node(searcher, c.query, weight, reader, local) is not None
        )
        if should_present and not any(
            c.occur == "MUST" for c in q.clauses
        ) and matched_should == 0:
            return None
        if matched_should < getattr(q, "min_should_match", 0):
            return None
        # sum in double of float32 clause scores, cast once (BooleanScorer)
        val = np.float32(np.sum([np.float64(d["value"]) for d in details]))
        return {"value": float(val), "description": "sum of:", "details": details}
    raise NotImplementedError(f"explain: unsupported query {type(q).__name__}")


def _explain_term(searcher, term: str, boost: float, weight: Weight, reader, local: int):
    from ..index.postings import decode_term
    from ..smallfloat import LENGTH_TABLE

    tid = reader.term_id(term)
    if tid is None:
        return None
    docs, tfs = decode_term(reader.enc, tid)
    i = np.searchsorted(docs, local)
    if i >= len(docs) or docs[i] != local:
        return None
    freq = float(tfs[i])
    norm_byte = int(reader.norms[local])
    sim = weight.sim_scorer(term, boost)
    score = sim.score(freq, norm_byte)
    ts = weight.term_stats[term]
    cs = weight.collection_stats
    sim_obj = getattr(weight, "similarity", None)
    sim_name = type(sim_obj).__name__ if sim_obj is not None else "BM25Similarity"
    node = {
        "value": float(score),
        "description": f"weight({term} in {local}) [{sim_name}], result of:",
        "details": [],
    }
    # the BM25 decomposition is only emitted when the weight actually
    # scores with BM25 (ADVICE r3: Classic/LMDirichlet roots were exact
    # but the details misdescribed them); other similarities keep the
    # exact root with a freq/norm leaf instead
    from .bm25 import BM25Similarity

    if sim_obj is None or isinstance(sim_obj, BM25Similarity):
        k1 = getattr(sim_obj, "k1", 1.2)
        b = getattr(sim_obj, "b", 0.75)
        dl = float(LENGTH_TABLE[norm_byte])
        # doc_count == 0 cannot match a posting, but guard avgdl anyway
        avgdl = cs.sum_total_term_freq / cs.doc_count if cs.doc_count else 1.0
        node["details"] = [
            {
                "value": float(np.log(1 + (cs.doc_count - ts.doc_freq + 0.5) / (ts.doc_freq + 0.5))),
                "description": f"idf, computed as ln(1 + (N - n + 0.5) / (n + 0.5)) with n={ts.doc_freq}, N={cs.doc_count}",
                "details": [],
            },
            {
                "value": freq / (freq + k1 * (1 - b + b * dl / avgdl)),
                "description": f"tf, computed as freq / (freq + k1 * (1 - b + b * dl / avgdl)) with freq={freq}, k1={k1}, b={b}, dl={dl}, avgdl={avgdl}",
                "details": [],
            },
            {"value": float(boost), "description": "boost", "details": []},
        ]
    else:
        node["details"] = [
            {"value": freq, "description": f"freq={freq}", "details": []},
            {"value": float(norm_byte), "description": f"norm_byte={norm_byte}", "details": []},
            {"value": float(boost), "description": "boost", "details": []},
        ]
    return node


def explain(searcher: "IndexSearcher", query, doc: int) -> dict:
    """IndexSearcher.explain analogue (search/IndexSearcher.java explain ->
    Weight.explain): a nested Explanation dict {value, description,
    details} whose root value is EXACTLY the float32 score search() gives
    this doc; non-matching docs explain as value 0 / 'no matching term'.
    Supported: Term / Boost / ConstantScore / Boolean trees (the scoring
    clauses the BM25 explanation decomposes)."""
    reader, local = _find_reader(searcher, doc)
    weight = searcher.make_weight(query)
    node = _explain_node(searcher, query, weight, reader, local)
    if node is None:
        return {"value": 0.0, "description": "no matching term", "details": []}
    return node


IndexSearcher.explain = (
    lambda self, query, doc: explain(self, query, doc)
)


def open_if_changed(searcher: IndexSearcher) -> IndexSearcher | None:
    """NRT refresh (reference index/StandardDirectoryReader.java
    openIfChanged): None when the latest manifest generation equals the
    searcher's; otherwise a NEW IndexSearcher against the latest commit
    that REUSES the old searcher's SegmentReader objects (mmaps, decode
    caches, query caches) for every segment whose (dir, livedocs) pair is
    unchanged.  A segment whose live-docs moved to a new generation gets a
    SHALLOW reader copy sharing the immutable arrays but carrying its own
    fresh live mask — the old searcher keeps serving its point-in-time
    view (reader-sharing semantics of the reference's SegmentReader
    liveDocs wrap)."""
    import copy

    from ..index.manifest import latest_generation

    gen = latest_generation(searcher.index_dir)
    if gen is None or gen == searcher.generation:
        return None
    reuse: dict = {}
    by_dir: dict = {}
    for r, seg in zip(searcher.readers, searcher.manifest["segments"]):
        reuse[(seg["dir"], seg.get("livedocs"))] = r
        by_dir[seg["dir"]] = r
    new_man = read_manifest(searcher.index_dir, gen)
    for seg in new_man["segments"]:
        key = (seg["dir"], seg.get("livedocs"))
        if key not in reuse and seg["dir"] in by_dir:
            clone = copy.copy(by_dir[seg["dir"]])
            clone.live = store.np_load(seg["livedocs"]) if seg.get("livedocs") else None
            reuse[key] = clone
    return IndexSearcher(
        searcher.index_dir,
        generation=gen,
        mmap=searcher.mmap,
        similarity=searcher.similarity,
        _reuse=reuse,
    )


IndexSearcher.open_if_changed = open_if_changed


class SearcherLifetimeManager:
    """Point-in-time searcher leasing (reference search/
    SearcherLifetimeManager.java): ``record(searcher)`` returns a token —
    the reader VERSION, here the manifest generation (:146) — that
    ``acquire`` later resolves to the SAME point-in-time searcher so a
    user's follow-on page (searchAfter) sees exactly the hits of their
    first page even while the index keeps committing; ``prune(max_age)``
    drops trackers whose age exceeds the cutoff (PruneByAge semantics,
    :94-109 record-time ordering).

    Beyond the reference's in-RAM reader refcounts, recording PINS the
    generation through SnapshotDeletionPolicy (snapshots.json) so
    ``prune_generations`` cannot delete the commit point's artifacts
    while a lease is live — on shared storage the old files, not just
    the old reader object, must survive.  The clock is injectable (the
    TimeLimitingCollector testing seam)."""

    def __init__(self, clock=None):
        import time as _time

        self._clock = clock if clock is not None else _time.monotonic
        self._trackers: dict[int, dict] = {}  # version -> {searcher, t}

    def record(self, searcher: IndexSearcher) -> int:
        """Token for the searcher's commit point; idempotent per version
        (the reference's putIfAbsent double-check, :147-158)."""
        from ..index.deletion_policy import snapshot

        version = searcher.generation
        tr = self._trackers.get(version)
        if tr is None:
            snapshot(searcher.index_dir, version)
            self._trackers[version] = {
                "searcher": searcher,
                "t": self._clock(),
            }
        elif tr["searcher"] is not searcher:
            # same version recorded through a different instance: keep
            # the first (reference records per-version trackers)
            pass
        return version

    def acquire(self, token: int) -> IndexSearcher | None:
        """The recorded searcher, or None when pruned (the caller should
        tell the user their session timed out, reference javadoc :62-66)."""
        tr = self._trackers.get(token)
        return tr["searcher"] if tr is not None else None

    def prune(self, max_age_sec: float) -> list[int]:
        """Drop every tracker older than ``max_age_sec`` and release its
        snapshot pin; returns the pruned tokens."""
        from ..index.deletion_policy import release_snapshot

        now = self._clock()
        pruned = []
        for version, tr in sorted(self._trackers.items()):
            if now - tr["t"] > max_age_sec:
                release_snapshot(tr["searcher"].index_dir, version)
                pruned.append(version)
        for v in pruned:
            del self._trackers[v]
        return pruned
