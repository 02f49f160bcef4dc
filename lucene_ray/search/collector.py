"""Top-k collection and merging.

- ``TopKCollector``: k-heap with lower-docID-wins tie-break and
  ``minCompetitiveScore = nextUp(top)`` once the hit count passes the
  threshold (reference search/TopScoreDocCollector.java:94-172,
  DocScoreEncoder packed-long ordering :31-41; default threshold 1000,
  IndexSearcher.java:100).
- ``merge_top_docs``: per-segment top-k merged by (score desc, segment ord
  asc, docID asc) (TopDocs.merge, TopDocs.java:35-37,112-113).
"""

from __future__ import annotations

import heapq
import math

import numpy as np

F32 = np.float32
INF_THRESHOLD = math.inf


class TopKCollector:
    """Collects (docid, float32 score) for ONE segment."""

    def __init__(self, k: int, total_hits_threshold: float = 1000):
        self.k = k
        self.threshold = total_hits_threshold
        self.total_hits = 0
        # min-heap of (score, -docid): root = weakest hit
        self.heap: list[tuple[float, int]] = []
        self.min_competitive: np.float32 = F32(0)
        self._dirty = False

    def collect(self, docid: int, score: np.float32) -> None:
        self.total_hits += 1
        item = (float(score), -docid)
        if len(self.heap) < self.k:
            heapq.heappush(self.heap, item)
            self._dirty = True
        elif item > self.heap[0]:
            heapq.heapreplace(self.heap, item)
            self._dirty = True

    def competitive_score(self) -> np.float32 | None:
        """Returns an updated minCompetitiveScore, or None if unchanged.

        Pruning is legal only once the queue is full and the total hit count
        reached the threshold; the bound excludes score ties (later docs lose
        ties within a segment anyway).
        """
        if not self._dirty:
            return None
        self._dirty = False
        if len(self.heap) == self.k and self.total_hits >= self.threshold:
            top = F32(self.heap[0][0])
            nxt = np.nextafter(top, F32(np.inf), dtype=F32)
            if nxt > self.min_competitive:
                self.min_competitive = nxt
                return nxt
        return None

    def top_docs(self) -> list[tuple[int, np.float32]]:
        """[(docid, score)] sorted by (score desc, docid asc).

        heap items are (score, -docid); docid-ascending on equal score
        means sorting the NEGATED docid descending.
        """
        items = sorted(self.heap, key=lambda t: (-t[0], -t[1]))
        return [(-neg, F32(s)) for s, neg in items]


def merge_top_docs(
    per_segment: list[list[tuple[int, np.float32]]],
    k: int,
    doc_bases: list[int] | None = None,
) -> list[tuple[int, np.float32]]:
    """Merge per-segment top-k lists -> global top-k of (global docid, score).

    ``per_segment`` must be in manifest segment order (segment ordinal is the
    tie-break, SURVEY §7.5 "query reduce" row).
    """
    rows = []
    for ord_, hits in enumerate(per_segment):
        base = doc_bases[ord_] if doc_bases else 0
        for docid, score in hits:
            rows.append((-float(score), ord_, docid, base + docid))
    rows.sort()
    return [(gdoc, F32(-negs)) for negs, _ord, _d, gdoc in rows[:k]]


RRF_K = 60  # the conventional reciprocal-rank-fusion constant


def rrf(rankings: list[list[int]], top_n: int, k: int = RRF_K) -> list[tuple[int, float]]:
    """Reciprocal rank fusion (reference core/search/TopDocs.java rrf):
    each list contributes 1/(k + rank) per doc (rank 1-based, summed in
    DOUBLE — the reference computes double to avoid float accuracy loss),
    sorted by score DESC then docid ASC (the TopDocs#merge tie-break).
    Returns the fused top_n as (doc, rrf_score)."""
    if top_n < 1 or k < 1:
        raise ValueError("topN and k must be >= 1")
    score: dict[int, float] = {}
    for ranked in rankings:
        for i, doc in enumerate(ranked):
            score[doc] = score.get(doc, 0.0) + 1.0 / (k + i + 1)
    order = sorted(score.items(), key=lambda x: (-x[1], x[0]))
    return order[:top_n]


class LargeNumHitsTopDocsCollector:
    """Reference misc/search/LargeNumHitsTopDocsCollector.java: hits
    accumulate in a plain list until requestedHitCount is reached; the
    list then converts to a HitQueue once and later hits are admitted
    only when STRICTLY above the queue top (:101 `score > pqTop.score` —
    an equal-score later doc never displaces, same tie policy as
    TopScoreDocCollector), so the common large-k case never pays
    per-hit queue maintenance.  HitQueue order: worst = lowest score,
    ties broken by HIGHER docid being worse."""

    def __init__(self, requested_hit_count: int):
        if requested_hit_count < 1:
            raise ValueError("requestedHitCount must be >= 1")
        self.requested = requested_hit_count
        self.hits: list[tuple[float, int]] | None = []  # (score, doc)
        self.heap: list[tuple[float, int]] | None = None  # (score, -doc)
        self.total_hits = 0

    def collect(self, doc: int, score: float) -> None:
        if self.heap is None:
            self.hits.append((float(score), doc))
            self.total_hits += 1
            if self.total_hits == self.requested:
                self.heap = [(s, -d) for s, d in self.hits]
                heapq.heapify(self.heap)
                self.hits = None
            return
        if score > self.heap[0][0]:
            heapq.heapreplace(self.heap, (float(score), -doc))
        self.total_hits += 1

    def collect_batch(self, docs, scores) -> None:
        for d, s in zip(docs, scores):
            self.collect(int(d), float(s))

    def top_docs(self, how_many: int) -> list[tuple[int, float]]:
        if how_many <= 0 or how_many > self.total_hits:
            raise ValueError("Incorrect number of hits requested")
        if self.heap is not None:
            # populateResults pops exactly howMany queue elements into
            # results back-to-front — when howMany < requestedHitCount
            # that is the WORST howMany kept hits, best-of-those first
            # (the reference's own behavior; normal usage passes
            # howMany == requestedHitCount where this is just the top-k)
            h = list(self.heap)
            pops = [heapq.heappop(h) for _ in range(how_many)]
            return [(-nd, s) for s, nd in reversed(pops)]
        ordered = sorted(self.hits, key=lambda x: (-x[0], x[1]))
        return [(d, s) for s, d in ordered[:how_many]]


class TotalHitCountCollector:
    """Reference search/TotalHitCountCollector.java: just counts
    matches (COMPLETE_NO_SCORES)."""

    def __init__(self):
        self.total_hits = 0

    def collect(self, doc: int, score=None) -> None:
        self.total_hits += 1


class PositiveScoresOnlyCollector:
    """Reference search/PositiveScoresOnlyCollector.java: forwards only
    docs whose score is > 0 to the wrapped collector."""

    def __init__(self, inner):
        self.inner = inner

    def collect(self, doc: int, score) -> None:
        if score > 0:
            self.inner.collect(doc, score)


class MultiCollector:
    """Reference search/MultiCollector.java: one collection pass feeds
    several collectors; a collector that raises CollectionTerminated
    drops out while the others keep collecting, and the whole pass
    terminates when none remain."""

    def __init__(self, *collectors):
        self.collectors = [c for c in collectors if c is not None]
        if not self.collectors:
            raise ValueError("at least 1 collector must not be null")

    def collect(self, doc: int, score) -> None:
        alive = []
        for c in self.collectors:
            try:
                c.collect(doc, score)
                alive.append(c)
            except CollectionTerminated:
                continue
        self.collectors = alive
        if not alive:
            raise CollectionTerminated()


class CollectionTerminated(Exception):
    """Reference search/CollectionTerminatedException.java."""


class CollectorMemoryTracker:
    """Reference misc/CollectorMemoryTracker.java: per-collector byte
    accounting with a hard limit — updateBytes raises once usage
    exceeds the limit or goes negative."""

    def __init__(self, name: str, memory_limit: int):
        self.name = name
        self.memory_limit = int(memory_limit)
        self._bytes = 0

    def update_bytes(self, n: int) -> None:
        self._bytes += int(n)
        if self._bytes > self.memory_limit:
            raise MemoryError(f"Memory limit exceeded for {self.name}")
        if self._bytes < 0:
            raise ValueError(f"Illegal Memory State for {self.name}")

    def get_bytes(self) -> int:
        return self._bytes


class MemoryAccountingBitsetCollector:
    """Reference misc/search/MemoryAccountingBitsetCollector.java: a
    match bitset over global docids whose growth is charged to a
    CollectorMemoryTracker — FixedBitSet.ensureCapacity doubling, 8
    bytes per 64-doc word, collection aborts (tracker raises) when the
    bitset would exceed the budget."""

    def __init__(self, tracker: CollectorMemoryTracker):
        self.tracker = tracker
        self.bits = np.zeros(0, dtype=bool)
        self.length = 0
        tracker.update_bytes(self._ram(0))

    @staticmethod
    def _ram(nbits: int) -> int:
        return 8 * ((nbits + 63) // 64)  # FixedBitSet long words

    def set_next_reader(self, max_doc: int) -> None:
        """Extend capacity for the next segment (doSetNextReader)."""
        self.length += int(max_doc)
        if self.length > len(self.bits):
            new_cap = max(self.length, 2 * len(self.bits))
            self.tracker.update_bytes(self._ram(new_cap) - self._ram(len(self.bits)))
            grown = np.zeros(new_cap, dtype=bool)
            grown[: len(self.bits)] = self.bits
            self.bits = grown

    def collect(self, doc: int, score=None) -> None:
        self.bits[doc] = True

    def matching_docs(self):
        return np.flatnonzero(self.bits[: self.length])


class CachingCollector:
    """Reference search/CachingCollector.java: wrap another collector,
    record every (doc, score) pair during the first collection, and
    REPLAY them later into a different collector without re-executing the
    query.  Caching aborts (isCached() goes false, memory already spent
    is released) once the recorded pairs exceed ``max_ram_mb`` — replay()
    then raises like the reference's IllegalStateException.  Scores are
    cached as float32 (what the engine's scorers emit), 12 bytes/entry
    accounting like the reference's doc+score arrays.

    Notes vs the reference: the cache is a single global (doc, score)
    stream, not segmented per reader (our searcher replays within one
    logical doc space), and ``max_ram_mb`` is *reference-parity
    accounting* — it models the reference's primitive int[]/float[]
    arrays at 12 bytes/entry, NOT the actual RSS of the backing Python
    lists (which cost ~10x more per entry).  Budgets chosen to bound real
    memory should be divided accordingly."""

    _BYTES_PER_ENTRY = 12  # int64 doc + float32 score, reference parity

    def __init__(self, inner, max_ram_mb: float = 16.0):
        self.inner = inner
        self._budget = int(max_ram_mb * 1024 * 1024) // self._BYTES_PER_ENTRY
        self._docs: list[int] | None = []
        self._scores: list[float] | None = []

    def collect(self, doc: int, score) -> None:
        self.inner.collect(doc, score)
        if self._docs is not None:
            self._docs.append(int(doc))
            self._scores.append(float(score))
            if len(self._docs) > self._budget:
                self._docs = self._scores = None  # stop caching, free RAM

    def is_cached(self) -> bool:
        return self._docs is not None

    def replay(self, other) -> None:
        if self._docs is None:
            raise ValueError(
                "cannot replay: cache was too large (reference "
                "CachingCollector.replay IllegalStateException)"
            )
        import numpy as np

        for d, s in zip(self._docs, self._scores):
            other.collect(d, np.float32(s))
