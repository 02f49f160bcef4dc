"""Per-reader filter cache — the LRUQueryCache analogue.

Reference: search/LRUQueryCache.java:1 (per-leaf cached DocIdSets, LRU
eviction) with the UsageTrackingQueryCachingPolicy cache-on-reuse rule: a
filter is only cached once it has been seen ``min_uses`` times, so one-off
queries never pay the cache-fill cost or evict hot entries.

The cache lives on the SegmentReader (lazily attached), which itself lives
inside a query actor — so repeated filters across queries hit warm entries
without re-decoding postings or re-scanning the term dictionary.  Cached
doc sets are PRE-live-docs (immutable for the segment's lifetime); the
live mask is applied by the caller at use time, so a new deletes
generation never serves stale membership.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np


class LRUQueryCache:
    def __init__(self, max_entries: int = 256, min_uses: int = 2):
        self.max_entries = max_entries
        self.min_uses = min_uses
        self._freq: dict = {}
        self._cache: OrderedDict = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get_or_compute(self, key, compute) -> np.ndarray:
        hit = self._cache.get(key)
        if hit is not None:
            self._cache.move_to_end(key)
            self.hits += 1
            return hit
        self.misses += 1
        n = self._freq.get(key, 0) + 1
        self._freq[key] = n
        docs = compute()
        if n >= self.min_uses:
            self._cache[key] = docs
            while len(self._cache) > self.max_entries:
                self._cache.popitem(last=False)
            if len(self._freq) > 64 * self.max_entries:
                # bound the usage tracker too (ring-buffer analogue of the
                # reference's UsageTrackingQueryCachingPolicy history)
                self._freq = dict(list(self._freq.items())[-self.max_entries :])
        return docs


def cached_filter_docs(reader, query, compute) -> np.ndarray:
    """Route one filter evaluation through the reader's cache.  ``compute``
    must return PRE-live sorted local docids; apply ``reader.live`` after."""
    cache = getattr(reader, "query_cache", None)
    if cache is None:
        cache = reader.query_cache = LRUQueryCache()
    return cache.get_or_compute(query, compute)
