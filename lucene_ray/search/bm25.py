"""BM25 similarity, float32 bit-compatible with the reference.

Reference: lucene/core/src/java/org/apache/lucene/search/similarities/
BM25Similarity.java — idf (:102-104), avgdl (:107-109), per-norm cache
(:181-184), and the score expression ``weight - weight / (1 + freq *
normInverse)`` (:218-231) which must be evaluated in float32 in exactly this
shape for score-identity.  Defaults k1=1.2, b=0.75, discountOverlaps=true
(:97-99).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..smallfloat import LENGTH_TABLE

F32 = np.float32


@dataclass(frozen=True)
class CollectionStatistics:
    """Per-field, whole-index stats (search/CollectionStatistics.java).

    Computed as partial aggregates per segment, summed at query time
    (lucene_ray/index/stats.py).
    """

    max_doc: int
    doc_count: int
    sum_total_term_freq: int
    sum_doc_freq: int


@dataclass(frozen=True)
class TermStatistics:
    """Per-term stats summed across segments (search/TermStatistics.java)."""

    term: str
    doc_freq: int
    total_term_freq: int


class BM25Similarity:
    def __init__(self, k1: float = 1.2, b: float = 0.75, discount_overlaps: bool = True):
        self.k1 = F32(k1)
        self.b = F32(b)
        self.discount_overlaps = discount_overlaps

    @staticmethod
    def idf(doc_freq: int, doc_count: int) -> np.float32:
        # (float) Math.log(1 + (docCount - docFreq + 0.5D) / (docFreq + 0.5D))
        # -- computed in double, cast to float (BM25Similarity.java:102-104).
        # NOTE: 1 + x evaluated in double THEN log (not log1p), matching Java.
        return F32(np.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5)))

    @staticmethod
    def avg_field_length(cs: CollectionStatistics) -> np.float32:
        # (float)(sumTotalTermFreq / (double) docCount)  (:107-109)
        return F32(cs.sum_total_term_freq / float(cs.doc_count))

    def scorer(
        self,
        boost: float,
        collection_stats: CollectionStatistics,
        *term_stats: TermStatistics,
    ) -> "BM25Scorer":
        if len(term_stats) == 1:
            idf = self.idf(term_stats[0].doc_freq, collection_stats.doc_count)
        else:
            # sum the per-term float idfs in a double, cast to float (:170-177)
            idf = F32(np.sum([float(self.idf(ts.doc_freq, collection_stats.doc_count)) for ts in term_stats]))
        avgdl = self.avg_field_length(collection_stats)
        # cache[i] = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))  (:181-184)
        one = F32(1)
        cache = one / (self.k1 * ((one - self.b) + self.b * LENGTH_TABLE / avgdl))
        return BM25Scorer(F32(boost), idf, cache.astype(F32))


class BM25Scorer:
    """SimScorer: (freq, encoded norm byte) -> float32 score.

    ``score_bulk`` is the vectorized path used for whole decoded blocks
    (TermScorer.nextDocsAndScores analogue, TermScorer.java:134-167).
    """

    def __init__(self, boost: np.float32, idf: np.float32, cache: np.ndarray):
        self.boost = boost
        self.idf = idf
        self.cache = cache  # float32[256] of 1/norm factors
        self.weight = F32(boost * idf)  # (:218 weight = boost * idf)

    def score(self, freq: float, norm_byte: int) -> np.float32:
        norm_inverse = self.cache[norm_byte & 0xFF]
        w = self.weight
        return F32(w - w / (F32(1) + F32(freq) * norm_inverse))

    def score_bulk(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        norm_inverse = self.cache[norm_bytes]
        w = self.weight
        return (w - w / (F32(1) + freqs.astype(F32) * norm_inverse)).astype(F32)

    def max_score(self, freq: float, norm_byte: int) -> np.float32:
        """Upper bound for a (freq, norm) impact pair — same expression, so
        monotonicity guarantees validity (MaxScoreCache.java:74-89)."""
        return self.score(freq, norm_byte)
