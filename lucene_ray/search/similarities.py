"""Pluggable similarities beyond BM25 (the SimScorer protocol seam).

- ``ClassicSimilarity``: the TF-IDF scoring of reference
  similarities/ClassicSimilarity.java + TFIDFSimilarity.java:
  idf = log((docCount+1)/(docFreq+1)) + 1, tf = sqrt(freq),
  lengthNorm = 1/sqrt(dl) over the SmallFloat-quantized length table;
  score = boost * idf * tf * lengthNorm, float32-cast like the reference.
- ``BooleanSimilarity``: score = boost for every match
  (similarities/BooleanSimilarity.java).

Both are monotone non-decreasing in freq and non-increasing in encoded
length, so the impact-skyline pruning machinery (CompetitiveImpact
skylines -> max_score) stays valid unchanged.

Use: ``IndexSearcher(idx, similarity=ClassicSimilarity())``.
"""

from __future__ import annotations

import numpy as np

from ..smallfloat import LENGTH_TABLE
from .bm25 import CollectionStatistics, TermStatistics

F32 = np.float32


class _TableScorer:
    """SimScorer over a per-norm-byte factor table: score = f32(weight *
    tf(freq) * table[norm]), evaluated in DOUBLE with one final float32
    cast (documented deviation from the reference's intermediate float
    casts — it makes the DuckDB double-expression oracle bit-exact via a
    single ::FLOAT cast)."""

    def __init__(self, weight: float, table: np.ndarray, tf_fn):
        self.weight = float(weight)
        self.table = table.astype(np.float64)
        self._tf = tf_fn

    def score(self, freq: float, norm_byte: int) -> np.float32:
        return F32(self.weight * float(self._tf(float(freq))) * self.table[norm_byte & 0xFF])

    def score_bulk(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        return (
            self.weight * self._tf(freqs.astype(np.float64)) * self.table[norm_bytes]
        ).astype(F32)

    def max_score(self, freq: float, norm_byte: int) -> np.float32:
        return self.score(freq, norm_byte)


class LegacyBM25Similarity:
    """Pre-8.0 BM25 with the (k1 + 1) numerator factor (reference
    misc/src/java/org/apache/lucene/misc/search/similarity/
    LegacyBM25Similarity.java): implemented exactly as the reference —
    delegate to BM25Similarity with boost * (k1 + 1) (float math).  The
    transform is monotone, so ranks equal plain BM25's and impact/WAND
    pruning stays valid."""

    def __init__(self, k1: float = 1.2, b: float = 0.75):
        from .bm25 import BM25Similarity

        self.k1 = np.float32(k1)
        self.delegate = BM25Similarity(k1, b)

    def scorer(self, boost, collection_stats, *term_stats):
        scaled = np.float32(np.float32(boost) * (self.k1 + np.float32(1)))
        return self.delegate.scorer(scaled, collection_stats, *term_stats)


class ClassicSimilarity:
    """TF-IDF (ClassicSimilarity.java: idf :58-62, tf :70-73;
    TFIDFSimilarity.java lengthNorm over the norm table)."""

    @staticmethod
    def idf(doc_freq: int, doc_count: int) -> float:
        return float(np.log((doc_count + 1) / float(doc_freq + 1)) + 1.0)

    def scorer(
        self,
        boost: float,
        collection_stats: CollectionStatistics,
        *term_stats: TermStatistics,
    ) -> _TableScorer:
        idf = float(
            np.sum(
                [
                    np.log((collection_stats.doc_count + 1) / float(ts.doc_freq + 1))
                    + 1.0
                    for ts in term_stats
                ]
            )
        )
        # lengthNorm[b] = 1/sqrt(quantized length); length 0 -> norm 0
        lt = LENGTH_TABLE.astype(np.float64)
        table = np.where(lt > 0, 1.0 / np.sqrt(np.maximum(lt, 1)), 0.0)
        return _TableScorer(float(boost) * float(idf), table, np.sqrt)


class BooleanSimilarity:
    """score = boost for every match (BooleanSimilarity.java)."""

    def scorer(
        self,
        boost: float,
        collection_stats: CollectionStatistics,
        *term_stats: TermStatistics,
    ) -> _TableScorer:
        table = np.ones(256, dtype=np.float64)
        return _TableScorer(float(boost), table, lambda f: np.ones_like(f, dtype=np.float64))


class _LMDirichletScorer:
    """SimScorer for LMDirichlet: score = f32(max(0, boost * (ln(1 +
    freq/(mu*p)) + ln(mu/(dl+mu))))) with dl the SmallFloat-quantized
    length — double evaluation, one final float32 cast (same documented
    deviation as _TableScorer)."""

    def __init__(self, boost: float, mu: float, p_coll: float):
        self.boost = float(boost)
        self.mu = float(mu)
        self.p = float(p_coll)
        lt = LENGTH_TABLE.astype(np.float64)
        self._len_term = np.log(self.mu / (lt + self.mu))

    def score(self, freq: float, norm_byte: int) -> np.float32:
        s = self.boost * (
            np.log1p(float(freq) / (self.mu * self.p))
            + self._len_term[norm_byte & 0xFF]
        )
        return F32(max(s, 0.0))

    def score_bulk(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        s = self.boost * (
            np.log1p(freqs.astype(np.float64) / (self.mu * self.p))
            + self._len_term[norm_bytes]
        )
        return np.maximum(s, 0.0).astype(F32)

    def max_score(self, freq: float, norm_byte: int) -> np.float32:
        return self.score(freq, norm_byte)


class LMDirichletSimilarity:
    """Bayesian smoothing with Dirichlet priors
    (similarities/LMDirichletSimilarity.java:60-72, mu default 2000;
    LMSimilarity.DefaultCollectionModel: p(t|C) = (ttf+1)/(sumTtf+1)).
    Non-decreasing in freq and non-increasing in doc length (after the
    0-clamp), so the impact-skyline pruning stays valid unchanged."""

    def __init__(self, mu: float = 2000.0):
        self.mu = float(mu)

    def scorer(
        self,
        boost: float,
        collection_stats: CollectionStatistics,
        *term_stats: TermStatistics,
    ) -> _LMDirichletScorer:
        ttf = sum(ts.total_term_freq for ts in term_stats)
        p = (ttf + 1.0) / (collection_stats.sum_total_term_freq + 1.0)
        return _LMDirichletScorer(boost, self.mu, p)


class _IndriDirichletScorer:
    """SimScorer for Indri Dirichlet smoothing: score = f32(boost *
    ln((freq + mu*p) / (dl + mu))) — a LOG-PROBABILITY, always negative
    (no 0-clamp, unlike LMDirichlet), so impact/WAND pruning whose
    min-competitive floor starts at 0 is invalid: run this similarity in
    COMPLETE mode (the SweetSpot discipline)."""

    def __init__(self, boost: float, mu: float, p_coll: float):
        self.boost = float(boost)
        self.mu = float(mu)
        self.p = float(p_coll)
        self._dl = LENGTH_TABLE.astype(np.float64)

    def score(self, freq: float, norm_byte: int) -> np.float32:
        s = self.boost * np.log(
            (float(freq) + self.mu * self.p)
            / (self._dl[norm_byte & 0xFF] + self.mu)
        )
        return F32(s)

    def score_bulk(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        s = self.boost * np.log(
            (freqs.astype(np.float64) + self.mu * self.p)
            / (self._dl[norm_bytes] + self.mu)
        )
        return s.astype(F32)

    def max_score(self, freq: float, norm_byte: int) -> np.float32:
        return self.score(freq, norm_byte)


class IndriDirichletSimilarity:
    """Indri's Dirichlet smoothing (reference
    similarities/IndriDirichletSimilarity.java, mu default 2000;
    IndriCollectionModel: p(t|C) = ttf / numberOfFieldTokens = sumTtf).
    Scores are log-probabilities (NEGATIVE) — use score_mode=COMPLETE."""

    def __init__(self, mu: float = 2000.0):
        self.mu = float(mu)

    def scorer(
        self,
        boost: float,
        collection_stats: CollectionStatistics,
        *term_stats: TermStatistics,
    ) -> _IndriDirichletScorer:
        ttf = sum(ts.total_term_freq for ts in term_stats)
        # reference IndriCollectionModel.computeProbability: raw
        # ttf / numberOfFieldTokens with no smoothing. An empty collection
        # (sum_total_term_freq == 0) has no postings, so the scorer is never
        # invoked with freq > 0 — p = 0 keeps construction from raising.
        denom = float(collection_stats.sum_total_term_freq)
        p = ttf / denom if denom > 0 else 0.0
        return _IndriDirichletScorer(boost, self.mu, p)


class _LMJelinekMercerScorer:
    """SimScorer for Jelinek-Mercer: score = f32(max(0, boost * ln(1 +
    ((1-lambda) * freq / dl) / (lambda * p)))) with dl the SmallFloat-
    quantized length — double evaluation, one final float32 cast (same
    documented deviation as _TableScorer)."""

    def __init__(self, boost: float, lam: float, p_coll: float):
        self.boost = float(boost)
        self.lam = float(lam)
        self.p = float(p_coll)
        lt = LENGTH_TABLE.astype(np.float64)
        # freq > 0 implies the doc has >=1 surviving token, so dl >= 1
        self._inv_dl = 1.0 / np.maximum(lt, 1.0)

    def score(self, freq: float, norm_byte: int) -> np.float32:
        s = self.boost * np.log1p(
            (1.0 - self.lam)
            * float(freq)
            * self._inv_dl[norm_byte & 0xFF]
            / (self.lam * self.p)
        )
        return F32(max(s, 0.0))

    def score_bulk(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        s = self.boost * np.log1p(
            (1.0 - self.lam)
            * freqs.astype(np.float64)
            * self._inv_dl[norm_bytes]
            / (self.lam * self.p)
        )
        return np.maximum(s, 0.0).astype(F32)

    def max_score(self, freq: float, norm_byte: int) -> np.float32:
        return self.score(freq, norm_byte)


class SweetSpotSimilarity(ClassicSimilarity):
    """Plateau length norm + baseline tf over the Classic idf (reference
    misc/SweetSpotSimilarity.java:107-149):

        lengthNorm(L) = 1 / sqrt(steepness * (|L-min| + |L-max|
                                              - (max-min)) + 1)
        baselineTf(f) = 0 if f == 0; tf_base if f <= tf_min;
                        else sqrt(f + tf_base^2 - tf_min)

    evaluated over the SmallFloat-quantized length (0 for empty docs,
    like ClassicSimilarity).  The plateau makes the norm NON-monotone in
    document length, so this similarity must be searched with
    score_mode='COMPLETE' — the impact-skyline pruning's
    (freq up, length down) domination order does not hold for it."""

    def __init__(
        self,
        ln_min: int = 100,
        ln_max: int = 400,
        steepness: float = 0.5,
        tf_base: float = 1.5,
        tf_min: float = 2.0,
        hyperbolic_tf: bool = False,
        tf_hyper_min: float = 0.0,
        tf_hyper_max: float = 2.0,
        tf_hyper_base: float = 1.3,
        tf_hyper_xoffset: float = 10.0,
    ):
        if not (1 <= ln_min <= ln_max) or steepness <= 0:
            raise ValueError("need 1 <= ln_min <= ln_max and steepness > 0")
        self.ln_min = int(ln_min)
        self.ln_max = int(ln_max)
        self.steepness = float(steepness)
        self.tf_base = float(tf_base)
        self.tf_min = float(tf_min)
        self.hyperbolic_tf = bool(hyperbolic_tf)
        self.tf_hyper = (
            float(tf_hyper_min),
            float(tf_hyper_max),
            float(tf_hyper_base),
            float(tf_hyper_xoffset),
        )

    def scorer(
        self,
        boost: float,
        collection_stats: CollectionStatistics,
        *term_stats: TermStatistics,
    ) -> _TableScorer:
        idf = float(
            np.sum(
                [
                    np.log((collection_stats.doc_count + 1) / float(ts.doc_freq + 1))
                    + 1.0
                    for ts in term_stats
                ]
            )
        )
        lt = LENGTH_TABLE.astype(np.float64)
        norm = 1.0 / np.sqrt(
            self.steepness
            * (
                np.abs(lt - self.ln_min)
                + np.abs(lt - self.ln_max)
                - (self.ln_max - self.ln_min)
            )
            + 1.0
        )
        table = np.where(lt > 0, norm, 0.0)
        if self.hyperbolic_tf:
            # hyperbolicTf (SweetSpotSimilarity.java:158-176): a tanh-in-
            # base-b ramp from min to a hard max around xoffset
            h_min, h_max, h_base, h_xoff = self.tf_hyper

            def tf_fn(f):
                f = np.asarray(f, np.float64)
                x = f - h_xoff
                up, dn = np.power(h_base, x), np.power(h_base, -x)
                val = h_min + (h_max - h_min) / 2.0 * ((up - dn) / (up + dn) + 1.0)
                val = np.where(np.isnan(val), h_max, val)
                return np.where(f <= 0.0, 0.0, val)

        else:
            base, mn = self.tf_base, self.tf_min

            def tf_fn(f):
                f = np.asarray(f, np.float64)
                return np.where(
                    f <= 0.0,
                    0.0,
                    np.where(
                        f <= mn, base, np.sqrt(np.maximum(f + base * base - mn, 0.0))
                    ),
                )

        return _TableScorer(float(boost) * idf, table, tf_fn)


class _FreqNormScorer:
    """SimScorer for the freq×per-norm-byte-table families (DFR / IB /
    Axiomatic below): score = f32(max(0, fn(freq, table[norm]))) evaluated
    in DOUBLE with one final float32 cast (same documented deviation as
    _TableScorer)."""

    def __init__(self, fn, table: np.ndarray):
        self._fn = fn
        self._table = table.astype(np.float64)

    def score(self, freq: float, norm_byte: int) -> np.float32:
        return F32(max(float(self._fn(np.float64(freq), self._table[norm_byte & 0xFF])), 0.0))

    def score_bulk(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        s = self._fn(freqs.astype(np.float64), self._table[norm_bytes])
        return np.maximum(s, 0.0).astype(F32)

    def max_score(self, freq: float, norm_byte: int) -> np.float32:
        return self.score(freq, norm_byte)


def _quantized_dl() -> np.ndarray:
    """SmallFloat-quantized doc length per norm byte, floored at 1 (freq
    > 0 implies >= 1 surviving token)."""
    return np.maximum(LENGTH_TABLE.astype(np.float64), 1.0)


class DFRSimilarity:
    """Divergence-from-randomness (reference similarities/
    DFRSimilarity.java; framework Amati & van Rijsbergen 2002), composed
    from the FULL reference component set:

    - basic models (``BasicModel{G,IF,In,Ine}.java``), evaluated in the
      reference's after-effect-fused rewrites (non-decreasing in tfn):
        in : log2((N+1)/(df+0.5)) · ae1p · (1 - 1/(1+tfn))
        if : log2(1 + (N+1)/(ttf+0.5)) · ae1p · (1 - 1/(1+tfn))
        ine: log2((N+1)/(ne+0.5)) · ae1p · (1 - 1/(1+tfn)),
             ne = N·(1 - ((N-1)/N)^ttf)
        g  : (B - (B-A)/(1+tfn)) · ae1p,
             λ = F/(N+F), F = ttf+1, A = log2(λ+1), B = log2((1+λ)/λ)
    - after-effects (``AfterEffect{L,B}.java`` as scoreTimes1pTfn):
        l: ae1p = 1;   b: ae1p = (F+1)/n with F = ttf+1, n = df+1
    - normalizations (``Normalization{H1,H2,H3,Z}.java`` + none):
        h1: tf·c·avgdl/dl        h2: tf·log2(1 + c·avgdl/dl)
        h3: (tf + mu·(ttf+1)/(sumTtf+1)) / (dl + mu) · mu
        z : tf·(avgdl/dl)^z      none: tf

    dl is the SmallFloat-quantized length (floored at 1), avgdl =
    sumTtf/docCount in double.  Every combination is increasing in freq
    and non-increasing in dl, so impact-skyline pruning stays valid.  The
    default I(n)L2 combination keeps the original closed form
    (w·tfn/(1+tfn)) bit-for-bit."""

    def __init__(
        self,
        basic_model: str = "in",
        after_effect: str = "l",
        normalization: str = "h2",
        c: float = 1.0,
        mu: float = 800.0,
        z: float = 0.30,
    ):
        if c <= 0:
            raise ValueError("c must be > 0")
        if basic_model not in ("g", "if", "in", "ine"):
            raise ValueError(f"unknown basic model: {basic_model}")
        if after_effect not in ("l", "b"):
            raise ValueError(f"unknown after effect: {after_effect}")
        if normalization not in ("h1", "h2", "h3", "z", "none"):
            raise ValueError(f"unknown normalization: {normalization}")
        self.basic_model = basic_model
        self.after_effect = after_effect
        self.normalization = normalization
        self.c = float(c)
        self.mu = float(mu)
        self.z = float(z)

    def _tfn(self, freqs, dl, ttf: float, avgdl: float, sum_ttf: float):
        nm = self.normalization
        if nm == "h1":
            return freqs * self.c * (avgdl / dl)
        if nm == "h2":
            return freqs * np.log2(1.0 + self.c * avgdl / dl)
        if nm == "h3":
            return (
                (freqs + self.mu * ((ttf + 1.0) / (sum_ttf + 1.0)))
                / (dl + self.mu)
                * self.mu
            )
        if nm == "z":
            return freqs * (avgdl / dl) ** self.z
        return freqs + 0.0 * dl  # none (broadcast-shaped)

    def scorer(
        self,
        boost: float,
        collection_stats: CollectionStatistics,
        *term_stats: TermStatistics,
    ) -> _FreqNormScorer:
        n = collection_stats.doc_count
        sum_ttf = float(collection_stats.sum_total_term_freq)
        avgdl = sum_ttf / float(n)
        b = float(boost)
        combo = (self.basic_model, self.after_effect, self.normalization)
        if combo == ("in", "l", "h2"):
            # original I(n)L2 closed form, preserved bit-for-bit
            idf = float(
                np.sum([np.log2((n + 1) / (ts.doc_freq + 0.5)) for ts in term_stats])
            )
            w = b * idf
            table = np.log2(1.0 + self.c * avgdl / _quantized_dl())

            def fn(freqs, tbl):
                tfn = freqs * tbl
                return w * tfn / (1.0 + tfn)

            return _FreqNormScorer(fn, table)

        terms = [(float(ts.doc_freq), float(ts.total_term_freq)) for ts in term_stats]
        bm = self.basic_model

        def fn(freqs, dl):
            total = np.zeros_like(np.asarray(freqs, np.float64) * dl)
            for df, ttf in terms:
                tfn = self._tfn(np.asarray(freqs, np.float64), dl, ttf, avgdl, sum_ttf)
                ae1p = 1.0 if self.after_effect == "l" else (ttf + 2.0) / (df + 1.0)
                if bm == "in":
                    a = np.log2((n + 1) / (df + 0.5))
                    s = a * ae1p * (1.0 - 1.0 / (1.0 + tfn))
                elif bm == "if":
                    a = np.log2(1.0 + (n + 1) / (ttf + 0.5))
                    s = a * ae1p * (1.0 - 1.0 / (1.0 + tfn))
                elif bm == "ine":
                    ne = n * (1.0 - ((n - 1.0) / n) ** ttf)
                    a = np.log2((n + 1) / (ne + 0.5))
                    s = a * ae1p * (1.0 - 1.0 / (1.0 + tfn))
                else:  # g
                    f_ = ttf + 1.0
                    lam = f_ / (n + f_)
                    a = np.log2(lam + 1.0)
                    bb = np.log2((1.0 + lam) / lam)
                    s = (bb - (bb - a) / (1.0 + tfn)) * ae1p
                total = total + s
            return b * total

        return _FreqNormScorer(fn, _quantized_dl())


class IBSimilarity:
    """Information-based models (reference similarities/IBSimilarity.java;
    Clinchant & Gaussier 2010), composed from the reference component set:

    - distributions (``Distribution{LL,SPL}.java``):
        ll : -ln(λ / (tfn + λ))
        spl: -ln((λ^q - λ) / (1 - λ)), q = 1 - 1/(tfn + 1)
             (λ nudged off 1, λ^q nudged off λ — the reference's
             floating-point guards)
    - lambdas (``Lambda{DF,TTF}.java``, computed in FLOAT like the
      reference): df: (df+1)/(N+1);  ttf: (ttf+1)/(N+1)
    - normalizations: same h1/h2/h3/z/none set as DFRSimilarity (c=1
      default).

    Increasing in freq, non-increasing in dl — pruning-safe.  The default
    LL/DF/H2 combination keeps the original ``log1p`` closed form
    bit-for-bit (ln(1 + tfn/λ) == -ln(λ/(tfn+λ)) analytically)."""

    def __init__(
        self,
        distribution: str = "ll",
        lambda_: str = "df",
        normalization: str = "h2",
        c: float = 1.0,
        mu: float = 800.0,
        z: float = 0.30,
    ):
        if distribution not in ("ll", "spl"):
            raise ValueError(f"unknown distribution: {distribution}")
        if lambda_ not in ("df", "ttf"):
            raise ValueError(f"unknown lambda: {lambda_}")
        if normalization not in ("h1", "h2", "h3", "z", "none"):
            raise ValueError(f"unknown normalization: {normalization}")
        self.distribution = distribution
        self.lambda_ = lambda_
        self.normalization = normalization
        self.c = float(c)
        self.mu = float(mu)
        self.z = float(z)

    def scorer(
        self,
        boost: float,
        collection_stats: CollectionStatistics,
        *term_stats: TermStatistics,
    ) -> _FreqNormScorer:
        n = collection_stats.doc_count
        sum_ttf = float(collection_stats.sum_total_term_freq)
        avgdl = sum_ttf / float(n)
        b = float(boost)
        combo = (self.distribution, self.lambda_, self.normalization)
        if combo == ("ll", "df", "h2") and self.c == 1.0:
            lam = float(
                np.sum([(ts.doc_freq + 1.0) / (n + 1.0) for ts in term_stats])
            )
            table = np.log2(1.0 + avgdl / _quantized_dl())

            def fn(freqs, tbl):
                return b * np.log1p(freqs * tbl / lam)

            return _FreqNormScorer(fn, table)

        dfr_norm = DFRSimilarity(
            normalization=self.normalization, c=self.c, mu=self.mu, z=self.z
        )
        terms = [(float(ts.doc_freq), float(ts.total_term_freq)) for ts in term_stats]
        dist = self.distribution

        def fn(freqs, dl):
            total = np.zeros_like(np.asarray(freqs, np.float64) * dl)
            for df, ttf in terms:
                tfn = dfr_norm._tfn(
                    np.asarray(freqs, np.float64), dl, ttf, avgdl, sum_ttf
                )
                if self.lambda_ == "df":
                    lam = np.float32((df + 1.0) / (n + 1.0))
                else:
                    lam = np.float32((ttf + 1.0) / (n + 1.0))
                lam = float(lam)
                if lam == 1.0:
                    lam = float(np.nextafter(np.float32(1.0), np.float32(0.0)))
                if dist == "ll":
                    s = -np.log(lam / (tfn + lam))
                else:  # spl
                    q = 1.0 - 1.0 / (tfn + 1.0)
                    q = np.where(q == 1.0, np.nextafter(1.0, 0.0), q)
                    pow_ = np.power(lam, q)
                    bump = np.nextafter(lam, 1.0 if lam < 1 else 0.0)
                    pow_ = np.where(pow_ == lam, bump, pow_)
                    s = -np.log((pow_ - lam) / (1.0 - lam))
                total = total + s
            return b * total

        return _FreqNormScorer(fn, _quantized_dl())


class AxiomaticF2EXP:
    """Axiomatic retrieval function F2-EXP (reference
    similarities/AxiomaticF2EXP.java over Axiomatic.java; Fang & Zhai
    2005 "An Exploration of Axiomatic Approaches to IR"):

        score = boost * ((N + 1) / df)^k
                      * freq / (freq + s + s * dl / avgdl)

    defaults s = 0.5, k = 0.35.  Increasing in freq, decreasing in dl —
    pruning-safe."""

    def __init__(self, s: float = 0.5, k: float = 0.35):
        if not (0.0 <= s <= 1.0) or not (0.0 < k <= 1.0):
            raise ValueError("need 0 <= s <= 1 and 0 < k <= 1")
        self.s = float(s)
        self.k = float(k)

    def scorer(
        self,
        boost: float,
        collection_stats: CollectionStatistics,
        *term_stats: TermStatistics,
    ) -> _FreqNormScorer:
        n = collection_stats.doc_count
        avgdl = collection_stats.sum_total_term_freq / float(n)
        idf = float(
            np.sum(
                [((n + 1.0) / ts.doc_freq) ** self.k for ts in term_stats]
            )
        )
        w = float(boost) * idf
        table = self.s + self.s * _quantized_dl() / avgdl

        def fn(freqs, tbl):
            return w * freqs / (freqs + tbl)

        return _FreqNormScorer(fn, table)


class _AxiomaticF1:
    """Shared F1-EXP / F1-LOG machinery (reference similarities/
    AxiomaticF1EXP.java + AxiomaticF1LOG.java over Axiomatic.java):

        score = boost * idf(df)
                      * (1 + ln(1 + ln(freq + 1)))          (tf)
                      * (avgdl + s) / (avgdl + dl * s)      (ln)

    with the EXP variant's idf = ((N + 1) / df)^k and the LOG variant's
    idf = ln((N + 1) / df); reference defaults s = 0.25, k = 0.35
    (Axiomatic.java no-arg constructor).  tf is increasing in freq and
    the ln component decreasing in dl — impact-skyline pruning valid."""

    def __init__(self, s: float = 0.25, k: float = 0.35):
        if not (0.0 <= s <= 1.0) or not (0.0 < k <= 1.0):
            raise ValueError("need 0 <= s <= 1 and 0 < k <= 1")
        self.s = float(s)
        self.k = float(k)

    def _idf(self, n: int, df: int) -> float:
        raise NotImplementedError

    def scorer(
        self,
        boost: float,
        collection_stats: CollectionStatistics,
        *term_stats: TermStatistics,
    ) -> _FreqNormScorer:
        n = collection_stats.doc_count
        avgdl = collection_stats.sum_total_term_freq / float(n)
        idf = float(np.sum([self._idf(n, ts.doc_freq) for ts in term_stats]))
        w = float(boost) * idf
        table = (avgdl + self.s) / (avgdl + _quantized_dl() * self.s)

        def fn(freqs, tbl):
            return w * (1.0 + np.log(1.0 + np.log(freqs + 1.0))) * tbl

        return _FreqNormScorer(fn, table)


class AxiomaticF1EXP(_AxiomaticF1):
    """F1-EXP: idf = ((N + 1) / df)^k (AxiomaticF1EXP.java)."""

    def _idf(self, n: int, df: int) -> float:
        return ((n + 1.0) / df) ** self.k


class AxiomaticF1LOG(_AxiomaticF1):
    """F1-LOG: idf = ln((N + 1) / df) (AxiomaticF1LOG.java)."""

    def _idf(self, n: int, df: int) -> float:
        return float(np.log((n + 1.0) / df))


class AxiomaticF2LOG(AxiomaticF2EXP):
    """F2-LOG (reference similarities/AxiomaticF2LOG.java): F2EXP's
    tfln component with the log idf:

        score = boost * ln((N + 1) / df)
                      * freq / (freq + s + s * dl / avgdl)

    reference default s = 0.25."""

    def __init__(self, s: float = 0.25):
        super().__init__(s=s, k=0.35)  # k unused by the log idf

    def scorer(
        self,
        boost: float,
        collection_stats: CollectionStatistics,
        *term_stats: TermStatistics,
    ) -> _FreqNormScorer:
        n = collection_stats.doc_count
        avgdl = collection_stats.sum_total_term_freq / float(n)
        idf = float(
            np.sum([np.log((n + 1.0) / ts.doc_freq) for ts in term_stats])
        )
        w = float(boost) * idf
        table = self.s + self.s * _quantized_dl() / avgdl

        def fn(freqs, tbl):
            return w * freqs / (freqs + tbl)

        return _FreqNormScorer(fn, table)


class _AxiomaticF3:
    """Shared F3-EXP / F3-LOG machinery (reference similarities/
    AxiomaticF3EXP.java + AxiomaticF3LOG.java; Axiomatic.java score()):

        score = max(0, boost * (idf(df) * (1 + ln(1 + ln(freq + 1)))
                                - gamma(dl)))
        gamma = (dl - queryLen) * s * queryLen / avgdl

    reference defaults s = 0.25, k = 0.35, queryLen = 1.  Increasing in
    freq; gamma is increasing in dl so the score is non-increasing in
    length — impact-skyline pruning and the 0-floor (Axiomatic.java
    Math.max(0, score)) both hold."""

    def __init__(self, s: float = 0.25, query_len: int = 1, k: float = 0.35):
        if not (0.0 <= s <= 1.0) or not (0.0 < k <= 1.0) or query_len < 0:
            raise ValueError("need 0 <= s <= 1, 0 < k <= 1, queryLen >= 0")
        self.s = float(s)
        self.k = float(k)
        self.query_len = int(query_len)

    def _idf(self, n: int, df: int) -> float:
        raise NotImplementedError

    def scorer(
        self,
        boost: float,
        collection_stats: CollectionStatistics,
        *term_stats: TermStatistics,
    ) -> _FreqNormScorer:
        n = collection_stats.doc_count
        avgdl = collection_stats.sum_total_term_freq / float(n)
        idf = float(np.sum([self._idf(n, ts.doc_freq) for ts in term_stats]))
        b = float(boost)
        w = b * idf
        ql = float(self.query_len)
        # boost-scaled gamma per norm byte: score = w*tf(f) - table[norm]
        table = b * ((_quantized_dl() - ql) * self.s * ql / avgdl)

        def fn(freqs, tbl):
            return w * (1.0 + np.log(1.0 + np.log(freqs + 1.0))) - tbl

        return _FreqNormScorer(fn, table)


class AxiomaticF3EXP(_AxiomaticF3):
    """F3-EXP: idf = ((N + 1) / df)^k (AxiomaticF3EXP.java)."""

    def _idf(self, n: int, df: int) -> float:
        return ((n + 1.0) / df) ** self.k


class AxiomaticF3LOG(_AxiomaticF3):
    """F3-LOG: idf = ln((N + 1) / df) (AxiomaticF3LOG.java)."""

    def _idf(self, n: int, df: int) -> float:
        return float(np.log((n + 1.0) / df))


class _SumSimScorer:
    """SimScorer summing sub-scorers (MultiSimilarity.MultiSimScorer):
    each sub-score is its own float32 value; the sum runs in double with
    one final float32 cast (this module's documented convention)."""

    def __init__(self, subs):
        self.subs = list(subs)

    def score(self, freq: float, norm_byte: int) -> np.float32:
        return F32(sum(float(s.score(freq, norm_byte)) for s in self.subs))

    def score_bulk(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        acc = np.zeros(len(freqs), np.float64)
        for s in self.subs:
            acc += s.score_bulk(freqs, norm_bytes).astype(np.float64)
        return acc.astype(F32)

    def max_score(self, freq: float, norm_byte: int) -> np.float32:
        return F32(
            sum(float(s.max_score(freq, norm_byte)) for s in self.subs)
        )


class MultiSimilarity:
    """reference misc/src/java/org/apache/lucene/misc/search/similarity/
    MultiSimilarity.java: score = sum of the sub-similarities' scores
    (each sub-scorer built with the same boost/stats).  Monotonicity in
    freq / norm is inherited from the subs, so impact pruning stays valid
    iff every sub is pruning-valid."""

    def __init__(self, sims):
        if not sims:
            raise ValueError("need at least one sub-similarity")
        self.sims = list(sims)

    def scorer(self, boost, collection_stats, *term_stats) -> _SumSimScorer:
        return _SumSimScorer(
            [s.scorer(boost, collection_stats, *term_stats) for s in self.sims]
        )


class PerFieldSimilarityWrapper:
    """reference similarities/PerFieldSimilarityWrapper.java: route each
    FIELD to its own similarity (default for unlisted fields).  Consumed
    by MultiFieldSearcher, whose per-field sub-searchers each carry their
    field's similarity (get())."""

    def __init__(self, default, per_field: dict | None = None):
        self.default = default
        self.per_field = dict(per_field or {})

    def get(self, field: str):
        return self.per_field.get(field, self.default)


class DFISimilarity:
    """Divergence From Independence (reference similarities/
    DFISimilarity.java + IndependenceStandardized / ChiSquared /
    Saturated.java; Kocabas et al. 2014):

        expected = (ttf + 1) * dl / (sumTtf + 1)
        score    = 0                              if freq <= expected
                 = boost * log2(measure + 1)      otherwise

    with measure standardized = (freq-e)/sqrt(e), saturated = (freq-e)/e,
    chisquared = (freq-e)^2/e; dl is the SmallFloat-quantized length.
    Increasing in freq, non-increasing in dl -> impact pruning valid."""

    def __init__(self, independence: str = "standardized"):
        if independence not in ("standardized", "saturated", "chisquared"):
            raise ValueError(independence)
        self.independence = independence

    def scorer(
        self,
        boost: float,
        collection_stats: CollectionStatistics,
        *term_stats: TermStatistics,
    ) -> _FreqNormScorer:
        ttf = sum(ts.total_term_freq for ts in term_stats)
        table = (ttf + 1.0) * _quantized_dl() / (
            collection_stats.sum_total_term_freq + 1.0
        )
        w = float(boost)
        kind = self.independence

        def fn(freqs, exp):
            diff = np.maximum(freqs - exp, 0.0)
            if kind == "standardized":
                m = diff / np.sqrt(exp)
            elif kind == "saturated":
                m = diff / exp
            else:  # chisquared
                m = diff * diff / exp
            return np.where(freqs > exp, w * np.log2(m + 1.0), 0.0)

        return _FreqNormScorer(fn, table)


class LMJelinekMercerSimilarity:
    """Jelinek-Mercer linear-interpolation smoothing (reference
    similarities/LMJelinekMercerSimilarity.java score():
    boost * ln(1 + ((1-lambda)*freq/docLen) / (lambda*p(t|C))), with
    LMSimilarity.DefaultCollectionModel p(t|C) = (ttf+1)/(sumTtf+1) and
    SimilarityBase's 0-clamp). Increasing in freq, non-increasing in the
    quantized length, so impact-skyline pruning stays valid unchanged."""

    def __init__(self, lam: float = 0.1):
        if not (0.0 < lam < 1.0):
            raise ValueError("lambda must be in (0, 1)")
        self.lam = float(lam)

    def scorer(
        self,
        boost: float,
        collection_stats: CollectionStatistics,
        *term_stats: TermStatistics,
    ) -> _LMJelinekMercerScorer:
        ttf = sum(ts.total_term_freq for ts in term_stats)
        p = (ttf + 1.0) / (collection_stats.sum_total_term_freq + 1.0)
        return _LMJelinekMercerScorer(boost, self.lam, p)


class RawTFSimilarity:
    """Raw term frequency as the score (reference similarities/
    RawTFSimilarity.java: score = boost * freq — no length normalization,
    no idf; useful as a building block under FunctionScore/expressions).
    Trivially increasing in freq and norm-independent, so impact pruning
    holds."""

    def __init__(self):
        pass

    def scorer(
        self,
        boost: float,
        collection_stats: CollectionStatistics,
        *term_stats: TermStatistics,
    ) -> _FreqNormScorer:
        b = float(boost)

        def fn(freqs, tbl):
            return b * np.asarray(freqs, np.float64) + 0.0 * tbl

        return _FreqNormScorer(fn, np.zeros(256))
