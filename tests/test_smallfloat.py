"""SmallFloat + BM25 property tests (FIXTURES F6; reference
BaseSimilarityTestCase.java:256-473 monotonicity contract)."""

import numpy as np
from hypothesis import given, strategies as st

from lucene_ray.search.bm25 import BM25Similarity, CollectionStatistics, TermStatistics
from lucene_ray.smallfloat import (
    LENGTH_TABLE,
    byte4_to_int,
    int_to_byte4,
    int_to_byte4_array,
    long_to_int4,
    int4_to_long,
)


def test_byte4_roundtrip_all_bytes():
    for b in range(256):
        assert int_to_byte4(byte4_to_int(b)) == b


def test_known_values():
    # free values 0..23 are exact
    for i in range(24):
        assert int_to_byte4(i) == i and byte4_to_int(i) == i
    assert byte4_to_int(255) == 24 + int4_to_long(255 - 24)


@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_quantization_idempotent(n):
    b = int_to_byte4(n)
    d = byte4_to_int(b)
    assert d <= n
    assert int_to_byte4(d) == b
    # next representable value is > n
    if b < 255:
        assert byte4_to_int(b + 1) > n


@given(st.lists(st.integers(min_value=0, max_value=2**31 - 1), min_size=1, max_size=200))
def test_vectorized_matches_scalar(ns):
    arr = np.array(ns, dtype=np.int64)
    vec = int_to_byte4_array(arr)
    for n, b in zip(ns, vec):
        assert int_to_byte4(n) == int(b)


def test_length_table():
    assert LENGTH_TABLE.dtype == np.float32
    # Java stores the decoded int cast to float (same float32 rounding)
    assert all(LENGTH_TABLE[i] == np.float32(byte4_to_int(i)) for i in range(256))


def _scorer(df=5, dc=100, sttf=5000, k1=1.2, b=0.75, boost=1.0):
    sim = BM25Similarity(k1, b)
    cs = CollectionStatistics(dc, dc, sttf, sttf)
    return sim.scorer(boost, cs, TermStatistics("t", df, df * 3))


@given(
    st.integers(min_value=1, max_value=2**20),
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=1, max_value=99),
)
def test_bm25_properties(freq, norm, df):
    s = _scorer(df=df)
    v = float(s.score(freq, norm))
    assert np.isfinite(v) and v >= 0
    # monotonic non-decreasing in freq
    assert float(s.score(freq + 1, norm)) >= v
    # bounded by max over (huge freq, norm)
    assert v <= float(s.score(2**30, norm)) + 1e-9


def test_bm25_monotonic_in_norm():
    s = _scorer()
    # larger decoded length => lower score at same freq
    prev = None
    for nb in range(1, 256):
        v = float(s.score(10, nb))
        if prev is not None:
            assert v <= prev + 1e-9
        prev = v


def test_bm25_reference_expression_shape():
    # idf = ln(1 + (N - n + 0.5)/(n + 0.5)), float32
    idf = BM25Similarity.idf(5, 100)
    assert idf == np.float32(np.log(1.0 + (100 - 5 + 0.5) / (5 + 0.5)))
    s = _scorer(df=5, dc=100, sttf=5000, boost=2.0)
    # score = w - w/(1 + freq * 1/norm-factor), all float32
    w = np.float32(np.float32(2.0) * idf)
    cache_42 = s.cache[42]
    expected = np.float32(w - w / (np.float32(1) + np.float32(7) * cache_42))
    assert s.score(7, 42) == expected
