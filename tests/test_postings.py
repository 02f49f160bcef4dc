"""Postings codec round-trip + advance + impacts properties (FIXTURES F5;
reference BasePostingsFormatTestCase pattern)."""

import numpy as np
import pytest

from lucene_ray.index import postings as P
from lucene_ray.index.segment import SegmentReader, build_segment
from lucene_ray.search.scorers import NO_MORE_DOCS, PostingsCursor


def make_postings(rng, n_terms, max_doc, df_choices):
    rows_t, rows_d, rows_f = [], [], []
    for t in range(n_terms):
        df = min(int(df_choices[t % len(df_choices)]), max_doc)
        docs = np.sort(rng.choice(max_doc, size=df, replace=False))
        tfs = rng.integers(1, 2**17, size=df)
        if t % 5 == 0:
            tfs[:] = 1  # all-ones freq path
        if t % 7 == 0 and df > 3:
            tfs[df // 2] = 2**17 + 5  # outlier freq
        rows_t.append(np.full(df, t))
        rows_d.append(docs)
        rows_f.append(tfs)
    return (
        np.concatenate(rows_t),
        np.concatenate(rows_d),
        np.concatenate(rows_f),
    )


@pytest.fixture(scope="module")
def encoded():
    rng = np.random.default_rng(1234)
    max_doc = 20000
    df_choices = [1, 2, 255, 256, 257, 300, 8191, 8192, 8193, 15000]
    tid, did, tf = make_postings(rng, 40, max_doc, df_choices)
    norms = rng.integers(1, 255, size=max_doc).astype(np.uint8)
    enc = P.encode_postings(tid, did, tf, norms, 40)
    return enc, tid, did, tf, norms


def test_roundtrip_all_terms(encoded):
    enc, tid, did, tf, _ = encoded
    for t in range(40):
        mask = tid == t
        d, f = P.decode_term(enc, t)
        assert np.array_equal(d, did[mask])
        assert np.array_equal(f, tf[mask])
        assert enc.doc_freq[t] == mask.sum()
        assert enc.total_term_freq[t] == tf[mask].sum()


def test_dense_block_widths(encoded):
    # dense consecutive docids pack at width 0 (delta-1 == 0)
    tid = np.zeros(512, dtype=np.int64)
    did = np.arange(512)
    tf = np.ones(512, dtype=np.int64)
    norms = np.full(512, 30, dtype=np.uint8)
    enc = P.encode_postings(tid, did, tf, norms, 1)
    assert enc.block_doc_bits.tolist() == [0, 0]
    assert enc.block_freq_bits.tolist() == [0, 0]
    assert enc.packed_docs.nbytes == 0
    d, f = P.decode_term(enc, 0)
    assert np.array_equal(d, did) and np.array_equal(f, tf)


def test_pack_unpack_bits():
    rng = np.random.default_rng(0)
    for w in [0, 1, 3, 7, 8, 13, 17, 31]:
        n = 256
        vals = rng.integers(0, 2**w if w else 1, size=n)
        buf = P.pack_bits(vals, w)
        assert len(buf) == (n * w + 7) // 8
        out = P.unpack_bits(buf, n, w)
        assert np.array_equal(out, vals)


def _cursor_for(enc, norms, tid_):
    class FakeReader:
        pass

    r = FakeReader()
    r.enc = enc
    r.norms = norms
    return PostingsCursor(r, tid_)


def test_advance_equals_linear_scan(encoded):
    enc, tid, did, tf, norms = encoded
    rng = np.random.default_rng(99)
    for t in [0, 1, 3, 6, 7, 8, 9, 20, 39]:
        mask = tid == t
        docs = did[mask]
        freqs = tf[mask]
        targets = np.sort(rng.integers(0, 20100, size=200))
        cur = _cursor_for(enc, norms, t)
        for target in targets:
            got = cur.advance(int(target))
            idx = np.searchsorted(docs, target)
            expect = int(docs[idx]) if idx < len(docs) else NO_MORE_DOCS
            assert got == expect, (t, target)
            if got != NO_MORE_DOCS:
                assert cur.freq == freqs[idx]
            if got == NO_MORE_DOCS:
                break


def test_next_doc_iteration(encoded):
    enc, tid, did, tf, norms = encoded
    for t in [0, 5, 8, 39]:
        mask = tid == t
        cur = _cursor_for(enc, norms, t)
        seen_d, seen_f = [], []
        d = cur.next_doc()
        while d != NO_MORE_DOCS:
            seen_d.append(d)
            seen_f.append(cur.freq)
            d = cur.next_doc()
        assert np.array_equal(seen_d, did[mask])
        assert np.array_equal(seen_f, tf[mask])


def test_impacts_are_upper_bounds(encoded):
    """Every block's true postings must be dominated by its impact skyline
    (pruning legality, SURVEY §7.5 known-hard list)."""
    enc, tid, did, tf, norms = encoded
    from lucene_ray.search.bm25 import BM25Similarity, CollectionStatistics, TermStatistics

    sim = BM25Similarity()
    cs = CollectionStatistics(20000, 20000, 10**7, 10**6)
    for t in range(0, 40, 3):
        if enc.singleton_doc[t] >= 0 or enc.doc_freq[t] == 0:
            continue
        scorer = sim.scorer(1.0, cs, TermStatistics("x", int(enc.doc_freq[t]), 1))
        bs, bc = int(enc.block_start[t]), int(enc.block_count[t])
        prev = -1
        for b in range(bs, bs + bc):
            d, f = P.decode_block(enc, b, prev)
            prev = int(d[-1])
            true_max = scorer.score_bulk(f, norms[d]).max()
            s, c = int(enc.block_imp_start[b]), int(enc.block_imp_count[b])
            imp_max = scorer.score_bulk(
                enc.imp_freq[s : s + c].astype(np.int64), enc.imp_norm[s : s + c]
            ).max()
            assert imp_max >= true_max


def test_segment_file_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    tid, did, tf = make_postings(rng, 10, 1000, [1, 5, 300])
    order = np.lexsort((did, tid))
    terms_str = np.array([f"term{int(t):03d}" for t in tid], dtype=object)
    norms = rng.integers(1, 200, size=1000).astype(np.uint8)
    seg_dir = str(tmp_path / "seg_000000")
    build_segment(
        terms_str, did.astype(np.int32), tf.astype(np.int32), norms, None, seg_dir,
        {"name": "seg_000000", "max_doc": 1000, "doc_base": 0, "lineage": {"signature": "x"}},
    )
    r = SegmentReader(seg_dir)
    assert r.n_terms == 10
    for t in range(10):
        name = f"term{t:03d}"
        assert r.term_id(name) == t
        df, ttf = r.term_stats(name)
        mask = tid == t
        assert df == mask.sum() and ttf == tf[mask].sum()
    assert r.term_id("nope") is None
    assert np.array_equal(np.asarray(r.norms), norms)


def test_full_for_blocks_roundtrip():
    """Multi-full-FOR-block terms exercise the batched pack path."""
    import numpy as np

    from lucene_ray.index import postings as codec

    rng = np.random.default_rng(5)
    for n_docs, space in [(1000, 4000), (2000, 3000), (300, 100000)]:
        docs = np.sort(rng.choice(space, size=n_docs, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 50, size=n_docs).astype(np.int64)
        tids = np.zeros(n_docs, dtype=np.int64)
        norms = np.full(space, 7, dtype=np.uint8)
        enc = codec.encode_postings(tids, docs, tfs, norms, 1)
        d2, f2 = codec.decode_term(enc, 0)
        np.testing.assert_array_equal(d2, docs)
        np.testing.assert_array_equal(f2, tfs)


def test_decode_all_matches_per_term(tmp_path):
    """The vectorized whole-segment decode must equal per-term decode on a
    real written segment (positions variant included)."""
    import numpy as np
    import pyarrow.parquet as pq

    from lucene_ray.corpus import generate_corpus
    from lucene_ray.index.build import build_index_local
    from lucene_ray.index.manifest import read_manifest
    from lucene_ray.index.postings import decode_all, decode_term
    from lucene_ray.index.segment import SegmentReader

    d = tmp_path / "c"
    d.mkdir()
    pq.write_table(generate_corpus(200, seed=81), str(d / "c.parquet"), row_group_size=64)
    for opts in ("docs_freqs", "positions"):
        idx = str(tmp_path / f"idx_{opts}")
        build_index_local(str(d), idx, docs_per_segment=64, index_options=opts)
        for seg in read_manifest(idx)["segments"]:
            r = SegmentReader(seg["dir"])
            tids, docs, tfs = decode_all(r.enc)
            pos = 0
            for tid in range(r.n_terms):
                dd, ff = decode_term(r.enc, tid)
                n = len(dd)
                assert np.array_equal(docs[pos : pos + n], dd)
                assert np.array_equal(tfs[pos : pos + n], ff)
                assert (tids[pos : pos + n] == tid).all()
                pos += n
            assert pos == len(tids)


def test_pfor_freq_exceptions_roundtrip():
    """Patched-FOR freq blocks: a few hot freqs per block must be patched
    as exceptions (<= 7/block, byte high parts) instead of inflating the
    whole block's width; decode paths (block + range) stay exact."""
    from lucene_ray.index.postings import (
        MAX_EXCEPTIONS,
        decode_all,
        decode_term,
        encode_postings,
    )

    rng = np.random.default_rng(31)
    n_docs = 2000
    # one term, 2000 postings: freqs mostly 1-3, ~1% hot (up to 2^14)
    docs = np.arange(n_docs, dtype=np.int64)
    tfs = rng.integers(1, 4, n_docs).astype(np.int64)
    hot = rng.choice(n_docs, size=20, replace=False)
    tfs[hot] = rng.integers(1 << 10, 1 << 14, size=20)
    tids = np.zeros(n_docs, dtype=np.int64)
    norms = np.full(n_docs, 37, dtype=np.uint8)

    enc = encode_postings(tids, docs, tfs, norms, 1)
    assert enc.block_exc_count.sum() > 0, "hot freqs must be patched"
    assert enc.block_exc_count.max() <= MAX_EXCEPTIONS
    d, f = decode_term(enc, 0)
    np.testing.assert_array_equal(d, docs)
    np.testing.assert_array_equal(f, tfs)
    t2, d2, f2 = decode_all(enc)
    np.testing.assert_array_equal(f2, tfs)

    # PFoR must beat width-of-max bytes on this distribution: the hot
    # blocks would otherwise pack ALL values at 14 bits
    exc_bytes = enc.exc_pos.nbytes + enc.exc_high.nbytes
    width_of_max_bytes = 0
    start = 0
    for bl in enc.block_len:
        w = int(np.max(tfs[start : start + bl] - 1)).bit_length()
        width_of_max_bytes += (int(bl) * w + 7) // 8
        start += bl
    assert enc.packed_freqs.nbytes + exc_bytes < width_of_max_bytes


def test_pfor_cursor_and_impacts_unaffected():
    """The scorer cursor path (decode_block) must see patched freqs."""
    from lucene_ray.index.segment import SegmentReader
    from tests.util import index_from_token_docs
    import tempfile

    rng = np.random.default_rng(33)
    docs = []
    for i in range(600):
        toks = ["common"] * int(rng.integers(1, 4))
        if i % 97 == 0:
            toks = ["common"] * 3000  # hot tf in one doc
        docs.append(toks)
    idx = tempfile.mkdtemp()
    index_from_token_docs(docs, idx)
    r = SegmentReader(idx + "/seg_000000")
    tid = r.term_id("common")
    cur = r.cursor(tid)
    total = 0
    doc = cur.advance(0)
    while doc != 2**31 - 1:
        total += cur.freq
        doc = cur.next_doc()
    assert total == sum(len(d) for d in docs)


def test_decode_range_equals_decode_all_random():
    """Property: decode_range over any [a, b) slices exactly what
    decode_all yields for those terms (the sectioned-merge contract)."""
    from hypothesis import given, settings, strategies as st

    from lucene_ray.index.postings import decode_all, decode_range, encode_postings

    rng = np.random.default_rng(77)
    n_terms = 40
    rows = []
    for t in range(n_terms):
        df = int(rng.integers(1, 60))
        docs = np.sort(rng.choice(3000, size=df, replace=False))
        for d in docs:
            rows.append((t, int(d), int(rng.integers(1, 2000))))
    rows.sort()
    tids = np.array([r[0] for r in rows], dtype=np.int64)
    docs = np.array([r[1] for r in rows], dtype=np.int64)
    tfs = np.array([r[2] for r in rows], dtype=np.int64)
    norms = rng.integers(1, 255, 3000).astype(np.uint8)
    enc = encode_postings(tids, docs, tfs, norms, n_terms)
    t_all, d_all, f_all = decode_all(enc)

    @settings(max_examples=30, deadline=None)
    @given(st.integers(0, n_terms), st.integers(0, n_terms))
    def check(a, b):
        a, b = min(a, b), max(a, b)
        tr, dr, fr = decode_range(enc, a, b)
        sel = (t_all >= a) & (t_all < b)
        np.testing.assert_array_equal(tr, t_all[sel])
        np.testing.assert_array_equal(dr, d_all[sel])
        np.testing.assert_array_equal(fr, f_all[sel])

    check()


def test_pfor_roundtrip_property():
    """Property: arbitrary positive freq streams round-trip through the
    patched-FOR encode/decode exactly."""
    from hypothesis import given, settings, strategies as st

    from lucene_ray.index.postings import decode_term, encode_postings

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(st.integers(1, 1 << 30), min_size=1, max_size=600),
        st.randoms(use_true_random=False),
    )
    def check(freqs, _r):
        n = len(freqs)
        docs = np.arange(n, dtype=np.int64)
        tfs = np.asarray(freqs, dtype=np.int64)
        tids = np.zeros(n, dtype=np.int64)
        norms = np.full(n, 17, dtype=np.uint8)
        enc = encode_postings(tids, docs, tfs, norms, 1)
        d, f = decode_term(enc, 0)
        np.testing.assert_array_equal(d, docs)
        np.testing.assert_array_equal(f, tfs)

    check()


def test_encode_with_trailing_zero_df_terms():
    """Delete-expunge merges can leave dictionary terms with NO postings,
    including at the END of the vocabulary — encode must handle them
    (regression: out-of-bounds reduceat)."""
    from lucene_ray.index.postings import decode_all, decode_term, encode_postings

    tids = np.array([1, 1, 3], dtype=np.int64)  # terms 0, 2, 4, 5 have df=0
    docs = np.array([0, 5, 2], dtype=np.int64)
    tfs = np.array([2, 1, 7], dtype=np.int64)
    norms = np.full(10, 13, dtype=np.uint8)
    enc = encode_postings(tids, docs, tfs, norms, 6)
    np.testing.assert_array_equal(enc.doc_freq, [0, 2, 0, 1, 0, 0])
    np.testing.assert_array_equal(enc.total_term_freq, [0, 3, 0, 7, 0, 0])
    d, f = decode_term(enc, 1)
    np.testing.assert_array_equal(d, [0, 5])
    d, f = decode_term(enc, 5)
    assert len(d) == 0
    t, d, f = decode_all(enc)
    np.testing.assert_array_equal(t, tids)
    # all-empty vocabulary edge
    e0 = encode_postings(np.empty(0, np.int64), np.empty(0, np.int64),
                         np.empty(0, np.int64), norms, 4)
    np.testing.assert_array_equal(e0.doc_freq, [0, 0, 0, 0])
