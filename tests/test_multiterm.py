"""Multi-term query matching unit tests (segment-level, analyzer bypassed).

Fuzzy must measure edits in CODEPOINTS (reference FuzzyQuery codepoint
automaton; DuckDB levenshtein oracle): a single substituted multi-byte
character is ONE edit, not 2-4.
"""

from __future__ import annotations

from lucene_ray.index.segment import SegmentReader
from lucene_ray.search.multiterm import _fuzzy_term_ids
from tests.util import index_from_token_docs


def _reader(tmp_path, vocab):
    idx = str(tmp_path / "idx")
    index_from_token_docs([[t] for t in vocab], idx)
    return SegmentReader(str(tmp_path / "idx" / "seg_000000"))


def test_fuzzy_codepoint_edits(tmp_path):
    vocab = sorted(["café", "cafe", "cafés", "coffee", "càfè"])
    r = _reader(tmp_path, vocab)
    terms = r.terms_array().to_pylist()

    got = {terms[t] for t in _fuzzy_term_ids(r, "café", 1)}
    # cafe: 1 codepoint substitution (2 UTF-8 byte edits — must still match)
    assert got == {"café", "cafe", "cafés"}

    got2 = {terms[t] for t in _fuzzy_term_ids(r, "café", 2)}
    assert got2 == {"café", "cafe", "cafés", "càfè"}


def test_fuzzy_ascii_distances(tmp_path):
    vocab = sorted(["merge", "merges", "marge", "purge", "emerge", "xyzzy"])
    r = _reader(tmp_path, vocab)
    terms = r.terms_array().to_pylist()
    got = {terms[t] for t in _fuzzy_term_ids(r, "merge", 1)}
    assert got == {"merge", "merges", "marge", "emerge"}
    got2 = {terms[t] for t in _fuzzy_term_ids(r, "merge", 2)}
    assert got2 == {"merge", "merges", "marge", "emerge", "purge"}


def test_fuzzy_transpositions(tmp_path):
    """Adjacent swaps are ONE edit with transpositions=True (the reference
    FuzzyQuery default): "hte"~1 -> "the"; plain Levenshtein needs 2."""
    vocab = sorted(["the", "then", "ten", "he", "tea", "eth"])
    r = _reader(tmp_path, vocab)
    terms = r.terms_array().to_pylist()
    dl1 = {terms[t] for t in _fuzzy_term_ids(r, "hte", 1, transpositions=True)}
    assert "the" in dl1
    lev1 = {terms[t] for t in _fuzzy_term_ids(r, "hte", 1, transpositions=False)}
    assert "the" not in lev1


def test_fuzzy_damerau_duckdb_differential(tmp_path):
    """Full-DL DP == DuckDB damerau_levenshtein over an ASCII stress
    vocabulary (includes the unrestricted-DL case 'ca'~'abc' = 2 where OSA
    gives 3).  ASCII only: DuckDB's distance functions are BYTE-based,
    ours codepoint-based — they agree exactly on ASCII (the testdata
    corpus), see test_fuzzy_damerau_codepoints for the multibyte pin."""
    import duckdb

    vocab = sorted(
        {
            "abc", "ca", "ac", "cba", "bac", "acb", "abcd", "acbd", "badc",
            "spark", "saprk", "spakr", "psark", "sprk", "sparkk", "park",
            "window", "wnidow", "widnow", "winodw", "windwo", "indow",
            "merge", "mrege", "emrge", "megre", "mereg",
            "a", "b", "ab", "ba", "aabb", "bbaa", "abab", "baba",
        }
    )
    r = _reader(tmp_path, vocab)
    terms = r.terms_array().to_pylist()
    con = duckdb.connect()
    for q in ("abc", "ca", "spark", "saprk", "window", "wnidow", "merge",
              "ab", "ba", "aabb"):
        for me in (1, 2):
            got = {terms[t] for t in _fuzzy_term_ids(r, q, me, transpositions=True)}
            want = {
                t for t in vocab
                if con.execute(
                    "select damerau_levenshtein(?, ?) <= ?", [t, q, me]
                ).fetchone()[0]
            }
            assert got == want, (q, me, got ^ want)
    con.close()


def _dl_ref(a: str, b: str) -> int:
    """Pure-Python full Damerau-Levenshtein (Wagner-Lowrance) reference."""
    da: dict[str, int] = {}
    m, n = len(a), len(b)
    maxd = m + n
    d = [[maxd] * (n + 2) for _ in range(m + 2)]
    for i in range(m + 1):
        d[i + 1][1] = i
    for j in range(n + 1):
        d[1][j + 1] = j
    for i in range(1, m + 1):
        db = 0
        for j in range(1, n + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[a[i - 1]] = i
    return d[m + 1][n + 1]


def test_fuzzy_damerau_codepoints(tmp_path):
    """Multibyte terms: transposing two NON-ASCII codepoints is one edit
    (codepoint DP; DuckDB would count byte edits here)."""
    vocab = sorted(["café", "caéf", "cfaé", "éafc", "cafe"])
    r = _reader(tmp_path, vocab)
    terms = r.terms_array().to_pylist()
    for me in (1, 2):
        got = {terms[t] for t in _fuzzy_term_ids(r, "café", me, transpositions=True)}
        want = {t for t in vocab if _dl_ref(t, "café") <= me}
        assert got == want, (me, got ^ want)
    assert _dl_ref("caéf", "café") == 1  # é<->f swap is ONE edit


def test_containing_and_or_proximity_brute(tmp_path):
    """Brute differential for the new interval operators: enumerate minimal
    windows naively per doc and compare counts."""
    import pyarrow.parquet as pq

    from lucene_ray.corpus import generate_corpus
    from lucene_ray.index.build import build_index_local
    from lucene_ray.index.manifest import read_manifest
    from lucene_ray.index.segment import SegmentReader
    from lucene_ray.search.multiterm import (
        containing_proximity_matches_segment,
        or_proximity_matches_segment,
    )

    d = tmp_path / "c"
    d.mkdir()
    pq.write_table(generate_corpus(60, seed=21), str(d / "c.parquet"))
    out = str(tmp_path / "idx")
    build_index_local(str(d), out, docs_per_segment=256, index_options="positions")
    seg = read_manifest(out)["segments"][0]
    r = SegmentReader(seg["dir"])

    from lucene_ray.analysis.analyzers import make_analyzer

    an = make_analyzer("standard")
    texts = pq.read_table(str(d / "c.parquet")).column("content").to_pylist()

    def minimal_windows(toks, slots):
        pos = {i: [p for p, t in enumerate(toks) if t in s] for i, s in enumerate(slots)}
        if any(not v for v in pos.values()):
            return []
        wins = []
        n = len(toks)
        for l in range(n):
            for rr in range(l, n):
                if all(any(l <= p <= rr for p in ps) for ps in pos.values()):
                    inner1 = all(any(l + 1 <= p <= rr for p in ps) for ps in pos.values())
                    inner2 = all(any(l <= p <= rr - 1 for p in ps) for ps in pos.values())
                    if not inner1 and not inner2:
                        wins.append((l, rr))
        return wins

    # containing
    terms, w, f, neg = ("def", "import"), 8, "return", False
    got_d, got_n = containing_proximity_matches_segment(r, terms, w, f, negate=neg)
    got = dict(zip(got_d.tolist(), got_n.tolist()))
    want = {}
    for doc, text in enumerate(texts):
        toks = an.tokens(text)
        wins = [
            (l, rr)
            for l, rr in minimal_windows(toks, [{t} for t in terms])
            if rr - l + 1 <= w
        ]
        c = sum(1 for l, rr in wins if any(l <= p <= rr for p, t in enumerate(toks) if t == f))
        if c:
            want[doc] = c
    assert got == want

    # or-slots
    slots = (("def", "class"), ("import",))
    got_d, got_n = or_proximity_matches_segment(r, slots, 7)
    got = dict(zip(got_d.tolist(), got_n.tolist()))
    want = {}
    for doc, text in enumerate(texts):
        toks = an.tokens(text)
        wins = [
            (l, rr)
            for l, rr in minimal_windows(toks, [set(s) for s in slots])
            if rr - l + 1 <= 7
        ]
        if wins:
            want[doc] = len(wins)
    assert got == want


def test_term_in_set_query(tmp_path):
    """TermInSetQuery: union of exact members, constant score, usable as a
    FILTER clause (never WAND-scored)."""
    import numpy as np

    from lucene_ray.search.query import TermInSetQuery, TermQuery, bool_query
    from lucene_ray.search.searcher import IndexSearcher

    docs = [
        ["alpha", "beta"],
        ["gamma"],
        ["alpha", "gamma", "delta"],
        ["beta", "delta"],
        ["alpha"],
    ]
    idx = str(tmp_path / "inset_idx")
    index_from_token_docs(docs, idx, n_segments=2)
    s = IndexSearcher(idx)
    terms = ("alpha", "gamma", "zz_not_present")
    got = {d for d, _ in s.search(TermInSetQuery(terms), k=100)}
    want = {i for i, toks in enumerate(docs) if set(toks) & {"alpha", "gamma"}}
    assert got == want
    # constant score == boost for every match
    scores = {float(sc) for _, sc in s.search(TermInSetQuery(terms), k=100)}
    assert scores == {1.0}
    # as a FILTER clause: scores come from the scoring clause only
    q = bool_query(must=[TermQuery("alpha")], filter=[TermInSetQuery(("gamma",))])
    flt = {d for d, _ in s.search(q, k=100)}
    assert flt == {
        i for i, toks in enumerate(docs) if "alpha" in toks and "gamma" in toks
    }
    base = dict(s.search(TermQuery("alpha"), k=100))
    for d, sc in s.search(q, k=100):
        assert np.float32(sc) == np.float32(base[d])


def test_lru_query_cache_filters(tmp_path):
    """LRUQueryCache analogue: a filter repeated >= min_uses times is served
    from the per-reader cache with unchanged results; live-docs masking
    stays outside the cached entry."""
    import numpy as np

    from lucene_ray.search.cache import LRUQueryCache
    from lucene_ray.search.query import PrefixQuery, TermInSetQuery
    from lucene_ray.search.searcher import IndexSearcher

    docs = [["alpha"], ["alphabet"], ["beta"], ["alpine"], ["alpha", "beta"]]
    idx = str(tmp_path / "cache_idx")
    index_from_token_docs(docs, idx)
    s = IndexSearcher(idx)
    q = PrefixQuery("alp")
    first = [(d, float(x)) for d, x in s.search(q, k=10)]
    for _ in range(3):
        again = [(d, float(x)) for d, x in s.search(q, k=10)]
        assert again == first
    cache = s.readers[0].query_cache
    assert isinstance(cache, LRUQueryCache)
    assert cache.hits >= 2  # cached after min_uses=2, hit from the 3rd on
    # live mask applied AFTER the cache: deleting a doc changes results
    # without invalidating the cached pre-live entry
    r = s.readers[0]
    r.live = np.ones(r.max_doc, dtype=bool)
    r.live[0] = False
    masked = {d for d, _ in s.search(q, k=10)}
    assert masked == {d for d, _ in enumerate(docs) if False} | {1, 3, 4} - {0}
    hits_before = cache.hits
    s.count(TermInSetQuery(("alpha", "beta")))
    s.count(TermInSetQuery(("alpha", "beta")))
    s.count(TermInSetQuery(("alpha", "beta")))
    assert cache.hits > hits_before  # count() path shares the cache


def test_fuzzy_prefix_dists(tmp_path):
    """FuzzySuggester candidate scan: the minimum Damerau distance over
    qualifying PREFIX lengths, first codepoint exact (nonFuzzyPrefix=1),
    cross-checked against a brute-force python DL over every prefix."""
    from lucene_ray.search.multiterm import fuzzy_prefix_dists

    vocab = sorted(
        ["spark", "sparks", "sort", "stream", "column", "colunms", "window",
         "apark", "s", "sp", "sprocket"]
    )
    r = _reader(tmp_path, vocab)
    terms = r.terms_array().to_pylist()

    def brute_dl(a: str, b: str) -> int:
        # unrestricted Damerau-Levenshtein (Wagner-Lowrance)
        da: dict[str, int] = {}
        maxd = len(a) + len(b)
        d = [[maxd] * (len(b) + 2) for _ in range(len(a) + 2)]
        for i in range(len(a) + 1):
            d[i + 1][1] = i
        for j in range(len(b) + 1):
            d[1][j + 1] = j
        for i in range(1, len(a) + 1):
            db = 0
            for j in range(1, len(b) + 1):
                k = da.get(b[j - 1], 0)
                l = db
                if a[i - 1] == b[j - 1]:
                    cost = 0
                    db = j
                else:
                    cost = 1
                d[i + 1][j + 1] = min(
                    d[i][j] + cost,
                    d[i + 1][j] + 1,
                    d[i][j + 1] + 1,
                    d[k][l] + (i - k - 1) + 1 + (j - l - 1),
                )
            da[a[i - 1]] = i
        return d[len(a) + 1][len(b) + 1]

    for q, e in [("sprk", 1), ("spark", 1), ("colunm", 1), ("stream", 2)]:
        ids, dists = fuzzy_prefix_dists(r, q, e, non_fuzzy_prefix=1)
        got = {terms[int(t)]: int(d) for t, d in zip(ids, dists)}
        want = {}
        for t in vocab:
            if not t or t[0] != q[0]:
                continue
            best = min(
                (brute_dl(q, t[:j]) for j in range(1, len(t) + 1)),
                default=len(q),
            )
            # the engine only probes prefix lengths within +-e of len(q),
            # which is exact because DL >= length difference
            if best <= e:
                want[t] = best
        assert got == want, (q, e, got, want)
