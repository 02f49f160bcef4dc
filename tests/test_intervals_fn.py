"""fn: interval algebra semantics (queries/intervals + the flexible
parser's IntervalExpr grammar): parser shapes, minimality, gaps
accounting, desugarings, and a brute-force differential."""
import numpy as np
import pytest

from lucene_ray.search.intervals import (
    _minimal,
    eval_intervals,
    fn_terms,
    parse_fn,
)


def test_parse_shapes():
    assert parse_fn("fn:ordered(a b c)") == (
        "ordered", [("term", "a"), ("term", "b"), ("term", "c")],
    )
    assert parse_fn("fn:maxgaps(2 fn:ordered(a b))") == (
        "maxgaps", 2, ("ordered", [("term", "a"), ("term", "b")]),
    )
    assert parse_fn('fn:or("x y" z)') == (
        "or", [("phrase", [("term", "x"), ("term", "y")]), ("term", "z")],
    )
    assert parse_fn("fn:within(a 3 b)") == ("within", ("term", "a"), 3, ("term", "b"))
    assert parse_fn("fn:atLeast(2 a b c)")[0:2] == ("atleast", 2)
    assert parse_fn("fn:extend(a 1 2)") == ("extend", ("term", "a"), 1, 2)
    assert parse_fn("fn:fuzzyTerm(grup 1)") == ("fuzzy", "grup", 1)
    assert sorted(fn_terms(parse_fn("fn:before(a fn:or(b c))"))) == ["a", "b", "c"]
    for bad in ("fn:nosuch(a)", "fn:ordered(a", "fn:maxgaps(x a)"):
        with pytest.raises(ValueError):
            parse_fn(bad)


def test_minimal_is_antichain():
    arr = np.array(
        [[0, 5, 9], [1, 3, 1], [2, 3, 0], [6, 8, 2], [6, 8, 5], [2, 3, 7]],
        dtype=np.int64,
    )
    got = _minimal(arr)
    # [0,5] contains [2,3]; [1,3] contains [2,3]; dupes keep min gaps
    assert got.tolist() == [[2, 3, 0], [6, 8, 2]]


class _FakeReader:
    """Positions-only reader over token lists (one doc per row)."""

    live = None

    def __init__(self, docs):
        self.docs = docs
        vocab = sorted({t for d in docs for t in d})
        self.vocab = vocab
        self._tid = {t: i for i, t in enumerate(vocab)}

    def term_id(self, t):
        return self._tid.get(t)

    def term_string(self, tid):
        return self.vocab[tid]

    def term_id_range(self, lo, hi):
        return [
            i
            for i, t in enumerate(self.vocab)
            if lo <= t.encode() < hi
        ]

    @property
    def has_positions(self):
        return True


def _fake_eval(docs, expr):
    """Evaluate an fn expression over token-list docs via the real
    evaluator, monkeypatching the two reader accessors it uses."""
    import lucene_ray.search.intervals as iv
    import lucene_ray.search.multiterm as mt

    r = _FakeReader(docs)

    def term_pos_map(reader, t):
        tid = reader.term_id(t)
        if tid is None:
            return None
        out = {}
        for d, toks in enumerate(reader.docs):
            p = np.array([i for i, x in enumerate(toks) if x == t], np.int64)
            if len(p):
                out[d] = p
        return out or None

    orig = mt._term_pos_map
    mt._term_pos_map = term_pos_map
    try:
        return {d: a[:, :2].tolist() for d, a in iv.eval_intervals(r, parse_fn(expr)).items()}
    finally:
        mt._term_pos_map = orig


def test_ordered_minimal_and_gaps():
    docs = [["a", "x", "b", "a", "b"]]
    got = _fake_eval(docs, "fn:ordered(a b)")
    # candidates: (0,2),(0,4),(3,4); (0,4) contains both others
    assert got == {0: [[0, 2], [3, 4]]}
    # maxgaps: (0,2) has gap 1, (3,4) gap 0
    assert _fake_eval(docs, "fn:maxgaps(0 fn:ordered(a b))") == {0: [[3, 4]]}
    assert _fake_eval(docs, "fn:maxgaps(1 fn:ordered(a b))") == {
        0: [[0, 2], [3, 4]]
    }


def test_unordered_or_phrase():
    docs = [["b", "a", "c", "b"]]
    assert _fake_eval(docs, "fn:unordered(a b)") == {0: [[0, 1], [1, 3]]}
    assert _fake_eval(docs, "fn:phrase(b a)") == {0: [[0, 1]]}
    assert _fake_eval(docs, "fn:or(a c)") == {0: [[1, 1], [2, 2]]}


def test_filters_and_desugarings():
    docs = [["a", "b", "c", "d", "a"]]
    # within 1 of c: a@2±extend -> a at 1..3? a positions 0,4: none within 1
    assert _fake_eval(docs, "fn:within(a 1 c)") == {}
    assert _fake_eval(docs, "fn:within(a 2 c)") == {0: [[0, 0], [4, 4]]}
    assert _fake_eval(docs, "fn:notWithin(a 1 c)") == {0: [[0, 0], [4, 4]]}
    assert _fake_eval(docs, "fn:before(a c)") == {0: [[0, 0]]}
    assert _fake_eval(docs, "fn:after(a c)") == {0: [[4, 4]]}
    assert _fake_eval(docs, "fn:containing(fn:ordered(a d) b)") == {
        0: [[0, 3]]
    }
    assert _fake_eval(docs, "fn:notContaining(fn:ordered(a d) b)") == {}
    assert _fake_eval(docs, "fn:containedBy(b fn:ordered(a d))") == {
        0: [[1, 1]]
    }
    assert _fake_eval(docs, "fn:overlapping(fn:ordered(a b) fn:ordered(b c))") == {
        0: [[0, 1]]
    }
    assert _fake_eval(docs, "fn:nonOverlapping(a b)") == {0: [[0, 0], [4, 4]]}
    # wait: a@0 doesn't overlap b@1 (points)? overlap needs shared span
    assert _fake_eval(docs, "fn:extend(b 1 1)") == {0: [[0, 2]]}


def test_atleast_brute_differential():
    rng = np.random.default_rng(7)
    for _ in range(25):
        doc = [rng.choice(["a", "b", "c", "x"]) for _ in range(12)]
        got = _fake_eval([list(doc)], "fn:atleast(2 a b c)")
        # brute force: minimal windows covering >= 2 of the three terms
        pos = {t: [i for i, x in enumerate(doc) if x == t] for t in "abc"}
        cands = set()
        import itertools

        for t1, t2 in itertools.combinations("abc", 2):
            for p1 in pos[t1]:
                for p2 in pos[t2]:
                    cands.add((min(p1, p2), max(p1, p2)))
        mins = {
            (s, e)
            for (s, e) in cands
            if not any(
                (s2 >= s and e2 <= e and (s2, e2) != (s, e))
                for (s2, e2) in cands
            )
        }
        want = sorted(mins)
        have = [tuple(x) for x in got.get(0, [])]
        assert have == want, (doc, have, want)


def test_interval_query_through_parser_and_searcher(ray_session):
    """StandardQueryParser fn: clauses parse into IntervalQuery and score
    with the saturation function through the ordinary search path."""
    from lucene_ray.analysis.analyzers import make_analyzer
    from lucene_ray.pipelines.fulltext import ensure_index
    from lucene_ray.search.intervals import (
        SLOPPY_SCALE,
        eval_intervals,
        min_extent,
        sloppy_freq_int,
    )
    from lucene_ray.search.parser import parse_classic
    from lucene_ray.search.query import BoostQuery, IntervalQuery
    from lucene_ray.search.searcher import IndexSearcher

    a = make_analyzer("standard")
    q = parse_classic("fn:ordered(join order)^3", a)
    assert isinstance(q, BoostQuery) and isinstance(q.query, IntervalQuery)
    s = IndexSearcher(ensure_index("/root/testdata/sf0.001", index_options="positions"))
    hits = s.search(q, 5)
    assert hits
    # recompute the top hit's score by hand
    node = q.query.node
    me = min_extent(node)
    doc, score = hits[0]
    for reader, seg in zip(s.readers, s.manifest["segments"]):
        local = doc - seg["doc_base"]
        if 0 <= local < reader.max_doc:
            res = eval_intervals(reader, node)
            if local in res:
                fi = sloppy_freq_int(res[local], me)
                want = np.float32(3.0 * (1.0 - 1.0 / (1.0 + fi / SLOPPY_SCALE)))
                assert np.float32(score) == want
                break
    # an fn atom composes with booleans and field filters
    q2 = parse_classic(
        "lang:en AND fn:ordered(join order)", a, stored_fields=("lang",)
    )
    docs = [d for d, _ in s.search(q2, 20)]
    assert docs
    langs = {
        int(d): v
        for r, seg in zip(s.readers, s.manifest["segments"])
        for d, v in enumerate(r.stored_column("lang").to_pylist(), seg["doc_base"])
    }
    assert all(langs[d] == "en" for d in docs)


def _brute(doc, expr):
    """Independent set-based reference evaluator over ONE token list:
    returns the minimal-interval set as sorted (s, e) tuples."""
    import itertools

    def minimal(cands):
        return sorted(
            (s, e)
            for (s, e) in set(cands)
            if not any(
                (s2 >= s and e2 <= e and (s2, e2) != (s, e))
                for (s2, e2) in set(cands)
            )
        )

    k = expr[0]
    if k == "term":
        return [(i, i) for i, t in enumerate(doc) if t == expr[1]]
    if k == "or":
        return minimal([iv for c in expr[1] for iv in _brute(doc, c)])
    if k in ("ordered", "unordered", "phrase"):
        subs = [_brute(doc, c) for c in expr[1]]
        if any(not s for s in subs):
            return []
        cands = []
        for combo in itertools.product(*subs):
            if k == "ordered" and not all(
                combo[i + 1][0] > combo[i][1] for i in range(len(combo) - 1)
            ):
                continue
            if k == "phrase" and not all(
                combo[i + 1][0] == combo[i][1] + 1 for i in range(len(combo) - 1)
            ):
                continue
            cands.append(
                (min(c[0] for c in combo), max(c[1] for c in combo))
            )
        return minimal(cands)
    if k == "maxwidth":
        return [iv for iv in _brute(doc, expr[2]) if iv[1] - iv[0] + 1 <= expr[1]]
    if k == "containing":
        big, small = _brute(doc, expr[1]), _brute(doc, expr[2])
        return [b for b in big if any(b[0] <= s and e <= b[1] for s, e in small)]
    if k == "contained_by":
        small, big = _brute(doc, expr[1]), _brute(doc, expr[2])
        return [x for x in small if any(s <= x[0] and x[1] <= e for s, e in big)]
    raise ValueError(k)


def test_eval_intervals_random_differential():
    rng = np.random.default_rng(11)
    exprs = [
        "fn:ordered(a b)",
        "fn:ordered(a b c)",
        "fn:unordered(a c)",
        "fn:phrase(a b)",
        "fn:or(fn:phrase(a b) c)",
        "fn:maxwidth(4 fn:unordered(a b))",
        "fn:containing(fn:ordered(a c) b)",
        "fn:containedBy(b fn:unordered(a c))",
    ]
    for trial in range(40):
        doc = [rng.choice(["a", "b", "c", "x"]) for _ in range(rng.integers(3, 15))]
        for s in exprs:
            node = parse_fn(s)
            got = [tuple(iv) for iv in _fake_eval([list(doc)], s).get(0, [])]
            want = _brute(list(doc), node)
            assert got == want, (doc, s, got, want)


def test_interval_matches_respect_deletes(ray_session, tmp_path):
    """Deleted docs vanish from interval match sets and IntervalQuery
    scoring (live-doc masking in interval_matches_segment + the
    PrecomputedScorer branch)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.index.build import build_index_local
    from lucene_ray.index.deletes import delete_by_query
    from lucene_ray.search.intervals import interval_matches_segment
    from lucene_ray.search.query import IntervalQuery, TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    rows = [
        {"id": "a", "text": "alpha beta gamma"},
        {"id": "b", "text": "alpha beta delta marker"},
        {"id": "c", "text": "beta alpha nothing"},
    ]
    d = tmp_path / "c"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "c.parquet"))
    out = str(tmp_path / "idx")
    build_index_local(
        str(d), out, content_column="text", meta_columns=("id",),
        index_options="positions",
    )
    node = parse_fn("fn:ordered(alpha beta)")
    s = IndexSearcher(out)

    def matches():
        got = set()
        for r, seg in zip(s.readers, s.manifest["segments"]):
            dd, _ = interval_matches_segment(r, node)
            got.update((dd + seg["doc_base"]).tolist())
        return got

    assert matches() == {0, 1}
    assert {d_ for d_, _ in s.search(IntervalQuery(parse_fn("fn:ordered(alpha beta)")), 10)} == {0, 1}
    delete_by_query(out, TermQuery("marker"))
    s = IndexSearcher(out)
    assert matches() == {0}
    assert {d_ for d_, _ in s.search(IntervalQuery(parse_fn("fn:ordered(alpha beta)")), 10)} == {0}
