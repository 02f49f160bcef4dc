"""Semantics tests for the queries-module operator family: SynonymQuery
(blended stats), and the grouping / function-score / join / MLT operators
added round 3.  Reference anchors in each test's docstring."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_ray.corpus import generate_corpus
from lucene_ray.index.build import build_index_local
from lucene_ray.index.postings import decode_term
from lucene_ray.index.segment import SegmentReader
from lucene_ray.search.query import SynonymQuery, TermQuery
from lucene_ray.search.searcher import IndexSearcher

F32 = np.float32


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("qmod_corpus")
    pq.write_table(generate_corpus(600, seed=33), str(d / "c.parquet"), row_group_size=100)
    out = str(tmp_path_factory.mktemp("qmod_idx"))
    build_index_local(str(d), out, docs_per_segment=150)
    return out


def _brute_synonym(searcher: IndexSearcher, terms, boosts, k):
    """Reference shape (SynonymQuery.java:205-231, :610-700): blended df =
    max over member dfs, ttf = sum; freq = sum(boost*tf); one SimScorer."""
    stats = searcher.term_statistics(set(terms))
    df = max(stats[t].doc_freq for t in terms)
    from lucene_ray.search.bm25 import BM25Similarity, TermStatistics

    blended = TermStatistics("syn", df, sum(stats[t].total_term_freq for t in terms))
    sim = BM25Similarity().scorer(1.0, searcher.collection_stats, blended)
    per_segment = []
    for reader in searcher.readers:
        freq = np.zeros(reader.max_doc, dtype=np.float64)
        for t, b in zip(terms, boosts):
            tid = reader.term_id(t)
            if tid is None:
                continue
            docs, tfs = decode_term(reader.enc, tid)
            freq[docs] += b * tfs
        cand = np.nonzero(freq)[0]
        sc = sim.score_bulk(freq[cand].astype(F32), np.asarray(reader.norms)[cand])
        order = np.lexsort((cand, -sc))[:k]
        per_segment.append([(int(cand[i]), sc[i]) for i in order])
    from lucene_ray.search.collector import merge_top_docs

    return merge_top_docs(per_segment, k, [s["doc_base"] for s in searcher.manifest["segments"]])


@pytest.mark.parametrize(
    "terms,boosts",
    [
        (("def", "import"), (1.0, 0.5)),
        (("return", "class", "func"), (1.0, 1.0, 1.0)),
        (("def", "zzz_not_a_term"), (1.0, 0.5)),
    ],
)
def test_synonym_matches_brute(idx, terms, boosts):
    searcher = IndexSearcher(idx)
    got = searcher.search(SynonymQuery(terms, boosts), 10)
    want = _brute_synonym(searcher, terms, boosts, 10)
    assert [(d, float(s)) for d, s in got] == [(d, float(s)) for d, s in want]


def test_synonym_with_dead_member_equals_term_query(idx):
    """A df=0 member must not change the blend: df=max ignores 0, ttf adds
    0, freq adds nothing (SynonymQuery.java:218 'if (ts.docFreq() > 0)')."""
    searcher = IndexSearcher(idx)
    syn = searcher.search(SynonymQuery(("def", "zzz_not_a_term")), 10)
    single = searcher.search(TermQuery("def"), 10)
    assert [(d, float(s)) for d, s in syn] == [(d, float(s)) for d, s in single]


def test_suggester_matches_brute(idx):
    """Completion = (weight DESC, term ASC) over dictionary terms under the
    prefix, weight = cross-segment doc freq (WFSTCompletionLookup +
    HighFrequencyDictionary semantics)."""
    from collections import Counter

    from lucene_ray.search.suggest import segment_completions

    searcher = IndexSearcher(idx)
    # brute: full dictionary union across segments
    weights: Counter = Counter()
    for reader in searcher.readers:
        for tid in range(reader.n_terms):
            weights[reader.term_string(tid)] += int(
                np.asarray(reader.enc.doc_freq)[tid]
            )
    for prefix in ["de", "re", "c", "zz"]:
        want = sorted(
            ((t, w) for t, w in weights.items() if t.startswith(prefix)),
            key=lambda x: (-x[1], x[0]),
        )[:10]
        got: Counter = Counter()
        for reader in searcher.readers:
            q, t, w = segment_completions(reader, [prefix])
            for term, wt in zip(t, w):
                got[term] += wt
        got_sorted = sorted(got.items(), key=lambda x: (-x[1], x[0]))[:10]
        assert got_sorted == want, prefix


def test_grouped_topk_invariants(ray_session):
    """Grouping structure: grp_rnk dense 1..N per qid, rnk dense 1..k per
    (qid, grp), and every doc really belongs to its claimed group."""
    import pyarrow.parquet as pq

    from lucene_ray.pipelines import fulltext as ft

    sf = "/root/testdata/sf0.001"
    out = ft.grouped_topk(sf).to_pandas()
    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", ft.GROUP_FIELD])
    src = dict(zip(docs["doc_id"].to_pylist(), docs[ft.GROUP_FIELD].to_pylist()))
    for qid, g in out.groupby("qid"):
        granks = sorted(g["grp_rnk"].unique())
        assert granks == list(range(1, len(granks) + 1))
        assert len(granks) <= ft.N_GROUPS
        for (_, grp), rows in g.groupby(["grp_rnk", "grp"]):
            assert sorted(rows["rnk"]) == list(range(1, len(rows) + 1))
            assert len(rows) <= ft.K_IN_GROUP
            assert all(src[d] == grp for d in rows["doc_id"])


def test_function_score_reorders_by_field(ray_session):
    """ln(1+n_chars) boosting must produce a different permutation than
    plain BM25 for at least one query (and identical doc SETS only when
    the candidate pool is k-sized)."""
    from lucene_ray.pipelines import fulltext as ft

    sf = "/root/testdata/sf0.001"
    fs = ft.function_score_topk(sf).to_pandas()
    plain = ft.bm25_topk(sf).to_pandas()
    # qid 0 is the same single term in both registries ("spark")
    a = fs[fs.qid == 0].sort_values("rnk")["doc_id"].tolist()
    b = plain[plain.qid == 0].sort_values("rnk")["doc_id"].tolist()
    assert a != b


def test_join_topk_docs_share_from_source(ray_session):
    """Every to-side hit's join value must be a value some from-match has
    (JoinUtil: the to-side query is a TermsQuery over collected values)."""
    import duckdb

    from lucene_ray.pipelines import fulltext as ft

    sf = "/root/testdata/sf0.001"
    out = ft.join_topk(sf).to_pandas()
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, {ft.JOIN_FIELD} AS v, lower(text) AS t "
        f"FROM read_parquet('{sf}/documents.parquet')"
    ).df()
    vmap = dict(zip(docs.doc_id, docs.v))
    for qid, terms in enumerate(ft.JOIN_QUERIES):
        import re

        from_vals = {
            vmap[r.doc_id]
            for r in docs.itertuples()
            if any(re.search(rf"\b{t}\b", r.t) for t in terms)
        }
        got = out[out.qid == qid]
        assert len(got) > 0
        assert all(vmap[d] in from_vals for d in got["doc_id"])


def test_term_vectors_transpose_inverted_index(tmp_path):
    """The forward index must be the exact transpose of the postings:
    gathering (tid, tf) per doc from term vectors == decoding every term's
    postings (TermVectorsReader vs PostingsEnum equivalence)."""
    import pyarrow.parquet as pq

    d = tmp_path / "tvc"
    d.mkdir()
    pq.write_table(generate_corpus(300, seed=9), str(d / "c.parquet"), row_group_size=50)
    out = str(tmp_path / "tvidx")
    build_index_local(str(d), out, docs_per_segment=100, term_vectors=True)
    from lucene_ray.index.manifest import read_manifest

    man = read_manifest(out)
    for seg in man["segments"]:
        r = SegmentReader(seg["dir"])
        assert r.has_term_vectors
        # transpose from inverted side
        from collections import defaultdict

        fwd = defaultdict(list)
        for tid in range(r.n_terms):
            docs, tfs = decode_term(r.enc, tid)
            for doc, tf in zip(docs, tfs):
                fwd[int(doc)].append((tid, int(tf)))
        for doc in range(r.max_doc):
            tids, tfs = r.term_vector(doc)
            assert list(zip(tids.tolist(), tfs.tolist())) == sorted(fwd[doc])


def test_mlt_excludes_seed_and_ranks(ray_session):
    from lucene_ray.pipelines import fulltext as ft

    out = ft.mlt_topk("/root/testdata/sf0.001").to_pandas()
    for sid, g in out.groupby("sid"):
        seed = ft.MLT_SEEDS[sid]
        assert seed not in set(g["doc_id"])
        assert sorted(g["rnk"]) == list(range(1, len(g) + 1))


def test_percolator_planted_docs(ray_session):
    """Monitor semantics on a planted corpus: phrase adjacency (not mere
    co-occurrence), AND conjunction, NOT exclusion."""
    import ray.data as rd

    from lucene_ray.ops.monitor import percolate_counts

    rows = [
        {"doc_id": 0, "text": "the customer sent a note"},      # phrase hit
        {"doc_id": 1, "text": "customer the backwards words"},  # no phrase
        {"doc_id": 2, "text": "join order join order"},         # AND hit
        {"doc_id": 3, "text": "join only no second term"},      # no AND
        {"doc_id": 4, "text": "vector stream hash"},            # NOT kills it
        {"doc_id": 5, "text": "vector alone"},                  # and_not hit? needs vector AND stream
        {"doc_id": 6, "text": "vector stream clean"},           # and_not hit
    ]
    out = percolate_counts(rd.from_items(rows)).to_pandas().set_index("qid")
    assert out.loc[1, "n_matches"] == 1 and out.loc[1, "sum_doc"] == 2
    assert out.loc[2, "n_matches"] == 1 and out.loc[2, "min_doc"] == 6
    assert out.loc[3, "n_matches"] == 1 and out.loc[3, "sum_doc"] == 0
    assert out.loc[3, "min_doc"] == 0 and out.loc[3, "max_doc"] == 0


def test_synonym_blend_differs_from_disjunction(idx):
    """Blended scoring is NOT a SHOULD disjunction: one idf on the summed
    freq vs a sum of per-term scores."""
    from lucene_ray.search.query import bool_query

    searcher = IndexSearcher(idx)
    syn = searcher.search(SynonymQuery(("def", "import")), 10)
    disj = searcher.search(
        bool_query(should=[TermQuery("def"), TermQuery("import")]), 10
    )
    assert [float(s) for _, s in syn] != [float(s) for _, s in disj]


def test_term_vectors_survive_merge_with_deletes(tmp_path):
    """Merge carry-through: tv of the merged segment must equal the tv of
    the surviving docs pre-merge, compared as TERM STRINGS (term ids are
    remapped into the merged dictionary), in merged-doc order."""
    import pyarrow.parquet as pq

    from lucene_ray.index.deletes import delete_by_query
    from lucene_ray.index.manifest import read_manifest
    from lucene_ray.index.merge import force_merge

    d = tmp_path / "tvc2"
    d.mkdir()
    pq.write_table(generate_corpus(400, seed=11), str(d / "c.parquet"), row_group_size=50)
    out = str(tmp_path / "tvidx2")
    build_index_local(str(d), out, docs_per_segment=80, term_vectors=True)

    # expected: per-doc term-string vectors of survivors, pre-merge order
    man = read_manifest(out)
    searcher = IndexSearcher(out)
    hits = searcher.search(TermQuery("package"), 10**6)
    delete_by_query(out, TermQuery("package"))
    deleted = {int(d) for d, _ in hits}
    expected = []
    for seg in read_manifest(out)["segments"]:
        r = SegmentReader(seg["dir"])
        terms = r.terms_array().to_pylist()
        for doc in range(r.max_doc):
            if seg["doc_base"] + doc in deleted:
                continue
            tids, tfs = r.term_vector(doc)
            expected.append(sorted((terms[t], int(f)) for t, f in zip(tids, tfs)))

    man2 = force_merge(out, max_segments=1)
    assert len(man2["segments"]) == 1
    r = SegmentReader(man2["segments"][0]["dir"])
    assert r.has_term_vectors
    terms = r.terms_array().to_pylist()
    assert r.max_doc == len(expected) and len(expected) < 400
    for doc in range(r.max_doc):
        tids, tfs = r.term_vector(doc)
        got = sorted((terms[t], int(f)) for t, f in zip(tids, tfs))
        assert got == expected[doc], f"doc {doc}"


def test_spell_suggest_corrects_transpositions(ray_session):
    from lucene_ray.pipelines import fulltext as ft

    out = ft.spell_suggest("/root/testdata/sf0.001").to_pandas()
    top = out[out.rnk == 1].set_index("qid")["term"].to_dict()
    expect = {0: "customer", 1: "filter", 2: "window", 3: "spark", 4: "stream"}
    for qid, term in expect.items():
        assert top.get(qid) == term, (qid, top)


def test_covering_query_semantics():
    """CoveringQuery: per-doc dynamic minimum from a stored column; brute
    parity on a hand-built corpus where n_chars % 3 controls the
    requirement."""
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.index.build import build_index_local
    from lucene_ray.search.query import CoveringQuery, TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    with tempfile.TemporaryDirectory() as td:
        # n_chars chosen so required = 1 + n_chars % 3 spans 1..3
        texts = [
            "alpha beta gamma",   # matches all 3 clauses
            "alpha beta xyz",     # matches 2
            "alpha xyz xyz",      # matches 1
            "xyz xyz xyz",        # matches 0
        ]
        n_chars = [3, 4, 5, 3]  # required: 1, 2, 3, 1
        src = f"{td}/docs.parquet"
        pq.write_table(
            pa.table(
                {
                    "doc_id": list(range(4)),
                    "content": texts,
                    "n_chars": n_chars,
                }
            ),
            src,
        )
        idx = f"{td}/idx"
        build_index_local(src, idx, meta_columns=("n_chars",))
        s = IndexSearcher(idx)
        q = CoveringQuery(
            (TermQuery("alpha"), TermQuery("beta"), TermQuery("gamma")),
            "n_chars",
            3,
        )
        hits = s.search(q, 10, total_hits_threshold=np.inf, score_mode="COMPLETE")
        got = {d for d, _ in hits}
        # doc0: 3 >= 1 ok; doc1: 2 >= 2 ok; doc2: 1 >= 3 no; doc3: 0 matches no
        assert got == {0, 1}
        # scores sum the matching clauses: doc0 (3 clauses) > doc1 (2 clauses)
        by_doc = dict(hits)
        assert by_doc[0] > by_doc[1] > 0
        # pruned == complete through the PrecomputedScorer path
        assert s.search(q, 10) == hits


def test_freetext_bigram_partials():
    """The freetext kernel counts within-doc adjacent bigrams only, filters
    to the query context + prefix, and never leaks cross-doc pairs."""
    import pyarrow as pa

    from lucene_ray.pipelines.fulltext import _freetext_partials

    batch = pa.table(
        {
            "text": [
                "the cat the car the dog",
                "cat the cow",
                "the",  # no bigram
            ]
        }
    )
    out = _freetext_partials(
        batch, [("the", "c"), ("the", ""), ("cat", "t"), ("zzz", "")]
    ).to_pandas()
    got = {
        (int(r.qid), r.term): int(r.weight) for r in out.itertuples()
    }
    # "the *": cat, car, dog, cow; with prefix c: cat 1, car 1, cow 1
    assert got[(0, "cat")] == 1 and got[(0, "car")] == 1 and got[(0, "cow")] == 1
    assert "dog" not in {t for q, t in got if q == 0}
    assert got[(1, "dog")] == 1 and got[(1, "cat")] == 1
    # doc-boundary pair ("dog","cat") must NOT count
    assert (2, "the") in got and got[(2, "the")] == 2
    assert not any(q == 3 for q, _ in got)


def test_field_exists_query():
    """FieldExistsQuery: docs with a NON-NULL stored value match at
    constant score; composes as a FILTER without touching BM25 scores."""
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.index.build import build_index_local
    from lucene_ray.search.query import FieldExistsQuery, TermQuery, bool_query
    from lucene_ray.search.searcher import IndexSearcher

    with tempfile.TemporaryDirectory() as td:
        src = f"{td}/docs.parquet"
        pq.write_table(
            pa.table(
                {
                    "doc_id": [0, 1, 2, 3],
                    "content": ["alpha beta"] * 4,
                    "tag": pa.array(["x", None, "y", None], pa.string()),
                }
            ),
            src,
        )
        idx = f"{td}/idx"
        build_index_local(src, idx, meta_columns=("tag",))
        s = IndexSearcher(idx)
        q = FieldExistsQuery("tag")
        hits = s.search(q, 10, total_hits_threshold=np.inf, score_mode="COMPLETE")
        assert {d for d, _ in hits} == {0, 2}
        assert all(np.float32(sc) == np.float32(1.0) for _, sc in hits)
        # as a FILTER clause: scores identical to the unfiltered term query
        unf = dict(
            s.search(TermQuery("alpha"), 10, total_hits_threshold=np.inf,
                     score_mode="COMPLETE")
        )
        fq = bool_query(must=[TermQuery("alpha")], filter=[FieldExistsQuery("tag")])
        fhits = s.search(fq, 10, total_hits_threshold=np.inf, score_mode="COMPLETE")
        assert {d for d, _ in fhits} == {0, 2}
        for d, sc in fhits:
            assert np.float32(sc) == np.float32(unf[d])
        assert s.count(q) == 2


def test_blended_infix_weights_reference_arithmetic():
    """BlendedInfixSuggester.java:258-271: zero weight -> 1, |w| < 10
    rescales by 10, (long)(w * coef) truncation; the rescale makes w=9
    outscore w=10 — the reference's own discontinuity."""
    import numpy as np
    from lucene_ray.pipelines.fulltext import blended_weights

    w = np.array([0, 9, 10, 100], dtype=np.int64)
    p0 = np.zeros(4, np.int64)
    p1 = np.ones(4, np.int64)
    assert blended_weights(w, p0, "linear").tolist() == [10, 90, 10, 100]
    # pos=1 linear: coef 0.9 after rescale; trunc-to-long semantics
    assert blended_weights(w, p1, "linear").tolist() == [9, 81, 9, 90]
    assert blended_weights(w, p1, "reciprocal").tolist() == [5, 45, 5, 50]
    # discontinuity: raw 9 beats raw 10 at every position/blender
    for pos in (p0, p1):
        for b in ("linear", "reciprocal"):
            got = blended_weights(w, pos, b)
            assert got[1] > got[2]


def test_blended_infix_suggest_positions(ray_session):
    """Entries whose FIRST token prefix-matches keep coef 1; second-token
    matches blend down — and ranks follow the blended score."""
    import numpy as np
    from lucene_ray.pipelines.fulltext import (
        INFIX_QUERIES, blended_infix_suggest, infix_suggest,
    )

    blended = blended_infix_suggest("/root/testdata/sf0.001", "linear").to_pandas()
    raw = infix_suggest("/root/testdata/sf0.001").to_pandas()
    raw_w = {(r.qid, r.term): r.weight for r in raw.itertuples()}
    from lucene_ray.pipelines.fulltext import blended_weights as bw

    for r in blended.itertuples():
        pref = INFIX_QUERIES[r.qid]
        pos = 0 if r.term.split(" ", 1)[0].startswith(pref) else 1
        if (r.qid, r.term) in raw_w:
            w = np.array([raw_w[(r.qid, r.term)]], np.int64)
            assert r.weight == bw(w, np.array([pos], np.int64), "linear")[0]
    # ranks strictly follow (weight DESC, term ASC) within each qid
    for _, g in blended.groupby("qid"):
        g = g.sort_values("rnk")
        keys = list(zip(-g.weight, g.term))
        assert keys == sorted(keys)


def test_rrf_reference_semantics():
    """TopDocs.rrf (core/search/TopDocs.java): contribution 1/(k+rank),
    double accumulation, score-desc then docid-asc ordering."""
    import pytest
    from lucene_ray.search.collector import rrf

    got = rrf([[10, 20, 30], [30, 10]], top_n=4, k=60)
    want = {
        10: 1 / 61 + 1 / 62,
        20: 1 / 62,
        30: 1 / 63 + 1 / 61,
    }
    assert dict(got) == pytest.approx(want, abs=0)
    # 10 and 30 have close scores: 1/61+1/62 > 1/61+1/63 -> 10 first
    assert [d for d, _ in got] == [10, 30, 20]
    # exact tie -> lower doc id first
    tie = rrf([[5], [7]], top_n=2)
    assert [d for d, _ in tie] == [5, 7]
    with pytest.raises(ValueError):
        rrf([[1]], top_n=0)
