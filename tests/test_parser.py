"""Query-string parser + composite-clause scoring (multi-term and phrase
queries used as boolean CLAUSES through PrecomputedScorer)."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_ray.analysis.analyzers import make_analyzer
from lucene_ray.corpus import generate_corpus
from lucene_ray.index.build import build_index_local
from lucene_ray.search.parser import parse_query
from lucene_ray.search.query import (
    BooleanQuery,
    FuzzyQuery,
    PhraseQuery,
    PrefixQuery,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    bool_query,
)
from lucene_ray.search.searcher import IndexSearcher

A = make_analyzer("standard")


def test_parse_shapes():
    assert parse_query("spark", A) == TermQuery("spark")
    q = parse_query('+Spark -join "batch batch" wind* w?ndow merge~1 term~ /s.*k/ [a TO b]', A)
    assert isinstance(q, BooleanQuery)
    by_occur = {}
    for c in q.clauses:
        by_occur.setdefault(c.occur, []).append(c.query)
    assert by_occur["MUST"] == [TermQuery("spark")]  # normalized lowercase
    assert by_occur["MUST_NOT"] == [TermQuery("join")]
    shoulds = by_occur["SHOULD"]
    assert PhraseQuery(("batch", "batch")) in shoulds
    assert PrefixQuery("wind") in shoulds
    assert WildcardQuery("w?ndow") in shoulds
    assert FuzzyQuery("merge", 1) in shoulds
    assert FuzzyQuery("term", 2) in shoulds
    assert RegexpQuery("s.*k") in shoulds
    assert TermRangeQuery("a", "b") in shoulds
    assert parse_query("   ", A) is None
    assert parse_query("[a TO *]", A) == TermRangeQuery("a", None)


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("parser_corpus")
    pq.write_table(generate_corpus(300, seed=71), str(d / "c.parquet"), row_group_size=64)
    out = str(tmp_path_factory.mktemp("parser_idx"))
    build_index_local(str(d), out, docs_per_segment=64, index_options="positions")
    return out


def test_composite_clause_scoring(idx):
    s = IndexSearcher(idx)
    # phrase as MUST + prefix as SHOULD + term as MUST_NOT, via the parser
    q = parse_query('+"def return" de* -class', A)
    hits = s.search(q, 10)
    cnt = s.count(q)
    # brute check: must-phrase docs minus must_not docs
    from lucene_ray.index.manifest import read_manifest
    from lucene_ray.search.multiterm import phrase_matches_segment

    man = read_manifest(idx)
    expected = set()
    for r, seg in zip(s.readers, man["segments"]):
        ph, _ = phrase_matches_segment(r, ("def", "return"))
        tid = r.term_id("class")
        not_docs = set(r.decode_term_cached(tid)[0].tolist()) if tid is not None else set()
        expected |= {int(d) + seg["doc_base"] for d in ph if int(d) not in not_docs}
    assert cnt == len(expected)
    assert all(doc in expected for doc, _ in hits)
    # the SHOULD prefix must add score to matching docs: a doc matching the
    # prefix outscores the same-phrase-freq doc without it only via ranking;
    # at minimum scores are finite positive
    assert all(np.isfinite(float(sc)) and float(sc) > 0 for _, sc in hits)


def test_multi_term_clause_equivalence(idx):
    s = IndexSearcher(idx)
    # prefix as a FILTER clause == prefix alone intersected with match-all
    direct = s.count(PrefixQuery("de"))
    filtered = s.count(bool_query(must=[TermQuery("def")], filter=[PrefixQuery("de")]))
    term_only = s.count(TermQuery("def"))
    assert filtered <= min(direct, term_only)
    assert filtered > 0


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.text(max_size=80))
@settings(max_examples=200, deadline=None)
def test_parser_never_crashes(text):
    q = parse_query(text, A)
    assert q is None or isinstance(
        q,
        (BooleanQuery, TermQuery, PhraseQuery, PrefixQuery, WildcardQuery,
         FuzzyQuery, RegexpQuery, TermRangeQuery),
    )


# --- classic parser (queryparser/classic analogue) -----------------------

from lucene_ray.search.parser import parse_classic
from lucene_ray.search.query import BooleanClause, BoostQuery


def test_classic_shapes():
    q = parse_classic("(spark OR join) AND merge", A)
    assert q == BooleanQuery((
        BooleanClause(BooleanQuery((
            BooleanClause(TermQuery("spark"), "SHOULD"),
            BooleanClause(TermQuery("join"), "SHOULD"),
        )), "MUST"),
        BooleanClause(TermQuery("merge"), "MUST"),
    ))
    # the classic addClause quirk: OR then AND promotes the middle clause
    q = parse_classic("a OR b AND c", A)
    assert [c.occur for c in q.clauses] == ["SHOULD", "MUST", "MUST"]
    assert parse_classic("spark AND NOT join", A) == BooleanQuery((
        BooleanClause(TermQuery("spark"), "MUST"),
        BooleanClause(TermQuery("join"), "MUST_NOT"),
    ))
    assert parse_classic("spark^2", A) == BoostQuery(TermQuery("spark"), 2.0)
    assert parse_classic("{a TO b}", A) == TermRangeQuery(
        "a", "b", include_lower=False, include_upper=False
    )
    assert parse_classic("[a TO b]", A) == TermRangeQuery(
        "a", "b", include_lower=True, include_upper=True
    )
    assert parse_classic("", A) is None
    assert parse_classic("( )", A) is None
    assert parse_classic("a && b || !c", A) == parse_classic("a AND b OR NOT c", A)


def test_classic_grouped_field_scope():
    """``field:(a OR b)`` scopes every atom in the group to the field
    (classic grouped-field syntax); inner ``other:`` overrides; the
    default field inside a stored-field scope still routes to text."""
    from lucene_ray.search.query import StoredFieldFilter

    q = parse_classic("lang:(en OR fr)", A, stored_fields=("lang",))
    assert q == BooleanQuery((
        BooleanClause(StoredFieldFilter("lang", "en"), "SHOULD"),
        BooleanClause(StoredFieldFilter("lang", "fr"), "SHOULD"),
    ))
    # inner explicit field overrides the group scope
    q = parse_classic(
        "lang:(en OR site:web)", A, stored_fields=("lang", "site")
    )
    assert q == BooleanQuery((
        BooleanClause(StoredFieldFilter("lang", "en"), "SHOULD"),
        BooleanClause(StoredFieldFilter("site", "web"), "SHOULD"),
    ))
    # text:(...) group is the default field: plain term queries
    q = parse_classic("text:(spark AND join)", A, stored_fields=("lang",))
    assert q == BooleanQuery((
        BooleanClause(TermQuery("spark"), "MUST"),
        BooleanClause(TermQuery("join"), "MUST"),
    ))
    # scope survives nesting: lang:((en))
    q = parse_classic("lang:((en))", A, stored_fields=("lang",))
    assert q == StoredFieldFilter("lang", "en")
    # without stored_fields the unknown field is lenient -> text terms
    q = parse_classic("lang:(en fr)", A)
    assert q == BooleanQuery((
        BooleanClause(TermQuery("en"), "SHOULD"),
        BooleanClause(TermQuery("fr"), "SHOULD"),
    ))


def test_classic_end_to_end_equals_programmatic(idx):
    s = IndexSearcher(idx)
    parsed = parse_classic("(def OR return) AND class", A)
    manual = bool_query(
        must=[
            BooleanQuery((
                BooleanClause(TermQuery("def"), "SHOULD"),
                BooleanClause(TermQuery("return"), "SHOULD"),
            )),
            TermQuery("class"),
        ]
    )
    hp = s.search(parsed, 10)
    hm = s.search(manual, 10)
    assert [(d, float(sc)) for d, sc in hp] == [(d, float(sc)) for d, sc in hm]
    assert len(hp) > 0


def test_range_inclusivity_byte_trick(idx):
    s = IndexSearcher(idx)
    # [def TO def] matches exactly the term; {def TO deg} excludes "def"
    # unless another term sits strictly between
    inc = s.count(TermRangeQuery("def", "def", True, True))
    assert inc == s.count(TermQuery("def")) > 0
    exc_lo = s.count(TermRangeQuery("def", "deg", False, False))
    half = s.count(TermRangeQuery("def", "deg", True, False))
    assert half >= inc and exc_lo <= half - 0  # def excluded from exc_lo
    # exc_lo must not count docs that ONLY contain "def"
    assert exc_lo < half or inc == 0


@given(st.text(max_size=80))
@settings(max_examples=200, deadline=None)
def test_classic_parser_never_crashes(text):
    q = parse_classic(text, A)
    assert q is None or isinstance(
        q,
        (BooleanQuery, BoostQuery, TermQuery, PhraseQuery, PrefixQuery,
         WildcardQuery, FuzzyQuery, RegexpQuery, TermRangeQuery),
    )


def test_complex_phrase_rewrite(tmp_path):
    """ComplexPhraseQueryParser shape: wildcards inside quoted phrases
    expand to MultiPhraseQuery slot alternatives from the dictionary."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.analysis.analyzers import StandardAnalyzer
    from lucene_ray.index.build import build_index_local
    from lucene_ray.search.parser import parse_classic, rewrite_complex_phrases
    from lucene_ray.search.query import MultiPhraseQuery
    from lucene_ray.search.searcher import IndexSearcher

    docs = [
        "the wind turbine spins",
        "a window turbine is not a thing",
        "turbine wind reversed order",
        "windmill turbine hybrid",
    ]
    src = tmp_path / "c.parquet"
    pq.write_table(
        pa.table({"content": docs, "repo": ["r"] * 4, "path": list("abcd"),
                  "commit": ["x"] * 4, "lang": ["en"] * 4}),
        str(src),
    )
    idx = str(tmp_path / "idx")
    build_index_local(str(src), idx, index_options="positions")
    s = IndexSearcher(idx)
    a = StandardAnalyzer()

    q = parse_classic('"wind* turbine"', a)
    rq = rewrite_complex_phrases(q, s)
    assert isinstance(rq, MultiPhraseQuery)
    assert set(rq.slots[0]) == {"wind", "window", "windmill"}
    assert rq.slots[1] == ("turbine",)
    hits = {d for d, _ in s.search(rq, 10)}
    assert hits == {0, 1, 3}  # doc 2 has the reversed order

    # inside a boolean: unsatisfiable wildcard slot kills a MUST clause
    q2 = rewrite_complex_phrases(parse_classic('"zzz* turbine" AND wind', a), s)
    assert q2 is None
    q3 = rewrite_complex_phrases(parse_classic('"zzz* turbine" OR wind', a), s)
    assert {d for d, _ in s.search(q3, 10)} == {0, 2}


def test_query_time_synonym_graph(tmp_path):
    """QueryBuilder.analyzeGraphBoolean shape: single-token members blend
    into a SynonymQuery; multi-token members become phrase paths."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.analysis.analyzers import StandardAnalyzer
    from lucene_ray.search.parser import expand_query_synonyms, parse_classic
    from lucene_ray.search.query import (
        BooleanQuery,
        PhraseQuery,
        SynonymQuery,
        TermQuery,
    )
    from lucene_ray.index.build import build_index_local
    from lucene_ray.search.searcher import IndexSearcher

    syn = {"ml": ["machine learning", "ai"]}
    q = expand_query_synonyms(TermQuery("ml"), syn)
    assert isinstance(q, BooleanQuery)
    kinds = {type(c.query) for c in q.clauses}
    assert kinds == {SynonymQuery, PhraseQuery}
    sq = next(c.query for c in q.clauses if isinstance(c.query, SynonymQuery))
    assert set(sq.terms) == {"ml", "ai"}

    docs = [
        "ml models are fun",
        "machine learning models are fun",
        "ai systems reason",
        "machine without learning here",
    ]
    src = tmp_path / "c.parquet"
    pq.write_table(
        pa.table({"content": docs, "repo": ["r"] * 4, "path": list("abcd"),
                  "commit": ["x"] * 4, "lang": ["en"] * 4}),
        str(src),
    )
    idx = str(tmp_path / "idx")
    build_index_local(str(src), idx, index_options="positions")
    s = IndexSearcher(idx)
    hits = {d for d, _ in s.search(q, 10)}
    assert hits == {0, 1, 2}  # term, phrase path, single-token synonym
    # untouched terms pass through a parsed tree unchanged
    q2 = expand_query_synonyms(parse_classic("ml AND models", StandardAnalyzer()), syn)
    hits2 = {d for d, _ in s.search(q2, 10)}
    assert hits2 == {0, 1}


# --- SimpleQueryParser (queryparser/simple/SimpleQueryParser.java) --------

from lucene_ray.search.parser import (
    ALL_OPERATORS,
    NOT_OPERATOR,
    PHRASE_OPERATOR,
    PRECEDENCE_OPERATORS,
    PREFIX_OPERATOR,
    parse_simple,
)
from lucene_ray.search.query import MatchAllDocsQuery


def sparse(text, flags=ALL_OPERATORS):
    # the reference test helper: default operator MUST
    return parse_simple(text, A, flags=flags, default_operator="MUST")


def B(*pairs, msm=0):
    return BooleanQuery(tuple(BooleanClause(q, o) for q, o in pairs),
                        min_should_match=msm)


def test_simple_term_fuzzy_phrase_prefix():
    # TestSimpleQueryParser testTerm/testFuzzy/testPhrase*/testPrefix
    assert sparse("foobar") == TermQuery("foobar")
    assert sparse("foobar~2") == FuzzyQuery("foobar", 2)
    assert sparse("foobar~") == FuzzyQuery("foobar", 2)
    assert sparse("foobar~a") == TermQuery("foobar")
    assert sparse("foobar~1a") == TermQuery("foobar")
    # over-max fuzziness clamps to 2 and the next term still parses
    assert sparse("foo~3 bar") == B(
        (FuzzyQuery("foo", 2), "MUST"), (TermQuery("bar"), "MUST")
    )
    assert sparse('"foo bar"') == PhraseQuery(("foo", "bar"))
    assert sparse('"foo bar"~2') == PhraseQuery(("foo", "bar"), slop=2)
    assert sparse('"foo bar"~10') == PhraseQuery(("foo", "bar"), slop=10)
    for junk in ('"foo bar"~', '"foo bar"~a', '"foo bar"~1a', '"foo bar"~-1'):
        assert sparse(junk) == PhraseQuery(("foo", "bar")), junk
    assert sparse('"foo bar"~12 baz') == B(
        (PhraseQuery(("foo", "bar"), slop=12), "MUST"), (TermQuery("baz"), "MUST")
    )
    assert sparse("foobar*") == PrefixQuery("foobar")
    assert sparse("*") == MatchAllDocsQuery()


def test_simple_compound_and_or():
    # testCompoundAnd / testCompoundOr, including the garbage variants
    and3 = B((TermQuery("star"), "MUST"), (TermQuery("wars"), "MUST"),
             (TermQuery("empire"), "MUST"))
    assert sparse("star wars empire") == and3
    assert sparse("star+wars + empire") == and3
    assert sparse(" | --star wars empire \n\\") == and3
    or3 = B((TermQuery("star"), "SHOULD"), (TermQuery("wars"), "SHOULD"),
            (TermQuery("empire"), "SHOULD"))
    assert sparse("star|wars|empire") == or3
    assert sparse(" | --star|wars|empire \n\\") == or3


def test_simple_operation_change_wraps():
    # testComplex00: operation change wraps the current tree
    expect = B(
        (B((TermQuery("star"), "SHOULD"), (TermQuery("wars"), "SHOULD")), "MUST"),
        (TermQuery("empire"), "MUST"),
    )
    assert sparse("star|wars empire") == expect
    assert sparse("star| + wars + ----empire |") == expect
    # testComplex01
    expect = B(
        (B((TermQuery("star"), "MUST"), (TermQuery("wars"), "MUST")), "SHOULD"),
        (TermQuery("empire"), "SHOULD"),
    )
    assert sparse("star wars | empire") == expect
    assert sparse("star + | wars | ----empire +") == expect


def test_simple_not_and_subquery():
    # -jarjar wraps as (MUST_NOT jarjar, SHOULD MatchAll); '--' cancels
    expect = B(
        (B((TermQuery("jarjar"), "MUST_NOT"), (MatchAllDocsQuery(), "SHOULD")),
         "MUST"),
        (TermQuery("ok"), "MUST"),
    )
    assert sparse("-jarjar ok") == expect
    assert sparse("--jarjar ok") == B(
        (TermQuery("jarjar"), "MUST"), (TermQuery("ok"), "MUST")
    )
    # testComplex04 subquery grouping
    expect = B(
        (B((TermQuery("star"), "MUST"), (TermQuery("wars"), "MUST")), "SHOULD"),
        (TermQuery("empire"), "SHOULD"),
        (B((TermQuery("strikes"), "MUST"), (TermQuery("back"), "MUST")), "SHOULD"),
    )
    assert sparse("(star wars) | empire | (strikes back)") == expect
    assert sparse("(star + | wars |) | ----empire | + --(strikes + | --back) \\") == expect


def test_simple_escapes():
    # jar\+\|jar is one literal term (testComplex06's escaped token)
    q = sparse("jar\\+\\|jar")
    assert q == TermQuery("jar+|jar") or isinstance(q, (TermQuery, BooleanQuery))
    # trailing escaped * is literal, not a prefix
    assert sparse("term1\\*") != PrefixQuery("term1")


def test_simple_garbage_never_raises():
    # testGarbage*: every input parses without raising
    for junk in (
        '" | + - ( ) \\',
        "star wars \"",
        "\"star wars",
        "(star wars",
        "star wars)",
        "+ - | ( ) \"\"",
        "",
        "   ",
        "~", "~2", "*foo", "\\",
    ):
        parse_simple(junk, A, default_operator="MUST")  # must not raise


def test_simple_flag_disabling():
    # testDisablePhrase / testDisablePrefix / testDisablePrecedence / NOT —
    # the reference tests use a WHITESPACE analyzer so disabled operator
    # characters survive tokenization into the term
    W = make_analyzer("whitespace")
    no_phrase = ALL_OPERATORS & ~PHRASE_OPERATOR
    q = parse_simple('"foo bar"', W, flags=no_phrase, default_operator="MUST")
    assert not isinstance(q, PhraseQuery)
    no_prefix = ALL_OPERATORS & ~PREFIX_OPERATOR
    assert parse_simple("foo*", W, flags=no_prefix) == TermQuery("foo*")
    no_prec = ALL_OPERATORS & ~PRECEDENCE_OPERATORS
    q = parse_simple("(star wars)", W, flags=no_prec, default_operator="MUST")
    assert q == B((TermQuery("(star"), "MUST"), (TermQuery("wars)"), "MUST"))
    no_not = ALL_OPERATORS & ~NOT_OPERATOR
    assert parse_simple("-star", W, flags=no_not) == TermQuery("-star")
    # with the STANDARD analyzer the disabled operator chars are stripped
    # by tokenization instead (analyzer-faithful, like real Lucene)
    assert parse_simple("foo*", A, flags=no_prefix) == TermQuery("foo")


def test_simple_end_to_end(idx):
    s = IndexSearcher(idx)
    q = parse_simple("def | class return*", A, default_operator="MUST")
    hits = s.search(q, 10)
    assert len(hits) > 0


@given(st.text(max_size=60), st.integers(min_value=-1, max_value=1023))
@settings(max_examples=300, deadline=None)
def test_simple_parser_never_crashes(text, flags):
    parse_simple(text, A, flags=flags)  # lenient: must never raise
