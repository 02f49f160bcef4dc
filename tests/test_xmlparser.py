"""XML query parser (queryparser/xml/CoreParser.java + builders): tree
equivalence against the classic parser, builder semantics (occurs rules,
boosts, analyzed TermsQuery, RangeQuery flags, span lowering), and the
error grammar."""

import pytest

from lucene_ray.analysis.analyzers import make_analyzer
from lucene_ray.search.parser import parse_classic
from lucene_ray.search.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    SpanScoreQuery,
    StoredFieldFilter,
    StoredFieldRange,
    TermQuery,
    TermRangeQuery,
)
from lucene_ray.search.spans import SpanFirst, SpanNear, SpanOr, SpanTerm
from lucene_ray.search.xmlparser import ParserException, parse_xml

AN = make_analyzer("standard")


def test_boolean_tree_matches_classic():
    xml = """<BooleanQuery>
      <Clause occurs="must"><BooleanQuery>
        <Clause occurs="should"><TermQuery>spark</TermQuery></Clause>
        <Clause occurs="should"><TermQuery>join</TermQuery></Clause>
      </BooleanQuery></Clause>
      <Clause occurs="must"><TermQuery>merge</TermQuery></Clause>
    </BooleanQuery>"""
    assert parse_xml(xml, AN) == parse_classic("(spark OR join) AND merge", AN)


def test_boosts_match_classic():
    xml = """<BooleanQuery>
      <Clause occurs="should"><TermQuery boost="2">spark</TermQuery></Clause>
      <Clause occurs="should"><TermQuery boost="0.5">join</TermQuery></Clause>
    </BooleanQuery>"""
    assert parse_xml(xml, AN) == parse_classic("spark^2 OR join^0.5", AN)


def test_user_query_delegates_to_classic():
    xml = "<UserQuery>wind* AND [scan TO spark]</UserQuery>"
    assert parse_xml(xml, AN) == parse_classic("wind* AND [scan TO spark]", AN)


def test_terms_query_analyzes_and_msm():
    q = parse_xml(
        '<TermsQuery minimumNumberShouldMatch="2">Spark JOIN merge</TermsQuery>', AN
    )
    assert isinstance(q, BooleanQuery)
    assert q.min_should_match == 2
    assert [c.query for c in q.clauses] == [
        TermQuery("spark"), TermQuery("join"), TermQuery("merge"),
    ]
    assert all(c.occur == "SHOULD" for c in q.clauses)


def test_occurs_rules():
    must = '<BooleanQuery><Clause occurs="MUST"><TermQuery>a</TermQuery></Clause></BooleanQuery>'
    assert parse_xml(must, AN).clauses[0].occur == "MUST"  # case-insensitive
    filt = '<BooleanQuery><Clause occurs="filter"><TermQuery>a</TermQuery></Clause></BooleanQuery>'
    assert parse_xml(filt, AN).clauses[0].occur == "FILTER"
    # "filter" is case-SENSITIVE in the reference (BooleanQueryBuilder:80)
    with pytest.raises(ParserException):
        parse_xml(
            '<BooleanQuery><Clause occurs="Filter"><TermQuery>a</TermQuery></Clause></BooleanQuery>',
            AN,
        )
    # missing occurs throws too (DOM getAttribute returns "")
    with pytest.raises(ParserException):
        parse_xml(
            "<BooleanQuery><Clause><TermQuery>a</TermQuery></Clause></BooleanQuery>",
            AN,
        )


def test_dismax_and_constant_score_and_matchall():
    q = parse_xml(
        '<DisjunctionMaxQuery tieBreaker="0.3">'
        "<TermQuery>spark</TermQuery><TermQuery>join</TermQuery>"
        "</DisjunctionMaxQuery>",
        AN,
    )
    assert q == DisjunctionMaxQuery((TermQuery("spark"), TermQuery("join")), 0.3)
    q = parse_xml("<ConstantScoreQuery><TermQuery>a</TermQuery></ConstantScoreQuery>", AN)
    assert q == ConstantScoreQuery(TermQuery("a"))
    assert parse_xml('<MatchAllDocsQuery boost="3"/>', AN) == BoostQuery(
        MatchAllDocsQuery(), 3.0
    )


def test_range_query_variants():
    q = parse_xml('<RangeQuery lowerTerm="scan" upperTerm="spark"/>', AN)
    assert q == TermRangeQuery("scan", "spark", True, True)
    q = parse_xml(
        '<RangeQuery lowerTerm="a" upperTerm="b" includeLower="false" includeUpper="false"/>',
        AN,
    )
    assert q == TermRangeQuery("a", "b", False, False)
    # open ends: DOM's empty-string attributes
    q = parse_xml('<RangeQuery upperTerm="m"/>', AN)
    assert q == TermRangeQuery(None, "m", True, True)
    # stored numeric field folds include flags into [lo, hi) ints
    q = parse_xml(
        '<RangeQuery fieldName="n_chars" lowerTerm="100" upperTerm="400" includeUpper="false"/>',
        AN,
        stored_fields=("n_chars",),
    )
    assert q == StoredFieldRange("n_chars", 100, 400)


def test_stored_field_term_filter():
    q = parse_xml('<TermQuery fieldName="lang">en</TermQuery>', AN, stored_fields=("lang",))
    assert q == StoredFieldFilter("lang", "en")


def test_span_lowering():
    xml = """<SpanNear slop="2" inOrder="false">
      <SpanOrTerms>spark JOIN</SpanOrTerms>
      <SpanFirst end="3"><SpanTerm>merge</SpanTerm></SpanFirst>
    </SpanNear>"""
    q = parse_xml(xml, AN)
    assert isinstance(q, SpanScoreQuery)
    assert q.node == SpanNear(
        (
            SpanOr((SpanTerm("spark"), SpanTerm("join"))),
            SpanFirst(SpanTerm("merge"), 3),
        ),
        2,
        False,
    )


def test_error_grammar():
    with pytest.raises(ParserException):
        parse_xml("<NotAQuery/>", AN)
    with pytest.raises(ParserException):
        parse_xml("<TermQuery>  </TermQuery>", AN)
    with pytest.raises(ParserException):
        parse_xml("<BooleanQuery><Clause occurs=", AN)  # malformed XML
    with pytest.raises(ParserException):
        parse_xml("<ConstantScoreQuery/>", AN)


def test_error_grammar_spans_and_numbers():
    # empty Include / childless SpanFirst / bad numerics are
    # ParserException, never IndexError / ValueError
    with pytest.raises(ParserException):
        parse_xml(
            "<SpanNot><Include/><Exclude><SpanTerm>a</SpanTerm></Exclude></SpanNot>",
            AN,
        )
    with pytest.raises(ParserException):
        parse_xml('<SpanFirst end="3"/>', AN)
    with pytest.raises(ParserException):
        parse_xml('<TermQuery boost="huge">a</TermQuery>', AN)
    with pytest.raises(ParserException):
        parse_xml('<SpanNear slop="x"><SpanTerm>a</SpanTerm></SpanNear>', AN)
    with pytest.raises(ParserException):
        parse_xml(
            '<RangeQuery fieldName="n_chars" lowerTerm="ten"/>',
            AN,
            stored_fields=("n_chars",),
        )


def test_boosting_term_query():
    from lucene_ray.search.query import PayloadScoreQuery

    q = parse_xml("<BoostingTermQuery>spark</BoostingTermQuery>", AN)
    assert q == PayloadScoreQuery("spark", func="avg")
    q = parse_xml('<BoostingTermQuery boost="2">spark</BoostingTermQuery>', AN)
    assert q == BoostQuery(PayloadScoreQuery("spark", func="avg"), 2.0)
