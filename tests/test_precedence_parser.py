"""PrecedenceQueryParser golden shapes (reference
queryparser/flexible/precedence/TestPrecedenceQueryParser.java)."""

from lucene_ray.analysis.analyzers import make_analyzer
from lucene_ray.search.parser import parse_classic, parse_precedence
from lucene_ray.search.query import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    TermQuery,
)


AN = make_analyzer("standard")


def P(s):
    return parse_precedence(s, AN)


def bq(*cl):
    return BooleanQuery(tuple(BooleanClause(q, o) for q, o in cl))


def t(w):
    return TermQuery(w)


def test_and_binds_tighter_than_or():
    # "A AND B OR C AND D" == "(A AND B) OR (C AND D)"  (test line 607)
    assert P("a AND b OR c AND d") == P("(a AND b) OR (c AND d)")
    assert P("a AND b OR c AND d") == bq(
        (bq((t("a"), "MUST"), (t("b"), "MUST")), "SHOULD"),
        (bq((t("c"), "MUST"), (t("d"), "MUST")), "SHOULD"),
    )
    # classic parses the same string FLAT: +a +b +c +d
    assert parse_classic("a AND b OR c AND d", AN) != P("a AND b OR c AND d")


def test_reference_goldens():
    assert P("a AND b") == bq((t("a"), "MUST"), (t("b"), "MUST"))
    assert P("(a AND b)") == P("a AND b")
    assert P("c OR (a AND b)") == bq(
        (t("c"), "SHOULD"), (bq((t("a"), "MUST"), (t("b"), "MUST")), "SHOULD")
    )
    assert P("a AND NOT b") == bq((t("a"), "MUST"), (t("b"), "MUST_NOT"))
    assert P("a AND -b") == P("a AND NOT b")
    assert P("a OR b") == bq((t("a"), "SHOULD"), (t("b"), "SHOULD"))
    assert P("a OR !b") == bq((t("a"), "SHOULD"), (t("b"), "MUST_NOT"))
    assert P("+term -term term") == bq(
        (t("term"), "MUST"), (t("term"), "MUST_NOT"), (t("term"), "SHOULD")
    )
    assert P("(foo OR bar) AND (baz OR boo)") == bq(
        (bq((t("foo"), "SHOULD"), (t("bar"), "SHOULD")), "MUST"),
        (bq((t("baz"), "SHOULD"), (t("boo"), "SHOULD")), "MUST"),
    )
    assert P("((a OR b) AND NOT c) OR d") == bq(
        (
            bq(
                (bq((t("a"), "SHOULD"), (t("b"), "SHOULD")), "MUST"),
                (t("c"), "MUST_NOT"),
            ),
            "SHOULD",
        ),
        (t("d"), "SHOULD"),
    )
    # "A OR NOT B AND C" == A OR ((-B) AND (+C))  (test line 627)
    assert P("a OR NOT b AND c") == bq(
        (t("a"), "SHOULD"),
        (bq((t("b"), "MUST_NOT"), (t("c"), "MUST")), "SHOULD"),
    )


def test_boost_and_single_clause():
    assert P("term^2.0") == BoostQuery(t("term"), 2.0)
    assert P("germ term^2.0") == bq(
        (t("germ"), "SHOULD"), (BoostQuery(t("term"), 2.0), "SHOULD")
    )
    # top-level lone NOT still produces a boolean with one MUST_NOT
    assert P("NOT a") == bq((t("a"), "MUST_NOT"))
    assert P("") is None
