"""XML query syntax — the CoreParser analogue.

Reference: lucene/queryparser/src/java/org/apache/lucene/queryparser/xml/
CoreParser.java:90-134 (the builder registry) and the element builders
under queryparser/xml/builders/: TermQueryBuilder (verbatim term text,
optional ``boost``), TermsQueryBuilder (text ANALYZED into SHOULD
TermQuery clauses + minimumNumberShouldMatch), BooleanQueryBuilder
(``Clause`` children with an ``occurs`` attribute — should/must/mustNot
case-insensitive, ``filter`` case-SENSITIVE, anything else including a
missing attribute is a ParserException, BooleanQueryBuilder.java:80-82),
DisjunctionMaxQueryBuilder (``tieBreaker`` default 0), RangeQueryBuilder
(TermRangeQuery, includeLower/includeUpper default true),
MatchAllDocsQueryBuilder, ConstantScoreQueryBuilder,
UserInputQueryBuilder (delegates the element text to the classic
parser), and the span builders SpanTerm / SpanOr / SpanOrTerms /
SpanNear / SpanNot / SpanFirst, lowered onto this repo's span AST
(search/spans.py) wrapped in SpanScoreQuery when used as a query.

Parsing uses stdlib ElementTree; empty ``lowerTerm`` / ``upperTerm``
attributes mean an open end (DOM's getAttribute-returns-"" behavior the
reference inherits).  ``fieldName`` resolution mirrors the classic
parser's convention elsewhere in this repo: the default field is the
indexed text, a name in ``stored_fields`` builds a constant-score
metadata filter, and RangeQuery on a stored NUMERIC field maps to
StoredFieldRange.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from .query import (
    BooleanClause,
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
from .spans import SpanFirst, SpanNear, SpanNot, SpanOr, SpanTerm

FILTER = "FILTER"
MUST = "MUST"
MUST_NOT = "MUST_NOT"
SHOULD = "SHOULD"


class ParserException(ValueError):
    """queryparser/xml/ParserException analogue."""


def _num(e: ET.Element, attr: str, default: str, cast):
    """Attribute as a number; a non-numeric value is a ParserException
    (the error grammar this module promises), never a raw ValueError."""
    raw = e.get(attr, default)
    try:
        return cast(raw)
    except ValueError as exc:
        raise ParserException(
            f'{e.tag}: invalid numeric "{attr}" attribute: {raw!r}'
        ) from exc


def _only_child(e: ET.Element) -> ET.Element:
    kids = _children(e)
    if not kids:
        raise ParserException(f"{e.tag} requires a child query element")
    return kids[0]


def _boost(e: ET.Element, q):
    b = _num(e, "boost", "1", float)
    return BoostQuery(q, b) if b != 1.0 else q


def _text_or_fail(e: ET.Element) -> str:
    t = (e.text or "").strip()
    if not t:
        raise ParserException(f"{e.tag} requires non-blank text")
    return t


def _field(e: ET.Element, default_field: str) -> str:
    return e.get("fieldName", default_field)


def _occurs(e: ET.Element) -> str:
    # BooleanQueryBuilder.getOccursValue: should/must/mustNot compare
    # case-insensitively, "filter" exactly; everything else (including a
    # missing attribute) throws
    occs = e.get("occurs", "")
    low = occs.lower()
    if low == "should":
        return SHOULD
    if low == "must":
        return MUST
    if low == "mustnot":
        return MUST_NOT
    if occs == "filter":
        return FILTER
    raise ParserException(f'Invalid value for "occurs" attribute of clause: {occs}')


def _children(e: ET.Element) -> list[ET.Element]:
    return [c for c in e if isinstance(c.tag, str)]


def _span_node(e: ET.Element, analyzer):
    tag = e.tag
    if tag == "SpanTerm":
        return SpanTerm(_text_or_fail(e))
    if tag == "SpanOr":
        return SpanOr(tuple(_span_node(c, analyzer) for c in _children(e)))
    if tag == "SpanOrTerms":
        # SpanOrTermsBuilder: the element text analyzed, one SpanTerm per
        # token, unioned
        toks = analyzer.tokens(_text_or_fail(e))
        if not toks:
            raise ParserException("SpanOrTerms analyzed to zero tokens")
        return SpanOr(tuple(SpanTerm(t) for t in toks))
    if tag == "SpanNear":
        slop = _num(e, "slop", "0", int)
        in_order = e.get("inOrder", "true").lower() == "true"
        return SpanNear(
            tuple(_span_node(c, analyzer) for c in _children(e)), slop, in_order
        )
    if tag == "SpanNot":
        kids = _children(e)
        inc = next((c for c in kids if c.tag == "Include"), None)
        exc = next((c for c in kids if c.tag == "Exclude"), None)
        if inc is None or exc is None:
            raise ParserException("SpanNot needs Include and Exclude children")
        return SpanNot(
            _span_node(_only_child(inc), analyzer),
            _span_node(_only_child(exc), analyzer),
        )
    if tag == "SpanFirst":
        return SpanFirst(
            _span_node(_only_child(e), analyzer), _num(e, "end", "1", int)
        )
    raise ParserException(f"unknown span element: {tag}")


_SPAN_TAGS = frozenset(
    {"SpanTerm", "SpanOr", "SpanOrTerms", "SpanNear", "SpanNot", "SpanFirst"}
)


def _query(e: ET.Element, analyzer, default_field, stored_fields):
    tag = e.tag
    if tag in _SPAN_TAGS:
        return _boost(e, SpanScoreQuery(_span_node(e, analyzer)))
    if tag == "TermQuery":
        field = _field(e, default_field)
        text = _text_or_fail(e)
        if field in stored_fields:
            return _boost(e, StoredFieldFilter(field, text))
        return _boost(e, TermQuery(text))
    if tag == "TermsQuery":
        field = _field(e, default_field)
        if field in stored_fields:
            raise ParserException("TermsQuery on a stored metadata field")
        msm = _num(e, "minimumNumberShouldMatch", "0", int)
        clauses = tuple(
            BooleanClause(TermQuery(t), SHOULD)
            for t in analyzer.tokens(_text_or_fail(e))
        )
        return _boost(e, BooleanQuery(clauses, msm))
    if tag == "MatchAllDocsQuery":
        return _boost(e, MatchAllDocsQuery())
    if tag == "BooleanQuery":
        msm = _num(e, "minimumNumberShouldMatch", "0", int)
        clauses = []
        for c in _children(e):
            if c.tag != "Clause":
                continue  # BooleanQueryBuilder skips non-Clause nodes
            kids = _children(c)
            if not kids:
                raise ParserException("Clause requires a child query element")
            clauses.append(
                BooleanClause(
                    _query(kids[0], analyzer, default_field, stored_fields),
                    _occurs(c),
                )
            )
        return _boost(e, BooleanQuery(tuple(clauses), msm))
    if tag == "DisjunctionMaxQuery":
        tie = _num(e, "tieBreaker", "0", float)
        subs = tuple(
            _query(c, analyzer, default_field, stored_fields) for c in _children(e)
        )
        return _boost(e, DisjunctionMaxQuery(subs, tie))
    if tag == "ConstantScoreQuery":
        kids = _children(e)
        if not kids:
            raise ParserException("ConstantScoreQuery requires a child element")
        return _boost(
            e,
            ConstantScoreQuery(
                _query(kids[0], analyzer, default_field, stored_fields)
            ),
        )
    if tag == "RangeQuery":
        field = _field(e, default_field)
        lo = e.get("lowerTerm", "") or None
        hi = e.get("upperTerm", "") or None
        inc_lo = e.get("includeLower", "true").lower() == "true"
        inc_hi = e.get("includeUpper", "true").lower() == "true"
        if field in stored_fields:
            # numeric stored column: [lo, hi) with the include flags
            # folded into integer bounds (StoredFieldRange convention)
            lo_i = None if lo is None else _num(e, "lowerTerm", lo, int)
            hi_i = None if hi is None else _num(e, "upperTerm", hi, int)
            lo_n = None if lo_i is None else lo_i + (0 if inc_lo else 1)
            hi_n = None if hi_i is None else hi_i + (1 if inc_hi else 0)
            return _boost(e, StoredFieldRange(field, lo_n, hi_n))
        return _boost(e, TermRangeQuery(lo, hi, inc_lo, inc_hi))
    if tag == "BoostingTermQuery":
        # BoostingTermBuilder: PayloadScoreQuery(SpanTerm,
        # AveragePayloadFunction) — our payload stream scores the same
        # shape with func="avg"
        from .query import PayloadScoreQuery

        return _boost(e, PayloadScoreQuery(_text_or_fail(e), func="avg"))
    if tag == "UserQuery":
        from .parser import parse_classic

        q = parse_classic(
            _text_or_fail(e), analyzer, default_field, stored_fields
        )
        if q is None:
            raise ParserException("UserQuery parsed to nothing")
        return _boost(e, q)
    raise ParserException(f"unknown query element: {tag}")


def parse_xml(
    text: str,
    analyzer,
    default_field: str = "text",
    stored_fields: tuple[str, ...] = (),
):
    """Parse one XML query document into this repo's Query tree; raises
    ParserException on malformed XML or unknown elements (CoreParser.parse
    semantics)."""
    try:
        root = ET.fromstring(text)
    except ET.ParseError as exc:
        raise ParserException(f"Error parsing XML stream: {exc}") from exc
    return _query(root, analyzer, default_field, stored_fields)
