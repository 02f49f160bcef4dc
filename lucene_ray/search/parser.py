"""Mini query-string parser (reference demo/SearchFiles.java uses the
classic QueryParser; we implement the better-specified SimpleQueryParser
subset, queryparser/simple/SimpleQueryParser.java):

    spark join            -> SHOULD spark, SHOULD join
    +spark -join          -> MUST spark, MUST_NOT join
    "batch batch"         -> PhraseQuery (needs a positions index)
    "join order"~2        -> sloppy PhraseQuery (2-term, slop=2)
    wind*                 -> PrefixQuery; w?nd*w -> WildcardQuery
    merge~1               -> FuzzyQuery(max_edits=1); term~ -> max_edits=2
    /s.*k/                -> RegexpQuery
    [a TO b]              -> TermRangeQuery [a, b)  (simplification: upper
                             exclusive, matching our TermRangeQuery)

A single bare term parses to TermQuery; everything else becomes a
BooleanQuery of the clauses.  Terms are normalized through the analyzer
(Analyzer.normalize), like the reference parsers do.
"""

from __future__ import annotations

import re

from .query import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

_TOKEN_RE = re.compile(
    r"""
    (?P<mod>[+-]?)
    (?:
        "(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))?
      | /(?P<regex>[^/]*)/
      | \[(?P<rlo>\S+)\s+TO\s+(?P<rhi>\S+)\]
      | (?P<word>[^\s"/\[\]]+)
    )
    """,
    re.VERBOSE,
)

_FUZZY_RE = re.compile(r"^(?P<body>.+?)~(?P<edits>\d?)$")


def parse_query(text: str, analyzer) -> Query | None:
    """Parse a query string; None for empty input."""
    clauses: list[BooleanClause] = []
    for m in _TOKEN_RE.finditer(text):
        occur = {"+": "MUST", "-": "MUST_NOT", "": "SHOULD"}[m.group("mod")]
        if m.group("phrase") is not None:
            words = tuple(
                analyzer.normalize(w) for w in m.group("phrase").split() if w
            )
            if not words:
                continue
            slop = int(m.group("slop")) if m.group("slop") else 0
            q: Query = (
                TermQuery(words[0])
                if len(words) == 1
                else PhraseQuery(words, slop=slop)
            )
        elif m.group("regex") is not None:
            q = RegexpQuery(m.group("regex"))
        elif m.group("rlo") is not None:
            lo = analyzer.normalize(m.group("rlo"))
            hi = analyzer.normalize(m.group("rhi"))
            q = TermRangeQuery(None if lo == "*" else lo, None if hi == "*" else hi)
        else:
            word = m.group("word")
            fz = _FUZZY_RE.match(word)
            if fz and "*" not in word and "?" not in word:
                edits = int(fz.group("edits")) if fz.group("edits") else 2
                q = FuzzyQuery(analyzer.normalize(fz.group("body")), edits)
            elif word.endswith("*") and "*" not in word[:-1] and "?" not in word:
                q = PrefixQuery(analyzer.normalize(word[:-1]))
            elif "*" in word or "?" in word:
                q = WildcardQuery(analyzer.normalize(word))
            else:
                q = TermQuery(analyzer.normalize(word))
        clauses.append(BooleanClause(q, occur))
    if not clauses:
        return None
    if len(clauses) == 1 and clauses[0].occur == "SHOULD":
        return clauses[0].query
    return BooleanQuery(tuple(clauses))
