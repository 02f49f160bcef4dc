"""The Matches API: WHERE a query matched inside one document.

Reference: lucene/core/src/java/org/apache/lucene/search/Matches.java +
MatchesIterator.java (per-field match iteration exposing positions and
offsets; Weight.matches(context, doc)) — the machinery behind
highlighting and matched-term debugging.

``matches(reader, doc, query)`` returns None when the doc does not match,
else a dict term -> list of (position, start_offset, end_offset) (offsets
-1 when the index lacks them).  Query support: Term / Phrase / Synonym /
TermInSet / Prefix and Boolean combinations (MUST / SHOULD / FILTER /
MUST_NOT with from-the-reference semantics: a doc matches a Boolean node
iff its required clauses match and no prohibited clause does; the
reported submatches are the union of the matching scoring clauses —
MatchesUtils.fromSubMatches)."""

from __future__ import annotations

import numpy as np

from .query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    PhraseQuery,
    PrefixQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
)


def _term_occurrences(reader, doc: int, term: str):
    tid = reader.term_id(term)
    if tid is None:
        return None
    docs, _ = reader.decode_term_cached(tid)
    j = int(np.searchsorted(docs, doc))
    if j >= len(docs) or docs[j] != doc:
        return None
    if getattr(reader, "has_positions", False):
        pos = reader.term_positions(tid)[j]
        if getattr(reader, "has_offsets", False):
            os_, oe_ = reader.term_offset_spans(tid)[j]
            return [(int(p), int(s), int(e)) for p, s, e in zip(pos, os_, oe_)]
        return [(int(p), -1, -1) for p in pos]
    return [(-1, -1, -1)]  # docs-only index: presence, no positions


def matches(reader, doc: int, query) -> dict | None:
    """Per-term occurrence lists for ``doc``, or None when it does not
    match ``query`` (Weight.matches contract)."""
    if isinstance(query, (BoostQuery, ConstantScoreQuery)):
        return matches(reader, doc, query.query)
    if isinstance(query, TermQuery):
        occ = _term_occurrences(reader, doc, query.term)
        return None if occ is None else {query.term: occ}
    if isinstance(query, SynonymQuery):
        out = {}
        for t in query.terms:
            occ = _term_occurrences(reader, doc, t)
            if occ is not None:
                out[t] = occ
        return out or None
    if isinstance(query, TermInSetQuery):
        out = {}
        for t in query.terms:
            occ = _term_occurrences(reader, doc, t)
            if occ is not None:
                out[t] = occ
        return out or None
    if isinstance(query, PrefixQuery):
        out = {}
        lo = query.prefix.encode("utf-8")
        hi = lo + b"\xff\xff\xff\xff"
        for tid in reader.term_id_range(lo, hi):
            t = reader.term_string(tid)
            occ = _term_occurrences(reader, doc, t)
            if occ is not None:
                out[t] = occ
        return out or None
    if isinstance(query, PhraseQuery):
        from .multiterm import phrase_matches_segment

        docs, _ = phrase_matches_segment(reader, query.terms)
        if doc not in set(docs.tolist()):
            return None
        out = {}
        for t in query.terms:
            occ = _term_occurrences(reader, doc, t)
            if occ is not None:
                out[t] = occ
        return out
    if isinstance(query, BooleanQuery):
        sub: dict = {}
        any_scoring = False
        has_required = False
        for c in query.clauses:
            m = matches(reader, doc, c.query)
            if c.occur == "MUST_NOT":
                if m is not None:
                    return None
                continue
            if c.occur in ("MUST", "FILTER"):
                has_required = True
                if m is None:
                    return None
            if m is not None and c.occur != "FILTER":
                any_scoring = True
                for t, occ in m.items():
                    sub.setdefault(t, occ)
            elif m is not None and c.occur == "FILTER":
                any_scoring = True  # a filter-only match still matches
        if not (any_scoring or has_required):
            return None
        if not any_scoring:
            return None
        return sub if sub else {}
    if isinstance(query, NamedQuery):
        return matches(reader, doc, query.query)
    raise TypeError(f"matches() unsupported for {query!r}")


class NamedQuery:
    """NamedMatches.wrapQuery analogue (reference
    search/NamedMatches.java:69-71): associates a name with a sub-query
    so the matching sub-queries of a larger Boolean can be identified
    per document.  Transparent for matching/scoring."""

    __slots__ = ("name", "query")

    def __init__(self, name: str, query):
        self.name = name
        self.query = query

    def __eq__(self, other):
        return (
            isinstance(other, NamedQuery)
            and self.name == other.name
            and self.query == other.query
        )

    def __hash__(self):
        return hash(("named", self.name, self.query))

    def __repr__(self):
        return f"NamedQuery(name={self.name!r}, query={self.query!r})"


def wrap_query(name: str, query) -> NamedQuery:
    return NamedQuery(name, query)


def find_named_matches(reader, doc: int, query) -> list[str] | None:
    """NamedMatches.findNamedMatches (reference NamedMatches.java:74-87):
    the names of all NamedQuery nodes whose sub-query matched ``doc``,
    in query-tree order — None when the TOP query does not match (no
    Matches tree exists at all then).  A named node under a MUST_NOT
    branch can never be reported: its match kills the top-level match."""
    if matches(reader, doc, query) is None:
        return None
    names: list[str] = []

    def walk(q):
        if isinstance(q, NamedQuery):
            if matches(reader, doc, q.query) is not None:
                names.append(q.name)
            walk(q.query)
        elif isinstance(q, (BoostQuery, ConstantScoreQuery)):
            walk(q.query)
        elif isinstance(q, BooleanQuery):
            for c in q.clauses:
                if c.occur != "MUST_NOT":  # prohibited branches have no Matches
                    walk(c.query)

    walk(query)
    return names
