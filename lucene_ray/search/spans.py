"""SpanQuery family: compositional span algebra over the positions index.

Reference: lucene/queries/src/java/org/apache/lucene/queries/spans
(SpanTermQuery, SpanNearQuery + NearSpansOrdered/NearSpansUnordered,
SpanOrQuery, SpanNotQuery, SpanFirstQuery/SpanPositionRangeQuery,
SpanContainingQuery, SpanWithinQuery).

Every node evaluates, per segment per doc, to the FULL DISTINCT set of
matching spans ``(start, end)`` with ``end`` INCLUSIVE (the reference's
``Spans.endPosition()`` is exclusive; we keep inclusive ends to share the
interval conventions of the surround module).  Using the full span set —
not a minimal antichain — keeps the algebra strictly compositional: each
combinator is a relational expression over its children's span sets, so
the DuckDB oracle can be compiled from the SAME AST (``_spans_sql`` in
``__ray_entry__.py``) and match set AND span count exactly.  This is a
documented deviation from the reference enumerators, which stream a
greedy subsequence of these spans (NearSpansOrdered advances lazily);
the MATCH SETS agree, the per-doc freq here is the distinct-span count
rather than the reference's sum of 1/(1+slop_width) weights (the same
integer-count deviation sloppy_phrase_matches_segment documents).

Semantics per node (spans inclusive [s, e]):

  SpanTerm(t)                {(p, p)} for each position of t
  SpanOr(c1..ck)             distinct union of child span sets
  SpanNear(c1..ck, slop, in_order=True)
      tuples (one span per child) with e_i < s_{i+1} (in order,
      non-overlapping; NearSpansOrdered's stretchToOrder) whose width
      (e_k - s_1 + 1) - sum(child lengths) <= slop; span = (s_1, e_k)
  SpanNear(..., in_order=False)
      any tuple (overlap allowed, NearSpansUnordered) with
      (max e - min s + 1) - sum(child lengths) <= slop;
      span = (min s, max e)
  SpanNot(inc, exc, pre, post)
      inc spans with NO exc span overlapping [s - pre, e + post]
  SpanFirst(c, n)            c spans ending before position n (e < n,
                             i.e. exclusive end <= n — SpanFirstQuery)
  SpanContaining(big, little) big spans containing >= 1 little span
  SpanWithin(little, big)     little spans inside >= 1 big span
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = [
    "SpanTerm",
    "SpanOr",
    "SpanNear",
    "SpanNot",
    "SpanFirst",
    "SpanPositionRange",
    "SpanContaining",
    "SpanWithin",
    "SpanFieldMasked",
    "MultiFieldSpanReader",
    "span_matches_segment",
]


@dataclass(frozen=True)
class SpanTerm:
    term: str


@dataclass(frozen=True)
class SpanOr:
    children: tuple


@dataclass(frozen=True)
class SpanNear:
    children: tuple
    slop: int
    in_order: bool = True


@dataclass(frozen=True)
class SpanNot:
    include: object
    exclude: object
    pre: int = 0
    post: int = 0


@dataclass(frozen=True)
class SpanFirst:
    child: object
    end: int


@dataclass(frozen=True)
class SpanPositionRange:
    """SpanPositionRangeQuery (reference queries/spans/
    SpanPositionRangeQuery.java:1): keep child spans fully inside
    [start, end) — SpanFirst is the start=0 special case."""

    child: object
    start: int
    end: int


@dataclass(frozen=True)
class SpanContaining:
    big: object
    little: object


@dataclass(frozen=True)
class SpanWithin:
    little: object
    big: object


@dataclass(frozen=True)
class SpanFieldMasked:
    """FieldMaskingSpanQuery (reference queries/spans/
    FieldMaskingSpanQuery.java:1): evaluate ``child`` against ``field``'s
    postings while REPORTING the enclosing query's field, so SpanNear /
    SpanOr can compose clauses across position-parallel fields.  Positions
    are compared raw across fields, exactly as the reference's
    getSpans-on-the-masked-field does."""

    child: object
    field: str


class MultiFieldSpanReader:
    """A segment view for masked span evaluation: delegates every reader
    attribute to the DEFAULT field's SegmentReader and resolves
    SpanFieldMasked children against ``siblings[field]`` (the aligned
    per-field sub-index segments of index/multifield.py)."""

    def __init__(self, default, siblings: dict):
        self._default = default
        self.siblings = siblings

    def __getattr__(self, name):
        return getattr(self._default, name)


_EMPTY = np.empty((0, 2), np.int64)


def _distinct(iv: np.ndarray) -> np.ndarray:
    if len(iv) <= 1:
        return iv
    return np.unique(iv, axis=0)


def _near_ordered_full(ivs: list[np.ndarray], slop: int) -> np.ndarray:
    """All distinct ordered-chain spans: partial tuples carry
    (s_first, e_last, width_sum); each step joins against the next child's
    spans starting strictly after the partial's end.  Partials are
    re-uniqued per step so growth is bounded by distinct triples, not the
    raw tuple product."""
    parts = np.column_stack(
        [ivs[0][:, 0], ivs[0][:, 1], ivs[0][:, 1] - ivs[0][:, 0] + 1]
    )
    for iv in ivs[1:]:
        mask = iv[None, :, 0] > parts[:, 1][:, None]
        if not mask.any():
            return _EMPTY
        mi, ni = np.nonzero(mask)
        parts = np.column_stack(
            [parts[mi, 0], iv[ni, 1], parts[mi, 2] + iv[ni, 1] - iv[ni, 0] + 1]
        )
        parts = np.unique(parts, axis=0)
    ok = (parts[:, 1] - parts[:, 0] + 1) - parts[:, 2] <= slop
    return _distinct(parts[ok][:, :2])


def _near_unordered_full(ivs: list[np.ndarray], slop: int) -> np.ndarray:
    """All distinct unordered combination spans: partials carry
    (min_start, max_end, width_sum) over any one span per child (overlap
    allowed — NearSpansUnordered does not force disjointness)."""
    parts = np.column_stack(
        [ivs[0][:, 0], ivs[0][:, 1], ivs[0][:, 1] - ivs[0][:, 0] + 1]
    )
    for iv in ivs[1:]:
        m, n = len(parts), len(iv)
        pi = np.repeat(np.arange(m), n)
        ci = np.tile(np.arange(n), m)
        parts = np.column_stack(
            [
                np.minimum(parts[pi, 0], iv[ci, 0]),
                np.maximum(parts[pi, 1], iv[ci, 1]),
                parts[pi, 2] + iv[ci, 1] - iv[ci, 0] + 1,
            ]
        )
        parts = np.unique(parts, axis=0)
    ok = (parts[:, 1] - parts[:, 0] + 1) - parts[:, 2] <= slop
    return _distinct(parts[ok][:, :2])


def _doc_spans(reader, node) -> dict[int, np.ndarray]:
    """doc -> distinct (n, 2) span array for one segment (pre-live-docs;
    the caller masks deletes once at the root)."""
    if isinstance(node, SpanFieldMasked):
        siblings = reader.siblings  # requires a MultiFieldSpanReader view
        return _doc_spans(
            MultiFieldSpanReader(siblings[node.field], siblings), node.child
        )
    if isinstance(node, SpanTerm):
        from ..index.postings import decode_term

        tid = reader.term_id(node.term)
        if tid is None:
            return {}
        docs, _ = decode_term(reader.enc, tid)
        return {
            int(d): np.stack([p, p], axis=1).astype(np.int64)
            for d, p in zip(docs, reader.term_positions(tid))
        }
    if isinstance(node, SpanOr):
        out: dict[int, np.ndarray] = {}
        for c in node.children:
            for d, iv in _doc_spans(reader, c).items():
                out[d] = np.concatenate([out[d], iv]) if d in out else iv
        return {d: _distinct(iv) for d, iv in out.items()}
    if isinstance(node, SpanNear):
        child = [_doc_spans(reader, c) for c in node.children]
        docs = set(child[0])
        for ci in child[1:]:
            docs &= set(ci)
        combine = _near_ordered_full if node.in_order else _near_unordered_full
        out = {}
        for d in docs:
            got = combine([ci[d] for ci in child], node.slop)
            if len(got):
                out[d] = got
        return out
    if isinstance(node, SpanNot):
        inc = _doc_spans(reader, node.include)
        exc = _doc_spans(reader, node.exclude)
        out = {}
        for d, iv in inc.items():
            ex = exc.get(d)
            if ex is None:
                out[d] = iv
                continue
            # overlap of [s - pre, e + post] with any exclude span:
            # exists (s2, e2) with s2 <= e + post and e2 >= s - pre
            hit = np.zeros(len(iv), bool)
            for s2, e2 in ex:
                hit |= (s2 <= iv[:, 1] + node.post) & (e2 >= iv[:, 0] - node.pre)
            keep = iv[~hit]
            if len(keep):
                out[d] = keep
        return out
    if isinstance(node, SpanFirst):
        child = _doc_spans(reader, node.child)
        out = {}
        for d, iv in child.items():
            keep = iv[iv[:, 1] < node.end]
            if len(keep):
                out[d] = keep
        return out
    if isinstance(node, SpanPositionRange):
        child = _doc_spans(reader, node.child)
        out = {}
        for d, iv in child.items():
            keep = iv[(iv[:, 0] >= node.start) & (iv[:, 1] < node.end)]
            if len(keep):
                out[d] = keep
        return out
    if isinstance(node, (SpanContaining, SpanWithin)):
        if isinstance(node, SpanContaining):
            prim, other = node.big, node.little
        else:
            prim, other = node.little, node.big
        a = _doc_spans(reader, prim)
        b = _doc_spans(reader, other)
        out = {}
        for d, iv in a.items():
            ov = b.get(d)
            if ov is None:
                continue
            hit = np.zeros(len(iv), bool)
            for s2, e2 in ov:
                if isinstance(node, SpanContaining):
                    hit |= (iv[:, 0] <= s2) & (e2 <= iv[:, 1])
                else:
                    hit |= (s2 <= iv[:, 0]) & (iv[:, 1] <= e2)
            keep = iv[hit]
            if len(keep):
                out[d] = keep
        return out
    raise TypeError(f"not a span node: {node!r}")


def span_char_spans(reader, node) -> dict[int, np.ndarray]:
    """doc -> (n, 2) CHARACTER spans of the span matches — the
    spans-aware highlighter seam (reference UnifiedHighlighter's
    PhraseHelper / OffsetsEnum over position-aligned offsets): a match
    span [s, e] (positions, inclusive) maps to [start_offset(token at s),
    end_offset(token at e)].  Both endpoints are occurrences of the
    tree's own terms, so the per-doc position->offset map is built from
    exactly those postings — never a stored-field re-analysis.  Requires
    index_options='offsets'."""
    if not getattr(reader, "has_offsets", False):
        raise ValueError("span highlighting needs index_options='offsets'")
    from ..index.postings import decode_term

    spans = _doc_spans(reader, node)
    if not spans:
        return {}
    # per-doc position -> (char start, char end) from the tree's terms
    pos_maps: dict[int, dict[int, tuple[int, int]]] = {}
    for t in set(span_terms(node)):
        tid = reader.term_id(t)
        if tid is None:
            continue
        docs, _ = decode_term(reader.enc, tid)
        plists = reader.term_positions(tid)
        olists = reader.term_offset_spans(tid)
        for d, p, (os_, oe) in zip(docs.tolist(), plists, olists):
            if d not in spans:
                continue
            m = pos_maps.setdefault(d, {})
            for pi, s_, e_ in zip(p.tolist(), os_.tolist(), oe.tolist()):
                m[pi] = (int(s_), int(e_))
    out: dict[int, np.ndarray] = {}
    for d, iv in spans.items():
        m = pos_maps.get(d, {})
        rows = [
            (m[int(s)][0], m[int(e)][1])
            for s, e in iv
            if int(s) in m and int(e) in m
        ]
        if rows:
            out[d] = np.asarray(sorted(set(rows)), np.int64).reshape(-1, 2)
    return out


def span_terms(node) -> tuple[str, ...]:
    """Every term occurrence in the span tree, in clause order with
    duplicates kept — the SpanWeight.buildSimWeight termStates collection
    (reference SpanWeight.java gathers the term contexts of ALL clauses,
    including SpanNot's exclusion arm, to build one SimScorer whose idf
    sums over them)."""
    if isinstance(node, SpanTerm):
        return (node.term,)
    if isinstance(node, SpanFieldMasked):
        return span_terms(node.child)
    if isinstance(node, (SpanOr, SpanNear)):
        return tuple(t for c in node.children for t in span_terms(c))
    if isinstance(node, SpanNot):
        return span_terms(node.include) + span_terms(node.exclude)
    if isinstance(node, (SpanFirst, SpanPositionRange)):
        return span_terms(node.child)
    if isinstance(node, SpanContaining):
        return span_terms(node.big) + span_terms(node.little)
    assert isinstance(node, SpanWithin)
    return span_terms(node.little) + span_terms(node.big)


def span_matches_segment(reader, node):
    """(local docids sorted, n_distinct_spans) for a span AST on one
    segment — the SpanWeight.getSpans + per-doc freq accumulation
    analogue, with the distinct-span count as the reported freq."""
    if not reader.has_positions:
        raise ValueError(
            "span queries need an index built with index_options='positions'"
        )
    spans = _doc_spans(reader, node)
    docs = np.sort(np.fromiter(spans.keys(), np.int64, len(spans)))
    live = getattr(reader, "live", None)
    if live is not None and len(docs):
        docs = docs[live[docs]]
    n = np.asarray([len(spans[int(d)]) for d in docs], np.int64)
    return docs, n
