"""Surround query language: parser + nested-interval evaluation.

Reference: queryparser/surround (QueryParser.jj; query/SrndQuery,
DistanceQuery, OrQuery, AndQuery, NotQuery, SrndTruncQuery;
query/SpanNearClauseFactory lowers a distance query to SpanNearQuery with
``slop = distance - 1``).

Syntax (operator names case-insensitive):

    a AND b, a OR b, a NOT b        boolean set operators (infix)
    AND(a, b, c), OR(a, b)          prefix forms
    a W b, a 3W b, 3W(a, b, c)      ordered distance (default 1 = adjacent)
    a N b, a 4N b, 4N(a, b, c)      unordered distance
    pre*, w?rd                      truncated terms (dictionary expansion)
    ( ... )                         grouping

Precedence (loosest to tightest): OR < AND < NOT < W/N, matching the
reference grammar's production nesting.

Distance semantics are the SpanNearQuery lowering: a combination of one
interval per child matches when ``span_width <= sum(child_widths) +
(distance - 1)``; for plain term children this is "all k terms within a
window of k + distance - 1 positions" — identical to the intervals
family's ``maxwidth`` machinery (multiterm.proximity_matches_segment).
W additionally requires the child intervals in query order and
non-overlapping (ordered spans).  Reported intervals are the MINIMAL set
(no result interval contains another), like IntervalIterators stream.

Evaluation is per segment: boolean nodes combine docid sets; distance
nodes evaluate per-doc interval lists (docs pre-intersected so the
quadratic minimal-window enumeration touches only candidate docs with
few positions each — the same work the oracle SQL self-join does).
Scoring: surround queries here are match-set queries (constant score),
the SrndQuery tree's BasicQueryFactory analogue.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

__all__ = ["parse_surround", "surround_matches_segment", "SurroundError"]


class SurroundError(ValueError):
    pass


# --- AST -------------------------------------------------------------------


@dataclass(frozen=True)
class STerm:
    text: str  # may contain * / ? truncation


@dataclass(frozen=True)
class SBool:
    op: str  # "and" | "or" | "not"  (not = AndNot: left minus right)
    children: tuple


@dataclass(frozen=True)
class SProx:
    dist: int
    ordered: bool
    children: tuple


# --- parser ----------------------------------------------------------------

_LEX = re.compile(r"\(|\)|,|[^\s(),]+")
_INFIX = re.compile(r"(?i)^(and|or|not|(\d*)([wn]))$")
_DISTOP = re.compile(r"(?i)^(\d*)([wn])$")


def _lex(text: str) -> list[str]:
    return _LEX.findall(text)


class _P:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise SurroundError("unexpected end of query")
        self.i += 1
        return t

    # precedence ladder: or < and < not < distance
    def parse_or(self):
        left = self.parse_and()
        while (t := self.peek()) is not None and t.lower() == "or":
            self.i += 1
            left = SBool("or", (left, self.parse_and()))
        return left

    def parse_and(self):
        left = self.parse_not()
        while (t := self.peek()) is not None and t.lower() == "and":
            self.i += 1
            left = SBool("and", (left, self.parse_not()))
        return left

    def parse_not(self):
        left = self.parse_dist()
        while (t := self.peek()) is not None and t.lower() == "not":
            self.i += 1
            left = SBool("not", (left, self.parse_dist()))
        return left

    def parse_dist(self):
        left = self.parse_prim()
        while (t := self.peek()) is not None:
            m = _DISTOP.match(t)
            # an infix distance op must be followed by an operand, not '('
            # of a prefix call (that case is handled in parse_prim)
            if m is None:
                break
            self.i += 1
            dist = int(m.group(1)) if m.group(1) else 1
            if dist < 1:
                raise SurroundError("distance must be >= 1")
            right = self.parse_prim()
            ordered = m.group(2).lower() == "w"
            # left-assoc chains flatten: a W b W c == W(a, b, c)
            if (
                isinstance(left, SProx)
                and left.ordered == ordered
                and left.dist == dist
            ):
                left = SProx(dist, ordered, left.children + (right,))
            else:
                left = SProx(dist, ordered, (left, right))
        return left

    def parse_prim(self):
        t = self.next()
        if t == "(":
            q = self.parse_or()
            if self.next() != ")":
                raise SurroundError("expected )")
            return q
        if t in (")", ","):
            raise SurroundError(f"unexpected {t!r}")
        # prefix operator call: NAME ( args )
        if self.peek() == "(" and _INFIX.match(t):
            self.i += 1  # consume '('
            args = [self.parse_or()]
            while self.peek() == ",":
                self.i += 1
                args.append(self.parse_or())
            if self.next() != ")":
                raise SurroundError("expected )")
            low = t.lower()
            if low in ("and", "or"):
                q = args[0]
                for a in args[1:]:
                    q = SBool(low, (q, a))
                return q
            if low == "not":
                if len(args) != 2:
                    raise SurroundError("NOT() takes exactly 2 arguments")
                return SBool("not", tuple(args))
            m = _DISTOP.match(t)
            dist = int(m.group(1)) if m.group(1) else 1
            if dist < 1:
                raise SurroundError("distance must be >= 1")
            if len(args) < 2:
                raise SurroundError("distance operator needs >= 2 arguments")
            return SProx(dist, m.group(2).lower() == "w", tuple(args))
        return STerm(t)


def parse_surround(text: str, analyzer=None):
    """Parse a surround query string into the AST; raises SurroundError on
    malformed input (the reference parser throws ParseException).  Terms
    are normalized through ``analyzer`` when given (truncation chars
    preserved)."""
    toks = _lex(text)
    if not toks:
        raise SurroundError("empty query")
    p = _P(toks)
    q = p.parse_or()
    if p.peek() is not None:
        raise SurroundError(f"trailing input at {p.peek()!r}")
    if analyzer is not None:

        def norm(node):
            if isinstance(node, STerm):
                if "*" in node.text or "?" in node.text:
                    return node  # truncated: dictionary-expanded at eval
                return STerm(analyzer.normalize(node.text))
            if isinstance(node, SBool):
                return SBool(node.op, tuple(norm(c) for c in node.children))
            return SProx(node.dist, node.ordered, tuple(norm(c) for c in node.children))

        q = norm(q)
    return q


# --- evaluation ------------------------------------------------------------


def _minimal(iv: np.ndarray) -> np.ndarray:
    """Minimal antichain of (n, 2) intervals: drop any interval that
    strictly contains another (IntervalIterators' minimal-set invariant)."""
    if len(iv) <= 1:
        return iv
    iv = iv[np.lexsort((iv[:, 1], iv[:, 0]))]
    # per start keep the smallest end
    keep_first = np.concatenate(([True], iv[1:, 0] != iv[:-1, 0]))
    iv = iv[keep_first]
    # descending start: keep if end < min end of all later (larger) starts
    out = []
    cur_min = np.iinfo(np.int64).max
    for s, e in iv[::-1]:
        if e < cur_min:
            out.append((s, e))
            cur_min = e
    return np.asarray(out[::-1], np.int64).reshape(-1, 2)


def _term_positions_by_doc(reader, text: str) -> dict[int, np.ndarray]:
    """doc -> sorted positions for a term or a truncated-term expansion
    (SrndTruncQuery: the literal prefix bounds the dictionary scan, the
    same discipline WildcardQuery uses in multiterm.py)."""
    import fnmatch

    if "*" in text or "?" in text:
        m = re.search(r"[*?]", text)
        lo = text[: m.start()].encode("utf-8")
        hi = lo + b"\xff\xff\xff\xff"
        rx = re.compile(fnmatch.translate(text))
        tids = [
            t
            for t in reader.term_id_range(lo, hi)
            if rx.match(reader.term_string(t))
        ]
    else:
        tid = reader.term_id(text)
        tids = [] if tid is None else [tid]
    from ..index.postings import decode_term

    merged: dict[int, list] = {}
    for tid in tids:
        docs, _ = decode_term(reader.enc, tid)
        for d, p in zip(docs.tolist(), reader.term_positions(tid)):
            merged.setdefault(d, []).append(np.asarray(p, np.int64))
    return {
        d: np.sort(np.concatenate(ps)) if len(ps) > 1 else np.asarray(ps[0])
        for d, ps in merged.items()
    }


def _doc_intervals(reader, node) -> dict[int, np.ndarray]:
    """doc -> minimal (n, 2) interval array for interval-bearing nodes."""
    if isinstance(node, STerm):
        return {
            d: np.stack([p, p], axis=1)
            for d, p in _term_positions_by_doc(reader, node.text).items()
        }
    if isinstance(node, SBool):
        if node.op != "or":
            raise SurroundError(
                "AND/NOT inside a distance operator is not supported "
                "(reference surround raises the same restriction via "
                "SpanNearClauseFactory)"
            )
        a = _doc_intervals(reader, node.children[0])
        b = _doc_intervals(reader, node.children[1])
        out = dict(a)
        for d, iv in b.items():
            out[d] = np.concatenate([out[d], iv]) if d in out else iv
        return {d: _minimal(iv) for d, iv in out.items()}
    assert isinstance(node, SProx)
    child_ivs = [_doc_intervals(reader, c) for c in node.children]
    docs = set(child_ivs[0])
    for ci in child_ivs[1:]:
        docs &= set(ci)
    slop = node.dist - 1
    out: dict[int, np.ndarray] = {}
    for d in docs:
        ivs = [ci[d] for ci in child_ivs]
        got = (
            _ordered_combine(ivs, slop)
            if node.ordered
            else _unordered_combine(ivs, slop)
        )
        if len(got):
            out[d] = got
    return out


def _ordered_combine(ivs: list[np.ndarray], slop: int) -> np.ndarray:
    """Greedy ordered chaining: for each first-child interval, each later
    child takes its earliest interval starting strictly after the previous
    end (non-overlapping, in order — ordered spans).  Greedy minimizes the
    chain end, so 'greedy fits' == 'some chain fits'."""
    res = []
    starts = [iv[:, 0] for iv in ivs]
    for s0, e0 in ivs[0]:
        prev_end = e0
        width_sum = e0 - s0 + 1
        ok = True
        for iv, st in zip(ivs[1:], starts[1:]):
            j = int(np.searchsorted(st, prev_end + 1, side="left"))
            if j == len(st):
                ok = False
                break
            s, e = iv[j]
            prev_end = e
            width_sum += e - s + 1
        if ok and (prev_end - s0 + 1) - width_sum <= slop:
            res.append((int(s0), int(prev_end)))
    return _minimal(np.asarray(res, np.int64).reshape(-1, 2))


def _unordered_combine(ivs: list[np.ndarray], slop: int) -> np.ndarray:
    """Minimal unordered covering windows: candidate window bounds come
    from interval starts/ends; a window covers a child when one of its
    intervals lies fully inside.  Width test uses each child's smallest
    covered interval (SpanNearQuery: width <= sum(child widths) + slop).
    Quadratic in per-doc occurrence count — bounded, matches the oracle
    SQL's self-join enumeration."""
    k = len(ivs)
    los = np.unique(np.concatenate([iv[:, 0] for iv in ivs]))
    res = []
    for lo in los.tolist():
        # tightest hi: for each child, earliest interval starting >= lo,
        # take the min possible end >= that; window hi = max over children
        hi = -1
        width_sum = 0
        ok = True
        for iv in ivs:
            inside = iv[iv[:, 0] >= lo]
            if len(inside) == 0:
                ok = False
                break
            ends = inside[:, 1]
            j = int(np.argmin(ends))
            hi = max(hi, int(ends[j]))
            width_sum += int(ends[j] - inside[j, 0] + 1)
        if not ok:
            continue
        # verify every child has an interval fully inside [lo, hi] (the
        # chosen min-end one is by construction), then the slop test
        if (hi - lo + 1) - width_sum <= slop:
            res.append((lo, hi))
    return _minimal(np.asarray(res, np.int64).reshape(-1, 2))


def surround_matches_segment(reader, node):
    """(local docids sorted, n_minimal_intervals) for a parsed surround
    query on one segment; boolean nodes yield n = -1 (match-set only)."""
    if isinstance(node, (STerm, SProx)) or (
        isinstance(node, SBool) and node.op == "or" and _interval_only(node)
    ):
        iv = _doc_intervals(reader, node)
        docs = np.sort(np.fromiter(iv.keys(), np.int64, len(iv)))
        docs = _live_only(reader, docs)
        n = np.asarray([len(iv[int(d)]) for d in docs], np.int64)
        return docs, n
    assert isinstance(node, SBool)
    a, _ = surround_matches_segment(reader, node.children[0])
    b, _ = surround_matches_segment(reader, node.children[1])
    if node.op == "and":
        docs = a[np.isin(a, b)]
    elif node.op == "or":
        docs = np.union1d(a, b)
    else:  # not: left minus right
        docs = a[~np.isin(a, b)]
    return docs, np.full(len(docs), -1, np.int64)


def _interval_only(node) -> bool:
    if isinstance(node, STerm):
        return True
    if isinstance(node, SProx):
        return True  # children validated at eval
    return node.op == "or" and all(_interval_only(c) for c in node.children)


def _live_only(reader, docs: np.ndarray) -> np.ndarray:
    live = getattr(reader, "live", None)
    return docs if live is None or len(docs) == 0 else docs[live[docs]]
