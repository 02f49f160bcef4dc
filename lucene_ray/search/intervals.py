"""Minimal-interval algebra + the flexible parser's ``fn:`` syntax.

Reference: lucene/queries/src/java/org/apache/lucene/queries/intervals
(Intervals.java factory semantics, OrderedIntervalsSource /
UnorderedIntervalsSource slop accounting, the containedBy/extend
desugarings of within / notWithin / before / after at
Intervals.java:560-592) and the StandardQueryParser grammar
(queryparser/flexible/standard/parser/StandardSyntaxParser.jj:370-560 —
the ``fn:NAME(...)`` interval-function productions, token spellings at
:172-192, bare/quoted IntervalText).

Every node evaluates, per segment per doc, to the MINIMAL interval set
(the antichain: no returned interval properly contains another) of
``(start, end, gaps)`` rows with INCLUSIVE ends — the same Vigna
semantics the proximity kernels document
(multiterm._sweep_minimal_windows).  Each combinator is a relational
expression over its children's minimal sets followed by
dedupe-and-minimalize, so the DuckDB oracle compiles from the SAME AST
(``_intervals_fn_sql`` in ``__ray_entry__.py``) and matches set AND
count exactly.  Documented deviation (same class as spans.py's): the
reference's lazy IntervalIterators can emit non-minimal intervals from
OR-shaped sources; we normalize every combinator to the minimal set.
Duplicate (start, end) intervals arising from different derivations
keep the SMALLEST gaps value (deterministic; mirrored in SQL).

``gaps`` follows the reference's slop accounting exactly
(OrderedIntervalsSource.java:165-171, UnorderedIntervalsSource.java
:157-159): gaps = width − Σ(child widths); term/phrase intervals carry
gaps = 0; filters and extend pass the source's gaps through; atLeast
applies the same formula over the matched subset.

Desugarings (Intervals.java):
  within(s, n, ref)     = containedBy(s, extend(ref, n, n))
  notWithin(s, n, ref)  = nonOverlapping(s, extend(ref, n, n))
  before(s, ref)        = s-intervals ending strictly before some
                          ref start (containedBy over the lead offset)
  after(s, ref)         = s-intervals starting strictly after some
                          ref end
  quoted "a b"          = phrase(a, b)  (AnalyzedText, maxGaps=0,
                          ordered — identical interval sets for
                          point-position tokens)
"""

from __future__ import annotations

import re
from itertools import combinations

import numpy as np

__all__ = ["parse_fn", "interval_matches_segment", "fn_terms"]

_MAX_EXPANSIONS = 128  # Intervals.DEFAULT_MAX_EXPANSIONS

# AST: ("term", t) | ("wildcard", pat) | ("fuzzy", term, max_edits)
# | ("or"|"ordered"|"unordered"|"phrase", [children])
# | ("atleast", n, [children]) | ("maxgaps"|"maxwidth", n, child)
# | ("extend", child, before, after)
# | ("containing"|"not_containing", big, small)
# | ("contained_by"|"not_contained_by", small, big)
# | ("overlapping"|"non_overlapping", src, ref)
# | ("before"|"after", src, ref)
# | ("within"|"not_within", src, n, ref)

_FN_NAMES = {
    "atleast": "atleast",
    "maxwidth": "maxwidth",
    "maxgaps": "maxgaps",
    "ordered": "ordered",
    "unordered": "unordered",
    "unorderednooverlaps": "unordered_no_overlaps",
    "or": "or",
    "wildcard": "wildcard",
    "after": "after",
    "before": "before",
    "phrase": "phrase",
    "containing": "containing",
    "notcontaining": "not_containing",
    "containedby": "contained_by",
    "notcontainedby": "not_contained_by",
    "within": "within",
    "notwithin": "not_within",
    "overlapping": "overlapping",
    "nonoverlapping": "non_overlapping",
    "extend": "extend",
    "fuzzyterm": "fuzzy",
}

_TOK_RX = re.compile(r"fn:[A-Za-z]+\(|\(|\)|\"[^\"]*\"|[^\s()\"]+")


def _tokens(s: str) -> list[str]:
    return _TOK_RX.findall(s)


def parse_fn(s: str):
    """Parse one interval expression per StandardSyntaxParser.jj's
    IntervalExpr production: ``fn:name( arg* )`` with nested functions,
    numbers, bare terms (IntervalText) and quoted phrases."""
    toks = _tokens(s)
    node, rest = _parse(toks)
    if rest:
        raise ValueError(f"trailing input in interval expression: {rest}")
    return node


def _parse(toks):
    if not toks:
        raise ValueError("empty interval expression")
    t = toks[0]
    if t.startswith("fn:"):
        name = t[3:-1].lower()
        if name not in _FN_NAMES:
            raise ValueError(f"unknown interval function fn:{name}")
        kind = _FN_NAMES[name]
        rest = toks[1:]
        args = []
        while rest and rest[0] != ")":
            arg, rest = _parse(rest)
            args.append(arg)
        if not rest:
            raise ValueError(f"unclosed fn:{name}(")
        rest = rest[1:]  # consume ')'
        return _build(kind, name, args), rest
    if t == ")" or t == "(":
        raise ValueError(f"unexpected '{t}'")
    if t.startswith('"'):
        words = t[1:-1].split()
        if len(words) == 1:
            return ("term", words[0]), toks[1:]
        return ("phrase", [("term", w) for w in words]), toks[1:]
    return ("term", t), toks[1:]


def _num(node, name) -> int:
    if node[0] != "term" or not node[1].lstrip("-").isdigit():
        raise ValueError(f"fn:{name} expects a number, got {node}")
    return int(node[1])


def _build(kind, name, args):
    if kind == "atleast":
        n = _num(args[0], name)
        if n < 1:  # Intervals.atLeast requires minShouldMatch >= 1
            raise ValueError(f"fn:atleast needs minShouldMatch >= 1, got {n}")
        return ("atleast", n, args[1:])
    if kind in ("maxwidth", "maxgaps"):
        n = _num(args[0], name)
        # maxwidth >= 1 (an interval has width >= 1); maxgaps >= 0
        if n < (1 if kind == "maxwidth" else 0):
            raise ValueError(f"fn:{kind} argument out of range: {n}")
        return (kind, n, args[1])
    if kind in ("ordered", "unordered", "or", "phrase"):
        return (kind, args)
    if kind == "unordered_no_overlaps":
        a, b = args
        # UnorderedNoOverlaps = unordered(a, b) minus overlapping tuples
        return ("unordered_no_overlaps", [a, b])
    if kind == "wildcard":
        if args[0][0] != "term":
            raise ValueError("fn:wildcard expects a pattern atom")
        return ("wildcard", args[0][1])
    if kind == "fuzzy":
        term = args[0][1]
        max_edits = _num(args[1], name) if len(args) > 1 else 2
        return ("fuzzy", term, max_edits)
    if kind in ("within", "not_within"):
        src, n, ref = args[0], _num(args[1], name), args[2]
        return (kind, src, n, ref)
    if kind == "extend":
        return ("extend", args[0], _num(args[1], name), _num(args[2], name))
    if kind in (
        "containing",
        "not_containing",
        "contained_by",
        "not_contained_by",
        "overlapping",
        "non_overlapping",
        "before",
        "after",
    ):
        a, b = args
        return (kind, a, b)
    raise ValueError(kind)  # pragma: no cover


def fn_terms(node) -> list[str]:
    """Literal terms in the tree (for stats / early pruning)."""
    k = node[0]
    if k == "term":
        return [node[1]]
    if k in ("wildcard", "fuzzy"):
        return []
    out = []
    for x in node[1:]:
        if isinstance(x, tuple):
            out += fn_terms(x)
        elif isinstance(x, list):
            for c in x:
                out += fn_terms(c)
    return out


# --- evaluation -----------------------------------------------------------


def _minimal(arr: np.ndarray) -> np.ndarray:
    """Dedupe (s, e) keeping min gaps, then keep the antichain: drop any
    interval that properly contains another (sort s asc / e desc; an
    interval is non-minimal iff some later row has e <= its e)."""
    if not len(arr):
        return arr.reshape(0, 3)
    order = np.lexsort((arr[:, 2], arr[:, 1], arr[:, 0]))
    arr = arr[order]
    keep_first = np.ones(len(arr), bool)
    keep_first[1:] = (arr[1:, 0] != arr[:-1, 0]) | (arr[1:, 1] != arr[:-1, 1])
    arr = arr[keep_first]  # min gaps per (s, e): sorted by g within group
    order = np.lexsort((-arr[:, 1], arr[:, 0]))
    arr = arr[order]
    e = arr[:, 1]
    # suffix min of e over rows strictly after i (their s >= s_i; equal-s
    # rows with smaller e sort after, so containment is caught)
    suf = np.minimum.accumulate(e[::-1])[::-1]
    keep = np.ones(len(arr), bool)
    keep[:-1] = suf[1:] > e[:-1]
    return arr[keep]


def _fold_join(maps: list[dict], mode: str) -> dict:
    """k-way tuple join over per-doc interval sets.  mode: 'ordered'
    (next.s > prev.e), 'phrase' (next.s == prev.e + 1), 'unordered'
    (free).  Carries (s, e, sumw) partials; gaps derived at the end."""
    common = set(maps[0])
    for m in maps[1:]:
        common &= set(m)
    out = {}
    for d in common:
        parts = maps[0][d]
        # partial rows: (s, e, sumw)
        cur = np.stack(
            [parts[:, 0], parts[:, 1], parts[:, 1] - parts[:, 0] + 1], axis=1
        )
        for m in maps[1:]:
            nxt = m[d]
            li = np.repeat(np.arange(len(cur)), len(nxt))
            ri = np.tile(np.arange(len(nxt)), len(cur))
            a, b = cur[li], nxt[ri]
            if mode == "ordered":
                ok = b[:, 0] > a[:, 1]
                s, e = a[:, 0], b[:, 1]
            elif mode == "phrase":
                ok = b[:, 0] == a[:, 1] + 1
                s, e = a[:, 0], b[:, 1]
            else:
                ok = np.ones(len(a), bool)
                s = np.minimum(a[:, 0], b[:, 0])
                e = np.maximum(a[:, 1], b[:, 1])
            w = a[:, 2] + (b[:, 1] - b[:, 0] + 1)
            cur = np.stack([s[ok], e[ok], w[ok]], axis=1)
            if not len(cur):
                break
        if not len(cur):
            continue
        if mode == "phrase":
            g = np.zeros(len(cur), np.int64)
        else:
            g = (cur[:, 1] - cur[:, 0] + 1) - cur[:, 2]
        res = _minimal(np.stack([cur[:, 0], cur[:, 1], g], axis=1))
        if len(res):
            out[d] = res
    return out


def _filter_pairs(src: dict, ref: dict, pred, negate: bool) -> dict:
    """Keep src intervals where EXISTS (negate: NOT EXISTS) a ref
    interval satisfying pred(s, e, rs, re) in the same doc."""
    out = {}
    for d, arr in src.items():
        r = ref.get(d)
        if r is None or not len(r):
            hit = np.zeros(len(arr), bool)
        else:
            s, e = arr[:, 0][:, None], arr[:, 1][:, None]
            rs, re_ = r[:, 0][None, :], r[:, 1][None, :]
            hit = pred(s, e, rs, re_).any(axis=1)
        keep = ~hit if negate else hit
        if keep.any():
            out[d] = arr[keep]
    return out


def eval_intervals(reader, node) -> dict[int, np.ndarray]:
    """dict: local docid -> minimal (n, 3) [start, end, gaps] array."""
    from .multiterm import _fuzzy_term_ids, _term_pos_map

    k = node[0]
    if k == "term":
        m = _term_pos_map(reader, node[1])
        if m is None:
            return {}
        return {
            d: np.stack([p, p, np.zeros(len(p), np.int64)], axis=1)
            for d, p in m.items()
        }
    if k in ("wildcard", "fuzzy"):
        if k == "wildcard":
            from .multiterm import expand_pattern_tids

            tids = expand_pattern_tids(reader, "wildcard", node[1])
        else:
            tids = list(_fuzzy_term_ids(reader, node[1], node[2], True))
        if len(tids) > _MAX_EXPANSIONS:
            # Intervals.wildcard/fuzzyTerm throw past DEFAULT_MAX_EXPANSIONS
            raise ValueError(
                f"interval multi-term expands to {len(tids)} > {_MAX_EXPANSIONS}"
            )
        per_doc: dict[int, list] = {}
        for tid in tids:
            from ..index.postings import decode_term

            docs, _ = decode_term(reader.enc, tid)
            for d, p in zip(docs, reader.term_positions(tid)):
                per_doc.setdefault(int(d), []).append(np.asarray(p))
        return {
            d: _minimal(
                np.stack(
                    [
                        (pp := np.unique(np.concatenate(ps))),
                        pp,
                        np.zeros(len(pp), np.int64),
                    ],
                    axis=1,
                )
            )
            for d, ps in per_doc.items()
        }
    if k == "or":
        maps = [eval_intervals(reader, c) for c in node[1]]
        out = {}
        for m in maps:
            for d, arr in m.items():
                out.setdefault(d, []).append(arr)
        return {
            d: _minimal(np.concatenate(arrs)) for d, arrs in out.items()
        }
    if k in ("ordered", "unordered", "phrase"):
        maps = [eval_intervals(reader, c) for c in node[1]]
        if any(not m for m in maps):
            return {}
        return _fold_join(maps, k)
    if k == "unordered_no_overlaps":
        a = eval_intervals(reader, node[1][0])
        b = eval_intervals(reader, node[1][1])
        out = {}
        for d in set(a) & set(b):
            x, y = a[d], b[d]
            li = np.repeat(np.arange(len(x)), len(y))
            ri = np.tile(np.arange(len(y)), len(x))
            p, q = x[li], y[ri]
            # tuples whose two intervals do NOT overlap
            ok = (p[:, 1] < q[:, 0]) | (q[:, 1] < p[:, 0])
            if not ok.any():
                continue
            s = np.minimum(p[:, 0], q[:, 0])[ok]
            e = np.maximum(p[:, 1], q[:, 1])[ok]
            w = (p[:, 1] - p[:, 0] + 1 + q[:, 1] - q[:, 0] + 1)[ok]
            res = _minimal(np.stack([s, e, e - s + 1 - w], axis=1))
            if len(res):
                out[d] = res
        return out
    if k == "atleast":
        n, children = node[1], node[2]
        maps = [eval_intervals(reader, c) for c in children]
        if n > len(children):
            return {}
        if n == len(children):  # Intervals.atLeast: == unordered
            if any(not m for m in maps):
                return {}
            return _fold_join(maps, "unordered")
        out: dict[int, list] = {}
        for combo in combinations(range(len(children)), n):
            sub = [maps[i] for i in combo]
            if any(not m for m in sub):
                continue
            for d, arr in _fold_join(sub, "unordered").items():
                out.setdefault(d, []).append(arr)
        return {d: _minimal(np.concatenate(a)) for d, a in out.items()}
    if k == "maxgaps":
        src = eval_intervals(reader, node[2])
        return {
            d: a[a[:, 2] <= node[1]]
            for d, a in src.items()
            if (a[:, 2] <= node[1]).any()
        }
    if k == "maxwidth":
        src = eval_intervals(reader, node[2])
        return {
            d: a[a[:, 1] - a[:, 0] + 1 <= node[1]]
            for d, a in src.items()
            if (a[:, 1] - a[:, 0] + 1 <= node[1]).any()
        }
    if k == "extend":
        src = eval_intervals(reader, node[1])
        b, a_ = node[2], node[3]
        return {
            d: np.stack(
                [np.maximum(arr[:, 0] - b, 0), arr[:, 1] + a_, arr[:, 2]],
                axis=1,
            )
            for d, arr in src.items()
        }
    if k == "within":
        return eval_intervals(
            reader,
            ("contained_by", node[1], ("extend", node[3], node[2], node[2])),
        )
    if k == "not_within":
        return eval_intervals(
            reader,
            ("non_overlapping", node[1], ("extend", node[3], node[2], node[2])),
        )
    src = eval_intervals(reader, node[1])
    ref = eval_intervals(reader, node[2])
    if k in ("containing", "not_containing"):
        return _filter_pairs(
            src,
            ref,
            lambda s, e, rs, re_: (rs >= s) & (re_ <= e),
            negate=k == "not_containing",
        )
    if k in ("contained_by", "not_contained_by"):
        return _filter_pairs(
            src,
            ref,
            lambda s, e, rs, re_: (s >= rs) & (e <= re_),
            negate=k == "not_contained_by",
        )
    if k in ("overlapping", "non_overlapping"):
        return _filter_pairs(
            src,
            ref,
            lambda s, e, rs, re_: (s <= re_) & (rs <= e),
            negate=k == "non_overlapping",
        )
    if k == "before":
        return _filter_pairs(
            src, ref, lambda s, e, rs, re_: e < rs, negate=False
        )
    if k == "after":
        return _filter_pairs(
            src, ref, lambda s, e, rs, re_: s > re_, negate=False
        )
    raise ValueError(k)  # pragma: no cover


def interval_matches_segment(reader, node):
    """(local docids, n_minimal_intervals) for one fn: expression —
    live-doc masked, sorted by docid."""
    res = eval_intervals(reader, node)
    if not res:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    docs = np.array(sorted(res), dtype=np.int64)
    if getattr(reader, "live", None) is not None and len(docs):
        docs = docs[reader.live[docs]]
    ns = np.array([len(res[int(d)]) for d in docs], dtype=np.int64)
    keep = ns > 0
    return docs[keep], ns[keep]


# --- oracle compilation ----------------------------------------------------


def _sql_escape(t: str) -> str:
    return t.replace("'", "''")


def fn_sql_ctes(node, pos_rel: str, ctes: list, counter: list) -> str:
    """Compile one AST node to a CTE chain over ``pos_rel`` (doc_id, tok,
    p) and return the final relation name; every relation has columns
    (doc_id, s, e, g).  The compiler walks the SAME AST eval_intervals
    runs — combinators append a dedupe-and-minimalize CTE exactly where
    the engine calls _minimal, so the oracle is a semantic cross-check,
    not a second hand-derivation (the _surround_sql pattern)."""

    def fresh() -> str:
        counter[0] += 1
        return f"iv{counter[0]}"

    def emit(sql: str) -> str:
        name = fresh()
        ctes.append(f"{name} AS ({sql})")
        return name

    def minimalize(rel: str) -> str:
        return emit(
            f"SELECT x.doc_id, x.s, x.e, x.g FROM "
            f"(SELECT doc_id, s, e, min(g) AS g FROM {rel} GROUP BY 1, 2, 3) x "
            f"WHERE NOT EXISTS (SELECT 1 FROM {rel} y "
            f"WHERE y.doc_id = x.doc_id AND y.s >= x.s AND y.e <= x.e "
            f"AND (y.s > x.s OR y.e < x.e))"
        )

    def join_rel(children: list[str], mode: str) -> str:
        k = len(children)
        joins = f"{children[0]} a0"
        for i in range(1, k):
            cond = f"a{i}.doc_id = a0.doc_id"
            if mode == "ordered":
                cond += f" AND a{i}.s > a{i - 1}.e"
            elif mode == "phrase":
                cond += f" AND a{i}.s = a{i - 1}.e + 1"
            joins += f" JOIN {children[i]} a{i} ON {cond}"
        widths = " + ".join(f"(a{i}.e - a{i}.s + 1)" for i in range(k))
        if mode in ("ordered", "phrase"):
            s, e = "a0.s", f"a{k - 1}.e"
        else:
            s = "least(" + ", ".join(f"a{i}.s" for i in range(k)) + ")"
            e = "greatest(" + ", ".join(f"a{i}.e" for i in range(k)) + ")"
        g = "0::BIGINT" if mode == "phrase" else f"({e}) - ({s}) + 1 - ({widths})"
        return emit(
            f"SELECT a0.doc_id, {s} AS s, {e} AS e, ({g})::BIGINT AS g FROM {joins}"
        )

    def rec(n) -> str:
        return fn_sql_ctes(n, pos_rel, ctes, counter)

    k = node[0]
    if k == "term":
        return emit(
            f"SELECT doc_id, p AS s, p AS e, 0::BIGINT AS g FROM {pos_rel} "
            f"WHERE tok = '{_sql_escape(node[1])}'"
        )
    if k == "wildcard":
        like = node[1].replace("*", "%").replace("?", "_")
        return emit(
            f"SELECT doc_id, p AS s, p AS e, 0::BIGINT AS g FROM {pos_rel} "
            f"WHERE tok LIKE '{_sql_escape(like)}'"
        )
    if k == "fuzzy":
        return emit(
            f"SELECT doc_id, p AS s, p AS e, 0::BIGINT AS g FROM {pos_rel} "
            f"WHERE damerau_levenshtein(tok, '{_sql_escape(node[1])}') <= {node[2]}"
        )
    if k == "or":
        u = " UNION ALL ".join(f"SELECT * FROM {rec(c)}" for c in node[1])
        return minimalize(emit(u))
    if k in ("ordered", "unordered", "phrase"):
        return minimalize(join_rel([rec(c) for c in node[1]], k))
    if k == "unordered_no_overlaps":
        a, b = rec(node[1][0]), rec(node[1][1])
        rel = emit(
            f"SELECT a.doc_id, least(a.s, b.s) AS s, greatest(a.e, b.e) AS e, "
            f"(greatest(a.e, b.e) - least(a.s, b.s) + 1 "
            f"- (a.e - a.s + 1) - (b.e - b.s + 1))::BIGINT AS g "
            f"FROM {a} a JOIN {b} b ON b.doc_id = a.doc_id "
            f"AND (a.e < b.s OR b.e < a.s)"
        )
        return minimalize(rel)
    if k == "atleast":
        n, children = node[1], node[2]
        rels = [rec(c) for c in children]
        if n > len(children):
            return emit(
                "SELECT doc_id, s, e, g FROM (SELECT 0::BIGINT AS doc_id, "
                "0::BIGINT AS s, 0::BIGINT AS e, 0::BIGINT AS g) WHERE false"
            )
        combos = (
            [tuple(range(len(children)))]
            if n == len(children)
            else list(combinations(range(len(children)), n))
        )
        u = " UNION ALL ".join(
            f"SELECT * FROM {join_rel([rels[i] for i in c], 'unordered')}"
            for c in combos
        )
        return minimalize(emit(u))
    if k == "maxgaps":
        return emit(f"SELECT * FROM {rec(node[2])} WHERE g <= {node[1]}")
    if k == "maxwidth":
        return emit(
            f"SELECT * FROM {rec(node[2])} WHERE e - s + 1 <= {node[1]}"
        )
    if k == "extend":
        return emit(
            f"SELECT doc_id, greatest(s - {node[2]}, 0) AS s, "
            f"e + {node[3]} AS e, g FROM {rec(node[1])}"
        )
    if k == "within":
        return rec(
            ("contained_by", node[1], ("extend", node[3], node[2], node[2]))
        )
    if k == "not_within":
        return rec(
            ("non_overlapping", node[1], ("extend", node[3], node[2], node[2]))
        )
    preds = {
        "containing": ("r.s >= x.s AND r.e <= x.e", False),
        "not_containing": ("r.s >= x.s AND r.e <= x.e", True),
        "contained_by": ("x.s >= r.s AND x.e <= r.e", False),
        "not_contained_by": ("x.s >= r.s AND x.e <= r.e", True),
        "overlapping": ("x.s <= r.e AND r.s <= x.e", False),
        "non_overlapping": ("x.s <= r.e AND r.s <= x.e", True),
        "before": ("x.e < r.s", False),
        "after": ("x.s > r.e", False),
    }
    if k in preds:
        cond, neg = preds[k]
        src, ref = rec(node[1]), rec(node[2])
        ex = "NOT EXISTS" if neg else "EXISTS"
        return emit(
            f"SELECT x.* FROM {src} x WHERE {ex} "
            f"(SELECT 1 FROM {ref} r WHERE r.doc_id = x.doc_id AND {cond})"
        )
    raise ValueError(k)  # pragma: no cover


def min_extent(node) -> int:
    """The source's minimum possible interval length (IntervalsSource
    .minExtent): atoms 1; ordered/unordered/phrase/unorderedNoOverlaps
    sum their children; or/atleast take the smallest alternative
    (atleast: sum of the n smallest child extents); width/gap filters,
    pair filters and the within/before/after family keep the source's;
    extend adds before + after."""
    k = node[0]
    if k in ("term", "wildcard", "fuzzy"):
        return 1
    if k in ("ordered", "unordered", "phrase", "unordered_no_overlaps"):
        return sum(min_extent(c) for c in node[1])
    if k == "or":
        return min(min_extent(c) for c in node[1])
    if k == "atleast":
        exts = sorted(min_extent(c) for c in node[2])
        return sum(exts[: node[1]])
    if k in ("maxgaps", "maxwidth"):
        return min_extent(node[2])
    if k == "extend":
        return min_extent(node[1]) + node[2] + node[3]
    if k in ("within", "not_within"):
        return min_extent(node[1])
    return min_extent(node[1])  # pair filters keep the source's extent


SLOPPY_SCALE = 1 << 20  # fixed-point grid for the order-free sloppy freq


def sloppy_freq_int(arr: np.ndarray, minext: int) -> int:
    """IntervalScorer's sloppy frequency (queries/intervals/
    IntervalScorer.java:63-66: freq += 1 / max(length - minExtent + 1,
    1)) on a 2^-20 fixed-point grid: each interval contributes
    SLOPPY_SCALE // denom, so partial sums combine EXACTLY in any order
    (documented deviation from the reference's float accumulation —
    necessary for a combine-order-independent distributed sum)."""
    if not len(arr):
        return 0
    d = np.maximum(arr[:, 1] - arr[:, 0] + 1 - minext + 1, 1)
    return int((SLOPPY_SCALE // d).sum())


def freeze(node):
    """Recursively convert list children to tuples so an fn: AST can live
    inside a frozen (hashable, picklable) Query dataclass."""
    if isinstance(node, list):
        return tuple(freeze(x) for x in node)
    if isinstance(node, tuple):
        return tuple(freeze(x) for x in node)
    return node
