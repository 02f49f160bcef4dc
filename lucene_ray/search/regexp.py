"""Regexp -> DFA compilation for dictionary intersection.

Reference: lucene/core/src/java/org/apache/lucene/util/automaton/
``RegExp.java`` (parse -> Automaton), ``CompiledAutomaton.java``
(getCommonPrefix + the RunAutomaton used to intersect a compiled DFA
with the block-tree terms dictionary in
``Lucene103BlockTreeTermsReader.intersect``).

Engine shape: RegexpQuery keeps Python-``re`` / RE2 full-match SEMANTICS
(the DuckDB ``regexp_full_match`` oracle must agree), but the matching
machinery is a Thompson NFA -> subset-construction DFA over codepoint
equivalence classes, giving:

- ``common_prefix()``: the longest literal string every accepted word
  starts with (walk the DFA while a state has exactly one live outgoing
  codepoint) — used to bound the dictionary scan to a ``term_id_range``
  slice instead of the full vocabulary;
- ``min_len`` / ``max_len``: accepted-word length bounds (max_len is
  None when the language is infinite) — a vectorized length pre-filter
  on the slice;
- ``match_lens_matrix()``: ONE numpy DFA run over a padded (n, L)
  codepoint matrix — no per-term Python in the hot loop.

Patterns using non-regular or unsupported constructs (backreferences,
lookaround, inline flags, anchors mid-pattern, \\x{..} escapes) raise
``UnsupportedRegexp``; the caller falls back to the legacy ``re``
full-dictionary scan for those, so behavior is never lost.
"""

from __future__ import annotations

import numpy as np

MAX_CP = 0x10FFFF
_MAX_DFA_STATES = 4096
_MAX_REPEAT = 64


class UnsupportedRegexp(ValueError):
    """Pattern outside the compilable regular subset."""


# --------------------------------------------------------------------------
# parse: pattern -> AST
# ("lit", ranges) ranges = tuple of (lo, hi) codepoint ranges
# ("cat", [nodes]) / ("alt", [nodes]) / ("star", node) / ("opt", node)
# ("eps",)

# \d is ASCII-identical in Python re (no re.UNICODE digits appear in
# terms in practice, but Python's \d DOES match e.g. '٣') — like \w and
# \s it is Unicode-aware in re and ASCII in RE2, so all three fall back
# to the legacy re scan rather than risk a semantics fork.
_CLASS_ESCAPES: dict[str, tuple] = {}
_LITERAL_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "f": "\f", "v": "\v", "a": "\a",
    "\\": "\\", ".": ".", "*": "*", "+": "+", "?": "?", "(": "(", ")": ")",
    "[": "[", "]": "]", "{": "{", "}": "}", "|": "|", "^": "^", "$": "$",
    "-": "-", "/": "/", "'": "'", '"': '"', " ": " ", ",": ",", ":": ":",
    "=": "=", "<": "<", ">": ">", "!": "!", "@": "@", "#": "#", "&": "&",
    "~": "~", "%": "%", ";": ";", "`": "`", "_": "_",
}


def _negate(ranges):
    """Complement of sorted disjoint ranges within [0, MAX_CP]."""
    out, prev = [], 0
    for lo, hi in sorted(ranges):
        if lo > prev:
            out.append((prev, lo - 1))
        prev = max(prev, hi + 1)
    if prev <= MAX_CP:
        out.append((prev, MAX_CP))
    return tuple(out)


_DOT = _negate(((ord("\n"), ord("\n")),))  # re default: '.' excludes \n


class _Parser:
    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def _peek(self):
        return self.p[self.i] if self.i < len(self.p) else None

    def _next(self):
        c = self.p[self.i]
        self.i += 1
        return c

    def parse(self):
        node = self._alt()
        if self.i != len(self.p):
            raise UnsupportedRegexp(f"trailing input at {self.i}: {self.p!r}")
        return node

    def _alt(self):
        branches = [self._concat()]
        while self._peek() == "|":
            self._next()
            branches.append(self._concat())
        return branches[0] if len(branches) == 1 else ("alt", branches)

    def _concat(self):
        nodes = []
        while self._peek() not in (None, "|", ")"):
            nodes.append(self._repeat())
        if not nodes:
            return ("eps",)
        return nodes[0] if len(nodes) == 1 else ("cat", nodes)

    def _repeat(self):
        node = self._atom()
        c = self._peek()
        if c == "*":
            self._next()
            node = ("star", node)
        elif c == "+":
            self._next()
            node = ("cat", [node, ("star", node)])
        elif c == "?":
            self._next()
            node = ("opt", node)
        elif c == "{":
            node = self._braces(node)
        else:
            return node
        # lazy quantifier suffix: same language for full match
        if self._peek() == "?":
            self._next()
        if self._peek() in ("*", "+", "?", "{"):
            # possessive (a?+) / stacked (a**) quantifiers: possessive
            # backtracking semantics diverge from the DFA language
            raise UnsupportedRegexp("stacked or possessive quantifier")
        return node

    def _braces(self, node):
        j = self.p.find("}", self.i)
        if j < 0:
            raise UnsupportedRegexp("unclosed {")
        body = self.p[self.i + 1 : j]
        parts = body.split(",")
        try:
            if len(parts) == 1:
                m = n = int(parts[0])
            elif len(parts) == 2:
                m = int(parts[0]) if parts[0] else 0
                n = int(parts[1]) if parts[1] else None
            else:
                raise ValueError
        except ValueError:
            raise UnsupportedRegexp(f"bad repeat {{{body}}}") from None
        if m > _MAX_REPEAT or (n is not None and (n > _MAX_REPEAT or n < m)):
            raise UnsupportedRegexp(f"repeat too large {{{body}}}")
        self.i = j + 1
        out = [node] * m
        if n is None:
            out.append(("star", node))
        else:
            out.extend([("opt", node)] * (n - m))
        if not out:
            return ("eps",)
        return out[0] if len(out) == 1 else ("cat", out)

    def _atom(self):
        c = self._next()
        if c == "(":
            if self._peek() == "?":
                # only the non-capturing group flavor is regular-safe
                if self.p[self.i : self.i + 2] == "?:":
                    self.i += 2
                else:
                    raise UnsupportedRegexp("(?...) construct")
            node = self._alt()
            if self._peek() != ")":
                raise UnsupportedRegexp("unclosed (")
            self._next()
            return node
        if c == "[":
            return ("lit", self._char_class())
        if c == ".":
            return ("lit", _DOT)
        if c == "\\":
            return ("lit", self._escape(in_class=False))
        if c in "*+?{":
            raise UnsupportedRegexp(f"dangling quantifier {c!r}")
        if c in "^$":
            raise UnsupportedRegexp("anchors unsupported (full match is implicit)")
        return ("lit", ((ord(c), ord(c)),))

    def _escape(self, in_class: bool):
        if self._peek() is None:
            raise UnsupportedRegexp("trailing backslash")
        c = self._next()
        if c.lower() in "dws":
            raise UnsupportedRegexp(
                f"\\{c}: Unicode-aware in Python re, ASCII in RE2 — fallback"
            )
        if c in _LITERAL_ESCAPES:
            ch = _LITERAL_ESCAPES[c]
            return ((ord(ch), ord(ch)),)
        if c == "0":
            return ((0, 0),)
        raise UnsupportedRegexp(f"escape \\{c}")

    def _char_class(self):
        neg = False
        if self._peek() == "^":
            self._next()
            neg = True
        ranges: list[tuple[int, int]] = []
        first = True
        while True:
            c = self._peek()
            if c is None:
                raise UnsupportedRegexp("unclosed [")
            if c == "]" and not first:
                self._next()
                break
            first = False
            self._next()
            if c == "\\":
                sub = self._escape(in_class=True)
                if len(sub) != 1 or sub[0][0] != sub[0][1]:
                    ranges.extend(sub)  # class escape: no range form
                    continue
                lo = sub[0][0]
            else:
                lo = ord(c)
            if self._peek() == "-" and self.p[self.i + 1 : self.i + 2] not in ("]", ""):
                self._next()
                hc = self._next()
                if hc == "\\":
                    sub = self._escape(in_class=True)
                    if len(sub) != 1 or sub[0][0] != sub[0][1]:
                        raise UnsupportedRegexp("class escape as range end")
                    hi = sub[0][0]
                else:
                    hi = ord(hc)
                if hi < lo:
                    raise UnsupportedRegexp("reversed class range")
                ranges.append((lo, hi))
            else:
                ranges.append((lo, lo))
        if not ranges:
            raise UnsupportedRegexp("empty class")
        # normalize: sort + merge
        ranges.sort()
        merged = [list(ranges[0])]
        for lo, hi in ranges[1:]:
            if lo <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], hi)
            else:
                merged.append([lo, hi])
        out = tuple((a, b) for a, b in merged)
        return _negate(out) if neg else out


# --------------------------------------------------------------------------
# Thompson NFA


class _NFA:
    def __init__(self):
        self.eps: list[list[int]] = []
        self.edges: list[list[tuple[int, int, int]]] = []  # (lo, hi, target)

    def state(self) -> int:
        self.eps.append([])
        self.edges.append([])
        return len(self.eps) - 1

    def build(self, node, src: int, dst: int) -> None:
        kind = node[0]
        if kind == "eps":
            self.eps[src].append(dst)
        elif kind == "lit":
            for lo, hi in node[1]:
                self.edges[src].append((lo, hi, dst))
        elif kind == "cat":
            cur = src
            for sub in node[1][:-1]:
                nxt = self.state()
                self.build(sub, cur, nxt)
                cur = nxt
            self.build(node[1][-1], cur, dst)
        elif kind == "alt":
            for sub in node[1]:
                a, b = self.state(), self.state()
                self.eps[src].append(a)
                self.build(sub, a, b)
                self.eps[b].append(dst)
        elif kind == "opt":
            self.eps[src].append(dst)
            self.build(node[1], src, dst)
        elif kind == "star":
            hub = self.state()
            self.eps[src].append(hub)
            self.eps[hub].append(dst)
            a, b = self.state(), self.state()
            self.eps[hub].append(a)
            self.build(node[1], a, b)
            self.eps[b].append(hub)
        else:  # pragma: no cover
            raise AssertionError(kind)


def _eps_closure(nfa: _NFA, states: frozenset[int]) -> frozenset[int]:
    stack, seen = list(states), set(states)
    while stack:
        s = stack.pop()
        for t in nfa.eps[s]:
            if t not in seen:
                seen.add(t)
                stack.append(t)
    return frozenset(seen)


# --------------------------------------------------------------------------
# DFA


class CompiledRegexp:
    """Deterministic automaton over codepoint equivalence classes.

    ``class_starts`` (k,) int32: sorted class boundaries (class j covers
    [class_starts[j], class_starts[j+1])); ``trans`` (n_states, k) int32
    with a dead sink state; ``accept`` (n_states,) bool; state 0 = dead,
    state ``start`` = initial.
    """

    def __init__(self, pattern: str):
        ast = _Parser(pattern).parse()
        nfa = _NFA()
        s0, s1 = nfa.state(), nfa.state()
        nfa.build(ast, s0, s1)

        # alphabet partition: all edge boundaries
        points = {0}
        for elist in nfa.edges:
            for lo, hi, _ in elist:
                points.add(lo)
                if hi + 1 <= MAX_CP:
                    points.add(hi + 1)
        self.class_starts = np.array(sorted(points), dtype=np.int64)
        k = len(self.class_starts)

        # subset construction
        start_set = _eps_closure(nfa, frozenset({s0}))
        ids: dict[frozenset[int], int] = {frozenset(): 0}
        trans_rows: list[np.ndarray] = [np.zeros(k, np.int32)]  # dead sink
        accept: list[bool] = [False]

        def intern(ss: frozenset[int]) -> int:
            sid = ids.get(ss)
            if sid is None:
                sid = len(trans_rows)
                if sid > _MAX_DFA_STATES:
                    raise UnsupportedRegexp("DFA too large")
                ids[ss] = sid
                trans_rows.append(np.zeros(k, np.int32))
                accept.append(s1 in ss)
                todo.append(ss)
            return sid

        todo: list[frozenset[int]] = []
        self.start = intern(start_set)
        while todo:
            ss = todo.pop()
            row = trans_rows[ids[ss]]
            for j, cs in enumerate(self.class_starts):
                moved = frozenset(
                    t
                    for s in ss
                    for lo, hi, t in nfa.edges[s]
                    if lo <= cs <= hi
                )
                if moved:
                    row[j] = intern(_eps_closure(nfa, moved))
        self.trans = np.vstack(trans_rows)
        self.accept = np.array(accept, dtype=bool)
        self._bounds: tuple[int, int | None] | None = None

    # -- single-string check (tests / fallback correctness oracle) ---------
    def matches(self, s: str) -> bool:
        st = self.start
        for ch in s:
            j = int(np.searchsorted(self.class_starts, ord(ch), side="right")) - 1
            st = int(self.trans[st, j])
            if st == 0:
                return False
        return bool(self.accept[st])

    # -- CompiledAutomaton.getCommonPrefix ---------------------------------
    def common_prefix(self) -> str:
        """Longest literal prefix of every accepted word: follow the DFA
        while the state is non-accepting and has exactly one live
        transition covering exactly one codepoint."""
        out: list[str] = []
        st = self.start
        seen = set()
        while st not in seen:
            seen.add(st)
            if self.accept[st]:
                break
            row = self.trans[st]
            live = np.nonzero(row)[0]
            if len(live) != 1:
                break
            j = int(live[0])
            lo = int(self.class_starts[j])
            hi = (
                int(self.class_starts[j + 1]) - 1
                if j + 1 < len(self.class_starts)
                else MAX_CP
            )
            if lo != hi:
                break
            out.append(chr(lo))
            st = int(row[j])
        return "".join(out)

    # -- accepted-word length bounds ---------------------------------------
    def length_bounds(self) -> tuple[int, int | None]:
        """(min_len, max_len) of accepted words; max_len None = unbounded.
        BFS for min; longest-path on the live subgraph for max (None as
        soon as a cycle is live = reachable AND co-reachable)."""
        if self._bounds is not None:
            return self._bounds
        n = len(self.accept)
        nexts = [set(np.unique(self.trans[s])) - {0} for s in range(n)]
        # reachable from start
        reach = {self.start}
        stack = [self.start]
        while stack:
            s = stack.pop()
            for t in nexts[s]:
                if t not in reach:
                    reach.add(t)
                    stack.append(t)
        # co-reachable to an accept state
        prevs: list[set[int]] = [set() for _ in range(n)]
        for s in range(n):
            for t in nexts[s]:
                prevs[t].add(s)
        co = {s for s in range(n) if self.accept[s]}
        stack = list(co)
        while stack:
            s = stack.pop()
            for t in prevs[s]:
                if t not in co:
                    co.add(t)
                    stack.append(t)
        live = reach & co
        if self.start not in live:
            self._bounds = (1, 0)  # empty language: no lengths valid
            return self._bounds
        # min: BFS
        from collections import deque

        dist = {self.start: 0}
        dq = deque([self.start])
        min_len = None
        while dq:
            s = dq.popleft()
            if self.accept[s]:
                min_len = dist[s]
                break
            for t in nexts[s]:
                if t in live and t not in dist:
                    dist[t] = dist[s] + 1
                    dq.append(t)
        # max: topological longest path; cycle in live subgraph -> None
        indeg = {s: 0 for s in live}
        for s in live:
            for t in nexts[s]:
                if t in live:
                    indeg[t] += 1
        order, dq = [], deque([s for s in live if indeg[s] == 0])
        while dq:
            s = dq.popleft()
            order.append(s)
            for t in nexts[s]:
                if t in live:
                    indeg[t] -= 1
                    if indeg[t] == 0:
                        dq.append(t)
        if len(order) < len(live):
            self._bounds = (min_len or 0, None)
            return self._bounds
        longest = {s: (0 if s == self.start else -1) for s in live}
        for s in order:
            if longest[s] < 0:
                continue
            for t in nexts[s]:
                if t in live:
                    longest[t] = max(longest[t], longest[s] + 1)
        max_len = max(longest[s] for s in live if self.accept[s])
        self._bounds = (min_len or 0, max_len)
        return self._bounds

    # -- vectorized dictionary run -----------------------------------------
    def match_matrix(self, mat: np.ndarray, lens: np.ndarray) -> np.ndarray:
        """Bool mask over rows of a padded (n, L) int32 codepoint matrix
        (padding < 0); ONE transition-table step per column."""
        n, L = mat.shape
        cls = np.searchsorted(self.class_starts, mat, side="right") - 1
        np.clip(cls, 0, len(self.class_starts) - 1, out=cls)
        states = np.full(n, self.start, np.int32)
        result = np.zeros(n, bool)
        at = lens == 0
        result[at] = self.accept[self.start]
        for j in range(L):
            if not states.any():
                return result  # everything dead
            states = self.trans[states, cls[:, j]]
            at = lens == j + 1
            if at.any():
                result[at] = self.accept[states[at]]
        return result


def compile_regexp(pattern: str) -> CompiledRegexp:
    return CompiledRegexp(pattern)


def regexp_term_ids(reader, pattern: str) -> tuple[list[int], int]:
    """(matching term ids, candidates scanned) for ``pattern`` against the
    segment dictionary: compile to a DFA, bound the scan with the DFA's
    literal common prefix (term_id_range slice) + length pre-filter, then
    one vectorized DFA run over the surviving candidates.  Falls back to a
    Python-``re`` full scan for non-regular patterns (same semantics,
    legacy cost)."""
    import pyarrow.compute as pc

    try:
        dfa = compile_regexp(pattern)
    except UnsupportedRegexp:
        import re

        rx = re.compile(pattern)
        tids = [
            t
            for t in range(reader.n_terms)
            if rx.fullmatch(reader.term_string(t)) is not None
        ]
        return tids, reader.n_terms

    prefix = dfa.common_prefix()
    lo_b = prefix.encode("utf-8") if prefix else None
    hi_b = _prefix_upper(lo_b) if lo_b else None
    rng = reader.term_id_range(lo_b, hi_b)
    lo, hi = rng.start, rng.stop
    if hi <= lo:
        return [], 0
    terms = reader.terms_array().slice(lo, hi - lo)
    lens = pc.utf8_length(terms).to_numpy(zero_copy_only=False).astype(np.int64)
    min_len, max_len = dfa.length_bounds()
    keep = lens >= min_len
    if max_len is not None:
        keep &= lens <= max_len
    cand = np.nonzero(keep)[0]
    if len(cand) == 0:
        return [], 0
    sub = terms.take(cand)
    sub_lens = lens[cand]
    L = int(sub_lens.max())
    if L == 0:
        mask = np.full(len(cand), dfa.accept[dfa.start], bool)
    else:
        u = np.asarray(sub.to_pylist(), dtype=f"U{L}")
        mat = u.view(np.uint32).reshape(len(cand), L).astype(np.int32)
        mat[np.arange(L)[None, :] >= sub_lens[:, None]] = -1
        mask = dfa.match_matrix(mat, sub_lens)
    return (lo + cand[mask]).tolist(), int(len(cand))


def _prefix_upper(prefix_bytes: bytes) -> bytes | None:
    """Smallest byte string > every string with this prefix (exclusive
    upper bound for term_id_range); None when the prefix is all 0xff."""
    b = bytearray(prefix_bytes)
    while b:
        if b[-1] < 0xFF:
            b[-1] += 1
            return bytes(b)
        b.pop()
    return None
