"""TermAutomatonQuery: graph-based proximity over the positions index.

Reference: lucene/sandbox/src/java/org/apache/lucene/sandbox/search/
``TermAutomatonQuery.java`` / ``TermAutomatonScorer.java`` — a document
matches when some path through a token automaton consumes tokens at
consecutive positions; transitions are labeled with a term or ANY (the
any-token wildcard).  Generalizes phrase / multi-phrase / gapped-phrase
queries into one graph form (``TokenStreamToTermAutomatonQuery`` builds
these from analyzed token graphs).

Engine shape: one vectorized DP over (doc, position) key sets — states in
topological order, each real-term transition intersects the state's
reachable set with the term's flat (doc, pos) occurrences (np.isin on
packed int64 keys), ANY advances unconditionally.  No per-doc Python.

Restrictions (validated at construction): the state graph must be acyclic
with transitions from < to, state 0 must have no incoming edges, no ANY
transition may leave state 0 (unanchored start) or enter an accept state
(an unverifiable token-past-end); the positions index must be gap-free
for ANY to mean "any token" (standard analyzer without stop words — the
driver corpus; documented deviation otherwise).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

ANY = None


@dataclass(frozen=True)
class TermAutomatonQuery:
    """``transitions`` is a tuple of (from_state, to_state, term-or-None);
    state 0 is initial, ``accept`` lists accepting states."""

    n_states: int
    transitions: tuple[tuple[int, int, str | None], ...]
    accept: tuple[int, ...]

    def __post_init__(self):
        for f, t, lab in self.transitions:
            if not (0 <= f < t < self.n_states):
                raise ValueError("transitions must go forward (acyclic, from < to)")
            if lab is ANY and f == 0:
                raise ValueError("ANY transition out of the initial state")
            if lab is ANY and t in self.accept:
                raise ValueError("ANY transition into an accept state")
        if not self.accept:
            raise ValueError("no accept states")

    def terms(self) -> set[str]:
        return {lab for _f, _t, lab in self.transitions if lab is not ANY}

    def paths(self) -> list[tuple[str | None, ...]]:
        """All label sequences from state 0 to an accept state (DFS; the
        automaton is acyclic so this terminates) — the oracle compiler's
        input."""
        out_edges: dict[int, list[tuple[int, str | None]]] = {}
        for f, t, lab in self.transitions:
            out_edges.setdefault(f, []).append((t, lab))
        paths: list[tuple[str | None, ...]] = []

        def walk(state: int, acc: list[str | None]):
            if state in self.accept and acc:
                paths.append(tuple(acc))
            for nxt, lab in out_edges.get(state, []):
                acc.append(lab)
                walk(nxt, acc)
                acc.pop()

        walk(0, [])
        return paths


def _flat_occurrences(reader, term: str) -> tuple[np.ndarray, np.ndarray]:
    """(docs, positions) of every occurrence of ``term`` in the segment."""
    from ..index.postings import decode_term

    tid = reader.term_id(term)
    if tid is None:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    docs, _ = decode_term(reader.enc, tid)
    plist = reader.term_positions(tid)
    lens = [len(p) for p in plist]
    return (
        np.repeat(docs.astype(np.int64), lens),
        np.concatenate(plist).astype(np.int64) if plist else np.empty(0, np.int64),
    )


def term_automaton_matches_segment(reader, q: TermAutomatonQuery) -> np.ndarray:
    """Local docids with at least one accepted automaton path
    (TermAutomatonScorer's posting-intersection DP, vectorized)."""
    if not reader.has_positions:
        raise ValueError("TermAutomatonQuery needs index_options='positions'")
    occ: dict[str, np.ndarray] = {}
    max_pos = 0
    for t in q.terms():
        d, p = _flat_occurrences(reader, t)
        if len(p):
            max_pos = max(max_pos, int(p.max()))
        occ[t] = (d, p)
    stride = max_pos + q.n_states + 2  # keys stay unique after ANY shifts
    keys = {t: d * stride + p for t, (d, p) in occ.items()}

    # reach[s] = packed (doc, pos) keys meaning "at state s, the next
    # token to consume sits at pos"; states processed in increasing order
    # (transitions are forward-only)
    reach: dict[int, list[np.ndarray]] = {}
    by_from: dict[int, list[tuple[int, str | None]]] = {}
    for f, t, lab in q.transitions:
        by_from.setdefault(f, []).append((t, lab))
    for to, lab in by_from.get(0, []):
        k = keys.get(lab)
        if k is not None and len(k):
            reach.setdefault(to, []).append(k + 1)
    matched: list[np.ndarray] = []
    for s in range(1, q.n_states):
        parts = reach.get(s)
        if not parts:
            continue
        cur = np.unique(np.concatenate(parts))
        if s in q.accept:
            matched.append(cur // stride)
        for to, lab in by_from.get(s, []):
            if lab is ANY:
                nxt = cur + 1
            else:
                k = keys.get(lab, np.empty(0, np.int64))
                nxt = cur[np.isin(cur, k)] + 1
            if len(nxt):
                reach.setdefault(to, []).append(nxt)
    if not matched:
        return np.empty(0, np.int64)
    docs = np.unique(np.concatenate(matched))
    if getattr(reader, "live", None) is not None:
        docs = docs[reader.live[docs]]
    return docs


def automaton_path_sql(paths: list[tuple[str | None, ...]], qid: int) -> str:
    """Compile the automaton's enumerated paths to one SQL SELECT of
    matching doc_ids (DISTINCT union over paths) against the ``posx``
    (doc_id, tok, p) CTE — the oracle is compiled from the SAME query
    object the engine runs (semantic cross-check discipline).  ANY slots
    shift offsets without a join: positions are dense (gap-free standard
    analysis), so an intermediate any-token always exists when a later
    real term matches."""
    selects = []
    for path in paths:
        anchors = [(i, lab) for i, lab in enumerate(path) if lab is not ANY]
        first_off, first_term = anchors[0]
        joins = []
        for j, (off, term) in enumerate(anchors[1:], start=1):
            joins.append(
                f"JOIN posx p{j} ON p{j}.doc_id = p0.doc_id AND p{j}.tok = '{term}'"
                f" AND p{j}.p = p0.p + {off - first_off}"
            )
        # leading ANY slots require the start position to leave room
        head = f"p0.p >= {first_off}" if first_off else "TRUE"
        selects.append(
            f"SELECT DISTINCT p0.doc_id FROM posx p0 {' '.join(joins)}"
            f" WHERE p0.tok = '{first_term}' AND {head}"
        )
    union = " UNION ".join(selects)
    return f"SELECT {qid} AS qid, doc_id FROM ({union})"
