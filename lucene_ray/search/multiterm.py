"""Multi-term and phrase MATCHERS shared by the top-level fast paths and
the boolean-clause scorer plumbing (kept import-cycle-free: query.py and
searcher.py both import from here)."""

from __future__ import annotations

import numpy as np


def phrase_matches_segment(reader, terms: tuple[str, ...]):
    """(local docids, phrase freqs) of exact consecutive-position matches
    (ExactPhraseMatcher semantics, slop=0)."""
    from ..index.postings import decode_term

    if not reader.has_positions:
        raise ValueError("phrase queries need an index built with index_options='positions'")
    postings = []
    for t in terms:
        tid = reader.term_id(t)
        if tid is None:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        docs, _ = decode_term(reader.enc, tid)
        postings.append((tid, docs))
    # docid intersection, then per-doc consecutive-position check
    common = postings[0][1]
    for _, docs in postings[1:]:
        common = common[np.isin(common, docs)]
    if len(common) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    pos_lists = []  # per term: dict local_doc -> positions
    for tid, docs in postings:
        plist = reader.term_positions(tid)
        idx = {int(d): p for d, p in zip(docs, plist)}
        pos_lists.append(idx)
    if getattr(reader, "live", None) is not None:
        common = common[reader.live[common]]
    out_docs, out_freqs = [], []
    for d in common.tolist():
        cand = pos_lists[0][d]
        for i in range(1, len(terms)):
            cand = cand[np.isin(cand + i, pos_lists[i][d])]
            if len(cand) == 0:
                break
        if len(cand):
            out_docs.append(d)
            out_freqs.append(len(cand))
    return np.asarray(out_docs, np.int64), np.asarray(out_freqs, np.int64)


def multi_phrase_matches_segment(reader, slots: tuple[tuple[str, ...], ...]):
    """(local docids, phrase freqs) for a MultiPhraseQuery: slot i matches
    ANY of its alternative terms at position start+i (reference
    search/MultiPhraseQuery.java + the union postings enum — per-slot
    positions are the UNION of the alternatives' position lists).

    A slot with NO term present in the segment kills the match (same as a
    missing term in the exact matcher).
    """
    from ..index.postings import decode_term

    if not reader.has_positions:
        raise ValueError("phrase queries need an index built with index_options='positions'")
    # per slot: union docids + per-doc union positions
    slot_docs: list[np.ndarray] = []
    slot_pos: list[dict[int, np.ndarray]] = []
    for alts in slots:
        per_doc: dict[int, list[np.ndarray]] = {}
        for t in alts:
            tid = reader.term_id(t)
            if tid is None:
                continue
            docs, _ = decode_term(reader.enc, tid)
            for d, p in zip(docs, reader.term_positions(tid)):
                per_doc.setdefault(int(d), []).append(np.asarray(p))
        if not per_doc:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        merged = {
            d: np.unique(np.concatenate(ps)) for d, ps in per_doc.items()
        }
        slot_docs.append(np.array(sorted(merged), dtype=np.int64))
        slot_pos.append(merged)
    common = slot_docs[0]
    for docs in slot_docs[1:]:
        common = common[np.isin(common, docs)]
    if getattr(reader, "live", None) is not None:
        common = common[reader.live[common]]
    out_docs, out_freqs = [], []
    for d in common.tolist():
        cand = slot_pos[0][d]
        for i in range(1, len(slots)):
            cand = cand[np.isin(cand + i, slot_pos[i][d])]
            if len(cand) == 0:
                break
        if len(cand):
            out_docs.append(d)
            out_freqs.append(len(cand))
    return np.asarray(out_docs, np.int64), np.asarray(out_freqs, np.int64)


def sloppy_phrase_matches_segment(reader, terms: tuple[str, ...], slop: int):
    """(local docids, sloppy freqs) for a k-term sloppy phrase: a position
    tuple (p_0..p_{k-1}), p_i from term i's position list, MATCHES when the
    shifted positions s_i = p_i - i span a range max(s) - min(s) <= slop
    (the reference SloppyPhraseMatcher match width: PhrasePositions keeps
    ``pos - offset`` and a match needs end - start <= slop,
    search/SloppyPhraseMatcher.java — a reversed adjacent pair has width 2,
    so it matches at slop >= 2).  freq = the COUNT of matching tuples; the
    integer tuple count is our documented deviation from the reference's
    sum of 1/(1+width) match weights (it keeps the DuckDB oracle exact).

    Counting is vectorized per doc: each matching tuple is counted once at
    its minimum shifted value m via inclusion-exclusion —
    ``prod_i |s_i ∩ [m, m+slop]| - prod_i |s_i ∩ (m, m+slop]|`` summed
    over the union of candidate minima (two searchsorted per term per doc,
    no k-nested loop).

    Repeated terms are allowed but counted under the tuple semantics
    (p_i == p_j admitted for the repeated term) — a second documented
    deviation: the reference devotes most of SloppyPhraseMatcher to
    forcing repeat occurrences onto DISTINCT positions.
    """
    from ..index.postings import decode_term

    if not reader.has_positions:
        raise ValueError("phrase queries need an index built with index_options='positions'")
    if len(terms) < 2:
        raise ValueError("sloppy phrases need at least two terms")
    tids = [reader.term_id(t) for t in terms]
    if any(t is None for t in tids):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    doc_lists = [decode_term(reader.enc, tid)[0] for tid in tids]
    common = doc_lists[0]
    for dl in doc_lists[1:]:
        common = common[np.isin(common, dl)]
    if len(common) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if getattr(reader, "live", None) is not None:
        common = common[reader.live[common]]
    pos_maps = [
        {int(d): p for d, p in zip(dl, reader.term_positions(tid))}
        for tid, dl in zip(tids, doc_lists)
    ]
    out_docs, out_freqs = [], []
    for d in common.tolist():
        # shifted position lists stay sorted (constant per-term shift)
        shifted = [pm[d].astype(np.int64) - i for i, pm in enumerate(pos_maps)]
        m = np.unique(np.concatenate(shifted))
        incl = np.ones(len(m), np.int64)
        excl = np.ones(len(m), np.int64)
        for s in shifted:
            hi = np.searchsorted(s, m + slop, side="right")
            incl *= hi - np.searchsorted(s, m, side="left")
            excl *= hi - np.searchsorted(s, m, side="right")
        n_tuples = int((incl - excl).sum())
        if n_tuples:
            out_docs.append(d)
            out_freqs.append(n_tuples)
    return np.asarray(out_docs, np.int64), np.asarray(out_freqs, np.int64)


def _multi_term_matches(reader, query) -> np.ndarray:
    """Sorted local docids matching a Prefix/TermRange/Wildcard query
    (union of the matched terms' postings — CONSTANT_SCORE rewrite)."""
    from .query import (
        FuzzyQuery,
        PrefixQuery,
        RegexpQuery,
        TermInSetQuery,
        WildcardQuery,
    )

    if isinstance(query, TermInSetQuery):
        # sorted-dictionary batch lookup (TermInSetQuery.java rewrite:
        # terms visited in sorted order, seekExact per term == one binary
        # search each against the sorted dict)
        tids = []
        for t in sorted(set(query.terms), key=lambda s: s.encode("utf-8")):
            tid = reader.term_id(t)
            if tid is not None:
                tids.append(tid)
        return _union_postings(reader, tids)
    if isinstance(query, FuzzyQuery):
        tids = _fuzzy_term_ids(
            reader, query.term, query.max_edits, query.transpositions
        )
        return _union_postings(reader, tids)
    if isinstance(query, RegexpQuery):
        # automaton intersection (CompiledAutomaton analogue): DFA with
        # common-prefix range bound + length pre-filter + vectorized run
        from .regexp import regexp_term_ids

        tids, _scanned = regexp_term_ids(reader, query.pattern)
        return _union_postings(reader, tids)
    elif isinstance(query, PrefixQuery):
        # shared expansion primitive (also used by PhraseWildcardQuery
        # slots and interval wildcard atoms)
        return _union_postings(
            reader, expand_pattern_tids(reader, "prefix", query.prefix)
        )
    elif isinstance(query, WildcardQuery):
        return _union_postings(
            reader, expand_pattern_tids(reader, "wildcard", query.pattern)
        )
    else:
        lo = query.lower.encode("utf-8") if query.lower is not None else None
        hi = query.upper.encode("utf-8") if query.upper is not None else None
        # term_id_range is [lo, hi): shift an excluded lower / included
        # upper past the exact term (b"\x00" is the smallest suffix)
        if lo is not None and not getattr(query, "include_lower", True):
            lo += b"\x00"
        if hi is not None and getattr(query, "include_upper", False):
            hi += b"\x00"
    return _union_postings(reader, reader.term_id_range(lo, hi))


def _union_postings(reader, tids) -> np.ndarray:
    """PRE-live union of the terms' postings (live docs are masked by the
    caller — cached entries must stay delete-generation-independent)."""
    if len(tids) == 0:
        return np.empty(0, dtype=np.int64)
    mask = np.zeros(reader.max_doc, dtype=bool)
    for tid in tids:
        docs, _ = reader.decode_term_cached(tid)
        mask[docs] = True
    return np.nonzero(mask)[0]


def _fuzzy_term_ids(
    reader, term: str, max_edits: int, transpositions: bool = True
) -> list[int]:
    """Term ids within ``max_edits`` edits of ``term``: ONE vectorized DP
    over the whole dictionary (row per query char, numpy ops over all
    terms at once).

    With ``transpositions`` (the reference FuzzyQuery DEFAULT,
    search/FuzzyQuery.java:66 ``defaultTranspositions = true``) the edit
    distance is full Damerau-Levenshtein — an adjacent swap ("hte"→"the")
    is ONE edit — matching DuckDB's damerau_levenshtein() oracle exactly;
    without it, plain Levenshtein (the pre-r3 behavior, still the
    reference's transpositions=false mode).

    Both DPs run over CODEPOINTS, not UTF-8 bytes (the reference's
    Levenshtein automaton is codepoint-based; the DuckDB oracles are
    character-based too) — a substituted multi-byte character must count
    as ONE edit."""
    import pyarrow.compute as pc

    terms = reader.terms_array()
    n = len(terms)
    if n == 0:
        return []
    lens = pc.utf8_length(terms).to_numpy().astype(np.int64)
    L = int(lens.max()) if n else 0
    if L == 0:
        return np.nonzero(np.full(n, len(term)) <= max_edits)[0].tolist()
    q = np.array([ord(c) for c in term], dtype=np.int32)
    if transpositions:
        # a term within e edits always satisfies |len - m| <= e: the
        # length pre-filter bounds BOTH the codepoint-matrix
        # materialization and the O(m·L) full-history DL matrix to the
        # candidate slice of the dictionary (never all of V)
        cand = np.nonzero(np.abs(lens - len(q)) <= max_edits)[0]
        if len(cand) == 0:
            return []
        sub_lens = lens[cand]
        Lc = int(sub_lens.max())
        u = np.asarray(terms.take(cand).to_pylist(), dtype=f"U{Lc}")
        mat = u.view(np.uint32).reshape(len(cand), Lc).astype(np.int32)
        mat[np.arange(Lc)[None, :] >= sub_lens[:, None]] = -1
        dist = _damerau_dp(mat, sub_lens, q)
        return cand[dist <= max_edits].tolist()
    # padded (n, L) codepoint matrix: numpy 'U' dtype is fixed-width UTF-32
    u = np.asarray(terms.to_pylist(), dtype=f"U{L}")
    mat = u.view(np.uint32).reshape(n, L).astype(np.int32)
    mat[np.arange(L)[None, :] >= lens[:, None]] = -1
    return _fuzzy_plain(mat, lens, q, n, L, max_edits)


def fuzzy_term_dists(reader, term: str, max_edits: int):
    """(term_ids, distances) of dictionary terms within ``max_edits``
    Damerau-Levenshtein edits — the DirectSpellChecker candidate scan
    (suggest/spell/DirectSpellChecker.java) reuses the FuzzyQuery DP."""
    import pyarrow.compute as pc

    terms = reader.terms_array()
    n = len(terms)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    lens = pc.utf8_length(terms).to_numpy().astype(np.int64)
    L = int(lens.max()) if n else 0
    q = np.array([ord(c) for c in term], dtype=np.int32)
    if L == 0:
        ids = np.nonzero(np.full(n, len(q)) <= max_edits)[0]
        return ids, np.full(len(ids), len(q), np.int64)
    u = np.asarray(terms.to_pylist(), dtype=f"U{L}")
    mat = u.view(np.uint32).reshape(n, L).astype(np.int32)
    mat[np.arange(L)[None, :] >= lens[:, None]] = -1
    cand = np.nonzero(np.abs(lens - len(q)) <= max_edits)[0]
    if len(cand) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    dist = _damerau_dp(mat[cand], lens[cand], q)
    keep = dist <= max_edits
    return cand[keep], dist[keep].astype(np.int64)


def fuzzy_term_dists_multi(reader, query_terms: list[str], max_edits: int):
    """term -> (term_ids, distances): the fuzzy_term_dists scan for MANY
    source terms with ONE dictionary materialization (FuzzyLikeThisQuery
    fuzzifies every source against the same segment dictionary — the
    padded codepoint matrix is the dominant cost and is built once)."""
    import pyarrow.compute as pc

    e = np.empty(0, np.int64)
    terms = reader.terms_array()
    n = len(terms)
    if n == 0:
        return {t: (e, e) for t in query_terms}
    lens = pc.utf8_length(terms).to_numpy().astype(np.int64)
    L = int(lens.max())
    out = {}
    if L == 0:
        for t in query_terms:
            ids = np.nonzero(np.full(n, len(t)) <= max_edits)[0]
            out[t] = (ids, np.full(len(ids), len(t), np.int64))
        return out
    u = np.asarray(terms.to_pylist(), dtype=f"U{L}")
    mat = u.view(np.uint32).reshape(n, L).astype(np.int32)
    mat[np.arange(L)[None, :] >= lens[:, None]] = -1
    for t in query_terms:
        q = np.array([ord(c) for c in t], dtype=np.int32)
        cand = np.nonzero(np.abs(lens - len(q)) <= max_edits)[0]
        if len(cand) == 0:
            out[t] = (e, e)
            continue
        dist = _damerau_dp(mat[cand], lens[cand], q)
        keep = dist <= max_edits
        out[t] = (cand[keep], dist[keep].astype(np.int64))
    return out


def fuzzy_prefix_dists(reader, term: str, max_edits: int, non_fuzzy_prefix: int = 1):
    """(term_ids, distances) of dictionary terms SOME PREFIX of which is
    within ``max_edits`` Damerau-Levenshtein edits of ``term`` — the
    FuzzySuggester candidate scan (suggest/analyzing/FuzzySuggester.java:
    the Levenshtein automaton is intersected with the suggest FST, i.e.
    prefix matching).  Because DL(a, b) >= |len(a)-len(b)|, only prefix
    lengths j in [len(q)-e, len(q)+e] can qualify, so the true minimum
    prefix distance is min over that j window of DL(q, t[:j]).  The first
    ``non_fuzzy_prefix`` codepoints must match exactly (reference
    DEFAULT_NON_FUZZY_PREFIX); at max_edits=1 the unrestricted Damerau
    distance used here coincides with the reference's
    transpositions=true Levenshtein automaton."""
    import pyarrow.compute as pc

    terms = reader.terms_array()
    n = len(terms)
    if n == 0 or len(term) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    lens = pc.utf8_length(terms).to_numpy().astype(np.int64)
    L = int(lens.max()) if n else 0
    if L == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    q = np.array([ord(c) for c in term], dtype=np.int32)
    u = np.asarray(terms.to_pylist(), dtype=f"U{L}")
    mat = u.view(np.uint32).reshape(n, L).astype(np.int32)
    mat[np.arange(L)[None, :] >= lens[:, None]] = -1
    # exact-prefix gate on the first non_fuzzy_prefix codepoints
    k = min(non_fuzzy_prefix, len(q))
    keep = lens >= k
    for i in range(k):
        keep &= mat[:, i] == q[i]
    cand = np.nonzero(keep)[0]
    if len(cand) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    lq = len(q)
    best = np.full(len(cand), np.iinfo(np.int64).max, np.int64)
    for j in range(max(1, lq - max_edits), lq + max_edits + 1):
        jj = min(j, L)
        d = _damerau_dp(mat[cand][:, :jj], np.minimum(lens[cand], jj), q)
        best = np.minimum(best, d.astype(np.int64))
    ok = best <= max_edits
    return cand[ok], best[ok]


def _fuzzy_plain(mat, lens, q, n, L, max_edits):
    prev = np.tile(np.arange(L + 1, dtype=np.int32), (n, 1))
    for i, qc in enumerate(q, 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        for j in range(1, L + 1):
            cost = (mat[:, j - 1] != qc).astype(np.int32)
            cur[:, j] = np.minimum(
                np.minimum(cur[:, j - 1] + 1, prev[:, j] + 1), prev[:, j - 1] + cost
            )
        prev = cur
    dist = prev[np.arange(n), lens]
    return np.nonzero(dist <= max_edits)[0].tolist()


def _damerau_dp(mat: np.ndarray, lens: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Full (unrestricted) Damerau-Levenshtein distance of query ``q``
    against every padded dictionary row of ``mat`` at once — the
    Wagner-Lowrance DP with the transposition recurrence
    ``d[k-1][l-1] + (i-k-1) + 1 + (j-l-1)``, vectorized over terms.

    ``D[r, c, t]`` holds d[i][j] for i = r-1, j = c-1 (r = 0 / c = 0 are
    the maxdist sentinels); the full history is kept because the
    transposition term reaches back to arbitrary (k, l)."""
    n, L = mat.shape
    m = len(q)
    maxdist = np.int32(m + L + 1)
    ar = np.arange(n)
    D = np.full((m + 2, L + 2, n), maxdist, dtype=np.int32)
    D[1, 1:, :] = np.arange(L + 1, dtype=np.int32)[:, None]  # d[0][j] = j
    D[1:, 1, :] = np.arange(m + 1, dtype=np.int32)[:, None]  # d[i][0] = i
    for i in range(1, m + 1):
        qc = q[i - 1]
        # da state entering row i: last row i' < i whose query char equals
        # the term char (shared across the row, depends only on q)
        Kmat = np.zeros((n, L), np.int32)
        for ip in range(1, i):
            Kmat[mat == q[ip - 1]] = ip
        db = np.zeros(n, np.int32)
        for j in range(1, L + 1):
            cost = (mat[:, j - 1] != qc).astype(np.int32)
            k = Kmat[:, j - 1]
            l = db
            sub = D[i, j] + cost  # d[i-1][j-1] + cost
            ins = D[i + 1, j] + 1  # d[i][j-1] + 1
            dele = D[i, j + 1] + 1  # d[i-1][j] + 1
            trans = D[k, l, ar] + (i - k - 1) + 1 + (j - l - 1)
            D[i + 1, j + 1] = np.minimum(
                np.minimum(sub, ins), np.minimum(dele, trans)
            )
            db = np.where(cost == 0, np.int32(j), db)
    return D[m + 1, lens + 1, ar]




def proximity_matches_segment(reader, terms: tuple[str, ...], window: int):
    """(local docids, n_windows) for an UNORDERED proximity query: a doc
    matches where some span of ``window`` consecutive positions contains
    ALL the (distinct) terms, in any order — the reference intervals
    family (queries/intervals/Intervals.java unordered() + maxwidth()).

    n_windows counts the distinct minimal covering windows (classic
    smallest-window-over-k-lists sweep, O(total positions) per doc after
    the merge): for each rightmost position, the tightest span covering
    one position of every term; counted when its width <= window.
    """
    from ..index.postings import decode_term

    if not reader.has_positions:
        raise ValueError("proximity queries need an index built with index_options='positions'")
    terms = tuple(dict.fromkeys(terms))  # distinct, order kept
    k = len(terms)
    per_term_docs = []
    for t in terms:
        tid = reader.term_id(t)
        if tid is None:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        docs, _ = decode_term(reader.enc, tid)
        per_term_docs.append((tid, docs))
    common = per_term_docs[0][1]
    for _, docs in per_term_docs[1:]:
        common = common[np.isin(common, docs)]
    if len(common) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if getattr(reader, "live", None) is not None:
        common = common[reader.live[common]]
    pos_maps = []
    for tid, docs in per_term_docs:
        pos_maps.append({int(d): p for d, p in zip(docs, reader.term_positions(tid))})
    out_docs, out_n = [], []
    for d in common.tolist():
        wins = _sweep_minimal_windows([pos_maps[i][d] for i in range(k)], window)
        if len(wins):
            out_docs.append(d)
            out_n.append(len(wins))
    return np.asarray(out_docs, np.int64), np.asarray(out_n, np.int64)


def _sweep_minimal_windows(pos_lists: list, window: int) -> np.ndarray:
    """Minimal covering windows over k position lists (one doc): the
    classic smallest-window sweep.  Returns (n, 2) [left_pos, right_pos]
    pairs with width <= window — exactly the MINIMAL interval set of
    Vigna's semantics (no returned window contains another), which is what
    the reference's IntervalIterators stream (queries/intervals)."""
    k = len(pos_lists)
    events = np.concatenate(
        [
            np.stack(
                [np.asarray(pl), np.full(len(pl), i)], axis=1
            )
            for i, pl in enumerate(pos_lists)
        ]
    )
    events = events[np.argsort(events[:, 0], kind="stable")]
    pos, slot = events[:, 0], events[:, 1]
    counts = np.zeros(k, dtype=np.int64)
    have = 0
    left = 0
    wins = []
    for right in range(len(pos)):
        s = slot[right]
        counts[s] += 1
        if counts[s] == 1:
            have += 1
        if have < k:
            continue
        # shrink to the minimal covering window ending at `right`
        while counts[slot[left]] > 1:
            counts[slot[left]] -= 1
            left += 1
        if pos[right] - pos[left] + 1 <= window:
            wins.append((int(pos[left]), int(pos[right])))
        # drop the left edge so the next minimal window is distinct
        counts[slot[left]] -= 1
        have -= 1
        left += 1
    return np.asarray(wins, np.int64).reshape(-1, 2)


def ordered_proximity_matches_segment(reader, terms: tuple[str, ...], window: int):
    """(local docids, n_starts) for an ORDERED proximity query: the terms
    must appear in the given order, the whole chain within ``window``
    consecutive positions (queries/intervals Intervals.ordered() +
    maxwidth() analogue).

    n_starts counts the positions of the FIRST term that begin a valid
    chain.  Exactness: the greedy chain (each next term at its earliest
    position after the previous) minimizes the span end, so "greedy chain
    fits" == "some chain fits" — and the greedy chain is computed fully
    vectorized with one searchsorted per term.
    """
    from ..index.postings import decode_term

    if not reader.has_positions:
        raise ValueError("proximity queries need an index built with index_options='positions'")
    per_term = []
    for t in terms:
        tid = reader.term_id(t)
        if tid is None:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        docs, _ = decode_term(reader.enc, tid)
        per_term.append((tid, docs))
    common = per_term[0][1]
    for _, docs in per_term[1:]:
        common = common[np.isin(common, docs)]
    if len(common) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if getattr(reader, "live", None) is not None:
        common = common[reader.live[common]]
    pos_maps = [
        {int(d): p for d, p in zip(docs, reader.term_positions(tid))}
        for tid, docs in per_term
    ]
    out_docs, out_n = [], []
    for d in common.tolist():
        ends = np.asarray(pos_maps[0][d])  # chain front per start
        starts = ends
        ok = np.ones(len(ends), dtype=bool)
        for i in range(1, len(terms)):
            nxt = np.asarray(pos_maps[i][d])
            idx = np.searchsorted(nxt, ends + 1, side="left")
            ok &= idx < len(nxt)
            idx = np.minimum(idx, len(nxt) - 1)
            ends = nxt[idx]
        n = int((ok & (ends - starts + 1 <= window)).sum())
        if n:
            out_docs.append(d)
            out_n.append(n)
    return np.asarray(out_docs, np.int64), np.asarray(out_n, np.int64)


def _term_pos_map(reader, term: str):
    """{local docid: ascending positions} for one term; None if absent."""
    from ..index.postings import decode_term

    tid = reader.term_id(term)
    if tid is None:
        return None
    docs, _ = decode_term(reader.enc, tid)
    return {int(d): p for d, p in zip(docs, reader.term_positions(tid))}


def containing_proximity_matches_segment(
    reader, terms: tuple[str, ...], window: int, filter_term: str, negate: bool = False
):
    """(local docids, n) for Intervals.containing / notContaining: the
    minimal unordered covering windows of ``terms`` (width <= window) that
    DO (or with ``negate``, do NOT) contain an occurrence of
    ``filter_term`` (queries/intervals/Intervals.java containing() /
    notContaining() over unordered()+maxwidth() sources).  n counts the
    surviving minimal windows per doc."""
    if not reader.has_positions:
        raise ValueError("proximity queries need an index built with index_options='positions'")
    terms = tuple(dict.fromkeys(terms))
    maps = [_term_pos_map(reader, t) for t in terms]
    if any(m is None for m in maps):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    fmap = _term_pos_map(reader, filter_term) or {}
    common = None
    for m in maps:
        ks = np.fromiter(m.keys(), np.int64)
        common = ks if common is None else common[np.isin(common, ks)]
    if common is None or len(common) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    common = np.sort(common)
    if getattr(reader, "live", None) is not None:
        common = common[reader.live[common]]
    out_docs, out_n = [], []
    for d in common.tolist():
        wins = _sweep_minimal_windows([m[d] for m in maps], window)
        if not len(wins):
            continue
        fpos = np.asarray(fmap.get(d, np.empty(0, np.int64)))
        if len(fpos):
            # window [l, r] contains f iff some f position in [l, r]
            idx = np.searchsorted(fpos, wins[:, 0], side="left")
            has = (idx < len(fpos)) & (fpos[np.minimum(idx, len(fpos) - 1)] <= wins[:, 1])
        else:
            has = np.zeros(len(wins), dtype=bool)
        n = int((~has).sum() if negate else has.sum())
        if n:
            out_docs.append(d)
            out_n.append(n)
    return np.asarray(out_docs, np.int64), np.asarray(out_n, np.int64)


def or_proximity_matches_segment(reader, slots: tuple, window: int):
    """(local docids, n_windows) for unordered proximity where each SLOT is
    a DISJUNCTION of terms (Intervals.unordered over Intervals.or sources):
    slot i's positions are the merged positions of its alternatives."""
    if not reader.has_positions:
        raise ValueError("proximity queries need an index built with index_options='positions'")
    slot_maps = []
    for alts in slots:
        merged: dict[int, list] = {}
        found = False
        for t in dict.fromkeys(alts):
            m = _term_pos_map(reader, t)
            if m is None:
                continue
            found = True
            for d, p in m.items():
                merged.setdefault(d, []).append(p)
        if not found:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        slot_maps.append(
            {d: np.unique(np.concatenate(ps)) for d, ps in merged.items()}
        )
    common = None
    for m in slot_maps:
        ks = np.fromiter(m.keys(), np.int64) if m else np.empty(0, np.int64)
        common = ks if common is None else common[np.isin(common, ks)]
    if common is None or len(common) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    common = np.sort(common)
    if getattr(reader, "live", None) is not None:
        common = common[reader.live[common]]
    out_docs, out_n = [], []
    for d in common.tolist():
        wins = _sweep_minimal_windows([m[d] for m in slot_maps], window)
        if len(wins):
            out_docs.append(d)
            out_n.append(len(wins))
    return np.asarray(out_docs, np.int64), np.asarray(out_n, np.int64)


_PAYLOAD_OPS = {
    "eq": np.equal,
    "gt": np.greater,
    "gte": np.greater_equal,
    "lt": np.less,
    "lte": np.less_equal,
}


def payload_check_matches_segment(reader, terms, payloads, op: str = "eq"):
    """(local docids, accepted span freqs) for SpanPayloadCheckQuery
    (reference queries/payloads/SpanPayloadCheckQuery.java, PayloadType
    .INT form): exact consecutive-position spans of ``terms`` where the
    payload at span position i satisfies ``op`` against ``payloads[i]``
    (MatchOperation EQ/GT/GTE/LT/LTE — the reference applies ONE
    operation across all positions).  freq = number of accepted spans
    (the SpanScorer freq the similarity consumes)."""
    from ..index.postings import decode_term

    if not reader.has_payloads:
        raise ValueError("payload check needs index_options='payloads'")
    if len(payloads) != len(terms):
        raise ValueError("one reference payload per span position")
    cmp = _PAYLOAD_OPS[op]
    postings = []
    for t in terms:
        tid = reader.term_id(t)
        if tid is None:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        docs, _ = decode_term(reader.enc, tid)
        postings.append((tid, docs))
    common = postings[0][1]
    for _, docs in postings[1:]:
        common = common[np.isin(common, docs)]
    if getattr(reader, "live", None) is not None and len(common):
        common = common[reader.live[common]]
    if len(common) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    maps = []
    for tid, docs in postings:
        plist = reader.term_positions(tid)
        pays = reader.term_payloads(tid)
        maps.append({int(d): (p, y) for d, p, y in zip(docs, plist, pays)})
    out_docs, out_freqs = [], []
    for d in common.tolist():
        p0, y0 = maps[0][d]
        cand = p0[cmp(y0, payloads[0])]
        for i in range(1, len(terms)):
            pi, yi = maps[i][d]
            good = pi[cmp(yi, payloads[i])]
            cand = cand[np.isin(cand + i, good)]
            if len(cand) == 0:
                break
        if len(cand):
            out_docs.append(d)
            out_freqs.append(len(cand))
    return np.asarray(out_docs, np.int64), np.asarray(out_freqs, np.int64)


def positional_phrase_matches_segment(
    reader, terms: tuple[str, ...], positions: tuple[int, ...]
):
    """(local docids, freqs) for a phrase whose terms sit at EXPLICIT
    positions relative to the match start (PhraseQuery.Builder.add(term,
    position) — the gapped-phrase form NGramPhraseQuery's rewrite
    emits).  positions must be ascending; freq counts the valid start
    positions, exactly ExactPhraseMatcher over the sparse pattern."""
    from ..index.postings import decode_term

    if not reader.has_positions:
        raise ValueError("phrase queries need an index built with index_options='positions'")
    postings = []
    for t in terms:
        tid = reader.term_id(t)
        if tid is None:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        docs, _ = decode_term(reader.enc, tid)
        postings.append((tid, docs))
    common = postings[0][1]
    for _, docs in postings[1:]:
        common = common[np.isin(common, docs)]
    if len(common) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    pos_lists = [
        {int(d): p for d, p in zip(docs, reader.term_positions(tid))}
        for tid, docs in postings
    ]
    if getattr(reader, "live", None) is not None:
        common = common[reader.live[common]]
    out_docs, out_freqs = [], []
    for d in common.tolist():
        cand = pos_lists[0][d] - positions[0]
        for i in range(1, len(terms)):
            cand = cand[np.isin(cand + positions[i], pos_lists[i][d])]
            if len(cand) == 0:
                break
        if len(cand):
            out_docs.append(d)
            out_freqs.append(len(cand))
    return np.asarray(out_docs, np.int64), np.asarray(out_freqs, np.int64)


def ngram_phrase_rewrite(
    terms: tuple[str, ...], n: int
) -> tuple[tuple[str, ...], tuple[int, ...]]:
    """NGramPhraseQuery.rewrite (core/search/NGramPhraseQuery.java
    :45-74): a slop-0 phrase of >= 3 consecutive n-grams (n >= 2) keeps
    only the terms at i % n == 0 plus the LAST term, each at its
    ORIGINAL position — overlapping grams make the dropped ones
    redundant, so the sparse phrase matches the same docs with the same
    frequencies while decoding far fewer postings.  Non-optimizable
    shapes pass through unchanged."""
    k = len(terms)
    if n < 2 or k < 3:
        return tuple(terms), tuple(range(k))
    keep = [i for i in range(k) if i % n == 0 or i == k - 1]
    return tuple(terms[i] for i in keep), tuple(keep)


def expand_pattern_tids(reader, kind: str, pat: str) -> list[int]:
    """Dictionary term ids matching a prefix / wildcard pattern in
    lexicographic (TermsEnum) order — the shared expansion primitive
    behind PhraseWildcardQuery slots and interval wildcard atoms
    (prefix = bounded range scan; wildcard = range over the literal
    prefix + compiled-fnmatch filter)."""
    import fnmatch
    import re as _re

    if kind == "prefix":
        lo = pat.encode("utf-8")
        return list(reader.term_id_range(lo, lo + b"\xff\xff\xff\xff"))
    m = _re.search(r"[*?]", pat)
    lit = pat[: m.start()] if m else pat
    lo = lit.encode("utf-8")
    rx = _re.compile(fnmatch.translate(pat))
    return [
        t
        for t in reader.term_id_range(lo, lo + b"\xff\xff\xff\xff")
        if rx.match(reader.term_string(t))
    ]
