"""UAX#29 word-break scanner with Lucene ``StandardTokenizer`` semantics.

This is an original Python/numpy implementation of the standard jflex
longest-match DFA runtime, driven by the word-break tables in
``uax29_tables.npz`` (generated Unicode 12.1 artifacts of the reference
grammar, see tools/extract_uax29_tables.py).  Semantics reproduced from the
reference (citations into /root/reference):

- jflex longest-match scanning loop:
  lucene/core/src/java/org/apache/lucene/analysis/standard/
  StandardTokenizerImpl.java:959-1041 (getNextToken)
- 255-char (UTF-16 units) scan buffer: the scanner can never match a token
  longer than its buffer; a longer run is emitted as a 255-unit token followed
  by the remainder (StandardTokenizerImpl.java zzRefill + ``%buffer 255`` in
  StandardTokenizerImpl.jflex:51).  With the default
  ``maxTokenLength == buffer size == 255`` the "skip too-long token" branch of
  StandardTokenizer.incrementToken (StandardTokenizer.java:152-175) never
  fires; over-long runs are *split*, not dropped.  Both behaviors are
  implemented here (window == max_token_length).
- Token types: ALPHANUM, NUM, SOUTHEAST_ASIAN, IDEOGRAPHIC, HIRAGANA,
  KATAKANA, HANGUL, EMOJI (StandardTokenizer.java:43-80); action codes from
  the generated switch (StandardTokenizerImpl.java:1040-1105).

Performance: a vectorized pre-pass splits text on "breaker" characters (chars
that can provably never start or continue a multi-char token) and recognizes
"simple" segments (pure ALetter/Numeric/ExtendNumLet runs, i.e. ASCII
identifiers) without running the DFA; only complex segments (Mid* joiners,
CJK, emoji, combining marks) take the exact per-codepoint DFA loop.  A
hypothesis differential test asserts fast path == DFA.
"""

from __future__ import annotations

import os

import numpy as np

_HERE = os.path.dirname(__file__)

# Token type ids, matching StandardTokenizer.TOKEN_TYPES order
# (reference StandardTokenizer.java:82-100).
ALPHANUM, NUM, SOUTHEAST_ASIAN, IDEOGRAPHIC, HIRAGANA, KATAKANA, HANGUL, EMOJI = range(8)

TOKEN_TYPE_NAMES = [
    "<ALPHANUM>",
    "<NUM>",
    "<SOUTHEAST_ASIAN>",
    "<IDEOGRAPHIC>",
    "<HIRAGANA>",
    "<KATAKANA>",
    "<HANGUL>",
    "<EMOJI>",
]

# jflex action code -> token type (None = skip); from the generated action
# switch, StandardTokenizerImpl.java:1040-1105.
_ACTION_TO_TYPE = {
    1: None,
    2: NUM,
    3: ALPHANUM,
    4: EMOJI,
    5: SOUTHEAST_ASIAN,
    6: HANGUL,
    7: IDEOGRAPHIC,
    8: KATAKANA,
    9: HIRAGANA,
}


class _Tables:
    """Lazily-loaded module-level singleton of the DFA tables."""

    def __init__(self) -> None:
        data = np.load(os.path.join(_HERE, "uax29_tables.npz"))
        self.cmap: np.ndarray = data["cmap"]  # uint8[0x110000] -> class
        self.trans: np.ndarray = data["trans"]  # int16[n_states, n_classes]
        self.attribute: np.ndarray = data["attribute"]  # int8[n_states]
        action = data["action"]  # int8[n_states] -> jflex action code
        # state -> token type id (or -1 skip, -2 not accepting)
        self.state_type = np.full(len(action), -2, dtype=np.int8)
        for s in range(len(action)):
            if self.attribute[s] & 1:
                t = _ACTION_TO_TYPE.get(int(action[s]))
                self.state_type[s] = -1 if t is None else t

        n_states, n_classes = self.trans.shape
        # Per-class analysis for the vectorized fast paths.
        dead_from_nonzero = (self.trans[1:, :] == -1).all(axis=0)
        t0 = self.trans[0, :]
        t0_dead = np.array(
            [t0[c] == -1 or (self.trans[t0[c], :] == -1).all() for c in range(n_classes)]
        )
        t0_skip = np.array(
            [t0[c] != -1 and self.state_type[t0[c]] == -1 for c in range(n_classes)]
        )
        # A "breaker" class can never start a multi-char match nor continue
        # any match: a run of breakers is always skipped char-by-char, so
        # token boundaries never cross it.
        self.breaker_class = dead_from_nonzero & t0_dead & t0_skip

        # "Simple" classes: classes of ASCII [A-Za-z], [0-9], and '_'.  Any
        # run mixing these (with >= 1 non-'_') is a single WORD/NUM token per
        # the WB5/8/9/10/13a/13b chain rules in the grammar.
        cmap = self.cmap
        self.cls_aletter = int(cmap[ord("a")])
        self.cls_numeric = int(cmap[ord("0")])
        self.cls_extnumlet = int(cmap[ord("_")])
        assert cmap[ord("A")] == self.cls_aletter
        simple = np.zeros(n_classes, dtype=bool)
        simple[[self.cls_aletter, self.cls_numeric, self.cls_extnumlet]] = True
        self.simple_class = simple

        # Per-codepoint lookups
        self.cp_breaker = self.breaker_class[cmap]
        self.cp_simple = self.simple_class[cmap]

        low = np.load(os.path.join(_HERE, "lowercase_table.npz"))
        self.lower = np.arange(0x110000, dtype=np.uint32)
        self.lower[low["cp"]] = low["low"].astype(np.uint32)


_tables: _Tables | None = None


def tables() -> _Tables:
    global _tables
    if _tables is None:
        _tables = _Tables()
    return _tables


def _u16_len(cps: np.ndarray) -> np.ndarray:
    return 1 + (cps >= 0x10000).astype(np.int32)


def _scan_segment_dfa(
    cps: np.ndarray,
    classes: np.ndarray,
    u16_cum: np.ndarray,
    max_token_length: int,
    out: list[tuple[int, int, int]],
) -> None:
    """Exact jflex longest-match loop over one segment.

    ``u16_cum[i]`` = UTF-16 length of cps[:i].  Appends (start_cp, end_cp,
    token_type) to ``out`` for kept tokens.  The match window is capped at
    ``max_token_length`` UTF-16 units from each token start, emulating the
    scanner buffer (see module docstring).
    """
    t = tables()
    trans = t.trans
    attr = t.attribute
    stype = t.state_type
    n = len(cps)
    pos = 0
    while pos < n:
        # window limit in codepoints: largest e with u16_cum[e]-u16_cum[pos] <= cap
        limit = int(np.searchsorted(u16_cum, u16_cum[pos] + max_token_length, side="right")) - 1
        state = 0
        action_state = -1
        marked = pos
        cur = pos
        while cur < limit:
            nxt = trans[state, classes[cur]]
            if nxt == -1:
                break
            state = nxt
            cur += 1
            a = attr[state]
            if a & 1:
                action_state = state
                marked = cur
                if a & 8:
                    break
        if marked == pos:
            # No accepting match (can only happen when the window cuts off
            # every accept, or pathological input); skip one codepoint like
            # the catch-all rule would.
            pos += 1
            continue
        tt = stype[action_state]
        if tt >= 0:
            out.append((pos, marked, int(tt)))
        pos = marked


def scan(text: str, max_token_length: int = 255) -> list[tuple[str, int, int, int]]:
    """Tokenize ``text`` with StandardTokenizer semantics.

    Returns a list of (token_text, start_utf16, end_utf16, token_type).
    Offsets are in UTF-16 code units to match the reference's char offsets.
    """
    if not text:
        return []
    t = tables()
    cps = np.frombuffer(text.encode("utf-32-le"), dtype="<u4")
    spans = scan_spans(cps, max_token_length)
    u16 = _u16_len(cps)
    u16_cum = np.concatenate(([0], np.cumsum(u16)))
    out = []
    # Reconstruct strings from codepoints (handles astral chars, where Python
    # string slicing by codepoint index is already correct).
    for s, e, tt in spans:
        out.append((text_slice(text, cps, s, e), int(u16_cum[s]), int(u16_cum[e]), tt))
    return out


def text_slice(text: str, cps: np.ndarray, s: int, e: int) -> str:
    # Python strings index by codepoint, same as our cps array.
    return text[s:e]


def scan_spans_batch(
    cps: np.ndarray, max_token_length: int = 255
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized batch tokenization: (starts, ends) codepoint spans, in
    document order, token types dropped (the index keeps only terms).

    Same semantics as ``scan_spans`` (differentially tested), but the common
    case — simple ASCII-identifier segments under the 255-unit cap — is
    emitted as whole numpy arrays with no per-token Python work; only
    complex segments (CJK/emoji/joiners) and over-long runs take the exact
    DFA / window loop.
    """
    t = tables()
    n = len(cps)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    classes = t.cmap[cps]
    nb = ~t.breaker_class[classes]
    if not nb.any():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    d = np.diff(nb.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if nb[0]:
        starts = np.concatenate(([0], starts))
    if nb[-1]:
        ends = np.concatenate((ends, [n]))

    simple = t.simple_class[classes]
    # NB: bool->int32 cumsum is ~10x faster than bool->int64 in numpy
    nonsimple_cum = np.concatenate(([0], np.cumsum(~simple, dtype=np.int32)))
    nonext_cum = np.concatenate(([0], np.cumsum(classes != t.cls_extnumlet, dtype=np.int32)))

    all_simple = nonsimple_cum[ends] == nonsimple_cum[starts]
    short = (ends - starts) <= max_token_length
    has_nonext = nonext_cum[ends] > nonext_cum[starts]
    fast = all_simple & short
    keep = fast & has_nonext  # pure-'_' runs are skipped
    out_starts = [starts[keep]]
    out_ends = [ends[keep]]

    slow_idx = np.flatnonzero(~fast)
    if len(slow_idx):
        slow_s: list[int] = []
        slow_e: list[int] = []
        for i in slow_idx.tolist():
            s, e = int(starts[i]), int(ends[i])
            if all_simple[i]:  # simple but over-long: 255-unit window split
                p = s
                while p < e:
                    q = min(p + max_token_length, e)
                    if nonext_cum[q] > nonext_cum[p]:
                        slow_s.append(p)
                        slow_e.append(q)
                    p = q
            else:
                seg_cps = cps[s:e]
                seg_u16 = np.concatenate(
                    ([0], np.cumsum(1 + (seg_cps >= 0x10000), dtype=np.int64))
                )
                seg_out: list[tuple[int, int, int]] = []
                _scan_segment_dfa(seg_cps, classes[s:e], seg_u16, max_token_length, seg_out)
                for a, b, _tt in seg_out:
                    slow_s.append(s + a)
                    slow_e.append(s + b)
        if slow_s:
            out_starts.append(np.asarray(slow_s, dtype=np.int64))
            out_ends.append(np.asarray(slow_e, dtype=np.int64))

    ss = np.concatenate(out_starts)
    ee = np.concatenate(out_ends)
    order = np.argsort(ss, kind="stable")
    return ss[order], ee[order]


def scan_spans(cps: np.ndarray, max_token_length: int = 255) -> list[tuple[int, int, int]]:
    """Tokenize a codepoint array; returns (start_cp, end_cp, type) spans.

    Fast path: split on breaker chars; pure ALetter/Numeric/ExtendNumLet
    segments become single tokens (split at the 255-UTF-16-unit window)
    without running the DFA.
    """
    t = tables()
    n = len(cps)
    if n == 0:
        return []
    classes = t.cmap[cps]
    breaker = t.breaker_class[classes]
    out: list[tuple[int, int, int]] = []

    # segment boundaries: runs of non-breaker chars
    nb = ~breaker
    if not nb.any():
        return []
    d = np.diff(nb.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if nb[0]:
        starts = np.concatenate(([0], starts))
    if nb[-1]:
        ends = np.concatenate((ends, [n]))

    simple = t.simple_class[classes]
    ext_cls = t.cls_extnumlet
    # prefix sums for O(1) per-segment checks
    simple_cum = np.concatenate(([0], np.cumsum(~simple, dtype=np.int64)))
    nonext_cum = np.concatenate(([0], np.cumsum(classes != ext_cls, dtype=np.int64)))
    alpha_cum = np.concatenate(([0], np.cumsum(classes == t.cls_aletter, dtype=np.int64)))
    astral = cps >= 0x10000
    if astral.any():
        u16_cum = np.concatenate(([0], np.cumsum(1 + astral, dtype=np.int64)))
    else:
        u16_cum = None  # all BMP: u16 index == cp index

    for s, e in zip(starts.tolist(), ends.tolist()):
        if simple_cum[e] == simple_cum[s]:  # all simple classes
            seglen = e - s  # BMP-only classes -> u16 units == cps
            if seglen <= max_token_length:
                if nonext_cum[e] > nonext_cum[s]:  # at least one non-'_'
                    tt = ALPHANUM if alpha_cum[e] > alpha_cum[s] else NUM
                    out.append((s, e, tt))
                else:
                    pass  # pure '_' run: skipped char by char
            else:
                # window splitting, exactly like the 255-char scan buffer
                p = s
                while p < e:
                    q = min(p + max_token_length, e)
                    if nonext_cum[q] > nonext_cum[p]:
                        tt = ALPHANUM if alpha_cum[q] > alpha_cum[p] else NUM
                        out.append((p, q, tt))
                    p = q
        else:
            seg_cps = cps[s:e]
            seg_classes = classes[s:e]
            if u16_cum is None:
                seg_u16_cum = np.arange(e - s + 1, dtype=np.int64)
            else:
                seg_u16_cum = u16_cum[s : e + 1] - u16_cum[s]
            seg_out: list[tuple[int, int, int]] = []
            _scan_segment_dfa(seg_cps, seg_classes, seg_u16_cum, max_token_length, seg_out)
            out.extend((s + a, s + b, tt) for a, b, tt in seg_out)
    return out
