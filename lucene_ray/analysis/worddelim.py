"""Word-delimiter graph splitting (reference
analysis/common/src/java/org/apache/lucene/analysis/miscellaneous/
WordDelimiterGraphFilter.java + WordDelimiterIterator.java).

``expand_term`` computes, ONCE per unique vocabulary term, the full
emission list the graph filter would produce for one occurrence of that
term: subword parts at consecutive positions, plus optional overlay
tokens (preserved original, catenated runs) that share the position of
the part they follow (posIncrement 0 — overlaps, discounted from the
norm like synonym inserts).  The analyzer layer replays this expansion
vectorized over the whole token stream (numpy repeat/cumsum), so the
per-term Python here runs O(|vocab|) not O(|tokens|).

Flag semantics implemented (Lucene defaults in parentheses):
  generate_word_parts (on), generate_number_parts (on),
  split_on_case_change (on), split_on_numerics (on),
  stem_english_possessive (on), preserve_original (off),
  catenate_words (off), catenate_numbers (off), catenate_all (off).

Case-change rules match WordDelimiterIterator: lower->UPPER starts a new
subword ("PowerShot" -> Power, Shot); in an UPPER run, the last upper
before a lower belongs to the next subword ("HTTPResponse" -> HTTP,
Response); possessive stemming drops a subword that is exactly "s"
preceded by an apostrophe ("O'Neil's" -> O, Neil).

A term that yields no subwords at all (pure delimiters, e.g. "--")
emits one GAP entry: it advances the position (StopFilter-style gap is
preserved for the next token) but produces no token and is not counted
in the field length.
"""

from __future__ import annotations

from dataclasses import dataclass

_LOWER, _UPPER, _DIGIT, _DELIM = 0, 1, 2, 3
_APOS = ("'", "’")


def _classify(ch: str) -> int:
    if ch.isdigit():
        return _DIGIT
    if ch.isalpha():
        return _UPPER if ch.isupper() else _LOWER
    return _DELIM


@dataclass(frozen=True)
class Emit:
    """One emission: ``text`` is None for a position GAP; ``advance`` is
    the position increment (0 = overlap at the previous emission's
    position); ``rel_s``/``rel_e`` are char offsets within the term."""

    text: str | None
    rel_s: int
    rel_e: int
    advance: int


def split_subwords(
    term: str,
    *,
    split_on_case_change: bool = True,
    split_on_numerics: bool = True,
    stem_english_possessive: bool = True,
) -> list[tuple[int, int]]:
    """Subword (start, end) spans per WordDelimiterIterator."""
    n = len(term)
    cats = [_classify(c) for c in term]
    spans: list[tuple[int, int]] = []
    i = 0
    while i < n:
        if cats[i] == _DELIM:
            i += 1
            continue
        j = i + 1
        while j < n and cats[j] != _DELIM:
            prev, cur = cats[j - 1], cats[j]
            if split_on_numerics and (prev == _DIGIT) != (cur == _DIGIT):
                break
            if split_on_case_change:
                if prev == _LOWER and cur == _UPPER:
                    break
                if (
                    prev == _UPPER
                    and cur == _UPPER
                    and j + 1 < n
                    and cats[j + 1] == _LOWER
                ):
                    break
            j += 1
        spans.append((i, j))
        i = j
    if stem_english_possessive:
        spans = [
            (s, e)
            for s, e in spans
            if not (e - s == 1 and term[s] in "sS" and s > 0 and term[s - 1] in _APOS)
        ]
    return spans


def _is_word(term: str, span: tuple[int, int]) -> bool:
    return any(term[k].isalpha() for k in range(span[0], span[1]))


def expand_term(
    term: str,
    *,
    generate_word_parts: bool = True,
    generate_number_parts: bool = True,
    split_on_case_change: bool = True,
    split_on_numerics: bool = True,
    stem_english_possessive: bool = True,
    preserve_original: bool = False,
    catenate_words: bool = False,
    catenate_numbers: bool = False,
    catenate_all: bool = False,
    lowercase: bool = True,
    remove_duplicates: bool = False,
) -> list[Emit]:
    """Full emission list for one occurrence of ``term`` (see module doc).

    ``remove_duplicates`` applies RemoveDuplicatesTokenFilter (reference
    miscellaneous/RemoveDuplicatesTokenFilter.java: drop a token whose
    term equals one already emitted at the SAME position) — the standard
    companion to preserve_original/catenate flags, which can otherwise
    emit identical overlay tokens ("PowerShot" preserved == catenated)."""
    spans = split_subwords(
        term,
        split_on_case_change=split_on_case_change,
        split_on_numerics=split_on_numerics,
        stem_english_possessive=stem_english_possessive,
    )
    norm = (lambda s: s.lower()) if lowercase else (lambda s: s)
    n = len(term)

    # fast path: single subword covering the whole token, nothing trimmed
    if len(spans) == 1 and spans[0] == (0, n):
        return [Emit(norm(term), 0, n, 1)]
    if not spans:
        # pure delimiters: preserved original still advances ("SAL - X"
        # keeps "-" with posInc 1 in the reference test); else a gap
        if preserve_original:
            return [Emit(norm(term), 0, n, 1)]
        return [Emit(None, 0, n, 1)]

    kinds = [_is_word(term, sp) for sp in spans]
    gen = [
        (generate_word_parts if w else generate_number_parts) for w in kinds
    ]
    overlays: dict[int, list[Emit]] = {}  # keyed by part index they follow

    def add_overlay(first_part_idx: int, text: str, rel_s: int, rel_e: int):
        overlays.setdefault(first_part_idx, []).append(Emit(text, rel_s, rel_e, 0))

    if preserve_original:
        add_overlay(0, norm(term), 0, n)
    if catenate_all and len(spans) >= 2:
        add_overlay(
            0,
            norm("".join(term[s:e] for s, e in spans)),
            spans[0][0],
            spans[-1][1],
        )
    # catenate maximal runs of >=2 adjacent same-kind subwords
    for want_word, enabled in ((True, catenate_words), (False, catenate_numbers)):
        if not enabled:
            continue
        i = 0
        while i < len(spans):
            if kinds[i] != want_word:
                i += 1
                continue
            j = i
            while j + 1 < len(spans) and kinds[j + 1] == want_word:
                j += 1
            if j > i:
                add_overlay(
                    i,
                    norm("".join(term[s:e] for s, e in spans[i : j + 1])),
                    spans[i][0],
                    spans[j][1],
                )
            i = j + 1

    out: list[Emit] = []
    for idx, (sp, g) in enumerate(zip(spans, gen)):
        ov = overlays.pop(idx, [])
        slot: list[Emit] = []
        if g:
            slot.append(Emit(norm(term[sp[0] : sp[1]]), sp[0], sp[1], 1))
            slot.extend(ov)
        elif ov:
            # overlays anchored on a suppressed part still need a position
            slot.append(Emit(ov[0].text, ov[0].rel_s, ov[0].rel_e, 1))
            slot.extend(ov[1:])
        if remove_duplicates:  # same term at the same position drops
            seen: set[str] = set()
            slot = [
                e for e in slot if not (e.text in seen or seen.add(e.text))
            ]
        out.extend(slot)
    if not out:
        return [Emit(None, 0, n, 1)]  # everything suppressed: gap
    return out
