"""Generic MeCab-style Viterbi lattice engine shared by the Japanese
(kuromoji) and Korean (nori) tokenizers.

Reference architecture: analysis/kuromoji/.../JapaneseTokenizer.java and
analysis/nori/.../KoreanTokenizer.java share the same core — dictionary
arcs + unknown-word arcs over the text form a lattice; the best path
minimizes ``sum(word_cost) + sum(connection_cost(right_prev,
left_next))``; a mode-dependent penalty on long arcs drives
decompounding.  Both reference tokenizers duplicate the machinery with
different dictionaries; here the machinery is one class configured with
a language pack (lexicon, connection matrix, unknown-word classes,
penalty function, optional compound splits).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class LanguagePack:
    """Everything language-specific the lattice needs.

    - ``lexicon``: (surface, ctx_id, cost[, parts]) rows; ``parts`` (a
      tuple of sub-surfaces concatenating to the surface) marks a
      compound that decompound mode splits (nori's Dictionary.Morpheme
      decompound array).
    - ``conn``: (n_ctx, n_ctx) int connection-cost matrix; row = right
      id of the previous arc, column = left id of the next (id 0 = BOS).
    - ``char_class``: codepoint -> small int class (language-defined).
    - ``space_class``: the class treated as a chunk separator.
    - ``symbol_class``: the class whose pure tokens ``discard_punctuation``
      drops.
    - ``unk_cost`` / ``unk_ctx``: per-class unknown-arc base costs and
      context ids; classes in ``unk_group`` emit one arc per same-class
      run (plus a length-1 fallback), ``unk_pair_class`` additionally
      emits 2-length arcs (kanji-style), everything else single-char arcs.
    - ``penalty``: fn(surface, mode) -> extra cost (search-mode
      decompound pressure).
    """

    lexicon: list[tuple]
    conn: np.ndarray
    char_class: callable
    space_class: int
    symbol_class: int
    unk_cost: dict[int, int]
    unk_ctx: dict[int, int]
    unk_group: frozenset[int]
    unk_pair_class: int | None = None
    penalty: callable = lambda surface, mode: 0
    unk_run_cost_per_char: int = 100
    unk_single_extra: int = 1700
    # all-lengths classes (Korean Hangul): a run gets arcs of EVERY length
    # 1..cap at base + per_char*len — an eojeol's trailing particle must be
    # splittable without the dictionary knowing the stem
    unk_all: frozenset[int] = frozenset()
    unk_all_cap: int = 8
    unk_all_per_char: int = 1000
    _dict: dict = field(default_factory=dict, repr=False)
    _parts: dict = field(default_factory=dict, repr=False)

    def __post_init__(self):
        for row in self.lexicon:
            surf, ctx, cost = row[0], row[1], row[2]
            self._dict.setdefault(surf[0], []).append((surf, ctx, cost))
            if len(row) > 3 and row[3]:
                assert "".join(row[3]) == surf, row
                self._parts[surf] = tuple(row[3])


USER_DICT_COST = 200  # user entries out-cost every built-in arc


def with_user_entries(pack: LanguagePack, entries) -> LanguagePack:
    """A NEW pack with user-dictionary entries added at a very low cost
    (kuromoji/nori UserDictionary semantics: a user entry wins the
    lattice over any built-in or unknown segmentation of its span).

    ``entries``: iterable of surfaces, or (surface, parts) pairs — parts
    mark a decompoundable compound (nori Morpheme style).  User surfaces
    are EXEMPT from the search-mode length penalty (the user asked for
    exactly this segmentation; kuromoji expresses custom splits through
    the user entry itself, not the penalty)."""
    extra = []
    user_surfs = set()
    for e in entries:
        if isinstance(e, str):
            extra.append((e, pack.unk_ctx[pack.char_class(e[0])], USER_DICT_COST))
            user_surfs.add(e)
        else:
            surf, parts = e
            extra.append(
                (
                    surf,
                    pack.unk_ctx[pack.char_class(surf[0])],
                    USER_DICT_COST,
                    tuple(parts),
                )
            )
            user_surfs.add(surf)
    base_pen = pack.penalty

    def penalty(surface, mode, _u=frozenset(user_surfs), _p=base_pen):
        return 0 if surface in _u else _p(surface, mode)

    return LanguagePack(
        lexicon=list(pack.lexicon) + extra,
        conn=pack.conn,
        char_class=pack.char_class,
        space_class=pack.space_class,
        symbol_class=pack.symbol_class,
        unk_cost=pack.unk_cost,
        unk_ctx=pack.unk_ctx,
        unk_group=pack.unk_group,
        unk_pair_class=pack.unk_pair_class,
        penalty=penalty,
        unk_run_cost_per_char=pack.unk_run_cost_per_char,
        unk_single_extra=pack.unk_single_extra,
        unk_all=pack.unk_all,
        unk_all_cap=pack.unk_all_cap,
        unk_all_per_char=pack.unk_all_per_char,
    )


class LatticeTokenizer:
    """Viterbi best-path tokenizer over a LanguagePack."""

    def __init__(self, pack: LanguagePack):
        self.pack = pack

    # -- candidate generation ------------------------------------------------
    def _candidates(self, chunk: str, i: int, mode: str):
        p = self.pack
        out: list[tuple[str, int, int]] = []
        seen_lens: set[int] = set()
        for surf, ctx, cost in p._dict.get(chunk[i], ()):
            if chunk.startswith(surf, i):
                out.append((surf, ctx, cost + p.penalty(surf, mode)))
                seen_lens.add(len(surf))
        cls = p.char_class(chunk[i])
        run = 1
        while i + run < len(chunk) and p.char_class(chunk[i + run]) == cls:
            run += 1
        base = p.unk_cost[cls]
        ctx = p.unk_ctx[cls]
        if cls in p.unk_all:
            for ln in range(1, min(run, p.unk_all_cap) + 1):
                if ln not in seen_lens:
                    surf = chunk[i : i + ln]
                    out.append(
                        (
                            surf,
                            ctx,
                            base
                            + p.unk_all_per_char * ln
                            + p.penalty(surf, mode),
                        )
                    )
        elif cls in p.unk_group:
            if run not in seen_lens:
                surf = chunk[i : i + run]
                out.append(
                    (
                        surf,
                        ctx,
                        base
                        + p.unk_run_cost_per_char * run
                        + p.penalty(surf, mode),
                    )
                )
            if 1 not in seen_lens and run > 1:
                out.append((chunk[i], ctx, base + p.unk_single_extra))
        elif cls == p.unk_pair_class:
            for ln in (1, 2):
                if ln <= run and ln not in seen_lens:
                    out.append((chunk[i : i + ln], ctx, base + 3000 * (ln - 1)))
        else:
            if 1 not in seen_lens:
                out.append((chunk[i], ctx, base))
        return out

    # -- Viterbi -------------------------------------------------------------
    def _viterbi_chunk(self, chunk: str, mode: str) -> list[tuple[str, int]]:
        conn = self.pack.conn
        n = len(chunk)
        INF = 1 << 60
        best: list[tuple[int, int, tuple | None]] = [
            (INF, -1, None) for _ in range(n + 1)
        ]
        best[0] = (0, -1, None)
        ctx_at: list[int] = [0] * (n + 1)  # id 0 = BOS
        for i in range(n):
            c0, _, _ = best[i]
            if c0 >= INF:
                continue
            for surf, ctx, cost in self._candidates(chunk, i, mode):
                j = i + len(surf)
                total = c0 + int(conn[ctx_at[i], ctx]) + cost
                if total < best[j][0]:
                    best[j] = (total, i, (surf, ctx, cost))
                    ctx_at[j] = ctx
        out: list[tuple[str, int]] = []
        i = n
        while i > 0:
            _, prev, arc = best[i]
            if arc is None:  # pragma: no cover — singles make n reachable
                break
            out.append((arc[0], prev))
            i = prev
        out.reverse()
        return out

    # -- public --------------------------------------------------------------
    def tokenize(
        self,
        text: str,
        mode: str = "search",
        discard_punctuation: bool = True,
        decompound: bool = False,
    ) -> list[tuple[str, int, int]]:
        """[(surface, start, end)] (codepoint offsets); whitespace splits
        chunks.  ``decompound=True`` replaces lexicon compounds with
        their parts (nori's DISCARD decompound mode)."""
        p = self.pack
        out: list[tuple[str, int, int]] = []
        i, n = 0, len(text)
        while i < n:
            if p.char_class(text[i]) == p.space_class:
                i += 1
                continue
            j = i
            while j < n and p.char_class(text[j]) != p.space_class:
                j += 1
            for surf, off in self._viterbi_chunk(text[i:j], mode):
                if discard_punctuation and all(
                    p.char_class(c) == p.symbol_class for c in surf
                ):
                    continue
                start = i + off
                parts = p._parts.get(surf) if decompound else None
                if parts:
                    for part in parts:
                        out.append((part, start, start + len(part)))
                        start += len(part)
                else:
                    out.append((surf, start, start + len(surf)))
            i = j
        return out
