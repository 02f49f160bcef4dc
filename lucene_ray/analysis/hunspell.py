"""Hunspell dictionary stemmer.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
hunspell/Dictionary.java (.aff/.dic parsing, FLAG long/num modes,
continuation classes on affix append strings), Stemmer.java (affix
stripping + the two-fold suffix recursion: after stripping an outer
suffix A, an inner suffix B may also strip when B is cross-product and
B's continuation classes contain A's flag — ``isAffixCompatible``'s
cross-check of the "incoming continuation class"; the dictionary entry
must then carry B's flag), and HunspellStemFilter.java (no stems ->
original passes through; longestOnly picks the single longest stem).

SCOPE (documented): SFX + PFX rules with cross-product, char-class
conditions, flag checks, FLAG long / FLAG num / single-char flag modes,
and TWO-FOLD suffixes via continuation classes (outer suffix + inner
suffix, and prefix + one suffix).  Out of scope: COMPLEXPREFIXES,
COMPOUND* rules, NEEDAFFIX/CIRCUMFIX/ONLYINCOMPOUND special flags,
REP/MAP/TRY suggestion tables, and ICONV/OCONV.  Unknown directives are
skipped, so real .aff files (de_DE, hu_HU) load with those features
inert.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class AffixRule:
    kind: str  # "SFX" | "PFX"
    flag: str
    cross: bool
    strip: str  # chars removed from the stem when inflecting ("" for 0)
    add: str  # chars appended (suffix) / prepended (prefix)
    condition: re.Pattern  # anchored at the stem's end (SFX) / start (PFX)
    cont: frozenset[str]  # continuation classes on the append string


def parse_flags(s: str, mode: str) -> frozenset[str]:
    """One flag-run -> flag set under the FLAG directive's mode
    (Dictionary.java parseFlags: default = one char per flag, ``long`` =
    two chars per flag, ``num`` = comma-separated decimal numbers)."""
    if not s:
        return frozenset()
    if mode == "num":
        return frozenset(p.strip() for p in s.split(",") if p.strip())
    if mode == "long":
        return frozenset(s[i : i + 2] for i in range(0, len(s) - 1, 2))
    return frozenset(s)


def _cond_regex(kind: str, cond: str) -> re.Pattern:
    """Translate a hunspell condition (chars, [..] classes, '.') into an
    anchored regex over the CANDIDATE STEM (AffixCondition semantics)."""
    if cond == ".":
        return re.compile("")  # always matches
    parts: list[str] = []
    i = 0
    while i < len(cond):
        c = cond[i]
        if c == "[":
            j = cond.index("]", i)
            parts.append(cond[i : j + 1])
            i = j + 1
        elif c == ".":
            parts.append(".")
            i += 1
        else:
            parts.append(re.escape(c))
            i += 1
    body = "".join(parts)
    return re.compile(body + r"\Z" if kind == "SFX" else r"\A" + body)


class HunspellDictionary:
    """Parsed .aff rules + .dic entries (word -> flag set)."""

    def __init__(self, aff_text: str, dic_text: str):
        self.flag_mode = "single"
        self.rules: list[AffixRule] = []
        self._parse_aff(aff_text)
        self.words: dict[str, frozenset[str]] = {}
        self._parse_dic(dic_text)

    def _one_flag(self, s: str) -> str:
        flags = parse_flags(s, self.flag_mode)
        if len(flags) != 1:
            raise ValueError(f"affix header flag {s!r} under FLAG {self.flag_mode}")
        return next(iter(flags))

    def _parse_aff(self, text: str) -> None:
        # FLAG directive first: it governs every later flag-run parse
        for line in text.splitlines():
            t = line.split("#", 1)[0].split()
            if len(t) >= 2 and t[0] == "FLAG":
                self.flag_mode = t[1]  # "long" | "num" | ("UTF-8" ~ single)
                if self.flag_mode not in ("long", "num"):
                    self.flag_mode = "single"
        header: dict[str, bool] = {}  # flag -> cross_product
        for line in text.splitlines():
            t = line.split("#", 1)[0].split()
            if len(t) >= 4 and t[0] in ("SFX", "PFX"):
                kind = t[0]
                if t[2] in ("Y", "N") and t[3].isdigit():
                    header[self._one_flag(t[1])] = t[2] == "Y"  # rule-set header
                    continue
                flag = self._one_flag(t[1])
                strip = "" if t[2] == "0" else t[2]
                add = "" if t[3] == "0" else t[3]
                add, _, cont_run = add.partition("/")
                cond = t[4] if len(t) > 4 else "."
                self.rules.append(
                    AffixRule(
                        kind,
                        flag,
                        header.get(flag, False),
                        strip,
                        add,
                        _cond_regex(kind, cond),
                        parse_flags(cont_run, self.flag_mode),
                    )
                )

    def _parse_dic(self, text: str) -> None:
        lines = text.splitlines()
        start = 1 if lines and lines[0].strip().isdigit() else 0
        for line in lines[start:]:
            w = line.split("#", 1)[0].strip()
            if not w:
                continue
            # morphological fields (st:, po:, ...) follow whitespace —
            # only the first token is the word[/flags] (Dictionary.java)
            word, _, flag_run = w.split()[0].partition("/")
            self.words[word] = parse_flags(flag_run, self.flag_mode)

    def has_flag(self, word: str, flag: str) -> bool:
        f = self.words.get(word)
        return f is not None and flag in f


class HunspellStemmer:
    """Stemmer.java's affix stripping over the scoped dictionary."""

    def __init__(self, dictionary: HunspellDictionary):
        self.dict = dictionary
        self.sfx = [r for r in dictionary.rules if r.kind == "SFX"]
        self.pfx = [r for r in dictionary.rules if r.kind == "PFX"]

    def _try_suffixes(self, word: str):
        """Candidate (stem, rule) pairs after one suffix strip."""
        for r in self.sfx:
            if r.add and word.endswith(r.add) and len(word) > len(r.add):
                cand = word[: -len(r.add)] + r.strip
                if r.condition.search(cand):
                    yield cand, r

    def stems(self, word: str) -> list[str]:
        """All dictionary stems of ``word`` in discovery order: exact
        entry, suffix strips, TWO-FOLD suffix strips (outer rule A then
        inner rule B where B is cross-product, A's flag is in B's
        continuation classes, and the entry carries B's flag —
        Stemmer.isAffixCompatible's continuation cross-check), prefix
        strips, and cross-product prefix+suffix strips."""
        out: list[str] = []
        if word in self.dict.words:
            out.append(word)
        for cand, r in self._try_suffixes(word):
            if self.dict.has_flag(cand, r.flag) and cand not in out:
                out.append(cand)
            # two-fold: the outer rule must allow combination
            if not r.cross:
                continue
            for cand2, r2 in self._try_suffixes(cand):
                if (
                    r2.cross
                    and r.flag in r2.cont
                    and self.dict.has_flag(cand2, r2.flag)
                    and cand2 not in out
                ):
                    out.append(cand2)
        for p in self.pfx:
            if not (p.add and word.startswith(p.add) and len(word) > len(p.add)):
                continue
            body = p.strip + word[len(p.add) :]
            if not p.condition.search(body):
                continue
            if self.dict.has_flag(body, p.flag) and body not in out:
                out.append(body)
            if p.cross:
                for cand, r in self._try_suffixes(body):
                    if (
                        r.cross
                        and self.dict.has_flag(cand, r.flag)
                        and self.dict.has_flag(cand, p.flag)
                        and cand not in out
                    ):
                        out.append(cand)
        return out

    def stem_filter_term(self, word: str, longest_only: bool = True) -> str:
        """HunspellStemFilter as a one-token-out term filter: the longest
        stem (ties: first found), or the original when nothing stems."""
        st = self.stems(word)
        if not st:
            return word
        if longest_only:
            return max(st, key=len)
        return st[0]
