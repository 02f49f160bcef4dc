"""Hunspell dictionary stemmer — scoped subset.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
hunspell/Dictionary.java (.aff/.dic parsing), Stemmer.java (affix
stripping: a surface form ending in a rule's ``add`` string stems to
``word[:-len(add)] + strip`` when that candidate matches the rule's
condition and carries the rule's flag in the dictionary), and
HunspellStemFilter.java (no stems -> original passes through;
longestOnly picks the single longest stem; dedup otherwise).

SCOPE (documented): SFX + PFX rules with cross-product, char-class
conditions and flag checks.  Out of scope: two-fold affixes
(continuation classes), COMPOUND* rules, REP/MAP/TRY suggestion
tables, flag compression modes (long/num/UTF-8 flags read as single
chars), and ICONV/OCONV.
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
        self.rules: list[AffixRule] = []
        self._parse_aff(aff_text)
        self.words: dict[str, frozenset[str]] = {}
        self._parse_dic(dic_text)

    def _parse_aff(self, text: str) -> None:
        header: dict[str, bool] = {}  # flag -> cross_product
        for line in text.splitlines():
            t = line.split("#", 1)[0].split()
            if len(t) >= 4 and t[0] in ("SFX", "PFX"):
                kind, flag = t[0], t[1]
                if t[2] in ("Y", "N") and t[3].isdigit():
                    header[flag] = t[2] == "Y"  # rule-set header line
                    continue
                strip = "" if t[2] == "0" else t[2]
                add = "" if t[3] == "0" else t[3]
                add = add.split("/", 1)[0]  # continuation classes ignored
                cond = t[4] if len(t) > 4 else "."
                self.rules.append(
                    AffixRule(
                        kind,
                        flag,
                        header.get(flag, False),
                        strip,
                        add,
                        _cond_regex(kind, cond),
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
            word, _, flags = w.split()[0].partition("/")
            self.words[word] = frozenset(flags)

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
        entry, suffix strips, prefix strips, and cross-product
        prefix+suffix strips (both rules must allow cross-product)."""
        out: list[str] = []
        if word in self.dict.words:
            out.append(word)
        for cand, r in self._try_suffixes(word):
            if self.dict.has_flag(cand, r.flag) and cand not in out:
                out.append(cand)
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
