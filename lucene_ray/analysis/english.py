"""English analysis chain: possessive strip, stop set, Porter + minimal
stemmers, ASCII folding, synonym expansion.

Reference semantics (reimplemented, not ported):
- analysis/common/src/java/org/apache/lucene/analysis/en/EnglishAnalyzer.java:1
  (chain: StandardTokenizer -> EnglishPossessiveFilter -> LowerCaseFilter ->
  StopFilter(ENGLISH_STOP_WORDS_SET) -> PorterStemFilter; 33-word stop set)
- en/EnglishPossessiveFilter.java:1 (strip trailing 's with ' \\u2019 \\uFF07)
- en/PorterStemmer.java:1 (Porter 1980 release 3 + the two recorded bug
  fixes; only words longer than 2 chars are stemmed) — validated against
  the reference's own porterTestData golden vectors (23,531 pairs) in
  tests/test_english.py
- en/EnglishMinimalStemmer.java:1 (Harman S-stemmer — the SQL-expressible
  variant used for the DuckDB-oracle driver family)
- miscellaneous/ASCIIFoldingFilter.java:1 (accent folding; here NFKD
  combining-mark strip + an explicit table for the non-decomposable Latin
  specials — a documented subset of the reference's full BMP switch)
- synonym/SynonymGraphFilter.java:1 (index-time expansion: synonyms are
  inserted at the SAME position, posInc 0; with discountOverlaps the norm
  is unchanged while tf/df of member terms grow)

All mappings run at VOCAB granularity (once per unique batch term, not per
token) through analyzers.ChainedVocabAnalyzer — the vectorized equivalent
of Lucene's per-token filter chain.
"""

from __future__ import annotations

import unicodedata

# EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (33 words)
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

_APOSTROPHES = ("'", "’", "＇")


def strip_possessive(term: str) -> str:
    """EnglishPossessiveFilter: drop a trailing <apostrophe>s / <apostrophe>S."""
    if (
        len(term) >= 2
        and term[-2] in _APOSTROPHES
        and (term[-1] == "s" or term[-1] == "S")
    ):
        return term[:-2]
    return term


def english_minimal_stem(term: str) -> str:
    """Harman S-stemmer (EnglishMinimalStemmer.stem), SQL-expressible."""
    n = len(term)
    if n < 3 or term[-1] != "s":
        return term
    p = term[-2]
    if p in ("u", "s"):
        return term
    if p == "e":
        if n > 3 and term[-3] == "i" and term[-4] not in ("a", "e"):
            return term[:-3] + "y"
        if term[-3] in ("i", "a", "o", "e"):
            return term
    return term[:-1]


# --- Porter stemmer ----------------------------------------------------------

_VOWELS = frozenset("aeiou")


class _Porter:
    """Porter 1980 release-3 stemmer operating on a char list; the module
    function porter_stem below is the public API (stateless per call)."""

    __slots__ = ("b", "j", "k")

    def stem(self, word: str) -> str:
        self.b = list(word)
        self.k = len(word) - 1
        self.j = 0
        if self.k > 1:  # words of length <= 2 are never touched
            self._step1()
            self._step2()
            self._step3()
            self._step4()
            self._step5()
            self._step6()
        return "".join(self.b[: self.k + 1])

    def _cons(self, i: int) -> bool:
        c = self.b[i]
        if c in _VOWELS:
            return False
        if c == "y":
            return True if i == 0 else not self._cons(i - 1)
        return True

    def _m(self) -> int:
        # number of consonant sequences in b[0..j]
        n = 0
        i = 0
        j = self.j
        while True:
            if i > j:
                return n
            if not self._cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if self._cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not self._cons(i):
                    break
                i += 1
            i += 1

    def _vowelinstem(self) -> bool:
        return any(not self._cons(i) for i in range(self.j + 1))

    def _doublec(self, j: int) -> bool:
        if j < 1:
            return False
        if self.b[j] != self.b[j - 1]:
            return False
        return self._cons(j)

    def _cvc(self, i: int) -> bool:
        if i < 2 or not self._cons(i) or self._cons(i - 1) or not self._cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def _ends(self, s: str) -> bool:
        l = len(s)
        o = self.k - l + 1
        if o < 0:
            return False
        if "".join(self.b[o : self.k + 1]) != s:
            return False
        self.j = self.k - l
        return True

    def _setto(self, s: str) -> None:
        o = self.j + 1
        for i, ch in enumerate(s):
            if o + i < len(self.b):
                self.b[o + i] = ch
            else:
                self.b.append(ch)
        self.k = self.j + len(s)

    def _r(self, s: str) -> None:
        if self._m() > 0:
            self._setto(s)

    def _step1(self) -> None:
        if self.b[self.k] == "s":
            if self._ends("sses"):
                self.k -= 2
            elif self._ends("ies"):
                self._setto("i")
            elif self.b[self.k - 1] != "s":
                self.k -= 1
        if self._ends("eed"):
            if self._m() > 0:
                self.k -= 1
        elif (self._ends("ed") or self._ends("ing")) and self._vowelinstem():
            self.k = self.j
            if self._ends("at"):
                self._setto("ate")
            elif self._ends("bl"):
                self._setto("ble")
            elif self._ends("iz"):
                self._setto("ize")
            elif self._doublec(self.k):
                ch = self.b[self.k]
                self.k -= 1
                if ch in ("l", "s", "z"):
                    self.k += 1
            elif self._m() == 1 and self._cvc(self.k):
                self._setto("e")

    def _step2(self) -> None:
        if self._ends("y") and self._vowelinstem():
            self.b[self.k] = "i"

    _STEP3 = {
        "a": (("ational", "ate"), ("tional", "tion")),
        "c": (("enci", "ence"), ("anci", "ance")),
        "e": (("izer", "ize"),),
        "l": (("bli", "ble"), ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous")),
        "o": (("ization", "ize"), ("ation", "ate"), ("ator", "ate")),
        "s": (("alism", "al"), ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous")),
        "t": (("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")),
        "g": (("logi", "log"),),
    }

    def _step3(self) -> None:
        if self.k == 0:
            return  # Bug 1 fix
        for suf, rep in self._STEP3.get(self.b[self.k - 1], ()):
            if self._ends(suf):
                self._r(rep)
                return

    _STEP4 = {
        "e": (("icate", "ic"), ("ative", ""), ("alize", "al")),
        "i": (("iciti", "ic"),),
        "l": (("ical", "ic"), ("ful", "")),
        "s": (("ness", ""),),
    }

    def _step4(self) -> None:
        for suf, rep in self._STEP4.get(self.b[self.k], ()):
            if self._ends(suf):
                self._r(rep)
                return

    _STEP5 = {
        "a": ("al",),
        "c": ("ance", "ence"),
        "e": ("er",),
        "i": ("ic",),
        "l": ("able", "ible"),
        "n": ("ant", "ement", "ment", "ent"),
        "s": ("ism",),
        "t": ("ate", "iti"),
        "u": ("ous",),
        "v": ("ive",),
        "z": ("ize",),
    }

    def _step5(self) -> None:
        if self.k == 0:
            return  # Bug 1 fix
        c = self.b[self.k - 1]
        if c == "o":
            # 'ion' only after s/t (j >= 0 is the Bug 2 fix); else 'ou'
            if self._ends("ion") and self.j >= 0 and self.b[self.j] in ("s", "t"):
                pass
            elif self._ends("ou"):
                pass
            else:
                return
        else:
            for suf in self._STEP5.get(c, ()):
                if self._ends(suf):
                    break
            else:
                return
        if self._m() > 1:
            self.k = self.j

    def _step6(self) -> None:
        self.j = self.k
        if self.b[self.k] == "e":
            a = self._m()
            if a > 1 or (a == 1 and not self._cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self._doublec(self.k) and self._m() > 1:
            self.k -= 1


# module-level memo: fused build tasks construct a fresh analyzer per task,
# but worker PROCESSES are long-lived — stems amortize across every task a
# worker runs (same pattern as the tokenizer table singletons).  Bounded;
# corpus vocabularies are far smaller than the bound.
_STEM_MEMO: dict[str, str] = {}
_STEM_MEMO_MAX = 1 << 20


def porter_stem(word: str) -> str:
    hit = _STEM_MEMO.get(word)
    if hit is not None:
        return hit
    out = _Porter().stem(word)
    if len(_STEM_MEMO) < _STEM_MEMO_MAX:
        _STEM_MEMO[word] = out
    return out


# --- ASCII folding ------------------------------------------------------------

# non-decomposable Latin specials (ASCIIFoldingFilter.java's switch covers
# these explicitly; NFKD alone cannot)
_FOLD_SPECIALS = {
    "ß": "ss",  # ß
    "æ": "ae", "Æ": "AE",
    "œ": "oe", "Œ": "OE",
    "ø": "o", "Ø": "O",
    "đ": "d", "Đ": "D",
    "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "TH",
    "ł": "l", "Ł": "L",
    "ħ": "h", "Ħ": "H",
    "ı": "i",  # dotless i
    "ĸ": "q",  # kra (reference maps to q)
    "ŋ": "n", "Ŋ": "N",  # eng
    "’": "'", "‘": "'", "“": '"', "”": '"',
    "–": "-", "—": "-",
}


def ascii_fold(term: str) -> str:
    """Fold accented/decorated Latin chars to ASCII.  NFKD combining-mark
    strip + the specials table above; chars that still aren't ASCII pass
    through unchanged (same pass-through the reference applies to chars
    outside its switch)."""
    if term.isascii():
        return term
    out: list[str] = []
    for ch in term:
        if ord(ch) < 128:
            out.append(ch)
            continue
        sp = _FOLD_SPECIALS.get(ch)
        if sp is not None:
            out.append(sp)
            continue
        dec = unicodedata.normalize("NFKD", ch)
        asc = "".join(c for c in dec if ord(c) < 128 and not unicodedata.combining(c))
        out.append(asc if asc else ch)
    return "".join(out)
