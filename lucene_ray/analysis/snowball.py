"""Snowball English (Porter2) stemmer, Snowball 3.0.0 semantics.

Reimplemented from the published algorithm (snowballstem.org, "The English
stemming algorithm") at the revision the reference vendors:
analysis/common/src/java/org/tartarus/snowball/ext/EnglishStemmer.java:1
("Generated from english.sbl by Snowball 3.0.0").  The 3.0-specific rules
are all included:

- the 9-entry R1 prefix list (arsen commun emerg gener inter later organ
  past univers) instead of the classic 3,
- succ/proc/exc + "eed(ly)" left alone in Step 1b,
- even/cann/inn/earr/herr/out + "ing" invariants (the old exception2 list
  folded into Step 1b),
- C + "ying" -> C + "ie" (dying -> die) inside Step 1b,
- [aeo] + double at word start keeps the double (adding -> add),
- "past" counts as a short syllable in shortv,
- ogist -> og in Step 2.

This is original Python implementing the published algorithm — the
generated Java is table-driven cursor code with no structural relation.
"""

from __future__ import annotations

_V = frozenset("aeiouy")  # g_v; marked 'Y' is NOT a vowel
_V_WXY = frozenset("aeiouywxY")  # g_v_WXY
_VALID_LI = frozenset("cdeghkmnrt")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

# exception1 (a_11): whole-word matches applied before anything else
_EXCEPTION1 = {
    "skis": "ski",
    "skies": "sky",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    "andes": "andes",
    "atlas": "atlas",
    "bias": "bias",
    "cosmos": "cosmos",
    "howe": "howe",
    "news": "news",
    "sky": "sky",
}

# a_0: R1 starts right after these prefixes (longest match)
_R1_PREFIXES = (
    "univers", "commun", "arsen", "emerg", "gener", "inter", "later",
    "organ", "past",
)

# Step 1b "ing" invariants (a_4 entries with "at word start" condition)
_ING_INVARIANT_STEMS = frozenset({"even", "cann", "inn", "earr", "herr", "out"})

# Step 2 (a_7), longest-first; conditional entries handled inline
_STEP2 = (
    ("ational", "ate"), ("ization", "ize"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"),
    ("biliti", "ble"), ("lessli", "less"), ("tional", "tion"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
    ("entli", "ent"), ("fulli", "ful"), ("ogist", "og"), ("iviti", "ive"),
    ("alli", "al"), ("abli", "able"), ("izer", "ize"), ("ator", "ate"),
    ("anci", "ance"), ("enci", "ence"),
    ("bli", "ble"), ("ogi", None), ("li", None),
)

# Step 3 (a_8), longest-first; "ative" additionally requires R2
_STEP3 = (
    ("ational", "ate"), ("tional", "tion"),
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ness", ""), ("ful", ""),
)

# Step 4 (a_9), longest-first; "ion" requires preceding s/t
_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ate", "ive", "ize", "iti", "ism", "ion", "ous", "ant", "ent",
    "ic", "er", "al",
)


def _shortv(w: str, e: int) -> bool:
    """r_shortv at backward cursor ``e`` (exclusive end of the stem)."""
    if e >= 3 and w[e - 1] not in _V_WXY and w[e - 2] in _V and w[e - 3] not in _V:
        return True
    if e == 2 and w[0] in _V and w[1] not in _V:
        return True
    if w[:e].endswith("past"):
        return True
    return False


def _mark_regions(w: str) -> tuple[int, int]:
    n = len(w)

    def _gopast(i: int) -> int:
        # gopast vowel, then gopast non-vowel; returns region start or n
        while i < n and w[i] not in _V:
            i += 1
        if i == n:
            return n
        i += 1
        while i < n and w[i] in _V:
            i += 1
        if i == n:
            return n
        return i + 1

    p1 = n
    for pref in sorted(_R1_PREFIXES, key=len, reverse=True):
        if w.startswith(pref):
            p1 = len(pref)
            break
    else:
        p1 = _gopast(0)
    if p1 >= n:
        return n, n
    return p1, _gopast(p1)


def _stem_long(word: str) -> str:
    w = word
    y_found = False
    if w.startswith("'"):
        w = w[1:]
    # y marking: initial y, and y after a vowel, become Y (non-vowel)
    if w.startswith("y"):
        w = "Y" + w[1:]
        y_found = True
    if "y" in w:
        chars = list(w)
        for i in range(1, len(chars)):
            if chars[i] == "y" and chars[i - 1] in _V:
                chars[i] = "Y"
                y_found = True
        w = "".join(chars)

    p1, p2 = _mark_regions(w)

    # --- Step 0: longest of '  's  's'
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # --- Step 1a
    if w.endswith("sses"):
        w = w[:-4] + "ss"
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-3] + ("i" if len(w) - 3 >= 2 else "ie")
    elif w.endswith("ss") or w.endswith("us"):
        pass
    elif w.endswith("s"):
        # delete if a vowel exists before the char immediately preceding s
        if any(c in _V for c in w[:-2]):
            w = w[:-1]

    # --- Step 1b
    suf = next(
        (s for s in ("eedly", "ingly", "edly", "eed", "ing", "ed") if w.endswith(s)),
        None,
    )
    if suf in ("eed", "eedly"):
        pos = len(w) - len(suf)
        if pos >= p1 and w[:pos] not in ("succ", "proc", "exc"):
            w = w[:pos] + "ee"
    elif suf is not None:
        pos = len(w) - len(suf)
        stem = w[:pos]
        handled = False
        if suf == "ing":
            if stem in _ING_INVARIANT_STEMS:
                handled = True  # inning/outing/canning/evening/earring/herring
            elif len(stem) == 2 and stem[1] == "y" and stem[0] not in _V:
                w = stem[0] + "ie"  # dying -> die
                handled = True
        if not handled and any(c in _V for c in stem):
            w = stem
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif w.endswith(_DOUBLES):
                # [aeo] + double at word start keeps the double
                if not (len(w) == 3 and w[0] in "aeo"):
                    w = w[:-1]
            elif len(w) == p1 and _shortv(w, len(w)):
                w += "e"

    # --- Step 1c: ...Cy -> ...Ci (the C not at word start)
    if len(w) >= 3 and (w[-1] == "y" or w[-1] == "Y") and w[-2] not in _V:
        w = w[:-1] + "i"

    # --- Step 2 (longest match, then R1 gate; no shorter-suffix retry)
    for s2, rep in _STEP2:
        if w.endswith(s2):
            pos = len(w) - len(s2)
            if pos >= p1:
                if s2 == "ogi":
                    if pos > 0 and w[pos - 1] == "l":
                        w = w[:pos] + "og"
                elif s2 == "li":
                    if pos > 0 and w[pos - 1] in _VALID_LI:
                        w = w[:pos]
                else:
                    w = w[:pos] + rep
            break

    # --- Step 3
    for s3, rep in _STEP3:
        if w.endswith(s3):
            pos = len(w) - len(s3)
            if pos >= p1 and (s3 != "ative" or pos >= p2):
                w = w[:pos] + rep
            break

    # --- Step 4 (R2)
    for s4 in _STEP4:
        if w.endswith(s4):
            pos = len(w) - len(s4)
            if pos >= p2:
                if s4 == "ion":
                    if pos > 0 and w[pos - 1] in "st":
                        w = w[:pos]
                else:
                    w = w[:pos]
            break

    # --- Step 5
    if w.endswith("e"):
        pos = len(w) - 1
        if pos >= p2 or (pos >= p1 and not _shortv(w, pos)):
            w = w[:pos]
    elif w.endswith("l"):
        pos = len(w) - 1
        if pos >= p2 and pos > 0 and w[pos - 1] == "l":
            w = w[:pos]

    if y_found:
        w = w.replace("Y", "y")
    return w


# module-level memo, same pattern (and rationale) as english._STEM_MEMO
_MEMO: dict[str, str] = {}
_MEMO_MAX = 1 << 20


def porter2_stem(word: str) -> str:
    hit = _MEMO.get(word)
    if hit is not None:
        return hit
    exc = _EXCEPTION1.get(word)
    if exc is not None:
        out = exc
    elif len(word) < 3:
        out = word
    else:
        out = _stem_long(word)
    if len(_MEMO) < _MEMO_MAX:
        _MEMO[word] = out
    return out
