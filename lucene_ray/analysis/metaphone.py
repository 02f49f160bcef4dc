"""Metaphone encoder (Lawrence Philips, 1990).

Reference: lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/
phonetic/PhoneticFilter.java delegates to commons-codec's
``org.apache.commons.codec.language.Metaphone``; this is that algorithm
(maxCodeLen=4 default) — frontal exceptions (AE/GN/KN/PN/WR drop the
first letter, X->S, WH->W), vowels kept only initially, and the
contextual consonant rules (CIA/CH->X, SCH->K, DGE->J, TH->0, PH->F,
X->KS, silent GH/GN/KN/MB...), golden-pinned in tests."""

from __future__ import annotations

# commons-codec RefinedSoundex US_ENGLISH mapping (letter -> digit)
_REFINED = {
    **dict.fromkeys("AEIOUYHW", "0"),
    **dict.fromkeys("BP", "1"),
    **dict.fromkeys("FV", "2"),
    **dict.fromkeys("CKS", "3"),
    **dict.fromkeys("GJ", "4"),
    **dict.fromkeys("QXZ", "5"),
    **dict.fromkeys("DT", "6"),
    "L": "7",
    **dict.fromkeys("MN", "8"),
    "R": "9",
}


def refined_soundex(txt: str) -> str:
    """commons-codec ``RefinedSoundex`` (the phonetic module's other
    Soundex variant): first letter + the digit of EVERY letter with
    adjacent duplicates collapsed, no length cap or zero padding."""
    s = "".join(c for c in txt.upper() if "A" <= c <= "Z")
    if not s:
        return ""
    out = [s[0]]
    last = None
    for c in s:
        d = _REFINED[c]
        if d != last:
            out.append(d)
        last = d
    return "".join(out)


def cologne_phonetic(txt: str) -> str:
    """Kölner Phonetik (commons-codec ``ColognePhonetic``, the phonetic
    module's German encoder): context-sensitive letter -> digit table,
    then collapse adjacent duplicates, then drop every '0' except a
    leading one.  Umlauts fold to their base vowels, ß to S."""
    fold = {"Ä": "A", "Ö": "O", "Ü": "U", "ß": "S"}
    s = "".join(fold.get(c, c) for c in txt.upper() if c.isalpha())
    s = "".join(c for c in s if "A" <= c <= "Z")
    if not s:
        return ""
    n = len(s)
    digits: list[str] = []
    for i, c in enumerate(s):
        prev = s[i - 1] if i > 0 else "\0"
        nxt = s[i + 1] if i + 1 < n else "\0"
        if c in "AEIJOUY":
            digits.append("0")
        elif c == "H":
            pass
        elif c == "B":
            digits.append("1")
        elif c == "P":
            digits.append("3" if nxt == "H" else "1")
        elif c in "DT":
            digits.append("8" if nxt in "CSZ" else "2")
        elif c in "FVW":
            digits.append("3")
        elif c in "GKQ":
            digits.append("4")
        elif c == "C":
            if i == 0:
                digits.append("4" if nxt in "AHKLOQRUX" else "8")
            elif prev in "SZ":
                digits.append("8")
            elif nxt in "AHKOQUX":
                digits.append("4")
            else:
                digits.append("8")
        elif c == "X":
            digits.append("8" if prev in "CKQ" else "48")
        elif c == "L":
            digits.append("5")
        elif c in "MN":
            digits.append("6")
        elif c == "R":
            digits.append("7")
        elif c in "SZ":
            digits.append("8")
    code = "".join(digits)
    # collapse adjacent duplicates
    out = [c for i, c in enumerate(code) if i == 0 or c != code[i - 1]]
    # drop '0' except in leading position
    return "".join(c for i, c in enumerate(out) if c != "0" or i == 0)


VOWELS = "AEIOU"
FRONTV = "EIY"  # front vowels
VARSON = "CSPTG"  # variable sound consonants before H


def metaphone(txt: str, max_code_len: int = 4) -> str:
    if not txt:
        return ""
    s = "".join(c for c in txt.upper() if c.isalpha())
    if not s:
        return ""
    if len(s) == 1:
        return s

    # frontal exceptions
    first2 = s[:2]
    if first2 in ("AE", "GN", "KN", "PN", "WR"):
        s = s[1:]
    elif s[0] == "X":
        s = "S" + s[1:]
    elif first2 == "WH":
        s = "W" + s[2:]

    code: list[str] = []
    n = len(s)
    i = 0
    while i < n and len(code) < max_code_len:
        c = s[i]
        prev = s[i - 1] if i > 0 else "\0"
        nxt = s[i + 1] if i + 1 < n else "\0"
        nxt2 = s[i + 2] if i + 2 < n else "\0"

        # dedupe doubled letters except C
        if c != "C" and c == prev:
            i += 1
            continue

        if c in VOWELS:
            if i == 0:
                code.append(c)
        elif c == "B":
            # silent terminal B after M (lamb, dumb)
            if not (i == n - 1 and prev == "M"):
                code.append("B")
        elif c == "C":
            # commons-codec rule order: SCI/SCE/SCY discard FIRST, then
            # CIA, then CI/CE/CY, then SCH, then the CH branch
            if prev == "S" and nxt in FRONTV:
                pass  # SCI/SCE/SCY: C is silent
            elif nxt == "I" and nxt2 == "A":  # CIA -> X
                code.append("X")
            elif nxt in FRONTV:
                code.append("S")
            elif prev == "S" and nxt == "H":  # SCH -> K
                code.append("K")
            elif nxt == "H":
                # word-initial CH with a vowel at index 2 -> K (the
                # commons-codec quirk its own tests pin), else X
                if i == 0 and n >= 3 and s[2] in VOWELS:
                    code.append("K")
                else:
                    code.append("X")
            else:
                code.append("K")
        elif c == "D":
            if nxt == "G" and nxt2 in FRONTV:  # DGE/DGI/DGY -> J
                code.append("J")
                i += 1  # skip the G
            else:
                code.append("T")
        elif c == "G":
            silent = False
            # GH silent unless before a vowel
            if nxt == "H" and nxt2 not in VOWELS and nxt2 != "\0":
                silent = True
            if nxt == "H" and i + 2 == n:
                silent = True
            # GN / GNED: silent G
            if nxt == "N":
                silent = True
            if prev == "D" and nxt in FRONTV:  # handled at D
                silent = True
            if not silent:
                if nxt in FRONTV and prev != "G":
                    code.append("J")
                else:
                    code.append("K")
        elif c == "H":
            # commons-codec: terminal H silent; after VARSON silent;
            # otherwise H sounds only before a vowel
            if i == n - 1:
                pass
            elif prev in VARSON:
                pass
            elif nxt in VOWELS:
                code.append("H")
        elif c == "K":
            if prev != "C":  # CK: K silent after C
                code.append("K")
        elif c in "FJLMNR":
            code.append(c)
        elif c == "P":
            code.append("F" if nxt == "H" else "P")
        elif c == "Q":
            code.append("K")
        elif c == "S":
            if nxt == "H":
                code.append("X")
            elif nxt == "I" and nxt2 in ("O", "A"):  # SIO/SIA -> X
                code.append("X")
            else:
                code.append("S")
        elif c == "T":
            if nxt == "I" and nxt2 in ("O", "A"):  # TIO/TIA -> X
                code.append("X")
            elif nxt == "H":
                code.append("0")  # theta
                i += 1  # TH is one sound
            elif nxt == "C" and nxt2 == "H":
                pass  # TCH: T silent
            else:
                code.append("T")
        elif c == "V":
            code.append("F")
        elif c in "WY":
            if nxt in VOWELS:
                code.append(c)
        elif c == "X":
            code.append("K")
            code.append("S")
        elif c == "Z":
            code.append("S")
        i += 1

    return "".join(code[:max_code_len])
