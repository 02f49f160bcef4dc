"""Brazilian Portuguese stemmer (reference br/BrazilianStemmer.java).

The classic BrazilianAnalyzer stemmer: accent-folding changeTerm, the
R1/R2/RV regions (R1 = after the first non-vowel following a vowel; RV
per the consonant/vowel second-letter cases), step 1 (standard suffix
removal gated on the suffix appearing in R1/R2/RV, with the reference's
own quirks preserved verbatim — the `logias` rule computes a replacement
and DISCARDS it, and a step-2 row checks `ira` but removes `ava`),
step 2 (the 114-row verb-suffix table, extracted data), step 3 (c-i),
step 4 (residual os/a/i/o), step 5 (final e with gu/ci collapse).

Returns the stemmed CT, the unstemmed CT for non-letter terms, or None
for unindexable terms (len <= 2 or >= 30) — matching
``BrazilianStemFilter`` which keeps the original token when the stemmer
returns null.
"""

from __future__ import annotations

from .brazilian_data import STEP2_RULES

_VOWELS = set("aeiou")

_FOLD = {
    "á": "a", "â": "a", "ã": "a",
    "é": "e", "ê": "e",
    "í": "i",
    "ó": "o", "ô": "o", "õ": "o",
    "ú": "u", "ü": "u",
    "ç": "c", "ñ": "n",
}

_STRIP_PUNCT = set("\"'-,;.?!")


def _change_term(value: str) -> str:
    return "".join(_FOLD.get(c, c) for c in value.lower())


def _get_r1(value: str | None) -> str | None:
    if value is None:
        return None
    i = len(value) - 1
    j = 0
    while j < i and value[j] not in _VOWELS:
        j += 1
    if not j < i:
        return None
    while j < i and value[j] in _VOWELS:
        j += 1
    if not j < i:
        return None
    return value[j + 1 :]


def _get_rv(value: str | None) -> str | None:
    if value is None:
        return None
    i = len(value) - 1
    if i > 0 and value[1] not in _VOWELS:
        j = 2
        while j < i and value[j] not in _VOWELS:
            j += 1
        if j < i:
            return value[j + 1 :]
    if i > 1 and value[0] in _VOWELS and value[1] in _VOWELS:
        j = 2
        while j < i and value[j] in _VOWELS:
            j += 1
        if j < i:
            return value[j + 1 :]
    if i > 2:
        return value[3:]
    return None


def _sfx(value: str | None, suffix: str) -> bool:
    return value is not None and value.endswith(suffix)


def _rm(value: str, suffix: str) -> str:
    return value[: -len(suffix)] if _sfx(value, suffix) else value


def _repl(value: str, suffix: str, to: str) -> str:
    return _rm(value, suffix) + to if _sfx(value, suffix) else value


def _preceded(value: str | None, suffix: str, pre: str) -> bool:
    return _sfx(value, suffix) and _rm(value, suffix).endswith(pre)


# step 1 rows: (min_ct_len, suffix, region, action) where region is one
# of "r1", "r2", "rv"; action None = remove, a string = replacement,
# ("pre", p, repl) = RV + suffixPreceded form, "NOOP" = the reference's
# discarded-result logias quirk
_STEP1 = [
    (0, "uciones", "r2", "u"),
    (6, "imentos", "r2", None),
    (6, "amentos", "r2", None),
    (6, "adores", "r2", None),
    (6, "adoras", "r2", None),
    (6, "logias", "r2", "NOOP"),  # reference discards the replacement
    (6, "encias", "r2", "ente"),
    (6, "amente", "r1", None),
    (6, "idades", "r2", None),
    (5, "acoes", "r2", None),
    (5, "imento", "r2", None),
    (5, "amento", "r2", None),
    (5, "adora", "r2", None),
    (5, "ismos", "r2", None),
    (5, "istas", "r2", None),
    (5, "logia", "r2", "log"),
    (5, "ucion", "r2", "u"),
    (5, "encia", "r2", "ente"),
    (5, "mente", "r2", None),
    (5, "idade", "r2", None),
    (4, "acao", "r2", None),
    (4, "ezas", "r2", None),
    (4, "icos", "r2", None),
    (4, "icas", "r2", None),
    (4, "ismo", "r2", None),
    (4, "avel", "r2", None),
    (4, "ivel", "r2", None),
    (4, "ista", "r2", None),
    (4, "osos", "r2", None),
    (4, "osas", "r2", None),
    (4, "ador", "r2", None),
    (4, "ivas", "r2", None),
    (4, "ivos", "r2", None),
    (4, "iras", "rv", ("pre", "e", "ir")),
    (3, "eza", "r2", None),
    (3, "ico", "r2", None),
    (3, "ica", "r2", None),
    (3, "oso", "r2", None),
    (3, "osa", "r2", None),
    (3, "iva", "r2", None),
    (3, "ivo", "r2", None),
    (3, "ira", "rv", ("pre", "e", "ir")),
]


def brazilian_stem(term: str) -> str | None:
    """Stem one (already tokenized) term; None = keep the original
    (BrazilianStemFilter's null contract)."""
    ct = _change_term(term)
    if len(ct) >= 2 and ct[0] in _STRIP_PUNCT:
        ct = ct[1:]
    if len(ct) >= 2 and ct[-1] in _STRIP_PUNCT:
        ct = ct[:-1]
    if not (2 < len(ct) < 30):
        return None
    if not all(c.isalpha() for c in ct):
        return ct

    r1 = _get_r1(ct)
    r2 = _get_r1(r1)
    rv = _get_rv(ct)

    altered = False
    # step 1
    for min_len, suf, region, action in _STEP1:
        if min_len and len(ct) < min_len:
            continue
        reg = {"r1": r1, "r2": r2, "rv": rv}[region]
        if not (_sfx(ct, suf) and _sfx(reg, suf)):
            continue
        if isinstance(action, tuple):  # ("pre", p, repl) — RV form
            _, pre, repl = action
            if not _preceded(ct, suf, pre):
                continue
            ct = _repl(ct, suf, repl)
        elif action == "NOOP":
            pass  # the logias quirk: result discarded, still "altered"
        elif action is None:
            ct = _rm(ct, suf)
        else:
            ct = _repl(ct, suf, action)
        altered = True
        break

    # step 2 (verb suffixes in RV)
    if not altered and rv is not None:
        for rv_min, check, remove in STEP2_RULES:
            if len(rv) >= rv_min and _sfx(rv, check):
                ct = _rm(ct, remove)
                altered = True
                break

    if altered:
        # step 3
        if rv is not None and _sfx(rv, "i") and _preceded(rv, "i", "c"):
            ct = _rm(ct, "i")
    else:
        # step 4
        if rv is not None:
            for suf in ("os", "a", "i", "o"):
                if _sfx(rv, suf):
                    ct = _rm(ct, suf)
                    break

    # step 5
    if rv is not None and _sfx(rv, "e"):
        if _preceded(rv, "e", "gu"):
            ct = _rm(ct, "e")
            ct = _rm(ct, "u")
        elif _preceded(rv, "e", "ci"):
            ct = _rm(ct, "e")
            ct = _rm(ct, "i")
        else:
            ct = _rm(ct, "e")
    return ct
