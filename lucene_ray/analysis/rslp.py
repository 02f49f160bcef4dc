"""RSLP step interpreter (Orengo & Huyck 2001, "A stemming algorithm for
the Portuguese language"; reference pt/RSLPStemmerBase.java semantics).

A step = (min word size, exception type, conditional end-suffixes,
ordered rules).  A word shorter than min, or not ending in any
conditional suffix, bypasses the step; otherwise the FIRST rule whose
suffix matches with a post-strip stem of at least the rule's min — and
whose exception test passes — fires: strip the suffix, append the
replacement.  type 1 = whole-word exception sets
(RuleWithSetExceptions), type 0 = exception SUFFIX lists
(RuleWithSuffixExceptions).

Rule data lives in rslp_data.py (extracted from the reference's
published .rslp resources by tools/extract_rslp.py)."""

from __future__ import annotations

from .rslp_data import GALICIAN_PLURAL, PORTUGUESE_PLURAL


def apply_step(t: str, step: dict) -> str:
    if len(t) < step["min"]:
        return t
    cond = step["cond"]
    if cond and not t.endswith(tuple(cond)):
        return t
    set_exceptions = step["type"] == 1
    for suffix, rmin, repl, exceptions in step["rules"]:
        if len(t) - len(suffix) < rmin or not t.endswith(suffix):
            continue
        if exceptions:
            if set_exceptions:
                if t in exceptions:
                    continue
            elif t.endswith(tuple(exceptions)):
                continue
        return t[: len(t) - len(suffix)] + repl
    return t


def galician_minimal_stem(t: str) -> str:
    """gl/GalicianMinimalStemmer.java: the galician.rslp Plural step."""
    return apply_step(t, GALICIAN_PLURAL)


def portuguese_minimal_stem(t: str) -> str:
    """pt/PortugueseMinimalStemmer.java: the portuguese.rslp Plural step."""
    return apply_step(t, PORTUGUESE_PLURAL)
