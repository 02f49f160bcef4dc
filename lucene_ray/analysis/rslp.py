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


def _step_min(step: dict) -> int:
    """Step.min semantics: a declared 0 means auto — the smallest
    (rule.min + len(suffix)) over the step's rules."""
    if step["min"]:
        return step["min"]
    return min(r[1] + len(r[0]) for r in step["rules"])


def apply_step_auto(t: str, step: dict) -> str:
    if len(t) < _step_min(step):
        return t
    return apply_step(t, {**step, "min": 0, "cond": step["cond"]})


def galician_stem(t: str) -> str:
    """gl/GalicianStemmer.java: the full RSLG flow over galician.rslp —
    Plural, Unification, Adverb, Augmentative-to-fixpoint, Noun (Verb
    only if Noun removed nothing), Vowel, then accent removal."""
    from .rslp_data import GALICIAN_STEPS

    t = apply_step_auto(t, GALICIAN_STEPS["Plural"])
    t = apply_step_auto(t, GALICIAN_STEPS["Unification"])
    t = apply_step_auto(t, GALICIAN_STEPS["Adverb"])
    while True:
        t2 = apply_step_auto(t, GALICIAN_STEPS["Augmentative"])
        if t2 == t:
            break
        t = t2
    t2 = apply_step_auto(t, GALICIAN_STEPS["Noun"])
    if t2 == t:
        t2 = apply_step_auto(t, GALICIAN_STEPS["Verb"])
    t = apply_step_auto(t2, GALICIAN_STEPS["Vowel"])
    return t.translate(_GL_ACCENTS)


_GL_ACCENTS = str.maketrans("áéêíóú", "aeeiou")


_PT_ACCENTS = str.maketrans("àáâãäåçèéêëìíîïñòóôõöùúûüýÿ", "aaaaaaceeeeiiiinooooouuuuyy")


def portuguese_rslp_stem(t: str) -> str:
    """pt/PortugueseStemmer.java: the full RSLP flow over
    portuguese.rslp — Plural, Adverb, Feminine, Augmentative, then Noun
    / Verb / Vowel where each later step runs only if the previous one
    removed nothing, and accent removal."""
    from .rslp_data import PORTUGUESE_STEPS

    t = apply_step_auto(t, PORTUGUESE_STEPS["Plural"])
    t = apply_step_auto(t, PORTUGUESE_STEPS["Adverb"])
    t = apply_step_auto(t, PORTUGUESE_STEPS["Feminine"])
    t = apply_step_auto(t, PORTUGUESE_STEPS["Augmentative"])
    t2 = apply_step_auto(t, PORTUGUESE_STEPS["Noun"])
    if t2 == t:
        t2 = apply_step_auto(t, PORTUGUESE_STEPS["Verb"])
        if t2 == t:
            t2 = apply_step_auto(t, PORTUGUESE_STEPS["Vowel"])
    return t2.translate(_PT_ACCENTS)
