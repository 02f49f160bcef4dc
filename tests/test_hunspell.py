"""Scoped Hunspell stemmer (affix stripping against a synthetic en-ish
.aff/.dic — the classic en_US D/S/R/U rule shapes)."""

import pytest

from lucene_ray.analysis.hunspell import HunspellDictionary, HunspellStemmer

AFF = """
SET UTF-8

PFX U Y 1
PFX U   0     un       .

SFX D Y 4
SFX D   0     d          e
SFX D   y     ied        [^aeiou]y
SFX D   0     ed         [^ey]
SFX D   0     ed         [aeiou]y

SFX S Y 3
SFX S   y     ies        [^aeiou]y
SFX S   0     s          [^sxzh]
SFX S   0     es         [sxzh]

SFX G Y 2
SFX G   e     ing        .
SFX G   0     ing        [^e]
"""

DIC = """9
spy/DS
try/DSG
walk/DSG
box/S
tie/DG
lock/DSGU
happy
do/U
end/DSG
"""


@pytest.fixture(scope="module")
def stemmer():
    return HunspellStemmer(HunspellDictionary(AFF, DIC))


def test_suffix_rules(stemmer):
    assert stemmer.stems("spied") == ["spy"]       # y -> ied, [^aeiou]y
    assert stemmer.stems("spies") == ["spy"]       # y -> ies
    assert stemmer.stems("walked") == ["walk"]     # 0 -> ed, [^ey]
    assert stemmer.stems("walks") == ["walk"]
    assert stemmer.stems("boxes") == ["box"]       # 0 -> es, [sxzh]
    assert stemmer.stems("tied") == ["tie"]        # 0 -> d, e
    assert stemmer.stems("tying") == []            # no rule reaches 'tie'
    assert stemmer.stems("trying") == ["try"]      # 0 -> ing, [^e]
    assert stemmer.stems("ending") == ["end"]


def test_flag_gating(stemmer):
    # 'happy' has no flags: 'happied' must NOT stem to it
    assert stemmer.stems("happied") == []
    # 'box' lacks D: 'boxed' does not stem
    assert stemmer.stems("boxed") == []


def test_exact_and_prefix(stemmer):
    assert stemmer.stems("walk") == ["walk"]
    assert stemmer.stems("unlock") == ["lock"]     # PFX U
    assert stemmer.stems("undo") == ["do"]
    # cross-product: un + lock + ed (U and D both cross-product Y)
    assert stemmer.stems("unlocked") == ["lock"]
    # 'try' has no U flag
    assert stemmer.stems("untry") == []


def test_condition_on_candidate_not_surface(stemmer):
    # 'played'-shape: surface 'spyed' would need [^ey] on 'spy' -> 'spy'
    # ends in y so rule 3 ([^ey]) rejects; rule 4 ([aeiou]y) also
    # rejects since 'p' is not a vowel
    assert stemmer.stems("spyed") == []


def test_filter_term_mode(stemmer):
    assert stemmer.stem_filter_term("walked") == "walk"
    assert stemmer.stem_filter_term("zzz") == "zzz"  # passthrough
    # exact dictionary word stems to itself first, longest wins
    assert stemmer.stem_filter_term("walk") == "walk"


def test_term_filter_registration():
    from lucene_ray.analysis.analyzers import make_term_filter

    f = make_term_filter("hunspell", aff=AFF, dic=DIC)
    assert f("unlocked") == "lock"
    assert f("spied") == "spy"
    assert f("nothing") == "nothing"


def test_dic_morphological_fields():
    d = HunspellDictionary(AFF, "2\nhappy st:happy\nwalk/D st:walk po:verb\n")
    assert "happy" in d.words and d.words["happy"] == frozenset()
    assert d.words["walk"] == frozenset("D")
    st = HunspellStemmer(d)
    assert st.stems("walked") == ["walk"]
