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


# --- two-fold affixes + flag modes (round-5 surface) -------------------------


def test_twofold_suffix_via_continuation_classes():
    # Stemmer.java isAffixCompatible: outer suffix A strips first, inner
    # suffix B strips second when B is cross-product and A's flag is in
    # B's continuation classes; the entry carries B's flag.
    from lucene_ray.analysis.hunspell import HunspellDictionary, HunspellStemmer

    aff = """
SFX E Y 1
SFX E 0 er/D .
SFX D Y 1
SFX D 0 n .
"""
    dic = "1\nKind/E"
    st = HunspellStemmer(HunspellDictionary(aff, dic))
    assert st.stems("Kinder") == ["Kind"]          # single strip
    assert st.stems("Kindern") == ["Kind"]         # two-fold: -n then -er
    # -n alone does not stem (Kind has no D flag, Kinder not an entry)
    assert st.stems("Kindn") == []


def test_twofold_requires_continuation_and_cross():
    from lucene_ray.analysis.hunspell import HunspellDictionary, HunspellStemmer

    # no continuation class on the inner rule -> two-fold must NOT fire
    aff = """
SFX E Y 1
SFX E 0 er .
SFX D Y 1
SFX D 0 n .
"""
    st = HunspellStemmer(HunspellDictionary(aff, "1\nKind/E"))
    assert st.stems("Kindern") == []
    # inner rule not cross-product -> blocked too
    aff2 = """
SFX E N 1
SFX E 0 er/D .
SFX D Y 1
SFX D 0 n .
"""
    st2 = HunspellStemmer(HunspellDictionary(aff2, "1\nKind/E"))
    assert st2.stems("Kindern") == []


def test_flag_long_mode():
    from lucene_ray.analysis.hunspell import HunspellDictionary, HunspellStemmer

    aff = """
FLAG long
SFX Aa Y 1
SFX Aa 0 s .
SFX Bb Y 1
SFX Bb 0 es/Aa .
"""
    d = HunspellDictionary(aff, "2\nhouse/Aa\nbox/BbZz")
    assert d.words["box"] == frozenset({"Bb", "Zz"})
    st = HunspellStemmer(d)
    assert st.stems("houses") == ["house"]
    assert st.stems("boxes") == ["box"]
    assert st.stems("boxess") == ["box"]  # two-fold: -s then -es


def test_flag_num_mode():
    from lucene_ray.analysis.hunspell import HunspellDictionary, HunspellStemmer

    # hu_HU-style numeric flags
    aff = """
FLAG num
SFX 101 Y 1
SFX 101 0 ok/102 .
SFX 102 Y 1
SFX 102 0 at .
"""
    d = HunspellDictionary(aff, "1\nasztal/101,999")
    assert d.words["asztal"] == frozenset({"101", "999"})
    st = HunspellStemmer(d)
    assert st.stems("asztalok") == ["asztal"]
    assert st.stems("asztalokat") == ["asztal"]   # two-fold


def test_real_format_aff_loads_with_inert_directives():
    # a de_DE-shaped file: SET/TRY/REP/MAP/COMPOUND*/CIRCUMFIX lines must
    # parse inert, umlaut condition classes must work
    from lucene_ray.analysis.hunspell import HunspellDictionary, HunspellStemmer

    aff = """
SET ISO8859-1
TRY esijanrtolcdugmphbyfvkwqxz
REP 2
REP f ph
REP ph f
MAP 1
MAP aàâä
COMPOUNDBEGIN x
COMPOUNDMIN 1
ONLYINCOMPOUND c
WORDCHARS 0123456789

PFX U Y 1
PFX U 0 un .

SFX F Y 2
SFX F 0 n e
SFX F 0 en [^e]
"""
    dic = "3\nFrau/F\nTür/F\nklar/U"
    st = HunspellStemmer(HunspellDictionary(aff, dic))
    assert st.stems("Frauen") == ["Frau"]
    assert st.stems("Türen") == ["Tür"]
    assert st.stems("unklar") == ["klar"]
