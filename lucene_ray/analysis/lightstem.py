"""Minimal language stemmers (Savoy's light-stemming family).

Faithful transcriptions of the reference algorithms:
- fr/FrenchMinimalStemmer.java (aux -> al, strip s/r/e/é, dedupe final)
- de/GermanMinimalStemmer.java (umlaut fold, -nen, -en/-se/-es/-er,
  single n/e/s/r)
- es/SpanishMinimalStemmer.java (accent fold, plural -s/-es with the
  ces -> z rewrite)
- sv/SwedishMinimalStemmer.java (plural -s, the -arne/-erna/-arna/
  -orna/-aren group, -are, 2-char groups, single a/e/n)

All operate on lowercase input like the reference filters.
"""

from __future__ import annotations


def french_minimal_stem(t: str) -> str:
    n = len(t)
    if n < 6:
        return t
    s = list(t)
    if s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u":
            s[-2] = "l"
        return "".join(s[:-1])
    if s[n - 1] == "s":
        n -= 1
    if s[n - 1] == "r":
        n -= 1
    if s[n - 1] == "e":
        n -= 1
    if s[n - 1] == "é":
        n -= 1
    if n >= 2 and s[n - 1] == s[n - 2] and s[n - 1].isalpha():
        n -= 1
    return "".join(s[:n])


def german_minimal_stem(t: str) -> str:
    if len(t) < 5:
        return t
    s = list(t.translate(str.maketrans("äöü", "aou")))
    n = len(s)
    if n > 6 and s[n - 3] == "n" and s[n - 2] == "e" and s[n - 1] == "n":
        return "".join(s[: n - 3])
    if n > 5:
        last, prev = s[n - 1], s[n - 2]
        if (
            (last == "n" and prev == "e")
            or (last == "e" and prev == "s")
            or (last == "s" and prev == "e")
            or (last == "r" and prev == "e")
        ):
            return "".join(s[: n - 2])
    if s[n - 1] in "nesr":
        return "".join(s[: n - 1])
    return "".join(s)


_ES_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîïñ", "aaaaooooeeeeuuuuiiiin")


def spanish_minimal_stem(t: str) -> str:
    if len(t) < 4 or not t.endswith("s"):
        return t
    s = list(t.translate(_ES_FOLD))
    n = len(s)
    if s[n - 2] in ("a", "o"):
        return "".join(s[: n - 1])
    if s[n - 2] == "e":
        if s[n - 3] == "s" and s[n - 4] == "e":
            return "".join(s[: n - 2])
        if s[n - 3] == "c":
            s[n - 3] = "z"
            return "".join(s[: n - 2])
        return "".join(s[: n - 2])
    return "".join(s[: n - 1])


def swedish_minimal_stem(t: str) -> str:
    s = t
    n = len(s)
    if n > 4 and s[n - 1] == "s":
        n -= 1
    if n > 6 and s[:n].endswith(("arne", "erna", "arna", "orna", "aren")):
        return s[: n - 4]
    if n > 5 and s[:n].endswith("are"):
        return s[: n - 3]
    if n > 4 and s[:n].endswith(("ar", "at", "er", "et", "or", "en")):
        return s[: n - 2]
    if n > 3 and s[n - 1] in "aen":
        return s[: n - 1]
    return s[:n]


def russian_light_stem(t: str) -> str:
    """ru/RussianLightStemmer.java: removeCase (the 4/3/2/1-char case
    suffix ladder) then normalize (drop final ь/и, collapse нн)."""
    s = t
    n = len(s)
    if n > 6 and s[:n].endswith(("иями", "оями")):
        n -= 4
    elif n > 5 and s[:n].endswith((
        "иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему",
        "ери", "ими", "ого", "ому", "ыми", "оев",
    )):
        n -= 3
    elif n > 4 and s[:n].endswith((
        "ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв",
        "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев",
        "ий", "им", "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми",
    )):
        n -= 2
    elif n > 3 and s[n - 1] in "аеиоуйыяь":
        n -= 1
    # normalize
    if n > 3:
        if s[n - 1] in "ьи":
            n -= 1
        elif s[n - 1] == "н" and s[n - 2] == "н":
            n -= 1
    return s[:n]


_IT_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")


def italian_light_stem(t: str) -> str:
    """it/ItalianLightStemmer.java: accent fold + the final-vowel
    (e/i/a/o with ie/he/hi/ii/ia/io digraph) plural strip."""
    if len(t) < 6:
        return t
    s = t.translate(_IT_FOLD)
    n = len(s)
    last, prev = s[n - 1], s[n - 2]
    if last == "e":
        return s[: n - 2] if prev in "ih" else s[: n - 1]
    if last == "i":
        return s[: n - 2] if prev in "hi" else s[: n - 1]
    if last == "a":
        return s[: n - 2] if prev == "i" else s[: n - 1]
    if last == "o":
        return s[: n - 2] if prev == "i" else s[: n - 1]
    return s


_DE_FOLD = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")
_DE_ST = frozenset("bdfghklmnt")  # stEnding consonants


def german_light_stem(t: str) -> str:
    """de/GermanLightStemmer.java: accent fold, step1 (ern / em|en|er|es
    / e / s-after-st-consonant), step2 (est / er|en / st)."""
    s = t.translate(_DE_FOLD)
    n = len(s)
    # step 1
    if n > 5 and s.endswith("ern"):
        n -= 3
    elif n > 4 and s[n - 2] == "e" and s[n - 1] in "mnrs":
        n -= 2
    elif n > 3 and s[n - 1] == "e":
        n -= 1
    elif n > 3 and s[n - 1] == "s" and s[n - 2] in _DE_ST:
        n -= 1
    # step 2
    if n > 5 and s[n - 3] == "e" and s[n - 2] == "s" and s[n - 1] == "t":
        n -= 3
    elif n > 4 and s[n - 2] == "e" and s[n - 1] in "rn":
        n -= 2
    elif n > 4 and s[n - 2] == "s" and s[n - 1] == "t" and s[n - 3] in _DE_ST:
        n -= 2
    return s[:n]


def norwegian_minimal_stem(t: str, nynorsk: bool = False) -> str:
    """no/NorwegianMinimalStemmer.java with the filter's default BOKMAAL
    flags (pass nynorsk=True for the -ane/-ar endings)."""
    s = t
    n = len(s)
    if n > 4 and s[n - 1] == "s":
        n -= 1
    if n > 5 and (
        s[:n].endswith("ene") or (nynorsk and s[:n].endswith("ane"))
    ):
        return s[: n - 3]
    if n > 4 and (
        s[:n].endswith(("er", "en", "et"))
        or (nynorsk and s[:n].endswith("ar"))
    ):
        return s[: n - 2]
    if n > 3 and s[n - 1] in "ae":
        return s[: n - 1]
    return s[:n]


def swedish_light_stem(t: str) -> str:
    """sv/SwedishLightStemmer.java: plural -s then the 5/4/3/2/1-char
    suffix ladder (elser/heten, arne/erna/ande/else/aste/orna/aren,
    are/ast/het, 2-char group, single t/a/e/n)."""
    s = t
    n = len(s)
    if n > 4 and s[n - 1] == "s":
        n -= 1
    if n > 7 and s[:n].endswith(("elser", "heten")):
        return s[: n - 5]
    if n > 6 and s[:n].endswith(
        ("arne", "erna", "ande", "else", "aste", "orna", "aren")
    ):
        return s[: n - 4]
    if n > 5 and s[:n].endswith(("are", "ast", "het")):
        return s[: n - 3]
    if n > 4 and s[:n].endswith(("ar", "er", "or", "en", "at", "te", "et")):
        return s[: n - 2]
    if n > 3 and s[n - 1] in "taen":
        return s[: n - 1]
    return s[:n]


def arabic_normalize(t: str) -> str:
    """ar/ArabicNormalizer.java: alef variants fold to bare alef,
    dotless yeh to yeh, teh marbuta to heh; tatweel and the harakat
    (fatha/damma/kasra + tanwin, shadda, sukun) delete."""
    fold = {
        "آ": "ا", "أ": "ا", "إ": "ا",
        "ى": "ي", "ة": "ه",
    }
    drop = set("ـًٌٍَُِّْ")
    return "".join(fold.get(c, c) for c in t if c not in drop)


def czech_stem(t: str) -> str:
    """cz/CzechStemmer.java light stemmer: case ladder, possessive
    -ov/-in/-ův, palatalization normalize (čt->ck, št->sk, c/č->k,
    z/ž->h, e-insertion removal, ů->o)."""
    s = t
    n = len(s)
    # removeCase
    if n > 7 and s[:n].endswith("atech"):
        n -= 5
    elif n > 6 and s[:n].endswith(("ětem", "etem", "atům")):
        n -= 4
    elif n > 5 and s[:n].endswith((
        "ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
        "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
        "aty", "ých", "ama", "ami", "ové", "ovi", "ými",
    )):
        n -= 3
    elif n > 4 and s[:n].endswith((
        "em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
        "mi", "ou",
    )):
        n -= 2
    elif n > 3 and s[n - 1] in "aeiouůyáéíýě":
        n -= 1
    # removePossessives
    if n > 5 and s[:n].endswith(("ov", "in", "ův")):
        n -= 2
    if n <= 0:
        return s[:n]
    # normalize
    b = list(s[:n])
    if n >= 2 and b[-2] + b[-1] == "čt":
        b[-2], b[-1] = "c", "k"
        return "".join(b)
    if n >= 2 and b[-2] + b[-1] == "št":
        b[-2], b[-1] = "s", "k"
        return "".join(b)
    if b[-1] in "cč":
        b[-1] = "k"
        return "".join(b)
    if b[-1] in "zž":
        b[-1] = "h"
        return "".join(b)
    if n > 1 and b[-2] == "e":
        b[-2] = b[-1]
        return "".join(b[:-1])
    if n > 2 and b[-2] == "ů":
        b[-2] = "o"
        return "".join(b)
    return "".join(b)


def bulgarian_stem(t: str) -> str:
    """bg/BulgarianStemmer.java: -ища, definite-article ladder, plural
    rules with the ци->к / си->х / е..и->я rewrites, final я/а/о/е,
    -ен -> н and ъN -> N collapses."""
    s = list(t)
    n = len(s)
    if n < 4:
        return t
    if n > 5 and t.endswith("ища"):
        return t[: n - 3]
    # removeArticle
    def _ends(k):
        return "".join(s[:n]).endswith(k)

    if n > 6 and _ends("ият"):
        n -= 3
    elif n > 5 and (_ends("ът") or _ends("то") or _ends("те") or _ends("та") or _ends("ия")):
        n -= 2
    elif n > 4 and _ends("ят"):
        n -= 2
    # removePlural
    if n > 6 and _ends("овци"):
        n -= 3
    elif n > 6 and _ends("ове"):
        n -= 3
    elif n > 6 and _ends("еве"):
        s[n - 3] = "й"
        n -= 2
    elif n > 5 and _ends("ища"):
        n -= 3
    elif n > 5 and _ends("та"):
        n -= 2
    elif n > 5 and _ends("ци"):
        s[n - 2] = "к"
        n -= 1
    elif n > 5 and _ends("зи"):
        s[n - 2] = "г"
        n -= 1
    elif n > 5 and s[n - 3] == "е" and s[n - 1] == "и":
        s[n - 3] = "я"
        n -= 1
    elif n > 4 and _ends("си"):
        s[n - 2] = "х"
        n -= 1
    elif n > 4 and _ends("и"):
        n -= 1
    if n > 3:
        if s[n - 1] == "я":
            n -= 1
        if n >= 1 and s[n - 1] in "аое":
            n -= 1
    if n > 4 and "".join(s[:n]).endswith("ен"):
        s[n - 2] = "н"
        n -= 1
    if n > 5 and s[n - 2] == "ъ":
        s[n - 2] = s[n - 1]
        n -= 1
    return "".join(s[:n])


def sorani_normalize(t: str) -> str:
    """ckb/SoraniNormalizer.java, mirrored as the same single mutating
    forward pass: yeh variants -> farsi yeh, kaf -> keheh, heh+ZWNJ ->
    ae, heh FINAL IN THE CURRENT BUFFER -> ae (a heh followed by a
    not-yet-deleted tatweel is NOT final and stays heh — the reference's
    scan-order behavior), teh marbuta -> ae, heh doachashmee -> heh,
    initial reh -> rreh, rreh-above -> rreh, tatweel/harakat AND every
    Unicode FORMAT (Cf) character deleted."""
    import unicodedata as _ud

    s = list(t)
    n = len(s)
    i = 0
    while i < n:
        c = s[i]
        if c in "يى":
            s[i] = "ی"
        elif c == "ك":
            s[i] = "ک"
        elif c == "‌":  # ZWNJ
            if i > 0 and s[i - 1] == "ه":
                s[i - 1] = "ە"
            del s[i]
            n -= 1
            continue
        elif c == "ه":
            if i == n - 1:
                s[i] = "ە"
        elif c == "ة":
            s[i] = "ە"
        elif c == "ھ":
            s[i] = "ه"
        elif c == "ر":
            if i == 0:
                s[i] = "ڕ"
        elif c == "ڒ":
            s[i] = "ڕ"
        elif c in "ـًٌٍَُِّْ":
            del s[i]
            n -= 1
            continue
        elif _ud.category(c) == "Cf":
            del s[i]
            n -= 1
            continue
        i += 1
    return "".join(s[:n])


_FI_VOWELS = frozenset("aeiouy")


def _fi_ends(s: list, n: int, suf: str) -> bool:
    return n >= len(suf) and "".join(s[n - len(suf) : n]) == suf


def finnish_light_stem(t: str) -> str:
    """fi/FinnishLightStemmer.java: ä/å/ö fold, the recursive -kin/-ko
    particle strip, possessive/case steps, and the normalization passes
    (hde->ksi, final vowels, doubled k/p/t collapse)."""
    if len(t) < 4:
        return t
    s = list(t.translate(str.maketrans("äåö", "aao")))
    n = len(s)

    def step1(n: int) -> int:
        if n > 8:
            if _fi_ends(s, n, "kin"):
                return step1(n - 3)
            if _fi_ends(s, n, "ko"):
                return step1(n - 2)
        if n > 11:
            if _fi_ends(s, n, "dellinen"):
                return n - 8
            if _fi_ends(s, n, "dellisuus"):
                return n - 9
        return n

    n = step1(n)
    # step2
    if n > 5:
        if _fi_ends(s, n, "lla") or _fi_ends(s, n, "tse") or _fi_ends(s, n, "sti"):
            n -= 3
        elif _fi_ends(s, n, "ni"):
            n -= 2
        elif _fi_ends(s, n, "aa"):
            n -= 1
    # step3
    done = False
    if n > 8 and not done:
        if _fi_ends(s, n, "nnen"):
            s[n - 4] = "s"
            n -= 3
            done = True
        elif _fi_ends(s, n, "ntena"):
            s[n - 5] = "s"
            n -= 4
            done = True
        elif _fi_ends(s, n, "tten"):
            n -= 4
            done = True
        elif _fi_ends(s, n, "eiden"):
            n -= 5
            done = True
    if n > 6 and not done:
        if (
            _fi_ends(s, n, "neen")
            or _fi_ends(s, n, "niin")
            or _fi_ends(s, n, "seen")
            or _fi_ends(s, n, "teen")
            or _fi_ends(s, n, "inen")
        ):
            n -= 4
            done = True
        elif s[n - 3] == "h" and s[n - 2] in _FI_VOWELS and s[n - 1] == "n":
            n -= 3
            done = True
        elif _fi_ends(s, n, "den"):
            s[n - 3] = "s"
            n -= 2
            done = True
        elif _fi_ends(s, n, "ksen"):
            s[n - 4] = "s"
            n -= 3
            done = True
        elif (
            _fi_ends(s, n, "ssa") or _fi_ends(s, n, "sta")
            or _fi_ends(s, n, "lla") or _fi_ends(s, n, "lta")
            or _fi_ends(s, n, "tta") or _fi_ends(s, n, "ksi")
            or _fi_ends(s, n, "lle")
        ):
            n -= 3
            done = True
    if n > 5 and not done:
        if _fi_ends(s, n, "na") or _fi_ends(s, n, "ne"):
            n -= 2
            done = True
        elif _fi_ends(s, n, "nei"):
            n -= 3
            done = True
    if n > 4 and not done:
        if _fi_ends(s, n, "ja") or _fi_ends(s, n, "ta"):
            n -= 2
        elif s[n - 1] == "a":
            n -= 1
        elif s[n - 1] == "n" and s[n - 2] in _FI_VOWELS:
            n -= 2
        elif s[n - 1] == "n":
            n -= 1
    # norm1
    if n > 5 and _fi_ends(s, n, "hde"):
        s[n - 3], s[n - 2], s[n - 1] = "k", "s", "i"
    hit = False
    if n > 4 and (_fi_ends(s, n, "ei") or _fi_ends(s, n, "at")):
        n -= 2
        hit = True
    if not hit and n > 3 and s[n - 1] in "tsjeai":
        n -= 1
    # norm2
    if n > 8 and s[n - 1] in "eou":
        n -= 1
    if n > 4:
        if s[n - 1] == "i":
            n -= 1
        if n > 4:
            ch = s[0]
            i = 1
            while i < n:
                if s[i] == ch and ch in "kpt":
                    del s[i : i + 1]
                    n -= 1
                else:
                    ch = s[i]
                    i += 1
    return "".join(s[:n])


_HU_FOLD = str.maketrans("áëéíóőõöúűũûü", "aeeioooouuuuu")


def hungarian_light_stem(t: str) -> str:
    """hu/HungarianLightStemmer.java: accent fold, then the case /
    possessive / plural / final-vowel removal passes with their
    vowel-context gates and the doubled-consonant al/el rule."""
    s = t.translate(_HU_FOLD)
    V = _FI_VOWELS  # same a/e/i/o/u/y vowel set
    n = len(s)

    def ends(k):
        return s[:n].endswith(k)

    # removeCase
    if n > 6 and ends("kent"):
        n -= 4
    else:
        took = False
        if n > 5:
            if ends(("nak", "nek", "val", "vel", "ert", "rol", "ban",
                     "ben", "bol", "nal", "nel", "hoz", "hez", "tol")):
                n -= 3
                took = True
            elif ends(("al", "el")) and s[n - 3] not in V and s[n - 3] == s[n - 4]:
                n -= 3
                took = True
        if not took and n > 4:
            if ends(("at", "et", "ot", "va", "ve", "ra", "re", "ba",
                     "be", "ul", "ig")):
                n -= 2
            elif ends(("on", "en")) and s[n - 3] not in V:
                n -= 2
            elif s[n - 1] in "tn":
                n -= 1
            elif s[n - 1] in "ae" and s[n - 2] == s[n - 3] and s[n - 2] not in V:
                n -= 2
    # removePossessive
    took = False
    if n > 6:
        if s[n - 5] not in V and ends(("atok", "otok", "etek")):
            n -= 4
            took = True
        elif ends(("itek", "itok")):
            n -= 4
            took = True
    if not took and n > 5:
        if s[n - 4] not in V and ends(("unk", "tok", "tek")):
            n -= 3
            took = True
        elif s[n - 4] in V and ends("juk"):
            n -= 3
            took = True
        elif ends("ink"):
            n -= 3
            took = True
    if not took and n > 4:
        if s[n - 3] not in V and ends(("am", "em", "om", "ad", "ed", "od", "uk")):
            n -= 2
            took = True
        elif s[n - 3] in V and ends(("nk", "ja", "je")):
            n -= 2
            took = True
        elif ends(("im", "id", "ik")):
            n -= 2
            took = True
    if not took and n > 3:
        c = s[n - 1]
        if c in "ae" and s[n - 2] not in V:
            n -= 1
        elif c in "md" and s[n - 2] in V:
            n -= 1
        elif c == "i":
            n -= 1
    # removePlural
    if n > 3 and s[n - 1] == "k":
        if s[n - 2] in "aoe" and n > 4:
            n -= 2
        else:
            n -= 1
    # normalize
    if n > 3 and s[n - 1] in "aeio":
        n -= 1
    return s[:n]


_LV_VOWELS = frozenset("aeiouāīēū")
# (suffix, vowel-count threshold, fires palatalization) in priority order
_LV_AFFIXES = [
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False), ("īm", 1, False),
    ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False), ("ie", 1, False),
    ("u", 1, True), ("a", 1, True), ("i", 1, True),
    ("e", 1, False), ("ā", 1, False), ("ē", 1, False),
    ("ī", 1, False), ("ū", 1, False), ("o", 1, False),
    ("s", 0, False), ("š", 0, False),
]


def _lv_unpalatalize(s: list, n: int) -> str:
    """Reverse palatalization at the new stem end; ``s[n]`` is the first
    char of the stripped suffix (the reference peeks at it for the
    kš->kst and ņņ->nn rules)."""
    tail2 = "".join(s[n - 2 : n])
    if n < len(s) and s[n] == "u":
        if tail2 == "kš":
            return "".join(s[: n - 1]) + "st"
        if tail2 == "ņņ":
            return "".join(s[: n - 2]) + "nn"
    if tail2 in ("pj", "bj", "mj", "vj"):
        return "".join(s[: n - 1])
    repl = {
        "šņ": "sn", "žņ": "zn", "šļ": "sl", "žļ": "zl",
        "ļņ": "ln", "ļļ": "ll",
    }.get(tail2)
    if repl:
        return "".join(s[: n - 2]) + repl
    last = {"č": "c", "ļ": "l", "ņ": "n"}.get(s[n - 1])
    if last:
        return "".join(s[: n - 1]) + last
    return "".join(s[:n])


def latvian_stem(t: str) -> str:
    """lv/LatvianStemmer.java ("light stemmer ... as presented in
    Tilde's 'A stemming algorithm for Latvian'"): strip the first affix
    whose vowel-count and length gates pass, then reverse
    palatalization for the affixes that fire it."""
    nv = sum(c in _LV_VOWELS for c in t)
    n = len(t)
    for affix, vc, pal in _LV_AFFIXES:
        if nv > vc and n >= len(affix) + 3 and t.endswith(affix):
            m = n - len(affix)
            if pal:
                return _lv_unpalatalize(list(t), m)
            return t[:m]
    return t


def indonesian_stem(t: str, stem_derivational: bool = True) -> str:
    """id/IndonesianStemmer.java (Asian's "Effective Techniques for
    Indonesian Text Retrieval"): inflectional particles/possessives,
    then the derivational first-order prefix -> suffix -> second-order
    prefix pipeline with the meng-/peng- sound rewrites and the flag
    interactions that block illegal prefix+suffix combinations."""
    KE, PENG, DI, MENG, TER, BER, PE = 1, 2, 4, 8, 16, 32, 64
    st = {"ns": sum(c in "aeiou" for c in t), "fl": 0}
    s = t

    def first_order(s: str) -> str:
        if s.startswith("meng"):
            st["fl"] |= MENG; st["ns"] -= 1
            return s[4:]
        if s.startswith("meny") and len(s) > 4 and s[4] in "aeiou":
            st["fl"] |= MENG; st["ns"] -= 1
            return "s" + s[4:]
        if s.startswith(("men", "mem")):
            st["fl"] |= MENG; st["ns"] -= 1
            return s[3:]
        if s.startswith("me"):
            st["fl"] |= MENG; st["ns"] -= 1
            return s[2:]
        if s.startswith("peng"):
            st["fl"] |= PENG; st["ns"] -= 1
            return s[4:]
        if s.startswith("peny") and len(s) > 4 and s[4] in "aeiou":
            st["fl"] |= PENG; st["ns"] -= 1
            return "s" + s[4:]
        if s.startswith("peny"):
            st["fl"] |= PENG; st["ns"] -= 1
            return s[4:]
        if s.startswith("pen") and len(s) > 3 and s[3] in "aeiou":
            st["fl"] |= PENG; st["ns"] -= 1
            return "t" + s[3:]
        if s.startswith(("pen", "pem")):
            st["fl"] |= PENG; st["ns"] -= 1
            return s[3:]
        if s.startswith("di"):
            st["fl"] |= DI; st["ns"] -= 1
            return s[2:]
        if s.startswith("ter"):
            st["fl"] |= TER; st["ns"] -= 1
            return s[3:]
        if s.startswith("ke"):
            st["fl"] |= KE; st["ns"] -= 1
            return s[2:]
        return s

    def second_order(s: str) -> str:
        if s.startswith("ber") or s == "belajar":
            st["fl"] |= BER; st["ns"] -= 1
            return s[3:]
        if (
            s.startswith("be") and len(s) > 4
            and s[2] not in "aeiou" and s[3] == "e" and s[4] == "r"
        ):
            st["fl"] |= BER; st["ns"] -= 1
            return s[2:]
        if s.startswith("per") or s == "pelajar":
            st["ns"] -= 1
            return s[3:]
        if s.startswith("pe"):
            st["fl"] |= PE; st["ns"] -= 1
            return s[2:]
        return s

    def suffix(s: str) -> str:
        if s.endswith("kan") and not st["fl"] & (KE | PENG | PE):
            st["ns"] -= 1
            return s[:-3]
        if s.endswith("an") and not st["fl"] & (DI | MENG | TER):
            st["ns"] -= 1
            return s[:-2]
        if (
            s.endswith("i") and not s.endswith("si")
            and not st["fl"] & (BER | KE | PENG)
        ):
            st["ns"] -= 1
            return s[:-1]
        return s

    if st["ns"] > 2 and s.endswith(("kah", "lah", "pun")):
        st["ns"] -= 1
        s = s[:-3]
    if st["ns"] > 2:
        if s.endswith(("ku", "mu")):
            st["ns"] -= 1
            s = s[:-2]
        elif s.endswith("nya"):
            st["ns"] -= 1
            s = s[:-3]
    if stem_derivational:
        old = s
        if st["ns"] > 2:
            s = first_order(s)
        if s != old:  # a first-order rule fired
            old = s
            if st["ns"] > 2:
                s = suffix(s)
            if s != old and st["ns"] > 2:
                s = second_order(s)
        else:
            if st["ns"] > 2:
                s = second_order(s)
            if st["ns"] > 2:
                s = suffix(s)
    return s


# hi/HindiNormalizer.java single-codepoint rewrites (machine-checked
# against the reference switch); deletions and the न+virama contextual
# rule are handled in code
_HI_MAP = {
    "ँ": "ं", "ऩ": "न", "ऱ": "र",
    "ऴ": "ळ", "क़": "क", "ख़": "ख",
    "ग़": "ग", "ज़": "ज", "ड़": "ड",
    "ढ़": "ढ", "फ़": "फ", "य़": "य",
    "ॅ": "े", "ॆ": "े", "ॉ": "ो",
    "ॊ": "ो", "ऍ": "ए", "ऎ": "ए",
    "ऑ": "ओ", "ऒ": "ओ", "ॲ": "अ",
    "आ": "अ", "ई": "इ", "ऊ": "उ",
    "ॠ": "ऋ", "ॡ": "ऌ", "ऐ": "ए",
    "औ": "ओ", "ी": "ि", "ू": "ु",
    "ॄ": "ृ", "ॣ": "ॢ", "ै": "े",
    "ौ": "ो",
}
_HI_DROP = frozenset("़‍‌्")


def hindi_normalize(t: str) -> str:
    """hi/HindiNormalizer.java (Ljiljana & Fox's Devanagari
    normalization): nukta/ZWJ/ZWNJ/virama deletion, न + virama ->
    anusvara, chandrabindu -> anusvara, nukta consonants and vowel
    variants folded to base forms."""
    out: list[str] = []
    i = 0
    n = len(t)
    while i < n:
        c = t[i]
        if c == "न" and i + 1 < n and t[i + 1] == "्":
            out.append("ं")  # na + virama -> anusvara
            i += 2
            continue
        if c in _HI_DROP:
            i += 1
            continue
        out.append(_HI_MAP.get(c, c))
        i += 1
    return "".join(out)


def persian_normalize(t: str) -> str:
    """fa/PersianNormalizer.java: farsi yeh / yeh barree -> arabic yeh,
    keheh -> kaf, heh+yeh / heh goal -> heh, hamza above deleted."""
    out: list[str] = []
    for c in t:
        if c in "یے":
            out.append("ي")
        elif c == "ک":
            out.append("ك")
        elif c in "ۀہ":
            out.append("ه")
        elif c == "ٔ":  # hamza above
            continue
        else:
            out.append(c)
    return "".join(out)


def bengali_normalize(t: str) -> str:
    """bn/BengaliNormalizer.java: candrabindu deletion, vowel-length
    folds, the khanda-ta / visarga / ya-phala / ba-phala contextual
    rewrites and the s/n/r letter folds — a direct port of the
    reference's in-place buffer walk (deletions re-examine earlier
    positions exactly like the Java index arithmetic)."""
    s = list(t)
    i = 0
    while i < len(s):
        c = s[i]
        if c == "ঁ":  # candrabindu: delete
            del s[i]
            i -= 1
        elif c == "ী":
            s[i] = "ি"
        elif c == "ূ":
            s[i] = "ু"
        elif c == "ক":  # ka + virama + i-matra rules
            if i + 2 < len(s) and s[i + 1] == "্" and s[i + 2] == "ি":
                if i == 0:
                    s[i] = "খ"
                    del s[i + 2]
                    del s[i + 1]
                else:
                    s[i + 1] = "খ"
                    del s[i + 2]
        elif c == "ঙ":
            s[i] = "ং"
        elif c == "য":  # ya-phala
            if i - 2 == 0 and s[i - 1] == "্":
                s[i - 1] = "ে"
                if i + 1 < len(s) and s[i + 1] == "া":
                    del s[i + 1]
                del s[i]
                i -= 1
            elif i - 1 >= 0 and s[i - 1] == "্":
                del s[i]
                del s[i - 1]
                i -= 2
        elif c == "ব":  # ba-phala
            if (i >= 1 and s[i - 1] != "্") or i == 0:
                pass
            elif i - 2 == 0:
                del s[i]
                del s[i - 1]
                i -= 2
            elif i - 5 >= 0 and s[i - 3] == "্":
                del s[i]
                del s[i - 1]
                i -= 2
            elif i - 2 >= 0:
                s[i - 1] = s[i - 2]
                del s[i]
                i -= 1
        elif c == "ঃ":  # visarga
            if i == len(s) - 1:
                if len(s) <= 3:
                    s[i] = "হ"
                else:
                    del s[i]
                    i -= 1
            else:
                s[i] = s[i + 1]
        elif c in "শষ":
            s[i] = "স"
        elif c == "ণ":
            s[i] = "ন"
        elif c in "ড়ঢ়":
            s[i] = "র"
        elif c == "ৎ":
            s[i] = "ত"
        i += 1
    return "".join(s)


# hi/HindiStemmer.java suffix table (machine-extracted)
_HI_SUFFIXES = [
    (6, 5, (
        'ाएंगी', 'ाएंगे', 'ाऊंगी', 'ाऊंगा', 'ाइयाँ', 'ाइयों',
        'ाइयां',
    )),
    (5, 4, (
        'ाएगी', 'ाएगा', 'ाओगी', 'ाओगे', 'एंगी', 'ेंगी',
        'एंगे', 'ेंगे', 'ूंगी', 'ूंगा', 'ातीं', 'नाओं',
        'नाएं', 'ताओं', 'ताएं', 'ियाँ', 'ियों', 'ियां',
    )),
    (4, 3, (
        'ाकर', 'ाइए', 'ाईं', 'ाया', 'ेगी', 'ेगा',
        'ोगी', 'ोगे', 'ाने', 'ाना', 'ाते', 'ाती',
        'ाता', 'तीं', 'ाओं', 'ाएं', 'ुओं', 'ुएं',
        'ुआं',
    )),
    (3, 2, (
        'कर', 'ाओ', 'िए', 'ाई', 'ाए', 'ने',
        'नी', 'ना', 'ते', 'ीं', 'ती', 'ता',
        'ाँ', 'ां', 'ों', 'ें',
    )),
    (2, 1, (
        'ो', 'े', 'ू', 'ु', 'ी', 'ि',
        'ा',
    )),
]


def hindi_stem(t: str) -> str:
    """hi/HindiStemmer.java (the lightweight Hindi stemmer of Ramanathan
    & Rao): strip the longest matching suffix from the machine-extracted
    table, gated by word length — one strip per word."""
    n = len(t)
    for gate, strip, sufs in _HI_SUFFIXES:
        if n > gate and t.endswith(sufs):
            return t[: n - strip]
    return t


_PL_SUFFIXES = [
    # nominal case/number endings (longest first), then adjectival sets
    "owie", "iego", "iemu", "ego", "emu", "ach", "ami", "ymi", "imi",
    "ych", "ich", "iej", "ej", "om", "ów", "em", "ie", "ym", "im",
    "ą", "ę", "y", "i", "e", "a", "u", "o",
]


def polish_stem(t: str) -> str:
    """Polish LIGHT stemmer — an original rule set standing in for the
    reference's stempel module (analysis/stempel StempelStemmer.java uses
    a TRAINED patricia-trie table, stemmer_2000.tbl, which is data we do
    not ship; this is a longest-suffix case/number/adjective strip in the
    style of the other light stemmers in this file).  One pass over the
    nominal/adjectival ending ladder with a 3-char stem floor, then a
    final adjectival -i/-y trim on long stems so polskiego/polskim/
    polskiej conflate to polsk."""
    n = len(t)
    if n < 4:
        return t
    for suf in _PL_SUFFIXES:
        if t.endswith(suf) and n - len(suf) >= 3:
            t = t[: n - len(suf)]
            break
    if len(t) > 4 and t[-1] in "iy":
        t = t[:-1]
    return t


_PT_FOLD = str.maketrans("àáâäãòóôöõèéêëùúûüìíîïç", "aaaaaoooooeeeeuuuuiiiic")


def portuguese_light_stem(t: str) -> str:
    """pt/PortugueseLightStemmer.java (Savoy's UniNE light stemmer):
    removeSuffix (plural/adverb ladder with the l/m restorations and the
    ões/ães -> ão rewrite), normFeminine (a -> o families, ona -> ão,
    esa -> ês), final e/a/o strip, accent fold."""
    s = list(t)
    n = len(s)
    if n < 4:
        return t

    def _ends(k):
        return "".join(s[:n]).endswith(k)

    # removeSuffix
    if n > 4 and _ends("es") and s[n - 3] in "rslz":
        n -= 2
    elif n > 3 and _ends("ns"):
        s[n - 2] = "m"
        n -= 1
    elif n > 4 and (_ends("eis") or _ends("éis")):
        s[n - 3] = "e"
        s[n - 2] = "l"
        n -= 1
    elif n > 4 and _ends("ais"):
        s[n - 2] = "l"
        n -= 1
    elif n > 4 and _ends("óis"):
        s[n - 3] = "o"
        s[n - 2] = "l"
        n -= 1
    elif n > 4 and _ends("is"):
        s[n - 1] = "l"
    elif n > 3 and (_ends("ões") or _ends("ães")):
        n -= 1
        s[n - 2] = "ã"
        s[n - 1] = "o"
    elif n > 6 and _ends("mente"):
        n -= 5
    elif n > 3 and s[n - 1] == "s":
        n -= 1

    # normFeminine
    if n > 3 and s[n - 1] == "a":
        if n > 7 and (_ends("inha") or _ends("iaca") or _ends("eira")):
            s[n - 1] = "o"
        elif n > 6:
            if (
                _ends("osa") or _ends("ica") or _ends("ida")
                or _ends("ada") or _ends("iva") or _ends("ama")
            ):
                s[n - 1] = "o"
            elif _ends("ona"):
                s[n - 3] = "ã"
                s[n - 2] = "o"
                n -= 1
            elif _ends("ora"):
                n -= 1
            elif _ends("esa"):
                s[n - 3] = "ê"
                n -= 1
            elif _ends("na"):
                s[n - 1] = "o"

    if n > 4 and s[n - 1] in "eao":
        n -= 1

    return "".join(s[:n]).translate(_PT_FOLD)


# bn/BengaliStemmer.java (Sengupta & Chaudhuri verb-phrase analysis +
# Savoy's BengaliStemmerLight criteria): a pure longest-group suffix
# ladder — (min_len_exclusive, strip, suffixes) rows extracted verbatim
# from the reference, first matching group wins.
_BN_LADDER = [
    (9, 8, ("িয়াছিলাম", "িতেছিলাম", "িতেছিলেন", "ইতেছিলেন", "িয়াছিলেন", "ইয়াছিলেন")),
    (8, 7, ("িতেছিলি", "িতেছিলে", "িয়াছিলা", "িয়াছিলে", "িতেছিলা", "িয়াছিলি", "য়েদেরকে")),
    (7, 6, ("িতেছিস", "িতেছেন", "িয়াছিস", "িয়াছেন", "েছিলাম", "েছিলেন", "েদেরকে")),
    (6, 5, ("িতেছি", "িতেছা", "িতেছে", "ছিলাম", "ছিলেন", "িয়াছি", "িয়াছা", "িয়াছে", "েছিলে", "েছিলা", "য়েদের", "দেরকে")),
    (5, 4, ("িলাম", "িলেন", "িতাম", "িতেন", "িবেন", "ছিলি", "ছিলে", "ছিলা", "তেছে", "িতেছ", "খানা", "খানি", "গুলো", "গুলি", "য়েরা", "েদের")),
    (4, 3, ("লাম", "িলি", "ইলি", "িলে", "ইলে", "লেন", "িলা", "ইলা", "তাম", "িতি", "ইতি", "িতে", "ইতে", "তেন", "িতা", "িবা", "ইবা", "িবি", "ইবি", "বেন", "িবে", "ইবে", "ছেন", "য়োন", "য়ের", "েরা", "দের")),
    (3, 2, ("িস", "েন", "লি", "লে", "লা", "তি", "তে", "তা", "বি", "বে", "বা", "ছি", "ছা", "ছে", "ুন", "ুক", "টা", "টি", "নি", "ের", "তে", "রা", "কে")),
    (2, 1, ("ি", "ী", "া", "ো", "ে", "ব", "ত")),
]


def bengali_stem(t: str) -> str:
    n = len(t)
    for guard, strip, sufs in _BN_LADDER:
        if n > guard and t.endswith(sufs):
            return t[: n - strip]
    return t


def telugu_normalize(t: str) -> str:
    """te/TeluguNormalizer.java: candrabindu -> bindu, visarga and
    ZWJ/ZWNJ deleted, long -> short vowels (independent + matras), and
    the decomposed diphthong/oo/au compositions — ONE in-place pass; a
    replacement is not itself revisited (e.g. a long matra shortened to
    0C46 does NOT then compose with a following 0C56, matching the
    reference's switch-and-advance)."""
    s = list(t)
    n = len(s)
    i = 0
    while i < n:
        c = s[i]
        if c in "ఀఁ":
            s[i] = "ం"
        elif c == "ః" or c in "‌‍":
            del s[i]
            n -= 1
            continue
        elif c == "ఔ":
            s[i] = "ఓ"
        elif c == "ఐ":
            s[i] = "ఏ"
        elif c == "ఆ":
            s[i] = "అ"
        elif c == "ఈ":
            s[i] = "ఇ"
        elif c == "ఊ":
            s[i] = "ఉ"
        elif c == "ీ":
            s[i] = "ి"
        elif c == "ూ":
            s[i] = "ు"
        elif c == "ే":
            s[i] = "ె"
        elif c == "ో":
            s[i] = "ొ"
        elif c == "ె" and i + 1 < n and s[i + 1] == "ౖ":
            s[i] = "ై"
            del s[i + 1]
            n -= 1
        elif c == "ఒ" and i + 1 < n and s[i + 1] == "ౕ":
            s[i] = "ఓ"
            del s[i + 1]
            n -= 1
        elif c == "ఒ" and i + 1 < n and s[i + 1] == "ౌ":
            s[i] = "ఔ"
            del s[i + 1]
            n -= 1
        i += 1
    return "".join(s)


# te/TeluguStemmer.java: plural/case suffix ladder
_TE_LADDER = [
    (5, 4, ("ళ్ళు", "డ్లు")),
    (3, 2, ("డు", "ము", "వు", "లు", "ని", "ను", "చే", "కై", "లో", "ది",
            "కి", "సు", "వై", "పై")),
    (2, 1, ("ి", "ీ", "ు", "ూ", "ె", "ే", "ొ", "ో", "ా")),
]


def telugu_stem(t: str) -> str:
    n = len(t)
    for guard, strip, sufs in _TE_LADDER:
        if n > guard and t.endswith(sufs):
            return t[: n - strip]
    return t


def sorani_stem(t: str) -> str:
    """ckb/SoraniStemmer.java: postposition strip, possessive pronoun
    strip, then ONE of the ezafe/definite/plural/demonstrative endings
    (the reference's else-if chain, early return on the first match)."""
    n = len(t)
    # postposition
    if n > 5 and t.endswith("دا"):
        n -= 2
    elif n > 4 and t.endswith("نا"):
        n -= 1
    elif n > 6 and t.endswith("ەوە"):
        n -= 3
    t = t[:n]
    # possessive pronoun
    if n > 6 and t.endswith(("مان", "یان", "تان")):
        n -= 3
        t = t[:n]
    # the else-if ladder (first match returns)
    if n > 6 and t.endswith("ێکی"):
        return t[: n - 3]
    if n > 7 and t.endswith("یەکی"):
        return t[: n - 4]
    if n > 5 and t.endswith("ێک"):
        return t[: n - 2]
    if n > 6 and t.endswith("یەک"):
        return t[: n - 3]
    if n > 6 and t.endswith("ەکە"):
        return t[: n - 3]
    if n > 5 and t.endswith("کە"):
        return t[: n - 2]
    if n > 7 and t.endswith("ەکان"):
        return t[: n - 4]
    if n > 6 and t.endswith("کان"):
        return t[: n - 3]
    if n > 7 and t.endswith("یانی"):
        return t[: n - 4]
    if n > 6 and t.endswith("انی"):
        return t[: n - 3]
    if n > 6 and t.endswith("یان"):
        return t[: n - 3]
    if n > 5 and t.endswith("ان"):
        return t[: n - 2]
    if n > 7 and t.endswith("یانە"):
        return t[: n - 4]
    if n > 6 and t.endswith("انە"):
        return t[: n - 3]
    if n > 5 and t.endswith(("ایە", "ەیە")):
        return t[: n - 2]
    if n > 4 and t.endswith("ە"):
        return t[: n - 1]
    if n > 4 and t.endswith("ی"):
        return t[: n - 1]
    return t


_ES_LIGHT_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")


def spanish_light_stem(t: str) -> str:
    """es/SpanishLightStemmer.java: accent fold then the final o/a/e and
    plural-s rules (eses -> es, ces -> z, vowel+s)."""
    if len(t) < 5:
        return t
    s = list(t.translate(_ES_LIGHT_FOLD))
    n = len(s)
    last = s[n - 1]
    if last in "oae":
        return "".join(s[: n - 1])
    if last == "s":
        if s[n - 2] == "e" and s[n - 3] == "s" and s[n - 4] == "e":
            return "".join(s[: n - 2])
        if s[n - 2] == "e" and s[n - 3] == "c":
            s[n - 3] = "z"
            return "".join(s[: n - 2])
        if s[n - 2] in "oae":
            return "".join(s[: n - 2])
    return "".join(s)


# es/SpanishPluralStemmer.java word lists (published data)
_ES_PLURAL_INVARIANTS = frozenset(['abrebotellas', 'abrecartas', 'abrelatas', 'afueras', 'albatros', 'albricias', 'aledaños', 'alexis', 'alicates', 'analisis', 'andurriales', 'antitesis', 'añicos', 'apendicitis', 'apocalipsis', 'arcoiris', 'aries', 'bilis', 'boletus', 'boris', 'brindis', 'cactus', 'canutas', 'caries', 'cascanueces', 'cascarrabias', 'ciempies', 'cifosis', 'cortaplumas', 'corpus', 'cosmos', 'cosquillas', 'creces', 'crisis', 'cuatrocientas', 'cuatrocientos', 'cuelgacapas', 'cuentacuentos', 'cuentapasos', 'cumpleaños', 'doscientas', 'doscientos', 'dosis', 'enseres', 'entonces', 'esponsales', 'estatus', 'exequias', 'fauces', 'forceps', 'fotosintesis', 'gafas', 'gafotas', 'gargaras', 'gris', 'honorarios', 'ictus', 'jueves', 'lapsus', 'lavacoches', 'lavaplatos', 'limpiabotas', 'lunes', 'maitines', 'martes', 'mondadientes', 'novecientas', 'novecientos', 'nupcias', 'ochocientas', 'ochocientos', 'pais', 'paris', 'parabrisas', 'paracaidas', 'parachoques', 'paraguas', 'pararrayos', 'pisapapeles', 'piscis', 'portaaviones', 'portamaletas', 'portamantas', 'quinientas', 'quinientos', 'quitamanchas', 'recogepelotas', 'rictus', 'rompeolas', 'sacacorchos', 'sacapuntas', 'saltamontes', 'salvavidas', 'seis', 'seiscientas', 'seiscientos', 'setecientas', 'setecientos', 'sintesis', 'tenis', 'tifus', 'trabalenguas', 'vacaciones', 'venus', 'versus', 'viacrucis', 'virus', 'viveres', 'volandas'])
_ES_PLURAL_SPECIAL = frozenset(['yoes', 'noes', 'sies', 'clubes', 'faralaes', 'albalaes', 'itemes', 'albumes', 'sandwiches', 'relojes', 'bojes', 'contrarreloj', 'carcajes'])
_ES_PLURAL_VOWELS = set("aeiou")


def spanish_plural_stem(t: str) -> str:
    """es/SpanishPluralStemmer.java: accent fold, invariant/special word
    lists, then the plural rules — preserving the reference's Java
    precedence quirk in the qu/gu rule (the q test is NOT guarded by the
    following u/ie conditions: ``q || (g && u && (i|e))``)."""
    if len(t) < 4:
        return t
    s = list(t.translate(_ES_LIGHT_FOLD))
    n = len(s)
    w = "".join(s)
    if w in _ES_PLURAL_INVARIANTS:
        return w
    if w in _ES_PLURAL_SPECIAL:
        return w[: n - 2]
    if s[n - 1] == "s":
        if s[n - 2] not in _ES_PLURAL_VOWELS:
            return w[: n - 1]
        if s[n - 4] == "q" or (
            s[n - 4] == "g" and s[n - 3] == "u" and s[n - 2] in "ie"
        ):
            return w[: n - 1]
        if s[n - 4] in _ES_PLURAL_VOWELS and s[n - 3] == "r" and s[n - 2] == "e":
            return w[: n - 2]
        if (s[n - 4] in _ES_PLURAL_VOWELS and s[n - 3] in "dlnx"
                and s[n - 2] == "e"):
            return w[: n - 2]
        if s[n - 3] in "yu" and s[n - 2] == "e":
            return w[: n - 2]
        if s[n - 4] in "ulrtn" and s[n - 3] == "i" and s[n - 2] == "e":
            return w[: n - 2]
        if s[n - 3] == "s" and s[n - 2] == "e":
            return w[: n - 2]
        if s[n - 3] in _ES_PLURAL_VOWELS and s[n - 2] == "i":
            return w[: n - 2] + "y"
        if s[n - 3] == "d" and s[n - 2] == "i":
            return w[: n - 2] + "y"
        if s[n - 2] == "e" and s[n - 3] == "c":
            return w[: n - 3] + "z"
        if s[n - 2] in _ES_PLURAL_VOWELS:
            return w[: n - 1]
    return w


_FR_LIGHT_FOLD = str.maketrans("àáâôèéêùûîç", "aaaoeeeuuic")


def _fr_norm(s: list, n: int) -> str:
    """FrenchLightStemmer.norm: accent fold, adjacent-duplicate-letter
    collapse (whole word), -ie strip, then the final r/e/e/dup ladder."""
    if n > 4:
        for i in range(n):
            s[i] = s[i].translate(_FR_LIGHT_FOLD)
        # collapse adjacent duplicate letters across the whole word
        i = 1
        while i < n:
            if s[i] == s[i - 1] and s[i - 1].isalpha():
                del s[i]
                n -= 1
            else:
                i += 1
    if n > 4 and "".join(s[:n]).endswith("ie"):
        n -= 2
    if n > 4:
        if s[n - 1] == "r":
            n -= 1
        if s[n - 1] == "e":
            n -= 1
        if s[n - 1] == "e":
            n -= 1
        if s[n - 1] == s[n - 2] and s[n - 1].isalpha():
            n -= 1
    return "".join(s[:n])


def french_light_stem(t: str) -> str:
    """fr/FrenchLightStemmer.java (Savoy UniNE): plural x/s strips, the
    derivational suffix ladder with its in-buffer rewrites (issement->ir,
    cateur->quer, atrice->ateur->er, folle/molle->fou/mou, ...), then
    norm (see _fr_norm)."""
    s = list(t)
    n = len(s)

    def ends(k):
        return "".join(s[:n]).endswith(k)

    if n > 5 and s[n - 1] == "x":
        if s[n - 3] == "a" and s[n - 2] == "u" and s[n - 4] != "e":
            s[n - 2] = "l"
        n -= 1
    if n > 3 and s[n - 1] == "x":
        n -= 1
    if n > 3 and s[n - 1] == "s":
        n -= 1
    if n > 9 and ends("issement"):
        n -= 6
        s[n - 1] = "r"
        return _fr_norm(s, n)
    if n > 8 and ends("issant"):
        n -= 4
        s[n - 1] = "r"
        return _fr_norm(s, n)
    if n > 6 and ends("ement"):
        n -= 4
        if n > 3 and ends("ive"):
            n -= 1
            s[n - 1] = "f"
        return _fr_norm(s, n)
    if n > 11 and ends("ficatrice"):
        n -= 5
        s[n - 2] = "e"
        s[n - 1] = "r"
        return _fr_norm(s, n)
    if n > 10 and ends("ficateur"):
        n -= 4
        s[n - 2] = "e"
        s[n - 1] = "r"
        return _fr_norm(s, n)
    if n > 9 and ends("catrice"):
        n -= 3
        s[n - 4] = "q"
        s[n - 3] = "u"
        s[n - 2] = "e"
        return _fr_norm(s, n)
    if n > 8 and ends("cateur"):
        n -= 2
        s[n - 4] = "q"
        s[n - 3] = "u"
        s[n - 2] = "e"
        s[n - 1] = "r"
        return _fr_norm(s, n)
    if n > 8 and ends("atrice"):
        n -= 4
        s[n - 2] = "e"
        s[n - 1] = "r"
        return _fr_norm(s, n)
    if n > 7 and ends("ateur"):
        n -= 3
        s[n - 2] = "e"
        s[n - 1] = "r"
        return _fr_norm(s, n)
    if n > 6 and ends("trice"):
        n -= 1
        s[n - 3] = "e"
        s[n - 2] = "u"
        s[n - 1] = "r"
    if n > 5 and ends("ième"):
        return _fr_norm(s, n - 4)
    if n > 7 and ends("teuse"):
        n -= 2
        s[n - 1] = "r"
        return _fr_norm(s, n)
    if n > 6 and ends("teur"):
        n -= 1
        s[n - 1] = "r"
        return _fr_norm(s, n)
    if n > 5 and ends("euse"):
        return _fr_norm(s, n - 2)
    if n > 8 and ends("ère"):
        n -= 1
        s[n - 2] = "e"
        return _fr_norm(s, n)
    if n > 7 and ends("ive"):
        n -= 1
        s[n - 1] = "f"
        return _fr_norm(s, n)
    if n > 4 and (ends("folle") or ends("molle")):
        n -= 2
        s[n - 1] = "u"
        return _fr_norm(s, n)
    if n > 9 and ends("nnelle"):
        return _fr_norm(s, n - 5)
    if n > 9 and ends("nnel"):
        return _fr_norm(s, n - 3)
    if n > 4 and ends("ète"):
        n -= 1
        s[n - 2] = "e"
    if n > 8 and ends("ique"):
        n -= 4
    if n > 8 and ends("esse"):
        return _fr_norm(s, n - 3)
    if n > 7 and ends("inage"):
        return _fr_norm(s, n - 3)
    if n > 9 and ends("isation"):
        n -= 7
        if n > 5 and ends("ual"):
            s[n - 2] = "e"
        return _fr_norm(s, n)
    if n > 9 and ends("isateur"):
        return _fr_norm(s, n - 7)
    if n > 8 and ends("ation"):
        return _fr_norm(s, n - 5)
    if n > 8 and ends("ition"):
        return _fr_norm(s, n - 5)
    return _fr_norm(s, n)


_AR_PREFIXES = ("ال", "وال", "بال", "كال", "فال", "لل", "و")
_AR_SUFFIXES = ("ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة", "ي")


def arabic_stem(t: str) -> str:
    """ar/ArabicStemmer.java: ONE prefix strip (first match in order;
    the single-char و prefix needs len >= 4, the rest len >= prefix+2),
    then EVERY suffix in list order strips once where it fits (each
    requires >= 2 characters left after stemming) — the reference's
    single forward pass over the suffix list, not a restart."""
    n = len(t)
    for p in _AR_PREFIXES:
        if len(p) == 1:
            if n < 4:
                continue
        elif n < len(p) + 2:
            continue
        if t.startswith(p):
            t = t[len(p):]
            n = len(t)
            break
    for suf in _AR_SUFFIXES:
        if n >= len(suf) + 2 and t.endswith(suf):
            t = t[: n - len(suf)]
            n = len(t)
    return t


_FA_SUFFIXES = ("ات", "ان", "ترين", "تر", "يي", "ي", "ها", "‌")


def persian_stem(t: str) -> str:
    """fa/PersianStemmer.java: one forward pass over the suffix list
    (plural/comparative/ezafe endings + trailing ZWNJ), each stripping
    where >= 2 characters remain."""
    n = len(t)
    for suf in _FA_SUFFIXES:
        if n >= len(suf) + 2 and t.endswith(suf):
            t = t[: n - len(suf)]
            n = len(t)
    return t


def german_stem(t: str) -> str:
    """de/GermanStemmer.java (the classic discriminator stemmer):
    substitute (umlaut fold, ß->ss, double-letter masking with '*',
    sch/ch/ei/ie/ig/st masked to one-char tokens with substCount
    tracking), the e/s/n/t/em/er/nd strip loop gated by
    length+substCount, optimize (erin* + z->x), resubstitute, and the
    'gege' particle-denotion removal — a faithful mutation-for-mutation
    transcription of the StringBuilder passes."""
    term = t.lower()
    if not term or not all(c.isalpha() for c in term):
        return term
    s = list(term)
    subst = 0

    # substitute
    c = 0
    while c < len(s):
        if c > 0 and s[c] == s[c - 1]:
            s[c] = "*"
        elif s[c] == "ä":
            s[c] = "a"
        elif s[c] == "ö":
            s[c] = "o"
        elif s[c] == "ü":
            s[c] = "u"
        elif s[c] == "ß":
            s[c] = "s"
            s.insert(c + 1, "s")
            subst += 1
        if c < len(s) - 1:
            if c < len(s) - 2 and s[c] == "s" and s[c + 1] == "c" and s[c + 2] == "h":
                s[c] = "$"
                del s[c + 1 : c + 3]
                subst += 2
            elif s[c] == "c" and s[c + 1] == "h":
                s[c] = "§"
                del s[c + 1]
                subst += 1
            elif s[c] == "e" and s[c + 1] == "i":
                s[c] = "%"
                del s[c + 1]
                subst += 1
            elif s[c] == "i" and s[c + 1] == "e":
                s[c] = "&"
                del s[c + 1]
                subst += 1
            elif s[c] == "i" and s[c + 1] == "g":
                s[c] = "#"
                del s[c + 1]
                subst += 1
            elif s[c] == "s" and s[c + 1] == "t":
                s[c] = "!"
                del s[c + 1]
                subst += 1
        c += 1

    def _strip():
        while len(s) > 3:
            n = len(s)
            if n + subst > 5 and s[n - 2] == "n" and s[n - 1] == "d":
                del s[n - 2 :]
            elif n + subst > 4 and s[n - 2] == "e" and s[n - 1] == "m":
                del s[n - 2 :]
            elif n + subst > 4 and s[n - 2] == "e" and s[n - 1] == "r":
                del s[n - 2 :]
            elif s[n - 1] in "esnt":
                del s[n - 1]
            else:
                break

    _strip()
    # optimize
    if len(s) > 5 and "".join(s[-5:]) == "erin*":
        del s[-1]
        _strip()
    if s and s[-1] == "z":
        s[-1] = "x"
    # resubstitute
    c = 0
    while c < len(s):
        ch = s[c]
        if ch == "*":
            s[c] = s[c - 1]
        elif ch == "$":
            s[c] = "s"
            s[c + 1 : c + 1] = ["c", "h"]
        elif ch == "§":
            s[c] = "c"
            s.insert(c + 1, "h")
        elif ch == "%":
            s[c] = "e"
            s.insert(c + 1, "i")
        elif ch == "&":
            s[c] = "i"
            s.insert(c + 1, "e")
        elif ch == "#":
            s[c] = "i"
            s.insert(c + 1, "g")
        elif ch == "!":
            s[c] = "s"
            s.insert(c + 1, "t")
        c += 1
    # removeParticleDenotion
    if len(s) > 4:
        for c in range(len(s) - 3):
            if "".join(s[c : c + 4]) == "gege":
                del s[c : c + 2]
                break
    return "".join(s)
