"""Greek stemmer — transcription of reference el/GreekStemmer.java
(Ntais' "Development of a Stemmer for the Greek Language" algorithm as
shipped: 23 rules over GreekLowerCaseFilter output — lowercase, accents
folded, final sigma ς already mapped to σ).

Faithful to the reference INCLUDING its Java quirks: the &&/|| precedence
in rule 8's compound conditions (the length guard binds only to the first
suffix), rule 7's len==5 early return, rule 11's unreachable ιομαστε
else-branch, and the buffer-reuse restorations (rules 10/18/19 re-expose
previously-truncated characters then overwrite a prefix of them).  The
exception sets are the reference's published word lists (data, not code).
Rules 0-20 run in sequence; rule 21 (the long suffix list) fires only if
none of them changed the length; rule 22 (comparative/superlative)
always runs last."""

from __future__ import annotations

_VOWELS = set("αεηιουω")
_VOWELS_NO_Y = set("αεηιοω")  # endsWithVowelNoY: υ excluded

_EXC4 = frozenset(["θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"])
_EXC6 = frozenset([
    "αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ", "φυσ",
    "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
    "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ",
    "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
    "υποδ", "φιλον", "φυλοδ", "χασ",
])
_EXC7 = frozenset([
    "αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ", "πεθ", "πικρ",
    "ποτ", "σιχ", "χ",
])
_EXC8A = frozenset(["τρ", "τσ"])
_EXC8B = frozenset([
    "βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ", "καστελ",
    "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ", "π", "πελεκ",
    "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ", "τσαρλατ", "ορφ",
    "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "γαλ", "γερ", "δεκ",
    "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ", "ζωντ", "ικ", "καστ",
    "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ", "σπ", "στεγ", "τραγ",
    "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ", "ανικ", "ανοργ", "απηγ",
    "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ", "βιομηχ", "βραχυκ",
    "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ", "καταγαλ", "κλιβ",
    "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ", "νταβ", "ξηροκλιβ",
    "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ", "περιτρ", "πλατ",
    "πολυδαπ", "πολυμηχ", "στεφ", "ταβ", "τετ", "υπερηφ", "υποκοπ",
    "χαμηλοδαπ", "ψηλοταβ",
])
_EXC9 = frozenset([
    "αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ", "βαρον", "ντρ",
    "σκ", "κοπ", "μπορ", "νιφ", "παγ", "παρακαλ", "σερπ", "σκελ", "συρφ",
    "τοκ", "υ", "δ", "εμ", "θαρρ", "θ",
])
_EXC12A = frozenset(["π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"])
_EXC12B = frozenset([
    "αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ", "προ", "νισ",
])
_EXC13 = frozenset(["διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"])
_EXC14 = frozenset([
    "φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ", "λαμπιδ", "λεχ",
    "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν", "αμ", "αιθ", "ανηκ",
    "δεσποζ", "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε", "τσα",
])
_EXC15A = frozenset([
    "αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ", "αμαλλι",
    "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ", "ξεφ", "νεοπ",
    "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ", "συμπ", "συντ", "τ",
    "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ", "αποτ", "αρτιπ", "διατ",
    "εν", "επιτ", "κροκαλοπ", "σιδηροπ", "λ", "ναυ", "ουλαμ", "ουρ", "π",
    "τρ", "μ",
])
_EXC15B = frozenset(["ψοφ", "ναυλοχ"])
_EXC16 = frozenset(["ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον", "επταν"])
_EXC17 = frozenset([
    "ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ", "ευχρ", "κοινοχρ",
    "παλιμψ",
])
_EXC18 = frozenset(["ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων"])
_EXC19 = frozenset([
    "παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ", "ασουσ",
])


class _W:
    """Mutable (chars, len) word view mirroring the reference's buffer
    reuse: truncation keeps old characters beyond ``len`` readable so the
    restoration rules can re-expose them."""

    __slots__ = ("s", "n")

    def __init__(self, t: str):
        self.s = list(t)
        self.n = len(t)

    def ends(self, suf: str) -> bool:
        k = len(suf)
        if k > self.n:
            return False
        return "".join(self.s[self.n - k : self.n]) == suf

    def stem_str(self) -> str:
        return "".join(self.s[: self.n])

    def in_set(self, excset) -> bool:
        return self.stem_str() in excset

    def vowel(self) -> bool:
        return self.n > 0 and self.s[self.n - 1] in _VOWELS

    def vowel_no_y(self) -> bool:
        return self.n > 0 and self.s[self.n - 1] in _VOWELS_NO_Y


def greek_stem(t: str) -> str:
    """Expects GreekLowerCaseFilter output (σ-normalized, accent-free)."""
    if len(t) < 4:
        return t
    w = _W(t)
    orig = w.n

    _r0(w); _r1(w); _r2(w); _r3(w); _r4(w); _r5(w); _r6(w); _r7(w)
    _r8(w); _r9(w); _r10(w); _r11(w); _r12(w); _r13(w); _r14(w); _r15(w)
    _r16(w); _r17(w); _r18(w); _r19(w); _r20(w)
    if w.n == orig:
        _r21(w)
    _r22(w)
    return w.stem_str()


def _r0(w):
    n = w.n
    if n > 9 and (w.ends("καθεστωτοσ") or w.ends("καθεστωτων")):
        w.n -= 4; return
    if n > 8 and (w.ends("γεγονοτοσ") or w.ends("γεγονοτων")):
        w.n -= 4; return
    if n > 8 and w.ends("καθεστωτα"):
        w.n -= 3; return
    if n > 7 and (w.ends("τατογιου") or w.ends("τατογιων")):
        w.n -= 4; return
    if n > 7 and w.ends("γεγονοτα"):
        w.n -= 3; return
    if n > 7 and w.ends("καθεστωσ"):
        w.n -= 2; return
    # reference precedence: the n > 6 guard binds only to σκαγιου
    if (n > 6 and w.ends("σκαγιου")) or w.ends("σκαγιων") or w.ends("ολογιου") \
            or w.ends("ολογιων") or w.ends("κρεατοσ") or w.ends("κρεατων") \
            or w.ends("περατοσ") or w.ends("περατων") or w.ends("τερατοσ") \
            or w.ends("τερατων"):
        w.n -= 4; return
    if n > 6 and w.ends("τατογια"):
        w.n -= 3; return
    if n > 6 and w.ends("γεγονοσ"):
        w.n -= 2; return
    if n > 5 and (w.ends("φαγιου") or w.ends("φαγιων") or w.ends("σογιου")
                  or w.ends("σογιων")):
        w.n -= 4; return
    if n > 5 and (w.ends("σκαγια") or w.ends("ολογια") or w.ends("κρεατα")
                  or w.ends("περατα") or w.ends("τερατα")):
        w.n -= 3; return
    if n > 4 and (w.ends("φαγια") or w.ends("σογια") or w.ends("φωτοσ")
                  or w.ends("φωτων")):
        w.n -= 3; return
    if n > 4 and (w.ends("κρεασ") or w.ends("περασ") or w.ends("τερασ")):
        w.n -= 2; return
    if n > 3 and w.ends("φωτα"):
        w.n -= 2; return
    if n > 2 and w.ends("φωσ"):
        w.n -= 1; return


def _r1(w):
    if w.n > 4 and (w.ends("αδεσ") or w.ends("αδων")):
        w.n -= 4
        if not (w.ends("οκ") or w.ends("μαμ") or w.ends("μαν") or w.ends("μπαμπ")
                or w.ends("πατερ") or w.ends("γιαγι") or w.ends("νταντ")
                or w.ends("κυρ") or w.ends("θει") or w.ends("πεθερ")):
            w.n += 2  # add back -αδ


def _r2(w):
    if w.n > 4 and (w.ends("εδεσ") or w.ends("εδων")):
        w.n -= 4
        if (w.ends("οπ") or w.ends("ιπ") or w.ends("εμπ") or w.ends("υπ")
                or w.ends("γηπ") or w.ends("δαπ") or w.ends("κρασπ")
                or w.ends("μιλ")):
            w.n += 2  # add back -εδ


def _r3(w):
    if w.n > 5 and (w.ends("ουδεσ") or w.ends("ουδων")):
        w.n -= 5
        if (w.ends("αρκ") or w.ends("καλιακ") or w.ends("πεταλ") or w.ends("λιχ")
                or w.ends("πλεξ") or w.ends("σκ") or w.ends("σ") or w.ends("φλ")
                or w.ends("φρ") or w.ends("βελ") or w.ends("λουλ") or w.ends("χν")
                or w.ends("σπ") or w.ends("τραγ") or w.ends("φε")):
            w.n += 3  # add back -ουδ


def _r4(w):
    if w.n > 3 and (w.ends("εωσ") or w.ends("εων")):
        w.n -= 3
        if w.in_set(_EXC4):
            w.n += 1  # add back -ε


def _r5(w):
    if w.n > 2 and w.ends("ια"):
        w.n -= 2
        if w.vowel():
            w.n += 1  # add back -ι
    elif w.n > 3 and (w.ends("ιου") or w.ends("ιων")):
        w.n -= 3
        if w.vowel():
            w.n += 1


def _r6(w):
    removed = False
    if w.n > 3 and (w.ends("ικα") or w.ends("ικο")):
        w.n -= 3
        removed = True
    elif w.n > 4 and (w.ends("ικου") or w.ends("ικων")):
        w.n -= 4
        removed = True
    if removed and (w.vowel() or w.in_set(_EXC6)):
        w.n += 2  # add back -ικ


def _r7(w):
    if w.n == 5 and w.ends("αγαμε"):
        w.n -= 1
        return
    if w.n > 7 and w.ends("ηθηκαμε"):
        w.n -= 7
    elif w.n > 6 and w.ends("ουσαμε"):
        w.n -= 6
    elif w.n > 5 and (w.ends("αγαμε") or w.ends("ησαμε") or w.ends("ηκαμε")):
        w.n -= 5
    if w.n > 3 and w.ends("αμε"):
        w.n -= 3
        if w.in_set(_EXC7):
            w.n += 2  # add back -αμ


def _r8(w):
    removed = False
    # the reference's precedence: the length guard binds only to the
    # FIRST suffix of each compound condition
    if w.n > 8 and w.ends("ιουντανε"):
        w.n -= 8
        removed = True
    elif (w.n > 7 and w.ends("ιοντανε")) or w.ends("ουντανε") or w.ends("ηθηκανε"):
        w.n -= 7
        removed = True
    elif (w.n > 6 and w.ends("ιοτανε")) or w.ends("οντανε") or w.ends("ουσανε"):
        w.n -= 6
        removed = True
    elif (w.n > 5 and w.ends("αγανε")) or w.ends("ησανε") or w.ends("οτανε") \
            or w.ends("ηκανε"):
        w.n -= 5
        removed = True
    if removed and w.in_set(_EXC8A):
        # add -αγαν (we removed > 4 chars so it's safe)
        w.n += 4
        w.s[w.n - 4 : w.n] = list("αγαν")
    if w.n > 3 and w.ends("ανε"):
        w.n -= 3
        if w.vowel_no_y() or w.in_set(_EXC8B):
            w.n += 2  # add back -αν


def _r9(w):
    if w.n > 5 and w.ends("ησετε"):
        w.n -= 5
    if w.n > 3 and w.ends("ετε"):
        w.n -= 3
        if (w.in_set(_EXC9) or w.vowel_no_y() or w.ends("οδ") or w.ends("αιρ")
                or w.ends("φορ") or w.ends("ταθ") or w.ends("διαθ") or w.ends("σχ")
                or w.ends("ενδ") or w.ends("ευρ") or w.ends("τιθ")
                or w.ends("υπερθ") or w.ends("ραθ") or w.ends("ενθ")
                or w.ends("ροθ") or w.ends("σθ") or w.ends("πυρ") or w.ends("αιν")
                or w.ends("συνδ") or w.ends("συν") or w.ends("συνθ")
                or w.ends("χωρ") or w.ends("πον") or w.ends("βρ") or w.ends("καθ")
                or w.ends("ευθ") or w.ends("εκθ") or w.ends("νετ") or w.ends("ρον")
                or w.ends("αρκ") or w.ends("βαρ") or w.ends("βολ")
                or w.ends("ωφελ")):
            w.n += 2  # add back -ετ


def _r10(w):
    if w.n > 5 and (w.ends("οντασ") or w.ends("ωντασ")):
        w.n -= 5
        if w.n == 3 and w.ends("αρχ"):
            w.n += 3  # re-expose *ντ
            w.s[w.n - 3] = "ο"
        if w.ends("κρε"):
            w.n += 3
            w.s[w.n - 3] = "ω"


def _r11(w):
    if w.n > 6 and w.ends("ομαστε"):
        w.n -= 6
        if w.n == 2 and w.ends("ον"):
            w.n += 5  # add back -ομαστ
    elif w.n > 7 and w.ends("ιομαστε"):  # unreachable in practice (as in
        w.n -= 7                          # the reference); kept for fidelity
        if w.n == 2 and w.ends("ον"):
            w.n += 5
            w.s[w.n - 5 : w.n] = list("ομαστ")


def _r12(w):
    if w.n > 5 and w.ends("ιεστε"):
        w.n -= 5
        if w.in_set(_EXC12A):
            w.n += 4  # add back -ιεστ
    if w.n > 4 and w.ends("εστε"):
        w.n -= 4
        if w.in_set(_EXC12B):
            w.n += 3  # add back -εστ


def _r13(w):
    if w.n > 6 and w.ends("ηθηκεσ"):
        w.n -= 6
    elif w.n > 5 and (w.ends("ηθηκα") or w.ends("ηθηκε")):
        w.n -= 5
    removed = False
    if w.n > 4 and w.ends("ηκεσ"):
        w.n -= 4
        removed = True
    elif w.n > 3 and (w.ends("ηκα") or w.ends("ηκε")):
        w.n -= 3
        removed = True
    if removed and (w.in_set(_EXC13) or w.ends("σκωλ") or w.ends("σκουλ")
                    or w.ends("ναρθ") or w.ends("σφ") or w.ends("οθ")
                    or w.ends("πιθ")):
        w.n += 2  # add back -ηκ


def _r14(w):
    removed = False
    if w.n > 5 and w.ends("ουσεσ"):
        w.n -= 5
        removed = True
    elif w.n > 4 and (w.ends("ουσα") or w.ends("ουσε")):
        w.n -= 4
        removed = True
    if removed and (w.in_set(_EXC14) or w.vowel() or w.ends("ποδαρ")
                    or w.ends("βλεπ") or w.ends("πανταχ") or w.ends("φρυδ")
                    or w.ends("μαντιλ") or w.ends("μαλλ") or w.ends("κυματ")
                    or w.ends("λαχ") or w.ends("ληγ") or w.ends("φαγ")
                    or w.ends("ομ") or w.ends("πρωτ")):
        w.n += 3  # add back -ουσ


def _r15(w):
    removed = False
    if w.n > 4 and w.ends("αγεσ"):
        w.n -= 4
        removed = True
    elif w.n > 3 and (w.ends("αγα") or w.ends("αγε")):
        w.n -= 3
        removed = True
    if removed:
        cond1 = (w.in_set(_EXC15A) or w.ends("οφ") or w.ends("πελ")
                 or w.ends("χορτ") or w.ends("λλ") or w.ends("σφ")
                 or w.ends("ρπ") or w.ends("φρ") or w.ends("πρ")
                 or w.ends("λοχ") or w.ends("σμην"))
        cond2 = w.in_set(_EXC15B) or w.ends("κολλ")
        if cond1 and not cond2:
            w.n += 2  # add back -αγ


def _r16(w):
    removed = False
    if w.n > 4 and w.ends("ησου"):
        w.n -= 4
        removed = True
    elif w.n > 3 and (w.ends("ησε") or w.ends("ησα")):
        w.n -= 3
        removed = True
    if removed and w.in_set(_EXC16):
        w.n += 2  # add back -ησ


def _r17(w):
    if w.n > 4 and w.ends("ηστε"):
        w.n -= 4
        if w.in_set(_EXC17):
            w.n += 3  # add back -ηστ


def _r18(w):
    removed = False
    if w.n > 6 and (w.ends("ησουνε") or w.ends("ηθουνε")):
        w.n -= 6
        removed = True
    elif w.n > 4 and w.ends("ουνε"):
        w.n -= 4
        removed = True
    if removed and w.in_set(_EXC18):
        w.n += 3
        w.s[w.n - 3 : w.n] = list("ουν")


def _r19(w):
    removed = False
    if w.n > 6 and (w.ends("ησουμε") or w.ends("ηθουμε")):
        w.n -= 6
        removed = True
    elif w.n > 4 and w.ends("ουμε"):
        w.n -= 4
        removed = True
    if removed and w.in_set(_EXC19):
        w.n += 3
        w.s[w.n - 3 : w.n] = list("ουμ")


def _r20(w):
    if w.n > 5 and (w.ends("ματων") or w.ends("ματοσ")):
        w.n -= 3
    elif w.n > 4 and w.ends("ματα"):
        w.n -= 2


def _r21(w):
    n = w.n
    if n > 9 and w.ends("ιοντουσαν"):
        w.n -= 9; return
    if n > 8 and (w.ends("ιομασταν") or w.ends("ιοσασταν") or w.ends("ιουμαστε")
                  or w.ends("οντουσαν")):
        w.n -= 8; return
    if n > 7 and (w.ends("ιεμαστε") or w.ends("ιεσαστε") or w.ends("ιομουνα")
                  or w.ends("ιοσαστε") or w.ends("ιοσουνα") or w.ends("ιουνται")
                  or w.ends("ιουνταν") or w.ends("ηθηκατε") or w.ends("ομασταν")
                  or w.ends("οσασταν") or w.ends("ουμαστε")):
        w.n -= 7; return
    if n > 6 and (w.ends("ιομουν") or w.ends("ιονταν") or w.ends("ιοσουν")
                  or w.ends("ηθειτε") or w.ends("ηθηκαν") or w.ends("ομουνα")
                  or w.ends("οσαστε") or w.ends("οσουνα") or w.ends("ουνται")
                  or w.ends("ουνταν") or w.ends("ουσατε")):
        w.n -= 6; return
    if n > 5 and (w.ends("αγατε") or w.ends("ιεμαι") or w.ends("ιεται")
                  or w.ends("ιεσαι") or w.ends("ιοταν") or w.ends("ιουμα")
                  or w.ends("ηθεισ") or w.ends("ηθουν") or w.ends("ηκατε")
                  or w.ends("ησατε") or w.ends("ησουν") or w.ends("ομουν")
                  or w.ends("ονται") or w.ends("ονταν") or w.ends("οσουν")
                  or w.ends("ουμαι") or w.ends("ουσαν")):
        w.n -= 5; return
    if n > 4 and (w.ends("αγαν") or w.ends("αμαι") or w.ends("ασαι")
                  or w.ends("αται") or w.ends("ειτε") or w.ends("εσαι")
                  or w.ends("εται") or w.ends("ηδεσ") or w.ends("ηδων")
                  or w.ends("ηθει") or w.ends("ηκαν") or w.ends("ησαν")
                  or w.ends("ησει") or w.ends("ησεσ") or w.ends("ομαι")
                  or w.ends("οταν")):
        w.n -= 4; return
    if n > 3 and (w.ends("αει") or w.ends("εισ") or w.ends("ηθω")
                  or w.ends("ησω") or w.ends("ουν") or w.ends("ουσ")):
        w.n -= 3; return
    if n > 2 and (w.ends("αν") or w.ends("ασ") or w.ends("αω") or w.ends("ει")
                  or w.ends("εσ") or w.ends("ησ") or w.ends("οι") or w.ends("οσ")
                  or w.ends("ου") or w.ends("υσ") or w.ends("ων")):
        w.n -= 2; return
    if n > 1 and w.vowel():
        w.n -= 1


def _r22(w):
    if w.ends("εστερ") or w.ends("εστατ"):
        w.n -= 5
    elif (w.ends("οτερ") or w.ends("οτατ") or w.ends("υτερ") or w.ends("υτατ")
          or w.ends("ωτερ") or w.ends("ωτατ")):
        w.n -= 4
