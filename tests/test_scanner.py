"""Tokenizer conformance (FIXTURES F4) + fast-path vs exact-DFA differential.

Expected outputs encode StandardTokenizer/StandardAnalyzer semantics:
UAX#29 word break -> per-codepoint lowercase -> empty stop set; 255-UTF-16
unit scan window (see scanner.py module docstring for the buffer-split
semantics of over-long runs, StandardTokenizerImpl.java zzRefill).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from lucene_ray.analysis import scanner
from lucene_ray.analysis.analyzers import SimpleCodeAnalyzer, StandardAnalyzer

AN = StandardAnalyzer()


def toks(text):
    return AN.tokens(text)


def test_ascii_words():
    assert toks("Hello World") == ["hello", "world"]
    assert toks("The quick-brown fox.") == ["the", "quick", "brown", "fox"]


def test_mid_letter_and_numbers():
    assert toks("foo.bar") == ["foo.bar"]  # MidNumLet joins letters
    assert toks("3.14 1,000") == ["3.14", "1,000"]  # MidNum joins digits
    assert toks("a.1 a1.b2") == ["a", "1", "a1", "b2"]  # mixed does not join
    assert toks("a:b") == ["a:b"]  # MidLetter colon
    assert toks("can't") == ["can't"]  # single quote


def test_code_identifiers():
    assert toks("snake_case __init__ camelCase x2") == [
        "snake_case",
        "__init__",
        "camelcase",
        "x2",
    ]
    assert toks("___") == []  # pure ExtendNumLet run is not a token
    assert toks("C++ C# .NET") == ["c", "c", "net"]


def test_cjk():
    assert toks("日本語") == ["日", "本", "語"]  # ideographic: one per char
    assert toks("ひらがな") == ["ひ", "ら", "が", "な"]  # hiragana singles
    assert toks("カタカナ") == ["カタカナ"]  # katakana run
    assert toks("한국어 텍스트") == ["한국어", "텍스트"]  # hangul runs


def test_accents_and_lowercase():
    assert toks("Étude CAFÉ Größe") == ["étude", "café", "größe"]
    # U+0130: Java simple lowercase maps to plain 'i'
    assert toks("İstanbul") == ["istanbul"]


def test_emoji():
    out = toks("emoji 😀👍🏽 ok")
    assert out[0] == "emoji" and out[-1] == "ok"
    assert "😀" in out and "👍🏽" in out  # modifier sequence kept together


def test_max_token_length_split():
    # runs longer than the 255-char buffer are split, both parts kept
    t = toks("x" * 300)
    assert t == ["x" * 255, "x" * 45]
    t = toks("x" * 255)
    assert t == ["x" * 255]
    # explicit smaller max_token_length behaves the same way (window split)
    an = StandardAnalyzer(max_token_length=10)
    assert an.tokens("abcdefghijkl") == ["abcdefghij", "kl"]


def test_empty_and_whitespace():
    assert toks("") == []
    assert toks("   \n\t  ") == []


def test_offsets_utf16():
    out = scanner.scan("a 😀 b")
    # astral char counts as 2 UTF-16 units in offsets
    assert [(t, s, e) for t, s, e, _ in out] == [("a", 0, 1), ("😀", 2, 4), ("b", 5, 6)]


# --- differential: fast path (breaker/simple segments) vs pure DFA --------

def _pure_dfa_spans(text: str, max_len=255):
    cps = np.frombuffer(text.encode("utf-32-le"), dtype="<u4")
    if len(cps) == 0:
        return []
    t = scanner.tables()
    classes = t.cmap[cps]
    u16 = 1 + (cps >= 0x10000).astype(np.int64)
    u16_cum = np.concatenate(([0], np.cumsum(u16)))
    out = []
    scanner._scan_segment_dfa(cps, classes, u16_cum, max_len, out)
    return out


ascii_text = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ019_.,:;'\"!@#$%^&*()-=+[]{}|\\/<>?`~ \t\n\r")
    ),
    max_size=80,
)
unicode_text = st.text(max_size=60)


@settings(max_examples=300, deadline=None)
@given(ascii_text)
def test_fastpath_equals_dfa_ascii(text):
    cps = np.frombuffer(text.encode("utf-32-le"), dtype="<u4")
    assert scanner.scan_spans(cps) == _pure_dfa_spans(text)


@settings(max_examples=300, deadline=None)
@given(unicode_text)
def test_fastpath_equals_dfa_unicode(text):
    text = text.replace("\x00", "")
    cps = np.frombuffer(text.encode("utf-32-le"), dtype="<u4")
    assert scanner.scan_spans(cps) == _pure_dfa_spans(text)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.sampled_from(list("ab0_. '")), min_size=200, max_size=600))
def test_fastpath_equals_dfa_long_runs(text):
    cps = np.frombuffer(text.encode("utf-32-le"), dtype="<u4")
    assert scanner.scan_spans(cps) == _pure_dfa_spans(text)


# --- SimpleCodeAnalyzer SQL parity shape ---------------------------------

def test_simple_code_analyzer():
    an = SimpleCodeAnalyzer()
    assert an.tokens("Foo_bar BAZ-12 qux.py") == ["foo_bar", "baz", "12", "qux", "py"]
    terms, tfs, length = an.analyze("a b a")
    assert dict(zip(terms, tfs)) == {"a": 2, "b": 1} and length == 3
