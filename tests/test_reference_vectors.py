"""Run the reference's own checkOneTerm vector suites against our
stemmers/normalizers (extracted from the TestXxx.java sources at test
time; Java \\uXXXX escapes decoded, multi-token assertAnalyzesTo rows
and the reference's literal-trailing-space typos filtered).  Skipped
when the reference checkout is absent."""

import os
import re

import pytest

BASE = "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/analysis"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BASE), reason="reference checkout not available"
)


def _java_unescape(s: str) -> str:
    return re.sub(r"\\u([0-9a-fA-F]{4})", lambda m: chr(int(m.group(1), 16)), s)


def _vectors(rel: str):
    src = open(os.path.join(BASE, rel), encoding="utf-8").read()
    pairs = [
        (_java_unescape(a), _java_unescape(b))
        for a, b in re.findall(
            r'check(?:OneTerm)?\(\s*(?:a\s*,\s*)?"([^"]+)"\s*,\s*"([^"]*)"\s*\)',
            src,
        )
    ]
    return [(a.strip(), b) for a, b in pairs if " " not in a.strip()]


def _cases():
    from lucene_ray.analysis import lightstem as ls

    return [
        ("cz/TestCzechStemmer.java", ls.czech_stem, 0),
        ("bg/TestBulgarianStemmer.java", ls.bulgarian_stem, 0),
        ("lv/TestLatvianStemmer.java", ls.latvian_stem, 150),
        ("id/TestIndonesianStemmer.java", ls.indonesian_stem, 50),
        ("hi/TestHindiStemmer.java", ls.hindi_stem, 15),
        ("hi/TestHindiNormalizer.java", ls.hindi_normalize, 10),
        ("ar/TestArabicNormalizationFilter.java", ls.arabic_normalize, 10),
        ("ar/TestArabicStemFilter.java", ls.arabic_stem, 15),
        ("bn/TestBengaliNormalizer.java", ls.bengali_normalize, 10),
        # lowercase is the analyzer's job, not the stemmer's
        ("fa/TestPersianStemFilter.java",
         lambda t, _f=ls.persian_stem: _f(t.lower()), 8),
        ("ckb/TestSoraniNormalizationFilter.java", ls.sorani_normalize, 10),
        ("te/TestTeluguNormalizer.java", ls.telugu_normalize, 3),
        ("te/TestTeluguStemmer.java", ls.telugu_stem, 3),
    ]


@pytest.mark.parametrize(
    "rel,fn,min_n", _cases(), ids=lambda c: c if isinstance(c, str) else ""
)
def test_reference_checkoneterm_vectors(rel, fn, min_n):
    vectors = _vectors(rel)
    assert len(vectors) >= min_n, (rel, len(vectors))
    for inp, expected in vectors:
        assert fn(inp) == expected, (rel, ascii(inp), ascii(fn(inp)), ascii(expected))


def test_german_classic_stemmer_data_txt():
    """de/GermanStemmer.java against the reference's de/data.txt
    vocabulary (tab-separated word/stem pairs)."""
    from lucene_ray.analysis.lightstem import german_stem

    path = os.path.join(BASE, "de", "data.txt")
    total = 0
    for line in open(path, encoding="utf-8"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) != 2:
            continue
        inp, expected = parts[0].strip(), parts[1].strip()
        assert german_stem(inp) == expected, (inp, german_stem(inp), expected)
        total += 1
    assert total >= 25


def test_brazilian_stemmer_vectors():
    """br/BrazilianStemmer.java against every TestBrazilianAnalyzer
    vector (minus the stem-exclusion-set case, which tests the filter's
    KeywordMarker seam, not the stemmer)."""
    from lucene_ray.analysis.brazilian import brazilian_stem

    src = open(os.path.join(BASE, "br", "TestBrazilianAnalyzer.java"),
               encoding="utf-8").read()
    pairs = re.findall(
        r'check(?:Reuse)?\(\s*(?:a\s*,\s*)?"([^"]+)"\s*,\s*"([^"]*)"\s*\)', src
    )
    pairs = [(a, b) for a, b in pairs if (a, b) != ("quintessência", "quintessência")]
    assert len(pairs) >= 85
    for inp, expected in pairs:
        got = brazilian_stem(inp)
        if got is None:
            got = inp.lower()
        assert got == expected, (inp, got, expected)
