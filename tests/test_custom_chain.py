"""CustomAnalyzer-style filter chain (analysis/custom/CustomAnalyzer.java)
and the analysis-common per-term filter registry."""

import numpy as np
import pytest

from lucene_ray.analysis.analyzers import (
    CustomChainAnalyzer,
    make_analyzer,
    make_term_filter,
)


def test_term_filters():
    assert make_term_filter("apostrophe")("o'brien") == "o"
    assert make_term_filter("trim")("  x  ") == "x"
    assert make_term_filter("truncate", length=3)("sparkling") == "spa"
    f = make_term_filter("pattern_replace", pattern="[0-9]+", replacement="#")
    assert f("a1b22c") == "a#b#c"
    f1 = make_term_filter(
        "pattern_replace", pattern="[0-9]+", replacement="#", all=False
    )
    assert f1("a1b22c") == "a#b22c"
    assert make_term_filter("decimal_digit")("a١٢b") == "a12b"  # arabic 1,2
    assert make_term_filter("decimal_digit")("plain7") == "plain7"
    lf = make_term_filter("length", min=2, max=4)
    assert lf("ab") == "ab" and lf("a") is None and lf("abcde") is None
    sf = make_term_filter("stop", words=["the"])
    assert sf("the") is None and sf("fox") == "fox"
    kf = make_term_filter("keep", words=["fox"])
    assert kf("fox") == "fox" and kf("the") is None
    assert make_term_filter("elision")("l'avion") == "avion"
    assert make_term_filter("elision")("qu'il") == "il"
    assert make_term_filter("elision")("x'y") == "x'y"  # not an article
    assert make_term_filter("possessive")("john's") == "john"
    with pytest.raises(ValueError):
        make_term_filter("nope")


def test_chain_order_and_drop():
    a = CustomChainAnalyzer(
        filters=[
            ("pattern_replace", {"pattern": "[aeiou]", "replacement": ""}),
            ("truncate", {"length": 6}),
            ("length", {"min": 2}),
        ]
    )
    assert a.tokens("the sparkling stream of io") == ["th", "sprkln", "strm"]
    assert a.normalize("sparkling") == "sprkln"
    assert a.normalize("io") == ""  # dropped term normalizes to empty


def test_limit_token_count_stream():
    a = CustomChainAnalyzer(filters=[], limit=3)
    toks = a.tokens("a b c d e")
    assert toks == ["a", "b", "c"]
    # batch stream: per-doc cutoff, norms count survivors only
    vocab, tids, doc_ids, positions, lengths, n_docs, _s, _e = a._batch_token_stream(
        ["a b c d e", "x y"]
    )
    assert lengths.tolist() == [3, 2]
    assert (positions < 3).all()
    # vocab pruned to surviving terms, still sorted
    assert vocab == sorted(vocab)
    assert set(vocab) == {"a", "b", "c", "x", "y"}


def test_registry_spec_roundtrip(ray_session):
    # the dict spec threads through make_analyzer like any parameterized one
    a = make_analyzer(
        {
            "name": "custom",
            "filters": [["truncate", {"length": 4}], ["length", {"min": 2}]],
            "limit": 10,
        }
    )
    assert a.tokens("sparkling me a") == ["spar", "me"]
    b = make_analyzer("custom_chain")
    assert b.tokens("sparkling stream") == ["sprkln", "strm"]


def test_soundex_filter():
    # classic commons-codec Soundex vectors (lowercased)
    from lucene_ray.analysis.analyzers import soundex

    assert soundex("robert") == "r163"
    assert soundex("rupert") == "r163"
    assert soundex("ashcraft") == "a261"   # H transparent between S and C
    assert soundex("tymczak") == "t522"
    assert soundex("pfister") == "p236"    # PF collapse (same code as first)
    assert soundex("honeyman") == "h555"
    assert soundex("a") == "a000"
    assert soundex("123") == "123"         # no letters: passthrough
    f = make_term_filter("soundex")
    assert f("smith") == f("smyth") == "s530"
    # composes in a chain (phonetic canonicalization index shape)
    a = CustomChainAnalyzer(filters=[("soundex", {})])
    assert a.tokens("smith smyth robert") == ["s530", "s530", "r163"]
    assert a.normalize("Rupert".lower()) == "r163"


def test_html_strip_analyzer():
    from lucene_ray.analysis.analyzers import HTMLStripAnalyzer

    a = HTMLStripAnalyzer()
    text = 'Hello <b>bold</b> world &amp; <a href="x">link</a> &#33; tail'
    assert a.tokens(text) == ["hello", "bold", "world", "link", "tail"]
    # offsets point into the ORIGINAL markup; an end offset landing
    # exactly on a stripped tag includes it (BaseCharFilter.correct maps
    # via the largest correction point <= offset — reference semantics)
    vocab, tids, docs, pos, lens, n, off_s, off_e = a._batch_token_stream([text])
    spans = {vocab[t]: (int(s), int(e)) for t, s, e in zip(tids, off_s, off_e)}
    assert text[spans["bold"][0]:].startswith("bold")
    assert text[slice(*spans["bold"])] == "bold</b>"
    assert text[spans["link"][0]:].startswith("link")
    assert text[slice(*spans["tail"])] == "tail"
    # entity decoding merges into the token stream where it lands
    assert a.tokens("x&lt;y &#65;BC") == ["x", "y", "abc"]
    # normalization applies the strip too
    assert a.normalize("<b>Bold</b>") == "bold"


def test_common_grams_stream():
    """CommonGramsFilter (reference TestCommonGramsFilter shapes): the gram
    '_'-joins adjacent pairs where either side is common, sits at w1's
    position (posInc 0), and does not count toward the norm length."""
    from lucene_ray.analysis.analyzers import CommonGramsAnalyzer

    class A(CommonGramsAnalyzer):
        common = frozenset({"the"})

    an = A()
    # the reference's canonical example
    assert an.tokens("the quick brown fox") == [
        "the", "the_quick", "quick", "brown", "fox",
    ]
    # common word in the middle: grams before AND after it
    assert an.tokens("quick the brown") == [
        "quick", "quick_the", "the", "the_brown", "brown",
    ]
    terms, tfs, length = an.analyze("the quick the quick")
    assert length == 4  # discountOverlaps: unigrams only
    got = dict(zip(terms, tfs))
    assert got["the_quick"] == 2 and got["the"] == 2

    # stream path: gram position == w1's position, offsets span the pair
    vocab, tids, docs, pos, lengths, n_docs, off_s, off_e = (
        an._batch_token_stream(["xx the yy"])
    )
    toks = [(vocab[t], int(p), int(s), int(e))
            for t, p, s, e in zip(tids, pos, off_s, off_e)]
    assert ("xx_the", 0, 0, 6) in toks      # gram at xx's position 0
    assert ("the_yy", 1, 3, 9) in toks      # gram at the's position 1
    assert lengths.tolist() == [3]


def test_common_grams_end_to_end(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.index.build import build_index_local
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    corpus = str(tmp_path / "c")
    import os

    os.makedirs(corpus)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    ["full scan order by key", "order without adjacency scan x",
                     "no common words here"]
                ),
            }
        ),
        corpus + "/p.parquet",
    )
    idx = str(tmp_path / "i")
    build_index_local(
        corpus, idx, analyzer="common_grams", content_column="text",
        meta_columns=("doc_id",), docs_per_segment=10,
    )
    s = IndexSearcher(idx)
    # 'scan order' adjacency answered by ONE gram term lookup
    assert [d for d, _ in s.search(TermQuery("scan_order"), 10)] == [0]
    # unigrams still searchable
    assert {d for d, _ in s.search(TermQuery("scan"), 10)} == {0, 1}


def test_reverse_filter_and_leading_wildcard_scan(ray_session, tmp_path):
    """ReverseStringFilter (analysis/reverse/ReverseStringFilter.java):
    indexing reversed terms turns a leading wildcard ``*suffix`` into a
    PREFIX scan over the reversed dictionary — asserted equal to the
    direct full-dictionary wildcard scan, while touching only the
    bounded reversed range."""
    import fnmatch

    import pyarrow.parquet as pq

    from lucene_ray.corpus import generate_corpus
    from lucene_ray.index.build import build_index_local
    from lucene_ray.search.searcher import IndexSearcher

    assert make_term_filter("reverse")("spark") == "kraps"

    d = tmp_path / "c"
    d.mkdir()
    pq.write_table(generate_corpus(150, seed=3), str(d / "c.parquet"))
    plain = str(tmp_path / "plain")
    build_index_local(str(d), plain, docs_per_segment=50)
    rev = str(tmp_path / "rev")
    build_index_local(str(d), rev, docs_per_segment=50, analyzer="reverse")
    sp, sr = IndexSearcher(plain), IndexSearcher(rev)
    for suffix in ("er", "ing", "n", "turn"):
        # direct: scan the WHOLE dictionary with fnmatch (*suffix)
        want = set()
        for r in sp.readers:
            for tid in range(r.n_terms):
                if fnmatch.fnmatch(r.term_string(tid), f"*{suffix}"):
                    want.add(r.term_string(tid))
        # reversed: bounded prefix range over the reversed dictionary
        got = set()
        scanned = 0
        pref = suffix[::-1].encode("utf-8")
        for r in sr.readers:
            tids = list(r.term_id_range(pref, pref + b"\xff\xff\xff\xff"))
            scanned += len(tids)
            got.update(r.term_string(t)[::-1] for t in tids)
        assert got == want, suffix
        total = sum(r.n_terms for r in sr.readers)
        assert scanned < total  # the range scan really is bounded


def test_capitalization_filter():
    from lucene_ray.analysis.analyzers import make_term_filter

    f = make_term_filter("capitalization")
    assert f("hello") == "Hello"
    assert f("HELLO") == "Hello"
    assert f("x") == "X"
    assert f("") == ""


def test_german_normalization_filter():
    # goldens from TestGermanNormalizationFilter
    from lucene_ray.analysis.analyzers import make_term_filter

    f = make_term_filter("german_normalization")
    assert f("Schaltflächen") == "Schaltflachen"
    assert f("Schaltflaechen") == "Schaltflachen"
    assert f("weißbier") == "weissbier"
    # 'ue' deletion is blocked after a vowel or q
    assert f("quelle") == "quelle"
    assert f("aue") == "aue"
    assert f("hue") == "hu"
    assert f("üben") == "uben"


def test_simple_and_stop_analyzers():
    """SimpleAnalyzer (letter runs + lowercase) and StopAnalyzer
    (+ stop set with position gaps)."""
    from lucene_ray.analysis.analyzers import make_analyzer

    a = make_analyzer("simple")
    assert a.tokens("Don't panic42 über ALL") == ["don", "t", "panic", "über", "all"]
    s = make_analyzer("stop")
    assert s.tokens("the Quick brown fox") == ["quick", "brown", "fox"]
    v, t, d, p, l, n, os_, oe = s._batch_token_stream(["the quick fox"])
    assert [(v[t[i]], int(p[i])) for i in range(len(t))] == [
        ("quick", 1), ("fox", 2),
    ]
    assert l.tolist() == [2]
    s2 = make_analyzer("stop", stop_words={"fox"})
    assert s2.tokens("the fox runs") == ["the", "runs"]


def test_pattern_replace_char_filter():
    """PatternReplaceCharFilter: regex rewrite before tokenization with
    offsets corrected back into the original text."""
    from lucene_ray.analysis.analyzers import make_analyzer

    an = make_analyzer(
        {"name": "pattern_replace_char",
         "pattern": r"(\d+)-(\d+)", "replacement": r"\1\2"}
    )
    text = "call 555-1234 now"
    v, t, d, p, l, n, os_, oe = an._batch_token_stream([text])
    got = [(v[t[i]], int(os_[i]), int(oe[i])) for i in range(len(t))]
    assert got == [("call", 0, 4), ("5551234", 5, 13), ("now", 14, 17)]
    assert text[5:13] == "555-1234"  # the span covers the source region
    # pure deletion pattern
    an2 = make_analyzer({"name": "pattern_replace_char", "pattern": r"#\w+"})
    assert an2.tokens("keep #drop this") == ["keep", "this"]
    # query-side normalization applies the char filter too
    assert an.normalize("55-66") == "5566"


def test_uppercase_filter():
    from lucene_ray.analysis.analyzers import make_term_filter

    f = make_term_filter("uppercase")
    assert f("hello") == "HELLO"
    assert f("MiXeD") == "MIXED"


def test_protected_term_filter():
    from lucene_ray.analysis.analyzers import make_term_filter

    f = make_term_filter("protected", words=["running"], then="porter")
    assert f("running") == "running"  # protected: stemmer skipped
    assert f("jumping") == "jump"


def test_language_lowercase_and_recognizer_filters():
    from lucene_ray.analysis.analyzers import make_term_filter

    g = make_term_filter("greek_lowercase")
    assert g("ΜΆΪΟΣ") == "μαιοσ"      # tonos/dialytika folded, sigma standard
    assert g("καλός") == "καλοσ"
    assert g("ς") == "σ"
    ir = make_term_filter("irish_lowercase")
    assert ir("nAthair") == "n-athair"  # n-prothesis
    assert ir("tÚll") == "t-úll"        # t-prothesis with fada
    assert ir("Gaeilge") == "gaeilge"
    assert ir("na") == "na"             # lowercase vowel: no hyphen
    d = make_term_filter("date_recognizer")
    assert d("2024-03-16") == "2024-03-16"
    assert d("notadate") is None
    d2 = make_term_filter("date_recognizer", format="%d/%m/%Y")
    assert d2("16/03/2024") == "16/03/2024" and d2("2024-03-16") is None
    cc = make_term_filter("codepoint_count", min=2, max=4)
    assert cc("abc") == "abc" and cc("a") is None and cc("abcde") is None


def test_turkish_lowercase():
    from lucene_ray.analysis.analyzers import make_term_filter

    f = make_term_filter("turkish_lowercase")
    assert f("İSTANBUL") == "istanbul"
    assert f("DİYARBAKIR") == "diyarbakır"
    assert f("I") == "ı"            # dotless
    assert f("İ") == "i"      # I + combining dot above -> i


def test_pattern_split_tokenizer():
    from lucene_ray.analysis.analyzers import make_analyzer

    an = make_analyzer({"name": "pattern_split", "pattern": r"[,;]+"})
    assert an.tokens("Red, Green;;Blue") == ["red", " green", "blue"]
    v, t, d, p, l, n, os_, oe = an._batch_token_stream(["a,b,,c"])
    got = [(v[t[i]], int(os_[i]), int(oe[i]), int(p[i])) for i in range(len(t))]
    assert got == [("a", 0, 1, 0), ("b", 2, 3, 1), ("c", 5, 6, 2)]


def test_scandinavian_normalization():
    # goldens from TestScandinavianNormalizationFilter
    from lucene_ray.analysis.analyzers import make_term_filter

    f = make_term_filter("scandinavian_normalization")
    assert f("aeaaoeoo") == "æåøø"
    assert f("blåbærsyltetöj") == "blåbærsyltetøj"
    assert f("räksmörgås") == "ræksmørgås"
    assert f("ao") == "å"
    assert f("AO") == "Å"
    assert f("plain") == "plain"


def test_serbian_normalization():
    from lucene_ray.analysis.analyzers import make_term_filter

    f = make_term_filter("serbian_normalization")
    assert f("ђура") == "djura"      # Cyrillic dj-digraph
    assert f("љиљана") == "ljiljana"
    assert f("џеп") == "dzep"
    assert f("чевапчићи") == "cevapcici"
    assert f("čevapčići") == "cevapcici"  # diacritic Latin folds too
    assert f("живот") == "zivot"
    assert f("plain") == "plain"
