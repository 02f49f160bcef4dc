"""WordDelimiterGraph + Whitespace + EdgeNGram analyzers: golden cases
from the reference TestWordDelimiterGraphFilter.java, stream/position
semantics, and index-level end-to-end checks."""

import numpy as np
import pytest

from lucene_ray.analysis.analyzers import (
    EdgeNGramAnalyzer,
    WhitespaceAnalyzer,
    WordDelimiterGraphAnalyzer,
    make_analyzer,
)
from lucene_ray.analysis.worddelim import expand_term, split_subwords


def emits(term, **flags):
    return [(e.text, e.advance) for e in expand_term(term, **flags)]


def texts(term, **flags):
    return [e.text for e in expand_term(term, **flags) if e.text is not None]


def test_javadoc_splits():
    # WordDelimiterGraphFilter.java class javadoc examples
    assert texts("Wi-Fi") == ["wi", "fi"]
    assert texts("PowerShot") == ["power", "shot"]
    assert texts("500-42") == ["500", "42"]
    assert texts("wi-fi-4000") == ["wi", "fi", "4000"]
    assert texts("O'Neil's") == ["o", "neil"]
    assert texts("j2se") == ["j", "2", "se"]
    assert texts("HTTPResponse") == ["http", "response"]
    assert texts("NASA") == ["nasa"]
    assert texts("McDonald") == ["mc", "donald"]


def test_flag_variants():
    # no case split
    assert texts("PowerShot", split_on_case_change=False) == ["powershot"]
    # no numeric split
    assert texts("j2se", split_on_numerics=False) == ["j2se"]
    # keep possessive s
    assert texts("O'Neil's", stem_english_possessive=False) == ["o", "neil", "s"]
    # number parts off
    assert texts("wi-fi-4000", generate_number_parts=False) == ["wi", "fi"]
    # word parts off
    assert texts("wi-fi-4000", generate_word_parts=False) == ["4000"]


def test_catenate_and_preserve():
    # reference test: CATENATE_ALL on "lucene.solr" -> lucenesolr, lucene,
    # solr with posInc [1, 0, 1]; we emit the part first, the catenation as
    # the posInc-0 overlay — identical positions, documented order-within-
    # position deviation
    assert emits("lucene.solr", catenate_all=True) == [
        ("lucene", 1),
        ("lucenesolr", 0),
        ("solr", 1),
    ]
    assert texts("wi-fi-4000", catenate_words=True) == ["wi", "wifi", "fi", "4000"]
    assert texts("wi-fi-4000", catenate_all=True) == ["wi", "wifi4000", "fi", "4000"]
    # reference a4 case: "SAL_S8371" with PRESERVE_ORIGINAL — original at
    # the first part's position, parts advance
    assert emits("SAL_S8371", preserve_original=True) == [
        ("sal", 1),
        ("sal_s8371", 0),
        ("s", 1),
        ("8371", 1),
    ]
    # pure-delimiter token: preserved original ADVANCES (reference posInc
    # [1,0,1,1,1,1] on "SAL_S8371 - SAL"); without preserve it is a gap
    assert emits("-", preserve_original=True) == [("-", 1)]
    assert emits("-") == [(None, 1)]


def test_remove_duplicates():
    # preserve + catenate on a 2-word token emit the same string twice at
    # one position; RemoveDuplicatesTokenFilter drops the second
    both = texts("PowerShot", preserve_original=True, catenate_words=True)
    assert both == ["power", "powershot", "powershot", "shot"]
    dedup = texts(
        "PowerShot",
        preserve_original=True,
        catenate_words=True,
        remove_duplicates=True,
    )
    assert dedup == ["power", "powershot", "shot"]


def test_offsets_are_subspans():
    for e in expand_term("PowerShot500", preserve_original=True):
        assert "PowerShot500"[e.rel_s : e.rel_e].lower().startswith(
            e.text[: e.rel_e - e.rel_s]
        )


def test_whitespace_analyzer_case_and_stream():
    w = WhitespaceAnalyzer()
    assert w.tokens("Foo  BAR\tbaz\nqux") == ["Foo", "BAR", "baz", "qux"]
    assert w.normalize("FoO") == "FoO"
    v, tids, docs, pos, lens, n, os_, oe = w._batch_token_stream(
        ["Foo BAR", "", "x Y"]
    )
    got = [(int(docs[i]), int(pos[i]), v[tids[i]]) for i in range(len(tids))]
    assert got == [(0, 0, "Foo"), (0, 1, "BAR"), (2, 0, "x"), (2, 1, "Y")]
    assert lens.tolist() == [2, 0, 2]
    # offsets are doc-relative char spans
    assert (os_.tolist(), oe.tolist()) == ([0, 4, 0, 2], [3, 7, 1, 3])


def test_whitespace_long_token_chunks():
    w = WhitespaceAnalyzer(max_token_length=4)
    assert w.tokens("abcdefghij kl") == ["abcd", "efgh", "ij", "kl"]
    v, tids, *_ = w._batch_token_stream(["abcdefghij kl"])
    assert sorted(v[t] for t in tids) == ["abcd", "efgh", "ij", "kl"]


def test_wdg_stream_positions_gap_and_lengths():
    w = WordDelimiterGraphAnalyzer()
    v, tids, docs, pos, lens, n, os_, oe = w._batch_token_stream(
        ["PowerShot500 -- next", "plain"]
    )
    got = [(int(docs[i]), int(pos[i]), v[tids[i]]) for i in range(len(tids))]
    # "--" leaves a position gap: next lands at 4, not 3
    assert got == [
        (0, 0, "power"),
        (0, 1, "shot"),
        (0, 2, "500"),
        (0, 4, "next"),
        (1, 0, "plain"),
    ]
    assert lens.tolist() == [4, 1]


def test_wdg_overlays_discounted_from_norm():
    w = WordDelimiterGraphAnalyzer(preserve_original=True, catenate_all=True)
    v, tids, docs, pos, lens, *_ = w._batch_token_stream(["wi-fi ok"])
    # overlays (original + catenation) share position 0 and are not counted
    by_pos = {}
    for i in range(len(tids)):
        by_pos.setdefault(int(pos[i]), set()).add(v[tids[i]])
    assert by_pos == {0: {"wi", "wi-fi", "wifi"}, 1: {"fi"}, 2: {"ok"}}
    assert lens.tolist() == [3]


def test_wdg_matches_rowwise_analyze():
    w = WordDelimiterGraphAnalyzer(catenate_words=True)
    docs_txt = ["Wi-Fi O'Neil's j2se", "HTTPResponse 500-42 NASA", ""]
    v, tids, docs, pos, lens, n, *_ = w._batch_token_stream(docs_txt)
    for d, txt in enumerate(docs_txt):
        terms, counts, length = w.analyze(txt)
        stream = sorted(v[tids[i]] for i in range(len(tids)) if docs[i] == d)
        rowwise = sorted(
            t for t, c in zip(terms, counts) for _ in range(c)
        )
        assert stream == rowwise, txt
        assert int(lens[d]) == length


def test_edge_ngram_stream():
    g = EdgeNGramAnalyzer(min_gram=2, max_gram=3)
    v, tids, docs, pos, lens, n, os_, oe = g._batch_token_stream(["spark a of"])
    got = [(int(pos[i]), v[tids[i]], int(oe[i])) for i in range(len(tids))]
    # "a" (< min_gram) drops with a position gap; grams share the position
    assert got == [(0, "sp", 2), (0, "spa", 3), (2, "of", 10)]
    assert lens.tolist() == [2]
    assert g.tokens("spark") == ["sp", "spa"]
    # preserve_original keeps long tokens in full
    gp = EdgeNGramAnalyzer(min_gram=2, max_gram=3, preserve_original=True)
    assert gp.tokens("spark") == ["sp", "spa", "spark"]
    assert g.normalize("SPARK") == "spa"  # query-side gram truncation


def test_edge_ngram_index_prefix_search(tmp_path):
    """End-to-end autocomplete shape: index with edge grams, a prefix
    query term (<= max_gram chars) matches docs by plain TermQuery."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.index.build import build_index_local
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    rows = {
        "doc_id": [0, 1, 2],
        "content": ["sparkle sparse", "spin span", "other words"],
    }
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table(rows), src)
    idx = tmp_path / "idx"
    build_index_local(
        str(src),
        str(idx),
        analyzer={"name": "edge_ngram", "min_gram": 1, "max_gram": 4},
        meta_columns=(),
    )
    s = IndexSearcher(str(idx))
    hits = {d for d, _ in s.search(TermQuery("spar"), 10)}
    assert hits == {0}
    hits = {d for d, _ in s.search(TermQuery("sp"), 10)}
    assert hits == {0, 1}
    hits = {d for d, _ in s.search(TermQuery("oth"), 10)}
    assert hits == {2}


def test_wdg_index_end_to_end(tmp_path):
    """Index build + search through the word_delimiter analyzer: mixed-
    case/delimiter docs match their lowercase subword terms, and phrase
    positions respect subword adjacency."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.index.build import build_index_local
    from lucene_ray.search.query import PhraseQuery, TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    rows = {
        "doc_id": [0, 1, 2],
        "content": ["PowerShot500 zoom", "Wi-Fi router", "plain text"],
    }
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table(rows), src)
    idx = tmp_path / "idx"
    build_index_local(
        str(src),
        str(idx),
        analyzer="word_delimiter",
        index_options="positions",
        meta_columns=(),
    )
    s = IndexSearcher(str(idx))
    assert {d for d, _ in s.search(TermQuery("power"), 10)} == {0}
    assert {d for d, _ in s.search(TermQuery("500"), 10)} == {0}
    assert {d for d, _ in s.search(TermQuery("wi"), 10)} == {1}
    # subwords are adjacent positions: phrase "power shot" matches doc 0
    assert {d for d, _ in s.search(PhraseQuery(("power", "shot")), 10)} == {0}
    assert {d for d, _ in s.search(PhraseQuery(("shot", "zoom")), 10)} == set()


def test_make_analyzer_registry():
    assert isinstance(make_analyzer("whitespace"), WhitespaceAnalyzer)
    assert isinstance(make_analyzer("word_delimiter"), WordDelimiterGraphAnalyzer)
    assert isinstance(make_analyzer("edge_ngram", max_gram=5), EdgeNGramAnalyzer)


def test_split_subwords_spans():
    assert split_subwords("PowerShot500") == [(0, 5), (5, 9), (9, 12)]
    assert split_subwords("--") == []


def test_ngram_stream():
    from lucene_ray.analysis.analyzers import NGramAnalyzer

    g = NGramAnalyzer(min_gram=2, max_gram=3)
    v, tids, docs, pos, lens, n, os_, oe = g._batch_token_stream(["spark a"])
    got = [(int(pos[i]), v[tids[i]], int(os_[i]), int(oe[i])) for i in range(len(tids))]
    # all 2- and 3-grams of "spark" at position 0 with sliding offsets;
    # "a" (< min_gram) drops with a position gap
    assert sorted(got) == sorted(
        [
            (0, "sp", 0, 2),
            (0, "pa", 1, 3),
            (0, "ar", 2, 4),
            (0, "rk", 3, 5),
            (0, "spa", 0, 3),
            (0, "par", 1, 4),
            (0, "ark", 2, 5),
        ]
    )
    assert lens.tolist() == [1]
    # preserve_original keeps out-of-range tokens in full
    gp = NGramAnalyzer(min_gram=2, max_gram=3, preserve_original=True)
    assert "spark" in gp.tokens("spark")
    assert gp.tokens("a") == ["a"]
    assert g.tokens("a") == []
    # normalize is lowercase-only (query grams pass through unchanged)
    assert g.normalize("SPARK") == "spark"


def test_reverse_analyzer_leading_wildcard(tmp_path):
    """ReverseStringFilter turns a leading wildcard into a prefix scan:
    WildcardQuery('*ing') on the standard index == PrefixQuery('gni') on
    the reverse index — same docs, but the reverse path scans a bounded
    dictionary range instead of the whole term dict."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.analysis.analyzers import ReverseAnalyzer
    from lucene_ray.index.build import build_index_local
    from lucene_ray.search.query import PrefixQuery, WildcardQuery
    from lucene_ray.search.searcher import IndexSearcher

    a = ReverseAnalyzer()
    assert a.tokens("Sparking well") == ["gnikraps", "llew"]
    assert a.normalize("Sparking") == "gnikraps"

    rows = {
        "doc_id": [0, 1, 2],
        "content": ["sparking running", "walked jumped", "sing along"],
    }
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table(rows), src)
    std = tmp_path / "std"
    rev = tmp_path / "rev"
    build_index_local(str(src), str(std), meta_columns=())
    build_index_local(str(src), str(rev), analyzer="reverse", meta_columns=())
    s_std = IndexSearcher(str(std))
    s_rev = IndexSearcher(str(rev))
    for suffix in ("ing", "ed", "g"):
        want = {d for d, _ in s_std.search(WildcardQuery(f"*{suffix}"), 10)}
        got = {d for d, _ in s_rev.search(PrefixQuery(suffix[::-1]), 10)}
        assert got == want and want, suffix
