"""ClassicTokenizer maximal-munch grammar + ClassicFilter +
UAX29URLEmail pre-pass (expected values traced from
ClassicTokenizerImpl.jflex rule set and TestClassicAnalyzer)."""

from lucene_ray.analysis.classic import (
    ClassicAnalyzer,
    UAX29URLEmailAnalyzer,
    classic_scan,
)
from lucene_ray.analysis.analyzers import make_analyzer


def types(text):
    return [(t, ty) for t, ty, _, _ in classic_scan(text)]


def test_grammar_rule_types():
    assert types("U.S.A.") == [("U.S.A.", "ACRONYM")]
    assert types("AT&T") == [("AT&T", "COMPANY")]
    assert types("Excite@Home") == [("Excite@Home", "COMPANY")]
    assert types("O'Reilly's") == [("O'Reilly's", "APOSTROPHE")]
    assert types("www.foo.com") == [("www.foo.com", "HOST")]
    assert types("bob@example.com") == [("bob@example.com", "EMAIL")]
    assert types("1.2.3.4") == [("1.2.3.4", "HOST")]  # tie: HOST before NUM
    assert types("wifi-4.5") == [("wifi-4.5", "NUM")]
    assert types("2024-03-16") == [("2024-03-16", "NUM")]
    assert types("hello world") == [("hello", "ALPHANUM"), ("world", "ALPHANUM")]


def test_maximal_munch_across_rules():
    # HOST matches only '1.2' but NUM extends to '1.2-3': longest wins
    assert types("1.2-3") == [("1.2-3", "NUM")]
    # mixed segments where every other one has a digit
    assert types("en/doc5") == [("en/doc5", "NUM")]


def test_classic_filter_chain():
    an = ClassicAnalyzer()
    assert an.tokens("O'Reilly's U.S.A. books") == ["o'reilly", "usa", "books"]
    # english stop set drops 'the'/'on'
    assert an.tokens("the file on disk") == ["file", "disk"]
    assert an.normalize("AT&T") == "at&t"


def test_uax29_url_email():
    an = UAX29URLEmailAnalyzer()
    assert an.tokens("see https://x.io/a/b1 now") == [
        "see", "https://x.io/a/b1", "now",
    ]
    assert an.tokens("mail bob.smith+tag@ex-1.example.org today") == [
        "mail", "bob.smith+tag@ex-1.example.org", "today",
    ]
    # plain text falls through to UAX#29 (AT&T splits, 'at' stopped)
    assert an.tokens("AT&T U.S.A.") == ["t", "u.s.a"]


def test_registry():
    assert isinstance(make_analyzer("classic"), ClassicAnalyzer)
    assert isinstance(make_analyzer("uax29_url_email"), UAX29URLEmailAnalyzer)


def test_stream_offsets():
    an = ClassicAnalyzer()
    vocab, tids, docs, pos, lengths, n, os_, oe = an._batch_token_stream(
        ["a B.C. x", ""]
    )
    got = sorted(zip((vocab[t] for t in tids), os_.tolist(), oe.tolist()))
    # 'a' is a stopword; ACRONYM span covers the dotted source text
    assert got == [("bc", 2, 6), ("x", 7, 8)]
    assert lengths.tolist() == [2, 0]


def test_stop_positions_leave_gaps():
    # StopFilter posIncrement semantics: 'the' consumes position 1
    an = ClassicAnalyzer()
    toks = an._doc_tokens("join the order")
    assert [(t, p) for t, p, _, _ in toks] == [("join", 0), ("order", 2)]
    ua = UAX29URLEmailAnalyzer()
    toks = ua._doc_tokens("join the order")
    assert [(t, p) for t, p, _, _ in toks] == [("join", 0), ("order", 2)]


def test_url_email_not_extracted_mid_token():
    an = UAX29URLEmailAnalyzer()
    # maximal munch from token boundaries: no mid-token URL extraction
    assert an.tokens("xhttps://a.io") == ["xhttps", "a.io"]
    # a longer local part from the boundary is still one whole email
    assert an.tokens("xbob@ex.com go") == ["xbob@ex.com", "go"]
    # still extracts at real boundaries
    assert an.tokens("(https://a.io)") == ["https://a.io"]


def test_url_query_and_fragment():
    an = UAX29URLEmailAnalyzer()
    assert an.tokens("see https://a.io/p?x=1&y=2#frag done") == [
        "see", "https://a.io/p?x=1&y=2#frag", "done",
    ]


def test_classic_index_end_to_end(tmp_path, ray_session):
    """BM25 search over a classic-analyzed index: COMPANY/EMAIL tokens
    are directly searchable terms."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.index.build import build_index_local
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    docs = [
        "call AT&T about U.S.A. plans",
        "mail bob@ex.com today",
        "nothing else",
    ]
    src = tmp_path / "c.parquet"
    pq.write_table(
        pa.table({"content": docs, "repo": ["r"] * 3, "path": list("abc"),
                  "commit": ["x"] * 3, "lang": ["en"] * 3}),
        str(src),
    )
    idx = str(tmp_path / "idx")
    build_index_local(str(src), idx, analyzer="classic")
    s = IndexSearcher(idx)
    assert [d for d, _ in s.search(TermQuery("at&t"), 5)] == [0]
    assert [d for d, _ in s.search(TermQuery("usa"), 5)] == [0]
    assert [d for d, _ in s.search(TermQuery("bob@ex.com"), 5)] == [1]
    assert s.count(TermQuery("about")) == 1  # "about" is not in the 33-word stop set
