"""CJKBigramFilter semantics (reference analysis/cjk/CJKBigramFilter.java
default flags, outputUnigrams=false)."""

from lucene_ray.analysis.analyzers import make_analyzer

AN = make_analyzer("cjk_bigram")


def test_bigrams_within_run():
    assert AN.tokens("一二三") == ["一二", "二三"]
    assert AN.tokens("アメリカ") == ["アメ", "メリ", "リカ"]
    assert AN.tokens("한국어") == ["한국", "국어"]


def test_lone_cjk_char_is_unigram():
    assert AN.tokens("一") == ["一"]
    assert AN.tokens("x 一 y") == ["x", "一", "y"]


def test_run_continues_across_whitespace_and_scripts():
    # the filter only checks posIncrement==1: whitespace between CJK
    # tokens does not flush the buffer, and scripts mix in one run
    assert AN.tokens("五七 かな") == ["五七", "七か", "かな"]
    assert AN.tokens("漢字 カナ") == ["漢字", "字カ", "カナ"]


def test_ascii_passthrough_breaks_runs():
    assert AN.tokens("cjk 五七 mid かな end") == [
        "cjk", "五七", "mid", "かな", "end",
    ]
    assert AN.tokens("Hello World") == ["hello", "world"]


def test_offsets_span_both_chars():
    toks = AN._doc_tokens("一二三")  # (term, pos, off_s, off_e)
    assert toks == [("一二", 0, 0, 2), ("二三", 1, 1, 3)]
    # cross-space bigram spans the gap
    toks = AN._doc_tokens("五 か")
    assert toks == [("五か", 0, 0, 3)]


def test_stop_words_leave_position_gap():
    from lucene_ray.analysis.analyzers import CJKBigramAnalyzer

    an = CJKBigramAnalyzer(stop_words=frozenset({"mid"}))
    toks = an._doc_tokens("cjk mid 一")
    # 'mid' is dropped but its position survives as a gap
    assert toks == [("cjk", 0, 0, 3), ("一", 2, 8, 9)]
