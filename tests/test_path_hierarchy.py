"""PathHierarchyTokenizer / ReversePathHierarchyTokenizer semantics.

Expected values traced from the reference state machines
(analysis/path/PathHierarchyTokenizer.java incrementToken,
ReversePathHierarchyTokenizer.java delimiterPositions) and the
reference's TestPathHierarchyTokenizer cases.
"""

import numpy as np
import pytest

from lucene_ray.analysis.analyzers import PathHierarchyAnalyzer, make_analyzer


def toks_offsets(an, text):
    vocab, tids, docs, pos, lengths, n, os_, oe_ = an._batch_token_stream([text])
    order = np.argsort(pos, kind="stable")
    return [(vocab[tids[i]], int(os_[i]), int(oe_[i])) for i in order]


def test_basic_forward():
    an = PathHierarchyAnalyzer()
    assert an.tokens("/a/b/c") == ["/a", "/a/b", "/a/b/c"]
    assert toks_offsets(an, "/a/b/c") == [("/a", 0, 2), ("/a/b", 0, 4), ("/a/b/c", 0, 6)]
    # no leading delimiter
    assert an.tokens("a/b/c") == ["a", "a/b", "a/b/c"]


def test_trailing_and_consecutive_delimiters():
    an = PathHierarchyAnalyzer()
    # TestPathHierarchyTokenizer#testEndOfDelimiter: /a/b/c/ ->
    # /a, /a/b, /a/b/c, /a/b/c/
    assert an.tokens("/a/b/c/") == ["/a", "/a/b", "/a/b/c", "/a/b/c/"]
    # double delimiter produces a boundary per delimiter
    assert an.tokens("a//b") == ["a", "a/", "a//b"]
    assert an.tokens("/") == ["/"]
    assert an.tokens("") == []
    assert an.tokens("abc") == ["abc"]


def test_replacement():
    an = PathHierarchyAnalyzer(delimiter="/", replacement="\\")
    assert an.tokens("/a/b/c") == ["\\a", "\\a\\b", "\\a\\b\\c"]
    # offsets index the ORIGINAL text
    assert toks_offsets(an, "/a/b/c")[0] == ("\\a", 0, 2)


def test_skip_forward():
    an = PathHierarchyAnalyzer(skip=1)
    # TestPathHierarchyTokenizer#testBasicSkip: /a/b/c skip=1 -> /b, /b/c
    assert toks_offsets(an, "/a/b/c") == [("/b", 2, 4), ("/b/c", 2, 6)]
    # a/b/c skip=1: startPosition lands on the first delimiter
    assert toks_offsets(an, "a/b/c") == [("/b", 1, 3), ("/b/c", 1, 5)]
    # fewer components than skip: nothing
    assert PathHierarchyAnalyzer(skip=3).tokens("a/b") == []
    # skip eats exactly the leading components, trailing delimiter kept
    assert PathHierarchyAnalyzer(skip=2).tokens("a/b/") == ["/"]


def test_reverse():
    an = PathHierarchyAnalyzer(reverse=True)
    # TestReversePathHierarchyTokenizer: /a/b/c -> /a/b/c, a/b/c, b/c, c
    assert an.tokens("/a/b/c") == ["/a/b/c", "a/b/c", "b/c", "c"]
    assert toks_offsets(an, "/a/b/c") == [
        ("/a/b/c", 0, 6),
        ("a/b/c", 1, 6),
        ("b/c", 3, 6),
        ("c", 5, 6),
    ]
    assert an.tokens("a") == ["a"]
    assert an.tokens("") == []


def test_reverse_skip():
    # /a/b/c skip=1 drops the LAST component; endPosition moves to the
    # delimiter boundary before it (tokens keep their trailing delimiter)
    an = PathHierarchyAnalyzer(reverse=True, skip=1)
    assert toks_offsets(an, "/a/b/c") == [("/a/b/", 0, 5), ("a/b/", 1, 5), ("b/", 3, 5)]
    assert PathHierarchyAnalyzer(reverse=True, skip=4).tokens("/a/b/c") == []


def test_positions_advance_and_norm_length():
    an = PathHierarchyAnalyzer()
    vocab, tids, docs, pos, lengths, n, os_, oe_ = an._batch_token_stream(
        ["/x/y", "", "/z"]
    )
    assert n == 3
    assert lengths.tolist() == [2, 0, 1]
    assert pos.tolist() == [0, 1, 0]  # posInc=1 per token, per doc


def test_registry_and_analyze():
    an = make_analyzer({"name": "path_hierarchy", "reverse": True})
    terms, tfs, length = an.analyze("/a/a")
    assert sorted(terms) == ["/a/a", "a", "a/a"]
    assert length == 3
    assert an.normalize("x/y") == "x/y"


def test_bad_args():
    with pytest.raises(ValueError):
        PathHierarchyAnalyzer(skip=-1)
    with pytest.raises(ValueError):
        PathHierarchyAnalyzer(delimiter="ab")
