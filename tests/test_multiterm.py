"""Multi-term query matching unit tests (segment-level, analyzer bypassed).

Fuzzy must measure edits in CODEPOINTS (reference FuzzyQuery codepoint
automaton; DuckDB levenshtein oracle): a single substituted multi-byte
character is ONE edit, not 2-4.
"""

from __future__ import annotations

from lucene_ray.index.segment import SegmentReader
from lucene_ray.search.multiterm import _fuzzy_term_ids
from tests.util import index_from_token_docs


def _reader(tmp_path, vocab):
    idx = str(tmp_path / "idx")
    index_from_token_docs([[t] for t in vocab], idx)
    return SegmentReader(str(tmp_path / "idx" / "seg_000000"))


def test_fuzzy_codepoint_edits(tmp_path):
    vocab = sorted(["café", "cafe", "cafés", "coffee", "càfè"])
    r = _reader(tmp_path, vocab)
    terms = r.terms_array().to_pylist()

    got = {terms[t] for t in _fuzzy_term_ids(r, "café", 1)}
    # cafe: 1 codepoint substitution (2 UTF-8 byte edits — must still match)
    assert got == {"café", "cafe", "cafés"}

    got2 = {terms[t] for t in _fuzzy_term_ids(r, "café", 2)}
    assert got2 == {"café", "cafe", "cafés", "càfè"}


def test_fuzzy_ascii_distances(tmp_path):
    vocab = sorted(["merge", "merges", "marge", "purge", "emerge", "xyzzy"])
    r = _reader(tmp_path, vocab)
    terms = r.terms_array().to_pylist()
    got = {terms[t] for t in _fuzzy_term_ids(r, "merge", 1)}
    assert got == {"merge", "merges", "marge", "emerge"}
    got2 = {terms[t] for t in _fuzzy_term_ids(r, "merge", 2)}
    assert got2 == {"merge", "merges", "marge", "emerge", "purge"}
