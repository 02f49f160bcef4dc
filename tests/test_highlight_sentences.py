"""Sentence-passage highlighter: splitter rules, passage ranking, and the
offsets-index integration (UnifiedHighlighter POSTINGS offset source)."""

import pyarrow as pa
import pyarrow.parquet as pq

from lucene_ray.search.highlight import (
    best_passages,
    format_passage,
    highlight_doc,
    sentence_spans,
)

TEXT = (
    "Spark streams data fast. The merge operator joins sorted runs! "
    "Does the window close? spark and merge appear here together. tail words"
)


def test_sentence_spans_basic():
    spans = sentence_spans(TEXT)
    texts = [TEXT[s:e] for s, e in spans]
    assert texts == [
        "Spark streams data fast.",
        "The merge operator joins sorted runs!",
        "Does the window close?",
        "spark and merge appear here together.",
        "tail words",
    ]
    # spans are ordered and non-overlapping
    for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
        assert s1 < e1 <= s2


def test_sentence_spans_edges():
    assert sentence_spans("") == []
    assert sentence_spans("no terminator at all") == [(0, 20)]
    assert sentence_spans('He said "stop." Then left.') == [(0, 15), (16, 26)]


def test_best_passages_ranking():
    import numpy as np

    # matches for 'spark' (2 occurrences) and 'merge' (2 occurrences)
    low = TEXT.lower()
    def occ(term):
        starts, e = [], 0
        while True:
            i = low.find(term, e)
            if i < 0:
                break
            starts.append(i)
            e = i + len(term)
        return (np.array(starts), np.array(starts) + len(term))

    matches = {"spark": occ("spark"), "merge": occ("merge")}
    ps = best_passages(TEXT, matches, max_passages=2)
    # the sentence with BOTH terms wins (2 unique hits > 1)
    assert TEXT[ps[0].start : ps[0].end] == "spark and merge appear here together."
    assert ps[0].n_uniq == 2 and ps[0].n_hits == 2
    # idf weighting can flip the order
    ps2 = best_passages(TEXT, matches, idf={"spark": 10.0, "merge": 0.1})
    assert ps2[0].score >= ps2[-1].score
    html = format_passage(TEXT, ps[0])
    assert "<b>spark</b>" in html and "<b>merge</b>" in html


def test_highlight_doc_from_offsets_index(tmp_path):
    from lucene_ray.index.build import build_index_local
    from lucene_ray.index.segment import SegmentReader

    docs = [
        TEXT,
        "Nothing relevant here. Truly nothing.",
        "merge merge merge in one sentence. spark alone after!",
    ]
    src = tmp_path / "c.parquet"
    pq.write_table(
        pa.table({"content": docs, "repo": ["r"] * 3, "path": list("abc"),
                  "commit": ["x"] * 3, "lang": ["en"] * 3}),
        str(src),
    )
    idx = str(tmp_path / "idx")
    build_index_local(str(src), idx, index_options="offsets")
    r = SegmentReader(idx + "/seg_000000")
    ps = highlight_doc(r, 0, docs[0], ["spark", "merge"], max_passages=1)
    assert TEXT[ps[0].start : ps[0].end] == "spark and merge appear here together."
    ps2 = highlight_doc(r, 2, docs[2], ["spark", "merge"], max_passages=2)
    assert docs[2][ps2[0].start : ps2[0].end] == "merge merge merge in one sentence."
    assert ps2[0].n_hits == 3
    assert docs[2][ps2[1].start : ps2[1].end] == "spark alone after!"
    assert highlight_doc(r, 1, docs[1], ["spark", "merge"]) == []


def test_fvh_fragments_from_term_vectors(tmp_path):
    """FastVectorHighlighter analogue: tv-driven membership + fixed-char
    fragments in score order."""
    from lucene_ray.index.build import build_index_local
    from lucene_ray.index.segment import SegmentReader
    from lucene_ray.search.highlight import fvh_fragments

    docs = [
        "spark starts here. " + "filler words go on and on. " * 4
        + "then spark and merge end close together near the tail.",
        "no matches at all in this one.",
    ]
    src = tmp_path / "c.parquet"
    pq.write_table(
        pa.table({"content": docs, "repo": ["r"] * 2, "path": list("ab"),
                  "commit": ["x"] * 2, "lang": ["en"] * 2}),
        str(src),
    )
    idx = str(tmp_path / "idx")
    build_index_local(str(src), idx, index_options="offsets", term_vectors=True)
    r = SegmentReader(idx + "/seg_000000")
    frags = fvh_fragments(r, 0, docs[0], ["spark", "merge"], frag_char_size=60)
    assert len(frags) == 2
    # best fragment is the tail window (2 hits incl. both terms)
    assert frags[0].n_hits == 2 and frags[0].n_uniq == 2
    assert frags[0].end - frags[0].start >= 60 or frags[0].end == len(docs[0])
    # fragments pack greedily in offset order: first window holds only the
    # leading spark
    assert frags[1].n_hits == 1
    # absent terms short-circuit via the term vector
    assert fvh_fragments(r, 1, docs[1], ["spark", "merge"]) == []
    # all hit spans point at real term text
    for f in frags:
        for t, s, e in f.term_spans:
            assert docs[0][s:e] == t
