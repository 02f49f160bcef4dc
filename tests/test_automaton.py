"""TermAutomatonQuery: DP vs an independent brute-force path matcher,
construction validation, and oracle-compiler sanity."""

import numpy as np
import pytest

from lucene_ray.pipelines import fulltext as ft
from lucene_ray.search.automaton import (
    ANY,
    TermAutomatonQuery as TA,
    term_automaton_matches_segment,
)

SF = "/root/testdata/sf0.001"


def test_validation():
    with pytest.raises(ValueError, match="forward"):
        TA(2, ((1, 1, "x"),), (1,))
    with pytest.raises(ValueError, match="initial"):
        TA(3, ((0, 1, ANY), (1, 2, "x")), (2,))
    with pytest.raises(ValueError, match="accept"):
        TA(3, ((0, 1, "x"), (1, 2, ANY)), (2,))
    with pytest.raises(ValueError, match="no accept"):
        TA(2, ((0, 1, "x"),), ())


def test_paths_enumeration():
    q = TA(3, ((0, 1, "join"), (0, 1, "merge"), (1, 2, "order")), (2,))
    assert sorted(q.paths()) == [("join", "order"), ("merge", "order")]
    diamond = TA(
        5,
        ((0, 1, "window"), (1, 4, "group"), (1, 2, ANY), (2, 4, "group")),
        (4,),
    )
    assert sorted(diamond.paths(), key=len) == [
        ("window", "group"),
        ("window", ANY, "group"),
    ]


def _brute(tokens_by_doc: dict[int, list[str]], q: TA) -> set[int]:
    out = set()
    for doc, toks in tokens_by_doc.items():
        for path in q.paths():
            L = len(path)
            for s in range(len(toks) - L + 1):
                if all(
                    lab is ANY or toks[s + i] == lab
                    for i, lab in enumerate(path)
                ):
                    out.add(doc)
                    break
    return out


def test_dp_vs_brute_on_real_segment(ray_session):
    import pyarrow.parquet as pq

    from lucene_ray.analysis.analyzers import make_analyzer
    from lucene_ray.index import manifest as mf
    from lucene_ray.index.segment import SegmentReader

    idx = ft.ensure_index(SF, index_options="positions")
    man = mf.read_manifest(idx)
    a = make_analyzer("standard")
    corpus = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(corpus["doc_id"].to_pylist(), corpus["text"].to_pylist()))
    for q in ft._automaton_queries():
        got = set()
        for seg in man["segments"]:
            r = SegmentReader(seg["dir"])
            d = term_automaton_matches_segment(r, q)
            got |= {int(x) + seg["doc_base"] for x in d}
        toks = {d: a.tokens(t) for d, t in texts.items()}
        assert got == _brute(toks, q), q
