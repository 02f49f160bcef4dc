"""Matches API: membership agrees with the searcher, spans point at real
text, boolean semantics (required / prohibited / filter)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_ray.index.build import build_index_local
from lucene_ray.index.segment import SegmentReader
from lucene_ray.search.matches import matches
from lucene_ray.search.query import (
    PhraseQuery,
    PrefixQuery,
    SynonymQuery,
    TermQuery,
    bool_query,
)

DOCS = [
    "spark joins the stream today",
    "merge windows and spark the batch",
    "nothing relevant whatsoever",
    "stream merge stream merge stream",
]


def _idx(tmp_path):
    src = tmp_path / "c.parquet"
    pq.write_table(
        pa.table({"content": DOCS, "repo": ["r"] * 4, "path": list("abcd"),
                  "commit": ["x"] * 4, "lang": ["en"] * 4}),
        str(src),
    )
    out = str(tmp_path / "idx")
    build_index_local(str(src), out, index_options="offsets")
    return SegmentReader(out + "/seg_000000")


def test_matches_terms_and_offsets(tmp_path):
    r = _idx(tmp_path)
    m = matches(r, 0, TermQuery("spark"))
    assert list(m) == ["spark"]
    (pos, s, e), = m["spark"]
    assert DOCS[0][s:e] == "spark" and pos == 0
    assert matches(r, 2, TermQuery("spark")) is None
    # multiple occurrences ride one list
    m3 = matches(r, 3, TermQuery("stream"))
    assert len(m3["stream"]) == 3
    assert all(DOCS[3][s:e] == "stream" for _p, s, e in m3["stream"])


def test_matches_boolean_semantics(tmp_path):
    r = _idx(tmp_path)
    q = bool_query(must=[TermQuery("spark")], must_not=[TermQuery("batch")])
    assert matches(r, 0, q) is not None
    assert matches(r, 1, q) is None  # prohibited term present
    q2 = bool_query(should=[TermQuery("merge"), TermQuery("joins")])
    assert set(matches(r, 0, q2)) == {"joins"}
    assert set(matches(r, 1, q2)) == {"merge"}
    assert matches(r, 2, q2) is None
    q3 = bool_query(must=[TermQuery("spark")], filter=[TermQuery("stream")])
    assert matches(r, 0, q3) is not None  # filter terms not reported
    assert set(matches(r, 0, q3)) == {"spark"}
    assert matches(r, 1, q3) is None  # filter fails


def test_matches_phrase_prefix_synonym(tmp_path):
    r = _idx(tmp_path)
    p = PhraseQuery(("stream", "merge"))
    m = matches(r, 3, p)
    assert set(m) == {"stream", "merge"}
    assert matches(r, 0, p) is None
    pre = matches(r, 1, PrefixQuery("wind"))
    assert set(pre) == {"windows"}
    syn = matches(r, 1, SynonymQuery(("spark", "flint")))
    assert set(syn) == {"spark"}


def test_named_matches(tmp_path):
    from lucene_ray.search.matches import find_named_matches, wrap_query

    r = _idx(tmp_path)
    q = bool_query(
        should=[
            wrap_query("q_spark", TermQuery("spark")),
            wrap_query("q_merge", TermQuery("merge")),
        ],
        must_not=[wrap_query("q_batch", TermQuery("batch"))],
    )
    # doc 0: spark yes, merge no, batch absent
    assert find_named_matches(r, 0, q) == ["q_spark"]
    # doc 3: merge yes
    assert find_named_matches(r, 3, q) == ["q_merge"]
    # doc 1 has 'batch' (prohibited): no Matches tree at all
    assert find_named_matches(r, 1, q) is None
    # nested naming: outer name reported alongside the inner hits
    q2 = wrap_query(
        "outer",
        bool_query(
            must=[wrap_query("inner", TermQuery("stream"))],
        ),
    )
    assert find_named_matches(r, 3, q2) == ["outer", "inner"]
    assert find_named_matches(r, 2, q2) is None
    # matches() is transparent through the wrapper
    assert matches(r, 0, wrap_query("x", TermQuery("spark"))) is not None
