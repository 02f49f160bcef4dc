"""FieldMaskingSpanQuery (queries/spans/FieldMaskingSpanQuery.java):
masked clauses read another field's positions inside one span tree."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.manifest import read_manifest
from lucene_ray.index.multifield import FieldSpec, build_multi_field_index
from lucene_ray.index.segment import SegmentReader
from lucene_ray.search.spans import (
    MultiFieldSpanReader,
    SpanFieldMasked,
    SpanNear,
    SpanOr,
    SpanTerm,
    span_matches_segment,
)


@pytest.fixture(scope="module")
def masked_idx(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("maskidx")
    # gender/first-style position-parallel fields (the reference javadoc's
    # own motivating layout): token i of `first` aligns with token i of
    # `last`
    first = ["james john", "mary ann", "john mary"]
    last = ["smith jones", "smith bloggs", "doe smith"]
    corpus = tmp / "c"
    corpus.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(3), pa.int64()),
                "first": pa.array(first),
                "last": pa.array(last),
            }
        ),
        str(corpus / "docs.parquet"),
    )
    idx = str(tmp / "idx")
    build_multi_field_index(
        str(corpus),
        idx,
        [
            FieldSpec("first", "first", "standard", "positions"),
            FieldSpec("last", "last", "standard", "positions"),
        ],
        docs_per_segment=10,
    )
    return idx


def _eval(idx, node):
    mt = read_manifest(os.path.join(idx, "first"))
    ml = read_manifest(os.path.join(idx, "last"))
    out = {}
    for st, sl in zip(mt["segments"], ml["segments"]):
        readers = {
            "first": SegmentReader(st["dir"]),
            "last": SegmentReader(sl["dir"]),
        }
        view = MultiFieldSpanReader(readers["first"], readers)
        docs, n = span_matches_segment(view, node)
        for d, c in zip(docs, n):
            out[int(d) + st["doc_base"]] = int(c)
    return out


def test_masked_parallel_position_match(masked_idx):
    # SAME-position alignment uses the reference's classic slop=-1 trick
    # (SpanNearQuery javadoc / FieldMaskingSpanQuery example): overlap
    # gives (span_len - width_sum) = -1, adjacency gives 0.
    # james@0/smith@0 -> doc 0 only.
    q = SpanNear(
        (SpanTerm("james"), SpanFieldMasked(SpanTerm("smith"), "last")),
        slop=-1,
        in_order=False,
    )
    assert _eval(masked_idx, q) == {0: 1}
    # mary: doc 1 has mary@0/smith@0; doc 2 has mary@1/smith@1
    q2 = SpanNear(
        (SpanTerm("mary"), SpanFieldMasked(SpanTerm("smith"), "last")),
        slop=-1,
        in_order=False,
    )
    assert _eval(masked_idx, q2) == {1: 1, 2: 1}
    # john/smith never aligned (doc 0: john@1 smith@0; doc 2: john@0
    # smith@1) -> empty at slop=-1 ...
    q3 = SpanNear(
        (SpanTerm("john"), SpanFieldMasked(SpanTerm("smith"), "last")),
        slop=-1,
        in_order=False,
    )
    assert _eval(masked_idx, q3) == {}
    # ... but adjacent at slop=0 (the NearSpansUnordered gap rule)
    q4 = SpanNear(
        (SpanTerm("john"), SpanFieldMasked(SpanTerm("smith"), "last")),
        slop=0,
        in_order=False,
    )
    assert _eval(masked_idx, q4) == {0: 1, 2: 1}


def test_masked_or_unions_fields(masked_idx):
    # SpanOr across fields: occurrences of "john" in first OR "jones"
    # (masked) in last
    q = SpanOr((SpanTerm("john"), SpanFieldMasked(SpanTerm("jones"), "last")))
    # doc 0: john@1 + jones@1 -> spans dedup to ONE distinct span [1,1]
    # doc 2: john@0
    assert _eval(masked_idx, q) == {0: 1, 2: 1}
