"""IDVersion PK lookups (sandbox/codecs/idversion + PerThreadPKLookup):
newest-segment-wins, seekExact minVersion semantics, maxIDVersion
fail-fast counters, optimistic-concurrency updates."""
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.build import build_index_local
from lucene_ray.index.idversion import MAX_VERSION, PKLookup, versioned_update


def _tbl(rows):
    return pa.table(
        {
            "id": pa.array([r[0] for r in rows], pa.string()),
            "ver": pa.array([r[1] for r in rows], pa.int64()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }
    )


@pytest.fixture()
def idx(tmp_path):
    d = tmp_path / "c"
    d.mkdir()
    rows = [(f"id{i}", 10 * i, f"doc number {i} alpha beta") for i in range(20)]
    pq.write_table(_tbl(rows), str(d / "c.parquet"), row_group_size=5)
    out = str(tmp_path / "idx")
    build_index_local(
        str(d), out, docs_per_segment=5, content_column="text",
        meta_columns=("id", "ver"),
    )
    return out


def test_lookup_and_seek_exact(idx):
    pk = PKLookup(idx, id_field="id", version_field="ver")
    doc, v = pk.lookup("id7")
    assert (doc, v) == (7, 70)
    assert pk.lookup("nope") is None
    assert pk.seek_exact("id7", 0) == 70
    assert pk.seek_exact("id7", 70) == 70
    assert pk.seek_exact("id7", 71) is None   # version below minVersion
    assert pk.seek_exact("nope", 0) is None


def test_global_fail_fast_skips_all_probes(idx):
    pk = PKLookup(idx, id_field="id", version_field="ver")
    pk.seek_exact("id7", MAX_VERSION)  # above every segment max
    assert pk.stats == {"seeks": 1, "version_skips": 1}


def test_newest_segment_wins_and_stale_rejected(idx):
    # bump id3 to version 1000 via the optimistic update path
    res = versioned_update(
        idx, _tbl([("id3", 1000, "doc number 3 GAMMA")]),
        id_field="id", version_field="ver", content_column="text",
    )
    assert res == {"applied": 1, "rejected": 0} | {"manifest": res.get("manifest")}
    pk = PKLookup(idx, id_field="id", version_field="ver")
    doc, v = pk.lookup("id3")
    assert v == 1000 and doc >= 20  # lives in the appended segment
    # stale + equal versions rejected, strictly newer applied
    res = versioned_update(
        idx,
        _tbl([
            ("id3", 999, "stale"), ("id3", 1000, "equal-stale"),
            ("id4", 41, "newer four"),
        ]),
        id_field="id", version_field="ver", content_column="text",
    )
    assert (res["applied"], res["rejected"]) == (1, 2)
    pk = PKLookup(idx, id_field="id", version_field="ver")
    assert pk.lookup("id3")[1] == 1000
    assert pk.lookup("id4")[1] == 41
    # seekExact agrees with the superseded state: old version no longer
    # reachable even though an old segment held (id4, 40)
    assert pk.seek_exact("id4", 41) == 41
    assert pk.seek_exact("id3", 1001) is None


def test_low_max_segment_fail_fast_stops_at_newest(idx):
    # id5's only occurrence sits in a segment whose max version (90 for
    # docs 5..9 -> ver 50..90) is below min_version=95: the seek answers
    # None via the per-segment fail-fast WITHOUT falling through to any
    # older occurrence, and counts the skip
    versioned_update(
        idx, _tbl([("idZ", 95, "fresh high version")]),
        id_field="id", version_field="ver", content_column="text",
    )
    pk = PKLookup(idx, id_field="id", version_field="ver")
    before = dict(pk.stats)
    assert pk.seek_exact("id5", 95) is None
    assert pk.stats["version_skips"] == before["version_skips"] + 1


def test_version_bounds_checked(idx):
    with pytest.raises(ValueError):
        versioned_update(
            idx, _tbl([("idQ", MAX_VERSION + 1, "too big")]),
            id_field="id", version_field="ver", content_column="text",
        )


def test_versioned_update_intra_batch_duplicates(idx):
    """Duplicate ids WITHIN one update batch collapse to the highest
    version before applying — otherwise the appended segment would hold
    both and the lowest-docid occurrence would win later lookups."""
    res = versioned_update(
        idx, _tbl([("id6", 65, "low"), ("id6", 99, "high"), ("id6", 70, "mid")]),
        id_field="id", version_field="ver", content_column="text",
    )
    assert (res["applied"], res["rejected"]) == (1, 2)
    pk = PKLookup(idx, id_field="id", version_field="ver")
    assert pk.lookup("id6")[1] == 99
    assert pk.seek_exact("id6", 99) == 99
