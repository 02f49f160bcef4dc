"""Driver-mimic correctness gate: every queries() entry vs its DuckDB
oracle at sf0.001 (the driver itself runs the same comparison at sf0.01;
tools/check_oracles.py runs either scale standalone)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

import __ray_entry__ as entry_mod  # noqa: E402

from tools.check_oracles import compare, to_pandas  # noqa: E402

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["documents", "embeddings", "events"]:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, con, ray_session):
    ray_df = to_pandas(QUERIES[name](SF_DIR))
    if name not in ORACLES:
        assert len(ray_df) >= 0  # rows-only check
        return
    sql_df = con.sql(ORACLES[name]).df()
    problems = compare(name, ray_df, sql_df)
    assert not problems, problems


def test_queries_fit_driver_cap():
    # the driver checks at most the FIRST 50 queries() entries
    # (CORRECTNESS_r02 had 50 rows for 60 entries — the tail was silently
    # unverified); keep the registry at <= 50 so EVERY entry gets a row
    assert len(QUERIES) <= 50, f"{len(QUERIES)} entries exceed the 50-entry driver cap"
    assert set(ORACLES) <= set(QUERIES)


def test_every_query_has_oracle_or_is_flagged():
    missing = sorted(set(QUERIES) - set(ORACLES))
    # round 4: EVERY entry is oracle-checked — ann_hnsw_topk gained one
    # (the callable asserts HNSW recall >= 0.9 vs the in-engine exact
    # top-k, then returns the exact top-k the SQL oracle reproduces); a
    # new rows-only entry must be a CONSCIOUS decision that edits this
    assert missing == []


def test_entry_returns_stable_frame(ray_session):
    df = entry_mod.entry()
    assert list(df.columns) == ["qid", "rnk", "doc_id", "family"]
    assert len(df) > 0
