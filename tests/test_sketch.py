"""HyperLogLog sketch: accuracy envelope, merge associativity, hash
determinism (ops/sketch.py; Flajolet et al. 2007 + HLL-in-practice
small-range correction)."""

from __future__ import annotations

import numpy as np

from lucene_ray.ops.sketch import M, hll_estimate, hll_merge, hll_partial, splitmix64


def test_hll_accuracy_envelope():
    for n in (1, 10, 100, 5000, 50000):
        vals = np.arange(n, dtype=np.int64) * 2654435761 + 42
        est = hll_estimate(hll_partial(vals))
        assert abs(est - n) / n <= 0.05, (n, est)


def test_hll_merge_equals_single_pass():
    vals = np.arange(20000, dtype=np.int64) * 31 + 7
    whole = hll_partial(vals)
    merged = np.zeros(M, np.uint8)
    for part in np.array_split(vals, 13):
        merged = hll_merge(merged, hll_partial(part))
    assert (whole == merged).all()
    # duplicates never change the registers (distinctness)
    dup = hll_merge(whole, hll_partial(vals[:500]))
    assert (dup == whole).all()


def test_splitmix64_deterministic_and_dispersed():
    x = np.arange(1000, dtype=np.int64).view(np.uint64)
    h1, h2 = splitmix64(x), splitmix64(x)
    assert (h1 == h2).all()
    assert len(np.unique(h1)) == 1000
    # top bits well spread: all 16 high nibbles hit
    assert len(np.unique(h1 >> np.uint64(60))) == 16


def test_count_min_upper_bound_and_linearity():
    """CM estimates NEVER undercount, overcount stays within eps*N for the
    planted Zipf stream, and partial tables merge by plain addition."""
    from lucene_ray.ops.sketch import CM_W, cm_merge, cm_partial, cm_query

    rng = np.random.default_rng(5)
    keys = rng.zipf(1.3, 200000).astype(np.int64) % 10000
    uniq, true = np.unique(keys, return_counts=True)
    whole = cm_partial(keys)
    merged = None
    for part in np.array_split(keys, 9):
        t = cm_partial(part)
        merged = t if merged is None else cm_merge(merged, t)
    assert (whole == merged).all()
    est = cm_query(whole, uniq)
    assert (est >= true).all()  # one-sided error
    # eps = e / w within constant slop; N = stream length
    overs = est - true
    assert overs.max() <= 3 * np.e * len(keys) / CM_W
    # the true heavy hitter's estimate is tight in relative terms
    top = uniq[np.argmax(true)]
    assert cm_query(whole, np.array([top]))[0] <= true.max() * 1.05


def test_kmv_quantiles_bottom_k_properties(ray_session):
    """KMV bottom-k quantile sketch (events.value_quantiles): mergeability
    of bottom-m partials (bottom-m of a union == bottom-m of merged
    per-partition bottom-ms), engine sample == DuckDB's sample, and the
    rank gate passes on real data / fails on a poisoned sample."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from lucene_ray.ops import events as ev

    ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet")
    exact, sample = ev.value_quantiles(ds)  # the in-engine gate runs here
    assert set(exact.columns) == {"event_type", "window_start", "n_events", "sum_cents"}
    # p50 <= p95 <= p99 within each group, both arms
    for df in (exact, sample):
        w = df.pivot_table(
            index=["event_type", "window_start"], columns="n_events",
            values="sum_cents",
        )
        assert (w[50] <= w[95]).all() and (w[95] <= w[99]).all()
    # sample arm == DuckDB recount over the same deterministic sample
    want = duckdb.sql("""
      SELECT event_type, window_start,
             quantile_disc(cents, 0.50)::BIGINT q50
      FROM (
        SELECT event_type, window_start, cents FROM (
          SELECT event_type, date_trunc('hour', ts) AS window_start,
                 floor(value * 100.0 + 0.5)::BIGINT AS cents,
                 row_number() OVER (
                   PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY (md5_number_lower('graft' || cast(event_id as varchar))
                             % 9223372036854775808)
                 ) AS rn
          FROM read_parquet('/root/testdata/sf0.001/events.parquet')
        ) WHERE rn <= 256
      ) GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    got = (
        sample[sample["n_events"] == 50]
        .rename(columns={"sum_cents": "q50"})
        .drop(columns=["n_events"])
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    want["window_start"] = pd.to_datetime(want["window_start"])
    got["window_start"] = pd.to_datetime(got["window_start"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # mergeability: bottom-m of merged per-batch bottom-ms == global bottom-m
    import numpy as np

    parts = ds.map_batches(
        ev._kmv_partial, batch_format="pyarrow", fn_kwargs={"m": 16}
    ).to_pandas()
    g = parts[parts["event_type"] == parts["event_type"].iloc[0]]
    ws = g["window_start"].iloc[0]
    g = g[g["window_start"] == ws]
    merged = g.sort_values("h").head(16)["h"].to_numpy()
    whole = duckdb.sql(f"""
      SELECT (md5_number_lower('graft' || cast(event_id as varchar))
              % 9223372036854775808)::BIGINT h
      FROM read_parquet('/root/testdata/sf0.001/events.parquet')
      WHERE event_type = '{g["event_type"].iloc[0]}'
        AND date_trunc('hour', ts) = '{ws}'
      ORDER BY 1 LIMIT 16
    """).df()["h"].to_numpy()
    assert np.array_equal(np.sort(merged), np.sort(whole))
