"""Event-table operators: windowed aggregation, sessionization, as-of join.

The reference engine is snapshot-batch (no streaming), so these are the
batch formulations a training-data pipeline actually runs over event logs:

- ``windowed_counts``: tumbling-window aggregate as a two-level
  aggregation — per-batch PARTIAL combine inside ``map_batches`` (each
  batch collapses to at most #windows x #types rows), then a small
  ``groupby().sum`` final.  The shuffle moves pre-aggregated partials,
  not events: the canonical partial+final pattern at 100 TB.
- ``sessionize``: per-user session windows (gap-based) via
  ``groupby(user_id).map_groups`` — the partition key IS the session
  scope, so each group sorts its own events locally; no global sort.
- ``asof_last_login``: per-event as-of join (latest 'login' <= purchase
  ts, same user) via the same per-user grouping + ``np.searchsorted``;
  an as-of join keyed and sorted inside each partition.

Money amounts are compared as integer cents (floor(v*100 + 0.5), the
same double expression the oracle SQL uses) so driver value-hashes are
exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SESSION_GAP_MIN = 30

_US_PER_HOUR = 3_600_000_000


def _cents(v: np.ndarray) -> np.ndarray:
    return np.floor(v * 100.0 + 0.5).astype(np.int64)


def _ts_us(col) -> np.ndarray:
    """timestamp column -> int64 epoch-us numpy view (zero-copy for
    timestamp[us]; other precisions are normalized first)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type) and col.type.unit != "us":
        col = col.cast(pa.timestamp("us"))
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def _hour_floor(col) -> pa.Array:
    out = pc.floor_temporal(col, unit="hour")
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _group_slices(et: np.ndarray, ws_us: np.ndarray):
    """Yield (event_type, window_us, row_indices) per distinct
    (event_type, window) pair — the numpy composite-key replacement for a
    pandas groupby iteration inside Arrow-native partials."""
    et_u, et_inv = np.unique(et, return_inverse=True)
    ws_u, ws_inv = np.unique(ws_us, return_inverse=True)
    nw = max(len(ws_u), 1)
    comp = et_inv.astype(np.int64) * nw + ws_inv
    order = np.argsort(comp, kind="stable")
    comp_s = comp[order]
    starts = np.nonzero(np.concatenate(([True], comp_s[1:] != comp_s[:-1])))[0]
    ends = np.concatenate((starts[1:], [len(comp_s)]))
    for s, e in zip(starts, ends):
        k = int(comp_s[s])
        yield str(et_u[k // nw]), int(ws_u[k % nw]), order[s:e]


def _windowed_partial(batch: pa.Table) -> pa.Table:
    t = pa.table(
        {
            "event_type": batch.column("event_type"),
            "window_start": _hour_floor(batch.column("ts")),
            "cents": pa.array(
                _cents(batch.column("value").to_numpy(zero_copy_only=False))
            ),
        }
    )
    g = pa.TableGroupBy(t, ["event_type", "window_start"]).aggregate(
        [("cents", "count"), ("cents", "sum")]
    )
    return g.rename_columns(["event_type", "window_start", "n_events", "sum_cents"])


def windowed_counts(ds):
    """Tumbling 1-hour windows per event_type: (event_type, window_start,
    n_events, sum_cents)."""
    partials = ds.map_batches(_windowed_partial, batch_format="pyarrow")
    final = partials.groupby(["event_type", "window_start"]).sum(
        ["n_events", "sum_cents"]
    )
    return final.map_batches(
        lambda b: pa.table(
            {
                "event_type": b.column("event_type"),
                "window_start": b.column("window_start"),
                "n_events": b.column("sum(n_events)"),
                "sum_cents": b.column("sum(sum_cents)"),
            }
        ),
        batch_format="pyarrow",
    )


def _sessionize_group(group: pa.Table) -> pa.Table:
    ts = _ts_us(group.column("ts"))
    eid = group.column("event_id").to_numpy()
    order = np.lexsort((eid, ts))
    gap_us = np.int64(SESSION_GAP_MIN) * 60 * 1_000_000
    gaps = int((np.diff(ts[order]) > gap_us).sum())
    return pa.table(
        {
            "user_id": pa.array([int(group.column("user_id")[0].as_py())], pa.int64()),
            "n_sessions": pa.array([gaps + 1], pa.int64()),
            "n_events": pa.array([len(ts)], pa.int64()),
        }
    )


def sessionize(ds):
    """(user_id, n_sessions, n_events) with 30-minute gap sessions."""
    from .util import strip_schema_metadata

    clean = ds.map_batches(strip_schema_metadata, batch_format="pyarrow")
    return clean.groupby("user_id").map_groups(_sessionize_group, batch_format="pyarrow")


def _asof_group(group: pa.Table) -> pa.Table:
    et = group.column("event_type").to_numpy(zero_copy_only=False)
    ts = _ts_us(group.column("ts"))
    eid = group.column("event_id").to_numpy()
    login_us = np.sort(ts[et == "login"])
    bi = np.nonzero(et == "purchase")[0]
    bi = bi[np.lexsort((eid[bi], ts[bi]))]
    if len(bi) == 0:
        return pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "last_login_us": pa.array([], pa.int64()),
            }
        )
    # integer epoch-us with -1 for "no prior login": NULL-free output so
    # driver value-hashes are exact (NaT != NaT would poison comparisons)
    if len(login_us) == 0:
        last_us = np.full(len(bi), -1, dtype=np.int64)
    else:
        idx = np.searchsorted(login_us, ts[bi], side="right") - 1
        last_us = np.where(idx >= 0, login_us[np.maximum(idx, 0)], np.int64(-1))
    return pa.table(
        {
            "event_id": pa.array(eid[bi], pa.int64()),
            "last_login_us": pa.array(last_us, pa.int64()),
        }
    )


def asof_last_login(ds):
    """As-of join: for each 'purchase', the latest same-user 'login' with
    ts <= purchase ts, as epoch microseconds (-1 if none)."""
    from .util import strip_schema_metadata

    clean = ds.map_batches(strip_schema_metadata, batch_format="pyarrow")
    return clean.groupby("user_id").map_groups(_asof_group, batch_format="pyarrow")


INTERVAL_JOIN_MIN = 60


def _interval_group(group: pa.Table) -> pa.Table:
    """Per user: for each 'purchase', the count of same-user 'click'
    events in the preceding INTERVAL_JOIN_MIN minutes — (left.ts -
    window, left.ts], two searchsorteds per purchase batch."""
    et = group.column("event_type").to_numpy(zero_copy_only=False)
    ts = _ts_us(group.column("ts"))
    eid = group.column("event_id").to_numpy()
    clicks = np.sort(ts[et == "click"])
    bi = np.nonzero(et == "purchase")[0]
    bi = bi[np.lexsort((eid[bi], ts[bi]))]
    if len(bi) == 0:
        return pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "n_clicks": pa.array([], pa.int64()),
            }
        )
    bts = ts[bi]
    lo = bts - np.int64(INTERVAL_JOIN_MIN) * 60 * 1_000_000
    hi_idx = np.searchsorted(clicks, bts, side="right")
    lo_idx = np.searchsorted(clicks, lo, side="right")  # strict > lower end
    return pa.table(
        {
            "event_id": pa.array(eid[bi], pa.int64()),
            "n_clicks": pa.array((hi_idx - lo_idx).astype(np.int64), pa.int64()),
        }
    )


def interval_join_clicks(ds):
    """Stream-stream INTERVAL JOIN (the Flink/Beam interval-join shape;
    reference analogue: the join module's query-time joins, but over
    event time): purchases joined to same-user clicks with
    click.ts in (purchase.ts - 60min, purchase.ts].  The user key is the
    partition key — one groupby co-locates both sides, each group does
    vectorized searchsorted counting; no all-to-all beyond the keyed
    shuffle."""
    from .util import strip_schema_metadata

    clean = ds.map_batches(strip_schema_metadata, batch_format="pyarrow")
    return clean.groupby("user_id").map_groups(
        _interval_group, batch_format="pyarrow"
    )


def _join_family_group(group: pa.Table) -> pa.Table:
    """Both event-time joins from ONE co-located group: (kind, event_id, v)
    with kind in {asof, interval_clicks}."""
    asof = _asof_group(group)
    iv = _interval_group(group)
    return pa.table(
        {
            "kind": pa.array(
                ["asof"] * len(asof) + ["interval_clicks"] * len(iv), pa.string()
            ),
            "event_id": pa.concat_arrays(
                [
                    asof.column("event_id").combine_chunks(),
                    iv.column("event_id").combine_chunks(),
                ]
            ),
            "v": pa.concat_arrays(
                [
                    asof.column("last_login_us").combine_chunks(),
                    iv.column("n_clicks").combine_chunks(),
                ]
            ),
        }
    )


def join_family(ds):
    """As-of join + interval join over the SAME keyed shuffle: one
    groupby(user_id) co-locates each user's events once and the group fn
    emits both kinds — half the exchange cost of running the two joins
    separately."""
    from .util import strip_schema_metadata

    clean = ds.map_batches(strip_schema_metadata, batch_format="pyarrow")
    return clean.groupby("user_id").map_groups(
        _join_family_group, batch_format="pyarrow"
    )


HOP_WINDOW_MIN = 60
HOP_STEP_MIN = 30


def _hopping_partial(batch: pa.Table) -> pa.Table:
    """Hopping (sliding) 60-min windows every 30 min: each event lands in
    window_size/hop = 2 windows; the batch collapses to per-(type, window)
    partials BEFORE the shuffle, exactly like the tumbling partial."""
    ts = _ts_us(batch.column("ts"))
    cents = pa.array(_cents(batch.column("value").to_numpy(zero_copy_only=False)))
    et = batch.column("event_type")
    step_us = np.int64(HOP_STEP_MIN) * 60 * 1_000_000
    win_us = np.int64(HOP_WINDOW_MIN) * 60 * 1_000_000
    parts = []
    for k in range(HOP_WINDOW_MIN // HOP_STEP_MIN):
        off = k * step_us
        ws = (ts - off) // win_us * win_us + off
        parts.append(
            pa.table(
                {
                    "event_type": et,
                    "window_start": pa.array(ws).cast(pa.timestamp("us")),
                    "cents": cents,
                }
            )
        )
    g = pa.TableGroupBy(
        pa.concat_tables(parts), ["event_type", "window_start"]
    ).aggregate([("cents", "count"), ("cents", "sum")])
    return g.rename_columns(["event_type", "window_start", "n_events", "sum_cents"])


def hopping_counts(ds):
    """Hopping 60-min windows at 30-min steps per event_type:
    (event_type, window_start, n_events, sum_cents); every event is
    counted in exactly window/hop = 2 overlapping windows."""
    from .util import strip_schema_metadata

    partials = ds.map_batches(strip_schema_metadata, batch_format="pyarrow").map_batches(
        _hopping_partial, batch_format="pyarrow"
    )
    final = partials.groupby(["event_type", "window_start"]).sum(
        ["n_events", "sum_cents"]
    )
    return final.map_batches(
        lambda b: pa.table(
            {
                "event_type": b.column("event_type"),
                "window_start": b.column("window_start"),
                "n_events": b.column("sum(n_events)"),
                "sum_cents": b.column("sum(sum_cents)"),
            }
        ),
        batch_format="pyarrow",
    )


ALLOWED_LATENESS_MIN = 10
_WM_BUCKET = 1024  # event_ids per watermark bucket (prefix-scan granule)
_WM_SUPER = 1024  # buckets per super-bucket (driver reduction granule)
_NEG_US = np.int64(np.iinfo(np.int64).min)


def watermark_windowed_counts(
    ds,
    allowed_min: int = ALLOWED_LATENESS_MIN,
    bucket: int = _WM_BUCKET,
    super_factor: int = _WM_SUPER,
    _stats_out: dict | None = None,
):
    """Tumbling counts over ON-TIME events only: streaming watermark
    semantics in batch form.  Arrival order is ``event_id`` (the synthetic
    arrival clock); the watermark when event e arrives is
    ``max(ts of all earlier-arriving events) - allowed``; an event whose
    ts is behind that watermark is LATE and dropped (Flink/Beam
    allowed-lateness semantics; exactly mirrorable in SQL as a running max
    over arrival order).

    Distributed as a HIERARCHICAL prefix max (two levels, like a carry-
    lookahead scan), so driver state is O(n_events / (bucket *
    super_factor)) — ~10^6 rows even at 10^12 events:

    1. per-BUCKET (event_id // B) max-ts: per-batch partials + one tiny
       groupby — a distributed Dataset, never collected.
    2. per-SUPER (bucket // S) max: second tiny groupby; only THESE
       summaries reach the driver, which prefix-maxes them and broadcasts
       the per-super seeds (one small dict via ray.put).
    3. per-bucket exclusive prefix seeds: groupby(super).map_groups over
       the bucket summaries (<= S rows per group), each seeded by its
       super's carry — emitted as SEED ROWS in the event schema
       (event_id = -1) and UNIONed with the events, so the final
       groupby(bucket) delivers each bucket its seed without any driver-
       side join or per-bucket broadcast.
    4. groupby(bucket).map_groups: sort ~B events, running max seeded by
       the bucket's seed row, drop late rows, emit windowed partials.
    """
    import ray

    from .util import strip_schema_metadata

    allowed_us = np.int64(allowed_min * 60 * 1_000_000)
    ev_cols = ["event_id", "ts", "event_type", "value"]

    def _bucketize(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy()
        t = strip_schema_metadata(batch.select(ev_cols))
        t = t.append_column("wm_bucket", pa.array(eid // bucket, pa.int64()))
        return t.append_column(
            "seed_us", pa.array(np.full(len(eid), _NEG_US), pa.int64())
        )

    withb = ds.map_batches(_bucketize, batch_format="pyarrow").materialize()

    def _bucket_max(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch.select(["wm_bucket", "ts"]), ["wm_bucket"]).aggregate(
            [("ts", "max")]
        )
        return g.rename_columns(["wm_bucket", "max_ts"])

    # level 1: per-bucket maxes — a DATASET (n_buckets rows, distributed)
    b1 = (
        withb.map_batches(_bucket_max, batch_format="pyarrow")
        .groupby("wm_bucket")
        .max("max_ts")
        .map_batches(
            lambda b: pa.table(
                {
                    "wm_bucket": b.column("wm_bucket"),
                    "max_us": pa.array(_ts_us(b.column("max(max_ts)")), pa.int64()),
                    "wm_super": pa.array(
                        b.column("wm_bucket").to_numpy() // super_factor, pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    # level 2: ONLY the super summaries reach the driver
    def _super_max(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            batch.select(["wm_super", "max_us"]), ["wm_super"]
        ).aggregate([("max_us", "max")])
        return g.rename_columns(["wm_super", "max_us"])

    supers = (
        b1.map_batches(_super_max, batch_format="pyarrow")
        .groupby("wm_super")
        .max("max_us")
        .to_pandas()  # n_buckets / super_factor rows BY CONSTRUCTION
        .sort_values("wm_super")
    )
    if _stats_out is not None:  # test seam: what the driver actually held
        _stats_out["driver_rows"] = len(supers)
    smax = supers["max(max_us)"].to_numpy()
    sprefix = np.concatenate(([_NEG_US], np.maximum.accumulate(smax)[:-1]))
    super_seed = dict(zip(supers["wm_super"].astype(int), sprefix))
    sseed_ref = ray.put(super_seed)

    # level 3: per-bucket exclusive seeds, computed inside super groups and
    # emitted as event-schema seed rows (event_id = -1)
    def _bucket_seeds(group: pa.Table) -> pa.Table:
        sseed = ray.get(sseed_ref)
        buckets = group.column("wm_bucket").to_numpy()
        max_us = group.column("max_us").to_numpy()
        order = np.argsort(buckets, kind="stable")
        seed0 = sseed[int(group.column("wm_super")[0].as_py())]
        run = np.maximum.accumulate(
            np.concatenate(([seed0], max_us[order]))
        )[:-1]
        n = len(buckets)
        return pa.table(
            {
                "event_id": pa.array(np.full(n, -1, dtype=np.int64)),
                "ts": pa.array(np.zeros(n, dtype="datetime64[us]")),
                "event_type": pa.array([""] * n, pa.string()),
                "value": pa.array(np.zeros(n), pa.float64()),
                "wm_bucket": pa.array(buckets[order], pa.int64()),
                "seed_us": pa.array(run, pa.int64()),
            }
        )

    seeds = b1.groupby("wm_super").map_groups(_bucket_seeds, batch_format="pyarrow")

    def _group(group: pa.Table) -> pa.Table:
        eid = group.column("event_id").to_numpy()
        ts_all = _ts_us(group.column("ts"))
        seed_col = group.column("seed_us").to_numpy()
        is_seed = eid == -1
        seed = int(seed_col[is_seed].max())
        ev = np.nonzero(~is_seed)[0][np.argsort(eid[~is_seed], kind="stable")]
        ts_us = ts_all[ev]
        run = np.maximum.accumulate(np.concatenate(([seed], ts_us)))[:-1]
        kept = ev[ts_us + allowed_us >= run]
        if not len(kept):
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "window_start": pa.array([], pa.timestamp("us")),
                    "n_events": pa.array([], pa.int64()),
                    "sum_cents": pa.array([], pa.int64()),
                }
            )
        sub = group.take(kept)
        t = pa.table(
            {
                "event_type": sub.column("event_type"),
                "window_start": _hour_floor(sub.column("ts")),
                "cents": pa.array(
                    _cents(sub.column("value").to_numpy(zero_copy_only=False))
                ),
            }
        )
        g = pa.TableGroupBy(t, ["event_type", "window_start"]).aggregate(
            [("cents", "count"), ("cents", "sum")]
        )
        return g.rename_columns(
            ["event_type", "window_start", "n_events", "sum_cents"]
        )

    partials = (
        withb.union(seeds)
        .groupby("wm_bucket")
        .map_groups(_group, batch_format="pyarrow")
    )
    final = partials.groupby(["event_type", "window_start"]).sum(["n_events", "sum_cents"])
    return final.map_batches(
        lambda b: pa.table(
            {
                "event_type": b.column("event_type"),
                "window_start": b.column("window_start"),
                "n_events": b.column("sum(n_events)"),
                "sum_cents": b.column("sum(sum_cents)"),
            }
        ),
        batch_format="pyarrow",
    )


def _hll_partial_batch(batch: pa.Table) -> pa.Table:
    """Per-batch HLL registers per (event_type, window): one 4 KB blob per
    group per block rides the shuffle — never the user ids."""
    from .sketch import hll_partial

    ws_us = _ts_us(_hour_floor(batch.column("ts")))
    et = batch.column("event_type").to_numpy(zero_copy_only=False)
    uid = batch.column("user_id").to_numpy().astype(np.int64)
    ets, wss, regs = [], [], []
    for et_val, ws_val, idx in _group_slices(et, ws_us):
        ets.append(et_val)
        wss.append(ws_val)
        regs.append(hll_partial(uid[idx]).tobytes())
    return pa.table(
        {
            "event_type": pa.array(ets, pa.string()),
            "window_start": pa.array(np.array(wss, np.int64)).cast(pa.timestamp("us")),
            "reg": pa.array(regs, pa.binary()),
        }
    )


def hll_distinct_users(ds, max_rel_err: float = 0.05):
    """Distinct users per (event_type, tumbling 1-hour window), computed
    TWICE: exactly (two key-bounded shuffles over (etype, window, user)
    triples) and via the distributed HyperLogLog sketch (ops/sketch.py —
    register blobs merged by groupby().map_groups elementwise max).  The
    HLL estimate is ASSERTED within ``max_rel_err`` of exact per group
    (the recall-gate discipline for approximate operators: a sketch
    regression fails the driver row loudly), then the EXACT counts are
    returned so the COUNT(DISTINCT) oracle stays hash-exact.
    Output (event_type, window_start, n_events=distinct, sum_cents=0)."""
    from .sketch import M, hll_estimate, hll_merge

    def _merge_group(group: pa.Table) -> pa.Table:
        reg = np.zeros(M, np.uint8)
        for blob in group.column("reg").to_pylist():
            reg = hll_merge(reg, np.frombuffer(blob, np.uint8))
        return pa.table(
            {
                "event_type": group.column("event_type").slice(0, 1),
                "window_start": group.column("window_start").slice(0, 1),
                "est": pa.array([hll_estimate(reg)], pa.float64()),
            }
        )

    est = (
        ds.map_batches(_hll_partial_batch, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .map_groups(_merge_group, batch_format="pyarrow")
        .to_pandas()
    )

    def _distinct_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "window_start": _hour_floor(batch.column("ts")),
                "user_id": batch.column("user_id"),
            }
        )
        # aggregate([]) == distinct over the group keys
        return pa.TableGroupBy(t, ["event_type", "window_start", "user_id"]).aggregate([])

    exact = (
        ds.map_batches(_distinct_partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start", "user_id"])
        .count()
        .groupby(["event_type", "window_start"])
        .count()
        .to_pandas()
        .rename(columns={"count()": "n_events"})
    )
    merged = exact.merge(est, on=["event_type", "window_start"], how="left")
    err = (merged["est"] - merged["n_events"]).abs()
    rel = err / merged["n_events"]
    # tiny groups: one register-index collision undercounts by ~1, which
    # is a large RELATIVE error on a 4-user group but expected sketch
    # behavior — gate on (rel <= max_rel_err) OR (abs <= 3)
    bad_mask = (rel > max_rel_err) & (err > 3.0)
    if bool(bad_mask.any()):
        bad = merged.loc[bad_mask.idxmax()]
        raise AssertionError(
            f"HLL distinct regression: rel err {float(rel[bad_mask].max()):.4f} "
            f"> {max_rel_err} (abs > 3) "
            f"at ({bad['event_type']}, {bad['window_start']}): "
            f"est {bad['est']:.1f} vs exact {bad['n_events']}"
        )
    out = exact.copy()
    out["n_events"] = out["n_events"].astype(np.int64)
    out["sum_cents"] = np.int64(0)
    return pa.Table.from_pandas(
        out[["event_type", "window_start", "n_events", "sum_cents"]],
        preserve_index=False,
    ).replace_schema_metadata(None)


def cm_top_events(ds, k: int = 5, eps_factor: float = 2.0):
    """Per-window heavy hitters, CMS-screened (Cormode & Muthukrishnan
    2005): exact per-(event_type, 1h-window) counts (the tumbling-count
    partial+final path) are double-checked against the distributed
    Count-Min sketch — per-batch (CM_D x CM_W) tables merge BY ADDITION
    (the linear-sketch groupby-sum shuffle shape), and every group's
    point estimate must satisfy the one-sided CM guarantee
    ``exact <= est <= exact + eps*N`` (eps = eps_factor/CM_W) or the
    driver row fails loudly.  Returns the EXACT top-k event types per
    window, rank carried in sum_cents — (event_type, window_start,
    n_events, sum_cents=rank)."""
    import pandas as pd

    from .sketch import CM_W, cm_partial, cm_query
    from .util import md5_u64

    def _cm_batch(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "window_start": _hour_floor(batch.column("ts")),
            }
        )
        g = pa.TableGroupBy(t, ["event_type", "window_start"]).aggregate(
            [("event_type", "count")]
        )
        keys = np.array(
            [
                md5_u64(f"{et}|{ws.isoformat()}")
                for et, ws in zip(
                    g.column("event_type").to_pylist(),
                    g.column("window_start").to_pylist(),
                )
            ],
            dtype=np.uint64,
        )
        tab = cm_partial(keys, g.column("event_type_count").to_numpy())
        return pa.table({"tab": pa.array([tab.tobytes()], pa.large_binary())})

    blobs = (
        ds.map_batches(_cm_batch, batch_format="pyarrow")
        .to_pandas()["tab"]
        .tolist()
    )
    tab = np.zeros((4, CM_W), np.int64)
    for b in blobs:
        tab += np.frombuffer(b, np.int64).reshape(4, CM_W)

    exact = windowed_counts(ds).to_pandas()
    keys = np.array(
        [
            md5_u64(f"{et}|{pd.Timestamp(ws).isoformat()}")
            for et, ws in zip(exact["event_type"], exact["window_start"])
        ],
        dtype=np.uint64,
    )
    est = cm_query(tab, keys)
    n_total = int(exact["n_events"].sum())
    eps_n = eps_factor / CM_W * n_total
    # DETERMINISTIC CM property: the estimate can never undercount
    low = est < exact["n_events"].to_numpy()
    # the eps*N overshoot bound is probabilistic PER QUERY (min over d
    # rows); across hundreds of groups rare collisions exceed it, so the
    # gate is aggregate: mean overshoot within eps*N and worst within a
    # 5x envelope (still fails loudly if the sketch breaks)
    over = (est - exact["n_events"].to_numpy()).astype(np.float64)
    if bool(low.any()):
        i = int(np.argmax(low))
        raise AssertionError(
            f"CM undercount (impossible for a correct sketch) at "
            f"({exact['event_type'].iloc[i]}, {exact['window_start'].iloc[i]}): "
            f"est {int(est[i])} vs exact {int(exact['n_events'].iloc[i])}"
        )
    if float(over.mean()) > eps_n or float(over.max()) > 5.0 * max(eps_n, 3.0):
        raise AssertionError(
            f"CM overshoot regression: mean {over.mean():.2f} / max "
            f"{over.max():.0f} vs eps*N = {eps_n:.1f}"
        )
    top = exact.sort_values(
        ["window_start", "n_events", "event_type"],
        ascending=[True, False, True],
    )
    top = top.groupby("window_start", sort=True).head(k).copy()
    top["sum_cents"] = (top.groupby("window_start").cumcount() + 1).astype(np.int64)
    top = top.sort_values(["window_start", "sum_cents"])
    return pa.Table.from_pandas(
        top[["event_type", "window_start", "n_events", "sum_cents"]].reset_index(
            drop=True
        ),
        preserve_index=False,
    ).replace_schema_metadata(None)


# --- KMV bottom-k quantile sketch -------------------------------------------
# Mergeable quantile estimation via the k-minimum-values / bottom-k sample
# (Bar-Yossef et al. 2002's KMV synopsis applied to rank queries): the m
# rows with the SMALLEST md5 hash of their event_id form a uniform sample
# whose q-quantile has rank error O(sqrt(q(1-q)/m)); bottom-m is mergeable
# (bottom-m of a union == bottom-m of merged per-partition bottom-ms), so
# partials ride one small groupby — the 100-TB path never sorts a full
# group.  The hash is the repo's deterministic md5_number_lower kernel, so
# the SAMPLE ITSELF is SQL-reproducible and both arms stay hash-exact
# (DuckDB quantile_disc runs on both sides).  The exact arm sorts whole
# groups (driver-scale verification arm, like the other *_exact twins).

KMV_M = 256
QUANTILE_PCTS = (0.50, 0.95, 0.99)


def _kmv_partial(batch: pa.Table, m: int) -> pa.Table:
    """Per-batch bottom-m rows per (event_type, hour window): columns
    (event_type, window_start, cents, h)."""
    from .dedup import _duck

    sub = batch.select(["event_id", "ts", "event_type", "value"])  # noqa: F841
    return (
        _duck()
        .execute(
            f"""
            select event_type, window_start, cents, h from (
              -- 63-bit mask: Ray's arrow<->pandas groupby round trip
              -- overflows true uint64 (same discipline as the exact-dedup
              -- signatures); the oracle orders by the SAME masked hash
              select event_type, date_trunc('hour', ts) as window_start,
                     floor(value * 100.0 + 0.5)::BIGINT as cents,
                     (md5_number_lower('graft' || cast(event_id as varchar))
                       % 9223372036854775808)::BIGINT as h,
                     row_number() over (
                       partition by event_type, date_trunc('hour', ts)
                       order by (md5_number_lower('graft' || cast(event_id as varchar))
                                 % 9223372036854775808)
                     ) as rn
              from sub
            ) where rn <= {m}
            """
        )
        .arrow()
    )


def _quantile_rows(group: pa.Table, cents: np.ndarray, pcts) -> pa.Table:
    from .dedup import _duck

    vals = pa.table({"c": pa.array(cents, pa.int64())})  # noqa: F841
    qs = ", ".join(f"quantile_disc(c, {q})" for q in pcts)
    row = _duck().execute(f"select {qs} from vals").fetchone()
    et = group.column("event_type")[0].as_py()
    ws = group.column("window_start")[0].as_py()
    ws_type = group.schema.field("window_start").type
    return pa.table(
        {
            "event_type": pa.array([et] * len(pcts), pa.string()),
            "window_start": pa.array([ws] * len(pcts), ws_type),
            "n_events": pa.array([int(q * 100) for q in pcts], pa.int64()),
            "sum_cents": pa.array([int(v) for v in row], pa.int64()),
        }
    )


def value_quantiles(ds, m: int = KMV_M, pcts=QUANTILE_PCTS, rank_eps: float = 0.15):
    """(exact, sample) quantile tables, both (event_type, window_start,
    n_events=pct*100, sum_cents=quantile_cents); asserts the sample
    quantile's TRUE rank is within ``rank_eps`` of its target percentile
    in every group (the bottom-k sketch's accuracy gate — a sampling
    regression fails loudly)."""
    import ray

    def _sample_group(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy(zero_copy_only=False)
        c = group.column("cents").to_numpy()
        order = np.argsort(h, kind="stable")[:m]  # merged bottom-m
        return _quantile_rows(group, c[order], pcts)

    sample = (
        ds.map_batches(_kmv_partial, batch_format="pyarrow", fn_kwargs={"m": m})
        .groupby(["event_type", "window_start"])
        .map_groups(_sample_group, batch_format="pyarrow")
        .to_pandas()
    )

    def _exact_annot(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "window_start": _hour_floor(batch.column("ts")),
                "cents": pa.array(
                    _cents(batch.column("value").to_numpy(zero_copy_only=False))
                ),
            }
        )

    def _exact_group(group: pa.Table) -> pa.Table:
        return _quantile_rows(group, group.column("cents").to_numpy(), pcts)

    annotated = ds.map_batches(_exact_annot, batch_format="pyarrow")
    exact = (
        annotated.groupby(["event_type", "window_start"])
        .map_groups(_exact_group, batch_format="pyarrow")
        .to_pandas()
    )

    # rank gate: count(values <= sample_q) / n within rank_eps of the pct.
    # The sample table is tiny (groups x pcts); broadcast it, one partial
    # counting pass, one small groupby.
    key = {}
    for r in sample.itertuples():
        key[(r.event_type, r.window_start, int(r.n_events))] = int(r.sum_cents)
    q_ref = ray.put(key)

    def _rank_partial(batch: pa.Table) -> pa.Table:
        qmap = ray.get(q_ref)
        ws_us = _ts_us(batch.column("window_start"))
        et_np = batch.column("event_type").to_numpy(zero_copy_only=False)
        cents = batch.column("cents").to_numpy()
        rows = {"event_type": [], "window_start": [], "pct": [], "le": [], "n": []}
        for et, ws_val, idx in _group_slices(et_np, ws_us):
            # hash-compatible with the pandas Timestamps keying qmap
            ws = np.int64(ws_val).astype("datetime64[us]").item()
            c = cents[idx]
            for p in pcts:
                qv = qmap.get((et, ws, int(p * 100)))
                if qv is None:
                    continue
                rows["event_type"].append(et)
                rows["window_start"].append(ws_val)
                rows["pct"].append(int(p * 100))
                rows["le"].append(int((c <= qv).sum()))
                rows["n"].append(len(c))
        return pa.table(
            {
                "event_type": pa.array(rows["event_type"], pa.string()),
                "window_start": pa.array(
                    np.array(rows["window_start"], np.int64)
                ).cast(pa.timestamp("us")),
                "pct": pa.array(rows["pct"], pa.int64()),
                "le": pa.array(rows["le"], pa.int64()),
                "n": pa.array(rows["n"], pa.int64()),
            }
        )

    ranks = (
        annotated.map_batches(_rank_partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start", "pct"])
        .sum(["le", "n"])
        .to_pandas()
    )
    # the gate must actually have checked every (group, pct): a silent
    # key mismatch in _rank_partial (e.g. a timestamp-precision drift
    # across library upgrades) would otherwise make it vacuously pass
    assert len(ranks) == len(sample), (
        f"quantile rank gate covered {len(ranks)} of {len(sample)} rows"
    )
    err = (ranks["sum(le)"] / ranks["sum(n)"]) - ranks["pct"] / 100.0
    # quantile_disc picks an EXISTING element whose rank sits at or above
    # the percentile by up to one position, so small groups (and the
    # m-bounded sample) get the 1/size quantization on top of rank_eps
    allow = rank_eps + 1.0 / np.minimum(ranks["sum(n)"].to_numpy(), m)
    bad = err.abs().to_numpy() > allow
    if bad.any():
        i = int(np.argmax(err.abs().to_numpy() - allow))
        raise AssertionError(
            f"KMV quantile rank error {float(err.abs().iloc[i]):.3f} > "
            f"{float(allow[i]):.3f} at ({ranks['event_type'].iloc[i]}, "
            f"{ranks['window_start'].iloc[i]}, p{ranks['pct'].iloc[i]})"
        )
    return exact, sample
