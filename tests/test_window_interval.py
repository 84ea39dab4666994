"""Unit tests for the sliding time-window sum and the bucketed range
(interval) join — the two window/range operators Ray Data lacks
(functions/agg.py:sliding_window_sum, functions/joins.py:interval_join).

Both are exercised multi-block with shuffled row order, timestamp ties
(the SQL RANGE-frame peer rule), intervals spanning several buckets,
and keys with no matches.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd


def _events(n: int = 1500, users: int = 30, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ev = pd.DataFrame({
        "user_id": rng.integers(0, users, n),
        "event_id": rng.permutation(n),  # shuffled ids (non-monotone)
        "ts": pd.Timestamp("2024-03-01")
        + pd.to_timedelta(rng.integers(0, 3600 * 48, n), unit="s"),
        "value": rng.random(n).round(3),
    })
    # plant timestamp ties within one user: SQL RANGE frames include
    # ALL ts peers; a positional rolling window would disagree here
    ev.loc[5:25, "user_id"] = 3
    ev.loc[5:25, "ts"] = pd.Timestamp("2024-03-01 07:00:00")
    return ev


def test_sliding_window_sum_matches_sql_range_frame():
    from kgdata_ray.functions.agg import sliding_window_sum

    ev = _events()
    ds = rd.from_pandas(ev).repartition(7)
    out = (
        sliding_window_sum(ds, key="user_id", ts_col="ts",
                           value_col="value", window="1h")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = duckdb.sql("""
        SELECT event_id,
               ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                         AND CURRENT ROW), 4) AS w_sum
        FROM ev ORDER BY event_id
    """).df()
    assert len(out) == len(ev)
    np.testing.assert_array_equal(out["w_sum"].to_numpy(),
                                  ref["w_sum"].to_numpy())


def test_interval_join_matches_pandas_reference():
    from kgdata_ray.functions.joins import interval_join

    ev = _events()
    rng = np.random.default_rng(11)
    iv = pd.DataFrame({
        # users 25..39: some absent from events (no-match keys)
        "user_id": rng.integers(0, 40, 80),
        "iv_id": rng.permutation(80),
    })
    iv["start_ts"] = pd.Timestamp("2024-03-01") + pd.to_timedelta(
        rng.integers(0, 3600 * 40, 80), unit="s")
    # lengths 10 min .. 30 h: spans 1..6+ of the 6h buckets
    iv["end_ts"] = iv["start_ts"] + pd.to_timedelta(
        rng.integers(600, 3600 * 30, 80), unit="s")

    got = interval_join(
        rd.from_pandas(ev).repartition(6),
        rd.from_pandas(iv).repartition(3),
        key="user_id", ts_col="ts",
        start_col="start_ts", end_col="end_ts", bucket="6h",
    ).to_pandas()

    ref = ev.merge(iv, on="user_id")
    ref = ref[(ref.ts >= ref.start_ts) & (ref.ts <= ref.end_ts)]
    assert len(got) == len(ref) > 0
    # each (event, interval) pair appears exactly once despite the
    # interval being present in several buckets
    got_pairs = sorted(zip(got.event_id, got.iv_id))
    ref_pairs = sorted(zip(ref.event_id, ref.iv_id))
    assert got_pairs == ref_pairs
    assert set(got.columns) == {"user_id", "event_id", "ts", "value",
                                "iv_id", "start_ts", "end_ts"}


def test_interval_join_no_matches_is_empty():
    from kgdata_ray.functions.joins import interval_join

    ev = _events(n=200, users=5)
    iv = pd.DataFrame({
        "user_id": [100, 101],  # keys absent from events
        "iv_id": [0, 1],
        "start_ts": pd.to_datetime(["2024-03-01", "2024-03-02"]),
        "end_ts": pd.to_datetime(["2024-03-05", "2024-03-06"]),
    })
    got = interval_join(
        rd.from_pandas(ev).repartition(4),
        rd.from_pandas(iv),
        key="user_id", ts_col="ts",
        start_col="start_ts", end_col="end_ts", bucket="1D",
    )
    assert got.count() == 0


def test_interval_join_broadcast_plan_equals_shuffle():
    from kgdata_ray.functions.joins import interval_join

    ev = _events()
    rng = np.random.default_rng(23)
    iv = pd.DataFrame({
        "user_id": rng.integers(0, 35, 50),
        "iv_id": np.arange(50),
    })
    iv["start_ts"] = pd.Timestamp("2024-03-01") + pd.to_timedelta(
        rng.integers(0, 3600 * 40, 50), unit="s")
    iv["end_ts"] = iv["start_ts"] + pd.to_timedelta(
        rng.integers(600, 3600 * 20, 50), unit="s")
    kw = dict(key="user_id", ts_col="ts",
              start_col="start_ts", end_col="end_ts", bucket="6h")
    l = rd.from_pandas(ev).repartition(5)
    r = rd.from_pandas(iv).repartition(2)
    a = interval_join(l, r, **kw).to_pandas()
    b = interval_join(l, r, plan="broadcast", **kw).to_pandas()
    key = lambda d: sorted(zip(d.event_id, d.iv_id))
    assert key(a) == key(b)
    assert len(a) > 0
    assert sorted(a.columns) == sorted(b.columns)
