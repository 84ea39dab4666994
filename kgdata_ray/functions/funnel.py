"""Ordered-funnel analysis over an event log.

For an ordered list of step event types (e.g. view → click →
purchase), compute per user the furthest step reached, where step
``i+1`` must occur STRICTLY AFTER the first qualifying occurrence of
step ``i`` (classic product-analytics funnel; the reference's
``sessionize``-style event pipelines are the nearest analog —
per-user grouped scans over a sorted event stream).

Semantics (ties excluded on purpose so SQL and engine agree exactly):
``t1 = min ts of step1``; ``t_{i+1} = min ts of step_{i+1} with
ts > t_i``; ``funnel_stage = #defined t_i``. One range shuffle on the
user key; the per-block computation is vectorized masked groupby-mins
(no per-user Python loop).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from .joins import default_join_partitions


def funnel_stages(
    ds: Dataset, user_col: str, ts_col: str, type_col: str,
    steps: Sequence[str], *, max_gap=None,
) -> Dataset:
    """``(user_col, funnel_stage)`` — one row per distinct user, stage
    in ``0..len(steps)``. With ``max_gap`` (a ``pd.Timedelta``), each
    step must also land within that window of the previous step's
    timestamp (conversion-window semantics: ``t_prev < t <=
    t_prev + max_gap``)."""
    from .agg import grouped_blockwise

    steps = list(steps)

    def block(b: pd.DataFrame) -> pa.Table:
        users = b[[user_col]].drop_duplicates().reset_index(drop=True)
        stage = pd.Series(0, index=users[user_col], dtype="int64")
        # prev_t: per-user timestamp of the previous completed step
        # (NaT = user fell out of the funnel at an earlier step).
        prev_t = pd.Series(pd.NaT, index=users[user_col])
        first = True
        for s in steps:
            m = b[type_col] == s
            if not first:
                prev = b[user_col].map(prev_t)
                m &= prev.notna() & (b[ts_col] > prev)
                if max_gap is not None:
                    m &= b[ts_col] <= prev + max_gap
            t = b[m].groupby(user_col)[ts_col].min()
            reached = users[user_col].map(t)
            stage = stage.where(
                reached.isna().to_numpy(), stage + 1)
            prev_t = pd.Series(reached.to_numpy(),
                               index=users[user_col])
            first = False
        return pa.table({
            user_col: pa.array(users[user_col].to_numpy()),
            "funnel_stage": pa.array(stage.to_numpy(), pa.int64()),
        })

    return grouped_blockwise(ds, [user_col], block)


def transition_counts(
    ds: Dataset, user_col: str, ts_col: str, type_col: str,
    tiebreak: str,
) -> Dataset:
    """First-order Markov transition counts over per-user event
    sequences: ``(cur_type, next_type, n)`` where next is the
    immediately following event in (ts, tiebreak) order — the
    sequence-analytics sibling of :func:`funnel_stages`. One range
    shuffle on the user key; pair extraction is a vectorized grouped
    shift; counts are map-side combined."""
    from .agg import grouped_blockwise, partial_group_count

    def block(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values([user_col, ts_col, tiebreak],
                          kind="mergesort")
        nxt = b.groupby(user_col, sort=False)[type_col].shift(-1)
        keep = nxt.notna()
        out = pd.DataFrame({"cur_type": b.loc[keep, type_col],
                            "next_type": nxt[keep]})
        return pa.Table.from_pandas(out, preserve_index=False)

    pairs = grouped_blockwise(ds, [user_col], block)
    return partial_group_count(pairs, ["cur_type", "next_type"],
                               count_name="n")


def retention_cohorts(
    ds: Dataset, user_col: str, ts_col: str, type_col: str,
    signup_type: str,
) -> Dataset:
    """Weekly retention-cohort matrix: users grouped by the week of
    their first ``signup_type`` event, counted in every week (>= the
    cohort week) in which they had ANY event —
    ``(cohort_week, active_week, n_users)``. Weeks are Monday-start
    (SQL ``date_trunc('week', ...)``); timestamps stay microsecond
    precision for dtype-exact engine/oracle parity. Plan: per-user
    first-signup grouped min, distinct (user, week) activity, one
    hash join, map-side-combined counts — the joined rows are unique
    per (user, active_week), so plain counts ARE distinct-user counts.
    """
    from .agg import distinct_rows, grouped_blockwise, \
        partial_group_count
    from .blocks import scrub_empty_blocks

    def week(s: pd.Series) -> pd.Series:
        return (s.dt.to_period("W-SUN").dt.start_time
                .astype("datetime64[us]"))

    def first_signup(b: pd.DataFrame) -> pa.Table:
        su = b[b[type_col] == signup_type]
        out = su.groupby(user_col, as_index=False)[ts_col].min()
        out["cohort_week"] = week(out[ts_col])
        return pa.Table.from_pandas(out[[user_col, "cohort_week"]],
                                    preserve_index=False)

    cohorts = grouped_blockwise(
        ds.select_columns([user_col, ts_col, type_col]),
        [user_col], first_signup)

    def activity(b: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({user_col: b[user_col],
                            "active_week": week(b[ts_col])})
        return pa.Table.from_pandas(out.drop_duplicates(),
                                    preserve_index=False)

    weeks = distinct_rows(
        ds.select_columns([user_col, ts_col]).map_batches(
            activity, batch_format="pandas"),
        [user_col, "active_week"])

    from .blocks import rename_cols

    j = scrub_empty_blocks(cohorts).join(
        rename_cols(scrub_empty_blocks(weeks), {user_col: "u2"}),
        join_type="inner", num_partitions=default_join_partitions(),
        on=(user_col,), right_on=("u2",))

    def retained(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["active_week"] >= b["cohort_week"],
                     ["cohort_week", "active_week"]]

    kept = scrub_empty_blocks(j).map_batches(retained,
                                             batch_format="pandas")
    return partial_group_count(kept, ["cohort_week", "active_week"],
                               count_name="n_users")


def event_gap_stats(
    ds: Dataset, user_col: str, ts_col: str, tiebreak: str,
) -> Dataset:
    """Per-user inter-event-time statistics over the (ts, tiebreak)
    order: ``(user, n_gaps, mean_gap_us, median_gap_us)``. Gaps are
    exact int64 microseconds, the mean is one double division of exact
    int sums and the median is the DuckDB-semantics discrete order
    statistic (element at ceil(n/2)-1) — all bit-identical to any SQL
    engine. One range shuffle on the user key."""
    import numpy as np

    from .agg import grouped_blockwise

    def block(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values([user_col, ts_col, tiebreak],
                          kind="mergesort")
        us = b[user_col].to_numpy()
        ts = b[ts_col].to_numpy().astype("datetime64[us]").astype(
            "int64")
        gap = ts[1:] - ts[:-1]
        same = us[1:] == us[:-1]
        gu, gv = us[1:][same], gap[same]
        out_u, out_n, out_m, out_md = [], [], [], []
        change = np.flatnonzero(gu[1:] != gu[:-1]) + 1 if gu.size else \
            np.array([], dtype=np.int64)
        starts = np.concatenate(([0], change)) if gu.size else change
        ends = np.concatenate((change, [gu.size])) if gu.size else change
        for s, e in zip(starts, ends):
            g = np.sort(gv[s:e])
            n = e - s
            out_u.append(gu[s])
            out_n.append(n)
            out_m.append(float(g.sum()) / n)
            out_md.append(g[max(int(np.ceil(n / 2)) - 1, 0)])
        return pa.table({
            user_col: pa.array(np.array(out_u)),
            "n_gaps": pa.array(np.array(out_n, dtype=np.int64)),
            "mean_gap_us": pa.array(np.array(out_m, dtype=np.float64)),
            "median_gap_us": pa.array(
                np.array(out_md, dtype=np.int64)),
        })

    return grouped_blockwise(ds, [user_col], block)
