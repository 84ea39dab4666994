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


def funnel_stages(
    ds: Dataset, user_col: str, ts_col: str, type_col: str,
    steps: Sequence[str],
) -> Dataset:
    """``(user_col, funnel_stage)`` — one row per distinct user, stage
    in ``0..len(steps)``."""
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
                m &= b[user_col].map(prev_t).notna() & (
                    b[ts_col] > b[user_col].map(prev_t))
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
