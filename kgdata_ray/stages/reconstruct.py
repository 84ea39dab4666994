"""Conversation reconstruction: streaming shuffle by ``conv_id`` with
in-group ordering by ``turn_idx``.

Analog of the reference's subject-grouping for RDF resources
(``kgdata/wikidata/datasets/triple_truthy_dump.py:88-96``:
``groupBy(subject) → aggregated_triples``). The per-row invariant
(BASELINE.json input_hint) is *per-turn text equality under stable turn
ordering*: after reconstruction, the per-conversation turn sequence is
exactly the oracle's. Global order is never relied upon — only in-group
order (SURVEY §4 "Ordering").

Physical plan: one range-partition sort on ``(conv_id, turn_idx)``.
Ray's sort both co-locates and orders; no per-group Python is needed.
The ``conversations`` rollup sorts by ``conv_id`` only (so a whole
conversation is guaranteed inside one block) and aggregates each block
with a single vectorized pandas groupby.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from ..functions.agg import grouped_blockwise


def reconstruct_turns(ds: Dataset) -> Dataset:
    """All turn rows ordered by (conv_id, turn_idx) — conversations
    co-located and internally ordered after one sort shuffle."""
    return ds.sort(["conv_id", "turn_idx"])


def _conv_block(b: pd.DataFrame) -> pa.Table:
    b = b.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    line = b["role"] + ": " + b["text"]
    g = b.assign(line=line).groupby("conv_id", sort=False)
    out = pd.DataFrame(
        {
            "n_turns": g.size(),
            "first_ts": g["ts"].min(),
            "last_ts": g["ts"].max(),
            "dialogue": g["line"].agg("\n".join),
        }
    ).reset_index()
    return pa.Table.from_pandas(out, preserve_index=False)


def conversations(ds: Dataset) -> Dataset:
    """One row per conversation: turn count, time span and the ordered
    dialogue text (role-prefixed, newline-joined)."""
    return grouped_blockwise(ds, ["conv_id"], _conv_block)
