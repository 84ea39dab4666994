"""Conversation reconstruction: streaming shuffle by ``conv_id`` with
in-group sort by ``turn_idx``.

Analog of the reference's subject-grouping for RDF resources
(``kgdata/wikidata/datasets/triple_truthy_dump.py:88-96``:
``groupBy(subject) → aggregated_triples``). The per-row invariant
(BASELINE.json input_hint) is *per-turn text equality under stable turn
ordering*: after reconstruction, the per-conversation turn sequence is
exactly the oracle's. Global order is never relied upon — only in-group
order (SURVEY §4 "Ordering").
"""

from __future__ import annotations

import pandas as pd
from ray.data import Dataset


def _sort_group(g: pd.DataFrame) -> pd.DataFrame:
    return g.sort_values("turn_idx", kind="mergesort")


def reconstruct_turns(ds: Dataset) -> Dataset:
    """All turn rows, co-located per conversation and sorted by
    ``turn_idx`` within each conversation (hash-shuffle on conv_id)."""
    return ds.groupby("conv_id").map_groups(_sort_group, batch_format="pandas")


def _conv_agg(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values("turn_idx", kind="mergesort")
    return pd.DataFrame(
        {
            "conv_id": [g["conv_id"].iloc[0]],
            "n_turns": [len(g)],
            "first_ts": [g["ts"].min()],
            "last_ts": [g["ts"].max()],
            "dialogue": ["\n".join(g["role"] + ": " + g["text"])],
        }
    )


def conversations(ds: Dataset) -> Dataset:
    """One row per conversation: turn count, time span and the ordered
    dialogue text (role-prefixed, newline-joined)."""
    return ds.groupby("conv_id").map_groups(_conv_agg, batch_format="pandas")
