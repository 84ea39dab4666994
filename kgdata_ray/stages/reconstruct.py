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
    dialogue text (role-prefixed, newline-joined). Each conversation is
    aggregated inside one block; for corpora where a single conversation
    can exceed a block, use :func:`conversations_salted`."""
    return grouped_blockwise(ds, ["conv_id"], _conv_block)


def conversations_salted(ds: Dataset, *, turns_per_salt: int = 10_000) -> Dataset:
    """Two-level rollup for oversized-conversation skew (reference
    recipe: fixed-size group splitting with remerge,
    ``kgdata/dbpedia/datasets/entity_all_types.py:87-142``).

    Level 1 groups by ``(conv_id, salt)`` where ``salt = turn_idx //
    turns_per_salt`` — every salt covers a contiguous turn range, so
    partials carry (count, min/max ts, ordered partial dialogue).
    Level 2 merges the per-conversation partials in salt order. No
    group at either level exceeds ``turns_per_salt`` rows /
    #salts-per-conv rows, so a 10^7-turn conversation never has to fit
    in one block. Output is identical to :func:`conversations`
    (tested).
    """

    def partial_block(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        line = b["role"] + ": " + b["text"]
        g = b.assign(line=line).groupby(["conv_id", "salt"], sort=False)
        out = pd.DataFrame(
            {
                "n_turns": g.size(),
                "first_ts": g["ts"].min(),
                "last_ts": g["ts"].max(),
                "dialogue": g["line"].agg("\n".join),
            }
        ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    def merge_block(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values(["conv_id", "salt"], kind="mergesort")
        g = b.groupby("conv_id", sort=False)
        out = pd.DataFrame(
            {
                "n_turns": g["n_turns"].sum(),
                "first_ts": g["first_ts"].min(),
                "last_ts": g["last_ts"].max(),
                "dialogue": g["dialogue"].agg("\n".join),
            }
        ).reset_index()
        out["n_turns"] = out["n_turns"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    def add_salt(b: pd.DataFrame) -> pd.DataFrame:
        b["salt"] = (b["turn_idx"] // turns_per_salt).astype("int64")
        return b

    salted = ds.map_batches(add_salt, batch_format="pandas")
    partials = grouped_blockwise(salted, ["conv_id", "salt"], partial_block)
    return grouped_blockwise(partials, ["conv_id"], merge_block)
