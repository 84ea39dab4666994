"""Gazetteer mention detection over turn text.

Analog of the reference's anchor extraction + normalization
(``kgdata/wikipedia/datasets/article_links.py:77-105`` +
``norm_mentions.py:48-51``): detect every gazetteer alias occurring in
a turn, on the *normalized* text. The alias-alternation regex is
compiled once per actor (stateful ``__init__``), matching is a
vectorized pandas ``extractall`` per batch.

Scale note: the alternation automaton grows with the gazetteer; beyond
~100k aliases swap the regex for an Aho-Corasick automaton in the same
actor slot — the stage signature does not change.
"""

from __future__ import annotations

import re
from typing import Union

import numpy as np
import pandas as pd
import ray
from ray.data import Dataset

from ..functions.text import normalize_mention, normalize_mention_series

MENTION_COLUMNS = ("conv_id", "turn_idx", "mention_norm")


class DetectMentions:
    def __init__(self, aliases_ref: Union["ray.ObjectRef", list]):
        aliases = (
            ray.get(aliases_ref) if isinstance(aliases_ref, ray.ObjectRef) else aliases_ref
        )
        norm = sorted(
            {normalize_mention(a) for a in aliases if normalize_mention(a)},
            key=lambda s: (-len(s), s),  # longest-match-first alternation
        )
        pattern = r"\b(" + "|".join(re.escape(a) for a in norm) + r")\b"
        self.rx = re.compile(pattern)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text_norm = normalize_mention_series(batch["text"])
        matches = text_norm.str.extractall(self.rx)
        if matches.empty:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype="object"),
                    "turn_idx": pd.Series([], dtype="int32"),
                    "mention_norm": pd.Series([], dtype="object"),
                }
            )
        rows = matches.index.get_level_values(0).to_numpy()
        return pd.DataFrame(
            {
                "conv_id": batch["conv_id"].to_numpy()[rows],
                "turn_idx": batch["turn_idx"].to_numpy()[rows].astype(np.int32),
                "mention_norm": matches[0].to_numpy(),
            }
        )


def detect_mentions(
    ds: Dataset,
    aliases: Union["ray.ObjectRef", list],
    *,
    concurrency=(1, 8),
    batch_size: int = 4096,
) -> Dataset:
    """Turns -> (conv_id, turn_idx, mention_norm), one row per alias
    occurrence in normalized turn text."""
    if not isinstance(aliases, ray.ObjectRef):
        aliases = ray.put(list(aliases))
    return ds.select_columns(["conv_id", "turn_idx", "text"]).map_batches(
        DetectMentions,
        fn_constructor_args=(aliases,),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )
