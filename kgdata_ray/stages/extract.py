"""Per-turn relation-sentence extraction (stateless, vectorized).

Analog of the reference's per-record statement parsers
(``kgdata/wikidata/models/wdentity.py:101-203`` and the N-Triples
regex parser ``kgdata/misc/ntriples_parser.py:120-232``): a pure
per-row transform, expressed here as a pandas ``str.extractall`` over
whole Arrow batches — no Python loop over rows.

Extraction is pure per turn (SURVEY §7.4 determinism): output does not
depend on batch boundaries or row order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from ..patterns import RELATION_PHRASES, SENTENCE_RE

RAW_COLUMNS = ("conv_id", "turn_idx", "subj_raw", "pred", "obj_raw")


def _empty_raw() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": pd.Series([], dtype="object"),
            "turn_idx": pd.Series([], dtype="int32"),
            "subj_raw": pd.Series([], dtype="object"),
            "pred": pd.Series([], dtype="object"),
            "obj_raw": pd.Series([], dtype="object"),
        }
    )


def extract_raw_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """(conv_id, turn_idx, text) batch -> raw triple candidates."""
    matches = batch["text"].str.extractall(SENTENCE_RE)
    if matches.empty:
        return _empty_raw()
    # extractall returns a (row position, match number) MultiIndex; level 0
    # indexes into the batch because map_batches hands us a RangeIndex frame.
    rows = matches.index.get_level_values(0).to_numpy()
    return pd.DataFrame(
        {
            "conv_id": batch["conv_id"].to_numpy()[rows],
            "turn_idx": batch["turn_idx"].to_numpy()[rows].astype(np.int32),
            "subj_raw": matches[0].to_numpy(),
            "pred": matches[1].map(RELATION_PHRASES).to_numpy(),
            "obj_raw": matches[2].to_numpy(),
        }
    )


def extract_raw(ds: Dataset, *, batch_size: int = 8192) -> Dataset:
    """Turns -> raw (conv_id, turn_idx, subj_raw, pred, obj_raw)."""
    return ds.select_columns(["conv_id", "turn_idx", "text"]).map_batches(
        extract_raw_batch, batch_format="pandas", batch_size=batch_size
    )
