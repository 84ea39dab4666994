"""Manual-correction patches (reference ``kgdata/misc/modification.py``,
wired at ``classes.py:61-72`` / ``properties.py:76-87``): a small patch
table applied driver-side to a dimension table before it is broadcast.

Patch ops over the gazetteer (or any keyed table):
  - ``add``:    append the row
  - ``remove``: drop rows matching (entity_id, alias)
  - ``set_freq``: override freq_global for matching rows
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def apply_gazetteer_patches(gazetteer: pa.Table, patches: pa.Table) -> pa.Table:
    """patches schema: (op, entity_id, alias, freq_global:int64|null).
    Applied in row order — later patches win."""
    df = gazetteer.to_pandas()
    for p in patches.to_pylist():
        op = p["op"]
        if op == "add":
            df = pd.concat(
                [df, pd.DataFrame([{
                    "entity_id": p["entity_id"], "alias": p["alias"],
                    "freq_global": int(p.get("freq_global") or 1),
                    "freq_doc": int(p.get("freq_global") or 1) // 2 + 1,
                }])],
                ignore_index=True,
            )
        elif op == "remove":
            df = df[~((df["entity_id"] == p["entity_id"])
                      & (df["alias"] == p["alias"]))]
        elif op == "set_freq":
            m = (df["entity_id"] == p["entity_id"]) & (df["alias"] == p["alias"])
            df.loc[m, "freq_global"] = int(p["freq_global"])
        else:
            raise ValueError(f"unknown patch op: {op!r}")
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)
