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


def merge_upserts(
    base, updates, key: str, *,
    version_col: str = "_version", tombstone_col: str = "_deleted",
):
    """CDC merge (SQL MERGE INTO / Delta-style upsert): union ``base``
    and ``updates`` (identical schemas incl. the two meta columns;
    higher ``version_col`` = newer), keep the latest version per key,
    drop keys whose winner is tombstoned, strip the meta columns — the
    dataset-versioning analog of the reference's patch application
    (``Modification.apply``), but distributed: one grouped shuffle on
    the key, everything else streams."""
    import pandas as pd
    import pyarrow as pa

    from .agg import latest_wins

    merged = base.union(updates)
    won = latest_wins(merged, key, version_col)

    def strip(b: pd.DataFrame) -> pa.Table:
        live = b[~b[tombstone_col].astype(bool)]
        return pa.Table.from_pandas(
            live.drop(columns=[version_col, tombstone_col]),
            preserve_index=False)

    return won.map_batches(strip, batch_format="pandas")
