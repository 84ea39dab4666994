"""Content hashing, commutative dataset checksums and dataset diffing.

  - :func:`add_row_hash`          vectorized per-row content hash column
  - :func:`commutative_checksum`  order-independent dataset digest:
        sha256 per row, summed mod 2^256 (reference fold-based hash,
        ``kgdata/spark/extended_rdd.py:391-414``) — equal datasets give
        equal checksums under any partitioning/ordering
  - :func:`diff_datasets`         full-outer diff on (key, row hash)
        (reference ``diff_rdd``, ``kgdata/spark/common.py:602-640``)
"""

from __future__ import annotations

import hashlib
from typing import Optional, Sequence

import pandas as pd
from ray.data import Dataset

from .joins import resolve_join_partitions

_MOD = 1 << 256


def _row_strings(df: pd.DataFrame, cols: Sequence[str]) -> pd.Series:
    s = df[cols[0]].astype(str)
    for c in cols[1:]:
        s = s + "\x1f" + df[c].astype(str)
    return s


def add_row_hash(ds: Dataset, cols: Sequence[str], *, out_col: str = "row_hash") -> Dataset:
    """sha256 hex digest of the tab-joined string repr of ``cols``."""
    cols = list(cols)

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        b[out_col] = [
            hashlib.sha256(x.encode()).hexdigest()
            for x in _row_strings(b, cols)
        ]
        return b

    return ds.map_batches(fn, batch_format="pandas")


def commutative_checksum(ds: Dataset, cols: Optional[Sequence[str]] = None) -> int:
    """Order/partitioning-independent digest: per-block partial sums of
    per-row sha256 ints, reduced mod 2^256. The per-block partial is a
    single integer, so the driver reduce is O(#blocks)."""
    if cols is None:
        cols = ds.schema().names
    cols = list(cols)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        total = 0
        for x in _row_strings(b, cols):
            total = (total + int.from_bytes(
                hashlib.sha256(x.encode()).digest(), "big")) % _MOD
        return pd.DataFrame({"partial": [str(total)]})

    parts = ds.map_batches(partial, batch_format="pandas").take_all()
    return sum(int(p["partial"]) for p in parts) % _MOD


def diff_datasets(
    a: Dataset, b: Dataset, key: str, *, num_partitions: Optional[int] = None
) -> Dataset:
    """Rows differing between two datasets, keyed by ``key``: output
    (key, status) with status in {left_only, right_only, changed}."""
    num_partitions = resolve_join_partitions(num_partitions)
    cols_a = [c for c in a.schema().names]
    cols_b = [c for c in b.schema().names]

    def _hashed(cols, key_out, hash_out):
        def fn(df: pd.DataFrame) -> "pa.Table":
            import pyarrow as pa

            out = pd.DataFrame(
                {
                    key_out: df[key],
                    hash_out: [
                        hashlib.sha256(x.encode()).hexdigest()
                        for x in _row_strings(df, cols)
                    ],
                }
            )
            return pa.Table.from_pandas(out, preserve_index=False)

        return fn

    ha = a.map_batches(_hashed(cols_a, key, "row_hash"), batch_format="pandas")
    hb = b.map_batches(
        _hashed(cols_b, f"{key}_r", "row_hash_r"), batch_format="pandas"
    )
    j = ha.join(
        hb, join_type="full_outer", num_partitions=num_partitions,
        on=(key,), right_on=(f"{key}_r",),
    )

    def classify(d: pd.DataFrame) -> pd.DataFrame:
        left_key = d[key] if key in d else None
        status = pd.Series(["changed"] * len(d), index=d.index, dtype="object")
        status[d["row_hash"].isna()] = "right_only"
        status[d["row_hash_r"].isna()] = "left_only"
        keys = left_key.where(left_key.notna(), d[f"{key}_r"]) if f"{key}_r" in d else left_key
        out = pd.DataFrame({key: keys, "status": status})
        return out[d["row_hash"].isna() | d["row_hash_r"].isna()
                   | (d["row_hash"] != d["row_hash_r"])]

    return j.map_batches(classify, batch_format="pandas")
