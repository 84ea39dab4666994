"""Join strategies re-expressing the reference's join surface
(SURVEY §2.5) on Ray Data:

  1. hash equi-join            -> :func:`equi_join` (Dataset.join)
  2. salted skew join          -> :func:`salted_join`
     (``kgdata/spark/common.py:205-304`` ``join_repartition``: detect
     keys hotter than a threshold, salt them into sub-keys — replicate
     build side, randomize probe side — then equi-join and drop salt)
  3. broadcast small side      -> :func:`broadcast_join`
     (``kgdata/spark/common.py:393-449`` ``left_outer_join_broadcast``)
  4. anti join                 -> :func:`anti_join` (``subtract`` uses,
     ``kgdata/wikidata/datasets/entities.py:91-103``)
  5. semi join                 -> :func:`semi_join` (broadcast key set,
     ``classes.py:50-53``)
  6. FK-explode join           -> :func:`fk_explode_join`
     (``kgdata/spark/common.py:307-390`` list-valued foreign keys)
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset


def equi_join(
    left: Dataset,
    right: Dataset,
    on: str,
    *,
    how: str = "inner",
    right_on: Optional[str] = None,
    num_partitions: int = 8,
) -> Dataset:
    """Plain hash-shuffle equi-join on one key."""
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,) if right_on else None,
    )


# --------------------------------------------------------------------------
# Broadcast join


class _BroadcastJoiner:
    def __init__(self, table_ref, on: str, right_on: str, how: str):
        table = ray.get(table_ref) if isinstance(table_ref, ray.ObjectRef) else table_ref
        if isinstance(table, pa.Table):
            table = table.to_pandas()
        self.small = table.rename(columns={right_on: on}) if right_on != on else table
        self.on = on
        self.how = how

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(self.small, on=self.on, how=self.how, sort=False)


def broadcast_join(
    left: Dataset,
    small: Union[pd.DataFrame, pa.Table, "ray.ObjectRef"],
    on: str,
    *,
    how: str = "left",
    right_on: Optional[str] = None,
    concurrency=(1, 8),
    batch_size: int = 16384,
) -> Dataset:
    """Map-side join: the small side lives in the object store once
    (``ray.put``) and each actor merges per batch — no shuffle.

    ``how``: "left" or "inner" (pandas merge semantics per batch; the
    small side must have unique keys for row-count stability).
    """
    if not isinstance(small, ray.ObjectRef):
        small = ray.put(small)
    return left.map_batches(
        _BroadcastJoiner,
        fn_constructor_args=(small, on, right_on or on, how),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


# --------------------------------------------------------------------------
# Salted skew join


def hot_keys(ds: Dataset, on: str, threshold: int) -> dict:
    """Pre-pass frequency count; returns {key: count} for keys with
    count > threshold (reference threshold: 10 000)."""
    from .blocks import rename_cols

    counts = rename_cols(ds.groupby(on).count(), {"count()": "__cnt"})
    hot = counts.filter(expr=f"__cnt > {threshold}")
    out = {}
    for row in hot.iter_rows():
        out[row[on]] = row["__cnt"]
    return out


class _AddProbeSalt:
    """Probe side: hot keys get a deterministic per-row salt in
    [0, ceil(freq/batch)); cold keys get salt 0."""

    def __init__(self, hot_ref, on: str, batch: int):
        hot = ray.get(hot_ref) if isinstance(hot_ref, ray.ObjectRef) else hot_ref
        self.shards = {k: -(-v // batch) for k, v in hot.items()}
        self.on = on

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        n = b[self.on].map(self.shards).fillna(1).astype("int64")
        # deterministic spread: row position within batch modulo shard count
        b["__salt"] = (np.arange(len(b)) % n.to_numpy()).astype("int64")
        return b


class _ExplodeBuildSalt:
    """Build side: replicate each hot-key row once per salt shard."""

    def __init__(self, hot_ref, on: str, batch: int):
        hot = ray.get(hot_ref) if isinstance(hot_ref, ray.ObjectRef) else hot_ref
        self.shards = {k: -(-v // batch) for k, v in hot.items()}
        self.on = on

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        n = b[self.on].map(self.shards).fillna(1).astype("int64").to_numpy()
        idx = np.repeat(np.arange(len(b)), n)
        out = b.iloc[idx].reset_index(drop=True)
        salts = np.concatenate([np.arange(k) for k in n]) if len(b) else np.array([], dtype="int64")
        out["__salt"] = salts.astype("int64")
        # rename in-batch: Dataset.rename_columns after a pandas-block
        # stage trips on non-Arrow blocks in Ray 2.49
        return out.rename(columns={self.on: f"{self.on}__r"})


def salted_join(
    left: Dataset,
    right: Dataset,
    on: str,
    *,
    how: str = "inner",
    hot_threshold: int = 10_000,
    salt_batch: int = 1_000,
    num_partitions: int = 8,
    precomputed_hot: Optional[dict] = None,
) -> Dataset:
    """Skew-aware equi-join: keys hotter than ``hot_threshold`` on the
    probe (left) side are split into ``ceil(freq/salt_batch)`` sub-keys;
    the build (right) side rows for those keys are replicated per
    sub-key. Semantics identical to :func:`equi_join`; right side must
    be the smaller / build side.
    """
    hot = precomputed_hot if precomputed_hot is not None else hot_keys(left, on, hot_threshold)
    if not hot:
        return equi_join(left, right, on, how=how, num_partitions=num_partitions)
    hot_ref = ray.put(hot)
    lp = left.map_batches(
        _AddProbeSalt, fn_constructor_args=(hot_ref, on, salt_batch),
        batch_format="pandas", concurrency=(1, 8), num_cpus=0.5,
    )
    rp = right.map_batches(
        _ExplodeBuildSalt, fn_constructor_args=(hot_ref, on, salt_batch),
        batch_format="pandas", concurrency=(1, 8), num_cpus=0.5,
    )
    joined = lp.join(
        rp,
        join_type=how,
        num_partitions=num_partitions,
        on=(on, "__salt"),
        right_on=(f"{on}__r", "__salt"),
    )
    drop = ["__salt", f"{on}__r"]
    return joined.drop_columns([c for c in drop if c in joined.schema().names])


# --------------------------------------------------------------------------
# Semi / anti joins via broadcast key set


class _KeySetFilter:
    def __init__(self, keys_ref, on: str, keep_in: bool):
        keys = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
        self.keys = set(keys)
        self.on = on
        self.keep_in = keep_in

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        mask = b[self.on].isin(self.keys)
        return b[mask] if self.keep_in else b[~mask]


def _key_set(right: Dataset, key: str) -> set:
    return set(right.unique(key))


def semi_join(left: Dataset, right: Dataset, on: str, *, right_on: Optional[str] = None) -> Dataset:
    """Rows of ``left`` whose key appears in ``right`` (broadcast set
    membership — no shuffle of the big side)."""
    keys = _key_set(right, right_on or on)
    ref = ray.put(keys)
    return left.map_batches(
        _KeySetFilter, fn_constructor_args=(ref, on, True),
        batch_format="pandas", concurrency=(1, 8), num_cpus=0.5,
    )


def anti_join(left: Dataset, right: Dataset, on: str, *, right_on: Optional[str] = None) -> Dataset:
    """Rows of ``left`` whose key does NOT appear in ``right``
    (reference ``subtract``; dangling/unknown-id computations)."""
    keys = _key_set(right, right_on or on)
    ref = ray.put(keys)
    return left.map_batches(
        _KeySetFilter, fn_constructor_args=(ref, on, False),
        batch_format="pandas", concurrency=(1, 8), num_cpus=0.5,
    )


# --------------------------------------------------------------------------
# FK-explode join: left rows carry a LIST of foreign keys


def fk_explode_join(
    left: Dataset,
    right: Dataset,
    *,
    fk_col: str,
    id_col: str,
    right_key: str,
    num_partitions: int = 8,
) -> Dataset:
    """Explode ``fk_col`` (list column) of ``left`` to one row per
    (id, fk), equi-join each fk against ``right``, return the exploded
    join (callers regroup by ``id_col`` as needed). Reference:
    ``left_outer_join`` over list-valued foreign keys,
    ``kgdata/spark/common.py:307-390``."""

    def _explode(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[id_col, fk_col]].explode(fk_col, ignore_index=True)
        out = out[out[fk_col].notna()]
        return out.rename(columns={fk_col: "__fk"})

    exploded = left.map_batches(_explode, batch_format="pandas")
    return exploded.join(
        right,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("__fk",),
        right_on=(right_key,),
    ).rename_columns({"__fk": fk_col})
