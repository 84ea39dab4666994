"""Grouped-aggregate primitives (SURVEY §2.1 / §2.4 / §2.7):

  - :func:`group_top_k`      per-group top-k with pinned tie-breaks
                             (``mention_to_entities.py:59-62``)
  - :func:`latest_wins`      keep the max-timestamp row per key
                             (``html_articles.py:66-81`` two-pass dedup)
  - :func:`distinct_rows`    exact multi-column distinct
  - :func:`count_zero_fill`  counts left-joined onto a domain with 0 fill
                             (``class_count.py:13-51``)
  - :func:`dict_merge_aggregate`  dict-sum monoid reduceByKey
                             (``property_domains.py:11-72``)
  - :func:`partial_group_count`   map-side pre-aggregation before the
                             global groupby (combiner; shuffle shrinker)
  - :func:`zip_with_index`   global consecutive ids after a sort
                             (``extended_rdd.py:692-693``)
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset
from ray.data.aggregate import AggregateFn


def grouped_blockwise(
    ds: Dataset,
    keys: Sequence[str],
    block_fn,
    *,
    check_boundaries: bool = True,
) -> Dataset:
    """Shuffle by ``keys`` and apply ``block_fn`` once per whole block.

    Ray's range-partitioning sort places all rows with equal key tuples
    in a single block (partition boundaries fall between distinct key
    values), so a vectorized pandas groupby inside ``block_fn`` sees
    every group in full. This replaces ``groupby().map_groups(...)``,
    which re-invokes the UDF once per group (catastrophic for millions
    of small groups — e.g. per-conversation or per-mention groups).

    That placement is a Ray implementation property, not a documented
    contract — if a sorted partition were ever split mid-key (group
    bigger than the target block size, or a future Ray change), every
    grouped operator built on this helper would silently corrupt. So by
    default (``check_boundaries=True``) the sort output is materialized
    (the sort is a full barrier anyway — this adds no extra shuffle)
    and per-block first/last key tuples are fetched with one tiny task
    per block; any adjacent blocks sharing a key tuple are merged
    before ``block_fn`` runs. The check moves only 2 key tuples per
    block to the driver, never rows.

    ``block_fn`` must do its own within-block ordering (sort only by
    ``keys`` here; secondary sort keys would split groups across range
    boundaries).
    """
    keys = list(keys)
    sorted_ds = ds.sort(keys)
    if check_boundaries:
        sorted_ds = _merge_key_straddling_blocks(sorted_ds.materialize(), keys)
    return sorted_ds.map_batches(
        block_fn, batch_size=None, batch_format="pandas"
    )


def _merge_key_straddling_blocks(sorted_ds: Dataset, keys: list[str]) -> Dataset:
    """Guard for the sort-block invariant: fetch (first, last) key tuple
    of every sorted block, then concat any run of adjacent blocks that
    share a boundary key into a single block. Almost always a no-op; a
    merge only fires when one key's group outgrew a block."""
    import ray.data as rd

    refs = sorted_ds.to_arrow_refs()
    if not refs:
        return sorted_ds

    @ray.remote
    def _bounds(t: pa.Table):
        if t.num_rows == 0:
            return None
        sel = t.select(keys)
        first = tuple(sel.column(i)[0].as_py() for i in range(len(keys)))
        last = tuple(sel.column(i)[-1].as_py() for i in range(len(keys)))
        return first, last

    @ray.remote
    def _concat(*tables: pa.Table) -> pa.Table:
        return pa.concat_tables(tables).combine_chunks()

    bounds = ray.get([_bounds.remote(r) for r in refs])
    nonempty = [(i, b[0], b[1]) for i, b in enumerate(bounds) if b is not None]
    if not nonempty:
        return sorted_ds
    runs: list[list[int]] = []  # groups of block indices to merge
    prev_last = None
    for i, first, last in nonempty:
        if runs and first == prev_last:
            runs[-1].append(i)
        else:
            runs.append([i])
        prev_last = last

    if all(len(r) == 1 for r in runs) and len(nonempty) == len(refs):
        return sorted_ds  # no straddle, no empty blocks: keep as-is
    out_refs = [
        refs[r[0]] if len(r) == 1 else _concat.remote(*[refs[i] for i in r])
        for r in runs
    ]
    return rd.from_arrow_refs(out_refs)


def group_top_k(
    ds: Dataset,
    key: str | Sequence[str],
    *,
    sort_cols: Sequence[str],
    ascending: Sequence[bool],
    k: int,
) -> Dataset:
    """Top-k rows per group; ``sort_cols``/``ascending`` must define a
    total order (pin ties!) for determinism."""
    keys = [key] if isinstance(key, str) else list(key)
    sc, asc = list(sort_cols), list(ascending)

    def block(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(sc, ascending=asc, kind="mergesort")
        return b.groupby(keys, sort=False, dropna=False).head(k)

    return grouped_blockwise(ds, keys, block)


def latest_wins(
    ds: Dataset, key: str | Sequence[str], ts_col: str,
    *, tie_cols: Optional[Sequence[str]] = None,
) -> Dataset:
    """One row per key: max ``ts_col`` (ties broken by ``tie_cols``
    ascending, then stable input order)."""
    sc = [ts_col] + list(tie_cols or [])
    asc = [False] + [True] * len(tie_cols or [])
    return group_top_k(
        ds, key, sort_cols=sc, ascending=asc, k=1
    )


def distinct_rows(ds: Dataset, cols: Sequence[str]) -> Dataset:
    """Exact distinct over ``cols``. Per-block pre-dedup shrinks the
    shuffle; the post-shuffle dedup is one vectorized pass per block."""
    cols = list(cols)

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        return b[cols].drop_duplicates()

    def block(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(cols)

    pruned = ds.map_batches(pre, batch_format="pandas")
    return grouped_blockwise(pruned, cols, block)


def partial_group_count(ds: Dataset, key: str | Sequence[str],
                        *, count_name: str = "n") -> Dataset:
    """Grouped row count with map-side combining: count per block first
    (one row per key per block), then sum the partials — the shuffle
    moves keys, not rows."""
    keys = [key] if isinstance(key, str) else list(key)

    def pre(b: pd.DataFrame) -> pa.Table:
        out = b.groupby(keys, sort=False, dropna=False).size().reset_index(name=count_name)
        # Arrow out: empty Arrow blocks keep their schema (empty pandas
        # blocks do not, and break downstream Arrow joins)
        return pa.Table.from_pandas(out, preserve_index=False)

    def final(b: pd.DataFrame) -> pa.Table:
        out = (
            b.groupby(keys, sort=False, dropna=False)[count_name]
            .sum()
            .reset_index()
        )
        out[count_name] = out[count_name].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    partial = ds.map_batches(pre, batch_format="pandas")
    grouped = grouped_blockwise(partial, keys, final)
    # drop the schema-less empty blocks the sort shuffle leaves behind
    # (they crash Arrow joins downstream; see functions.blocks)
    from .blocks import scrub_empty_blocks

    return scrub_empty_blocks(grouped)


def count_zero_fill(
    ds: Dataset, key: str, domain: Dataset, domain_key: str,
    *, count_name: str = "n", num_partitions: int = 8,
) -> Dataset:
    """Counts per key, left-joined onto the full key domain with
    missing counts as 0 (reference ``class_count`` zero-fill)."""
    counts = partial_group_count(ds, key, count_name=count_name)
    joined = domain.join(
        counts,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=(domain_key,),
        right_on=(key,),
    )

    def fill(b: pd.DataFrame) -> pd.DataFrame:
        b[count_name] = b[count_name].fillna(0).astype("int64")
        return b

    return joined.map_batches(fill, batch_format="pandas")


def dict_merge_aggregate(
    ds: Dataset, key: str, item_col: str,
    *, out_col: str = "counts",
) -> Dataset:
    """reduceByKey with a dict-sum monoid: per key, merge
    ``{item: count}`` counters (reference ``property_domains`` /
    ``article_aliases`` dict merges). Output dict is serialized as a
    canonical JSON string column (sorted keys) for a stable schema."""

    def init(_k):
        return {}

    def acc_block(acc: dict, block) -> dict:
        df = block.to_pandas() if isinstance(block, pa.Table) else block
        for v, c in df[item_col].value_counts().items():
            acc[v] = acc.get(v, 0) + int(c)
        return acc

    def merge(a, b) -> dict:
        # hash-shuffle aggregation may hand a None accumulator for
        # partitions that saw no rows
        a = a if isinstance(a, dict) else {}
        b = b if isinstance(b, dict) else {}
        for k, v in b.items():
            if v is None:
                # accumulators round-trip through Arrow structs between
                # shuffle stages; absent keys surface as None values
                continue
            cur = a.get(k, 0)
            a[k] = (0 if cur is None else cur) + v
        return a

    def finalize(a: dict) -> str:
        return json.dumps(a, sort_keys=True)

    agg = AggregateFn(
        init=init, merge=merge, accumulate_block=acc_block,
        finalize=finalize, name=out_col,
    )
    return ds.groupby(key).aggregate(agg)


def zip_with_index(ds: Dataset, *, sort_key: str, descending: bool = False,
                   index_col: str = "index") -> Dataset:
    """Global consecutive int64 ids in sort order: sort (range
    partition), count rows per sorted block, cumulative offsets, then a
    per-block position + offset — no driver materialization of rows."""
    sorted_ds = ds.sort(sort_key, descending=descending)
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _count(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_count.remote(r) for r in refs])
    offsets = [0]
    for c in counts[:-1]:
        offsets.append(offsets[-1] + c)

    @ray.remote
    def _index(t: pa.Table, off: int) -> pa.Table:
        import numpy as np

        return t.append_column(
            index_col, pa.array(np.arange(off, off + t.num_rows), pa.int64())
        )

    import ray.data as rd

    out_refs = [_index.remote(r, o) for r, o in zip(refs, offsets)]
    return rd.from_arrow_refs(out_refs)
