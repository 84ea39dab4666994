"""Join strategies re-expressing the reference's join surface
(SURVEY §2.5) on Ray Data:

  1. hash equi-join            -> :func:`equi_join` (Dataset.join)
  2. salted skew join          -> :func:`salted_join`
     (``kgdata/spark/common.py:205-304`` ``join_repartition``: detect
     keys hotter than a threshold, salt them into sub-keys — replicate
     build side, spread probe side — then equi-join and drop salt)
  3. broadcast small side      -> :func:`broadcast_join`
     (``kgdata/spark/common.py:393-449`` ``left_outer_join_broadcast``)
  4. anti join                 -> :func:`anti_join` (``subtract`` uses,
     ``kgdata/wikidata/datasets/entities.py:91-103``)
  5. semi join                 -> :func:`semi_join` (broadcast key set,
     ``classes.py:50-53``)
  6. FK-explode join           -> :func:`fk_explode_join`
     (``kgdata/spark/common.py:307-390`` list-valued foreign keys)

All broadcast-side stages are plain task functions with worker-cached
broadcast objects (``functions.broadcast``) — they fuse with adjacent
map stages instead of spinning actor pools.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from .broadcast import as_ref, get_broadcast


def default_join_partitions() -> int:
    """Hash-shuffle join partition count: at least 8, scaling with the
    cluster (one partition per 4 CPUs), so a single 32-CPU box keeps
    the all-to-all fixed cost low while a 256-node cluster shuffles
    into thousands of partitions instead of funneling 100 TB through
    8. Override with ``KGR_JOIN_PARTITIONS``. Every join call site in
    the repo resolves through this instead of pinning a constant."""
    import os

    v = os.environ.get("KGR_JOIN_PARTITIONS")
    if v:
        return max(1, int(v))
    try:
        cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    return max(8, cpus // 4)


def resolve_join_partitions(num_partitions: Optional[int]) -> int:
    """Resolve a join/shuffle partition count: an explicit value wins
    (deliberate tiny-vocab pins stay pinned); ``None`` — the default on
    every join-bearing signature in the repo — scales with the cluster
    via :func:`default_join_partitions`, so no call site ever funnels a
    cluster-sized all-to-all through a literal 8."""
    return num_partitions if num_partitions is not None else default_join_partitions()


def equi_join(
    left: Dataset,
    right: Dataset,
    on: str,
    *,
    how: str = "inner",
    right_on: Optional[str] = None,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Plain hash-shuffle equi-join on one key."""
    num_partitions = resolve_join_partitions(num_partitions)
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,) if right_on else None,
    )


# --------------------------------------------------------------------------
# Broadcast join


def broadcast_join(
    left: Dataset,
    small: Union[pd.DataFrame, pa.Table, "ray.ObjectRef"],
    on: str,
    *,
    how: str = "left",
    right_on: Optional[str] = None,
    batch_size: int = 16384,
) -> Dataset:
    """Map-side join: the small side lives in the object store once
    (``ray.put``) and every task merges per batch — no shuffle.

    ``how``: "left" or "inner" (pandas merge semantics per batch; the
    small side must have unique keys for row-count stability).
    """
    ref = as_ref(small)
    r_on = right_on or on

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        table = get_broadcast(ref)
        if isinstance(table, pa.Table):
            table = table.to_pandas()
        if r_on != on:
            table = table.rename(columns={r_on: on})
        return batch.merge(table, on=on, how=how, sort=False)

    return left.map_batches(fn, batch_format="pandas", batch_size=batch_size)


# --------------------------------------------------------------------------
# Salted skew join


def hot_keys(
    ds: Dataset, on: str, threshold: int, *, sample_fraction: float = 1.0,
    partial_cap: int = 200_000,
) -> dict:
    """Pre-pass frequency count; returns {key: count} for keys with
    count > threshold (reference threshold: 10 000).

    ``sample_fraction < 1`` estimates counts from a Bernoulli sample
    (scaled by 1/fraction). Join RESULTS are identical either way —
    salting only changes the physical plan — so sampling is safe
    whenever the threshold is far from the sampling noise floor.

    Physical plan: per-block ``value_counts`` partials (map-side
    combine). The result is a driver dict by contract, so when the
    partial table is small (<= ``partial_cap`` rows — always true for
    sampled pre-passes) the partials are summed driver-side in one
    pandas groupby, skipping the sort shuffle; bigger partial tables
    (full-scan pre-pass over a high-cardinality key) take the
    distributed grouped count and only keys over the threshold reach
    the driver."""
    if sample_fraction < 1.0:
        ds = ds.random_sample(sample_fraction, seed=7)
        scale = 1.0 / sample_fraction
    else:
        scale = 1.0
    eff_threshold = max(1, int(threshold / scale))

    def pre(b: pd.DataFrame) -> pa.Table:
        out = b[on].value_counts().rename_axis(on).reset_index(name="__cnt")
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.select_columns([on]).map_batches(
        pre, batch_format="pandas"
    ).materialize()
    if partials.count() <= partial_cap:
        pdf = partials.to_pandas()
        sums = pdf.groupby(on, sort=False)["__cnt"].sum()
        hot = sums[sums > eff_threshold]
        return {k: int(v * scale) for k, v in hot.items()}

    counts = partials_pre_counted(partials, on)
    hot_ds = counts.filter(expr=f"__cnt > {eff_threshold}")
    out = {}
    for row in hot_ds.iter_rows():
        out[row[on]] = int(row["__cnt"] * scale)
    return out


def partials_pre_counted(partials: Dataset, on: str) -> Dataset:
    """Re-expand is unnecessary: partial_group_count over the partial
    table just needs rows weighted by __cnt; sum the counts instead."""
    from .agg import grouped_blockwise
    from .blocks import scrub_empty_blocks

    def final(b: pd.DataFrame) -> pa.Table:
        out = b.groupby(on, sort=False)["__cnt"].sum().reset_index()
        out["__cnt"] = out["__cnt"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return scrub_empty_blocks(grouped_blockwise(partials, [on], final))


def _cached_hot_arrays(hot_ref):
    """(hot key Arrow array, shard-count numpy array) built once per
    worker process from the broadcast hot-key dict."""
    from .broadcast import _CACHE

    key = ("hot_arrays",
           hot_ref.hex() if hasattr(hot_ref, "hex") else id(hot_ref))
    pair = _CACHE.get(key)
    if pair is None:
        shards = ray.get(hot_ref) if isinstance(hot_ref, ray.ObjectRef) else hot_ref
        pair = (
            pa.array(list(shards.keys())),
            np.fromiter(shards.values(), dtype=np.int64, count=len(shards)),
        )
        _CACHE[key] = pair
    return pair


def salted_join(
    left: Dataset,
    right: Dataset,
    on: str,
    *,
    how: str = "inner",
    hot_threshold: int = 10_000,
    salt_batch: int = 1_000,
    num_partitions: Optional[int] = None,
    precomputed_hot: Optional[dict] = None,
    hot_sample_fraction: float = 1.0,
) -> Dataset:
    """Skew-aware equi-join: keys hotter than ``hot_threshold`` on the
    probe (left) side are split into ``ceil(freq/salt_batch)`` sub-keys;
    the build (right) side rows for those keys are replicated per
    sub-key. Semantics identical to :func:`equi_join`; right side must
    be the smaller / build side.
    """
    num_partitions = resolve_join_partitions(num_partitions)
    hot = (
        precomputed_hot if precomputed_hot is not None
        else hot_keys(left, on, hot_threshold,
                      sample_fraction=hot_sample_fraction)
    )
    if not hot:
        return equi_join(left, right, on, how=how, num_partitions=num_partitions)
    hot_ref = ray.put({k: -(-v // salt_batch) for k, v in hot.items()})

    def _shard_counts(t: pa.Table) -> np.ndarray:
        """Per-row shard count (1 for cold keys) via one Arrow
        index_in against the worker-cached hot-key array."""
        keys, counts = _cached_hot_arrays(hot_ref)
        import pyarrow.compute as pc

        idx = pc.index_in(t[on], value_set=keys).to_numpy(
            zero_copy_only=False
        )
        miss = np.isnan(idx)
        return np.where(
            miss, 1, counts[np.nan_to_num(idx).astype(np.int64)]
        ).astype(np.int64)

    def probe_salt(t: pa.Table) -> pa.Table:
        n = _shard_counts(t)
        # deterministic spread: row position within batch modulo shards
        salt = (np.arange(len(t)) % n).astype(np.int64)
        return t.append_column("__salt", pa.array(salt, pa.int64()))

    def build_explode(t: pa.Table) -> pa.Table:
        n = _shard_counts(t)
        rep = np.repeat(np.arange(len(t)), n)
        out = t.take(pa.array(rep))
        salts = (
            np.concatenate([np.arange(k) for k in n])
            if len(t) else np.array([], dtype=np.int64)
        )
        out = out.append_column("__salt", pa.array(salts, pa.int64()))
        return out.rename_columns(
            [f"{on}__r" if c == on else c for c in out.schema.names]
        )

    lp = left.map_batches(probe_salt, batch_format="pyarrow",
                          zero_copy_batch=True)
    rp = right.map_batches(build_explode, batch_format="pyarrow",
                           zero_copy_batch=True)
    joined = lp.join(
        rp,
        join_type=how,
        num_partitions=num_partitions,
        on=(on, "__salt"),
        right_on=(f"{on}__r", "__salt"),
    )
    # drop per batch instead of joined.drop_columns(...): computing the
    # join's schema() for the column list would execute the whole
    # shuffle once just to answer the probe
    drop = ["__salt", f"{on}__r"]

    def _strip(t: pa.Table) -> pa.Table:
        present = [c for c in drop if c in t.schema.names]
        return t.drop_columns(present) if present else t

    return joined.map_batches(_strip, batch_format="pyarrow",
                              zero_copy_batch=True)


# --------------------------------------------------------------------------
# Semi / anti joins: broadcast key set (small right side) or hash
# shuffle (reference `subtract`, ``kgdata/spark/extended_rdd.py:680-685``,
# where the right side is the billion-key entity table)

# right sides above this row count take the shuffle plan under
# plan="auto"; below it, a broadcast key set is cheaper (one
# object-store put vs an all-to-all)
BROADCAST_KEYS_MAX = 2_000_000


def _key_set_filter(left: Dataset, right: Dataset, on: str,
                    right_on: Optional[str], keep_in: bool) -> Dataset:
    # Ray's Dataset.unique returns None (not []) on an empty input.
    # Broadcast a sorted list (not a set) so the per-worker value_set
    # Arrow array is deterministic across actors.
    keys_ref = ray.put(sorted(set(right.unique(right_on or on) or [])))

    def fn(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = get_broadcast(keys_ref)
        vs = pa.array(keys, type=b.schema.field(on).type) if keys \
            else pa.array([], type=b.schema.field(on).type)
        mask = pc.is_in(b[on], value_set=vs)
        if not keep_in:
            # nulls never match a key set: keep them on the anti side
            mask = pc.fill_null(pc.invert(mask), True)
        return b.filter(mask)

    return left.map_batches(fn, batch_format="pyarrow")


def _shuffle_key_filter(left: Dataset, right: Dataset, on: str,
                        right_on: Optional[str], keep_in: bool,
                        num_partitions: int) -> Dataset:
    """Distributed existence filter: distinct right keys (per-block
    pre-dedup shrinks the shuffle) marked with a presence column, then a
    left_outer hash join and a null test — nothing ever collects to the
    driver, matching the reference's shuffle ``subtract``."""
    from .agg import distinct_rows
    from .blocks import scrub_empty_blocks

    r_on = right_on or on
    keys = distinct_rows(right.select_columns([r_on]), [r_on])

    def mark(b: pa.Table) -> pa.Table:
        out = b.rename_columns(["__k"])
        return out.append_column(
            "__present", pa.array(np.ones(len(b), dtype=np.int8)))

    marked = scrub_empty_blocks(
        keys.map_batches(mark, batch_format="pyarrow")
    )
    joined = left.join(
        marked,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=(on,),
        right_on=("__k",),
    )
    out_cols = [c for c in left.schema().names]

    def filt(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if "__present" not in b.schema.names:  # schema-less empty block
            # scrub_empty_blocks drops it downstream; any empty table works
            return b.select(
                [c for c in out_cols if c in b.schema.names]).slice(0, 0)
        hit = pc.is_valid(b["__present"])
        return b.filter(hit if keep_in else pc.invert(hit)).select(out_cols)

    return scrub_empty_blocks(joined.map_batches(filt, batch_format="pyarrow"))


def _existence_join(left: Dataset, right: Dataset, on: str,
                    right_on: Optional[str], keep_in: bool,
                    plan: str, num_partitions: int) -> Dataset:
    if plan == "auto":
        # the guard needs the right-side cardinality; materialize so the
        # count and the subsequent key scan don't execute the pipeline
        # twice (row count then comes from block metadata)
        right = right.materialize()
        plan = "broadcast" if right.count() <= BROADCAST_KEYS_MAX else "shuffle"
    if plan == "broadcast":
        return _key_set_filter(left, right, on, right_on, keep_in)
    if plan == "shuffle":
        return _shuffle_key_filter(left, right, on, right_on, keep_in,
                                   num_partitions)
    raise ValueError(f"unknown semi/anti join plan: {plan}")


def semi_join(
    left: Dataset, right: Dataset, on: str, *,
    right_on: Optional[str] = None, plan: str = "auto",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Rows of ``left`` whose key appears in ``right``. ``plan``:
    "broadcast" (key set via ray.put — small right sides), "shuffle"
    (distributed existence join — the scale path), or "auto" (size
    guard at BROADCAST_KEYS_MAX rows). Both plans produce identical
    rows (tested)."""
    num_partitions = resolve_join_partitions(num_partitions)
    return _existence_join(left, right, on, right_on, True, plan,
                           num_partitions)


def anti_join(
    left: Dataset, right: Dataset, on: str, *,
    right_on: Optional[str] = None, plan: str = "auto",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Rows of ``left`` whose key does NOT appear in ``right``
    (reference ``subtract``; dangling/unknown-id computations where the
    right side is the full entity-id table — hence the shuffle plan at
    scale)."""
    num_partitions = resolve_join_partitions(num_partitions)
    return _existence_join(left, right, on, right_on, False, plan,
                           num_partitions)


# --------------------------------------------------------------------------
# FK-explode join: left rows carry a LIST of foreign keys


def fk_explode_join(
    left: Dataset,
    right: Dataset,
    *,
    fk_col: str,
    id_col: str,
    right_key: str,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Explode ``fk_col`` (list column) of ``left`` to one row per
    (id, fk), equi-join each fk against ``right``, return the exploded
    join (callers regroup by ``id_col`` as needed). Reference:
    ``left_outer_join`` over list-valued foreign keys,
    ``kgdata/spark/common.py:307-390``."""

    num_partitions = resolve_join_partitions(num_partitions)
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


def asof_join_backward(
    left: Dataset,
    right: Dataset,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    prefix: str = "prior_",
) -> Dataset:
    """AS-OF join (backward): each left row gains the right row with the
    greatest ``right_ts`` <= its ``left_ts`` for the same ``key``
    (DuckDB ``ASOF LEFT JOIN`` semantics; unmatched rows keep nulls).

    Ray Data has no as-of join, so it is composed from certified
    primitives (the brief's option (a)): both sides are projected onto
    one combined Arrow schema with a side tag, unioned, range-shuffled
    on ``key`` (``grouped_blockwise`` — its boundary guard keeps every
    key's rows in one block), and each block runs ONE vectorized
    ``pandas.merge_asof`` over all its keys. The shuffle moves each row
    once; per-block work is O(n log n) in the block — no per-key pair
    blowup. Partitioning assumption: a single key's rows fit a block
    (same contract as every grouped operator here).

    Ties: if several right rows share (key, right_ts), the LAST one in
    ``right``'s sort order wins (pandas semantics) — pass a
    deduplicated right side when that matters.
    """
    from .agg import grouped_blockwise

    def arrow_types(ds: Dataset) -> tuple[list[str], dict]:
        # Dataset.schema() yields numpy dtypes for pandas-block inputs;
        # normalize to Arrow (object dtype -> string by convention)
        sch = ds.schema()
        out = {}
        for name, t in zip(sch.names, sch.types):
            if not isinstance(t, pa.DataType):
                t = (pa.string() if np.dtype(t) == np.dtype("O")
                     else pa.from_numpy_dtype(np.dtype(t)))
            out[name] = t
        return list(sch.names), out

    lnames, ltypes = arrow_types(left)
    _rnames, rtypes = arrow_types(right)

    pref_fields = [(f"{prefix}{c}", rtypes[c]) for c in right_payload]
    pref_fields.append((f"{prefix}{right_ts}", rtypes[right_ts]))
    combined = pa.schema(
        [(n, ltypes[n]) for n in lnames]
        + list(pref_fields)
        + [("__ts", ltypes[left_ts]), ("__side", pa.int8())]
    )
    out_schema = pa.schema(
        [(n, ltypes[n]) for n in lnames] + list(pref_fields)
    )
    pref_names = [n for n, _ in pref_fields]

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = [t[c] for c in lnames]
        cols += [pa.nulls(n, ty) for _, ty in pref_fields]
        cols += [t[left_ts], pa.array(np.zeros(n, dtype=np.int8))]
        return pa.Table.from_arrays(cols, schema=combined)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = [
            t[c] if c == key else pa.nulls(n, ltypes[c]) for c in lnames
        ]
        cols += [t[c] for c in right_payload] + [t[right_ts]]
        cols += [t[right_ts], pa.array(np.ones(n, dtype=np.int8))]
        return pa.Table.from_arrays(cols, schema=combined)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def block(b: pd.DataFrame) -> pa.Table:
        lf = b[b["__side"] == 0][lnames + ["__ts"]].sort_values(
            "__ts", kind="mergesort"
        )
        rf = b[b["__side"] == 1][[key, "__ts"] + pref_names].sort_values(
            "__ts", kind="mergesort"
        )
        out = pd.merge_asof(lf, rf, on="__ts", by=key, direction="backward")
        return pa.Table.from_pandas(
            out[lnames + pref_names], schema=out_schema, preserve_index=False
        )

    return grouped_blockwise(tagged, [key], block)


def interval_join(
    left: Dataset,
    intervals: Dataset,
    *,
    key: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket: str = "1D",
    num_partitions: Optional[int] = None,
    plan: str = "shuffle",
    left_cols: Optional[Sequence[str]] = None,
    interval_cols: Optional[Sequence[str]] = None,
) -> Dataset:
    """Range join: left rows matched to every interval of the same key
    with ``start <= ts <= end`` (inclusive). Ray Data has no range
    join; plan="shuffle" (default, the scale path) is the
    bucketed-equi-join composition: intervals explode to each time
    bucket they cover, left rows land in exactly ONE bucket, the
    (key, bucket) hash join co-locates candidates, and a residual
    range filter finishes. Each (row, interval) pair meets in exactly
    one bucket, so no post-join dedup is needed. The shuffle moves
    each left row once and each interval ceil(len/bucket)+1 times —
    size ``bucket`` near the typical interval length.

    plan="broadcast" is the small-interval-side fast path: the whole
    interval table is ``ray.put`` once and each left batch does a
    local merge + range filter — no shuffle at all (the left side
    streams). Both plans produce identical rows (tested).

    Inner-join semantics: unmatched left rows drop. Payload column
    names must be disjoint between the two sides (apart from ``key``,
    which appears once in the output under the left name).

    Pass ``left_cols`` / ``interval_cols`` when you know the schemas:
    ``Dataset.schema()`` on a mapped pipeline costs a limit-1
    execution of that pipeline (two of them here — ~1.5 s of fixed
    overhead per call that explicit columns avoid)."""
    num_partitions = resolve_join_partitions(num_partitions)
    import pandas as pd

    left_cols = (list(left_cols) if left_cols is not None
                 else list(left.schema().names))
    iv_names = (list(interval_cols) if interval_cols is not None
                else list(intervals.schema().names))
    out_cols = left_cols + [
        c for c in iv_names if c != key and c not in left_cols
    ]

    if plan == "broadcast":
        from .broadcast import as_ref, get_broadcast

        iv_ref = as_ref(intervals.to_pandas())

        def bcast_join(b: pd.DataFrame) -> pa.Table:
            iv = get_broadcast(iv_ref)
            m = b.merge(iv, on=key)
            keep = (m[ts_col] >= m[start_col]) & (m[ts_col] <= m[end_col])
            return pa.Table.from_pandas(m.loc[keep, out_cols],
                                        preserve_index=False)

        return left.map_batches(bcast_join, batch_format="pandas")
    if plan != "shuffle":
        raise ValueError(f"unknown interval join plan: {plan}")

    width_us = int(pd.Timedelta(bucket).value // 1000)

    def tag_left(b: pd.DataFrame) -> pa.Table:
        b = b.copy()
        b["__bkt"] = b[ts_col].astype("datetime64[us]").astype("int64") // width_us
        return pa.Table.from_pandas(b, preserve_index=False)

    def explode_intervals(b: pd.DataFrame) -> pa.Table:
        lo = b[start_col].astype("datetime64[us]").astype("int64") // width_us
        hi = b[end_col].astype("datetime64[us]").astype("int64") // width_us
        reps = (hi - lo + 1).to_numpy()
        out = b.loc[b.index.repeat(reps)].reset_index(drop=True)
        bkt = np.concatenate(
            [np.arange(a, z + 1) for a, z in zip(lo, hi)]
        ) if len(b) else np.array([], dtype=np.int64)
        out["__bkt"] = bkt
        return pa.Table.from_pandas(
            out.rename(columns={key: "__rk"}), preserve_index=False
        )

    lt = left.map_batches(tag_left, batch_format="pandas")
    rt = intervals.map_batches(explode_intervals, batch_format="pandas")
    j = lt.join(
        rt, join_type="inner", num_partitions=num_partitions,
        on=(key, "__bkt"), right_on=("__rk", "__bkt"),
    )

    def residual(b: pd.DataFrame) -> pa.Table:
        if start_col not in b.columns:  # schema-less empty join block
            b = pd.DataFrame({c: [] for c in out_cols})
        keep = (b[ts_col] >= b[start_col]) & (b[ts_col] <= b[end_col])
        out = b.loc[keep, out_cols]
        return pa.Table.from_pandas(out, preserve_index=False)

    from .blocks import scrub_empty_blocks

    return scrub_empty_blocks(
        j.map_batches(residual, batch_format="pandas")
    )


def bucketed_join(
    left_dir, right_dir, *, on: str, right_on: Optional[str] = None,
    join_type: str = "inner", num_partitions: Optional[int] = None,
    map_side_budget_bytes: int = 256 << 20,
) -> "Dataset":
    """Co-partitioned join over two bucketed sinks
    (``state.manifest.write_dataset_sharded`` outputs whose
    ``shard_col`` is the join key): shard *i* of the left can only
    match shard *i* of the right, so the join decomposes into
    ``num_shards`` independent small joins and NO global all-to-all
    shuffle ever runs — the scale pattern of picking ONE partitioning
    key, paying its shuffle once at write time, and reusing it across
    every downstream join.

    Two physical plans, picked from FREE manifest metadata (the
    per-shard byte totals the sinks already record):

    * **bucket map join** (default): when every left+right shard pair
      fits ``map_side_budget_bytes``, each pair is joined by ONE task
      that reads both shards' parquet and runs an in-memory Arrow hash
      join — no shuffle aggregators, no exchange, shards stream
      independently. This is the classic bucket-map-join; the writer's
      ``num_shards`` is what keeps shards task-sized at 100 TB.
    * **per-shard ``Dataset.join`` fallback**: when any shard pair
      exceeds the budget (hot-key skew), or a schema isn't
      Arrow-joinable (list-typed payloads, colliding non-key names),
      ALL shards take the distributed hash join so the union schema
      stays uniform.

    Raises if the two sinks disagree on shard count (their bucket
    functions would not be aligned)."""
    import ray.data as rd

    from ..state.manifest import MANIFEST_NAME, read_manifest
    from pathlib import Path
    import json as _json

    lm, rm = read_manifest(left_dir), read_manifest(right_dir)
    if lm is None or rm is None:
        raise FileNotFoundError("both sides need a parent manifest")
    ln, rn = lm["params"]["num_shards"], rm["params"]["num_shards"]
    if ln != rn:
        raise ValueError(f"shard counts differ: {ln} != {rn}")
    right_on = right_on or on

    def shard_meta(base, s: int) -> tuple[list[str], int]:
        sdir = Path(base) / f"shard={s:05d}"
        m = _json.loads((sdir / MANIFEST_NAME).read_text())
        return ([str(sdir / f["name"]) for f in m["files"]],
                sum(f["bytes"] for f in m["files"]))

    shards = [(shard_meta(left_dir, s), shard_meta(right_dir, s))
              for s in range(ln)]
    if _map_side_ok(shards, join_type=join_type, on=on,
                    right_on=right_on, budget=map_side_budget_bytes):
        return _bucket_map_join(shards, on=on, right_on=right_on,
                                join_type=join_type)

    # per-shard fallback partitions: shards are already co-partitioned
    # and task-sized, so a small per-shard fan-out suffices; an
    # explicit value still wins for oversized hot shards
    num_partitions = 2 if num_partitions is None else num_partitions
    out = None
    for (lf, _), (rf, _) in shards:
        # partitioning=None: the shard=NNNNN path segment must not be
        # hive-inferred into a column (it would collide across sides)
        l = rd.read_parquet(lf, partitioning=None)
        r = rd.read_parquet(rf, partitioning=None)
        j = l.join(r, join_type=join_type,
                   num_partitions=num_partitions,
                   on=(on,), right_on=(right_on,))
        out = j if out is None else out.union(j)
    return out


_ARROW_JOIN_TYPES = {"inner": "inner", "left_outer": "left outer",
                     "right_outer": "right outer",
                     "full_outer": "full outer"}


def _map_side_ok(shards, *, join_type: str, on: str, right_on: str,
                 budget: int) -> bool:
    """Driver-side plan check for the bucket map join: byte budget from
    the shard manifests, plus two parquet footer reads to verify the
    schemas are Arrow-hash-joinable (Arrow rejects list/map payloads)
    and produce the same output columns the ``Dataset.join`` plan
    would (no non-key name collisions — both plans drop the right
    key)."""
    import pyarrow.parquet as _pq

    if join_type not in _ARROW_JOIN_TYPES:
        return False
    if any(lb + rb > budget for (_, lb), (_, rb) in shards):
        return False
    lf = next((f for (f, _), _ in shards if f), None)
    rf = next((f for _, (f, _) in shards if f), None)
    if lf is None or rf is None:
        return False  # a wholly-empty side: let Dataset.join shape it
    ls, rs = _pq.read_schema(lf[0]), _pq.read_schema(rf[0])
    if any(pa.types.is_nested(f.type) for f in list(ls) + list(rs)):
        return False
    overlap = (set(ls.names) - {on}) & (set(rs.names) - {right_on})
    return not overlap


def _bucket_map_join(shards, *, on: str, right_on: str,
                     join_type: str) -> "Dataset":
    """One task per co-partitioned shard pair: read both sides' files,
    Arrow hash join in memory, stream the result block out. Empty
    shards reproduce their side's schema from any non-empty sibling
    (every pair was manifest-validated by the caller)."""
    import pyarrow.parquet as _pq
    import ray.data as rd

    arrow_type = _ARROW_JOIN_TYPES[join_type]
    items = [{"shard": s, "lf": lf, "rf": rf}
             for s, ((lf, _), (rf, _)) in enumerate(shards)]
    any_lf = next(f for (f, _), _ in shards if f)
    any_rf = next(f for _, (f, _) in shards if f)

    def join_pair(b: pd.DataFrame) -> pa.Table:
        # partitioning=None: don't hive-infer the shard=NNNNN path
        # segment into a column (it would collide across sides)
        outs = []
        for _, row in b.iterrows():
            lt = (_pq.read_table(list(row["lf"]), partitioning=None)
                  if len(row["lf"])
                  else _pq.read_schema(any_lf[0]).empty_table())
            rt = (_pq.read_table(list(row["rf"]), partitioning=None)
                  if len(row["rf"])
                  else _pq.read_schema(any_rf[0]).empty_table())
            outs.append(lt.join(rt, keys=[on], right_keys=[right_on],
                                join_type=arrow_type))
        return pa.concat_tables(outs, promote_options="default")

    return rd.from_items(items, override_num_blocks=len(items)).map_batches(
        join_pair, batch_format="pandas", batch_size=None)
