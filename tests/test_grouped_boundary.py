"""Guard test for the grouped_blockwise sort-block invariant (VERDICT
round-1 #6 / ADVICE): when a single key's group is bigger than the
target block size, Ray's sort may emit it split across adjacent blocks.
The boundary guard must detect that and merge the straddling blocks so
``block_fn`` still sees every group whole."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from kgdata_ray.functions.agg import (
    _merge_key_straddling_blocks,
    grouped_blockwise,
)


def _make_count_block():
    # defined via closure so cloudpickle ships it by value (test modules
    # are not importable on Ray workers)
    def _count_block(b: pd.DataFrame) -> pa.Table:
        out = b.groupby("k", sort=False).size().reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return _count_block


def test_merge_guard_repairs_straddled_key():
    # Hand-build sorted blocks where key "b" straddles blocks 1-3 and an
    # empty block sits in the middle — the worst layout the guard must fix.
    t0 = pa.table({"k": ["a"] * 5 + ["b"] * 3})
    t1 = pa.table({"k": ["b"] * 4})
    t_empty = pa.table({"k": pa.array([], pa.string())})
    t2 = pa.table({"k": ["b"] * 2 + ["c"] * 3})
    ds = rd.from_arrow_refs(
        [ray.put(t0), ray.put(t1), ray.put(t_empty), ray.put(t2)]
    )
    fixed = _merge_key_straddling_blocks(ds.materialize(), ["k"])
    out = (
        fixed.map_batches(_make_count_block(), batch_size=None,
                          batch_format="pandas")
        .to_pandas()
        .groupby("k")["n"]
        .max()
    )
    # whole groups per block -> one row per key with the FULL count
    assert out["a"] == 5
    assert out["b"] == 9
    assert out["c"] == 3


def test_key_surgery_bounds_output_block_size():
    # Round-2 VERDICT #4: a key straddling 3 blocks must be repaired by
    # moving ONLY that key's rows into one dedicated block — never by
    # concatenating the whole run (the hot-key OOM cliff). Here "b" has
    # 100 rows spread over 3 blocks of <=110 rows; run-concat would
    # produce a 300-row block, surgery must stay at ~max-input size.
    t0 = pa.table({"k": ["a"] * 100 + ["b"] * 10})
    t1 = pa.table({"k": ["b"] * 80})
    t2 = pa.table({"k": ["b"] * 10 + ["c"] * 100})
    ds = rd.from_arrow_refs([ray.put(t0), ray.put(t1), ray.put(t2)])
    fixed = _merge_key_straddling_blocks(ds.materialize(), ["k"]).materialize()
    block_rows = [
        m.num_rows
        for bundle in fixed.iter_internal_ref_bundles()
        for m in bundle.metadata
    ]
    assert max(block_rows) <= 110, block_rows  # group size, not run size
    out = (
        fixed.map_batches(_make_count_block(), batch_size=None,
                          batch_format="pandas")
        .to_pandas()
        .groupby("k")["n"]
        .agg(["max", "count"])
    )
    # every group whole in exactly one block, with the full count
    assert (out["count"] == 1).all()
    assert out["max"]["a"] == 100 and out["max"]["b"] == 100
    assert out["max"]["c"] == 100


def test_grouped_blockwise_correct_with_tiny_blocks():
    # Force Ray to produce many small sorted blocks over a skewed key so
    # straddling is likely; the guarded grouped_blockwise must still
    # produce exact global counts.
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 4 * 1024  # 4 KiB blocks
    try:
        n = 20_000
        keys = np.where(np.arange(n) % 4 == 0, "hot", "k" + pd.Series(
            np.arange(n) % 7).astype(str)).astype(object)
        ds = rd.from_pandas(
            pd.DataFrame({"k": keys, "v": np.arange(n)})
        ).repartition(16)
        out = (
            grouped_blockwise(ds, ["k"], _make_count_block())
            .to_pandas()
            .groupby("k", as_index=False)["n"]
            .agg(["count", "sum"])
        )
        expect = pd.Series(keys).value_counts()
        for k, row in out.set_index("k").iterrows():
            # exactly one output row per key (group never split) with
            # the exact global count
            assert row["count"] == 1, f"group {k} split across blocks"
            assert row["sum"] == expect[k]
    finally:
        ctx.target_max_block_size = old


def test_group_row_number_tiny_blocks():
    # the window family rides grouped_blockwise; under pathological
    # 4 KiB blocks a skewed partition key must still produce exactly
    # the pandas single-partition row numbering
    from kgdata_ray.functions.agg import group_row_number

    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 4 * 1024
    try:
        n = 12_000
        rng = np.random.default_rng(3)
        df = pd.DataFrame({
            "k": np.where(np.arange(n) % 3 == 0, 0,
                          np.arange(n) % 11).astype(np.int64),
            "ord": rng.permutation(n).astype(np.int64),
        })
        ds = rd.from_pandas(df).repartition(16)
        got = (
            group_row_number(ds, "k", ["ord"])
            .to_pandas()
            .sort_values(["k", "ord"])
            .reset_index(drop=True)
        )
        want = df.sort_values(["k", "ord"]).reset_index(drop=True)
        want["rn"] = want.groupby("k", sort=False).cumcount() + 1
        pd.testing.assert_frame_equal(
            got[["k", "ord", "rn"]], want[["k", "ord", "rn"]])
    finally:
        ctx.target_max_block_size = old
