"""Exact, memory-bounded unordered-pair enumeration (round-3 VERDICT
ask #2: "no silent caps").

Grouped pair-generation stages (co-mention edges, Adamic-Adar wedges,
PMI pairs, q-gram candidate pairs, prefix-filter buckets) previously
truncated a group to its first ``max_group`` sorted members — exact at
every tested scale but SILENTLY lossy once a hot key exceeded the cap.
:func:`triu_pair_tiles` replaces the cap: it enumerates ALL ``i < j``
pairs of a group in row-major tiles of bounded size, so a block fn can
``yield`` one Arrow table per tile and let Ray's dynamic block
splitting keep memory flat. A hot group now costs more tiles (CPU
proportional to its true pair count — inherent to an exact contract),
never dropped pairs.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

# ~2M pairs per yielded tile: two string index arrays of this length
# stay well under a worker-heap block even with long names.
TILE_PAIRS = 1 << 21


def triu_pair_tiles(
    n: int, *, tile_pairs: int = TILE_PAIRS,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Yield ``(i_idx, j_idx)`` int64 index arrays covering every
    ``i < j`` pair of ``range(n)`` exactly once, in row-major tiles of
    at most ``max(tile_pairs, n - 1)`` pairs (a single over-long row is
    never split below one row, so one tile may carry up to ``n - 1``
    pairs)."""
    if n < 2:
        return
    rows_per_tile = max(1, tile_pairs // (n - 1))
    for r0 in range(0, n - 1, rows_per_tile):
        r1 = min(r0 + rows_per_tile, n - 1)
        ii = np.arange(r0, r1, dtype=np.int64)
        counts = n - 1 - ii
        total = int(counts.sum())
        i_idx = np.repeat(ii, counts)
        starts = np.zeros(len(ii), np.int64)
        starts[1:] = np.cumsum(counts)[:-1]
        within = (np.arange(total, dtype=np.int64)
                  - np.repeat(starts, counts))
        yield i_idx, i_idx + 1 + within


def grouped_pair_tables(
    b: pd.DataFrame,
    key: str | Sequence[str],
    val_col: str,
    out_a: str,
    out_b: str,
    *,
    weight_fn: Optional[Callable[[int], float]] = None,
    weight_name: str = "w",
    unique: bool = False,
    dedup: bool = False,
    tile_pairs: int = TILE_PAIRS,
) -> Iterator[pa.Table]:
    """Generator block fn body for grouped exact pair enumeration.

    Groups ``b`` by ``key``; within each group sorts the (optionally
    uniqued) ``val_col`` values and emits every ``i < j`` pair as
    ``(out_a, out_b)`` string columns — ALL pairs, streamed in bounded
    Arrow tables of ~``tile_pairs`` rows via :func:`triu_pair_tiles`,
    so a hot group costs more yielded tiles, never dropped pairs.
    ``weight_fn(group_size)`` optionally adds a constant per-group
    float column (e.g. Adamic–Adar's ``1/ln(n)``). ``dedup`` drops
    duplicate pairs within each flushed tile (a shuffle-volume
    optimization ahead of a global distinct, not a correctness step).
    Always yields at least one (possibly empty) table so downstream
    blocks keep their schema."""
    acc_a: list[np.ndarray] = []
    acc_b: list[np.ndarray] = []
    acc_w: list[np.ndarray] = []
    acc_n = 0

    def flush() -> pa.Table:
        nonlocal acc_a, acc_b, acc_w, acc_n
        if acc_a:
            a = np.concatenate(acc_a)
            c = np.concatenate(acc_b)
            cols = {out_a: a, out_b: c}
            if weight_fn is not None:
                cols[weight_name] = np.concatenate(acc_w)
            out = pd.DataFrame(cols)
            if dedup:
                out = out.drop_duplicates([out_a, out_b])
            t = pa.Table.from_pandas(out, preserve_index=False)
        else:
            cols = {out_a: pa.array([], pa.string()),
                    out_b: pa.array([], pa.string())}
            if weight_fn is not None:
                cols[weight_name] = pa.array([], pa.float64())
            t = pa.table(cols)
        acc_a, acc_b, acc_w, acc_n = [], [], [], 0
        return t

    yielded = False
    for _, g in b.groupby(key, sort=False):
        vals = g[val_col].to_numpy()
        if unique:
            vals = pd.unique(vals)
        ents = np.sort(vals)
        n = len(ents)
        if n < 2:
            continue
        w = weight_fn(n) if weight_fn is not None else None
        for ii, jj in triu_pair_tiles(n, tile_pairs=tile_pairs):
            acc_a.append(ents[ii])
            acc_b.append(ents[jj])
            if w is not None:
                acc_w.append(np.full(ii.size, w))
            acc_n += ii.size
            if acc_n >= tile_pairs:
                yield flush()
                yielded = True
    if acc_n or not yielded:
        yield flush()
