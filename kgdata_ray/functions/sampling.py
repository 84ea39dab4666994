"""Deterministic sampling.

Reference analog: the reference samples RDDs for size estimation and
debugging (``kgdata/spark/extended_rdd.py`` auto-coalesce sampling);
here sampling is a *reproducible, engine-independent* row filter so a
sample drawn by this engine, by DuckDB, or by any future engine is the
same set of rows — the property a 100-TB pipeline needs when a sample
feeds a downstream job that must be re-runnable.

``hash_sample`` keeps a row iff the first 8 hex chars of
``md5(salt || str(key))`` fall below ``fraction`` of the hex space.
MD5 of the decimal string rendering is bit-identical across engines
(verified vs DuckDB ``md5()``), stateless, and embarrassingly parallel
— no RNG state, no shuffle, restart-safe.
"""

from __future__ import annotations

import hashlib
import math
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def hash_threshold(fraction: float) -> str:
    """The 8-hex-char cut: rows with md5-prefix < this are kept.

    fraction=1.0 returns 'g', which is lexicographically greater than
    every hex prefix (keep-all) — the naive ``format(16**8, '08x')``
    would be the NINE-char '100000000', which string-compares LESS
    than most 8-char prefixes and would silently drop ~87% of rows."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction out of [0,1]: {fraction}")
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * 16**8), "08x")


def hash_sample(ds: Dataset, key_col: str, fraction: float,
                *, salt: str = "") -> Dataset:
    """Deterministic ``fraction``-sample keyed on ``key_col``: the same
    key is always in or always out (stratified-consistent across tables
    sharing the key). Per-row md5 of short strings is a C-speed loop —
    fine for a filter stage; the batch stays Arrow end-to-end."""
    cut = hash_threshold(fraction)

    def filt(b: pd.DataFrame) -> pa.Table:
        keys = b[key_col].astype(str)
        keep = [
            hashlib.md5((salt + k).encode()).hexdigest()[:8] < cut
            for k in keys
        ]
        return pa.Table.from_pandas(b[pd.Series(keep, index=b.index)],
                                    preserve_index=False)

    return ds.map_batches(filt, batch_format="pandas")


def cap_per_group(
    ds: Dataset, keys: Sequence[str], id_col: str, cap: int,
    *, salt: str = "",
) -> Dataset:
    """Keep at most ``cap`` rows per key group, chosen by
    ``md5(salt + id)`` order (ties by id) — the per-domain / per-source
    document cap of corpus curation. Hash-ordered selection is
    deterministic across runs, cluster sizes and input order, and uses
    the same keyed md5 as :func:`hash_sample`, so capped and sampled
    views of a corpus stay consistent. One grouped shuffle on
    ``keys``; the cut is a vectorized cumcount per block."""
    from .agg import grouped_blockwise

    keys = list(keys)

    def block(b: pd.DataFrame) -> pa.Table:
        h = [hashlib.md5((salt + k).encode()).hexdigest()[:8]
             for k in b[id_col].astype(str)]
        b = b.assign(_h=h).sort_values(keys + ["_h", id_col],
                                       kind="mergesort")
        keep = b.groupby(keys, sort=False).cumcount() < cap
        return pa.Table.from_pandas(
            b[keep.to_numpy()].drop(columns="_h"), preserve_index=False)

    return grouped_blockwise(ds, keys, block)


def stratified_sample(
    ds: Dataset, strata_col: str, key_col: str,
    fractions: dict, *, default: float = 1.0, salt: str = "",
) -> Dataset:
    """Per-stratum deterministic sample: each row's keep-cut comes from
    ``fractions[row[strata_col]]`` (``default`` otherwise) and the row
    survives iff its keyed md5 prefix falls under that cut — the
    corpus-rebalancing step (downsample over-represented languages /
    sources) of training-data curation. Same md5 contract as
    :func:`hash_sample`, so it is restart-safe, shuffle-free and
    replayable by any engine."""
    cuts = {s: hash_threshold(f) for s, f in fractions.items()}
    default_cut = hash_threshold(default)

    def filt(b: pd.DataFrame) -> pa.Table:
        cut = b[strata_col].map(cuts).fillna(default_cut)
        keys = b[key_col].astype(str)
        keep = [
            hashlib.md5((salt + k).encode()).hexdigest()[:8] < c
            for k, c in zip(keys, cut)
        ]
        return pa.Table.from_pandas(b[pd.Series(keep, index=b.index)],
                                    preserve_index=False)

    return ds.map_batches(filt, batch_format="pandas")


_KNUTH = 2654435761  # Knuth multiplicative hash; fits exact doubles


def weighted_sample(
    ds: Dataset, key_col: str, weight_col: str, k: int,
) -> Dataset:
    """Deterministic weighted sample WITHOUT replacement
    (Efraimidis & Spirakis 2006: draw u~U(0,1) per row, keep the k
    smallest ``-ln(u)/w`` keys — inclusion probability proportional to
    weight). The uniform comes from an engine-replicable multiplicative
    hash of the key (exact integer arithmetic, then one division), so
    any SQL engine draws the identical sample. Keys must be
    NON-NEGATIVE int64; the multiply runs in uint64, and since
    2^32 divides 2^64 the wrap-around product mod 2^32 equals the
    mathematically exact ``key * KNUTH mod 2^32`` for the whole key
    range (SQL side must use a 128-bit product, e.g. DuckDB
    ``CAST(k AS HUGEINT) * 2654435761 % 4294967296``). Selection uses
    the combiner top-k (no full sort)."""
    import numpy as np

    from .agg import global_topk

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        kk = b[key_col].to_numpy().astype(np.int64)
        if (kk < 0).any():
            raise ValueError("weighted_sample keys must be non-negative")
        h = (kk.astype(np.uint64) * np.uint64(_KNUTH)) % np.uint64(1 << 32)
        u = (h.astype(np.float64) + 1.0) / float(1 << 32)
        b = b.copy()
        b["_es_key"] = -np.log(u) / b[weight_col].to_numpy(
            dtype=np.float64)
        return b

    withkey = ds.map_batches(keyed, batch_format="pandas")
    top = global_topk(withkey, ["_es_key", key_col], [True, True], k)

    def strip(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop(columns=["_es_key"])

    return top.map_batches(strip, batch_format="pandas")


def split_assign(
    ds: Dataset, key_col: str, *, fractions: "Sequence[float]",
    labels: "Sequence[str]", salt: str = "",
) -> Dataset:
    """Deterministic train/val/test split: each row gets the label of
    the md5-prefix band its key falls into (same keyed-md5 contract as
    :func:`hash_sample`, so splits are disjoint, exhaustive,
    restart-safe and reproducible by any engine). ``fractions`` must
    sum to 1."""
    if abs(sum(fractions) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    cuts = []
    acc = 0.0
    for f in fractions[:-1]:
        acc += f
        cuts.append(hash_threshold(acc))
    labels = list(labels)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        hs = [hashlib.md5((salt + str(x)).encode()).hexdigest()[:8]
              for x in b[key_col]]
        lab = []
        for h in hs:
            for i, c in enumerate(cuts):
                if h < c:
                    lab.append(labels[i])
                    break
            else:
                lab.append(labels[-1])
        b = b.copy()
        b["split"] = lab
        return b

    return ds.map_batches(assign, batch_format="pandas")


def temperature_mix(
    ds: Dataset, source_col: str, id_col: str, *,
    rate: float = 0.5, alpha: float = 0.5, salt: str = "mix",
    max_sources: int = 100_000,
) -> Dataset:
    """Temperature-weighted source rebalancing (the GPT-3-style
    dataset-mixing step): sample ``rate`` of the corpus overall, with
    per-source keep fractions proportional to ``n_s**alpha / n_s`` —
    alpha < 1 upweights small sources relative to their raw share;
    alpha = 0 is equal-share balancing, alpha = 1 is plain sampling.

    Two passes: a tiny per-source count aggregation (partial counts
    per block, driver-merged — bounded by ``max_sources``), then the
    same keyed-md5 threshold filter as :func:`hash_sample`, one cut
    per source. Fractions are quantized to 1e-6 (identical half-up
    expression in the SQL oracle) so the float normalization sum can
    never flip a cut by an ulp. Deterministic, restart-safe,
    shuffle-free on the data path.
    """

    def partial(b: pd.DataFrame) -> pa.Table:
        vc = b[source_col].value_counts()
        return pa.table(
            {
                source_col: pa.array(vc.index.astype(str)),
                "n": pa.array(vc.to_numpy(np.int64), pa.int64()),
            }
        )

    counts: dict[str, int] = {}
    part_ds = ds.select_columns([source_col]).map_batches(
        partial, batch_format="pandas"
    )
    for bt in part_ds.iter_batches(batch_size=65536,
                                   batch_format="pyarrow"):
        for s, n in zip(bt[source_col].to_pylist(), bt["n"].to_pylist()):
            counts[s] = counts.get(s, 0) + n
        if len(counts) > max_sources:
            raise ValueError(
                f"more than {max_sources} sources; use a distributed "
                f"cut join instead of the driver merge"
            )

    total = sum(counts.values())

    # alpha=0.5 goes through IEEE sqrt (correctly rounded, so SQL's
    # sqrt() is bit-equal); pow(x, a) for other alphas is only
    # library-equal, which the 1e-6 quantization below absorbs
    def w(n: int) -> float:
        return math.sqrt(float(n)) if alpha == 0.5 else float(n) ** alpha

    # fixed (sorted) accumulation order + 1e-6 quantization: the SQL
    # oracle's unordered sum can differ by an ulp at most, which the
    # shared rounding absorbs
    z = 0.0
    for s in sorted(counts):
        z += w(counts[s])
    zq = math.floor(z * 1_000_000.0 + 0.5)

    cuts: dict[str, str] = {}
    keep_all: set[str] = set()
    for s, n in counts.items():
        f = min(1.0, rate * total * w(n)
                / (zq / 1_000_000.0) / n)
        q = math.floor(f * 1_000_000.0 + 0.5)
        if q >= 1_000_000:
            keep_all.add(s)
        else:
            cut = int(q / 1_000_000.0 * 4294967296.0)
            cuts[s] = format(cut, "08x")

    def filt(b: pd.DataFrame) -> pa.Table:
        srcs = b[source_col].astype(str)
        ids = b[id_col].astype(str)
        keep = [
            s in keep_all
            or hashlib.md5((salt + k).encode()).hexdigest()[:8]
            < cuts.get(s, "0")
            for s, k in zip(srcs, ids)
        ]
        return pa.Table.from_pandas(b[pd.Series(keep, index=b.index)],
                                    preserve_index=False)

    return ds.map_batches(filt, batch_format="pandas")


def shuffle_order(ds: Dataset, *, id_col: str = "doc_id",
                  salt: str = "epoch0",
                  out_col: str = "shuffle_pos") -> Dataset:
    """Deterministic global training-order shuffle: each row gets its
    rank (0-based int64) under ``(md5(salt || str(id)), id)`` — the
    "shuffle the corpus once, identically on any cluster size" data
    order an epoch reader consumes. Different ``salt`` values give
    independent epoch orders; the same salt is reproducible across
    runs, engines and restarts (the :func:`hash_sample` md5 contract).

    Scale shape: one range sort on the 32-char hash key plus the
    zip_with_index offset pass (ONE int per sorted block to the
    driver) — rows never materialize anywhere. This replaces
    ``Dataset.random_shuffle`` where the order must be deterministic
    and auditable (SQL ``ROW_NUMBER() OVER (ORDER BY md5(...))``)."""
    from .agg import zip_with_index

    def key(b: pd.DataFrame) -> pa.Table:
        ids = b[id_col]
        hk = [hashlib.md5((salt + str(i)).encode()).hexdigest()
              for i in ids]
        return pa.table({
            id_col: pa.array(ids.to_numpy(), pa.int64()),
            "_hk": pa.array(hk, pa.string()),
        })

    keyed = ds.select_columns([id_col]).map_batches(
        key, batch_format="pandas")
    idx = zip_with_index(keyed, sort_key=["_hk", id_col],
                         index_col=out_col)
    return idx.drop_columns(["_hk"])
