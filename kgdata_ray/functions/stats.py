"""Distributed statistics operators: exact quantiles (global and
per-group), pivot/crosstab counts, and exact paired moments
(covariance / Pearson correlation).

Reference parity: the reference computes dataset statistics driver-side
with pandas/numpy after collecting small aggregates (e.g.
``kgdata/wikidata/datasets/meta_graph_stats.py``'s count rollups); here
each statistic is a distributed Ray Data plan whose driver state is
O(groups) or O(blocks), never O(rows):

- ``global_quantiles`` — distributed selection: one range-partition
  sort of the value column, per-block row counts from tiny count tasks
  (ints to the driver, never rows), then each block emits only the
  order statistics that fall inside it. Semantics match DuckDB's
  ``quantile_disc``: element at index ``ceil(q*n) - 1``.
- ``grouped_quantiles`` — one range shuffle on the key, vectorized
  per-block selection of each group's order statistics.
- ``pivot_counts`` — map-side partial crosstab per block (one row per
  key per block), then a grouped sum: the shuffle moves partials, not
  rows. Category discovery is either an explicit list (the scale path
  — no driver collect) or a distinct scan capped by assumption of a
  small category domain.
- ``paired_moments`` — map-side partial sums (n, Σx, Σy, Σx², Σy²,
  Σxy) as int64 per block, grouped sum, then the closed-form corr /
  cov from the exact integer sums. Integer inputs keep every engine
  bit-identical (IEEE ops on exact operands); the int64 contract is
  |x|,|y| ≲ 1e6 and n·x² < 2^63 — beyond that, pre-scale the inputs
  down (the statistic is scale-invariant for corr).
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data import Dataset

from .agg import grouped_blockwise


def _disc_index(q: float, n: int) -> int:
    """DuckDB ``quantile_disc`` order-statistic index (0-based)."""
    return max(int(math.ceil(q * n)) - 1, 0)


def global_quantiles(
    ds: Dataset, value_col: str, qs: Sequence[float],
    *, q_col: str = "q", out_col: str | None = None,
    interpolated: bool = False, ndigits: int = 6,
) -> Dataset:
    """Exact quantiles of ``value_col`` over the whole dataset,
    returned as a tiny (q, value) Dataset. Distributed selection: rows
    never reach the driver — only one int per sorted block does.

    ``interpolated=False`` → discrete order statistics (DuckDB
    ``quantile_disc``: element at index ceil(q*n)-1, bit-exact, no
    rounding). ``interpolated=True`` → linear interpolation at virtual
    index q*(n-1) (DuckDB ``quantile_cont`` / numpy 'linear'; the lerp
    ``lo + (hi-lo)*frac`` is the same IEEE expression both engines run
    — verified bit-equal — with ``ndigits`` rounding as a 1-ulp belt)."""
    import math as _math

    out_col = out_col or value_col
    sorted_ds = ds.select_columns([value_col]).sort(value_col)
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _count(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_count.remote(r) for r in refs])
    n = sum(counts)
    if n == 0:
        raise ValueError("global_quantiles on an empty dataset")

    offsets = [0]
    for c in counts[:-1]:
        offsets.append(offsets[-1] + c)

    if not interpolated:
        targets = sorted((float(q), _disc_index(q, n)) for q in qs)

        @ray.remote
        def _pick(t: pa.Table, local: list[tuple[float, int]]) -> pa.Table:
            col = t.column(value_col)
            return pa.table({
                q_col: pa.array([q for q, _ in local], pa.float64()),
                out_col: pa.array([col[i].as_py() for _, i in local],
                                  t.schema.field(value_col).type),
            })

        out_refs = []
        for ref, off, cnt in zip(refs, offsets, counts):
            local = [(q, i - off) for q, i in targets if off <= i < off + cnt]
            if local:
                out_refs.append(_pick.remote(ref, local))
        return rd.from_arrow_refs(out_refs)

    # interpolated: gather the lo/hi order statistics (which may live
    # in different blocks), then lerp on the tiny gathered table
    need: list[tuple[float, int, float, int]] = []  # (q, idx, frac, role)
    for q in qs:
        v = float(q) * (n - 1)
        lo, hi = int(_math.floor(v)), int(_math.ceil(v))
        need.append((float(q), lo, v - lo, 0))
        if hi != lo:
            need.append((float(q), hi, v - lo, 1))

    @ray.remote
    def _gather(t: pa.Table, local) -> pa.Table:
        col = t.column(value_col)
        return pa.table({
            q_col: pa.array([q for q, _, _, _ in local], pa.float64()),
            "__frac": pa.array([f for _, _, f, _ in local], pa.float64()),
            "__role": pa.array([r for _, _, _, r in local], pa.int8()),
            "__v": pa.array(
                [float(col[i].as_py()) for _, i, _, _ in local],
                pa.float64()),
        })

    out_refs = []
    for ref, off, cnt in zip(refs, offsets, counts):
        local = [(q, i - off, f, r) for q, i, f, r in need
                 if off <= i < off + cnt]
        if local:
            out_refs.append(_gather.remote(ref, local))

    def combine(b: pd.DataFrame) -> pa.Table:
        lo = b[b["__role"] == 0].set_index(q_col)
        hi = b[b["__role"] == 1].set_index(q_col)["__v"]
        vlo = lo["__v"]
        vhi = hi.reindex(vlo.index).fillna(vlo)
        val = (vlo + (vhi - vlo) * lo["__frac"]).round(ndigits)
        out = val.rename(out_col).reset_index().sort_values(q_col)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        rd.from_arrow_refs(out_refs)
        .repartition(1)
        .map_batches(combine, batch_format="pandas")
    )


def grouped_quantiles(
    ds: Dataset, key: str, value_col: str, qs: Sequence[float],
    *, q_col: str = "q", out_col: str | None = None,
    interpolated: bool = False, ndigits: int = 6,
) -> Dataset:
    """Exact per-group quantiles (long format: one row per (key, q)).
    ``interpolated=False`` matches DuckDB ``quantile_disc`` grouped
    semantics (order statistic at ceil(q*n)-1, bit-exact);
    ``interpolated=True`` matches ``quantile_cont`` / percentile_cont —
    lerp at virtual index q*(n-1), the same IEEE expression DuckDB
    evaluates, with ``ndigits`` rounding as a 1-ulp belt. One range
    shuffle on ``key``; selection is a vectorized sorted-position
    gather per block, no per-group Python loop."""
    out_col = out_col or value_col
    qlist = sorted(float(q) for q in qs)

    def block(b: pd.DataFrame) -> pa.Table:
        if not len(b):  # np.concatenate rejects an empty list of arrays
            return pa.table({
                key: pa.Array.from_pandas(b[key]),
                q_col: pa.array([], pa.float64()),
                out_col: pa.Array.from_pandas(b[value_col]),
            })
        b = b.sort_values([key, value_col], kind="mergesort")
        keys_arr = b[key].to_numpy()
        vals = b[value_col].to_numpy()
        # group start offsets + sizes from one run-length pass
        change = np.flatnonzero(keys_arr[1:] != keys_arr[:-1]) + 1
        starts = np.concatenate(([0], change))
        sizes = np.diff(np.concatenate((starts, [len(b)])))
        out_k, out_q, out_v = [], [], []
        for q in qlist:
            out_k.append(keys_arr[starts])
            out_q.append(np.full(len(starts), q))
            if interpolated:
                v = q * (sizes - 1)
                lo = np.floor(v).astype(np.int64)
                hi = np.ceil(v).astype(np.int64)
                frac = v - lo
                vlo = vals[starts + lo].astype(np.float64)
                vhi = vals[starts + hi].astype(np.float64)
                out_v.append(np.round(vlo + (vhi - vlo) * frac, ndigits))
            else:
                idx = starts + np.maximum(
                    np.ceil(q * sizes).astype(np.int64) - 1, 0)
                out_v.append(vals[idx])
        return pa.table({
            key: pa.array(np.concatenate(out_k)),
            q_col: pa.array(np.concatenate(out_q), pa.float64()),
            out_col: pa.array(np.concatenate(out_v)),
        })

    return grouped_blockwise(ds, [key], block)


def pivot_counts(
    ds: Dataset, index: str, column: str,
    *, categories: Sequence[str] | None = None,
) -> Dataset:
    """Crosstab: one row per ``index`` value, one int64 count column
    per category of ``column``. Pass ``categories`` explicitly at scale
    (fixes the schema with no discovery pass); otherwise a distinct
    scan collects the category domain (assumed small) to the driver."""
    if categories is None:
        from .agg import distinct_rows

        cats = sorted(
            r[column]
            for r in distinct_rows(ds.select_columns([column]), [column])
            .take_all()
        )
    else:
        cats = list(categories)

    def pre(b: pd.DataFrame) -> pa.Table:
        ct = pd.crosstab(b[index], b[column])
        ct = ct.reindex(columns=cats, fill_value=0).astype("int64")
        ct = ct.rename_axis(None, axis=1).reset_index()
        return pa.Table.from_pandas(ct, preserve_index=False)

    def final(b: pd.DataFrame) -> pa.Table:
        out = b.groupby(index, sort=False)[cats].sum().reset_index()
        out[cats] = out[cats].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    partial = ds.map_batches(pre, batch_format="pandas")
    return grouped_blockwise(partial, [index], final)


def paired_moments(
    ds: Dataset, key: str, x_col: str, y_col: str,
    *, ndigits: int = 6,
) -> Dataset:
    """Per-group exact paired moments → Pearson correlation and sample
    covariance. ``x_col``/``y_col`` must be integer-valued (pre-scale
    floats with floor upstream): all six partial sums stay exact int64,
    so the final double-precision formula is bit-identical across
    engines. Output: key, n_rows, corr, covar (both rounded)."""

    def pre(b: pd.DataFrame) -> pa.Table:
        x = b[x_col].to_numpy().astype("int64")
        y = b[y_col].to_numpy().astype("int64")
        d = pd.DataFrame({
            key: b[key], "n": np.int64(1), "sx": x, "sy": y,
            "sxx": x * x, "syy": y * y, "sxy": x * y,
        })
        out = d.groupby(key, sort=False).sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    sums = ["n", "sx", "sy", "sxx", "syy", "sxy"]

    def final(b: pd.DataFrame) -> pa.Table:
        t = b.groupby(key, sort=False)[sums].sum().reset_index()
        n = t["n"].to_numpy().astype("float64")
        sx = t["sx"].to_numpy().astype("float64")
        sy = t["sy"].to_numpy().astype("float64")
        sxx = t["sxx"].to_numpy().astype("float64")
        syy = t["syy"].to_numpy().astype("float64")
        sxy = t["sxy"].to_numpy().astype("float64")
        corr = (n * sxy - sx * sy) / (
            np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
        )
        covar = (sxy - sx * sy / n) / (n - 1.0)
        out = pd.DataFrame({
            key: t[key],
            "n_rows": t["n"].astype("int64"),
            "corr": np.round(corr, ndigits),
            "covar": np.round(covar, ndigits),
        })
        return pa.Table.from_pandas(out, preserve_index=False)

    partial = ds.map_batches(pre, batch_format="pandas")
    return grouped_blockwise(partial, [key], final)


def histogram(
    ds: Dataset, value_col: str, *, lo: float, hi: float, nbins: int,
) -> Dataset:
    """Fixed-width histogram of ``value_col`` over [lo, hi): per-batch
    bin assignment (one vectorized expression — the same IEEE ops the
    SQL oracle runs, so bin edges agree bit-exactly), then a map-side-
    combined group count. Out-of-range rows clamp into the edge bins;
    only non-empty bins are emitted (matching SQL GROUP BY)."""
    width = (hi - lo) / nbins

    def binned(b: pd.DataFrame) -> pa.Table:
        v = b[value_col].to_numpy().astype("float64")
        bins = np.floor((v - lo) / width)
        bins = np.minimum(np.maximum(bins, 0.0), float(nbins - 1))
        return pa.table({"bin": pa.array(bins.astype("int64"), pa.int64())})

    from .agg import partial_group_count

    return partial_group_count(
        ds.map_batches(binned, batch_format="pandas"), "bin"
    )


def ndistinct_by(ds: Dataset, key: str, col: str) -> Dataset:
    """Exact per-key distinct count of ``col`` (SQL
    ``COUNT(DISTINCT col) GROUP BY key``) in two map-side-combined
    shuffles: per-block dedup of (key, col) pairs shrinks the first
    shuffle to unique pairs, then a grouped pair count."""
    from .agg import distinct_rows, partial_group_count

    pairs = distinct_rows(ds.select_columns([key, col]), [key, col])
    return partial_group_count(pairs.select_columns([key]), key,
                               count_name="n_distinct")


def rollup_counts(ds: Dataset, keys: Sequence[str],
                  *, count_name: str = "n") -> Dataset:
    """SQL ``GROUP BY ROLLUP(keys...)`` row counts: one row per prefix
    level, rolled-up columns NULL. The full-resolution counts are
    map-side combined once (the only shuffle over data); every coarser
    level re-aggregates the fine counts (tiny tables), and the grand
    total is a scalar sum of the fine partials."""
    from .agg import grouped_blockwise, partial_group_count

    keys = list(keys)
    fine = partial_group_count(ds, keys, count_name=count_name).materialize()
    fine_schema = fine.schema().base_schema
    schema = pa.schema(
        [fine_schema.field(k) for k in keys]
        + [pa.field(count_name, pa.int64())]
    )

    def to_schema(out: pd.DataFrame) -> pa.Table:
        # rolled-up key columns are all-None; cast pins them to the
        # fine level's types so union sees one schema
        out[count_name] = out[count_name].astype("int64")
        t = pa.Table.from_pandas(out[keys + [count_name]],
                                 preserve_index=False)
        return t.cast(schema)

    def level_fn(prefix: list[str]):
        def final(b: pd.DataFrame) -> pa.Table:
            out = (
                b.groupby(prefix, sort=False)[count_name]
                .sum().reset_index()
            )
            for k in keys[len(prefix):]:
                out[k] = pd.Series([None] * len(out), dtype="object")
            return to_schema(out)
        return final

    levels = [fine.map_batches(
        lambda b: to_schema(b.copy()), batch_format="pandas",
    )]
    for k in range(len(keys) - 1, 0, -1):
        levels.append(
            grouped_blockwise(fine, keys[:k], level_fn(keys[:k]))
        )
    total = int(fine.sum(count_name))
    grand = pd.DataFrame({k: pd.Series([None], dtype="object")
                          for k in keys})
    grand[count_name] = np.int64(total)
    levels.append(rd.from_arrow(to_schema(grand)))

    from .blocks import scrub_empty_blocks

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(scrub_empty_blocks(lv, target_blocks=1))
    return out


def cube_counts(ds: Dataset, keys: Sequence[str],
                *, count_name: str = "n") -> Dataset:
    """SQL ``GROUP BY CUBE(keys...)`` row counts: one row per grouping
    subset, rolled-up columns NULL. Same single-shuffle shape as
    :func:`rollup_counts` — every subset re-aggregates the fine-level
    counts (tiny), so adding subsets costs no extra pass over data."""
    from itertools import combinations

    from .agg import grouped_blockwise, partial_group_count
    from .blocks import scrub_empty_blocks

    keys = list(keys)
    fine = partial_group_count(ds, keys, count_name=count_name).materialize()
    fine_schema = fine.schema().base_schema
    schema = pa.schema(
        [fine_schema.field(k) for k in keys]
        + [pa.field(count_name, pa.int64())]
    )

    def to_schema(out: pd.DataFrame) -> pa.Table:
        out[count_name] = out[count_name].astype("int64")
        t = pa.Table.from_pandas(out[keys + [count_name]],
                                 preserve_index=False)
        return t.cast(schema)

    def level_fn(subset: list[str]):
        def final(b: pd.DataFrame) -> pa.Table:
            out = (
                b.groupby(subset, sort=False)[count_name]
                .sum().reset_index()
            )
            for k in keys:
                if k not in subset:
                    out[k] = pd.Series([None] * len(out), dtype="object")
            return to_schema(out)
        return final

    levels = [fine.map_batches(
        lambda b: to_schema(b.copy()), batch_format="pandas",
    )]
    for r in range(len(keys) - 1, 0, -1):
        for subset in combinations(keys, r):
            levels.append(
                grouped_blockwise(fine, list(subset),
                                  level_fn(list(subset)))
            )
    total = int(fine.sum(count_name))
    grand = pd.DataFrame({k: pd.Series([None], dtype="object")
                          for k in keys})
    grand[count_name] = np.int64(total)
    levels.append(rd.from_arrow(to_schema(grand)))

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(scrub_empty_blocks(lv, target_blocks=1))
    return out


def grouped_zscore_outliers(
    ds: Dataset, key: str, id_col: str, x_col: str,
    *, threshold: float = 3.0,
) -> Dataset:
    """Per-group z-score outlier flagging over an INTEGER metric
    column: rows with ``|x - mean| / stddev_samp > threshold`` within
    their ``key`` group. The anomaly-detection / data-cleaning step of
    corpus curation.

    Same exactness contract as :func:`paired_moments`: the group
    moments are EXACT int64 partial sums (map-side combined, one tiny
    shuffle), and mean/stddev come from the closed-form double formula
    ``(s2 - s1*s1/n) / (n-1)`` evaluated identically by any SQL engine
    — so the emitted z doubles are bit-identical to the oracle's with
    no rounding. The group-stats table is #groups rows (bounded small
    by contract); it is collected once and broadcast, so the data pass
    is a single streaming filter."""
    import numpy as np
    import ray

    from .broadcast import get_broadcast

    def pre(b: pd.DataFrame) -> pa.Table:
        x = b[x_col].to_numpy().astype("int64")
        g = pd.DataFrame({key: b[key], "x": x, "xx": x * x})
        out = g.groupby(key, sort=False).agg(
            n=("x", "size"), s1=("x", "sum"), s2=("xx", "sum"))
        return pa.Table.from_pandas(out.reset_index(),
                                    preserve_index=False)

    partial = ds.map_batches(pre, batch_format="pandas")
    stats = (partial.to_pandas()
             .groupby(key, as_index=False).agg(
                 n=("n", "sum"), s1=("s1", "sum"), s2=("s2", "sum")))
    mean = stats["s1"].to_numpy(dtype=np.float64) / stats["n"].to_numpy()
    s1f = stats["s1"].to_numpy(dtype=np.float64)
    var = ((stats["s2"].to_numpy(dtype=np.float64)
            - s1f * stats["s1"].to_numpy(dtype=np.float64)
            / stats["n"].to_numpy())
           / (stats["n"].to_numpy() - 1))
    ref = ray.put({
        k: (m, np.sqrt(v))
        for k, m, v in zip(stats[key], mean, var)
    })

    def flag(b: pd.DataFrame) -> pa.Table:
        lut = get_broadcast(ref)
        ms = b[key].map(lambda k: lut[k][0]).to_numpy(dtype=np.float64)
        sds = b[key].map(lambda k: lut[k][1]).to_numpy(dtype=np.float64)
        x = b[x_col].to_numpy().astype("int64")
        z = (x.astype(np.float64) - ms) / sds
        keep = np.abs(z) > threshold
        out = b.loc[keep, [id_col, key]].copy()
        out[x_col] = x[keep]
        out["z"] = z[keep]
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(flag, batch_format="pandas")


def winsorize_by_group(
    ds: Dataset, key: str, id_col: str, x_col: str,
    *, lo_q: float = 0.05, hi_q: float = 0.95,
) -> Dataset:
    """Per-group winsorization (outlier clipping) of an integer metric
    at the [lo_q, hi_q] DISCRETE quantiles — the robust-statistics
    cleaning step of corpus curation. quantile_disc order statistics
    are exact ints, so clipped values match any SQL engine exactly.
    The per-group (lo, hi) table is #groups rows (bounded small by
    contract): computed by :func:`grouped_quantiles`, collected once,
    broadcast; the data pass is one streaming clip."""
    import ray

    from .broadcast import get_broadcast

    q = grouped_quantiles(ds.select_columns([key, x_col]), key, x_col,
                          [lo_q, hi_q], interpolated=False)
    qdf = q.to_pandas()
    lut = {}
    for k, g in qdf.groupby(key):
        s = dict(zip(g["q"], g[x_col]))
        lut[k] = (int(s[lo_q]), int(s[hi_q]))
    ref = ray.put(lut)

    def clip(b: pd.DataFrame) -> pa.Table:
        m = get_broadcast(ref)
        lo = b[key].map(lambda k: m[k][0]).to_numpy()
        hi = b[key].map(lambda k: m[k][1]).to_numpy()
        x = b[x_col].to_numpy().astype("int64")
        out = b[[id_col, key]].copy()
        out[x_col] = x
        out[f"{x_col}_wins"] = np.clip(x, lo, hi).astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(clip, batch_format="pandas")


def histogram_quantile_sketch(
    ds: Dataset, group_col: str, value_col: str, *,
    lo: float = 0.0, hi: float = 110_000.0, bins: int = 512,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
) -> Dataset:
    """Mergeable approximate per-group quantiles from a fixed-bin
    histogram sketch: (group, q, est) with error bounded by one bin
    width. Completes the sketch family (CMS = frequency, HLL =
    cardinality, this = quantiles) for columns whose exact
    distributed sort would be an all-to-all at 100 TB.

    Deterministic by construction: each batch contributes int64 bin
    counts (``floor((clip(v) - lo) / width)``) and integer addition is
    order-free, so the merged histogram — and the interpolation
    formula below, evaluated on exact int64 counts in IEEE doubles —
    is bit-reproducible and certified by a plain SQL oracle (window
    cumsum + first-bin-at-or-above ``q*n`` + identical linear
    interpolation, both sides rounded to 6 dp).

    Scale shape: the shuffle moves (group, bin, count) partials —
    O(groups x bins) per block ceiling, map-side combined — never the
    values; one small grouped merge computes every quantile.
    """
    from .agg import grouped_blockwise

    width = (hi - lo) / bins

    def partial(b: pd.DataFrame) -> pa.Table:
        v = b[value_col].to_numpy(np.float64)
        idx = np.clip(np.floor((v - lo) / width), 0, bins - 1).astype(
            np.int64
        )
        df = pd.DataFrame({group_col: b[group_col].to_numpy(), "b": idx})
        out = (
            df.groupby([group_col, "b"], sort=False)
            .size().rename("c").reset_index()
        )
        out["c"] = out["c"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.select_columns([group_col, value_col]).map_batches(
        partial, batch_format="pandas"
    )

    qs_arr = np.asarray(list(qs), np.float64)

    def final(b: pd.DataFrame) -> pa.Table:
        g_out, q_out, est_out = [], [], []
        for g, grp in b.groupby(group_col, sort=True):
            agg = grp.groupby("b", sort=True)["c"].sum()
            bs = agg.index.to_numpy(np.int64)
            cs = agg.to_numpy(np.int64)
            cum = np.cumsum(cs)
            n = int(cum[-1])
            for q in qs_arr:
                t = q * n
                i = int(np.searchsorted(cum, t, side="left"))
                if i >= len(bs):
                    i = len(bs) - 1
                bstar = int(bs[i])
                c = int(cs[i])
                cumprev = int(cum[i] - c)
                est = lo + width * (bstar + (t - cumprev) / c)
                g_out.append(g)
                q_out.append(float(q))
                est_out.append(round(est, 6))
        return pa.table(
            {
                group_col: pa.array(g_out),
                "q": pa.array(q_out, pa.float64()),
                "est": pa.array(est_out, pa.float64()),
            }
        )

    return grouped_blockwise(parts, [group_col], final)
