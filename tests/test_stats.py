"""Unit tests for the distributed statistics operators
(functions/stats.py): exact global / grouped discrete quantiles, pivot
counts with map-side partials, and exact paired moments.

All run multi-block with shuffled row order; quantiles are checked
against DuckDB's quantile_disc (the semantics the operators pin:
element at index ceil(q*n)-1), moments against numpy from exact sums.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd


def _frame(n: int = 3000, seed: int = 3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "g": rng.choice(list("abcde"), n),
        # duplicate-heavy values: order statistics land inside tie runs,
        # which also straddle sorted-block boundaries
        "v": rng.integers(0, 40, n).astype("float64"),
        "x": rng.integers(-50, 500, n),
        "y": rng.integers(0, 60, n),
    })


QS = [0.0, 0.1, 0.37, 0.5, 0.75, 0.9, 1.0]


def test_global_quantiles_match_duckdb():
    from kgdata_ray.functions.stats import global_quantiles

    df = _frame()
    got = (
        global_quantiles(rd.from_pandas(df).repartition(9), "v", QS)
        .to_pandas().sort_values("q").reset_index(drop=True)
    )
    ref = pd.DataFrame({
        "q": QS,
        "v": [duckdb.sql(f"SELECT quantile_disc(v, {q}) FROM df").fetchone()[0]
              for q in QS],
    })
    assert len(got) == len(QS)
    np.testing.assert_array_equal(got["q"].to_numpy(), ref["q"].to_numpy())
    np.testing.assert_array_equal(got["v"].to_numpy(), ref["v"].to_numpy())


def test_grouped_quantiles_match_duckdb():
    from kgdata_ray.functions.stats import grouped_quantiles

    df = _frame()
    got = (
        grouped_quantiles(rd.from_pandas(df).repartition(7), "g", "v",
                          [0.25, 0.5, 0.9])
        .to_pandas().sort_values(["g", "q"]).reset_index(drop=True)
    )
    ref = duckdb.sql(" UNION ALL ".join(
        f"SELECT g, CAST({q} AS DOUBLE) AS q, quantile_disc(v, {q}) AS v "
        f"FROM df GROUP BY g"
        for q in [0.25, 0.5, 0.9]
    ) + " ORDER BY g, q").df()
    pd.testing.assert_frame_equal(got, ref)


def test_pivot_counts_explicit_and_discovered_categories():
    from kgdata_ray.functions.stats import pivot_counts

    df = _frame()
    ds = rd.from_pandas(df).repartition(6)
    explicit = (
        pivot_counts(ds, "x", "g", categories=list("abcde"))
        .to_pandas().sort_values("x").reset_index(drop=True)
    )
    discovered = (
        pivot_counts(ds, "x", "g")
        .to_pandas().sort_values("x").reset_index(drop=True)
    )
    ref = (
        pd.crosstab(df["x"], df["g"]).reindex(columns=list("abcde"),
                                              fill_value=0)
        .astype("int64").rename_axis(None, axis=1).reset_index()
        .sort_values("x").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(explicit, ref)
    pd.testing.assert_frame_equal(discovered, ref)
    # zero cells really are zero-filled, not dropped
    assert (explicit[list("abcde")].to_numpy() == 0).any()


def test_paired_moments_match_numpy_exact_sums():
    from kgdata_ray.functions.stats import paired_moments

    df = _frame()
    got = (
        paired_moments(rd.from_pandas(df).repartition(8), "g", "x", "y")
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    rows = []
    for g, sub in df.groupby("g"):
        x = sub["x"].to_numpy().astype("int64")
        y = sub["y"].to_numpy().astype("int64")
        n = float(len(x))
        sx, sy = float(x.sum()), float(y.sum())
        sxx, syy = float((x * x).sum()), float((y * y).sum())
        sxy = float((x * y).sum())
        corr = (n * sxy - sx * sy) / (
            np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy))
        covar = (sxy - sx * sy / n) / (n - 1.0)
        rows.append((g, len(x), round(corr, 6), round(covar, 6)))
    ref = pd.DataFrame(rows, columns=["g", "n_rows", "corr", "covar"])
    ref["n_rows"] = ref["n_rows"].astype("int64")
    pd.testing.assert_frame_equal(got, ref)


def test_histogram_clamps_and_counts():
    from kgdata_ray.functions.stats import histogram

    df = pd.DataFrame({"v": [-5.0, 0.0, 0.49, 0.5, 0.99, 1.0, 7.0]})
    got = (
        histogram(rd.from_pandas(df).repartition(3), "v",
                  lo=0.0, hi=1.0, nbins=2)
        .to_pandas().sort_values("bin").reset_index(drop=True)
    )
    # -5 clamps to bin 0; 1.0 and 7.0 clamp to bin 1
    ref = pd.DataFrame({"bin": [0, 1], "n": [3, 4]}).astype("int64")
    pd.testing.assert_frame_equal(got, ref)


def test_ndistinct_by_matches_pandas():
    from kgdata_ray.functions.stats import ndistinct_by

    df = _frame()
    got = (
        ndistinct_by(rd.from_pandas(df).repartition(6), "g", "x")
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    ref = (
        df.groupby("g")["x"].nunique().rename("n_distinct").reset_index()
    )
    ref["n_distinct"] = ref["n_distinct"].astype("int64")
    pd.testing.assert_frame_equal(got, ref)


def test_hash_sample_deterministic_and_keyed():
    import duckdb as ddb

    from kgdata_ray.functions.sampling import hash_sample, hash_threshold

    df = _frame(n=4000)
    ds = rd.from_pandas(df).repartition(5)
    a = hash_sample(ds, "x", 0.3, salt="z").to_pandas()
    b = hash_sample(ds, "x", 0.3, salt="z").to_pandas()
    # deterministic: two runs give the identical row set
    key = lambda d: sorted(map(tuple, d[["x", "y"]].to_numpy()))
    assert key(a) == key(b)
    # keyed: every occurrence of a key is in or out together
    in_keys = set(a["x"])
    assert all((x in in_keys) == (x in in_keys) for x in df["x"])
    n_expected = df[df["x"].isin(in_keys)].shape[0]
    assert len(a) == n_expected
    # matches the SQL predicate exactly
    cut = hash_threshold(0.3)
    ref = ddb.sql(
        "SELECT * FROM df WHERE substr(md5('z' || CAST(x AS VARCHAR)), 1, 8)"
        f" < '{cut}'"
    ).df()
    assert key(a) == key(ref)
    # fraction lands near 0.3 of the key space
    frac = len(set(a["x"])) / df["x"].nunique()
    assert 0.2 < frac < 0.4


def test_rollup_counts_matches_duckdb():
    import duckdb as ddb

    from kgdata_ray.functions.stats import rollup_counts

    df = _frame(n=2500)
    df["h"] = (df["x"] % 3).map({0: "p", 1: "q", 2: "r"})
    got = (
        rollup_counts(rd.from_pandas(df).repartition(5), ["g", "h"])
        .to_pandas()
        .sort_values(["g", "h"], na_position="first")
        .reset_index(drop=True)
    )
    ref = ddb.sql("""
        SELECT g, h, CAST(COUNT(*) AS BIGINT) AS n
        FROM df GROUP BY ROLLUP(g, h)
        ORDER BY g NULLS FIRST, h NULLS FIRST
    """).df()
    assert len(got) == len(ref)
    pd.testing.assert_frame_equal(got, ref)


def test_global_quantiles_interpolated_matches_duckdb():
    import duckdb as ddb

    from kgdata_ray.functions.stats import global_quantiles

    df = _frame()
    got = (
        global_quantiles(rd.from_pandas(df).repartition(9), "v", QS,
                         interpolated=True)
        .to_pandas().sort_values("q").reset_index(drop=True)
    )
    ref = pd.DataFrame({
        "q": QS,
        "v": [round(ddb.sql(
            f"SELECT quantile_cont(v, {q}) FROM df").fetchone()[0], 6)
            for q in QS],
    })
    np.testing.assert_array_equal(got["q"].to_numpy(), ref["q"].to_numpy())
    np.testing.assert_array_equal(got["v"].to_numpy(), ref["v"].to_numpy())
    # also equals numpy's 'linear' interpolation (rounded)
    np_ref = np.round(np.quantile(df["v"].to_numpy(), QS), 6)
    np.testing.assert_array_equal(got["v"].to_numpy(), np_ref)


def test_histogram_quantile_sketch_accuracy():
    # sketch estimate must be within one bin width of the exact
    # continuous quantile (the sketch's stated error bound)
    import duckdb
    import ray.data as rd

    from kgdata_ray.functions.stats import histogram_quantile_sketch

    sf = "/root/testdata/sf0.001"
    got = histogram_quantile_sketch(
        rd.read_parquet(f"{sf}/lineitem.parquet"),
        "l_returnflag", "l_extendedprice",
    ).to_pandas()
    con = duckdb.connect()
    exact = con.execute(f"""
        SELECT l_returnflag, 0.5 AS q,
               quantile_cont(l_extendedprice, 0.5) AS ex
        FROM read_parquet('{sf}/lineitem.parquet') GROUP BY 1
        UNION ALL
        SELECT l_returnflag, 0.9,
               quantile_cont(l_extendedprice, 0.9)
        FROM read_parquet('{sf}/lineitem.parquet') GROUP BY 1
        UNION ALL
        SELECT l_returnflag, 0.99,
               quantile_cont(l_extendedprice, 0.99)
        FROM read_parquet('{sf}/lineitem.parquet') GROUP BY 1
    """).df()
    exact["q"] = exact["q"].astype("float64")
    m = got.merge(exact, on=["l_returnflag", "q"])
    assert len(m) == len(got) == 9
    width = 110_000.0 / 512
    assert (abs(m["est"] - m["ex"]) <= width).all()
