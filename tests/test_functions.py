"""Engine-primitive tests against the TPC-H-ish testdata (sf0.001) with
pandas as the in-test oracle."""

from __future__ import annotations

import json

import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from kgdata_ray.functions.agg import (
    count_zero_fill,
    dict_merge_aggregate,
    distinct_rows,
    group_top_k,
    latest_wins,
    partial_group_count,
    zip_with_index,
)
from kgdata_ray.functions.hashing import (
    add_row_hash,
    commutative_checksum,
    diff_datasets,
)
from kgdata_ray.functions.joins import (
    anti_join,
    broadcast_join,
    equi_join,
    fk_explode_join,
    salted_join,
    semi_join,
)

SF = "/root/testdata/sf0.001"


def _pdf(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def _ds(name):
    return rd.read_parquet(f"{SF}/{name}.parquet")


@pytest.fixture(scope="module")
def orders_pdf():
    return _pdf("orders")


@pytest.fixture(scope="module")
def customer_pdf():
    return _pdf("customer")


def _sorted(df, cols=None):
    cols = cols or sorted(df.columns)
    return (
        df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    )


def test_equi_vs_broadcast_vs_salted_join(orders_pdf, customer_pdf):
    want = orders_pdf.merge(
        customer_pdf[["c_custkey", "c_name"]],
        left_on="o_custkey", right_on="c_custkey", how="inner",
    ).drop(columns=["c_custkey"])

    orders = _ds("orders")
    cust = _ds("customer").select_columns(["c_custkey", "c_name"])

    j_eq = equi_join(orders, cust, "o_custkey", right_on="c_custkey",
                     num_partitions=4).to_pandas()
    got_eq = j_eq[want.columns.tolist()]
    pd.testing.assert_frame_equal(_sorted(got_eq), _sorted(want))

    j_bc = broadcast_join(
        orders, customer_pdf[["c_custkey", "c_name"]],
        on="o_custkey", right_on="c_custkey", how="inner",
    ).to_pandas()
    pd.testing.assert_frame_equal(_sorted(j_bc[want.columns.tolist()]), _sorted(want))

    # low threshold so every customer key counts as hot -> fully salted path
    j_salt = salted_join(
        orders, cust, "o_custkey",
        right_on=None, hot_threshold=3, salt_batch=4, num_partitions=4,
    ) if False else salted_join(
        orders.rename_columns({"o_custkey": "k"}),
        cust.rename_columns({"c_custkey": "k"}),
        "k", hot_threshold=3, salt_batch=4, num_partitions=4,
    ).to_pandas()
    got_salt = j_salt.rename(columns={"k": "o_custkey"})[want.columns.tolist()]
    pd.testing.assert_frame_equal(_sorted(got_salt), _sorted(want))


def test_semi_anti_join(orders_pdf, customer_pdf):
    half = customer_pdf[customer_pdf["c_custkey"] % 2 == 0]
    half_ds = rd.from_pandas(half[["c_custkey"]])
    orders = _ds("orders")

    got_semi = semi_join(orders, half_ds, "o_custkey", right_on="c_custkey").to_pandas()
    want_semi = orders_pdf[orders_pdf["o_custkey"].isin(set(half["c_custkey"]))]
    assert len(got_semi) == len(want_semi)

    got_anti = anti_join(orders, half_ds, "o_custkey", right_on="c_custkey").to_pandas()
    assert len(got_anti) == len(orders_pdf) - len(want_semi)
    assert not set(got_anti["o_custkey"]) & set(half["c_custkey"])


def test_semi_anti_join_shuffle_plan(orders_pdf, customer_pdf):
    """Forced shuffle plan == broadcast plan, including the reference
    `subtract` shape where the RIGHT side is the larger table
    (extended_rdd.py:680-685: dangling ids = children - all known ids)."""
    half = customer_pdf[customer_pdf["c_custkey"] % 2 == 0]
    half_ds = rd.from_pandas(half[["c_custkey"]])
    orders = _ds("orders")

    for keep in (True, False):
        fn = semi_join if keep else anti_join
        a = fn(orders, half_ds, "o_custkey", right_on="c_custkey",
               plan="broadcast").to_pandas()
        b = fn(orders, half_ds, "o_custkey", right_on="c_custkey",
               plan="shuffle").to_pandas()
        pd.testing.assert_frame_equal(_sorted(a), _sorted(b))

    # right side larger than left (orders of even custkeys, ~750 rows,
    # vs customer 150): customers without such an order, shuffle plan
    cust = _ds("customer")
    even_orders = orders.map_batches(
        lambda b: b[b["o_custkey"] % 2 == 0], batch_format="pandas"
    )
    got = anti_join(
        cust, even_orders.select_columns(["o_custkey"]), "c_custkey",
        right_on="o_custkey", plan="shuffle",
    ).to_pandas()
    even = orders_pdf[orders_pdf["o_custkey"] % 2 == 0]
    want = customer_pdf[
        ~customer_pdf["c_custkey"].isin(set(even["o_custkey"]))
    ]
    assert len(even) > len(customer_pdf)  # reference `subtract` shape
    assert len(want) > 0
    assert sorted(got["c_custkey"]) == sorted(want["c_custkey"])
    assert list(got.columns) == list(customer_pdf.columns)


def test_fk_explode_join():
    left = rd.from_items(
        [
            {"id": "a", "fks": [1, 2]},
            {"id": "b", "fks": [2]},
            {"id": "c", "fks": []},
        ]
    )
    right = rd.from_items([{"rk": 1, "val": "x"}, {"rk": 2, "val": "y"}])
    got = fk_explode_join(
        left, right, fk_col="fks", id_col="id", right_key="rk",
        num_partitions=2,
    ).to_pandas()
    got = got.sort_values(["id", "fks"]).reset_index(drop=True)
    assert list(got["id"]) == ["a", "a", "b"]
    assert list(got["val"]) == ["x", "y", "y"]


def test_group_top_k(orders_pdf):
    got = group_top_k(
        _ds("orders"), "o_custkey",
        sort_cols=["o_totalprice", "o_orderkey"], ascending=[False, True], k=2,
    ).to_pandas()
    want = (
        orders_pdf.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True],
            kind="mergesort",
        )
        .groupby("o_custkey")
        .head(2)
    )
    assert len(got) == len(want)
    g = _sorted(got, ["o_custkey", "o_orderkey"])
    w = _sorted(want, ["o_custkey", "o_orderkey"])
    pd.testing.assert_frame_equal(g[["o_custkey", "o_orderkey"]], w[["o_custkey", "o_orderkey"]])


def test_latest_wins():
    ev = _pdf("events")
    got = latest_wins(_ds("events"), "user_id", "ts", tie_cols=["event_id"]).to_pandas()
    want = ev.sort_values(["ts", "event_id"], ascending=[False, True],
                          kind="mergesort").groupby("user_id").head(1)
    assert len(got) == ev["user_id"].nunique()
    g = got.set_index("user_id")["event_id"].sort_index()
    w = want.set_index("user_id")["event_id"].sort_index()
    pd.testing.assert_series_equal(g, w)


def test_distinct_rows():
    li = _pdf("lineitem")
    got = distinct_rows(_ds("lineitem"), ["l_returnflag", "l_linestatus"]).to_pandas()
    want = li[["l_returnflag", "l_linestatus"]].drop_duplicates()
    assert len(got) == len(want)
    assert set(map(tuple, got.values)) == set(map(tuple, want.values))


def test_partial_group_count_and_zero_fill():
    ev = _pdf("events")
    got = partial_group_count(_ds("events"), "event_type").to_pandas()
    want = ev.groupby("event_type").size()
    assert dict(zip(got["event_type"], got["n"])) == want.to_dict()

    # zero-fill over an artificial domain with an extra key
    domain = rd.from_items(
        [{"et": k} for k in sorted(ev["event_type"].unique())] + [{"et": "zzz_never"}]
    )
    z = count_zero_fill(_ds("events"), "event_type", domain, "et").to_pandas()
    assert int(z.set_index("et").loc["zzz_never", "n"]) == 0
    assert int(z["n"].sum()) == len(ev)


def test_dict_merge_aggregate():
    ev = _pdf("events")
    got = dict_merge_aggregate(_ds("events"), "user_id", "event_type").to_pandas()
    row = got[got["user_id"] == ev["user_id"].iloc[0]].iloc[0]
    want = ev[ev["user_id"] == ev["user_id"].iloc[0]]["event_type"].value_counts().to_dict()
    assert json.loads(row["counts"]) == want


def test_zip_with_index(orders_pdf):
    got = zip_with_index(_ds("orders"), sort_key="o_totalprice").to_pandas()
    assert sorted(got["index"]) == list(range(len(orders_pdf)))
    ordered = got.sort_values("index")
    assert ordered["o_totalprice"].is_monotonic_increasing


def test_checksum_invariance_and_diff():
    a = _ds("nation")
    c1 = commutative_checksum(a)
    c2 = commutative_checksum(_ds("nation").random_shuffle(seed=3).repartition(5))
    assert c1 == c2

    ndf = _pdf("nation")
    mod = ndf.copy()
    mod.loc[mod["n_nationkey"] == 3, "n_name"] = "CHANGED"
    mod = mod[mod["n_nationkey"] != 7]  # drop one
    d = diff_datasets(a, rd.from_pandas(mod), "n_nationkey", num_partitions=2).to_pandas()
    st = dict(zip(d["n_nationkey"].astype(int), d["status"]))
    assert st[3] == "changed" and st[7] == "left_only" and len(st) == 2


def test_row_hash_deterministic():
    h1 = add_row_hash(_ds("region"), ["r_regionkey", "r_name"]).to_pandas()
    h2 = add_row_hash(_ds("region"), ["r_regionkey", "r_name"]).to_pandas()
    assert sorted(h1["row_hash"]) == sorted(h2["row_hash"])
    assert h1["row_hash"].nunique() == len(h1)


def test_asof_join_backward():
    import pandas as pd
    import ray.data as rd

    from kgdata_ray.functions.joins import asof_join_backward

    left = rd.from_pandas(pd.DataFrame(
        {
            "id": [1, 2, 3, 4],
            "k": ["a", "a", "b", "c"],
            "t": [10, 25, 7, 5],
            "x": [1.0, 2.0, 3.0, 4.0],
        }
    ))
    right = rd.from_pandas(pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "z"],
            "t": [5, 10, 20, 9, 1],
            "y": [100.0, 200.0, 300.0, 400.0, 500.0],
        }
    ))
    got = (
        asof_join_backward(left, right, key="k", left_ts="t", right_ts="t",
                           right_payload=["y"])
        .to_pandas()
        .sort_values("id")
        .set_index("id")
    )
    assert got.loc[1, "prior_y"] == 200.0   # exact match t=10 allowed
    assert got.loc[1, "prior_t"] == 10
    assert got.loc[2, "prior_y"] == 300.0   # greatest t <= 25 is 20
    assert pd.isna(got.loc[3, "prior_y"])   # b: right t=9 > left t=7
    assert pd.isna(got.loc[4, "prior_y"])   # c: no right rows at all
    assert list(got.columns) == ["k", "t", "x", "prior_y", "prior_t"]


def test_join_partitions_env_routing(monkeypatch, orders_pdf, customer_pdf):
    """Every join-bearing signature defaults num_partitions=None and
    resolves through default_join_partitions(), which honors
    KGR_JOIN_PARTITIONS — the output block count of a materialized
    hash join equals the resolved partition count."""
    from kgdata_ray.functions.joins import (
        default_join_partitions,
        resolve_join_partitions,
    )

    monkeypatch.setenv("KGR_JOIN_PARTITIONS", "5")
    assert default_join_partitions() == 5
    assert resolve_join_partitions(None) == 5
    assert resolve_join_partitions(3) == 3  # explicit pins still win

    orders = _ds("orders")
    cust = _ds("customer").select_columns(["c_custkey", "c_name"])
    j = equi_join(orders, cust, "o_custkey", right_on="c_custkey").materialize()
    assert j.num_blocks() == 5

    monkeypatch.delenv("KGR_JOIN_PARTITIONS")
    # without the env var: scales with cluster CPUs, floor of 8
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 0))
    assert default_join_partitions() == max(8, cpus // 4)
