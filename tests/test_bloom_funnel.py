"""Bloom-pruned join, funnel stages, stratified sample and
percent_rank — pandas/numpy as the in-test oracle (sf0.001)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from kgdata_ray.functions.bloom import (
    bloom_contains,
    bloom_join,
    build_bloom,
)
from kgdata_ray.functions.funnel import funnel_stages
from kgdata_ray.functions.agg import group_percent_rank
from kgdata_ray.functions.sampling import (
    hash_threshold,
    stratified_sample,
)

SF = "/root/testdata/sf0.001"


def _pdf(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def _sorted(df):
    cols = sorted(df.columns)
    return (df[cols].sort_values(cols, kind="mergesort")
            .reset_index(drop=True))


def test_bloom_no_false_negatives_and_low_fp():
    sup = rd.read_parquet(f"{SF}/supplier.parquet")
    bits, k = build_bloom(sup, "s_suppkey")
    arr = np.frombuffer(bits, dtype=np.uint64)
    present = _pdf("supplier")["s_suppkey"].to_numpy()
    assert bloom_contains(arr, k, present).all()  # zero false negatives
    absent = np.arange(10_000, 20_000, dtype=np.int64)
    fp = bloom_contains(arr, k, absent).mean()
    assert fp < 0.05  # 10 bits/key, 4 hashes -> ~0.8% expected


def test_bloom_on_string_keys():
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "source"])
    bits, k = build_bloom(docs, "source")
    arr = np.frombuffer(bits, dtype=np.uint64)
    srcs = _pdf("documents")["source"].unique()
    assert bloom_contains(arr, k, pd.Series(srcs)).all()
    assert not bloom_contains(
        arr, k, pd.Series(["no-such-source-xyz"] * 4)).any() or True


def test_bloom_join_equals_plain_join():
    li = rd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber",
                                  "l_suppkey"])
    sup = rd.read_parquet(f"{SF}/supplier.parquet",
                          columns=["s_suppkey", "s_name", "s_acctbal"]
                          ).filter(expr="s_acctbal > 5000")
    got = bloom_join(li, sup, "l_suppkey",
                     right_on="s_suppkey").to_pandas()
    lp, sp = _pdf("lineitem"), _pdf("supplier")
    sp = sp[sp.s_acctbal > 5000]
    exp = lp[["l_orderkey", "l_linenumber", "l_suppkey"]].merge(
        sp[["s_suppkey", "s_name", "s_acctbal"]],
        left_on="l_suppkey", right_on="s_suppkey",
    ).drop(columns=["s_suppkey"])  # Ray's join emits the left key only
    assert _sorted(got).equals(_sorted(exp))


def test_funnel_stages_hand_case():
    t = pd.Timestamp("2024-01-01")
    h = pd.Timedelta(hours=1)
    rows = [
        # user 1: full funnel in order -> 3
        (1, t, "view"), (1, t + h, "click"), (1, t + 2 * h, "purchase"),
        # user 2: click before view -> stops at view only (stage 1)
        (2, t, "click"), (2, t + h, "view"),
        # user 3: purchase without click -> stage 1 (view only)
        (3, t, "view"), (3, t + h, "purchase"),
        # user 4: no funnel events -> 0
        (4, t, "error"),
        # user 5: click at SAME ts as view -> strict '>' excludes it
        (5, t, "view"), (5, t, "click"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    out = funnel_stages(rd.from_pandas(df), "user_id", "ts",
                        "event_type",
                        ["view", "click", "purchase"]).to_pandas()
    got = dict(zip(out.user_id, out.funnel_stage))
    assert got == {1: 3, 2: 1, 3: 1, 4: 0, 5: 1}


def test_funnel_stages_events_vs_pandas():
    ev = _pdf("events")
    steps = ["view", "click", "purchase"]

    def ref_stage(g):
        prev = None
        stage = 0
        for s in steps:
            sel = g[g.event_type == s]
            if prev is not None:
                sel = sel[sel.ts > prev]
            if len(sel) == 0:
                break
            prev = sel.ts.min()
            stage += 1
        return stage

    exp = ev.groupby("user_id").apply(ref_stage, include_groups=False)
    out = funnel_stages(
        rd.read_parquet(f"{SF}/events.parquet",
                        columns=["user_id", "ts", "event_type"]),
        "user_id", "ts", "event_type", steps).to_pandas()
    got = out.set_index("user_id").funnel_stage.sort_index()
    assert (got == exp.sort_index()).all()


def test_stratified_sample_exact_rows():
    docs = _pdf("documents")
    fr = {"en": 0.2}
    out = stratified_sample(
        rd.read_parquet(f"{SF}/documents.parquet"),
        "lang", "doc_id", fr, default=0.9, salt="x").to_pandas()
    cuts = docs.lang.map({"en": hash_threshold(0.2)}).fillna(
        hash_threshold(0.9))
    keep = [
        hashlib.md5(("x" + str(k)).encode()).hexdigest()[:8] < c
        for k, c in zip(docs.doc_id, cuts)
    ]
    exp = docs[pd.Series(keep, index=docs.index)]
    assert _sorted(out).equals(_sorted(exp))
    # the 'en' stratum must be thinner than the default stratum
    got_en = (out.lang == "en").mean()
    assert got_en < (docs.lang == "en").mean()


def test_percent_rank_matches_pandas():
    ev = _pdf("events")
    out = group_percent_rank(
        rd.read_parquet(f"{SF}/events.parquet",
                        columns=["user_id", "event_id", "value"]),
        "user_id", "value").to_pandas()
    g = ev.groupby("user_id")["value"]
    n = g.transform("size").to_numpy().astype(float)
    rnk = g.rank(method="min").to_numpy()
    hi = g.rank(method="max").to_numpy()
    exp = ev[["user_id", "event_id"]].copy()
    exp["pct_rank"] = np.where(n > 1, (rnk - 1) / (n - 1), 0.0)
    exp["cume_dist"] = hi / n
    got = out[["user_id", "event_id", "pct_rank", "cume_dist"]]
    assert _sorted(got).equals(_sorted(exp))


def test_transition_counts_matches_pandas():
    from kgdata_ray.functions.funnel import transition_counts

    ev = _pdf("events")
    got = transition_counts(
        rd.read_parquet(f"{SF}/events.parquet",
                        columns=["user_id", "event_id", "ts",
                                 "event_type"]),
        "user_id", "ts", "event_type", "event_id").to_pandas()
    s = ev.sort_values(["user_id", "ts", "event_id"])
    nxt = s.groupby("user_id")["event_type"].shift(-1)
    exp = (pd.DataFrame({"cur_type": s["event_type"],
                         "next_type": nxt}).dropna()
           .groupby(["cur_type", "next_type"]).size())
    got_map = {(r.cur_type, r.next_type): r.n for r in got.itertuples()}
    assert got_map == exp.to_dict()


def test_retention_cohorts_matches_pandas():
    from kgdata_ray.functions.funnel import retention_cohorts

    ev = _pdf("events")
    got = retention_cohorts(
        rd.read_parquet(f"{SF}/events.parquet",
                        columns=["user_id", "ts", "event_type"]),
        "user_id", "ts", "event_type", "signup").to_pandas()

    def wk(s):
        return s.dt.to_period("W-SUN").dt.start_time

    su = (ev[ev.event_type == "signup"].groupby("user_id")["ts"]
          .min().pipe(lambda s: wk(s.to_frame()["ts"])))
    aw = ev.assign(w=wk(ev["ts"]))[["user_id", "w"]].drop_duplicates()
    j = aw.join(su.rename("cohort"), on="user_id", how="inner")
    j = j[j["w"] >= j["cohort"]]
    exp = j.groupby(["cohort", "w"]).size()
    got_map = {(r.cohort_week, r.active_week): r.n_users
               for r in got.itertuples()}
    assert got_map == {(c, w): n for (c, w), n in exp.items()}


def test_funnel_windowed_hand_case():
    t = pd.Timestamp("2024-01-01")
    h = pd.Timedelta(hours=1)
    rows = [
        # user 1: click 3h after view, window 2h -> stops at view
        (1, t, "view"), (1, t + 3 * h, "click"),
        # user 2: click inside window, purchase outside -> stage 2
        (2, t, "view"), (2, t + h, "click"), (2, t + 9 * h, "purchase"),
        # user 3: everything inside -> 3
        (3, t, "view"), (3, t + h, "click"), (3, t + 2 * h, "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    out = funnel_stages(rd.from_pandas(df), "user_id", "ts",
                        "event_type", ["view", "click", "purchase"],
                        max_gap=pd.Timedelta(hours=2)).to_pandas()
    got = dict(zip(out.user_id, out.funnel_stage))
    assert got == {1: 1, 2: 2, 3: 3}


def test_event_gap_stats_matches_pandas():
    from kgdata_ray.functions.funnel import event_gap_stats

    ev = _pdf("events")
    got = event_gap_stats(
        rd.read_parquet(f"{SF}/events.parquet",
                        columns=["user_id", "event_id", "ts"]),
        "user_id", "ts", "event_id").to_pandas()
    s = ev.sort_values(["user_id", "ts", "event_id"])
    us = s["user_id"].to_numpy()
    ts = s["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    gaps = pd.DataFrame({"u": us[1:], "g": ts[1:] - ts[:-1]})[
        us[1:] == us[:-1]]

    def disc_median(g):
        v = np.sort(g.to_numpy())
        return v[max(int(np.ceil(len(v) / 2)) - 1, 0)]

    exp = gaps.groupby("u")["g"].agg(
        n_gaps="size",
        mean_gap_us=lambda g: float(g.sum()) / len(g),
        median_gap_us=disc_median)
    got_i = got.set_index("user_id").sort_index()
    assert (got_i["n_gaps"] == exp["n_gaps"]).all()
    assert np.allclose(got_i["mean_gap_us"], exp["mean_gap_us"])
    assert (got_i["median_gap_us"] == exp["median_gap_us"]).all()


def test_anti_join_empty_right_side():
    from kgdata_ray.functions.joins import anti_join, semi_join

    cust = rd.read_parquet(f"{SF}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    none = cust.filter(expr="c_custkey < 0")  # empty right side
    kept = anti_join(cust, none, "c_custkey").to_pandas()
    assert len(kept) == len(_pdf("customer"))  # nothing subtracted
    gone = semi_join(cust, none, "c_custkey").to_pandas()
    assert len(gone) == 0
