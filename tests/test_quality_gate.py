"""expectation_violations, winsorize_by_group, partitioned roundtrip."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from kgdata_ray.functions.checks import expectation_violations
from kgdata_ray.functions.stats import winsorize_by_group

SF = "/root/testdata/sf0.001"


def test_expectation_violations():
    df = pd.DataFrame({
        "id": [1, 2, 3, 4],
        "v": [5.0, -1.0, 900.0, 10.0],
        "t": ["ok", "ok", "bad", "ok"],
    })
    rules = {
        "v_range": lambda b: (b["v"] < 0) | (b["v"] > 400),
        "t_known": lambda b: b["t"] != "ok",
    }
    got = expectation_violations(rd.from_pandas(df), "id",
                                 rules).to_pandas()
    assert {(r.id, r.rule) for r in got.itertuples()} == {
        (2, "v_range"), (3, "v_range"), (3, "t_known")}


def test_expectation_violations_clean_batch():
    df = pd.DataFrame({"id": [1, 2], "v": [1.0, 2.0]})
    got = expectation_violations(
        rd.from_pandas(df), "id",
        {"neg": lambda b: b["v"] < 0}).to_pandas()
    assert len(got) == 0


def test_winsorize_matches_quantile_disc():
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    ev["x"] = np.floor(ev["value"]).astype("int64")
    got = winsorize_by_group(
        rd.from_pandas(ev[["event_id", "event_type", "x"]]),
        "event_type", "event_id", "x",
        lo_q=0.1, hi_q=0.9).to_pandas()

    def disc(s, q):  # DuckDB quantile_disc: element at ceil(q*n)-1
        v = np.sort(s.to_numpy())
        return v[max(int(np.ceil(q * len(v))) - 1, 0)]

    lut = {k: (disc(g["x"], 0.1), disc(g["x"], 0.9))
           for k, g in ev.groupby("event_type")}
    exp = ev[["event_id", "event_type", "x"]].copy()
    lo = exp["event_type"].map(lambda k: lut[k][0])
    hi = exp["event_type"].map(lambda k: lut[k][1])
    exp["x_wins"] = np.clip(exp["x"], lo, hi).astype("int64")
    g = got.sort_values("event_id").reset_index(drop=True)
    e = exp.sort_values("event_id").reset_index(drop=True)
    assert g[["event_id", "x", "x_wins"]].equals(
        e[["event_id", "x", "x_wins"]])
    # clipping must have changed at least one row at these quantiles
    assert (g["x"] != g["x_wins"]).any()


def test_sequence_packing_hand_case():
    from kgdata_ray.stages.textstats import sequence_packing

    # capacity 10: doc1 (7 tok) -> bin 0; doc2 (6) spans bins 0-1;
    # doc3 (0 tok, empty) sits at position 13 -> bin 1;
    # doc4 (12) spans bins 1-2.
    df = pd.DataFrame({"doc_id": [3, 1, 4, 2],
                       "n": [0, 7, 12, 6]})
    got = sequence_packing(rd.from_pandas(df), "doc_id", "n",
                           capacity=10).to_pandas()
    pairs = sorted(zip(got.doc_id, got.bin_id))
    assert pairs == [(1, 0), (2, 0), (2, 1), (3, 1),
                     (4, 1), (4, 2)]
    # every bin index in a contiguous run per doc
    for d in set(got.doc_id):
        bs = sorted(got[got.doc_id == d].bin_id)
        assert bs == list(range(bs[0], bs[-1] + 1))


def test_weighted_sample_bias_and_determinism():
    from kgdata_ray.functions.sampling import weighted_sample

    orders = rd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])
    a = weighted_sample(orders, "o_orderkey", "o_totalprice",
                        40).to_pandas()
    b = weighted_sample(orders, "o_orderkey", "o_totalprice",
                        40).to_pandas()
    assert sorted(a.o_orderkey) == sorted(b.o_orderkey)  # deterministic
    full = pd.read_parquet(f"{SF}/orders.parquet",
                           columns=["o_totalprice"])
    # weighting by price must pull the sample mean above the population
    assert a.o_totalprice.mean() > full.o_totalprice.mean()


def test_split_assign_disjoint_exhaustive():
    from kgdata_ray.functions.sampling import split_assign

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id"])
    out = split_assign(docs, "doc_id", fractions=[0.5, 0.25, 0.25],
                       labels=["a", "b", "c"], salt="s").to_pandas()
    n = pd.read_parquet(f"{SF}/documents.parquet").shape[0]
    assert len(out) == n  # exhaustive
    assert set(out["split"]) <= {"a", "b", "c"}
    assert out["doc_id"].is_unique  # disjoint (one label per key)
    frac_a = (out["split"] == "a").mean()
    assert 0.3 < frac_a < 0.7


def test_unigram_logprob_matches_naive():
    import math
    import re as _re

    from kgdata_ray.stages.textstats import unigram_logprob_scores

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    got = unigram_logprob_scores(
        rd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])).to_pandas()
    toks = {r.doc_id: [t for t in _re.split(
        "[^a-z0-9]+", r.text.lower()) if t]
        for r in docs.itertuples()}
    counts: dict = {}
    for ts in toks.values():
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
    total = sum(counts.values())
    exp = {d: round(sum(-math.log(counts[t] / total) for t in ts)
                    / len(ts), 6)
           for d, ts in toks.items() if ts}
    got_map = dict(zip(got.doc_id, got.avg_neg_logp))
    assert set(got_map) == set(exp)
    assert all(abs(got_map[d] - exp[d]) < 2e-6 for d in exp)


def test_hash_threshold_one_keeps_everything():
    from kgdata_ray.functions.sampling import (
        hash_threshold,
        stratified_sample,
    )

    # fraction=1.0 must compare greater than every 8-hex prefix; the
    # naive 9-char '100000000' string-compares LESS than most prefixes
    assert "ffffffff" < hash_threshold(1.0)
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang"])
    out = stratified_sample(docs, "lang", "doc_id", {}, default=1.0,
                            salt="x").to_pandas()
    n = pd.read_parquet(f"{SF}/documents.parquet").shape[0]
    assert len(out) == n  # keep-all default really keeps all


def test_make_training_set_shape():
    import __ray_entry__ as E

    out = E.queries()["make_training_set"](SF)
    df = out.to_pandas()
    assert list(df.columns) == ["doc_id", "split", "bin_id"]
    assert set(df["split"]) <= {"train", "val"}
    tr = df[df.split == "train"]
    assert (df.loc[df.split == "val", "bin_id"] == -1).all()
    # train bins form a contiguous range from 0
    bins = sorted(tr.bin_id.unique())
    assert bins[0] == 0 and bins == list(range(len(bins)))


def test_unigram_plans_agree():
    from kgdata_ray.stages.textstats import unigram_logprob_scores

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    a = (unigram_logprob_scores(docs).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (unigram_logprob_scores(docs, plan="join").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert (a["doc_id"] == b["doc_id"]).all()
    assert (a["n_tokens"] == b["n_tokens"]).all()
    assert np.allclose(a["avg_neg_logp"], b["avg_neg_logp"],
                       atol=2e-6)


def test_weighted_sample_large_keys_no_overflow():
    # Keys >= 2^32 used to wrap in signed int64 (round-3 ADVICE); the
    # uint64 multiply must match exact big-int arithmetic mod 2^32.
    from kgdata_ray.functions.sampling import _KNUTH, weighted_sample

    keys = [3, 10**10, 2**62, 2**63 - 1]
    df = pd.DataFrame({"k": keys, "w": [1.0, 2.0, 3.0, 4.0]})
    got = weighted_sample(rd.from_pandas(df), "k", "w", 2).to_pandas()

    def es_key(k, w):
        h = (k * _KNUTH) % (1 << 32)  # exact python big-int
        return -np.log((h + 1.0) / float(1 << 32)) / w

    want = sorted(keys, key=lambda k: (es_key(k, df.set_index("k").w[k]), k))[:2]
    assert sorted(got.k) == sorted(want)

    with pytest.raises(Exception):  # negative keys are rejected loudly
        weighted_sample(
            rd.from_pandas(pd.DataFrame({"k": [-1], "w": [1.0]})),
            "k", "w", 1).to_pandas()


def test_json_extract_missing_int_field_yields_null():
    # round-3 ADVICE: a missing key with a non-nullable int dtype must
    # widen to the pandas nullable twin, not crash the batch.
    from kgdata_ray.functions.text import json_extract_fields

    df = pd.DataFrame({"payload": ['{"a": 1}', '{"b": 2}', None]})
    out = json_extract_fields(
        rd.from_pandas(df), "payload",
        {"a": ("a", "int64")}).to_pandas()
    assert str(out["a"].dtype) == "Int64"
    assert out["a"].tolist()[0] == 1
    assert out["a"].isna().sum() == 2
    # no missing values -> dtype stays the requested non-nullable one
    out2 = json_extract_fields(
        rd.from_pandas(pd.DataFrame({"payload": ['{"a": 1}']})),
        "payload", {"a": ("a", "int64")}).to_pandas()
    assert str(out2["a"].dtype) == "int64"
