"""Skew stress: one pathologically long conversation and one
pathologically hot mention must not break reconstruction, rollups or
salted linking (SURVEY §7.4 hard parts)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from kgdata_ray.functions.joins import salted_join
from kgdata_ray.stages.reconstruct import conversations, reconstruct_turns


def _skewed_transcripts(n_long=5000, n_small=50):
    rows = []
    for t in range(n_long):  # one giant conversation
        rows.append(
            {"conv_id": "conv-big", "turn_idx": n_long - 1 - t,
             "role": "user", "text": f"turn {t}", "tool": "",
             "ts": 1_000_000 + t}
        )
    for c in range(n_small):
        rows.append(
            {"conv_id": f"conv-{c:04d}", "turn_idx": 0, "role": "user",
             "text": "hi", "tool": "", "ts": 2_000_000 + c}
        )
    return pd.DataFrame(rows)


def test_long_conversation_reconstruction():
    df = _skewed_transcripts()
    ds = rd.from_pandas(df).repartition(8)
    rec = reconstruct_turns(ds).to_pandas()
    assert len(rec) == len(df)
    big = rec[rec["conv_id"] == "conv-big"]
    assert list(big["turn_idx"]) == list(range(5000))

    conv = conversations(ds).to_pandas().set_index("conv_id")
    assert int(conv.loc["conv-big", "n_turns"]) == 5000
    assert (conv.drop(index="conv-big")["n_turns"] == 1).all()


def test_salted_conversations_rollup_matches_plain():
    from kgdata_ray.stages.reconstruct import conversations_salted

    df = _skewed_transcripts()
    ds = rd.from_pandas(df).repartition(8)
    plain = (
        conversations(ds).to_pandas()
        .sort_values("conv_id").reset_index(drop=True)
    )
    salted = (
        conversations_salted(rd.from_pandas(df).repartition(8),
                             turns_per_salt=512)
        .to_pandas()
        .sort_values("conv_id").reset_index(drop=True)
    )
    cols = ["conv_id", "n_turns", "first_ts", "last_ts", "dialogue"]
    pd.testing.assert_frame_equal(plain[cols], salted[cols],
                                  check_dtype=False)


def test_hot_key_salted_join_correctness():
    # 20k probe rows, 99% on ONE key; build side one row per key
    probe = pd.DataFrame(
        {"k": ["hot"] * 19_800 + [f"cold{i}" for i in range(200)],
         "x": range(20_000)}
    )
    build = pd.DataFrame(
        {"k": ["hot"] + [f"cold{i}" for i in range(200)],
         "v": range(201)}
    )
    got = salted_join(
        rd.from_pandas(probe).repartition(8),
        rd.from_pandas(build),
        "k", hot_threshold=1000, salt_batch=500, num_partitions=4,
    ).to_pandas()
    want = probe.merge(build, on="k")
    assert len(got) == len(want) == 20_000
    assert got["v"].sum() == want["v"].sum()
