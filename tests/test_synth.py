"""Synthetic-world generator: determinism, schema, shuffle property."""

from __future__ import annotations

import pyarrow as pa

from kgdata_ray.synth import (
    SynthConfig,
    config_for_sf,
    gazetteer_table,
    redirects_table,
    sf_from_dir,
    transcripts_dataset,
    transcripts_table,
)


def test_schema_and_determinism(small_cfg):
    t1 = transcripts_table(small_cfg)
    t2 = transcripts_table(small_cfg)
    assert t1.equals(t2)
    assert t1.schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert t1.schema.field("turn_idx").type == pa.int32()
    assert t1.schema.field("ts").type == pa.timestamp("us")


def test_turns_written_shuffled(small_cfg):
    t = transcripts_table(small_cfg)
    df = t.to_pandas()
    # at least one conversation stores its turns out of order
    unsorted = sum(
        not g["turn_idx"].is_monotonic_increasing
        for _, g in df.groupby("conv_id")
    )
    assert unsorted > 0


def test_distributed_matches_driver(small_cfg):
    ds = transcripts_dataset(small_cfg, conv_per_block=37)
    df_d = ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    df_l = (
        transcripts_table(small_cfg)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert df_d.equals(df_l)


def test_gazetteer_and_redirects(small_cfg):
    gz = gazetteer_table(small_cfg)
    rt = redirects_table(small_cfg)
    assert gz.num_rows > small_cfg.n_entities  # >1 alias per entity
    assert rt.num_rows == small_cfg.n_redirects
    # multi-hop chains exist
    srcs = set(rt.column("src_id").to_pylist())
    dsts = set(rt.column("dst_id").to_pylist())
    assert srcs & dsts


def test_sf_parsing():
    assert sf_from_dir("/root/testdata/sf0.01") == 0.01
    assert sf_from_dir("/root/testdata/sf0.001/") == 0.001
    assert config_for_sf(0.001).n_convs == 1000
