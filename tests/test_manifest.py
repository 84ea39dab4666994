"""Manifest lineage + checkpoint-resume semantics."""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow.parquet as pq
import ray.data as rd

from kgdata_ray.pipelines.kg import kg_triples, kg_triples_checkpointed
from kgdata_ray.state.manifest import (
    has_complete_data,
    manifest_digest,
    read_manifest,
    run_stage,
    write_dataset,
)
from kgdata_ray.synth import (
    SynthConfig,
    gazetteer_table,
    redirects_table,
    transcripts_dataset,
)


def test_write_and_validate(tmp_path):
    ds = rd.range(100)
    out = tmp_path / "stage1"
    m = write_dataset(ds, out, name="stage1", params={"x": 1})
    assert m["total_rows"] == 100
    assert (out / "_MANIFEST.json").exists()
    assert has_complete_data(out, params={"x": 1})
    assert not has_complete_data(out, params={"x": 2})
    # corrupt a file -> invalid
    f = next(out.glob("*.parquet"))
    f.write_bytes(b"junk")
    assert not has_complete_data(out, params={"x": 1})


def test_run_stage_skips_when_complete(tmp_path):
    calls = []

    def build():
        calls.append(1)
        return rd.range(10)

    out = tmp_path / "s"
    ds1, m1 = run_stage(build, out, name="s", params={})
    ds2, m2 = run_stage(build, out, name="s", params={})
    assert len(calls) == 1  # second run resumed from checkpoint
    assert ds2.count() == 10
    assert manifest_digest(m1) == manifest_digest(m2)


def test_run_stage_rebuilds_on_input_change(tmp_path):
    calls = []

    def build():
        calls.append(1)
        return rd.range(5)

    fake_in_a = {"name": "a", "params_hash": "x", "files": [], "total_rows": 1}
    fake_in_b = {"name": "a", "params_hash": "y", "files": [], "total_rows": 2}
    out = tmp_path / "s"
    run_stage(build, out, name="s", params={}, input_manifests=[fake_in_a])
    run_stage(build, out, name="s", params={}, input_manifests=[fake_in_b])
    assert len(calls) == 2


def test_checkpointed_pipeline_matches_direct(tmp_path):
    cfg = SynthConfig(n_convs=60, n_entities=40)
    gz, rt = gazetteer_table(cfg), redirects_table(cfg)

    direct = kg_triples(transcripts_dataset(cfg), gz, rt).to_pandas()
    ck = kg_triples_checkpointed(
        transcripts_dataset(cfg), gz, rt, str(tmp_path / "wd")
    ).to_pandas()

    cols = ["subj", "pred", "obj", "conv_id", "turn_idx"]
    a = direct[cols].sort_values(cols).reset_index(drop=True)
    b = ck[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)

    # all three stage manifests exist with per-file metrics
    for stage in ("raw_triples", "linked_triples", "triples"):
        m = read_manifest(tmp_path / "wd" / stage)
        assert m is not None and m["total_rows"] > 0
        assert all(f["rows"] >= 0 and f["bytes"] > 0 for f in m["files"])

    # resume: rerun touches nothing (mtimes unchanged)
    before = {
        p: p.stat().st_mtime for p in (tmp_path / "wd").rglob("*.parquet")
    }
    kg_triples_checkpointed(
        transcripts_dataset(cfg), gz, rt, str(tmp_path / "wd")
    ).count()
    after = {
        p: p.stat().st_mtime for p in (tmp_path / "wd").rglob("*.parquet")
    }
    assert before == after


def test_sharded_sink_resumes_per_shard(tmp_path):
    import json

    import pyarrow.parquet as pq
    import ray.data as rd

    from kgdata_ray.state.manifest import MANIFEST_NAME, write_dataset_sharded

    ds = rd.range(1000).map_batches(
        lambda b: b.rename(columns={"id": "k"}), batch_format="pandas"
    )
    out = tmp_path / "sharded"
    m1 = write_dataset_sharded(
        ds, out, shard_col="k", num_shards=4, name="t", params={"v": 1}
    )
    assert m1["total_rows"] == 1000
    assert m1["shards_written"] == 4
    rows = sum(
        pq.read_metadata(p).num_rows for p in out.glob("shard=*/*.parquet")
    )
    assert rows == 1000

    # invalidate ONE shard; a rerun rewrites only that shard
    bad = out / "shard=00002" / MANIFEST_NAME
    bad.unlink()
    m2 = write_dataset_sharded(
        rd.range(1000).map_batches(
            lambda b: b.rename(columns={"id": "k"}), batch_format="pandas"
        ),
        out, shard_col="k", num_shards=4, name="t", params={"v": 1},
    )
    assert m2["shards_written"] == 1
    assert m2["total_rows"] == 1000
    # untouched shards keep their original digests (not rewritten)
    assert [d for i, d in enumerate(m2["shards"]) if i != 2] == [
        d for i, d in enumerate(m1["shards"]) if i != 2
    ]
    rows2 = sum(
        pq.read_metadata(p).num_rows for p in out.glob("shard=*/*.parquet")
    )
    assert rows2 == 1000

    # changed params invalidate everything
    m3 = write_dataset_sharded(
        rd.range(1000).map_batches(
            lambda b: b.rename(columns={"id": "k"}), batch_format="pandas"
        ),
        out, shard_col="k", num_shards=4, name="t", params={"v": 2},
    )
    assert m3["shards_written"] == 4


def test_byte_targeted_file_sizing(tmp_path):
    # Wide-row media-like table: ~1 KiB incompressible payload per row,
    # fragmented into many small blocks. target_file_bytes must coalesce
    # parts to ~target size (rows-based sizing would not know bytes).
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "item_id": np.arange(2000, dtype=np.int64),
            "payload": [rng.bytes(1024) for _ in range(2000)],
        }
    )
    ds = rd.from_pandas(df).repartition(32)
    target = 256 * 1024

    out = tmp_path / "sized"
    m = write_dataset(ds, out, name="sized", target_file_bytes=target)
    sizes = sorted(f["bytes"] for f in m["files"])
    assert m["total_rows"] == 2000
    assert len(sizes) <= 12  # ~2MB/256KB = 8 target files, not 32
    # all files except a possible remainder land in-band around target
    for s in sizes[1:]:
        assert 0.5 * target <= s <= 3 * target, sizes

    # without a byte target the 32 fragments write ~32 small files
    out2 = tmp_path / "unsized"
    m2 = write_dataset(ds, out2, name="unsized")
    assert len(m2["files"]) > len(m["files"])


def test_bucketed_join_shard_mismatch_raises(tmp_path):
    import pandas as pd
    import pytest as _pytest
    import ray.data as rd

    from kgdata_ray.functions.joins import bucketed_join
    from kgdata_ray.state.manifest import write_dataset_sharded

    left = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3], "a": [7, 8, 9]}))
    right = rd.from_pandas(pd.DataFrame({"k": [1, 2], "b": ["x", "y"]}))
    write_dataset_sharded(left, tmp_path / "l", shard_col="k",
                          num_shards=2, name="l")
    write_dataset_sharded(right, tmp_path / "r", shard_col="k",
                          num_shards=4, name="r")
    with _pytest.raises(ValueError, match="shard counts differ"):
        bucketed_join(tmp_path / "l", tmp_path / "r", on="k")


def test_bucketed_join_small_equals_plain_join(tmp_path):
    import pandas as pd
    import ray.data as rd

    from kgdata_ray.functions.joins import bucketed_join
    from kgdata_ray.state.manifest import write_dataset_sharded

    l = pd.DataFrame({"k": list(range(20)) * 2, "a": range(40)})
    r = pd.DataFrame({"k": list(range(0, 30, 2)), "b": range(15)})
    write_dataset_sharded(rd.from_pandas(l), tmp_path / "l",
                          shard_col="k", num_shards=3, name="l")
    write_dataset_sharded(rd.from_pandas(r), tmp_path / "r",
                          shard_col="k", num_shards=3, name="r")
    got = (
        bucketed_join(tmp_path / "l", tmp_path / "r", on="k")
        .to_pandas().sort_values(["k", "a"]).reset_index(drop=True)
    )
    want = l.merge(r, on="k").sort_values(["k", "a"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "a", "b"]], want[["k", "a", "b"]], check_dtype=False)


def test_bucketed_join_plans_agree(tmp_path):
    """The bucket-map-join default and the Dataset.join fallback (forced
    via a 1-byte budget) produce identical rows AND columns — the plan
    choice is a physical detail, never a semantic one."""
    import pandas as pd
    import ray.data as rd

    from kgdata_ray.functions.joins import bucketed_join
    from kgdata_ray.state.manifest import write_dataset_sharded

    l = pd.DataFrame({"k": list(range(25)), "a": range(25)})
    r = pd.DataFrame({"kk": list(range(0, 50, 2)), "b": range(25)})
    write_dataset_sharded(rd.from_pandas(l), tmp_path / "l",
                          shard_col="k", num_shards=4, name="l")
    write_dataset_sharded(rd.from_pandas(r), tmp_path / "r",
                          shard_col="kk", num_shards=4, name="r")

    def run(budget):
        df = bucketed_join(tmp_path / "l", tmp_path / "r", on="k",
                           right_on="kk",
                           map_side_budget_bytes=budget).to_pandas()
        return df.sort_values(["k"]).reset_index(drop=True)

    fast, slow = run(256 << 20), run(1)
    assert list(fast.columns) == list(slow.columns)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)


def test_kg_triples_bucketed_lineage_and_resume(ray_session):
    """Flagship bucketed sink: the subj-bucketed kg_triples + degree
    sinks carry per-shard manifests; a re-run reuses every finished
    shard (shards_written == 0) and the joined output matches a plain
    degree join recomputed directly."""
    import json
    import shutil
    from pathlib import Path

    from kgdata_ray.pipelines.queries import (
        q_kg_entity_degrees,
        q_kg_triples,
        q_kg_triples_bucketed,
    )
    from kgdata_ray.state.manifest import MANIFEST_NAME

    sf_dir = "/root/testdata/sf0.001"
    base = Path("/tmp/kgr_bucketed/sf0.001")
    shutil.rmtree(base, ignore_errors=True)

    got = (q_kg_triples_bucketed(sf_dir).to_pandas()
           .sort_values(["subj", "pred", "obj"]).reset_index(drop=True))
    parent = json.loads((base / "kg_triples" / MANIFEST_NAME).read_text())
    assert parent["shards_written"] == parent["params"]["num_shards"]
    assert parent["total_rows"] == len(got)
    assert len(parent["shards"]) == parent["params"]["num_shards"]

    # second run: every shard manifest validates -> nothing rewritten
    again = (q_kg_triples_bucketed(sf_dir).to_pandas()
             .sort_values(["subj", "pred", "obj"]).reset_index(drop=True))
    parent2 = json.loads(
        (base / "kg_triples" / MANIFEST_NAME).read_text())
    assert parent2["shards_written"] == 0
    assert parent2["shards"] == parent["shards"]  # same lineage digests

    import pandas as pd
    pd.testing.assert_frame_equal(got, again)

    # value check vs a plain (unbucketed) recomputation
    tr = q_kg_triples(sf_dir).to_pandas()
    deg = q_kg_entity_degrees(sf_dir).to_pandas()
    want = (tr.merge(deg, left_on="subj", right_on="entity_id")
            [["subj", "pred", "obj", "out_degree", "in_degree"]]
            .sort_values(["subj", "pred", "obj"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
           .sort_index(axis=1),
        want.sort_index(axis=1), check_dtype=False)
