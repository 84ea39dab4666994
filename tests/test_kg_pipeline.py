"""End-to-end flagship pipeline vs the pure-Python oracle.

The P/R >= 0.95 gate from BASELINE.md; with identical spec constants
the pipeline should match the oracle exactly (P = R = 1.0), plus the
reference-style invariants: per-turn text equality under stable turn
ordering, count preservation, unique triple keys.
"""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data as rd

from kgdata_ray.oracle import extract_triples, precision_recall, triple_set
from kgdata_ray.pipelines.kg import kg_triples
from kgdata_ray.stages.reconstruct import conversations, reconstruct_turns
from kgdata_ray.synth import (
    gazetteer_table,
    redirects_table,
    transcripts_dataset,
    transcripts_table,
)


@pytest.fixture(scope="module")
def world(small_cfg):
    return {
        "transcripts": transcripts_table(small_cfg),
        "gazetteer": gazetteer_table(small_cfg),
        "redirects": redirects_table(small_cfg),
    }


@pytest.fixture(scope="module")
def golden(world):
    return extract_triples(
        world["transcripts"], world["gazetteer"], world["redirects"]
    )


def _run(world, small_cfg, linking):
    ds = transcripts_dataset(small_cfg)
    out = kg_triples(
        ds, world["gazetteer"], world["redirects"],
        linking=linking, num_partitions=4,
    )
    return out.to_pandas()


@pytest.mark.parametrize("linking", ["broadcast", "join"])
def test_precision_recall(world, golden, small_cfg, linking):
    df = _run(world, small_cfg, linking)
    predicted = set(zip(df["subj"], df["pred"], df["obj"]))
    p, r = precision_recall(predicted, triple_set(golden))
    assert p >= 0.95 and r >= 0.95, (p, r)
    # with shared spec constants the match should be exact
    assert p == 1.0 and r == 1.0


def test_sharded_linking_equivalence(world, small_cfg):
    """Sharded-actor linking == broadcast linking (composed canonical
    map in both)."""
    import ray

    from kgdata_ray.stages.canonicalize import canonical_map_from_table
    from kgdata_ray.stages.extract import extract_raw
    from kgdata_ray.stages.linking import (
        best_candidate_map, link_broadcast, link_sharded,
    )
    from kgdata_ray.state.lookup import ShardedDict

    alias = best_candidate_map(world["gazetteer"])
    canon = canonical_map_from_table(world["redirects"])
    composed = {k: canon.get(v, v) for k, v in alias.items()}

    raw = extract_raw(transcripts_dataset(small_cfg))
    a = link_broadcast(raw, ray.put(alias), ray.put(canon)).to_pandas()
    sharded = ShardedDict.from_dict(composed, num_shards=4)
    b = link_sharded(
        extract_raw(transcripts_dataset(small_cfg)), sharded
    ).to_pandas()
    cols = sorted(a.columns)
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False,
    )


def test_salted_join_linking_equivalence(world, small_cfg):
    """Join linking with hot-mention salting yields exactly the same
    links as the plain join plan (threshold forced low so every
    mention takes the salted path)."""
    import ray.data as rd

    from kgdata_ray.stages.extract import extract_raw
    from kgdata_ray.stages.linking import alias_candidates, link_via_join

    raw = extract_raw(transcripts_dataset(small_cfg))
    cands = alias_candidates(rd.from_arrow(world["gazetteer"]))
    plain = link_via_join(raw, cands, num_partitions=4).to_pandas()
    salted = link_via_join(
        extract_raw(transcripts_dataset(small_cfg)),
        alias_candidates(rd.from_arrow(world["gazetteer"])),
        num_partitions=4, hot_threshold=2, salt_batch=5,
    ).to_pandas()
    cols = sorted(plain.columns)
    pd.testing.assert_frame_equal(
        plain[cols].sort_values(cols).reset_index(drop=True),
        salted[cols].sort_values(cols).reset_index(drop=True),
    )


def test_extraction_pushdown_plan_equivalence(world, small_cfg):
    """The pushed-down plan (extract before the conv shuffle) and the
    literal reconstruct-then-extract plan yield identical triples."""
    ds = transcripts_dataset(small_cfg)
    a = kg_triples(ds, world["gazetteer"], world["redirects"],
                   reconstruct_first=False).to_pandas()
    b = kg_triples(transcripts_dataset(small_cfg), world["gazetteer"],
                   world["redirects"], reconstruct_first=True).to_pandas()
    cols = list(a.columns)
    pd.testing.assert_frame_equal(
        a.sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True),
    )


def test_provenance_deterministic(world, golden, small_cfg):
    df = _run(world, small_cfg, "broadcast")
    got = df.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    want = (
        pd.DataFrame(golden)[["subj", "pred", "obj", "conv_id", "turn_idx"]]
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
        .astype({"turn_idx": got["turn_idx"].dtype})
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_triple_keys_unique(world, small_cfg):
    df = _run(world, small_cfg, "broadcast")
    assert not df.duplicated(["subj", "pred", "obj"]).any()


def test_reconstruction_invariant(world, small_cfg):
    """Per-turn text equality under stable turn ordering + count
    preservation (reference post-condition analog, entities.py:150-157)."""
    ds = transcripts_dataset(small_cfg)
    rec = reconstruct_turns(ds).to_pandas()
    src = world["transcripts"].to_pandas()
    assert len(rec) == len(src)  # count preserved end-to-end

    want = src.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # in-group order must be by turn_idx (stable): within each conv the
    # sequence of texts equals the oracle ordering
    for cid, g in rec.groupby("conv_id", sort=False):
        w = want[want["conv_id"] == cid]
        assert list(g["turn_idx"]) == list(w["turn_idx"])
        assert list(g["text"]) == list(w["text"])


def test_precision_recall_medium_scale():
    """FIXTURES 'correctness run' scale point (~1k conversations):
    P/R vs oracle stays exact as the world grows (more entities, more
    redirect chains, more ambiguity)."""
    from kgdata_ray.synth import SynthConfig

    cfg = SynthConfig(n_convs=1000, n_entities=150)
    tt = transcripts_table(cfg)
    gz, rt = gazetteer_table(cfg), redirects_table(cfg)
    golden = triple_set(extract_triples(tt, gz, rt))
    df = kg_triples(transcripts_dataset(cfg), gz, rt).to_pandas()
    predicted = set(zip(df["subj"], df["pred"], df["obj"]))
    p, r = precision_recall(predicted, golden)
    assert p == 1.0 and r == 1.0, (p, r)


def test_conversations_rollup(world, small_cfg):
    ds = transcripts_dataset(small_cfg)
    conv = conversations(ds).to_pandas()
    src = world["transcripts"].to_pandas()
    assert len(conv) == src["conv_id"].nunique()
    assert conv["n_turns"].sum() == len(src)
    one = conv.set_index("conv_id").loc["conv-00000001"]
    w = src[src["conv_id"] == "conv-00000001"].sort_values("turn_idx")
    assert one["dialogue"] == "\n".join(w["role"] + ": " + w["text"])


def test_kg_triples_exact_under_tiny_blocks(world, golden, small_cfg):
    """Correctness under block splitting: with a pathologically small
    target block size, Ray's sort WILL split key ranges across blocks —
    the grouped_blockwise boundary guard must keep every (s,p,o) group
    whole, so dedup (and the whole pipeline) stays exact."""
    import ray

    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 8 * 1024  # 8 KiB
    try:
        df = _run(world, small_cfg, "broadcast")
    finally:
        ctx.target_max_block_size = old
    predicted = set(zip(df["subj"], df["pred"], df["obj"]))
    p, r = precision_recall(predicted, triple_set(golden))
    assert p == 1.0 and r == 1.0, (p, r)
    # dedup still exact: one provenance row per unique triple
    assert len(df) == len(predicted)


def test_kg_fact_history_interval_chain(ray_session):
    """Planted succession: E1's 'role' fact changes twice; intervals
    must chain exactly (valid_to = next valid_from, last one open)."""
    import pandas as pd
    import ray.data as rd

    from kgdata_ray.pipelines.kg import kg_fact_history

    ts = pd.to_datetime(
        ["2026-01-01", "2026-02-01", "2026-03-01", "2026-04-01"])
    transcripts = pd.DataFrame({
        "conv_id": ["c1", "c1", "c2", "c2"],
        "turn_idx": [0, 1, 0, 1],
        "ts": ts,
    })
    triples = pd.DataFrame({
        "subj": ["E1", "E1", "E1", "E2"],
        "pred": ["role", "role", "role", "role"],
        "obj": ["eng", "mgr", "dir", "eng"],
        "conv_id": ["c1", "c1", "c2", "c2"],
        "turn_idx": [0, 1, 0, 1],
    })
    out = kg_fact_history(
        rd.from_pandas(triples).repartition(3),
        rd.from_pandas(transcripts),
    ).to_pandas().sort_values(["subj", "valid_from"]).reset_index(drop=True)
    e1 = out[out["subj"] == "E1"].reset_index(drop=True)
    assert list(e1["obj"]) == ["eng", "mgr", "dir"]
    assert (e1["valid_to"].iloc[:-1].to_numpy()
            == e1["valid_from"].iloc[1:].to_numpy()).all()
    assert pd.isna(e1["valid_to"].iloc[-1])
    e2 = out[out["subj"] == "E2"]
    assert len(e2) == 1 and pd.isna(e2["valid_to"].iloc[0])


def test_kg_fact_history_merge_equals_full_rebuild(ray_session):
    """Planted same-ts collision + an untouched key: the incremental
    merge must reproduce the from-scratch rebuild exactly."""
    import pandas as pd
    import ray.data as rd

    from kgdata_ray.pipelines.kg import (kg_fact_history,
                                         kg_fact_history_merge)

    ts = pd.to_datetime(["2026-01-01", "2026-01-01", "2026-02-01",
                         "2026-03-01"])
    transcripts = pd.DataFrame({
        "conv_id": ["c1", "c2", "c3", "c4"],
        "turn_idx": [0, 0, 0, 0],
        "ts": ts,
    })
    # E1/role: two assertions share a ts (order pinned by obj), then a
    # third arrives "later"; E9/tag is untouched by the new batch
    triples = pd.DataFrame({
        "subj": ["E1", "E1", "E1", "E9"],
        "pred": ["role", "role", "role", "tag"],
        "obj": ["zzz", "aaa", "mid", "x"],
        "conv_id": ["c1", "c2", "c3", "c4"],
        "turn_idx": [0, 0, 0, 0],
    })
    tr_ds = rd.from_pandas(transcripts)
    full = kg_fact_history(rd.from_pandas(triples), tr_ds) \
        .to_pandas().sort_values(["subj", "pred", "valid_from", "obj"]) \
        .reset_index(drop=True)
    old = kg_fact_history(rd.from_pandas(triples.iloc[:2]), tr_ds)
    new_facts = pd.DataFrame({
        "subj": ["E1", "E9"], "pred": ["role", "tag"],
        "obj": ["mid", "x"],
        "valid_from": [ts[2], ts[3]],
    })
    merged = kg_fact_history_merge(old, rd.from_pandas(new_facts)) \
        .to_pandas().sort_values(["subj", "pred", "valid_from", "obj"]) \
        .reset_index(drop=True)
    assert merged.equals(full)
    # the same-ts pair chained by obj: 'aaa' precedes 'zzz'
    e1 = full[full["subj"] == "E1"]
    assert list(e1["obj"]) == ["aaa", "zzz", "mid"]
