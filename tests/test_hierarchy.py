"""Ancestor closure / cycle breaking / entity_all_types (reference
``kgdata/misc/hierarchy.py:18-57`` and
``kgdata/wikidata/datasets/acyclic_classes.py:19-112`` semantics)."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data as rd

from kgdata_ray.stages.hierarchy import (
    SYNTH_TYPE_DAG,
    ancestor_closure,
    ancestor_closure_distributed,
    break_cycles,
    entity_all_types,
)


def _closure_df(clo: dict) -> pd.DataFrame:
    rows = [
        {"child": c, "anc": a, "dist": d}
        for c, ancs in clo.items()
        for a, d in ancs.items()
    ]
    return (
        pd.DataFrame(rows)
        .sort_values(["child", "anc"])
        .reset_index(drop=True)
    )


def test_closure_min_distance_diamonds():
    clo = ancestor_closure(SYNTH_TYPE_DAG)
    # place reaches location both directly (1) and via settlement (2):
    # min distance wins
    assert clo["place"]["location"] == 1
    assert clo["place"]["entity"] == 3
    # org reaches entity via legal_entity (2), shorter than via agent (3)
    assert clo["org"]["entity"] == 2
    # reference semantics: the node itself is never its own ancestor
    assert "place" not in clo["place"]


def test_closure_distributed_equals_driver():
    dag = rd.from_items(
        [{"child": c, "parent": p} for c, p in SYNTH_TYPE_DAG]
    )
    got = (
        ancestor_closure_distributed(dag, num_partitions=2)
        .to_pandas()
        .sort_values(["child", "anc"])
        .reset_index(drop=True)
    )
    want = _closure_df(ancestor_closure(SYNTH_TYPE_DAG))
    pd.testing.assert_frame_equal(
        got, want.astype({"dist": "int64"}), check_like=True
    )


def test_closure_raises_on_cycle():
    with pytest.raises(ValueError, match="cycle"):
        ancestor_closure([("a", "b"), ("b", "c"), ("c", "a")])


def test_break_cycles_planted():
    edges = SYNTH_TYPE_DAG + [("entity", "person"), ("agent", "human")]
    kept, removed = break_cycles(edges)
    # result is a DAG (closure no longer raises) and only cycle edges
    # were touched
    ancestor_closure(kept)
    assert set(kept) | set(removed) == set(edges)
    assert len(removed) >= 1
    # deterministic: same input -> same removals
    kept2, removed2 = break_cycles(edges)
    assert removed2 == removed


def test_entity_all_types():
    ents = rd.from_items(
        [
            {"entity_id": "E1", "etype": "person"},
            {"entity_id": "E2", "etype": "tool"},
        ]
    )
    clo = ancestor_closure(SYNTH_TYPE_DAG)
    got = {
        (r["entity_id"], r["type"]): r["dist"]
        for r in entity_all_types(ents, clo).take_all()
    }
    want = {("E1", "person"): 0, ("E2", "tool"): 0}
    for anc, d in clo["person"].items():
        want[("E1", anc)] = d
    for anc, d in clo["tool"].items():
        want[("E2", anc)] = d
    assert got == want
