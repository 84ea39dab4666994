"""Canonicalization: chain collapse (driver + distributed pointer
doubling) and connected components."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from kgdata_ray.stages.canonicalize import (
    canonical_map_from_table,
    collapse_chains,
    connected_components,
    resolve_redirects_distributed,
)
from kgdata_ray.synth import redirects_table


def test_collapse_chains_multi_hop():
    direct = {"a": "b", "b": "c", "c": "d", "x": "y"}
    got = collapse_chains(direct)
    assert got == {"a": "d", "b": "d", "c": "d", "x": "y"}


def test_collapse_chains_cycle_min_id():
    direct = {"b": "c", "c": "b"}
    got = collapse_chains(direct)
    assert got["b"] == "b" and got["c"] == "b"


def test_distributed_matches_driver(small_cfg):
    rt = redirects_table(small_cfg)
    want = canonical_map_from_table(rt)
    got_ds = resolve_redirects_distributed(rd.from_arrow(rt), num_partitions=4)
    got = {
        r["src_id"]: r["canonical_id"] for r in got_ds.take_all()
    }
    assert got == want


def test_distributed_long_chain():
    # a 9-hop chain must collapse in O(log) doubling rounds
    edges = pa.table(
        {
            "src_id": [f"n{i}" for i in range(9)],
            "dst_id": [f"n{i+1}" for i in range(9)],
        }
    )
    got_ds = resolve_redirects_distributed(rd.from_arrow(edges), num_partitions=2)
    got = {r["src_id"]: r["canonical_id"] for r in got_ds.take_all()}
    assert set(got.values()) == {"n9"}


def test_connected_components():
    # two components: {a,b,c,d} (chain + duplicate edge) and {x,y}
    edges = pa.table(
        {
            "src_id": ["b", "c", "c", "x"],
            "dst_id": ["a", "b", "d", "y"],
        }
    )
    labels = connected_components(
        rd.from_arrow(edges), driver_edge_threshold=0).take_all()
    lab = {r["node_id"]: r["component_id"] for r in labels}
    assert lab == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_connected_components_long_chain_doubling():
    # a 60-hop path with max_rounds=10: the single-hop recurrence needs
    # ~diameter rounds and would raise; pointer doubling converges in
    # O(log diameter) and must still pick the min node id as the label
    n = 61
    edges = pa.table(
        {
            "src_id": [f"p{i:03d}" for i in range(n - 1)],
            "dst_id": [f"p{i+1:03d}" for i in range(n - 1)],
        }
    )
    lab = {
        r["node_id"]: r["component_id"]
        for r in connected_components(
            rd.from_arrow(edges), max_rounds=10, driver_edge_threshold=0
        ).take_all()
    }
    assert len(lab) == n
    assert set(lab.values()) == {"p000"}


def test_connected_components_star_and_singleton_free():
    edges = pa.table(
        {"src_id": ["h", "h", "h"], "dst_id": ["s1", "s2", "s3"]}
    )
    lab = {
        r["node_id"]: r["component_id"]
        for r in connected_components(
            rd.from_arrow(edges), driver_edge_threshold=0).take_all()
    }
    assert set(lab.values()) == {"h"}
    assert set(lab) == {"h", "s1", "s2", "s3"}


def test_connected_components_driver_plan_matches_distributed():
    """Size-routed plans must be bit-identical: random string graph and
    an int64 graph, solved by the numpy driver fast path (default at
    this size) and the distributed loop (threshold pinned to 0)."""
    import numpy as np

    rng = np.random.default_rng(5)
    src = [f"n{int(i):03d}" for i in rng.integers(0, 120, 200)]
    dst = [f"n{int(i):03d}" for i in rng.integers(0, 120, 200)]
    edges = pa.table({"src_id": src, "dst_id": dst})
    fast = {r["node_id"]: r["component_id"]
            for r in connected_components(rd.from_arrow(edges)).take_all()}
    slow = {r["node_id"]: r["component_id"]
            for r in connected_components(
                rd.from_arrow(edges), driver_edge_threshold=0).take_all()}
    assert fast == slow

    ei = pa.table({
        "src_id": pa.array(rng.integers(0, 80, 150), pa.int64()),
        "dst_id": pa.array(rng.integers(0, 80, 150), pa.int64()),
    })
    fast_i = {r["node_id"]: r["component_id"]
              for r in connected_components(rd.from_arrow(ei)).take_all()}
    slow_i = {r["node_id"]: r["component_id"]
              for r in connected_components(
                  rd.from_arrow(ei), driver_edge_threshold=0).take_all()}
    assert fast_i == slow_i and len(fast_i) > 0
