from __future__ import annotations

import ray.data as rd

from kgdata_ray.stages.graph import entity_outlinks


def test_entity_outlinks():
    triples = rd.from_items(
        [
            {"subj": "a", "pred": "p", "obj": "b"},
            {"subj": "a", "pred": "q", "obj": "b"},  # dup target
            {"subj": "a", "pred": "p", "obj": "c"},
            {"subj": "b", "pred": "p", "obj": "a"},
        ]
    )
    got = {
        r["entity_id"]: list(r["outlinks"])
        for r in entity_outlinks(triples).take_all()
    }
    assert got == {"a": ["b", "c"], "b": ["a"]}
