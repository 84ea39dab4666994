"""merge_upserts, neighborhood_jaccard, inverted_index — naive
in-test oracles."""

from __future__ import annotations

import itertools

import pandas as pd
import pyarrow as pa
import ray.data as rd

from kgdata_ray.functions.modifications import merge_upserts
from kgdata_ray.stages.graph import neighborhood_jaccard
from kgdata_ray.stages.textstats import inverted_index


def _ds(df):
    return rd.from_pandas(df)


def test_merge_upserts_hand_case():
    base = pd.DataFrame({
        "k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"],
        "_version": [0, 0, 0, 0],
        "_deleted": [False, False, False, False],
    })
    upd = pd.DataFrame({
        "k": [2, 3, 5], "v": ["B", None, "E"],
        "_version": [1, 1, 1],
        # 3 is a tombstone; 5 is an insert
        "_deleted": [False, True, False],
    })
    got = (merge_upserts(_ds(base), _ds(upd), "k").to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert got["k"].tolist() == [1, 2, 4, 5]
    assert got["v"].tolist() == ["a", "B", "d", "E"]
    assert list(got.columns) == ["k", "v"]


def test_merge_upserts_version_ordering():
    base = pd.DataFrame({"k": [1], "v": [0], "_version": [3],
                         "_deleted": [False]})
    upd = pd.DataFrame({"k": [1], "v": [9], "_version": [2],
                        "_deleted": [False]})
    got = merge_upserts(_ds(base), _ds(upd), "k").to_pandas()
    assert got["v"].tolist() == [0]  # stale update loses


def test_neighborhood_jaccard_matches_naive():
    e = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    df = pd.DataFrame(e, columns=["u", "v"])
    got = neighborhood_jaccard(_ds(df)).to_pandas()
    nbrs: dict = {}
    for u, v in e:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    exp = {}
    for p, q in itertools.combinations(sorted(nbrs), 2):
        c = len(nbrs[p] & nbrs[q])
        if c:
            exp[(p, q)] = (c, c / len(nbrs[p] | nbrs[q]))
    got_map = {(r.p, r.q): (r.common, r.jaccard)
               for r in got.itertuples()}
    assert got_map == exp


def test_inverted_index_matches_naive():
    docs = pd.DataFrame({
        "doc_id": [3, 1, 2],
        "text": ["the cat sat", "The dog, the CAT!", "dog dog dog"],
    })
    got = inverted_index(_ds(docs)).to_pandas()
    got_map = {r.term: (r.df, r.postings) for r in got.itertuples()}
    assert got_map == {
        "the": (2, "1,3"),
        "cat": (2, "1,3"),
        "sat": (1, "3"),
        "dog": (2, "1,2"),
    }


def test_golden_components_union_find_matches_engine_cc():
    from kgdata_ray.oracle_sketch import golden_components
    from kgdata_ray.stages.canonicalize import connected_components

    e = [("a", "b"), ("b", "c"), ("x", "y"), ("p", "q"), ("q", "r"),
         ("r", "p")]
    golden = golden_components(e).to_pandas()
    df = pd.DataFrame(e, columns=["src_id", "dst_id"])
    got = (connected_components(_ds(df)).to_pandas()
           .sort_values("node_id").reset_index(drop=True))
    exp = golden.sort_values("node_id").reset_index(drop=True)
    assert got[["node_id", "component_id"]].equals(
        exp[["node_id", "component_id"]])
