"""Exact tiled pair enumeration (functions/pairtiles.py) — the
round-3 VERDICT #2 fix: grouped pair generators must be EXACT under
skew (a hot group streams through bounded tiles), never silently
truncated to a first-K cap."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from kgdata_ray.functions.pairtiles import (
    grouped_pair_tables,
    triu_pair_tiles,
)


@pytest.mark.parametrize("n", [0, 1, 2, 3, 7, 50, 257])
@pytest.mark.parametrize("tile_pairs", [1, 7, 64, 10**9])
def test_triu_pair_tiles_cover_every_pair_once(n, tile_pairs):
    got = [
        (int(i), int(j))
        for ii, jj in triu_pair_tiles(n, tile_pairs=tile_pairs)
        for i, j in zip(ii, jj)
    ]
    want = [(i, j) for i in range(n) for j in range(i + 1, n)]
    assert got == want  # exact, ordered, no dup, no drop


@pytest.mark.parametrize("tile_pairs", [1, 7, 64])
def test_triu_pair_tiles_bounded(tile_pairs):
    n = 40
    for ii, jj in triu_pair_tiles(n, tile_pairs=tile_pairs):
        assert len(ii) <= max(tile_pairs, n - 1)


def _collect(gen):
    tables = list(gen)
    assert tables, "generator must always yield at least one table"
    return pa.concat_tables(tables).to_pandas()


def test_grouped_pair_tables_exact_multi_tile():
    # one hot group (37 members -> 666 pairs) + small groups, forced
    # through many tiles
    rows = [("hot", f"e{i:03d}") for i in range(37)]
    rows += [("g2", "a"), ("g2", "b"), ("g1", "x")]
    b = pd.DataFrame(rows, columns=["k", "v"])
    out = _collect(
        grouped_pair_tables(b, "k", "v", "u", "w", tile_pairs=10))
    got = set(zip(out["u"], out["w"]))
    want = {(f"e{i:03d}", f"e{j:03d}")
            for i in range(37) for j in range(i + 1, 37)}
    want.add(("a", "b"))
    assert got == want
    assert len(out) == len(want)  # no duplicates either


def test_grouped_pair_tables_weight_is_group_size_based():
    b = pd.DataFrame({"k": ["g"] * 5, "v": list("abcde")})
    out = _collect(
        grouped_pair_tables(b, "k", "v", "p", "q",
                            weight_fn=lambda n: 1.0 / np.log(n),
                            weight_name="w", tile_pairs=3))
    assert len(out) == 10
    assert np.allclose(out["w"], 1.0 / np.log(5))


def test_grouped_pair_tables_unique_and_empty():
    b = pd.DataFrame({"k": ["g", "g", "g"], "v": ["a", "a", "b"]})
    out = _collect(
        grouped_pair_tables(b, "k", "v", "p", "q", unique=True))
    assert list(zip(out["p"], out["q"])) == [("a", "b")]
    # all-singleton input still yields one empty, schema-ful table
    b2 = pd.DataFrame({"k": ["g1", "g2"], "v": ["a", "b"]})
    out2 = _collect(grouped_pair_tables(b2, "k", "v", "p", "q"))
    assert len(out2) == 0 and list(out2.columns) == ["p", "q"]


def test_co_mention_edges_hot_group_exact(ray_session):
    # a conversation with more entities than ONE tile holds (tile is
    # 2^21 pairs; 2100 entities -> 2,203,950 pairs -> >=2 tiles):
    # every pair must survive — this is the no-silent-caps contract.
    import ray.data as rd

    from kgdata_ray.stages.graph import co_mention_edges

    n = 2100
    df = pd.DataFrame({
        "conv_id": ["hot"] * n + ["c2", "c2"],
        "subj": [f"E{i:05d}" for i in range(n)] + ["E00000", "zz"],
        "pred": "p", "obj": "o",
    })
    edges = co_mention_edges(rd.from_pandas(df))
    # hot pairs + the one c2-only pair (E00000, zz)
    assert edges.count() == n * (n - 1) // 2 + 1
