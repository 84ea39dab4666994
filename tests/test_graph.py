"""Graph analytics: degrees, meta-graph, distributed PageRank vs a
numpy power-iteration reference."""

from __future__ import annotations

import numpy as np
import pytest
import ray.data as rd

from kgdata_ray.stages.graph import entity_degrees, meta_graph, pagerank, rank_moments

TRIPLES = [
    ("a", "p1", "b"), ("a", "p1", "c"), ("b", "p2", "c"),
    ("c", "p1", "a"), ("d", "p2", "a"),
]


@pytest.fixture(scope="module")
def triples_ds():
    return rd.from_items(
        [{"subj": s, "pred": p, "obj": o} for s, p, o in TRIPLES]
    )


def test_entity_degrees(triples_ds):
    got = {
        r["entity_id"]: (r["out_degree"], r["in_degree"])
        for r in entity_degrees(triples_ds, num_partitions=2).take_all()
    }
    assert got == {
        "a": (2, 2), "b": (1, 1), "c": (1, 2), "d": (1, 0),
    }


def test_meta_graph(triples_ds):
    etypes = {"a": "person", "b": "org", "c": "org", "d": "person"}
    got = {
        (r["subj_type"], r["pred"], r["obj_type"]): r["n"]
        for r in meta_graph(triples_ds, etypes).take_all()
    }
    assert got[("person", "p1", "org")] == 2  # a->b, a->c
    assert got[("org", "p1", "person")] == 1  # c->a
    assert got[("person", "p2", "person")] == 1  # d->a
    assert got[("org", "p2", "org")] == 1  # b->c


def test_meta_graph_join_plan_equals_broadcast(triples_ds):
    from kgdata_ray.stages.graph import meta_graph_join

    # "d" has no type row -> both plans must roll it up as 'unknown'
    etypes = {"a": "person", "b": "org", "c": "org"}
    et_ds = rd.from_items(
        [{"entity_id": k, "etype": v} for k, v in etypes.items()]
    )
    key = lambda r: (r["subj_type"], r["pred"], r["obj_type"])  # noqa: E731
    broadcast = {
        key(r): r["n"] for r in meta_graph(triples_ds, etypes).take_all()
    }
    joined = {
        key(r): r["n"]
        for r in meta_graph_join(triples_ds, et_ds, num_partitions=2).take_all()
    }
    assert broadcast == joined
    assert joined[("unknown", "p2", "person")] == 1  # d->a


def _numpy_pagerank(edges, damping=0.85, iters=10):
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, d in edges:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, d in edges:
            contrib[idx[d]] += r[idx[s]] / out[idx[s]]
        dangling = 1.0 - contrib.sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {nodes[i]: r[i] for i in range(n)}


def test_pagerank_matches_numpy(triples_ds):
    edges = [(s, o) for s, _p, o in TRIPLES]
    want = _numpy_pagerank(edges, iters=8)
    got = {
        r["node_id"]: r["rank"]
        for r in pagerank(triples_ds, iters=8, num_partitions=2).take_all()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9), k
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_rank_moments(triples_ds):
    ranks = pagerank(triples_ds, iters=3, num_partitions=2)
    m = rank_moments(ranks)
    assert m["sum"] == pytest.approx(1.0, rel=1e-9)
    assert m["mean"] == pytest.approx(0.25, rel=1e-9)  # 4 nodes
    assert m["std"] > 0 and m["log_mean"] < 0


def test_triangles_matches_bruteforce():
    import itertools
    import random

    import pandas as pd
    import ray.data as rd

    from kgdata_ray.stages.graph import triangles

    rng = random.Random(7)
    nodes = [f"N{i:02d}" for i in range(24)]
    edge_set = set()
    for u, v in itertools.combinations(nodes, 2):
        if rng.random() < 0.25:
            edge_set.add((u, v))
    adj = set(edge_set)
    want = sorted(
        (a, b, c)
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj
    )
    assert len(want) > 10  # the fixture must actually exercise closure

    rows = list(edge_set)
    rng.shuffle(rows)
    edges = rd.from_pandas(
        pd.DataFrame(rows, columns=["u", "v"])).repartition(5)
    got = sorted(
        (r["a"], r["b"], r["c"])
        for r in triangles(edges, num_partitions=3).take_all()
    )
    assert got == want


def test_co_mention_edges():
    import pandas as pd
    import ray.data as rd

    from kgdata_ray.stages.graph import co_mention_edges

    df = pd.DataFrame({
        "conv_id": ["c1", "c1", "c1", "c2", "c2", "c3"],
        "subj": ["E2", "E1", "E3", "E1", "E2", "E9"],
        "pred": ["p"] * 6,
        "obj": ["x"] * 6,
    })
    got = sorted(
        (r["u"], r["v"])
        for r in co_mention_edges(rd.from_pandas(df)).take_all()
    )
    assert got == [("E1", "E2"), ("E1", "E3"), ("E2", "E3")]


def test_kcore_matches_bruteforce():
    import itertools
    import random

    import pandas as pd
    import ray.data as rd

    from kgdata_ray.stages.graph import k_core

    rng = random.Random(11)
    nodes = [f"K{i:02d}" for i in range(30)]
    edge_set = {
        (u, v) for u, v in itertools.combinations(nodes, 2)
        if rng.random() < 0.12
    }

    def brute(k):
        adj = {}
        for u, v in edge_set:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        keep = set(adj)
        changed = True
        while changed:
            changed = False
            for n in list(keep):
                if n in keep and len(adj[n] & keep) < k:
                    keep.discard(n)
                    changed = True
        return sorted(keep)

    edges = rd.from_pandas(
        pd.DataFrame(sorted(edge_set), columns=["u", "v"])).repartition(4)
    for k in (2, 3):
        want = brute(k)
        got = sorted(r["node"] for r in k_core(edges, k).take_all())
        assert got == want, k
    assert brute(2), "fixture must have a non-trivial 2-core"


def test_core_numbers_matches_peeling():
    import itertools
    import random

    import pandas as pd
    import ray.data as rd

    from kgdata_ray.oracle_sketch import golden_core_numbers
    from kgdata_ray.stages.graph import core_numbers

    rng = random.Random(5)
    nodes = [f"C{i:02d}" for i in range(28)]
    edge_set = sorted(
        (u, v) for u, v in itertools.combinations(nodes, 2)
        if rng.random() < 0.15
    )
    want = {
        (r["node"], r["core"])
        for r in golden_core_numbers(edge_set).to_pylist()
    }
    edges = rd.from_pandas(
        pd.DataFrame(edge_set, columns=["u", "v"])).repartition(4)
    got = {
        (r["node"], r["core"])
        for r in core_numbers(edges, num_partitions=2).take_all()
    }
    assert got == want
    assert max(c for _, c in want) >= 2  # fixture non-trivial


def test_entity_distances_bfs_minimality(ray_session):
    """Chain + shortcut: BFS must report the SHORTEST hop count;
    disconnected nodes and literal objects never appear."""
    import pandas as pd
    import ray.data as rd

    from kgdata_ray.stages.graph import entity_distances

    tri = pd.DataFrame({
        "subj": ["E0000001", "E0000002", "E0000003", "E0000001",
                 "E0000001", "E0000008"],
        "pred": ["p"] * 6,
        "obj": ["E0000002", "E0000003", "E0000004", "E0000004",
                "1999", "E0000009"],
    })
    out = entity_distances(rd.from_pandas(tri).repartition(3),
                           ["E0000001"], max_hops=5) \
        .to_pandas().set_index("entity_id")["dist"]
    # E4 is 3 hops down the chain but 1 hop via the shortcut edge
    assert out.to_dict() == {"E0000001": 0, "E0000002": 1,
                             "E0000004": 1, "E0000003": 2}


def test_personalized_pagerank_localizes_mass(ray_session):
    """PPR mass concentrates around the seed; unreachable nodes get 0;
    total mass stays 1."""
    import pandas as pd
    import ray.data as rd

    from kgdata_ray.stages.graph import pagerank

    tri = pd.DataFrame({
        "subj": ["A", "B", "C", "X"],
        "obj": ["B", "C", "A", "Y"],
    })
    r = pagerank(rd.from_pandas(tri), iters=6,
                 personalization=["A"]).to_pandas() \
        .set_index("node_id")["rank"]
    assert abs(r.sum() - 1.0) < 1e-9
    assert r["A"] > r["B"] > 0
    # X/Y are unreachable from A: zero PPR mass
    assert r["X"] == 0.0 and r["Y"] == 0.0


def test_pagerank_personalization_seed_validation(ray_session):
    """Seeds absent from the node universe are dropped with
    renormalization over the present ones; an all-absent seed set
    raises instead of returning degenerate all-zero ranks."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from kgdata_ray.stages.graph import pagerank

    tri = pd.DataFrame({
        "subj": ["A", "B", "C"],
        "obj": ["B", "C", "A"],
    })
    # "Z" is not in the graph -> renormalized to seeds {A}
    r_mixed = pagerank(rd.from_pandas(tri), iters=6,
                       personalization=["A", "Z"]).to_pandas() \
        .set_index("node_id")["rank"]
    r_pure = pagerank(rd.from_pandas(tri), iters=6,
                      personalization=["A"]).to_pandas() \
        .set_index("node_id")["rank"]
    assert abs(r_mixed.sum() - 1.0) < 1e-9
    assert (r_mixed.sort_index() - r_pure.sort_index()).abs().max() < 1e-12

    with pytest.raises(ValueError, match="none of the"):
        pagerank(rd.from_pandas(tri), iters=3,
                 personalization=["Z", "W"]).materialize()
