"""Class-hierarchy machinery: ancestor closure, cycle breaking, and the
per-entity type closure (``entity_all_types``).

Reference semantics being reproduced (none of the code):

  - ancestor closure with min distances —
    ``kgdata/misc/hierarchy.py:18-57`` (``get_dist2ancestors``: modified
    Dijkstra over the parents relation; distance to a parent is 1),
    consumed by ``kgdata/wikidata/datasets/classes.py:73``.
  - cycle breaking before the closure —
    ``kgdata/wikidata/datasets/acyclic_classes.py:19-112``: enumerate
    cycles, then repeatedly delete from each cycle the edge whose
    TARGET has the most parents (a "generic parent" link) until the
    graph is a DAG. Driver-side: the class vocabulary is tiny relative
    to the entity table.
  - per-entity type closure — ``kgdata/wikidata/datasets/
    entity_all_types.py:25-74``: every entity gets its direct types
    plus all their ancestors with min distance.

The closure itself is driver-side (class vocabularies are thousands of
nodes, not billions); :func:`ancestor_closure_distributed` provides the
Dataset-iteration variant for vocabularies that outgrow the driver, and
the per-entity explosion is always distributed (broadcast closure +
vectorized flat map).
"""

from __future__ import annotations

from collections import defaultdict, deque
from typing import Optional, Sequence, Union

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from ..functions.joins import resolve_join_partitions

# Deterministic synthetic class DAG above the world's 4 base entity
# types (person/org/place/tool). Diamonds are planted so min-distance
# matters: e.g. place->location directly (1) and via settlement (2).
SYNTH_TYPE_DAG: list[tuple[str, str]] = [
    ("person", "human"), ("person", "professional"),
    ("human", "agent"), ("professional", "agent"),
    ("agent", "entity"),
    ("org", "organization"), ("org", "legal_entity"),
    ("organization", "agent"), ("legal_entity", "entity"),
    ("place", "settlement"), ("place", "location"),
    ("settlement", "location"),
    ("location", "spatial"), ("spatial", "entity"),
    ("tool", "software"), ("tool", "product"),
    ("software", "artifact"), ("product", "artifact"),
    ("artifact", "entity"),
]


# --------------------------------------------------------------------------
# Driver-side closure (reference hierarchy.py analog)


def ancestor_closure(
    edges: Sequence[tuple[str, str]]
) -> dict[str, dict[str, int]]:
    """child -> {ancestor: min hop distance} over (child, parent) edges.

    All edges have weight 1, so per-node BFS gives exact shortest
    distances — an independent implementation of the reference's
    pqdict-Dijkstra (``hierarchy.py:35-57``) with identical output.
    Raises on cycles (run :func:`break_cycles` first)."""
    parents: dict[str, list[str]] = defaultdict(list)
    nodes: set[str] = set()
    for c, p in edges:
        parents[c].append(p)
        nodes.add(c)
        nodes.add(p)
    _assert_acyclic(parents)
    out: dict[str, dict[str, int]] = {}
    for node in nodes:
        dist: dict[str, int] = {}
        q = deque([(node, 0)])
        while q:
            cur, d = q.popleft()
            for p in parents.get(cur, ()):
                nd = d + 1
                if p not in dist or nd < dist[p]:
                    dist[p] = nd
                    q.append((p, nd))
        dist.pop(node, None)
        out[node] = dist
    return out


def _assert_acyclic(parents: dict[str, list[str]]) -> None:
    color: dict[str, int] = {}

    def visit(u: str) -> None:
        stack = [(u, iter(parents.get(u, ())))]
        color[u] = 1
        while stack:
            node, it = stack[-1]
            advanced = False
            for p in it:
                c = color.get(p, 0)
                if c == 1:
                    raise ValueError(
                        f"type hierarchy has a cycle through {p!r}; "
                        "run break_cycles() first"
                    )
                if c == 0:
                    color[p] = 1
                    stack.append((p, iter(parents.get(p, ()))))
                    advanced = True
                    break
            if not advanced:
                color[node] = 2
                stack.pop()

    for n in list(parents):
        if color.get(n, 0) == 0:
            visit(n)


# --------------------------------------------------------------------------
# Cycle breaking (reference acyclic_classes.py analog)


def break_cycles(
    edges: Sequence[tuple[str, str]]
) -> tuple[list[tuple[str, str]], list[tuple[str, str]]]:
    """Delete edges until the (child, parent) graph is a DAG; returns
    (kept_edges, removed_edges).

    Heuristic mirrors the reference (``acyclic_classes.py:69-92``): for
    each cycle found, remove the edge whose TARGET has the most parents
    (ties broken lexicographically for determinism), then re-scan until
    no cycle remains. The reference's first phase (drop edges absent
    from a newer dump) has no analog here — there is no second dump."""
    kept = list(dict.fromkeys(edges))  # stable dedup
    removed: list[tuple[str, str]] = []
    while True:
        cycle = _find_cycle(kept)
        if cycle is None:
            return kept, removed
        counts: dict[str, int] = defaultdict(int)
        for c, _p in kept:
            counts[c] += 1
        # candidate edges: those ON the cycle
        cyc_edges = list(zip(cycle, cycle[1:] + cycle[:1]))
        present = [e for e in cyc_edges if e in set(kept)]
        victim = max(present, key=lambda e: (counts[e[1]], e))
        kept.remove(victim)
        removed.append(victim)


def _find_cycle(edges: Sequence[tuple[str, str]]):
    """One directed cycle as a node list (child->parent direction), or
    None. Iterative DFS with back-edge detection."""
    adj: dict[str, list[str]] = defaultdict(list)
    for c, p in edges:
        adj[c].append(p)
    color: dict[str, int] = {}
    parent_of: dict[str, str] = {}
    for start in sorted(adj):
        if color.get(start, 0) != 0:
            continue
        stack = [(start, iter(adj.get(start, ())))]
        color[start] = 1
        while stack:
            node, it = stack[-1]
            advanced = False
            for nxt in it:
                c = color.get(nxt, 0)
                if c == 1:  # back edge: recover the cycle
                    cyc = [node]
                    cur = node
                    while cur != nxt:
                        cur = parent_of[cur]
                        cyc.append(cur)
                    cyc.reverse()
                    return cyc
                if c == 0:
                    color[nxt] = 1
                    parent_of[nxt] = node
                    stack.append((nxt, iter(adj.get(nxt, ()))))
                    advanced = True
                    break
            if not advanced:
                color[node] = 2
                stack.pop()
    return None


# --------------------------------------------------------------------------
# Distributed closure (scale path for huge class vocabularies)


def ancestor_closure_distributed(
    dag: Dataset, *, num_partitions: Optional[int] = None, max_rounds: int = 64
) -> Dataset:
    """(child, parent) edge Dataset -> (child, ancestor, dist) closure
    with min distances, computed by Dataset iteration: each round joins
    the frontier against the edge table and keeps new minima. Rounds are
    bounded by the longest ancestor path (class DAGs are shallow); the
    per-round volume is the closure, never the entity table.

    Output matches :func:`ancestor_closure` (tested)."""
    num_partitions = resolve_join_partitions(num_partitions)
    from ..functions.agg import grouped_blockwise
    from ..functions.blocks import rename_cols, scrub_empty_blocks

    def seed(b: pd.DataFrame) -> pa.Table:
        # Arrow out: unions downstream mix these blocks with Arrow
        # grouped output; block types must agree
        return pa.Table.from_pandas(
            pd.DataFrame(
                {"child": b["child"], "anc": b["parent"],
                 "dist": np.full(len(b), 1, dtype=np.int64)}
            ),
            preserve_index=False,
        )

    edges = dag.materialize()
    closure = edges.map_batches(seed, batch_format="pandas").materialize()
    frontier = closure

    def min_block(b: pd.DataFrame) -> pa.Table:
        out = (
            b.groupby(["child", "anc"], sort=False)["dist"].min().reset_index()
        )
        out["dist"] = out["dist"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    for _ in range(max_rounds):
        # extend the frontier one hop: (child, anc) ⋈ (anc=child', parent)
        ext = frontier.join(
            rename_cols(edges, {"child": "e_child", "parent": "e_parent"}),
            join_type="inner",
            num_partitions=num_partitions,
            on=("anc",),
            right_on=("e_child",),
        )

        def hop(b: pd.DataFrame) -> pa.Table:
            return pa.Table.from_pandas(
                pd.DataFrame(
                    {
                        "child": b["child"],
                        "anc": b["e_parent"],
                        "dist": (b["dist"] + 1).astype("int64"),
                    }
                ),
                preserve_index=False,
            )

        stepped = scrub_empty_blocks(
            ext.map_batches(hop, batch_format="pandas")
        ).materialize()
        if stepped.count() == 0:
            break
        before = closure.count()
        closure = grouped_blockwise(
            closure.union(stepped), ["child", "anc"], min_block
        ).materialize()
        if closure.count() == before:
            # no new (child, anc) pairs; remaining rounds only re-derive
            # longer paths that can never beat existing minima
            break
        frontier = stepped
    else:
        raise RuntimeError(
            f"ancestor closure did not converge in {max_rounds} rounds — "
            "cycle suspected (run break_cycles first)"
        )
    return closure


# --------------------------------------------------------------------------
# Per-entity type closure (entity_all_types analog)


def entity_all_types(
    entity_types: Dataset,
    closure: Union["ray.ObjectRef", dict],
    *,
    type_col: str = "etype",
    id_col: str = "entity_id",
) -> Dataset:
    """(entity_id, type, dist): each entity's direct type at dist 0 plus
    every ancestor of that type at its min distance. The closure dict is
    broadcast once (``ray.put``) and exploded per batch with numpy
    repeats — the reference salts hot types for its join-based plan
    (``entity_all_types.py:87-142``); with a broadcast closure there is
    no join to skew."""
    if not isinstance(closure, ray.ObjectRef):
        closure = ray.put(dict(closure))

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        from ..functions.broadcast import get_broadcast

        if not len(b):  # np.concatenate rejects an empty list of arrays
            return pd.DataFrame(
                {
                    "entity_id": pd.Series([], dtype="object"),
                    "type": pd.Series([], dtype="object"),
                    "dist": pd.Series([], dtype="int64"),
                }
            )
        clo: dict = get_broadcast(closure)
        # per distinct type, the exploded (type-list, dist-list) suffix
        anc_types: dict[str, list] = {}
        anc_dists: dict[str, list] = {}
        for t in pd.unique(b[type_col]):
            anc = clo.get(t, {})
            anc_types[t] = [t] + list(anc.keys())
            anc_dists[t] = [0] + list(anc.values())
        reps = b[type_col].map(lambda t: len(anc_types[t])).to_numpy()
        ids = np.repeat(b[id_col].to_numpy(), reps)
        types = np.concatenate([anc_types[t] for t in b[type_col]])
        dists = np.concatenate([anc_dists[t] for t in b[type_col]])
        return pd.DataFrame(
            {
                "entity_id": ids,
                "type": types,
                "dist": dists.astype("int64"),
            }
        )

    return entity_types.map_batches(fn, batch_format="pandas")
