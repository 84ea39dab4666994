"""Graph analytics over the triple table: degrees, meta-graph,
PageRank.

Reference analogs:
  - entity degrees (``kgdata/wikidata/datasets/entity_degrees.py:19-105``):
    out-degree = triples per subject, in-degree = triples per object,
    merged with a full-outer combine.
  - meta graph (``kgdata/wikidata/datasets/meta_graph.py:20-115``):
    schema-level rollup (subject-type, predicate, object-type) →
    counts, with entity→type resolved through a broadcast map.
  - PageRank (``kgdata/wikidata/datasets/entity_pagerank.py:50-223``):
    the reference exports edges and runs single-node graph-tool
    (``scripts/pagerank_v2.py:17-37``); here the iteration itself is
    distributed — each round is one groupby-sum shuffle over edge
    contributions, O(iters) rounds, no driver materialization of the
    rank vector.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from ..functions.agg import grouped_blockwise, partial_group_count
from ..functions.blocks import rename_cols, scrub_empty_blocks
from ..functions.joins import default_join_partitions, resolve_join_partitions


def entity_degrees(triples: Dataset, *, num_partitions: Optional[int] = None) -> Dataset:
    """(entity_id, out_degree, in_degree) over a (subj, pred, obj)
    triple table; entities appearing only as subject or only as object
    get 0 for the missing side."""
    num_partitions = resolve_join_partitions(num_partitions)
    out_c = rename_cols(
        partial_group_count(triples, "subj", count_name="out_degree"),
        {"subj": "entity_id"},
    )
    in_c = rename_cols(
        partial_group_count(triples, "obj", count_name="in_degree"),
        {"obj": "entity_id_r"},
    )
    j = out_c.join(
        in_c, join_type="full_outer", num_partitions=num_partitions,
        on=("entity_id",), right_on=("entity_id_r",),
    )

    def fill(b: pd.DataFrame) -> pd.DataFrame:
        # full-outer join coalesces the key pair into the left column
        return pd.DataFrame(
            {
                "entity_id": b["entity_id"],
                "out_degree": b["out_degree"].fillna(0).astype("int64"),
                "in_degree": b["in_degree"].fillna(0).astype("int64"),
            }
        )

    return j.map_batches(fill, batch_format="pandas")


def meta_graph(
    triples: Dataset,
    etype_map: Union["ray.ObjectRef", dict],
) -> Dataset:
    """(subj_type, pred, obj_type, n) — schema-level graph rollup.
    ``etype_map``: entity_id -> type name (broadcast; unknown ids roll
    up as 'unknown')."""
    if not isinstance(etype_map, ray.ObjectRef):
        etype_map = ray.put(etype_map)

    def add_types(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(etype_map)
        return pd.DataFrame(
            {
                "subj_type": b["subj"].map(m).fillna("unknown"),
                "pred": b["pred"],
                "obj_type": b["obj"].map(m).fillna("unknown"),
            }
        )

    typed = triples.map_batches(add_types, batch_format="pandas")
    return partial_group_count(typed, ["subj_type", "pred", "obj_type"])


def meta_graph_join(
    triples: Dataset, entity_types: Dataset, *, num_partitions: Optional[int] = None
) -> Dataset:
    """:func:`meta_graph` without the broadcast dict — the scale plan
    when the entity→type table is entity-table-sized (reference
    ``meta_graph.py:20-115`` resolves types via joins too). Two
    left-outer joins against the ``entity_types`` Dataset resolve
    subject and object types ('unknown' fill), then the same map-side
    combined count. The broadcast variant stays as the fast path for
    vocabulary-sized type maps; pytest asserts both plans equal."""
    num_partitions = resolve_join_partitions(num_partitions)
    j1 = triples.select_columns(["subj", "pred", "obj"]).join(
        rename_cols(entity_types, {"etype": "subj_type"}),
        join_type="left_outer", num_partitions=num_partitions,
        on=("subj",), right_on=("entity_id",),
    )
    j2 = j1.join(
        rename_cols(entity_types, {"entity_id": "o_ent", "etype": "obj_type"}),
        join_type="left_outer", num_partitions=num_partitions,
        on=("obj",), right_on=("o_ent",),
    )

    def fix(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "subj_type": b["subj_type"].fillna("unknown"),
                "pred": b["pred"],
                "obj_type": b["obj_type"].fillna("unknown"),
            }
        )

    typed = scrub_empty_blocks(j2.map_batches(fix, batch_format="pandas"))
    return partial_group_count(typed, ["subj_type", "pred", "obj_type"])


def entity_outlinks(triples: Dataset) -> Dataset:
    """(entity_id, outlinks) — sorted unique target list per subject
    (reference ``entity_outlinks``,
    ``kgdata/wikidata/datasets/entity_outlinks.py:19-103``: per-entity
    set-union of outgoing targets)."""

    def block(b: pd.DataFrame) -> pa.Table:
        out = (
            b.groupby("subj", sort=False)["obj"]
            .agg(lambda s: sorted(set(s)))
            .reset_index()
            .rename(columns={"subj": "entity_id", "obj": "outlinks"})
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        return b[["subj", "obj"]].drop_duplicates()

    pruned = triples.map_batches(pre, batch_format="pandas")
    return grouped_blockwise(pruned, ["subj"], block)


def property_domains(
    triples: Dataset, entity_types: Dataset, *, num_partitions: Optional[int] = None
) -> Dataset:
    """(pred, subj_type, n): per-property distribution of subject types
    (reference ``property_domains``,
    ``kgdata/wikidata/datasets/property_domains.py:11-72`` — the
    dict-sum reduceByKey re-expressed as one hash join + map-side
    combined count; the shuffle moves (pred, type) partials)."""
    num_partitions = resolve_join_partitions(num_partitions)
    j = triples.select_columns(["subj", "pred"]).join(
        entity_types, join_type="inner", num_partitions=num_partitions,
        on=("subj",), right_on=("entity_id",),
    )
    typed = rename_cols(j, {"etype": "subj_type"})
    return partial_group_count(typed.select_columns(["pred", "subj_type"]),
                               ["pred", "subj_type"])


def property_ranges(
    triples: Dataset, entity_types: Dataset, *, num_partitions: Optional[int] = None
) -> Dataset:
    """(pred, obj_type, n): per-property distribution of object-value
    types (reference ``property_ranges``,
    ``kgdata/wikidata/datasets/property_ranges.py:15-76``:
    reduce→join→flatMap→reduce — here join-then-combine; literal-valued
    objects have no entity type and drop out of the inner join, matching
    the reference's "empty types produce nothing")."""
    num_partitions = resolve_join_partitions(num_partitions)
    j = triples.select_columns(["pred", "obj"]).join(
        entity_types, join_type="inner", num_partitions=num_partitions,
        on=("obj",), right_on=("entity_id",),
    )
    typed = rename_cols(j, {"etype": "obj_type"})
    return partial_group_count(typed.select_columns(["pred", "obj_type"]),
                               ["pred", "obj_type"])


def property_connections(
    triples: Dataset, entity_types: Dataset, *, num_partitions: Optional[int] = None
) -> Dataset:
    """(pred, subj_type, obj_type, freq): schema-level connection table
    (reference ``main_property_connections``,
    ``main_property_connections.py:28-48``:
    combineByKey→leftOuterJoin→reduceByKey). Literal objects keep an
    empty obj_type (the reference's target_type=None connections) —
    unlike :func:`meta_graph`, which rolls unknowns up as 'unknown'."""
    num_partitions = resolve_join_partitions(num_partitions)
    j1 = triples.select_columns(["subj", "pred", "obj"]).join(
        entity_types, join_type="inner", num_partitions=num_partitions,
        on=("subj",), right_on=("entity_id",),
    )
    j1 = rename_cols(j1, {"etype": "subj_type"})
    j2 = j1.join(
        rename_cols(entity_types, {"entity_id": "o_ent", "etype": "obj_type"}),
        join_type="left_outer", num_partitions=num_partitions,
        on=("obj",), right_on=("o_ent",),
    )

    def fix(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "pred": b["pred"],
                "subj_type": b["subj_type"],
                "obj_type": b["obj_type"].fillna(""),
            }
        )

    typed = j2.map_batches(fix, batch_format="pandas")
    return partial_group_count(typed, ["pred", "subj_type", "obj_type"],
                               count_name="freq")


def pagerank(
    edges: Dataset,
    *,
    src_col: str = "subj",
    dst_col: str = "obj",
    damping: float = 0.85,
    iters: int = 10,
    num_partitions: Optional[int] = None,
    personalization: "Optional[Sequence[str]]" = None,
) -> Dataset:
    """Distributed PageRank: (node_id, rank) after ``iters`` power
    iterations. Dangling mass is redistributed uniformly each round so
    ranks sum to 1 (graph-tool-compatible semantics).

    With ``personalization`` (a seed node list) this becomes
    personalized PageRank — the teleport AND the dangling mass land on
    the seeds (uniform over them) instead of all nodes, yielding the
    seed-relative relatedness scores entity-recommendation uses. The
    seed set broadcasts once; everything else is the same loop.

    Each round: join ranks onto the out-degree-weighted edge list,
    groupby(dst).sum the contributions, rebuild the rank vector. The
    rank vector never leaves the cluster.
    """

    num_partitions = resolve_join_partitions(num_partitions)
    def edge_pairs(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"src": b[src_col], "dst": b[dst_col]})

    pairs = edges.map_batches(edge_pairs, batch_format="pandas").materialize()

    # node universe + out-degrees
    nodes_src = pairs.map_batches(
        lambda b: pd.DataFrame({"node_id": b["src"]}), batch_format="pandas"
    )
    nodes_dst = pairs.map_batches(
        lambda b: pd.DataFrame({"node_id": b["dst"]}), batch_format="pandas"
    )

    def distinct_block(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates("node_id")

    nodes = grouped_blockwise(
        nodes_src.union(nodes_dst), ["node_id"], distinct_block
    ).materialize()
    n_nodes = nodes.count()

    outdeg = rename_cols(
        partial_group_count(pairs, "src", count_name="out_degree"),
        {"src": "od_node"},
    ).materialize()

    # static (node_id, out_degree) joined ONCE; the rank table carries
    # out_degree forward every round, saving one ranks⋈outdeg join per
    # iteration (pure sinks get out_degree 0 — they never match the
    # src-side contribution join, so no division by zero occurs)
    def fill_deg(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node_id": b["node_id"],
                "out_degree": b["out_degree"].fillna(0).astype("int64"),
            }
        )

    ndeg = scrub_empty_blocks(
        nodes.join(
            outdeg, join_type="left_outer", num_partitions=num_partitions,
            on=("node_id",), right_on=("od_node",),
        ).map_batches(fill_deg, batch_format="pandas"),
        target_blocks=num_partitions,
    ).materialize()

    if personalization is not None:
        import ray

        from ..functions.broadcast import get_broadcast

        seeds = sorted(set(personalization))
        seed_probe = set(seeds)

        # Seeds absent from the edge-derived node universe would make
        # the pers vector silently all-zero (degenerate all-zero
        # ranks). Renormalize over the seeds actually present; raise
        # when none are. The probe result is bounded by len(seeds).
        def find_present(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"node_id": b["node_id"][b["node_id"].isin(seed_probe)]})

        present = sorted(
            r["node_id"]
            for r in nodes.map_batches(
                find_present, batch_format="pandas").take_all())
        if not present:
            raise ValueError(
                "pagerank personalization: none of the "
                f"{len(seeds)} seed(s) appear in the graph's node set")
        pshare = 1.0 / len(present)
        seed_ref = ray.put(set(present))

        def add_pers(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["pers"] = np.where(
                b["node_id"].isin(get_broadcast(seed_ref)), pshare, 0.0)
            return b

        ndeg = ndeg.map_batches(add_pers,
                                batch_format="pandas").materialize()

    def init_ranks(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["rank"] = (b["pers"] if personalization is not None
                     else 1.0 / n_nodes)
        return b

    ranks = ndeg.map_batches(init_ranks, batch_format="pandas").materialize()

    for _ in range(iters):
        # contribution of each edge = rank(src)/outdeg(src)
        contrib_in = pairs.join(
            ranks,
            join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("node_id",),
        )

        # Arrow-native projection: the join output blocks are Arrow,
        # so this is zero-copy column reuse + one vectorized divide
        # (no pandas round-trip inside the power-iteration loop)
        def to_contrib(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            c = pc.divide(pc.cast(t["rank"], pa.float64()),
                          pc.cast(t["out_degree"], pa.float64()))
            return pa.table({"dst": t["dst"], "c": c})

        def sum_block(b: pd.DataFrame) -> pa.Table:
            out = b.groupby("dst", sort=False)["c"].sum().reset_index()
            return pa.Table.from_pandas(out, preserve_index=False)

        sums = scrub_empty_blocks(
            grouped_blockwise(
                contrib_in.map_batches(to_contrib, batch_format="pyarrow"),
                ["dst"], sum_block,
            ),
            target_blocks=num_partitions,
        )

        # dangling mass = 1 - sum of distributed contributions
        distributed = sums.sum("c") or 0.0
        dangling = max(0.0, 1.0 - distributed)

        merged = ndeg.join(
            rename_cols(sums, {"dst": "s_node"}),
            join_type="left_outer", num_partitions=num_partitions,
            on=("node_id",), right_on=("s_node",),
        )
        base = (1.0 - damping) / n_nodes
        dshare = damping * dangling / n_nodes

        def new_rank(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            c = pc.fill_null(pc.cast(t["c"], pa.float64()), 0.0)
            if personalization is not None:
                # teleport + dangling both land on the seed vector
                p = pc.cast(t["pers"], pa.float64())
                rank = pc.add(
                    pc.multiply(c, pa.scalar(damping)),
                    pc.multiply(p, pa.scalar(
                        (1.0 - damping) + damping * dangling)))
                return pa.table({"node_id": t["node_id"],
                                 "out_degree": t["out_degree"],
                                 "pers": p,
                                 "rank": rank})
            rank = pc.add(pc.multiply(c, pa.scalar(damping)),
                          pa.scalar(base + dshare))
            return pa.table({"node_id": t["node_id"],
                             "out_degree": t["out_degree"],
                             "rank": rank})

        ranks = scrub_empty_blocks(
            merged.map_batches(new_rank, batch_format="pyarrow"),
            target_blocks=num_partitions,
        ).materialize()

    return ranks.select_columns(["node_id", "rank"])


def rank_moments(ranks: Dataset, *, col: str = "rank") -> dict:
    """Distributed moments of the rank vector (sum/mean/std + log-mean),
    reference analog ``entity_pagerank.py:194-207`` — computed with
    dataset aggregates, nothing collected but scalars."""
    import numpy as np

    def logs(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"log_rank": np.log(b[col].clip(lower=1e-300))})

    return {
        "sum": ranks.sum(col),
        "mean": ranks.mean(col),
        "std": ranks.std(col),
        "log_mean": ranks.map_batches(logs, batch_format="pandas").mean("log_rank"),
    }



def co_mention_edges(triples: Dataset) -> Dataset:
    """Undirected distinct edges (u < v) between entities appearing as
    subjects in the same conversation — the co-mention projection of
    the triple table. Pair generation happens inside per-conversation
    groups (conversation-bounded, so per-group combinations stay
    tiny); the wide ops are the conv_id grouped shuffle and the final
    distinct. EXACT under skew: a pathological hot conversation streams
    through bounded pair tiles (functions/pairtiles.py) instead of the
    silent first-K truncation it used to get — CPU grows with the true
    pair count, memory stays flat, no pair is ever dropped."""
    from ..functions.agg import distinct_rows
    from ..functions.pairtiles import grouped_pair_tables

    s = distinct_rows(triples.select_columns(["conv_id", "subj"]),
                      ["conv_id", "subj"])

    def pairs(b: pd.DataFrame):
        yield from grouped_pair_tables(b, "conv_id", "subj", "u", "v",
                                       dedup=True)

    edged = grouped_blockwise(s, ["conv_id"], pairs)
    return distinct_rows(edged, ["u", "v"])


def triangles(edges: Dataset, *, num_partitions: Optional[int] = None) -> Dataset:
    """All triangles (a < b < c) of an undirected edge Dataset with
    columns ``u < v`` — one output row per triangle, found exactly
    once.

    The standard distributed plan: orient every edge from its
    lower-(degree, id) endpoint to the higher one — out-degrees are
    then O(sqrt(m)) even on skewed graphs, which bounds wedge
    generation — enumerate wedges with a self-join on the apex, and
    close them with one two-column hash join back against the oriented
    edge list. Nothing collects on the driver; the degree count and
    the three hash joins are the only wide ops."""
    num_partitions = resolve_join_partitions(num_partitions)
    import numpy as np

    from ..functions.blocks import scrub_empty_blocks

    edges = edges.materialize()  # consumed twice (degrees + orientation)

    def endpoints(b: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame(
            {"node": pd.concat([b["u"], b["v"]], ignore_index=True)})
        return pa.Table.from_pandas(out, preserve_index=False)

    deg = partial_group_count(
        edges.map_batches(endpoints, batch_format="pandas"),
        "node", count_name="deg").materialize()  # node-count-sized; feeds 2 joins

    j = edges.join(rename_cols(deg, {"node": "un", "deg": "deg_u"}),
                   join_type="inner", num_partitions=num_partitions,
                   on=("u",), right_on=("un",))
    j = j.join(rename_cols(deg, {"node": "vn", "deg": "deg_v"}),
               join_type="inner", num_partitions=num_partitions,
               on=("v",), right_on=("vn",))

    def orient(b: pd.DataFrame) -> pa.Table:
        u_first = (b["deg_u"] < b["deg_v"]) | (
            (b["deg_u"] == b["deg_v"]) & (b["u"] < b["v"]))
        out = pd.DataFrame({
            "src": np.where(u_first, b["u"], b["v"]),
            "dst": np.where(u_first, b["v"], b["u"]),
            "deg_dst": np.where(u_first, b["deg_v"], b["deg_u"]),
        })
        return pa.Table.from_pandas(out, preserve_index=False)

    oriented = scrub_empty_blocks(
        j.map_batches(orient, batch_format="pandas")).materialize()

    left = oriented.map_batches(
        lambda t: t.rename_columns(["apex", "w1", "deg1"]),
        batch_format="pyarrow")
    right = oriented.map_batches(
        lambda t: t.select(["src", "dst", "deg_dst"])
        .rename_columns(["apex2", "w2", "deg2"]),
        batch_format="pyarrow")
    wedges = left.join(right, join_type="inner",
                       num_partitions=num_partitions,
                       on=("apex",), right_on=("apex2",))

    def order_wedge(b: pd.DataFrame) -> pa.Table:
        keep = (b["deg1"] < b["deg2"]) | (
            (b["deg1"] == b["deg2"]) & (b["w1"] < b["w2"]))
        out = b.loc[keep, ["apex", "w1", "w2"]]
        return pa.Table.from_pandas(out, preserve_index=False)

    cand = scrub_empty_blocks(
        wedges.map_batches(order_wedge, batch_format="pandas"))

    closing = oriented.map_batches(
        lambda t: t.select(["src", "dst"]).rename_columns(["c1", "c2"]),
        batch_format="pyarrow")
    tri = cand.join(closing, join_type="inner",
                    num_partitions=num_partitions,
                    on=("w1", "w2"), right_on=("c1", "c2"))

    def canon(b: pd.DataFrame) -> pa.Table:
        arr = np.sort(
            b[["apex", "w1", "w2"]].to_numpy(dtype=object), axis=1)
        out = pd.DataFrame({"a": arr[:, 0], "b": arr[:, 1],
                            "c": arr[:, 2]})
        return pa.Table.from_pandas(out, preserve_index=False)

    return scrub_empty_blocks(tri.map_batches(canon, batch_format="pandas"))


def k_core(edges: Dataset, k: int, *, max_rounds: int = 200) -> Dataset:
    """Nodes of the k-core of an undirected edge Dataset (columns
    ``u``/``v``): iterative peeling — drop every node with current
    degree < k (and its edges) until none remains, the standard
    distributed decomposition loop. Each round is one map-side-combined
    degree count plus two size-guarded anti joins (broadcast while the
    removed set fits the key cap, shuffle existence join above it); the
    surviving edge set is checkpointed per round like the PageRank
    iteration.
    Raises if the loop hasn't converged within ``max_rounds``."""
    from ..functions.joins import anti_join

    def endpoints(b: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame(
            {"node": pd.concat([b["u"], b["v"]], ignore_index=True)})
        return pa.Table.from_pandas(out, preserve_index=False)

    cur = edges.materialize()
    for _ in range(max_rounds):
        if cur.count() == 0:
            break
        deg = partial_group_count(
            cur.map_batches(endpoints, batch_format="pandas"),
            "node", count_name="deg")

        def low(b: pd.DataFrame) -> pd.DataFrame:
            return b.loc[b["deg"] < k, ["node"]]

        bad = deg.map_batches(low, batch_format="pandas").materialize()
        if bad.count() == 0:
            break
        # "auto": broadcast while the removed set fits the key cap —
        # the first peel round can drop a large fraction of all nodes,
        # where the shuffle existence-join plan takes over
        cur = anti_join(
            anti_join(cur, bad, "u", right_on="node", plan="auto"),
            bad, "v", right_on="node", plan="auto",
        ).materialize()
    else:
        raise RuntimeError(f"k_core: no convergence in {max_rounds} rounds")

    from ..functions.agg import distinct_rows

    nodes = cur.map_batches(endpoints, batch_format="pandas")
    return distinct_rows(nodes, ["node"])


def core_numbers(edges: Dataset, *, max_rounds: int = 100,
                 num_partitions: Optional[int] = None) -> Dataset:
    """(node, core) for every node of an undirected edge Dataset — the
    full k-core decomposition via H-index iteration (Lü et al. 2016,
    "The H-index of a network node and its relation to degree and
    coreness"): start each estimate at the degree, then repeatedly set
    est(n) to the H-index of its neighbors' estimates; the fixed point
    is exactly the core number. Converges in ~O(log-ish) rounds (8-13
    on the test graphs) where direct peeling needs a distributed sweep
    per removal wave (~120). Per round: one hash join of the directed
    edge list against the estimate table + one grouped vectorized
    H-index kernel. Estimates only ever decrease, so convergence is
    detected by a scalar sum comparison — no per-node diff join."""
    num_partitions = resolve_join_partitions(num_partitions)
    import numpy as np

    def both_dirs(b: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({
            "node": pd.concat([b["u"], b["v"]], ignore_index=True),
            "nbr": pd.concat([b["v"], b["u"]], ignore_index=True),
        })
        return pa.Table.from_pandas(out, preserve_index=False)

    both = edges.map_batches(
        both_dirs, batch_format="pandas").materialize()
    est = rename_cols(
        partial_group_count(both.select_columns(["node"]), "node",
                            count_name="est"),
        {"node": "enode"},
    ).materialize()
    total = int(est.sum("est"))

    def hindex(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values(["node", "nbr_est"],
                          ascending=[True, False], kind="mergesort")
        r = b.groupby("node", sort=False).cumcount().to_numpy() + 1
        ok = b["nbr_est"].to_numpy() >= r
        b["__h"] = np.where(ok, r, 0)
        out = (
            b.groupby("node", sort=False)["__h"].max().reset_index()
            .rename(columns={"__h": "est"})
        )
        out["est"] = out["est"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    for _ in range(max_rounds):
        j = both.join(
            rename_cols(est, {"enode": "nn", "est": "nbr_est"}),
            join_type="inner", num_partitions=num_partitions,
            on=("nbr",), right_on=("nn",),
        )
        est = rename_cols(
            grouped_blockwise(
                scrub_empty_blocks(
                    j.select_columns(["node", "nbr_est"])),
                ["node"], hindex),
            {"node": "enode"},
        ).materialize()
        new_total = int(est.sum("est"))
        if new_total == total:
            break
        total = new_total
    else:
        raise RuntimeError(
            f"core_numbers: no convergence in {max_rounds} rounds")

    return rename_cols(est, {"enode": "node", "est": "core"})


def adamic_adar(edges: Dataset) -> Dataset:
    """Adamic–Adar link-prediction scores for every node pair with at
    least one common neighbor: ``aa = sum_z 1/ln(deg(z))`` over common
    neighbors ``z`` (Adamic & Adar 2003, "Friends and neighbors on the
    web"). Input: undirected distinct edges ``(u < v)``.

    Plan: expand to adjacency (node, nb); ONE grouped shuffle on the
    neighbor key — within each group the neighbor set of ``z`` IS its
    degree, so each pair of the group contributes ``1/ln(|group|)``
    with no separate degree table or wedge join; then one
    map-side-combined sum shuffle on the pair key. A quadratic hub
    group streams through bounded pair tiles (functions/pairtiles.py)
    — exact under skew, no truncation; scores are rounded to 6 dp so
    the float sum order never shows."""
    import numpy as np

    from ..functions.pairtiles import grouped_pair_tables

    def both_dirs(b: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({
            "node": pd.concat([b["u"], b["v"]], ignore_index=True),
            "nb": pd.concat([b["v"], b["u"]], ignore_index=True),
        })
        return pa.Table.from_pandas(out, preserve_index=False)

    adj = edges.map_batches(both_dirs, batch_format="pandas")

    def wedge_pairs(b: pd.DataFrame):
        yield from grouped_pair_tables(
            b, "nb", "node", "p", "q",
            weight_fn=lambda n: 1.0 / np.log(n), weight_name="w")

    wedges = grouped_blockwise(adj, ["nb"], wedge_pairs)

    def partial_sum(b: pd.DataFrame) -> pd.DataFrame:
        return (b.groupby(["p", "q"], as_index=False)
                .agg(w=("w", "sum"), n=("w", "size")))

    partial = wedges.map_batches(partial_sum, batch_format="pandas")

    def final(b: pd.DataFrame) -> pa.Table:
        out = (b.groupby(["p", "q"], as_index=False)
               .agg(w=("w", "sum"), n=("n", "sum")))
        out["aa_score"] = out["w"].round(6)
        out["common_neighbors"] = out["n"].astype("int64")
        return pa.Table.from_pandas(
            out[["p", "q", "common_neighbors", "aa_score"]],
            preserve_index=False)

    return grouped_blockwise(partial, ["p", "q"], final)


def pmi_pairs(convs: Dataset) -> Dataset:
    """Pointwise mutual information between entities over conversation
    co-occurrence: ``pmi(p,q) = ln(c_pq * N / (c_p * c_q))`` with
    ``c_x`` = #conversations mentioning ``x``, ``N`` = #conversations
    (Church & Hanks 1990). Input: distinct ``(conv_id, subj)`` rows.

    One grouped shuffle on conv_id generates per-conversation pairs
    (exact under skew via bounded pair tiles — no truncation), a count
    shuffle yields ``c_pq``, the small per-entity count table joins
    back twice. ``N`` is a driver scalar (one count of the grouped
    keys)."""
    import numpy as np

    from ..functions.agg import distinct_rows
    from ..functions.pairtiles import grouped_pair_tables

    convs = convs.materialize()  # consumed 3x: N, c_x, pairs
    n_convs = distinct_rows(
        convs.select_columns(["conv_id"]), ["conv_id"]).count()
    cx = partial_group_count(convs.select_columns(["subj"]), "subj",
                             count_name="cx").materialize()

    def pairs(b: pd.DataFrame):
        yield from grouped_pair_tables(b, "conv_id", "subj", "p", "q")

    cpq = partial_group_count(
        grouped_blockwise(convs, ["conv_id"], pairs),
        ["p", "q"], count_name="cpq")

    j = cpq.join(rename_cols(cx, {"subj": "pe", "cx": "cp"}),
                 join_type="inner", num_partitions=default_join_partitions(),
                 on=("p",), right_on=("pe",))
    # a join emits schema-less blocks for empty partitions; rebuild
    # before the next Arrow join keys on them
    j = scrub_empty_blocks(j).join(
        rename_cols(cx, {"subj": "qe", "cx": "cq"}),
        join_type="inner", num_partitions=default_join_partitions(),
        on=("q",), right_on=("qe",))

    def score(b: pd.DataFrame) -> pa.Table:
        b = b.copy()
        b["pmi"] = np.round(np.log(
            b["cpq"].to_numpy(dtype=np.float64) * float(n_convs)
            / (b["cp"].to_numpy(dtype=np.float64)
               * b["cq"].to_numpy(dtype=np.float64))), 6)
        b["cpq"] = b["cpq"].astype("int64")
        return pa.Table.from_pandas(b[["p", "q", "cpq", "pmi"]],
                                    preserve_index=False)

    return scrub_empty_blocks(j).map_batches(
        score, batch_format="pandas")


def neighborhood_jaccard(edges: Dataset, *,
                         num_partitions: Optional[int] = None) -> Dataset:
    """Jaccard similarity of neighbor SETS for every node pair with at
    least one common neighbor: ``|N(p) ∩ N(q)| / |N(p) ∪ N(q)|`` — the
    set-overlap cousin of :func:`adamic_adar` (entity-similarity /
    duplicate-entity detection over a KG). Common-neighbor counts come
    from the same degree-free neighbor-key grouped shuffle (exact under
    skew via bounded pair tiles); degrees join in from the
    node-count-sized table. The division is exact ints → double, so no
    rounding is needed for engine parity."""
    num_partitions = resolve_join_partitions(num_partitions)
    import numpy as np

    from ..functions.pairtiles import grouped_pair_tables

    edges = edges.materialize()  # consumed twice (adjacency + degrees)

    def both_dirs(b: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({
            "node": pd.concat([b["u"], b["v"]], ignore_index=True),
            "nb": pd.concat([b["v"], b["u"]], ignore_index=True),
        })
        return pa.Table.from_pandas(out, preserve_index=False)

    adj = edges.map_batches(both_dirs, batch_format="pandas")
    deg = partial_group_count(adj.select_columns(["node"]), "node",
                              count_name="deg").materialize()

    def wedge_pairs(b: pd.DataFrame):
        yield from grouped_pair_tables(b, "nb", "node", "p", "q")

    common = partial_group_count(
        grouped_blockwise(adj, ["nb"], wedge_pairs),
        ["p", "q"], count_name="common")

    j = common.join(rename_cols(deg, {"node": "pe", "deg": "dp"}),
                    join_type="inner", num_partitions=num_partitions,
                    on=("p",), right_on=("pe",))
    j = scrub_empty_blocks(j).join(
        rename_cols(deg, {"node": "qe", "deg": "dq"}),
        join_type="inner", num_partitions=num_partitions,
        on=("q",), right_on=("qe",))

    def score(b: pd.DataFrame) -> pa.Table:
        b = b.copy()
        c = b["common"].to_numpy(dtype=np.float64)
        b["jaccard"] = c / (b["dp"].to_numpy() + b["dq"].to_numpy()
                            - b["common"].to_numpy())
        b["common"] = b["common"].astype("int64")
        return pa.Table.from_pandas(b[["p", "q", "common", "jaccard"]],
                                    preserve_index=False)

    return scrub_empty_blocks(j).map_batches(
        score, batch_format="pandas")


# --------------------------------------------------------------------------
# Deterministic random walks (node2vec-style sampling, derandomized)


def random_walks(
    triples: Dataset, *, steps: int = 4,
    subj_col: str = "subj", obj_col: str = "obj",
) -> Dataset:
    """One deterministic walk of ``steps`` hops from every node with
    out-edges over the entity->entity triple graph:
    (start, step, node), step 0 = the start itself; a walk ends early
    at a sink. The "random" neighbor choice is derandomized to
    ``1 + (start_num * 1000003 + step * 10007) % degree`` over the
    SORTED distinct neighbor list — reproducible across any engine,
    so a recursive-CTE SQL oracle certifies it exactly (the walk
    corpus feeding node2vec/DeepWalk-style embedding trainers).

    Scale shape: adjacency is built by one grouped shuffle, neighbor
    lists packed as FIXED-WIDTH int64 buffers in a binary column
    (entity ids are ``E<num>``; binary payloads pass through any
    shuffle or join, unlike Arrow list columns) — the per-hop shuffle
    carries 8 bytes per neighbor instead of an id string, and the hop
    decode is one zero-copy ``np.frombuffer`` + fancy index instead of
    a per-row ``str.split``; each hop is one tagged-union shuffle on
    the current node co-grouping frontier rows with their adjacency
    row (the grouped_blockwise guarantee makes the in-block merge a
    correct join). Iterative by nature: ``steps`` shuffles, frontier
    never exceeds #nodes rows.
    """
    import pandas as pd

    from ..functions.agg import grouped_blockwise

    def entity_edges(b: pd.DataFrame) -> pa.Table:
        s = b[subj_col].astype(str)
        o = b[obj_col].astype(str)
        keep = s.str.startswith("E") & o.str.startswith("E")
        return pa.table(
            {
                "node": pa.array(s[keep], pa.string()),
                "nbr": pa.array(o[keep], pa.string()),
            }
        )

    edges = triples.select_columns([subj_col, obj_col]).map_batches(
        entity_edges, batch_format="pandas"
    )

    def build_adj(b: pd.DataFrame) -> pa.Table:
        # neighbor order = STRING sort of the ids (the derandomized
        # pick and its SQL oracle both index that order); the packed
        # payload is the numeric id in that same order, plus one byte
        # per neighbor recording its digit width so zero-padded ids
        # ("E0000003") reconstruct exactly
        b = (b.drop_duplicates(["node", "nbr"])
             .sort_values(["node", "nbr"], kind="mergesort"))
        b = b.assign(num=b["nbr"].str[1:].astype("int64"),
                     width=(b["nbr"].str.len() - 1).astype("uint8"))
        g = b.groupby("node", sort=True)
        packed = g["num"].agg(lambda s: s.to_numpy(np.int64).tobytes())
        widths = g["width"].agg(lambda s: s.to_numpy(np.uint8).tobytes())
        degs = g.size()
        return pa.table(
            {
                "node": pa.array(packed.index.to_numpy(), pa.string()),
                "nbrs": pa.array(packed.to_numpy(), pa.binary()),
                "nwid": pa.array(widths.to_numpy(), pa.binary()),
                "deg": pa.array(degs.to_numpy(np.int64), pa.int64()),
            }
        )

    adj = grouped_blockwise(edges, ["node"], build_adj)

    # tag/projection stages stay Arrow end-to-end (zero-copy column
    # reuse + constant columns; no pandas round-trip inside the loop)
    def start_frontier(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = t.num_rows
        snum = pc.cast(pc.utf8_slice_codeunits(t["node"], 1), pa.int64())
        return pa.table(
            {
                "start": t["node"],
                "snum": snum,
                "step": pa.array(np.zeros(n, np.int64), pa.int64()),
                "node": t["node"],
            }
        )

    frontier = adj.map_batches(start_frontier, batch_format="pyarrow")
    out_steps = [frontier]

    def tag_adj(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "node": t["node"],
                "kind": pa.array(np.ones(n, np.int64), pa.int64()),
                "start": pa.nulls(n, pa.string()),
                "snum": pa.array(np.zeros(n, np.int64), pa.int64()),
                "nbrs": t["nbrs"],
                "nwid": t["nwid"],
                "deg": t["deg"],
            }
        )

    adj_tagged = adj.map_batches(tag_adj, batch_format="pyarrow")

    for step in range(1, steps + 1):

        def tag_frontier(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table(
                {
                    "node": t["node"],
                    "kind": pa.array(np.zeros(n, np.int64), pa.int64()),
                    "start": t["start"],
                    "snum": t["snum"],
                    "nbrs": pa.nulls(n, pa.binary()),
                    "nwid": pa.nulls(n, pa.binary()),
                    "deg": pa.array(np.zeros(n, np.int64), pa.int64()),
                }
            )

        tagged = adj_tagged.union(
            frontier.map_batches(tag_frontier, batch_format="pyarrow")
        )

        def hop(b: pd.DataFrame, _step=step) -> pa.Table:
            a = b[b["kind"] == 1][["node", "nbrs", "nwid", "deg"]]
            f = b[b["kind"] == 0][["node", "start", "snum"]]
            if not len(a) or not len(f):
                return pa.table(
                    {
                        "start": pa.array([], pa.string()),
                        "snum": pa.array([], pa.int64()),
                        "step": pa.array([], pa.int64()),
                        "node": pa.array([], pa.string()),
                    }
                )
            m = f.merge(a, on="node", how="inner")
            deg = m["deg"].to_numpy(np.int64)
            idx = (m["snum"].to_numpy(np.int64) * 1000003
                   + _step * 10007) % deg
            # decode ONE neighbor per row from the packed int64
            # buffers: flat view + offset arithmetic, no per-row split
            flat = np.frombuffer(b"".join(m["nbrs"]), dtype=np.int64)
            wid = np.frombuffer(b"".join(m["nwid"]), dtype=np.uint8)
            starts = np.zeros(len(m), np.int64)
            starts[1:] = np.cumsum(deg)[:-1]
            pos = starts + idx
            nums, digs = flat[pos], wid[pos]
            nxt = np.empty(len(m), dtype=object)
            for w in np.unique(digs):  # one vectorized pass per width
                sel = digs == w
                nxt[sel] = np.char.add(
                    "E", np.char.zfill(nums[sel].astype(str), int(w)))
            return pa.table(
                {
                    "start": pa.array(m["start"], pa.string()),
                    "snum": pa.array(m["snum"].to_numpy(np.int64),
                                     pa.int64()),
                    "step": pa.array(
                        np.full(len(m), _step, np.int64), pa.int64()),
                    "node": pa.array(nxt, pa.string()),
                }
            )

        frontier = grouped_blockwise(tagged, ["node"], hop)
        out_steps.append(frontier)

    result = out_steps[0]
    for ds in out_steps[1:]:
        result = result.union(ds)
    return result.select_columns(["start", "step", "node"])


def walk_skipgram_pairs(
    walks: Dataset, *, window: int = 2,
) -> Dataset:
    """Skip-gram training pairs from a walk corpus: (node, context, n)
    where context lies within ``window`` steps of node in the same
    walk (both directions counted, the DeepWalk/node2vec pair
    generator). One grouped shuffle on the walk id with a vectorized
    in-block self-merge, map-side pair counting, then one small
    grouped count merge."""

    def pairs(b: pd.DataFrame) -> pa.Table:
        m = b[["start", "step", "node"]].merge(
            b[["start", "step", "node"]], on="start",
            suffixes=("_a", "_b"),
        )
        d = (m["step_a"] - m["step_b"]).abs()
        m = m[(d >= 1) & (d <= window)]
        out = (
            m.groupby(["node_a", "node_b"], sort=False)
            .size().rename("n").reset_index()
            .rename(columns={"node_a": "node", "node_b": "context"})
        )
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    per_walk = grouped_blockwise(walks, ["start"], pairs)

    def merge(b: pd.DataFrame) -> pa.Table:
        out = (
            b.groupby(["node", "context"], sort=False)["n"]
            .sum().reset_index()
        )
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return grouped_blockwise(per_walk, ["node", "context"], merge)


def entity_distances(
    triples: Dataset,
    seeds: "list[str]",
    *,
    max_hops: int = 6,
) -> Dataset:
    """Multi-source BFS over the undirected entity-entity graph:
    (entity_id, dist) = minimum hop count from any seed, bounded by
    ``max_hops`` — the neighborhood/relatedness query a KG serves
    ("everything within k hops of these entities"). Literal-valued
    objects (years, quantities) are not graph nodes and are filtered
    at the edge build.

    BFS discovers each node at its true minimum distance, so the
    per-round work is ONE frontier join + ONE anti join against the
    settled set — per-round volume is frontier-sized, never
    graph-sized, and rounds are bounded by ``max_hops``. Certified
    against a DuckDB recursive-CTE min-distance oracle.
    """
    import ray.data as rd

    from ..functions.agg import grouped_blockwise
    from ..functions.blocks import scrub_empty_blocks
    from ..functions.joins import anti_join, default_join_partitions

    def edges_fn(b: pd.DataFrame) -> pa.Table:
        m = b["obj"].str.match(r"^E[0-9]+$")
        e = b.loc[m, ["subj", "obj"]]
        both = pd.concat([
            pd.DataFrame({"u": e["subj"], "v": e["obj"]}),
            pd.DataFrame({"u": e["obj"], "v": e["subj"]}),
        ], ignore_index=True).drop_duplicates()
        return pa.Table.from_pandas(both, preserve_index=False)

    edges = (triples.select_columns(["subj", "obj"])
             .map_batches(edges_fn, batch_format="pandas")
             .materialize())

    dist = rd.from_arrow(pa.table({
        "entity_id": pa.array(sorted(set(seeds)), pa.string()),
        "dist": pa.array([0] * len(set(seeds)), pa.int64()),
    })).materialize()
    frontier = dist

    def first_block(b: pd.DataFrame) -> pa.Table:
        out = b.drop_duplicates(["entity_id"])
        return pa.Table.from_pandas(out, preserve_index=False)

    for h in range(1, max_hops + 1):
        ext = frontier.join(
            edges, join_type="inner",
            num_partitions=default_join_partitions(),
            on=("entity_id",), right_on=("u",),
        )

        def hop(b: pd.DataFrame, _h=h) -> pa.Table:
            return pa.Table.from_pandas(pd.DataFrame({
                "entity_id": b["v"],
                "dist": np.full(len(b), _h, dtype=np.int64),
            }).drop_duplicates(["entity_id"]), preserve_index=False)

        cand = grouped_blockwise(
            scrub_empty_blocks(ext.map_batches(hop,
                                               batch_format="pandas")),
            ["entity_id"], first_block)
        def arrow_out(b: pd.DataFrame) -> pa.Table:
            # keep every block Arrow: mixed pandas/Arrow unions break
            # downstream aggregates (see kgdata-ray block-type gotcha)
            return pa.Table.from_pandas(b, preserve_index=False)

        new = scrub_empty_blocks(
            anti_join(cand, dist, "entity_id")
            .map_batches(arrow_out, batch_format="pandas")).materialize()
        if new.count() == 0:
            break
        dist = dist.union(new).materialize()
        frontier = new
    return dist
