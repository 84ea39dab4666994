"""SemDeDup: semantic deduplication of an embedding corpus
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication").

The composition: (1) cluster the embeddings with the engine's
fixed-point distributed k-means (`similarity.kmeans_embeddings` —
bit-identical under any batching), (2) co-locate each cluster with ONE
grouped shuffle on the cluster id, (3) inside each cluster find exact
cosine near-duplicate pairs (>= ``threshold``) with a vectorized
Gram-matrix pass, union them into components, and keep exactly one
representative per component (deterministic: the smallest vec_id — the
paper's farthest-from-centroid pick is a quality heuristic; the
engine pins a reproducible rule so a sequential golden can certify it
bit-for-bit).

Scale shape: the quadratic work is confined to within-cluster blocks —
that is the whole point of SemDeDup (k ~ sqrt(N) keeps clusters
bounded); vectors travel the cluster shuffle ONCE, packed as
fixed-width float64 binary (Arrow binary columns pass through any
shuffle; lists do not join). The Gram matrix of an over-sized cluster
is evaluated in row tiles so memory stays bounded even on a degenerate
clustering. Nothing is collected on the driver.

Reference analog: none — the reference predates embedding curation;
this is part of the engine's LLM-training-data surface (brief:
"embedding-cosine near-dup" / SemDeDup cluster step).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from ..functions.joins import resolve_join_partitions

# rows per Gram-matrix tile inside a cluster block: bounds peak memory
# at tile x cluster_size doubles even for degenerate giant clusters
_GRAM_TILE = 4096


def _components_from_pairs(n: int, ii: np.ndarray, jj: np.ndarray) -> np.ndarray:
    """Union-find over ``n`` local items given near-dup pair index
    arrays; returns the component root per item (path-compressed)."""
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(ii.tolist(), jj.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return np.asarray([find(i) for i in range(n)], dtype=np.int64)


def semdedup(
    emb: Dataset,
    *,
    k: int = 8,
    n_iter: int = 3,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_partitions: Optional[int] = None,
) -> Dataset:
    """(vec_id, cluster, rep_id, kept) for every vector: ``rep_id`` is
    the representative of the vector's within-cluster near-duplicate
    component (cosine >= ``threshold``), ``kept`` marks the one row
    per component a curated corpus would keep. Non-duplicated vectors
    are their own representative."""
    num_partitions = resolve_join_partitions(num_partitions)
    import ray

    from ..functions.agg import grouped_blockwise
    from ..functions.blocks import scrub_empty_blocks
    from .similarity import kmeans_embeddings

    emb = emb.select_columns([id_col, vec_col]).materialize()
    # consumed twice: the k-means loop and the cluster co-location join
    assign = kmeans_embeddings(emb, k=k, n_iter=n_iter, id_col=id_col,
                               vec_col=vec_col, cache=False)

    def pack(t: pa.Table) -> pa.Table:
        from .dedup import _pack_f64_rows
        from .similarity import _ids64, _vec_matrix

        mat = np.ascontiguousarray(_vec_matrix(t, vec_col))
        return pa.table({
            id_col: pa.array(_ids64(t, id_col), pa.int64()),
            "vec_bytes": _pack_f64_rows(mat),
        })

    # num_partitions sizes the co-location join AND the cluster
    # shuffle's parallelism — raise with corpus size (clusters per
    # partition ~= k / num_partitions)
    packed = emb.map_batches(pack, batch_format="pyarrow")
    j = scrub_empty_blocks(
        packed.join(assign, join_type="inner",
                    num_partitions=num_partitions, on=(id_col,)))

    def dedup_cluster(b: pd.DataFrame) -> pa.Table:
        out_id: list[np.ndarray] = []
        out_cl: list[np.ndarray] = []
        out_rep: list[np.ndarray] = []
        out_keep: list[np.ndarray] = []
        for cl, g in b.groupby("cluster", sort=True):
            g = g.sort_values(id_col, kind="mergesort")
            ids = g[id_col].to_numpy(np.int64)
            mat = np.frombuffer(
                b"".join(g["vec_bytes"]), dtype=np.float64,
            ).reshape(len(g), -1)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0.0] = 1.0
            unit = mat / norms[:, None]
            ii_parts, jj_parts = [], []
            for r0 in range(0, len(g), _GRAM_TILE):
                tile = unit[r0:r0 + _GRAM_TILE] @ unit.T
                ti, tj = np.nonzero(
                    np.round(tile, 6) >= round(threshold, 6))
                keep_ut = r0 + ti < tj  # upper triangle only
                ii_parts.append(r0 + ti[keep_ut])
                jj_parts.append(tj[keep_ut])
            ii = np.concatenate(ii_parts) if ii_parts else np.array([], np.int64)
            jj = np.concatenate(jj_parts) if jj_parts else np.array([], np.int64)
            roots = _components_from_pairs(len(g), ii, jj)
            rep = ids[roots]  # smallest id: union-find roots keep min index
            out_id.append(ids)
            out_cl.append(np.full(len(g), int(cl), np.int64))
            out_rep.append(rep)
            out_keep.append(rep == ids)
        if not out_id:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "rep_id": pa.array([], pa.int64()),
                "kept": pa.array([], pa.bool_()),
            })
        return pa.table({
            id_col: pa.array(np.concatenate(out_id), pa.int64()),
            "cluster": pa.array(np.concatenate(out_cl), pa.int64()),
            "rep_id": pa.array(np.concatenate(out_rep), pa.int64()),
            "kept": pa.array(np.concatenate(out_keep), pa.bool_()),
        })

    return grouped_blockwise(j, ["cluster"], dedup_cluster)
