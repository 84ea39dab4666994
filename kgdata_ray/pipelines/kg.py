"""Flagship pipeline: transcripts -> deduplicated canonical triples.

Dataflow (SURVEY §7.1; each stage is a lazy Ray Data transform, the
whole chain executes as one streaming pipeline with backpressure):

    read/synthesize transcripts
      -> reconstruct (hash shuffle on conv_id, in-group sort turn_idx)
      -> extract_raw (stateless vectorized map_batches)
      -> link (broadcast actor pool, or hash-join at scale)
      -> canonicalize (broadcast canonical map rewrite)
      -> dedup on (subj, pred, obj) keeping first occurrence
         (shuffle on the triple key)

Reference semantics being reproduced: grouped dump parsing
(``triple_truthy_dump.py:45-97``), alias-dict linking
(``mention_to_entities.py``), redirect canonicalization
(``entities.py:179-260``), exact dedup + uniqueness post-conditions
(``entities.py:150-157``).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from ..stages.canonicalize import apply_canonical_map, canonical_map_from_table
from ..stages.extract import extract_raw
from ..stages.linking import (
    alias_candidates,
    best_candidate_map,
    link_broadcast,
    link_via_join,
)
from ..stages.reconstruct import reconstruct_turns

TRIPLE_COLUMNS = ("subj", "pred", "obj", "conv_id", "turn_idx")


def _first_by_provenance(g: pd.DataFrame) -> pd.DataFrame:
    return g.sort_values(["conv_id", "turn_idx"], kind="mergesort").head(1)


def dedup_triples(linked: Dataset) -> Dataset:
    """Exact dedup on (subj, pred, obj), keeping the first occurrence in
    (conv_id, turn_idx) order — deterministic provenance."""
    return (
        linked.groupby(["subj", "pred", "obj"])
        .map_groups(_first_by_provenance, batch_format="pandas")
        .select_columns(list(TRIPLE_COLUMNS))
    )


def kg_triples(
    transcripts: Dataset,
    gazetteer: pa.Table,
    redirects: pa.Table,
    *,
    linking: str = "broadcast",
    num_partitions: int = 8,
) -> Dataset:
    """transcripts Dataset -> deduplicated canonical triples Dataset.

    ``linking``: "broadcast" (alias dict via ray.put, actor pool) or
    "join" (hash-shuffle joins against the candidate table).
    """
    turns = reconstruct_turns(transcripts)
    raw = extract_raw(turns)

    if linking == "broadcast":
        alias_ref = ray.put(best_candidate_map(gazetteer))
        linked = link_broadcast(raw, alias_ref)
    elif linking == "join":
        import ray.data as rd

        cands = alias_candidates(rd.from_arrow(gazetteer))
        linked = link_via_join(raw, cands, num_partitions=num_partitions)
    else:
        raise ValueError(f"unknown linking mode: {linking}")

    canon_ref = ray.put(canonical_map_from_table(redirects))
    canonical = apply_canonical_map(linked, canon_ref, ("subj", "obj"))
    return dedup_triples(canonical)
