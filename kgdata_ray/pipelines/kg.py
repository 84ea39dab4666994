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
from ..functions.joins import default_join_partitions, resolve_join_partitions

TRIPLE_COLUMNS = ("subj", "pred", "obj", "conv_id", "turn_idx")

_SPO = ["subj", "pred", "obj"]


def dedup_triples(linked: Dataset) -> Dataset:
    """Exact dedup on (subj, pred, obj), keeping the first occurrence in
    (conv_id, turn_idx) order — deterministic provenance.

    Map-side pre-dedup shrinks the shuffle (combiner); the post-shuffle
    pass is one grouped keep-first per block. Arrow end-to-end: both
    passes are sort_by + group_by(...).aggregate('first') on zero-copy
    ``pa.Table`` blocks (use_threads=False pins the deterministic
    encounter order the keep-first contract needs), so the headline
    pipeline never round-trips a block through pandas.

    The co-location shuffle is keyed on a precomputed uint64 hash of
    (subj, pred, obj) instead of the three string columns: the range
    sort's sample, partition and within-block compare all run on a
    fixed-width int (one C pass each) rather than multi-string
    comparisons, and equal triples land in one block just the same.
    Hash collisions are harmless — the per-block keep-first still
    groups on the real (subj, pred, obj), the hash only drives
    placement.
    """
    from ..functions.agg import grouped_blockwise

    order = [(c, "ascending") for c in (*_SPO, "conv_id", "turn_idx")]

    def pre(t: pa.Table) -> pa.Table:
        # prune any linker side-columns before rows ride the shuffle
        import pyarrow.compute as pc
        from ..functions.sketches import splitmix64

        t = t.select(list(TRIPLE_COLUMNS)).sort_by(order)
        g = t.group_by(_SPO, use_threads=False).aggregate(
            [("conv_id", "first"), ("turn_idx", "first")])
        g = g.rename_columns(list(TRIPLE_COLUMNS))
        key = pc.binary_join_element_wise(
            g["subj"], g["pred"], g["obj"], "\x1f")
        h = splitmix64(pd.util.hash_array(
            key.to_numpy(zero_copy_only=False)))
        # int64 view: Ray's sort plans on signed ints; bit-stable
        return g.append_column("h", pa.array(h.view("int64"), pa.int64()))

    def final(t: pa.Table) -> pa.Table:
        t = t.select(list(TRIPLE_COLUMNS)).sort_by(order)
        g = t.group_by(_SPO, use_threads=False).aggregate(
            [("conv_id", "first"), ("turn_idx", "first")])
        return g.rename_columns(list(TRIPLE_COLUMNS))

    pruned = linked.map_batches(pre, batch_format="pyarrow",
                                zero_copy_batch=True)
    return grouped_blockwise(pruned, ["h"], final,
                             batch_format="pyarrow")


def kg_triples(
    transcripts: Dataset,
    gazetteer: pa.Table,
    redirects: pa.Table,
    *,
    linking: str = "broadcast",
    num_partitions: Optional[int] = None,
    reconstruct_first: bool = False,
) -> Dataset:
    """transcripts Dataset -> deduplicated canonical triples Dataset.

    ``linking``: "broadcast" (alias dict via ray.put, fused map tasks /
    actor pool) or "join" (hash-shuffle joins against the candidate
    table).

    ``reconstruct_first=False`` (default) applies **extraction
    pushdown**: extraction is pure per-turn (its output is independent
    of turn order and batch boundaries — tested against the oracle and
    against the ``reconstruct_first=True`` plan), so the engine runs it
    fused with the read and lets the only wide shuffle move extracted
    triples (~30x smaller than turn text) instead of globally sorting
    the full transcript payload. At 10^12 turns the full-text sort is
    the difference between shuffling the corpus and shuffling the KG.
    ``reconstruct_first=True`` executes the literal
    reconstruct-then-extract order; conversation-level operators
    (``stages.reconstruct.conversations``) always use the conv_id
    shuffle.
    """
    num_partitions = resolve_join_partitions(num_partitions)
    src = reconstruct_turns(transcripts) if reconstruct_first else transcripts
    raw = extract_raw(src)

    if linking == "broadcast":
        # linking + canonicalization fused into ONE actor pool: the
        # canonical map is pre-composed into the alias dict per actor
        alias_ref = ray.put(best_candidate_map(gazetteer))
        canon_ref = ray.put(canonical_map_from_table(redirects))
        canonical = link_broadcast(raw, alias_ref, canon_ref)
    elif linking == "join":
        import ray.data as rd

        cands = alias_candidates(rd.from_arrow(gazetteer))
        linked = link_via_join(raw, cands, num_partitions=num_partitions)
        canon_ref = ray.put(canonical_map_from_table(redirects))
        canonical = apply_canonical_map(linked, canon_ref, ("subj", "obj"))
    else:
        raise ValueError(f"unknown linking mode: {linking}")

    return dedup_triples(canonical)


def kg_triples_checkpointed(
    transcripts: Dataset,
    gazetteer: pa.Table,
    redirects: pa.Table,
    workdir: str,
    *,
    linking: str = "broadcast",
) -> Dataset:
    """Checkpointed variant: each macro-stage writes a parquet directory
    with a ``_MANIFEST.json`` (per-partition rows/bytes + input
    lineage); a rerun skips every stage whose manifest validates —
    reference ``has_complete_data`` semantics
    (``kgdata/dataset.py:367-428``) without the partial-output footgun.
    """
    from pathlib import Path

    from ..state.manifest import run_stage

    wd = Path(workdir)
    params = {"linking": linking}

    raw_ds, raw_m = run_stage(
        lambda: extract_raw(reconstruct_turns(transcripts)),
        wd / "raw_triples",
        name="raw_triples",
        params=params,
    )

    def build_linked() -> Dataset:
        alias_ref = ray.put(best_candidate_map(gazetteer))
        linked = link_broadcast(raw_ds, alias_ref)
        canon_ref = ray.put(canonical_map_from_table(redirects))
        return apply_canonical_map(linked, canon_ref, ("subj", "obj"))

    linked_ds, linked_m = run_stage(
        build_linked,
        wd / "linked_triples",
        name="linked_triples",
        params=params,
        input_manifests=[raw_m],
    )

    triples_ds, _ = run_stage(
        lambda: dedup_triples(linked_ds),
        wd / "triples",
        name="triples",
        params=params,
        input_manifests=[linked_m],
    )
    return triples_ds


def kg_fact_history(triples: Dataset, transcripts: Dataset) -> Dataset:
    """Temporal fact table (SCD-2): for every (subj, pred) the
    time-ordered succession of asserted objects, as
    (subj, pred, obj, valid_from, valid_to) — ``valid_from`` = the ts
    of the turn that first asserted the fact (the deduped triple's
    provenance), ``valid_to`` = the next assertion's ts for the same
    (subj, pred) (NULL while current). The knowledge-base versioning
    step a real KG build runs after extraction: functional predicates
    supersede, history is queryable as of any instant.

    Plan: ONE hash join recovers ts from the transcript provenance
    (conv_id, turn_idx) — the join ships (subj,pred,obj) rows, never
    text — then one grouped shuffle on (subj, pred) orders each fact
    chain by (ts, obj) — a TOTAL order, because dedup leaves each obj
    at most once per (subj, pred) — and a vectorized per-group
    shift(-1) closes the intervals. The ordering deliberately uses
    only columns the history table itself retains, so
    :func:`kg_fact_history_merge` re-chains touched keys identically.
    Reference analog: none (kgdata snapshots are point-in-time);
    SQL-oracle-checked against a DuckDB lead() window over the same
    golden triples.
    """
    from ..functions.agg import grouped_blockwise
    from ..functions.blocks import scrub_empty_blocks

    ts = transcripts.select_columns(["conv_id", "turn_idx", "ts"])
    j = triples.join(ts, join_type="inner", num_partitions=default_join_partitions(),
                     on=("conv_id", "turn_idx"))

    def block(t: pa.Table) -> pa.Table:
        # zero-copy Arrow: sort, then the interval close is a shifted
        # slice compare — valid_to[i] = ts[i+1] when row i+1 carries
        # the same (subj, pred), else NULL (and NULL on the last row)
        import pyarrow.compute as pc

        t = t.sort_by([("subj", "ascending"), ("pred", "ascending"),
                       ("ts", "ascending"), ("obj", "ascending")])
        n = t.num_rows
        subj = t["subj"].combine_chunks()
        pred = t["pred"].combine_chunks()
        tcol = t["ts"].combine_chunks()
        if n > 1:
            same = pc.and_(
                pc.equal(subj.slice(1), subj.slice(0, n - 1)),
                pc.equal(pred.slice(1), pred.slice(0, n - 1)))
            head = pc.if_else(same, tcol.slice(1),
                              pa.nulls(n - 1, tcol.type))
            valid_to = pa.chunked_array([head, pa.nulls(1, tcol.type)])
        else:
            valid_to = pa.nulls(n, tcol.type)
        return pa.table({
            "subj": subj, "pred": pred, "obj": t["obj"],
            "valid_from": tcol, "valid_to": valid_to,
        })

    return grouped_blockwise(scrub_empty_blocks(j), ["subj", "pred"],
                             block, batch_format="pyarrow")


def kg_entity_cards(triples: Dataset) -> Dataset:
    """Materialize per-entity fact cards: (subj, card) with ``card``
    the canonical sorted-key JSON ``{"pred": ["obj", ...], ...}``
    (preds ascending, objects ascending within a pred) — the
    entity-document view a KG serves to consumers, reference analog
    ``entity_dump``'s grouped statement view. One grouped shuffle on
    subj; card assembly is fully vectorized Arrow (hash_list +
    binary_join kernels — no per-row Python in the serving-surface
    pass); canonical ordering makes the JSON reproducible by the
    string_agg SQL oracle byte-for-byte."""
    from ..functions.agg import grouped_blockwise

    def block(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.select(["subj", "pred", "obj"]).sort_by(
            [("subj", "ascending"), ("pred", "ascending"),
             ("obj", "ascending")])
        # use_threads=False: single-threaded group scan keeps list
        # ELEMENTS in row order (objs ascending) and avoids thread
        # oversubscription inside Ray workers; GROUP order is not
        # guaranteed, so re-sort the small grouped table explicitly
        g1 = t.group_by(["subj", "pred"], use_threads=False) \
            .aggregate([("obj", "list")]) \
            .sort_by([("subj", "ascending"), ("pred", "ascending")])
        objs = pc.binary_join(g1["obj_list"], '", "')
        part = pc.binary_join_element_wise(
            '"', g1["pred"], '": ["', objs, '"]', "")
        g2 = pa.table({"subj": g1["subj"], "part": part}) \
            .group_by(["subj"], use_threads=False) \
            .aggregate([("part", "list")])
        card = pc.binary_join_element_wise(
            "{", pc.binary_join(g2["part_list"], ", "), "}", "")
        return pa.table({"subj": g2["subj"], "card": card})

    return grouped_blockwise(
        triples.select_columns(["subj", "pred", "obj"]), ["subj"], block,
        batch_format="pyarrow")


def kg_fact_history_merge(old_history: Dataset,
                          new_facts: Dataset) -> Dataset:
    """Incrementally fold NEW dated assertions into an existing SCD-2
    fact table without recomputing untouched keys — the maintenance
    path of a living knowledge base (reference analog: none; kgdata
    rebuilds snapshots from scratch).

    ``old_history``: (subj, pred, obj, valid_from, valid_to) as built
    by :func:`kg_fact_history`. ``new_facts``: (subj, pred, obj,
    valid_from) dated assertions (ties against existing rows pinned by
    (valid_from, obj) — the reduced form of the full recompute's
    ordering once conv/turn provenance has collapsed into timestamps).

    Plan: the touched (subj, pred) keys are new-side-bounded; ONE
    anti join streams every untouched history row through unchanged
    (a pass-through, not a rebuild), and only the touched keys pay the
    grouped re-chaining over (old intervals' valid_from rows + new
    assertions). Equality with the from-scratch rebuild is
    pytest-enforced and the registered incremental query shares the
    full recompute's SQL oracle verbatim.
    """
    from ..functions.agg import grouped_blockwise
    from ..functions.blocks import scrub_empty_blocks
    from ..functions.joins import anti_join, semi_join

    SEP = "\x1f"

    def keyed(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        k = pc.binary_join_element_wise(b["subj"], b["pred"], SEP)
        return b.append_column("k", k)

    old_k = old_history.map_batches(keyed, batch_format="pyarrow")
    new_k = new_facts.map_batches(keyed,
                                  batch_format="pyarrow").materialize()

    untouched = anti_join(old_k, new_k, "k").drop_columns(["k"])
    touched_old = semi_join(old_k, new_k, "k")

    cols = ["subj", "pred", "obj", "valid_from"]
    assertions = scrub_empty_blocks(
        touched_old.select_columns(cols).union(new_k.select_columns(cols)))

    def rechain(b: pd.DataFrame) -> pa.Table:
        # returns pa.Table so BOTH union branches carry Arrow blocks —
        # mixed pandas/Arrow block unions break downstream aggregates
        # (Ray 2.49 BlockType assertion)
        b = b.sort_values(["subj", "pred", "valid_from", "obj"],
                          kind="mergesort")
        b = b.drop_duplicates(["subj", "pred", "obj", "valid_from"])
        return pa.Table.from_pandas(pd.DataFrame({
            "subj": b["subj"],
            "pred": b["pred"],
            "obj": b["obj"],
            "valid_from": b["valid_from"],
            "valid_to": b.groupby(["subj", "pred"], sort=False)
            ["valid_from"].shift(-1),
        }), preserve_index=False)

    rebuilt = grouped_blockwise(assertions, ["subj", "pred"], rechain)

    # untouched is Arrow end-to-end (keyed + the existence joins emit
    # Arrow blocks), so both union branches carry the same block type
    return scrub_empty_blocks(untouched).union(rebuilt)
