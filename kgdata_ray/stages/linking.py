"""Alias-dictionary build + entity linking.

Dictionary build mirrors ``mention_to_articles → mention_to_entities →
norm_mentions`` (``kgdata/wikidata/datasets/mention_to_entities.py:30-83``,
``norm_mentions.py:12-45``): normalize aliases, group by normalized
mention, rank candidates by (freq_global desc, entity_id asc) — ties
pinned for determinism — and keep top-k per mention.

Linking itself has two physical plans with identical semantics (both
are tested equal):

  - **broadcast**: the best-candidate dict is ``ray.put`` once and read
    by every actor of a ``map_batches`` actor pool in ``__init__``
    (reference: ``left_outer_join_broadcast``,
    ``kgdata/spark/common.py:393-449``). Right plan when the alias
    dictionary fits in worker memory.
  - **join**: two hash-shuffle equi-joins against the candidate table
    (reference: plain ``leftOuterJoin``) — the scale path when the
    dictionary itself is huge.
"""

from __future__ import annotations

from typing import Union

import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from ..functions.text import normalize_mention_series

LINKED_COLUMNS = ("conv_id", "turn_idx", "subj", "pred", "obj")


# --------------------------------------------------------------------------
# Dictionary build


def _add_alias_norm(batch: pd.DataFrame) -> pd.DataFrame:
    batch["alias_norm"] = normalize_mention_series(batch["alias"])
    return batch


def _rank_block(k: int):
    def fn(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(
            ["alias_norm", "freq_global", "entity_id"],
            ascending=[True, False, True], kind="mergesort",
        )
        g = b.groupby("alias_norm", sort=False)
        b = b.assign(rank=g.cumcount().astype("int32"))
        return b[b["rank"] < k]

    return fn


def alias_candidates(gazetteer: Dataset, *, k: int = 2048) -> Dataset:
    """(alias_norm, entity_id, freq_global, freq_doc, rank) — top-k
    candidates per normalized mention, ranked (freq desc, id asc) with
    pinned ties (analog of the reference's 2048-candidate cap,
    ``mention_to_entities.py:59-62``). One sort shuffle + one vectorized
    pass per block."""
    from ..functions.agg import grouped_blockwise

    norm = gazetteer.map_batches(_add_alias_norm, batch_format="pandas")
    return grouped_blockwise(norm, ["alias_norm"], _rank_block(k))


def best_candidate_map(gazetteer_table: pa.Table) -> dict[str, str]:
    """Driver-side best-candidate dict (alias_norm -> entity_id) from a
    small gazetteer table; used for the broadcast linking plan."""
    df = gazetteer_table.to_pandas()
    df["alias_norm"] = normalize_mention_series(df["alias"])
    df = df.sort_values(
        ["alias_norm", "freq_global", "entity_id"],
        ascending=[True, False, True], kind="mergesort",
    )
    best = df.drop_duplicates("alias_norm", keep="first")
    return dict(zip(best["alias_norm"], best["entity_id"]))


# --------------------------------------------------------------------------
# Broadcast linking (actor pool + ray.put dict)


class LinkBroadcast:
    """Actor-pool linker: dict fetched from the object store once per
    actor; per-batch vectorized normalize + dict map.

    Optionally fuses canonicalization (``canon_map``): linking and
    redirect rewrite are adjacent per-row maps, so running them in one
    actor pool halves pool-startup cost and batch hand-offs."""

    def __init__(
        self,
        alias_map: Union["ray.ObjectRef", dict],
        canon_map: Union["ray.ObjectRef", dict, None] = None,
    ):
        if isinstance(alias_map, ray.ObjectRef):
            alias_map = ray.get(alias_map)
        if isinstance(canon_map, ray.ObjectRef):
            canon_map = ray.get(canon_map)
        if canon_map:
            # pre-compose: alias -> canonical entity directly
            alias_map = {
                k: canon_map.get(v, v) for k, v in alias_map.items()
            }
        self.alias_map = alias_map

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..patterns import LITERAL_PREDICATES

        subj = normalize_mention_series(batch["subj_raw"]).map(self.alias_map)
        obj_norm = normalize_mention_series(batch["obj_raw"])
        obj_ent = obj_norm.map(self.alias_map)
        literal = batch["pred"].isin(LITERAL_PREDICATES)
        obj = obj_norm.where(literal, obj_ent)
        out = pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "subj": subj,
                "pred": batch["pred"],
                "obj": obj,
            }
        )
        return out[subj.notna() & (obj_ent.notna() | literal)]


# Worker-process-global cache for broadcast objects: a plain-function
# map stage fuses with its upstream operator (no actor-pool startup,
# no extra stage boundary); each long-lived worker process fetches and
# composes the dicts once.
_WORKER_CACHE: dict = {}


def _cached_alias_map(alias_ref, canon_ref) -> dict:
    key = (
        alias_ref.hex() if hasattr(alias_ref, "hex") else id(alias_ref),
        canon_ref.hex() if hasattr(canon_ref, "hex") else id(canon_ref),
    )
    m = _WORKER_CACHE.get(key)
    if m is None:
        alias_map = ray.get(alias_ref) if isinstance(alias_ref, ray.ObjectRef) else alias_ref
        canon = ray.get(canon_ref) if isinstance(canon_ref, ray.ObjectRef) else canon_ref
        if canon:
            alias_map = {k: canon.get(v, v) for k, v in alias_map.items()}
        _WORKER_CACHE.clear()
        _WORKER_CACHE[key] = m = alias_map
    return m


def _cached_alias_arrays(alias_ref, canon_ref):
    """(keys, values) Arrow arrays of the composed alias map, built once
    per worker — lookups become ``index_in`` + ``take`` C kernels."""
    import pyarrow as pa

    key = (
        "arr",
        alias_ref.hex() if hasattr(alias_ref, "hex") else id(alias_ref),
        canon_ref.hex() if hasattr(canon_ref, "hex") else id(canon_ref),
    )
    pair = _WORKER_CACHE.get(key)
    if pair is None:
        m = _cached_alias_map(alias_ref, canon_ref)
        pair = (
            pa.array(list(m.keys()), pa.string()),
            pa.array(list(m.values()), pa.string()),
        )
        _WORKER_CACHE[key] = pair
    return pair


def link_broadcast(
    raw: Dataset,
    alias_map_ref: Union["ray.ObjectRef", dict],
    canon_map_ref: Union["ray.ObjectRef", dict, None] = None,
    *,
    compute: str = "tasks",
    concurrency=(1, 16),
    batch_size: int = 8192,
    num_cpus: float = 0.5,
) -> Dataset:
    """``compute="tasks"`` (default): plain-function map that fuses with
    the upstream extract stage; the broadcast dicts are fetched once per
    worker process (module-global cache). Right choice for dictionary
    state that fits worker heaps.

    ``compute="actors"``: explicit actor pool (state in ``__init__``) —
    the pattern to keep when the per-actor state is heavy to build
    (models, big sharded indexes)."""
    if compute == "actors":
        return raw.map_batches(
            LinkBroadcast,
            fn_constructor_args=(alias_map_ref, canon_map_ref),
            batch_format="pandas",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=num_cpus,
        )

    if not isinstance(alias_map_ref, ray.ObjectRef):
        alias_map_ref = ray.put(alias_map_ref)
    if canon_map_ref is not None and not isinstance(canon_map_ref, ray.ObjectRef):
        canon_map_ref = ray.put(canon_map_ref)

    def fn(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..functions.text import normalize_mention_arrow

        from ..patterns import LITERAL_PREDICATES

        keys, vals = _cached_alias_arrays(alias_map_ref, canon_map_ref)
        si = pc.index_in(normalize_mention_arrow(t["subj_raw"]), value_set=keys)
        obj_norm = normalize_mention_arrow(t["obj_raw"])
        oi = pc.index_in(obj_norm, value_set=keys)
        literal = pc.is_in(
            t["pred"], value_set=pa.array(sorted(LITERAL_PREDICATES))
        )
        mask = pc.and_(
            pc.is_valid(si), pc.or_(pc.is_valid(oi), literal)
        )
        obj = pc.if_else(
            literal.filter(mask) if isinstance(literal, pa.ChunkedArray)
            else pa.chunked_array([literal]).filter(mask),
            obj_norm.filter(mask) if isinstance(obj_norm, pa.ChunkedArray)
            else pa.chunked_array([obj_norm]).filter(mask),
            pc.take(vals, oi.filter(mask)),
        )
        return pa.table(
            {
                "conv_id": t["conv_id"].filter(mask),
                "turn_idx": t["turn_idx"].filter(mask),
                "subj": pc.take(vals, si.filter(mask)),
                "pred": t["pred"].filter(mask),
                "obj": obj,
            }
        )

    return raw.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )


def link_sharded(
    raw: Dataset,
    sharded,
    *,
    batch_size: int = 8192,
) -> Dataset:
    """Linking against a ``state.lookup.ShardedDict`` (alias_norm ->
    canonical entity id): the plan when the dictionary exceeds worker
    heaps — per-batch key fan-out to the owning shard actors, the
    reference's remote-KV serving pattern
    (``rust/src/db/remotedb/mod.rs``). Semantics identical to the
    broadcast plan (tested)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        from ..patterns import LITERAL_PREDICATES

        subj_norm = normalize_mention_series(batch["subj_raw"])
        obj_norm = normalize_mention_series(batch["obj_raw"])
        uniq = pd.unique(pd.concat([subj_norm, obj_norm], ignore_index=True))
        resolved = dict(zip(uniq, sharded.lookup(list(uniq))))
        subj = subj_norm.map(resolved)
        obj_ent = obj_norm.map(resolved)
        literal = batch["pred"].isin(LITERAL_PREDICATES)
        obj = obj_norm.where(literal, obj_ent)
        out = pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "subj": subj,
                "pred": batch["pred"],
                "obj": obj,
            }
        )
        return out[subj.notna() & (obj_ent.notna() | literal)]

    return raw.map_batches(fn, batch_format="pandas", batch_size=batch_size)


def unlinkable_mentions(
    raw: Dataset,
    alias_map_ref: Union["ray.ObjectRef", dict],
    *,
    batch_size: int = 8192,
) -> Dataset:
    """Side error report: raw triple candidates whose subject or object
    mention has no gazetteer candidate (reference analog: the
    ``error_invalid_qualifiers`` quarantine dataset,
    ``kgdata/wikidata/datasets/entities.py:116-124`` — errors become a
    side output, never exceptions)."""
    if not isinstance(alias_map_ref, ray.ObjectRef):
        alias_map_ref = ray.put(alias_map_ref)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        from ..patterns import LITERAL_PREDICATES

        m = _cached_alias_map(alias_map_ref, None)
        subj = normalize_mention_series(batch["subj_raw"]).map(m)
        obj = normalize_mention_series(batch["obj_raw"]).map(m)
        # literal-valued predicates have no object mention to link
        obj_bad = obj.isna() & ~batch["pred"].isin(LITERAL_PREDICATES)
        bad = subj.isna() | obj_bad
        out = batch[bad].copy()
        out["error"] = (
            subj[bad].isna().map({True: "subj_unlinkable", False: ""})
            + obj_bad[bad].map({True: " obj_unlinkable", False: ""})
        ).str.strip()
        return out

    return raw.map_batches(fn, batch_format="pandas", batch_size=batch_size)


# --------------------------------------------------------------------------
# Join linking (scale path)


def _norm_cols(batch: pd.DataFrame) -> pd.DataFrame:
    batch["subj_norm"] = normalize_mention_series(batch["subj_raw"])
    batch["obj_norm"] = normalize_mention_series(batch["obj_raw"])
    return batch.drop(columns=["subj_raw", "obj_raw"])


def rename_ds(ds: Dataset, mapping: dict) -> Dataset:
    from ..functions.blocks import rename_cols

    return rename_cols(ds, mapping)


def link_via_join(
    raw: Dataset,
    candidates: Dataset,
    *,
    num_partitions: Optional[int] = None,
    hot_threshold: int = 0,
    salt_batch: int = 1_000,
) -> Dataset:
    """Inner-join linking against the rank-0 candidate table; drops
    unlinkable mentions exactly like the broadcast plan.

    ``hot_threshold > 0`` enables hot-mention skew salting: mention
    keys hotter than the threshold on the probe side are split into
    sub-keys with the build side replicated per sub-key (reference
    ``join_repartition``, ``kgdata/spark/common.py:205-304``; threshold
    10 000 there). Zipf-headed mention distributions make this the
    required plan at 10^12-turn scale.
    """
    from ..functions.blocks import scrub_empty_blocks
    from ..functions.joins import resolve_join_partitions, salted_join

    num_partitions = resolve_join_partitions(num_partitions)

    best = scrub_empty_blocks(
        candidates.filter(expr="rank == 0")
        .select_columns(["alias_norm", "entity_id"])
    ).materialize()
    normed = raw.map_batches(_norm_cols, batch_format="pandas")

    def one_join(left: Dataset, key: str, out_name: str) -> Dataset:
        if hot_threshold > 0:
            j = salted_join(
                rename_ds(left, {key: "__k"}),
                rename_ds(best, {"alias_norm": "__k"}),
                "__k",
                hot_threshold=hot_threshold,
                salt_batch=salt_batch,
                num_partitions=num_partitions,
            )
            j = j.drop_columns(["__k"])
        else:
            j = left.join(
                best,
                join_type="inner",
                num_partitions=num_partitions,
                on=(key,),
                right_on=("alias_norm",),
            )
        return rename_ds(j, {"entity_id": out_name})

    # stage boundary after the subject join: (a) chained salted joins'
    # actor demand can exceed small clusters' budget, and (b) the
    # literal/entity branch split below consumes j1 twice — without a
    # materialize the subject join would execute once per branch
    # concurrently (the reference materializes every stage to disk at
    # such boundaries)
    j1 = one_join(normed, "subj_norm", "subj").materialize()

    # literal-valued predicates: the object is the normalized value
    # itself, no second join (WDValue literal analog)
    from ..patterns import LITERAL_PREDICATES

    def is_lit(b: pd.DataFrame, keep: bool) -> pd.DataFrame:
        m = b["pred"].isin(LITERAL_PREDICATES)
        return b[m] if keep else b[~m]

    def lit_obj(b: pd.DataFrame) -> pa.Table:
        b = b.copy()
        b["obj"] = b["obj_norm"]
        # Arrow out so the union with the (Arrow) join branch keeps a
        # single block type downstream
        return pa.Table.from_pandas(b[list(LINKED_COLUMNS)], preserve_index=False)

    lit_branch = (
        j1.map_batches(lambda b: is_lit(b, True), batch_format="pandas")
        .map_batches(lit_obj, batch_format="pandas")
    )
    ent_branch = j1.map_batches(
        lambda b: is_lit(b, False), batch_format="pandas"
    )
    j2 = one_join(ent_branch, "obj_norm", "obj").select_columns(
        list(LINKED_COLUMNS)
    )
    return j2.union(lit_branch)
