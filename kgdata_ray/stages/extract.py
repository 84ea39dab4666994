"""Per-turn relation-sentence extraction (stateless, zero-copy Arrow).

Analog of the reference's per-record statement parsers
(``kgdata/wikidata/models/wdentity.py:101-203`` and the N-Triples
regex parser ``kgdata/misc/ntriples_parser.py:120-232``): a pure
per-row transform.

Physical plan: pyarrow compute end-to-end — sentence split
(``split_pattern``), flatten with parent indices, one anchored RE2
``extract_regex`` over the flattened sentences, then ``take`` to pull
provenance columns. ~7x faster than the equivalent pandas
``str.extractall`` and zero-copy from the object store.

Extraction is pure per turn (SURVEY §7.4 determinism): output does not
depend on batch boundaries or row order; the sentence-anchored RE2
pattern accepts exactly the strings matched by the oracle's
``SENTENCE_RE`` finditer (verified by the P/R = 1.0 oracle tests).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..patterns import RELATION_PHRASES

RAW_COLUMNS = ("conv_id", "turn_idx", "subj_raw", "pred", "obj_raw")

# anchored per-sentence form of patterns.SENTENCE_RE ('.' terminators
# are consumed by the split)
_SENTENCE_RX = (
    r"^\s*(?P<subj>[^.!?]+?)\s+"
    r"(?P<phrase>works at|is located in|uses|was founded in)\s+"
    r"(?P<obj>[^.!?]+?)\s*$"
)

_PHRASES = pa.array(list(RELATION_PHRASES.keys()), pa.string())
_PREDS = pa.array([RELATION_PHRASES[k] for k in RELATION_PHRASES], pa.string())


def extract_raw_batch(t: pa.Table) -> pa.Table:
    """(conv_id, turn_idx, text) batch -> raw triple candidates."""
    texts = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
    parts = pc.split_pattern(texts, ".")
    parent = pc.list_parent_indices(parts)
    flat = pc.list_flatten(parts)
    # superset pre-filter: plain substring scans are ~2x cheaper than
    # the anchored capture regex, and a sentence without any relation
    # phrase can never match — only candidates reach extract_regex
    # (false positives are fine; the regex is still the arbiter)
    hit = pc.match_substring(flat, next(iter(RELATION_PHRASES)))
    for p in list(RELATION_PHRASES)[1:]:
        hit = pc.or_(hit, pc.match_substring(flat, p))
    flat = flat.filter(hit)
    parent = parent.filter(hit)
    ex = pc.extract_regex(flat, _SENTENCE_RX)
    valid = pc.is_valid(ex)
    ex = ex.filter(valid)
    parent = parent.filter(valid)

    phrase = pc.struct_field(ex, "phrase")
    pred = pc.take(_PREDS, pc.index_in(phrase, value_set=_PHRASES))
    return pa.table(
        {
            "conv_id": pc.take(t["conv_id"], parent),
            "turn_idx": pc.take(t["turn_idx"], parent),
            "subj_raw": pc.struct_field(ex, "subj"),
            "pred": pred,
            "obj_raw": pc.struct_field(ex, "obj"),
        }
    )


def extract_raw(ds: Dataset, *, batch_size: int = 16384) -> Dataset:
    """Turns -> raw (conv_id, turn_idx, subj_raw, pred, obj_raw)."""
    return ds.select_columns(["conv_id", "turn_idx", "text"]).map_batches(
        extract_raw_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


# --------------------------------------------------------------------------
# Statement rewrite: hoist transitive self-qualifiers


def fix_transitive_qualifiers(
    stmts: Dataset,
    quals: Dataset,
    transitive: "frozenset[str] | set[str]",
    *,
    num_partitions: "int | None" = None,
) -> Dataset:
    """Statement-level rewrite analog of the reference's
    ``fix_transitive_qualifier`` (``kgdata/wikidata/datasets/
    entities.py:263-286``): a statement whose qualifier property equals
    the statement's own property carries a *self-qualifier*; all
    self-qualifiers are removed, and when the property is in the
    ``transitive`` set each removed qualifier value is hoisted into a
    new first-class statement (deduplicated by value within each
    (subj, pred) — the reference's ``filter_duplication`` by value
    repr, min source statement wins so the carried rank is
    deterministic).

    Flat relational model instead of the reference's nested per-entity
    dicts (transcript statements carry qualifiers in a side table):

    - ``stmts``:  (stmt_id:int64, subj, pred, obj, rank:int64)
    - ``quals``:  (stmt_id:int64, qpred, qval)

    Output: every original statement tagged with ``n_self_quals`` (how
    many self-qualifiers the rewrite stripped from it) UNION the
    hoisted statements (``stmt_id`` = −source id so ids stay unique,
    ``n_self_quals`` = 0).

    Scale shape: ONE stmt_id hash join co-locates qualifiers with
    their statements (qualifiers ship only (stmt_id, qpred, qval) —
    never statement text); the self-qualifier table that leaves it is
    a small fraction of the input, and both downstream shuffles
    (per-statement count, per-(subj,pred,qval) dedup) run over that
    reduced table with map-side combining.
    """
    from ..functions.agg import group_top_k, partial_group_count
    from ..functions.blocks import scrub_empty_blocks
    from ..functions.joins import equi_join, resolve_join_partitions

    num_partitions = resolve_join_partitions(num_partitions)

    # self-qualifiers: qualifier property == owning statement property
    joined = equi_join(
        quals,
        stmts.select_columns(["stmt_id", "subj", "pred", "rank"]),
        on="stmt_id",
        num_partitions=num_partitions,
    )

    def only_self(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["qpred"], t["pred"]))

    self_q = scrub_empty_blocks(
        joined.map_batches(only_self, batch_format="pyarrow"))

    # effect 1: strip counts per statement (removal is total, not just
    # for transitive props — mirrors the reference's unconditional del).
    # n_self is the small reduced side, so the materialize + count
    # guard is metadata-cheap; it exists because Ray 2.49's hash
    # shuffle join crashes on a zero-row join side (the aggregator
    # builds an empty schema-less partition table).
    n_self = partial_group_count(
        self_q.select_columns(["stmt_id"]), "stmt_id",
        count_name="n_self_quals").materialize()

    if n_self.count() == 0:
        def zero_tag(t: pa.Table) -> pa.Table:
            return t.append_column(
                "n_self_quals", pa.array([0] * len(t), pa.int64()))

        # no self-qualifiers at all -> nothing to hoist either
        return stmts.map_batches(zero_tag, batch_format="pyarrow")

    def tag(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.coalesce(t["n_self_quals"], pa.scalar(0)),
                    pa.int64())
        return t.drop_columns(["n_self_quals"]).append_column(
            "n_self_quals", n)

    tagged = scrub_empty_blocks(stmts.join(
        n_self, join_type="left_outer",
        num_partitions=num_partitions, on=("stmt_id",),
    )).map_batches(tag, batch_format="pyarrow")

    # effect 2: hoist transitive self-qualifier values into new
    # statements, one per distinct (subj, pred, qval), min source id
    tlist = pa.array(sorted(transitive), pa.string())

    def only_transitive(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["pred"], value_set=tlist))

    trans = scrub_empty_blocks(
        self_q.map_batches(only_transitive, batch_format="pyarrow"))
    winners = group_top_k(
        trans, ["subj", "pred", "qval"],
        sort_cols=["stmt_id"], ascending=[True], k=1)

    def as_stmt(t: pa.Table) -> pa.Table:
        return pa.table({
            "stmt_id": pc.negate(pc.cast(t["stmt_id"], pa.int64())),
            "subj": t["subj"],
            "pred": t["pred"],
            "obj": t["qval"],
            "rank": pc.cast(t["rank"], pa.int64()),
            "n_self_quals": pa.array([0] * len(t), pa.int64()),
        })

    hoisted = scrub_empty_blocks(
        winners.map_batches(as_stmt, batch_format="pyarrow"))
    return tagged.union(hoisted)
