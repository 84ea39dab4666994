"""Materialized oracle tables for the driver's DuckDB correctness gate.

The KG-family queries run over *synthesized* transcripts (the engine's
primary input per BASELINE.json), which the driver's pre-registered
views (TPC-H-ish tables) do not cover. To give every KG query a real
DuckDB oracle, this module materializes the deterministic synthetic
world for a scale factor as parquet files under ``/tmp/kgr_oracle/sf*``:

  - ``transcripts.parquet``  the turn table (driver-side generator —
                             row-identical to the distributed one,
                             tested in test_synth.py)
  - ``gazetteer.parquet`` / ``redirects.parquet`` / ``entity_types.parquet``
                             the world's lookup tables
  - ``triples.parquet``      GOLDEN canonical triples from the
                             independent pure-Python oracle
                             (:mod:`kgdata_ray.oracle`)
  - ``mentions.parquet``     golden mention occurrences
  - ``unlinkable.parquet``   golden quarantine rows

SQL-expressible KG queries (conversations, degrees, pred counts,
meta-graph, canonical map, alias candidates) get *computed* SQL over
the input tables; the extraction/linking queries compare against the
golden outputs — either way the driver, not the repo's own tests,
certifies Ray-vs-oracle equality.

Generation is idempotent: a marker file records the synth + oracle
versions and the config; regeneration only happens when they change.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from . import oracle
from .synth import (
    SYNTH_VERSION,
    build_world,
    config_for_sf,
    gazetteer_table,
    redirects_table,
    transcripts_table,
)

ORACLE_BASE = os.environ.get("KGR_ORACLE_DIR", "/tmp/kgr_oracle")

# bump when the set of materialized tables or their schemas change
ORACLE_TABLES_VERSION = 9


def oracle_dir(sf: float) -> str:
    return f"{ORACLE_BASE}/sf{sf:g}"


def _marker(cfg) -> dict:
    return {
        "synth_version": SYNTH_VERSION,
        "oracle_tables_version": ORACLE_TABLES_VERSION,
        "n_convs": cfg.n_convs,
        "n_entities": cfg.n_entities,
        "seed": cfg.seed,
    }


def _marker_matches(marker: Path, want: dict) -> bool:
    try:
        return json.loads(marker.read_text()) == want
    except (ValueError, OSError):
        return False


def ensure_oracle_tables(sf: float) -> str:
    """Write (once) the oracle parquet tables for scale factor ``sf``;
    returns the directory. Safe to call repeatedly and from multiple
    processes: generation happens in a private temp directory (marker
    written last, inside it) which is then swapped into place with
    directory renames — a concurrent reader never sees a torn parquet,
    and a losing writer discards its build when the winner's marker
    already matches."""
    import shutil

    cfg = config_for_sf(sf)
    final = Path(oracle_dir(sf))
    want = _marker(cfg)
    if _marker_matches(final / "_ORACLE_MARKER.json", want):
        return str(final)
    out = Path(f"{final}.build-{os.getpid()}")
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True, exist_ok=True)
    marker = out / "_ORACLE_MARKER.json"

    world = build_world(cfg)
    tt = transcripts_table(cfg)
    gz = gazetteer_table(cfg)
    rt = redirects_table(cfg)
    pq.write_table(tt, out / "transcripts.parquet")
    pq.write_table(gz, out / "gazetteer.parquet")
    pq.write_table(rt, out / "redirects.parquet")
    pq.write_table(
        pa.table(
            {
                "entity_id": pa.array(world.entity_ids, pa.string()),
                "etype": pa.array(world.etypes, pa.string()),
            }
        ),
        out / "entity_types.parquet",
    )
    pq.write_table(type_dag_table(cfg), out / "type_dag.parquet")

    golden = oracle.extract_triples(tt, gz, rt)
    pq.write_table(
        pa.table(
            {
                "subj": pa.array([t["subj"] for t in golden], pa.string()),
                "pred": pa.array([t["pred"] for t in golden], pa.string()),
                "obj": pa.array([t["obj"] for t in golden], pa.string()),
                "conv_id": pa.array([t["conv_id"] for t in golden], pa.string()),
                "turn_idx": pa.array([t["turn_idx"] for t in golden], pa.int32()),
            }
        ),
        out / "triples.parquet",
    )

    mentions = oracle.extract_mentions(tt, gz)
    pq.write_table(
        pa.table(
            {
                "conv_id": pa.array([m["conv_id"] for m in mentions], pa.string()),
                "turn_idx": pa.array([m["turn_idx"] for m in mentions], pa.int32()),
                "mention_norm": pa.array(
                    [m["mention_norm"] for m in mentions], pa.string()
                ),
            }
        ),
        out / "mentions.parquet",
    )

    rawc = oracle.extract_raw_candidates(tt)
    pq.write_table(
        pa.table(
            {
                "conv_id": pa.array([r["conv_id"] for r in rawc], pa.string()),
                "turn_idx": pa.array([r["turn_idx"] for r in rawc], pa.int32()),
                "subj_raw": pa.array([r["subj_raw"] for r in rawc], pa.string()),
                "pred": pa.array([r["pred"] for r in rawc], pa.string()),
                "obj_raw": pa.array([r["obj_raw"] for r in rawc], pa.string()),
            }
        ),
        out / "raw_candidates.parquet",
    )

    from .oracle_sketch import (
        golden_comention_edges,
        golden_components,
        golden_core_numbers,
        golden_kcore,
        golden_pagerank,
    )

    pq.write_table(
        golden_pagerank([(t["subj"], t["obj"]) for t in golden]),
        out / "pagerank.parquet",
    )

    pq.write_table(
        golden_pagerank([(t["subj"], t["obj"]) for t in golden],
                        personalization=["E0000001"]),
        out / "ppr.parquet",
    )

    pq.write_table(
        golden_kcore(
            golden_comention_edges(
                [(t["subj"], t["conv_id"]) for t in golden]),
            k=3,
        ),
        out / "kcore3.parquet",
    )

    pq.write_table(
        golden_core_numbers(
            golden_comention_edges(
                [(t["subj"], t["conv_id"]) for t in golden])),
        out / "core_numbers.parquet",
    )

    pq.write_table(
        golden_components(
            golden_comention_edges(
                [(t["subj"], t["conv_id"]) for t in golden])),
        out / "components.parquet",
    )

    unlink = oracle.extract_unlinkable(tt, gz)
    pq.write_table(
        pa.table(
            {
                "conv_id": pa.array([u["conv_id"] for u in unlink], pa.string()),
                "turn_idx": pa.array([u["turn_idx"] for u in unlink], pa.int32()),
                "subj_raw": pa.array([u["subj_raw"] for u in unlink], pa.string()),
                "pred": pa.array([u["pred"] for u in unlink], pa.string()),
                "obj_raw": pa.array([u["obj_raw"] for u in unlink], pa.string()),
                "error": pa.array([u["error"] for u in unlink], pa.string()),
            }
        ),
        out / "unlinkable.parquet",
    )

    marker.write_text(json.dumps(want))

    # Swap the finished build into place. If another process won the
    # race (its marker already matches), keep theirs and drop ours.
    if _marker_matches(final / "_ORACLE_MARKER.json", want):
        shutil.rmtree(out, ignore_errors=True)
        return str(final)
    old = Path(f"{final}.old-{os.getpid()}")
    moved_old = False
    try:
        if final.exists():
            os.replace(final, old)
            moved_old = True
        os.replace(out, final)
    except OSError:
        # Either we lost a rename race (the winner's tables are already
        # in place) or the second replace failed after we moved the
        # previous build aside — restore it so concurrent readers never
        # see a missing oracle directory.
        if moved_old and not final.exists():
            os.replace(old, final)
        shutil.rmtree(out, ignore_errors=True)
    if final.exists():
        shutil.rmtree(old, ignore_errors=True)
    return str(final)


def type_dag_table(cfg) -> pa.Table:
    """Deterministic class DAG above the world's 4 base entity types
    (SURVEY §2.6 ancestor-closure input; reference
    ``kgdata/misc/hierarchy.py:18-57``). Edges are (child, parent);
    acyclic by construction, with diamonds so min-distance matters."""
    from .stages.hierarchy import SYNTH_TYPE_DAG

    child, parent = zip(*SYNTH_TYPE_DAG)
    return pa.table(
        {
            "child": pa.array(child, pa.string()),
            "parent": pa.array(parent, pa.string()),
        }
    )
