"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG pipeline (synthesized transcripts at
sf0.001 scale — the transcript table is this engine's primary input per
BASELINE.json; the TPC-H-ish tables are exercised by ``queries()``).
``queries()``/``oracle_sql()`` cover the operator surface from
SURVEY.md §2 plus the training-data extensions (dedup, similarity,
text analysis, multimodal).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init``/``ray.shutdown`` anywhere in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from kgdata_ray import context
from kgdata_ray.pipelines import queries as _q


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale; returns the triples Dataset."""
    context.configure()
    return _q.q_kg_triples("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    context.configure()
    _ensure_kg_oracle_tables()
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    _ensure_kg_oracle_tables()
    return _q.oracle_sql()


def _ensure_kg_oracle_tables() -> None:
    """The KG-family oracle SQL reads deterministic parquet from
    /tmp/kgr_oracle (the synthesized world + golden pure-Python-oracle
    outputs). Materialize them for the driver's sf0.01 correctness run;
    idempotent (marker-guarded), driver-side pure Python."""
    from kgdata_ray.oracle_sketch import ensure_sketch_oracles
    from kgdata_ray.oracle_tables import ensure_oracle_tables

    ensure_oracle_tables(0.01)
    ensure_sketch_oracles("/root/testdata/sf0.01")
