"""KG-family oracle gate, replicated at sf0.001: the same Ray-vs-DuckDB
rows/schema/value comparison the driver runs at sf0.01 (the oracle SQL
reads the materialized synthetic-world parquet from /tmp/kgr_oracle)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from kgdata_ray.oracle_tables import ensure_oracle_tables
from kgdata_ray.pipelines import queries as q

SF_DIR = "/root/testdata/sf0.001"
SF = 0.001

CHECK = [
    "kg_triples",
    "kg_conversations",
    "kg_mentions",
    "kg_unlinkable",
    "kg_alias_candidates",
    "kg_canonical_map",
    "kg_entity_degrees",
    "kg_outlinks",
    "kg_meta_graph",
    "kg_all_types",
    "kg_prop_connections",
]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.fixture(scope="module")
def kg_sql() -> dict[str, str]:
    ensure_oracle_tables(SF)
    return q._kg_oracle_sql(SF)


@pytest.mark.parametrize("name", CHECK)
def test_kg_query_matches_oracle(name, kg_sql):
    res = q.queries()[name](SF_DIR)
    rdf = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    odf = duckdb.connect().execute(kg_sql[name]).df()
    a, b = _norm(rdf), _norm(odf)
    assert len(a) == len(b), (len(a), len(b))
    assert list(a.dtypes.astype(str)) == list(b.dtypes.astype(str))
    pd.testing.assert_frame_equal(a, b, check_exact=True)
