"""The sketch/ANN/media queries vs their independent golden oracles
(kgdata_ray.oracle_sketch): the engine's distributed implementation and
the naive single-process reimplementation of the same published specs
must agree value-exactly — this is what the driver certifies at sf0.01;
here the same comparison runs at sf0.001."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import pytest

from kgdata_ray.oracle_sketch import ensure_sketch_oracles
from kgdata_ray.oracle_tables import ensure_oracle_tables
from kgdata_ray.pipelines import queries as Q

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def golden_dir():
    return ensure_sketch_oracles(SF)


def _assert_equal(res, golden_path):
    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    want = pq.read_table(golden_path).to_pandas()
    cols = sorted(df.columns)
    assert cols == sorted(want.columns)
    a = df[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize(
    "query,golden",
    [
        (Q.q_minhash_pairs, "minhash_pairs.parquet"),
        (Q.q_simhash_pairs, "simhash_pairs.parquet"),
        (Q.q_ngram_jaccard_pairs, "ngram_jaccard_pairs.parquet"),
        (Q.q_embedding_pairs_lsh, "embedding_lsh_pairs.parquet"),
        (Q.q_rolling_fp, "rolling_fp.parquet"),
        (Q.q_knn_ivf, "knn_ivf.parquet"),
        (Q.q_media_features, "media_features.parquet"),
        (Q.q_minhash_clusters, "minhash_clusters.parquet"),
        (Q.q_cms_token_counts, "cms_token_counts.parquet"),
        (Q.q_kmeans_clusters, "kmeans_clusters.parquet"),
        (Q.q_pq_codes, "pq_codes.parquet"),
    ],
)
def test_sketch_query_matches_golden(golden_dir, query, golden):
    _assert_equal(query(SF), f"{golden_dir}/{golden}")


def test_kg_pagerank_matches_golden_power_iteration():
    d = ensure_oracle_tables(0.001)
    _assert_equal(Q.q_kg_pagerank(SF), f"{d}/pagerank.parquet")


def test_cms_estimates_are_one_sided(golden_dir):
    # CMS guarantee: est >= true count, always; and the overwhelming
    # majority of the (small) sf0.001 vocabulary is exact at w=4096
    import duckdb

    est = pq.read_table(f"{golden_dir}/cms_token_counts.parquet").to_pandas()
    con = duckdb.connect()
    true = con.execute(f"""
        SELECT term, count(*) AS n FROM (
            SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
                   AS term
            FROM read_parquet('{SF}/documents.parquet')
        ) WHERE term <> '' GROUP BY term
    """).df()
    m = est.merge(true, on="term", how="outer")
    assert m["n"].notna().all() and m["est_count"].notna().all()
    assert (m["est_count"] >= m["n"]).all()
    assert (m["est_count"] == m["n"]).mean() > 0.9
