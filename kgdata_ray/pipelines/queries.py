"""Driver-contract query registry: one entry per implemented operator /
pipeline (SURVEY §2), each with a DuckDB oracle where SQL can express
it.

Contract rules honored here (see ``__ray_entry__``):
  - every computed/aggregate column is named identically in the Ray
    plan and the SQL (the driver hash-compares values by sorted column
    name);
  - float aggregates are rounded identically on both sides (summation
    order differs across engines);
  - callables never call ``ray.init``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset

from ..functions.agg import (
    count_zero_fill,
    distinct_rows,
    group_top_k,
    latest_wins,
    partial_group_count,
    zip_with_index,
)
from ..functions.joins import (
    anti_join,
    broadcast_join,
    equi_join,
    salted_join,
    semi_join,
)
from ..stages import textstats
from ..stages.dedup import embedding_pairs, embedding_pairs_lsh, \
    exact_dedup_ids, minhash_pairs, ngram_jaccard_pairs, simhash_pairs
from ..stages.similarity import build_ivf, knn_bruteforce, knn_ivf
from ..stages.multimodal import decode_features, media_from_documents
from ..functions.joins import default_join_partitions
from ..synth import config_for_sf, gazetteer_table, redirects_table, \
    sf_from_dir, transcripts_source


def _t(sf_dir: str, name: str) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# Relational / primitive queries (DuckDB-checked)


def q_filter_project(sf_dir: str) -> Dataset:
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    )

    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1995-06-01")))
        t = t.filter(mask)
        revenue = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "revenue": revenue,
            }
        )

    return li.map_batches(fn, batch_format="pyarrow")


def q_pricing_summary(sf_dir: str) -> pd.DataFrame:
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def pre(b: pd.DataFrame) -> pa.Table:
        b = b.assign(disc_price=b["l_extendedprice"] * (1 - b["l_discount"]))
        g = b.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            count_order=("l_quantity", "size"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(b: pd.DataFrame) -> pa.Table:
        out = (
            b.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(
                sum_qty=("sum_qty", "sum"),
                sum_base_price=("sum_base_price", "sum"),
                sum_disc_price=("sum_disc_price", "sum"),
                count_order=("count_order", "sum"),
            )
            .reset_index()
        )
        for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
            out[c] = out[c].round(2)
        out["count_order"] = out["count_order"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    from ..functions.agg import grouped_blockwise

    # map-side partial aggregation, then a tiny grouped combine
    partial = li.map_batches(pre, batch_format="pandas")
    return grouped_blockwise(
        partial, ["l_returnflag", "l_linestatus"], final
    ).to_pandas()


def q_join_orders_customers(sf_dir: str) -> Dataset:
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name", "c_nationkey"])
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    j1 = equi_join(orders, cust, "o_custkey", right_on="c_custkey",
                   num_partitions=default_join_partitions())
    j2 = broadcast_join(j1, nation.to_pandas(), on="c_nationkey",
                        right_on="n_nationkey", how="inner")
    return j2.select_columns(["o_orderkey", "c_name", "n_name"])


def q_salted_join(sf_dir: str) -> Dataset:
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber", "l_suppkey"])
    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_name"])
    # every supplier key is hot at this threshold -> fully salted path
    j = salted_join(
        li.rename_columns({"l_suppkey": "k"}),
        supp.rename_columns({"s_suppkey": "k"}),
        "k", hot_threshold=100, salt_batch=500, num_partitions=default_join_partitions(),
        hot_sample_fraction=0.05,  # keys are ~1000x over threshold
    )
    return j.select_columns(["l_orderkey", "l_linenumber", "s_name"])


def q_broadcast_join(sf_dir: str) -> Dataset:
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber", "l_partkey"])
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"])
    j = broadcast_join(li, part.to_pandas(), on="l_partkey",
                       right_on="p_partkey", how="inner")
    return j.select_columns(["l_orderkey", "l_linenumber", "p_brand"])


def _big_orders(sf_dir: str) -> Dataset:
    # threshold chosen so BOTH the anti and semi results are non-empty
    # at every test scale (sf0.001-0.1) — an empty Ray result loses its
    # schema and fails the driver's schema compare
    return rd.read_parquet(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey", "o_totalprice"]).filter(
        expr="o_totalprice > 350000.0"
    )


def q_anti_join(sf_dir: str) -> Dataset:
    # customers with no order over 350k
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    return anti_join(cust, _big_orders(sf_dir), "c_custkey", right_on="o_custkey")


def q_semi_join(sf_dir: str) -> Dataset:
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    return semi_join(cust, _big_orders(sf_dir), "c_custkey", right_on="o_custkey")


def q_topk_orders(sf_dir: str) -> Dataset:
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return orders.sort(["o_totalprice", "o_orderkey"],
                       descending=[True, False]).limit(20)


def q_group_topk(sf_dir: str) -> Dataset:
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey", "o_totalprice"])
    top = group_top_k(
        orders, "o_custkey",
        sort_cols=["o_totalprice", "o_orderkey"], ascending=[False, True], k=2,
    )
    return top.select_columns(["o_custkey", "o_orderkey"])


def q_distinct(sf_dir: str) -> Dataset:
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus"])
    return distinct_rows(li, ["l_returnflag", "l_linestatus"])


def q_latest_event_per_user(sf_dir: str) -> Dataset:
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "event_type", "ts"])
    last = latest_wins(ev, "user_id", "ts", tie_cols=["event_id"])
    return last.select_columns(["user_id", "event_id", "event_type"])


def q_event_type_counts(sf_dir: str) -> Dataset:
    return partial_group_count(_t(sf_dir, "events"), "event_type")


def q_zero_fill_counts(sf_dir: str) -> Dataset:
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_nationkey"])
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    z = count_zero_fill(cust, "c_nationkey", nation, "n_nationkey",
                        num_partitions=4)
    return z.select_columns(["n_name", "n"])


def q_union_names(sf_dir: str) -> Dataset:
    s = rd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_name"]) \
        .rename_columns({"s_name": "name"})
    c = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_name"]) \
        .rename_columns({"c_name": "name"})
    return s.union(c)


def q_zip_with_index(sf_dir: str) -> Dataset:
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])
    z = zip_with_index(orders, sort_key=["o_totalprice", "o_orderkey"],
                       index_col="idx")
    return z.select_columns(["o_orderkey", "idx"])


def q_events_sequence(sf_dir: str) -> Dataset:
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "event_type", "ts"])

    def agg(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        out = (
            b.groupby("user_id", sort=False)["event_type"]
            .agg(",".join)
            .reset_index()
            .rename(columns={"event_type": "seq"})
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    from ..functions.agg import grouped_blockwise

    return grouped_blockwise(ev, ["user_id"], agg)


def q_window_agg(sf_dir: str) -> Dataset:
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def pre(b: pd.DataFrame) -> pa.Table:
        b = b.assign(hour=b["ts"].dt.floor("h"))
        g = b.groupby(["event_type", "hour"], sort=False).agg(
            n=("value", "size"), sum_value=("value", "sum")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(b: pd.DataFrame) -> pa.Table:
        out = (
            b.groupby(["event_type", "hour"], sort=False)
            .agg(n=("n", "sum"), sum_value=("sum_value", "sum"))
            .reset_index()
        )
        out["n"] = out["n"].astype("int64")
        out["sum_value"] = out["sum_value"].round(2)
        return pa.Table.from_pandas(out, preserve_index=False)

    from ..functions.agg import grouped_blockwise

    return grouped_blockwise(
        ev.map_batches(pre, batch_format="pandas"), ["event_type", "hour"], final
    )


def q_sessionize(sf_dir: str) -> Dataset:
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts"])

    def fn(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = b.groupby("user_id", sort=False)
        gap = b["ts"] - g["ts"].shift()
        brk = (gap > pd.Timedelta(minutes=30)).fillna(False)
        b = b.assign(session_id=brk.groupby(b["user_id"]).cumsum().astype("int64"))
        out = (
            b.groupby(["user_id", "session_id"], sort=False)
            .size()
            .reset_index(name="n_events")
        )
        out["n_events"] = out["n_events"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    from ..functions.agg import grouped_blockwise

    return grouped_blockwise(ev, ["user_id"], fn)


def q_fk_explode(sf_dir: str) -> Dataset:
    """Exercises the list-valued FK-explode join: per-customer order-key
    lists (built with a grouped rollup) exploded and joined back against
    orders for the price."""
    from ..functions.agg import grouped_blockwise
    from ..functions.joins import fk_explode_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def to_lists(b: pd.DataFrame) -> pa.Table:
        out = (
            b.groupby("o_custkey", sort=False)["o_orderkey"]
            .agg(list)
            .reset_index()
            .rename(columns={"o_orderkey": "fk", "o_custkey": "c_custkey"})
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    lists = grouped_blockwise(
        orders.select_columns(["o_custkey", "o_orderkey"]),
        ["o_custkey"], to_lists,
    )
    j = fk_explode_join(
        lists,
        orders.select_columns(["o_orderkey", "o_totalprice"]),
        fk_col="fk", id_col="c_custkey", right_key="o_orderkey",
        num_partitions=default_join_partitions(),
    )
    return j.select_columns(["c_custkey", "fk", "o_totalprice"])


def q_running_total(sf_dir: str) -> Dataset:
    """Per-user running sum of event values in (ts, event_id) order —
    sequential cumsum per group, so float order matches SQL windowing
    exactly."""
    from ..functions.agg import grouped_blockwise

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])

    def fn(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        # round to cents on both sides: DuckDB's segment-tree window sum
        # and a sequential cumsum differ in float last bits (~1e-12)
        b["running_value"] = (
            b.groupby("user_id", sort=False)["value"].cumsum().round(2)
        )
        return pa.Table.from_pandas(
            b[["user_id", "event_id", "running_value"]], preserve_index=False
        )

    return grouped_blockwise(ev, ["user_id"], fn)


def q_doc_mentions(sf_dir: str) -> Dataset:
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        import re

        rx = re.compile(r"([a-z]{6,})")
        m = b["text"].str.extractall(rx)
        if m.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "mention": pd.Series([], dtype="object")}
            )
        rows = m.index.get_level_values(0).to_numpy()
        return pd.DataFrame(
            {"doc_id": b["doc_id"].to_numpy()[rows], "mention": m[0].to_numpy()}
        )

    return docs.map_batches(fn, batch_format="pandas")


def q_doc_stats(sf_dir: str) -> Dataset:
    return textstats.doc_stats(_t(sf_dir, "documents"))


def q_exact_dedup_docs(sf_dir: str) -> Dataset:
    return exact_dedup_ids(_t(sf_dir, "documents"))


def q_quality_dedup(sf_dir: str) -> Dataset:
    """Prefix-bucket dedup with quality-winner selection
    (stages/dedup.py:quality_dedup_ids): normalized 40-char heads
    compete, the highest-quality variant survives (tie: min id); the
    winner shuffle carries (id, h1, h2, qi) int64 rows only. Oracle is
    a row_number() window over the same bucket/quality expressions."""
    from ..stages.dedup import quality_dedup_ids

    return quality_dedup_ids(_t(sf_dir, "documents"))


def q_fingerprint_docs(sf_dir: str) -> Dataset:
    return textstats.fingerprints(_t(sf_dir, "documents"))


def q_segment_dedup(sf_dir: str) -> Dataset:
    """C4-style corpus-wide span dedup (stages/dedup.py:segment_dedup):
    3-word segments, globally-first occurrence wins, surviving text
    reconstructed per doc. Oracle replays it with lateral
    generate_series + min-encoded-key + string_agg."""
    from ..stages.dedup import segment_dedup

    return segment_dedup(_t(sf_dir, "documents"), seg_words=3)


def q_knn(sf_dir: str) -> pd.DataFrame:
    emb = _t(sf_dir, "embeddings")
    out = knn_bruteforce(emb, query_ids=list(range(8)), k=5).to_pandas()
    out["cosine"] = out["cosine"].round(4)
    return out[["query_id", "neighbor_id", "rank"]]


def q_embedding_pairs(sf_dir: str) -> pd.DataFrame:
    out = embedding_pairs(_t(sf_dir, "embeddings"), threshold=0.4).to_pandas()
    return out[["id_a", "id_b"]]


# --------------------------------------------------------------------------
# Rows-only checked (non-SQL-expressible) operators


def q_minhash_pairs(sf_dir: str) -> Dataset:
    return minhash_pairs(_t(sf_dir, "documents"), threshold=0.6)


def q_embedding_pairs_lsh(sf_dir: str) -> pd.DataFrame:
    out = embedding_pairs_lsh(
        _t(sf_dir, "embeddings"), threshold=0.4, num_tables=16, bits=4
    ).to_pandas()
    return out[["id_a", "id_b"]]


def q_simhash_pairs(sf_dir: str) -> Dataset:
    return simhash_pairs(_t(sf_dir, "documents"), max_hamming=3)


def q_ngram_jaccard_pairs(sf_dir: str) -> Dataset:
    return ngram_jaccard_pairs(_t(sf_dir, "documents"), threshold=0.5)


def q_minhash_clusters(sf_dir: str) -> Dataset:
    """Near-dup pairs -> connected components (min-id representative):
    certifies the distributed label-propagation CC end-to-end against
    a naive union-find golden over the same golden pair table."""
    from ..stages.dedup import dedup_clusters

    return dedup_clusters(q_minhash_pairs(sf_dir))


def q_keyword_extract(sf_dir: str) -> Dataset:
    """Per-document top-5 TF-IDF keywords
    (stages/textstats.py:keyword_extract): row-local tf and top-k, one
    vocabulary-bounded df count broadcast once — pure-SQL oracle
    (DuckDB window over the same frozen micro scores)."""
    from ..stages.textstats import keyword_extract

    return keyword_extract(_t(sf_dir, "documents"), k=5)


def q_leakage_safe_split(sf_dir: str) -> Dataset:
    """Group-aware train/val/test split over documents
    (stages/dedup.py:leakage_safe_split): near-dup MinHash components
    become the split key so duplicates never straddle a boundary —
    GroupShuffleSplit semantics at corpus scale. Certified against an
    independent union-find + keyed-md5-banding golden
    (oracle_sketch.golden_leakage_split)."""
    from ..stages.dedup import leakage_safe_split

    return leakage_safe_split(_t(sf_dir, "documents"),
                              q_minhash_pairs(sf_dir))


def q_pii_scrub(sf_dir: str) -> Dataset:
    """PII redaction over documents with deterministically injected
    emails/phones (the corpus carries none): doc_id%3==0 gains an
    email, doc_id%4==0 a phone; the oracle recomputes the same
    augmented text and scrub in SQL with the identical RE2 patterns."""
    docs = _t(sf_dir, "documents").select_columns(["doc_id", "text"])

    def augment(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy()
        email = np.where(
            ids % 3 == 0,
            pd.Series(ids).map(" contact d{}@example.com now".format),
            "",
        )
        phone = np.where(
            ids % 4 == 0,
            pd.Series(
                [f" call +1-{100 + i % 900}-{i % 10000:04d}" for i in ids]
            ),
            "",
        )
        return pd.DataFrame(
            {"doc_id": b["doc_id"], "text": b["text"] + email + phone}
        )

    return textstats.pii_scrub(
        docs.map_batches(augment, batch_format="pandas")
    )


def q_repetition_stats(sf_dir: str) -> Dataset:
    return textstats.repetition_stats(_t(sf_dir, "documents"))


def q_lang_id(sf_dir: str) -> Dataset:
    return textstats.lang_id(_t(sf_dir, "documents"))


def q_quality(sf_dir: str) -> Dataset:
    return textstats.quality_scores(_t(sf_dir, "documents"))


def q_token_counts(sf_dir: str) -> Dataset:
    return textstats.token_counts(_t(sf_dir, "documents"))


def q_rolling_fp(sf_dir: str) -> Dataset:
    return textstats.rolling_fingerprints(_t(sf_dir, "documents"))


def q_knn_distributed(sf_dir: str) -> pd.DataFrame:
    """Block-cross kNN: query side is itself a Dataset (vec_id < 32)."""
    from ..stages.similarity import knn_block_cross

    emb = _t(sf_dir, "embeddings")
    queries = emb.map_batches(
        lambda b: b[b["vec_id"] < 32], batch_format="pandas"
    )
    out = knn_block_cross(_t(sf_dir, "embeddings"), queries, k=5).to_pandas()
    return out[["query_id", "neighbor_id", "rank"]]


def q_knn_ivf(sf_dir: str) -> pd.DataFrame:
    emb = _t(sf_dir, "embeddings")
    index = build_ivf(emb, num_centroids=8, seed=13)
    out = knn_ivf(emb, list(range(8)), index, k=5, nprobe=4).to_pandas()
    return out[["query_id", "neighbor_id", "rank"]]


def q_embedding_pca(sf_dir: str) -> Dataset:
    """Exact distributed PCA projection of every embedding onto the
    top-2 principal axes (stages/similarity.py:embedding_pca): int64
    fixed-point moment partials make the covariance bit-identical at
    any batching; eigh/sign/rounding are pinned. Certified against an
    independent scalar-accumulation golden
    (oracle_sketch.golden_embedding_pca)."""
    from ..stages.similarity import embedding_pca

    return embedding_pca(_t(sf_dir, "embeddings"), n_components=2)


def q_ann_recall(sf_dir: str) -> Dataset:
    """Recall@5 of the IVF index (nprobe=2 of 8 centroids) against
    exact brute force per query (stages/similarity.py:ann_recall) —
    the ANN quality diagnostic. Certified against an independent
    golden combining a naive exact top-k with the naive seeded-IVF
    replication (oracle_sketch.golden_ann_recall)."""
    from ..stages.similarity import ann_recall

    return ann_recall(_t(sf_dir, "embeddings"), list(range(8)),
                      k=5, num_centroids=8, nprobe=2, seed=13)


def q_knn_ivf_distributed(sf_dir: str) -> Dataset:
    """Large-Q IVF: a fifth of the embedding table is the query SET
    (a Dataset, never collected); per-query probe semantics
    (stages/similarity.py:knn_ivf_distributed). Golden oracle from the
    independent per-query-probe IVF in oracle_sketch.py."""
    from ..stages.similarity import build_ivf, knn_ivf_distributed

    emb = _t(sf_dir, "embeddings")
    index = build_ivf(emb, num_centroids=8, seed=13)

    def is_query(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["vec_id"] % 5 == 0]

    queries = emb.map_batches(is_query, batch_format="pandas")
    out = knn_ivf_distributed(emb, queries, index, k=5, nprobe=2)
    return out.select_columns(["query_id", "neighbor_id", "rank"])


def q_hll_ndistinct(sf_dir: str) -> Dataset:
    """HyperLogLog approximate distinct users per event type
    (functions/sketches.py) — register partials merge by max, no
    value shuffle; golden-parquet oracle from the independent
    pure-python HLL in oracle_sketch.py."""
    from ..functions.sketches import hll_ndistinct

    return hll_ndistinct(_t(sf_dir, "events"), "event_type", "user_id")


def q_heavy_hitters(sf_dir: str) -> Dataset:
    """All terms above 1/200 of total token mass with EXACT counts:
    per-batch pigeonhole candidate generation + broadcast-filtered
    exact recount (functions/sketches.py) — certified by a plain SQL
    HAVING oracle."""
    from ..functions.sketches import heavy_hitters

    return heavy_hitters(_t(sf_dir, "documents"), k=200)


def q_pq_codes(sf_dir: str) -> Dataset:
    """Product-quantization encoding of the embeddings table
    (stages/similarity.py:pq_codes): fixed-point codebooks trained on
    the bounded id-prefix sample, one distributed shuffle-free
    assignment pass; bit-exact vs the sequential same-spec golden."""
    from ..stages.similarity import pq_codes

    return pq_codes(_t(sf_dir, "embeddings"))


def q_temperature_mix(sf_dir: str) -> Dataset:
    """Temperature-weighted (alpha=0.5) source rebalancing at overall
    rate 0.5 (functions/sampling.py:temperature_mix): per-source keep
    fractions ~ n^alpha / n, quantized to 1e-6, keyed-md5 threshold
    filter. The oracle recomputes the identical cuts from per-source
    counts in SQL."""
    from ..functions.sampling import temperature_mix

    return temperature_mix(_t(sf_dir, "documents"), "source", "doc_id")


def q_quantile_sketch(sf_dir: str) -> Dataset:
    """Mergeable fixed-bin histogram quantile sketch per l_returnflag
    (functions/stats.py:histogram_quantile_sketch): additive int64
    bin counts (order-free merge), identical IEEE interpolation on
    both sides; the bin width 110000/512 is exactly representable, so
    the SQL-replayed formula is bit-equal."""
    from ..functions.stats import histogram_quantile_sketch

    return histogram_quantile_sketch(
        _t(sf_dir, "lineitem"), "l_returnflag", "l_extendedprice"
    )


def q_span_dedup(sf_dir: str) -> Dataset:
    """Exact substring/span dedup over OVERLAPPING 3-word windows
    (stages/dedup.py:span_dedup): any window occurrence whose text
    appeared at a smaller (doc_id, pos) is a duplicate and its covered
    word positions are dropped; surviving text reconstructed per doc.
    Oracle replays via a window-min over partitioned window text plus
    a coverage anti join."""
    from ..stages.dedup import span_dedup

    return span_dedup(_t(sf_dir, "documents"), window_words=3)


def q_kmeans_clusters(sf_dir: str) -> Dataset:
    """Distributed fixed-point Lloyd k-means over the embeddings table
    (stages/similarity.py:kmeans_embeddings): k=16, 5 iterations,
    everything int64 fixed-point so the result is bit-identical under
    any batching/order — certified against the sequential same-spec
    golden (oracle_sketch.golden_kmeans). The SemDeDup-style
    cluster-assignment step of embedding-based corpus curation."""
    from ..stages.similarity import kmeans_embeddings

    return kmeans_embeddings(_t(sf_dir, "embeddings"))


def q_mmr_select(sf_dir: str) -> Dataset:
    """Greedy maximal-marginal-relevance selection of 10 diverse,
    query-relevant embeddings (stages/similarity.py:mmr_select):
    score = 7*rel - 3*maxsim in int64 fixed point over floor-quantized
    unit vectors, so every round's argmax (tie: min vec_id) is
    bit-identical at any batching — the diverse-sampling pattern for
    seeding eval/annotation sets from an embedded corpus. Certified
    against a sequential incremental-maxsim golden
    (oracle_sketch.golden_mmr)."""
    from ..stages.similarity import mmr_select

    return mmr_select(_t(sf_dir, "embeddings"))


def q_embedding_dbscan(sf_dir: str) -> Dataset:
    """Exact cosine-DBSCAN over the embeddings table
    (stages/similarity.py:embedding_dbscan): eps-graph from the
    distributed block-cross matmul (cosine >= 0.35, the corpus's
    natural neighborhood scale), core = neighborhood of >= 4 (self
    included), clusters = min-core-id components, borders pinned to
    the smallest core-neighbor component, noise = -1 — certified
    against a sequential naive-DBSCAN golden
    (oracle_sketch.golden_dbscan)."""
    from ..stages.similarity import embedding_dbscan

    return embedding_dbscan(_t(sf_dir, "embeddings"),
                            threshold=0.35, min_pts=4)


def q_semdedup(sf_dir: str) -> Dataset:
    """Full SemDeDup composition over the embeddings table
    (stages/semdedup.py): fixed-point k-means clustering, ONE cluster
    co-location shuffle with binary-packed vectors, per-cluster exact
    cosine near-dup components (tiled Gram matrix), deterministic
    min-id representatives — certified against a sequential same-spec
    golden (oracle_sketch.golden_semdedup)."""
    from ..stages.semdedup import semdedup

    return semdedup(_t(sf_dir, "embeddings"), k=8, n_iter=3,
                    threshold=0.95)


def q_linear_probe(sf_dir: str) -> Dataset:
    """One-pass distributed ridge classifier over the embeddings table
    (stages/similarity.py:linear_probe): exact int64 normal-equation
    moments (funnel-merged, vectors never shuffle), driver solve with
    unpenalized bias, per-row micro-scored — the fastText-style
    quality-filter training step. Certified against an independent
    scalar-accumulation golden (oracle_sketch.golden_linear_probe)."""
    from ..stages.similarity import linear_probe

    return linear_probe(_t(sf_dir, "embeddings"), target_label=0)


def q_contrastive_pairs(sf_dir: str) -> Dataset:
    """Contrastive training-pair mining over the embeddings table
    (stages/similarity.py:contrastive_pairs): per query the nearest
    same-label positive + nearest other-label hard negative by exact
    integer squared-L2, block-local bests reduced by one tiny grouped
    shuffle — certified against an independent scalar pairwise golden
    (oracle_sketch.golden_contrastive_pairs)."""
    from ..stages.similarity import contrastive_pairs

    return contrastive_pairs(_t(sf_dir, "embeddings"), query_mod=50)


def q_dsir_scores(sf_dir: str) -> Dataset:
    """DSIR importance weights for every document against the src0
    target domain (stages/selection.py:dsir_scores): md5-hashed
    unigram+bigram buckets, ONE bucket-bounded counting shuffle, the
    log-ratio frozen to int64 micro-units on the driver, exact integer
    per-doc weight sums — certified against an independent scalar
    dict-counting golden (oracle_sketch.golden_dsir)."""
    from ..stages.selection import dsir_scores

    return dsir_scores(_t(sf_dir, "documents"), target_source="src0")


def q_dsir_sample(sf_dir: str) -> Dataset:
    """Gumbel-top-100 DSIR resample (stages/selection.py:dsir_select):
    md5-derived deterministic Gumbel perturbation on the frozen
    weights, selected with the combiner top-k (no global sort) —
    same independent golden as q_dsir_scores."""
    from ..stages.selection import dsir_select

    return dsir_select(_t(sf_dir, "documents"), k=100,
                       target_source="src0")


_TBS_BUDGET = 8000  # ~30% of the sf0.01 corpus's BPE tokens


def q_shuffle_order(sf_dir: str) -> Dataset:
    """Deterministic global training-order shuffle
    (functions/sampling.py:shuffle_order): every document ranked by
    ``(md5('epoch0' || doc_id), doc_id)`` — the reproducible,
    cluster-size-independent epoch read order (one range sort + the
    zip_with_index offset pass). Oracle: ``ROW_NUMBER() OVER (ORDER BY
    md5(...), doc_id)`` on the identical key."""
    from ..functions.sampling import shuffle_order

    return shuffle_order(_t(sf_dir, "documents"), id_col="doc_id",
                         salt="epoch0")


def q_token_budget_select(sf_dir: str) -> Dataset:
    """Quality-ranked token-budget corpus selection
    (stages/selection.py:token_budget_select): best documents first
    until the cumulative BPE-token count hits the budget — one sort +
    a distributed prefix sum (one int64 per block to the driver).
    Oracle: SQL window SUM over the identical (quality desc, doc_id)
    order."""
    from ..stages.selection import token_budget_select

    return token_budget_select(_t(sf_dir, "documents"), _TBS_BUDGET)


BM25_QUERY_TERMS = ["hash", "sort", "window"]


def q_bm25_topk(sf_dir: str) -> Dataset:
    """BM25 top-20 documents for a fixed 3-term query
    (stages/retrieval.py:bm25_topk): one tokenize pass emitting only
    stat rows + query-term hits, driver-side |Q| idfs, int64
    fixed-point per-doc score sum (order-free), shuffle-free
    global_topk — certified value-exact against a DuckDB SQL oracle
    computing the identical pinned-operand-order formula."""
    from ..stages.retrieval import bm25_topk

    return bm25_topk(_t(sf_dir, "documents"), BM25_QUERY_TERMS, k=20)


def q_hybrid_rrf(sf_dir: str) -> Dataset:
    """Hybrid retrieval: Reciprocal Rank Fusion of the BM25 lexical
    top-50 and the cosine-kNN dense top-50 over the aligned
    doc_id/vec_id space (stages/retrieval.py:hybrid_rrf_topk, Cormack
    et al. RRF with the pinned integer contribution
    1_000_000 // (60 + rank)). Certified value-exact against an
    independent golden that re-derives BM25 with scalar Python floats
    and the dense leg with a naive full-matrix cosine
    (oracle_sketch.golden_hybrid_rrf)."""
    from ..stages.retrieval import hybrid_rrf_topk

    return hybrid_rrf_topk(
        _t(sf_dir, "documents"),
        _t(sf_dir, "embeddings"),
        BM25_QUERY_TERMS, query_vec_id=7, k=20, k_cand=50)


def q_bpe_merges(sf_dir: str) -> Dataset:
    """First 8 BPE merge rules learned over the document corpus
    (stages/retrieval.py:bpe_merges): corpus reduced to its word
    vocabulary once, per-round vocabulary-parallel pair counts,
    deterministic argmax — certified against a sequential
    incremental-update golden (oracle_sketch.golden_bpe_merges)."""
    from ..stages.retrieval import bpe_merges

    return bpe_merges(_t(sf_dir, "documents"), n_merges=8)


def q_knn_ivfpq(sf_dir: str) -> Dataset:
    """IVF-PQ approximate nearest neighbours over the embeddings table
    (stages/similarity.py:knn_ivfpq): fixed-point coarse quantizer +
    per-subspace PQ codebooks from the bounded id-prefix sample,
    per-query ADC lookup tables, one shuffle-free corpus scan over
    codes — certified against a sequential same-spec golden
    (oracle_sketch.golden_knn_ivfpq)."""
    from ..stages.similarity import knn_ivfpq

    return knn_ivfpq(_t(sf_dir, "embeddings"), list(range(8)), k=5)


def q_incremental_dedup(sf_dir: str) -> Dataset:
    """Cross-corpus incremental dedup (stages/dedup.py:
    incremental_dedup): the "new" corpus is documents plus exact
    clones of every 7th doc (re-idded +100000 — planted within-new
    duplicates); the "old" corpus is documents with doc_id % 5 < 2
    (planted cross-corpus duplicates). Result: new rows whose text
    never appeared in old, one min-id winner per content. Only 128-bit
    content keys travel the anti-join/winner shuffles; text rides the
    final id-keyed semi join."""
    import pyarrow as pa

    from ..stages.dedup import incremental_dedup

    docs = _t(sf_dir, "documents").select_columns(["doc_id", "text"])

    def clones(b: pd.DataFrame) -> pa.Table:
        c = b[b["doc_id"] % 7 == 0]
        return pa.table({
            "doc_id": pa.array(c["doc_id"].to_numpy() + 100000,
                               pa.int64()),
            "text": pa.array(c["text"].astype(object), pa.string()),
        })

    def olds(b: pd.DataFrame) -> pa.Table:
        c = b[b["doc_id"] % 5 < 2]
        return pa.table({
            "doc_id": pa.array(c["doc_id"].to_numpy(), pa.int64()),
            "text": pa.array(c["text"].astype(object), pa.string()),
        })

    def as_arrow(b: pd.DataFrame) -> pa.Table:
        return pa.table({
            "doc_id": pa.array(b["doc_id"].to_numpy(), pa.int64()),
            "text": pa.array(b["text"].astype(object), pa.string()),
        })

    new = docs.map_batches(as_arrow, batch_format="pandas").union(
        docs.map_batches(clones, batch_format="pandas"))
    old = docs.map_batches(olds, batch_format="pandas")
    return incremental_dedup(new, old)


def q_bpe_tokenize(sf_dir: str) -> Dataset:
    """Train-then-apply BPE over the documents table: learn 8 merge
    rules (stages/retrieval.py:bpe_merges), then one streaming encode
    pass counting BPE tokens per document
    (stages/retrieval.py:bpe_encode, per-distinct-word merge cache) —
    certified against a sequential golden
    (oracle_sketch.golden_bpe_encode)."""
    from ..stages.retrieval import bpe_encode, bpe_merges

    docs = _t(sf_dir, "documents")
    mt = bpe_merges(docs, n_merges=8).take_all()
    merges = [(r["lhs"], r["rhs"]) for r in mt]
    return bpe_encode(docs, merges)


def q_embedding_quantize(sf_dir: str) -> Dataset:
    """Per-dimension min-max scalar quantization of the embeddings
    table to uint8 codes (stages/similarity.py:scalar_quantize) —
    all-integer fixed point, bit-identical under any batching,
    certified against a sequential golden
    (oracle_sketch.golden_scalar_quantize)."""
    from ..stages.similarity import scalar_quantize

    return scalar_quantize(_t(sf_dir, "embeddings"))


def q_cms_token_counts(sf_dir: str) -> Dataset:
    """Count-Min-Sketch estimated frequency per distinct token
    (functions/sketches.py:cms_token_counts): additive d x w int64
    partials per batch, two-level salted merge, broadcast final
    sketch answers the exact distinct-term table. Deterministic
    (additive merge is batching/order independent) so the oracle is a
    sequential same-spec golden parquet (oracle_sketch.py)."""
    from ..functions.sketches import cms_token_counts

    return cms_token_counts(_t(sf_dir, "documents"))


def q_media_features(sf_dir: str) -> Dataset:
    """Fake-decode features, flattened to scalar columns
    (item_id, kind, digest, feat_0..feat_7) so the driver can
    value-hash them against the golden parquet oracle — list<float32>
    columns don't hash stably across engines. The round-trip through
    float32 is undone exactly by re-rounding to 4 dp (byte means are
    <= 255, well inside float32's 4-dp fidelity)."""
    media = media_from_documents(_t(sf_dir, "documents").limit(128))
    feats = decode_features(media, engine="fake")

    def flatten(t: pa.Table) -> pa.Table:
        import numpy as np

        cols = {
            "item_id": t["item_id"],
            "kind": t["kind"],
            "digest": t["digest"],
        }
        lists = t["feat"].to_pylist()
        mat = np.asarray(lists, dtype=np.float64).round(4)
        for j in range(mat.shape[1] if len(lists) else 8):
            cols[f"feat_{j}"] = pa.array(mat[:, j], pa.float64())
        return pa.table(cols)

    return feats.map_batches(flatten, batch_format="pyarrow")


def q_audio_features(sf_dir: str) -> Dataset:
    """REAL audio decode: the DecodeFeatures actor pool with
    ``engine="real"`` actually decodes the synthetic PCM WAV payloads
    (stdlib ``wave`` — no external codec needed), normalizes samples
    to [-1, 1) and emits 8 bucket means; flattened to scalar columns
    like media_features. The golden oracle rebuilds payloads straight
    from the RIFF byte spec and decodes by struct layout — a genuinely
    different decode path (oracle_sketch.golden_audio_features)."""
    from ..stages.multimodal import (
        decode_features,
        media_from_documents_wav,
    )

    media = media_from_documents_wav(_t(sf_dir, "documents").limit(128))
    feats = decode_features(media, engine="real")

    def flatten(t: pa.Table) -> pa.Table:
        import numpy as np

        cols = {
            "item_id": t["item_id"],
            "kind": t["kind"],
            "digest": t["digest"],
        }
        lists = t["feat"].to_pylist()
        mat = np.asarray(lists, dtype=np.float64).round(4)
        for j in range(mat.shape[1] if len(lists) else 8):
            cols[f"feat_{j}"] = pa.array(mat[:, j], pa.float64())
        return pa.table(cols)

    return feats.map_batches(flatten, batch_format="pyarrow")


def q_image_features(sf_dir: str) -> Dataset:
    """REAL image decode with NO external codec: synthetic payloads are
    fully decodable RGB PNGs (valid zlib IDAT, every spec filter type
    across the corpus) and the DecodeFeatures actor pool inflates +
    unfilters them with the stdlib decoder
    (stages/multimodal.py:decode_png), converts to integer luma and
    emits 8 bucket means. The golden computes features straight from
    the pixel formulas with no decode step at all — agreement proves
    the encode -> inflate -> unfilter round trip lossless
    (oracle_sketch.golden_image_features)."""
    from ..stages.multimodal import (
        decode_features,
        media_from_documents_png_valid,
    )

    media = media_from_documents_png_valid(
        _t(sf_dir, "documents").limit(128))
    feats = decode_features(media, engine="real")

    def flatten(t: pa.Table) -> pa.Table:
        import numpy as np

        cols = {
            "item_id": t["item_id"],
            "kind": t["kind"],
            "digest": t["digest"],
        }
        lists = t["feat"].to_pylist()
        mat = np.asarray(lists, dtype=np.float64).round(4)
        for j in range(mat.shape[1] if len(lists) else 8):
            cols[f"feat_{j}"] = pa.array(mat[:, j], pa.float64())
        return pa.table(cols)

    return feats.map_batches(flatten, batch_format="pyarrow")


def q_media_headers(sf_dir: str) -> Dataset:
    """REAL container-metadata decode: synthesize structurally valid
    PNG payloads (dimensions derived from doc_id), then parse format/
    width/height back out of the magic bytes. The oracle recomputes the
    dimensions from doc_id - a round-trip check of synthesis + parser."""
    from ..stages.multimodal import media_from_documents_png, parse_media_headers

    return parse_media_headers(
        media_from_documents_png(_t(sf_dir, "documents"))
    )


# --------------------------------------------------------------------------
# KG pipeline over synthesized transcripts (rows-only; correctness is
# enforced against the pure-Python oracle in tests/test_kg_pipeline.py)


def _kg_world(sf_dir: str):
    cfg = config_for_sf(sf_from_dir(sf_dir))
    return cfg, gazetteer_table(cfg), redirects_table(cfg)


def q_kg_triples(sf_dir: str) -> Dataset:
    from .kg import kg_triples

    cfg, gz, rt = _kg_world(sf_dir)
    return kg_triples(transcripts_source(cfg), gz, rt, linking="broadcast")


def q_kg_triples_join(sf_dir: str) -> Dataset:
    from .kg import kg_triples

    cfg, gz, rt = _kg_world(sf_dir)
    return kg_triples(transcripts_source(cfg), gz, rt, linking="join")


def q_kg_conversations(sf_dir: str) -> Dataset:
    from ..stages.reconstruct import conversations

    cfg, _, _ = _kg_world(sf_dir)
    return conversations(transcripts_source(cfg))


def q_kg_conversations_salted(sf_dir: str) -> Dataset:
    """Two-level salted conversation rollup (oversized-conversation
    skew recipe) - same oracle as kg_conversations."""
    from ..stages.reconstruct import conversations_salted

    cfg, _, _ = _kg_world(sf_dir)
    return conversations_salted(transcripts_source(cfg), turns_per_salt=8)


def q_kg_fact_history(sf_dir: str) -> Dataset:
    """SCD-2 temporal fact intervals (pipelines/kg.py:kg_fact_history):
    per (subj, pred) the time-ordered succession of objects with
    valid_from/valid_to closed by the next assertion — one provenance
    join + one grouped shuffle. Oracle: DuckDB lead() window over the
    independent golden triples + transcripts."""
    from .kg import kg_fact_history

    cfg, _, _ = _kg_world(sf_dir)
    triples = q_kg_triples(sf_dir)
    return kg_fact_history(triples, transcripts_source(cfg))


def q_kg_entity_cards(sf_dir: str) -> Dataset:
    """Per-entity JSON fact cards (pipelines/kg.py:kg_entity_cards):
    canonical sorted pred/obj ordering, one grouped shuffle — oracle is
    a DuckDB nested string_agg over the independent golden triples."""
    from .kg import kg_entity_cards

    return kg_entity_cards(q_kg_triples(sf_dir))


def q_kg_entity_distances(sf_dir: str) -> Dataset:
    """Bounded multi-source BFS over the entity graph
    (stages/graph.py:entity_distances): min hop count from E0000001
    within 4 hops, frontier-join + anti-join per round. Oracle:
    DuckDB recursive CTE with min-distance fold."""
    from ..stages.graph import entity_distances

    return entity_distances(q_kg_triples(sf_dir), ["E0000001"],
                            max_hops=4)


def q_kg_fact_history_incremental(sf_dir: str) -> Dataset:
    """Incremental SCD-2 maintenance
    (pipelines/kg.py:kg_fact_history_merge): the triples split
    deterministically (hash band on conv_id) into an 'already built'
    80% and a 'newly arrived' 20%; the old history is folded with the
    new dated assertions — untouched keys stream through an anti join
    unchanged, only touched keys re-chain. The result must equal the
    from-scratch rebuild, so this query shares kg_fact_history's
    DuckDB window oracle verbatim (the split itself is arbitrary —
    any deterministic banding exercises the same merge path)."""
    from .kg import kg_fact_history, kg_fact_history_merge

    cfg, _, _ = _kg_world(sf_dir)
    tr = transcripts_source(cfg)
    triples = q_kg_triples(sf_dir).materialize()

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        # vectorized process-stable siphash (fixed-key) band, ~80/20
        h = pd.util.hash_array(("hist|" + b["conv_id"]).to_numpy())
        b = b.copy()
        b["_old"] = (h % np.uint64(5)) < np.uint64(4)
        return b

    tagged = triples.map_batches(tag, batch_format="pandas") \
        .materialize()
    old_t = tagged.map_batches(
        lambda b: b[b["_old"]].drop(columns=["_old"]),
        batch_format="pandas")
    new_t = tagged.map_batches(
        lambda b: b[~b["_old"]].drop(columns=["_old"]),
        batch_format="pandas")

    old_hist = kg_fact_history(old_t, tr)
    ts = tr.select_columns(["conv_id", "turn_idx", "ts"])
    new_facts = new_t.join(
        ts, join_type="inner", num_partitions=default_join_partitions(),
        on=("conv_id", "turn_idx"),
    ).map_batches(
        lambda b: pd.DataFrame({"subj": b["subj"], "pred": b["pred"],
                                "obj": b["obj"], "valid_from": b["ts"]}),
        batch_format="pandas")
    return kg_fact_history_merge(old_hist, new_facts)


KG_SNAPSHOT_TS = "2025-01-15 00:00:00"


def q_kg_snapshot_at(sf_dir: str) -> Dataset:
    """Time-travel query: the knowledge graph AS OF a fixed instant —
    the facts whose validity interval covers KG_SNAPSHOT_TS, read off
    the SCD-2 table (kg_fact_history filtered, no extra shuffle).
    Oracle: the same DuckDB window + interval predicate."""

    hist = q_kg_fact_history(sf_dir)
    t = pd.Timestamp(KG_SNAPSHOT_TS)

    def live(b: pd.DataFrame) -> pd.DataFrame:
        m = (b["valid_from"] <= t) & (b["valid_to"].isna()
                                      | (b["valid_to"] > t))
        return b.loc[m, ["subj", "pred", "obj"]]

    return hist.map_batches(live, batch_format="pandas")


def q_kg_pred_type_dicts(sf_dir: str) -> Dataset:
    """dict-sum monoid reduceByKey (reference property_domains shape,
    kgdata/wikidata/datasets/property_domains.py:11-72): per predicate,
    the {subj_type: count} counter as canonical sorted-key JSON."""
    from ..functions.agg import dict_merge_aggregate

    triples = q_kg_triples(sf_dir)
    et = _entity_types_ds(sf_dir)
    typed = triples.select_columns(["subj", "pred"]).join(
        et, join_type="inner", num_partitions=default_join_partitions(),
        on=("subj",), right_on=("entity_id",),
    )
    return dict_merge_aggregate(typed, "pred", "etype", out_col="counts")


def q_kg_mentions(sf_dir: str) -> Dataset:
    from ..stages.mentions import detect_mentions_ngram

    cfg, gz, _ = _kg_world(sf_dir)
    return detect_mentions_ngram(
        transcripts_source(cfg), gz.column("alias").to_pylist()
    )


def q_kg_mentions_join(sf_dir: str) -> Dataset:
    """The no-broadcast mention plan (distributed gazetteer side):
    same oracle as kg_mentions."""
    from ..stages.mentions import detect_mentions_join

    cfg, gz, _ = _kg_world(sf_dir)
    return detect_mentions_join(transcripts_source(cfg), rd.from_arrow(gz))


def q_kg_triples_salted(sf_dir: str) -> Dataset:
    """Join-linking with hot-mention salting enabled (threshold low
    enough that head mentions take the salted path at sf>=0.001)."""
    import ray.data as rd_

    from ..stages.canonicalize import apply_canonical_map, canonical_map_from_table
    from ..stages.extract import extract_raw
    from ..stages.linking import alias_candidates, link_via_join
    from .kg import dedup_triples

    cfg, gz, rt = _kg_world(sf_dir)
    raw = extract_raw(transcripts_source(cfg))
    cands = alias_candidates(rd_.from_arrow(gz))
    linked = link_via_join(raw, cands, num_partitions=default_join_partitions(),
                           hot_threshold=200, salt_batch=100)
    canon = apply_canonical_map(
        linked, ray.put(canonical_map_from_table(rt)), ("subj", "obj")
    )
    return dedup_triples(canon)


def q_kg_outlinks(sf_dir: str) -> Dataset:
    from ..stages.graph import entity_outlinks

    out = entity_outlinks(q_kg_triples(sf_dir))

    # comma-join the per-entity target list for the driver compare
    # (list-valued columns don't survive the driver's value hash; the
    # operator itself stays list-valued)
    def to_str(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "entity_id": b["entity_id"],
                "outlinks": b["outlinks"].map(",".join),
            }
        )

    return out.map_batches(to_str, batch_format="pandas")


def q_kg_alias_candidates(sf_dir: str) -> Dataset:
    from ..stages.linking import alias_candidates

    cfg, gz, _ = _kg_world(sf_dir)
    return alias_candidates(rd.from_arrow(gz))


def q_kg_canonical_map(sf_dir: str) -> Dataset:
    from ..stages.canonicalize import resolve_redirects_distributed

    cfg, _, rt = _kg_world(sf_dir)
    return resolve_redirects_distributed(rd.from_arrow(rt), num_partitions=4)


def q_kg_canonical_map_driver(sf_dir: str) -> Dataset:
    """Driver-side pointer-chase chain collapse (the small-map plan;
    the distributed pointer-doubling variant is kg_canonical_map) -
    same recursive-CTE oracle certifies both algorithms."""
    from ..stages.canonicalize import canonical_map_from_table

    cfg, _, rt = _kg_world(sf_dir)
    canon = canonical_map_from_table(rt)
    return rd.from_arrow(
        pa.table(
            {
                "src_id": pa.array(list(canon.keys()), pa.string()),
                "canonical_id": pa.array(list(canon.values()), pa.string()),
            }
        )
    )


def q_propquery_filter(sf_dir: str) -> Dataset:
    """PropQuery mini-language filters chained over the documents
    table (reference record-filter grammar, kgdata/misc/query.py:6-45):
    equality + substring membership."""
    from ..functions.propquery import prop_filter

    docs = _t(sf_dir, "documents")
    return prop_filter(prop_filter(docs, "lang = en"), "the in text")


def q_asof_join(sf_dir: str) -> Dataset:
    """AS-OF (backward) join: each purchase event matched to the same
    user's most recent prior non-purchase event — an operator Ray Data
    lacks, composed from tag-union + grouped block merge_asof
    (functions/joins.py:asof_join_backward) and certified against
    DuckDB's native ASOF LEFT JOIN."""
    from ..functions.joins import asof_join_backward

    ev = _t(sf_dir, "events")
    left = ev.filter(expr="event_type == 'purchase'").select_columns(
        ["event_id", "user_id", "ts", "value"]
    )
    right = ev.filter(expr="event_type != 'purchase'").select_columns(
        ["user_id", "ts", "value", "event_type"]
    )
    return asof_join_backward(
        left, right, key="user_id", left_ts="ts", right_ts="ts",
        right_payload=["value", "event_type"],
    )


def q_sliding_window(sf_dir: str) -> Dataset:
    """Per-user sliding 1h time-window sum (SQL ``RANGE BETWEEN 1 HOUR
    PRECEDING AND CURRENT ROW``) — an operator Ray Data lacks, composed
    as one range shuffle + a vectorized pandas time-rolling pass per
    block (functions/agg.py:sliding_window_sum). The summed value is
    floor(value*100) as int64 so the rolling sum is exact in both
    engines (integer-valued float64 — no float-rounding hash risk)."""
    from ..functions.agg import sliding_window_sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])

    def cents(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(v_cents=np.floor(b["value"].to_numpy() * 100.0)
                     .astype("int64"))
        return b.drop(columns=["value"])

    w = sliding_window_sum(
        ev.map_batches(cents, batch_format="pandas"),
        key="user_id", ts_col="ts", value_col="v_cents",
        window="1h", out_col="w_sum",
    )

    def out(b: pd.DataFrame) -> pa.Table:
        b = b[["user_id", "event_id", "ts", "w_sum"]].copy()
        b["w_sum"] = b["w_sum"].astype("int64")
        return pa.Table.from_pandas(b, preserve_index=False)

    return w.map_batches(out, batch_format="pandas")


def q_interval_join(sf_dir: str) -> Dataset:
    """Range join: every non-purchase event matched to each same-user
    purchase whose [ts, ts+2h] interval covers it — Ray Data has no
    range join; this is the bucketed-equi-join composition
    (functions/joins.py:interval_join): intervals explode to the time
    buckets they cover, one (key, bucket) hash join co-locates
    candidates, a residual filter finishes."""
    from ..functions.joins import interval_join

    ev = _t(sf_dir, "events")
    left = ev.filter(expr="event_type != 'purchase'").select_columns(
        ["user_id", "event_id", "ts"]
    )

    def to_iv(b: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({
            "user_id": b["user_id"],
            "iv_id": b["event_id"],
            "start_ts": b["ts"],
            "end_ts": (b["ts"] + pd.Timedelta(hours=2))
            .astype("datetime64[us]"),
        })
        return pa.Table.from_pandas(out, preserve_index=False)

    iv = (
        ev.filter(expr="event_type == 'purchase'")
        .select_columns(["user_id", "event_id", "ts"])
        .map_batches(to_iv, batch_format="pandas")
    )
    return interval_join(
        left, iv, key="user_id", ts_col="ts",
        start_col="start_ts", end_col="end_ts", bucket="2h",
        left_cols=["user_id", "event_id", "ts"],
        interval_cols=["user_id", "iv_id", "start_ts", "end_ts"],
    )


_QUANTILES = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
_GROUP_QUANTILES = [0.25, 0.5, 0.9]
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_quantiles_global(sf_dir: str) -> Dataset:
    """Exact global discrete quantiles of events.value — distributed
    selection (functions/stats.py:global_quantiles): only per-block row
    counts reach the driver, each sorted block emits just the order
    statistics that fall inside it. Matches DuckDB quantile_disc."""
    from ..functions.stats import global_quantiles

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    return global_quantiles(ev, "value", _QUANTILES)


def q_quantiles_cont(sf_dir: str) -> Dataset:
    """Interpolated (continuous) global quantiles of events.value —
    same distributed selection as quantiles_global, lerp at virtual
    index q*(n-1) matching DuckDB quantile_cont bit-for-bit."""
    from ..functions.stats import global_quantiles

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    return global_quantiles(ev, "value", _QUANTILES, interpolated=True)


def q_quantiles_by_type(sf_dir: str) -> Dataset:
    """Exact per-event-type discrete quantiles of value (long format),
    one range shuffle + vectorized order-statistic gather per block."""
    from ..functions.stats import grouped_quantiles

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    return grouped_quantiles(ev, "event_type", "value", _GROUP_QUANTILES)


def q_quantiles_cont_by_type(sf_dir: str) -> Dataset:
    """Per-event-type interpolated (percentile_cont) quantiles —
    grouped_quantiles(interpolated=True): same lerp expression DuckDB
    evaluates, rounded to 6 digits on both sides."""
    from ..functions.stats import grouped_quantiles

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    return grouped_quantiles(ev, "event_type", "value",
                             _GROUP_QUANTILES, interpolated=True)


def q_pivot_event_counts(sf_dir: str) -> Dataset:
    """Crosstab users × event types with map-side partial pivots — the
    shuffle moves one partial row per (user, block), never events. The
    category list is pinned (the scale path: fixed output schema, no
    discovery pass)."""
    from ..functions.stats import pivot_counts

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    return pivot_counts(ev, "user_id", "event_type",
                        categories=_EVENT_TYPES)


def q_corr_qty_price(sf_dir: str) -> Dataset:
    """Per-returnflag Pearson correlation + sample covariance of
    (floor(extendedprice), quantity) from exact int64 partial sums
    (functions/stats.py:paired_moments) — the closed-form double
    formula over exact integer sums is bit-identical to the SQL
    oracle's."""
    from ..functions.stats import paired_moments

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def ints(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_returnflag": b["l_returnflag"],
            "x": np.floor(b["l_extendedprice"].to_numpy()).astype("int64"),
            "y": b["l_quantity"].to_numpy().astype("int64"),
        })

    return paired_moments(
        li.map_batches(ints, batch_format="pandas"), "l_returnflag", "x", "y"
    )


def q_word_counts(sf_dir: str) -> Dataset:
    """Corpus top-200 words (count desc, term asc) — the classic
    distributed wordcount with map-side combining
    (stages/textstats.py:word_counts); tokenization shared with the
    DuckDB oracle (WORD_SPLIT_PATTERN)."""
    from ..stages.textstats import word_counts

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return word_counts(docs, top_n=200)


def q_bigram_counts(sf_dir: str) -> Dataset:
    """Global adjacent-word-pair counts over the corpus
    (stages/textstats.py:bigram_counts) — the bigram-LM / BPE-merge
    count table; lateral-pair SQL oracle."""
    from ..stages.textstats import bigram_counts

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return bigram_counts(docs)


def q_doc_top_terms(sf_dir: str) -> Dataset:
    """Per-document top-3 terms by (tf desc, term asc) with corpus
    document frequency — the integer core of TF-IDF
    (stages/textstats.py:doc_top_terms)."""
    from ..stages.textstats import doc_top_terms

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return doc_top_terms(docs, k=3)


def q_melt_lineitem(sf_dir: str) -> Dataset:
    """Wide→long unpivot of three lineitem rate columns
    (functions/blocks.py:melt) — stateless per-batch reshape, values
    copied bit-exactly (no arithmetic, hash-safe)."""
    from ..functions.blocks import melt

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_discount", "l_tax"],
    )
    return melt(
        li, id_vars=["l_orderkey", "l_linenumber"],
        value_vars=["l_quantity", "l_discount", "l_tax"],
        var_name="measure", value_name="value",
    )


from ..functions.sampling import hash_threshold as _hash_threshold

_SAMPLE_FRACTION = 0.25
_SAMPLE_SALT = "s1"
_SAMPLE_CUT = _hash_threshold(_SAMPLE_FRACTION)
_HIST_LO, _HIST_HI, _HIST_BINS = 0.0, 500.0, 25


def q_hash_sample(sf_dir: str) -> Dataset:
    """Deterministic md5-keyed 25% sample of orders
    (functions/sampling.py:hash_sample) — the engine-independent,
    restart-safe sample a re-runnable 100-TB pipeline needs. The DuckDB
    oracle applies the identical md5-prefix cut and selects the exact
    same rows."""
    from ..functions.sampling import hash_sample

    orders = _t(sf_dir, "orders")
    return hash_sample(orders, "o_orderkey", _SAMPLE_FRACTION,
                       salt=_SAMPLE_SALT)


def q_value_histogram(sf_dir: str) -> Dataset:
    """Fixed-width 25-bin histogram of events.value over [0, 500) with
    map-side-combined bin counts (functions/stats.py:histogram)."""
    from ..functions.stats import histogram

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    return histogram(ev, "value", lo=_HIST_LO, hi=_HIST_HI,
                     nbins=_HIST_BINS)


def q_ndistinct_users(sf_dir: str) -> Dataset:
    """Exact COUNT(DISTINCT user_id) per event type in two map-side-
    combined shuffles (functions/stats.py:ndistinct_by)."""
    from ..functions.stats import ndistinct_by

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    return ndistinct_by(ev, "event_type", "user_id")


_CURATION_QUALITY = 0.7
_CURATION_FRACTION = 0.5
_CURATION_SALT = "cur"
_CURATION_CUT = _hash_threshold(_CURATION_FRACTION)


def q_corpus_curation(sf_dir: str) -> Dataset:
    """Flagship training-data curation composition: quality scoring →
    threshold filter → exact content dedup (min-id representative) →
    deterministic 50% hash sample. Every stage streams; the only
    shuffle is the dedup's content groupby. The DuckDB oracle replays
    the identical four stages in SQL."""
    from ..functions.sampling import hash_sample
    from ..stages.dedup import exact_dedup_ids
    from ..stages.textstats import quality_score_arrow

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    kept = docs.map_batches(
        lambda t: quality_score_arrow(t, extra_cols=("text",)),
        batch_format="pyarrow",
    ).filter(expr=f"quality >= {_CURATION_QUALITY}")
    reps = exact_dedup_ids(kept)
    return hash_sample(reps, "doc_id", _CURATION_FRACTION,
                       salt=_CURATION_SALT)


def q_rollup_doc_counts(sf_dir: str) -> Dataset:
    """SQL GROUP BY ROLLUP(lang, source) counts over documents
    (functions/stats.py:rollup_counts) — one map-side-combined shuffle
    over the data, coarser levels re-aggregate the fine counts."""
    from ..functions.stats import rollup_counts

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "source"])
    return rollup_counts(docs, ["lang", "source"])


def q_cube_doc_counts(sf_dir: str) -> Dataset:
    """SQL GROUP BY CUBE(lang, source) counts over documents
    (functions/stats.py:cube_counts) — one map-side-combined shuffle;
    all 2^k grouping subsets re-aggregate the tiny fine-level counts."""
    from ..functions.stats import cube_counts

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "source"])
    return cube_counts(docs, ["lang", "source"])


def q_row_number_events(sf_dir: str) -> Dataset:
    """row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
    (functions/agg.py:group_row_number) — one range shuffle on the
    partition key, vectorized cumcount per block."""
    from ..functions.agg import group_row_number

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts"])
    out = group_row_number(ev, "user_id", ["ts", "event_id"])
    return out.select_columns(["user_id", "event_id", "rn"])


def q_lag_lead_events(sf_dir: str) -> Dataset:
    """LAG/LEAD(value) OVER (PARTITION BY user_id ORDER BY ts,
    event_id) (functions/agg.py:group_lag_lead); edge NULLs filled
    with -1.0 so the NaN-vs-NULL hash question never arises (event
    values are strictly positive)."""
    from ..functions.agg import group_lag_lead

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "value"])
    out = group_lag_lead(ev, "user_id", ["ts", "event_id"], "value",
                         lag_col="lag_value", lead_col="lead_value")

    def fill(b: pd.DataFrame) -> pd.DataFrame:
        b = b[["user_id", "event_id", "lag_value", "lead_value"]].copy()
        b["lag_value"] = b["lag_value"].fillna(-1.0)
        b["lead_value"] = b["lead_value"].fillna(-1.0)
        return b

    return out.map_batches(fill, batch_format="pandas")


def q_ranked_events(sf_dir: str) -> Dataset:
    """rank()/dense_rank() on value (desc) and ntile(4) per user
    (functions/agg.py:group_rank) — one range shuffle on the partition
    key, vectorized pandas rank kernels per block."""
    from ..functions.agg import group_rank

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "value"])
    out = group_rank(ev, "user_id", "value", "event_id", tiles=4)
    return out.select_columns(
        ["user_id", "event_id", "rnk", "dense_rnk", "tile"])


_CAP_PER_SOURCE = 5


def q_source_cap_docs(sf_dir: str) -> Dataset:
    """Per-(lang, source) document cap — keep at most 5 docs per
    group by keyed-md5 order (functions/sampling.py:cap_per_group),
    the per-domain cap step of corpus curation."""
    from ..functions.sampling import cap_per_group

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "source"])
    return cap_per_group(docs, ["lang", "source"], "doc_id",
                         _CAP_PER_SOURCE)


def q_kg_triangles(sf_dir: str) -> Dataset:
    """Triangle enumeration over the entity co-mention graph
    (entities sharing a conversation): degree-ordered orientation +
    wedge self-join + closing hash join
    (stages/graph.py:co_mention_edges, :triangles)."""
    from ..stages.graph import co_mention_edges, triangles

    return triangles(co_mention_edges(q_kg_triples(sf_dir)))


def q_kg_core_numbers(sf_dir: str) -> Dataset:
    """Full k-core decomposition (coreness per entity) of the
    co-mention graph via distributed H-index iteration
    (stages/graph.py:core_numbers, ~10 rounds) — certified against an
    independent naive-PEELING golden (different algorithm, same fixed
    point)."""
    from ..stages.graph import co_mention_edges, core_numbers

    return core_numbers(co_mention_edges(q_kg_triples(sf_dir)))


def q_kg_kcore(sf_dir: str) -> Dataset:
    """3-core of the entity co-mention graph by distributed iterative
    peeling (stages/graph.py:k_core) — per round one map-side-combined
    degree count plus two size-guarded anti joins; certified against an
    independent naive-peeling golden."""
    from ..stages.graph import co_mention_edges, k_core

    return k_core(co_mention_edges(q_kg_triples(sf_dir)), k=3)


def q_doc_corpus_freq(sf_dir: str) -> Dataset:
    """Per-document corpus-frequency score: Σ global frequency of each
    token occurrence + token count, integer-exact
    (stages/textstats.py:doc_corpus_freq) — two-pass corpus stats
    (vocab counts, then a term join back)."""
    from ..stages.textstats import doc_corpus_freq

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return doc_corpus_freq(docs)


_CENTROID_SCALE = 1_000_000


def q_label_centroids(sf_dir: str) -> Dataset:
    """Per-label embedding centroid in exact fixed-point: (label, pos,
    sum_fx, n) with sum_fx = Σ floor(v[pos]*1e6) as int64
    (stages/similarity.py:grouped_vector_sums) — integer sums make the
    distributed reduction order-independent, unlike a float mean."""
    from ..stages.similarity import grouped_vector_sums

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["label", "embedding"])
    return grouped_vector_sums(emb, "label", "embedding",
                               scale=_CENTROID_SCALE)


def q_props_by_type(sf_dir: str) -> Dataset:
    """JSON payload extraction + aggregate: parse the events ``props``
    JSON column (functions/text.py:json_extract_fields — the
    reference's per-record orjson parsing pattern), then a map-side
    combined sum/count of the extracted field per event_type."""
    from ..functions.agg import grouped_blockwise
    from ..functions.text import json_extract_fields

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])
    ex = json_extract_fields(ev, "props", {"k": ("k", "int64")})

    def partial(b: pd.DataFrame) -> pa.Table:
        out = (
            b.groupby("event_type", sort=False)["k"]
            .agg(sum_k="sum", n="size").reset_index()
        )
        out["sum_k"] = out["sum_k"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    def final(b: pd.DataFrame) -> pa.Table:
        out = (
            b.groupby("event_type", sort=False)[["sum_k", "n"]]
            .sum().reset_index()
        )
        out["sum_k"] = out["sum_k"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ex.map_batches(partial, batch_format="pandas")
    return grouped_blockwise(parts, ["event_type"], final)


_BUCKETS = 4


def q_bucketed_join(sf_dir: str) -> Dataset:
    """Co-partitioned (bucketed) join: both sides are written once
    into key-hashed bucket directories (state/manifest.py:
    write_dataset_sharded — resumable, manifest-validated), then
    joined shard-by-shard with NO global shuffle
    (functions/joins.py:bucketed_join). The pattern that amortizes one
    partitioning across every downstream join of a 100-TB table; the
    bucketed sinks are cached across calls via their manifests."""
    import os

    from ..functions.joins import bucketed_join
    from ..state.manifest import write_dataset_sharded

    base = ("/tmp/kgr_bucketed/"
            + os.path.basename(os.path.normpath(sf_dir)))
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    for ds_in, sub, col in ((orders, "orders", "o_custkey"),
                            (cust, "customer", "c_custkey")):
        out = f"{base}/{sub}"
        write_dataset_sharded(ds_in, out, shard_col=col,
                              num_shards=_BUCKETS, name=f"{sub}_bucketed",
                              params={"sf_dir": sf_dir})
    j = bucketed_join(f"{base}/orders", f"{base}/customer",
                      on="o_custkey", right_on="c_custkey")
    return j.select_columns(["o_orderkey", "c_name"])


def q_watermark_windows(sf_dir: str) -> Dataset:
    """Streaming tumbling-window aggregate with watermark late-data
    drop, replayed over the bounded events table
    (functions/agg.py:watermark_tumbling_windows). Arrival order is a
    deterministic md5 permutation of event_id (the table's event_id
    follows event time, so real arrival jitter must be synthesized);
    lateness 14 days drops ~47% of events at sf0.01 — both the keep
    and the drop path are exercised. Windows are 1-day buckets."""
    import hashlib

    from ..functions.agg import watermark_tumbling_windows

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])

    def arr(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        # md5 prefix + zero-padded id = a TOTAL arrival order (md5
        # prefixes alone can tie, which would leave the watermark
        # order ambiguous between engines)
        b["arr"] = [
            hashlib.md5(str(e).encode()).hexdigest()[:8]
            + f"-{e:012d}"
            for e in b["event_id"]
        ]
        return b

    out = watermark_tumbling_windows(
        ev.map_batches(arr, batch_format="pandas"),
        "user_id", "ts", "arr", "value",
        window=pd.Timedelta(days=1), lateness=pd.Timedelta(days=14),
    )
    return out


_CHUNK_TOKENS = 32
_CHUNK_STRIDE = 24


_DE_SUFFIX = " der die das und ist von mit für auf ein"
_FR_SUFFIX = " le la les et de des un une est pour"


def q_chunk_lang_consistency(sf_dir: str) -> Dataset:
    """Per-document language consistency across chunks
    (stages/textstats.py:chunk_lang_consistency): mixed-language docs
    are planted deterministically (doc_id % 3 == 0 gets a German
    stopword passage, % 7 == 0 a French one), the doc is chunked
    (32/24 token windows), each chunk language-ID'd, and the doc
    reports its majority language plus the integer-exact fraction of
    chunks agreeing with it — the wrong-language-span detector of a
    corpus quality pipeline. Oracle: the full composition (augment ->
    chunk -> per-chunk stopword vote -> per-doc majority) replayed in
    SQL."""
    from ..stages.textstats import chunk_lang_consistency

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def augment(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy()
        de = np.where(ids % 3 == 0, _DE_SUFFIX * 4, "")
        fr = np.where(ids % 7 == 0, _FR_SUFFIX * 2, "")
        return pd.DataFrame({"doc_id": b["doc_id"],
                             "text": b["text"] + de + fr})

    return chunk_lang_consistency(
        docs.map_batches(augment, batch_format="pandas"),
        chunk_tokens=_CHUNK_TOKENS, stride=_CHUNK_STRIDE)


def q_chunk_documents(sf_dir: str) -> Dataset:
    """Token-window passage chunking with overlap
    (stages/textstats.py:chunk_documents) — windows every 24 tokens of
    32 tokens each, shuffle-free flatMap."""
    from ..stages.textstats import chunk_documents

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return chunk_documents(docs, chunk_tokens=_CHUNK_TOKENS,
                           stride=_CHUNK_STRIDE)


_CONTAM_N = 4
_CONTAM_MOD = 20


def q_contamination(sf_dir: str) -> Dataset:
    """Benchmark-decontamination pass: corpus doc ids sharing any word
    4-gram with the probe set (docs with id % 20 == 3, standing in for
    an eval benchmark). Broadcast gram-set semi join — the corpus gram
    stream never shuffles (stages/textstats.py:ngram_contamination)."""
    from ..stages.textstats import ngram_contamination

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def split(want_probe: bool):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            m = (b["doc_id"] % _CONTAM_MOD) == 3
            return b[m] if want_probe else b[~m]
        return f

    probe = docs.map_batches(split(True), batch_format="pandas")
    rest = docs.map_batches(split(False), batch_format="pandas")
    return ngram_contamination(rest, probe, n=_CONTAM_N)


_FUZZY_PROBE_MOD = 11
_EMB_CONTAM_MOD = 13
_EMB_CONTAM_T = 0.9


def q_embedding_contamination(sf_dir: str) -> Dataset:
    """Semantic decontamination
    (stages/similarity.py:embedding_contamination): corpus vec_ids
    with cosine >= 0.9 (6 dp) against ANY probe vector. The probe
    stands in for an embedded eval benchmark: vec_ids % 13 == 0 with a
    constant +0.01 element shift (a planted paraphrase-like semantic
    near-dup at ~0.996 cosine, NOT an identity match — the engine must
    compute the real similarity). Probe broadcasts once; the corpus
    streams through one shuffle-free pass. Oracle: DuckDB join on
    list_cosine_similarity with the identical rounding."""
    from ..stages.similarity import embedding_contamination

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])

    def pick_probe(t: pa.Table) -> pa.Table:
        from ..stages.similarity import _ids64, _vec_matrix

        keep = _ids64(t, "vec_id") % _EMB_CONTAM_MOD == 0
        c = t.filter(pa.array(keep))
        mat = _vec_matrix(c, "embedding") + 0.01
        return pa.table({
            "vec_id": c["vec_id"],
            "embedding": pa.array(list(mat), pa.list_(pa.float64())),
        })

    probe = emb.map_batches(pick_probe, batch_format="pyarrow")
    return embedding_contamination(emb, probe, threshold=_EMB_CONTAM_T)


def q_fuzzy_contamination(sf_dir: str) -> Dataset:
    """Fuzzy decontamination (stages/dedup.py:fuzzy_contamination):
    doc ids near-duplicating ANY probe document by MinHash-LSH banding
    + exact char-shingle Jaccard >= 0.6. The probe set stands in for a
    leaked eval benchmark: docs with id % 11 == 0, truncated to the
    first 4/5 of their words (a planted paraphrase-like near-dup that
    exact-overlap checks can miss). Certified against a sequential
    same-spec golden (oracle_sketch.golden_fuzzy_contamination)."""
    from ..stages.dedup import fuzzy_contamination

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def probe(b: pd.DataFrame) -> pa.Table:
        # probe is eval-benchmark-sized by contract; the per-row word
        # slice runs only over it
        c = b[b["doc_id"] % _FUZZY_PROBE_MOD == 0]
        txt = [" ".join(w[:max(1, len(w) * 4 // 5)])
               for w in (t.split(" ") for t in c["text"])]
        return pa.table({
            "doc_id": pa.array(c["doc_id"].to_numpy(), pa.int64()),
            "text": pa.array(txt, pa.string()),
        })

    return fuzzy_contamination(
        docs, docs.map_batches(probe, batch_format="pandas"))


def _ensure_nation_sql_dump(sf_dir: str) -> str:
    """Deterministic MySQL-dump stand-in for the nation table (the
    reference ingests page/redirect SQL dumps; this sandbox has none,
    so the dump is synthesized from the parquet and the oracle
    recomputes the same content in SQL — a round-trip certification of
    the parser, the media_headers pattern). The synthetic comment
    column exercises quotes, backslashes, commas, parens and NULLs."""
    import os
    import pyarrow.parquet as pqt

    out_dir = Path(f"/tmp/kgr_sqldump_{Path(sf_dir).name}")
    path = out_dir / "nation.sql"
    if path.exists():
        return str(path)
    rows = pqt.read_table(f"{sf_dir}/nation.parquet").to_pylist()

    def esc(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    lines = ["-- MySQL dump stand-in (synthesized)",
             "CREATE TABLE `nation` (noise to skip);"]
    for i in range(0, len(rows), 7):
        vals = []
        for r in rows[i : i + 7]:
            k = r["n_nationkey"]
            c = "NULL" if k % 3 == 0 else esc(f"it's #{k} (a\\b),")
            vals.append(
                f"({k},{esc(r['n_name'])},{r['n_regionkey']},{c})"
            )
        lines.append("INSERT INTO `nation` VALUES " + ",".join(vals) + ";")
    out_dir.mkdir(parents=True, exist_ok=True)
    tmp = out_dir / f".nation.sql.tmp-{os.getpid()}"
    tmp.write_text("\n".join(lines) + "\n")
    os.replace(tmp, path)
    return str(path)


def q_sql_values_roundtrip(sf_dir: str) -> Dataset:
    """SQL-dump ingestion (reference ``parse_sql_values``,
    ``kgdata/wikidata/datasets/page_ids.py:74-106``): synthesize a
    MySQL dump of nation, Ray-read it back through the line parser,
    cast to the table's dtypes. Oracle = the same rows straight from
    the parquet view."""
    from ..sources.textline import read_sql_dump

    path = _ensure_nation_sql_dump(sf_dir)
    ds = read_sql_dump(
        path, ["n_nationkey", "n_name", "n_regionkey", "n_comment"],
        table="nation",
    )

    def cast(b: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame(
            {
                "n_nationkey": b["n_nationkey"].astype("int32"),
                "n_name": b["n_name"],
                "n_regionkey": b["n_regionkey"].astype("int32"),
                "n_comment": b["n_comment"],
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(cast, batch_format="pandas")


def q_kg_entity_degrees(sf_dir: str) -> Dataset:
    from ..stages.graph import entity_degrees

    return entity_degrees(q_kg_triples(sf_dir))


def q_kg_triples_bucketed(sf_dir: str) -> Dataset:
    """Flagship bucketed-sink composition: the kg_triples table is
    written ONCE into subj-hashed bucket directories
    (state/manifest.py:write_dataset_sharded — resumable, each shard
    manifest-validated), the entity-degree table is written under the
    SAME bucketing on its entity key, and the two rejoin
    shard-by-shard with functions/joins.py:bucketed_join — no global
    shuffle at join time. This is the pay-the-shuffle-once pattern on
    the KG path itself (not just the orders/customer demo): any
    downstream subj-keyed join reuses the same buckets. Output: every
    triple with its subject's degrees attached."""
    import os

    from ..functions.blocks import rename_cols
    from ..functions.joins import bucketed_join
    from ..state.manifest import write_dataset_sharded
    from ..stages.graph import entity_degrees

    base = ("/tmp/kgr_bucketed/"
            + os.path.basename(os.path.normpath(sf_dir)))
    tr = q_kg_triples(sf_dir).materialize()  # feeds both sinks
    deg = rename_cols(entity_degrees(tr), {"entity_id": "deg_entity"})
    write_dataset_sharded(
        tr, f"{base}/kg_triples", shard_col="subj",
        num_shards=_BUCKETS, name="kg_triples_bucketed",
        params={"sf_dir": sf_dir})
    write_dataset_sharded(
        deg, f"{base}/kg_degrees", shard_col="deg_entity",
        num_shards=_BUCKETS, name="kg_degrees_bucketed",
        params={"sf_dir": sf_dir})
    j = bucketed_join(f"{base}/kg_triples", f"{base}/kg_degrees",
                      on="subj", right_on="deg_entity")
    return j.select_columns(
        ["subj", "pred", "obj", "out_degree", "in_degree"])


def q_kg_types_degrees(sf_dir: str) -> Dataset:
    """(entity_id, etype, out_degree, in_degree) — the reference's
    ``entity_types_and_degrees`` join table
    (kgdata/wikidata/datasets/entity_types_and_degrees.py:15-66):
    degrees left-joined onto the entity-type table, 'unknown' fill for
    typeless endpoints (literal objects)."""
    from ..functions.blocks import rename_cols
    from ..stages.graph import entity_degrees

    deg = entity_degrees(q_kg_triples(sf_dir))
    j = deg.join(
        rename_cols(_entity_types_ds(sf_dir), {"entity_id": "te"}),
        join_type="left_outer", num_partitions=2,
        on=("entity_id",), right_on=("te",),
    )

    def fix(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "entity_id": b["entity_id"],
            "etype": b["etype"].fillna("unknown"),
            "out_degree": b["out_degree"].astype("int64"),
            "in_degree": b["in_degree"].astype("int64"),
        })

    return j.map_batches(fix, batch_format="pandas")


def q_kg_entity_aliases(sf_dir: str) -> Dataset:
    """(entity_id, aliases, total_freq) — the reference's
    ``entity_wiki_aliases`` per-entity alias rollup
    (kgdata/wikidata/datasets/entity_wiki_aliases.py:19-56): sorted
    distinct alias list (comma-joined for the driver compare) plus the
    summed global frequency. One grouped shuffle on entity_id."""
    from ..functions.agg import grouped_blockwise

    cfg, gz, _ = _kg_world(sf_dir)
    ds = rd.from_arrow(gz).repartition(4)

    def block(b: pd.DataFrame) -> pa.Table:
        out = (
            b.groupby("entity_id", sort=False)
            .agg(aliases=("alias", lambda s: ",".join(sorted(set(s)))),
                 total_freq=("freq_global", "sum"))
            .reset_index()
        )
        out["total_freq"] = out["total_freq"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return grouped_blockwise(ds, ["entity_id"], block)


def q_kg_meta_graph(sf_dir: str) -> Dataset:
    """Schema-level rollup via the JOIN plan (scale path — the
    entity→type table is entity-sized, so it joins instead of being
    collected into a broadcast dict; round-2 VERDICT #5). The broadcast
    variant remains the small-vocabulary fast path, pytest-equal."""
    from ..stages.graph import meta_graph_join

    # 2 partitions: the synthetic type table is small
    return meta_graph_join(
        q_kg_triples(sf_dir), _entity_types_ds(sf_dir), num_partitions=2
    )


def q_kg_pagerank(sf_dir: str) -> Dataset:
    """Distributed 5-iteration PageRank over the triples. Ranks are
    rounded to 6 dp at the certifiable boundary: the golden oracle is
    an independent dense numpy power iteration with the same dangling
    semantics; the two runs differ only by float summation order
    (~1e-15), which 6-dp rounding erases."""
    from ..stages.graph import pagerank

    ranks = pagerank(q_kg_triples(sf_dir), iters=5)

    def rounded(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node_id": b["node_id"], "rank": b["rank"].round(6)}
        )

    return ranks.map_batches(rounded, batch_format="pandas")


def q_kg_ppr(sf_dir: str) -> Dataset:
    """Personalized PageRank from seed E0000001
    (stages/graph.py:pagerank with personalization): teleport and
    dangling mass land on the seed vector — seed-relative entity
    relatedness. Same 6-dp certifiable boundary as kg_pagerank, golden
    is the same dense power iteration with the seed vector."""
    from ..stages.graph import pagerank

    ranks = pagerank(q_kg_triples(sf_dir), iters=5,
                     personalization=["E0000001"])

    def rounded(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node_id": b["node_id"], "rank": b["rank"].round(6)}
        )

    return ranks.map_batches(rounded, batch_format="pandas")


def q_kg_pred_counts(sf_dir: str) -> Dataset:
    """Predicate frequency stats (class_count/property_count analog)."""
    return partial_group_count(q_kg_triples(sf_dir), "pred")


def _entity_types_ds(sf_dir: str) -> Dataset:
    from ..synth import build_world

    cfg, _, _ = _kg_world(sf_dir)
    w = build_world(cfg)
    return rd.from_arrow(
        pa.table(
            {
                "entity_id": pa.array(w.entity_ids, pa.string()),
                "etype": pa.array(w.etypes, pa.string()),
            }
        )
    )


def q_kg_class_closure(sf_dir: str) -> Dataset:
    """Ancestor closure of the type DAG, computed by the DISTRIBUTED
    Dataset iteration (the driver-side BFS closure is the broadcast side
    of kg_all_types; both are tested equal)."""
    from ..oracle_tables import type_dag_table
    from ..stages.hierarchy import ancestor_closure_distributed

    cfg, _, _ = _kg_world(sf_dir)
    # tiny vocabulary: 2 partitions keep the per-round join overhead low
    return ancestor_closure_distributed(
        rd.from_arrow(type_dag_table(cfg)), num_partitions=2
    )


def q_kg_all_types(sf_dir: str) -> Dataset:
    """entity_all_types analog: every entity's direct type (dist 0) plus
    all ancestors at min distance, via a broadcast closure explode."""
    from ..stages.hierarchy import SYNTH_TYPE_DAG, ancestor_closure, entity_all_types

    return entity_all_types(
        _entity_types_ds(sf_dir), ancestor_closure(SYNTH_TYPE_DAG)
    )


def q_kg_property_domains(sf_dir: str) -> Dataset:
    from ..stages.graph import property_domains

    return property_domains(q_kg_triples(sf_dir), _entity_types_ds(sf_dir))


def q_kg_property_ranges(sf_dir: str) -> Dataset:
    from ..stages.graph import property_ranges

    return property_ranges(q_kg_triples(sf_dir), _entity_types_ds(sf_dir))


def q_kg_prop_connections(sf_dir: str) -> Dataset:
    from ..stages.graph import property_connections

    return property_connections(q_kg_triples(sf_dir), _entity_types_ds(sf_dir))


def q_kg_raw_candidates(sf_dir: str) -> Dataset:
    """The standalone extraction stage (pre-linking), certified against
    an independent pure-Python anchored-regex extraction."""
    from ..stages.extract import extract_raw

    cfg, _, _ = _kg_world(sf_dir)
    return extract_raw(transcripts_source(cfg))


def q_kg_unlinkable(sf_dir: str) -> Dataset:
    from ..stages.extract import extract_raw
    from ..stages.linking import best_candidate_map, unlinkable_mentions

    cfg, gz, _ = _kg_world(sf_dir)
    raw = extract_raw(transcripts_source(cfg))
    return unlinkable_mentions(raw, best_candidate_map(gz))


# --------------------------------------------------------------------------
# Registry


def q_edit_distance_pairs(sf_dir: str) -> Dataset:
    """Typo-tolerant string self-join: distinct part-name pairs within
    Levenshtein distance 2 via lossless q-gram blocking + bounded exact
    verify (stages/strsim.py:edit_distance_pairs) — the entity-
    resolution primitive; the DuckDB oracle is the naive all-pairs
    levenshtein() scan."""
    from ..stages.strsim import edit_distance_pairs

    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_name"])
    return edit_distance_pairs(parts, "p_name", max_dist=2)


def q_jaccard_set_join(sf_dir: str) -> Dataset:
    """Exact set-similarity self-join over part-name token sets at
    Jaccard >= 0.3 (stages/strsim.py:jaccard_set_join) — AllPairs/
    PPJoin prefix filtering with exact verification; the oracle is
    the naive all-pairs list_intersect scan."""
    from ..stages.strsim import jaccard_set_join

    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_name"])
    return jaccard_set_join(parts, "p_name", threshold=0.3)


def q_er_name_clusters(sf_dir: str) -> Dataset:
    """Entity-resolution capstone composition: typo-tolerant blocking
    (stages/strsim.py:edit_distance_pairs, lossless q-gram blocking +
    bounded verify) -> pair graph -> distributed connected components
    (stages/canonicalize.py:connected_components, min-label
    propagation) -> (node_id, component_id) with the lexicographic-min
    name as the cluster representative. Oracle: naive levenshtein
    all-pairs + a recursive-CTE reachability closure."""
    from ..stages.dedup import dedup_clusters
    from ..stages.strsim import edit_distance_pairs

    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_name"])
    pairs = edit_distance_pairs(parts, "p_name", max_dist=2)
    return dedup_clusters(pairs, id_a="name_a", id_b="name_b")


def q_kg_adamic_adar(sf_dir: str) -> Dataset:
    """Adamic–Adar link-prediction scores over the entity co-mention
    graph (stages/graph.py:adamic_adar): one neighbor-key grouped
    shuffle (group size IS the degree) + one pair-sum shuffle."""
    from ..stages.graph import adamic_adar, co_mention_edges

    return adamic_adar(co_mention_edges(q_kg_triples(sf_dir)))


def q_kg_random_walks(sf_dir: str) -> Dataset:
    """Deterministic node2vec-style walk corpus over the entity->entity
    triple graph (stages/graph.py:random_walks): one 4-hop walk per
    node with out-edges, derandomized neighbor choice over the sorted
    neighbor list; certified by a recursive-CTE oracle replaying the
    identical index arithmetic."""
    from ..stages.graph import random_walks

    return random_walks(q_kg_triples(sf_dir))


def q_kg_walk_pairs(sf_dir: str) -> Dataset:
    """Skip-gram (node, context, n) training pairs within a 2-step
    window of the deterministic walk corpus
    (stages/graph.py:walk_skipgram_pairs) — the DeepWalk/node2vec
    pair generator; oracle = the walk CTE self-joined on walk id."""
    from ..stages.graph import random_walks, walk_skipgram_pairs

    return walk_skipgram_pairs(random_walks(q_kg_triples(sf_dir)))


def q_kg_pmi_pairs(sf_dir: str) -> Dataset:
    """PMI between co-mentioned entities (stages/graph.py:pmi_pairs):
    conversation-bounded pair generation, map-side-combined counts,
    two small joins against the per-entity count table."""
    from ..functions.agg import distinct_rows
    from ..stages.graph import pmi_pairs

    tr = q_kg_triples(sf_dir).select_columns(["conv_id", "subj"])
    return pmi_pairs(distinct_rows(tr, ["conv_id", "subj"]))


def q_merge_upserts(sf_dir: str) -> Dataset:
    """CDC upsert/delete merge (functions/modifications.py:
    merge_upserts): deterministic synthetic changefeed over orders —
    keys %7==0 get a +1000.0 repricing (version 1), of those keys
    %3==0 are tombstoned — applied distributed (union + latest-wins
    + tombstone drop); the oracle replays the same change rules."""
    from ..functions.modifications import merge_upserts

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def as_base(b: pd.DataFrame) -> pa.Table:
        b = b.copy()
        b["_version"] = np.int64(0)
        b["_deleted"] = False
        return pa.Table.from_pandas(b, preserve_index=False)

    def as_updates(b: pd.DataFrame) -> pa.Table:
        u = b[b["o_orderkey"] % 7 == 0].copy()
        u["o_totalprice"] = u["o_totalprice"] + 1000.0
        u["_version"] = np.int64(1)
        u["_deleted"] = (u["o_orderkey"] % 3 == 0)
        return pa.Table.from_pandas(u, preserve_index=False)

    base = orders.map_batches(as_base, batch_format="pandas")
    upd = orders.map_batches(as_updates, batch_format="pandas")
    return merge_upserts(base, upd, "o_orderkey")


def q_kg_neighborhood_jaccard(sf_dir: str) -> Dataset:
    """Neighbor-set Jaccard similarity over the entity co-mention
    graph (stages/graph.py:neighborhood_jaccard) — duplicate-entity /
    similar-entity detection; exact int counts, exact double division."""
    from ..stages.graph import co_mention_edges, neighborhood_jaccard

    return neighborhood_jaccard(co_mention_edges(q_kg_triples(sf_dir)))


def q_inverted_index(sf_dir: str) -> Dataset:
    """Inverted index over documents (stages/textstats.py:
    inverted_index): term -> (df, comma-joined ascending posting
    list), tokenization shared with the SQL oracle."""
    from ..stages.textstats import inverted_index

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return inverted_index(docs)


def q_unigram_logprob_join(sf_dir: str) -> Dataset:
    """The no-broadcast scale plan of :func:`q_unigram_logprob`: the
    vocabulary count table stays distributed and scoring is one hash
    join + grouped mean (for web-scale heavy-tailed vocabularies that
    cannot ship to workers). Same oracle as the broadcast plan."""
    from ..stages.textstats import unigram_logprob_scores

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return unigram_logprob_scores(docs, plan="join")


_MTS_QUALITY = 0.5
_MTS_EN_FRACTION = 0.5
_MTS_TRAIN_FRACTION = 0.9
_MTS_SALT_SAMPLE = "mts"
_MTS_SALT_SPLIT = "mts2"


def q_make_training_set(sf_dir: str) -> Dataset:
    """Flagship end-to-end curation composition — 'make a training
    set': quality filter -> exact content dedup -> per-language
    rebalance (en halved) -> deterministic 90/10 train/val split ->
    GPT-style sequence packing of the train stream into 512-token
    bins. Output one row per (train doc, bin touched) plus val docs
    with bin_id -1. Every stage is an already-certified operator; the
    oracle replays the identical chain in SQL."""
    from ..functions.blocks import scrub_empty_blocks
    from ..functions.joins import semi_join
    from ..functions.sampling import split_assign, stratified_sample
    from ..stages.dedup import exact_dedup_ids
    from ..stages.textstats import (
        quality_score_arrow,
        sequence_packing,
        token_counts_arrow,
    )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "text"])

    def score(t: pa.Table) -> pa.Table:
        out = quality_score_arrow(t, extra_cols=("lang", "text"))
        return out.append_column(
            "n_tokens_bpe", token_counts_arrow(t)["n_tokens_bpe"])

    kept = docs.map_batches(score, batch_format="pyarrow").filter(
        expr=f"quality >= {_MTS_QUALITY}")
    reps = exact_dedup_ids(kept)
    # representative filter = semi join (reps is unique by construction);
    # the auto plan broadcasts the id set when bounded, shuffles beyond
    k2 = semi_join(
        scrub_empty_blocks(kept.drop_columns(["text", "quality"])),
        scrub_empty_blocks(reps), "doc_id")
    samp = stratified_sample(k2, "lang", "doc_id",
                             {"en": _MTS_EN_FRACTION}, default=1.0,
                             salt=_MTS_SALT_SAMPLE)
    lab = split_assign(samp, "doc_id",
                       fractions=[_MTS_TRAIN_FRACTION,
                                  1.0 - _MTS_TRAIN_FRACTION],
                       labels=["train", "val"], salt=_MTS_SALT_SPLIT)

    def trains(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["split"] == "train",
                     ["doc_id", "n_tokens_bpe"]]

    def vals(b: pd.DataFrame) -> pa.Table:
        v = b.loc[b["split"] == "val", ["doc_id"]].copy()
        return pa.table({
            "doc_id": pa.array(v["doc_id"].to_numpy(), pa.int64()),
            "split": pa.array(["val"] * len(v), pa.string()),
            "bin_id": pa.array([-1] * len(v), pa.int64()),
        })

    lab = lab.materialize()  # consumed twice (train packing + val rows)
    packed = sequence_packing(
        scrub_empty_blocks(
            lab.map_batches(trains, batch_format="pandas")),
        "doc_id", "n_tokens_bpe")

    def tag_train(t: "pa.Table") -> "pa.Table":
        return pa.table({
            "doc_id": t["doc_id"],
            "split": pa.array(["train"] * len(t), pa.string()),
            "bin_id": t["bin_id"],
        })

    train_rows = packed.map_batches(tag_train, batch_format="pyarrow")
    val_rows = scrub_empty_blocks(
        lab.map_batches(vals, batch_format="pandas"))
    return train_rows.union(val_rows)


def q_unigram_logprob(sf_dir: str) -> Dataset:
    """Unigram-LM quality score per document (the cheap perplexity
    stand-in of corpus curation;
    stages/textstats.py:unigram_logprob_scores)."""
    from ..stages.textstats import unigram_logprob_scores

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return unigram_logprob_scores(docs)


_WS_K = 50
_SPLIT_FRACS = (0.8, 0.1, 0.1)
_SPLIT_SALT = "split"


def q_weighted_sample_orders(sf_dir: str) -> Dataset:
    """Deterministic weighted sample without replacement: 50 orders
    with inclusion probability proportional to o_totalprice
    (functions/sampling.py:weighted_sample — Efraimidis-Spirakis keys
    from an engine-replicable multiplicative hash, combiner top-k)."""
    from ..functions.sampling import weighted_sample

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return weighted_sample(orders, "o_orderkey", "o_totalprice", _WS_K)


def q_train_val_test_split(sf_dir: str) -> Dataset:
    """Deterministic 80/10/10 train/val/test assignment by keyed-md5
    band (functions/sampling.py:split_assign) — disjoint, exhaustive,
    restart-safe, reproducible by any engine."""
    from ..functions.sampling import split_assign

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])
    return split_assign(docs, "doc_id", fractions=_SPLIT_FRACS,
                        labels=["train", "val", "test"],
                        salt=_SPLIT_SALT)


_PACK_CAPACITY = 512


def q_sequence_packing(sf_dir: str) -> Dataset:
    """Pretraining sequence packing: documents laid head-to-tail in
    doc_id order (BPE-ish token counts) and cut into 512-token bins,
    documents spanning bins (stages/textstats.py:sequence_packing —
    distributed prefix sum, one int per block to the driver)."""
    from ..stages.textstats import sequence_packing, token_counts

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    toks = token_counts(docs).select_columns(
        ["doc_id", "n_tokens_bpe"])
    return sequence_packing(toks, "doc_id", "n_tokens_bpe",
                            capacity=_PACK_CAPACITY)


def q_topk_orders_pushdown(sf_dir: str) -> Dataset:
    """Top-20 orders by total price via the combiner plan
    (functions/agg.py:global_topk): per-batch local top-k then one
    tiny final cut — O(batches*k) rows of traffic instead of the
    full sort shuffle the `topk_orders` plan pays; same oracle."""
    from ..functions.agg import global_topk

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return global_topk(orders, ["o_totalprice", "o_orderkey"],
                       [False, True], 20)


_FUNNEL_GAP_HOURS = 48


def q_funnel_windowed(sf_dir: str) -> Dataset:
    """Conversion-window funnel: view -> click -> purchase where each
    step must land within 48 h of the previous step
    (functions/funnel.py:funnel_stages with max_gap)."""
    from ..functions.funnel import funnel_stages

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    return funnel_stages(ev, "user_id", "ts", "event_type",
                         _FUNNEL_STEPS,
                         max_gap=pd.Timedelta(hours=_FUNNEL_GAP_HOURS))


def q_event_gap_stats(sf_dir: str) -> Dataset:
    """Per-user inter-event-time stats: exact int64 microsecond gaps,
    mean from exact sums, discrete median
    (functions/funnel.py:event_gap_stats)."""
    from ..functions.funnel import event_gap_stats

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts"])
    return event_gap_stats(ev, "user_id", "ts", "event_id")


_INCR_CUTOFF = "2024-01-26"


def q_incremental_counts(sf_dir: str) -> Dataset:
    """Incremental aggregation: per-type counts over a 'snapshot'
    (events before the cutoff) merged with counts over the 'delta'
    (events after) by unioning partials and re-summing — the
    don't-recompute-the-world pattern of a 100-TB daily pipeline;
    certified exactly equal to the full recount."""
    from ..functions.agg import grouped_blockwise, partial_group_count

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])
    cutoff = pd.Timestamp(_INCR_CUTOFF)

    def before(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["ts"] < cutoff, ["event_type"]]

    def after(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["ts"] >= cutoff, ["event_type"]]

    snap = partial_group_count(
        ev.map_batches(before, batch_format="pandas"), "event_type",
        count_name="n")
    delta = partial_group_count(
        ev.map_batches(after, batch_format="pandas"), "event_type",
        count_name="n")

    def resum(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby("event_type", as_index=False)["n"].sum()
        out["n"] = out["n"].astype("int64")
        return out

    return grouped_blockwise(snap.union(delta), ["event_type"], resum)


def q_dedup_representatives(sf_dir: str) -> Dataset:
    """Canonical-document selection per near-dup cluster: MinHash-LSH
    pairs -> connected components -> join per-doc quality scores ->
    keep each cluster's best doc (quality desc, doc_id asc) — the
    final step of the dedup story (which survivor represents the
    cluster). Certified against the golden union-find cluster parquet
    joined with the SQL quality formula."""
    from ..functions.agg import group_top_k
    from ..functions.blocks import rename_cols, scrub_empty_blocks
    from ..stages import textstats
    from ..stages.dedup import dedup_clusters

    clusters = dedup_clusters(q_minhash_pairs(sf_dir))
    quality = textstats.quality_scores(_t(sf_dir, "documents"))
    j = scrub_empty_blocks(clusters).join(
        rename_cols(scrub_empty_blocks(quality), {"doc_id": "qd"}),
        join_type="inner", num_partitions=default_join_partitions(),
        on=("node_id",), right_on=("qd",))
    top = group_top_k(scrub_empty_blocks(j), "component_id",
                      sort_cols=["quality", "node_id"],
                      ascending=[False, True], k=1)
    return top.select_columns(["component_id", "node_id", "quality"])


def q_gif_frame_counts(sf_dir: str) -> Dataset:
    """REAL animated-GIF block-walk parsing over synthetic multi-frame
    payloads (stages/multimodal.py:parse_gif_frames) — width/height
    from the logical screen descriptor, frame count from image
    separators; the oracle replays the doc_id-derived formulas."""
    from ..stages.multimodal import (
        media_from_documents_gif,
        parse_gif_frame_counts,
    )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    return parse_gif_frame_counts(media_from_documents_gif(docs))


def q_gif_pixel_frames(sf_dir: str) -> Dataset:
    """REAL animated-GIF pixel decode with NO external codec: payloads
    are fully decodable GIF89a animations (real variable-width LZW
    data streams, global color table) built by
    stages/multimodal.py:encode_gif; gif_frame_stats walks the blocks,
    LZW-inflates every frame with the stdlib decoder
    (multimodal.py:decode_gif) and emits integer-exact per-frame mean
    luma. The golden computes the same integers straight from the
    frame formulas with no GIF bytes at all
    (oracle_sketch.golden_gif_frames) — agreement proves the LZW
    encode -> decode -> palette round trip lossless."""
    from ..stages.multimodal import (
        gif_frame_stats,
        media_from_documents_gif_valid,
    )

    media = media_from_documents_gif_valid(
        _t(sf_dir, "documents").limit(128))
    return gif_frame_stats(media)


def q_mjpeg_frame_stats(sf_dir: str) -> Dataset:
    """REAL VIDEO decode with NO external codec: payloads are complete
    MJPEG AVI files (real RIFF container, every frame an independent
    baseline-JPEG scan — stages/multimodal.py:encode_avi_mjpeg over
    stages/jpegcodec.py) and mjpeg_frame_stats walks the movi chunks,
    entropy-decodes + inverse-DCTs every frame and emits the pinned
    per-frame integer mean luma plus the container digest. The golden
    re-encodes AND re-decodes everything with independent scalar code
    (oracle_sketch.golden_mjpeg_frames) — digest certifies the
    encoders, stats the decoders. Inter-frame-predicted codecs remain
    the declared NotImplementedError boundary."""
    from ..stages.multimodal import (
        media_from_documents_avi_valid,
        mjpeg_frame_stats,
    )

    media = media_from_documents_avi_valid(
        _t(sf_dir, "documents").limit(128))
    return mjpeg_frame_stats(media)


def q_mode_event_type(sf_dir: str) -> Dataset:
    """Grouped mode: each user's most frequent event type (ties ->
    lexicographically smallest) — count shuffle then per-group top-1
    (functions/agg.py:partial_group_count + group_top_k)."""
    from ..functions.agg import group_top_k, partial_group_count

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    counts = partial_group_count(ev, ["user_id", "event_type"],
                                 count_name="n")
    return group_top_k(counts, "user_id", sort_cols=["n", "event_type"],
                       ascending=[False, True], k=1)


def q_transition_counts(sf_dir: str) -> Dataset:
    """First-order Markov transition counts over per-user event
    sequences (functions/funnel.py:transition_counts)."""
    from ..functions.funnel import transition_counts

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    return transition_counts(ev, "user_id", "ts", "event_type",
                             "event_id")


def q_retention_cohorts(sf_dir: str) -> Dataset:
    """Weekly retention-cohort matrix keyed on first signup week
    (functions/funnel.py:retention_cohorts)."""
    from ..functions.funnel import retention_cohorts

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    return retention_cohorts(ev, "user_id", "ts", "event_type",
                             "signup")


def q_kg_components(sf_dir: str) -> Dataset:
    """Connected components of the entity co-mention graph
    (stages/canonicalize.py:connected_components — bounded-round
    label propagation, min-id winner); certified against a golden
    union-find parquet built by an independent algorithm
    (oracle_sketch.py:golden_components)."""
    from ..functions.blocks import rename_cols
    from ..stages.canonicalize import connected_components
    from ..stages.graph import co_mention_edges

    edges = rename_cols(co_mention_edges(q_kg_triples(sf_dir)),
                        {"u": "src_id", "v": "dst_id"})
    return connected_components(edges)


def q_top_sources_per_lang(sf_dir: str) -> Dataset:
    """Two-level top-k: document counts per (lang, source), then the
    top-2 sources per lang by (count desc, source asc)
    (functions/agg.py:partial_group_count + group_top_k) — the
    aggregate-then-rank rollup pattern."""
    from ..functions.agg import group_top_k, partial_group_count

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "source"])
    counts = partial_group_count(docs, ["lang", "source"],
                                 count_name="n")
    return group_top_k(counts, "lang", sort_cols=["n", "source"],
                       ascending=[False, True], k=2)


def q_users_intersect(sf_dir: str) -> Dataset:
    """SQL INTERSECT: users with a big (>100) purchase AND a big view
    — two distinct projections joined on the key (the set-op surface
    next to the existing anti/semi joins)."""
    from ..functions.agg import distinct_rows
    from ..functions.blocks import rename_cols, scrub_empty_blocks
    from ..functions.joins import equi_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "value"])

    def big_of_type(t):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            keep = (b["event_type"] == t) & (b["value"] > 100.0)
            return b.loc[keep, ["user_id"]]
        return f

    a = distinct_rows(
        ev.map_batches(big_of_type("purchase"), batch_format="pandas"),
        ["user_id"])
    b = distinct_rows(
        ev.map_batches(big_of_type("view"), batch_format="pandas"),
        ["user_id"])
    j = equi_join(scrub_empty_blocks(a),
                  rename_cols(scrub_empty_blocks(b),
                              {"user_id": "u2"}),
                  "user_id", right_on="u2")
    return j.select_columns(["user_id"])


def q_users_except(sf_dir: str) -> Dataset:
    """SQL EXCEPT: signed-up users with no event over 350 — distinct
    projection anti-joined against the excluded key set
    (functions/joins.py:anti_join)."""
    from ..functions.agg import distinct_rows
    from ..functions.blocks import scrub_empty_blocks
    from ..functions.joins import anti_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "value"])

    def of_type(t):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            return b.loc[b["event_type"] == t, ["user_id"]]
        return f

    def hot(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["value"] > 350.0, ["user_id"]]

    a = distinct_rows(
        ev.map_batches(of_type("signup"), batch_format="pandas"),
        ["user_id"])
    b = distinct_rows(ev.map_batches(hot, batch_format="pandas"),
                      ["user_id"])
    return anti_join(scrub_empty_blocks(a), scrub_empty_blocks(b),
                     "user_id")


def q_expectation_checks(sf_dir: str) -> Dataset:
    """Data-quality expectation gate over events
    (functions/checks.py:expectation_violations): three vectorized
    rules evaluated in ONE streaming pass, emitting (event_id, rule)
    per violation — the pre-publish validation report of a 100-TB
    ingest. The oracle replays each rule as a UNION ALL branch."""
    from ..functions.checks import expectation_violations

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value",
                                  "user_id"])
    rules = {
        "value_range": lambda b: (b["value"] < 0) | (b["value"] > 400),
        "known_type": lambda b: ~b["event_type"].isin(
            ["view", "click", "purchase"]),
        "user_id_range": lambda b: b["user_id"] < 10,
    }
    return expectation_violations(ev, "event_id", rules)


def q_winsorize_events(sf_dir: str) -> Dataset:
    """Per-event-type winsorization of floor(value) at the 5th/95th
    discrete percentiles (functions/stats.py:winsorize_by_group) —
    exact integer order statistics, so clipped values match the SQL
    oracle exactly."""
    from ..functions.stats import winsorize_by_group

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def ints(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": b["event_id"],
            "event_type": b["event_type"],
            "x": np.floor(b["value"].to_numpy()).astype("int64"),
        })

    return winsorize_by_group(
        ev.map_batches(ints, batch_format="pandas"),
        "event_type", "event_id", "x", lo_q=0.05, hi_q=0.95)


def q_partitioned_roundtrip(sf_dir: str) -> Dataset:
    """Resumable-output pattern end-to-end: write documents
    hive-partitioned by lang to scratch, then read back ONLY the 'en'
    partition directory with column pruning — partition-pruned reads
    are how a restarted 100-TB job skips finished work. Fresh scratch
    dir per call; the partition value is re-attached as a constant
    column (hive layout stores it in the path, not the files)."""
    import tempfile

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])
    out_dir = tempfile.mkdtemp(prefix="kgr_part_")
    docs.write_parquet(out_dir, partition_cols=["lang"])
    back = rd.read_parquet(f"{out_dir}/lang=en",
                           columns=["doc_id", "n_chars"])

    def attach(t: "pa.Table") -> "pa.Table":
        return t.append_column(
            "lang", pa.array(["en"] * len(t), pa.string()))

    return back.map_batches(
        attach, batch_format="pyarrow").select_columns(
        ["doc_id", "lang", "n_chars"])


_ZSCORE_THRESHOLD = 3.0


def q_zscore_outliers(sf_dir: str) -> Dataset:
    """Per-event-type z-score outliers over floor(value)
    (functions/stats.py:grouped_zscore_outliers): exact int64 group
    moments + closed-form doubles, so emitted z values are
    bit-identical to the SQL oracle with no rounding."""
    from ..functions.stats import grouped_zscore_outliers

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def ints(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": b["event_id"],
            "event_type": b["event_type"],
            "x": np.floor(b["value"].to_numpy()).astype("int64"),
        })

    return grouped_zscore_outliers(
        ev.map_batches(ints, batch_format="pandas"),
        "event_type", "event_id", "x", threshold=_ZSCORE_THRESHOLD)


def q_union_by_name(sf_dir: str) -> Dataset:
    """Schema-drift union (functions/blocks.py:union_by_name): two
    document shards with different column sets union into the
    name-unified schema; missing cells become typed nulls, filled here
    so the comparison stays dtype-exact (int64, not NaN-float)."""
    import pyarrow as _pa

    from ..functions.blocks import union_by_name

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "source",
                                    "n_chars"])

    def even(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["doc_id"] % 2 == 0,
                     ["doc_id", "lang", "source"]]

    def odd(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["doc_id"] % 2 == 1,
                     ["doc_id", "lang", "n_chars"]]

    a = docs.map_batches(even, batch_format="pandas")
    c = docs.map_batches(odd, batch_format="pandas")
    u = union_by_name([a, c], schemas=[
        _pa.schema([("doc_id", _pa.int64()), ("lang", _pa.string()),
                    ("source", _pa.string())]),
        _pa.schema([("doc_id", _pa.int64()), ("lang", _pa.string()),
                    ("n_chars", _pa.int64())]),
    ])

    def fill(t: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        return t.set_column(
            t.schema.get_field_index("source"), "source",
            pc.fill_null(t["source"], ""),
        ).set_column(
            t.schema.get_field_index("n_chars"), "n_chars",
            pc.fill_null(t["n_chars"], -1),
        )

    return u.map_batches(fill, batch_format="pyarrow")


def q_audio_headers(sf_dir: str) -> Dataset:
    """REAL RIFF/WAVE header parsing over synthetic structurally-valid
    WAV payloads (stages/multimodal.py:parse_wav_header) — rate /
    channels / bit depth / frame count / duration from a byte-level
    chunk walk; the oracle replays the doc_id-derived parameter
    formulas in SQL."""
    from ..stages.multimodal import (
        media_from_documents_wav,
        parse_audio_headers,
    )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    return parse_audio_headers(media_from_documents_wav(docs))


def q_jpeg_features(sf_dir: str) -> Dataset:
    """REAL baseline-JPEG decode with NO external codec: synthetic
    payloads are fully decodable JFIF files (real Huffman scans,
    Annex-K tables, subsampling mode cycling 4:2:0 / 4:4:4 /
    grayscale) and the DecodeFeatures actor pool entropy-decodes,
    dequantizes and inverse-DCTs them with the in-repo all-integer
    codec (stages/jpegcodec.py), converts to pinned integer luma and
    emits 8 bucket means. The golden re-encodes AND re-decodes with an
    independent scalar implementation (quadruple-loop DCTs, bit-by-bit
    Huffman) — digest equality certifies the encoder contract, feature
    equality the decoder (oracle_sketch.golden_jpeg_features)."""
    from ..stages.multimodal import (
        decode_features,
        media_from_documents_jpeg_valid,
    )

    media = media_from_documents_jpeg_valid(
        _t(sf_dir, "documents").limit(128))
    feats = decode_features(media, engine="real")

    def flatten(t: pa.Table) -> pa.Table:
        import numpy as np

        cols = {
            "item_id": t["item_id"],
            "kind": t["kind"],
            "digest": t["digest"],
        }
        lists = t["feat"].to_pylist()
        mat = np.asarray(lists, dtype=np.float64).round(4)
        for j in range(mat.shape[1] if len(lists) else 8):
            cols[f"feat_{j}"] = pa.array(mat[:, j], pa.float64())
        return pa.table(cols)

    return feats.map_batches(flatten, batch_format="pyarrow")


def q_video_headers(sf_dir: str) -> Dataset:
    """REAL MP4/ISO-BMFF box walking over synthetic structurally-valid
    payloads (stages/multimodal.py:parse_mp4_header) — ftyp brand,
    mvhd timescale/duration (both the 32-bit v0 and 64-bit v1
    layouts), trak count; the oracle replays the doc_id-derived
    parameter formulas in SQL."""
    from ..stages.multimodal import (
        media_from_documents_mp4,
        parse_video_headers,
    )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    return parse_video_headers(media_from_documents_mp4(docs))


_BLOOM_ACCTBAL = 6000.0
_FUNNEL_STEPS = ("view", "click", "purchase")
_STRAT_FRACTIONS = {"en": 0.25}
_STRAT_DEFAULT = 0.75
_STRAT_SALT = "strat"


def q_bloom_join(sf_dir: str) -> Dataset:
    """Bloom-pruned probe-side join (functions/bloom.py:bloom_join):
    lineitem rows whose l_suppkey cannot match the high-balance
    supplier subset are dropped BEFORE the join shuffle by a broadcast
    10-bit/key Bloom filter; the exact hash join then removes the
    ~0.8% false positives, so results equal the plain join — the
    shuffle-traffic reducer a 100-TB probe side needs."""
    from ..functions.bloom import bloom_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber",
                                  "l_suppkey"])
    sup = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name",
                                               "s_acctbal"]
    ).filter(expr=f"s_acctbal > {_BLOOM_ACCTBAL}").drop_columns(
        ["s_acctbal"])
    out = bloom_join(li, sup, "l_suppkey", right_on="s_suppkey")
    return out.select_columns(["l_orderkey", "l_linenumber", "s_name"])


def q_funnel_stages(sf_dir: str) -> Dataset:
    """view -> click -> purchase funnel per user
    (functions/funnel.py:funnel_stages): furthest step reached, each
    step strictly after the first occurrence of the previous one."""
    from ..functions.funnel import funnel_stages

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    return funnel_stages(ev, "user_id", "ts", "event_type",
                         _FUNNEL_STEPS)


def q_stratified_sample(sf_dir: str) -> Dataset:
    """Per-language deterministic downsample of documents
    (functions/sampling.py:stratified_sample): 'en' kept at 25%,
    everything else at 75% — the corpus-rebalancing curation step,
    replayed exactly by the md5 CASE oracle."""
    from ..functions.sampling import stratified_sample

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet")
    return stratified_sample(docs, "lang", "doc_id", _STRAT_FRACTIONS,
                             default=_STRAT_DEFAULT, salt=_STRAT_SALT)


def q_percent_rank_events(sf_dir: str) -> Dataset:
    """percent_rank()/cume_dist() OVER (PARTITION BY user_id ORDER BY
    value) (functions/agg.py:group_percent_rank) — exact small-integer
    divisions, so doubles match DuckDB bit-for-bit."""
    from ..functions.agg import group_percent_rank

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "value"])
    out = group_percent_rank(ev, "user_id", "value")
    return out.select_columns(
        ["user_id", "event_id", "pct_rank", "cume_dist"])


_QUAL_VOCAB = ["located_in", "part_of", "has_part", "contains", "member_of"]
_QUAL_TRANSITIVE = frozenset(["located_in", "part_of", "has_part"])


def _qualifier_world(sf_dir: str) -> tuple[Dataset, Dataset]:
    """Deterministic flat statement/qualifier tables derived from the
    base parquet (the transcript corpus carries no statement
    qualifiers, so the rewrite's input model — reference
    ``WDStatement.qualifiers`` — is synthesized relationally):
    statements from orders, qualifiers from lineitem, keyed by
    orderkey so qualifier fan-out follows the natural FK skew."""
    vocab = pa.array(_QUAL_VOCAB, pa.string())

    def to_stmts(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].combine_chunks() if isinstance(
            t["o_orderkey"], pa.ChunkedArray) else t["o_orderkey"]
        k = ok.to_numpy(zero_copy_only=False)
        return pa.table({
            "stmt_id": ok,
            "subj": pc.binary_join_element_wise(
                pa.scalar("u"), pc.cast(t["o_custkey"], pa.string()), ""),
            "pred": pc.take(vocab, pa.array(k % 5)),
            "obj": pc.binary_join_element_wise(
                pa.scalar("c"), pc.cast(pa.array(k % 97), pa.string()), ""),
            "rank": pa.array(k % 3, pa.int64()),
        })

    def to_quals(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].combine_chunks() if isinstance(
            t["l_partkey"], pa.ChunkedArray) else t["l_partkey"]
        return pa.table({
            "stmt_id": t["l_orderkey"],
            "qpred": pc.take(
                vocab, pa.array(pk.to_numpy(zero_copy_only=False) % 5)),
            "qval": pc.binary_join_element_wise(
                pa.scalar("e"), pc.cast(t["l_suppkey"], pa.string()), ""),
        })

    stmts = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(to_stmts, batch_format="pyarrow")
    quals = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey"],
    ).map_batches(to_quals, batch_format="pyarrow")
    return stmts, quals


def q_fix_transitive_qualifier(sf_dir: str) -> Dataset:
    """Statement rewrite hoisting transitive self-qualifiers
    (stages/extract.py:fix_transitive_qualifiers; reference
    ``kgdata/wikidata/datasets/entities.py:263-286``): self-qualifiers
    (qualifier property == statement property) are stripped — each
    statement reports how many — and for the transitive predicate set
    each stripped value becomes a new first-class statement, deduped
    per (subj, pred, value) with the min source statement's rank."""
    from ..stages.extract import fix_transitive_qualifiers

    stmts, quals = _qualifier_world(sf_dir)
    return fix_transitive_qualifiers(stmts, quals, _QUAL_TRANSITIVE)


def queries() -> dict[str, Callable]:
    return {
        "filter_project": q_filter_project,
        "pricing_summary": q_pricing_summary,
        "join_orders_customers": q_join_orders_customers,
        "salted_join": q_salted_join,
        "broadcast_join": q_broadcast_join,
        "anti_join": q_anti_join,
        "semi_join": q_semi_join,
        "topk_orders": q_topk_orders,
        "group_topk": q_group_topk,
        "distinct_flag_status": q_distinct,
        "latest_event_per_user": q_latest_event_per_user,
        "event_type_counts": q_event_type_counts,
        "zero_fill_counts": q_zero_fill_counts,
        "union_names": q_union_names,
        "zip_with_index": q_zip_with_index,
        "fk_explode": q_fk_explode,
        "running_total": q_running_total,
        "events_sequence": q_events_sequence,
        "window_agg": q_window_agg,
        "sessionize": q_sessionize,
        "doc_mentions": q_doc_mentions,
        "doc_stats": q_doc_stats,
        "exact_dedup_docs": q_exact_dedup_docs,
        "quality_dedup": q_quality_dedup,
        "segment_dedup": q_segment_dedup,
        "fingerprint_docs": q_fingerprint_docs,
        "knn_bruteforce": q_knn,
        "knn_distributed": q_knn_distributed,
        "embedding_neardup_pairs": q_embedding_pairs,
        # rows-only
        "minhash_pairs": q_minhash_pairs,
        "minhash_clusters": q_minhash_clusters,
        "pii_scrub": q_pii_scrub,
        "repetition_stats": q_repetition_stats,
        "embedding_neardup_lsh": q_embedding_pairs_lsh,
        "simhash_pairs": q_simhash_pairs,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "lang_id": q_lang_id,
        "quality_scores": q_quality,
        "token_counts": q_token_counts,
        "keyword_extract": q_keyword_extract,
        "rolling_fingerprints": q_rolling_fp,
        "knn_ivf": q_knn_ivf,
        "media_features": q_media_features,
        "media_headers": q_media_headers,
        "kg_triples": q_kg_triples,
        "kg_triples_join": q_kg_triples_join,
        "kg_conversations": q_kg_conversations,
        "kg_conversations_salted": q_kg_conversations_salted,
        "kg_pred_type_dicts": q_kg_pred_type_dicts,
        "kg_mentions": q_kg_mentions,
        "kg_mentions_join": q_kg_mentions_join,
        "kg_alias_candidates": q_kg_alias_candidates,
        "kg_canonical_map": q_kg_canonical_map,
        "kg_canonical_map_driver": q_kg_canonical_map_driver,
        "propquery_filter": q_propquery_filter,
        "sql_values_roundtrip": q_sql_values_roundtrip,
        "asof_join": q_asof_join,
        "sliding_window": q_sliding_window,
        "interval_join": q_interval_join,
        "hash_sample": q_hash_sample,
        "shuffle_order": q_shuffle_order,
        "token_budget_select": q_token_budget_select,
        "corpus_curation": q_corpus_curation,
        "contamination": q_contamination,
        "fuzzy_contamination": q_fuzzy_contamination,
        "embedding_contamination": q_embedding_contamination,
        "rollup_doc_counts": q_rollup_doc_counts,
        "cube_doc_counts": q_cube_doc_counts,
        "row_number_events": q_row_number_events,
        "lag_lead_events": q_lag_lead_events,
        "ranked_events": q_ranked_events,
        "source_cap_docs": q_source_cap_docs,
        "kg_triangles": q_kg_triangles,
        "kg_kcore": q_kg_kcore,
        "kg_core_numbers": q_kg_core_numbers,
        "doc_corpus_freq": q_doc_corpus_freq,
        "label_centroids": q_label_centroids,
        "props_by_type": q_props_by_type,
        "chunk_documents": q_chunk_documents,
        "chunk_lang_consistency": q_chunk_lang_consistency,
        "bucketed_join": q_bucketed_join,
        "watermark_windows": q_watermark_windows,
        "value_histogram": q_value_histogram,
        "ndistinct_users": q_ndistinct_users,
        "word_counts": q_word_counts,
        "doc_top_terms": q_doc_top_terms,
        "melt_lineitem": q_melt_lineitem,
        "quantiles_global": q_quantiles_global,
        "quantiles_cont": q_quantiles_cont,
        "quantiles_by_type": q_quantiles_by_type,
        "quantiles_cont_by_type": q_quantiles_cont_by_type,
        "pivot_event_counts": q_pivot_event_counts,
        "corr_qty_price": q_corr_qty_price,
        "kg_triples_salted": q_kg_triples_salted,
        "kg_outlinks": q_kg_outlinks,
        "kg_entity_degrees": q_kg_entity_degrees,
        "kg_triples_bucketed": q_kg_triples_bucketed,
        "kg_types_degrees": q_kg_types_degrees,
        "kg_entity_aliases": q_kg_entity_aliases,
        "kg_meta_graph": q_kg_meta_graph,
        "kg_pagerank": q_kg_pagerank,
        "kg_pred_counts": q_kg_pred_counts,
        "kg_fact_history": q_kg_fact_history,
        "kg_fact_history_incremental": q_kg_fact_history_incremental,
        "kg_snapshot_at": q_kg_snapshot_at,
        "kg_entity_cards": q_kg_entity_cards,
        "kg_entity_distances": q_kg_entity_distances,
        "kg_ppr": q_kg_ppr,
        "kg_unlinkable": q_kg_unlinkable,
        "kg_raw_candidates": q_kg_raw_candidates,
        "kg_class_closure": q_kg_class_closure,
        "kg_all_types": q_kg_all_types,
        "kg_property_domains": q_kg_property_domains,
        "kg_property_ranges": q_kg_property_ranges,
        "kg_prop_connections": q_kg_prop_connections,
        "hll_ndistinct": q_hll_ndistinct,
        "heavy_hitters": q_heavy_hitters,
        "cms_token_counts": q_cms_token_counts,
        "kmeans_clusters": q_kmeans_clusters,
        "mmr_select": q_mmr_select,
        "semdedup": q_semdedup,
        "embedding_dbscan": q_embedding_dbscan,
        "bm25_topk": q_bm25_topk,
        "hybrid_rrf": q_hybrid_rrf,
        "bpe_merges": q_bpe_merges,
        "embedding_quantize": q_embedding_quantize,
        "knn_ivfpq": q_knn_ivfpq,
        "bpe_tokenize": q_bpe_tokenize,
        "incremental_dedup": q_incremental_dedup,
        "span_dedup": q_span_dedup,
        "quantile_sketch": q_quantile_sketch,
        "temperature_mix": q_temperature_mix,
        "pq_codes": q_pq_codes,
        "knn_ivf_distributed": q_knn_ivf_distributed,
        "ann_recall": q_ann_recall,
        "embedding_pca": q_embedding_pca,
        "dsir_scores": q_dsir_scores,
        "dsir_sample": q_dsir_sample,
        "linear_probe": q_linear_probe,
        "leakage_safe_split": q_leakage_safe_split,
        "contrastive_pairs": q_contrastive_pairs,
        "bloom_join": q_bloom_join,
        "funnel_stages": q_funnel_stages,
        "stratified_sample": q_stratified_sample,
        "percent_rank_events": q_percent_rank_events,
        "fix_transitive_qualifier": q_fix_transitive_qualifier,
        "edit_distance_pairs": q_edit_distance_pairs,
        "er_name_clusters": q_er_name_clusters,
        "jaccard_set_join": q_jaccard_set_join,
        "bigram_counts": q_bigram_counts,
        "kg_adamic_adar": q_kg_adamic_adar,
        "kg_random_walks": q_kg_random_walks,
        "kg_walk_pairs": q_kg_walk_pairs,
        "kg_pmi_pairs": q_kg_pmi_pairs,
        "zscore_outliers": q_zscore_outliers,
        "union_by_name": q_union_by_name,
        "audio_headers": q_audio_headers,
        "audio_features": q_audio_features,
        "image_features": q_image_features,
        "jpeg_features": q_jpeg_features,
        "video_headers": q_video_headers,
        "merge_upserts": q_merge_upserts,
        "kg_neighborhood_jaccard": q_kg_neighborhood_jaccard,
        "inverted_index": q_inverted_index,
        "expectation_checks": q_expectation_checks,
        "winsorize_events": q_winsorize_events,
        "partitioned_roundtrip": q_partitioned_roundtrip,
        "kg_components": q_kg_components,
        "top_sources_per_lang": q_top_sources_per_lang,
        "users_intersect": q_users_intersect,
        "users_except": q_users_except,
        "transition_counts": q_transition_counts,
        "retention_cohorts": q_retention_cohorts,
        "gif_frame_counts": q_gif_frame_counts,
        "gif_pixel_frames": q_gif_pixel_frames,
        "mjpeg_frame_stats": q_mjpeg_frame_stats,
        "mode_event_type": q_mode_event_type,
        "dedup_representatives": q_dedup_representatives,
        "funnel_windowed": q_funnel_windowed,
        "event_gap_stats": q_event_gap_stats,
        "incremental_counts": q_incremental_counts,
        "topk_orders_pushdown": q_topk_orders_pushdown,
        "sequence_packing": q_sequence_packing,
        "weighted_sample_orders": q_weighted_sample_orders,
        "train_val_test_split": q_train_val_test_split,
        "unigram_logprob": q_unigram_logprob,
        "unigram_logprob_join": q_unigram_logprob_join,
        "make_training_set": q_make_training_set,
    }


def oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    """DuckDB oracle SQL per query. ``sf_dir`` threads the scale into
    the golden-parquet families so ``check-oracles --sf-dir`` compares
    against goldens built at the SAME scale (round-3 ADVICE); the
    driver calls this with no argument and gets its pinned sf0.01."""
    from ..synth import sf_from_dir

    _sf = sf_from_dir(sf_dir)
    return {
        "filter_project": """
            SELECT l_orderkey, l_linenumber,
                   l_extendedprice * (1 - l_discount) AS revenue
            FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-06-01'
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "join_orders_customers": """
            SELECT o.o_orderkey, c.c_name, n.n_name
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
        """,
        "salted_join": """
            SELECT l.l_orderkey, l.l_linenumber, s.s_name
            FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        """,
        "broadcast_join": """
            SELECT l.l_orderkey, l.l_linenumber, p.p_brand
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        """,
        "anti_join": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000.0)
        """,
        "semi_join": """
            SELECT c_custkey, c_name FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000.0)
        """,
        "topk_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
        """,
        "group_topk": """
            SELECT o_custkey, o_orderkey FROM (
                SELECT o_custkey, o_orderkey,
                       row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders
            ) WHERE rn <= 2
        """,
        "distinct_flag_status": """
            SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        """,
        "latest_event_per_user": """
            SELECT user_id, event_id, event_type FROM (
                SELECT user_id, event_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id ASC) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "event_type_counts": """
            SELECT event_type, count(*) AS n FROM events GROUP BY event_type
        """,
        "zero_fill_counts": """
            SELECT n.n_name, count(c.c_nationkey) AS n
            FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "union_names": """
            SELECT s_name AS name FROM supplier
            UNION ALL SELECT c_name AS name FROM customer
        """,
        "zip_with_index": """
            SELECT o_orderkey,
                   row_number() OVER (ORDER BY o_totalprice, o_orderkey) - 1 AS idx
            FROM orders
        """,
        "fk_explode": """
            SELECT o_custkey AS c_custkey, o_orderkey AS fk, o_totalprice
            FROM orders
        """,
        "running_total": """
            SELECT user_id, event_id,
                   round(sum(value) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING), 2)
                       AS running_value
            FROM events
        """,
        "events_sequence": """
            SELECT user_id,
                   string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
            FROM events GROUP BY user_id
        """,
        "window_agg": """
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        """,
        "sessionize": """
            WITH d AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS brk
                FROM events
            ), s AS (
                SELECT user_id,
                       -- BIGINT cast: DuckDB's windowed sum(INTEGER) is
                       -- HUGEINT, which breaks the driver's dtype-strict
                       -- value hash against the engine's int64
                       CAST(sum(brk) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
                FROM d
            )
            SELECT user_id, session_id, count(*) AS n_events
            FROM s GROUP BY user_id, session_id
        """,
        "doc_mentions": """
            SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]{6,}')) AS mention
            FROM documents
        """,
        "doc_stats": """
            SELECT doc_id,
                   length(text) AS n_chars,
                   array_length(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
                   length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct
            FROM documents
        """,
        "exact_dedup_docs": """
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        "quality_dedup": r"""
            WITH s AS (
                SELECT doc_id,
                       CAST(length(text) AS DOUBLE) AS n_chars,
                       greatest(CAST(length(regexp_extract_all(text, '\S+'))
                           AS DOUBLE), 1.0) AS n_tokens,
                       CAST(length(regexp_extract_all(text, '[.,;:!?]'))
                           AS DOUBLE) AS n_punct,
                       substr(trim(regexp_replace(lower(text),
                           '\s+', ' ', 'g')), 1, 40) AS bucket
                FROM documents
            ), q AS (
                SELECT doc_id, bucket,
                       round(
                           0.4 * least(n_chars / 500.0, 1.0)
                         + 0.3 * (1.0 - abs(least(n_punct / n_tokens, 1.0)
                               - 0.2))
                         + 0.3 * (1.0 - least(abs(((n_chars - n_tokens + 1.0)
                               / n_tokens) - 5.5) / 5.5, 1.0)),
                       6) AS quality
                FROM s
            )
            SELECT doc_id, quality FROM (
                SELECT doc_id, quality, row_number() OVER (
                    PARTITION BY bucket
                    ORDER BY quality DESC, doc_id ASC) AS rn
                FROM q) WHERE rn = 1
        """,
        "incremental_dedup": """
            WITH oldc AS (
                SELECT text FROM documents WHERE doc_id % 5 < 2
            ), newc AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 100000 AS doc_id, text
                FROM documents WHERE doc_id % 7 = 0
            ), fresh AS (
                SELECT doc_id, text FROM newc
                WHERE text NOT IN (SELECT text FROM oldc)
            ), win AS (
                SELECT min(doc_id) AS doc_id FROM fresh GROUP BY text
            )
            SELECT n.doc_id, n.text FROM newc n JOIN win USING (doc_id)
        """,
        "fingerprint_docs": """
            SELECT doc_id, md5(text) AS fingerprint FROM documents
        """,
        "temperature_mix": """
            WITH src AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                         FROM documents GROUP BY source),
            tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM src),
            z AS (SELECT floor(sum(sqrt(CAST(n AS DOUBLE)))
                               * 1000000.0 + 0.5) AS zq FROM src),
            cuts AS (
                SELECT s.source,
                       floor(LEAST(1.0,
                             0.5 * t.total * sqrt(CAST(s.n AS DOUBLE))
                             / (z.zq / 1000000.0) / s.n)
                             * 1000000.0 + 0.5) AS q
                FROM src s, tot t, z
            )
            SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
            FROM documents d JOIN cuts c USING (source)
            WHERE c.q >= 1000000
               OR substr(md5('mix' || CAST(d.doc_id AS VARCHAR)), 1, 8)
                  < lower(lpad(to_hex(CAST(floor(c.q / 1000000.0
                        * 4294967296.0) AS BIGINT)), 8, '0'))
        """,
        "quantile_sketch": """
            WITH binned AS (
                SELECT l_returnflag AS g,
                       CAST(LEAST(GREATEST(floor(
                            (l_extendedprice - 0.0) / (110000.0 / 512)),
                            0), 511) AS BIGINT) AS b
                FROM lineitem
            ),
            counts AS (SELECT g, b, CAST(count(*) AS BIGINT) AS c
                       FROM binned GROUP BY g, b),
            cum AS (
                SELECT g, b, c,
                       CAST(sum(c) OVER (PARTITION BY g ORDER BY b)
                            AS BIGINT) AS cum,
                       CAST(sum(c) OVER (PARTITION BY g)
                            AS BIGINT) AS n
                FROM counts
            ),
            qs(q) AS (VALUES (0.5), (0.9), (0.99)),
            hit AS (
                SELECT g, q, min(b) AS bstar
                FROM cum, qs WHERE cum >= q * n GROUP BY g, q
            )
            SELECT h.g AS l_returnflag, h.q AS q,
                   round(0.0 + (110000.0 / 512)
                         * (h.bstar
                            + (h.q * c2.n - (c2.cum - c2.c)) / c2.c),
                         6) AS est
            FROM hit h JOIN cum c2 ON c2.g = h.g AND c2.b = h.bstar
        """,
        "span_dedup": """
            WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
                           FROM documents),
            wins AS (
                SELECT doc_id, i AS p,
                       array_to_string(w[i : i+2], ' ') AS win
                FROM words, LATERAL unnest(generate_series(
                     1, len(w) - 2)) AS g(i)
            ),
            marked AS (
                SELECT doc_id, p,
                       min(doc_id * 1048576 + p)
                           OVER (PARTITION BY win) AS win_key
                FROM wins
            ),
            dups AS (SELECT doc_id, p FROM marked
                     WHERE doc_id * 1048576 + p <> win_key),
            covered AS (
                SELECT DISTINCT doc_id, p + j AS pos
                FROM dups, LATERAL unnest(generate_series(0, 2)) AS h(j)
            ),
            positions AS (
                SELECT t.doc_id, i AS pos, t.w[i] AS word,
                       len(t.w) AS n_words
                FROM words t, LATERAL unnest(generate_series(
                     1, len(t.w))) AS g(i)
            ),
            kept AS (
                SELECT p.* FROM positions p
                LEFT JOIN covered c
                  ON c.doc_id = p.doc_id AND c.pos = p.pos
                WHERE c.doc_id IS NULL
            )
            SELECT doc_id,
                   string_agg(word, ' ' ORDER BY pos) AS clean_text,
                   CAST(count(*) AS BIGINT) AS n_kept,
                   CAST(any_value(n_words) AS BIGINT) AS n_words
            FROM kept GROUP BY doc_id
        """,
        "segment_dedup": """
            WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
                           FROM documents),
            segs AS (
                SELECT doc_id, i AS seg_idx,
                       array_to_string(w[(i-1)*3+1 : i*3], ' ') AS seg
                FROM words, LATERAL unnest(generate_series(
                     1, CAST(ceil(len(w) / 3.0) AS BIGINT))) AS g(i)
            ),
            winners AS (
                SELECT seg, min(doc_id * 1048576 + seg_idx) AS win_key
                FROM segs GROUP BY seg
            ),
            kept AS (
                SELECT CAST(win_key // 1048576 AS BIGINT) AS doc_id,
                       CAST(win_key % 1048576 AS BIGINT) AS seg_idx, seg
                FROM winners
            ),
            totals AS (SELECT doc_id, count(*) AS n_total
                       FROM segs GROUP BY doc_id)
            SELECT k.doc_id,
                   string_agg(k.seg, ' ' ORDER BY k.seg_idx)
                       AS clean_text,
                   CAST(count(*) AS BIGINT) AS n_kept,
                   CAST(any_value(t.n_total) AS BIGINT) AS n_total
            FROM kept k JOIN totals t USING (doc_id)
            GROUP BY k.doc_id
        """,
        "knn_bruteforce": """
            WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
            sims AS (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       round(list_cosine_similarity(q.embedding, e.embedding), 6) AS cos
                FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.vec_id
            ), ranked AS (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY cos DESC, neighbor_id ASC) AS rank
                FROM sims
            )
            SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 5
        """,
        "knn_distributed": """
            WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 32),
            sims AS (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       round(list_cosine_similarity(q.embedding, e.embedding), 6) AS cos
                FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.vec_id
            ), ranked AS (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY cos DESC, neighbor_id ASC) AS rank
                FROM sims
            )
            SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 5
        """,
        "embedding_neardup_pairs": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.embedding, b.embedding), 6) >= 0.4
        """,
        "quality_scores": """
            WITH s AS (
                SELECT doc_id,
                       CAST(length(text) AS DOUBLE) AS n_chars,
                       greatest(CAST(length(regexp_extract_all(text, '\\S+'))
                           AS DOUBLE), 1.0) AS n_tokens,
                       CAST(length(regexp_extract_all(text, '[.,;:!?]'))
                           AS DOUBLE) AS n_punct
                FROM documents
            )
            SELECT doc_id,
                   round(
                       0.4 * least(n_chars / 500.0, 1.0)
                     + 0.3 * (1.0 - abs(least(n_punct / n_tokens, 1.0) - 0.2))
                     + 0.3 * (1.0 - least(abs(((n_chars - n_tokens + 1.0)
                           / n_tokens) - 5.5) / 5.5, 1.0)),
                   6) AS quality
            FROM s
        """,
        "lang_id": _lang_id_sql(),
        "chunk_lang_consistency": _chunk_lang_sql(),
        "propquery_filter": """
            SELECT * FROM documents
            WHERE lang = 'en' AND text LIKE '%the%'
        """,
        "token_counts": _token_counts_sql(),
        "asof_join": """
            SELECT l.event_id, l.user_id, l.ts, l.value,
                   r.value AS prior_value,
                   r.event_type AS prior_event_type,
                   r.ts AS prior_ts
            FROM (SELECT * FROM events WHERE event_type = 'purchase') l
            ASOF LEFT JOIN
                 (SELECT * FROM events WHERE event_type <> 'purchase') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "sliding_window": """
            SELECT user_id, event_id, ts,
                   CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS w_sum
            FROM events
        """,
        "interval_join": """
            SELECT e.user_id, e.event_id, e.ts,
                   p.iv_id, p.start_ts, p.end_ts
            FROM (SELECT user_id, event_id, ts FROM events
                  WHERE event_type <> 'purchase') e
            JOIN (SELECT user_id, event_id AS iv_id, ts AS start_ts,
                         ts + INTERVAL 2 HOUR AS end_ts
                  FROM events WHERE event_type = 'purchase') p
              ON e.user_id = p.user_id
             AND e.ts >= p.start_ts AND e.ts <= p.end_ts
        """,
        "hash_sample": f"""
            SELECT * FROM orders
            WHERE substr(md5('{_SAMPLE_SALT}' ||
                    CAST(o_orderkey AS VARCHAR)), 1, 8) < '{_SAMPLE_CUT}'
        """,
        "shuffle_order": """
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY md5('epoch0' || CAST(doc_id AS VARCHAR)),
                                doc_id) - 1 AS BIGINT) AS shuffle_pos
            FROM documents
        """,
        "token_budget_select": _token_budget_sql(),
        "contamination": f"""
            WITH words AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text),
                           '[^a-z0-9]+'), x -> x <> '') AS w
                FROM documents
            ), grams AS (
                SELECT doc_id,
                       array_to_string(w[i:i+{_CONTAM_N - 1}], ' ') AS g
                FROM words, LATERAL (SELECT unnest(generate_series(1,
                    greatest(len(w)-{_CONTAM_N}+1, 0))) AS i) t
            ), probe AS (
                SELECT DISTINCT g FROM grams
                WHERE doc_id % {_CONTAM_MOD} = 3
            )
            SELECT DISTINCT doc_id FROM grams
            WHERE doc_id % {_CONTAM_MOD} <> 3
              AND g IN (SELECT g FROM probe)
        """,
        "rollup_doc_counts": """
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY ROLLUP(lang, source)
        """,
        "cube_doc_counts": """
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY CUBE(lang, source)
        """,
        "row_number_events": """
            SELECT user_id, event_id,
                   CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS BIGINT) AS rn
            FROM events
        """,
        "lag_lead_events": """
            SELECT user_id, event_id,
                   COALESCE(lag(value) OVER w, -1.0) AS lag_value,
                   COALESCE(lead(value) OVER w, -1.0) AS lead_value
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "ranked_events": """
            SELECT user_id, event_id,
                   CAST(rank() OVER v AS BIGINT) AS rnk,
                   CAST(dense_rank() OVER v AS BIGINT) AS dense_rnk,
                   CAST(ntile(4) OVER t AS BIGINT) AS tile
            FROM events
            WINDOW v AS (PARTITION BY user_id ORDER BY value DESC),
                   t AS (PARTITION BY user_id
                         ORDER BY value DESC, event_id)
        """,
        "source_cap_docs": f"""
            SELECT doc_id, lang, source FROM documents
            QUALIFY row_number() OVER (
                PARTITION BY lang, source
                ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8),
                         doc_id
            ) <= {_CAP_PER_SOURCE}
        """,
        "doc_corpus_freq": """
            WITH words AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text),
                              '[^a-z0-9]+')) AS term
                FROM documents
            ), w AS (
                SELECT doc_id, term FROM words WHERE term <> ''
            ), cnt AS (
                SELECT term, CAST(COUNT(*) AS BIGINT) AS c
                FROM w GROUP BY term
            )
            SELECT w.doc_id,
                   CAST(SUM(c) AS BIGINT) AS freq_sum,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens
            FROM w JOIN cnt USING (term)
            GROUP BY w.doc_id
        """,
        "bucketed_join": """
            SELECT o_orderkey, c_name
            FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        "watermark_windows": """
            WITH e AS (
                SELECT user_id, ts, value,
                       substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
                           || '-' || lpad(CAST(event_id AS VARCHAR),
                                          12, '0') AS arr
                FROM events
            ), w AS (
                SELECT user_id, ts, value,
                       MAX(ts) OVER (
                           PARTITION BY user_id ORDER BY arr
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS wm
                FROM e
            )
            SELECT user_id,
                   date_trunc('day', ts) AS window_start,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT))
                        AS BIGINT) AS sum_cents
            FROM w
            WHERE wm IS NULL OR ts >= wm - INTERVAL 14 DAY
            GROUP BY user_id, date_trunc('day', ts)
        """,
        "chunk_documents": f"""
            WITH words AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(text, '\\s+'),
                                   x -> x <> '') AS w
                FROM documents
            )
            SELECT doc_id,
                   CAST(i AS BIGINT) AS chunk_idx,
                   array_to_string(
                       w[i * {_CHUNK_STRIDE} + 1 :
                         i * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}],
                       ' ') AS chunk_text,
                   CAST(least({_CHUNK_TOKENS},
                              len(w) - i * {_CHUNK_STRIDE}) AS BIGINT)
                       AS n_tokens
            FROM words,
                 LATERAL (SELECT unnest(generate_series(0,
                     CAST(ceil(CAST(len(w) AS DOUBLE)
                               / {_CHUNK_STRIDE}) AS BIGINT) - 1))
                     AS i) t
            WHERE len(w) > 0
        """,
        "props_by_type": """
            SELECT event_type,
                   CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT)
                       AS sum_k,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY event_type
        """,
        "label_centroids": f"""
            SELECT label, CAST(i AS BIGINT) AS pos,
                   CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                        * {_CENTROID_SCALE}) AS BIGINT)) AS BIGINT)
                       AS sum_fx,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM embeddings,
                 LATERAL (SELECT unnest(generate_series(1,
                     len(embedding))) AS i) t
            GROUP BY label, i
        """,
        "corpus_curation": f"""
            WITH s AS (
                SELECT doc_id, text,
                       CAST(length(text) AS DOUBLE) AS n_chars,
                       greatest(CAST(length(regexp_extract_all(text, '\\S+'))
                           AS DOUBLE), 1.0) AS n_tokens,
                       CAST(length(regexp_extract_all(text, '[.,;:!?]'))
                           AS DOUBLE) AS n_punct
                FROM documents
            ), scored AS (
                SELECT doc_id, text,
                       round(
                           0.4 * least(n_chars / 500.0, 1.0)
                         + 0.3 * (1.0 - abs(least(n_punct / n_tokens, 1.0)
                               - 0.2))
                         + 0.3 * (1.0 - least(abs(((n_chars - n_tokens + 1.0)
                               / n_tokens) - 5.5) / 5.5, 1.0)),
                       6) AS quality
                FROM s
            ), kept AS (
                SELECT doc_id, text FROM scored
                WHERE quality >= {_CURATION_QUALITY}
            ), reps AS (
                SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
                FROM kept GROUP BY text
            )
            SELECT doc_id FROM reps
            WHERE substr(md5('{_CURATION_SALT}' ||
                    CAST(doc_id AS VARCHAR)), 1, 8) < '{_CURATION_CUT}'
        """,
        "value_histogram": f"""
            SELECT bin, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT CAST(LEAST(GREATEST(FLOOR(
                      (value - {_HIST_LO}) /
                      {(_HIST_HI - _HIST_LO) / _HIST_BINS}), 0),
                      {_HIST_BINS - 1}) AS BIGINT) AS bin
                  FROM events)
            GROUP BY bin
        """,
        "ndistinct_users": """
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
            FROM events GROUP BY event_type
        """,
        "keyword_extract": """
            WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents
            ),
            tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM toks WHERE term <> '' GROUP BY 1, 2
            ),
            idf AS (
                SELECT term, count(DISTINCT doc_id) AS df
                FROM toks WHERE term <> '' GROUP BY 1
            ),
            n AS (SELECT count(*) AS n FROM documents),
            s AS (
                SELECT t.doc_id, t.term,
                       CAST(floor(t.tf * ln(CAST(n.n AS DOUBLE) / d.df)
                           * 1e6 + 0.5e0) AS BIGINT) AS tfidf_micro
                FROM tf t JOIN idf d USING (term) CROSS JOIN n
            )
            SELECT doc_id, term, tfidf_micro,
                   CAST(row_number() OVER (PARTITION BY doc_id
                       ORDER BY tfidf_micro DESC, term) - 1
                       AS BIGINT) AS rank
            FROM s QUALIFY rank < 5
        """,
        "word_counts": """
            SELECT term, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT unnest(regexp_split_to_array(lower(text),
                                 '[^a-z0-9]+')) AS term
                  FROM documents)
            WHERE term <> ''
            GROUP BY term
            ORDER BY n DESC, term
            LIMIT 200
        """,
        "doc_top_terms": """
            WITH toks AS (
                SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
                FROM (SELECT doc_id,
                             unnest(regexp_split_to_array(lower(text),
                                    '[^a-z0-9]+')) AS term
                      FROM documents)
                WHERE term <> ''
                GROUP BY doc_id, term
            ), dfreq AS (
                SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                FROM toks GROUP BY term
            ), ranked AS (
                SELECT doc_id, term, tf,
                       row_number() OVER (PARTITION BY doc_id
                           ORDER BY tf DESC, term) AS rk
                FROM toks
            )
            SELECT r.doc_id, r.term, r.tf, d.df
            FROM ranked r JOIN dfreq d USING (term)
            WHERE r.rk <= 3
        """,
        "melt_lineitem": """
            SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
                   l_quantity AS value FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
            FROM lineitem
        """,
        "quantiles_global": " UNION ALL ".join(
            f"SELECT CAST({q} AS DOUBLE) AS q, "
            f"quantile_disc(value, {q}) AS value FROM events"
            for q in _QUANTILES
        ),
        "quantiles_cont": " UNION ALL ".join(
            f"SELECT CAST({q} AS DOUBLE) AS q, "
            f"ROUND(quantile_cont(value, {q}), 6) AS value FROM events"
            for q in _QUANTILES
        ),
        "quantiles_by_type": " UNION ALL ".join(
            f"SELECT event_type, CAST({q} AS DOUBLE) AS q, "
            f"quantile_disc(value, {q}) AS value "
            f"FROM events GROUP BY event_type"
            for q in _GROUP_QUANTILES
        ),
        "quantiles_cont_by_type": " UNION ALL ".join(
            f"SELECT event_type, CAST({q} AS DOUBLE) AS q, "
            f"ROUND(quantile_cont(value, {q}), 6) AS value "
            f"FROM events GROUP BY event_type"
            for q in _GROUP_QUANTILES
        ),
        "pivot_event_counts": "SELECT user_id, " + ", ".join(
            f"CAST(SUM(CASE WHEN event_type = '{c}' THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS {c}"
            for c in _EVENT_TYPES
        ) + " FROM events GROUP BY user_id",
        "corr_qty_price": """
            SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
                   ROUND((n*sxy - sx*sy) /
                         (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)),
                         6) AS corr,
                   ROUND((sxy - sx*sy/n) / (n - 1), 6) AS covar
            FROM (
                SELECT l_returnflag,
                       CAST(COUNT(*) AS DOUBLE) AS n,
                       CAST(SUM(x) AS DOUBLE) AS sx,
                       CAST(SUM(y) AS DOUBLE) AS sy,
                       CAST(SUM(x*x) AS DOUBLE) AS sxx,
                       CAST(SUM(y*y) AS DOUBLE) AS syy,
                       CAST(SUM(x*y) AS DOUBLE) AS sxy
                FROM (SELECT l_returnflag,
                             CAST(FLOOR(l_extendedprice) AS BIGINT) AS x,
                             CAST(l_quantity AS BIGINT) AS y
                      FROM lineitem)
                GROUP BY l_returnflag)
        """,
        "sql_values_roundtrip": r"""
            SELECT n_nationkey, n_name, n_regionkey,
                   CASE WHEN n_nationkey % 3 = 0 THEN NULL
                        ELSE 'it''s #' || n_nationkey || ' (a\b),' END
                       AS n_comment
            FROM nation
        """,
        "media_headers": """
            SELECT doc_id AS item_id, 'png' AS format,
                   CAST(16 + doc_id % 512 AS INTEGER) AS width,
                   CAST(16 + (doc_id * 7) % 512 AS INTEGER) AS height
            FROM documents
        """,
        "heavy_hitters": """
            WITH tk AS (
                SELECT term
                FROM (SELECT unnest(regexp_split_to_array(lower(text),
                             '[^a-z0-9]+')) AS term
                      FROM documents)
                WHERE term <> ''
            ), tot AS (SELECT COUNT(*) AS t FROM tk)
            SELECT term, CAST(COUNT(*) AS BIGINT) AS n
            FROM tk, tot
            GROUP BY term, tot.t
            HAVING COUNT(*) * 200 > tot.t
            ORDER BY n DESC, term
        """,
        "bloom_join": f"""
            SELECT l.l_orderkey, l.l_linenumber, s.s_name
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            WHERE s.s_acctbal > {_BLOOM_ACCTBAL}
        """,
        "funnel_stages": f"""
            WITH u AS (SELECT DISTINCT user_id FROM events),
            s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                   WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t2
                   FROM events e JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = '{_FUNNEL_STEPS[1]}'
                     AND e.ts > s1.t1 GROUP BY 1),
            s3 AS (SELECT e.user_id, min(e.ts) AS t3
                   FROM events e JOIN s2 ON e.user_id = s2.user_id
                   WHERE e.event_type = '{_FUNNEL_STEPS[2]}'
                     AND e.ts > s2.t2 GROUP BY 1)
            SELECT u.user_id,
                   CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                             WHEN s2.user_id IS NOT NULL THEN 2
                             WHEN s1.user_id IS NOT NULL THEN 1
                             ELSE 0 END AS BIGINT) AS funnel_stage
            FROM u
            LEFT JOIN s1 ON u.user_id = s1.user_id
            LEFT JOIN s2 ON u.user_id = s2.user_id
            LEFT JOIN s3 ON u.user_id = s3.user_id
        """,
        "stratified_sample": f"""
            SELECT * FROM documents
            WHERE substr(md5('{_STRAT_SALT}' ||
                      CAST(doc_id AS VARCHAR)), 1, 8) <
                  CASE lang WHEN 'en'
                       THEN '{_hash_threshold(_STRAT_FRACTIONS["en"])}'
                       ELSE '{_hash_threshold(_STRAT_DEFAULT)}' END
        """,
        "percent_rank_events": """
            SELECT user_id, event_id,
                   percent_rank() OVER (PARTITION BY user_id
                       ORDER BY value) AS pct_rank,
                   cume_dist() OVER (PARTITION BY user_id
                       ORDER BY value) AS cume_dist
            FROM events
        """,
        "fix_transitive_qualifier": """
            WITH v(i, p) AS (VALUES
                (0, 'located_in'), (1, 'part_of'), (2, 'has_part'),
                (3, 'contains'), (4, 'member_of')),
            stmts AS (
                SELECT o_orderkey AS stmt_id,
                       'u' || CAST(o_custkey AS VARCHAR) AS subj,
                       v.p AS pred,
                       'c' || CAST(o_orderkey % 97 AS VARCHAR) AS obj,
                       CAST(o_orderkey % 3 AS BIGINT) AS rank
                FROM orders JOIN v ON v.i = o_orderkey % 5),
            quals AS (
                SELECT l_orderkey AS stmt_id, v.p AS qpred,
                       'e' || CAST(l_suppkey AS VARCHAR) AS qval
                FROM lineitem JOIN v ON v.i = l_partkey % 5),
            self_q AS (
                SELECT q.stmt_id, s.subj, s.pred, q.qval
                FROM quals q JOIN stmts s USING (stmt_id)
                WHERE q.qpred = s.pred),
            n_self AS (
                SELECT stmt_id, CAST(count(*) AS BIGINT) AS n
                FROM self_q GROUP BY stmt_id),
            hoist AS (
                SELECT subj, pred, qval AS obj, MIN(stmt_id) AS src
                FROM self_q
                WHERE pred IN ('located_in', 'part_of', 'has_part')
                GROUP BY subj, pred, qval)
            SELECT s.stmt_id, s.subj, s.pred, s.obj, s.rank,
                   COALESCE(n.n, 0) AS n_self_quals
            FROM stmts s LEFT JOIN n_self n USING (stmt_id)
            UNION ALL
            SELECT -src AS stmt_id, subj, pred, obj,
                   CAST(src % 3 AS BIGINT) AS rank,
                   CAST(0 AS BIGINT) AS n_self_quals
            FROM hoist
        """,
        "edit_distance_pairs": """
            WITH names AS (SELECT DISTINCT p_name FROM part)
            SELECT a.p_name AS name_a, b.p_name AS name_b,
                   CAST(levenshtein(a.p_name, b.p_name) AS BIGINT)
                       AS dist
            FROM names a JOIN names b ON a.p_name < b.p_name
            WHERE levenshtein(a.p_name, b.p_name) <= 2
        """,
        "bigram_counts": """
            WITH words AS (SELECT string_split(text, ' ') AS w
                           FROM documents)
            SELECT w[i] AS w1, w[i + 1] AS w2,
                   CAST(count(*) AS BIGINT) AS n
            FROM words, LATERAL unnest(generate_series(
                 1, len(w) - 1)) AS g(i)
            GROUP BY 1, 2
        """,
        "jaccard_set_join": """
            WITH s AS (
                SELECT p_name,
                       list_sort(list_distinct(string_split(p_name, ' ')))
                           AS toks
                FROM (SELECT DISTINCT p_name FROM part)
            )
            SELECT a.p_name AS name_a, b.p_name AS name_b,
                   round(CAST(len(list_intersect(a.toks, b.toks))
                         AS DOUBLE)
                         / (len(a.toks) + len(b.toks)
                            - len(list_intersect(a.toks, b.toks))),
                         6) AS jaccard
            FROM s a JOIN s b ON a.p_name < b.p_name
            WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                  / (len(a.toks) + len(b.toks)
                     - len(list_intersect(a.toks, b.toks))) >= 0.3
        """,
        "er_name_clusters": """
            WITH RECURSIVE names AS (SELECT DISTINCT p_name FROM part),
            pairs AS (
                SELECT a.p_name AS u, b.p_name AS v
                FROM names a JOIN names b ON a.p_name < b.p_name
                WHERE levenshtein(a.p_name, b.p_name) <= 2
            ),
            edges AS (SELECT u, v FROM pairs
                      UNION ALL SELECT v, u FROM pairs),
            reach AS (
                SELECT u AS node, u AS r
                FROM (SELECT DISTINCT u FROM edges)
                UNION
                SELECT re.node, e.v
                FROM reach re JOIN edges e ON e.u = re.r
            )
            SELECT node AS node_id, min(r) AS component_id
            FROM reach GROUP BY node
        """,
        "zscore_outliers": f"""
            WITH x AS (SELECT event_id, event_type,
                              CAST(floor(value) AS BIGINT) AS x
                       FROM events),
            s AS (SELECT event_type, count(*) AS n,
                         CAST(sum(x) AS BIGINT) AS s1,
                         CAST(sum(x * x) AS BIGINT) AS s2
                  FROM x GROUP BY 1)
            SELECT x.event_id, x.event_type, x.x,
                   (CAST(x.x AS DOUBLE) - CAST(s.s1 AS DOUBLE) / s.n)
                   / sqrt((CAST(s.s2 AS DOUBLE)
                           - CAST(s.s1 AS DOUBLE) * s.s1 / s.n)
                          / (s.n - 1)) AS z
            FROM x JOIN s USING (event_type)
            WHERE abs((CAST(x.x AS DOUBLE)
                       - CAST(s.s1 AS DOUBLE) / s.n)
                   / sqrt((CAST(s.s2 AS DOUBLE)
                           - CAST(s.s1 AS DOUBLE) * s.s1 / s.n)
                          / (s.n - 1))) > {_ZSCORE_THRESHOLD}
        """,
        "union_by_name": """
            SELECT doc_id, lang, COALESCE(source, '') AS source,
                   COALESCE(n_chars, -1) AS n_chars
            FROM (
                SELECT doc_id, lang, source FROM documents
                WHERE doc_id % 2 = 0
                UNION ALL BY NAME
                SELECT doc_id, lang, n_chars FROM documents
                WHERE doc_id % 2 = 1
            )
        """,
        "topk_orders_pushdown": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
        """,
        "make_training_set": _make_training_set_sql(),
        "unigram_logprob_join": """
            WITH tk AS (
                SELECT doc_id, term FROM (
                    SELECT doc_id,
                           unnest(regexp_split_to_array(lower(text),
                               '[^a-z0-9]+')) AS term
                    FROM documents)
                WHERE term <> ''
            ),
            c AS (SELECT term, count(*) AS n FROM tk GROUP BY 1),
            tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM c)
            SELECT tk.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   round(avg(-ln(CAST(c.n AS DOUBLE) / tot.t)), 6)
                       AS avg_neg_logp
            FROM tk JOIN c USING (term) CROSS JOIN tot
            GROUP BY tk.doc_id
        """,
        "unigram_logprob": """
            WITH tk AS (
                SELECT doc_id, term FROM (
                    SELECT doc_id,
                           unnest(regexp_split_to_array(lower(text),
                               '[^a-z0-9]+')) AS term
                    FROM documents)
                WHERE term <> ''
            ),
            c AS (SELECT term, count(*) AS n FROM tk GROUP BY 1),
            tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM c)
            SELECT tk.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   round(avg(-ln(CAST(c.n AS DOUBLE) / tot.t)), 6)
                       AS avg_neg_logp
            FROM tk JOIN c USING (term) CROSS JOIN tot
            GROUP BY tk.doc_id
        """,
        "bm25_topk": """
            -- identical pinned operand order to stages/retrieval.py:
            -- bm25_topk; every literal forced DOUBLE (e-notation) so
            -- DuckDB never routes through DECIMAL arithmetic
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text),
                           '[^a-z0-9]+')) AS term
                FROM documents
            ), tok2 AS (
                SELECT doc_id, term FROM tok WHERE term <> ''
            ), dl AS (
                SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id
            ), st AS (
                SELECT (SELECT count(*) FROM documents) AS n_docs,
                       (SELECT COALESCE(sum(dl), 0) FROM dl) AS sum_dl
            ), tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM tok2 WHERE term IN ('hash', 'sort', 'window')
                GROUP BY doc_id, term
            ), df AS (
                SELECT term, count(*) AS df FROM tf GROUP BY term
            ), contrib AS (
                SELECT tf.doc_id,
                       CAST(floor(
                           ln((st.n_docs - df.df + 0.5e0)
                              / (df.df + 0.5e0) + 1e0)
                           * ((tf.tf * (1.2e0 + 1e0))
                              / (tf.tf + 1.2e0 * (1e0 - 0.75e0
                                 + 0.75e0 * (dl.dl
                                    / (CAST(st.sum_dl AS DOUBLE)
                                       / st.n_docs)))))
                           * 1000000e0 + 0.5e0) AS BIGINT) AS fx
                FROM tf
                JOIN dl ON tf.doc_id = dl.doc_id
                JOIN df ON tf.term = df.term
                CROSS JOIN st
            )
            SELECT doc_id, CAST(sum(fx) AS BIGINT) AS score_fx,
                   CAST(count(*) AS BIGINT) AS n_hit
            FROM contrib GROUP BY doc_id
            ORDER BY score_fx DESC, doc_id ASC
            LIMIT 20
        """,
        "weighted_sample_orders": f"""
            SELECT o_orderkey, o_custkey, o_totalprice FROM (
                SELECT o_orderkey, o_custkey, o_totalprice,
                       -ln(((CAST(o_orderkey AS HUGEINT) * 2654435761)
                            % 4294967296 + 1.0) / 4294967296.0)
                           / o_totalprice AS es_key
                FROM orders
            ) ORDER BY es_key ASC, o_orderkey ASC LIMIT {_WS_K}
        """,
        "train_val_test_split": f"""
            SELECT doc_id, lang,
                   CASE WHEN substr(md5('{_SPLIT_SALT}' ||
                            CAST(doc_id AS VARCHAR)), 1, 8)
                            < '{_hash_threshold(_SPLIT_FRACS[0])}'
                        THEN 'train'
                        WHEN substr(md5('{_SPLIT_SALT}' ||
                            CAST(doc_id AS VARCHAR)), 1, 8)
                            < '{_hash_threshold(_SPLIT_FRACS[0]
                                                + _SPLIT_FRACS[1])}'
                        THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "sequence_packing": f"""
            WITH t AS ({_token_counts_sql()}),
            c AS (SELECT doc_id, n_tokens_bpe AS n,
                         COALESCE(sum(n_tokens_bpe) OVER (
                             ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS s
                  FROM t)
            SELECT doc_id, CAST(b AS BIGINT) AS bin_id
            FROM c, LATERAL unnest(generate_series(
                     CAST(s // {_PACK_CAPACITY} AS BIGINT),
                     CAST((s + greatest(n, 1) - 1)
                          // {_PACK_CAPACITY} AS BIGINT)
                 )) AS g(b)
        """,
        "funnel_windowed": f"""
            WITH u AS (SELECT DISTINCT user_id FROM events),
            s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                   WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t2
                   FROM events e JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = '{_FUNNEL_STEPS[1]}'
                     AND e.ts > s1.t1
                     AND e.ts <= s1.t1
                         + INTERVAL {_FUNNEL_GAP_HOURS} HOUR
                   GROUP BY 1),
            s3 AS (SELECT e.user_id, min(e.ts) AS t3
                   FROM events e JOIN s2 ON e.user_id = s2.user_id
                   WHERE e.event_type = '{_FUNNEL_STEPS[2]}'
                     AND e.ts > s2.t2
                     AND e.ts <= s2.t2
                         + INTERVAL {_FUNNEL_GAP_HOURS} HOUR
                   GROUP BY 1)
            SELECT u.user_id,
                   CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                             WHEN s2.user_id IS NOT NULL THEN 2
                             WHEN s1.user_id IS NOT NULL THEN 1
                             ELSE 0 END AS BIGINT) AS funnel_stage
            FROM u
            LEFT JOIN s1 ON u.user_id = s1.user_id
            LEFT JOIN s2 ON u.user_id = s2.user_id
            LEFT JOIN s3 ON u.user_id = s3.user_id
        """,
        "event_gap_stats": """
            WITH o AS (SELECT user_id, ts,
                              lag(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS prev_ts
                       FROM events),
            g AS (SELECT user_id,
                         epoch_us(ts) - epoch_us(prev_ts) AS gap
                  FROM o WHERE prev_ts IS NOT NULL)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
                   CAST(sum(gap) AS DOUBLE) / count(*) AS mean_gap_us,
                   CAST(quantile_disc(gap, 0.5) AS BIGINT)
                       AS median_gap_us
            FROM g GROUP BY user_id
        """,
        "incremental_counts": """
            SELECT event_type, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        """,
        "gif_frame_counts": """
            SELECT doc_id AS item_id,
                   CAST(16 + doc_id % 64 AS INTEGER) AS width,
                   CAST(16 + (doc_id * 3) % 64 AS INTEGER) AS height,
                   CAST(1 + doc_id % 5 AS INTEGER) AS n_frames
            FROM documents
        """,
        "mode_event_type": """
            WITH c AS (SELECT user_id, event_type,
                              CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2)
            SELECT user_id, event_type, n FROM (
                SELECT c.*, row_number() OVER (PARTITION BY user_id
                    ORDER BY n DESC, event_type ASC) AS rn
                FROM c
            ) WHERE rn = 1
        """,
        "transition_counts": """
            WITH o AS (SELECT user_id, event_type AS cur_type,
                              lead(event_type) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
                       FROM events)
            SELECT cur_type, next_type,
                   CAST(count(*) AS BIGINT) AS n
            FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2
        """,
        "retention_cohorts": """
            WITH su AS (SELECT user_id,
                               date_trunc('week', min(ts))
                                   AS cohort_week
                        FROM events WHERE event_type = 'signup'
                        GROUP BY 1),
            aw AS (SELECT DISTINCT user_id,
                          date_trunc('week', ts) AS active_week
                   FROM events)
            SELECT su.cohort_week, aw.active_week,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM su JOIN aw USING (user_id)
            WHERE aw.active_week >= su.cohort_week
            GROUP BY 1, 2
        """,
        "top_sources_per_lang": """
            WITH c AS (SELECT lang, source,
                              CAST(count(*) AS BIGINT) AS n
                       FROM documents GROUP BY 1, 2)
            SELECT lang, source, n FROM (
                SELECT c.*, row_number() OVER (PARTITION BY lang
                    ORDER BY n DESC, source ASC) AS rn
                FROM c
            ) WHERE rn <= 2
        """,
        "users_intersect": """
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'purchase' AND value > 100.0
            INTERSECT
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'view' AND value > 100.0
        """,
        "users_except": """
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'signup'
            EXCEPT
            SELECT DISTINCT user_id FROM events WHERE value > 350.0
        """,
        "expectation_checks": """
            SELECT event_id, 'value_range' AS rule FROM events
            WHERE value < 0 OR value > 400
            UNION ALL
            SELECT event_id, 'known_type' FROM events
            WHERE event_type NOT IN ('view', 'click', 'purchase')
            UNION ALL
            SELECT event_id, 'user_id_range' FROM events
            WHERE user_id < 10
        """,
        "winsorize_events": """
            WITH x AS (SELECT event_id, event_type,
                              CAST(floor(value) AS BIGINT) AS x
                       FROM events),
            qs AS (SELECT event_type,
                          quantile_disc(x, 0.05) AS lo,
                          quantile_disc(x, 0.95) AS hi
                   FROM x GROUP BY 1)
            SELECT x.event_id, x.event_type, x.x,
                   CAST(least(greatest(x.x, qs.lo), qs.hi) AS BIGINT)
                       AS x_wins
            FROM x JOIN qs USING (event_type)
        """,
        "partitioned_roundtrip": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE lang = 'en'
        """,
        "merge_upserts": """
            SELECT o_orderkey, o_custkey,
                   CASE WHEN o_orderkey % 7 = 0
                        THEN o_totalprice + 1000.0
                        ELSE o_totalprice END AS o_totalprice
            FROM orders
            WHERE NOT (o_orderkey % 7 = 0 AND o_orderkey % 3 = 0)
        """,
        "inverted_index": """
            WITH tk AS (
                SELECT DISTINCT doc_id, term FROM (
                    SELECT doc_id,
                           unnest(regexp_split_to_array(lower(text),
                               '[^a-z0-9]+')) AS term
                    FROM documents)
                WHERE term <> ''
            )
            SELECT term, CAST(count(*) AS BIGINT) AS df,
                   string_agg(CAST(doc_id AS VARCHAR), ','
                       ORDER BY doc_id) AS postings
            FROM tk GROUP BY term
        """,
        "audio_headers": """
            SELECT doc_id AS item_id,
                   CAST(CASE doc_id % 4 WHEN 0 THEN 8000
                        WHEN 1 THEN 16000 WHEN 2 THEN 22050
                        ELSE 44100 END AS INTEGER) AS sample_rate,
                   CAST(1 + doc_id % 2 AS INTEGER) AS channels,
                   CAST(16 AS INTEGER) AS bits,
                   CAST(100 + doc_id % 400 AS BIGINT) AS n_frames,
                   CAST(100 + doc_id % 400 AS DOUBLE) * 1000.0
                   / CAST(CASE doc_id % 4 WHEN 0 THEN 8000
                          WHEN 1 THEN 16000 WHEN 2 THEN 22050
                          ELSE 44100 END AS DOUBLE) AS duration_ms
            FROM documents
        """,
        "video_headers": """
            SELECT doc_id AS item_id,
                   'isom' AS brand,
                   CAST(CASE doc_id % 4 WHEN 0 THEN 600
                        WHEN 1 THEN 1000 WHEN 2 THEN 90000
                        ELSE 44100 END AS INTEGER) AS timescale,
                   CAST(1000 + doc_id % 9000 AS BIGINT)
                       AS duration_ticks,
                   CAST(1 + doc_id % 3 AS INTEGER) AS n_tracks,
                   CAST(1000 + doc_id % 9000 AS DOUBLE) * 1000.0
                   / CAST(CASE doc_id % 4 WHEN 0 THEN 600
                          WHEN 1 THEN 1000 WHEN 2 THEN 90000
                          ELSE 44100 END AS DOUBLE) AS duration_ms
            FROM documents
        """,
        **_kg_oracle_sql(_sf),
        **_sketch_oracle_sql(sf_dir, kg_sf=_sf),
    }


def _sketch_oracle_sql(sf_dir: str = "/root/testdata/sf0.01",
                       kg_sf: float = 0.01) -> dict[str, str]:
    """Golden-parquet oracles for the sketch/ANN/media family: each
    query's DuckDB oracle simply reads the output of the independent
    naive implementation in :mod:`kgdata_ray.oracle_sketch` (the exact
    pattern the KG family uses for its non-SQL-expressible outputs).
    The driver runs at sf0.01, so paths pin that scale; tests pin
    sf0.001 through the same helper."""
    from ..oracle_sketch import sketch_oracle_dir
    from ..oracle_tables import oracle_dir

    d = sketch_oracle_dir(sf_dir)
    feat_cols = ", ".join(f"feat_{j}" for j in range(8))
    return {
        "minhash_pairs": f"""
            SELECT id_a, id_b, jaccard
            FROM read_parquet('{d}/minhash_pairs.parquet')
        """,
        "fuzzy_contamination": f"""
            SELECT doc_id
            FROM read_parquet('{d}/fuzzy_contamination.parquet')
        """,
        "embedding_contamination": f"""
            WITH p AS (SELECT list_transform(embedding, x -> x + 0.01)
                           AS embedding
                       FROM embeddings
                       WHERE vec_id % {_EMB_CONTAM_MOD} = 0)
            SELECT DISTINCT e.vec_id
            FROM embeddings e JOIN p
              ON round(list_cosine_similarity(e.embedding, p.embedding),
                       6) >= {_EMB_CONTAM_T}
        """,
        "simhash_pairs": f"""
            SELECT id_a, id_b, hamming
            FROM read_parquet('{d}/simhash_pairs.parquet')
        """,
        "cms_token_counts": f"""
            SELECT term, est_count
            FROM read_parquet('{d}/cms_token_counts.parquet')
        """,
        "kmeans_clusters": f"""
            SELECT vec_id, cluster
            FROM read_parquet('{d}/kmeans_clusters.parquet')
        """,
        "mmr_select": f"""
            SELECT sel_rank, vec_id, mmr_fx
            FROM read_parquet('{d}/mmr_select.parquet')
        """,
        "semdedup": f"""
            SELECT vec_id, cluster, rep_id, kept
            FROM read_parquet('{d}/semdedup.parquet')
        """,
        "pq_codes": f"""
            SELECT vec_id, code_0, code_1, code_2, code_3, err_fx
            FROM read_parquet('{d}/pq_codes.parquet')
        """,
        "embedding_quantize": f"""
            SELECT vec_id, codes_hex, err_fx
            FROM read_parquet('{d}/scalar_quantize.parquet')
        """,
        "bpe_merges": f"""
            SELECT step, lhs, rhs, pair_count
            FROM read_parquet('{d}/bpe_merges.parquet')
        """,
        "knn_ivfpq": f"""
            SELECT query_id, rank, neighbor_id, adc_fx
            FROM read_parquet('{d}/knn_ivfpq.parquet')
        """,
        "bpe_tokenize": f"""
            SELECT doc_id, n_bpe_tokens
            FROM read_parquet('{d}/bpe_encode.parquet')
        """,
        "ngram_jaccard_pairs": f"""
            SELECT id_a, id_b, jaccard
            FROM read_parquet('{d}/ngram_jaccard_pairs.parquet')
        """,
        "embedding_neardup_lsh": f"""
            SELECT id_a, id_b
            FROM read_parquet('{d}/embedding_lsh_pairs.parquet')
        """,
        "rolling_fingerprints": f"""
            SELECT doc_id, rolling_fp
            FROM read_parquet('{d}/rolling_fp.parquet')
        """,
        "knn_ivf": f"""
            SELECT query_id, neighbor_id, rank
            FROM read_parquet('{d}/knn_ivf.parquet')
        """,
        "hll_ndistinct": f"""
            SELECT event_type, n_distinct_hll
            FROM read_parquet('{d}/hll_ndistinct.parquet')
        """,
        "knn_ivf_distributed": f"""
            SELECT query_id, neighbor_id, rank
            FROM read_parquet('{d}/knn_ivf_perquery.parquet')
        """,
        "media_features": f"""
            SELECT item_id, kind, digest, {feat_cols}
            FROM read_parquet('{d}/media_features.parquet')
        """,
        "audio_features": f"""
            SELECT item_id, kind, digest, {feat_cols}
            FROM read_parquet('{d}/audio_features.parquet')
        """,
        "image_features": f"""
            SELECT item_id, kind, digest, feat_0, feat_1, feat_2,
                   feat_3, feat_4, feat_5, feat_6, feat_7
            FROM read_parquet('{d}/image_features.parquet')
        """,
        "jpeg_features": f"""
            SELECT item_id, kind, digest, feat_0, feat_1, feat_2,
                   feat_3, feat_4, feat_5, feat_6, feat_7
            FROM read_parquet('{d}/jpeg_features.parquet')
        """,
        "gif_pixel_frames": f"""
            SELECT item_id, frame_idx, width, height, mean_luma_milli
            FROM read_parquet('{d}/gif_frames.parquet')
        """,
        "mjpeg_frame_stats": f"""
            SELECT item_id, frame_idx, width, height, mean_luma_milli,
                   digest
            FROM read_parquet('{d}/mjpeg_frames.parquet')
        """,
        "hybrid_rrf": f"""
            SELECT doc_id, rrf_fx, lex_rank, dense_rank
            FROM read_parquet('{d}/hybrid_rrf.parquet')
        """,
        "ann_recall": f"""
            SELECT query_id, n_common, recall_milli
            FROM read_parquet('{d}/ann_recall.parquet')
        """,
        "embedding_pca": f"""
            SELECT vec_id, pc0_micro, pc1_micro
            FROM read_parquet('{d}/embedding_pca.parquet')
        """,
        "dsir_scores": f"""
            SELECT doc_id, n_grams, weight_micro
            FROM read_parquet('{d}/dsir_scores.parquet')
        """,
        "linear_probe": f"""
            SELECT vec_id, is_target, score_micro
            FROM read_parquet('{d}/linear_probe.parquet')
        """,
        "leakage_safe_split": f"""
            SELECT doc_id, group_id, split
            FROM read_parquet('{d}/leakage_split.parquet')
        """,
        "contrastive_pairs": f"""
            SELECT query_id, kind, cand_id, dist_q
            FROM read_parquet('{d}/contrastive_pairs.parquet')
        """,
        "dsir_sample": f"""
            SELECT doc_id, weight_micro, key_micro
            FROM read_parquet('{d}/dsir_sample.parquet')
        """,
        "embedding_dbscan": f"""
            SELECT vec_id, role, cluster
            FROM read_parquet('{d}/dbscan.parquet')
        """,
        "kg_pagerank": f"""
            SELECT node_id, rank
            FROM read_parquet('{oracle_dir(kg_sf)}/pagerank.parquet')
        """,
        "kg_ppr": f"""
            SELECT node_id, rank
            FROM read_parquet('{oracle_dir(kg_sf)}/ppr.parquet')
        """,
        "minhash_clusters": f"""
            SELECT node_id, component_id
            FROM read_parquet('{d}/minhash_clusters.parquet')
        """,
        "dedup_representatives": f"""
            WITH s AS (
                SELECT doc_id,
                       CAST(length(text) AS DOUBLE) AS n_chars,
                       greatest(CAST(length(regexp_extract_all(text,
                           '\\S+')) AS DOUBLE), 1.0) AS n_tokens,
                       CAST(length(regexp_extract_all(text, '[.,;:!?]'))
                           AS DOUBLE) AS n_punct
                FROM documents
            ), q AS (
                SELECT doc_id,
                       round(
                           0.4 * least(n_chars / 500.0, 1.0)
                         + 0.3 * (1.0 - abs(least(n_punct / n_tokens,
                               1.0) - 0.2))
                         + 0.3 * (1.0 - least(abs(((n_chars - n_tokens
                               + 1.0) / n_tokens) - 5.5) / 5.5, 1.0)),
                       6) AS quality
                FROM s
            ), cl AS (
                SELECT node_id, component_id
                FROM read_parquet('{d}/minhash_clusters.parquet')
            )
            SELECT component_id, node_id, quality FROM (
                SELECT cl.component_id, cl.node_id, q.quality,
                       row_number() OVER (PARTITION BY cl.component_id
                           ORDER BY q.quality DESC, cl.node_id ASC)
                           AS rn
                FROM cl JOIN q ON cl.node_id = q.doc_id
            ) WHERE rn = 1
        """,
        "pii_scrub": _pii_scrub_sql(),
        "repetition_stats": """
            WITH w AS (
                SELECT doc_id,
                       unnest(string_split(lower(text), ' ')) AS word
                FROM documents
            ), wc AS (
                SELECT doc_id, word, count(*) AS c
                FROM w WHERE word <> '' GROUP BY doc_id, word
            )
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_words,
                   CAST(count(*) AS BIGINT) AS n_distinct_words,
                   round(max(c) * 1.0 / sum(c), 6) AS top_word_frac,
                   round(1.0 - count(*) * 1.0 / sum(c), 6)
                       AS repetition_ratio
            FROM wc GROUP BY doc_id
        """,
    }


def _pii_scrub_sql() -> str:
    """Same injected PII + same RE2 patterns as q_pii_scrub, recomputed
    entirely in SQL."""
    from ..stages.textstats import EMAIL_PATTERN, PHONE_PATTERN

    email = EMAIL_PATTERN.replace("'", "''")
    phone = PHONE_PATTERN.replace("'", "''")
    return f"""
        WITH aug AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 3 = 0
                        THEN ' contact d' || doc_id || '@example.com now'
                        ELSE '' END
                   || CASE WHEN doc_id % 4 = 0
                        THEN ' call +1-' || (100 + doc_id % 900) || '-'
                             || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        ELSE '' END AS text
            FROM documents
        )
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(text, '{email}', '[EMAIL]', 'g'),
                   '{phone}', '[PHONE]', 'g') AS clean_text,
               CAST(length(regexp_extract_all(text, '{email}')) AS BIGINT)
                   AS n_emails,
               CAST(length(regexp_extract_all(text, '{phone}')) AS BIGINT)
                   AS n_phones
        FROM aug
    """


def _make_training_set_sql() -> str:
    """The full curation chain replayed in SQL: quality filter ->
    exact dedup -> per-language rebalance -> train/val split ->
    cumsum sequence packing of the train stream."""
    from ..functions.sampling import hash_threshold
    from ..stages.textstats import BPE_PATTERN

    bpe = BPE_PATTERN.replace("'", "''")
    cut_en = hash_threshold(_MTS_EN_FRACTION)
    cut_train = hash_threshold(_MTS_TRAIN_FRACTION)
    return f"""
        WITH s AS (
            SELECT doc_id, lang, text,
                   CAST(length(text) AS DOUBLE) AS n_chars,
                   greatest(CAST(length(regexp_extract_all(text,
                       '\\S+')) AS DOUBLE), 1.0) AS n_tokens,
                   CAST(length(regexp_extract_all(text, '[.,;:!?]'))
                       AS DOUBLE) AS n_punct
            FROM documents
        ), scored AS (
            SELECT doc_id, lang, text,
                   round(
                       0.4 * least(n_chars / 500.0, 1.0)
                     + 0.3 * (1.0 - abs(least(n_punct / n_tokens, 1.0)
                           - 0.2))
                     + 0.3 * (1.0 - least(abs(((n_chars - n_tokens
                           + 1.0) / n_tokens) - 5.5) / 5.5, 1.0)),
                   6) AS quality
            FROM s
        ), kept AS (
            SELECT doc_id, lang, text FROM scored
            WHERE quality >= {_MTS_QUALITY}
        ), reps AS (
            SELECT min(doc_id) AS doc_id FROM kept GROUP BY text
        ), k2 AS (
            SELECT k.doc_id, k.lang, k.text
            FROM kept k JOIN reps USING (doc_id)
        ), samp AS (
            SELECT * FROM k2
            WHERE lang <> 'en'
               OR substr(md5('{_MTS_SALT_SAMPLE}' ||
                      CAST(doc_id AS VARCHAR)), 1, 8) < '{cut_en}'
        ), lab AS (
            SELECT doc_id, text,
                   CASE WHEN substr(md5('{_MTS_SALT_SPLIT}' ||
                            CAST(doc_id AS VARCHAR)), 1, 8)
                            < '{cut_train}'
                        THEN 'train' ELSE 'val' END AS split
            FROM samp
        ), tok AS (
            SELECT doc_id,
                   CAST(length(regexp_extract_all(text, '{bpe}'))
                       AS BIGINT) AS n
            FROM lab WHERE split = 'train'
        ), c AS (
            SELECT doc_id, n,
                   COALESCE(sum(n) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS s2
            FROM tok
        ), packed AS (
            SELECT doc_id, CAST(b AS BIGINT) AS bin_id
            FROM c, LATERAL unnest(generate_series(
                     CAST(s2 // {_PACK_CAPACITY} AS BIGINT),
                     CAST((s2 + greatest(n, 1) - 1)
                          // {_PACK_CAPACITY} AS BIGINT)
                 )) AS g(b)
        )
        SELECT doc_id, 'train' AS split, bin_id FROM packed
        UNION ALL
        SELECT doc_id, split, CAST(-1 AS BIGINT) AS bin_id
        FROM lab WHERE split = 'val'
    """


def _token_budget_sql() -> str:
    """Window-SUM oracle for token_budget_select: the engine's exact
    quality expression + BPE segment count, cumulated over the pinned
    (quality desc, doc_id) order."""
    from ..stages.textstats import BPE_PATTERN

    bpe = BPE_PATTERN.replace("'", "''")
    return f"""
        WITH s0 AS (
            SELECT doc_id,
                   CAST(length(text) AS DOUBLE) AS n_chars,
                   greatest(CAST(length(regexp_extract_all(text, '\\S+'))
                       AS DOUBLE), 1.0) AS n_toks,
                   CAST(length(regexp_extract_all(text, '[.,;:!?]'))
                       AS DOUBLE) AS n_punct,
                   CAST(length(regexp_extract_all(text, '{bpe}'))
                       AS BIGINT) AS n_tokens_bpe
            FROM documents
        ), s AS (
            SELECT doc_id,
                   round(
                       0.4 * least(n_chars / 500.0, 1.0)
                     + 0.3 * (1.0 - abs(least(n_punct / n_toks, 1.0)
                           - 0.2))
                     + 0.3 * (1.0 - least(abs(((n_chars - n_toks + 1.0)
                           / n_toks) - 5.5) / 5.5, 1.0)),
                   6) AS quality,
                   n_tokens_bpe
            FROM s0
        ), c AS (
            SELECT doc_id, quality, n_tokens_bpe,
                   CAST(SUM(n_tokens_bpe) OVER (
                       ORDER BY quality DESC, doc_id) AS BIGINT)
                       AS cum_tokens
            FROM s
        )
        SELECT doc_id, quality, n_tokens_bpe, cum_tokens
        FROM c WHERE cum_tokens <= {_TBS_BUDGET}
    """


def _token_counts_sql() -> str:
    """Token counts with the same regexes as stages.textstats (RE2-safe,
    no lookaheads, identical leftmost-first alternation semantics)."""
    from ..stages.textstats import BPE_PATTERN

    bpe = BPE_PATTERN.replace("'", "''")
    return f"""
        SELECT doc_id,
               CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT)
                   AS n_tokens,
               CAST(length(regexp_extract_all(text, '{bpe}')) AS BIGINT)
                   AS n_tokens_bpe
        FROM documents
    """


def _chunk_lang_sql() -> str:
    """The chunk_lang_consistency composition in SQL: same planted
    augmentation, same 32/24 chunking, same stopword vote and
    tie-breaks as the engine stage."""
    from ..stages.textstats import _STOPWORDS

    rows = ", ".join(
        f"(\'{lang}\', \'{w}\')"
        for lang in sorted(_STOPWORDS)
        for w in sorted(_STOPWORDS[lang])
    )
    return f"""
        WITH stop(lang, word) AS (VALUES {rows}),
        aug AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 3 = 0
                           THEN repeat(\'{_DE_SUFFIX}\', 4) ELSE \'\' END
                   || CASE WHEN doc_id % 7 = 0
                           THEN repeat(\'{_FR_SUFFIX}\', 2) ELSE \'\' END
                       AS text
            FROM documents
        ),
        words AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, \'\\s+\'),
                               x -> x <> \'\') AS w
            FROM aug
        ),
        chunks AS (
            SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
                   array_to_string(
                       w[i * {_CHUNK_STRIDE} + 1 :
                         i * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}],
                       \' \') AS chunk_text
            FROM words,
                 LATERAL (SELECT unnest(generate_series(0,
                     CAST(ceil(CAST(len(w) AS DOUBLE)
                               / {_CHUNK_STRIDE}) AS BIGINT) - 1))
                     AS i) t
            WHERE len(w) > 0
        ),
        toks AS (
            SELECT doc_id, chunk_idx,
                   unnest(regexp_extract_all(lower(chunk_text),
                       \'[a-zäöüéèêàçñ]+\')) AS tok
            FROM chunks
        ),
        scores AS (
            SELECT t.doc_id, t.chunk_idx, s.lang, count(*) AS n
            FROM toks t JOIN stop s ON t.tok = s.word
            GROUP BY t.doc_id, t.chunk_idx, s.lang
        ),
        best AS (
            SELECT doc_id, chunk_idx, lang,
                   row_number() OVER (PARTITION BY doc_id, chunk_idx
                       ORDER BY n DESC, lang ASC) AS rn
            FROM scores
        ),
        pred AS (
            SELECT c.doc_id, c.chunk_idx,
                   COALESCE(b.lang, \'und\') AS lang_pred
            FROM chunks c
            LEFT JOIN best b ON c.doc_id = b.doc_id
                AND c.chunk_idx = b.chunk_idx AND b.rn = 1
        ),
        votes AS (
            SELECT doc_id, lang_pred, count(*) AS cnt
            FROM pred GROUP BY doc_id, lang_pred
        ),
        ranked AS (
            SELECT doc_id, lang_pred, cnt,
                   CAST(sum(cnt) OVER (PARTITION BY doc_id) AS BIGINT)
                       AS n_chunks,
                   row_number() OVER (PARTITION BY doc_id
                       ORDER BY cnt DESC, lang_pred ASC) AS rn
            FROM votes
        )
        SELECT doc_id, n_chunks, lang_pred AS majority_lang,
               CAST(1000 * cnt // n_chunks AS BIGINT)
                   AS consistency_milli
        FROM ranked WHERE rn = 1
    """


def _lang_id_sql() -> str:
    """Stopword-overlap language ID in SQL, mirroring stages.textstats
    (same token regex, same stopword lists, same score-desc /
    lang-asc tie-break, 'und' when no stopword matches)."""
    from ..stages.textstats import _STOPWORDS

    rows = ", ".join(
        f"('{lang}', '{w}')"
        for lang in sorted(_STOPWORDS)
        for w in sorted(_STOPWORDS[lang])
    )
    return f"""
        WITH stop(lang, word) AS (VALUES {rows}),
        toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text),
                       '[a-zäöüéèêàçñ]+')) AS tok
            FROM documents
        ),
        scores AS (
            SELECT t.doc_id, s.lang, count(*) AS n
            FROM toks t JOIN stop s ON t.tok = s.word
            GROUP BY t.doc_id, s.lang
        ),
        best AS (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY doc_id
                       ORDER BY n DESC, lang ASC) AS rn
            FROM scores
        )
        SELECT d.doc_id, COALESCE(b.lang, 'und') AS lang_pred
        FROM documents d
        LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
    """


def _kg_oracle_sql(sf: float = 0.01) -> dict[str, str]:
    """DuckDB oracles for the KG family. The driver's pre-registered
    views don't cover the synthesized transcript world, so these read
    the deterministic oracle parquet tables that
    ``oracle_tables.ensure_oracle_tables`` materializes (transcripts /
    gazetteer / redirects / entity_types are *inputs*; triples /
    mentions / unlinkable are GOLDEN outputs of the independent
    pure-Python oracle in :mod:`kgdata_ray.oracle`). The driver runs at
    sf0.01, so the paths are pinned to that scale."""
    from ..oracle_tables import oracle_dir

    d = oracle_dir(sf)
    tr = f"read_parquet('{d}/transcripts.parquet')"
    gz = f"read_parquet('{d}/gazetteer.parquet')"
    rt = f"read_parquet('{d}/redirects.parquet')"
    et = f"read_parquet('{d}/entity_types.parquet')"
    golden = f"read_parquet('{d}/triples.parquet')"
    dag = f"read_parquet('{d}/type_dag.parquet')"
    golden_spo = (
        f"(SELECT subj, pred, obj, conv_id, turn_idx FROM {golden})"
    )

    norm_expr = (
        "trim(regexp_replace(regexp_replace("
        "lower(replace({col}, chr(160), ' ')), "
        "'[^\\w\\- ]', '', 'g'), '\\s+', ' ', 'g'))"
    )

    sql = {
        "kg_triples": f"SELECT * FROM {golden_spo}",
        "kg_triples_join": f"SELECT * FROM {golden_spo}",
        "kg_triples_salted": f"SELECT * FROM {golden_spo}",
        "kg_conversations": f"""
            SELECT conv_id, count(*) AS n_turns,
                   min(ts) AS first_ts, max(ts) AS last_ts,
                   string_agg(role || ': ' || text, chr(10)
                       ORDER BY turn_idx) AS dialogue
            FROM {tr} GROUP BY conv_id
        """,
        "kg_conversations_salted": f"""
            SELECT conv_id, count(*) AS n_turns,
                   min(ts) AS first_ts, max(ts) AS last_ts,
                   string_agg(role || ': ' || text, chr(10)
                       ORDER BY turn_idx) AS dialogue
            FROM {tr} GROUP BY conv_id
        """,
        "kg_pred_type_dicts": f"""
            WITH typed AS (
                SELECT t.pred, e.etype, count(*) AS n
                FROM {golden} t JOIN {et} e ON t.subj = e.entity_id
                GROUP BY 1, 2
            )
            SELECT pred,
                   '{{' || string_agg('"' || etype || '": ' || n, ', '
                       ORDER BY etype) || '}}' AS counts
            FROM typed GROUP BY pred
        """,
        "kg_mentions": f"""
            SELECT conv_id, turn_idx, mention_norm
            FROM read_parquet('{d}/mentions.parquet')
        """,
        "kg_mentions_join": f"""
            SELECT conv_id, turn_idx, mention_norm
            FROM read_parquet('{d}/mentions.parquet')
        """,
        "kg_raw_candidates": f"""
            SELECT conv_id, turn_idx, subj_raw, pred, obj_raw
            FROM read_parquet('{d}/raw_candidates.parquet')
        """,
        "kg_unlinkable": f"""
            SELECT conv_id, turn_idx, subj_raw, pred, obj_raw, error
            FROM read_parquet('{d}/unlinkable.parquet')
        """,
        "kg_alias_candidates": f"""
            WITH n AS (
                SELECT entity_id, alias, freq_global, freq_doc,
                       {norm_expr.format(col='alias')} AS alias_norm
                FROM {gz}
            )
            SELECT entity_id, alias, freq_global, freq_doc, alias_norm,
                   CAST(row_number() OVER (PARTITION BY alias_norm
                       ORDER BY freq_global DESC, entity_id ASC) - 1
                       AS INTEGER) AS rank
            FROM n QUALIFY rank < 2048
        """,
        "kg_canonical_map": f"""
            WITH RECURSIVE chain(src_id, canonical_id) AS (
                SELECT src_id, dst_id FROM {rt}
                UNION ALL
                SELECT c.src_id, r.dst_id
                FROM chain c JOIN {rt} r ON c.canonical_id = r.src_id
            )
            SELECT src_id, canonical_id FROM chain
            WHERE canonical_id NOT IN (SELECT src_id FROM {rt})
        """,
        "kg_canonical_map_driver": f"""
            WITH RECURSIVE chain(src_id, canonical_id) AS (
                SELECT src_id, dst_id FROM {rt}
                UNION ALL
                SELECT c.src_id, r.dst_id
                FROM chain c JOIN {rt} r ON c.canonical_id = r.src_id
            )
            SELECT src_id, canonical_id FROM chain
            WHERE canonical_id NOT IN (SELECT src_id FROM {rt})
        """,
        "kg_pred_counts": f"""
            SELECT pred, count(*) AS n FROM {golden} GROUP BY pred
        """,
        "kg_entity_distances": f"""
            WITH RECURSIVE e AS (
                SELECT subj AS u, obj AS v FROM {golden}
                WHERE regexp_matches(obj, '^E[0-9]+$')
                UNION
                SELECT obj AS u, subj AS v FROM {golden}
                WHERE regexp_matches(obj, '^E[0-9]+$')
            ),
            walk(entity_id, dist) AS (
                SELECT 'E0000001', 0
                UNION
                SELECT e.v, w.dist + 1
                FROM walk w JOIN e ON w.entity_id = e.u
                WHERE w.dist < 4
            )
            SELECT entity_id, CAST(min(dist) AS BIGINT) AS dist
            FROM walk GROUP BY entity_id
        """,
        "kg_entity_cards": f"""
            WITH po AS (
                SELECT subj, pred,
                       '[' || string_agg('"' || obj || '"', ', '
                           ORDER BY obj) || ']' AS objs
                FROM {golden} GROUP BY subj, pred
            )
            SELECT subj,
                   '{{' || string_agg('"' || pred || '": ' || objs, ', '
                       ORDER BY pred) || '}}' AS card
            FROM po GROUP BY subj
        """,
        "kg_snapshot_at": f"""
            WITH a AS (
                SELECT t.subj, t.pred, t.obj, tr.ts,
                       t.conv_id, t.turn_idx
                FROM {golden} t
                JOIN {tr} tr ON t.conv_id = tr.conv_id
                            AND t.turn_idx = tr.turn_idx
            ),
            h AS (
                SELECT subj, pred, obj, ts AS valid_from,
                       lead(ts) OVER (PARTITION BY subj, pred
                           ORDER BY ts, obj)
                           AS valid_to
                FROM a
            )
            SELECT subj, pred, obj FROM h
            WHERE valid_from <= TIMESTAMP '{KG_SNAPSHOT_TS}'
              AND (valid_to IS NULL
                   OR valid_to > TIMESTAMP '{KG_SNAPSHOT_TS}')
        """,
        "kg_fact_history": f"""
            WITH a AS (
                SELECT t.subj, t.pred, t.obj, tr.ts,
                       t.conv_id, t.turn_idx
                FROM {golden} t
                JOIN {tr} tr ON t.conv_id = tr.conv_id
                            AND t.turn_idx = tr.turn_idx
            )
            SELECT subj, pred, obj, ts AS valid_from,
                   lead(ts) OVER (PARTITION BY subj, pred
                       ORDER BY ts, obj) AS valid_to
            FROM a
        """,
        "kg_fact_history_incremental": f"""
            WITH a AS (
                SELECT t.subj, t.pred, t.obj, tr.ts,
                       t.conv_id, t.turn_idx
                FROM {golden} t
                JOIN {tr} tr ON t.conv_id = tr.conv_id
                            AND t.turn_idx = tr.turn_idx
            )
            SELECT subj, pred, obj, ts AS valid_from,
                   lead(ts) OVER (PARTITION BY subj, pred
                       ORDER BY ts, obj) AS valid_to
            FROM a
        """,
        "kg_triples_bucketed": f"""
            WITH o AS (SELECT subj AS entity_id, count(*) AS out_degree
                       FROM {golden} GROUP BY subj),
                 i AS (SELECT obj AS entity_id, count(*) AS in_degree
                       FROM {golden} GROUP BY obj),
                 d AS (SELECT COALESCE(o.entity_id, i.entity_id)
                              AS entity_id,
                              COALESCE(out_degree, 0) AS out_degree,
                              COALESCE(in_degree, 0) AS in_degree
                       FROM o FULL OUTER JOIN i
                       ON o.entity_id = i.entity_id)
            SELECT t.subj, t.pred, t.obj, d.out_degree, d.in_degree
            FROM {golden} t JOIN d ON t.subj = d.entity_id
        """,
        "kg_entity_degrees": f"""
            WITH o AS (SELECT subj AS entity_id, count(*) AS out_degree
                       FROM {golden} GROUP BY subj),
                 i AS (SELECT obj AS entity_id, count(*) AS in_degree
                       FROM {golden} GROUP BY obj)
            SELECT COALESCE(o.entity_id, i.entity_id) AS entity_id,
                   COALESCE(out_degree, 0) AS out_degree,
                   COALESCE(in_degree, 0) AS in_degree
            FROM o FULL JOIN i ON o.entity_id = i.entity_id
        """,
        "kg_outlinks": f"""
            SELECT subj AS entity_id,
                   string_agg(DISTINCT obj, ',' ORDER BY obj) AS outlinks
            FROM {golden} GROUP BY subj
        """,
        "kg_entity_aliases": f"""
            SELECT entity_id,
                   string_agg(DISTINCT alias, ',' ORDER BY alias)
                       AS aliases,
                   CAST(SUM(freq_global) AS BIGINT) AS total_freq
            FROM {gz} GROUP BY entity_id
        """,
        "kg_types_degrees": f"""
            WITH o AS (SELECT subj AS entity_id, count(*) AS out_degree
                       FROM {golden} GROUP BY subj),
                 i AS (SELECT obj AS entity_id, count(*) AS in_degree
                       FROM {golden} GROUP BY obj),
                 d AS (
                    SELECT COALESCE(o.entity_id, i.entity_id) AS entity_id,
                           COALESCE(out_degree, 0) AS out_degree,
                           COALESCE(in_degree, 0) AS in_degree
                    FROM o FULL JOIN i ON o.entity_id = i.entity_id
                 )
            SELECT d.entity_id, COALESCE(t.etype, 'unknown') AS etype,
                   d.out_degree, d.in_degree
            FROM d LEFT JOIN {et} t ON d.entity_id = t.entity_id
        """,
        "kg_meta_graph": f"""
            SELECT COALESCE(ts.etype, 'unknown') AS subj_type, t.pred,
                   COALESCE(tt.etype, 'unknown') AS obj_type,
                   count(*) AS n
            FROM {golden} t
            LEFT JOIN {et} ts ON t.subj = ts.entity_id
            LEFT JOIN {et} tt ON t.obj = tt.entity_id
            GROUP BY 1, 2, 3
        """,
        "kg_class_closure": f"""
            WITH RECURSIVE walk(child, anc, dist) AS (
                SELECT child, parent, 1 FROM {dag}
                UNION ALL
                SELECT w.child, d.parent, w.dist + 1
                FROM walk w JOIN {dag} d ON w.anc = d.child
            )
            SELECT child, anc, CAST(min(dist) AS BIGINT) AS dist
            FROM walk GROUP BY child, anc
        """,
        "kg_all_types": f"""
            WITH RECURSIVE walk(child, anc, dist) AS (
                SELECT child, parent, 1 FROM {dag}
                UNION ALL
                SELECT w.child, d.parent, w.dist + 1
                FROM walk w JOIN {dag} d ON w.anc = d.child
            ), clo AS (
                SELECT child, anc, min(dist) AS dist
                FROM walk GROUP BY child, anc
            )
            SELECT entity_id, etype AS type, CAST(0 AS BIGINT) AS dist
            FROM {et}
            UNION ALL
            SELECT e.entity_id, c.anc AS type, CAST(c.dist AS BIGINT) AS dist
            FROM {et} e JOIN clo c ON e.etype = c.child
        """,
        "kg_property_domains": f"""
            SELECT t.pred, e.etype AS subj_type, count(*) AS n
            FROM {golden} t JOIN {et} e ON t.subj = e.entity_id
            GROUP BY 1, 2
        """,
        "kg_property_ranges": f"""
            SELECT t.pred, e.etype AS obj_type, count(*) AS n
            FROM {golden} t JOIN {et} e ON t.obj = e.entity_id
            GROUP BY 1, 2
        """,
        "kg_prop_connections": f"""
            SELECT t.pred, s.etype AS subj_type,
                   COALESCE(o.etype, '') AS obj_type, count(*) AS freq
            FROM {golden} t
            JOIN {et} s ON t.subj = s.entity_id
            LEFT JOIN {et} o ON t.obj = o.entity_id
            GROUP BY 1, 2, 3
        """,
        "kg_triangles": f"""
            WITH s AS (SELECT DISTINCT conv_id, subj FROM {golden}),
            e0 AS (
                SELECT DISTINCT s1.subj AS u, s2.subj AS v
                FROM s s1 JOIN s s2
                  ON s1.conv_id = s2.conv_id AND s1.subj < s2.subj
            )
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM e0 e1
            JOIN e0 e2 ON e1.v = e2.u
            JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v
        """,
        "kg_random_walks": f"""
            WITH RECURSIVE e AS (
                SELECT DISTINCT subj AS node, obj AS nbr FROM {golden}
                WHERE subj LIKE 'E%' AND obj LIKE 'E%'
            ),
            adj AS (
                SELECT node, list(nbr ORDER BY nbr) AS nbrs,
                       CAST(count(*) AS BIGINT) AS deg
                FROM e GROUP BY node
            ),
            walks AS (
                SELECT node AS start,
                       CAST(substr(node, 2) AS BIGINT) AS snum,
                       CAST(0 AS BIGINT) AS step, node
                FROM adj
                UNION ALL
                SELECT w.start, w.snum, w.step + 1,
                       a.nbrs[CAST(1 + (w.snum * 1000003
                              + (w.step + 1) * 10007) % a.deg
                              AS BIGINT)]
                FROM walks w JOIN adj a ON a.node = w.node
                WHERE w.step < 4
            )
            SELECT start, step, node FROM walks
        """,
        "kg_walk_pairs": f"""
            WITH RECURSIVE e AS (
                SELECT DISTINCT subj AS node, obj AS nbr FROM {golden}
                WHERE subj LIKE 'E%' AND obj LIKE 'E%'
            ),
            adj AS (
                SELECT node, list(nbr ORDER BY nbr) AS nbrs,
                       CAST(count(*) AS BIGINT) AS deg
                FROM e GROUP BY node
            ),
            walks AS (
                SELECT node AS start,
                       CAST(substr(node, 2) AS BIGINT) AS snum,
                       CAST(0 AS BIGINT) AS step, node
                FROM adj
                UNION ALL
                SELECT w.start, w.snum, w.step + 1,
                       a.nbrs[CAST(1 + (w.snum * 1000003
                              + (w.step + 1) * 10007) % a.deg
                              AS BIGINT)]
                FROM walks w JOIN adj a ON a.node = w.node
                WHERE w.step < 4
            )
            SELECT w1.node AS node, w2.node AS context,
                   CAST(count(*) AS BIGINT) AS n
            FROM walks w1 JOIN walks w2
              ON w1.start = w2.start
             AND abs(w1.step - w2.step) BETWEEN 1 AND 2
            GROUP BY 1, 2
        """,
        "kg_adamic_adar": f"""
            WITH s AS (SELECT DISTINCT conv_id, subj FROM {golden}),
            edges AS (
                SELECT DISTINCT s1.subj AS u, s2.subj AS v
                FROM s s1 JOIN s s2
                  ON s1.conv_id = s2.conv_id AND s1.subj < s2.subj
            ),
            adj AS (SELECT u AS node, v AS nb FROM edges
                    UNION ALL SELECT v, u FROM edges),
            deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node),
            wed AS (SELECT a.node AS p, b.node AS q, a.nb AS z
                    FROM adj a JOIN adj b
                      ON a.nb = b.nb AND a.node < b.node)
            SELECT w.p, w.q,
                   CAST(count(*) AS BIGINT) AS common_neighbors,
                   round(sum(1.0 / ln(deg.d)), 6) AS aa_score
            FROM wed w JOIN deg ON w.z = deg.node
            GROUP BY w.p, w.q
        """,
        "kg_neighborhood_jaccard": f"""
            WITH s AS (SELECT DISTINCT conv_id, subj FROM {golden}),
            edges AS (
                SELECT DISTINCT s1.subj AS u, s2.subj AS v
                FROM s s1 JOIN s s2
                  ON s1.conv_id = s2.conv_id AND s1.subj < s2.subj
            ),
            adj AS (SELECT u AS node, v AS nb FROM edges
                    UNION ALL SELECT v, u FROM edges),
            deg AS (SELECT node, count(*) AS d FROM adj GROUP BY node),
            c AS (SELECT a.node AS p, b.node AS q, count(*) AS common
                  FROM adj a JOIN adj b
                    ON a.nb = b.nb AND a.node < b.node
                  GROUP BY 1, 2)
            SELECT c.p, c.q, CAST(c.common AS BIGINT) AS common,
                   CAST(c.common AS DOUBLE)
                       / (dp.d + dq.d - c.common) AS jaccard
            FROM c
            JOIN deg dp ON c.p = dp.node
            JOIN deg dq ON c.q = dq.node
        """,
        "kg_pmi_pairs": f"""
            WITH s AS (SELECT DISTINCT conv_id, subj FROM {golden}),
            n AS (SELECT count(DISTINCT conv_id) AS nc FROM s),
            cx AS (SELECT subj, count(*) AS c FROM s GROUP BY subj),
            pr AS (SELECT s1.subj AS p, s2.subj AS q,
                          count(*) AS cpq
                   FROM s s1 JOIN s s2
                     ON s1.conv_id = s2.conv_id AND s1.subj < s2.subj
                   GROUP BY 1, 2)
            SELECT pr.p, pr.q, CAST(pr.cpq AS BIGINT) AS cpq,
                   round(ln((CAST(pr.cpq AS DOUBLE) * n.nc)
                            / (CAST(cp.c AS DOUBLE) * cq.c)), 6)
                       AS pmi
            FROM pr
            CROSS JOIN n
            JOIN cx cp ON pr.p = cp.subj
            JOIN cx cq ON pr.q = cq.subj
        """,
        "kg_kcore": f"""
            SELECT node FROM read_parquet('{d}/kcore3.parquet')
        """,
        "kg_components": f"""
            SELECT node_id, component_id
            FROM read_parquet('{d}/components.parquet')
        """,
        "kg_core_numbers": f"""
            SELECT node, core FROM read_parquet('{d}/core_numbers.parquet')
        """,
    }
    return sql
