"""HyperLogLog + heavy-hitters sketch properties beyond the oracle
replica in test_queries.py: error bounds, batching-invariance, and the
pigeonhole candidate guarantee."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from kgdata_ray.functions.sketches import (
    hash64_ints,
    hash64_strs,
    heavy_hitters,
    hll_estimate,
    hll_ndistinct,
    hll_registers,
)


def test_hll_error_bound_and_batch_invariance():
    rng = np.random.default_rng(7)
    n = 40_000
    vals = rng.integers(0, 9_000, size=n)  # ~9k distinct
    groups = np.where(vals % 2 == 0, "even", "odd")
    df = pd.DataFrame({"g": groups, "v": vals})
    exact = df.groupby("g")["v"].nunique()

    for nblocks in (1, 7):
        ds = rd.from_pandas(df).repartition(nblocks)
        got = hll_ndistinct(ds, "g", "v").to_pandas().set_index("g")
        for g in ("even", "odd"):
            est = got.loc[g, "n_distinct_hll"]
            rel = abs(est - exact[g]) / exact[g]
            assert rel < 0.05, (g, est, exact[g])
        if nblocks == 1:
            first = got
        else:
            # register merge is max: estimate must not depend on batching
            pd.testing.assert_frame_equal(first, got)


def test_hll_registers_match_bitlength_rho():
    # engine rho via float log2 == integer bit_length rho
    rng = np.random.default_rng(3)
    h = rng.integers(0, 2**63, size=5000, dtype=np.int64).view(np.uint64)
    regs = hll_registers(h, 12)
    q = 52
    want = np.zeros(4096, dtype=np.uint8)
    for x in h.tolist():
        idx = x >> q
        w = x & ((1 << q) - 1)
        rho = (q + 1) if w == 0 else q - (w.bit_length() - 1)
        if rho > want[idx]:
            want[idx] = rho
    assert np.array_equal(regs, want)
    assert hll_estimate(regs) == hll_estimate(want)


def test_hash64_strs_matches_naive():
    vals = ["", "a", "abc", "hello world", "ü-umlaut", "x" * 300]
    got = hash64_strs(vals)
    MASK = (1 << 64) - 1

    def sm64(x):
        z = (x + 0x9E3779B97F4A7C15) & MASK
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
        return z ^ (z >> 31)

    for s, g in zip(vals, got):
        b = s.encode("utf-8")
        h = 0
        for i, byte in enumerate(b):
            h = (h + byte * pow(1099511628211, len(b) - 1 - i, 1 << 64)) & MASK
        assert int(g) == sm64(h), s


def test_hash64_ints_negative_values():
    got = hash64_ints(np.array([-1, 0, 5], dtype=np.int64))
    assert len(set(got.tolist())) == 3


def test_heavy_hitters_exact_and_complete():
    # skewed corpus: 'the' in every doc, 'rare' once
    texts = [f"the quick doc{i} the lazy dog" for i in range(400)]
    texts[5] += " rare"
    df = pd.DataFrame({"doc_id": range(400), "text": texts})
    ds = rd.from_pandas(df).repartition(5)
    got = heavy_hitters(ds, k=20).to_pandas()

    toks = (
        df["text"].str.lower().str.split("[^a-z0-9]+", regex=True).explode()
    )
    toks = toks[toks != ""]
    vc = toks.value_counts()
    want = vc[vc * 20 > len(toks)]
    assert set(got["term"]) == set(want.index)
    got_map = dict(zip(got["term"], got["n"]))
    for t, n in want.items():
        assert got_map[t] == n
    # sorted (n desc, term asc)
    assert list(got["term"]) == sorted(
        got["term"], key=lambda t: (-got_map[t], t)
    )


def test_heavy_hitters_candidate_cap_raises():
    # every token unique, k huge -> every token is its own batch
    # survivor and the cap trips
    df = pd.DataFrame(
        {"text": [f"u{i} v{i} w{i}" for i in range(50)]}
    )
    ds = rd.from_pandas(df).repartition(2)
    with pytest.raises(ValueError, match="broadcast cap"):
        heavy_hitters(ds, k=10**6, candidate_cap=10)


def test_kmeans_and_span_cache_off_paths_equal():
    # cache=False (stream-from-storage) must equal the default
    # materialized path exactly — same fixed-point arithmetic either way
    import pandas as pd
    import ray.data as rd

    from kgdata_ray.stages.dedup import span_dedup
    from kgdata_ray.stages.similarity import kmeans_embeddings

    emb = "/root/testdata/sf0.001/embeddings.parquet"
    docs = "/root/testdata/sf0.001/documents.parquet"
    a = kmeans_embeddings(rd.read_parquet(emb), cache=True).to_pandas()
    b = kmeans_embeddings(rd.read_parquet(emb), cache=False).to_pandas()
    key = ["vec_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
    c = span_dedup(rd.read_parquet(docs), cache=True).to_pandas()
    d = span_dedup(rd.read_parquet(docs), cache=False).to_pandas()
    pd.testing.assert_frame_equal(
        c.sort_values("doc_id").reset_index(drop=True),
        d.sort_values("doc_id").reset_index(drop=True),
    )
