"""Dedup suite: exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine — verified against brute-force oracles on a corpus with planted
near-duplicates."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from kgdata_ray.stages.dedup import (
    char_shingle_hashes,
    dedup_clusters,
    embedding_pairs,
    exact_dedup_ids,
    jaccard,
    minhash_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    word_ngram_hashes,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus():
    """120 real docs + planted near-dups (small edits) + one exact dup."""
    df = (
        pq.read_table(f"{SF}/documents.parquet")
        .to_pandas()[["doc_id", "text"]]
        .head(120)
    )
    planted = []
    for i, (doc_id, text) in enumerate(
        zip(df["doc_id"].head(10), df["text"].head(10))
    ):
        planted.append(
            {"doc_id": 10_000 + i, "text": text + " extra tail token"}
        )
    planted.append({"doc_id": 20_000, "text": df["text"].iloc[0]})  # exact dup
    return pd.concat([df, pd.DataFrame(planted)], ignore_index=True)


def test_exact_dedup(corpus):
    got = exact_dedup_ids(rd.from_pandas(corpus)).to_pandas()
    want = corpus.groupby("text")["doc_id"].min()
    assert sorted(got["doc_id"]) == sorted(want)
    # the exact dup (20000) must collapse into its original
    assert 20_000 not in set(got["doc_id"])


def test_exact_dedup_partition_and_block_split_invariant(corpus):
    """The 128-bit-keyed winner shuffle must be exact regardless of
    input partitioning, and the boundary guard must keep each content
    key whole even when Ray's sort splits blocks (tiny block size)."""
    import ray

    want = sorted(corpus.groupby("text")["doc_id"].min())
    got_parts = exact_dedup_ids(
        rd.from_pandas(corpus).repartition(7)).to_pandas()
    assert sorted(got_parts["doc_id"]) == want

    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 4 * 1024
    try:
        got_tiny = exact_dedup_ids(
            rd.from_pandas(corpus).repartition(5)).to_pandas()
    finally:
        ctx.target_max_block_size = old
    assert sorted(got_tiny["doc_id"]) == want


def test_quality_dedup_winner_semantics():
    """quality_dedup_ids keeps the HIGHEST-quality variant per
    normalized-prefix bucket (tie: min id), verified against a naive
    pandas window reimplementation, under repartitioning."""
    from kgdata_ray.stages.dedup import quality_dedup_ids
    from kgdata_ray.stages.textstats import (
        _PUNCT_RE, _TOKEN_RE, _quality_from_counts)

    base = ("The quick brown fox jumps over the lazy dog near the "
            "river bank, watching boats drift by slowly. ")
    rows = []
    # three variants of the same normalized head: casing + whitespace
    # changes alter quality (n_chars moves) but not the bucket key
    rows.append({"doc_id": 3, "text": base * 4})
    rows.append({"doc_id": 1, "text": (base * 4).upper()})
    rows.append({"doc_id": 2, "text": (base * 4).replace(" ", "   ")})
    # an unrelated singleton
    rows.append({"doc_id": 9, "text": "completely different text here."})
    # an exact tie (identical text, different ids) -> min id wins;
    # distinct head so it forms its own bucket
    tie = "Entirely separate bucket sentence for the tie case. " * 3
    rows.append({"doc_id": 21, "text": tie})
    rows.append({"doc_id": 20, "text": tie})
    df = pd.DataFrame(rows)

    def naive(d: pd.DataFrame) -> pd.DataFrame:
        t = d["text"]
        q = _quality_from_counts(
            t.str.len().to_numpy(np.float64),
            t.str.count(_TOKEN_RE).to_numpy(np.float64),
            t.str.count(_PUNCT_RE).to_numpy(np.float64))
        bucket = (t.str.lower().str.replace(r"\s+", " ", regex=True)
                  .str.strip().str.slice(0, 40))
        w = pd.DataFrame({"doc_id": d["doc_id"], "bucket": bucket,
                          "quality": np.round(q, 6)})
        w = w.sort_values(["bucket", "quality", "doc_id"],
                          ascending=[True, False, True], kind="stable")
        return (w.drop_duplicates("bucket")[["doc_id", "quality"]]
                .sort_values("doc_id").reset_index(drop=True))

    want = naive(df)
    got = (quality_dedup_ids(rd.from_pandas(df).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    # tie within (20, 21): min id 20 must be the survivor
    assert 20 in set(got["doc_id"]) and 21 not in set(got["doc_id"])


def _brute_pairs(corpus, features, threshold):
    feats = {r.doc_id: features(r.text) for r in corpus.itertuples()}
    out = set()
    for a, b in combinations(sorted(feats), 2):
        if jaccard(feats[a], feats[b]) >= threshold:
            out.add((a, b))
    return out


def test_minhash_vs_bruteforce(corpus):
    got = minhash_pairs(
        rd.from_pandas(corpus), threshold=0.6, seed=7
    ).to_pandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    want = _brute_pairs(corpus, lambda t: char_shingle_hashes(t, 5), 0.6)
    # verification step guarantees precision; planted high-sim dups
    # guarantee recall at these LSH parameters
    assert got_pairs <= want
    high = _brute_pairs(corpus, lambda t: char_shingle_hashes(t, 5), 0.85)
    assert high <= got_pairs
    assert len(got_pairs) >= 11  # 10 planted near-dups + 1 exact dup


def test_ngram_jaccard_pairs(corpus):
    got = ngram_jaccard_pairs(
        rd.from_pandas(corpus), threshold=0.5
    ).to_pandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    want = _brute_pairs(corpus, lambda t: word_ngram_hashes(t, 3), 0.5)
    assert got_pairs <= want
    high = _brute_pairs(corpus, lambda t: word_ngram_hashes(t, 3), 0.9)
    assert high <= got_pairs


def test_simhash_pairs(corpus):
    got = simhash_pairs(rd.from_pandas(corpus), max_hamming=3).to_pandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    # the exact dup has hamming 0 from its source and must be found
    assert (corpus["doc_id"].iloc[0], 20_000) in got_pairs
    assert (got["hamming"] <= 3).all()


def test_embedding_pairs_vs_bruteforce():
    # threshold chosen below the corpus max cosine (~0.479) so the
    # result is non-empty
    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    got = embedding_pairs(ds, threshold=0.4).to_pandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))

    df = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.vstack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = np.round(mat @ mat.T, 6)
    ids = df["vec_id"].to_numpy()
    want = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if sims[i, j] >= 0.4
    }
    assert want and got_pairs == want


def test_embedding_pairs_multiblock_shuffled_ids():
    """Regression (round-3 ADVICE): with several cross-product blocks
    and ids NOT monotone across blocks, off-diagonal block pairs whose
    first-block id exceeds the second-block id must still be emitted
    (canonicalized lo/hi), not dropped."""
    df = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    # reverse the ids so block order and id order disagree
    df = df.iloc[::-1].reset_index(drop=True)
    got = embedding_pairs(
        rd.from_pandas(df), threshold=0.4, target_block_rows=16
    ).to_pandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))

    mat = np.vstack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = np.round(mat @ mat.T, 6)
    ids = df["vec_id"].to_numpy()
    want = {
        (min(int(ids[i]), int(ids[j])), max(int(ids[i]), int(ids[j])))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if sims[i, j] >= 0.4
    }
    assert want and got_pairs == want
    assert (got["id_a"] < got["id_b"]).all()


def test_token_hashes_vs_scalar_reference():
    """The vectorized token/n-gram hashers equal a naive scalar
    implementation of the same polynomial scheme."""
    from kgdata_ray.stages.dedup import _MASK32, _NGRAM_FOLD, _POW257, token_hashes

    def scalar_token_hashes(text):
        out = []
        for tok in text.lower().encode("utf-8").split():
            h = 0
            for p, c in enumerate(tok):
                h = (h + c * int(_POW257[p % len(_POW257)])) & int(_MASK32)
            out.append(h)
        return out

    def scalar_ngrams(text, n):
        th = scalar_token_hashes(text)
        th = th + [0] * max(0, n - len(th))
        out = {
            sum(th[i + k] * int(_NGRAM_FOLD[k]) for k in range(n)) & int(_MASK32)
            for i in range(len(th) - n + 1)
        }
        return sorted(out)

    texts = [
        "Alpha beta GAMMA  delta", "one", "", "   ", "tab\tsep\nlines",
        "punct, stays. inside tokens!", "ünïcode tökensökay",
    ]
    for t in texts:
        assert token_hashes(t).tolist() == scalar_token_hashes(t), t
        assert word_ngram_hashes(t, 3).tolist() == scalar_ngrams(t, 3), t
        assert word_ngram_hashes(t, 1).tolist() == scalar_ngrams(t, 1), t


def test_join_and_broadcast_verifiers_equal(corpus):
    ds = rd.from_pandas(corpus)
    for fn, kw in (
        (minhash_pairs, dict(threshold=0.6, seed=7)),
        (ngram_jaccard_pairs, dict(threshold=0.5)),
    ):
        a = fn(ds, verifier="join", **kw).to_pandas()
        b = fn(ds, verifier="broadcast", **kw).to_pandas()
        key = ["id_a", "id_b"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a[key + ["jaccard"]], b[key + ["jaccard"]])


def test_embedding_pairs_lsh_recall():
    from kgdata_ray.stages.dedup import embedding_pairs_lsh

    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    exact = embedding_pairs(ds, threshold=0.4).to_pandas()
    exact_pairs = set(zip(exact["id_a"], exact["id_b"]))
    assert exact_pairs

    # cos 0.4 -> bit-agree prob ~0.63; bits=4, 16 tables -> bucket-share
    # prob ~0.94 at the threshold boundary, higher above it
    lsh = embedding_pairs_lsh(
        ds, threshold=0.4, num_tables=16, bits=4, seed=23
    ).to_pandas()
    lsh_pairs = set(zip(lsh["id_a"], lsh["id_b"]))
    # exact precision (every emitted pair passes the exact threshold)
    assert lsh_pairs <= exact_pairs
    recall = len(lsh_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.9, recall


def test_dedup_clusters():
    pairs = rd.from_items(
        [
            {"id_a": 1, "id_b": 2},
            {"id_a": 2, "id_b": 3},
            {"id_a": 7, "id_b": 9},
        ]
    )
    lab = {
        r["node_id"]: r["component_id"]
        for r in dedup_clusters(pairs).take_all()
    }
    assert lab == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_segment_and_span_dedup_batching_invariance():
    """Identical output under pathological 4 KiB blocks + shuffled row
    order: the winner rule is a global min over (doc_id, seg/pos), so
    neither batching nor input order may leak into the result (the
    round-2 ADVICE failure mode for the block-cross kernel)."""
    import pandas as pd
    import ray.data as rd
    from ray.data import DataContext

    from kgdata_ray.stages.dedup import segment_dedup, span_dedup

    path = "/root/testdata/sf0.001/documents.parquet"

    def norm(ds):
        return (
            ds.to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    base_seg = norm(segment_dedup(rd.read_parquet(path)))
    base_span = norm(span_dedup(rd.read_parquet(path)))

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 4 * 1024
    try:
        shuffled = rd.read_parquet(path).random_shuffle(seed=7)
        got_seg = norm(segment_dedup(shuffled))
        shuffled2 = rd.read_parquet(path).random_shuffle(seed=7)
        got_span = norm(span_dedup(shuffled2))
    finally:
        ctx.target_max_block_size = old

    pd.testing.assert_frame_equal(base_seg, got_seg)
    pd.testing.assert_frame_equal(base_span, got_span)


def test_leakage_safe_split_no_pair_straddles(ray_session):
    """Every near-dup pair must land in ONE split; fractions roughly
    honored; unpaired docs keyed by their own id."""
    import pandas as pd
    import ray.data as rd

    from kgdata_ray.stages.dedup import leakage_safe_split

    docs = pd.DataFrame({"doc_id": range(200),
                         "text": [f"t{i}" for i in range(200)]})
    # chain 0-1-2, pair (10,11), pair (50,51)
    pairs = pd.DataFrame({"id_a": [0, 1, 10, 50],
                          "id_b": [1, 2, 11, 51]})
    out = leakage_safe_split(rd.from_pandas(docs).repartition(5),
                             rd.from_pandas(pairs)).to_pandas()
    assert len(out) == 200 and out["doc_id"].is_unique
    by_id = out.set_index("doc_id")
    for a, b in [(0, 1), (1, 2), (10, 11), (50, 51)]:
        assert by_id.loc[a, "split"] == by_id.loc[b, "split"]
        assert by_id.loc[a, "group_id"] == by_id.loc[b, "group_id"]
    assert by_id.loc[0, "group_id"] == 0  # min-id component rep
    lone = by_id.drop([0, 1, 2, 10, 11, 50, 51])
    assert (lone["group_id"] == lone.index).all()
    frac = (out["split"] == "train").mean()
    assert 0.6 < frac < 0.95


def test_fuzzy_contamination_cross_side_only():
    import ray.data as rd

    from kgdata_ray.stages.dedup import fuzzy_contamination

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon") * 3
    other = ("one two three four five six seven eight nine ten "
             "eleven twelve thirteen fourteen fifteen sixteen") * 3
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [base,          # near-dup of the probe
                 base + " !!",  # ALSO a self near-dup of doc 1
                 other,         # unrelated
                 "tiny"],
    })
    # probe = truncated copy of base only
    probe = pd.DataFrame({
        "doc_id": [100],
        "text": [" ".join(base.split(" ")[:48])],
    })
    got = fuzzy_contamination(
        rd.from_pandas(docs).repartition(3), rd.from_pandas(probe),
        threshold=0.5).to_pandas()
    ids = sorted(got["doc_id"])
    # docs 1 and 2 contaminated (both near the probe); 3/4 are not —
    # and the 1-2 self-pair alone must NOT mark anything
    assert ids == [1, 2]
