import numpy as np
import pandas as pd
import pytest


def _toy_docs() -> pd.DataFrame:
    rng = np.random.default_rng(11)
    target_words = ["proof", "lemma", "theorem", "axiom", "corollary"]
    other_words = ["goal", "match", "score", "league", "season"]
    rows = []
    for i in range(120):
        src = "src0" if i % 4 == 0 else f"src{1 + i % 3}"
        pool = target_words if src == "src0" else other_words
        n = int(rng.integers(5, 30))
        words = [pool[int(rng.integers(len(pool)))] for _ in range(n)]
        rows.append({"doc_id": i, "text": " ".join(words),
                     "lang": "en", "source": src})
    # a raw-pool doc written in the target vocabulary: DSIR should
    # weight it far above its source-mates
    rows.append({"doc_id": 999, "text": "proof lemma theorem axiom",
                 "lang": "en", "source": "src1"})
    return pd.DataFrame(rows)


def test_dsir_scores_batching_invariant_and_directional(ray_session):
    import ray.data as rd

    from kgdata_ray.stages.selection import dsir_scores

    df = _toy_docs()
    a = dsir_scores(rd.from_pandas(df), target_source="src0") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = dsir_scores(rd.from_pandas(df).repartition(9),
                    target_source="src0") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)

    merged = a.merge(df[["doc_id", "source"]], on="doc_id")
    per_gram = merged["weight_micro"] / merged["n_grams"].clip(lower=1)
    tgt = per_gram[merged["source"] == "src0"].mean()
    raw = per_gram[merged["source"] != "src0"].mean()
    assert tgt > raw  # target-domain docs carry higher importance
    # the planted target-vocab doc outscores every other raw-pool doc
    others = merged[merged["source"] != "src0"]
    assert (others.set_index("doc_id")["weight_micro"].idxmax() == 999)


def test_dsir_select_is_topk_of_scores(ray_session):
    import ray.data as rd

    from kgdata_ray.stages.selection import dsir_select, dsir_scores

    df = _toy_docs()
    sel = dsir_select(rd.from_pandas(df), k=10, target_source="src0") \
        .to_pandas()
    assert len(sel) == 10
    # keys are weight + Gumbel(micro); k largest, unique doc ids
    assert sel["doc_id"].is_unique
    scored = dsir_scores(rd.from_pandas(df), target_source="src0") \
        .to_pandas().set_index("doc_id")["weight_micro"]
    got = sel.set_index("doc_id")["weight_micro"]
    assert (scored.loc[got.index] == got).all()
    # selection is invariant to input partitioning
    sel2 = dsir_select(rd.from_pandas(df).repartition(7), k=10,
                       target_source="src0").to_pandas()
    lhs = sel.sort_values("doc_id").reset_index(drop=True)
    rhs = sel2.sort_values("doc_id").reset_index(drop=True)
    assert lhs.equals(rhs)


def test_shuffle_order_is_deterministic_permutation():
    import ray.data as rd

    from kgdata_ray.functions.sampling import shuffle_order

    df = pd.DataFrame({"doc_id": np.arange(123, dtype=np.int64),
                       "text": ["x"] * 123})
    a = shuffle_order(rd.from_pandas(df)).to_pandas()
    assert sorted(a["shuffle_pos"]) == list(range(123))
    assert a["doc_id"].is_unique
    # identical under a different partitioning, different under a
    # different salt
    b = shuffle_order(rd.from_pandas(df).repartition(9)).to_pandas()
    assert a.sort_values("doc_id").reset_index(drop=True).equals(
        b.sort_values("doc_id").reset_index(drop=True))
    c = shuffle_order(rd.from_pandas(df), salt="epoch1").to_pandas()
    merged = a.merge(c, on="doc_id", suffixes=("_a", "_c"))
    assert (merged["shuffle_pos_a"] != merged["shuffle_pos_c"]).any()
    # not the identity order (it actually shuffles)
    assert (a.sort_values("doc_id")["shuffle_pos"].to_numpy()
            != np.arange(123)).any()


def test_token_budget_select_maximal_prefix():
    import ray.data as rd

    from kgdata_ray.stages.selection import token_budget_select
    from kgdata_ray.stages.textstats import (
        quality_score_batch,
        token_counts_batch,
    )

    rng = np.random.default_rng(7)
    texts = [" ".join(
        rng.choice(["alpha", "beta", "gamma", "delta!", "x,y."],
                   size=rng.integers(3, 40)).tolist())
        for _ in range(60)]
    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                       "text": texts})
    budget = 300
    got = token_budget_select(
        rd.from_pandas(df).repartition(5), budget).to_pandas()
    # sequential reference: sort by (quality desc, id), cumsum, cut
    ref = quality_score_batch(df)
    ref["n_tokens_bpe"] = token_counts_batch(df)["n_tokens_bpe"]
    ref = ref.sort_values(["quality", "doc_id"],
                          ascending=[False, True], kind="mergesort")
    ref["cum_tokens"] = ref["n_tokens_bpe"].cumsum()
    ref = ref[ref["cum_tokens"] <= budget]
    lhs = got.sort_values("doc_id").reset_index(drop=True)
    rhs = ref.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "quality", "n_tokens_bpe", "cum_tokens"]]
    pd.testing.assert_frame_equal(
        lhs[["doc_id", "quality", "n_tokens_bpe", "cum_tokens"]], rhs)
    assert got["cum_tokens"].max() <= budget
    assert 0 < len(got) < 60
