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
