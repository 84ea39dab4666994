"""Unit tests for the wordcount family (stages/textstats.py:
word_counts, doc_top_terms) and the melt unpivot
(functions/blocks.py:melt) on adversarial inputs: mixed case,
punctuation runs, digits, empty docs, tf ties at the top-k cut."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

DOCS = pd.DataFrame({
    "doc_id": [1, 2, 3, 4],
    "text": [
        "The cat... the CAT, the hat! 42 42",
        "dog dog dog cat",
        "",                      # empty doc: contributes nothing
        "zeta alpha beta alpha zeta beta",   # 3-way tf tie → term order
    ],
})


def test_word_counts_matches_naive():
    from kgdata_ray.stages.textstats import word_counts

    got = word_counts(rd.from_pandas(DOCS).repartition(3),
                      top_n=5).to_pandas()
    import re
    toks = []
    for t in DOCS["text"]:
        toks += [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
    ref = (
        pd.Series(toks).value_counts().rename_axis("term")
        .reset_index(name="n")
    )
    ref = ref.sort_values(["n", "term"], ascending=[False, True]) \
        .head(5).reset_index(drop=True)
    ref["n"] = ref["n"].astype("int64")
    pd.testing.assert_frame_equal(got.reset_index(drop=True), ref)
    assert got.iloc[0]["term"] in {"the", "cat", "dog"}


def test_doc_top_terms_ties_and_df():
    from kgdata_ray.stages.textstats import doc_top_terms

    got = (
        doc_top_terms(rd.from_pandas(DOCS).repartition(2), k=2)
        .to_pandas().sort_values(["doc_id", "term"]).reset_index(drop=True)
    )
    # doc 4: alpha/beta/zeta all tf=2 → term-asc pins alpha, beta
    d4 = got[got.doc_id == 4]
    assert list(d4["term"]) == ["alpha", "beta"]
    assert list(d4["tf"]) == [2, 2]
    # df: 'cat' appears in docs 1 and 2
    cat = got[(got.doc_id == 2) & (got.term == "cat")]
    if len(cat):
        assert int(cat["df"].iloc[0]) == 2
    # empty doc emits no rows
    assert not (got.doc_id == 3).any()
    # every doc with text has ≤ k rows
    assert got.groupby("doc_id").size().max() <= 2


def test_melt_roundtrip():
    from kgdata_ray.functions.blocks import melt

    df = pd.DataFrame({
        "id": [1, 2, 3],
        "a": [0.5, np.nan, 2.5],
        "b": [1.0, 2.0, 3.0],
    })
    got = (
        melt(rd.from_pandas(df).repartition(2), id_vars=["id"],
             value_vars=["a", "b"], var_name="m", value_name="v")
        .to_pandas().sort_values(["id", "m"]).reset_index(drop=True)
    )
    ref = pd.melt(df, id_vars=["id"], value_vars=["a", "b"],
                  var_name="m", value_name="v") \
        .sort_values(["id", "m"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)


def test_ngram_contamination_matches_naive():
    from kgdata_ray.stages.textstats import ngram_contamination

    import re
    corpus = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "alpha beta gamma delta epsilon",     # shares 4-gram w/ probe
            "alpha beta gamma DELTA zeta",        # case-folded share
            "one two three four five",            # no overlap
            "beta gamma delta epsilon omega",     # shares shifted 4-gram
            "short text",                         # too short for 4-grams
        ],
    })
    probe = pd.DataFrame({
        "doc_id": [100],
        "text": ["alpha beta gamma delta epsilon"],
    })
    got = (
        ngram_contamination(rd.from_pandas(corpus).repartition(3),
                            rd.from_pandas(probe), n=4)
        .to_pandas()["doc_id"].sort_values().tolist()
    )

    def grams(t, n=4):
        toks = [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    pg = set().union(*(grams(t) for t in probe["text"]))
    ref = sorted(
        d for d, t in zip(corpus["doc_id"], corpus["text"])
        if grams(t) & pg
    )
    assert got == ref == [1, 2, 4]


def test_keyword_extract_batching_invariant(ray_session):
    import pandas as pd
    import ray.data as rd

    from kgdata_ray.stages.textstats import keyword_extract

    df = pd.DataFrame({
        "doc_id": range(40),
        "text": [" ".join(["alpha", "beta", "gamma"][: 1 + i % 3]
                          * (1 + i % 4)) + f" unique{i}"
                 for i in range(40)],
    })
    a = keyword_extract(rd.from_pandas(df)).to_pandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    b = keyword_extract(rd.from_pandas(df).repartition(7)).to_pandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)
    # every document's doc-unique token (the highest-idf term) makes
    # its keyword set, and scores are non-increasing in rank
    g = a.groupby("doc_id")
    assert (g["term"].apply(
        lambda t: t.str.startswith("unique").any())).all()
    assert (g["tfidf_micro"].apply(
        lambda s: (s.diff().dropna() <= 0).all())).all()
