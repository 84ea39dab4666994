

def test_ann_recall_full_probe_is_perfect(ray_session):
    """With nprobe == num_centroids the IVF scans everything, so
    recall@k must be exactly 1000 for every query; with nprobe=1 it
    stays within [0, 1000] and n_common consistent."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kgdata_ray.stages.similarity import ann_recall

    rng = np.random.default_rng(11)
    n, d = 60, 6
    emb = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [rng.normal(size=d).astype(np.float32).tolist()
                      for _ in range(n)],
    }))
    full = ann_recall(emb, [0, 1, 2, 3], k=4, num_centroids=4,
                      nprobe=4).to_pandas()
    assert (full["recall_milli"] == 1000).all()
    assert (full["n_common"] == 4).all()
    part = ann_recall(emb, [0, 1, 2, 3], k=4, num_centroids=4,
                      nprobe=1).to_pandas()
    assert ((part["recall_milli"] >= 0)
            & (part["recall_milli"] <= 1000)).all()
    assert (part["recall_milli"] == part["n_common"] * 1000 // 4).all()


def test_embedding_pca_batching_invariant(ray_session):
    """The int64 moment accumulation makes the projection bit-identical
    under different block layouts, and the pinned sign rule makes the
    largest-loading dimension's coefficient positive."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kgdata_ray.stages.similarity import embedding_pca

    rng = np.random.default_rng(3)
    n, d = 90, 5
    base = rng.normal(size=(n, d)) * np.array([3.0, 1.0, 0.5, 0.2, 0.1])
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [r.astype(np.float32).tolist() for r in base],
    })
    a = embedding_pca(rd.from_pandas(df), n_components=2) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    b = embedding_pca(rd.from_pandas(df).repartition(7), n_components=2) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)
    # pc0 should capture the dominant axis: correlation with dim 0
    c = np.corrcoef(a["pc0_micro"].to_numpy(np.float64), base[:, 0])[0, 1]
    assert abs(c) > 0.95


def test_linear_probe_batching_invariant_and_separates(ray_session):
    """Identical moments under any block layout; on linearly-separable
    data the probe actually separates the target class."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kgdata_ray.stages.similarity import linear_probe

    rng = np.random.default_rng(7)
    n, d = 120, 6
    y = (np.arange(n) % 3 == 0).astype(np.int64)
    base = rng.normal(size=(n, d)) * 0.3
    base[:, 0] += y * 2.0  # dim 0 carries the class signal
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [r.astype(np.float32).tolist() for r in base],
        "label": np.where(y == 1, 0, 5).astype(np.int32),
    })
    a = linear_probe(rd.from_pandas(df), target_label=0) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    b = linear_probe(rd.from_pandas(df).repartition(8), target_label=0) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)
    pos = a.loc[a["is_target"] == 1, "score_micro"]
    neg = a.loc[a["is_target"] == 0, "score_micro"]
    assert pos.mean() > neg.mean() + 200_000  # clear margin in micro


def test_contrastive_pairs_exact_and_batching_invariant(ray_session):
    """Positives share the query's label (never the query itself),
    negatives never do; results identical under any block layout."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kgdata_ray.stages.similarity import contrastive_pairs

    rng = np.random.default_rng(5)
    n, d = 80, 6
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [rng.normal(size=d).astype(np.float32).tolist()
                      for _ in range(n)],
        "label": (np.arange(n) % 4).astype(np.int32),
    })
    a = contrastive_pairs(rd.from_pandas(df), query_mod=10) \
        .to_pandas().sort_values(["query_id", "kind"]) \
        .reset_index(drop=True)
    b = contrastive_pairs(rd.from_pandas(df).repartition(9),
                          query_mod=10) \
        .to_pandas().sort_values(["query_id", "kind"]) \
        .reset_index(drop=True)
    assert a.equals(b)
    assert len(a) == 16  # 8 queries x (pos, neg)
    lab = df.set_index("vec_id")["label"]
    for _, r in a.iterrows():
        same = lab[r["query_id"]] == lab[r["cand_id"]]
        assert same == (r["kind"] == "pos")
        assert r["kind"] == "neg" or r["cand_id"] != r["query_id"]


def test_contrastive_pairs_bounded_query_side(ray_session):
    """Explicit query_ids, tiny query_tile tiling, and the zero-query
    guard: tiled output is identical to the one-tile output; explicit
    ids equal the mod-selection of the same ids; zero queries return
    an empty dataset with the stable output schema."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kgdata_ray.stages.similarity import contrastive_pairs

    rng = np.random.default_rng(11)
    n, d = 60, 5
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [rng.normal(size=d).astype(np.float32).tolist()
                      for _ in range(n)],
        "label": (np.arange(n) % 3).astype(np.int32),
    })
    ds = rd.from_pandas(df).repartition(7)

    base = contrastive_pairs(ds, query_mod=10) \
        .to_pandas().sort_values(["query_id", "kind"]).reset_index(drop=True)
    tiled = contrastive_pairs(ds, query_mod=10, query_tile=2) \
        .to_pandas().sort_values(["query_id", "kind"]).reset_index(drop=True)
    assert base.equals(tiled)

    explicit = contrastive_pairs(
        ds, query_ids=[0, 10, 20, 30, 40, 50], query_tile=3) \
        .to_pandas().sort_values(["query_id", "kind"]).reset_index(drop=True)
    assert explicit.equals(base)

    empty = contrastive_pairs(ds, query_ids=[], query_tile=4)
    assert empty.count() == 0
    assert empty.schema().names == ["query_id", "kind", "cand_id", "dist_q"]


def test_pca_probe_empty_and_degenerate_inputs(ray_session):
    """embedding_pca / linear_probe raise clear errors instead of
    opaque IndexErrors on empty input; pca also rejects n == 1."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from kgdata_ray.stages.similarity import embedding_pca, linear_probe

    empty = pd.DataFrame({
        "vec_id": pd.Series([], dtype="int64"),
        "embedding": pd.Series([], dtype="object"),
        "label": pd.Series([], dtype="int64"),
    })
    one = pd.DataFrame({
        "vec_id": [7], "embedding": [[0.5, -0.25, 1.0]], "label": [1],
    })
    with pytest.raises(ValueError, match="empty"):
        embedding_pca(rd.from_pandas(empty), n_components=2).materialize()
    with pytest.raises(ValueError, match=">= 2 vectors"):
        embedding_pca(rd.from_pandas(one), n_components=1).materialize()
    with pytest.raises(ValueError, match="empty"):
        linear_probe(rd.from_pandas(empty), target_label=1).materialize()


def test_embedding_contamination_threshold_and_probe():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kgdata_ray.stages.similarity import embedding_contamination

    rng = np.random.default_rng(3)
    base = rng.normal(size=(6, 8))
    vecs = [list(map(float, v)) for v in base]
    corpus = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(6, dtype=np.int64), "embedding": vecs}))
    # probe: a tiny perturbation of vector 2 (cosine ~1) plus an
    # unrelated random vector
    probe = rd.from_pandas(pd.DataFrame({
        "vec_id": np.array([100, 101], dtype=np.int64),
        "embedding": [list(map(float, base[2] + 0.001)),
                      list(map(float, rng.normal(size=8)))],
    }))
    got = sorted(embedding_contamination(
        corpus, probe, threshold=0.95).to_pandas()["vec_id"])
    assert got == [2]


def test_mmr_select_matches_naive_and_batching_invariant(ray_session):
    """mmr_select's greedy picks equal a naive sequential MMR (same
    int64 fixed-point spec, recompute-everything style) and are
    bit-identical under different block layouts; first pick is the
    pure-relevance argmax; picks are distinct; no-seed input raises."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from kgdata_ray.stages.similarity import mmr_select

    rng = np.random.default_rng(7)
    n, d, k, scale = 50, 8, 6, 1 << 20
    vecs = rng.normal(size=(n, d))
    ids = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({
        "vec_id": ids,
        "embedding": [v.astype(np.float32).tolist() for v in vecs],
    })

    # naive: recompute rel/maxsim from scratch over float32-sourced
    # vectors, scanning candidates in a python loop
    m = np.vstack([np.asarray(v, np.float64) for v in df["embedding"]])
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    fx = np.floor(m / nrm * scale).astype(np.int64)
    seeds = fx[ids % 101 == 0]
    q = seeds.sum(axis=0, dtype=np.int64) // len(seeds)
    picked: list[int] = []
    for _ in range(k):
        best_key = None
        for i in range(n):
            if ids[i] in picked:
                continue
            rel = int(fx[i] @ q)
            ms = max((int(fx[i] @ fx[ids == p][0]) for p in picked),
                     default=0)
            key = (-(7 * rel - 3 * ms), int(ids[i]))
            if best_key is None or key < best_key:
                best_key = key
        picked.append(best_key[1])

    got = mmr_select(rd.from_pandas(df).repartition(5),
                     k=k).to_pandas()
    assert got["vec_id"].tolist() == picked
    assert got["sel_rank"].tolist() == list(range(k))
    assert got["vec_id"].is_unique
    # first pick is the pure-relevance argmax (maxsim contributes 0)
    assert got["vec_id"].iloc[0] == ids[np.lexsort((ids, -(fx @ q)))[0]]
    # block-layout invariance
    got1 = mmr_select(rd.from_pandas(df).repartition(1), k=k).to_pandas()
    pd.testing.assert_frame_equal(got, got1)
    # no seed ids -> clear error
    with pytest.raises(ValueError, match="no seed rows"):
        mmr_select(rd.from_pandas(df[df.vec_id > 0]), k=2,
                   seed_mod=10_000).to_pandas()
