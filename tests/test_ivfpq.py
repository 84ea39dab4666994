"""IVF-PQ ANN: engine vs the sequential same-spec golden, plus a
recall sanity check against exact integer distances."""

import numpy as np
import pandas as pd


def _mkdata(n=160, dim=8, seed=7):
    rng = np.random.RandomState(seed)
    v = rng.randn(n, dim)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [list(map(float, x)) for x in v],
    }), v


def test_knn_ivfpq_matches_golden(ray_session):
    import ray.data as rd

    from kgdata_ray.oracle_sketch import golden_knn_ivfpq
    from kgdata_ray.stages.similarity import knn_ivfpq

    df, _ = _mkdata()
    ds = rd.from_pandas(df).repartition(5)  # force multi-block
    got = (knn_ivfpq(ds, list(range(6)), k=4, coarse_k=4, nprobe=2,
                     m=4, pq_k=8, train_prefix=64)
           .to_pandas()
           .sort_values(["query_id", "rank"]).reset_index(drop=True))
    want = golden_knn_ivfpq(
        df["vec_id"].tolist(), df["embedding"].tolist(),
        query_ids=range(6), k=4, coarse_k=4, nprobe=2, m=4, pq_k=8,
        train_prefix=64,
    ).to_pandas()
    pd.testing.assert_frame_equal(
        got[["query_id", "rank", "neighbor_id", "adc_fx"]], want)


def test_knn_ivfpq_recall_reasonable(ray_session):
    import ray.data as rd

    from kgdata_ray.stages.similarity import knn_ivfpq

    df, v = _mkdata(n=200, dim=8, seed=11)
    ds = rd.from_pandas(df)
    k = 5
    got = knn_ivfpq(ds, list(range(8)), k=k, coarse_k=4, nprobe=4,
                    m=4, pq_k=16, train_prefix=200).to_pandas()
    # nprobe == coarse_k -> no pruning; compare against exact integer
    # L2 top-k on the SAME fixed-point grid to isolate PQ error
    fx = np.floor(v * (1 << 20)).astype(np.int64)
    hits = total = 0
    for q in range(8):
        d = ((fx - fx[q]) ** 2).sum(axis=1)
        d[q] = np.iinfo(np.int64).max
        exact = set(np.argsort(d, kind="stable")[:k].tolist())
        approx = set(got[got["query_id"] == q]["neighbor_id"].tolist())
        hits += len(exact & approx)
        total += k
    assert hits / total >= 0.5  # PQ with m=4 on dim-8 is coarse; sanity
