"""SemDeDup composition — engine vs a self-contained naive
reimplementation (same spec: engine k-means assignments, exact cosine
>= threshold within cluster, min-id representative)."""

import numpy as np
import pandas as pd


def test_semdedup_matches_naive(ray_session):
    import ray.data as rd

    from kgdata_ray.stages.semdedup import semdedup
    from kgdata_ray.stages.similarity import kmeans_embeddings

    rng = np.random.RandomState(11)
    dim, n = 6, 120
    base = rng.randn(n, dim)
    # plant near-dup groups: ids 100.. copy earlier vectors + tiny noise
    for t, src in enumerate([3, 3, 17, 42]):
        base[100 + t] = base[src] * (1 + 1e-7 * (t + 1))
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [list(map(float, v)) for v in base]})
    ds = rd.from_pandas(df)

    got = semdedup(ds, k=5, n_iter=3, threshold=0.95).to_pandas()
    got = got.sort_values("vec_id").reset_index(drop=True)

    # naive: reuse the engine's deterministic assignments, then redo
    # the within-cluster logic with plain loops
    assign = (kmeans_embeddings(ds, k=5, n_iter=3)
              .to_pandas().set_index("vec_id")["cluster"])
    unit = base / np.linalg.norm(base, axis=1)[:, None]
    want_rep = {}
    for cl in sorted(assign.unique()):
        ids = sorted(assign[assign == cl].index)
        parent = {i: i for i in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a_i in range(len(ids)):
            for b_i in range(a_i + 1, len(ids)):
                a, b = ids[a_i], ids[b_i]
                cos = round(float(unit[a] @ unit[b]), 6)
                if cos >= 0.95:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        for i in ids:
            want_rep[i] = find(i)

    assert dict(zip(got["vec_id"], got["rep_id"])) == want_rep
    assert (got["kept"] == (got["vec_id"] == got["rep_id"])).all()
    # the planted duplicates actually deduplicated
    dup_rows = got[got["vec_id"] >= 100]
    assert (~dup_rows["kept"]).sum() >= 3
    assert len(got) == n


def test_semdedup_all_unique_keeps_everything(ray_session):
    import ray.data as rd

    from kgdata_ray.stages.semdedup import semdedup

    rng = np.random.RandomState(5)
    v = rng.randn(40, 5)
    df = pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64),
                       "embedding": [list(map(float, x)) for x in v]})
    got = semdedup(rd.from_pandas(df), k=4, threshold=0.999).to_pandas()
    assert got["kept"].all()
    assert (got["rep_id"] == got["vec_id"]).all()


def test_semdedup_tiled_gram_exact(ray_session, monkeypatch):
    """A cluster bigger than the Gram tile must dedup identically to
    the untiled path (k=1 forces one giant cluster; tile << cluster)."""
    import ray.data as rd

    import kgdata_ray.stages.semdedup as sd

    rng = np.random.RandomState(2)
    n = 90
    base = rng.randn(n, 4)
    for t, src in enumerate([0, 5, 5, 40]):
        base[80 + t] = base[src] * (1 + 1e-8)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [list(map(float, v)) for v in base]})

    monkeypatch.setattr(sd, "_GRAM_TILE", 16)
    got = (sd.semdedup(rd.from_pandas(df), k=1, n_iter=1,
                       threshold=0.95).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    # untiled naive reference over the single cluster
    unit = base / np.linalg.norm(base, axis=1)[:, None]
    gram = np.round(unit @ unit.T, 6)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ii, jj = np.nonzero(gram >= 0.95)
    for a, b in zip(ii.tolist(), jj.tolist()):
        if a < b:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    want = [find(i) for i in range(n)]
    assert list(got["rep_id"]) == want
    assert (~got[got["vec_id"] >= 80]["kept"]).sum() >= 3


def test_embedding_dbscan_matches_golden_multiblock(ray_session):
    """Planted geometry across several blocks: two dense clusters
    (cores + an attached border each), a faraway border-less pair, and
    isolated noise — engine roles/clusters equal the naive golden."""
    import numpy as np
    import ray.data as rd

    from kgdata_ray.oracle_sketch import golden_dbscan
    from kgdata_ray.stages.similarity import embedding_dbscan

    rng = np.random.RandomState(11)
    base_a = rng.randn(8); base_b = rng.randn(8) * -1.0
    rows = []
    for i in range(6):  # cluster A cores (tight around base_a)
        rows.append((i, base_a + 0.01 * rng.randn(8)))
    rows.append((50, base_a + 0.9 * rng.randn(8)))  # likely border/noise
    for i in range(6):  # cluster B cores
        rows.append((100 + i, base_b + 0.01 * rng.randn(8)))
    for i in range(8):  # isolated noise
        rows.append((200 + i, rng.randn(8) * 3.0))
    ids = [r[0] for r in rows]
    vecs = [r[1].tolist() for r in rows]
    ds = rd.from_items(
        [{"vec_id": i, "embedding": v} for i, v in zip(ids, vecs)]
    ).repartition(5)
    got = (embedding_dbscan(ds, threshold=0.8, min_pts=4)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    want = golden_dbscan(ids, vecs, threshold=0.8, min_pts=4).to_pandas()
    assert set(got["role"]) >= {"core", "noise"}
    assert got.equals(want)
