"""jaccard_set_join — exactness vs a naive all-pairs oracle, and the
round-3 VERDICT #3 contract: the token order is built distributed (no
driver vocabulary merge), so a vocabulary beyond the old 1M broadcast
cap now RUNS instead of raising."""

import numpy as np
import pandas as pd


def _naive(vals: list[str], threshold: float) -> set:
    out = set()
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            a, b = sorted((vals[i], vals[j]))
            sa, sb = set(a.split(" ")), set(b.split(" "))
            inter = len(sa & sb)
            jac = inter / (len(sa) + len(sb) - inter)
            if jac >= threshold:
                out.add((a, b, round(jac, 6)))
    return out


def test_jaccard_set_join_matches_naive(ray_session):
    import ray.data as rd

    from kgdata_ray.stages.strsim import jaccard_set_join

    rng = np.random.RandomState(7)
    base = [f"w{k}" for k in range(40)]
    vals = [" ".join(rng.choice(base, size=rng.randint(2, 8),
                                replace=False))
            for _ in range(120)]
    vals = list(dict.fromkeys(vals))
    df = pd.DataFrame({"s": vals + vals[:10]})  # duplicates too
    got = jaccard_set_join(rd.from_pandas(df), "s",
                           threshold=0.5).to_pandas()
    got_set = {(a, b, round(j, 6)) for a, b, j in
               zip(got["name_a"], got["name_b"], got["jaccard"])}
    assert got_set == _naive(vals, 0.5)
    assert len(got) == len(got_set)


def test_jaccard_set_join_paths_equal(ray_session):
    # the size-guarded broadcast fast path and the distributed join
    # path must produce identical results (same global token order)
    import ray.data as rd

    from kgdata_ray.stages.strsim import jaccard_set_join

    rng = np.random.RandomState(3)
    base = [f"w{k}" for k in range(25)]
    vals = list(dict.fromkeys(
        " ".join(rng.choice(base, size=rng.randint(2, 6), replace=False))
        for _ in range(80)))
    df = pd.DataFrame({"s": vals})
    fast = jaccard_set_join(rd.from_pandas(df), "s",
                            threshold=0.4).to_pandas()
    dist = jaccard_set_join(rd.from_pandas(df), "s", threshold=0.4,
                            vocab_broadcast_max=0).to_pandas()
    key = ["name_a", "name_b", "jaccard"]
    a = fast[key].sort_values(key).reset_index(drop=True)
    b = dist[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_jaccard_set_join_vocab_beyond_old_broadcast_cap(ray_session):
    # >1M distinct tokens: the pre-round-4 driver merge raised
    # ValueError("vocabulary exceeds the broadcast cap") here; the
    # distributed order build must run and still be exact on the
    # planted near-dup pairs.
    import ray.data as rd

    from kgdata_ray.stages.strsim import jaccard_set_join

    n_vals, toks_per = 110_000, 10  # 1.1M distinct tokens
    tok_ids = np.arange(n_vals * toks_per).reshape(n_vals, toks_per)
    vals = [" ".join(f"t{t}" for t in row) for row in tok_ids]
    # planted pair vs the t0..t9 row: inter=9, union=12 -> 0.75 >= 0.5
    vals.append(" ".join(f"t{t}" for t in range(9)) + " zA zB")
    df = pd.DataFrame({"s": vals})
    got = jaccard_set_join(rd.from_pandas(df), "s",
                           threshold=0.5).to_pandas()
    a = " ".join(f"t{t}" for t in range(10))
    b = " ".join(f"t{t}" for t in range(9)) + " zA zB"
    lo, hi = sorted((a, b))
    assert len(got) == 1
    assert (got["name_a"][0], got["name_b"][0]) == (lo, hi)
    assert got["jaccard"][0] == 0.75
