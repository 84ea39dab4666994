"""Cross-corpus incremental dedup vs a naive set-based reference."""

import numpy as np
import pandas as pd


def test_incremental_dedup_matches_naive(ray_session):
    import ray.data as rd

    from kgdata_ray.stages.dedup import incremental_dedup

    old_texts = ["alpha beta", "gamma delta", "unique old"]
    new_rows = [
        (10, "alpha beta"),      # in old -> dropped
        (11, "fresh one"),
        (12, "fresh two"),
        (13, "fresh one"),       # within-new dup -> loses to 11
        (14, "gamma delta"),     # in old -> dropped
        (15, "fresh two"),       # within-new dup -> loses to 12
        (16, "another fresh"),
    ]
    old = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(3, dtype=np.int64), "text": old_texts}))
    new = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.array([r[0] for r in new_rows], np.int64),
         "text": [r[1] for r in new_rows]}))

    got = (incremental_dedup(new, old).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    seen = set(old_texts)
    want = {}
    for i, t in new_rows:
        if t not in seen and t not in want:
            want[t] = i
    assert sorted(got["doc_id"]) == sorted(want.values())
    assert set(got["text"]) == set(want)


def test_incremental_dedup_empty_old_overlap(ray_session):
    import ray.data as rd

    from kgdata_ray.stages.dedup import incremental_dedup

    new = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(5, dtype=np.int64),
         "text": ["a", "b", "a", "c", "b"]}))
    old = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.array([99], np.int64), "text": ["zzz"]}))
    got = incremental_dedup(new, old).to_pandas()
    assert sorted(got["doc_id"]) == [0, 1, 3]
