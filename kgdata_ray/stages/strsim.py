"""String-similarity (edit-distance) self-join.

Entity-resolution primitive: all pairs of distinct strings within
Levenshtein distance ``max_dist``, found WITHOUT the O(N²) all-pairs
scan — the classic q-gram blocking plan (Gravano et al. 2001,
"Approximate string joins in a database (almost) for free"):

  1. distinct strings → explode each into its distinct positional-free
     q-grams (one shuffle key per gram),
  2. per-gram grouped pair generation = candidate pairs (two strings
     within distance d of each other MUST share a q-gram whenever
     ``max(len) >= q*(d+1)`` — the count-filter bound; shorter strings
     all get one extra synthetic gram so short-short pairs are never
     lost),
  3. exact Levenshtein verify over the candidate table (bounded by the
     blocking; a length pre-filter skips pairs that cannot qualify).

Reference analog: the alias/label fuzzy matching surface of the
reference's linking pipelines (``kgdata/wikidata/datasets/
norm_mentions.py`` normalizes, this adds the typo-tolerant join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

_SHORT_GRAM = "\x00short"


def levenshtein(s1: str, s2: str) -> int:
    """Textbook two-row DP; strings here are short (names/aliases)."""
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1, 1):
        cur = [i]
        for j, c2 in enumerate(s2, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (c1 != c2)))
        prev = cur
    return prev[-1]


def _grams(s: str, q: int, short_len: int) -> list[str]:
    gs = {s[i:i + q] for i in range(len(s) - q + 1)}
    if len(s) < short_len:
        gs.add(_SHORT_GRAM)
    return sorted(gs)


def edit_distance_pairs(
    ds: Dataset, col: str, *, max_dist: int = 2, q: int = 2,
    max_group: int = 5000,
) -> Dataset:
    """``(name_a < name_b, dist)`` for every distinct-string pair with
    Levenshtein distance <= ``max_dist``. Exact (blocking is lossless;
    see module docstring). ``max_group`` caps pair generation under a
    pathological hot gram — deterministic first-K rule, far above any
    test-scale group."""
    from ..functions.agg import distinct_rows, grouped_blockwise

    short_len = q * (max_dist + 1)
    names = distinct_rows(ds.select_columns([col]), [col])

    def explode(b: pd.DataFrame) -> pa.Table:
        ss, gs = [], []
        for s in b[col]:
            for g in _grams(s, q, short_len):
                ss.append(s)
                gs.append(g)
        return pa.table({"gram": pa.array(gs, pa.string()),
                         "name": pa.array(ss, pa.string())})

    grams = names.map_batches(explode, batch_format="pandas")

    def pairs(b: pd.DataFrame) -> pa.Table:
        ak, bk = [], []
        for _, g in b.groupby("gram", sort=False):
            ents = np.sort(g["name"].unique())[:max_group]
            if len(ents) < 2:
                continue
            i, j = np.triu_indices(len(ents), k=1)
            ak.append(ents[i])
            bk.append(ents[j])
        if not ak:
            return pa.table({"name_a": pa.array([], pa.string()),
                             "name_b": pa.array([], pa.string())})
        out = pd.DataFrame({"name_a": np.concatenate(ak),
                            "name_b": np.concatenate(bk)})
        return pa.Table.from_pandas(out.drop_duplicates(),
                                    preserve_index=False)

    cand = distinct_rows(
        grouped_blockwise(grams, ["gram"], pairs),
        ["name_a", "name_b"])

    def verify(b: pd.DataFrame) -> pa.Table:
        a = b["name_a"].to_numpy()
        c = b["name_b"].to_numpy()
        lens_ok = np.abs(
            np.char.str_len(a.astype(str))
            - np.char.str_len(c.astype(str))) <= max_dist
        dist = np.full(len(b), max_dist + 1, dtype=np.int64)
        for i in np.nonzero(lens_ok)[0]:
            dist[i] = levenshtein(a[i], c[i])
        keep = dist <= max_dist
        return pa.table({
            "name_a": pa.array(a[keep], pa.string()),
            "name_b": pa.array(c[keep], pa.string()),
            "dist": pa.array(dist[keep], pa.int64()),
        })

    return cand.map_batches(verify, batch_format="pandas")
