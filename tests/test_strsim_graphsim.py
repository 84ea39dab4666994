"""Edit-distance join, Adamic-Adar and PMI — naive Python in-test
oracles on small synthetic inputs (short strings exercise the
short-gram fallback bucket)."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from kgdata_ray.stages.graph import adamic_adar, pmi_pairs
from kgdata_ray.stages.strsim import edit_distance_pairs, levenshtein


def _naive_lev(s1, s2):
    m, n = len(s1), len(s2)
    d = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        d[i][0] = i
    for j in range(n + 1):
        d[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + (s1[i - 1] != s2[j - 1]))
    return d[m][n]


def test_levenshtein_matches_naive():
    cases = [("kitten", "sitting"), ("", "abc"), ("abc", "abc"),
             ("ab", "ba"), ("flaw", "lawn"), ("a", ""), ("x", "y")]
    for a, b in cases:
        assert levenshtein(a, b) == _naive_lev(a, b)


def test_edit_distance_pairs_exact_incl_short_strings():
    names = ["red widget", "rad widget", "red widgets", "blue bolt",
             "blue belt", "bolt", "boat", "bat", "cat", "ca",
             "hot gear", "hat gear", "xylophone"]
    ds = rd.from_pandas(pd.DataFrame({"s": names * 2}))  # dup rows
    got = edit_distance_pairs(ds, "s", max_dist=2).to_pandas()
    got_set = {(r.name_a, r.name_b, r.dist) for r in got.itertuples()}
    exp = set()
    for a, b in itertools.combinations(sorted(set(names)), 2):
        d = _naive_lev(a, b)
        if d <= 2:
            exp.add((a, b, d))
    assert got_set == exp
    # the short-string bucket must have caught e.g. bat<->cat (len 3)
    assert ("bat", "cat", 1) in got_set


def _edges_df():
    # path 1-2-3-4 plus hub 5 connected to 1,2,3 (string node ids)
    e = [("e1", "e2"), ("e2", "e3"), ("e3", "e4"),
         ("e1", "e5"), ("e2", "e5"), ("e3", "e5")]
    return pd.DataFrame(e, columns=["u", "v"])


def test_adamic_adar_matches_naive():
    df = _edges_df()
    got = adamic_adar(rd.from_pandas(df)).to_pandas()
    nbrs: dict = {}
    for u, v in df.itertuples(index=False):
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    exp = {}
    for p, q in itertools.combinations(sorted(nbrs), 2):
        common = nbrs[p] & nbrs[q]
        if common:
            exp[(p, q)] = (len(common),
                           round(sum(1 / math.log(len(nbrs[z]))
                                     for z in common), 6))
    got_map = {(r.p, r.q): (r.common_neighbors, r.aa_score)
               for r in got.itertuples()}
    assert got_map == exp


def test_pmi_pairs_matches_naive():
    rows = [("c1", "a"), ("c1", "b"), ("c2", "a"), ("c2", "b"),
            ("c2", "c"), ("c3", "a"), ("c3", "c"), ("c4", "d")]
    df = pd.DataFrame(rows, columns=["conv_id", "subj"])
    got = pmi_pairs(rd.from_pandas(df)).to_pandas()
    convs: dict = {}
    for c, s in rows:
        convs.setdefault(c, set()).add(s)
    n = len(convs)
    cx: dict = {}
    for ents in convs.values():
        for s in ents:
            cx[s] = cx.get(s, 0) + 1
    cpq: dict = {}
    for ents in convs.values():
        for p, q in itertools.combinations(sorted(ents), 2):
            cpq[(p, q)] = cpq.get((p, q), 0) + 1
    exp = {k: (v, round(math.log(v * n / (cx[k[0]] * cx[k[1]])), 6))
           for k, v in cpq.items()}
    got_map = {(r.p, r.q): (r.cpq, r.pmi) for r in got.itertuples()}
    assert got_map == exp
