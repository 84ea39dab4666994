"""Retrieval / tokenizer-training operators over the document corpus:
BM25 top-k scoring and distributed BPE merge learning.

Reference analog: none — the reference predates LLM-corpus retrieval;
these extend the engine's training-data surface (brief: text analysis
/ quality scoring family).  Both are shaped for 100 TB:

* ``bm25_topk`` touches the corpus text exactly ONCE.  The tokenize
  pass emits only (a) one tiny stat row per document (its token
  length) and (b) one (doc, term, tf, dl) row per *query term hit* —
  the query is a handful of terms, so what leaves the map is
  output-sized, never token-sized.  df / N / avgdl are collected on
  the driver (|Q| + 2 numbers), the per-doc score sum runs as an
  order-free int64 fixed-point grouped sum, and the final cut is the
  shuffle-free ``global_topk`` combiner.
* ``bpe_merges`` reduces the corpus to its word-frequency vocabulary
  once (map-side-combined count — the shuffle moves vocabulary
  partials, not token streams), then each merge round is a
  vocabulary-sized parallel pass: per-block adjacent-pair counts
  weighted by word frequency, a pair-vocabulary grouped sum, and a
  single-row deterministic argmax.  The corpus text is never read
  again after round zero — the standard corpus-BPE factorization.

Float determinism contract (same recipe as ``unigram_logprob`` /
``temperature_mix``): every transcendental enters through ``ln`` once
per *term* (not per row), all arithmetic is written in one pinned
operand order mirrored exactly by the DuckDB oracle (literals forced
to DOUBLE), and per-document summation happens in int64 fixed point
(``floor(x * 1e6 + 0.5)``) so summation order can never show.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from .textstats import WORD_SPLIT_PATTERN

_FX = 1_000_000.0  # fixed-point scale for BM25 contributions


def bm25_topk(
    ds: Dataset,
    query_terms: "list[str]",
    *,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Top-``k`` documents by BM25 score against ``query_terms``
    (Robertson/Sparck-Jones, the Lucene ``+1`` idf variant so every
    contribution is positive): per matched term
    ``idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with
    ``idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)``.  Output
    ``(doc_id, score_fx, n_hit)`` where ``score_fx`` is the int64
    fixed-point score (sum of ``floor(contrib * 1e6 + 0.5)``) and
    ``n_hit`` the number of distinct query terms present; rows are the
    exact top-k by ``(score_fx desc, doc_id asc)``."""
    from ..functions.agg import global_topk, grouped_blockwise

    qlist = sorted(set(query_terms))
    # one maximal [a-z0-9] run == one non-empty split token, so dl is
    # a single vectorized count — no Python token loop in the hot path
    token_run_re = "[a-z0-9]+"

    qset = pa.array(qlist, pa.string())

    def explode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        low = pc.utf8_lower(t[text_col].combine_chunks() if isinstance(
            t[text_col], pa.ChunkedArray) else t[text_col])
        dl = pc.cast(pc.count_substring_regex(low, token_run_re),
                     pa.int64())
        ids = pc.cast(t[id_col], pa.int64())
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n = len(t)
        stat = pa.table({
            id_col: ids,
            "term": pa.array([""] * n, pa.string()),
            "tf": pa.array(np.zeros(n, np.int64), pa.int64()),
            "dl": dl,
        })
        parts = pc.split_pattern_regex(low, WORD_SPLIT_PATTERN)
        flat = pc.list_flatten(parts)
        pidx = pc.list_parent_indices(parts)
        keep = pc.is_in(flat, value_set=qset)
        hit_idx = pidx.filter(keep)
        tf = pa.table({
            id_col: ids.take(hit_idx),
            "term": flat.filter(keep),
            "dl": dl.take(hit_idx),
        }).group_by([id_col, "term", "dl"]).aggregate([([], "count_all")])
        tf = tf.rename_columns([id_col, "term", "dl", "tf"]).select(
            [id_col, "term", "tf", "dl"])
        return pa.concat_tables([stat, tf])

    # one text pass; the exploded table is output-sized (one stat row
    # per doc + one row per query-term hit), cached for its 3 consumers
    exploded = (ds.select_columns([id_col, text_col])
                .map_batches(explode, batch_format="pyarrow")
                .materialize())

    def stat_partial(batch: pd.DataFrame) -> pa.Table:
        s = batch[batch["term"] == ""]
        return pa.table({
            "n_docs": pa.array([len(s)], pa.int64()),
            "sum_dl": pa.array([int(s["dl"].sum())], pa.int64()),
        })

    stats = exploded.map_batches(
        stat_partial, batch_format="pandas").take_all()
    n_docs = sum(r["n_docs"] for r in stats)
    sum_dl = sum(r["sum_dl"] for r in stats)
    if n_docs == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "score_fx": pa.array([], pa.int64()),
            "n_hit": pa.array([], pa.int64()),
        }))
    avgdl = float(sum_dl) / float(n_docs)

    def df_partial(batch: pd.DataFrame) -> pa.Table:
        h = batch[batch["term"] != ""]
        out = h.groupby("term", sort=False).size().reset_index(name="df")
        return pa.Table.from_pandas(out, preserve_index=False)

    df_rows = exploded.map_batches(
        df_partial, batch_format="pandas").take_all()
    df: dict[str, int] = {}
    for r in df_rows:
        df[r["term"]] = df.get(r["term"], 0) + int(r["df"])
    # |Q| idfs on the driver — each ln evaluated exactly once, the
    # pinned operand order the oracle mirrors
    idf = {t: math.log((n_docs - d + 0.5) / (d + 0.5) + 1.0)
           for t, d in df.items()}

    def contrib(batch: pd.DataFrame) -> pa.Table:
        h = batch[batch["term"] != ""]
        if not len(h):
            return pa.table({id_col: pa.array([], pa.int64()),
                             "fx": pa.array([], pa.int64())})
        tf = h["tf"].to_numpy(np.float64)
        dl = h["dl"].to_numpy(np.float64)
        idfs = h["term"].map(idf).to_numpy(np.float64)
        # operand order is the certified contract — mirrored verbatim
        # by the DuckDB oracle (all literals forced DOUBLE there)
        w = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))
        fx = np.floor(idfs * w * _FX + 0.5).astype(np.int64)
        return pa.table({
            id_col: pa.array(h[id_col].to_numpy(np.int64), pa.int64()),
            "fx": pa.array(fx, pa.int64()),
        })

    per_term = exploded.map_batches(contrib, batch_format="pandas")

    def doc_sum(batch: pd.DataFrame) -> pa.Table:
        out = batch.groupby(id_col, sort=False).agg(
            score_fx=("fx", "sum"), n_hit=("fx", "size")).reset_index()
        out["score_fx"] = out["score_fx"].astype("int64")
        out["n_hit"] = out["n_hit"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    scored = grouped_blockwise(per_term, [id_col], doc_sum)
    return global_topk(scored, ["score_fx", id_col], [False, True], k)


def _apply_merges(word: str, merges: "list[tuple[str, str]]") -> "list[str]":
    """Split ``word`` into characters, then apply each learned merge in
    order (one full left-to-right pass per merge) — the standard BPE
    apply rule, so engine and golden agree symbol-for-symbol."""
    syms = list(word)
    for left, right in merges:
        if len(syms) < 2:
            break
        out: list[str] = []
        i = 0
        while i < len(syms):
            if (i + 1 < len(syms) and syms[i] == left
                    and syms[i + 1] == right):
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_merges(
    ds: Dataset,
    *,
    n_merges: int = 8,
    text_col: str = "text",
) -> Dataset:
    """Learn ``n_merges`` BPE merge rules over the corpus: byte-pair
    (here: character-pair) counts weighted by word frequency, greedy
    argmax per round with the deterministic tie-break
    ``(count desc, left asc, right asc)``.  Output one row per learned
    rule: ``(step, lhs, rhs, pair_count)``.

    The corpus text is read ONCE (word-frequency vocabulary via
    map-side-combined count); each ROUND is a parallel vocabulary-sized
    pass whose shuffle moves pair-count partials (pair-vocabulary-
    sized), and the round's winners ride the ``global_topk`` combiner —
    the driver holds only the growing merge list (``n_merges`` tuples),
    re-broadcast each round.

    Rounds are driver-sequential, so at realistic merge counts the
    fixed per-execution cost would dominate if every round learned ONE
    rule. Instead each round accepts a BATCH of merges via a rule that
    reproduces sequential greedy BPE: take the candidate pairs in full
    tie-break order (count desc, lhs asc, rhs asc) and accept a prefix
    that is (a) pairwise symbol-disjoint — stop at the first pair
    re-using an already-accepted symbol; (b) strictly above the
    boundary: every accepted pair after the first must have count >
    the first NON-accepted pair's count; and (c) strictly above every
    CREATED-pair bound: applying an accepted merge (l, r) can create
    pairs (x, lr), (lr, y), (lr, lr) whose counts are bounded by the
    pre-merge counts of (x, l), (r, y), (r, l) respectively — i.e. by
    the count of some pre-existing pair with rhs == l or lhs == r.
    Any such pair with count > boundary is necessarily inside the
    fetched top-(want+1) list (the list is the global top, and
    boundary is a fetched count), so the bound is computed
    driver-locally from fetched rows; created pairs whose progenitors
    sit at or below the boundary are dominated by check (b). Old
    pairs' counts only ever decrease under disjoint merges and
    adjacency between two old symbols is never created, so each
    accepted pair is exactly sequential greedy's pick at its turn
    (ties cannot flip: the inequalities are strict). The first pair of
    each round is the true global argmax and is always safe, so
    progress is guaranteed."""
    from ..functions.agg import global_topk, grouped_blockwise

    def explode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..stages.textstats import tokens_arrow

        vc = pc.value_counts(tokens_arrow(t[text_col]))
        return pa.table({"word": vc.field("values").cast(pa.string()),
                         "n": vc.field("counts").cast(pa.int64())})

    pre = ds.select_columns([text_col]).map_batches(
        explode, batch_format="pyarrow")

    def vocab_sum(t: pa.Table) -> pa.Table:
        return t.group_by("word").aggregate([("n", "sum")]) \
            .rename_columns(["word", "n"])

    vocab = grouped_blockwise(pre, ["word"], vocab_sum,
                              batch_format="pyarrow").materialize()

    merges: list[tuple[str, str]] = []
    counts: list[int] = []
    while len(merges) < n_merges:
        want = n_merges - len(merges)
        cur = list(merges)  # closure snapshot broadcast with the task

        def pair_partial(batch: pd.DataFrame) -> pa.Table:
            acc: dict[tuple[str, str], int] = {}
            for word, n in zip(batch["word"], batch["n"]):
                syms = _apply_merges(word, cur)
                for a_s, b_s in zip(syms, syms[1:]):
                    acc[(a_s, b_s)] = acc.get((a_s, b_s), 0) + int(n)
            return pa.table({
                "lhs": pa.array([p[0] for p in acc], pa.string()),
                "rhs": pa.array([p[1] for p in acc], pa.string()),
                "c": pa.array(list(acc.values()), pa.int64()),
            })

        def pair_sum(batch: pd.DataFrame) -> pa.Table:
            out = (batch.groupby(["lhs", "rhs"], sort=False)["c"]
                   .sum().reset_index())
            out["c"] = out["c"].astype("int64")
            return pa.Table.from_pandas(out, preserve_index=False)

        pairs = grouped_blockwise(
            vocab.map_batches(pair_partial, batch_format="pandas"),
            ["lhs", "rhs"], pair_sum)
        # fetch want+1 candidates: the extra row is the boundary that
        # certifies which accepted counts are strictly safe
        cands = global_topk(pairs, ["c", "lhs", "rhs"],
                            [False, True, True], want + 1).take_all()
        if not cands:
            break
        used: set[str] = set()
        prefix: list[dict] = []
        stop_idx = len(cands)
        for i, r in enumerate(cands):
            if len(prefix) == want or r["lhs"] in used or r["rhs"] in used:
                stop_idx = i
                break
            prefix.append(r)
            used.add(r["lhs"])
            used.add(r["rhs"])
        boundary = (int(cands[stop_idx]["c"])
                    if stop_idx < len(cands) else -1)

        def created_bound(l: str, r: str) -> int:
            # max pre-merge count of any fetched pair that could seed a
            # pair created by merging (l, r): (x, lr) <= count(x, l),
            # (lr, y) <= count(r, y), (lr, lr) <= count(r, l)
            return max((int(q["c"]) for q in cands
                        if q["rhs"] == l or q["lhs"] == r), default=-1)

        accepted = prefix[:1]
        bound = created_bound(prefix[0]["lhs"], prefix[0]["rhs"]) \
            if prefix else -1
        for r in prefix[1:]:
            c = int(r["c"])
            if c <= boundary or c <= bound:
                break  # later prefix rows have <= c and fail the same
            accepted.append(r)
            bound = max(bound, created_bound(r["lhs"], r["rhs"]))
        for r in accepted:
            merges.append((r["lhs"], r["rhs"]))
            counts.append(int(r["c"]))

    import ray.data as rd

    return rd.from_arrow(pa.table({
        "step": pa.array(range(len(merges)), pa.int64()),
        "lhs": pa.array([m[0] for m in merges], pa.string()),
        "rhs": pa.array([m[1] for m in merges], pa.string()),
        "pair_count": pa.array(counts, pa.int64()),
    }))


def bpe_encode(
    ds: Dataset,
    merges: "list[tuple[str, str]]",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Apply learned BPE merges to the corpus and return the per-
    document BPE token count ``(doc_id, n_bpe_tokens)`` — the apply
    side of :func:`bpe_merges` (train + encode is the full tokenizer
    loop; the count is what sequence packing / context budgeting
    consumes).

    One streaming pass; within each batch the merge walk runs once per
    DISTINCT word (the standard tokenizer cache) and the per-document
    sum is a vectorized map + groupby over the exploded tokens.
    Token-less documents count 0."""

    def enc(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..stages.textstats import WORD_SPLIT_PATTERN

        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts = pc.split_pattern_regex(pc.utf8_lower(col),
                                       WORD_SPLIT_PATTERN)
        flat = pc.list_flatten(parts)
        pidx = pc.list_parent_indices(parts)
        keep = pc.not_equal(flat, "")
        terms = flat.filter(keep)
        rows = pidx.filter(keep).to_numpy(zero_copy_only=False)
        # merge walk once per DISTINCT word (the tokenizer cache);
        # per-word lengths fan back out via index_in, never a dict map
        uniq = pc.unique(terms)
        lens = np.fromiter(
            (len(_apply_merges(w, merges)) for w in uniq.to_pylist()),
            dtype=np.int64, count=len(uniq))
        per_tok = lens[pc.index_in(terms, value_set=uniq)
                       .to_numpy(zero_copy_only=False)]
        # exact int sums: token counts per word are tiny, the float64
        # bincount accumulator is exact far beyond any document size
        sums = np.bincount(rows, weights=per_tok,
                           minlength=len(t)).astype(np.int64)
        return pa.table({
            id_col: pc.cast(t[id_col], pa.int64()),
            "n_bpe_tokens": pa.array(sums, pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        enc, batch_format="pyarrow")


def hybrid_rrf_topk(
    docs: Dataset,
    emb: Dataset,
    query_terms: "list[str]",
    query_vec_id: int,
    *,
    k: int = 20,
    k_cand: int = 50,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Dataset:
    """Hybrid retrieval by Reciprocal Rank Fusion (Cormack et al.,
    SIGIR 2009): fuse a lexical BM25 candidate list with a dense
    cosine-kNN candidate list over the same id space (the synthetic
    corpus aligns ``doc_id`` and ``vec_id``).

    Each leg contributes ``1_000_000 // (rrf_k + rank)`` — integer
    floor division so the fused score is an exact int64 at any
    summation order — and documents appearing in only one leg get the
    other's contribution as 0. Output: the top ``k`` by
    ``(rrf_fx desc, doc_id asc)`` with both per-leg ranks (0 = not in
    that leg's top ``k_cand``).

    Scale shape: both legs are the engine's existing distributed
    operators (bm25_topk: one tokenize pass + shuffle-free global
    top-k; knn_bruteforce: broadcast query x corpus batches); the
    fusion itself runs on the driver over two candidate lists that
    are <= k_cand rows BY CONSTRUCTION — bounded, never corpus-sized.
    """
    import ray.data as rd

    from .similarity import knn_bruteforce

    lex = bm25_topk(docs, query_terms, k=k_cand,
                    id_col=id_col, text_col=text_col).take_all()
    dense = knn_bruteforce(emb, [int(query_vec_id)], k=k_cand,
                           id_col=vec_id_col, vec_col=vec_col).take_all()

    lex.sort(key=lambda r: (-r["score_fx"], r[id_col]))
    lex_rank = {int(r[id_col]): i + 1 for i, r in enumerate(lex)}
    dense_rank = {int(r["neighbor_id"]): int(r["rank"]) for r in dense}

    fused = []
    for did in sorted(set(lex_rank) | set(dense_rank)):
        lr = lex_rank.get(did, 0)
        dr = dense_rank.get(did, 0)
        fx = 0
        if lr:
            fx += 1_000_000 // (rrf_k + lr)
        if dr:
            fx += 1_000_000 // (rrf_k + dr)
        fused.append((did, fx, lr, dr))
    fused.sort(key=lambda t: (-t[1], t[0]))
    fused = fused[:k]
    return rd.from_arrow(pa.table({
        id_col: pa.array([t[0] for t in fused], pa.int64()),
        "rrf_fx": pa.array([t[1] for t in fused], pa.int64()),
        "lex_rank": pa.array([t[2] for t in fused], pa.int64()),
        "dense_rank": pa.array([t[3] for t in fused], pa.int64()),
    }))
