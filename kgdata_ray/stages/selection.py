"""DSIR-style data selection via hashed n-gram importance resampling
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling").

The method: fit two bag-of-hashed-n-grams models — one on a small
TARGET set (here: the documents of one ``source``, the domain you want
more of) and one on the RAW pool (the whole corpus) — then weight each
raw document by its log importance ratio
``sum_g [ log p_target(g) - log p_raw(g) ]`` over its unigrams and
bigrams, and Gumbel-top-k resample on the weights.

Determinism recipe (the engine's standard fixed-point playbook):

* grams hash to ``buckets`` bins via md5 (stable across processes and
  Python versions — no PYTHONHASHSEED exposure);
* BOTH count passes produce exact int64 partials; the merged
  bucket-count table is tiny (<= ``buckets`` rows) by construction;
* the per-bucket log-ratio is computed ONCE on the driver from the
  exact integer counts (add-one smoothing) and frozen to int64
  micro-units, so every per-document weight is an exact INTEGER sum —
  bit-identical under any batching or block order;
* the Gumbel perturbation in :func:`dsir_select` derives its uniform
  from md5 of the document id (the repo's md5-keyed sampling rule), so
  the resample is a pure function of the data.

Scale shape: one streaming pass counts (the shuffle moves <= buckets
partial rows per block, never the token stream), the driver folds a
``buckets``-row table, the frozen score array (8 bytes x buckets)
broadcasts once via ``ray.put``, and a second streaming pass scores.
Selection rides :func:`kgdata_ray.functions.agg.global_topk` — the
combiner top-k, O(blocks x k) traffic, no global sort.

Reference analog: none (the reference predates LLM data curation);
this is part of the engine's training-data-pipeline surface, same
family as `textstats.unigram_logprob_scores` (perplexity-ish
filtering) and `sampling.weighted_sample`.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from ..stages.textstats import WORD_SPLIT_PATTERN

#: fixed-point scale for log-ratio scores (micro-units)
DSIR_SCALE = 1_000_000


def _hash_bucket(grams: np.ndarray, buckets: int) -> np.ndarray:
    """md5-bucket an object array of gram strings. Only UNIQUE grams
    pay the digest (batch-local vocabulary is far smaller than the
    token stream)."""
    uniq, inv = np.unique(grams, return_inverse=True)
    hb = np.fromiter(
        (int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big")
         % buckets for g in uniq),
        dtype=np.int64, count=len(uniq))
    return hb[inv]


def _doc_grams(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(gram_strings, doc_row_index) for unigrams + adjacent bigrams of
    every row: lowercase, split on non-alphanumeric, empties dropped.
    Vectorized: one concatenate + boundary mask, no per-token loop."""
    toks = texts.str.lower().str.split(WORD_SPLIT_PATTERN, regex=True)
    lens = toks.str.len().to_numpy(np.int64)
    if len(texts) == 0 or lens.sum() == 0:
        return (np.array([], dtype=object), np.array([], dtype=np.int64))
    flat = np.concatenate(toks.to_numpy())
    rows = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    keep = flat != ""          # regex split yields '' at boundaries
    flat, rows = flat[keep], rows[keep]
    if len(flat) == 0:
        return (np.array([], dtype=object), np.array([], dtype=np.int64))
    # bigram positions: consecutive flat slots belonging to one row
    keep = rows[:-1] == rows[1:] if len(rows) > 1 else \
        np.array([], dtype=bool)
    w1 = flat[:-1][keep]
    w2 = flat[1:][keep]
    bi = np.asarray(pd.Series(w1).str.cat(pd.Series(w2), sep=" "),
                    dtype=object)
    grams = np.concatenate([flat, bi])
    gram_rows = np.concatenate([rows, rows[:-1][keep]])
    return grams, gram_rows


def dsir_bucket_counts(ds: Dataset, *, target_source: str,
                       buckets: int = 4096, text_col: str = "text",
                       source_col: str = "source") -> pd.DataFrame:
    """ONE streaming pass over the corpus producing the exact int64
    (bucket, n_raw, n_tgt) table, <= ``buckets`` rows. Raw counts every
    document; target counts only the ``target_source`` rows."""

    def partial(b: pd.DataFrame) -> pa.Table:
        grams, rows = _doc_grams(b[text_col])
        if len(grams) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n_raw": pa.array([], pa.int64()),
                             "n_tgt": pa.array([], pa.int64())})
        bk = _hash_bucket(grams, buckets)
        raw = np.bincount(bk, minlength=buckets).astype(np.int64)
        is_tgt = (b[source_col] == target_source).to_numpy()
        tgt_mask = is_tgt[rows]
        tgt = np.bincount(bk[tgt_mask], minlength=buckets) \
            .astype(np.int64)
        nz = np.flatnonzero(raw)
        return pa.table({
            "bucket": pa.array(nz, pa.int64()),
            "n_raw": pa.array(raw[nz], pa.int64()),
            "n_tgt": pa.array(tgt[nz], pa.int64()),
        })

    from ..functions.agg import merge_bounded_partials

    parts = ds.select_columns([text_col, source_col]).map_batches(
        partial, batch_format="pandas")
    return merge_bounded_partials(parts, ["bucket"], ["n_raw", "n_tgt"])


def dsir_score_table(counts: pd.DataFrame, *,
                     buckets: int = 4096) -> np.ndarray:
    """Freeze the per-bucket importance log-ratio to int64 micro-units
    from the EXACT integer counts (add-one smoothing):
    ``floor(1e6 * (ln((t+1)/(T+B)) - ln((r+1)/(R+B))) + 0.5)``.
    Identical integer inputs -> identical float64 -> identical frozen
    ints, so an independent golden reproduces every score."""
    r = np.zeros(buckets, dtype=np.int64)
    t = np.zeros(buckets, dtype=np.int64)
    idx = counts["bucket"].to_numpy(np.int64)
    r[idx] = counts["n_raw"].to_numpy(np.int64)
    t[idx] = counts["n_tgt"].to_numpy(np.int64)
    total_r = float(r.sum() + buckets)
    total_t = float(t.sum() + buckets)
    lam = (np.log((t + 1).astype(np.float64) / total_t)
           - np.log((r + 1).astype(np.float64) / total_r))
    return np.floor(lam * DSIR_SCALE + 0.5).astype(np.int64)


def dsir_scores(ds: Dataset, *, target_source: str = "src0",
                buckets: int = 4096, id_col: str = "doc_id",
                text_col: str = "text",
                source_col: str = "source") -> Dataset:
    """Per-document DSIR importance weight:
    (doc_id, n_grams, weight_micro) with ``weight_micro`` the exact
    int64 sum of the frozen per-bucket log-ratios over the document's
    hashed unigrams+bigrams. Gram-less documents score (0, 0)."""
    import ray

    from ..functions.broadcast import get_broadcast

    counts = dsir_bucket_counts(ds, target_source=target_source,
                                buckets=buckets, text_col=text_col,
                                source_col=source_col)
    lam_ref = ray.put(dsir_score_table(counts, buckets=buckets))

    def score(b: pd.DataFrame) -> pa.Table:
        lam = get_broadcast(lam_ref)
        grams, rows = _doc_grams(b[text_col])
        w = np.zeros(len(b), dtype=np.int64)
        ng = np.zeros(len(b), dtype=np.int64)
        if len(grams):
            bk = _hash_bucket(grams, buckets)
            np.add.at(w, rows, lam[bk])
            np.add.at(ng, rows, 1)
        return pa.table({
            id_col: pa.array(b[id_col].to_numpy(np.int64), pa.int64()),
            "n_grams": pa.array(ng, pa.int64()),
            "weight_micro": pa.array(w, pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pandas")


def dsir_select(ds: Dataset, *, k: int = 100,
                target_source: str = "src0", buckets: int = 4096,
                id_col: str = "doc_id", text_col: str = "text",
                source_col: str = "source") -> Dataset:
    """Gumbel-top-k importance resample (the DSIR selection rule):
    key = weight + Gumbel(0,1), take the k largest. The uniform behind
    each Gumbel comes from md5("dsir|" + doc_id) so the draw is a pure
    function of the data; the perturbed key freezes to int64
    micro-units. Output: (doc_id, weight_micro, key_micro), exactly k
    rows, selected WITHOUT a global sort (combiner top-k)."""
    from ..functions.agg import global_topk

    scored = dsir_scores(ds, target_source=target_source,
                         buckets=buckets, id_col=id_col,
                         text_col=text_col, source_col=source_col)

    def perturb(b: pd.DataFrame) -> pa.Table:
        ids = b[id_col].to_numpy(np.int64)
        h = np.fromiter(
            (int.from_bytes(
                hashlib.md5(f"dsir|{int(i)}".encode()).digest()[:8],
                "big") for i in ids),
            dtype=np.uint64, count=len(ids))
        u = (h.astype(np.float64) + 0.5) / float(1 << 64)
        g = -np.log(-np.log(u))
        key = b["weight_micro"].to_numpy(np.int64) + \
            np.floor(g * DSIR_SCALE + 0.5).astype(np.int64)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "weight_micro": pa.array(
                b["weight_micro"].to_numpy(np.int64), pa.int64()),
            "key_micro": pa.array(key, pa.int64()),
        })

    keyed = scored.map_batches(perturb, batch_format="pandas")
    return global_topk(keyed, ["key_micro", id_col], [False, True], k)


def token_budget_select(ds, budget: int, *, id_col: str = "doc_id",
                        text_col: str = "text"):
    """Quality-ranked token-budget corpus selection: score every
    document (the shared quality heuristic + BPE-segment token count),
    order by ``(quality desc, id asc)`` and keep the maximal prefix
    whose cumulative token count stays within ``budget`` — "give me
    the best N-token training corpus", the budgeted-selection step of
    a pretraining data plan.

    Scale shape: one range sort on (quality, id), then a distributed
    prefix sum — per sorted block ONE int64 token sum travels to the
    driver, cumulative offsets ship back, and each block applies a
    vectorized cumsum + prefix cut. Blocks whose offset already
    exceeds the budget short-circuit to empty (the prefix property),
    so the post-cut tail costs nothing. Nothing row-sized ever
    materializes on the driver.

    Output: ``(doc_id, quality, n_tokens_bpe, cum_tokens)`` for the
    selected prefix, value-exact vs the SQL window oracle
    ``SUM(...) OVER (ORDER BY quality DESC, doc_id)``."""
    import ray
    import ray.data as rd

    from ..stages.textstats import quality_score_arrow, token_counts_arrow

    def scored(t: pa.Table) -> pa.Table:
        q = quality_score_arrow(t)
        return q.append_column("n_tokens_bpe",
                               token_counts_arrow(t)["n_tokens_bpe"])

    s = ds.select_columns([id_col, text_col]).map_batches(
        scored, batch_format="pyarrow")
    srt = s.sort(["quality", id_col], descending=[True, False])
    refs = srt.to_arrow_refs()

    @ray.remote
    def _block_sum(t: pa.Table) -> int:
        import pyarrow.compute as pc

        v = pc.sum(t["n_tokens_bpe"]).as_py()
        return int(v or 0)

    sums = ray.get([_block_sum.remote(r) for r in refs])
    offsets = [0]
    for c in sums[:-1]:
        offsets.append(offsets[-1] + c)

    @ray.remote
    def _cut(t: pa.Table, off: int) -> pa.Table:
        cum_col = pa.array(
            off + np.cumsum(t["n_tokens_bpe"].to_numpy(
                zero_copy_only=False), dtype=np.int64), pa.int64())
        out = t.append_column("cum_tokens", cum_col)
        if off >= budget:           # whole block past the cut
            return out.slice(0, 0)
        return out.filter(pa.array(
            cum_col.to_numpy(zero_copy_only=False) <= budget))

    return rd.from_arrow_refs(
        [_cut.remote(r, o) for r, o in zip(refs, offsets)])
