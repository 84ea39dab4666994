"""Gazetteer mention detection over turn text.

Analog of the reference's anchor extraction + normalization
(``kgdata/wikipedia/datasets/article_links.py:77-105`` +
``norm_mentions.py:48-51``): detect every gazetteer alias occurring in
a turn, on the *normalized* text. The alias-alternation regex is
compiled once per actor (stateful ``__init__``), matching is a
vectorized pandas ``extractall`` per batch.

Scale note: the alternation automaton grows with the gazetteer; beyond
~100k aliases swap the regex for an Aho-Corasick automaton in the same
actor slot — the stage signature does not change.
"""

from __future__ import annotations

import re
from typing import Optional, Union

import numpy as np
import pandas as pd
import ray
from ray.data import Dataset

from ..functions.joins import resolve_join_partitions

from ..functions.text import normalize_mention, normalize_mention_series

MENTION_COLUMNS = ("conv_id", "turn_idx", "mention_norm")


class DetectMentions:
    def __init__(self, aliases_ref: Union["ray.ObjectRef", list]):
        aliases = (
            ray.get(aliases_ref) if isinstance(aliases_ref, ray.ObjectRef) else aliases_ref
        )
        norm = sorted(
            {normalize_mention(a) for a in aliases if normalize_mention(a)},
            key=lambda s: (-len(s), s),  # longest-match-first alternation
        )
        pattern = r"\b(" + "|".join(re.escape(a) for a in norm) + r")\b"
        self.rx = re.compile(pattern)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text_norm = normalize_mention_series(batch["text"])
        matches = text_norm.str.extractall(self.rx)
        if matches.empty:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype="object"),
                    "turn_idx": pd.Series([], dtype="int32"),
                    "mention_norm": pd.Series([], dtype="object"),
                }
            )
        rows = matches.index.get_level_values(0).to_numpy()
        return pd.DataFrame(
            {
                "conv_id": batch["conv_id"].to_numpy()[rows],
                "turn_idx": batch["turn_idx"].to_numpy()[rows].astype(np.int32),
                "mention_norm": matches[0].to_numpy(),
            }
        )


def detect_mentions(
    ds: Dataset,
    aliases: Union["ray.ObjectRef", list],
    *,
    concurrency=(1, 8),
    batch_size: int = 4096,
) -> Dataset:
    """Turns -> (conv_id, turn_idx, mention_norm), one row per alias
    occurrence in normalized turn text (regex-alternation actor pool —
    the reference-shaped implementation; see
    :func:`detect_mentions_ngram` for the vectorized scale path)."""
    if not isinstance(aliases, ray.ObjectRef):
        aliases = ray.put(list(aliases))
    return ds.select_columns(["conv_id", "turn_idx", "text"]).map_batches(
        DetectMentions,
        fn_constructor_args=(aliases,),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


# --------------------------------------------------------------------------
# Vectorized token-n-gram matcher (scale path)

from ..functions.broadcast import as_ref, get_broadcast  # noqa: E402


# fold constants combining per-token 64-bit hashes into n-gram keys
# (uint64 wraparound multiply-add; shared by text and alias sides)
_GRAM_FOLD = np.array(
    [pow(0x9E3779B97F4A7C15, j, 1 << 64) for j in range(16)], dtype=np.uint64
)


def _alias_arrays(aliases_ref):
    """Per-worker cache: the alias TOKEN VOCABULARY (every distinct
    token appearing in any normalized alias) plus, per alias token
    count n, the sorted fold-keys of the alias token-id sequences and
    the alias string array for exact verification. Matching a batch is
    then ONE ``index_in`` of its flat tokens against the vocabulary
    (C hash pass -> numeric token ids; non-alias tokens can never start
    a match) + numpy id-folds — no n-gram string construction except
    for candidate hits."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.broadcast import _CACHE

    key = ("mention_aliases", aliases_ref.hex()
           if hasattr(aliases_ref, "hex") else id(aliases_ref))
    got = _CACHE.get(key)
    if got is None:
        aliases = get_broadcast(aliases_ref)
        norm = sorted({normalize_mention(a) for a in aliases
                       if normalize_mention(a)})
        max_tokens = max(len(a.split(" ")) for a in norm)
        vocab_list = sorted({t for a in norm for t in a.split(" ")})
        vocab = pa.array(vocab_list, pa.string())
        by_n: dict[int, tuple] = {}
        for n in range(1, max_tokens + 1):
            subset = [a for a in norm if len(a.split(" ")) == n]
            if not subset:
                continue
            toks = pa.array(
                [t for a in subset for t in a.split(" ")], pa.string()
            )
            ids = pc.index_in(toks, value_set=vocab).to_numpy(
                zero_copy_only=False
            ).astype(np.int64).reshape(len(subset), n)
            keys = np.zeros(len(subset), dtype=np.uint64)
            for k in range(n):
                keys += (ids[:, k] + 1).astype(np.uint64) * _GRAM_FOLD[k]
            by_n[n] = (np.sort(keys), pa.array(subset, pa.string()))
        got = (vocab, by_n, max_tokens)
        _CACHE[key] = got
    return got


def detect_mentions_ngram(
    ds: Dataset,
    aliases: Union["ray.ObjectRef", list],
    *,
    batch_size: int = 8192,
) -> Dataset:
    """Vectorized gazetteer matcher: normalized turn text is
    whitespace-tokenized (normalization strips punctuation, so token
    runs are exactly the regex word-boundary matches); token n-grams
    for n = 1..max-alias-length are matched ID-FIRST: one ``index_in``
    of the batch's flat tokens against the alias token vocabulary
    (single C hash pass -> numeric ids), numpy sliding-window id-folds
    per n, sorted-array membership — and only candidate hits get their
    n-gram string built and exact-compared (``index_in``), so fold
    collisions can never produce a wrong match. Avoiding string
    construction for the n-grams that miss keeps the stage
    compute-bound instead of allocation/DRAM-bound (the single-box
    32-CPU ceiling). Same output as :func:`detect_mentions` (tested
    equal); no per-alias automaton, so it scales to very large
    gazetteers.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.text import normalize_mention_arrow

    aliases_ref = as_ref(list(aliases) if not isinstance(aliases, ray.ObjectRef) else aliases)

    def fn(t: pa.Table) -> pa.Table:
        vocab, by_n, max_n = _alias_arrays(aliases_ref)
        norm = normalize_mention_arrow(t["text"])
        if isinstance(norm, pa.ChunkedArray):
            norm = norm.combine_chunks()
        toks = pc.split_pattern(norm, " ")
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        L = len(flat)
        if L:
            tid = pc.index_in(flat, value_set=vocab).to_numpy(
                zero_copy_only=False
            )
            in_vocab = ~np.isnan(tid)
            # id 0 marks non-vocab tokens; any span containing one is
            # masked out below, so its fold contribution never matches
            tid = np.where(in_vocab, tid + 1, 0).astype(np.uint64)
        else:
            tid = np.empty(0, dtype=np.uint64)
            in_vocab = np.empty(0, dtype=bool)

        out_rows: list[np.ndarray] = []
        out_chunks: list[pa.Array] = []
        for n in range(1, max_n + 1):
            m = L - (n - 1)
            if m <= 0 or n not in by_n:
                continue
            sorted_keys, alias_arr = by_n[n]
            keys = np.zeros(m, dtype=np.uint64)
            all_in = np.ones(m, dtype=bool)
            for k in range(n):
                keys += tid[k : k + m] * _GRAM_FOLD[k]
                all_in &= in_vocab[k : k + m]
            if n == 1:
                valid_span = all_in
            else:
                valid_span = (parent[:m] == parent[n - 1:]) & all_in
            pos = np.searchsorted(sorted_keys, keys)
            pos[pos == len(sorted_keys)] = 0
            cand = (sorted_keys[pos] == keys) & valid_span
            if not cand.any():
                continue
            cand_idx = np.nonzero(cand)[0]
            # exact verification: build strings only for candidates
            if n == 1:
                gram = flat.take(pa.array(cand_idx))
            else:
                gram = pc.binary_join_element_wise(
                    *[flat.take(pa.array(cand_idx + k)) for k in range(n)],
                    " ",
                )
            ok = pc.is_valid(pc.index_in(gram, value_set=alias_arr))
            ok_np = ok.to_numpy(zero_copy_only=False)
            if ok_np.any():
                hit_idx = cand_idx[ok_np]
                out_rows.append(parent[hit_idx])
                out_chunks.append(gram.filter(ok))
        if not out_rows:
            return pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "turn_idx": pa.array([], pa.int32()),
                    "mention_norm": pa.array([], pa.string()),
                }
            )
        rows = np.concatenate(out_rows)
        mentions = pa.concat_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in out_chunks]
        )
        order = np.argsort(rows, kind="stable")
        rows = rows[order]
        mentions = pc.take(mentions, pa.array(order))
        return pa.table(
            {
                "conv_id": pc.take(t["conv_id"], pa.array(rows)),
                "turn_idx": pc.take(t["turn_idx"], pa.array(rows)),
                "mention_norm": mentions,
            }
        )

    return ds.select_columns(["conv_id", "turn_idx", "text"]).map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )


def detect_mentions_join(
    ds: Dataset,
    gazetteer: Dataset,
    *,
    alias_col: str = "alias",
    num_partitions: Optional[int] = None,
    batch_size: int = 8192,
) -> Dataset:
    """Mention detection for gazetteers that exceed worker memory: the
    all-shuffle join plan. Every token n-gram (n = 1..max alias token
    count) of the normalized turn text is emitted as a candidate row
    and inner-joined against the distinct normalized-alias table — no
    broadcast anywhere, both sides shuffle on the gram key. Output and
    semantics identical to :func:`detect_mentions_ngram` (tested
    equal); use when the alias side is itself a distributed table
    (DESIGN.md "beyond ~10^8 aliases"). The n-gram explosion (~max_n
    rows per token) is the price of the no-broadcast plan — prefer the
    id-first matcher whenever the token vocabulary fits a worker."""
    num_partitions = resolve_join_partitions(num_partitions)
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.agg import distinct_rows
    from ..functions.blocks import rename_cols, scrub_empty_blocks
    from ..functions.text import normalize_mention_arrow, normalize_mention_series

    def norm_aliases(b: pd.DataFrame) -> pd.DataFrame:
        an = normalize_mention_series(b[alias_col])
        out = pd.DataFrame({"alias_norm": an[an != ""]})
        out["ntok"] = out["alias_norm"].str.count(" ") + 1
        return out

    aliases = distinct_rows(
        gazetteer.map_batches(norm_aliases, batch_format="pandas"),
        ["alias_norm", "ntok"],
    ).materialize()
    max_n = int(aliases.max("ntok"))

    def grams(t: pa.Table) -> pa.Table:
        norm = normalize_mention_arrow(t["text"])
        if isinstance(norm, pa.ChunkedArray):
            norm = norm.combine_chunks()
        toks = pc.split_pattern(norm, " ")
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        L = len(flat)
        rows, chunks = [], []
        for n in range(1, max_n + 1):
            m = L - (n - 1)
            if m <= 0:
                break
            if n == 1:
                gram = flat
                span = np.ones(L, dtype=bool)
            else:
                gram = pc.binary_join_element_wise(
                    *[flat.slice(k, m) for k in range(n)], " "
                )
                span = parent[:m] == parent[n - 1:]
            idx = np.nonzero(span)[0]
            rows.append(parent[idx])
            chunks.append(gram.take(pa.array(idx)))
        if not rows:
            return pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "turn_idx": pa.array([], pa.int32()),
                    "gram": pa.array([], pa.string()),
                }
            )
        allrows = np.concatenate(rows)
        allgrams = pa.concat_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in chunks]
        )
        return pa.table(
            {
                "conv_id": pc.take(t["conv_id"], pa.array(allrows)),
                "turn_idx": pc.take(t["turn_idx"], pa.array(allrows)),
                "gram": allgrams,
            }
        )

    cand = ds.select_columns(["conv_id", "turn_idx", "text"]).map_batches(
        grams, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    j = cand.join(
        scrub_empty_blocks(aliases.drop_columns(["ntok"])),
        join_type="inner",
        num_partitions=num_partitions,
        on=("gram",),
        right_on=("alias_norm",),
    )
    return rename_cols(j, {"gram": "mention_norm"})
