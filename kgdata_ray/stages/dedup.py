"""Deduplication suite over document corpora.

The reference only has exact dedup (``distinct``,
``kgdata/spark/extended_rdd.py:611-614``; latest-wins by key,
``kgdata/wikipedia/datasets/html_articles.py:66-81``). A
training-data-scale engine additionally needs near-dup detection, so
this module provides:

  - :func:`exact_dedup_ids`     exact content dedup (min-id winner)
  - :func:`minhash_pairs`       MinHash + LSH banding -> verified
                                char-shingle Jaccard pairs
  - :func:`simhash_pairs`       64-bit SimHash + band blocking ->
                                verified Hamming-distance pairs
  - :func:`ngram_jaccard_pairs` word n-gram blocking -> exact Jaccard
  - :func:`embedding_pairs`     cosine near-dup over an embedding column
  - :func:`dedup_clusters`      pairs -> connected components ->
                                (doc_id, cluster_id) with min-id winners

Scale notes: every *pairs* function is a map_batches sketch stage
(vectorized numpy per batch, state in actor ``__init__``) followed by a
``groupby`` on the bucket key — the shuffle moves (bucket, id) sketches,
never documents. Verification here broadcasts the id->text dict
(``ray.put``; fine up to ~1e6 docs); at larger scale swap the verifier
for two hash joins against the corpus on (id_a), (id_b) — semantics
identical.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

_MASK32 = np.uint64(0xFFFFFFFF)


# --------------------------------------------------------------------------
# Shingling / hashing kernels (deterministic; no PYTHONHASHSEED exposure)


def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """32-bit polynomial rolling hashes of all k-char shingles
    (vectorized via a sliding window; unique values)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    w = np.lib.stride_tricks.sliding_window_view(b, k)
    powers = np.array([257**j % (1 << 32) for j in range(k)], dtype=np.uint64)
    h = (w * powers[None, :]).sum(axis=1) & _MASK32
    return np.unique(h)


def word_ngram_hashes(text: str, n: int = 3) -> np.ndarray:
    """32-bit hashes of word n-grams (whitespace tokens, lowercased)."""
    toks = text.lower().split()
    if len(toks) < n:
        toks = toks + [""] * (n - len(toks))
    out = np.empty(max(1, len(toks) - n + 1), dtype=np.uint64)
    for i in range(len(out)):
        h = np.uint64(2166136261)
        for t in toks[i : i + n]:
            for c in t.encode("utf-8"):
                h = ((h ^ np.uint64(c)) * np.uint64(16777619)) & _MASK32
            h = (h * np.uint64(31) + np.uint64(7)) & _MASK32
        out[i] = h
    return np.unique(out)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


# --------------------------------------------------------------------------
# Exact dedup


def exact_dedup_ids(
    ds: Dataset, *, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """One representative (min id) per exact content value.

    Per-batch pre-dedup shrinks the shuffle; the global group then picks
    the minimum id — deterministic winner, reference ``distinct``
    semantics plus a pinned representative.
    """

    from ..functions.agg import grouped_blockwise

    def pre(b: pd.DataFrame) -> pa.Table:
        out = b.groupby(text_col, sort=False)[id_col].min().reset_index()
        return pa.Table.from_pandas(out[[id_col, text_col]], preserve_index=False)

    def final(b: pd.DataFrame) -> pa.Table:
        out = b.groupby(text_col, sort=False)[id_col].min().reset_index()
        return pa.Table.from_pandas(out[[id_col]], preserve_index=False)

    pruned = ds.select_columns([id_col, text_col]).map_batches(
        pre, batch_format="pandas"
    )
    return grouped_blockwise(pruned, [text_col], final)


# --------------------------------------------------------------------------
# MinHash + LSH


class MinHashSketcher:
    """num_perm minhashes per doc, folded into LSH bands.

    Permutation parameters are derived once per actor from the seed
    (stateful setup in ``__init__``, vectorized numpy per batch)."""

    def __init__(self, num_perm: int, band_size: int, shingle_k: int, seed: int,
                 text_col: str, id_col: str):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 31, size=num_perm, dtype=np.uint64) * 2 + 1
        self.b = rng.integers(0, 1 << 31, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.band_size = band_size
        self.num_bands = num_perm // band_size
        self.shingle_k = shingle_k
        self.text_col = text_col
        self.id_col = id_col
        self.fold = np.array(
            [1099511628211**j % (1 << 61) for j in range(band_size)],
            dtype=np.uint64,
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # gather all shingles of the batch into one array with per-doc
        # segment offsets; each permutation is then one vectorized
        # multiply-add + segmented min (np.minimum.reduceat) over the
        # whole batch — no per-doc x per-perm Python loop
        shingle_arrays = [
            char_shingle_hashes(text, self.shingle_k)
            for text in batch[self.text_col]
        ]
        sizes = np.array([len(s) for s in shingle_arrays], dtype=np.int64)
        all_h = (
            np.concatenate(shingle_arrays) if shingle_arrays
            else np.array([], dtype=np.uint64)
        )
        offsets = np.zeros(len(sizes), dtype=np.int64)
        np.cumsum(sizes[:-1], out=offsets[1:])
        n_docs = len(sizes)

        mins = np.empty((self.num_perm, n_docs), dtype=np.uint64)
        for p in range(self.num_perm):
            hv = self.a[p] * all_h + self.b[p]  # uint64 wraparound hash
            mins[p] = np.minimum.reduceat(hv, offsets)
        # fold each band's rows into one 64-bit band key
        bh = np.zeros((self.num_bands, n_docs), dtype=np.uint64)
        for band in range(self.num_bands):
            seg = mins[band * self.band_size : (band + 1) * self.band_size]
            bh[band] = (seg * self.fold[:, None]).sum(axis=0)

        ids = np.repeat(batch[self.id_col].to_numpy(), self.num_bands)
        bands = np.tile(
            np.arange(self.num_bands, dtype=np.int32), n_docs
        )
        return pd.DataFrame(
            {
                self.id_col: ids,
                "band": bands,
                "band_hash": bh.T.reshape(-1).astype(np.int64),
            }
        )


def _bucket_pairs_block(bucket_cols: list[str], id_col: str, max_bucket: int,
                        carry: Optional[list[str]] = None):
    """Blockwise candidate-pair generation: one vectorized pass finds
    buckets with >=2 members; pairs are emitted per such bucket
    (id_a < id_b). Buckets larger than ``max_bucket`` are degenerate
    hash collisions and dropped — a documented skew cap mirroring the
    reference's salted-join thresholds."""
    carry = carry or []

    def fn(b: pd.DataFrame) -> pa.Table:
        empty = {
            "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
            **{f"{c}_a": pa.array([]) for c in carry},
            **{f"{c}_b": pa.array([]) for c in carry},
        }
        if not len(b):
            return pa.table(empty)
        b = b.drop_duplicates(bucket_cols + [id_col]).sort_values(
            bucket_cols + [id_col], kind="mergesort"
        )
        sizes = b.groupby(bucket_cols, sort=False)[id_col].transform("size")
        b = b[(sizes >= 2) & (sizes <= max_bucket)]
        if not len(b):
            return pa.table(empty)
        out_a, out_b = [], []
        carry_a = {c: [] for c in carry}
        carry_b = {c: [] for c in carry}
        for _, grp in b.groupby(bucket_cols, sort=False):
            ids = grp[id_col].to_numpy()
            ia, ib = np.triu_indices(len(ids), 1)
            out_a.append(ids[ia])
            out_b.append(ids[ib])
            for c in carry:
                vals = grp[c].to_numpy()
                carry_a[c].append(vals[ia])
                carry_b[c].append(vals[ib])
        data = {
            "id_a": pa.array(np.concatenate(out_a), pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), pa.int64()),
        }
        for c in carry:
            data[f"{c}_a"] = pa.array(np.concatenate(carry_a[c]))
            data[f"{c}_b"] = pa.array(np.concatenate(carry_b[c]))
        return pa.table(data)

    return fn


class _PairVerifier:
    """Recomputes the exact similarity for candidate pairs from a
    broadcast id->text dict (swap for joins at >1e6 docs)."""

    def __init__(self, texts_ref, kind: str, shingle_k: int, ngram_n: int,
                 threshold: float):
        self.texts = ray.get(texts_ref) if isinstance(texts_ref, ray.ObjectRef) else texts_ref
        self.kind = kind
        self.shingle_k = shingle_k
        self.ngram_n = ngram_n
        self.threshold = threshold
        self._cache: dict = {}

    def _features(self, doc_id):
        f = self._cache.get(doc_id)
        if f is None:
            text = self.texts[doc_id]
            if self.kind == "char":
                f = char_shingle_hashes(text, self.shingle_k)
            else:
                f = word_ngram_hashes(text, self.ngram_n)
            if len(self._cache) > 200_000:
                self._cache.clear()
            self._cache[doc_id] = f
        return f

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sims = [
            jaccard(self._features(a), self._features(b))
            for a, b in zip(batch["id_a"], batch["id_b"])
        ]
        batch["jaccard"] = np.round(np.asarray(sims, dtype=np.float64), 6)
        return batch[batch["jaccard"] >= self.threshold]


def _distinct_pairs(pairs: Dataset) -> Dataset:
    from ..functions.agg import grouped_blockwise

    def block(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["id_a", "id_b"])

    return grouped_blockwise(pairs, ["id_a", "id_b"], block)


def minhash_pairs(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    band_size: int = 4,
    shingle_k: int = 5,
    threshold: float = 0.6,
    seed: int = 7,
    max_bucket: int = 200,
    texts_ref: Optional[Union["ray.ObjectRef", dict]] = None,
) -> Dataset:
    """Near-duplicate pairs by MinHash-LSH, verified with exact
    char-shingle Jaccard >= threshold. Output: (id_a, id_b, jaccard)."""
    if texts_ref is None:
        texts_ref = ray.put(_texts_dict(ds, id_col, text_col))
    sketches = ds.select_columns([id_col, text_col]).map_batches(
        MinHashSketcher,
        fn_constructor_args=(num_perm, band_size, shingle_k, seed, text_col, id_col),
        batch_format="pandas",
        concurrency=(1, 8),
        num_cpus=0.5,
    )
    from ..functions.agg import grouped_blockwise

    cand = grouped_blockwise(
        sketches, ["band", "band_hash"],
        _bucket_pairs_block(["band", "band_hash"], id_col, max_bucket),
    )
    cand = _distinct_pairs(cand)
    return cand.map_batches(
        _PairVerifier,
        fn_constructor_args=(texts_ref, "char", shingle_k, 0, threshold),
        batch_format="pandas",
        concurrency=(1, 8),
        num_cpus=0.5,
    )


def _texts_dict(ds: Dataset, id_col: str, text_col: str) -> dict:
    out = {}
    for b in ds.select_columns([id_col, text_col]).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        out.update(zip(b[id_col].to_pylist(), b[text_col].to_pylist()))
    return out


# --------------------------------------------------------------------------
# SimHash


class SimHashSketcher:
    """64-bit SimHash over word-unigram hashes + 16-bit band keys."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col = text_col
        self.id_col = id_col

    @staticmethod
    def simhash64(text: str) -> int:
        toks = word_ngram_hashes(text, 1)
        if toks.size == 0:
            return 0
        # spread 32-bit token hashes to 64 bits deterministically
        h64 = (toks * np.uint64(0x9E3779B97F4A7C15)) ^ (toks << np.uint64(17))
        bits = ((h64[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        counts = (2 * bits - 1).sum(axis=0)
        return int(((counts >= 0).astype(np.uint64)
                    << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sh = np.array(
            [self.simhash64(t) for t in batch[self.text_col]], dtype=np.uint64
        )
        out = pd.DataFrame({self.id_col: batch[self.id_col]})
        out["simhash"] = sh.astype(np.int64)
        for band in range(4):
            out[f"b{band}"] = ((sh >> np.uint64(16 * band)) & np.uint64(0xFFFF)).astype(
                np.int32
            )
        return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.view(np.uint64), b.view(np.uint64))
    cnt = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def simhash_pairs(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 200,
) -> Dataset:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.
    Band blocking: two docs within Hamming 3 of each other share at
    least one of the four 16-bit bands (pigeonhole)."""
    from ..functions.agg import grouped_blockwise

    sk = ds.select_columns([id_col, text_col]).map_batches(
        SimHashSketcher,
        fn_constructor_args=(text_col, id_col),
        batch_format="pandas",
        concurrency=(1, 8),
        num_cpus=0.5,
    ).materialize()

    parts = []
    for band in range(4):
        parts.append(
            grouped_blockwise(
                sk, [f"b{band}"],
                _bucket_pairs_block([f"b{band}"], id_col, max_bucket,
                                    carry=["simhash"]),
            )
        )
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.union(p)
    cand = _distinct_pairs(cand)

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []}).astype(
                {"id_a": "int64", "id_b": "int64", "hamming": "int64"}
            )
        d = hamming64(
            b["simhash_a"].to_numpy(np.int64), b["simhash_b"].to_numpy(np.int64)
        )
        out = pd.DataFrame(
            {"id_a": b["id_a"], "id_b": b["id_b"], "hamming": d}
        )
        return out[out["hamming"] <= max_hamming]

    return cand.map_batches(verify, batch_format="pandas")


def ngram_jaccard_pairs(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 3,
    threshold: float = 0.5,
    num_blocks: int = 8,
    max_bucket: int = 200,
    seed: int = 11,
    texts_ref: Optional[Union["ray.ObjectRef", dict]] = None,
) -> Dataset:
    """Exact word-n-gram Jaccard pairs, blocked by the documents'
    ``num_blocks`` smallest gram hashes (min-K blocking: two docs with
    Jaccard >= t share a smallest-gram with high probability)."""
    if texts_ref is None:
        texts_ref = ray.put(_texts_dict(ds, id_col, text_col))

    def block(b: pd.DataFrame) -> pd.DataFrame:
        ids, keys = [], []
        for doc_id, text in zip(b[id_col], b[text_col]):
            g = np.sort(word_ngram_hashes(text, ngram_n))[:num_blocks]
            ids.extend([doc_id] * len(g))
            keys.extend(g.tolist())
        return pd.DataFrame(
            {id_col: np.asarray(ids), "block": np.asarray(keys, dtype=np.int64)}
        )

    from ..functions.agg import grouped_blockwise

    blocked = ds.select_columns([id_col, text_col]).map_batches(
        block, batch_format="pandas"
    )
    cand = grouped_blockwise(
        blocked, ["block"], _bucket_pairs_block(["block"], id_col, max_bucket)
    )
    cand = _distinct_pairs(cand)
    return cand.map_batches(
        _PairVerifier,
        fn_constructor_args=(texts_ref, "word", 0, ngram_n, threshold),
        batch_format="pandas",
        concurrency=(1, 8),
        num_cpus=0.5,
    )


# --------------------------------------------------------------------------
# Embedding cosine near-dup


class _CosinePairs:
    """Per-batch rows vs the broadcast normalized matrix: emits pairs
    (a < b) with rounded cosine >= threshold."""

    def __init__(self, mat_ref, threshold: float, id_col: str):
        ids, mat = ray.get(mat_ref) if isinstance(mat_ref, ray.ObjectRef) else mat_ref
        self.ids = ids
        self.mat = mat  # (N, d) float64 L2-normalized
        self.pos = {v: i for i, v in enumerate(ids)}
        self.threshold = threshold
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        bids = batch[self.id_col].to_numpy()
        rows = np.asarray([self.pos[v] for v in bids])
        sims = self.mat[rows] @ self.mat.T  # (batch, N)
        sims = np.round(sims, 6)
        out_a, out_b, out_s = [], [], []
        for r, a in enumerate(bids):
            cols = np.nonzero(sims[r] >= self.threshold)[0]
            for c in cols:
                b_id = self.ids[c]
                if b_id > a:
                    out_a.append(a)
                    out_b.append(b_id)
                    out_s.append(sims[r, c])
        return pd.DataFrame(
            {
                "id_a": np.asarray(out_a, dtype=np.int64),
                "id_b": np.asarray(out_b, dtype=np.int64),
                "cosine": np.asarray(out_s, dtype=np.float64),
            }
        )


def normalized_matrix(
    ds: Dataset, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """Collect (ids, L2-normalized float64 matrix) — the broadcast side.
    At larger-than-memory scale, replace with IVF bucketing
    (see stages.similarity)."""
    ids, vecs = [], []
    for b in ds.select_columns([id_col, vec_col]).iter_batches(
        batch_size=8192, batch_format="pandas"
    ):
        ids.extend(b[id_col].tolist())
        vecs.extend(np.asarray(v, dtype=np.float64) for v in b[vec_col])
    mat = np.vstack(vecs)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    ids = np.asarray(ids, dtype=np.int64)
    order = np.argsort(ids)
    return ids[order], (mat / norms)[order]


def embedding_pairs(
    ds: Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> Dataset:
    """Cosine >= threshold near-dup pairs over an embedding column."""
    mat_ref = ray.put(normalized_matrix(ds, id_col=id_col, vec_col=vec_col))
    return ds.map_batches(
        _CosinePairs,
        fn_constructor_args=(mat_ref, threshold, id_col),
        batch_format="pandas",
        batch_size=1024,
        concurrency=(1, 8),
        num_cpus=0.5,
    )


# --------------------------------------------------------------------------
# Pairs -> clusters


def dedup_clusters(pairs: Dataset, *, id_a: str = "id_a", id_b: str = "id_b") -> Dataset:
    """Duplicate-pair edges -> (node_id, cluster_id), min id per
    connected component (deterministic representative)."""
    from .canonicalize import connected_components

    return connected_components(pairs, src_col=id_a, dst_col=id_b)
