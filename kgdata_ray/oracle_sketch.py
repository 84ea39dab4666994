"""Golden-parquet oracles for the sketch / ANN / media query family.

These queries (MinHash-LSH, SimHash, n-gram-Jaccard and hyperplane-LSH
pair candidates, rolling fingerprints, IVF kNN, fake media features)
are not SQL-expressible, so — exactly like the KG family in
:mod:`kgdata_ray.oracle_tables` — their DuckDB oracle is
``SELECT * FROM read_parquet(<golden>)`` over outputs materialized here
by an INDEPENDENT naive implementation of the same published sketch
specs (single-process numpy/python loops over the parquet inputs; no
imports from the engine's ``stages/`` modules). The driver then
certifies Ray-vs-golden equality at sf0.01; pytest does the same at
sf0.001.

The specs being re-implemented are deterministic by construction
(seed-derived permutations / hyperplanes, polynomial hash constants),
so an independent implementation reproduces the exact pair sets — any
divergence is a real bug in one of the two implementations.

Generation is idempotent and concurrency-safe (build in a temp dir,
atomically rename; marker written last, inside the build dir).
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import re
import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .oracle_tables import ORACLE_BASE

SKETCH_ORACLE_VERSION = 29

_M32 = np.uint64(0xFFFFFFFF)
_POW257 = [pow(257, j, 1 << 32) for j in range(4096)]
_FOLD1M3 = [pow(1000003, j, 1 << 32) for j in range(16)]


# --------------------------------------------------------------------------
# Hash kernels (independent formulations of the engine's published specs)


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Unique 32-bit polynomial hashes of all k-byte shingles (utf-8,
    right-padded with spaces below k bytes); shifted-slice accumulation
    rather than the engine's sliding-window matmul."""
    data = text.encode("utf-8")
    if len(data) < k:
        data = data + b" " * (k - len(data))
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(b) - k + 1
    h = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        h += b[j : j + n] * np.uint64(_POW257[j])
    return np.unique(h & _M32)


def token_hash_list(text: str) -> list[int]:
    """32-bit polynomial hash per ASCII-whitespace token of the
    lowercased text, in order, duplicates kept (scalar loop — the
    engine's reduceat kernel is the thing under test)."""
    out = []
    for tok in text.lower().encode("utf-8").split():
        h = 0
        for i, c in enumerate(tok):
            h = (h + c * _POW257[i % 4096]) & 0xFFFFFFFF
        out.append(h)
    return out


def ngram_hashes(text: str, n: int) -> np.ndarray:
    """Unique 32-bit word n-gram hashes (token hashes folded with the
    1000003 constants; zero-padded below n tokens)."""
    th = token_hash_list(text)
    if len(th) < n:
        th = th + [0] * (n - len(th))
    vals = set()
    for i in range(len(th) - n + 1):
        h = 0
        for j in range(n):
            h += th[i + j] * _FOLD1M3[j]
        vals.add(h & 0xFFFFFFFF)
    return np.array(sorted(vals), dtype=np.uint64)


def jaccard_sets(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(set(a.tolist()) & set(b.tolist()))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def _bucket_pairs(buckets: dict, max_bucket: int) -> set[tuple[int, int]]:
    """All (lo, hi) id pairs sharing a bucket of size in [2, max_bucket]
    (the engine's documented degenerate-collision cap)."""
    pairs: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        if not (2 <= len(ids) <= max_bucket):
            continue
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    return pairs


def _pair_table(rows: list[tuple], names: list[str], types: list) -> pa.Table:
    cols = list(zip(*rows)) if rows else [[] for _ in names]
    return pa.table(
        {n: pa.array(list(c), t) for n, c, t in zip(names, cols, types)}
    )


# --------------------------------------------------------------------------
# Golden computations (one naive function per query)


def golden_minhash_pairs(ids, texts, *, num_perm=64, band_size=4,
                         shingle_k=5, threshold=0.6, seed=7,
                         max_bucket=200,
                         prefilter_margin=0.25) -> pa.Table:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 31, size=num_perm, dtype=np.uint64) * 2 + 1
    b = rng.integers(0, 1 << 31, size=num_perm, dtype=np.uint64)
    fold = np.array(
        [1099511628211**j % (1 << 61) for j in range(band_size)],
        dtype=np.uint64,
    )
    num_bands = num_perm // band_size
    shingles = {i: shingle_hashes(t, shingle_k) for i, t in zip(ids, texts)}
    buckets: dict = {}
    sig8: dict = {}
    for i in ids:
        h = shingles[i]
        mins = np.empty(num_perm, dtype=np.uint64)
        for p in range(num_perm):
            mins[p] = (a[p] * h + b[p]).min()  # uint64 wraparound
        sig8[int(i)] = (mins & np.uint64(0xFF)).astype(np.uint8)
        for band in range(num_bands):
            seg = mins[band * band_size : (band + 1) * band_size]
            key = np.int64((seg * fold).sum().astype(np.int64))
            buckets.setdefault((band, int(key)), []).append(int(i))
    # the engine's spec'd signature sieve: drop candidates whose 8-bit
    # minhash agreement estimate sits below threshold - margin
    est_min = (threshold - prefilter_margin
               if prefilter_margin is not None else 0.0)
    rows = []
    for lo, hi in sorted(_bucket_pairs(buckets, max_bucket)):
        if est_min > 0 and (sig8[lo] == sig8[hi]).mean() < est_min:
            continue
        j = round(jaccard_sets(shingles[lo], shingles[hi]), 6)
        if j >= threshold:
            rows.append((lo, hi, j))
    return _pair_table(rows, ["id_a", "id_b", "jaccard"],
                       [pa.int64(), pa.int64(), pa.float64()])


def simhash64(text: str) -> int:
    toks = ngram_hashes(text, 1)
    if toks.size == 0:
        return 0
    acc = [0] * 64
    m64 = (1 << 64) - 1
    for t in toks.tolist():
        h = ((t * 0x9E3779B97F4A7C15) ^ (t << 17)) & m64
        for bit in range(64):
            acc[bit] += 1 if (h >> bit) & 1 else -1
    return sum(1 << bit for bit in range(64) if acc[bit] >= 0)


def golden_fuzzy_contamination(ids, texts, *, probe_mod=11,
                               num_perm=64, band_size=4, shingle_k=5,
                               threshold=0.6, seed=7,
                               max_bucket=200) -> pa.Table:
    """Sequential spec twin of stages.dedup.fuzzy_contamination with
    the query's probe derivation: probe docs are ids % probe_mod == 0
    with the text truncated to the first 4/5 of its space-separated
    words (a planted near-duplicate). Probe ids lift by 2^40; buckets
    come from the shared minhash banding; ONLY cross-side pairs are
    verified (exact char-shingle Jaccard); output = sorted distinct
    contaminated doc ids."""
    offset = 1 << 40
    u_ids = [int(i) for i in ids]
    u_texts = list(texts)
    for i, t in zip(ids, texts):
        if int(i) % probe_mod == 0:
            w = t.split(" ")
            u_ids.append(int(i) + offset)
            u_texts.append(" ".join(w[:max(1, len(w) * 4 // 5)]))

    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 31, size=num_perm, dtype=np.uint64) * 2 + 1
    b = rng.integers(0, 1 << 31, size=num_perm, dtype=np.uint64)
    fold = np.array(
        [1099511628211**j % (1 << 61) for j in range(band_size)],
        dtype=np.uint64,
    )
    num_bands = num_perm // band_size
    shingles = {i: shingle_hashes(t, shingle_k)
                for i, t in zip(u_ids, u_texts)}
    buckets: dict = {}
    for i in u_ids:
        h = shingles[i]
        mins = np.empty(num_perm, dtype=np.uint64)
        for pi in range(num_perm):
            mins[pi] = (a[pi] * h + b[pi]).min()
        for band in range(num_bands):
            seg = mins[band * band_size:(band + 1) * band_size]
            key = np.int64((seg * fold).sum().astype(np.int64))
            buckets.setdefault((band, int(key)), []).append(int(i))
    hit: set[int] = set()
    for lo, hi in sorted(_bucket_pairs(buckets, max_bucket)):
        if not (lo < offset <= hi):
            continue  # cross-side pairs only
        if lo in hit:
            continue
        j = round(jaccard_sets(shingles[lo], shingles[hi]), 6)
        if j >= threshold:
            hit.add(lo)
    return pa.table({"doc_id": pa.array(sorted(hit), pa.int64())})


def golden_simhash_pairs(ids, texts, *, max_hamming=3,
                         max_bucket=200) -> pa.Table:
    sh = {int(i): simhash64(t) for i, t in zip(ids, texts)}
    buckets: dict = {}
    for i, h in sh.items():
        for band in range(4):
            buckets.setdefault((band, (h >> (16 * band)) & 0xFFFF), []).append(i)
    rows = []
    for lo, hi in sorted(_bucket_pairs(buckets, max_bucket)):
        d = bin(sh[lo] ^ sh[hi]).count("1")
        if d <= max_hamming:
            rows.append((lo, hi, d))
    return _pair_table(rows, ["id_a", "id_b", "hamming"],
                       [pa.int64(), pa.int64(), pa.int64()])


def golden_ngram_jaccard_pairs(ids, texts, *, ngram_n=3, threshold=0.5,
                               num_blocks=8, max_bucket=200) -> pa.Table:
    grams = {int(i): ngram_hashes(t, ngram_n) for i, t in zip(ids, texts)}
    buckets: dict = {}
    for i, g in grams.items():
        for key in g[:num_blocks].tolist():  # smallest (sorted unique)
            buckets.setdefault(key, []).append(i)
    rows = []
    for lo, hi in sorted(_bucket_pairs(buckets, max_bucket)):
        j = round(jaccard_sets(grams[lo], grams[hi]), 6)
        if j >= threshold:
            rows.append((lo, hi, j))
    return _pair_table(rows, ["id_a", "id_b", "jaccard"],
                       [pa.int64(), pa.int64(), pa.float64()])


def golden_embedding_lsh_pairs(vec_ids, vecs, *, threshold=0.4,
                               num_tables=16, bits=4, seed=23,
                               max_bucket=2000) -> pa.Table:
    mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
    dim = mat.shape[1]
    planes = np.random.default_rng(seed).standard_normal(
        (num_tables, dim, bits)
    )
    weights = 1 << np.arange(bits, dtype=np.int64)
    buckets: dict = {}
    for r, i in enumerate(vec_ids):
        for t in range(num_tables):
            sig = int(((mat[r] @ planes[t]) > 0) @ weights)
            buckets.setdefault((t, sig), []).append(int(i))
    by_id = {int(i): r for r, i in enumerate(vec_ids)}
    rows = []
    for lo, hi in sorted(_bucket_pairs(buckets, max_bucket)):
        va, vb = mat[by_id[lo]], mat[by_id[hi]]
        na = np.linalg.norm(va) or 1.0
        nb = np.linalg.norm(vb) or 1.0
        cos = round(float(va @ vb) / (na * nb), 6)
        if cos >= threshold:
            rows.append((lo, hi))
    return _pair_table(rows, ["id_a", "id_b"], [pa.int64(), pa.int64()])


def golden_rolling_fp(ids, texts, *, window=64) -> pa.Table:
    fps = []
    for t in texts:
        h = shingle_hashes(t, min(window, max(1, len(t))))
        fps.append(int(h.min()) if h.size else 0)
    return pa.table(
        {"doc_id": pa.array([int(i) for i in ids], pa.int64()),
         "rolling_fp": pa.array(fps, pa.int64())}
    )


def golden_knn_ivf(vec_ids, vecs, *, query_ids=range(8), k=5,
                   num_centroids=8, sample_size=2048, iters=5, seed=13,
                   nprobe=4) -> pa.Table:
    def norm(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    ids = np.asarray([int(i) for i in vec_ids], dtype=np.int64)
    mat = norm(np.vstack([np.asarray(v, dtype=np.float64) for v in vecs]))

    # centroids: seeded mini-KMeans on the first sample_size rows
    sample = mat[:sample_size]
    rng = np.random.default_rng(seed)
    C = min(num_centroids, len(sample))
    cent = sample[rng.choice(len(sample), size=C, replace=False)]
    for _ in range(iters):
        assign = (sample @ cent.T).argmax(axis=1)
        for c in range(C):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = norm(cent)

    q_ids = np.asarray(sorted(set(int(q) for q in query_ids) & set(ids.tolist())),
                       dtype=np.int64)
    pos = {int(i): r for r, i in enumerate(ids)}
    q_mat = mat[[pos[int(q)] for q in q_ids]]
    probe = np.argsort(-(q_mat @ cent.T), axis=1)[:, :nprobe]
    probed = set(probe.ravel().tolist())
    corpus_assign = (mat @ cent.T).argmax(axis=1)
    keep = np.isin(corpus_assign, list(probed))
    c_ids, c_mat = ids[keep], mat[keep]

    sims = np.round(q_mat @ c_mat.T, 6)
    rows = []
    for qi, q in enumerate(q_ids):
        cands = [(float(sims[qi, ci]), int(c)) for ci, c in enumerate(c_ids)
                 if int(c) != int(q)]
        cands.sort(key=lambda x: (-x[0], x[1]))
        for rank, (_cos, c) in enumerate(cands[:k], start=1):
            rows.append((int(q), c, rank))
    return _pair_table(rows, ["query_id", "neighbor_id", "rank"],
                       [pa.int64(), pa.int64(), pa.int64()])


def golden_ann_recall(vec_ids, vecs, *, query_ids=range(8), k=5,
                      num_centroids=8, nprobe=2, seed=13) -> pa.Table:
    """Independent recall@k golden: exact leg by naive full-matrix
    cosine (6-dp round, ties by id), approximate leg by the naive
    seeded-IVF replication in :func:`golden_knn_ivf`, then the exact
    integer recall ``1000 * |common| // k`` per query."""
    ids = np.asarray([int(i) for i in vec_ids], np.int64)
    mat = np.asarray([np.asarray(v, np.float64) for v in vecs])
    nm = np.linalg.norm(mat, axis=1, keepdims=True)
    nm[nm == 0] = 1.0
    matn = mat / nm
    q_ids = sorted(set(int(q) for q in query_ids) & set(ids.tolist()))
    pos = {int(i): r for r, i in enumerate(ids)}
    exact = {}
    for q in q_ids:
        sims = np.round(matn @ matn[pos[q]], 6)
        cands = sorted(
            ((float(sims[pos[int(c)]]), int(c)) for c in ids
             if int(c) != q),
            key=lambda x: (-x[0], x[1]))
        exact[q] = {c for _s, c in cands[:k]}
    approx = {}
    ivf = golden_knn_ivf(vec_ids, vecs, query_ids=q_ids, k=k,
                         num_centroids=num_centroids, seed=seed,
                         nprobe=nprobe)
    for qd, nb in zip(ivf["query_id"].to_pylist(),
                      ivf["neighbor_id"].to_pylist()):
        approx.setdefault(int(qd), set()).add(int(nb))
    rows = []
    for q in q_ids:
        n = len(exact[q] & approx.get(q, set()))
        rows.append((q, n, 1000 * n // k))
    return _pair_table(rows, ["query_id", "n_common", "recall_milli"],
                       [pa.int64()] * 3)


def golden_embedding_pca(vec_ids, vecs, *, n_components=2,
                         scale=1 << 20, out_scale=1_000_000) -> pa.Table:
    """Independent exact-PCA golden: scalar accumulation of the
    quantized integer moments over the full matrix (Python ints), the
    same pinned covariance ``n*Sxx - sx sx^T``, numpy eigh on the
    bit-identical float64 matrix, largest-|component|-positive sign
    pin, and half-away micro rounding. No engine imports."""
    ids = [int(i) for i in vec_ids]
    mat = np.floor(
        np.asarray([np.asarray(v, np.float64) for v in vecs]) * scale
    ).astype(np.int64)
    n, d = mat.shape
    sx = [0] * d
    sxx = [[0] * d for _ in range(d)]
    for r in range(n):
        row = [int(x) for x in mat[r]]
        for i in range(d):
            sx[i] += row[i]
            ri = row[i]
            for j in range(d):
                sxx[i][j] += ri * row[j]
    cov = np.array(
        [[n * sxx[i][j] - sx[i] * sx[j] for j in range(d)]
         for i in range(d)], np.float64)
    _evals, evecs = np.linalg.eigh(cov)
    comp = evecs[:, ::-1][:, :n_components].copy()
    for c in range(n_components):
        m = int(np.argmax(np.abs(comp[:, c])))
        if comp[m, c] < 0:
            comp[:, c] = -comp[:, c]
    mean = np.array([(float(sx[j]) / float(n)) / float(scale)
                     for j in range(d)], np.float64)
    x = mat.astype(np.float64) / float(scale)
    p = (x - mean) @ comp
    rows = []
    for r in range(n):
        rows.append((ids[r],
                     *(int(np.floor(p[r, c] * out_scale + 0.5))
                       for c in range(n_components))))
    names = ["vec_id"] + [f"pc{c}_micro" for c in range(n_components)]
    return _pair_table(rows, names, [pa.int64()] * (n_components + 1))


def golden_contrastive_pairs(vec_ids, vecs, labels, *, query_mod=50,
                             scale=1 << 20) -> pa.Table:
    """Independent contrastive-mining golden: scalar Python-int
    squared-L2 loops over every (query, candidate) pair, smallest
    distance then smallest candidate id, query's own row excluded
    from positives. No engine imports."""
    ids = [int(i) for i in vec_ids]
    labs = [int(l) for l in labels]
    fx = [[int(x) for x in np.floor(
        np.asarray(v, np.float64) * scale).astype(np.int64)]
        for v in vecs]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    rows = []
    for qpos, qid in enumerate(ids):
        if qid % query_mod != 0:
            continue
        best = {"pos": (None, None), "neg": (None, None)}
        for cpos, cid in enumerate(ids):
            same = labs[cpos] == labs[qpos]
            kind = "pos" if same else "neg"
            if kind == "pos" and cid == qid:
                continue
            dist = d2(fx[qpos], fx[cpos])
            bd, bc = best[kind]
            if bd is None or dist < bd or (dist == bd and cid < bc):
                best[kind] = (dist, cid)
        for kind in ("pos", "neg"):
            bd, bc = best[kind]
            if bd is not None:
                rows.append((qid, kind, bc, bd))
    rows.sort()
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "kind": pa.array([r[1] for r in rows], pa.string()),
        "cand_id": pa.array([r[2] for r in rows], pa.int64()),
        "dist_q": pa.array([r[3] for r in rows], pa.int64()),
    })


def golden_leakage_split(ids, pairs: pa.Table, *,
                         fractions=(0.8, 0.1, 0.1),
                         labels=("train", "val", "test"),
                         salt="lsplit") -> pa.Table:
    """Independent leakage-safe-split golden: union-find components
    over the golden pair table, group key = component id (own id when
    unpaired), and the published keyed-md5 banding contract — cut[i]
    = format(int(running_fraction * 16**8), '08x'), accumulated
    left-to-right exactly as documented."""
    import hashlib

    comp_tbl = golden_clusters(pairs)
    comp = dict(zip(comp_tbl["node_id"].to_pylist(),
                    comp_tbl["component_id"].to_pylist()))
    cuts = []
    acc = 0.0
    for f in list(fractions)[:-1]:
        acc += f
        cuts.append("g" if acc >= 1.0 else format(int(acc * 16**8),
                                                  "08x"))
    rows = []
    for i in ids:
        g = int(comp.get(int(i), int(i)))
        h = hashlib.md5((salt + str(g)).encode()).hexdigest()[:8]
        lab = labels[-1]
        for ci, c in enumerate(cuts):
            if h < c:
                lab = labels[ci]
                break
        rows.append((int(i), g, lab))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "group_id": pa.array([r[1] for r in rows], pa.int64()),
        "split": pa.array([r[2] for r in rows], pa.string()),
    })


def golden_linear_probe(vec_ids, vecs, labels, *, target_label=0,
                        ridge=1.0, scale=1 << 20,
                        out_scale=1_000_000) -> pa.Table:
    """Independent linear-probe golden: scalar Python-int accumulation
    of the augmented normal-equation moments (bias column at
    ``scale``), the same pinned ridge solve on the bit-identical
    float64 reduction, and half-away micro rounding of every score.
    No engine imports."""
    ids = [int(i) for i in vec_ids]
    mat = np.floor(
        np.asarray([np.asarray(v, np.float64) for v in vecs]) * scale
    ).astype(np.int64)
    n, d = mat.shape
    dd = d + 1
    y = [1 if int(l) == target_label else 0 for l in labels]
    sxx = [[0] * dd for _ in range(dd)]
    sxy = [0] * dd
    for r in range(n):
        row = [int(x) for x in mat[r]] + [scale]
        yr = y[r]
        for i in range(dd):
            ri = row[i]
            sxy[i] += ri * yr
            for j in range(dd):
                sxx[i][j] += ri * row[j]
    m = np.array(sxx, np.float64) / float(scale) ** 2
    v = np.array(sxy, np.float64) / float(scale)
    for i in range(dd - 1):
        m[i, i] += float(ridge)
    w = np.linalg.solve(m, v)
    x = mat.astype(np.float64) / float(scale)
    s = x @ w[:-1] + w[-1]
    rows = [(ids[r], y[r], int(np.floor(s[r] * out_scale + 0.5)))
            for r in range(n)]
    return _pair_table(rows, ["vec_id", "is_target", "score_micro"],
                       [pa.int64()] * 3)


def golden_dsir(ids, texts, sources, *, target_source="src0",
                buckets=4096, k=100, scale=1_000_000):
    """Independent DSIR golden: scalar dict counting of md5-hashed
    unigram+bigram buckets (Python ints, per-gram loop — a genuinely
    different accumulation than the engine's vectorized bincount), the
    same pinned add-one log-ratio freeze, exact integer per-doc weight
    sums, and the md5-derived Gumbel key. Returns (scores, sample)."""
    import hashlib
    import re

    grams_per_doc = []
    for txt in texts:
        toks = [t for t in re.split("[^a-z0-9]+", txt.lower()) if t]
        grams_per_doc.append(
            toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])])

    def bucket(g: str) -> int:
        return int.from_bytes(
            hashlib.md5(g.encode()).digest()[:8], "big") % buckets

    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    for s, grams in zip(sources, grams_per_doc):
        for g in grams:
            b = bucket(g)
            raw[b] = raw.get(b, 0) + 1
            if s == target_source:
                tgt[b] = tgt.get(b, 0) + 1
    r = np.zeros(buckets, np.int64)
    t = np.zeros(buckets, np.int64)
    for b, n in raw.items():
        r[b] = n
    for b, n in tgt.items():
        t[b] = n
    total_r = float(r.sum() + buckets)
    total_t = float(t.sum() + buckets)
    lam = np.floor(
        (np.log((t + 1).astype(np.float64) / total_t)
         - np.log((r + 1).astype(np.float64) / total_r)) * scale
        + 0.5).astype(np.int64)

    score_rows = []
    key_rows = []
    for i, grams in zip(ids, grams_per_doc):
        w = 0
        for g in grams:
            w += int(lam[bucket(g)])
        score_rows.append((int(i), len(grams), w))
        h = int.from_bytes(
            hashlib.md5(f"dsir|{int(i)}".encode()).digest()[:8], "big")
        u = (np.float64(h) + np.float64(0.5)) / np.float64(1 << 64)
        gum = -np.log(-np.log(u))
        key_rows.append((int(i), w,
                         w + int(np.floor(gum * scale + 0.5))))
    sel = sorted(key_rows, key=lambda x: (-x[2], x[0]))[:k]
    return (
        _pair_table(score_rows, ["doc_id", "n_grams", "weight_micro"],
                    [pa.int64()] * 3),
        _pair_table(sel, ["doc_id", "weight_micro", "key_micro"],
                    [pa.int64()] * 3),
    )


def golden_knn_ivf_perquery(vec_ids, vecs, *, query_mod=5, k=5,
                            num_centroids=8, sample_size=2048, iters=5,
                            seed=13, nprobe=2) -> pa.Table:
    """Per-query-probe IVF semantics (the distributed large-Q path):
    each query is scored ONLY against the posting lists of its own
    nprobe nearest centroids — unlike golden_knn_ivf, which scores
    every query against the union of all probed lists."""
    def norm(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    ids = np.asarray([int(i) for i in vec_ids], dtype=np.int64)
    mat = norm(np.vstack([np.asarray(v, dtype=np.float64) for v in vecs]))

    sample = mat[:sample_size]
    rng = np.random.default_rng(seed)
    C = min(num_centroids, len(sample))
    cent = sample[rng.choice(len(sample), size=C, replace=False)]
    for _ in range(iters):
        assign = (sample @ cent.T).argmax(axis=1)
        for c in range(C):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = norm(cent)

    corpus_assign = (mat @ cent.T).argmax(axis=1)
    lists: dict[int, list[int]] = {}
    for row, c in enumerate(corpus_assign.tolist()):
        lists.setdefault(int(c), []).append(row)

    q_rows = [r for r, i in enumerate(ids.tolist()) if i % query_mod == 0]
    probe = np.argsort(-(mat[q_rows] @ cent.T), axis=1,
                       kind="stable")[:, :nprobe]
    rows = []
    for qi, qrow in enumerate(q_rows):
        q = int(ids[qrow])
        cands = []
        for c in probe[qi].tolist():
            for crow in lists.get(int(c), ()):
                ci = int(ids[crow])
                if ci == q:
                    continue
                cos = float(np.round(mat[qrow] @ mat[crow], 6))
                cands.append((cos, ci))
        cands.sort(key=lambda x: (-x[0], x[1]))
        for rank, (_cos, ci) in enumerate(cands[:k], start=1):
            rows.append((q, ci, rank))
    return _pair_table(rows, ["query_id", "neighbor_id", "rank"],
                       [pa.int64(), pa.int64(), pa.int64()])


def golden_media_features(ids, texts, *, limit=128, dim=8) -> pa.Table:
    rows = []
    for i, t in list(zip(ids, texts))[:limit]:
        payload = t.encode("utf-8")
        if not payload:
            feats = [0.0] * dim
        else:
            chunks = np.array_split(np.frombuffer(payload, dtype=np.uint8), dim)
            feats = [round(float(c.mean()), 4) if len(c) else 0.0
                     for c in chunks]
        rows.append((int(i), "image", hashlib.sha1(payload).hexdigest(),
                     *feats))
    names = ["item_id", "kind", "digest"] + [f"feat_{j}" for j in range(dim)]
    types = [pa.int64(), pa.string(), pa.string()] + [pa.float64()] * dim
    return _pair_table(rows, names, types)


def golden_audio_features(ids, *, limit=128, dim=8) -> pa.Table:
    """Independent real-audio-decode golden: rebuilds each synthetic
    WAV payload straight from the RIFF spec and the doc_id parameter
    formulas (rate = RATES[id%4], channels = 1+id%2, 16-bit PCM,
    frames = 100+id%400, data byte k = (k*7)&0xFF), decodes the PCM
    samples by struct layout — NOT via the stdlib ``wave`` module the
    engine uses — normalizes to [-1, 1) and takes ``dim`` bucket
    means rounded to 4 dp."""
    import struct

    rates = (8000, 16000, 22050, 44100)
    rows = []
    for i in list(ids)[:limit]:
        i = int(i)
        rate, ch, frames = rates[i % 4], 1 + i % 2, 100 + i % 400
        block = ch * 2
        data = bytes((k * 7) & 0xFF for k in range(frames * block))
        fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
        payload = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8
                                         + len(data))
                   + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                   + b"data" + struct.pack("<I", len(data)) + data)
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        feats = [round(float(c.mean()), 4) if len(c) else 0.0
                 for c in np.array_split(x, dim)]
        rows.append((i, "audio", hashlib.sha1(payload).hexdigest(),
                     *feats))
    names = ["item_id", "kind", "digest"] + [f"feat_{j}" for j in range(dim)]
    types = [pa.int64(), pa.string(), pa.string()] + [pa.float64()] * dim
    return _pair_table(rows, names, types)


def golden_hll_ndistinct(group_vals, int_vals, *, p=12) -> pa.Table:
    """Independent HyperLogLog: pure-python splitmix64 + bit_length
    rho per value, registers built in a dict loop. The final estimator
    uses the same numpy closed-form expression as the engine (register
    equality then implies bit-identical estimates); everything before
    it is loop-based and engine-import-free."""
    MASK = (1 << 64) - 1
    m = 1 << p
    q = 64 - p

    def sm64(x: int) -> int:
        z = (x + 0x9E3779B97F4A7C15) & MASK
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
        return z ^ (z >> 31)

    regs: dict[str, list[int]] = {}
    for g, v in zip(group_vals, int_vals):
        h = sm64(int(v) & MASK)
        r = regs.setdefault(str(g), [0] * m)
        idx = h >> q
        w = h & ((1 << q) - 1)
        rho = (q + 1) if w == 0 else (q - (w.bit_length() - 1))
        if rho > r[idx]:
            r[idx] = rho

    groups = sorted(regs)
    ests = []
    for g in groups:
        arr = np.asarray(regs[g], dtype=np.uint8)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / float(np.sum(np.exp2(-arr.astype(np.float64))))
        zeros = int((arr == 0).sum())
        if zeros and est <= 2.5 * m:
            est = m * float(np.log(m / zeros))
        ests.append(int(round(est)))
    return pa.table(
        {
            "event_type": pa.array(groups, pa.string()),
            "n_distinct_hll": pa.array(ests, pa.int64()),
        }
    )


def golden_clusters(pairs: pa.Table) -> pa.Table:
    """Union-find over a (id_a, id_b) pair table -> (node_id,
    component_id) with component_id = min node id per component — the
    engine computes the same thing by distributed min-label propagation
    (FIXTURES F3 determinism)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    ids_a = pairs["id_a"].to_pylist()
    ids_b = pairs["id_b"].to_pylist()
    for a, b in zip(ids_a, ids_b):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    nodes = sorted(parent)
    comp_min: dict[int, int] = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return pa.table(
        {
            "node_id": pa.array(nodes, pa.int64()),
            "component_id": pa.array([comp_min[find(n)] for n in nodes],
                                     pa.int64()),
        }
    )


def golden_pagerank(edges: list[tuple[str, str]], *, damping=0.85,
                    iters=5, personalization=None) -> pa.Table:
    """Dense power iteration over the golden triple edges (multi-edges
    kept; dangling mass redistributed uniformly so ranks sum to 1 —
    the engine's documented graph-tool-compatible semantics). With
    ``personalization`` (seed node list) the teleport and the dangling
    mass land on the seed vector instead — personalized PageRank.
    Ranks rounded to 6 dp; the engine query rounds identically, so the
    only tolerated difference is distributed-float summation order
    (~1e-15, invisible at 6 dp)."""
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _d in edges:
        out[idx[s]] += 1
    if personalization is not None:
        seeds = sorted(set(personalization))
        p = np.zeros(n)
        for s in seeds:
            p[idx[s]] = 1.0 / len(seeds)
    else:
        p = np.full(n, 1.0 / n)
    r = p.copy()
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, d in edges:
            contrib[idx[d]] += r[idx[s]] / out[idx[s]]
        dangling = max(0.0, 1.0 - contrib.sum())
        if personalization is not None:
            r = damping * contrib + ((1 - damping)
                                     + damping * dangling) * p
        else:
            r = (1 - damping) / n + damping * (contrib + dangling / n)
    return pa.table(
        {"node_id": pa.array(nodes, pa.string()),
         "rank": pa.array(np.round(r, 6), pa.float64())}
    )


# --------------------------------------------------------------------------
# Materialization


def sketch_oracle_dir(sf_dir: str) -> str:
    return f"{ORACLE_BASE}/sketch_{Path(sf_dir).name}"


def _marker_for(sf_dir: str) -> dict:
    return {"sketch_oracle_version": SKETCH_ORACLE_VERSION, "sf_dir": sf_dir}


def ensure_sketch_oracles(sf_dir: str) -> str:
    """Materialize (once) the golden sketch-family outputs for the
    documents/embeddings tables under ``sf_dir``; returns the directory.
    Idempotent and safe under concurrent callers (temp-dir build +
    atomic rename, marker written last)."""
    final = Path(sketch_oracle_dir(sf_dir))
    want = _marker_for(sf_dir)
    marker_path = final / "_SKETCH_MARKER.json"
    if _matches(marker_path, want):
        return str(final)

    out = Path(f"{final}.build-{os.getpid()}")
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True, exist_ok=True)

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    sources = docs["source"].to_pylist()
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding", "label"])
    vec_ids = emb["vec_id"].to_pylist()
    vecs = emb["embedding"].to_pylist()
    vec_labels = emb["label"].to_pylist()

    mh = golden_minhash_pairs(ids, texts)
    pq.write_table(mh, out / "minhash_pairs.parquet")
    pq.write_table(golden_clusters(mh), out / "minhash_clusters.parquet")
    pq.write_table(golden_simhash_pairs(ids, texts),
                   out / "simhash_pairs.parquet")
    pq.write_table(golden_fuzzy_contamination(ids, texts),
                   out / "fuzzy_contamination.parquet")
    pq.write_table(golden_ngram_jaccard_pairs(ids, texts),
                   out / "ngram_jaccard_pairs.parquet")
    pq.write_table(golden_embedding_lsh_pairs(vec_ids, vecs),
                   out / "embedding_lsh_pairs.parquet")
    pq.write_table(golden_rolling_fp(ids, texts), out / "rolling_fp.parquet")
    pq.write_table(golden_knn_ivf(vec_ids, vecs), out / "knn_ivf.parquet")
    pq.write_table(golden_knn_ivf_perquery(vec_ids, vecs),
                   out / "knn_ivf_perquery.parquet")
    pq.write_table(golden_media_features(ids, texts),
                   out / "media_features.parquet")
    pq.write_table(golden_audio_features(ids),
                   out / "audio_features.parquet")
    pq.write_table(golden_semdedup(vec_ids, vecs),
                   out / "semdedup.parquet")
    pq.write_table(golden_scalar_quantize(vec_ids, vecs),
                   out / "scalar_quantize.parquet")
    pq.write_table(golden_bpe_merges(texts),
                   out / "bpe_merges.parquet")
    pq.write_table(golden_knn_ivfpq(vec_ids, vecs),
                   out / "knn_ivfpq.parquet")
    pq.write_table(golden_bpe_encode(ids, texts),
                   out / "bpe_encode.parquet")
    pq.write_table(golden_image_features(ids),
                   out / "image_features.parquet")
    pq.write_table(golden_jpeg_features(ids),
                   out / "jpeg_features.parquet")
    pq.write_table(golden_mjpeg_frames(ids),
                   out / "mjpeg_frames.parquet")
    pq.write_table(golden_hybrid_rrf(ids, texts, vec_ids, vecs),
                   out / "hybrid_rrf.parquet")
    pq.write_table(golden_ann_recall(vec_ids, vecs),
                   out / "ann_recall.parquet")
    pq.write_table(golden_embedding_pca(vec_ids, vecs),
                   out / "embedding_pca.parquet")
    pq.write_table(golden_linear_probe(vec_ids, vecs, vec_labels),
                   out / "linear_probe.parquet")
    pq.write_table(golden_leakage_split(ids, mh),
                   out / "leakage_split.parquet")
    pq.write_table(golden_contrastive_pairs(vec_ids, vecs, vec_labels),
                   out / "contrastive_pairs.parquet")
    dsir_scores_tbl, dsir_sample_tbl = golden_dsir(ids, texts, sources)
    pq.write_table(dsir_scores_tbl, out / "dsir_scores.parquet")
    pq.write_table(dsir_sample_tbl, out / "dsir_sample.parquet")
    pq.write_table(golden_gif_frames(ids),
                   out / "gif_frames.parquet")
    pq.write_table(golden_dbscan(vec_ids, vecs),
                   out / "dbscan.parquet")
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_type", "user_id"])
    pq.write_table(
        golden_hll_ndistinct(ev["event_type"].to_pylist(),
                             ev["user_id"].to_pylist()),
        out / "hll_ndistinct.parquet",
    )
    pq.write_table(golden_cms_token_counts(texts),
                   out / "cms_token_counts.parquet")
    pq.write_table(golden_kmeans(vec_ids, vecs),
                   out / "kmeans_clusters.parquet")
    pq.write_table(golden_mmr(vec_ids, vecs),
                   out / "mmr_select.parquet")
    pq.write_table(golden_pq_codes(vec_ids, vecs),
                   out / "pq_codes.parquet")
    (out / "_SKETCH_MARKER.json").write_text(json.dumps(want))

    if _matches(marker_path, want):  # another process won the race
        shutil.rmtree(out, ignore_errors=True)
        return str(final)
    old = Path(f"{final}.old-{os.getpid()}")
    moved_old = False
    try:
        if final.exists():
            os.replace(final, old)
            moved_old = True
        os.replace(out, final)
    except OSError:
        # Restore the previous build if the second replace failed after
        # we moved it aside (otherwise readers would find no oracle).
        if moved_old and not final.exists():
            os.replace(old, final)
        shutil.rmtree(out, ignore_errors=True)
    if final.exists():
        shutil.rmtree(old, ignore_errors=True)
    return str(final)


def _matches(marker: Path, want: dict) -> bool:
    try:
        return json.loads(marker.read_text()) == want
    except (ValueError, OSError):
        return False


def _sm64(x: int) -> int:
    """Scalar splitmix64 finalizer (same public-domain constants as
    the engine's vectorized kernel)."""
    z = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _hash64_str(s: str) -> int:
    """Scalar spec twin of the engine's hash64_strs: position-weighted
    byte polynomial (multiplier 1099511628211 mod 2^64), splitmix64
    finalized."""
    h = 0
    for c in s.encode("utf-8"):
        h = (h * 1099511628211 + c) & 0xFFFFFFFFFFFFFFFF
    return _sm64(h)


def golden_cms_token_counts(texts, *, d=4, w=4096) -> pa.Table:
    """Sequential same-spec Count-Min Sketch over the whole lowercased
    [a-z0-9]+ token stream; answers every distinct token. Scalar dict
    counting + per-unique-token slot addition (additive accumulation
    is order-free, so this equals the engine's per-batch partials)."""
    import re as _re

    counts: dict = {}
    for t in texts:
        for tok in _re.split("[^a-z0-9]+", t.lower()):
            if tok:
                counts[tok] = counts.get(tok, 0) + 1
    sketch = np.zeros((d, w), dtype=np.int64)
    slots = {}
    for tok, n in counts.items():
        h = _hash64_str(tok)
        ss = [_sm64((h + (j + 1) * 0x9E3779B97F4A7C15)
                    & 0xFFFFFFFFFFFFFFFF) % w for j in range(d)]
        slots[tok] = ss
        for j in range(d):
            sketch[j, ss[j]] += n
    terms = sorted(counts)
    est = [int(min(sketch[j, slots[t][j]] for j in range(d)))
           for t in terms]
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "est_count": pa.array(est, pa.int64()),
        }
    )


def golden_mmr(vec_ids, vecs, *, k=10, seed_mod=101, w_rel=7,
               w_div=3, scale=1 << 20) -> pa.Table:
    """Sequential same-spec greedy MMR: L2-normalize, floor-quantize
    to int64, query = integer mean of the seed vectors (ids divisible
    by seed_mod), then k rounds of argmax(w_rel*rel - w_div*maxsim)
    with min-id ties. Updates maxsim INCREMENTALLY (assign on the
    first pick — a true max over S can be NEGATIVE, so the zero init
    must not act as a floor — then np.maximum per pick) where the
    engine recomputes the max over the selected set: max is
    associative, so the two agree exactly."""
    ids = np.asarray(vec_ids, np.int64)
    mat = np.vstack([np.asarray(v, np.float64) for v in vecs])
    nrm = np.linalg.norm(mat, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    fx = np.floor(mat / nrm * scale).astype(np.int64)
    seeds = fx[ids % seed_mod == 0]
    q = seeds.sum(axis=0, dtype=np.int64) // len(seeds)
    rel = fx @ q
    maxsim = np.zeros(len(ids), np.int64)
    taken = np.zeros(len(ids), bool)
    ranks, sel_ids, scores = [], [], []
    for r in range(min(k, len(ids))):
        score = w_rel * rel - w_div * maxsim
        idx = np.flatnonzero(~taken)
        best = idx[np.lexsort((ids[idx], -score[idx]))[0]]
        ranks.append(r)
        sel_ids.append(int(ids[best]))
        scores.append(int(score[best]))
        taken[best] = True
        sims = fx @ fx[best]
        maxsim = sims if r == 0 else np.maximum(maxsim, sims)
    return pa.table({
        "sel_rank": pa.array(ranks, pa.int64()),
        "vec_id": pa.array(sel_ids, pa.int64()),
        "mmr_fx": pa.array(scores, pa.int64()),
    })


def golden_kmeans(vec_ids, vecs, *, k=16, n_iter=5,
                  scale=1 << 20) -> pa.Table:
    """Sequential fixed-point Lloyd k-means, same integer spec as the
    engine (floor-quantized vectors, exact integer distances, centroid
    = elementwise sum // count): bit-identical by construction."""
    ids = np.asarray(vec_ids, dtype=np.int64)
    fx = np.floor(
        np.vstack([np.asarray(v, np.float64) for v in vecs]) * scale
    ).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids, fx = ids[order], fx[order]
    cents = fx[np.searchsorted(ids, np.arange(k))].copy()

    def assign(m, c):
        xx = (m * m).sum(axis=1)[:, None]
        cc = (c * c).sum(axis=1)[None, :]
        return (xx + cc - 2 * (m @ c.T)).argmin(axis=1)

    for _ in range(n_iter):
        a = assign(fx, cents)
        for cl in range(k):
            sel = fx[a == cl]
            if len(sel):
                cents[cl] = sel.sum(axis=0) // len(sel)
    a = assign(fx, cents)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(a.astype(np.int64), pa.int64()),
        }
    )


def golden_pq_codes(vec_ids, vecs, *, m=4, k=16, n_iter=3,
                    train_prefix=2048, scale=1 << 20) -> pa.Table:
    """Sequential same-spec product quantization: codebooks by
    fixed-point Lloyd on the id-prefix sample per contiguous subspace,
    then integer nearest-code assignment with summed squared error."""
    ids = np.asarray(vec_ids, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    fx = np.floor(
        np.vstack([np.asarray(v, np.float64) for v in vecs])[order]
        * scale
    ).astype(np.int64)
    d_sub = fx.shape[1] // m
    train = fx[ids < train_prefix]

    def assign(mat, c):
        xx = (mat * mat).sum(axis=1)[:, None]
        cc = (c * c).sum(axis=1)[None, :]
        return xx + cc - 2 * (mat @ c.T)

    cols = {"vec_id": pa.array(ids, pa.int64())}
    err = np.zeros(len(fx), dtype=np.int64)
    for j in range(m):
        sub_t = train[:, j * d_sub:(j + 1) * d_sub]
        cents = sub_t[:k].copy()
        for _ in range(n_iter):
            a = assign(sub_t, cents).argmin(axis=1)
            for cl in range(k):
                sel = sub_t[a == cl]
                if len(sel):
                    cents[cl] = sel.sum(axis=0) // len(sel)
        sub = fx[:, j * d_sub:(j + 1) * d_sub]
        d2 = assign(sub, cents)
        code = d2.argmin(axis=1)
        err += d2[np.arange(len(sub)), code]
        cols[f"code_{j}"] = pa.array(code.astype(np.int64), pa.int64())
    cols["err_fx"] = pa.array(err, pa.int64())
    return pa.table(cols)


def golden_comention_edges(triples_rows) -> list[tuple[str, str]]:
    """Distinct undirected co-mention edges (u < v) from golden triple
    rows [(subj, conv_id), ...] — naive set construction."""
    by_conv: dict = {}
    for subj, conv in triples_rows:
        by_conv.setdefault(conv, set()).add(subj)
    edges = set()
    for ents in by_conv.values():
        es = sorted(ents)
        for i in range(len(es)):
            for j in range(i + 1, len(es)):
                edges.add((es[i], es[j]))
    return sorted(edges)


def golden_kcore(edges: list[tuple[str, str]], k: int) -> pa.Table:
    """k-core node set by naive peeling (recompute neighbor counts
    against the surviving set every sweep until stable)."""
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    nodes = set(adj)
    changed = True
    while changed:
        changed = False
        for n in list(nodes):
            if n in nodes and len(adj[n] & nodes) < k:
                nodes.discard(n)
                changed = True
    return pa.table({"node": pa.array(sorted(nodes), pa.string())})


def golden_core_numbers(edges: list[tuple[str, str]]) -> pa.Table:
    """(node, core) by naive repeated peeling — deliberately a
    DIFFERENT algorithm from the engine's H-index iteration, so
    agreement certifies both."""
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    nodes = set(adj)
    core: dict = {}
    k = 1
    while nodes:
        changed = True
        while changed:
            changed = False
            for n in list(nodes):
                if n in nodes and len(adj[n] & nodes) < k:
                    core[n] = k - 1
                    nodes.discard(n)
                    changed = True
        k += 1
    items = sorted(core.items())
    return pa.table({
        "node": pa.array([n for n, _ in items], pa.string()),
        "core": pa.array([c for _, c in items], pa.int64()),
    })


def golden_components(edges: list[tuple[str, str]]) -> pa.Table:
    """(node_id, component_id) with component_id = min node id, by
    union-find with path compression — deliberately a DIFFERENT
    algorithm from the engine's label-propagation rounds
    (stages/canonicalize.py:connected_components), so agreement
    certifies both."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    nodes = set()
    for u, v in edges:
        nodes.add(u)
        nodes.add(v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    out = sorted((n, find(n)) for n in nodes)
    return pa.table({
        "node_id": pa.array([n for n, _ in out], pa.string()),
        "component_id": pa.array([c for _, c in out], pa.string()),
    })


def golden_semdedup(vec_ids, vecs, *, k=8, n_iter=3,
                    threshold=0.95) -> pa.Table:
    """Sequential same-spec SemDeDup: assignments from the fixed-point
    k-means golden above, then per cluster (ids ascending) unit-vector
    Gram matrix, pairs at round(cos, 6) >= round(threshold, 6),
    min-index union-find, representative = component root id."""
    a = golden_kmeans(vec_ids, vecs, k=k, n_iter=n_iter)
    ids = np.asarray(a["vec_id"])
    clusters = np.asarray(a["cluster"])
    by_id = {int(i): np.asarray(v, np.float64)
             for i, v in zip(vec_ids, vecs)}
    rows = []
    for cl in sorted(set(clusters.tolist())):
        members = np.sort(ids[clusters == cl])
        mat = np.vstack([by_id[int(i)] for i in members])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        unit = mat / norms[:, None]
        gram = np.round(unit @ unit.T, 6)
        parent = list(range(len(members)))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ti, tj = np.nonzero(gram >= round(threshold, 6))
        for x, y in zip(ti.tolist(), tj.tolist()):
            if x < y:
                rx, ry = find(x), find(y)
                if rx != ry:
                    parent[max(rx, ry)] = min(rx, ry)
        for pos, i in enumerate(members):
            rep = int(members[find(pos)])
            rows.append((int(i), int(cl), rep, rep == int(i)))
    rows.sort()
    return pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "cluster": pa.array([r[1] for r in rows], pa.int64()),
        "rep_id": pa.array([r[2] for r in rows], pa.int64()),
        "kept": pa.array([r[3] for r in rows], pa.bool_()),
    })


def golden_scalar_quantize(vec_ids, vecs, *, levels=256,
                           scale=1 << 20) -> pa.Table:
    """Sequential same-spec scalar quantization: per-dimension fx
    min/max over the corpus, integer code/dequant/error per vector —
    plain Python ints, one vector at a time."""
    fxs = [[math.floor(float(x) * scale) for x in v] for v in vecs]
    dim = len(fxs[0])
    mn = [min(v[j] for v in fxs) for j in range(dim)]
    mx = [max(v[j] for v in fxs) for j in range(dim)]
    span = [max(mx[j] - mn[j], 1) for j in range(dim)]
    order = sorted(range(len(vec_ids)), key=lambda i: int(vec_ids[i]))
    ids_o, codes_o, errs_o = [], [], []
    for i in order:
        v = fxs[i]
        code = [(v[j] - mn[j]) * (levels - 1) // span[j]
                for j in range(dim)]
        deq = [mn[j] + code[j] * span[j] // (levels - 1)
               for j in range(dim)]
        err = sum((v[j] - deq[j]) ** 2 for j in range(dim))
        ids_o.append(int(vec_ids[i]))
        codes_o.append(bytes(code).hex())
        errs_o.append(err)
    return pa.table({
        "vec_id": pa.array(ids_o, pa.int64()),
        "codes_hex": pa.array(codes_o, pa.string()),
        "err_fx": pa.array(errs_o, pa.int64()),
    })


def golden_bpe_merges(texts, *, n_merges=8) -> pa.Table:
    """Sequential same-spec BPE merge learning, implemented the
    classic incremental way (symbolized vocabulary updated in place
    after each merge) — a genuinely different algorithm from the
    engine's per-round reapply, same contract: character-pair counts
    weighted by word frequency, winner by (count desc, left asc,
    right asc)."""
    wre = re.compile(r"[^a-z0-9]+")
    vocab: dict[str, int] = {}
    for t in texts:
        for w in wre.split(t.lower()):
            if w:
                vocab[w] = vocab.get(w, 0) + 1
    syms = {w: list(w) for w in vocab}
    steps, lefts, rights, counts = [], [], [], []
    for step in range(n_merges):
        pc: dict[tuple, int] = {}
        for w, n in vocab.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), c = best
        for w in vocab:
            s = syms[w]
            if len(s) < 2:
                continue
            out = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
        steps.append(step)
        lefts.append(left)
        rights.append(right)
        counts.append(c)
    return pa.table({
        "step": pa.array(steps, pa.int64()),
        "lhs": pa.array(lefts, pa.string()),
        "rhs": pa.array(rights, pa.string()),
        "pair_count": pa.array(counts, pa.int64()),
    })


def golden_knn_ivfpq(vec_ids, vecs, *, query_ids=range(8), k=5,
                     coarse_k=8, nprobe=3, m=4, pq_k=16, n_iter=3,
                     train_prefix=2048, scale=1 << 20) -> pa.Table:
    """Sequential same-spec IVF-PQ: fixed-point Lloyd codebooks on the
    id-prefix sample (coarse quantizer + per-subspace PQ books),
    stable-sorted nprobe cells per query, ADC distances from integer
    lookup tables, top-k by (adc asc, neighbor asc)."""
    ids = np.asarray([int(i) for i in vec_ids], dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    fx = np.floor(
        np.vstack([np.asarray(v, np.float64) for v in vecs])[order]
        * scale
    ).astype(np.int64)

    def d2(a, c):
        return ((a * a).sum(axis=1)[:, None]
                + (c * c).sum(axis=1)[None, :] - 2 * (a @ c.T))

    def lloyd(mat, kk):
        cents = mat[:kk].copy()
        for _ in range(n_iter):
            a = d2(mat, cents).argmin(axis=1)
            for cl in range(kk):
                sel = mat[a == cl]
                if len(sel):
                    cents[cl] = sel.sum(axis=0) // len(sel)
        return cents

    train = fx[ids < train_prefix]
    coarse = lloyd(train, coarse_k)
    d_sub = fx.shape[1] // m
    books = [lloyd(train[:, j * d_sub:(j + 1) * d_sub], pq_k)
             for j in range(m)]

    cell = d2(fx, coarse).argmin(axis=1)
    codes = np.stack(
        [d2(fx[:, j * d_sub:(j + 1) * d_sub], books[j]).argmin(axis=1)
         for j in range(m)], axis=1)

    q_ids = np.asarray(
        sorted(set(int(q) for q in query_ids) & set(ids.tolist())),
        dtype=np.int64)
    pos = {int(i): r for r, i in enumerate(ids)}
    rows = []
    for q in q_ids:
        qfx = fx[pos[int(q)]]
        dq = d2(qfx[None, :], coarse)[0]
        probe = np.argsort(dq, kind="stable")[:nprobe]
        cands = []
        for r in range(len(ids)):
            if ids[r] == q or cell[r] not in probe:
                continue
            adc = 0
            for j in range(m):
                diff = (qfx[j * d_sub:(j + 1) * d_sub]
                        - books[j][codes[r, j]])
                adc += int((diff * diff).sum())
            cands.append((adc, int(ids[r])))
        cands.sort()
        for rank, (adc, nid) in enumerate(cands[:k], start=1):
            rows.append((int(q), rank, nid, adc))
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "rank": pa.array([r[1] for r in rows], pa.int64()),
        "neighbor_id": pa.array([r[2] for r in rows], pa.int64()),
        "adc_fx": pa.array([r[3] for r in rows], pa.int64()),
    })


def golden_bpe_encode(ids, texts, *, n_merges=8) -> pa.Table:
    """Sequential BPE apply: merges from :func:`golden_bpe_merges`'s
    spec, then per document the summed symbol count over its words
    (plain loops, per-word apply with no cache — the cache is the
    thing under test on the engine side)."""
    mt = golden_bpe_merges(texts, n_merges=n_merges)
    merges = list(zip(mt["lhs"].to_pylist(), mt["rhs"].to_pylist()))
    wre = re.compile(r"[^a-z0-9]+")

    def apply(word):
        s = list(word)
        for left, right in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return s

    rows = sorted(
        (int(i), sum(len(apply(w)) for w in wre.split(t.lower()) if w))
        for i, t in zip(ids, texts))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_bpe_tokens": pa.array([r[1] for r in rows], pa.int64()),
    })


def golden_image_features(ids, *, limit=128, dim=8) -> pa.Table:
    """Independent real-image-decode golden: pixel values come straight
    from the parameter formulas (w = 4 + id%13, h = 3 + id%11, byte =
    (3x + c + 31y + 7 id) mod 256) with NO decode step — if the
    engine's encode->inflate->unfilter round trip is lossless the
    bucket means agree bit-for-bit. The payload digest re-encodes the
    PNG from the spec text (scalar per-pixel filter loops; filter type
    = row % 5, zlib level 6)."""
    import hashlib as _hl
    import struct as _st
    import zlib as _zl

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa_ <= pb and pa_ <= pc:
            return a
        return b if pb <= pc else c

    sig = b"\x89PNG\r\n\x1a\n"
    rows = []
    for i in list(ids)[:limit]:
        i = int(i)
        w, h = 4 + i % 13, 3 + i % 11
        px = [[[(3 * x + c + 31 * y + 7 * i) % 256 for c in range(3)]
               for x in range(w)] for y in range(h)]
        stream = bytearray()
        for y in range(h):
            ft = y % 5
            stream.append(ft)
            for x in range(w):
                for c in range(3):
                    v = px[y][x][c]
                    a = px[y][x - 1][c] if x else 0
                    b = px[y - 1][x][c] if y else 0
                    cc = px[y - 1][x - 1][c] if x and y else 0
                    if ft == 0:
                        f = v
                    elif ft == 1:
                        f = v - a
                    elif ft == 2:
                        f = v - b
                    elif ft == 3:
                        f = v - (a + b) // 2
                    else:
                        f = v - paeth(a, b, cc)
                    stream.append(f % 256)
        ihdr = _st.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        idat = _zl.compress(bytes(stream), 6)
        parts = [sig]
        for tag, body in ((b"IHDR", ihdr), (b"IDAT", idat),
                          (b"IEND", b"")):
            parts.append(_st.pack(">I", len(body)))
            parts.append(tag)
            parts.append(body)
            parts.append(_st.pack(">I", _zl.crc32(tag + body)
                                  & 0xFFFFFFFF))
        payload = b"".join(parts)
        luma = np.array(
            [(299 * p[0] + 587 * p[1] + 114 * p[2]) // 1000
             for row in px for p in row], np.float64) / 255.0
        feats = [round(float(c.mean()), 4) if len(c) else 0.0
                 for c in np.array_split(luma, dim)]
        rows.append((i, "image", _hl.sha1(payload).hexdigest(), *feats))
    names = (["item_id", "kind", "digest"]
             + [f"feat_{j}" for j in range(dim)])
    types = [pa.int64(), pa.string(), pa.string()] + [pa.float64()] * dim
    return _pair_table(rows, names, types)


# spec constants shared with the engine BY VALUE (they are in the
# bitstream / ISO 10918-1 text, like the Huffman tables): pinned
# integer DCT basis round(C(u) cos((2x+1)u pi/16) * 2^18), Annex K.1
# quant tables, zig-zag order, Annex K.3 Huffman tables. All code
# below is an independent scalar reimplementation (quadruple-loop
# DCTs, bit-by-bit Huffman) of the baseline-JFIF contract.
_JB = (
    (185364, 185364, 185364, 185364, 185364, 185364, 185364, 185364),
    (257107, 217965, 145639, 51142, -51142, -145639, -217965, -257107),
    (242189, 100318, -100318, -242189, -242189, -100318, 100318, 242189),
    (217965, -51142, -257107, -145639, 145639, 257107, 51142, -217965),
    (185364, -185364, -185364, 185364, 185364, -185364, -185364, 185364),
    (145639, -257107, 51142, 217965, -217965, -51142, 257107, -145639),
    (100318, -242189, 242189, -100318, -100318, 242189, -242189, 100318),
    (51142, -145639, 217965, -257107, 257107, -217965, 145639, -51142),
)
_JQL = (
    (16, 11, 10, 16, 24, 40, 51, 61), (12, 12, 14, 19, 26, 58, 60, 55),
    (14, 13, 16, 24, 40, 57, 69, 56), (14, 17, 22, 29, 51, 87, 80, 62),
    (18, 22, 37, 56, 68, 109, 103, 77), (24, 35, 55, 64, 81, 104, 113, 92),
    (49, 64, 78, 87, 103, 121, 120, 101), (72, 92, 95, 98, 112, 100, 103, 99),
)
_JQC = (
    (17, 18, 24, 47, 99, 99, 99, 99), (18, 21, 26, 66, 99, 99, 99, 99),
    (24, 26, 56, 99, 99, 99, 99, 99), (47, 66, 99, 99, 99, 99, 99, 99),
    (99, 99, 99, 99, 99, 99, 99, 99), (99, 99, 99, 99, 99, 99, 99, 99),
    (99, 99, 99, 99, 99, 99, 99, 99), (99, 99, 99, 99, 99, 99, 99, 99),
)
_JZZ = (
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
)
_JH_DC_L = ((0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
            tuple(range(12)))
_JH_DC_C = ((0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
            tuple(range(12)))
_JH_AC_L = (
    (0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D),
    (0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA),
)
_JH_AC_C = (
    (0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    (0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA),
)


def _jpeg_scalar_encode(px, h, w, mode):
    """Independent scalar baseline-JFIF encoder (quadruple-loop FDCT,
    per-symbol bit writer). ``px[y][x]`` = (r, g, b)."""
    import struct as _st

    # color convert + pad to whole MCUs by edge replication
    mcu = 16 if mode == "420" else 8
    ph = ((h + mcu - 1) // mcu) * mcu
    pw = ((w + mcu - 1) // mcu) * mcu
    Y = [[0] * pw for _ in range(ph)]
    CB = [[0] * pw for _ in range(ph)]
    CR = [[0] * pw for _ in range(ph)]
    for yy in range(ph):
        sy = min(yy, h - 1)
        for xx in range(pw):
            sx = min(xx, w - 1)
            r, g, b = px[sy][sx]
            Y[yy][xx] = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
            CB[yy][xx] = (-11059 * r - 21709 * g + 32768 * b
                          + 8421376) >> 16
            CR[yy][xx] = (32768 * r - 27439 * g - 5329 * b
                          + 8421376) >> 16
    if mode == "420":
        cbs = [[(CB[2 * j][2 * i] + CB[2 * j][2 * i + 1]
                 + CB[2 * j + 1][2 * i] + CB[2 * j + 1][2 * i + 1] + 2)
                >> 2 for i in range(pw // 2)] for j in range(ph // 2)]
        crs = [[(CR[2 * j][2 * i] + CR[2 * j][2 * i + 1]
                 + CR[2 * j + 1][2 * i] + CR[2 * j + 1][2 * i + 1] + 2)
                >> 2 for i in range(pw // 2)] for j in range(ph // 2)]
    else:
        cbs, crs = CB, CR

    def codes(table):
        bits, vals = table
        out = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln]):
                out[vals[k]] = (code, ln)
                code += 1
                k += 1
            code <<= 1
        return out

    dc_l, ac_l = codes(_JH_DC_L), codes(_JH_AC_L)
    dc_c, ac_c = codes(_JH_DC_C), codes(_JH_AC_C)

    bitbuf = []

    def put(code, ln):
        for i in range(ln - 1, -1, -1):
            bitbuf.append((code >> i) & 1)

    def block_encode(plane, y0, x0, quant, dcc, acc, pred):
        fi = [[0] * 8 for _ in range(8)]
        for u in range(8):
            for v in range(8):
                s = 0
                for yy in range(8):
                    for xx in range(8):
                        s += (_JB[u][yy] * (plane[y0 + yy][x0 + xx] - 128)
                              * _JB[v][xx])
                fi[u][v] = s
        zz = []
        for (rr, cc) in _JZZ:
            den = quant[rr][cc] << 38
            val = fi[rr][cc]
            q = (abs(val) + (den >> 1)) // den
            zz.append(-q if val < 0 else q)
        diff = zz[0] - pred
        a = abs(diff)
        ssss = a.bit_length()
        c, ln = dcc[ssss]
        put(c, ln)
        if ssss:
            put(diff if diff > 0 else diff + (1 << ssss) - 1, ssss)
        run = 0
        for k in range(1, 64):
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = acc[0xF0]
                put(c, ln)
                run -= 16
            ssss = abs(v).bit_length()
            c, ln = acc[(run << 4) | ssss]
            put(c, ln)
            put(v if v > 0 else v + (1 << ssss) - 1, ssss)
            run = 0
        if run:
            c, ln = acc[0x00]
            put(c, ln)
        return zz[0]

    preds = [0, 0, 0]
    nl = 2 if mode == "420" else 1
    for my in range(ph // mcu):
        for mx in range(pw // mcu):
            for by in range(nl):
                for bx in range(nl):
                    preds[0] = block_encode(
                        Y, my * mcu + by * 8, mx * mcu + bx * 8,
                        _JQL, dc_l, ac_l, preds[0])
            if mode == "gray":
                continue
            preds[1] = block_encode(cbs, my * 8, mx * 8, _JQC,
                                    dc_c, ac_c, preds[1])
            preds[2] = block_encode(crs, my * 8, mx * 8, _JQC,
                                    dc_c, ac_c, preds[2])
    while len(bitbuf) % 8:
        bitbuf.append(1)
    scan = bytearray()
    for i in range(0, len(bitbuf), 8):
        byte = 0
        for b in bitbuf[i:i + 8]:
            byte = (byte << 1) | b
        scan.append(byte)
        if byte == 0xFF:
            scan.append(0x00)

    def seg(marker, body):
        return _st.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid, q):
        return seg(0xFFDB, bytes([tid])
                   + bytes(q[rr][cc] for (rr, cc) in _JZZ))

    def dht(cls, tid, table):
        bits, vals = table
        return seg(0xFFC4, bytes([(cls << 4) | tid])
                   + bytes(bits[1:17]) + bytes(vals))

    samp_y = 0x22 if mode == "420" else 0x11
    if mode == "gray":
        sof = seg(0xFFC0, _st.pack(">BHHB", 8, h, w, 1)
                  + bytes([1, 0x11, 0]))
        sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        tables = dqt(0, _JQL) + dht(0, 0, _JH_DC_L) + dht(1, 0, _JH_AC_L)
    else:
        sof = seg(0xFFC0, _st.pack(">BHHB", 8, h, w, 3)
                  + bytes([1, samp_y, 0]) + bytes([2, 0x11, 1])
                  + bytes([3, 0x11, 1]))
        sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
        tables = (dqt(0, _JQL) + dqt(1, _JQC)
                  + dht(0, 0, _JH_DC_L) + dht(1, 0, _JH_AC_L)
                  + dht(0, 1, _JH_DC_C) + dht(1, 1, _JH_AC_C))
    app0 = seg(0xFFE0, b"JFIF\x00" + bytes([1, 1, 0, 0, 1, 0, 1, 0, 0]))
    return (b"\xff\xd8" + app0 + tables + sof + sos + bytes(scan)
            + b"\xff\xd9")


def _jpeg_scalar_decode(payload):
    """Independent scalar baseline-JFIF decoder: bit-by-bit canonical
    Huffman keyed by (length, code) strings, direct quadruple-loop
    integer IDCT, nearest upsample, pinned scalar color convert.
    Returns (h, w, pixel rows of (r, g, b))."""
    import struct as _st

    pos = 2
    quant = {}
    huff = {}
    frame = None
    scan_comps = None
    scan = None
    while pos + 4 <= len(payload):
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        ln = _st.unpack(">H", payload[pos + 2:pos + 4])[0]
        body = payload[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            i = 0
            while i < len(body):
                tid = body[i] & 0xF
                q = [[0] * 8 for _ in range(8)]
                for k in range(64):
                    rr, cc = _JZZ[k]
                    q[rr][cc] = body[i + 1 + k]
                quant[tid] = q
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = [0] + list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                # (length, code) -> symbol via canonical enumeration
                table = {}
                code = 0
                k = 0
                for l in range(1, 17):
                    for _ in range(bits[l]):
                        table[(l, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(cls, tid)] = table
                i += 17 + n
        elif marker == 0xC0:
            _, fh, fw, nc = _st.unpack(">BHHB", body[:6])
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
            frame = (fh, fw, comps)
        elif marker == 0xDA:
            ns = body[0]
            scan_comps = [(body[1 + 2 * c], body[2 + 2 * c] >> 4,
                           body[2 + 2 * c] & 0xF) for c in range(ns)]
            end = pos
            while end + 1 < len(payload):
                if payload[end] == 0xFF and payload[end + 1] != 0x00:
                    break
                end += 1
            scan = payload[pos:end].replace(b"\xff\x00", b"\xff")
            break
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mbx = (fw + 8 * hmax - 1) // (8 * hmax)
    mby = (fh + 8 * vmax - 1) // (8 * vmax)

    bits = []
    for byte in scan:
        for i in range(7, -1, -1):
            bits.append((byte >> i) & 1)
    bp = [0]

    def read(n):
        v = 0
        for _ in range(n):
            v = (v << 1) | bits[bp[0]]
            bp[0] += 1
        return v

    def huff_decode(table):
        code = 0
        for l in range(1, 17):
            code = (code << 1) | bits[bp[0]]
            bp[0] += 1
            if (l, code) in table:
                return table[(l, code)]
        raise ValueError("bad code")

    def extend(v, ssss):
        if ssss == 0:
            return 0
        return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1

    by_id = {cs: (td, ta) for cs, td, ta in scan_comps}
    planes = []
    for cid, ch, cv, tq in comps:
        planes.append([[0] * (mbx * ch * 8) for _ in range(mby * cv * 8)])
    preds = [0] * len(comps)
    for m in range(mby * mbx):
        my, mx = m // mbx, m % mbx
        for ci, (cid, ch, cv, tq) in enumerate(comps):
            td, ta = by_id[cid]
            dc, ac = huff[(0, td)], huff[(1, ta)]
            q = quant[tq]
            for bi in range(ch * cv):
                by, bx = bi // ch, bi % ch
                d = [[0] * 8 for _ in range(8)]
                ssss = huff_decode(dc)
                preds[ci] += extend(read(ssss), ssss)
                d[0][0] = preds[ci] * q[0][0]
                k = 1
                while k < 64:
                    rs = huff_decode(ac)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break
                    k += r
                    rr, cc = _JZZ[k]
                    d[rr][cc] = extend(read(s), s) * q[rr][cc]
                    k += 1
                y0 = (my * cv + by) * 8
                x0 = (mx * ch + bx) * 8
                for yy in range(8):
                    for xx in range(8):
                        s = 0
                        for u in range(8):
                            for v in range(8):
                                s += _JB[u][yy] * d[u][v] * _JB[v][xx]
                        val = ((s + (1 << 37)) >> 38) + 128
                        planes[ci][y0 + yy][x0 + xx] = min(max(val, 0), 255)
    # scalar nearest upsample + pinned color convert
    out = []
    for yy in range(fh):
        row = []
        for xx in range(fw):
            if len(comps) == 1:
                g = planes[0][yy][xx]
                row.append((g, g, g))
                continue
            yv = planes[0][yy][xx]
            _, ch1, cv1, _ = comps[1]
            cb = planes[1][yy * cv1 // vmax][xx * ch1 // hmax]
            cr = planes[2][yy * cv1 // vmax][xx * ch1 // hmax]
            r = yv + ((91881 * (cr - 128) + 32768) >> 16)
            g = yv - ((22554 * (cb - 128) + 46802 * (cr - 128)
                       + 32768) >> 16)
            b = yv + ((116130 * (cb - 128) + 32768) >> 16)
            row.append((min(max(r, 0), 255), min(max(g, 0), 255),
                        min(max(b, 0), 255)))
        out.append(row)
    return fh, fw, out


def golden_jpeg_features(ids, *, limit=128, dim=8) -> pa.Table:
    """Independent real-JPEG-decode golden: re-encodes each synthetic
    payload from the fixture formulas (w = 9 + id%14, h = 7 + id%12,
    byte = (5x + 3c + 17y + 11 id) mod 256, mode cycling 4:2:0 / 4:4:4
    / grayscale) with the scalar spec encoder above — digest equality
    proves the engine's vectorized encoder implements the same pinned
    all-integer contract — then scalar-decodes those bytes bit by bit
    and emits the pinned integer-luma bucket means. Everything here is
    quadruple loops and Python ints; the engine side is batched int64
    matmuls (stages/jpegcodec.py). Integer associativity makes the two
    bit-identical when both are right."""
    import hashlib as _hl

    rows = []
    for i in list(ids)[:limit]:
        i = int(i)
        w, h = 9 + i % 14, 7 + i % 12
        px = [[tuple((5 * x + 3 * c + 17 * y + 11 * i) % 256
                     for c in range(3)) for x in range(w)]
              for y in range(h)]
        mode = ("420", "444", "gray")[i % 3]
        payload = _jpeg_scalar_encode(px, h, w, mode)
        dh, dw, dec = _jpeg_scalar_decode(payload)
        luma = np.array(
            [(299 * p[0] + 587 * p[1] + 114 * p[2]) // 1000
             for row in dec for p in row], np.float64) / 255.0
        feats = [round(float(c.mean()), 4) if len(c) else 0.0
                 for c in np.array_split(luma, dim)]
        rows.append((i, "image", _hl.sha1(payload).hexdigest(), *feats))
    names = (["item_id", "kind", "digest"]
             + [f"feat_{j}" for j in range(dim)])
    types = [pa.int64(), pa.string(), pa.string()] + [pa.float64()] * dim
    return _pair_table(rows, names, types)


def _avi_scalar_assemble(payloads, w, h, nf, fps=10):
    """Independent scalar RIFF/AVI assembler mirroring the documented
    container layout (avih + strl('vids'/'MJPG') + movi '00dc' chunks
    + idx1) byte for byte."""
    import struct as _st

    def chunk(tag, body):
        pad = b"\x00" if len(body) % 2 else b""
        return tag + _st.pack("<I", len(body)) + body + pad

    def lst(kind, body):
        return chunk(b"LIST", kind + body)

    buf = max(len(p) for p in payloads)
    avih = _st.pack("<14I", 1_000_000 // fps, buf * fps, 0, 0x10,
                    nf, 0, 1, buf, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + _st.pack("<IHHIIIIIIi", 0, 0, 0, 0, 1, fps, 0, nf, buf, -1)
            + _st.pack("<I", 0) + _st.pack("<4H", 0, 0, w, h))
    strf = _st.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                    w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    idx = bytearray()
    off = 4
    for p in payloads:
        idx += b"00dc" + _st.pack("<III", 0x10, off, len(p))
        off += 8 + len(p) + (len(p) % 2)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + _st.pack("<I", len(body)) + body


def golden_mjpeg_frames(ids, *, limit=128) -> pa.Table:
    """Independent real-MJPEG-AVI-decode golden: re-encodes each
    synthetic video from the fixture formulas (n_frames = 2 + id%3,
    w = 9 + id%10, h = 7 + id%9, byte = (5x + 3c + 17y + 23f + 11 id)
    mod 256, subsampling alternating 4:2:0 / 4:4:4) with the scalar
    JPEG encoder + scalar AVI assembler above — digest equality
    certifies both engine encoders — then walks the RIFF chunks with
    its own scalar parser, bit-decodes every '00dc' JPEG and emits the
    pinned per-frame integer mean luma."""
    import hashlib as _hl
    import struct as _st

    rows = []
    for i in list(ids)[:limit]:
        i = int(i)
        w, h, nf = 9 + i % 10, 7 + i % 9, 2 + i % 3
        mode = ("420", "444")[i % 2]
        payloads = []
        for f in range(nf):
            px = [[tuple((5 * x + 3 * c + 17 * y + 23 * f + 11 * i) % 256
                         for c in range(3)) for x in range(w)]
                  for y in range(h)]
            payloads.append(_jpeg_scalar_encode(px, h, w, mode))
        avi = _avi_scalar_assemble(payloads, w, h, nf)
        dg = _hl.sha1(avi).hexdigest()
        # independent scalar RIFF walk: collect '00dc' chunk bodies
        jpegs = []
        stack = [(12, 8 + _st.unpack("<I", avi[4:8])[0])]
        while stack:
            lo, hi = stack.pop()
            p = lo
            while p + 8 <= hi:
                tag = avi[p:p + 4]
                ln = _st.unpack("<I", avi[p + 4:p + 8])[0]
                if tag == b"LIST":
                    stack.append((p + 12, p + 8 + ln))
                elif tag == b"00dc" and ln:
                    jpegs.append(avi[p + 8:p + 8 + ln])
                p += 8 + ln + (ln % 2)
        for f, jb in enumerate(jpegs):
            dh, dw, dec = _jpeg_scalar_decode(jb)
            total = 0
            for row in dec:
                for (r, g, b) in row:
                    total += (299 * r + 587 * g + 114 * b) // 1000
            rows.append((i, f, dw, dh, 1000 * total // (dw * dh), dg))
    names = ["item_id", "frame_idx", "width", "height",
             "mean_luma_milli", "digest"]
    types = [pa.int64()] * 5 + [pa.string()]
    return _pair_table(rows, names, types)


def golden_hybrid_rrf(ids, texts, vec_ids, vecs, *,
                      query_terms=("hash", "sort", "window"),
                      query_vec_id=7, k=20, k_cand=50,
                      rrf_k=60) -> pa.Table:
    """Independent Reciprocal-Rank-Fusion golden: scalar BM25
    (Lucene +1 idf, the engine's pinned operand order re-derived with
    Python floats and ``math``), naive full-matrix cosine kNN (6-dp
    round, ties by neighbor id), then exact integer fusion
    ``1_000_000 // (rrf_k + rank)`` per leg. No engine imports."""
    import math as _m
    import re as _re

    k1, b = 1.2, 0.75
    terms = sorted(set(query_terms))
    run = _re.compile(r"[a-z0-9]+")
    docs = [(int(i), t or "") for i, t in zip(ids, texts)]
    n_docs = len(docs)
    toks = {i: run.findall(t.lower()) for i, t in docs}
    sum_dl = sum(len(v) for v in toks.values())
    avgdl = float(sum_dl) / float(n_docs)
    df = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}
    idf = {t: _m.log((n_docs - d + 0.5) / (d + 0.5) + 1.0)
           for t, d in df.items() if d}
    scores = {}
    for i, tk in toks.items():
        fx = 0
        hit = False
        for t in terms:
            tf = float(tk.count(t))
            if tf == 0.0 or t not in idf:
                continue
            hit = True
            dl = float(len(tk))
            w = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b
                                                + b * (dl / avgdl)))
            fx += _m.floor(idf[t] * w * 1e6 + 0.5)
        if hit:
            scores[i] = fx
    lex = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k_cand]
    lex_rank = {i: r + 1 for r, (i, _) in enumerate(lex)}

    vid = np.asarray([int(i) for i in vec_ids], np.int64)
    mat = np.asarray([np.asarray(v, np.float64) for v in vecs])
    nm = np.linalg.norm(mat, axis=1, keepdims=True)
    nm[nm == 0] = 1.0
    matn = mat / nm
    q = matn[vid.tolist().index(int(query_vec_id))]
    sims = np.round(matn @ q, 6)
    order = sorted(
        (int(i) for i in vid if int(i) != int(query_vec_id)),
        key=lambda i: (-sims[vid.tolist().index(i)], i))
    dense_rank = {i: r + 1 for r, i in enumerate(order[:k_cand])}

    fused = []
    for did in sorted(set(lex_rank) | set(dense_rank)):
        lr = lex_rank.get(did, 0)
        dr = dense_rank.get(did, 0)
        fx = (1_000_000 // (rrf_k + lr) if lr else 0) \
            + (1_000_000 // (rrf_k + dr) if dr else 0)
        fused.append((did, fx, lr, dr))
    fused.sort(key=lambda t: (-t[1], t[0]))
    return _pair_table(fused[:k],
                       ["doc_id", "rrf_fx", "lex_rank", "dense_rank"],
                       [pa.int64()] * 4)


def golden_gif_frames(ids, *, limit=128) -> pa.Table:
    """Independent real-GIF-decode golden: per-frame integer luma
    stats computed straight from the fixture formulas (n_frames =
    2 + id%4, w = 6 + id%9, h = 5 + id%7, index = (5x + 11y + 29f +
    7 id) mod 256, palette[i] = (i, 3i, 7i) mod 256) with NO GIF
    bytes anywhere — agreement with the engine's
    encode -> LZW-decode -> palette path proves that round trip
    lossless. Pure scalar loops, no engine imports."""
    rows = []
    for i in list(ids)[:limit]:
        i = int(i)
        nf, w, h = 2 + i % 4, 6 + i % 9, 5 + i % 7
        for f in range(nf):
            total = 0
            for y in range(h):
                for x in range(w):
                    idx = (5 * x + 11 * y + 29 * f + 7 * i) % 256
                    r, g, b = idx, (3 * idx) % 256, (7 * idx) % 256
                    total += (299 * r + 587 * g + 114 * b) // 1000
            rows.append((i, f, w, h, 1000 * total // (w * h)))
    names = ["item_id", "frame_idx", "width", "height",
             "mean_luma_milli"]
    types = [pa.int64()] * 5
    return _pair_table(rows, names, types)


def golden_dbscan(vec_ids, vecs, *, threshold=0.35,
                  min_pts=4) -> pa.Table:
    """Independent naive cosine-DBSCAN golden (scalar/numpy, no engine
    imports): full similarity matrix, core = |{cos >= threshold}| + 1
    >= min_pts (self included), clusters = union-find over core-core
    edges labeled by the smallest core vec_id, border = smallest
    component among core neighbors, noise = -1. Same pinned
    determinism rules the engine documents."""
    ids = np.asarray(list(vec_ids), np.int64)
    mat = np.asarray([np.asarray(v, np.float64) for v in vecs])
    nm = np.linalg.norm(mat, axis=1, keepdims=True)
    nm[nm == 0] = 1.0
    sims = np.round((mat / nm) @ (mat / nm).T, 6)
    np.fill_diagonal(sims, -1.0)
    adj = sims >= threshold
    core = adj.sum(1) + 1 >= min_pts
    n = len(ids)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        if not core[i]:
            continue
        for j in range(i + 1, n):
            if core[j] and adj[i, j]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    # keep the root with the smaller vec_id
                    if ids[ri] <= ids[rj]:
                        parent[rj] = ri
                    else:
                        parent[ri] = rj
    cluster = np.full(n, -1, np.int64)
    roles = []
    for i in range(n):
        if core[i]:
            cluster[i] = ids[find(i)]
            roles.append("core")
        else:
            comps = [ids[find(j)] for j in range(n)
                     if core[j] and adj[i, j]]
            if comps:
                cluster[i] = min(comps)
                roles.append("border")
            else:
                roles.append("noise")
    order = np.argsort(ids, kind="mergesort")
    return pa.table({
        "vec_id": pa.array(ids[order], pa.int64()),
        "role": pa.array([roles[i] for i in order], pa.string()),
        "cluster": pa.array(cluster[order], pa.int64()),
    })
