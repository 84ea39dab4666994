"""Mergeable frequency / cardinality sketches.

  - :func:`hll_ndistinct` — HyperLogLog approximate COUNT(DISTINCT v)
    per group. Each batch emits one fixed-size register array per
    group (m = 2^p bytes, p = 12 -> 4 KiB, ~1.6 % relative error);
    the shuffle moves register partials, never values, and the merge
    is an elementwise ``max`` — associative + commutative, so the
    estimate is bit-identical regardless of batch boundaries or task
    scheduling. This is the scale path for distinct-counting a column
    whose exact ``groupby().nunique()`` would shuffle every value:
    at 100 TB the partial traffic is O(groups x batches x 4 KiB).
  - :func:`heavy_hitters` — ALL terms with global frequency
    > total/k, with EXACT counts. Candidate generation is per-batch
    exact counting with the Misra-Gries guarantee by pigeonhole: a
    term with global count * k > total must, in at least one batch,
    have batch count * k > batch total (else summing the per-batch
    inequalities contradicts the premise) — so the union of per-batch
    survivors is a superset of the true heavy hitters, found without
    any shuffle of the token stream. A second exact counting pass
    restricted to the (broadcast) candidate set yields exact counts,
    so the output is deterministic and certified by a plain SQL
    ``HAVING count(*) * k > total`` oracle.

No kgdata analog (the reference has no sketch surface) — part of the
training-data-pipeline extension alongside dedup/similarity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

# --------------------------------------------------------------------------
# 64-bit hashing (deterministic; shared spec with oracle_sketch goldens)

_SM64_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SM64_C2 = np.uint64(0x94D049BB133111EB)
_SM64_INC = np.uint64(0x9E3779B97F4A7C15)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants)."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + _SM64_INC
        z = (z ^ (z >> np.uint64(30))) * _SM64_C1
        z = (z ^ (z >> np.uint64(27))) * _SM64_C2
        return z ^ (z >> np.uint64(31))


def hash64_ints(v: np.ndarray) -> np.ndarray:
    """uint64 hash of an integer column (splitmix64 of the value)."""
    return splitmix64(v.astype(np.int64).view(np.uint64))


def _hash64_segments(b: np.ndarray, starts: np.ndarray,
                     lens: np.ndarray) -> np.ndarray:
    """Position-weighted polynomial hash of each byte segment of ``b``
    (multiplier 1099511628211 mod 2^64), splitmix64-finalized — the
    shared core of :func:`hash64_strs` and :func:`hash64_strs_arrow`,
    so both paths are bit-identical by construction."""
    n = len(lens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    total = int(lens.sum())
    if total == 0:
        return splitmix64(np.zeros(n, dtype=np.uint64))
    b = b.astype(np.uint64)
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    exp = np.repeat(lens, lens) - 1 - pos
    mul = np.uint64(1099511628211)
    pows = np.empty(int(lens.max()), dtype=np.uint64)
    pows[0] = np.uint64(1)
    with np.errstate(over="ignore"):
        for i in range(1, len(pows)):
            pows[i] = pows[i - 1] * mul
        weighted = b * pows[exp]
    # reduceat over empty segments would mis-read; empties hash to 0
    out = np.zeros(n, dtype=np.uint64)
    nonempty = lens > 0
    if nonempty.any():
        seg_starts = starts[nonempty]
        with np.errstate(over="ignore"):
            sums = np.add.reduceat(weighted, seg_starts)
        out[nonempty] = sums
    return splitmix64(out)


def hash64_strs(values) -> np.ndarray:
    """uint64 hash of a string sequence: position-weighted polynomial
    over utf-8 bytes (multiplier 1099511628211 mod 2^64, the same
    shape as the dedup token hashes), splitmix64-finalized. Vectorized
    over the concatenated byte stream with ``np.add.reduceat``."""
    enc = [s.encode("utf-8") for s in values]
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
    if not len(enc):
        return np.empty(0, dtype=np.uint64)
    if int(lens.sum()) == 0:
        return splitmix64(np.zeros(len(enc), dtype=np.uint64))
    b = np.frombuffer(b"".join(enc), dtype=np.uint8)
    starts = np.zeros(len(enc), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    return _hash64_segments(b, starts, lens)


def hash64_strs_arrow(arr) -> np.ndarray:
    """uint64 hashes of a pyarrow string array — identical output to
    :func:`hash64_strs` (same segment core), but computed straight
    from the Arrow offsets + utf-8 data buffers: no per-string Python
    object is ever created. ``arr`` must have no nulls (drop or filter
    them first — tokenizers already do)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if arr.null_count:
        raise ValueError("hash64_strs_arrow: nulls not allowed")
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=odt,
                        count=n + 1 + arr.offset)[arr.offset:]
    off = off.astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)[off[0]:off[-1]]
    return _hash64_segments(data, off[:-1] - off[0], np.diff(off))


def hash64_column(col: pd.Series) -> np.ndarray:
    if pd.api.types.is_integer_dtype(col):
        return hash64_ints(col.to_numpy())
    return hash64_strs(col.astype(str).tolist())


# --------------------------------------------------------------------------
# HyperLogLog

HLL_P = 12
HLL_M = 1 << HLL_P


def hll_registers(h: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """Register array (uint8, length 2^p) for a batch of uint64
    hashes: index = top p bits, rho = leading-zero count of the
    (64-p)-bit suffix + 1."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if not len(h):
        return regs
    q = 64 - p
    idx = (h >> np.uint64(q)).astype(np.int64)
    w = h & np.uint64((1 << q) - 1)
    # suffix < 2^52 for p = 12, exactly representable in float64, and
    # log2 of it floors exactly at powers of two
    rho = np.where(
        w == 0, q + 1, q - np.floor(np.log2(w.astype(np.float64)))
    ).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range linear-counting
    correction (Flajolet et al. 2007). Computed with the exact same
    numpy expression in the golden oracle so register equality implies
    bit-identical estimates."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    zeros = int((regs == 0).sum())
    if zeros and est <= 2.5 * m:
        est = m * float(np.log(m / zeros))
    return est


def hll_ndistinct(
    ds: Dataset, group_col: str, value_col: str, *, p: int = HLL_P,
) -> Dataset:
    """Approximate per-group distinct count:
    (group, n_distinct_hll:int64). Deterministic: the merged register
    array is independent of batching/order, so the rounded estimate
    is reproducible and golden-oracle-checkable."""
    from .agg import grouped_blockwise

    m = 1 << p

    def partial(b: pd.DataFrame) -> pa.Table:
        groups = []
        regs = []
        for g, idx in b.groupby(group_col, sort=False).indices.items():
            h = hash64_column(b[value_col].iloc[idx])
            groups.append(g)
            regs.append(hll_registers(h, p).tobytes())
        return pa.table(
            {
                group_col: pa.array(groups),
                "regs": pa.array(regs, pa.binary()),
            }
        )

    parts = ds.select_columns([group_col, value_col]).map_batches(
        partial, batch_format="pandas"
    )

    def merge(b: pd.DataFrame) -> pa.Table:
        groups = []
        ests = []
        for g, idx in b.groupby(group_col, sort=False).indices.items():
            stacked = np.stack(
                [np.frombuffer(r, dtype=np.uint8) for r in b["regs"].iloc[idx]]
            )
            merged = stacked.max(axis=0)
            groups.append(g)
            ests.append(int(round(hll_estimate(merged))))
        return pa.table(
            {
                group_col: pa.array(groups),
                "n_distinct_hll": pa.array(ests, pa.int64()),
            }
        )

    return grouped_blockwise(parts, [group_col], merge)


# --------------------------------------------------------------------------
# Heavy hitters

_TOTAL_SENTINEL = "__total__"  # tokens are [a-z0-9]+ only; cannot collide


def heavy_hitters(
    ds: Dataset, *, text_col: str = "text", k: int = 200,
    candidate_cap: int = 200_000,
) -> Dataset:
    """Every term with frequency strictly > total_tokens/k, with exact
    counts: (term, n) sorted by (n desc, term asc). Two streaming
    passes, no token-stream shuffle (see module docstring for the
    pigeonhole guarantee). ``candidate_cap`` bounds the broadcast
    candidate set — exceeding it raises rather than silently
    degrading (at that point k is too large for a broadcast plan and
    the full word_counts shuffle is the honest fallback)."""
    from ..stages.textstats import tokens_arrow
    from .agg import grouped_blockwise

    def survivors(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = tokens_arrow(t[text_col])
        vc = pc.value_counts(toks)
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        keep = counts * k > len(toks)
        return pa.table({"term": vc.field("values").filter(
            pa.array(keep)).cast(pa.string())})

    cand_ds = ds.select_columns([text_col]).map_batches(
        survivors, batch_format="pyarrow"
    )
    # candidates are bounded (< k per batch, stopword-dominated so
    # mostly repeated) — stream-collect the distinct set with a cap,
    # the same bounded driver-collect pattern as joins.hot_keys
    cands: set[str] = set()
    for bt in cand_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        cands.update(bt["term"].to_pylist())
        if len(cands) > candidate_cap:
            raise ValueError(
                f"heavy-hitter candidates exceed the broadcast cap "
                f"{candidate_cap}; lower k or use word_counts"
            )
    cand_ref = ray.put(frozenset(cands))

    class _ExactCount:
        def __init__(self):
            import pyarrow.compute as pc

            # candidate set as an Arrow array once per actor, so the
            # per-batch membership test is one is_in kernel call
            self.cand_arr = pa.array(sorted(ray.get(cand_ref)),
                                     pa.string())
            self.pc = pc

        def __call__(self, t: pa.Table) -> pa.Table:
            pc = self.pc
            toks = tokens_arrow(t[text_col])
            hits = toks.filter(pc.is_in(toks, value_set=self.cand_arr))
            vc = pc.value_counts(hits)
            terms = pa.concat_arrays([
                vc.field("values").cast(pa.string()),
                pa.array([_TOTAL_SENTINEL], pa.string())])
            ns = pa.concat_arrays([
                vc.field("counts").cast(pa.int64()),
                pa.array([len(toks)], pa.int64())])
            return pa.table({"term": terms, "n": ns})

    counts = ds.select_columns([text_col]).map_batches(
        _ExactCount, batch_format="pyarrow", concurrency=(1, 8), num_cpus=0.5,
    )

    def final(b: pd.DataFrame) -> pa.Table:
        out = b.groupby("term", sort=False)["n"].sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    summed = grouped_blockwise(counts, ["term"], final)

    # vocabulary-of-candidates sized — one block suffices
    def cut(b: pd.DataFrame) -> pa.Table:
        total = int(b.loc[b["term"] == _TOTAL_SENTINEL, "n"].sum())
        out = b[(b["term"] != _TOTAL_SENTINEL) & (b["n"] * k > total)]
        out = out.sort_values(["n", "term"], ascending=[False, True],
                              kind="mergesort")
        out["n"] = out["n"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return summed.repartition(1).map_batches(cut, batch_format="pandas")


# --------------------------------------------------------------------------
# Count-Min Sketch

CMS_D = 4       # hash rows
CMS_W = 4096    # counters per row


def cms_slots(h: np.ndarray, d: int = CMS_D, w: int = CMS_W) -> np.ndarray:
    """(d, n) counter indices for pre-hashed items: row j rehashes the
    64-bit item hash with a per-row splitmix64 salt, mod w."""
    out = np.empty((d, len(h)), dtype=np.int64)
    with np.errstate(over="ignore"):
        for j in range(d):
            out[j] = (splitmix64(h + np.uint64(j + 1) * _SM64_INC)
                      % np.uint64(w)).astype(np.int64)
    return out


def cms_token_counts(
    ds: Dataset, *, text_col: str = "text", d: int = CMS_D, w: int = CMS_W,
    salt_buckets: int = 64,
) -> Dataset:
    """Count-Min-Sketch estimated frequency per distinct corpus token:
    (term, est_count) with est_count >= true count always (one-sided
    error <= 2N/w per row, min over d rows).

    Deterministic by construction: each batch contributes an additive
    d x w int64 partial; integer addition is associative + commutative,
    so the merged sketch — and every estimate — is independent of
    batching and task order (golden-oracle-checkable, the HLL
    argument). Merge is two-level so no single task ever sums more
    than ``salt_buckets`` + #blocks/``salt_buckets`` partials of
    d*w*8 bytes each; the token stream itself is never shuffled. The
    distinct-term table (the query set) is exact via per-batch unique
    + a term shuffle of unique terms only.
    """
    from ..stages.textstats import tokens_arrow
    from .agg import grouped_blockwise

    nbytes = d * w * 8

    def partial(t: pa.Table) -> pa.Table:
        toks = tokens_arrow(t[text_col])
        sk = np.zeros((d, w), dtype=np.int64)
        if len(toks):
            slots = cms_slots(hash64_strs_arrow(toks), d, w)
            for j in range(d):
                sk[j] += np.bincount(slots[j], minlength=w)
        blob = sk.tobytes()
        salt = int(splitmix64(np.array([len(blob) + int(sk.sum())],
                                       dtype=np.uint64))[0]
                   % salt_buckets)
        return pa.table({"salt": pa.array([salt], pa.int64()),
                         "sketch": pa.array([blob], pa.binary())})

    parts = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow"
    )

    def merge(key_out):
        def fn(b: pd.DataFrame) -> pa.Table:
            stacked = np.stack(
                [np.frombuffer(r, dtype=np.int64) for r in b["sketch"]]
            )
            blob = stacked.sum(axis=0, dtype=np.int64).tobytes()
            return pa.table({key_out: pa.array([0], pa.int64()),
                             "sketch": pa.array([blob], pa.binary())})
        return fn

    level1 = grouped_blockwise(parts, ["salt"], merge("k"))
    final = grouped_blockwise(level1, ["k"], merge("k"))

    row = final.take(1)  # one d*w*8-byte row — the whole sketch
    sketch = np.frombuffer(row[0]["sketch"], dtype=np.int64).reshape(d, w)
    sk_ref = ray.put(sketch)

    def uniq(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"term": pc.unique(tokens_arrow(t[text_col]))})

    terms = ds.select_columns([text_col]).map_batches(
        uniq, batch_format="pyarrow"
    )

    def distinct_and_answer(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = pc.unique(t["term"].combine_chunks())
        u = u.take(pc.array_sort_indices(u))
        sk = ray.get(sk_ref)
        assert sk.nbytes == nbytes
        slots = cms_slots(hash64_strs_arrow(u), d, w)
        est = sk[np.arange(d)[:, None], slots].min(axis=0)
        return pa.table({"term": u.cast(pa.string()),
                         "est_count": pa.array(est, pa.int64())})

    return grouped_blockwise(terms, ["term"], distinct_and_answer,
                             batch_format="pyarrow")
