"""Broadcast Bloom-filter join pruning.

The canonical shuffle-reduction pattern for joins where the probe side
is much larger than the build side (reference analog: the prefiltering
the reference does before its joins, e.g. the page-dump prefilter in
``kgdata/wikipedia/datasets/html_articles.py`` and the key-set semi
joins of ``kgdata/wikidata/datasets/classes.py:50-53`` — here
generalized so the "key set" costs O(n) *bits*, not O(n) strings).

At 100 TB the exact build-key set may not fit a worker, but a Bloom
filter of it does: 10 bits/key ≈ 1.2 GB for a billion keys, shipped
ONCE per node via ``ray.put``. Probe rows whose key fails the filter
are dropped before the all-to-all join shuffle; false positives
(~0.8% at 10 bits / 4 hashes) survive the filter but are removed by
the exact join that follows, so the operator's results are exactly the
plain join's — which is what makes it oracle-certifiable.

Partial filters are built per block inside ``map_batches`` and OR-ed
on the driver (each partial is m/8 bytes, not a key list), so the
build never collects keys.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from .joins import resolve_join_partitions

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set) —
    a full-avalanche uint64 hash, wrap-around arithmetic is the point."""
    x = x.astype(np.uint64, copy=True)
    x += _GOLDEN
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _key_hash64(arr) -> np.ndarray:
    """uint64 hash of a key column: splitmix64 for numeric keys,
    pandas' deterministic (unseeded-process-stable) siphash for
    strings. Cross-engine stability is NOT required — the filter is
    internal pruning; exactness comes from the join that follows."""
    s = pd.Series(arr) if not isinstance(arr, pd.Series) else arr
    if pd.api.types.is_numeric_dtype(s):
        return _splitmix64(s.to_numpy().astype(np.int64).view(np.uint64))
    return _splitmix64(pd.util.hash_array(s.astype(str).to_numpy()))


def _positions(h: np.ndarray, num_hashes: int, m_bits: int):
    """Double hashing: pos_i = (h1 + i*h2) mod m, h2 forced odd."""
    h2 = _splitmix64(h ^ _GOLDEN) | np.uint64(1)
    m = np.uint64(m_bits)
    for i in range(num_hashes):
        yield (h + np.uint64(i) * h2) % m


def build_bloom(
    ds: Dataset, key_col: str, *,
    bits_per_key: int = 10, num_hashes: int = 4,
    expected_keys: Optional[int] = None,
) -> tuple[bytes, int]:
    """Bloom filter of ``ds[key_col]`` as ``(packed_bits, num_hashes)``.

    One pass: each block emits a partial m-bit bitmap (a single binary
    row); the driver ORs the per-block partials. Driver traffic is
    ``num_blocks × m/8`` bytes — independent of key count per block.
    ``expected_keys`` sizes the filter without an extra count pass;
    when omitted, ``ds.count()`` runs first (cheap metadata for reads,
    one execution for derived pipelines — pass the estimate at scale).
    """
    n = expected_keys if expected_keys is not None else max(ds.count(), 1)
    m_bits = 1 << int(np.ceil(np.log2(max(n * bits_per_key, 64))))
    words = m_bits // 64

    def partial(b: pa.Table) -> pa.Table:
        bits = np.zeros(words, dtype=np.uint64)
        h = _key_hash64(b[key_col].to_pandas())
        for pos in _positions(h, num_hashes, m_bits):
            np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    merged = np.zeros(words, dtype=np.uint64)
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
    for row in parts.iter_rows():
        merged |= np.frombuffer(row["bits"], dtype=np.uint64)
    return merged.tobytes(), num_hashes


def bloom_contains(bloom_bits: np.ndarray, num_hashes: int,
                   keys) -> np.ndarray:
    """Vectorized membership test; ``bloom_bits`` is the uint64 view of
    the packed filter (power-of-two length)."""
    m_bits = bloom_bits.size * 64
    h = _key_hash64(keys)
    member = np.ones(h.size, dtype=bool)
    for pos in _positions(h, num_hashes, m_bits):
        word = bloom_bits[(pos >> np.uint64(6)).astype(np.int64)]
        member &= ((word >> (pos & np.uint64(63))) & np.uint64(1)
                   ).astype(bool)
    return member


def bloom_join(
    left: Dataset, right: Dataset, on: str, *,
    right_on: Optional[str] = None,
    bits_per_key: int = 10, num_hashes: int = 4,
    expected_build_keys: Optional[int] = None,
    num_partitions: Optional[int] = None,
) -> Dataset:
    """Inner equi-join with Bloom-pruned probe side: build a filter of
    ``right``'s keys, drop ``left`` rows that cannot match BEFORE the
    join shuffle, then exact hash join. Results are exactly
    ``equi_join(left, right)`` — false positives die in the join."""
    num_partitions = resolve_join_partitions(num_partitions)
    import ray

    from .joins import equi_join

    # The build side is consumed three times (count, bloom pass, join
    # build); it is the small side by contract, so materialize once.
    right = right.materialize()
    bits, k = build_bloom(right, right_on or on,
                          bits_per_key=bits_per_key,
                          num_hashes=num_hashes,
                          expected_keys=expected_build_keys)
    ref = ray.put(bits)

    def prune(b: pa.Table) -> pa.Table:
        from .broadcast import get_broadcast
        arr = np.frombuffer(get_broadcast(ref), dtype=np.uint64)
        keep = bloom_contains(arr, k, b[on].to_pandas())
        return b.filter(pa.array(keep))

    # Pruning (and an upstream build-side filter) can leave schema-less
    # empty blocks that Arrow's hash join rejects; rebuild blocks first.
    from .blocks import scrub_empty_blocks

    pruned = scrub_empty_blocks(
        left.map_batches(prune, batch_format="pyarrow"))
    return equi_join(pruned, scrub_empty_blocks(right), on,
                     right_on=right_on, num_partitions=num_partitions)
