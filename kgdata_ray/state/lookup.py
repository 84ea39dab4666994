"""Sharded key-value lookup service on Ray actors.

Reference analog: the RocksDB serving layer — per-node DBs opened per
process (``kgdata/db.py:219-277``) and the Rust remote KV server
(``rust/src/db/remotedb/mod.rs``) — replaced by plain Ray actors each
holding one hash shard of the dictionary. For state too large for a
single ``ray.put`` broadcast, a ``map_batches`` stage routes each
batch's keys to the owning shards and merges the replies.

For fully-batch pipelines prefer the dataset-dataset join
(``stages.linking.link_via_join``); this service is for the
lookup-heavy / interactive paths the reference serves from RocksDB.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
import pandas as pd
import ray


def _shard_of(keys: Sequence[str], n: int) -> np.ndarray:
    # stable string hash (no PYTHONHASHSEED): FNV-1a over utf-8
    out = np.empty(len(keys), dtype=np.int64)
    for i, k in enumerate(keys):
        h = 2166136261
        for c in str(k).encode("utf-8"):
            h = ((h ^ c) * 16777619) & 0xFFFFFFFF
        out[i] = h % n
    return out


@ray.remote(num_cpus=0.1)
class _DictShard:
    def __init__(self, items: dict):
        self.d = dict(items)

    def get_many(self, keys: list) -> list:
        return [self.d.get(k) for k in keys]

    def put_many(self, items: dict) -> None:
        self.d.update(items)

    def size(self) -> int:
        return len(self.d)


class ShardedDict:
    """Hash-sharded dict across ``num_shards`` actors.

    Build once on the driver (``ShardedDict.from_dict``); the handle is
    small and serializable into any task/actor, where ``lookup`` fans
    out per-shard ``get_many`` calls.
    """

    def __init__(self, shards: list, num_shards: int, *, on_miss=None):
        self.shards = shards
        self.num_shards = num_shards
        self.on_miss = on_miss

    @classmethod
    def from_dict(cls, d: dict, *, num_shards: int = 8,
                  on_miss=None) -> "ShardedDict":
        """``on_miss``: optional ``Callable[[list[str]], dict]`` called
        once per lookup batch with the keys no shard holds; returned
        values fill the result and are written back to the owning
        shards (read-through cache — reference ``WDProxyDB`` falls back
        to the live API on miss and caches the reply,
        ``kgdata/wikidata/db.py:60-108``). Keys the handler omits stay
        None."""
        parts: list[dict] = [{} for _ in range(num_shards)]
        ks = list(d.keys())
        assign = _shard_of(ks, num_shards)
        for k, s in zip(ks, assign):
            parts[s][k] = d[k]
        actors = [_DictShard.remote(p) for p in parts]
        return cls(actors, num_shards, on_miss=on_miss)

    def lookup(self, keys: Sequence[str], *, on_miss=None,
               cache_misses: bool = True) -> list:
        """Values aligned with ``keys`` (None for misses); one RPC per
        touched shard, issued concurrently. A miss handler (per-call
        ``on_miss`` or the instance default) is invoked once with the
        distinct missing keys; with ``cache_misses`` its replies are
        written back to the owning shards so repeat lookups stay
        local."""
        keys = list(keys)
        if not keys:
            return []
        assign = _shard_of(keys, self.num_shards)
        futures = {}
        for s in set(assign.tolist()):
            idx = np.nonzero(assign == s)[0]
            futures[s] = (idx, self.shards[s].get_many.remote(
                [keys[i] for i in idx]
            ))
        out: list = [None] * len(keys)
        for s, (idx, fut) in futures.items():
            vals = ray.get(fut)
            for i, v in zip(idx, vals):
                out[i] = v

        handler = on_miss or self.on_miss
        if handler is not None:
            missing = sorted({keys[i] for i, v in enumerate(out) if v is None})
            if missing:
                fetched = handler(missing) or {}
                for i, k in enumerate(keys):
                    if out[i] is None and k in fetched:
                        out[i] = fetched[k]
                if cache_misses and fetched:
                    fk = list(fetched.keys())
                    fa = _shard_of(fk, self.num_shards)
                    writes = []
                    for s in set(fa.tolist()):
                        part = {k: fetched[k]
                                for k, ks_ in zip(fk, fa) if ks_ == s}
                        writes.append(self.shards[s].put_many.remote(part))
                    ray.get(writes)
        return out

    def total_size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))


def lookup_column(
    ds,
    sharded: ShardedDict,
    *,
    key_col: str,
    out_col: str,
    batch_size: int = 8192,
):
    """Dataset stage: adds ``out_col`` = sharded lookup of ``key_col``
    (None on miss). The actor handles travel inside the task closure;
    lookups are per-batch fan-outs to the owning shards."""

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        b[out_col] = sharded.lookup(b[key_col].tolist())
        return b

    return ds.map_batches(fn, batch_format="pandas", batch_size=batch_size)
