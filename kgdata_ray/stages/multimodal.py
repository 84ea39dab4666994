"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns next
to a ``kind`` discriminator and a JSON ``meta`` column. The decode /
feature-extract / resize / frame-sample operators are actor-pool
``map_batches`` stages whose Ray-side plumbing (schema, batch sizing,
actor signature, output layout) is real and tested; the *codec* itself
is stubbed — the decode libs are not in this container — behind either
``NotImplementedError`` (``engine="real"``) or a deterministic fake
(``engine="fake"``, byte-level statistics standing in for decoded
features).

Scale notes: binary rows are wide — callers should use small
``batch_size`` (default 256 here vs 8192 for text) so
batch x concurrency fits worker heaps, and keep these stages in
``batch_format="pyarrow"`` (binary round-trips poorly through pandas).
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("meta", pa.string()),  # JSON: {width,height,...} per kind
    ]
)


def media_from_documents(docs: Dataset, *, kind: str = "image") -> Dataset:
    """Deterministic synthetic media table from the documents corpus
    (text bytes as payload) — test/bench stand-in for real blobs."""

    def fn(t: pa.Table) -> pa.Table:
        payload = [txt.encode("utf-8") for txt in t["text"].to_pylist()]
        meta = [
            json.dumps({"kind": kind, "n_bytes": len(p)}, sort_keys=True)
            for p in payload
        ]
        return pa.Table.from_arrays(
            [
                t["doc_id"].cast(pa.int64()),
                pa.array([kind] * len(payload), pa.string()),
                pa.array(payload, pa.binary()),
                pa.array(meta, pa.string()),
            ],
            schema=MEDIA_SCHEMA,
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", batch_size=256
    )


class DecodeFeatures:
    """Decode + feature-extract actor.

    ``engine="real"`` raises NotImplementedError (no codec libraries in
    this container — wire Pillow/ffmpeg here on a real deployment).
    ``engine="fake"`` emits deterministic byte-level features with the
    same output schema the real decoder would produce:
    (item_id, kind, feat: list<float>[dim], digest).
    """

    def __init__(self, *, engine: str = "fake", dim: int = 8):
        if engine not in ("fake", "real"):
            raise ValueError(engine)
        self.engine = engine
        self.dim = dim

    def _fake_features(self, payload: bytes) -> list[float]:
        if not payload:
            return [0.0] * self.dim
        b = np.frombuffer(payload, dtype=np.uint8)
        chunks = np.array_split(b, self.dim)
        return [float(round(c.mean(), 4)) if len(c) else 0.0 for c in chunks]

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.engine == "real":
            raise NotImplementedError(
                "real media decoding requires codec libraries not present "
                "in this environment; use engine='fake'"
            )
        payloads = t["payload"].to_pylist()
        feats = [self._fake_features(p) for p in payloads]
        digests = [hashlib.sha1(p or b"").hexdigest() for p in payloads]
        return pa.table(
            {
                "item_id": t["item_id"],
                "kind": t["kind"],
                "feat": pa.array(feats, pa.list_(pa.float32())),
                "digest": pa.array(digests, pa.string()),
            }
        )


def decode_features(
    media: Dataset, *, engine: str = "fake", dim: int = 8,
    concurrency=(1, 4), batch_size: int = 256,
) -> Dataset:
    return media.map_batches(
        DecodeFeatures,
        fn_constructor_kwargs={"engine": engine, "dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


class ResizeStub:
    """'Resize' = deterministic payload truncation/padding to
    ``target_bytes`` (stands in for image resize; same plumbing)."""

    def __init__(self, *, target_bytes: int = 1024):
        self.target = target_bytes

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        for p in t["payload"].to_pylist():
            p = p or b""
            p = p[: self.target] if len(p) >= self.target else p + b"\x00" * (
                self.target - len(p)
            )
            out.append(p)
        return t.set_column(
            t.schema.get_field_index("payload"), "payload",
            pa.array(out, pa.binary()),
        )


def resize(media: Dataset, *, target_bytes: int = 1024,
           concurrency=(1, 4), batch_size: int = 256) -> Dataset:
    return media.map_batches(
        ResizeStub,
        fn_constructor_kwargs={"target_bytes": target_bytes},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


def frame_sample(media: Dataset, *, every: int = 4, frame_bytes: int = 64,
                 batch_size: int = 256) -> Dataset:
    """'Video' frame sampling stub: split the payload into fixed-size
    frames, keep every ``every``-th -> one output row per kept frame
    (flat-map shape; real frame decode plugs into the same stage)."""

    def fn(t: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for item_id, p in zip(t["item_id"].to_pylist(), t["payload"].to_pylist()):
            p = p or b""
            n = max(1, (len(p) + frame_bytes - 1) // frame_bytes)
            for f in range(0, n, every):
                ids.append(item_id)
                idxs.append(f)
                frames.append(p[f * frame_bytes : (f + 1) * frame_bytes])
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )

    return media.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
