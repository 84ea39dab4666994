"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns next
to a ``kind`` discriminator and a JSON ``meta`` column. The decode /
feature-extract / resize / frame-sample operators are actor-pool
``map_batches`` stages whose Ray-side plumbing (schema, batch sizing,
actor signature, output layout) is real and tested. The codecs this
container can implement from spec are REAL: PCM WAV (stdlib ``wave``),
RGB PNG (zlib inflate + unfilter), animated GIF (LZW), baseline JPEG
(all-integer DCT codec, stages/jpegcodec.py) and MJPEG AVI (RIFF +
per-frame JPEG). Only formats that genuinely need external codec
libraries (inter-frame-predicted video, non-PCM audio, other still
formats without Pillow) raise the declared ``NotImplementedError``;
``engine="fake"`` remains as a deterministic byte-level stand-in.

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

    ``engine="fake"`` emits deterministic byte-level features with the
    same output schema the real decoder would produce:
    (item_id, kind, feat: list<float>[dim], digest).

    ``engine="real"`` actually decodes what this container can decode:
    PCM WAV audio via the stdlib ``wave`` module (samples normalized to
    [-1, 1), ``dim`` bucket means), RGB PNG via the in-repo stdlib
    inflate+unfilter decoder, baseline JFIF (JPEG) via the in-repo
    all-integer codec (stages/jpegcodec.py), animated GIF via the
    in-repo LZW decoder, and other image formats via Pillow when it is
    importable (the import is guarded in ``__init__`` so the actor
    still constructs without it and only such a payload raises).
    Inter-frame-predicted video and non-PCM audio codecs raise
    NotImplementedError — declared, not silently faked.
    """

    def __init__(self, *, engine: str = "fake", dim: int = 8):
        if engine not in ("fake", "real"):
            raise ValueError(engine)
        self.engine = engine
        self.dim = dim
        self._pil = None
        if engine == "real":
            try:  # optional dependency: images decode only with Pillow
                from PIL import Image

                self._pil = Image
            except ImportError:
                pass

    def _fake_features(self, payload: bytes) -> list[float]:
        if not payload:
            return [0.0] * self.dim
        b = np.frombuffer(payload, dtype=np.uint8)
        chunks = np.array_split(b, self.dim)
        return [float(round(c.mean(), 4)) if len(c) else 0.0 for c in chunks]

    def _bucket_means(self, x: np.ndarray) -> list[float]:
        chunks = np.array_split(x, self.dim)
        return [float(round(c.mean(), 4)) if len(c) else 0.0
                for c in chunks]

    def _real_features(self, payload: bytes, kind: str) -> list[float]:
        import io

        if kind == "audio":
            import wave

            with wave.open(io.BytesIO(payload)) as w:
                sw = w.getsampwidth()
                raw = w.readframes(w.getnframes())
            dt = {1: np.dtype(np.uint8), 2: np.dtype("<i2"),
                  4: np.dtype("<i4")}.get(sw)
            if dt is None:
                raise NotImplementedError(f"{sw * 8}-bit PCM")
            x = np.frombuffer(raw, dtype=dt).astype(np.float64)
            if sw == 1:
                x = x - 128.0
            return self._bucket_means(x / float(1 << (8 * sw - 1)))
        if kind == "image":
            if payload[:8] == _PNG_SIG:
                # stdlib spec decoder (always available); integer luma
                # (299R + 587G + 114B) // 1000 is the pinned contract
                rgb = decode_png(payload).astype(np.int64)
                luma = (299 * rgb[..., 0] + 587 * rgb[..., 1]
                        + 114 * rgb[..., 2]) // 1000
                return self._bucket_means(
                    luma.ravel().astype(np.float64) / 255.0)
            if payload[:2] == b"\xff\xd8":
                # baseline JFIF via the in-repo all-integer codec
                # (stages/jpegcodec.py); same pinned luma contract
                from .jpegcodec import decode_jpeg

                rgb = decode_jpeg(payload).astype(np.int64)
                luma = (299 * rgb[..., 0] + 587 * rgb[..., 1]
                        + 114 * rgb[..., 2]) // 1000
                return self._bucket_means(
                    luma.ravel().astype(np.float64) / 255.0)
            if self._pil is None:
                raise NotImplementedError(
                    "non-PNG/JPEG image decode requires Pillow, which "
                    "is not importable in this environment")
            img = self._pil.open(io.BytesIO(payload)).convert("L")
            a = np.asarray(img, dtype=np.float64) / 255.0
            return self._bucket_means(a.ravel())
        if kind == "video":
            if payload[:6] in (b"GIF87a", b"GIF89a"):
                # stdlib LZW decoder; same pinned integer-luma contract
                rgb = decode_gif(payload).astype(np.int64)
                luma = (299 * rgb[..., 0] + 587 * rgb[..., 1]
                        + 114 * rgb[..., 2]) // 1000
                return self._bucket_means(
                    luma.ravel().astype(np.float64) / 255.0)
            if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
                # MJPEG AVI via the in-repo JPEG codec; same contract
                rgb = decode_avi_mjpeg(payload).astype(np.int64)
                luma = (299 * rgb[..., 0] + 587 * rgb[..., 1]
                        + 114 * rgb[..., 2]) // 1000
                return self._bucket_means(
                    luma.ravel().astype(np.float64) / 255.0)
            raise NotImplementedError(
                "non-GIF/MJPEG video decode (inter-frame-predicted "
                "codecs) requires codec libraries not present in this "
                "environment")
        raise NotImplementedError(
            f"real decode for kind={kind!r} requires codec libraries "
            "not present in this environment")

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        if self.engine == "real":
            kinds = t["kind"].to_pylist()
            feats = [self._real_features(p or b"", k)
                     for p, k in zip(payloads, kinds)]
        else:
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


# --------------------------------------------------------------------------
# REAL header parsing (pure byte parsing, stdlib only — no codec libs).
# Pixel decode stays stubbed, but container metadata (format, width,
# height) is genuinely parsed from magic bytes, which is what a
# training-data pipeline needs for size/aspect filtering before any
# expensive decode.

import struct  # noqa: E402
import zlib  # noqa: E402

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_bytes(width: int, height: int, *, payload_hint: bytes = b"") -> bytes:
    """Minimal structurally-valid PNG (signature + IHDR with correct
    CRC + stub IDAT + IEND) — deterministic synthetic image payloads
    whose headers a real parser can parse."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    out = [_PNG_SIG]
    for tag, body in ((b"IHDR", ihdr),
                      (b"IDAT", payload_hint[:64]),
                      (b"IEND", b"")):
        out.append(struct.pack(">I", len(body)))
        out.append(tag)
        out.append(body)
        out.append(struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))
    return b"".join(out)


def gif_bytes(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00;"


def jpeg_bytes(width: int, height: int) -> bytes:
    """SOI + minimal SOF0 frame header + EOI."""
    body = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    return (b"\xff\xd8"  # SOI
            + b"\xff\xc0" + struct.pack(">H", len(body) + 2) + body
            + b"\xff\xd9")  # EOI


def parse_image_header(b: bytes) -> tuple[str, int, int]:
    """(format, width, height) from container magic bytes; ("unknown",
    -1, -1) when no known signature matches. Supports PNG (IHDR), GIF
    (logical screen descriptor) and JPEG (first SOF0/1/2 marker)."""
    if b[:8] == _PNG_SIG and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return "png", w, h
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", w, h
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 1 < len(b):
            if b[i] != 0xFF:
                break
            # Runs of 0xFF are legal fill bytes before a marker.
            while i + 1 < len(b) and b[i + 1] == 0xFF:
                i += 1
            if i + 1 >= len(b):
                break
            marker = b[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):
                if i + 9 > len(b):
                    break
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return "jpeg", w, h
            if marker == 0xD9 or marker == 0xDA:
                break  # EOI / SOS (entropy data follows): no SOF seen
            if 0xD0 <= marker <= 0xD8 or marker == 0x01:
                i += 2  # standalone markers carry no length field
                continue
            if i + 4 > len(b):
                break
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return "jpeg", -1, -1
    return "unknown", -1, -1


def media_from_documents_png(docs: Dataset) -> Dataset:
    """Synthetic media table whose payloads are structurally VALID PNGs
    with deterministic (doc_id-derived) dimensions — the header parser
    has something real to parse, the pixel content is the doc text."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payload = [
            png_bytes(16 + (i % 512), 16 + (i * 7 % 512),
                      payload_hint=txt.encode("utf-8"))
            for i, txt in zip(ids, t["text"].to_pylist())
        ]
        meta = [
            json.dumps({"kind": "image", "n_bytes": len(p)}, sort_keys=True)
            for p in payload
        ]
        return pa.Table.from_arrays(
            [
                t["doc_id"].cast(pa.int64()),
                pa.array(["image"] * len(payload), pa.string()),
                pa.array(payload, pa.binary()),
                pa.array(meta, pa.string()),
            ],
            schema=MEDIA_SCHEMA,
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", batch_size=256
    )


def parse_media_headers(media: Dataset, *, batch_size: int = 256) -> Dataset:
    """(item_id, format, width, height) parsed from payload magic bytes
    — a REAL decode-metadata stage (stateless plain task; binary-safe
    Arrow in/out)."""

    def fn(t: pa.Table) -> pa.Table:
        fmts, ws, hs = [], [], []
        for p in t["payload"].to_pylist():
            f, w, h = parse_image_header(p or b"")
            fmts.append(f)
            ws.append(w)
            hs.append(h)
        return pa.table(
            {
                "item_id": t["item_id"],
                "format": pa.array(fmts, pa.string()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
            }
        )

    return media.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


# --------------------------------------------------------------------------
# RIFF/WAVE audio: synthetic payloads + REAL byte-level header parsing
# (same contract as the PNG/GIF/JPEG image path above: the container
# metadata parse is real, only codec work is out of scope here).

_WAV_RATES = (8000, 16000, 22050, 44100)


def wav_bytes(sample_rate: int, channels: int, bits: int,
              n_frames: int) -> bytes:
    """Minimal structurally-valid RIFF/WAVE (fmt + data chunks) with a
    deterministic PCM byte pattern — synthetic audio payloads whose
    headers a real parser can parse."""
    block_align = channels * bits // 8
    data_size = n_frames * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    data = bytes((i * 7) & 0xFF for i in range(data_size))
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + data_size)
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", data_size) + data)


def parse_wav_header(b: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, channels, bits_per_sample, n_frames) from a RIFF
    chunk walk; (-1, -1, -1, -1) when not a WAVE stream. Chunks are
    word-aligned (odd sizes pad one byte); the data chunk's size field
    is authoritative even if the payload is truncated (streaming)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return (-1, -1, -1, -1)
    i = 12
    sr = ch = bits = -1
    block_align = 0
    data_size = None
    while i + 8 <= len(b):
        tag = b[i:i + 4]
        size = struct.unpack("<I", b[i + 4:i + 8])[0]
        if tag == b"fmt " and i + 24 <= len(b):
            _, ch, sr, _, block_align, bits = struct.unpack(
                "<HHIIHH", b[i + 8:i + 24])
        elif tag == b"data":
            data_size = size
        i += 8 + size + (size & 1)
    n_frames = (data_size // block_align
                if data_size is not None and block_align else -1)
    return (sr, ch, bits, n_frames)


def media_from_documents_wav(docs: Dataset) -> Dataset:
    """Synthetic audio table with doc_id-derived, structurally-valid
    WAV payloads (rate/channels/frame-count vary per id so the parser
    is exercised across the parameter space)."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payload = [
            wav_bytes(_WAV_RATES[i % 4], 1 + i % 2, 16, 100 + i % 400)
            for i in ids
        ]
        meta = [
            json.dumps({"kind": "audio", "n_bytes": len(p)},
                       sort_keys=True)
            for p in payload
        ]
        return pa.Table.from_arrays(
            [
                t["doc_id"].cast(pa.int64()),
                pa.array(["audio"] * len(payload), pa.string()),
                pa.array(payload, pa.binary()),
                pa.array(meta, pa.string()),
            ],
            schema=MEDIA_SCHEMA,
        )

    return docs.select_columns(["doc_id"]).map_batches(
        fn, batch_format="pyarrow", batch_size=256
    )


def parse_audio_headers(media: Dataset, *,
                        batch_size: int = 256) -> Dataset:
    """(item_id, sample_rate, channels, bits, n_frames, duration_ms)
    parsed from RIFF bytes — stateless plain task, binary-safe Arrow
    in/out, small batches for wide binary rows. duration_ms =
    n_frames * 1000.0 / rate (exact IEEE ops on exact ints, so any
    engine reproduces it bit-for-bit)."""

    def fn(t: pa.Table) -> pa.Table:
        srs, chs, bts, nfs, durs = [], [], [], [], []
        for p in t["payload"].to_pylist():
            sr, ch, bits, nf = parse_wav_header(p or b"")
            srs.append(sr)
            chs.append(ch)
            bts.append(bits)
            nfs.append(nf)
            durs.append(nf * 1000.0 / sr if sr > 0 and nf >= 0 else -1.0)
        return pa.table(
            {
                "item_id": t["item_id"],
                "sample_rate": pa.array(srs, pa.int32()),
                "channels": pa.array(chs, pa.int32()),
                "bits": pa.array(bts, pa.int32()),
                "n_frames": pa.array(nfs, pa.int64()),
                "duration_ms": pa.array(durs, pa.float64()),
            }
        )

    return media.map_batches(fn, batch_format="pyarrow",
                             batch_size=batch_size)


# --------------------------------------------------------------------------
# Animated GIF: frame counting by a REAL block walk.


def gif_bytes_frames(width: int, height: int, n_frames: int) -> bytes:
    """Structurally-valid animated GIF89a: logical screen descriptor
    (no global color table) followed by ``n_frames`` image descriptors
    each with a minimal LZW data stream, then the trailer."""
    out = [b"GIF89a", struct.pack("<HH", width, height), b"\x00\x00\x00"]
    for _ in range(n_frames):
        out.append(b"\x2c")  # image separator
        out.append(struct.pack("<HHHH", 0, 0, width, height))
        out.append(b"\x00")  # no local color table
        out.append(b"\x02")  # LZW minimum code size
        out.append(b"\x01\x00")  # one 1-byte data sub-block
        out.append(b"\x00")  # sub-block terminator
    out.append(b"\x3b")  # trailer
    return b"".join(out)


def parse_gif_frames(b: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) by walking GIF blocks — skips the
    global/local color tables and extension/image data sub-block
    chains, counts image separators (0x2C). (-1, -1, -1) when not a
    GIF; frames seen before any malformed tail still count."""
    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        return (-1, -1, -1)
    w, h = struct.unpack("<HH", b[6:10])
    packed = b[10]
    i = 13
    if packed & 0x80:  # global color table
        i += 3 * (1 << ((packed & 0x07) + 1))
    frames = 0

    def skip_subblocks(j: int) -> int:
        while j < len(b):
            n = b[j]
            j += 1
            if n == 0:
                return j
            j += n
        return j

    while i < len(b):
        tag = b[i]
        if tag == 0x3B:  # trailer
            break
        if tag == 0x21:  # extension: label + sub-blocks
            i = skip_subblocks(i + 2)
        elif tag == 0x2C:  # image descriptor
            if i + 10 > len(b):
                break
            lpacked = b[i + 9]
            i += 10
            if lpacked & 0x80:  # local color table
                i += 3 * (1 << ((lpacked & 0x07) + 1))
            i += 1  # LZW minimum code size
            i = skip_subblocks(i)
            frames += 1
        else:  # unknown block: stop rather than misparse
            break
    return (w, h, frames)


def media_from_documents_gif(docs: Dataset) -> Dataset:
    """Synthetic animated-GIF media table with doc_id-derived
    dimensions and frame counts."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payload = [
            gif_bytes_frames(16 + (i % 64), 16 + (i * 3) % 64,
                             1 + i % 5)
            for i in ids
        ]
        meta = [
            json.dumps({"kind": "video", "n_bytes": len(p)},
                       sort_keys=True)
            for p in payload
        ]
        return pa.Table.from_arrays(
            [
                t["doc_id"].cast(pa.int64()),
                pa.array(["video"] * len(payload), pa.string()),
                pa.array(payload, pa.binary()),
                pa.array(meta, pa.string()),
            ],
            schema=MEDIA_SCHEMA,
        )

    return docs.select_columns(["doc_id"]).map_batches(
        fn, batch_format="pyarrow", batch_size=256
    )


def parse_gif_frame_counts(media: Dataset, *,
                           batch_size: int = 256) -> Dataset:
    """(item_id, width, height, n_frames) from GIF block walks —
    the frame-indexing stage of a video-ish ingest (real parsing;
    codec decode stays out of scope)."""

    def fn(t: pa.Table) -> pa.Table:
        ws, hs, fs = [], [], []
        for p in t["payload"].to_pylist():
            w, h, nf = parse_gif_frames(p or b"")
            ws.append(w)
            hs.append(h)
            fs.append(nf)
        return pa.table(
            {
                "item_id": t["item_id"],
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "n_frames": pa.array(fs, pa.int32()),
            }
        )

    return media.map_batches(fn, batch_format="pyarrow",
                             batch_size=batch_size)


# --------------------------------------------------------------------------
# MP4 / ISO-BMFF: REAL top-level box walk (ftyp brand, mvhd
# timescale/duration incl. the 64-bit version-1 layout, trak count).
# Mirrors the reference's "parse container metadata, stub the codec"
# split (kgdata parses dump container formats, not media codecs).

_MP4_TIMESCALES = (600, 1000, 90000, 44100)


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def mp4_bytes(timescale: int, duration: int, n_tracks: int,
              *, mvhd_version: int = 0) -> bytes:
    """Minimal structurally-valid ISO-BMFF stream: ftyp + moov(mvhd +
    n_tracks x trak(tkhd)) + mdat filler. Big-endian sizes like the
    spec; ``mvhd_version=1`` emits the 64-bit creation/duration
    layout so parsers must honour the version byte."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512)
                + b"isomiso2mp41")
    if mvhd_version == 0:
        mvhd_payload = (bytes([0, 0, 0, 0])
                        + struct.pack(">IIII", 0, 0, timescale, duration)
                        + struct.pack(">I", 0x00010000)   # rate 1.0
                        + struct.pack(">H", 0x0100)        # volume 1.0
                        + bytes(10)                        # reserved
                        + bytes(36)                        # matrix
                        + bytes(24)                        # pre_defined
                        + struct.pack(">I", n_tracks + 1))
    else:
        mvhd_payload = (bytes([1, 0, 0, 0])
                        + struct.pack(">QQIQ", 0, 0, timescale, duration)
                        + struct.pack(">I", 0x00010000)
                        + struct.pack(">H", 0x0100)
                        + bytes(10) + bytes(36) + bytes(24)
                        + struct.pack(">I", n_tracks + 1))
    traks = b""
    for tid in range(1, n_tracks + 1):
        tkhd_payload = (bytes([0, 0, 0, 7])
                        + struct.pack(">IIII", 0, 0, tid, 0)
                        + struct.pack(">I", duration)
                        + bytes(8)                        # reserved
                        + struct.pack(">HHHH", 0, 0, 0, 0)
                        + bytes(36)                       # matrix
                        + struct.pack(">II", 640 << 16, 480 << 16))
        traks += _box(b"trak", _box(b"tkhd", tkhd_payload))
    moov = _box(b"moov", _box(b"mvhd", mvhd_payload) + traks)
    mdat = _box(b"mdat", bytes((i * 11) & 0xFF for i in range(32)))
    return ftyp + moov + mdat


def parse_mp4_header(b: bytes) -> tuple[str, int, int, int]:
    """(brand, timescale, duration_ticks, n_tracks) from a top-level
    ISO-BMFF box walk; ('', -1, -1, -1) when the stream has no valid
    ftyp. Handles 64-bit largesize boxes (size==1), size==0
    box-extends-to-EOF, and both mvhd versions."""

    def walk(buf: bytes, lo: int, hi: int):
        i = lo
        while i + 8 <= hi:
            size = struct.unpack(">I", buf[i:i + 4])[0]
            tag = buf[i + 4:i + 8]
            body = i + 8
            if size == 1:
                if i + 16 > hi:
                    return
                size = struct.unpack(">Q", buf[i + 8:i + 16])[0]
                body = i + 16
            elif size == 0:
                size = hi - i
            if size < 8 or i + size > hi:
                return
            yield tag, body, i + size
            i += size

    brand, ts, dur, n_tracks = "", -1, -1, -1
    saw_ftyp = False
    for tag, body, end in walk(b, 0, len(b)):
        if tag == b"ftyp" and end - body >= 4:
            brand = b[body:body + 4].decode("ascii", "replace")
            saw_ftyp = True
        elif tag == b"moov":
            n_tracks = 0
            for ctag, cbody, cend in walk(b, body, end):
                if ctag == b"trak":
                    n_tracks += 1
                elif ctag == b"mvhd" and cend - cbody >= 4:
                    version = b[cbody]
                    if version == 1 and cend - cbody >= 32:
                        ts = struct.unpack(
                            ">I", b[cbody + 20:cbody + 24])[0]
                        dur = struct.unpack(
                            ">Q", b[cbody + 24:cbody + 32])[0]
                    elif version == 0 and cend - cbody >= 24:
                        ts, dur = struct.unpack(
                            ">II", b[cbody + 12:cbody + 20])
    if not saw_ftyp:
        return ("", -1, -1, -1)
    return (brand, ts, dur, n_tracks)


def media_from_documents_mp4(docs: Dataset) -> Dataset:
    """Synthetic video table with doc_id-derived, structurally-valid
    MP4 payloads (timescale/duration/track-count vary per id; every
    5th id uses the 64-bit mvhd-v1 layout so both parse paths run)."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payload = [
            mp4_bytes(_MP4_TIMESCALES[i % 4], 1000 + i % 9000,
                      1 + i % 3, mvhd_version=1 if i % 5 == 0 else 0)
            for i in ids
        ]
        meta = [
            json.dumps({"kind": "video", "n_bytes": len(p)},
                       sort_keys=True)
            for p in payload
        ]
        return pa.Table.from_arrays(
            [
                t["doc_id"].cast(pa.int64()),
                pa.array(["video"] * len(payload), pa.string()),
                pa.array(payload, pa.binary()),
                pa.array(meta, pa.string()),
            ],
            schema=MEDIA_SCHEMA,
        )

    return docs.select_columns(["doc_id"]).map_batches(
        fn, batch_format="pyarrow", batch_size=256
    )


def parse_video_headers(media: Dataset, *,
                        batch_size: int = 256) -> Dataset:
    """(item_id, brand, timescale, duration_ticks, n_tracks,
    duration_ms) from ISO-BMFF box walks — stateless plain task,
    binary-safe Arrow in/out. duration_ms = ticks * 1000.0 /
    timescale (exact IEEE ops on exact ints)."""

    def fn(t: pa.Table) -> pa.Table:
        brands, tss, durs, nts, ms = [], [], [], [], []
        for p in t["payload"].to_pylist():
            brand, ts, dur, nt = parse_mp4_header(p or b"")
            brands.append(brand)
            tss.append(ts)
            durs.append(dur)
            nts.append(nt)
            ms.append(dur * 1000.0 / ts if ts > 0 and dur >= 0 else -1.0)
        return pa.table(
            {
                "item_id": t["item_id"],
                "brand": pa.array(brands, pa.string()),
                "timescale": pa.array(tss, pa.int32()),
                "duration_ticks": pa.array(durs, pa.int64()),
                "n_tracks": pa.array(nts, pa.int32()),
                "duration_ms": pa.array(ms, pa.float64()),
            }
        )

    return media.map_batches(fn, batch_format="pyarrow",
                             batch_size=batch_size)


# --------------------------------------------------------------------------
# Real PNG codec (stdlib-only): spec-complete scanline filters 0-4 over
# 8-bit RGB. The encoder cycles the filter type per row so the decoder's
# every unfilter branch is exercised by the synthetic corpus itself.


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def encode_png(rgb: "np.ndarray") -> bytes:
    """8-bit RGB (h, w, 3) -> PNG bytes. Filter type = row % 5 (all
    five spec filters), IDAT = one zlib stream."""
    h, w, _ = rgb.shape
    bpp = 3
    raw = rgb.astype(np.int64)
    out = bytearray()
    prior = np.zeros((w, bpp), np.int64)
    for y in range(h):
        row = raw[y]
        ftype = y % 5
        out.append(ftype)
        left = np.zeros((w, bpp), np.int64)
        left[1:] = row[:-1]
        ul = np.zeros((w, bpp), np.int64)
        ul[1:] = prior[:-1]
        if ftype == 0:
            f = row
        elif ftype == 1:
            f = row - left
        elif ftype == 2:
            f = row - prior
        elif ftype == 3:
            f = row - (left + prior) // 2
        else:
            pr = np.empty((w, bpp), np.int64)
            for x in range(w):
                for c in range(bpp):
                    pr[x, c] = _paeth(int(left[x, c]), int(prior[x, c]),
                                      int(ul[x, c]))
            f = row - pr
        out.extend((f % 256).astype(np.uint8).tobytes())
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(bytes(out), 6)
    parts = [_PNG_SIG]
    for tag, body in ((b"IHDR", ihdr), (b"IDAT", idat), (b"IEND", b"")):
        parts.append(struct.pack(">I", len(body)))
        parts.append(tag)
        parts.append(body)
        parts.append(struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))
    return b"".join(parts)


def decode_png(payload: bytes) -> "np.ndarray":
    """Stdlib PNG decoder for 8-bit RGB color type 2, no interlace:
    chunk walk -> concatenated-IDAT zlib inflate -> per-row unfilter
    (all five spec filter types). Returns (h, w, 3) uint8. Raises
    NotImplementedError on any other PNG flavor — a real decode for
    the engine's synthetic corpus and common RGB screenshots, a
    declared boundary beyond it."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        ln = struct.unpack(">I", payload[pos:pos + 4])[0]
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    f"PNG flavor depth={depth} color={ctype} "
                    f"interlace={interlace} not supported by the "
                    "stdlib decoder")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp = 3
    stride = w * bpp
    if len(raw) != h * (1 + stride):
        raise ValueError("bad IDAT length")
    img = np.zeros((h, w, bpp), np.int64)
    prior = np.zeros((w, bpp), np.int64)
    for y in range(h):
        off = y * (1 + stride)
        ftype = raw[off]
        f = np.frombuffer(
            raw[off + 1:off + 1 + stride], np.uint8
        ).astype(np.int64).reshape(w, bpp)
        if ftype == 0:
            row = f
        elif ftype == 2:
            row = (f + prior) % 256
        elif ftype in (1, 3, 4):
            row = np.zeros((w, bpp), np.int64)
            for x in range(w):
                for c in range(bpp):
                    a = int(row[x - 1, c]) if x else 0
                    b = int(prior[x, c])
                    cc = int(prior[x - 1, c]) if x else 0
                    if ftype == 1:
                        pred = a
                    elif ftype == 3:
                        pred = (a + b) // 2
                    else:
                        pred = _paeth(a, b, cc)
                    row[x, c] = (int(f[x, c]) + pred) % 256
        else:
            raise ValueError(f"bad filter type {ftype}")
        img[y] = row
        prior = row
    return img.astype(np.uint8)


def valid_png_bytes(item_id: int) -> bytes:
    """Deterministic fully-decodable RGB PNG: dimensions and pixels
    derive from ``item_id`` (pixel byte = (3x + c + 31y + 7 id) mod
    256), rows filtered with cycling filter types."""
    w = 4 + item_id % 13
    h = 3 + item_id % 11
    y, x, c = np.ogrid[0:h, 0:w, 0:3]
    rgb = ((3 * x + c + 31 * y + 7 * item_id) % 256).astype(np.uint8)
    return encode_png(rgb)


def media_from_documents_png_valid(docs: Dataset) -> Dataset:
    """Synthetic image table whose payloads are fully DECODABLE PNGs
    (valid zlib IDAT, spec filters) — the real-decode counterpart of
    :func:`media_from_documents_png`'s header-only payloads."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payload = [valid_png_bytes(int(i)) for i in ids]
        meta = [json.dumps({"kind": "image", "n_bytes": len(p)},
                           sort_keys=True) for p in payload]
        return pa.Table.from_arrays(
            [
                t["doc_id"].cast(pa.int64()),
                pa.array(["image"] * len(payload), pa.string()),
                pa.array(payload, pa.binary()),
                pa.array(meta, pa.string()),
            ],
            schema=MEDIA_SCHEMA,
        )

    return docs.select_columns(["doc_id"]).map_batches(
        fn, batch_format="pyarrow", batch_size=256
    )


def valid_jpeg_bytes(item_id: int) -> bytes:
    """Deterministic fully-decodable baseline JPEG: dimensions and
    pixels derive from ``item_id`` (pixel byte = (5x + 3c + 17y +
    11 id) mod 256); the subsampling mode cycles 4:2:0 / 4:4:4 /
    grayscale with ``item_id`` so the decoder's every sampling branch
    is exercised by the synthetic corpus itself."""
    from .jpegcodec import encode_jpeg

    w = 9 + item_id % 14
    h = 7 + item_id % 12
    y, x, c = np.ogrid[0:h, 0:w, 0:3]
    rgb = ((5 * x + 3 * c + 17 * y + 11 * item_id) % 256).astype(np.uint8)
    mode = ("420", "444", "gray")[item_id % 3]
    return encode_jpeg(rgb, subsampling=mode)


def media_from_documents_jpeg_valid(docs: Dataset) -> Dataset:
    """Synthetic image table whose payloads are fully DECODABLE
    baseline JPEGs (real Huffman scan, Annex-K tables, mixed
    subsampling modes) — the JFIF counterpart of
    :func:`media_from_documents_png_valid`."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payload = [valid_jpeg_bytes(int(i)) for i in ids]
        meta = [json.dumps({"kind": "image", "n_bytes": len(p)},
                           sort_keys=True) for p in payload]
        return pa.Table.from_arrays(
            [
                t["doc_id"].cast(pa.int64()),
                pa.array(["image"] * len(payload), pa.string()),
                pa.array(payload, pa.binary()),
                pa.array(meta, pa.string()),
            ],
            schema=MEDIA_SCHEMA,
        )

    return docs.select_columns(["doc_id"]).map_batches(
        fn, batch_format="pyarrow", batch_size=256
    )


# --------------------------------------------------------------------------
# REAL animated-GIF pixel decode with a stdlib LZW codec. GIF is the
# one animation container whose codec (variable-width LZW, GIF89a) is
# fully implementable from the spec with no external library — so the
# engine's "video/animation" decode path gets a real frames->pixels
# implementation here, leaving only inter-frame-predicted codecs
# (H.264 etc.) as the declared NotImplementedError boundary.
# Reference analog: none (the reference has no media decode); this is
# the engine's LLM-training-data multimodal surface.


def _lzw_encode(indices: "np.ndarray", min_code_size: int = 8) -> bytes:
    """Spec LZW for GIF image data, literal-codes-only variant: every
    pixel is emitted as its own root code, with the code width grown
    exactly when the decoder's table crosses a power of two and a
    CLEAR emitted when the table would overflow 4096 entries. Valid
    per spec (an encoder may flush at any time); compression ratio is
    sacrificed, round-trip fidelity is not."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    emit(clear, width)
    next_code = eoi + 1
    prev = False  # decoder adds an entry per code only after the first
    for v in indices.ravel().tolist():
        if next_code >= 4096:
            emit(clear, width)
            width = min_code_size + 1
            next_code = eoi + 1
            prev = False
        emit(int(v), width)
        if prev:
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = True
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int,
                n_pixels: int) -> "np.ndarray":
    """General GIF LZW decoder (handles real encoders, not just the
    literal-only writer above): variable code width 3..12 bits
    LSB-first, table rebuild on CLEAR, the KwKwK case, deferred-clear
    full tables. Returns exactly ``n_pixels`` uint8 indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    roots = [bytes([i]) for i in range(clear)]
    table: list[bytes] = []
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= n:
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = []
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < clear:
            entry = roots[code]
        elif code - eoi - 1 < len(table):
            entry = table[code - eoi - 1]
        elif code == eoi + 1 + len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None and len(table) < 4096 - eoi - 1:
            table.append(prev + entry[:1])
            if eoi + 1 + len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("LZW stream ended early")
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


def encode_gif(frames: "np.ndarray", palette: "np.ndarray") -> bytes:
    """(n_frames, h, w) uint8 palette indices + (256, 3) uint8 palette
    -> animated GIF89a bytes: logical screen descriptor with a global
    256-color table, one full-frame image descriptor per frame, data
    sub-block chunking, trailer."""
    nf, h, w = frames.shape
    out = [b"GIF89a", struct.pack("<HH", w, h),
           bytes([0x80 | 0x07, 0, 0]),  # GCT present, 256 entries
           palette.astype(np.uint8).tobytes()]
    for f in range(nf):
        out.append(b"\x2c")
        out.append(struct.pack("<HHHH", 0, 0, w, h))
        out.append(b"\x00")  # no local color table, not interlaced
        out.append(bytes([8]))  # LZW minimum code size
        data = _lzw_encode(frames[f])
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out.append(bytes([len(chunk)]))
            out.append(chunk)
        out.append(b"\x00")
    out.append(b"\x3b")
    return b"".join(out)


def decode_gif(payload: bytes) -> "np.ndarray":
    """REAL animated-GIF pixel decode: block walk + LZW inflate +
    palette application. Returns (n_frames, h, w, 3) uint8 RGB over
    the logical screen; frames composite over the previous canvas
    (disposal "none"), which covers the engine's fixture and plain
    full-frame animations. Raises NotImplementedError on interlaced
    images or transparency (not composited here), ValueError on
    malformed streams."""
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    i = 13
    gct = None
    if packed & 0x80:
        ncol = 1 << ((packed & 0x07) + 1)
        gct = np.frombuffer(
            payload[i:i + 3 * ncol], np.uint8).reshape(ncol, 3)
        i += 3 * ncol
    frames = []
    canvas = np.zeros((h, w, 3), np.uint8)
    while i < len(payload):
        tag = payload[i]
        if tag == 0x3B:
            break
        if tag == 0x21:  # extension
            label = payload[i + 1]
            j = i + 2
            if label == 0xF9 and payload[j] >= 4 and payload[j + 1] & 0x01:
                raise NotImplementedError(
                    "GIF transparency compositing not supported")
            while j < len(payload) and payload[j]:
                j += 1 + payload[j]
            i = j + 1
        elif tag == 0x2C:
            fx, fy, fw, fh = struct.unpack("<HHHH", payload[i + 1:i + 9])
            lpacked = payload[i + 9]
            i += 10
            if lpacked & 0x40:
                raise NotImplementedError("interlaced GIF")
            pal = gct
            if lpacked & 0x80:
                ncol = 1 << ((lpacked & 0x07) + 1)
                pal = np.frombuffer(
                    payload[i:i + 3 * ncol], np.uint8).reshape(ncol, 3)
                i += 3 * ncol
            if pal is None:
                raise ValueError("GIF frame without any color table")
            mcs = payload[i]
            i += 1
            data = bytearray()
            while i < len(payload) and payload[i]:
                n = payload[i]
                data.extend(payload[i + 1:i + 1 + n])
                i += 1 + n
            i += 1  # sub-block terminator
            idx = _lzw_decode(bytes(data), mcs, fw * fh).reshape(fh, fw)
            canvas = canvas.copy()
            canvas[fy:fy + fh, fx:fx + fw] = pal[idx]
            frames.append(canvas)
        else:
            raise ValueError(f"unknown GIF block 0x{tag:02x}")
    if not frames:
        raise ValueError("GIF with no image data")
    return np.stack(frames)


def gif_frames_for(item_id: int) -> tuple["np.ndarray", "np.ndarray"]:
    """Deterministic animated-GIF fixture: (frames, palette) where
    n_frames = 2 + id%4, w = 6 + id%9, h = 5 + id%7, index(f, y, x) =
    (5x + 11y + 29f + 7 id) mod 256, palette[i] = (i, 3i mod 256,
    7i mod 256)."""
    nf = 2 + item_id % 4
    w, h = 6 + item_id % 9, 5 + item_id % 7
    f, y, x = np.ogrid[0:nf, 0:h, 0:w]
    frames = ((5 * x + 11 * y + 29 * f + 7 * item_id) % 256).astype(np.uint8)
    i = np.arange(256, dtype=np.int64)
    palette = np.stack([i, (3 * i) % 256, (7 * i) % 256],
                       axis=1).astype(np.uint8)
    return frames, palette


def media_from_documents_gif_valid(docs: Dataset) -> Dataset:
    """Synthetic animation table whose payloads are fully DECODABLE
    animated GIFs (real LZW data, global color table) — the
    real-decode counterpart of :func:`media_from_documents_gif`'s
    frame-count-only payloads."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payload = [encode_gif(*gif_frames_for(int(i))) for i in ids]
        meta = [json.dumps({"kind": "video", "n_bytes": len(p)},
                           sort_keys=True) for p in payload]
        return pa.Table.from_arrays(
            [
                t["doc_id"].cast(pa.int64()),
                pa.array(["video"] * len(payload), pa.string()),
                pa.array(payload, pa.binary()),
                pa.array(meta, pa.string()),
            ],
            schema=MEDIA_SCHEMA,
        )

    return docs.select_columns(["doc_id"]).map_batches(
        fn, batch_format="pyarrow", batch_size=256
    )


def gif_frame_stats(media: Dataset, *, batch_size: int = 64) -> Dataset:
    """Per-frame pixel statistics from REAL GIF decode: one output row
    per (item, frame) with integer-exact mean luma — luma =
    (299R + 587G + 114B) // 1000 per pixel, mean_luma_milli =
    (1000 * sum(luma)) // (w*h). All-integer so the result is
    bit-identical at any batching and certifiable against a
    formula-only golden (no codec on the oracle side: agreement
    proves the LZW encode->decode round trip lossless)."""

    def fn(t: pa.Table) -> pa.Table:
        item_ids, frame_idx, widths, heights, luma = [], [], [], [], []
        for iid, p in zip(t["item_id"].to_pylist(),
                          t["payload"].to_pylist()):
            frames = decode_gif(p or b"")
            nf, h, w, _ = frames.shape
            px = frames.astype(np.int64)
            lm = (299 * px[..., 0] + 587 * px[..., 1]
                  + 114 * px[..., 2]) // 1000
            sums = lm.reshape(nf, -1).sum(axis=1)
            item_ids.extend([iid] * nf)
            frame_idx.extend(range(nf))
            widths.extend([w] * nf)
            heights.extend([h] * nf)
            luma.extend((1000 * sums // (w * h)).tolist())
        return pa.table({
            "item_id": pa.array(item_ids, pa.int64()),
            "frame_idx": pa.array(frame_idx, pa.int64()),
            "width": pa.array(widths, pa.int64()),
            "height": pa.array(heights, pa.int64()),
            "mean_luma_milli": pa.array(luma, pa.int64()),
        })

    return media.map_batches(fn, batch_format="pyarrow",
                             batch_size=batch_size)


# --------------------------------------------------------------------------
# REAL MJPEG-in-AVI video decode. Motion JPEG is the one genuine VIDEO
# codec (every frame an independent baseline JPEG — webcams, capture
# cards) that needs no inter-frame prediction, so the in-repo JPEG
# codec (stages/jpegcodec.py) makes whole AVI files decodable with no
# external library. Inter-frame-predicted codecs (H.264 etc.) remain
# the declared NotImplementedError boundary. Reference analog: none
# (the reference has no media decode); this is the engine's
# LLM-training-data multimodal surface.


def encode_avi_mjpeg(frames: list, *, fps: int = 10,
                     subsampling: str = "420") -> bytes:
    """List of (h, w, 3) uint8 RGB frames -> minimal spec-shaped AVI
    (RIFF 'AVI ': hdrl with avih + strl(strh 'vids'/'MJPG' + strf
    BITMAPINFOHEADER), movi with one '00dc' JPEG chunk per frame,
    idx1). Deterministic: frame payloads come from the all-integer
    JPEG encoder."""
    from .jpegcodec import encode_jpeg

    if not frames:
        raise ValueError("no frames")
    h, w, _ = frames[0].shape
    payloads = [encode_jpeg(f, subsampling=subsampling) for f in frames]

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    buf_size = max(len(p) for p in payloads)
    avih = struct.pack(
        "<14I", 1_000_000 // fps, buf_size * fps, 0, 0x10,  # HASINDEX
        len(frames), 0, 1, buf_size, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIi", 0, 0, 0, 0, 1, fps, 0,
                          len(frames), buf_size, -1)
            + struct.pack("<I", 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh)
                     + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", p) for p in payloads)
    movi = lst(b"movi", movi_body)
    idx = bytearray()
    off = 4  # offsets are relative to the start of 'movi' fourcc
    for p in payloads:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(p))
        off += 8 + len(p) + (len(p) % 2)
    riff_body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_mjpeg(payload: bytes) -> "np.ndarray":
    """AVI bytes -> (n_frames, h, w, 3) uint8 via per-frame JPEG
    decode of the '00dc'/'00db' movi chunks. Raises ValueError on a
    non-AVI RIFF and NotImplementedError when the stream is not
    MJPEG (inter-frame codecs are the declared boundary)."""
    from .jpegcodec import decode_jpeg

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    # stream format check from the strl header when present
    sp = payload.find(b"strh")
    if sp != -1 and payload[sp + 8:sp + 12] == b"vids":
        handler = payload[sp + 12:sp + 16]
        if handler not in (b"MJPG", b"mjpg"):
            raise NotImplementedError(
                f"AVI video codec {handler!r} (inter-frame prediction) "
                "is not decodable without codec libraries")
    frames = []
    pos = 12
    end = 8 + struct.unpack("<I", payload[4:8])[0]
    stack = [(pos, min(end, len(payload)))]
    while stack:
        lo, hi = stack.pop()
        p = lo
        while p + 8 <= hi:
            tag = payload[p:p + 4]
            ln = struct.unpack("<I", payload[p + 4:p + 8])[0]
            body_lo = p + 8
            if tag == b"LIST":
                stack.append((body_lo + 4, body_lo + ln))
            elif tag in (b"00dc", b"00db") and ln:
                frames.append(decode_jpeg(payload[body_lo:body_lo + ln]))
            p = body_lo + ln + (ln % 2)
    if not frames:
        raise ValueError("no video frames in movi")
    return np.stack(frames)


def valid_avi_bytes(item_id: int) -> bytes:
    """Deterministic fully-decodable MJPEG AVI: n_frames = 2 +
    id % 3, dimensions and pixels derive from ``item_id`` (pixel
    byte = (5x + 3c + 17y + 23f + 11 id) mod 256), subsampling
    alternating 4:2:0 / 4:4:4 with the id."""
    w = 9 + item_id % 10
    h = 7 + item_id % 9
    nf = 2 + item_id % 3
    frames = []
    for f in range(nf):
        y, x, c = np.ogrid[0:h, 0:w, 0:3]
        frames.append(((5 * x + 3 * c + 17 * y + 23 * f + 11 * item_id)
                       % 256).astype(np.uint8))
    return encode_avi_mjpeg(frames,
                            subsampling=("420", "444")[item_id % 2])


def media_from_documents_avi_valid(docs: Dataset) -> Dataset:
    """Synthetic video table whose payloads are fully DECODABLE MJPEG
    AVI files (real RIFF container, every frame a real baseline-JPEG
    scan) — the video counterpart of
    :func:`media_from_documents_png_valid`."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payload = [valid_avi_bytes(int(i)) for i in ids]
        meta = [json.dumps({"kind": "video", "n_bytes": len(p)},
                           sort_keys=True) for p in payload]
        return pa.Table.from_arrays(
            [
                t["doc_id"].cast(pa.int64()),
                pa.array(["video"] * len(payload), pa.string()),
                pa.array(payload, pa.binary()),
                pa.array(meta, pa.string()),
            ],
            schema=MEDIA_SCHEMA,
        )

    return docs.select_columns(["doc_id"]).map_batches(
        fn, batch_format="pyarrow", batch_size=256
    )


def mjpeg_frame_stats(media: Dataset, *, batch_size: int = 64) -> Dataset:
    """Per-frame pixel statistics from REAL MJPEG-AVI decode: one row
    per (item, frame) with the pinned integer mean luma (same contract
    as gif_frame_stats) plus the container digest — digest equality
    against the golden certifies the engine's AVI+JPEG encoders, stat
    equality its decoders."""
    import hashlib

    def fn(t: pa.Table) -> pa.Table:
        item_ids, frame_idx, widths, heights = [], [], [], []
        luma, digests = [], []
        for iid, p in zip(t["item_id"].to_pylist(),
                          t["payload"].to_pylist()):
            frames = decode_avi_mjpeg(p or b"")
            dg = hashlib.sha1(p or b"").hexdigest()
            nf, h, w, _ = frames.shape
            px = frames.astype(np.int64)
            lm = (299 * px[..., 0] + 587 * px[..., 1]
                  + 114 * px[..., 2]) // 1000
            sums = lm.reshape(nf, -1).sum(axis=1)
            item_ids.extend([iid] * nf)
            frame_idx.extend(range(nf))
            widths.extend([w] * nf)
            heights.extend([h] * nf)
            luma.extend((1000 * sums // (w * h)).tolist())
            digests.extend([dg] * nf)
        return pa.table({
            "item_id": pa.array(item_ids, pa.int64()),
            "frame_idx": pa.array(frame_idx, pa.int64()),
            "width": pa.array(widths, pa.int64()),
            "height": pa.array(heights, pa.int64()),
            "mean_luma_milli": pa.array(luma, pa.int64()),
            "digest": pa.array(digests, pa.string()),
        })

    return media.map_batches(fn, batch_format="pyarrow",
                             batch_size=batch_size)
