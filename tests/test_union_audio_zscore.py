"""union_by_name, WAV header parsing, grouped z-score outliers."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from kgdata_ray.functions.blocks import union_by_name
from kgdata_ray.functions.stats import grouped_zscore_outliers
from kgdata_ray.stages.multimodal import (
    media_from_documents_wav,
    parse_audio_headers,
    parse_wav_header,
    wav_bytes,
)

SF = "/root/testdata/sf0.001"


def test_wav_roundtrip_param_grid():
    for sr in (8000, 22050, 44100):
        for ch in (1, 2):
            for nf in (0, 1, 100, 399):
                b = wav_bytes(sr, ch, 16, nf)
                assert parse_wav_header(b) == (sr, ch, 16, nf)


def test_wav_parser_rejects_junk_and_handles_padding():
    assert parse_wav_header(b"") == (-1, -1, -1, -1)
    assert parse_wav_header(b"RIFFxxxxAVI ") == (-1, -1, -1, -1)
    assert parse_wav_header(b"\x89PNG\r\n\x1a\n") == (-1, -1, -1, -1)
    # odd-size unknown chunk before fmt: the walk must skip the pad byte
    import struct
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    odd = (b"RIFF" + struct.pack("<I", 100) + b"WAVE"
           + b"LIST" + struct.pack("<I", 3) + b"abc\x00"  # padded
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", 8) + b"\x00" * 8)
    assert parse_wav_header(odd) == (8000, 1, 16, 4)
    # truncated data payload: the size field stays authoritative
    trunc = (b"RIFF" + struct.pack("<I", 100) + b"WAVE"
             + b"fmt " + struct.pack("<I", len(fmt)) + fmt
             + b"data" + struct.pack("<I", 20) + b"\x00" * 4)
    assert parse_wav_header(trunc) == (8000, 1, 16, 10)


def test_audio_headers_pipeline():
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id"])
    out = parse_audio_headers(media_from_documents_wav(docs)).to_pandas()
    rates = {0: 8000, 1: 16000, 2: 22050, 3: 44100}
    for r in out.itertuples():
        assert r.sample_rate == rates[r.item_id % 4]
        assert r.channels == 1 + r.item_id % 2
        assert r.n_frames == 100 + r.item_id % 400
        assert r.duration_ms == r.n_frames * 1000.0 / r.sample_rate


def test_union_by_name_nulls_and_promotion():
    a = pd.DataFrame({"k": np.array([1, 2], dtype=np.int32),
                      "s": ["x", "y"]})
    b = pd.DataFrame({"k": np.array([3], dtype=np.int64),
                      "v": [1.5]})
    u = union_by_name(
        [rd.from_pandas(a), rd.from_pandas(b)],
        schemas=[pa.schema([("k", pa.int32()), ("s", pa.string())]),
                 pa.schema([("k", pa.int64()), ("v", pa.float64())])],
    )
    t = u.to_pandas().sort_values("k").reset_index(drop=True)
    assert list(t.columns) == ["k", "s", "v"]
    assert t["k"].tolist() == [1, 2, 3]  # int32 promoted into int64
    assert t["s"].tolist()[:2] == ["x", "y"] and pd.isna(t["s"][2])
    assert pd.isna(t["v"][0]) and t["v"][2] == 1.5


def test_zscore_outliers_matches_pandas():
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    ev["x"] = np.floor(ev["value"]).astype("int64")
    got = grouped_zscore_outliers(
        rd.from_pandas(ev[["event_id", "event_type", "x"]]),
        "event_type", "event_id", "x", threshold=2.0).to_pandas()
    g = ev.groupby("event_type")["x"]
    z = (ev["x"] - g.transform("mean")) / g.transform("std")
    exp = ev.loc[np.abs(z) > 2.0, "event_id"]
    assert set(got["event_id"]) == set(exp)
    # z itself must agree with pandas to float tolerance
    zmap = dict(zip(ev["event_id"], z))
    assert all(abs(r.z - zmap[r.event_id]) < 1e-9
               for r in got.itertuples())


def test_gif_frame_walk():
    from kgdata_ray.stages.multimodal import (
        gif_bytes,
        gif_bytes_frames,
        parse_gif_frames,
    )

    for nf in (1, 3, 5):
        b = gif_bytes_frames(40, 24, nf)
        assert parse_gif_frames(b) == (40, 24, nf)
    # frame-less GIF (no image descriptor) parses as 0 frames
    assert parse_gif_frames(gif_bytes(20, 10)) == (20, 10, 0)
    assert parse_gif_frames(b"not a gif") == (-1, -1, -1)
    # extension blocks before the frames are skipped, not counted
    import struct
    ext = (b"GIF89a" + struct.pack("<HH", 8, 8) + b"\x00\x00\x00"
           + b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE + terminator
           + b"\x2c" + struct.pack("<HHHH", 0, 0, 8, 8) + b"\x00"
           + b"\x02\x01\x00\x00" + b"\x3b")
    assert parse_gif_frames(ext) == (8, 8, 1)
