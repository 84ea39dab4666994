"""Stdlib PNG codec: spec-filter roundtrip + real-decode feature path."""

import numpy as np


def test_png_roundtrip_all_filters():
    from kgdata_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.RandomState(9)
    for h, w in [(1, 1), (5, 4), (11, 13), (7, 1)]:
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = decode_png(encode_png(img))
        assert out.shape == (h, w, 3)
        assert (out == img).all()


def test_png_decoder_rejects_other_flavors():
    import struct
    import zlib

    import pytest

    from kgdata_ray.stages.multimodal import _PNG_SIG, decode_png

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0)  # RGBA
    chunk = (struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
             + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF))
    with pytest.raises(NotImplementedError):
        decode_png(_PNG_SIG + chunk)


def test_valid_png_bytes_decode_matches_formula():
    from kgdata_ray.stages.multimodal import decode_png, valid_png_bytes

    for i in [0, 3, 17, 42, 100]:
        img = decode_png(valid_png_bytes(i))
        h, w, _ = img.shape
        assert (w, h) == (4 + i % 13, 3 + i % 11)
        y, x, c = np.ogrid[0:h, 0:w, 0:3]
        want = ((3 * x + c + 31 * y + 7 * i) % 256).astype(np.uint8)
        assert (img == want).all()


def test_image_features_real_decode(ray_session):
    import ray.data as rd
    import pandas as pd

    from kgdata_ray.stages.multimodal import (
        decode_features, media_from_documents_png_valid)

    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(6, dtype=np.int64)}))
    out = decode_features(media_from_documents_png_valid(docs),
                          engine="real").to_pandas()
    assert len(out) == 6
    feats = np.asarray(out["feat"].tolist())
    assert feats.shape == (6, 8)
    assert ((feats >= 0.0) & (feats <= 1.0)).all()
