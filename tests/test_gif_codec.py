"""Stdlib GIF LZW codec: frame roundtrip, real-encoder compatibility,
declared boundaries, and the real-decode per-frame stats stage."""

import numpy as np
import pytest


def test_gif_roundtrip_fixture_ids():
    from kgdata_ray.stages.multimodal import (
        decode_gif,
        encode_gif,
        gif_frames_for,
        parse_gif_frames,
    )

    for i in range(0, 120, 7):
        frames, pal = gif_frames_for(i)
        b = encode_gif(frames, pal)
        out = decode_gif(b)
        assert (out == pal[frames]).all()
        w, h, nf = parse_gif_frames(b)
        assert (nf, h, w) == frames.shape


def test_lzw_roundtrip_wide_codes_and_clears():
    """Literal-only engine encoder grows the code width 9->12 and
    emits mid-stream clears on a >4096-pixel frame."""
    from kgdata_ray.stages.multimodal import _lzw_decode, _lzw_encode

    big = (np.arange(120 * 90, dtype=np.int64) * 31 % 256).astype(np.uint8)
    assert (_lzw_decode(_lzw_encode(big), 8, big.size) == big).all()


def _compress_real(ix, mcs=8):
    """compress(1)-style LZW with the real-GIF width rule (the encoder
    table runs one entry ahead of a late-change decoder, so it bumps
    at next_code == (1<<width) + 1) — emulates giflib-family output."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code, width = eoi + 1, mcs + 1
    acc, nbits, out = 0, 0, bytearray()

    def emit(c, w):
        nonlocal acc, nbits
        acc |= c << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    s = b""
    for v in ix:
        s2 = s + bytes([v])
        if s2 in table:
            s = s2
            continue
        emit(table[s], width)
        if next_code <= 4095:
            table[s2] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code, width = eoi + 1, mcs + 1
        s = bytes([v])
    emit(table[s], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_lzw_decoder_handles_real_compressing_encoder():
    """Multi-char table entries, the KwKwK case, width growth to 12
    bits and a table-full clear — the shapes a real GIF writer emits,
    not just the engine's literal-only stream."""
    from kgdata_ray.stages.multimodal import _lzw_decode

    rng = np.random.RandomState(7)
    noise = rng.randint(0, 256, 50000).astype(np.uint8).tobytes()
    runs = (b"abcabcabd" * 2000) + bytes(range(256)) * 10
    for data in (noise, runs, b"aaaaaaa"):  # aaaa... = immediate KwKwK
        dec = _lzw_decode(_compress_real(list(data)), 8, len(data))
        assert bytes(dec.tolist()) == data


def test_gif_decode_declared_boundaries():
    from kgdata_ray.stages.multimodal import (
        decode_gif,
        encode_gif,
        gif_frames_for,
    )

    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
    frames, pal = gif_frames_for(3)
    b = bytearray(encode_gif(frames, pal))
    # flip the interlace bit of the first image descriptor
    i = b.index(0x2C, 13 + 768)
    b[i + 9] |= 0x40
    with pytest.raises(NotImplementedError):
        decode_gif(bytes(b))
    # a graphic-control extension with the transparency flag set
    gce = bytes([0x21, 0xF9, 0x04, 0x01, 0x00, 0x00, 0x00, 0x00])
    head = bytes(encode_gif(frames, pal)[:13 + 768])
    with pytest.raises(NotImplementedError):
        decode_gif(head + gce + b"\x3b")


def test_gif_frame_stats_matches_formula(ray_session):
    import ray.data as rd

    from kgdata_ray.oracle_sketch import golden_gif_frames
    from kgdata_ray.stages.multimodal import (
        gif_frame_stats,
        media_from_documents_gif_valid,
    )

    docs = rd.from_items([{"doc_id": i} for i in range(40)])
    got = (gif_frame_stats(media_from_documents_gif_valid(docs))
           .to_pandas().sort_values(["item_id", "frame_idx"])
           .reset_index(drop=True))
    want = (golden_gif_frames(range(40)).to_pandas()
            .sort_values(["item_id", "frame_idx"]).reset_index(drop=True))
    assert got.equals(want)
