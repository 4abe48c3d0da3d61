"""kernel/gif.py — pure-python GIF codec (no Spark needed)."""

import numpy as np
import pytest

from pyontutils_spark.kernel.gif import (
    GifError, decode_gif, decode_gif_frames, encode_gif, lzw_decode,
    lzw_encode, parse_gif)


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    # few distinct colors so the palette stays small and LZW has runs
    pal = rng.integers(0, 256, size=(7, 3), dtype=np.uint8)
    return pal[rng.integers(0, len(pal), size=(h, w))]


def test_lzw_roundtrip_small():
    idx = [0, 1, 1, 2, 1, 1, 0, 0, 0, 3, 3, 3, 3, 2]
    assert lzw_decode(lzw_encode(idx, 2), 2) == idx


def test_lzw_roundtrip_long_forces_width_growth_and_clear():
    rng = np.random.default_rng(1)
    # > 4096 dictionary entries worth of varied data: exercises width
    # growth to 12 bits AND the clear/rebuild path
    idx = rng.integers(0, 16, size=40000).tolist()
    assert lzw_decode(lzw_encode(idx, 4), 4) == idx


def test_lzw_single_symbol_run():
    idx = [5] * 1000
    assert lzw_decode(lzw_encode(idx, 3), 3) == idx


def test_encode_decode_exact_roundtrip():
    img = _img(33, 47)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_interlaced_roundtrip():
    img = _img(21, 13, seed=3)
    payload = encode_gif(img, interlace=True)
    assert payload[:6] == b"GIF89a"
    assert np.array_equal(decode_gif(payload), img)


def test_animation_frames_and_delays():
    f0, f1, f2 = _img(10, 12, 4), _img(10, 12, 5), _img(10, 12, 6)
    payload = encode_gif([f0, f1, f2], delays_ms=[100, 250, 30])
    frames, delays = decode_gif_frames(payload)
    assert len(frames) == 3
    assert delays == [100, 250, 30]
    for got, want in zip(frames, (f0, f1, f2)):
        assert np.array_equal(got, want)
    # still-image view is the first frame
    assert np.array_equal(decode_gif(payload), f0)


def test_transparency_composites_previous_frame():
    import struct
    base = np.zeros((4, 4, 3), dtype=np.uint8)
    base[:] = (10, 20, 30)
    payload = bytearray(encode_gif(base))
    # append a second frame by hand: palette idx 1 = (200,0,0) overlay
    # with transparent index 0 in a 2x2 sub-rectangle at (1,1)
    pal = np.array([[0, 0, 0], [200, 0, 0]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    body = payload[:-1]  # strip trailer
    body += b"\x21\xf9" + struct.pack("<BBHBB", 4, 0x01, 5, 0, 0)
    body += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0x80)
    body += pal.tobytes()  # LCT size field 0 -> exactly 2 entries
    lzw = lzw_encode(idx.reshape(-1), 2)
    body += bytes([2, len(lzw)]) + lzw + b"\x00"
    body += b"\x3b"
    frames, _ = decode_gif_frames(bytes(body))
    assert len(frames) == 2
    out = frames[1]
    # transparent cells keep the base color, opaque cells are red
    assert tuple(out[1, 1]) == (10, 20, 30)
    assert tuple(out[1, 2]) == (200, 0, 0)
    assert tuple(out[2, 1]) == (200, 0, 0)
    assert tuple(out[2, 2]) == (10, 20, 30)


def test_parse_metadata():
    img = _img(8, 9, seed=7)
    g = parse_gif(encode_gif(img, delays_ms=70))
    assert (g["width"], g["height"], g["version"]) == (9, 8, "89a")
    assert g["frames"][0]["delay_ms"] == 70
    assert g["gct"] is not None


def test_too_many_colors_raises():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(30, 30, 3), dtype=np.uint8)
    with pytest.raises(GifError, match="quantize"):
        encode_gif(img)


def test_bad_magic_raises():
    with pytest.raises(GifError, match="magic"):
        parse_gif(b"NOTAGIF" * 3)


def test_decode_image_dispatch():
    from pyontutils_spark.operators.multimodal import decode_image
    img = _img(12, 12, seed=9)
    assert np.array_equal(decode_image(encode_gif(img)), img)


def test_quantize_median_cut_bounds_colors_and_encodes():
    from pyontutils_spark.kernel.gif import quantize_median_cut
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    q = quantize_median_cut(img, 256)
    uniq = np.unique(q.reshape(-1, 3), axis=0)
    assert len(uniq) <= 256
    # quantized image now encodes, and round-trips exactly
    assert np.array_equal(decode_gif(encode_gif(q)), q)
    # mean error is small for a 256-color palette on random noise
    err = np.abs(q.astype(int) - img.astype(int)).mean()
    assert err < 24, err
    # already-paletted input passes through untouched
    small = _img(10, 10, seed=12)
    assert np.array_equal(quantize_median_cut(small, 256), small)
    # determinism
    assert np.array_equal(q, quantize_median_cut(img, 256))


def test_quantize_tiny_palette():
    from pyontutils_spark.kernel.gif import quantize_median_cut
    img = np.zeros((6, 6, 3), dtype=np.uint8)
    img[:, 3:] = (250, 10, 10)
    img[3:, :3] = (10, 250, 10)
    q = quantize_median_cut(img, 2)
    assert len(np.unique(q.reshape(-1, 3), axis=0)) <= 2
