"""FLAC codec: lossless round-trips + hand-crafted decoder-path streams."""

import math
import random
import struct

import pytest

from pyontutils_spark.kernel.flac import (
    _BitWriter, _crc8, _crc16, _utf8_number_encode,
    decode_flac, encode_flac, parse_streaminfo)


def _sine(n, freq, rate, amp=12000):
    return [int(amp * math.sin(2 * math.pi * freq * i / rate))
            for i in range(n)]


def test_roundtrip_stereo_sine():
    rate = 44100
    left = _sine(10000, 440, rate)
    right = _sine(10000, 660, rate)
    payload = encode_flac([left, right], rate)
    chans, got_rate = decode_flac(payload)
    assert got_rate == rate
    assert chans == [left, right]       # bit-exact lossless


def test_roundtrip_noise_and_short_final_frame():
    rng = random.Random(7)
    mono = [rng.randint(-32768, 32767) for _ in range(5000)]
    payload = encode_flac([mono], 16000, blocksize=4096)
    chans, rate = decode_flac(payload)
    assert rate == 16000
    assert chans == [mono]              # 4096 + 904-sample final frame


def test_roundtrip_8_and_24_bit():
    rng = random.Random(9)
    s8 = [rng.randint(-128, 127) for _ in range(700)]
    assert decode_flac(encode_flac([s8], 8000, bits_per_sample=8))[0] \
        == [s8]
    s24 = [rng.randint(-(1 << 23), (1 << 23) - 1) for _ in range(700)]
    assert decode_flac(encode_flac([s24], 48000, bits_per_sample=24))[0] \
        == [s24]


def test_constant_channel_and_streaminfo():
    payload = encode_flac([[5] * 1000, _sine(1000, 100, 8000)], 8000)
    info = parse_streaminfo(payload)
    assert info["channels"] == 2
    assert info["sample_rate"] == 8000
    assert info["bits_per_sample"] == 16
    assert info["total_samples"] == 1000
    chans, _ = decode_flac(payload)
    assert chans[0] == [5] * 1000


def test_crc_corruption_detected():
    payload = bytearray(encode_flac([_sine(600, 50, 8000)], 8000))
    payload[-3] ^= 0x40                 # flip a bit inside the last frame
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(payload))
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"RIFFnot-a-flac")


def test_sample_range_validation():
    with pytest.raises(ValueError, match="range"):
        encode_flac([[40000]], 8000, bits_per_sample=16)
    with pytest.raises(ValueError, match="equal length"):
        encode_flac([[1, 2], [1]], 8000)


def test_variable_blocksize_raises_not_implemented():
    payload = bytearray(encode_flac([[0, 1] * 8], 8000, blocksize=16))
    fo = parse_streaminfo(bytes(payload))["frames_offset"]
    payload[fo + 1] |= 0x01             # blocking-strategy bit
    # re-fix the header CRC-8 (header: 4 fixed + 1 utf8 + 2 explicit-bs)
    payload[fo + 7] = _crc8(bytes(payload[fo:fo + 7]))
    with pytest.raises(NotImplementedError, match="variable-blocksize"):
        decode_flac(bytes(payload))


# ---------------------------------------------------- hand-crafted frames
def _stream(nchan, bps, blocksize, body_writer, ch_code=None,
            rate=8000, total=None):
    """Build a one-frame FLAC stream whose subframe section is written
    by ``body_writer(w)`` — exercises decoder paths the simple encoder
    never emits."""
    total = blocksize if total is None else total
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(blocksize, 16); si.write(blocksize, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(rate, 20); si.write(nchan - 1, 3); si.write(bps - 1, 5)
    si.write(total, 36)
    body = si.bytes() + b"\x00" * 16
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body
    w = _BitWriter()
    w.write(0x3FFE, 14); w.write(0, 1); w.write(0, 1)
    w.write(7, 4)                       # explicit 16-bit blocksize
    w.write(0, 4)                       # sample rate from STREAMINFO
    w.write(nchan - 1 if ch_code is None else ch_code, 4)
    w.write({8: 1, 16: 4, 24: 6}[bps], 3)
    w.write(0, 1)
    for b in _utf8_number_encode(0):
        w.write(b, 8)
    w.write(blocksize - 1, 16)
    w.align()
    frame = bytearray(w.bytes())
    frame.append(_crc8(bytes(frame)))
    bw = _BitWriter()
    body_writer(bw)
    bw.align()
    frame += bw.bytes()
    frame += struct.pack(">H", _crc16(bytes(frame)))
    return bytes(out + frame)


def _write_verbatim(w, samples, bps):
    w.write(0, 1); w.write(1, 6); w.write(0, 1)
    for s in samples:
        w.write(s & ((1 << bps) - 1), bps)


def test_lpc_subframe_decodes():
    # order-1 LPC with coefficient 1, shift 0 == fixed order 1
    samples = [10, 12, 15, 19, 24, 30, 37, 45]
    res = [samples[i] - samples[i - 1] for i in range(1, len(samples))]

    def body(w):
        w.write(0, 1); w.write(32, 6); w.write(0, 1)   # LPC order 1
        w.write(samples[0] & 0xFFFF, 16)               # warmup
        w.write(12 - 1, 4)                             # precision 12
        w.write(0 & 0x1F, 5)                           # shift 0
        w.write(1 & 0xFFF, 12)                         # coef = 1
        w.write(0, 2); w.write(0, 4)                   # rice0, porder 0
        w.write(3, 4)                                  # param 3
        for v in res:
            u = (-v * 2 - 1) if v < 0 else (v * 2)
            w.write_unary(u >> 3); w.write(u & 7, 3)

    chans, _ = decode_flac(_stream(1, 16, len(samples), body))
    assert chans == [samples]


def test_escape_partition_decodes():
    samples = [1000, -1000, 512, -512, 3, -3, 0, 7]

    def body(w):
        w.write(0, 1); w.write(8, 6); w.write(0, 1)    # FIXED order 0
        w.write(0, 2); w.write(0, 4)
        w.write(15, 4)                                 # escape param
        w.write(12, 5)                                 # 12 raw bits
        for v in samples:
            w.write(v & 0xFFF, 12)

    chans, _ = decode_flac(_stream(1, 16, len(samples), body))
    assert chans == [samples]


def test_mid_side_and_left_side_decode():
    left = [100, 110, 90, 80, 70, 95, 105, 115]
    right = [90, 100, 85, 70, 60, 80, 95, 100]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    side = [l - r for l, r in zip(left, right)]

    def ms_body(w):
        _write_verbatim(w, mid, 16)
        _write_verbatim(w, side, 17)

    chans, _ = decode_flac(_stream(2, 16, len(left), ms_body, ch_code=10))
    assert chans == [left, right]

    def ls_body(w):
        _write_verbatim(w, left, 16)
        _write_verbatim(w, side, 17)

    chans, _ = decode_flac(_stream(2, 16, len(left), ls_body, ch_code=8))
    assert chans == [left, right]

    def rs_body(w):
        _write_verbatim(w, side, 17)
        _write_verbatim(w, right, 16)

    chans, _ = decode_flac(_stream(2, 16, len(left), rs_body, ch_code=9))
    assert chans == [left, right]


def test_utf8_frame_numbers_roundtrip():
    from pyontutils_spark.kernel.flac import (_BitReader,
                                              _utf8_number_decode)
    for n in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10FFFF, 2 ** 30):
        data = _utf8_number_encode(n)
        assert _utf8_number_decode(_BitReader(data)) == n, n
