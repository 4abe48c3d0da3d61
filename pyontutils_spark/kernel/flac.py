"""FLAC audio codec: pure-Python decode + encode (no deps).

Extends the engine's audio family beyond WAV (``multimodal.decode_wav``)
with the format that actually dominates lossless audio corpora.  Built
from the public FLAC format specification (RFC 9639 /
https://xiph.org/flac/format.html), following the repo's codec pattern
(kernel/jpeg.py, kernel/gif.py): a real decoder for the core format, a
deliberately-simple encoder that emits a strictly-conforming subset,
and exact lossless round-trip tests between them.

Decoder coverage (the constructs fixed-blocksize encoders emit):
- STREAMINFO parse; other metadata blocks skipped by length.
- Frame header: all blocksize/sample-rate/sample-size codes, UTF-8
  coded frame number, CRC-8 verified.
- Channel assignments: independent, left/side, right/side, mid/side.
- Subframes: CONSTANT, VERBATIM, FIXED (orders 0-4), LPC (any order),
  wasted-bits.
- Residual: Rice method 0 (4-bit) and 1 (5-bit), any partition order,
  escape partitions (raw binary).
- Frame CRC-16 verified.

Out of scope, raises ``NotImplementedError`` loudly (same policy as the
other codecs): variable-blocksize streams.

Encoder subset: fixed blocksize, independent channels, per-subframe
best FIXED predictor order 0-2 (sum-of-abs heuristic), Rice method 0
with one partition, 8/16/24-bit samples.  Conforming output: real
CRC-8/CRC-16, correct STREAMINFO, UTF-8 frame numbers.
"""

from __future__ import annotations

import struct

__all__ = ["decode_flac", "encode_flac", "parse_streaminfo"]


# ---------------------------------------------------------------- CRCs
def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


# ------------------------------------------------------------- bit I/O
class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        data, byte, bit = self.data, self.byte, self.bit
        while n > 0:
            avail = 8 - bit
            take = min(n, avail)
            cur = data[byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            bit += take
            n -= take
            if bit == 8:
                byte += 1
                bit = 0
        self.byte, self.bit = byte, bit
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        if self.bit:
            self.byte += 1
            self.bit = 0


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.buf)


# ----------------------------------------------------- frame-number UTF-8
def _utf8_number_encode(n: int) -> bytes:
    # FLAC's extended UTF-8 coding of frame/sample numbers
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > (7 - nbytes) + 6 * (nbytes - 1) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _utf8_number_decode(r: "_BitReader") -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (r.read(8) & 0x3F)
    return v


# ------------------------------------------------------------ STREAMINFO
def parse_streaminfo(payload: bytes) -> dict:
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC marker)")
    pos = 4
    info = None
    while True:
        hdr = payload[pos:pos + 4]
        last = hdr[0] >> 7
        btype = hdr[0] & 0x7F
        blen = int.from_bytes(hdr[1:4], "big")
        body = payload[pos + 4:pos + 4 + blen]
        if btype == 0:                 # STREAMINFO
            r = _BitReader(body)
            info = {
                "min_blocksize": r.read(16), "max_blocksize": r.read(16),
                "min_framesize": r.read(24), "max_framesize": r.read(24),
                "sample_rate": r.read(20),
                "channels": r.read(3) + 1,
                "bits_per_sample": r.read(5) + 1,
                "total_samples": r.read(36),
                "md5": body[18:34],
            }
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream has no STREAMINFO block")
    info["frames_offset"] = pos
    return info


_BS_CODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
            8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
            13: 8192, 14: 16384, 15: 32768}
_SS_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_SR_CODE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
            7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}


# ----------------------------------------------------------------- decode
def _decode_residual(r: _BitReader, blocksize: int, porder_samples: int,
                     order: int) -> list:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = r.read(4)
    nparts = 1 << porder
    out = []
    for p in range(nparts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        param = r.read(plen)
        if param == escape:
            raw = r.read(5)
            for _ in range(n):
                out.append(r.read_signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = r.read_unary()
                rem = r.read(param) if param else 0
                v = (q << param) | rem
                out.append((v >> 1) ^ -(v & 1))
    return out


_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _decode_subframe(r: _BitReader, blocksize: int, bps: int) -> list:
    if r.read(1):
        raise ValueError("subframe sync error (padding bit set)")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
    ebps = bps - wasted
    if stype == 0:                      # CONSTANT
        v = r.read_signed(ebps)
        out = [v] * blocksize
    elif stype == 1:                    # VERBATIM
        out = [r.read_signed(ebps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:              # FIXED order 0-4
        order = stype - 8
        warm = [r.read_signed(ebps) for _ in range(order)]
        res = _decode_residual(r, blocksize, blocksize, order)
        out = list(warm)
        coef = _FIXED_COEF[order]
        for i in range(order, blocksize):
            pred = 0
            for j, c in enumerate(coef):
                pred += c * out[i - 1 - j]
            out.append(pred + res[i - order])
    elif stype >= 32:                   # LPC
        order = stype - 31
        warm = [r.read_signed(ebps) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code")
        shift = r.read_signed(5)
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _decode_residual(r, blocksize, blocksize, order)
        out = list(warm)
        for i in range(order, blocksize):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * out[i - 1 - j]
            out.append((acc >> shift) + res[i - order])
    else:
        raise ValueError(f"reserved subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(payload: bytes) -> tuple:
    """Decode a FLAC stream -> (samples, sample_rate).

    ``samples`` is a list of per-channel lists of ints (exact PCM).
    """
    info = parse_streaminfo(payload)
    pos = info["frames_offset"]
    nchan = info["channels"]
    channels = [[] for _ in range(nchan)]
    total = info["total_samples"]
    got = 0
    while pos < len(payload) and (total == 0 or got < total):
        r = _BitReader(payload, pos)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"lost frame sync at byte {pos}")
        r.read(1)                       # reserved
        if r.read(1):
            raise NotImplementedError(
                "variable-blocksize FLAC streams are not supported")
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)                       # reserved
        _frame_no = _utf8_number_decode(r)
        if bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        elif bs_code in _BS_CODE:
            blocksize = _BS_CODE[bs_code]
        else:
            raise ValueError("reserved blocksize code")
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        bps = _SS_CODE.get(ss_code, info["bits_per_sample"])
        hdr_end = r.byte + (1 if r.bit else 0)
        crc8 = payload[hdr_end]
        if _crc8(payload[pos:hdr_end]) != crc8:
            raise ValueError("frame header CRC-8 mismatch")
        r = _BitReader(payload, hdr_end + 1)

        if ch_code < 8:
            nsub = ch_code + 1
            subs = [_decode_subframe(
                r, blocksize, bps) for _ in range(nsub)]
            chans = subs
        elif ch_code == 8:              # left/side
            left = _decode_subframe(r, blocksize, bps)
            side = _decode_subframe(r, blocksize, bps + 1)
            chans = [left, [l - s for l, s in zip(left, side)]]
        elif ch_code == 9:              # right/side
            side = _decode_subframe(r, blocksize, bps + 1)
            right = _decode_subframe(r, blocksize, bps)
            chans = [[rr + s for rr, s in zip(right, side)], right]
        elif ch_code == 10:             # mid/side
            mid = _decode_subframe(r, blocksize, bps)
            side = _decode_subframe(r, blocksize, bps + 1)
            chans = [[(((m << 1) | (s & 1)) + s) >> 1 for m, s in
                      zip(mid, side)],
                     [(((m << 1) | (s & 1)) - s) >> 1 for m, s in
                      zip(mid, side)]]
        else:
            raise ValueError("reserved channel assignment")
        r.align()
        frame_end = r.byte
        crc16 = struct.unpack(">H", payload[frame_end:frame_end + 2])[0]
        if _crc16(payload[pos:frame_end]) != crc16:
            raise ValueError("frame CRC-16 mismatch")
        for c in range(nchan):
            channels[c].extend(chans[c])
        got += blocksize
        pos = frame_end + 2
    if total:
        channels = [c[:total] for c in channels]
    return channels, info["sample_rate"]


# ----------------------------------------------------------------- encode
def _fixed_residual(samples: list, order: int) -> list:
    res = list(samples)
    for _ in range(order):
        res = [res[i] - res[i - 1] for i in range(1, len(res))]
    return res


def _best_rice_param(res: list) -> int:
    if not res:
        return 0
    total = sum(abs(v) for v in res)
    mean = total / len(res) if res else 0
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < 14:
        p += 1
    return p


def _write_residual(w: _BitWriter, res: list) -> None:
    w.write(0, 2)                       # Rice method 0
    w.write(0, 4)                       # partition order 0
    param = _best_rice_param(res)
    w.write(param, 4)
    for v in res:
        u = (-v * 2 - 1) if v < 0 else (v * 2)   # zigzag
        w.write_unary(u >> param)
        if param:
            w.write(u & ((1 << param) - 1), param)


def _encode_subframe(w: _BitWriter, samples: list, bps: int) -> None:
    if all(s == samples[0] for s in samples):
        w.write(0, 1); w.write(0, 6); w.write(0, 1)      # CONSTANT
        w.write_signed(samples[0], bps)
        return
    best_order, best_cost = 0, None
    for order in (0, 1, 2):
        if len(samples) <= order:
            break
        cost = sum(abs(v) for v in _fixed_residual(samples, order))
        if best_cost is None or cost < best_cost:
            best_order, best_cost = order, cost
    order = best_order
    w.write(0, 1)
    w.write(8 + order, 6)               # FIXED, order
    w.write(0, 1)                       # no wasted bits
    for s in samples[:order]:
        w.write_signed(s, bps)
    _write_residual(w, _fixed_residual(samples, order))


def encode_flac(channels: list, sample_rate: int,
                bits_per_sample: int = 16,
                blocksize: int = 4096) -> bytes:
    """Encode per-channel PCM int lists into a conforming FLAC stream."""
    nchan = len(channels)
    if not 1 <= nchan <= 8:
        raise ValueError("1-8 channels required")
    n = len(channels[0])
    if any(len(c) != n for c in channels):
        raise ValueError("channels must be equal length")
    if bits_per_sample not in (8, 16, 24):
        raise ValueError("encoder supports 8/16/24-bit samples")
    lo, hi = -(1 << (bits_per_sample - 1)), (1 << (bits_per_sample - 1)) - 1
    for c in channels:
        for v in c:
            if not lo <= v <= hi:
                raise ValueError("sample out of range for bits_per_sample")

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(blocksize, 16); si.write(blocksize, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nchan - 1, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16    # md5 unset (0 = unknown)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    ss_code = {8: 1, 16: 4, 24: 6}[bits_per_sample]
    frame_no = 0
    for start in range(0, n, blocksize):
        bs = min(blocksize, n - start)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1); w.write(0, 1)    # reserved, fixed-blocksize
        pow2 = {256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                8192: 13, 16384: 14, 32768: 15}
        if bs in pow2:
            bs_code, explicit = pow2[bs], None
        else:
            bs_code, explicit = 7, bs - 1
        w.write(bs_code, 4)
        sr_code = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
                   22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
                   96000: 11}.get(sample_rate, 0)
        w.write(sr_code, 4)
        w.write(nchan - 1, 4)           # independent channels
        w.write(ss_code, 3)
        w.write(0, 1)
        for b in _utf8_number_encode(frame_no):
            w.write(b, 8)
        if explicit is not None:
            w.write(explicit, 16)
        w.align()
        hdr = w.bytes()
        frame = bytearray(hdr)
        frame.append(_crc8(bytes(frame)))
        bw = _BitWriter()
        for c in channels:
            _encode_subframe(bw, c[start:start + bs], bits_per_sample)
        bw.align()
        frame += bw.bytes()
        frame += struct.pack(">H", _crc16(bytes(frame)))
        out += frame
        frame_no += 1
    return bytes(out)
