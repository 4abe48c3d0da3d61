"""Baseline-sequential JPEG (JFIF) codec — pure Python + numpy.

The multimodal decode stage (``operators/multimodal.py``) needs JPEG
because a Common-Crawl-style media corpus is overwhelmingly JPEG and
this container ships no image library.  This implements the
baseline-sequential subset of the public ITU T.81 spec:

- ``decode_jpeg``: full marker parse (SOI/APPn/COM/DQT/SOF0/SOF1/DHT/
  DRI/SOS/EOI), stream-defined quantization + Huffman tables (it
  decodes real-world baseline files, not just our encoder's output),
  interleaved MCU scan with byte de-stuffing and restart markers,
  per-block Huffman DC/AC decode -> dequantize -> dezigzag -> 2D IDCT,
  arbitrary h/v sampling factors (4:4:4, 4:2:2, 4:2:0) upsampled by
  pixel replication, JFIF YCbCr -> RGB (grayscale stacked to RGB).
  Progressive (SOF2), arithmetic-coded and lossless frames raise a
  declared ``NotImplementedError``.
- ``encode_jpeg``: minimal spec-valid baseline encoder used by tests
  and ``synth_media`` — 4:4:4 or 4:2:0, optional restart interval.
  Its Huffman tables are simple canonical fixed-length tables (DC: 12
  four-bit codes; AC: 162 eight-bit codes) written into the DHT
  segments, so correctness never depends on reproducing the Annex K
  tables from memory; compression is a little worse, validity is not.

Slow by design (per-bit Python Huffman loop): the scale contract is
that decode runs *inside* Arrow-batched ``mapInPandas`` workers
(operators/multimodal.py), so throughput comes from partition
parallelism, not from this kernel.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index order: ZIGZAG[k] = (row, col) of the k-th coefficient
_ZZ = []
for s in range(15):
    ks = range(max(0, s - 7), min(s, 7) + 1)
    diag = [(s - j, j) for j in ks]
    _ZZ.extend(diag[::-1] if s % 2 == 1 else diag)
ZIGZAG = tuple(_ZZ)
assert len(ZIGZAG) == 64 and ZIGZAG[1] == (0, 1) and ZIGZAG[2] == (1, 0)

# 2D IDCT/FDCT as matrix products: A[x, u] = 0.5*c(u)*cos((2x+1)u pi/16)
_A = np.zeros((8, 8))
for x in range(8):
    for u in range(8):
        c = (1 / np.sqrt(2)) if u == 0 else 1.0
        _A[x, u] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16)


def idct2(block: np.ndarray) -> np.ndarray:
    """8x8 2D inverse DCT (DCT-III with JPEG normalization)."""
    return _A @ block @ _A.T


def fdct2(block: np.ndarray) -> np.ndarray:
    """8x8 2D forward DCT (exact inverse of :func:`idct2`)."""
    return _A.T @ block @ _A


# Annex K luminance/chrominance quantization tables (row-major; these
# only shape the encoder's rate/quality tradeoff — both codec ends read
# the actual table from the DQT segment, so a transcription slip would
# cost fidelity, never correctness).
QUANT_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)
QUANT_CHROM = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int32)


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


# --------------------------------------------------------------------------
# Huffman
# --------------------------------------------------------------------------

def _canonical_codes(bits: list[int], vals: list[int]):
    """BITS (count of codes per length 1..16) + ordered symbols ->
    {(length, code): symbol} (decode) and {symbol: (length, code)}
    (encode)."""
    dec, enc = {}, {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            dec[(length, code)] = sym
            enc[sym] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return dec, enc

# Encoder tables: canonical fixed-length (see module docstring).
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12          # 12 symbols, 4 bits each
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0] * 7 + [162] + [0] * 8         # 162 symbols, 8 bits each
_ENC_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)]
assert len(_ENC_AC_VALS) == 162


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:            # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # pad with 1-bits


class _BitReader:
    """Reads MSB-first bits from de-stuffed scan bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG scan data truncated")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _magnitude_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

_SOF_UNSUPPORTED = {
    0xC2: "progressive (SOF2)", 0xC3: "lossless (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)",
    0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline-sequential JFIF -> (H, W, 3) uint8 RGB array."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    scan = None

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker byte at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:               # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue                     # standalone
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:               # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                n = 64 * (2 if prec else 1)
                raw = seg[i:i + n]
                i += n
                vals = (np.frombuffer(raw, dtype=">u2") if prec
                        else np.frombuffer(raw, dtype=np.uint8))
                t = np.zeros((8, 8), dtype=np.int32)
                for k, (r, c) in enumerate(ZIGZAG):
                    t[r, c] = int(vals[k])
                qt[tid] = t
        elif marker == 0xC4:             # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                i += 17 + n
                huff[(cls, tid)], _ = _canonical_codes(bits, vals)
        elif marker in (0xC0, 0xC1):     # SOF0/1 (Huffman sequential)
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(
                    f"{precision}-bit JPEG unsupported (8-bit baseline only)")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"JPEG {_SOF_UNSUPPORTED[marker]} unsupported "
                "(baseline sequential only)")
        elif marker == 0xDD:             # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:             # SOS
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c:3 + 2 * c]
                scomps.append({"id": cid, "dc": tabs >> 4, "ac": tabs & 0x0F})
            if frame is not None and ns < len(frame["comps"]):
                # legal baseline, but this decoder stops after the first
                # SOS — decoding only the first component would return a
                # silently wrong image (zeroed chroma), so fail loudly
                # like progressive/arithmetic do
                raise NotImplementedError(
                    "non-interleaved multi-scan JPEG unsupported "
                    f"(scan has {ns} of {len(frame['comps'])} components)")
            # entropy-coded data runs to the next non-RST marker
            scan_start = pos
            segments = []
            cur = bytearray()
            while pos < len(data):
                b = data[pos]
                if b == 0xFF:
                    nxt = data[pos + 1] if pos + 1 < len(data) else 0xD9
                    if nxt == 0x00:
                        cur.append(0xFF)
                        pos += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:   # restart marker
                        segments.append(bytes(cur))
                        cur = bytearray()
                        pos += 2
                        continue
                    break                      # real marker ends the scan
                cur.append(b)
                pos += 1
            segments.append(bytes(cur))
            scan = {"comps": scomps, "segments": segments}
            del scan_start
            break                              # single-scan baseline
        # else: APPn/COM/unknown -> skipped via seglen

    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    return _decode_scan(frame, scan, qt, huff, restart_interval)


def _decode_scan(frame, scan, qt, huff, restart_interval) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    planes = {}
    for c in comps:
        planes[c["id"]] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)

    sc_order = [dict(sc, **by_id[sc["id"]]) for sc in scan["comps"]]
    pred = {c["id"]: 0 for c in comps}
    seg_iter = iter(scan["segments"])
    reader = _BitReader(next(seg_iter))
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            reader = _BitReader(next(seg_iter))
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcux)
        for sc in sc_order:
            dct = huff[(0, sc["dc"])]
            act = huff[(1, sc["ac"])]
            q = qt[sc["tq"]]
            for by in range(sc["v"]):
                for bx in range(sc["h"]):
                    coef = np.zeros((8, 8), dtype=np.int32)
                    t = reader.read_symbol(dct)
                    diff = _extend(reader.read_bits(t), t)
                    pred[sc["id"]] += diff
                    coef[0, 0] = pred[sc["id"]]
                    k = 1
                    while k < 64:
                        rs = reader.read_symbol(act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break          # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        rr, cc = ZIGZAG[k]
                        coef[rr, cc] = _extend(reader.read_bits(s), s)
                        k += 1
                    px = idct2((coef * q).astype(np.float64)) + 128.0
                    y0 = (my * sc["v"] + by) * 8
                    x0 = (mx * sc["h"] + bx) * 8
                    planes[sc["id"]][y0:y0 + 8, x0:x0 + 8] = px

    # upsample to full resolution and crop
    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.dstack([g, g, g])
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.dstack([r, g, b])), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _zigzag_flat(t: np.ndarray) -> bytes:
    return bytes(int(t[r, c]) for r, c in ZIGZAG)


def encode_jpeg(pixels: np.ndarray, quality: int = 85,
                subsample: str = "444",
                restart_interval: int = 0) -> bytes:
    """(H, W, 3) uint8 RGB (or (H, W) grayscale) -> baseline JFIF
    bytes.  ``subsample``: '444' or '420' (chroma box-averaged 2x2)."""
    arr = np.asarray(pixels)
    gray = arr.ndim == 2
    if gray:
        arr = arr[:, :, None]
    h, w = arr.shape[:2]
    a = arr.astype(np.float64)
    if gray:
        comps_px = [a[:, :, 0]]
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps_px = [y, cb, cr]
    if subsample not in ("444", "422", "420"):
        raise ValueError("subsample must be '444', '422' or '420'")
    if gray or subsample == "444":
        samp = [(1, 1)] * len(comps_px)
    elif subsample == "422":                   # chroma halved in x only
        samp = [(2, 1), (1, 1), (1, 1)]
    else:                                      # 420: halved in x and y
        samp = [(2, 2), (1, 1), (1, 1)]

    qlum = _scaled_quant(QUANT_LUM, quality)
    qchr = _scaled_quant(QUANT_CHROM, quality)
    quant = [qlum] + [qchr] * (len(comps_px) - 1)
    tq = [0] + [1] * (len(comps_px) - 1)

    dc_dec, dc_enc = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_dec, ac_enc = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    del dc_dec, ac_dec

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component padded planes at their own resolution
    planes = []
    for px, (sh, sv) in zip(comps_px, samp):
        if (sh, sv) != (hmax, vmax):      # chroma downsample (box mean)
            fy, fx = vmax // sv, hmax // sh
            ph = -(-px.shape[0] // fy) * fy
            pw = -(-px.shape[1] // fx) * fx
            pad = np.pad(px, ((0, ph - px.shape[0]), (0, pw - px.shape[1])),
                         mode="edge")
            px = pad.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th, tw = mcuy * sv * 8, mcux * sh * 8
        planes.append(np.pad(
            px, ((0, th - px.shape[0]), (0, tw - px.shape[1])), mode="edge"))

    bw = _BitWriter()
    pred = [0] * len(planes)
    chunks: list[bytes] = []
    n_mcu = mcux * mcuy
    rst = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            chunks.append(bytes(bw.out))
            chunks.append(bytes([0xFF, 0xD0 + rst % 8]))
            rst += 1
            bw = _BitWriter()
            pred = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci, (plane, (sh, sv)) in enumerate(zip(planes, samp)):
            for by in range(sv):
                for bx in range(sh):
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bx) * 8
                    block = plane[y0:y0 + 8, x0:x0 + 8] - 128.0
                    coef = np.round(fdct2(block) / quant[ci]).astype(int)
                    zz = [int(coef[rr, cc]) for rr, cc in ZIGZAG]
                    diff = zz[0] - pred[ci]
                    pred[ci] = zz[0]
                    t = _category(diff)
                    ln, code = dc_enc[t]
                    bw.write(code, ln)
                    if t:
                        bw.write(_magnitude_bits(diff, t), t)
                    run = 0
                    last = 0
                    for k in range(1, 64):
                        if zz[k]:
                            last = k
                    for k in range(1, last + 1):
                        v = zz[k]
                        if v == 0:
                            run += 1
                            continue
                        while run >= 16:
                            ln, code = ac_enc[0xF0]
                            bw.write(code, ln)
                            run -= 16
                        s = _category(v)
                        ln, code = ac_enc[(run << 4) | s]
                        bw.write(code, ln)
                        bw.write(_magnitude_bits(v, s), s)
                        run = 0
                    if last < 63:
                        ln, code = ac_enc[0x00]   # EOB
                        bw.write(code, ln)
    bw.flush()
    chunks.append(bytes(bw.out))
    scan_bytes = b"".join(chunks)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + _zigzag_flat(qlum))
    if len(planes) > 1:
        out += _seg(0xDB, b"\x01" + _zigzag_flat(qchr))
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, tq[ci]])
    out += _seg(0xC0, sof)
    for cls in (0, 1):
        for tid in range(2 if len(planes) > 1 else 1):
            bits = _ENC_DC_BITS if cls == 0 else _ENC_AC_BITS
            vals = _ENC_DC_VALS if cls == 0 else _ENC_AC_VALS
            out += _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits)
                        + bytes(vals))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        td = 0 if ci == 0 or len(planes) == 1 else 1
        sos += bytes([ci + 1, (td << 4) | td])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)
    out += scan_bytes
    out += b"\xff\xd9"
    return bytes(out)
