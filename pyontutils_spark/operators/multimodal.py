"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, plus decode / resize / feature-extract / frame-
sample stages as Arrow-batched ``mapInPandas`` operators.

Decode is REAL for the formats that need no external libraries:

- **PPM (P6)** and **uncompressed 24-bit BMP** images — pure byte
  parsing into ``numpy`` (height, width, 3) arrays,
- **PNG** (8-bit gray/gray+alpha/RGB/RGBA/palette, non-interlaced) —
  stdlib ``zlib`` inflate + all five scanline filters (None/Sub/Up/
  Average/Paeth) unfiltered in pure Python/numpy,
- **baseline-sequential JPEG** — pure-Python Huffman + IDCT
  (kernel/jpeg.py), stream-defined tables, 4:2:0/4:2:2/4:4:4,
  restart markers,
- **MJPEG-in-AVI video** — pure ``struct`` RIFF container parse
  (kernel/avi.py) feeding the JPEG kernel per frame
  (:func:`sample_video_frames`),
- **WAV (PCM)** audio — stdlib ``wave`` + ``numpy``.

Progressive/arithmetic JPEG, MP3, and non-MJPEG video codecs require
libraries this container doesn't ship; decoders raise a declared
``NotImplementedError`` for those — the Spark-side plumbing (schema,
partitioning, UDF signature, bounded batch shape) is identical either
way, so wiring PIL/ffmpeg later touches only the dispatch table.
"""

from __future__ import annotations

import hashlib
import io
import re
import struct
import wave
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "mime string, width int, height int, duration_ms int")

FEATURE_DIM = 16

_HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401
    _HAVE_PIL = True
except ImportError:
    pass


# ---------------------------------------------------------------------------
# pure decoders (no external libraries)
# ---------------------------------------------------------------------------

def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6)."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + \
        pixels.astype("u1").tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval<=255) -> (h, w, 3) uint8."""
    m = re.match(rb"P6\s+(?:#[^\n]*\s+)*(\d+)\s+(\d+)\s+(\d+)\s",
                 payload)
    if not m:
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxv = (int(m.group(i)) for i in (1, 2, 3))
    if maxv > 255:
        raise ValueError("16-bit PPM not supported")
    data = payload[m.end():m.end() + w * h * 3]
    if len(data) < w * h * 3:
        raise ValueError("truncated PPM payload")
    return np.frombuffer(data, dtype="u1").reshape(h, w, 3).copy()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> (h, w, 3) uint8 (RGB)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={comp})")
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    flip = h > 0
    h = abs(h)
    rows = []
    for r in range(h):
        start = off + r * stride
        row = np.frombuffer(payload[start:start + w * 3], dtype="u1")
        rows.append(row.reshape(w, 3)[:, ::-1])  # BGR -> RGB
    arr = np.stack(rows)
    return arr[::-1] if flip else arr  # bottom-up storage


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray, filters=None) -> bytes:
    """uint8 array (h, w[, channels]) -> PNG bytes.  ``filters``: per-
    row filter types to apply (cycled), default all-0 — pass
    ``[0, 1, 2, 3, 4]`` to exercise every unfilter path in tests."""
    px = np.ascontiguousarray(np.atleast_3d(pixels).astype("u1"))
    h, w, nch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    flat = px.reshape(h, w * nch).astype("i2")
    stride = w * nch
    raw = bytearray()
    prev = np.zeros(stride, dtype="i2")
    for y in range(h):
        f = filters[y % len(filters)] if filters else 0
        line = flat[y]
        left = np.concatenate([np.zeros(nch, "i2"), line[:-nch]]) \
            if stride > nch else np.zeros(stride, "i2")
        prev_left = np.concatenate([np.zeros(nch, "i2"), prev[:-nch]]) \
            if stride > nch else np.zeros(stride, "i2")
        if f == 0:
            enc = line
        elif f == 1:
            enc = line - left
        elif f == 2:
            enc = line - prev
        elif f == 3:
            enc = line - ((left + prev) >> 1)
        else:  # Paeth
            pred = np.array([_paeth(int(left[i]), int(prev[i]),
                                    int(prev_left[i]))
                             for i in range(stride)], dtype="i2")
            enc = line - pred
        raw.append(f)
        raw += (enc & 0xFF).astype("u1").tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> (h, w, 3) uint8 RGB.  Pure stdlib: zlib inflate + the 5
    scanline filters.  8-bit depth, color types 0/2/3/4/6,
    non-interlaced (Adam7 raises)."""
    if bytes(payload[:8]) != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    palette = None
    w = h = ctype = None
    n = len(payload)
    while pos + 8 <= n:
        ln = struct.unpack_from(">I", payload, pos)[0]
        typ = bytes(payload[pos + 4:pos + 8])
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8:
                raise NotImplementedError("only 8-bit PNG supported")
            if interlace:
                raise NotImplementedError("Adam7 interlace unsupported")
        elif typ == b"PLTE":
            palette = np.frombuffer(data, "u1").reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    stride = w * nch
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG scanline data")
    out = np.empty((h, stride), dtype="u1")
    prev = np.zeros(stride, dtype="u1")
    p = 0
    for y in range(h):
        f = raw[p]
        p += 1
        line = bytearray(raw[p:p + stride])
        p += stride
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                c = int(prev[i - nch]) if i >= nch else 0
                line[i] = (line[i] + _paeth(a, int(prev[i]), c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        arr = np.frombuffer(bytes(line), "u1")
        out[y] = arr
        prev = arr
    img = out.reshape(h, w, nch)
    if ctype == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        return palette[img[:, :, 0]].copy()
    if nch == 1:
        return np.repeat(img, 3, axis=2).copy()
    if nch == 2:
        return np.repeat(img[:, :, :1], 3, axis=2).copy()
    if nch == 4:
        return img[:, :, :3].copy()
    return img.copy()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV (PCM 16-bit) -> (samples int16 array [n, channels], rate)."""
    with wave.open(io.BytesIO(payload)) as wf:
        n, ch, width, rate = (wf.getnframes(), wf.getnchannels(),
                              wf.getsampwidth(), wf.getframerate())
        if width != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        raw = wf.readframes(n)
    return np.frombuffer(raw, dtype="<i2").reshape(-1, ch), rate


def decode_audio(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Magic-byte audio dispatch -> (samples [n, ch] int array, rate,
    bits_per_sample).  WAV via stdlib, FLAC via the pure-Python kernel
    (kernel/flac.py); anything else raises the declared gate."""
    head = bytes(payload[:4])
    if head == b"fLaC":
        from ..kernel.flac import decode_flac, parse_streaminfo
        data = bytes(payload)
        info = parse_streaminfo(data)
        chans, rate = decode_flac(data)
        arr = np.array(chans, dtype=np.int64).T
        return arr, rate, info["bits_per_sample"]
    if head == b"RIFF":
        samples, rate = decode_wav(payload)
        return samples, rate, 16
    raise NotImplementedError(
        "audio codec not supported (WAV and FLAC decode here; no codec "
        "library in this container for anything else)")


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch: PPM/BMP/PNG/GIF/baseline-JPEG all decode here
    with no third-party library (kernel/jpeg.py reads the stream's own
    quant/Huffman tables, handles 4:2:0/4:2:2/4:4:4 + restart markers;
    progressive/arithmetic JPEG raises a declared NotImplementedError
    unless PIL happens to be installed)."""
    b = bytes(payload[:8])
    if b.startswith(b"P6"):
        return decode_ppm(payload)
    if b.startswith(b"BM"):
        return decode_bmp(payload)
    if b.startswith(b"\x89PNG"):
        return decode_png(payload)
    if b.startswith(b"GIF8"):
        from ..kernel.gif import decode_gif
        return decode_gif(payload)
    if b.startswith(b"\xff\xd8"):
        from ..kernel.jpeg import decode_jpeg
        try:
            return decode_jpeg(payload)
        except NotImplementedError:
            if not _HAVE_PIL:
                raise
            import PIL.Image
            return np.asarray(PIL.Image.open(io.BytesIO(payload))
                              .convert("RGB"))
    raise ValueError(f"unknown image magic {b!r}")


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy indexing."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[ys][:, xs]


def image_features(arr: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic pixel features in [0,1]: per-channel mean/std plus
    a downsampled luminance grid filling the remaining dims."""
    f = np.empty(dim, dtype="float64")
    a = arr.astype("float64") / 255.0
    f[0:3] = a.mean(axis=(0, 1))
    f[3:6] = a.std(axis=(0, 1))
    rest = dim - 6
    if rest > 0:
        side = int(np.ceil(np.sqrt(rest)))
        lum = a.mean(axis=2)
        grid = resize_nearest(lum[:, :, None], side, side)[:, :, 0]
        f[6:] = grid.flatten()[:rest]
    return f


def fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic hash-expanded features — stands in for a learned
    embedding model (which no library in this container provides)."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[:dim * 4],
                        dtype="<u4").astype("float64")
    return raw / 2**32


# ---------------------------------------------------------------------------
# synthetic media (real encoded payloads)
# ---------------------------------------------------------------------------

def synth_media(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic synthetic media table.  Image payloads are REAL
    encoded bytes — PPM for even ids, baseline JPEG (kernel/jpeg.py)
    for odd ids, the corpus-realistic mix; audio payloads are real
    16-bit PCM WAVs (per-id sine) — so the decode stage exercises the
    actual byte parsers."""
    rng = spark.range(0, n, 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.jpeg import encode_jpeg
        for pdf in batches:
            ids = pdf["id"].astype("int64")
            payloads, widths, heights, durs, mimes = [], [], [], [], []
            for i in ids:
                if kind == "image":
                    w, h = int(i % 24) + 8, int(i % 16) + 8
                    yy, xx = np.mgrid[0:h, 0:w]
                    pix = np.stack([(xx * 7 + i) % 256,
                                    (yy * 11 + i * 3) % 256,
                                    (xx + yy + i * 5) % 256],
                                   axis=2).astype("u1")
                    if i % 2:
                        payloads.append(encode_jpeg(pix, quality=90))
                        mimes.append("image/jpeg")
                    else:
                        payloads.append(encode_ppm(pix))
                        mimes.append("image/x-portable-pixmap")
                    widths.append(w)
                    heights.append(h)
                    durs.append(None)
                elif kind == "video":
                    from ..kernel.avi import encode_avi_mjpeg
                    fps, n_frames = 5, 4 + int(i % 3)
                    w, h = 16, 16
                    yy, xx = np.mgrid[0:h, 0:w]
                    frames = [np.stack([(xx * 9 + i + 13 * fr) % 256,
                                        (yy * 5 + i * 2) % 256,
                                        (xx + yy + fr * 7) % 256],
                                       axis=2).astype("u1")
                              for fr in range(n_frames)]
                    payloads.append(encode_avi_mjpeg(frames, fps=fps))
                    widths.append(w)
                    heights.append(h)
                    durs.append(int(n_frames * 1000 / fps))
                    mimes.append("video/x-msvideo")
                else:  # audio
                    rate, n_samp = 8000, 800
                    t = np.arange(n_samp)
                    freq = 100 + (int(i) % 20) * 10
                    samples = (np.sin(2 * np.pi * freq * t / rate)
                               * 20000).astype("<i2")
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as wf:
                        wf.setnchannels(1)
                        wf.setsampwidth(2)
                        wf.setframerate(rate)
                        wf.writeframes(samples.tobytes())
                    payloads.append(buf.getvalue())
                    widths.append(None)
                    heights.append(None)
                    durs.append(int(n_samp * 1000 / rate))
                    mimes.append("audio/wav")
            yield pd.DataFrame({
                "media_id": ids,
                "kind": kind,
                "payload": payloads,
                "mime": mimes,
                "width": pd.array(widths, dtype="Int32"),
                "height": pd.array(heights, dtype="Int32"),
                "duration_ms": pd.array(durs, dtype="Int32"),
            })

    return rng.mapInPandas(gen, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------

def extract_features(media: DataFrame, dim: int = FEATURE_DIM,
                     batch_limit: int = 1024,
                     decoder: str = "image") -> DataFrame:
    """media -> (media_id, features array<double>) via mapInPandas.

    ``decoder``: 'image' (real PPM/BMP pixel features), 'audio' (real
    WAV spectral-free stats), or 'hash' (format-agnostic fake).  The
    Arrow batch iterator shape is the production plumbing: payload
    bytes never land in a Python list-of-rows, and each yielded batch
    is bounded so executor memory stays flat regardless of payload
    size."""
    src = media.select("media_id", "payload")

    def one(payload: bytes) -> np.ndarray:
        if decoder == "image":
            return image_features(decode_image(payload), dim)
        if decoder == "audio":
            samples, rate, bits = decode_audio(payload)
            x = samples.astype("float64") / float(1 << (bits - 1))
            f = np.zeros(dim)
            f[0] = x.mean()
            f[1] = x.std()
            f[2] = np.abs(np.diff(np.signbit(x[:, 0]))).mean()  # zcr
            f[3] = rate / 48000.0
            return f
        return fake_decode(payload, dim)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[lo:lo + batch_limit]
                arr = [one(bytes(p)) for p in chunk["payload"]]
                yield pd.DataFrame({
                    "media_id": chunk["media_id"].to_numpy(),
                    "features": [a.tolist() for a in arr],
                })

    return src.mapInPandas(
        feats, schema="media_id long, features array<double>")


def resize_images(media: DataFrame, out_w: int, out_h: int,
                  batch_limit: int = 256) -> DataFrame:
    """media -> (media_id, payload) with every image re-encoded as a
    PPM of (out_w, out_h) — the resize stage as a real operator."""
    src = media.select("media_id", "payload")

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[lo:lo + batch_limit]
                out = [encode_ppm(resize_nearest(
                    decode_image(bytes(p)), out_w, out_h))
                    for p in chunk["payload"]]
                yield pd.DataFrame({
                    "media_id": chunk["media_id"].to_numpy(),
                    "payload": out,
                })

    return src.mapInPandas(rs, schema="media_id long, payload binary")


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_ts_ms) rows derived
    from duration metadata — pure column expressions, no payload
    decode (use :func:`sample_video_frames` for the real decode)."""
    return (media.filter(F.col("duration_ms").isNotNull())
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0), F.col("duration_ms"),
                        F.lit(every_ms))).alias("frame_ts_ms")))


def sample_video_frames(media: DataFrame, every_ms: int = 1000,
                        dim: int = FEATURE_DIM,
                        batch_limit: int = 64) -> DataFrame:
    """REAL video frame-sample + decode + feature-extract: MJPEG-AVI
    payloads (kernel/avi.py container parse + kernel/jpeg.py frame
    decode — no external library) -> one row per sampled frame
    ``(media_id, frame_ts_ms, frame_idx, features array<double>)``,
    Arrow-batched with a bounded inner batch so executor memory stays
    flat regardless of video size.  Non-MJPEG codecs raise the
    declared NotImplementedError from the kernel."""
    from ..kernel.avi import decode_video_frames
    src = media.select("media_id", "payload")

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[lo:lo + batch_limit]
                out = {"media_id": [], "frame_ts_ms": [],
                       "frame_idx": [], "features": []}
                for mid, payload in zip(chunk["media_id"],
                                        chunk["payload"]):
                    for ts, idx, arr in decode_video_frames(
                            bytes(payload), every_ms):
                        out["media_id"].append(int(mid))
                        out["frame_ts_ms"].append(int(ts))
                        out["frame_idx"].append(idx)
                        out["features"].append(
                            image_features(arr, dim).tolist())
                yield pd.DataFrame(out)

    return src.mapInPandas(
        frames, schema="media_id long, frame_ts_ms long, "
                       "frame_idx int, features array<double>")
