"""MJPEG-in-AVI video container — pure ``struct`` byte parsing.

Together with the baseline JPEG codec (``kernel/jpeg.py``) this gives
the multimodal stage a REAL video decode path with no external
library: an AVI file is a RIFF tree (public Microsoft container spec)
whose ``movi`` LIST holds one ``NNdc`` chunk per compressed frame; for
the MJPG handler each chunk is a complete JPEG image.

Scope (declared, like every media gate in this engine):
- handler: MJPG video streams; other codecs (DIB/H264/...) raise
  ``NotImplementedError``
- frames must carry their own Huffman tables — "AVI1" MJPEG frames
  that omit DHT and rely on the de-facto default tables are rejected
  with a clear error instead of a confusing Huffman failure
- single video stream; audio streams are skipped

``encode_avi_mjpeg`` writes a spec-valid file (avih + strh/strf +
movi + idx1) so tests and ``synth_media`` roundtrip real container
bytes.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", list_type + data)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 85) -> bytes:
    """Same-size (H, W, 3) uint8 frames -> MJPEG AVI bytes."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]

    usec = int(round(1_000_000 / fps))
    avih = struct.pack("<14I", usec, 0, 0, 0x10, len(jpegs), 0,
                       1, 0, w, h, 0, 0, 0, 0)  # 0x10 = AVIF_HASINDEX
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                          1, fps,              # dwScale, dwRate
                          0, len(jpegs),       # dwStart, dwLength
                          max(len(j) for j in jpegs), 0xFFFFFFFF, 0)
            + struct.pack("<4h", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_chunks = []
    idx = []
    offset = 4                       # relative to 'movi' fourcc
    for j in jpegs:
        movi_chunks.append(_chunk(b"00dc", j))
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, offset, len(j)))
        offset += 8 + len(j) + (len(j) % 2)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)


def parse_avi_mjpeg(payload: bytes) -> dict:
    """AVI bytes -> {'width', 'height', 'fps', 'n_frames',
    'frames': [jpeg bytes, ...]} for the (single) MJPG video stream."""
    data = bytes(payload)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI magic)")
    meta = {"fps": None, "width": None, "height": None}
    frames: list[bytes] = []
    video_stream: int | None = None
    stream_no = 0

    def walk(pos: int, end: int):
        nonlocal stream_no, video_stream
        for fourcc, dpos, size in _walk_chunks(data, pos, end):
            if fourcc == b"LIST":
                walk(dpos + 4, dpos + size)
            elif fourcc == b"avih":
                vals = struct.unpack("<14I", data[dpos:dpos + 56])
                meta["width"], meta["height"] = vals[8], vals[9]
                if vals[0]:
                    meta["fps"] = round(1_000_000 / vals[0], 3)
            elif fourcc == b"strh":
                fcc_type = data[dpos:dpos + 4]
                handler = data[dpos + 4:dpos + 8]
                if fcc_type == b"vids":
                    if handler not in (b"MJPG", b"mjpg"):
                        raise NotImplementedError(
                            f"AVI video codec {handler!r} unsupported "
                            "(MJPG only)")
                    video_stream = stream_no
                    scale, rate = struct.unpack(
                        "<II", data[dpos + 20:dpos + 28])
                    if scale:
                        meta["fps"] = round(rate / scale, 3)
                stream_no += 1
            elif len(fourcc) == 4 and fourcc[2:4] in (b"dc", b"db"):
                try:
                    sn = int(fourcc[:2].decode("ascii"))
                except (ValueError, UnicodeDecodeError):
                    continue
                if video_stream is not None and sn == video_stream:
                    frames.append(data[dpos:dpos + size])

    walk(12, 8 + struct.unpack("<I", data[4:8])[0])
    if video_stream is None:
        raise ValueError("AVI has no video stream")
    for f in frames[:1]:             # spot-check table presence once
        if f[:2] == b"\xff\xd8" and b"\xff\xc4" not in f:
            raise NotImplementedError(
                "AVI1-style MJPEG frame carries no Huffman tables "
                "(decoding with the de-facto default tables is "
                "unsupported)")
    meta["n_frames"] = len(frames)
    meta["frames"] = frames
    return meta


def decode_video_frames(payload: bytes,
                        every_ms: int = 1000) -> list[tuple]:
    """Frame-sample + decode: AVI bytes -> [(ts_ms, frame_idx,
    (H, W, 3) uint8 array)] at ``every_ms`` intervals (always includes
    frame 0; a frame is never emitted twice)."""
    meta = parse_avi_mjpeg(payload)
    fps = meta["fps"] or 10.0
    n = meta["n_frames"]
    out = []
    seen = set()
    t = 0
    duration_ms = n * 1000.0 / fps
    while t < duration_ms:
        idx = min(int(t * fps / 1000.0), n - 1)
        if idx not in seen:
            seen.add(idx)
            out.append((t, idx, decode_jpeg(meta["frames"][idx])))
        t += every_ms
    return out
