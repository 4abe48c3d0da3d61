"""GIF87a/89a codec — pure stdlib + numpy, no image library.

Beyond-reference capability (the reference engine has no codecs): GIF
is the third-most-common image format in web corpora after JPEG/PNG,
so the multimodal decode family (`operators/multimodal.decode_image`)
needs it to featurize a realistic crawl.  Same design rules as
kernel/jpeg.py and kernel/avi.py: every table is read from the stream
itself, unsupported constructs raise loudly, and the encoder exists so
tests can round-trip real payloads without fixtures.

Decoder: full variable-width LZW (deferred-clear tolerant), global and
local color tables, interlaced images, 89a extensions (Graphic Control
incl. transparency + disposal methods 0-3, comment/app/plain-text
skipped), multi-frame animations composited on the logical screen.
Encoder: single- or multi-frame, real LZW compression, palette built
from the image (<=256 unique colors required — callers quantize first).
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    pass


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

def lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW -> list of palette indices.

    Variable code width starting at min_code_size+1, growing after the
    dictionary reaches 2**width, capped at 12 bits (dictionary frozen
    at 4096 until a clear code).  Tolerates streams that end without an
    explicit end-of-information code (common in the wild).
    """
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    # bit reader: GIF packs codes LSB-first
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                return out
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            if code >= len(table):
                raise GifError(f"gif: first LZW code {code} out of table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise GifError(f"gif: LZW code {code} beyond table "
                           f"{len(table)}")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1


def lzw_encode(indices: "np.ndarray | list[int]",
               min_code_size: int) -> bytes:
    """Real GIF LZW compression (dict rebuilt on clear at 4096)."""
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    cur = b""
    for i in (int(x) for x in indices):
        nxt = cur + bytes([i])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        if next_code < 4096:
            table[nxt] = next_code
            # GIF encoders grow the width when the NEXT code would not
            # fit; decoder mirrors this (grow at len(table)==2**width)
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear)
            table = {bytes([b]): b for b in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        cur = bytes([i])
    if cur:
        emit(table[cur])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container parse
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _read_subblocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(buf):
            raise GifError("gif: truncated sub-block stream")
        n = buf[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(buf[pos:pos + n])
        if len(chunks[-1]) != n:
            raise GifError("gif: truncated sub-block")
        pos += n


def parse_gif(payload: bytes) -> dict:
    """Parse the container -> dict with logical-screen metadata and a
    ``frames`` list of per-frame dicts (index array, palette, position,
    transparency, delay, disposal) — no compositing, raw stream truth.
    """
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError(f"gif: bad magic {payload[:6]!r}")
    version = payload[3:6].decode()
    w, h, packed, bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(n, 3).copy()
        pos += 3 * n
    frames: list[dict] = []
    gce: dict | None = None
    while True:
        if pos >= len(payload):
            raise GifError("gif: missing trailer")
        b = payload[pos]
        pos += 1
        if b == 0x3B:                                   # trailer
            break
        if b == 0x21:                                   # extension
            label = payload[pos]
            pos += 1
            data, pos = _read_subblocks(payload, pos)
            if label == 0xF9:                           # graphic control
                p, delay, tidx = struct.unpack("<BHB", data[:4])
                gce = {"disposal": (p >> 2) & 0x07,
                       "delay_ms": delay * 10,
                       "transparent": tidx if (p & 0x01) else None}
            # 0xFE comment / 0xFF application / 0x01 plain text: skipped
            continue
        if b == 0x2C:                                   # image descriptor
            left, top, iw, ih, ipacked = struct.unpack(
                "<HHHHB", payload[pos:pos + 9])
            pos += 9
            lct = None
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                lct = np.frombuffer(payload[pos:pos + 3 * n],
                                    dtype=np.uint8).reshape(n, 3).copy()
                pos += 3 * n
            min_code = payload[pos]
            pos += 1
            lzw, pos = _read_subblocks(payload, pos)
            idx = np.array(lzw_decode(lzw, min_code), dtype=np.uint16)
            if len(idx) < iw * ih:
                raise GifError(
                    f"gif: frame decode short: {len(idx)} < {iw * ih}")
            idx = idx[:iw * ih].reshape(ih, iw)
            if ipacked & 0x40:                          # interlaced
                de = np.empty_like(idx)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    rows = range(start, ih, step)
                    for r in rows:
                        de[r] = idx[src]
                        src += 1
                idx = de
            pal = lct if lct is not None else gct
            if pal is None:
                raise GifError("gif: frame has no color table")
            if idx.max(initial=0) >= len(pal):
                raise GifError("gif: palette index out of range")
            frames.append({"indices": idx.astype(np.uint8),
                           "palette": pal,
                           "left": left, "top": top,
                           "delay_ms": gce["delay_ms"] if gce else 0,
                           "transparent": (gce or {}).get("transparent"),
                           "disposal": (gce or {}).get("disposal", 0)})
            gce = None
            continue
        raise GifError(f"gif: unknown block 0x{b:02x} at {pos - 1}")
    if not frames:
        raise GifError("gif: no image data")
    return {"version": version, "width": w, "height": h,
            "background": bg, "gct": gct, "frames": frames}


def decode_gif_frames(payload: bytes) -> tuple[list[np.ndarray],
                                               list[int]]:
    """Full animation -> (RGB uint8 [h,w,3] frames composited on the
    logical screen, per-frame delays in ms).  Disposal methods: 0/1
    leave, 2 restore-to-background, 3 restore-to-previous."""
    g = parse_gif(payload)
    w, h = g["width"], g["height"]
    if g["gct"] is not None:
        canvas = np.broadcast_to(
            g["gct"][g["background"] % len(g["gct"])], (h, w, 3)).copy()
    else:
        canvas = np.zeros((h, w, 3), dtype=np.uint8)
    bg = canvas[0, 0].copy()
    out: list[np.ndarray] = []
    delays: list[int] = []
    for f in g["frames"]:
        idx, pal = f["indices"], f["palette"]
        fh, fw = idx.shape
        t, l = f["top"], f["left"]
        if t + fh > h or l + fw > w:
            raise GifError("gif: frame exceeds logical screen")
        before = canvas[t:t + fh, l:l + fw].copy()
        rgb = pal[idx]
        if f["transparent"] is not None:
            mask = (idx == f["transparent"])[:, :, None]
            rgb = np.where(mask, before, rgb)
        canvas[t:t + fh, l:l + fw] = rgb
        out.append(canvas.copy())
        delays.append(f["delay_ms"])
        if f["disposal"] == 2:
            canvas[t:t + fh, l:l + fw] = bg
        elif f["disposal"] == 3:
            canvas[t:t + fh, l:l + fw] = before
    return out, delays


def decode_gif(payload: bytes) -> np.ndarray:
    """First composited frame -> RGB uint8 [h, w, 3] (the still-image
    view used by decode_image)."""
    return decode_gif_frames(payload)[0][0]


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def quantize_median_cut(pixels: np.ndarray,
                        n_colors: int = 256) -> np.ndarray:
    """Median-cut palette quantization: RGB uint8 [h, w, 3] -> same
    shape with at most ``n_colors`` distinct colors (each pixel mapped
    to its box's mean color).  Deterministic — boxes split on the
    widest channel at the median, largest box first — so encode_gif
    output is stable across runs."""
    flat = pixels.reshape(-1, 3).astype(np.int32)
    uniq, inv, counts = np.unique(flat, axis=0, return_inverse=True,
                                  return_counts=True)
    if len(uniq) <= n_colors:
        return pixels.copy()
    boxes = [np.arange(len(uniq))]
    while len(boxes) < n_colors:
        # split the box holding the most pixels that is still splittable
        order = sorted(range(len(boxes)),
                       key=lambda i: -counts[boxes[i]].sum())
        for bi in order:
            box = boxes[bi]
            if len(box) > 1:
                break
        else:
            break
        colors = uniq[box]
        ch = int(np.argmax(colors.max(axis=0) - colors.min(axis=0)))
        srt = box[np.argsort(colors[:, ch], kind="stable")]
        # weighted median: split where half the pixel mass falls
        cum = np.cumsum(counts[srt])
        cut = int(np.searchsorted(cum, cum[-1] / 2)) + 1
        cut = min(max(cut, 1), len(srt) - 1)
        boxes[bi] = srt[:cut]
        boxes.append(srt[cut:])
    # map every unique color to its box's weighted mean
    pal_of_uniq = np.empty((len(uniq), 3), dtype=np.uint8)
    for box in boxes:
        wsum = (uniq[box] * counts[box][:, None]).sum(axis=0)
        pal_of_uniq[box] = np.clip(
            np.round(wsum / counts[box].sum()), 0, 255).astype(np.uint8)
    return pal_of_uniq[inv].reshape(pixels.shape)

def _palettize(pixels: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    flat = pixels.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise GifError(f"gif: {len(pal)} unique colors > 256 — "
                       "quantize before encoding")
    return pal.astype(np.uint8), inv.reshape(pixels.shape[:2])


def encode_gif(frames: "np.ndarray | list[np.ndarray]",
               delays_ms: "list[int] | int" = 100,
               interlace: bool = False) -> bytes:
    """RGB uint8 frame(s) (same shape, <=256 unique colors across all)
    -> GIF89a bytes.  Single array = still image; list = animation with
    a shared global color table."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if isinstance(delays_ms, int):
        delays_ms = [delays_ms] * len(frames)
    h, w = frames[0].shape[:2]
    stacked = np.concatenate([f.reshape(-1, 3) for f in frames])
    pal, _ = _palettize(stacked.reshape(-1, 1, 3))
    pal_bits = max(1, int(np.ceil(np.log2(max(len(pal), 2)))))
    table = np.zeros((1 << pal_bits, 3), dtype=np.uint8)
    table[:len(pal)] = pal
    # np.unique(axis=0) sorts rows lexicographically, so the packed
    # 24-bit keys are ascending and searchsorted is an exact lookup
    palkey = ((pal[:, 0].astype(np.int64) << 16)
              | (pal[:, 1].astype(np.int64) << 8)
              | pal[:, 2].astype(np.int64))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += table.tobytes()
    min_code = max(2, pal_bits)
    for f, delay in zip(frames, delays_ms):
        if f.shape[:2] != (h, w):
            raise GifError("gif: all frames must share one shape")
        out += b"\x21\xf9" + struct.pack("<BBHBB", 4, 0, delay // 10,
                                         0, 0)
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                     0x40 if interlace else 0)
        fkey = ((f[:, :, 0].astype(np.int64) << 16)
                | (f[:, :, 1].astype(np.int64) << 8)
                | f[:, :, 2].astype(np.int64))
        idx = np.searchsorted(palkey, fkey).astype(np.uint8)
        if interlace:
            order = [r for start, step in _INTERLACE_PASSES
                     for r in range(start, h, step)]
            idx = idx[order]
        out.append(min_code)
        lzw = lzw_encode(idx.reshape(-1), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
