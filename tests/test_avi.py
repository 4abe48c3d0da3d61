"""MJPEG-AVI container codec (kernel/avi.py) + the real video
frame-sample Spark stage."""

import numpy as np
import pytest

from pyontutils_spark.kernel.avi import (
    decode_video_frames, encode_avi_mjpeg, parse_avi_mjpeg)


def _frames(n, h=16, w=16):
    out = []
    yy, xx = np.mgrid[0:h, 0:w]
    for fr in range(n):
        out.append(np.stack([(xx * 9 + 13 * fr) % 256,
                             (yy * 5) % 256,
                             (xx + yy + fr * 7) % 256],
                            axis=2).astype("u1"))
    return out


def test_avi_roundtrip_metadata_and_frames():
    frames = _frames(5)
    payload = encode_avi_mjpeg(frames, fps=5, quality=95)
    meta = parse_avi_mjpeg(payload)
    assert (meta["width"], meta["height"]) == (16, 16)
    assert meta["fps"] == 5.0 and meta["n_frames"] == 5
    # every frame is a complete JPEG that decodes close to the source
    from pyontutils_spark.kernel.jpeg import decode_jpeg
    for src, j in zip(frames, meta["frames"]):
        assert j[:2] == b"\xff\xd8"
        got = decode_jpeg(j)
        assert np.abs(got.astype(int) - src.astype(int)).mean() < 6


def test_frame_sampling_intervals():
    payload = encode_avi_mjpeg(_frames(10), fps=5)   # 2000 ms long
    out = decode_video_frames(payload, every_ms=500)
    assert [(ts, idx) for ts, idx, _ in out] == [
        (0, 0), (500, 2), (1000, 5), (1500, 7)]
    assert all(a.shape == (16, 16, 3) for _, _, a in out)
    # dense sampling never emits a frame twice
    dense = decode_video_frames(payload, every_ms=100)
    idxs = [i for _, i, _ in dense]
    assert idxs == sorted(set(idxs)) == list(range(10))


def test_non_mjpg_codec_rejected():
    payload = bytearray(encode_avi_mjpeg(_frames(2), fps=5))
    i = payload.index(b"vidsMJPG")
    payload[i + 4:i + 8] = b"H264"
    with pytest.raises(NotImplementedError, match="MJPG only"):
        parse_avi_mjpeg(bytes(payload))
    with pytest.raises(ValueError, match="RIFF"):
        parse_avi_mjpeg(b"NOTANAVI")


def test_sample_video_frames_spark_stage(spark):
    from pyontutils_spark.operators.multimodal import (
        sample_video_frames, synth_media)
    media = synth_media(spark, 6, kind="video")
    rows = media.collect()
    assert all(r.mime == "video/x-msvideo" for r in rows)
    out = sample_video_frames(media, every_ms=400).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
        assert len(r.features) == 16
        assert all(0.0 <= x <= 1.0 for x in r.features)
    assert set(by_id) == set(range(6))
    # frame 0 always sampled; sampled count tracks duration
    for mid, rs in by_id.items():
        assert min(r.frame_ts_ms for r in rs) == 0
        assert len(rs) >= 2


def test_avi_without_video_stream_rejected():
    """An AVI whose only stream is audio must raise 'no video stream'
    (frame chunks from unknown streams are ignored, not mis-decoded)."""
    import struct
    from pyontutils_spark.kernel.avi import _chunk, _list
    avih = struct.pack("<14I", 200000, 0, 0, 0, 0, 0, 1, 0, 0, 0,
                       0, 0, 0, 0)
    strh = (b"auds" + b"\x00\x00\x00\x00"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 8000, 0, 0,
                          0, 0xFFFFFFFF, 0)
            + struct.pack("<4h", 0, 0, 0, 0))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)))
    movi = _list(b"movi", _chunk(b"00wb", b"\x00\x01"))
    body = b"AVI " + hdrl + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="no video stream"):
        parse_avi_mjpeg(payload)
