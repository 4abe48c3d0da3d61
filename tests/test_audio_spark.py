"""Audio dispatch (WAV + FLAC) through the Arrow feature stage."""

import io
import math
import wave

import pytest

from pyontutils_spark.kernel.flac import encode_flac


def _sine(n, freq, rate, amp=12000):
    return [int(amp * math.sin(2 * math.pi * freq * i / rate))
            for i in range(n)]


def _wav_bytes(samples, rate):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        frames = b"".join(int(s).to_bytes(2, "little", signed=True)
                          for s in samples)
        wf.writeframes(frames)
    return buf.getvalue()


def test_decode_audio_dispatch():
    from pyontutils_spark.operators.multimodal import decode_audio
    samples = _sine(2000, 220, 8000)
    wav_arr, wav_rate, wav_bits = decode_audio(_wav_bytes(samples, 8000))
    flac_arr, flac_rate, flac_bits = decode_audio(
        encode_flac([samples], 8000))
    assert wav_rate == flac_rate == 8000
    assert wav_bits == flac_bits == 16
    assert wav_arr.shape == flac_arr.shape == (2000, 1)
    assert (wav_arr[:, 0] == flac_arr[:, 0]).all()   # same PCM both ways
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04mp3-payload")


def test_media_features_same_for_wav_and_flac(spark):
    from pyontutils_spark.operators.multimodal import extract_features
    samples = _sine(4000, 440, 16000)
    media = spark.createDataFrame(
        [(1, _wav_bytes(samples, 16000)),
         (2, encode_flac([samples], 16000))],
        "media_id long, payload binary")
    feats = {r["media_id"]: r["features"]
             for r in extract_features(media, decoder="audio").collect()}
    assert len(feats) == 2
    # identical PCM -> identical features, independent of container
    assert feats[1] == pytest.approx(feats[2], abs=1e-12)
    assert feats[1][3] == pytest.approx(16000 / 48000.0)
