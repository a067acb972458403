"""Real (codec-free) media decode: uncompressed BMP via pure numpy and
PCM WAV via stdlib wave — the decode branch of the multimodal plumbing
is no longer stub-only; compressed formats still raise the documented
NotImplementedError."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest


def make_bmp(rgb: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bpp bottom-up BMP writer (test fixture)."""
    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    bgr = rgb[:, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    pix = rows[::-1].tobytes()  # bottom-up
    off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                            2835, 2835, 0, 0))
    return header + pix


def make_wav(sig: np.ndarray, rate: int = 8000, nch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(sig, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, mod, bytearray(payload), "application/octet-stream", {})
         for i, (mod, payload) in enumerate(rows)],
        "media_id long, modality string, payload binary, mime string, "
        "meta map<string,string>")


def test_bmp_decode_dims_and_features(spark):
    from kwage_spark.operators.multimodal import decode_and_featurize
    rgb = np.zeros((5, 7, 3), dtype=np.uint8)
    rgb[:, :, 0] = 200        # red-dominant constant image
    rgb[0, 0] = [1, 2, 3]
    media = _media(spark, [("image", make_bmp(rgb))])
    row = decode_and_featurize(media).collect()[0]
    assert (row["width"], row["height"]) == (7, 5)
    # feature 0..2 = mean RGB / 255 — red-dominant
    f = row["features"]
    assert f[0] > 0.7 and f[1] < 0.05 and f[2] < 0.05
    assert abs(f[0] - rgb[:, :, 0].mean() / 255.0) < 1e-5


def test_wav_decode_rate_duration_rms(spark):
    from kwage_spark.operators.multimodal import decode_and_featurize
    t = np.arange(8000) / 8000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)        # 1 s of A440 at half amp
    media = _media(spark, [("audio", make_wav(sig, rate=8000))])
    row = decode_and_featurize(media).collect()[0]
    assert (row["width"], row["height"]) == (8000, 1)  # rate, channels
    f = row["features"]
    assert abs(f[0] - 1.0) < 1e-3                     # duration
    assert abs(f[1] - 0.5 / np.sqrt(2)) < 1e-2        # RMS of a sine
    # stereo downmix keeps the rate and reports 2 channels
    inter = np.empty(sig.size * 2)
    inter[0::2] = sig
    inter[1::2] = sig
    media2 = _media(spark, [("audio", make_wav(inter, rate=8000, nch=2))])
    row2 = decode_and_featurize(media2).collect()[0]
    assert (row2["width"], row2["height"]) == (8000, 2)
    assert abs(row2["features"][1] - f[1]) < 1e-3


def test_resize_nearest_neighbor_exact(spark):
    from kwage_spark.operators.multimodal import resize_images
    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    rgb[:2, :2] = [255, 0, 0]
    rgb[2:, 2:] = [0, 0, 255]
    media = _media(spark, [("image", make_bmp(rgb))])
    row = resize_images(media, out_w=2, out_h=2).collect()[0]
    small = np.frombuffer(bytes(row["rgb"]), dtype=np.uint8).reshape(2, 2, 3)
    assert (small[0, 0] == [255, 0, 0]).all()
    assert (small[1, 1] == [0, 0, 255]).all()
    assert (small[0, 1] == [0, 0, 0]).all()


def test_compressed_formats_still_raise(spark):
    from kwage_spark.operators.multimodal import decode_and_featurize
    png_magic = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64
    media = _media(spark, [("image", png_magic)])
    with pytest.raises(Exception, match="PIL|codec|ffmpeg|compressed"):
        decode_and_featurize(media).collect()


def test_fake_path_unchanged(spark):
    """The deterministic stub (backing the SQL-checked driver queries)
    must stay byte-for-byte: dims/features are payload arithmetic."""
    from kwage_spark.operators.multimodal import decode_and_featurize
    payload = bytes(range(2, 130))
    media = _media(spark, [("image", payload)])
    row = decode_and_featurize(media, fake=True).collect()[0]
    assert (row["width"], row["height"]) == (payload[0] + 1, payload[1] + 1)
    want = [sum(payload[j * 4:j * 4 + 4]) / 255.0 for j in range(16)]
    assert np.allclose(row["features"], np.float32(want))
