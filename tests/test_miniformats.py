"""Vendored BMP/WAV codec units + the real-codec Spark path they
unlock (no skips: these run in the codec-less container)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from shards_prometheus_spark.functions import miniformats as mf


def test_bmp_roundtrip_exact():
    rng = np.random.RandomState(7)
    w, h = 13, 9  # odd width → nonzero row padding exercised
    rgb = rng.randint(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    data = mf.bmp_encode(rgb, w, h)
    w2, h2, rgb2 = mf.bmp_decode(data)
    assert (w2, h2) == (w, h)
    assert rgb2 == rgb


def test_bmp_decode_rejects_non_bmp():
    with pytest.raises(ValueError):
        mf.bmp_decode(b"not a bitmap at all")
    with pytest.raises(ValueError):
        mf.bmp_decode(b"BM" + b"\x00" * 20)  # truncated headers


def test_bmp_encode_rejects_bad_length():
    with pytest.raises(ValueError):
        mf.bmp_encode(b"\x00" * 10, 4, 4)


def test_thumbnail_dims_matches_pil_convention():
    assert mf.thumbnail_dims(16, 12, 64) == (16, 12)  # no upscale
    assert mf.thumbnail_dims(128, 96, 64) == (64, 48)
    assert mf.thumbnail_dims(96, 128, 64) == (48, 64)
    assert mf.thumbnail_dims(1000, 3, 64) == (64, 1)  # floor at 1


def test_downsample_identity_and_shape():
    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, size=8 * 6 * 3, dtype=np.uint8).tobytes()
    assert mf.downsample_rgb(rgb, 8, 6, 8, 6) == rgb
    small = mf.downsample_rgb(rgb, 8, 6, 4, 3)
    assert len(small) == 4 * 3 * 3
    # nearest-neighbor: output pixel (0,0) is input pixel (0,0)
    assert small[:3] == rgb[:3]


def test_wav_roundtrip_pcm16():
    t = np.arange(800) / 16_000.0
    samples = 0.5 * np.sin(2 * np.pi * 440 * t)
    data = mf.wav_encode(samples, 16_000)
    out, sr = mf.wav_decode(data)
    assert sr == 16_000
    assert out.shape == samples.shape
    # PCM-16 quantization error bound: 1/32768 per sample
    assert np.abs(out - samples).max() <= 1.0 / 32768.0


def test_wav_decode_rejects_non_wav():
    with pytest.raises(ValueError):
        mf.wav_decode(b"RIFFgarbage")
    with pytest.raises(ValueError):
        mf.wav_decode(b"plain text bytes")


def test_real_image_decode_no_pil(spark):
    """The REAL decode branch runs in this container via the vendored
    BMP codec: container parse, row un-flip, BGR swap, and an actual
    downsample (128×96 → 64×48) — asserted against numpy."""
    from shards_prometheus_spark.operators import multimodal as mm

    rng = np.random.RandomState(3)
    w, h = 128, 96
    rgb = rng.randint(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    media = spark.createDataFrame(
        [(0, "image", mf.bmp_encode(rgb, w, h), w, h, "bmp")],
        mm.MEDIA_SCHEMA,
    )
    row = mm.decode_stats(media, real_codec=True).collect()[0]
    assert (row["thumb_w"], row["thumb_h"]) == (64, 48)
    if mm._HAVE_PIL:  # pragma: no cover - PIL absent in this container
        from io import BytesIO

        from PIL import Image

        img = Image.open(BytesIO(mf.bmp_encode(rgb, w, h))).convert("RGB")
        img.thumbnail((64, 64))
        expect = hashlib.md5(img.tobytes()).hexdigest()
    else:
        expect = hashlib.md5(
            mf.downsample_rgb(rgb, w, h, 64, 48)
        ).hexdigest()
    assert row["checksum"] == expect
    # either codec path: a corrupt payload must fall back, not raise
    bad = spark.createDataFrame(
        [(1, "image", b"\x01\x02\x03", 10, 10, "bmp")], mm.MEDIA_SCHEMA
    )
    fb = mm.decode_stats(bad, real_codec=True).collect()[0]
    assert fb["checksum"] == hashlib.md5(b"\x01\x02\x03").hexdigest()


def test_real_audio_decode_no_soundfile(spark):
    """audio_features(real_codec=True) decodes an actual PCM WAV via
    the vendored reader; stats match numpy over the true waveform."""
    from shards_prometheus_spark.operators import multimodal as mm

    t = np.arange(1600) / 16_000.0
    samples = 0.25 * np.sin(2 * np.pi * 220 * t)
    payload = mf.wav_encode(samples, 16_000)
    media = spark.createDataFrame(
        [(0, "audio", payload, 0, 0, "wav")], mm.MEDIA_SCHEMA
    )
    row = mm.audio_features(media, real_codec=True).collect()[0]
    decoded, _ = mf.wav_decode(payload)
    assert row["n_bytes"] == len(payload)
    assert row["mean_byte"] == pytest.approx(decoded.mean(), abs=1e-12)
    assert row["rms_byte"] == pytest.approx(
        float(np.sqrt((decoded * decoded).mean())), abs=1e-12
    )
