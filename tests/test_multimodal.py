"""Multimodal plumbing tests: schema, Arrow batch shape, determinism.

The decode kernel is a deterministic fake (no codec libs in this
container) — what's under test is the real Spark-side contract:
mapInPandas signatures, schemas, partitioning, output columns.
"""

from __future__ import annotations

import hashlib

from shards_prometheus_spark.operators.multimodal import (
    DECODE_STATS_SCHEMA,
    FRAME_SCHEMA,
    decode_stats,
    frame_sample,
    media_repartition,
    synth_media,
)


def test_decode_stats_contract(spark):
    media = synth_media(spark, 32)
    out = decode_stats(media_repartition(media, target_bytes=1 << 10))
    assert out.schema == DECODE_STATS_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 32
    # deterministic: checksum equals md5 of the payload we generated
    seed = hashlib.md5(b"media-3").digest()
    payload = seed * (8 + 3 % 5)
    assert rows[3]["checksum"] == hashlib.md5(payload).hexdigest()
    assert rows[3]["n_bytes"] == len(payload)
    assert 1 <= rows[3]["thumb_w"] <= 64
    assert 1 <= rows[3]["thumb_h"] <= 64


def test_decode_stats_deterministic_across_runs(spark):
    media = synth_media(spark, 16)
    a = sorted(tuple(r) for r in decode_stats(media).collect())
    b = sorted(tuple(r) for r in decode_stats(media).collect())
    assert a == b


def test_frame_sample_only_video(spark):
    media = synth_media(spark, 30)
    frames = frame_sample(media)
    assert frames.schema == FRAME_SCHEMA
    got = frames.collect()
    assert got, "expected sampled frames for video rows"
    video_ids = {
        r["media_id"] for r in media.filter("kind = 'video'").collect()
    }
    assert {r["media_id"] for r in got} <= video_ids
    assert all(len(r["frame_checksum"]) == 32 for r in got)


def test_real_codec_gate_dispatch():
    """The codec gate is wired, not aspirational: each gate flag must
    agree with whether its library actually imports — the two libs are
    independent deps, so each is checked on its own."""
    from shards_prometheus_spark.operators import multimodal as mm

    def importable(name: str) -> bool:
        try:
            __import__(name)
            return True
        except ImportError:
            return False

    assert mm._HAVE_PIL is importable("PIL")
    assert mm._HAVE_SOUNDFILE is importable("soundfile")


def test_real_image_decode_when_pil_available(spark):
    """Runs only where PIL is installed: a real PNG round-trips through
    decode_stats with pixel-level checksum and true thumbnail dims."""
    import pytest

    PIL = pytest.importorskip("PIL")
    from io import BytesIO

    from PIL import Image

    from shards_prometheus_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_stats,
    )

    img = Image.new("RGB", (128, 96), color=(10, 200, 30))
    buf = BytesIO()
    img.save(buf, format="PNG")
    media = spark.createDataFrame(
        [(0, "image", buf.getvalue(), 128, 96, "png")], MEDIA_SCHEMA
    )
    row = decode_stats(media, real_codec=True).collect()[0]
    thumb = img.copy()
    thumb.thumbnail((64, 64))
    assert (row["thumb_w"], row["thumb_h"]) == (thumb.width, thumb.height)
    assert row["checksum"] == hashlib.md5(thumb.tobytes()).hexdigest()
