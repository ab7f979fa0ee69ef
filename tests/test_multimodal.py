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


def test_bmp_roundtrip_query_matches_oracle_shape(spark):
    """multimodal_decode_real: every output row's checksum must equal
    md5 of the document's first 576 bytes — i.e. the REAL container
    decode (header parse, row un-flip, BGR swap) is lossless."""
    from pyspark.sql import functions as F

    from shards_prometheus_spark.model import load_table
    from shards_prometheus_spark.operators.multimodal import (
        _BMP_FILE_BYTES,
        _BMP_RGB_BYTES,
        multimodal_decode_real,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = multimodal_decode_real(spark, sf_dir)
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows, "expected documents >= 288 chars at sf0.001"
    expect = {
        r["doc_id"]: r["ck"]
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.length("text") >= _BMP_RGB_BYTES)
        .select(
            "doc_id",
            F.md5(
                F.substring("text", 1, _BMP_RGB_BYTES).cast("binary")
            ).alias("ck"),
        )
        .collect()
    }
    assert set(rows) == set(expect)
    for mid, r in rows.items():
        assert r["checksum"] == expect[mid]
        assert r["n_bytes"] == _BMP_FILE_BYTES
        assert (r["thumb_w"], r["thumb_h"]) == (12, 8)
