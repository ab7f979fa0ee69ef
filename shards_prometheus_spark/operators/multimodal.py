"""Multimodal columns (Tier C, north-star — SURVEY.md §2c #22).

Image/audio/video as opaque ``binary`` columns with typed metadata,
processed by Arrow-batched pandas iterators (``mapInPandas``) — the
one place Python belongs in this engine, because codec work is
per-cell opaque computation, not relational logic.

The container has no codec libraries, so the decode kernels are
deterministic fakes behind an import gate (`_HAVE_PIL`); everything
Spark-side — schema, partition sizing, Arrow batch shape, UDF
signature, output contract — is real and tested. Swapping the fake
kernel for PIL/ffmpeg is a one-function change.

Scale notes: binary payloads dominate partition size — re-partition by
bytes (`media_repartition`) so each Arrow batch stays within executor
memory (spark.sql.execution.arrow.maxRecordsPerBatch also caps rows);
metadata-only queries must NOT read payload bytes, which Parquet
column pruning guarantees if `data` is its own column.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # codec libs absent in this container — plumbing still real
    from PIL import Image as _PIL_Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # 'image' | 'audio' | 'video'
        StructField("data", BinaryType()),  # opaque payload
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("fmt", StringType()),
    ]
)

DECODE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("thumb_w", IntegerType()),
        StructField("thumb_h", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_checksum", StringType()),
    ]
)

THUMB_MAX = 64


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = repeated md5 bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        seed = hashlib.md5(f"media-{i}".encode()).digest()
        rows.append(
            (
                i,
                kinds[i % 3],
                seed * (8 + i % 5),
                64 + 16 * (i % 7),
                48 + 16 * (i % 5),
                ["png", "wav", "mp4"][i % 3],
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_repartition(df: DataFrame, target_bytes: int = 64 << 20) -> DataFrame:
    """Partition by payload volume, not row count (payloads are skewed)."""
    stats = df.select(
        F.sum(F.length("data")).alias("total"), F.count(F.lit(1)).alias("n")
    ).first()
    if not stats or not stats["total"]:
        return df
    parts = max(1, int(stats["total"] // target_bytes) + 1)
    return df.repartition(parts, "media_id")


def _decode_kernel(data: bytes, width: int, height: int) -> tuple[str, int, int]:
    """Per-cell decode: real PIL when available, deterministic fake
    otherwise (STUB — see module docstring)."""
    checksum = hashlib.md5(data or b"").hexdigest()
    if _HAVE_PIL:  # pragma: no cover - lib absent in this container
        raise NotImplementedError("real decode path not wired in this build")
    scale = max(width or 1, height or 1, 1)
    tw = max(1, (width or 1) * THUMB_MAX // scale)
    th = max(1, (height or 1) * THUMB_MAX // scale)
    return checksum, tw, th


def decode_stats(df: DataFrame) -> DataFrame:
    """Decode/feature-extract via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            checksums, tws, ths = [], [], []
            for data, w, h in zip(pdf["data"], pdf["width"], pdf["height"]):
                c, tw, th = _decode_kernel(data, w, h)
                checksums.append(c)
                tws.append(tw)
                ths.append(th)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(d or b"") for d in pdf["data"]],
                    "checksum": checksums,
                    "thumb_w": pd.array(tws, dtype="int32"),
                    "thumb_h": pd.array(ths, dtype="int32"),
                }
            )

    return df.mapInPandas(run, DECODE_STATS_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 4, max_frames: int = 3) -> DataFrame:
    """Frame sampling for video payloads (deterministic fake frames:
    slices of the payload; a real build decodes with a codec here)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_ck = [], [], []
            for mid, kind, data in zip(
                pdf["media_id"], pdf["kind"], pdf["data"]
            ):
                if kind != "video" or not data:
                    continue
                n = min(max_frames, max(1, len(data) // (every_n * 16)))
                for f_idx in range(n):
                    chunk = data[f_idx * every_n * 16 : (f_idx + 1) * every_n * 16]
                    out_id.append(mid)
                    out_idx.append(f_idx)
                    out_ck.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.array(out_id, dtype="int64"),
                    "frame_idx": pd.array(out_idx, dtype="int32"),
                    "frame_checksum": pd.array(out_ck, dtype=object),
                }
            )

    return df.mapInPandas(run, FRAME_SCHEMA)
