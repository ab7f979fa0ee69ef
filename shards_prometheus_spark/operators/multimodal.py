"""Multimodal columns (Tier C, north-star — SURVEY.md §2c #22).

Image/audio/video as opaque ``binary`` columns with typed metadata,
processed by Arrow-batched pandas iterators (``mapInPandas``) — the
one place Python belongs in this engine, because codec work is
per-cell opaque computation, not relational logic.

Codec integration is REAL and import-gated: when PIL / soundfile are
installed, `decode_stats` / `audio_features` decode actual payloads
(image → RGB thumbnail checksum + true thumb dims; audio → waveform
mean/RMS over decoded samples). In codec-less containers — and for the
registered queries, whose payloads are synthetic text bytes with a
DuckDB-checkable ground truth — the deterministic kernels run instead.
Both paths share the identical Spark-side contract: schema, partition
sizing, Arrow batch shape, UDF signature.

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
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from shards_prometheus_spark.functions import miniformats
from shards_prometheus_spark.model import dround, load_table
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # image codec (absent in this container — fake kernel runs)
    from PIL import Image as _PIL_Image

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

try:  # audio codec (absent in this container — byte-stats kernel runs)
    import soundfile as _soundfile

    _HAVE_SOUNDFILE = True
except ImportError:
    _HAVE_SOUNDFILE = False

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


def _decode_kernel_fake(
    data: bytes, width: int, height: int
) -> tuple[str, int, int]:
    """Deterministic codec-free decode: raw-byte checksum + aspect-fit
    thumb dims from the metadata columns. The DuckDB-checkable ground
    truth for synthetic payloads, and the fallback when no codec lib is
    installed or a payload fails to decode."""
    checksum = hashlib.md5(data or b"").hexdigest()
    scale = max(width or 1, height or 1, 1)
    tw = max(1, (width or 1) * THUMB_MAX // scale)
    th = max(1, (height or 1) * THUMB_MAX // scale)
    return checksum, tw, th


def _decode_kernel_real(
    data: bytes, width: int, height: int
) -> tuple[str, int, int]:
    """Real image decode: open, normalize to RGB, aspect-fit thumbnail,
    checksum the decoded PIXELS. PIL (full format zoo) when installed;
    the vendored pure-python BMP codec (functions.miniformats) otherwise
    — so this branch executes in codec-less CI too. Undecodable payloads
    fall back to the deterministic kernel (a corrupt cell must not kill
    the partition's Arrow batch)."""
    if _HAVE_PIL:  # pragma: no cover - PIL absent in container
        from io import BytesIO

        try:
            img = _PIL_Image.open(BytesIO(data or b"")).convert("RGB")
            img.thumbnail((THUMB_MAX, THUMB_MAX))
            return (
                hashlib.md5(img.tobytes()).hexdigest(),
                img.width,
                img.height,
            )
        except Exception:
            return _decode_kernel_fake(data, width, height)
    try:
        w, h, rgb = miniformats.bmp_decode(data or b"")
        tw, th = miniformats.thumbnail_dims(w, h, THUMB_MAX)
        if (tw, th) != (w, h):
            rgb = miniformats.downsample_rgb(rgb, w, h, tw, th)
        return hashlib.md5(rgb).hexdigest(), tw, th
    except ValueError:
        return _decode_kernel_fake(data, width, height)


def decode_stats(df: DataFrame, real_codec: bool | None = None) -> DataFrame:
    """Decode/feature-extract via Arrow-batched mapInPandas.

    real_codec: True → PIL pixel decode; False → deterministic kernel;
    None (default) → PIL when installed. Registered queries pass False
    explicitly because their payloads are synthetic text bytes whose
    ground truth is the relational oracle.
    """
    use_real = _HAVE_PIL if real_codec is None else real_codec
    kernel = _decode_kernel_real if use_real else _decode_kernel_fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            checksums, tws, ths = [], [], []
            for data, w, h in zip(pdf["data"], pdf["width"], pdf["height"]):
                c, tw, th = kernel(data, w, h)
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


_KINDS = ["image", "audio", "video"]
_FMTS = ["png", "wav", "mp4"]


def _pick(options: list[str], mod_col: Column) -> Column:
    return F.element_at(
        F.array(*[F.lit(o) for o in options]), mod_col.cast("int") + 1
    )


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEDIA_SCHEMA view derived deterministically from `documents`.

    Payload := the UTF-8 text bytes; kind/fmt/dims := doc_id arithmetic.
    This stands in for a real binary media table so the decode path has
    a DuckDB-checkable ground truth (md5 + arithmetic are portable).
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        _pick(_KINDS, F.col("doc_id") % 3).alias("kind"),
        F.col("text").cast("binary").alias("data"),
        (F.lit(64) + F.lit(16) * (F.col("doc_id") % 7)).cast("int").alias("width"),
        (F.lit(48) + F.lit(16) * (F.col("doc_id") % 5)).cast("int").alias("height"),
        _pick(_FMTS, F.col("doc_id") % 3).alias("fmt"),
    )


def _spread(df: DataFrame) -> DataFrame:
    """Widen partitioning before the Python stage: the single-file
    parquet scan yields 1-2 partitions, which would serialize the
    mapInPandas workers; payload-bearing rows re-spread by media_id
    (at real scale `media_repartition` sizes this by bytes)."""
    fan = max(2, df.sparkSession.sparkContext.defaultParallelism)
    return df.repartition(fan, "media_id")


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode/feature-extract over the documents-derived media table.

    Pinned to the deterministic kernel (real_codec=False): the payloads
    are synthetic text bytes, and the oracle recomputes the same stats
    relationally. Real media tables call decode_stats() directly and
    get PIL pixel decoding wherever the codec is installed."""
    return decode_stats(
        _spread(media_from_documents(spark, sf_dir)), real_codec=False
    )


#: Fixed geometry for the real-decode round-trip query: BMP_W×BMP_H RGB
#: fits inside THUMB_MAX, so the aspect-fit thumbnail is the identity
#: and the decoded-pixel checksum equals md5 of the source bytes — the
#: property that makes the REAL container decode relationally checkable.
BMP_W, BMP_H = 12, 8
_BMP_RGB_BYTES = BMP_W * BMP_H * 3  # 288 — most documents are ≥288 chars
_BMP_FILE_BYTES = 54 + _BMP_RGB_BYTES  # headers + 4-byte-aligned rows


def media_bmp_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEDIA_SCHEMA view whose payloads are REAL BMP containers: each
    document's first _BMP_RGB_BYTES (288) text bytes become the RGB
    pixel array of a BMP_W×BMP_H (12×8) 24-bit BMP (vendored encoder,
    functions.miniformats). Short documents are filtered out rather
    than padded so the oracle stays a pure substring expression."""
    src = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") >= _BMP_RGB_BYTES)
        .select(
            F.col("doc_id").alias("media_id"),
            F.substring("text", 1, _BMP_RGB_BYTES).cast("binary").alias("rgb"),
        )
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    # substring() upstream counts CHARS; slice to the
                    # exact byte budget so a multi-byte UTF-8 char
                    # can't overflow the fixed pixel-array size and
                    # kill the job (corpus is ASCII today → no-op)
                    "data": [
                        miniformats.bmp_encode(
                            bytes(r)[:_BMP_RGB_BYTES], BMP_W, BMP_H
                        )
                        for r in pdf["rgb"]
                    ],
                    "width": pd.array([BMP_W] * len(pdf), dtype="int32"),
                    "height": pd.array([BMP_H] * len(pdf), dtype="int32"),
                    "fmt": "bmp",
                }
            )

    return _spread(src).mapInPandas(enc, MEDIA_SCHEMA)


def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL-codec decode path over real BMP containers, end to end:
    encode (vendored BMP writer) → decode_stats(real_codec=True), which
    parses the container (PIL where installed, the vendored pure-python
    BMP reader otherwise — identical output for this profile) and
    checksums the decoded pixels. The oracle recomputes the checksum
    from the source text, so a header-parse, row-unflip, or BGR-swap bug
    anywhere in the codec shows up as a hash mismatch."""
    return decode_stats(
        media_bmp_from_documents(spark, sf_dir), real_codec=True
    )


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """frame sampling over the video rows of the media table."""
    return frame_sample(_spread(media_from_documents(spark, sf_dir)))


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


# --- oracle SQL (documents-derived media; md5/arithmetic are portable;
#     substring-by-char == slice-by-byte because the corpus is ASCII,
#     which the n_bytes column itself cross-checks) ---

_KIND_SQL = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
    "ELSE 'video' END"
)
_W_SQL = "(64 + 16 * (doc_id % 7))"
_H_SQL = "(48 + 16 * (doc_id % 5))"
_SCALE_SQL = f"greatest({_W_SQL}, {_H_SQL}, 1)"

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("rms_byte", DoubleType()),
    ]
)


def audio_features(df: DataFrame, real_codec: bool | None = None) -> DataFrame:
    """Feature extraction for audio payloads: waveform stats (mean and
    RMS) via a vectorized numpy kernel per Arrow batch — the
    feature-extract stage of the decode pipeline.

    real_codec=True decodes the payload with soundfile and computes the
    stats over the true waveform samples; the default byte-stats kernel
    is the codec-free deterministic twin the oracle checks (payloads
    here are synthetic text bytes, not wav containers). Failed decodes
    fall back to byte stats per cell."""
    import numpy as np

    use_real = _HAVE_SOUNDFILE if real_codec is None else real_codec

    def _samples(data: bytes) -> "np.ndarray":
        if use_real:
            if _HAVE_SOUNDFILE:  # pragma: no cover - absent in container
                from io import BytesIO

                try:
                    wav, _sr = _soundfile.read(BytesIO(data), dtype="float64")
                    return np.asarray(wav, dtype=np.float64).ravel()
                except Exception:
                    pass
            else:  # vendored PCM-WAV decode (functions.miniformats)
                try:
                    wav, _sr = miniformats.wav_decode(data)
                    return wav
                except ValueError:
                    pass
        return np.frombuffer(data, dtype=np.uint8).astype(np.float64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nbytes, means, rmss = [], [], [], []
            for mid, kind, data in zip(
                pdf["media_id"], pdf["kind"], pdf["data"]
            ):
                if kind != "audio" or not data:
                    continue
                # integer byte sums are exact in double, so the raw
                # stats are bit-identical to the oracle's; rounding
                # happens OUTSIDE the kernel with F.round (HALF_UP, the
                # dround twin) — Python's round() is half-even and
                # would diverge on exact ties
                arr = _samples(data)
                ids.append(mid)
                nbytes.append(len(data))
                means.append(float(arr.mean()))
                rmss.append(float(np.sqrt((arr * arr).mean())))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "n_bytes": pd.array(nbytes, dtype="int64"),
                    "mean_byte": pd.array(means, dtype="float64"),
                    "rms_byte": pd.array(rmss, dtype="float64"),
                }
            )

    return df.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """feature-extract over the audio rows of the media table. The
    DuckDB oracle recomputes the same stats declaratively from char
    codes (the corpus is ASCII, which n_bytes itself cross-checks) —
    the Python kernel is verified against a relational spec."""
    raw = audio_features(
        _spread(media_from_documents(spark, sf_dir)), real_codec=False
    )
    return raw.select(
        "media_id",
        "n_bytes",
        F.round("mean_byte", 4).alias("mean_byte"),
        F.round("rms_byte", 4).alias("rms_byte"),
    )


QUERIES = {
    "multimodal_decode": multimodal_decode,
    "multimodal_decode_real": multimodal_decode_real,
    "multimodal_frames": multimodal_frames,
    "multimodal_audio_features": multimodal_audio_features,
}

ORACLES = {
    "multimodal_decode_real": (
        "SELECT doc_id AS media_id, 'image' AS kind, "
        f"CAST({_BMP_FILE_BYTES} AS BIGINT) AS n_bytes, "
        f"md5(substring(text, 1, {_BMP_RGB_BYTES})) AS checksum, "
        f"CAST({BMP_W} AS INTEGER) AS thumb_w, "
        f"CAST({BMP_H} AS INTEGER) AS thumb_h "
        f"FROM documents WHERE strlen(text) >= {_BMP_RGB_BYTES}"
    ),
    "multimodal_decode": (
        "SELECT doc_id AS media_id, "
        f"{_KIND_SQL} AS kind, "
        "CAST(strlen(text) AS BIGINT) AS n_bytes, "
        "md5(text) AS checksum, "
        f"CAST(greatest(1, {_W_SQL} * {THUMB_MAX} // {_SCALE_SQL}) AS INTEGER) "
        "AS thumb_w, "
        f"CAST(greatest(1, {_H_SQL} * {THUMB_MAX} // {_SCALE_SQL}) AS INTEGER) "
        "AS thumb_h "
        "FROM documents"
    ),
    "multimodal_frames": (
        "WITH v AS (SELECT doc_id AS media_id, text, "
        "least(3, greatest(1, strlen(text) // 64)) AS n_frames "
        "FROM documents WHERE doc_id % 3 = 2 AND strlen(text) > 0) "
        "SELECT media_id, CAST(f AS INTEGER) AS frame_idx, "
        "md5(substring(text, f * 64 + 1, 64)) AS frame_checksum "
        "FROM v, generate_series(0, 2) AS g(f) WHERE f < n_frames"
    ),
    "multimodal_audio_features": (
        "WITH a AS (SELECT doc_id AS media_id, text FROM documents "
        "WHERE doc_id % 3 = 1 AND strlen(text) > 0), "
        "b AS (SELECT media_id, ascii(substring(text, i, 1)) AS bv "
        "FROM a CROSS JOIN LATERAL ("
        "SELECT unnest(generate_series(1, strlen(text))) AS i)) "
        "SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_bytes, "
        + dround("AVG(bv)", 4)
        + " AS mean_byte, "
        + dround("SQRT(AVG(bv * bv))", 4)
        + " AS rms_byte FROM b GROUP BY media_id"
    ),
}
