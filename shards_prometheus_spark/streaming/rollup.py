"""Continuous aggregates + streaming dedup (SURVEY.md §2b #17).

`continuous_rollup` is the streaming twin of the batch downsample tier
(operators/rollup.py): a `foreachBatch` sink appends per-micro-batch
PARTIAL hourly aggregates to a parquet table (merge-on-read: readers
re-aggregate the partials, which are rollup-sized, not raw-sized; a
periodic compaction job would collapse them). This is the idiomatic
continuous-aggregate design without a MERGE-capable table format —
with Delta, the same `foreachBatch` body becomes a keyed MERGE. The
reference's analog is its always-current registry state updated per
tick (prometheus.cpp:212 over the test.edn loop); the rollup is that
registry with history.

`dedup_events_stream` is the ingest idempotency guard the reference
lacks entirely: re-delivered events (at-least-once sources re-send on
retry) are dropped by key within the watermark horizon via
`dropDuplicatesWithinWatermark` — state is bounded by the horizon, not
the stream length.

All partial statistics are mergeable (sum/count/min/max), so partials
from any number of micro-batches — or executors — combine exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from shards_prometheus_spark.model import MICROS_PER_HOUR

ROLLUP_KEYS = ["metric", "label_user", "hour_ts"]


def _partials(batch: DataFrame) -> DataFrame:
    hour_ts = F.expr(f"ts_us div {MICROS_PER_HOUR}") * 3600
    return (
        batch.withColumn("hour_ts", hour_ts)
        .groupBy(*ROLLUP_KEYS)
        .agg(
            F.sum("value").alias("sum_v"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
    )


def continuous_rollup(
    samples: DataFrame, out_path: str, checkpoint: str
) -> StreamingQuery:
    """Maintain the hourly rollup incrementally from a samples stream.

    foreachBatch is at-least-once: a crash between the parquet write and
    the checkpoint commit replays the batch. Each batch therefore writes
    its partials to a batch_id-derived partition directory with
    mode("overwrite") — a replay rewrites the same directory instead of
    appending a duplicate, making the sink idempotent (the parquet
    analog of a Delta MERGE keyed on batch_id)."""

    def emit(batch: DataFrame, batch_id: int) -> None:
        _partials(batch).write.mode("overwrite").parquet(
            f"{out_path}/batch_id={batch_id}"
        )

    return (
        samples.writeStream.foreachBatch(emit)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(spark: SparkSession, out_path: str) -> DataFrame:
    """Merge-on-read: collapse the partial aggregates to the final
    hourly rollup (partials are mergeable, so this is exact)."""
    return (
        spark.read.parquet(out_path)
        .groupBy(*ROLLUP_KEYS)
        .agg(
            F.round(F.sum("sum_v"), 4).alias("sum_v"),
            F.sum("n").cast("long").alias("n"),
            F.round(F.min("min_v"), 4).alias("min_v"),
            F.round(F.max("max_v"), 4).alias("max_v"),
        )
    )


def compact_rollup(spark: SparkSession, out_path: str) -> None:
    """Collapse accumulated partials to one row per (series, hour) —
    the periodic maintenance job of the merge-on-read design. Readers
    (`read_rollup`) see identical results before and after (partials
    are mergeable); compaction just bounds read amplification as
    micro-batches accumulate. Writes to a staging dir then swaps, so a
    crash mid-compaction never loses the table."""
    import os
    import shutil

    compacted = (
        spark.read.parquet(out_path)
        .groupBy(*ROLLUP_KEYS)
        .agg(
            F.sum("sum_v").alias("sum_v"),
            F.sum("n").cast("long").alias("n"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )
    staging = out_path.rstrip("/") + ".compact.tmp"
    # Keep the batch_id=... layout so post-compaction batches (which keep
    # counting up) land beside the compacted slice without schema drift.
    compacted.write.mode("overwrite").parquet(staging + "/batch_id=-1")
    old = out_path.rstrip("/") + ".old"
    os.rename(out_path, old)
    os.rename(staging, out_path)
    shutil.rmtree(old)


def dedup_events_stream(
    samples: DataFrame, horizon: str = "365 days"
) -> DataFrame:
    """Drop re-delivered events by event_id within the watermark
    horizon — at-least-once ingest becomes effectively-once. State is
    bounded by the horizon; size it to the source's max redelivery
    delay in production (365 d here only so tests replaying a whole
    historical fixture keep every key in state)."""
    return samples.withWatermark(
        "event_time", horizon
    ).dropDuplicatesWithinWatermark(["event_id"])
