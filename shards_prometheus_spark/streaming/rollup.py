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


#: Compaction manifest (underscore-prefixed → invisible to Spark's
#: partition discovery). Records which batch ids have been folded.
_MANIFEST = "_compacted.json"


def _read_manifest(out_path: str) -> dict | None:
    import json
    import os

    p = os.path.join(out_path, _MANIFEST)
    if os.path.exists(p):
        with open(p) as fh:
            return json.load(fh)
    return None


def _live_partials(spark: SparkSession, out_path: str) -> DataFrame:
    """All partial rows a reader must count exactly once: the active
    compacted slice (batch_id = -gen) plus every batch dir NEWER than
    the compaction horizon. A batch dir with id ≤ max_id that
    reappears AFTER compaction (an at-least-once replay of a batch
    whose write landed but whose checkpoint commit did not) is
    EXCLUDED — its rows are already inside the compacted slice, which
    is what makes replay idempotent across compaction."""
    df = spark.read.parquet(out_path)
    man = _read_manifest(out_path)
    if man is not None:
        df = df.filter(
            (F.col("batch_id") == -int(man["gen"]))
            | (F.col("batch_id") > int(man["max_id"]))
        )
    return df


def read_rollup(spark: SparkSession, out_path: str) -> DataFrame:
    """Merge-on-read: collapse the partial aggregates to the final
    hourly rollup (partials are mergeable, so this is exact)."""
    return (
        _live_partials(spark, out_path)
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
    see identical results before, during and after, and a replayed
    micro-batch stays idempotent even when its dir was already folded:

    1. aggregate the live partials (old compacted slice + the
       *job-committed* batch dirs — a dir without _SUCCESS is a torn
       foreachBatch write and stays live for its replay to overwrite)
       into a staging dir OUTSIDE the table, then rename it in as
       ``batch_id=-(gen+1)`` — a same-filesystem atomic move, so no
       reader ever lists partial files; the new slice stays invisible
       (generation not yet active) until step 2;
    2. atomically replace the manifest (`os.replace`) activating the
       new generation and recording ``max_id`` = the highest batch id
       folded — readers now use the new slice and ignore every folded
       batch dir, INCLUDING one re-created later by an at-least-once
       replay (the double-count hole of naive dir compaction);
    3. best-effort delete of the folded dirs — a crash here only
       leaves garbage that readers already ignore.

    Run it between trigger firings (or quiesced): the fold horizon is
    the batch dirs present at step 1; later batches stay live.
    """
    import json
    import os
    import shutil

    man = _read_manifest(out_path) or {"gen": 0, "max_id": -1}
    batch_ids = [
        int(name.split("=", 1)[1])
        for name in os.listdir(out_path)
        if name.startswith("batch_id=")
    ]
    # Fold ONLY job-committed batch dirs (_SUCCESS marker). A dir left
    # by a foreachBatch write that crashed mid job-commit has no
    # _SUCCESS; folding its partial rows and sealing its id under
    # max_id would lose the missing rows forever (the replay's rewrite
    # lands in a dir readers then ignore). Uncommitted dirs stay OUT of
    # the fold input AND the horizon, so the replay overwrites them and
    # they remain live — at-least-once stays exactly-once.
    uncommitted = [
        i
        for i in batch_ids
        if i >= 0
        and not os.path.exists(
            os.path.join(out_path, f"batch_id={i}", "_SUCCESS")
        )
    ]
    max_id_new = max(
        [i for i in batch_ids if i >= 0 and i not in uncommitted],
        default=int(man["max_id"]),
    )
    gen_new = int(man["gen"]) + 1
    fold_in = _live_partials(spark, out_path)
    if uncommitted:
        fold_in = fold_in.filter(~F.col("batch_id").isin(uncommitted))
    compacted = (
        fold_in
        .groupBy(*ROLLUP_KEYS)
        .agg(
            F.sum("sum_v").alias("sum_v"),
            F.sum("n").cast("long").alias("n"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )
    staging = out_path.rstrip("/") + ".compact.tmp"
    compacted.write.mode("overwrite").parquet(staging)
    # The target can only exist as an orphan of a prior run that
    # crashed between this rename and the manifest replace (the
    # manifest never activated it — readers ignore it); remove it or
    # the rename fails with ENOTEMPTY forever after.
    target = os.path.join(out_path, f"batch_id=-{gen_new}")
    if os.path.exists(target):
        shutil.rmtree(target)
    os.rename(staging, target)
    tmp_manifest = os.path.join(out_path, _MANIFEST + ".tmp")
    with open(tmp_manifest, "w") as fh:
        json.dump({"gen": gen_new, "max_id": max_id_new}, fh)
    os.replace(tmp_manifest, os.path.join(out_path, _MANIFEST))
    for i in batch_ids:
        if i in uncommitted:
            continue  # left live for the replay to overwrite
        if 0 <= i <= max_id_new or (i < 0 and i != -gen_new):
            shutil.rmtree(
                os.path.join(out_path, f"batch_id={i}"), ignore_errors=True
            )


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
