"""Streaming ingest of the events schema (SURVEY.md §2b #17).

Pipeline: ``readStream`` (parquet file source) → the samples projection
→ stateful aggregations in update mode → memory/Delta sink as the live
"registry". The update-mode counter aggregation is the distributed
version of the reference's per-tick atomic Increment
(prometheus.cpp:212): per micro-batch, partial sums merge into the
state store keyed by series — same zero-lookup hot path, resolved at
plan time (the analog of warmup-time series caching,
prometheus.cpp:185-199).

Scale notes: state is keyed by (metric, label_user) — bounded by series
cardinality, not event volume; at production scale back the state store
with RocksDB (spark.sql.streaming.stateStore.providerClass) and bound
state with watermarks. `maxFilesPerTrigger` paces micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from shards_prometheus_spark.session import prepare_session

#: events.parquet physical schema (ts is TIMESTAMP(MICROS)
#: isAdjustedToUTC=false → TIMESTAMP_NTZ; see model._ts_us for the
#: cross-round encoding story).
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the driver's events parquet."""
    prepare_session(spark)
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(sf_dir)
    )


def samples_stream(events: DataFrame) -> DataFrame:
    """The tall samples projection (same shape as model.samples)."""
    from shards_prometheus_spark.model import _ts_us

    label_user = F.col("user_id").cast("string")
    ts_us = _ts_us(events)
    return events.select(
        F.col("event_id"),
        F.col("event_type").alias("metric"),
        label_user.alias("label_user"),
        ts_us.alias("ts_us"),
        F.timestamp_micros(ts_us).alias("event_time"),
        F.col("value"),
    )


def samples_multi_stream(events: DataFrame) -> DataFrame:
    """The MULTI-label samples projection of the event stream — same
    shape as model.samples_multi (event_id, series_id, metric, labels
    MAP, ts_us, value), so the accumulated stream is directly
    evaluatable by the PromQL evaluator (functions.promql_parser
    .PromQLEvaluator takes any such relation): ingest with
    ``run_to_memory(..., output_mode='append')`` (Delta/parquet sink in
    production) and point the evaluator at the sink table. Streaming
    ingest + batch PromQL reads over one relation is exactly the
    Prometheus server split (scrape loop writes, query engine reads)."""
    from shards_prometheus_spark.model import _ts_us, series_id_expr

    label_user = F.col("user_id").cast("string")
    k = F.get_json_object("props", "$.k").cast("long")
    shard = (k % 10).cast("string")
    ts_us = _ts_us(events)
    labels = F.create_map(
        F.lit("user"), label_user, F.lit("shard"), shard
    )
    return events.filter(k.isNotNull()).select(
        F.col("event_id"),
        series_id_expr(F.col("event_type"), labels).alias("series_id"),
        F.col("event_type").alias("metric"),
        labels.alias("labels"),
        ts_us.alias("ts_us"),
        F.col("value"),
    )


def enriched_stream(samples: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static dimension enrichment: the unbounded samples
    stream left-joined to a bounded dimension table (broadcast hash
    join — the static side is re-resolved per micro-batch, so a
    slowly-changing dimension is picked up as it changes; at scale,
    this is the standard enrich-on-ingest shape)."""
    dim = customer.select(
        F.col("c_custkey").cast("string").alias("label_user"),
        "c_mktsegment",
    )
    return samples.join(F.broadcast(dim), "label_user", "left")


def counter_totals_stream(samples: DataFrame) -> DataFrame:
    """Running counter totals per series, update-mode semantics."""
    return (
        samples.filter(F.col("value") >= 0)
        .groupBy("metric", "label_user")
        .agg(
            F.sum("value").alias("total"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )


def countmin_cells_stream(samples: DataFrame) -> DataFrame:
    """Streaming count-min sketch state: running (depth, cell) counts.

    The sketch update is a plain streaming aggregation — each sample
    explodes to its depth-many cells (a literal array, no stream-static
    join) and the cell counts accumulate in update mode. The sketch
    STATE is the aggregate, so estimates read from the registry table
    exactly like the batch twin (operators/sketches.py); merging across
    micro-batches is count addition, the mergeability that matters at
    100 TB.
    """
    from shards_prometheus_spark.operators.sketches import (
        CM_P,
        CM_PARAMS,
        CM_W,
    )

    params = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), F.lit(a).alias("a"), F.lit(b).alias("b")
            )
            for j, a, b in CM_PARAMS
        ]
    )
    uid = F.col("label_user").cast("long")
    e = samples.select(uid.alias("uid"), F.explode(params).alias("p"))
    cell = (
        (F.col("p.a") * F.col("uid") + F.col("p.b"))
        % F.lit(CM_P)
        % F.lit(CM_W)
    )
    return (
        e.groupBy(F.col("p.j").alias("j"), cell.alias("cell"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def gauge_last_stream(samples: DataFrame) -> DataFrame:
    """Gauge state over the stream: last write per series.

    `max_by((value, tiebreak), (ts, id))` is order-insensitive, so the
    last-write-wins semantics (prometheus.cpp:248-251) stream safely in
    update mode without custom state."""
    return samples.groupBy("metric", "label_user").agg(
        F.max_by(
            "value", F.struct(F.col("ts_us"), F.col("event_id"))
        ).alias("last_value")
    )


def histogram_buckets_stream(
    samples: DataFrame, bounds: list[float]
) -> DataFrame:
    """Histogram state over the stream: per-(metric, bucket) counts +
    running sum (explicit static bounds, prometheus.cpp:264-293).
    Cumulative `le` exposure derives at read time from these counts."""
    idx = None
    for i, b in enumerate(bounds):
        cond = F.col("value") <= F.lit(float(b))
        idx = F.when(cond, i) if idx is None else idx.when(cond, i)
    assert idx is not None
    return (
        samples.withColumn("bucket_idx", idx.otherwise(len(bounds)))
        .groupBy("metric", "bucket_idx")
        .agg(
            F.count(F.lit(1)).alias("bucket_count"),
            F.sum("value").alias("bucket_sum"),
        )
    )


def windowed_sums_stream(
    samples: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling event-time aggregation (late data handled —
    capability the reference's processing-time loop lacks)."""
    return (
        samples.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), F.col("metric"))
        .agg(
            F.sum("value").alias("sum_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "metric",
            "sum_value",
            "n",
        )
    )


def session_windows_stream(
    samples: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session-window aggregation per series label: a session closes
    after `gap` of inactivity (capability class the reference's
    fixed-cadence tick loop, test.edn:8, has no analog for)."""
    return (
        samples.withWatermark("event_time", watermark)
        .groupBy(
            F.session_window("event_time", gap).alias("sw"),
            F.col("label_user"),
        )
        .agg(
            F.sum("value").alias("sum_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "label_user",
            "sum_value",
            "n_events",
        )
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: attribute each `right` sample to
    every `left` sample of the same label within (l_time, l_time +
    max_lag] — the click→purchase conversion-attribution shape, as a
    watermarked streaming join.

    Both sides carry watermarks and the join condition carries the time
    range, so Spark bounds each side's state: left rows are evicted
    once the right watermark passes l_time + max_lag, right rows once
    the left watermark passes them. Inner-join results emit as soon as
    they match (no watermark hold), so the stream converges to exactly
    the batch join. State is keyed by label — series-cardinality
    bounded per watermark horizon, not stream-length bounded.
    """
    l = left.withWatermark("event_time", watermark).select(
        F.col("label_user").alias("l_user"),
        F.col("event_time").alias("l_time"),
        F.col("event_id").alias("l_id"),
        F.col("value").alias("l_value"),
    )
    r = right.withWatermark("event_time", watermark).select(
        F.col("label_user").alias("r_user"),
        F.col("event_time").alias("r_time"),
        F.col("event_id").alias("r_id"),
        F.col("value").alias("r_value"),
    )
    return l.join(
        r,
        F.expr(
            f"l_user = r_user AND r_time > l_time "
            f"AND r_time <= l_time + INTERVAL {max_lag}"
        ),
        "inner",
    ).select("l_user", "l_id", "r_id", "l_time", "r_time", "l_value", "r_value")


def run_to_memory(
    df: DataFrame,
    name: str,
    output_mode: str = "update",
    available_now: bool = True,
) -> StreamingQuery:
    """Run a streaming aggregation into an in-memory "registry" table
    (the scrape-able snapshot; Delta/Parquet sink in production)."""
    writer = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
