"""PromQL range-function family (Tier B, public).

- ``gauge_delta`` — PromQL ``delta()``: last − first value per series
  per range window (gauges; no reset semantics).
- ``counter_resets`` — PromQL ``resets()``: number of monotonicity
  breaks per metric per range window (the same decrease the counter
  operators clamp, counted instead — reference guard prometheus.cpp:209-212
  is what makes decreases "resets" rather than data).
- ``over_time_stats`` — ``avg/min/max/count_over_time`` per series per
  window in one pass.

Scale notes: all three are single window/aggregate passes keyed by
(series, hour); the first/last extraction uses two ROW_NUMBER windows
over the same sort (one shuffle, one sort — Spark reuses the exchange
for both window functions since the partitioning matches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shards_prometheus_spark.model import (
    MICROS_PER_HOUR,
    SAMPLES_CTE,
    samples,
)

_HOUR = f"(ts_us // {MICROS_PER_HOUR}) * 3600"


def _with_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    return samples(spark, sf_dir).withColumn(
        "hour_ts", F.expr(f"ts_us div {MICROS_PER_HOUR}") * 3600
    )


def gauge_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """delta(): last − first per series per 1h window."""
    s = _with_hour(spark, sf_dir)
    keys = ["metric", "label_user", "hour_ts"]
    asc = Window.partitionBy(*keys).orderBy("ts_us", "event_id")
    desc = Window.partitionBy(*keys).orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    return (
        s.withColumn("rn_a", F.row_number().over(asc))
        .withColumn("rn_d", F.row_number().over(desc))
        .groupBy(*keys)
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("first_v"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("last_v"),
        )
        .select(
            *keys,
            F.round(F.col("last_v") - F.col("first_v"), 4).alias("delta"),
        )
    )


def counter_resets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resets(): count of per-series decreases per metric per 1h window."""
    s = samples(spark, sf_dir)
    w = Window.partitionBy("metric", "label_user").orderBy("ts_us", "event_id")
    return (
        s.withColumn("prev", F.lag("value").over(w))
        .filter(F.col("prev").isNotNull())
        .withColumn("hour_ts", F.expr(f"ts_us div {MICROS_PER_HOUR}") * 3600)
        .groupBy("metric", "hour_ts")
        .agg(
            F.sum(
                F.when(F.col("value") < F.col("prev"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_resets")
        )
    )


def over_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg/min/max/count_over_time per series per 1h window."""
    s = _with_hour(spark, sf_dir)
    return s.groupBy("metric", "label_user", "hour_ts").agg(
        F.round(F.avg("value"), 4).alias("avg_v"),
        F.round(F.min("value"), 4).alias("min_v"),
        F.round(F.max("value"), 4).alias("max_v"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


QUERIES = {
    "gauge_delta": gauge_delta,
    "counter_resets": counter_resets,
    "over_time_stats": over_time_stats,
}

ORACLES = {
    "gauge_delta": (
        f"{SAMPLES_CTE}, d AS (SELECT metric, label_user, {_HOUR} AS hour_ts, "
        "value, "
        "ROW_NUMBER() OVER (PARTITION BY metric, label_user, "
        f"({_HOUR}) ORDER BY ts_us ASC, event_id ASC) AS rn_a, "
        "ROW_NUMBER() OVER (PARTITION BY metric, label_user, "
        f"({_HOUR}) ORDER BY ts_us DESC, event_id DESC) AS rn_d "
        "FROM samples) "
        "SELECT metric, label_user, hour_ts, "
        "ROUND(MAX(CASE WHEN rn_d = 1 THEN value END) "
        "- MAX(CASE WHEN rn_a = 1 THEN value END), 4) AS delta "
        "FROM d GROUP BY metric, label_user, hour_ts"
    ),
    "counter_resets": (
        f"{SAMPLES_CTE}, d AS (SELECT metric, label_user, ts_us, value, "
        "LAG(value) OVER (PARTITION BY metric, label_user "
        "ORDER BY ts_us, event_id) AS prev FROM samples) "
        f"SELECT metric, {_HOUR} AS hour_ts, "
        "CAST(SUM(CASE WHEN value < prev THEN 1 ELSE 0 END) AS BIGINT) AS n_resets "
        "FROM d WHERE prev IS NOT NULL GROUP BY metric, hour_ts"
    ),
    "over_time_stats": (
        f"{SAMPLES_CTE} "
        f"SELECT metric, label_user, {_HOUR} AS hour_ts, "
        "ROUND(AVG(value), 4) AS avg_v, ROUND(MIN(value), 4) AS min_v, "
        "ROUND(MAX(value), 4) AS max_v, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM samples GROUP BY metric, label_user, hour_ts"
    ),
}
