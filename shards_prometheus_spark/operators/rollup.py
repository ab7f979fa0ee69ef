"""Hypertable-style rollups (downsampling) — the TSDB scale pattern.

The reference keeps only current state (resident atomics,
prometheus.cpp:34-45); its paired TSDB keeps raw samples and answers
long ranges from *downsampled* rollups (public Prometheus/Thanos
architecture: 5m/1h downsample tiers). Here:

- ``rollup_hourly`` — per (series, hour): sum/count/min/max + first/
  last by time. This is the materialization a 100 TB deployment keeps
  next to raw samples (one row per series-hour — 3-4 orders smaller).
- ``daily_from_rollup`` — a daily range query answered FROM the hourly
  rollup by re-aggregation. Its oracle computes the same daily answer
  from RAW samples — passing the hash check proves the rollup tier is
  lossless for composable aggregates (sum/count/min/max compose; avg
  derives as sum/n; first/last compose by time rank).

Internals stay unrounded so re-aggregation matches raw-data sums to
~1e-11 (well under the 4-decimal output grid); rounding happens only at
query output, like every other operator.

Scale notes: the rollup is one map-side-combined hash aggregate over
the raw scan, keyed by the same (series, time-bucket) every range query
shuffles on; stored partitioned by (date, metric) it turns month-long
queries into scans of 1/3600th the rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shards_prometheus_spark.model import (
    MICROS_PER_HOUR,
    SAMPLES_CTE,
    dround,
    samples,
)

_HOUR_SQL = "(ts_us // 3600000000) * 3600"
SECONDS_PER_DAY = 86_400


def _hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unrounded internal rollup relation."""
    s = samples(spark, sf_dir).withColumn(
        "hour_ts", F.expr(f"ts_us div {MICROS_PER_HOUR}") * 3600
    )
    keys = ["metric", "label_user", "hour_ts"]
    asc = Window.partitionBy(*keys).orderBy("ts_us", "event_id")
    desc = Window.partitionBy(*keys).orderBy(F.desc("ts_us"), F.desc("event_id"))
    return (
        s.withColumn("rn_a", F.row_number().over(asc))
        .withColumn("rn_d", F.row_number().over(desc))
        .groupBy(*keys)
        .agg(
            F.sum("value").alias("sum_v"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("first_v"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("last_v"),
        )
    )


def rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The downsample tier, rounded for output."""
    h = _hourly(spark, sf_dir)
    return h.select(
        "metric",
        "label_user",
        "hour_ts",
        F.round("sum_v", 4).alias("sum_v"),
        "n",
        F.round("min_v", 4).alias("min_v"),
        F.round("max_v", 4).alias("max_v"),
        F.round("first_v", 4).alias("first_v"),
        F.round("last_v", 4).alias("last_v"),
    )


def daily_from_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-metric stats answered from the hourly tier — the
    oracle recomputes from raw, proving downsample losslessness."""
    h = _hourly(spark, sf_dir)
    day = (F.col("hour_ts") / SECONDS_PER_DAY).cast("long") * SECONDS_PER_DAY
    return (
        h.groupBy("metric", day.alias("day_ts"))
        .agg(
            F.round(F.sum("sum_v"), 4).alias("sum_v"),
            F.sum("n").cast("long").alias("n"),
            F.round(F.min("min_v"), 4).alias("min_v"),
            F.round(F.max("max_v"), 4).alias("max_v"),
            # avg derives from the ROUNDED sum so both engines divide
            # identical doubles; n/8-style divisions land exactly on
            # half-ties, which model.dround resolves Spark-identically
            F.round(F.round(F.sum("sum_v"), 4) / F.sum("n"), 4).alias(
                "avg_v"
            ),
        )
    )


def rollup_grid_sliding(
    spark: SparkSession, sf_dir: str, rollup: DataFrame | None = None
) -> DataFrame:
    """A LONG-RANGE SLIDING GRID answered from the rollup tier — the
    single biggest read-volume lever at 100 TB: per user, the 72h
    rolling click volume at every daily grid instant over the trailing
    240h, reading ONE ROW PER SERIES-HOUR instead of raw samples
    (3-4 orders fewer rows; the oracle recomputes the same windows
    from RAW samples, proving the routing lossless).

    Window convention: hour-aligned [end−72h, end) windows — the
    closed-open tiling where rollup hours compose exactly (PromQL's
    (lo, hi] boundary needs per-hour boundary samples, which the tier
    doesn't store; grid ends are day-aligned so every window is a
    whole number of hours).

    `rollup` lets the caller pass the MATERIALIZED tier (the
    production shape — tests pin that the plan then scans only the
    rollup relation, never raw events); by default the tier is derived
    inline from the same raw scan.
    """
    h = rollup if rollup is not None else _hourly(spark, sf_dir)
    h = h.filter(F.col("metric") == "click")
    tend = h.agg((F.max("hour_ts") + 3600).alias("t_end"))
    grid = (
        tend.select(
            "t_end",
            F.explode(F.sequence(F.lit(0), F.lit(10))).alias("k"),
        )
        .select(
            "t_end",
            (
                F.expr("(t_end div 86400) * 86400")
                - F.col("k") * 86400
            ).alias("ets"),
        )
        .filter(F.col("ets") > F.col("t_end") - 10 * SECONDS_PER_DAY)
        .select("ets")
    )
    j = h.join(
        F.broadcast(grid),
        (F.col("hour_ts") >= F.col("ets") - 3 * SECONDS_PER_DAY)
        & (F.col("hour_ts") < F.col("ets")),
    )
    return (
        j.groupBy("label_user", F.col("ets").alias("win_end"))
        .agg(F.round(F.sum("sum_v"), 4).alias("sum_v"))
    )


QUERIES = {
    "rollup_hourly": rollup_hourly,
    "daily_from_rollup": daily_from_rollup,
    "rollup_grid_sliding": rollup_grid_sliding,
}

_DAY_SQL = f"(({_HOUR_SQL}) // {SECONDS_PER_DAY}) * {SECONDS_PER_DAY}"

ORACLES = {
    "rollup_hourly": (
        f"{SAMPLES_CTE}, d AS (SELECT metric, label_user, "
        f"{_HOUR_SQL} AS hour_ts, ts_us, value, "
        "ROW_NUMBER() OVER (PARTITION BY metric, label_user, "
        f"({_HOUR_SQL}) ORDER BY ts_us ASC, event_id ASC) AS rn_a, "
        "ROW_NUMBER() OVER (PARTITION BY metric, label_user, "
        f"({_HOUR_SQL}) ORDER BY ts_us DESC, event_id DESC) AS rn_d "
        "FROM samples) "
        "SELECT metric, label_user, hour_ts, "
        "ROUND(SUM(value), 4) AS sum_v, CAST(COUNT(*) AS BIGINT) AS n, "
        "ROUND(MIN(value), 4) AS min_v, ROUND(MAX(value), 4) AS max_v, "
        "ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 4) AS first_v, "
        "ROUND(MAX(CASE WHEN rn_d = 1 THEN value END), 4) AS last_v "
        "FROM d GROUP BY metric, label_user, hour_ts"
    ),
    # computed from RAW samples — the routing-losslessness proof
    "rollup_grid_sliding": (
        f"{SAMPLES_CTE}, te AS (SELECT "
        "((MAX(ts_us) // 3600000000) * 3600 + 3600) AS t_end "
        "FROM samples WHERE metric = 'click'), "
        "g AS (SELECT ((t_end // 86400) * 86400) - k.i * 86400 AS ets "
        "FROM te CROSS JOIN generate_series(0, 10) AS k(i) "
        "WHERE ((t_end // 86400) * 86400) - k.i * 86400 "
        f"> t_end - {10 * SECONDS_PER_DAY}) "
        "SELECT s.label_user, g.ets AS win_end, "
        "ROUND(SUM(s.value), 4) AS sum_v "
        "FROM samples s JOIN g "
        f"ON s.ts_us >= (g.ets - {3 * SECONDS_PER_DAY}) * 1000000 "
        "AND s.ts_us < g.ets * 1000000 "
        "WHERE s.metric = 'click' GROUP BY s.label_user, g.ets"
    ),
    # computed from RAW samples — the losslessness proof
    "daily_from_rollup": (
        f"{SAMPLES_CTE} "
        f"SELECT metric, {_DAY_SQL} AS day_ts, "
        "ROUND(SUM(value), 4) AS sum_v, CAST(COUNT(*) AS BIGINT) AS n, "
        "ROUND(MIN(value), 4) AS min_v, ROUND(MAX(value), 4) AS max_v, "
        f"{dround('ROUND(SUM(value), 4) / COUNT(*)', 4)} AS avg_v "
        "FROM samples GROUP BY metric, day_ts"
    ),
}
