"""Counter operators.

Tier A `Prometheus.Increment` (reference prometheus.cpp:177-215): a
monotonic per-series accumulator that rejects negative increments
(prometheus.cpp:209-212 "should be a positive number"). Re-expressed
declaratively: the negative-input guard becomes a filter, the cached
per-series accumulator (prometheus.cpp:178,185-199) becomes a
groupBy((metric, label)).sum() that Catalyst executes with map-side
partial aggregation — the distributed analog of the reference's O(1)
atomic add hot path.

Tier B `increase`/`rate` (PromQL semantics over counter series, public):
per-series time-ordered delta with counter-reset clamping (a decrease
means the counter restarted; the post-reset value itself is the
increase), bucketed into aligned windows.

Scale notes: the groupBy keys are (metric, label_user) — low cardinality
per metric; the window (lag) for increase shuffles once on the series
key and sorts within partitions, which AQE right-sizes. At 100 TB the
samples table is partitioned by (date, metric) so both operators scan
only the touched metrics/dates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shards_prometheus_spark.model import MICROS_PER_HOUR, SAMPLES_CTE, samples

def _series_window():
    # Built lazily: Window specs require an active session.
    return Window.partitionBy("metric", "label_user").orderBy(
        "ts_us", "event_id"
    )


def counter_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total per series — the scrape-time value of a reference counter."""
    return (
        samples(spark, sf_dir)
        .filter(F.col("value") >= 0)  # prometheus.cpp:209-212 guard
        .groupBy("metric", "label_user")
        .agg(
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.count(F.lit(1)).cast("long").alias("n_samples"),
        )
    )


def _deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series increase with PromQL counter-reset handling."""
    s = samples(spark, sf_dir)
    prev = F.col("prev")
    return (
        s.withColumn("prev", F.lag("value").over(_series_window()))
        .filter(prev.isNotNull())
        .withColumn(
            "delta",
            F.when(F.col("value") < prev, F.col("value")).otherwise(
                F.col("value") - prev
            ),
        )
    )


def _hour_ts() -> F.Column:
    # int64 µs → aligned hour start in epoch seconds; pure integer math,
    # bit-identical to DuckDB's (ts_us // 3600000000) * 3600.
    return (F.expr(f"ts_us div {MICROS_PER_HOUR}") * 3600).alias("hour_ts")


def counter_increase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-metric increase (PromQL ``increase`` over 1h buckets)."""
    return (
        _deltas(spark, sf_dir)
        .groupBy("metric", _hour_ts())
        .agg(F.round(F.sum("delta"), 4).alias("increase"))
    )


def counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-metric per-second rate (PromQL ``rate``)."""
    return (
        _deltas(spark, sf_dir)
        .groupBy("metric", _hour_ts())
        .agg(F.round(F.sum("delta") / F.lit(3600.0), 6).alias("rate"))
    )


_DELTAS_SQL = (
    f"{SAMPLES_CTE}, d AS ("
    " SELECT metric, label_user, ts_us, value,"
    " LAG(value) OVER (PARTITION BY metric, label_user"
    "   ORDER BY ts_us, event_id) AS prev"
    " FROM samples)"
    ", deltas AS (SELECT metric, (ts_us // 3600000000) * 3600 AS hour_ts,"
    " CASE WHEN value < prev THEN value ELSE value - prev END AS delta"
    " FROM d WHERE prev IS NOT NULL)"
)

QUERIES = {
    "counter_sum": counter_sum,
    "counter_increase": counter_increase,
    "counter_rate": counter_rate,
}

ORACLES = {
    "counter_sum": (
        f"{SAMPLES_CTE} "
        "SELECT metric, label_user, ROUND(SUM(value), 4) AS sum_value, "
        "CAST(COUNT(*) AS BIGINT) AS n_samples "
        "FROM samples WHERE value >= 0 GROUP BY metric, label_user"
    ),
    "counter_increase": (
        f"{_DELTAS_SQL} "
        "SELECT metric, hour_ts, ROUND(SUM(delta), 4) AS increase "
        "FROM deltas GROUP BY metric, hour_ts"
    ),
    "counter_rate": (
        f"{_DELTAS_SQL} "
        "SELECT metric, hour_ts, ROUND(SUM(delta) / 3600.0, 6) AS rate "
        "FROM deltas GROUP BY metric, hour_ts"
    ),
}
