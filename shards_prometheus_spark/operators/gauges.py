"""Gauge + instant-vector operators.

Tier A `Prometheus.Gauge` (reference prometheus.cpp:217-252): Set(x) is
last-write-wins per series (prometheus.cpp:248-251). Declarative form:
latest row per (metric, label) by event time — a ROW_NUMBER window with
a total order (ts_us DESC, event_id DESC). We do NOT replicate the
reference's family-cache bug (gauge warmup consults the counters map,
prometheus.cpp:225 — SURVEY.md §2a#3).

Tier B instant-vector selector / `offset` (public PromQL): the latest
sample per series at evaluation time T within a staleness lookback
window; `offset d` shifts T back by d. T here is data-derived
(max ts) so the same query text is meaningful at every scale factor.

Scale notes: the scalar max-ts aggregate is broadcast-joined (1 row)
rather than collected, so the plan stays fully distributed; the
row_number window shuffles once on the series key. At 100 TB the
lookback filter prunes to the last partitions via ts_us row-group stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shards_prometheus_spark.model import SAMPLES_CTE, samples

MICROS_PER_HOUR = 3_600_000_000
MICROS_PER_DAY = 24 * MICROS_PER_HOUR

def _latest_window():
    # Built lazily: Window specs require an active session.
    return Window.partitionBy("metric", "label_user").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )


def gauge_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-write-wins value per series (prometheus.cpp:248-251)."""
    return (
        samples(spark, sf_dir)
        .withColumn("rn", F.row_number().over(_latest_window()))
        .filter(F.col("rn") == 1)
        .select(
            "metric",
            "label_user",
            F.round("value", 4).alias("last_value"),
            F.expr("ts_us div 1000000").alias("last_ts_s"),
        )
    )


def _instant(spark: SparkSession, sf_dir: str, offset_us: int) -> DataFrame:
    s = samples(spark, sf_dir)
    at = s.agg((F.max("ts_us") - F.lit(offset_us)).alias("t_eval"))
    return (
        s.join(F.broadcast(at))  # 1-row scalar, broadcast cross join
        .filter(
            (F.col("ts_us") <= F.col("t_eval"))
            & (F.col("ts_us") > F.col("t_eval") - F.lit(MICROS_PER_HOUR))
        )
        .withColumn("rn", F.row_number().over(_latest_window()))
        .filter(F.col("rn") == 1)
        .select(
            "metric",
            "label_user",
            F.round("value", 4).alias("value"),
            F.expr("ts_us div 1000000").alias("ts_s"),
        )
    )


def instant_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest sample per series at T = max(ts), 1h staleness lookback."""
    return _instant(spark, sf_dir, 0)


def offset_instant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same selector evaluated at T - 24h (PromQL ``offset 1d``)."""
    return _instant(spark, sf_dir, MICROS_PER_DAY)


def _instant_sql(offset_us: int) -> str:
    return (
        f"{SAMPLES_CTE}, m AS (SELECT MAX(ts_us) - {offset_us} AS t_eval FROM samples), "
        "w AS (SELECT s.*, ROW_NUMBER() OVER (PARTITION BY metric, label_user "
        "ORDER BY ts_us DESC, event_id DESC) AS rn "
        f"FROM samples s, m WHERE s.ts_us <= m.t_eval AND s.ts_us > m.t_eval - {MICROS_PER_HOUR}) "
        "SELECT metric, label_user, ROUND(value, 4) AS value, "
        "ts_us // 1000000 AS ts_s FROM w WHERE rn = 1"
    )


QUERIES = {
    "gauge_last": gauge_last,
    "instant_vector": instant_vector,
    "offset_instant": offset_instant,
}

ORACLES = {
    "gauge_last": (
        f"{SAMPLES_CTE}, w AS (SELECT s.*, ROW_NUMBER() OVER ("
        "PARTITION BY metric, label_user ORDER BY ts_us DESC, event_id DESC) AS rn "
        "FROM samples s) "
        "SELECT metric, label_user, ROUND(value, 4) AS last_value, "
        "ts_us // 1000000 AS last_ts_s FROM w WHERE rn = 1"
    ),
    "instant_vector": _instant_sql(0),
    "offset_instant": _instant_sql(MICROS_PER_DAY),
}
