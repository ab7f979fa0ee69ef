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
from shards_prometheus_spark.registry_api import MetricsRegistry

MICROS_PER_HOUR = 3_600_000_000
MICROS_PER_DAY = 24 * MICROS_PER_HOUR


def gauge_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-write-wins value per series (prometheus.cpp:248-251).

    Routed through the MetricsRegistry full-label-map spine (the
    row_number window partitions on the canonical label string); this
    named query projects the flat single-label shape at the edge."""
    return MetricsRegistry(samples(spark, sf_dir)).gauge_last().select(
        "metric",
        "label_user",
        F.round("last", 4).alias("last_value"),
        F.expr("ts_us div 1000000").alias("last_ts_s"),
    )


def _instant(spark: SparkSession, sf_dir: str, offset_us: int) -> DataFrame:
    reg = MetricsRegistry(samples(spark, sf_dir))
    return reg.instant(
        at_ts_us=None, lookback_us=MICROS_PER_HOUR, offset_us=offset_us
    ).select(
        "metric",
        "label_user",
        F.round("value", 4).alias("value"),
        F.expr("ts_us div 1000000").alias("ts_s"),
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
