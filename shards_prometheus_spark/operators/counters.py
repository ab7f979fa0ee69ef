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

from shards_prometheus_spark.model import (
    MICROS_PER_HOUR,
    SAMPLES_CTE,
    dround,
    samples,
)
from shards_prometheus_spark.registry_api import MetricsRegistry

def _series_window():
    # Built lazily: Window specs require an active session.
    return Window.partitionBy("metric", "label_user").orderBy(
        "ts_us", "event_id"
    )


def counter_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total per series — the scrape-time value of a reference counter.

    Routed through the MetricsRegistry full-label-map spine (series
    identity = canonical label string; the negative-increment guard
    prometheus.cpp:209-212 lives there); this named query is the
    single-label projection at the output edge."""
    return MetricsRegistry(samples(spark, sf_dir)).counter_total().select(
        "metric",
        "label_user",
        F.round("total", 4).alias("sum_value"),
        "n_samples",
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
    """Hourly per-metric increase (PromQL ``increase`` over 1h buckets).

    Routed through MetricsRegistry.increase (full-label-map series
    identity for the reset-clamped lag); hour alias + 4dp pin applied
    at the output edge."""
    return (
        MetricsRegistry(samples(spark, sf_dir))
        .increase(3600)
        .select(
            "metric",
            F.col("window_ts").alias("hour_ts"),
            F.round("increase", 4).alias("increase"),
        )
    )


def counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-metric per-second rate (PromQL ``rate``)."""
    return (
        MetricsRegistry(samples(spark, sf_dir))
        .rate(3600)
        .select(
            "metric",
            F.col("window_ts").alias("hour_ts"),
            F.round("rate", 6).alias("rate"),
        )
    )


def counter_rate_extrapolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL's ACTUAL ``rate()``: the extrapolatedRate estimator
    (public Prometheus semantics, promql/functions.go) — the clamped
    per-range increase is extrapolated to the window boundaries, capped
    at half the average sample spacing when the first/last sample sits
    far inside the window, and limited by the zero-crossing point so a
    counter is never extrapolated below 0.

    The simple sum-of-deltas form stays available as ``counter_rate``;
    this one reproduces what a Prometheus server actually returns.
    Per-range evaluation: the lag is scoped to (series, hour), and all
    boundary arithmetic is int64-µs exact until the final divisions.
    The summed increase is pinned to 6 dp BEFORE feeding the
    extrapolation branches so cross-engine accumulation-order noise
    cannot flip a comparison.
    """
    s = samples(spark, sf_dir).withColumn(
        "hour_ts", F.expr(f"ts_us div {MICROS_PER_HOUR}") * 3600
    )
    keys = ["metric", "label_user", "hour_ts"]
    w = Window.partitionBy(*keys).orderBy("ts_us", "event_id")
    d = s.withColumn("prev", F.lag("value").over(w)).withColumn(
        "rn", F.row_number().over(w)
    )
    delta = F.when(F.col("value") < F.col("prev"), F.col("value")).otherwise(
        F.col("value") - F.col("prev")
    )
    agg = (
        d.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts_us").alias("first_ts"),
            F.max("ts_us").alias("last_ts"),
            F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("first_v"),
            F.round(
                F.sum(F.when(F.col("prev").isNotNull(), delta)), 6
            ).alias("sum_d"),
        )
        .filter((F.col("n") >= 2) & (F.col("last_ts") > F.col("first_ts")))
    )
    ws = F.col("hour_ts") * F.lit(1_000_000)
    we = ws + F.lit(MICROS_PER_HOUR)
    si = (F.col("last_ts") - F.col("first_ts")).cast("double")
    dts = (F.col("first_ts") - ws).cast("double")
    dte = (we - F.col("last_ts")).cast("double")
    avg_dur = si / (F.col("n") - 1)
    thr = avg_dur * F.lit(1.1)
    # current Prometheus ordering: cap both edges at the extrapolation
    # threshold FIRST, then apply the counter zero-crossing clamp to
    # the (possibly capped) start-side duration
    dts1 = F.when(dts >= thr, avg_dur / 2).otherwise(dts)
    dte2 = F.when(dte >= thr, avg_dur / 2).otherwise(dte)
    dz = si * (F.col("first_v") / F.col("sum_d"))
    dts2 = F.when(
        (F.col("sum_d") > 0) & (F.col("first_v") >= 0) & (dz < dts1), dz
    ).otherwise(dts1)
    rate = F.col("sum_d") * ((si + dts2 + dte2) / si) / F.lit(3600.0)
    return agg.select(
        *keys,
        F.col("n").cast("long").alias("n_samples"),
        F.round(rate, 6).alias("rate"),
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
    "counter_rate_extrapolated": counter_rate_extrapolated,
}

_HR = MICROS_PER_HOUR
_EXTRAP_SQL = (
    f"{SAMPLES_CTE}, d AS (SELECT metric, label_user, "
    f"(ts_us // {_HR}) * 3600 AS hour_ts, ts_us, value, "
    "LAG(value) OVER (PARTITION BY metric, label_user, "
    f"(ts_us // {_HR}) ORDER BY ts_us, event_id) AS prev, "
    "ROW_NUMBER() OVER (PARTITION BY metric, label_user, "
    f"(ts_us // {_HR}) ORDER BY ts_us, event_id) AS rn FROM samples), "
    "a AS (SELECT metric, label_user, hour_ts, "
    "CAST(COUNT(*) AS BIGINT) AS n, MIN(ts_us) AS first_ts, "
    "MAX(ts_us) AS last_ts, MAX(CASE WHEN rn = 1 THEN value END) "
    "AS first_v, "
    + dround(
        "SUM(CASE WHEN prev IS NOT NULL THEN "
        "CASE WHEN value < prev THEN value ELSE value - prev END END)",
        6,
    )
    + " AS sum_d FROM d GROUP BY metric, label_user, hour_ts), "
    "f AS (SELECT *, CAST(last_ts - first_ts AS DOUBLE) AS si, "
    "CAST(first_ts - hour_ts * 1000000 AS DOUBLE) AS dts, "
    f"CAST(hour_ts * 1000000 + {_HR} - last_ts AS DOUBLE) AS dte "
    "FROM a WHERE n >= 2 AND last_ts > first_ts), "
    "g AS (SELECT *, si / (n - 1) AS avg_dur, "
    "si * (first_v / sum_d) AS dz FROM f), "
    "h AS (SELECT *, CASE WHEN dts >= avg_dur * 1.1 THEN avg_dur / 2 "
    "ELSE dts END AS dts1, "
    "CASE WHEN dte >= avg_dur * 1.1 THEN avg_dur / 2 ELSE dte END "
    "AS dte2 FROM g), "
    "i AS (SELECT *, CASE WHEN sum_d > 0 AND first_v >= 0 AND dz < dts1 "
    "THEN dz ELSE dts1 END AS dts2 FROM h) "
    "SELECT metric, label_user, hour_ts, n AS n_samples, "
    + dround("sum_d * ((si + dts2 + dte2) / si) / 3600.0", 6)
    + " AS rate FROM i"
)

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
    "counter_rate_extrapolated": _EXTRAP_SQL,
}
