"""Label matchers and existence checks (Tier B, public PromQL).

Label matchers (`=`, `!=`, `=~`, `!~`) filter series by label values;
in the reference, labels are attached at series creation
(prometheus.cpp:190-198) and matching happens in the external PromQL
layer. Declaratively these are plain filters over the samples view —
exactly what Catalyst pushes into the parquet scan (PushedFilters), so
at 100 TB an equality matcher on `metric` prunes partitions and a label
filter prunes row groups.

`absent` (PromQL): 1 for each probed series selector that matches no
series — an anti-join of a tiny probe dimension against the distinct
series keys; Spark broadcasts the probe side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shards_prometheus_spark.model import MICROS_PER_HOUR, SAMPLES_CTE, samples

_ROW_COLS = ["event_id", "metric", "label_user", "ts_us"]


def label_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`{metric="purchase", user="13"}` — exact label equality matcher.

    Uses the MAP<STRING,STRING> labels column (general Prometheus label
    model; the reference supports one pair, prometheus.cpp:105-110).
    """
    return (
        samples(spark, sf_dir)
        .filter(
            (F.col("metric") == "purchase")
            & (F.element_at("labels", F.lit("user")) == "13")
        )
        .select(*_ROW_COLS, F.round("value", 4).alias("value"))
    )


def label_filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`{metric=~"click|view", user=~"1[0-9]"}` — regex matchers."""
    return (
        samples(spark, sf_dir)
        .filter(
            F.col("metric").rlike("^(click|view)$")
            & F.col("label_user").rlike("^1[0-9]$")
        )
        .select(*_ROW_COLS, F.round("value", 4).alias("value"))
    )


#: Probe selectors for `absent`: one matching metric, one not.
ABSENT_PROBES = ["purchase", "no_such_metric_xyz"]


def absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``absent``: 1 per probe with no matching series."""
    probes = spark.createDataFrame(
        [(p,) for p in ABSENT_PROBES], "probe_metric string"
    )
    present = samples(spark, sf_dir).select("metric").distinct()
    return (
        probes.join(
            present, probes.probe_metric == present.metric, "left_anti"
        ).select(
            F.col("probe_metric").alias("metric"),
            F.lit(1).cast("long").alias("absent"),
        )
    )


def absent_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``absent_over_time(…[1h])`` on the hour grid: 1 for each
    (metric ∪ probes) × hour combination with no samples.

    Both grid dimensions are tiny (the series universe and the hour
    range — never the corpus), so the cross join broadcasts; the
    anti-join runs against the DISTINCT (metric, hour) pairs, which is
    rollup-sized, not raw-sized."""
    hour_ts = F.expr(f"ts_us div {MICROS_PER_HOUR}") * 3600
    observed = (
        samples(spark, sf_dir)
        .select("metric", hour_ts.alias("hour_ts"))
        .distinct()
    )
    metrics = (
        observed.select("metric")
        .unionByName(
            spark.createDataFrame(
                [(p,) for p in ABSENT_PROBES], "metric string"
            )
        )
        .distinct()
    )
    hours = observed.select("hour_ts").distinct()
    return (
        metrics.crossJoin(hours)
        .join(observed, ["metric", "hour_ts"], "left_anti")
        .select("metric", "hour_ts", F.lit(1).cast("long").alias("absent"))
    )


def present_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``present_over_time(…[1h])``: 1 for each (series, hour)
    with at least one sample — the positive complement of
    `absent_over_time` (same rollup-sized distinct relation)."""
    hour_ts = F.expr(f"ts_us div {MICROS_PER_HOUR}") * 3600
    return (
        samples(spark, sf_dir)
        .select("metric", "label_user", hour_ts.alias("hour_ts"))
        .distinct()
        .withColumn("present", F.lit(1).cast("long"))
    )


def series_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Prometheus metadata surface (`/api/v1/series`,
    `label_values` — what a scraper's UI asks the registry) as one
    relation: per metric, live series count, sample count, and the
    first/last sample time. One aggregation pass."""
    return (
        samples(spark, sf_dir)
        .groupBy("metric")
        .agg(
            F.countDistinct("label_user").cast("long").alias("n_series"),
            F.count(F.lit(1)).cast("long").alias("n_samples"),
            F.min("ts_us").alias("first_ts_us"),
            F.max("ts_us").alias("last_ts_us"),
        )
    )


_probe_values = ", ".join(f"('{p}')" for p in ABSENT_PROBES)

QUERIES = {
    "label_filter_eq": label_filter_eq,
    "label_filter_regex": label_filter_regex,
    "absent": absent,
    "absent_over_time": absent_over_time,
    "present_over_time": present_over_time,
    "series_catalog": series_catalog,
}

ORACLES = {
    "label_filter_eq": (
        f"{SAMPLES_CTE} "
        "SELECT event_id, metric, label_user, ts_us, ROUND(value, 4) AS value "
        "FROM samples WHERE metric = 'purchase' AND label_user = '13'"
    ),
    "label_filter_regex": (
        f"{SAMPLES_CTE} "
        "SELECT event_id, metric, label_user, ts_us, ROUND(value, 4) AS value "
        "FROM samples WHERE regexp_matches(metric, '^(click|view)$') "
        "AND regexp_matches(label_user, '^1[0-9]$')"
    ),
    "absent": (
        f"{SAMPLES_CTE}, probes(probe_metric) AS (VALUES {_probe_values}) "
        "SELECT probe_metric AS metric, CAST(1 AS BIGINT) AS absent "
        "FROM probes WHERE probe_metric NOT IN (SELECT DISTINCT metric FROM samples)"
    ),
    "absent_over_time": (
        f"{SAMPLES_CTE}, obs AS (SELECT DISTINCT metric, "
        f"(ts_us // {MICROS_PER_HOUR}) * 3600 AS hour_ts FROM samples), "
        "mets AS (SELECT DISTINCT metric FROM obs "
        f"UNION SELECT probe_metric FROM (VALUES {_probe_values}) "
        "p(probe_metric)), "
        "hrs AS (SELECT DISTINCT hour_ts FROM obs) "
        "SELECT m.metric, h.hour_ts, CAST(1 AS BIGINT) AS absent "
        "FROM mets m CROSS JOIN hrs h "
        "LEFT JOIN obs o ON o.metric = m.metric AND o.hour_ts = h.hour_ts "
        "WHERE o.metric IS NULL"
    ),
    "present_over_time": (
        f"{SAMPLES_CTE} "
        "SELECT DISTINCT metric, label_user, "
        f"(ts_us // {MICROS_PER_HOUR}) * 3600 AS hour_ts, "
        "CAST(1 AS BIGINT) AS present FROM samples"
    ),
    "series_catalog": (
        f"{SAMPLES_CTE} "
        "SELECT metric, CAST(COUNT(DISTINCT label_user) AS BIGINT) AS n_series, "
        "CAST(COUNT(*) AS BIGINT) AS n_samples, "
        "MIN(ts_us) AS first_ts_us, MAX(ts_us) AS last_ts_us "
        "FROM samples GROUP BY metric"
    ),
}
