"""PromQL function family: label manipulation + scalar math.

- ``label_replace`` — regex-capture a new label from an existing one
  (PromQL ``label_replace(v, dst, "$1", src, regex)``).
- ``label_join``   — join labels into a new label with a separator.
- ``clamp_values`` — ``clamp`` / ``clamp_min`` / ``clamp_max``.
- ``math_scalar_funcs`` — ``abs``/``ceil``/``floor``/``sqrt``/``round``
  (the IEEE-correctly-rounded subset, so Spark and DuckDB agree
  bit-for-bit; transcendental libm functions are deliberately excluded
  from the oracle-checked surface).

Label functions run on the distinct-series relation (small by
construction, like the reference's registry, prometheus.cpp:34-45);
scalar math runs on a metric-filtered slice, which Catalyst pushes into
the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shards_prometheus_spark.model import SAMPLES_CTE, samples

#: Dialect-safe capture: first digit of the user label ([0-9], no \\d).
_REPLACE_PATTERN = "^([0-9])"
_JOIN_SEP = "/"
CLAMP_LO = 10.0
CLAMP_HI = 100.0


def _series(spark: SparkSession, sf_dir: str) -> DataFrame:
    return samples(spark, sf_dir).select("metric", "label_user").distinct()


def label_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """user_group := first digit of the user label (regex capture)."""
    return _series(spark, sf_dir).select(
        "metric",
        "label_user",
        F.regexp_extract("label_user", _REPLACE_PATTERN, 1).alias(
            "user_group"
        ),
    )


def label_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """series_key := metric '/' user — PromQL label_join."""
    return _series(spark, sf_dir).select(
        "metric",
        "label_user",
        F.concat_ws(_JOIN_SEP, "metric", "label_user").alias("series_key"),
    )


def clamp_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clamp / clamp_min / clamp_max over the purchase series."""
    v = F.col("value")
    return (
        samples(spark, sf_dir)
        .filter(F.col("metric") == "purchase")
        .select(
            "event_id",
            "label_user",
            F.round(F.least(F.greatest(v, F.lit(CLAMP_LO)), F.lit(CLAMP_HI)), 4)
            .alias("clamped"),
            F.round(F.greatest(v, F.lit(CLAMP_LO)), 4).alias("clamp_min"),
            F.round(F.least(v, F.lit(CLAMP_HI)), 4).alias("clamp_max"),
        )
    )


def math_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/ceil/floor/sqrt/round over the purchase series."""
    v = F.col("value")
    return (
        samples(spark, sf_dir)
        .filter(F.col("metric") == "purchase")
        .select(
            "event_id",
            F.round(F.abs(v), 4).alias("abs_v"),
            F.ceil(v).cast("double").alias("ceil_v"),
            F.floor(v).cast("double").alias("floor_v"),
            F.round(F.sqrt(F.abs(v)), 4).alias("sqrt_abs_v"),
            F.round(v, 2).alias("round_v"),
        )
    )


def props_label_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promote a JSON event property to a label and aggregate by it —
    the structured-metadata analog of label_replace (`props` carries
    `{"k": N}`; k mod 10 becomes the label to keep cardinality sane)."""
    from shards_prometheus_spark.model import load_table

    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select(
            F.col("event_type").alias("metric"),
            (k % 10).cast("string").alias("label_k"),
            "value",
        )
        .filter(F.col("label_k").isNotNull())
        .groupBy("metric", "label_k")
        .agg(
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


def time_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL time functions (``minute``/``hour``/``day_of_week``/
    ``day_of_month``/``month``/``year``) over sample timestamps, UTC.

    minute/hour/day_of_week are pure int64 arithmetic on ts_us —
    engine-portable by construction (PromQL defines day_of_week as
    0=Sunday; epoch day 0 is a Thursday, hence the +4). Calendar parts
    use engine date functions pinned to the UTC session timezone."""
    ts = F.timestamp_micros(F.col("ts_us"))
    return samples(spark, sf_dir).select(
        "event_id",
        F.expr("(ts_us div 60000000) % 60").alias("minute"),
        F.expr("(ts_us div 3600000000) % 24").alias("hour"),
        F.expr("((ts_us div 86400000000) + 4) % 7").alias("day_of_week"),
        F.dayofmonth(ts).cast("long").alias("day_of_month"),
        F.month(ts).cast("long").alias("month"),
        F.year(ts).cast("long").alias("year"),
    )


QUERIES = {
    "time_components": time_components,
    "label_replace": label_replace,
    "label_join": label_join,
    "clamp_values": clamp_values,
    "math_scalar_funcs": math_scalar_funcs,
    "props_label_agg": props_label_agg,
}

_SERIES_SQL = (
    f"{SAMPLES_CTE} SELECT DISTINCT metric, label_user FROM samples"
)

ORACLES = {
    "time_components": (
        f"{SAMPLES_CTE} "
        "SELECT event_id, (ts_us // 60000000) % 60 AS minute, "
        "(ts_us // 3600000000) % 24 AS hour, "
        "((ts_us // 86400000000) + 4) % 7 AS day_of_week, "
        "CAST(day(make_timestamp(ts_us)) AS BIGINT) AS day_of_month, "
        "CAST(month(make_timestamp(ts_us)) AS BIGINT) AS month, "
        "CAST(year(make_timestamp(ts_us)) AS BIGINT) AS year "
        "FROM samples"
    ),
    "label_replace": (
        f"{SAMPLES_CTE}, ser AS (SELECT DISTINCT metric, label_user "
        "FROM samples) SELECT metric, label_user, "
        f"COALESCE(regexp_extract(label_user, '{_REPLACE_PATTERN}', 1), '') "
        "AS user_group FROM ser"
    ),
    "label_join": (
        f"{SAMPLES_CTE}, ser AS (SELECT DISTINCT metric, label_user "
        "FROM samples) SELECT metric, label_user, "
        f"metric || '{_JOIN_SEP}' || label_user AS series_key FROM ser"
    ),
    "clamp_values": (
        f"{SAMPLES_CTE} SELECT event_id, label_user, "
        f"ROUND(LEAST(GREATEST(value, {CLAMP_LO}), {CLAMP_HI}), 4) AS clamped, "
        f"ROUND(GREATEST(value, {CLAMP_LO}), 4) AS clamp_min, "
        f"ROUND(LEAST(value, {CLAMP_HI}), 4) AS clamp_max "
        "FROM samples WHERE metric = 'purchase'"
    ),
    "math_scalar_funcs": (
        f"{SAMPLES_CTE} SELECT event_id, "
        "ROUND(ABS(value), 4) AS abs_v, "
        "CAST(CEIL(value) AS DOUBLE) AS ceil_v, "
        "CAST(FLOOR(value) AS DOUBLE) AS floor_v, "
        "ROUND(SQRT(ABS(value)), 4) AS sqrt_abs_v, "
        "ROUND(value, 2) AS round_v "
        "FROM samples WHERE metric = 'purchase'"
    ),
    "props_label_agg": (
        "SELECT event_type AS metric, "
        "CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 "
        "AS VARCHAR) AS label_k, "
        "ROUND(SUM(value), 4) AS sum_value, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL "
        "GROUP BY metric, label_k"
    ),
}
