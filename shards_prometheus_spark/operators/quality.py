"""Data-quality / operational audit queries.

The reference enforces quality inline, per sample, by raising
(negative-increment guard prometheus.cpp:209-211; bucket type
assertions prometheus.cpp:266-267). At batch scale the same checks run
as an audit sweep instead — one conditional-aggregation pass over the
corpus producing a violation report, plus the staleness report a
Prometheus operator reads off `/api/v1/targets` (stale series =
scrapes that stopped arriving).

Both are single-scan: the report is one aggregate with conditional
sums unpivoted via ``stack`` (no per-check scans), the staleness query
one grouped aggregate joined to its broadcast scalar max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shards_prometheus_spark.model import SAMPLES_CTE, samples

#: Valid sample-time window: years 2000-2100 in epoch microseconds.
TS_LO_US = 946_684_800_000_000
TS_HI_US = 4_102_444_800_000_000
#: Staleness horizon: 7 days in microseconds.
STALE_US = 604_800_000_000

_CHECKS = [
    "null_value",
    "null_metric",
    "negative_value",
    "ts_out_of_range",
    "dup_event_id",
]


def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Violation counts per audit check, one scan (the reference's
    per-sample guards, prometheus.cpp:209-211/:266-267, as a batch
    sweep). All-zero counts are the healthy-corpus assertion, verified
    against the oracle like any other value."""
    s = samples(spark, sf_dir)
    ts_bad = (F.col("ts_us") < TS_LO_US) | (F.col("ts_us") >= TS_HI_US)
    agg = s.agg(
        F.sum(F.col("value").isNull().cast("long")).alias("null_value"),
        F.sum(F.col("metric").isNull().cast("long")).alias("null_metric"),
        F.sum((F.col("value") < 0).cast("long")).alias("negative_value"),
        F.sum(ts_bad.cast("long")).alias("ts_out_of_range"),
        (F.count(F.lit(1)) - F.countDistinct("event_id"))
        .cast("long")
        .alias("dup_event_id"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
    )
    stack = ", ".join(f"'{c}', {c}" for c in _CHECKS)
    return agg.selectExpr(
        f"stack({len(_CHECKS)}, {stack}) AS (check_name, n_violations)",
        "n_checked",
    )


def stale_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series whose last sample is > 7 days older than the newest
    sample anywhere — the series an operator would mark stale/dead."""
    s = (
        samples(spark, sf_dir)
        .groupBy("metric", "label_user")
        .agg(F.max("ts_us").alias("last_ts_us"))
    )
    mx = s.agg(F.max("last_ts_us").alias("mx"))
    return (
        s.crossJoin(F.broadcast(mx))
        .filter(F.col("last_ts_us") < F.col("mx") - STALE_US)
        .select(
            "metric",
            "label_user",
            "last_ts_us",
            (F.col("mx") - F.col("last_ts_us")).alias("age_us"),
        )
    )


QUERIES = {
    "data_quality_report": data_quality_report,
    "stale_series": stale_series,
}

_AGG_SQL = (
    f"{SAMPLES_CTE}, a AS (SELECT "
    "CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value, "
    "CAST(SUM(CASE WHEN metric IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_metric, "
    "CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_value, "
    f"CAST(SUM(CASE WHEN ts_us < {TS_LO_US} OR ts_us >= {TS_HI_US} "
    "THEN 1 ELSE 0 END) AS BIGINT) AS ts_out_of_range, "
    "CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) AS dup_event_id, "
    "CAST(COUNT(*) AS BIGINT) AS n_checked FROM samples)"
)

ORACLES = {
    "data_quality_report": (
        _AGG_SQL
        + " "
        + " UNION ALL ".join(
            f"SELECT '{c}' AS check_name, {c} AS n_violations, n_checked FROM a"
            for c in _CHECKS
        )
    ),
    "stale_series": (
        f"{SAMPLES_CTE}, s AS (SELECT metric, label_user, "
        "MAX(ts_us) AS last_ts_us FROM samples GROUP BY metric, label_user), "
        "g AS (SELECT MAX(last_ts_us) AS mx FROM s) "
        "SELECT s.metric, s.label_user, s.last_ts_us, "
        "g.mx - s.last_ts_us AS age_us "
        f"FROM s, g WHERE s.last_ts_us < g.mx - {STALE_US}"
    ),
}
