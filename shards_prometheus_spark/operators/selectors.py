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

from shards_prometheus_spark.model import SAMPLES_CTE, samples

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


_probe_values = ", ".join(f"('{p}')" for p in ABSENT_PROBES)

QUERIES = {
    "label_filter_eq": label_filter_eq,
    "label_filter_regex": label_filter_regex,
    "absent": absent,
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
}
