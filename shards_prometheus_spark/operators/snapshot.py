"""Scrape snapshot — the read path of the reference's Exposer.

The reference's only "query" is the HTTP scrape: Registry::Collect()
snapshots every family → series → current value into the text
exposition format (registry registered as collectable at
prometheus.cpp:80; endpoint prometheus.cpp:47,73). Our analog is one
unioned batch query producing the same information: per-series counter
totals, gauge last-writes, and per-metric histogram `_sum`/`_count`
(bucket detail lives in `histogram_buckets`).

Shape: (kind, metric, label_user, stat, value) — a tall exposition
table, `unionByName` of the three kind queries, mirroring SURVEY.md
§2b #16. Each branch is an independent aggregate over the same scan;
Spark reuses the scan via its shared-relation planning, and each branch
combines map-side before the single shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shards_prometheus_spark.operators.counters import counter_sum
from shards_prometheus_spark.operators.gauges import gauge_last
from shards_prometheus_spark.operators.histograms import histogram_sum_count
from shards_prometheus_spark.model import SAMPLES_CTE


def scrape_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-registry snapshot: counter ∪ gauge ∪ histogram state."""
    counters = counter_sum(spark, sf_dir).select(
        F.lit("counter").alias("kind"),
        "metric",
        "label_user",
        F.lit("total").alias("stat"),
        F.col("sum_value").alias("value"),
    )
    gauges = gauge_last(spark, sf_dir).select(
        F.lit("gauge").alias("kind"),
        "metric",
        "label_user",
        F.lit("last").alias("stat"),
        F.col("last_value").alias("value"),
    )
    hist = histogram_sum_count(spark, sf_dir)
    hist_sum = hist.select(
        F.lit("histogram").alias("kind"),
        "metric",
        F.lit("").alias("label_user"),
        F.lit("sum").alias("stat"),
        F.col("hist_sum").alias("value"),
    )
    hist_count = hist.select(
        F.lit("histogram").alias("kind"),
        "metric",
        F.lit("").alias("label_user"),
        F.lit("count").alias("stat"),
        F.col("hist_count").cast("double").alias("value"),
    )
    return (
        counters.unionByName(gauges)
        .unionByName(hist_sum)
        .unionByName(hist_count)
    )


QUERIES = {"scrape_snapshot": scrape_snapshot}

ORACLES = {
    "scrape_snapshot": (
        f"{SAMPLES_CTE} "
        "SELECT 'counter' AS kind, metric, label_user, 'total' AS stat, "
        "ROUND(SUM(value), 4) AS value FROM samples WHERE value >= 0 "
        "GROUP BY metric, label_user "
        "UNION ALL "
        "SELECT 'gauge', metric, label_user, 'last', ROUND(value, 4) FROM ("
        "SELECT s.*, ROW_NUMBER() OVER (PARTITION BY metric, label_user "
        "ORDER BY ts_us DESC, event_id DESC) AS rn FROM samples s) WHERE rn = 1 "
        "UNION ALL "
        "SELECT 'histogram', metric, '', 'sum', ROUND(SUM(value), 4) "
        "FROM samples GROUP BY metric "
        "UNION ALL "
        "SELECT 'histogram', metric, '', 'count', CAST(COUNT(*) AS DOUBLE) "
        "FROM samples GROUP BY metric"
    ),
}
