"""Vector binary operations (Tier B, public PromQL).

PromQL binary ops (`+ - * / % ^`, comparisons) join two instant vectors
on their label sets (`on`/`ignoring`). The engine's only join over
metric data: an equi-join on the matching labels. Spark picks the
physical strategy — for per-metric vectors (≤ #labels rows) AQE turns
this into a broadcast hash join automatically; the demo pins one side
broadcast to show intent.

Semantics demo: `sum(purchase) by (user) / sum(click) by (user)` —
revenue per click per user, inner-matched like PromQL vector matching
(series present on both sides only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shards_prometheus_spark.model import SAMPLES_CTE, dround, samples

LHS_METRIC = "purchase"
RHS_METRIC = "click"


def _side(s: DataFrame, metric: str, out: str) -> DataFrame:
    return (
        s.filter(F.col("metric") == metric)
        .groupBy("label_user")
        .agg(F.round(F.sum("value"), 4).alias(out))
    )


def vector_binop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sum by(user)(purchase) / sum by(user)(click)` with on(user) match."""
    s = samples(spark, sf_dir)
    lhs = _side(s, LHS_METRIC, "lhs_sum")
    rhs = _side(s, RHS_METRIC, "rhs_sum")
    # Both sides collapse to #users rows; broadcast the right side.
    return lhs.join(F.broadcast(rhs), "label_user").select(
        "label_user",
        "lhs_sum",
        "rhs_sum",
        F.round(F.col("lhs_sum") / F.col("rhs_sum"), 6).alias("ratio"),
    )


def vector_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL comparison between vectors: `lhs > rhs` filter semantics
    (keep lhs series where the comparison holds, value = lhs) plus the
    `bool` modifier column (1/0 for every matched series)."""
    s = samples(spark, sf_dir)
    lhs = _side(s, LHS_METRIC, "lhs_sum")
    rhs = _side(s, RHS_METRIC, "rhs_sum")
    matched = lhs.join(F.broadcast(rhs), "label_user")
    return matched.select(
        "label_user",
        "lhs_sum",
        (F.col("lhs_sum") > F.col("rhs_sum")).cast("long").alias("gt_bool"),
    ).filter(F.col("gt_bool") == 1).unionByName(
        # bool-modifier rows (all matches, 0/1 value), tagged apart
        matched.select(
            F.concat(F.lit("bool:"), F.col("label_user")).alias("label_user"),
            F.col("lhs_sum"),
            (F.col("lhs_sum") > F.col("rhs_sum")).cast("long").alias("gt_bool"),
        )
    )


def vector_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL many-to-one matching (`group_left`): each series divided
    by a one-per-metric aggregate — here every series' share of its
    metric total, `sum by(metric,user)(x) / on(metric) group_left
    sum by(metric)(x)`.

    Expressed as a window over the per-series aggregate (one pass, no
    second scan or join: the "one" side is the window partition total).
    The oracle states the same join PromQL describes — equality proves
    the window form equivalent."""
    per_series = (
        samples(spark, sf_dir)
        .groupBy("metric", "label_user")
        .agg(F.round(F.sum("value"), 4).alias("series_sum"))
    )
    total = F.sum("series_sum").over(Window.partitionBy("metric"))
    return per_series.select(
        "metric",
        "label_user",
        "series_sum",
        F.round(F.col("series_sum") / total, 6).alias("share"),
    )


QUERIES = {
    "vector_binop": vector_binop,
    "vector_compare": vector_compare,
    "vector_share": vector_share,
}

ORACLES = {
    "vector_binop": (
        f"{SAMPLES_CTE}, lhs AS (SELECT label_user, ROUND(SUM(value), 4) AS lhs_sum "
        f"FROM samples WHERE metric = '{LHS_METRIC}' GROUP BY label_user), "
        "rhs AS (SELECT label_user, ROUND(SUM(value), 4) AS rhs_sum "
        f"FROM samples WHERE metric = '{RHS_METRIC}' GROUP BY label_user) "
        "SELECT lhs.label_user, lhs_sum, rhs_sum, "
        f"{dround('lhs_sum / rhs_sum', 6)} AS ratio "
        "FROM lhs JOIN rhs ON lhs.label_user = rhs.label_user"
    ),
    "vector_compare": (
        f"{SAMPLES_CTE}, lhs AS (SELECT label_user, ROUND(SUM(value), 4) AS lhs_sum "
        f"FROM samples WHERE metric = '{LHS_METRIC}' GROUP BY label_user), "
        "rhs AS (SELECT label_user, ROUND(SUM(value), 4) AS rhs_sum "
        f"FROM samples WHERE metric = '{RHS_METRIC}' GROUP BY label_user), "
        "m AS (SELECT lhs.label_user, lhs_sum, rhs_sum "
        "FROM lhs JOIN rhs ON lhs.label_user = rhs.label_user) "
        "SELECT label_user, lhs_sum, "
        "CAST(CASE WHEN lhs_sum > rhs_sum THEN 1 ELSE 0 END AS BIGINT) AS gt_bool "
        "FROM m WHERE lhs_sum > rhs_sum "
        "UNION ALL "
        "SELECT 'bool:' || label_user, lhs_sum, "
        "CAST(CASE WHEN lhs_sum > rhs_sum THEN 1 ELSE 0 END AS BIGINT) "
        "FROM m"
    ),
    "vector_share": (
        f"{SAMPLES_CTE}, ps AS (SELECT metric, label_user, "
        "ROUND(SUM(value), 4) AS series_sum FROM samples "
        "GROUP BY metric, label_user), "
        "tot AS (SELECT metric, SUM(series_sum) AS t FROM ps GROUP BY metric) "
        "SELECT ps.metric, ps.label_user, ps.series_sum, "
        f"{dround('ps.series_sum / tot.t', 6)} AS share "
        "FROM ps JOIN tot ON ps.metric = tot.metric"
    ),
}
