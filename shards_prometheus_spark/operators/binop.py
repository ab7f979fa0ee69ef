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

from pyspark.sql import DataFrame, SparkSession
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


QUERIES = {"vector_binop": vector_binop}

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
}
