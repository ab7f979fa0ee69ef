"""OLAP constructs absent from the reference but required of a complete
analytics engine (SURVEY.md §2a "explicit absences": grouping
sets/cube/rollup, set operations).

- ``grouping_sets_agg`` — one pass producing per-(metric, label),
  per-metric, and grand-total aggregates (Spark ROLLUP ≡ DuckDB
  GROUPING SETS); at 100 TB this is one shuffle instead of three
  separate aggregation jobs, with map-side partial combine shared
  across all grouping levels.
- ``set_ops_users`` — INTERSECT / EXCEPT over per-metric user sets
  (retention-style audience queries), expressed as distinct-projection
  set operators that Catalyst plans as aggregates, not joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shards_prometheus_spark.model import SAMPLES_CTE, samples

SET_A_METRIC = "purchase"
SET_B_METRIC = "click"


def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(metric, label_user): series, per-metric and grand totals
    in one aggregation pass. NULL group keys are canonicalized to
    sentinel strings so both engines hash identical values."""
    return (
        samples(spark, sf_dir)
        .rollup("metric", "label_user")
        .agg(
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            F.coalesce("metric", F.lit("<all>")).alias("metric"),
            F.coalesce("label_user", F.lit("<all>")).alias("label_user"),
            "sum_value",
            "n",
        )
    )


def set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set algebra: users in A∩B, A∖B and B∖A, tagged."""
    s = samples(spark, sf_dir)
    a = s.filter(F.col("metric") == SET_A_METRIC).select("label_user").distinct()
    b = s.filter(F.col("metric") == SET_B_METRIC).select("label_user").distinct()
    both = a.intersect(b).select(
        F.lit("both").alias("set_op"), "label_user"
    )
    only_a = a.exceptAll(b).select(
        F.lit("only_a").alias("set_op"), "label_user"
    )
    only_b = b.exceptAll(a).select(
        F.lit("only_b").alias("set_op"), "label_user"
    )
    return both.unionByName(only_a).unionByName(only_b)


QUERIES = {
    "grouping_sets_agg": grouping_sets_agg,
    "set_ops_users": set_ops_users,
}

ORACLES = {
    "grouping_sets_agg": (
        f"{SAMPLES_CTE} "
        "SELECT COALESCE(metric, '<all>') AS metric, "
        "COALESCE(label_user, '<all>') AS label_user, "
        "ROUND(SUM(value), 4) AS sum_value, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM samples GROUP BY GROUPING SETS "
        "((metric, label_user), (metric), ())"
    ),
    "set_ops_users": (
        f"{SAMPLES_CTE}, a AS (SELECT DISTINCT label_user FROM samples "
        f"WHERE metric = '{SET_A_METRIC}'), "
        "b AS (SELECT DISTINCT label_user FROM samples "
        f"WHERE metric = '{SET_B_METRIC}') "
        "SELECT 'both' AS set_op, label_user FROM "
        "(SELECT label_user FROM a INTERSECT SELECT label_user FROM b) "
        "UNION ALL "
        "SELECT 'only_a', label_user FROM "
        "(SELECT label_user FROM a EXCEPT SELECT label_user FROM b) "
        "UNION ALL "
        "SELECT 'only_b', label_user FROM "
        "(SELECT label_user FROM b EXCEPT SELECT label_user FROM a)"
    ),
}
