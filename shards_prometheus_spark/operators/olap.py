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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shards_prometheus_spark.model import SAMPLES_CTE, dround, samples

SET_A_METRIC = "purchase"
SET_B_METRIC = "click"

#: Sessionization gap: 30 minutes in microseconds.
SESSION_GAP_US = 1_800_000_000
#: Ordered funnel stages (first-touch ordering).
FUNNEL_STAGES = ["signup", "view", "purchase"]
MICROS_PER_DAY = 86_400_000_000


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


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: per-user sessions delimited by >30 min
    gaps (lag + cumulative-flag session ids — the batch twin of the
    streaming `session_window`). Output per user: session count, event
    count, and mean session duration in seconds."""
    s = samples(spark, sf_dir)
    w = Window.partitionBy("label_user").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    flagged = s.withColumn(
        "new_s",
        F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_session = flagged.groupBy("label_user", "session_id").agg(
        F.count(F.lit(1)).alias("n_ev"),
        ((F.max("ts_us") - F.min("ts_us")) / 1_000_000.0).alias("dur_s"),
    )
    return per_session.groupBy("label_user").agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.sum("n_ev").cast("long").alias("n_events"),
        F.round(F.avg("dur_s"), 4).alias("avg_session_sec"),
    )


def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → view → purchase, first-touch ordering:
    a user converts at stage k if the first occurrences are strictly
    increasing in time through stage k. One aggregation builds the
    per-user stage firsts (conditional min — no self-joins); the
    funnel is then three boolean columns summed."""
    s = samples(spark, sf_dir).filter(F.col("metric").isin(FUNNEL_STAGES))
    firsts = s.groupBy("label_user").agg(
        *[
            F.min(F.when(F.col("metric") == m, F.col("ts_us"))).alias(
                f"t_{m}"
            )
            for m in FUNNEL_STAGES
        ]
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & F.col("t_view").isNotNull() & (F.col("t_view") > F.col("t_signup"))
    s3 = s2 & F.col("t_purchase").isNotNull() & (
        F.col("t_purchase") > F.col("t_view")
    )
    agg = firsts.agg(
        F.sum(s1.cast("long")).alias("n_signup"),
        F.sum(s2.cast("long")).alias("n_view"),
        F.sum(s3.cast("long")).alias("n_purchase"),
    )
    stacked = agg.selectExpr(
        "stack(3, 'signup', n_signup, 'view', n_view, "
        "'purchase', n_purchase) AS (stage, n_users)",
        "n_signup",
    )
    return stacked.select(
        "stage",
        F.col("n_users").cast("long").alias("n_users"),
        F.round(F.col("n_users") / F.col("n_signup"), 4).alias("conv_rate"),
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: cohort = a user's first active week;
    for each (cohort_week, week_offset), the fraction of the cohort
    active that week. Two aggregations (user firsts, distinct active
    weeks) and one broadcast-size join of the cohort sizes."""
    s = samples(spark, sf_dir).select(
        "label_user",
        F.expr(f"(ts_us div {MICROS_PER_DAY}) div 7").alias("week"),
    )
    active = s.distinct()
    firsts = active.groupBy("label_user").agg(
        F.min("week").alias("cohort_week")
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    counts = (
        active.join(firsts, "label_user")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return counts.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 4).alias(
            "retention"
        ),
    )


#: Fixed pivot column set — explicit values keep the pivot a single
#: pass (no values-discovery job) and give the output a stable schema,
#: which is also what a 100 TB pivot needs (never auto-discover
#: unbounded pivot values).
PIVOT_METRICS = ["click", "error", "purchase", "signup", "view"]


def metric_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user metric matrix: `groupBy(user).pivot(metric)` with
    an explicit value list — Spark plans it as ONE aggregation pass
    with conditional sums (exactly what the oracle states), not a job
    per column. Missing combinations stay NULL."""
    return (
        samples(spark, sf_dir)
        .groupBy("label_user")
        .pivot("metric", PIVOT_METRICS)
        .agg(F.round(F.sum("value"), 4))
    )


QUERIES = {
    "grouping_sets_agg": grouping_sets_agg,
    "set_ops_users": set_ops_users,
    "metric_pivot": metric_pivot,
    "user_sessions": user_sessions,
    "funnel_stages": funnel_stages,
    "retention_cohorts": retention_cohorts,
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
    "metric_pivot": (
        f"{SAMPLES_CTE} SELECT label_user, "
        + ", ".join(
            f"ROUND(SUM(CASE WHEN metric = '{m}' THEN value END), 4) AS {m}"
            for m in PIVOT_METRICS
        )
        + " FROM samples GROUP BY label_user"
    ),
    "user_sessions": (
        f"{SAMPLES_CTE}, f AS (SELECT label_user, ts_us, event_id, "
        "LAG(ts_us) OVER (PARTITION BY label_user "
        "ORDER BY ts_us, event_id) AS prev FROM samples), "
        "g AS (SELECT label_user, ts_us, event_id, "
        f"CASE WHEN prev IS NULL OR ts_us - prev > {SESSION_GAP_US} "
        "THEN 1 ELSE 0 END AS new_s FROM f), "
        "h AS (SELECT label_user, ts_us, SUM(new_s) OVER ("
        "PARTITION BY label_user ORDER BY ts_us, event_id "
        "ROWS UNBOUNDED PRECEDING) AS session_id FROM g), "
        "ps AS (SELECT label_user, session_id, COUNT(*) AS n_ev, "
        "(MAX(ts_us) - MIN(ts_us)) / 1000000.0 AS dur_s FROM h "
        "GROUP BY label_user, session_id) "
        "SELECT label_user, CAST(MAX(session_id) AS BIGINT) AS n_sessions, "
        "CAST(SUM(n_ev) AS BIGINT) AS n_events, "
        f"{dround('AVG(dur_s)', 4)} AS avg_session_sec "
        "FROM ps GROUP BY label_user"
    ),
    "funnel_stages": (
        f"{SAMPLES_CTE}, firsts AS (SELECT label_user, "
        + ", ".join(
            f"MIN(CASE WHEN metric = '{m}' THEN ts_us END) AS t_{m}"
            for m in FUNNEL_STAGES
        )
        + " FROM samples WHERE metric IN ("
        + ", ".join(f"'{m}'" for m in FUNNEL_STAGES)
        + ") GROUP BY label_user), "
        "a AS (SELECT "
        "CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_signup, "
        "CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_view IS NOT NULL "
        "AND t_view > t_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_view, "
        "CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_view IS NOT NULL "
        "AND t_view > t_signup AND t_purchase IS NOT NULL "
        "AND t_purchase > t_view THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_purchase FROM firsts) "
        "SELECT 'signup' AS stage, n_signup AS n_users, "
        f"{dround('n_signup * 1.0 / n_signup', 4)} AS conv_rate FROM a "
        "UNION ALL SELECT 'view', n_view, "
        f"{dround('n_view * 1.0 / n_signup', 4)} FROM a "
        "UNION ALL SELECT 'purchase', n_purchase, "
        f"{dround('n_purchase * 1.0 / n_signup', 4)} FROM a"
    ),
    "retention_cohorts": (
        f"{SAMPLES_CTE}, act AS (SELECT DISTINCT label_user, "
        f"(ts_us // {MICROS_PER_DAY}) // 7 AS week FROM samples), "
        "f AS (SELECT label_user, MIN(week) AS cohort_week FROM act "
        "GROUP BY label_user), "
        "sz AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size "
        "FROM f GROUP BY cohort_week), "
        "c AS (SELECT f.cohort_week, a.week - f.cohort_week AS week_offset, "
        "CAST(COUNT(*) AS BIGINT) AS n_active FROM act a "
        "JOIN f USING (label_user) GROUP BY 1, 2) "
        "SELECT c.cohort_week, c.week_offset, c.n_active, sz.cohort_size, "
        f"{dround('c.n_active * 1.0 / sz.cohort_size', 4)} AS retention "
        "FROM c JOIN sz USING (cohort_week)"
    ),
}
