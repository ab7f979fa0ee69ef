"""PromQL aggregation operators (Tier B, public) + cardinality sketches.

`sum/avg/min/max/count by (label)` fold the series dimension keeping the
grouping labels (series identity = name+labels, prometheus.cpp:190-198).
`topk`/`bottomk` keep the k extreme series per group; `count_values`
histograms exact values; range aggregations evaluate at aligned steps
(tumbling) or overlapping ranges (sliding) — the batch analog of the
reference's fixed-cadence tick loop (test.edn:8).

Scale notes: every aggregation here is a single hash-aggregate with
map-side partial combine; topk is a window over the *aggregated* (small)
relation, not over raw samples; the sliding window runs RANGE frames
over pre-aggregated hourly rows — O(#series × #hours), not O(#samples).
`approx_distinct_users` is the 100 TB cardinality path (HyperLogLog++,
mergeable, no exact-distinct shuffle explosion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shards_prometheus_spark.model import (
    MICROS_PER_HOUR,
    SAMPLES_CTE,
    samples,
)

TOP_K = 3


def agg_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum/avg/min/max/count folded to the metric dimension."""
    return (
        samples(spark, sf_dir)
        .groupBy("metric")
        .agg(
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


def _per_series_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        samples(spark, sf_dir)
        .groupBy("metric", "label_user")
        .agg(F.round(F.sum("value"), 4).alias("sum_value"))
    )


def _k_extreme(spark: SparkSession, sf_dir: str, ascending: bool) -> DataFrame:
    order = (
        [F.asc("sum_value"), F.asc("label_user")]
        if ascending
        else [F.desc("sum_value"), F.asc("label_user")]
    )
    w = Window.partitionBy("metric").orderBy(*order)
    return (
        _per_series_sum(spark, sf_dir)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("metric", "label_user", "sum_value", F.col("rk").cast("long"))
    )


def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k series with the largest total per metric (PromQL ``topk``)."""
    return _k_extreme(spark, sf_dir, ascending=False)


def bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k series with the smallest total per metric (PromQL ``bottomk``)."""
    return _k_extreme(spark, sf_dir, ascending=True)


def count_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count of samples per exact value (PromQL ``count_values``)."""
    return (
        samples(spark, sf_dir)
        .groupBy("metric", "value")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    hour_ts = (F.expr(f"ts_us div {MICROS_PER_HOUR}") * 3600).alias("hour_ts")
    return (
        samples(spark, sf_dir)
        .groupBy("metric", hour_ts)
        .agg(
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


def range_agg_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aligned 1h tumbling aggregation (query_range with step == range)."""
    return _hourly(spark, sf_dir)


def range_agg_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3h range at 1h step: RANGE frame over pre-aggregated hours.

    Rounding the hourly sums FIRST makes both engines window-sum
    identical doubles, so the sliding totals are bit-equal.
    """
    w = (
        Window.partitionBy("metric")
        .orderBy("hour_ts")
        .rangeBetween(-7200, Window.currentRow)
    )
    return _hourly(spark, sf_dir).select(
        "metric",
        "hour_ts",
        F.round(F.sum("sum_value").over(w), 4).alias("sliding_sum"),
        F.sum("n").over(w).cast("long").alias("sliding_n"),
    )


#: φ for the `quantile by (label)` aggregation operator.
AGG_QUANTILE_PHI = 0.9


def agg_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``stddev by``/``stdvar by``: population deviation and
    variance folded to the metric dimension. Inputs carry 2-decimal
    precision with magnitudes ≤1e3, so cross-engine accumulation noise
    (~1e-12 relative) sits far below the 4-decimal grid."""
    return (
        samples(spark, sf_dir)
        .groupBy("metric")
        .agg(
            F.round(F.stddev_pop("value"), 4).alias("stddev_value"),
            F.round(F.var_pop("value"), 4).alias("stdvar_value"),
        )
    )


N_QUARTILES = 4


def user_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing: users ranked into value quartiles per metric —
    the cohort-bucketing window shape (deterministic tie-break on the
    user label so both engines produce identical tiles)."""
    totals = (
        samples(spark, sf_dir)
        .groupBy("metric", "label_user")
        .agg(F.round(F.sum("value"), 4).alias("total"))
    )
    w = Window.partitionBy("metric").orderBy(
        F.desc("total"), F.asc("label_user")
    )
    tiled = totals.withColumn(
        "quartile", F.ntile(N_QUARTILES).over(w).cast("long")
    )
    return tiled.groupBy("metric", "quartile").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(F.sum("total"), 4).alias("quartile_value"),
    )


def agg_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``quantile(φ, …) by (label)``: exact interpolated order
    statistic per metric — same rank arithmetic as histogram_quantile,
    φ fixed at 0.9, computed in ONE pass over the sorted relation."""
    s = samples(spark, sf_dir)
    counts = s.groupBy("metric").agg(F.count(F.lit(1)).alias("n"))
    h = F.lit(AGG_QUANTILE_PHI) * (F.col("n") - 1)
    tgt = counts.select(
        "metric",
        h.alias("h"),
        F.floor(h).cast("long").alias("lo"),
        F.ceil(h).cast("long").alias("hi"),
    )
    need = tgt.selectExpr(
        "metric", "h", "lo", "stack(2, 'lo', lo, 'hi', hi) AS (side, rn)"
    )
    w = Window.partitionBy("metric").orderBy("value", "event_id")
    ordered = s.select(
        "metric", "value", (F.row_number().over(w) - 1).alias("rn")
    )
    return (
        ordered.join(F.broadcast(need), ["metric", "rn"])
        .groupBy("metric", "h", "lo")
        .agg(
            F.max(F.when(F.col("side") == "lo", F.col("value"))).alias("v_lo"),
            F.max(F.when(F.col("side") == "hi", F.col("value"))).alias("v_hi"),
        )
        .select(
            "metric",
            F.round(
                F.col("v_lo")
                + (F.col("h") - F.col("lo")) * (F.col("v_hi") - F.col("v_lo")),
                4,
            ).alias("q"),
        )
    )


def distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-metric label cardinality (oracle-checkable)."""
    return (
        samples(spark, sf_dir)
        .groupBy("metric")
        .agg(F.countDistinct("label_user").cast("long").alias("n_users"))
    )


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ cardinality — the mergeable sketch used at 100 TB.

    No SQL oracle: Spark's HLL++ and DuckDB's approx sketch differ by
    construction; the driver records a rows-only check. `distinct_users`
    is the exact twin that IS oracle-checked.
    """
    return (
        samples(spark, sf_dir)
        .groupBy("metric")
        .agg(
            F.approx_count_distinct("label_user", rsd=0.01)
            .cast("long")
            .alias("n_users_approx")
        )
    )


_HOURLY_SQL = (
    f"{SAMPLES_CTE}, hourly AS (SELECT metric, "
    "(ts_us // 3600000000) * 3600 AS hour_ts, "
    "ROUND(SUM(value), 4) AS sum_value, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM samples GROUP BY metric, hour_ts)"
)

QUERIES = {
    "agg_by_label": agg_by_label,
    "topk": topk,
    "bottomk": bottomk,
    "count_values": count_values,
    "range_agg_tumbling": range_agg_tumbling,
    "range_agg_sliding": range_agg_sliding,
    "agg_stddev": agg_stddev,
    "user_value_quartiles": user_value_quartiles,
    "agg_quantile": agg_quantile,
    "distinct_users": distinct_users,
    "approx_distinct_users": approx_distinct_users,  # rows-only check
}

ORACLES = {
    "agg_by_label": (
        f"{SAMPLES_CTE} "
        "SELECT metric, ROUND(SUM(value), 4) AS sum_value, "
        "ROUND(AVG(value), 4) AS avg_value, ROUND(MIN(value), 4) AS min_value, "
        "ROUND(MAX(value), 4) AS max_value, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM samples GROUP BY metric"
    ),
    "topk": (
        f"{SAMPLES_CTE}, per_series AS (SELECT metric, label_user, "
        "ROUND(SUM(value), 4) AS sum_value FROM samples GROUP BY metric, label_user), "
        "ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY metric "
        "ORDER BY sum_value DESC, label_user ASC) AS rk FROM per_series) "
        f"SELECT metric, label_user, sum_value, CAST(rk AS BIGINT) AS rk "
        f"FROM ranked WHERE rk <= {TOP_K}"
    ),
    "bottomk": (
        f"{SAMPLES_CTE}, per_series AS (SELECT metric, label_user, "
        "ROUND(SUM(value), 4) AS sum_value FROM samples GROUP BY metric, label_user), "
        "ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY metric "
        "ORDER BY sum_value ASC, label_user ASC) AS rk FROM per_series) "
        f"SELECT metric, label_user, sum_value, CAST(rk AS BIGINT) AS rk "
        f"FROM ranked WHERE rk <= {TOP_K}"
    ),
    "count_values": (
        f"{SAMPLES_CTE} "
        "SELECT metric, value, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM samples GROUP BY metric, value"
    ),
    "user_value_quartiles": (
        f"{SAMPLES_CTE}, totals AS (SELECT metric, label_user, "
        "ROUND(SUM(value), 4) AS total FROM samples "
        "GROUP BY metric, label_user), "
        f"tiled AS (SELECT metric, total, CAST(NTILE({N_QUARTILES}) OVER ("
        "PARTITION BY metric ORDER BY total DESC, label_user ASC) "
        "AS BIGINT) AS quartile FROM totals) "
        "SELECT metric, quartile, CAST(COUNT(*) AS BIGINT) AS n_users, "
        "ROUND(SUM(total), 4) AS quartile_value "
        "FROM tiled GROUP BY metric, quartile"
    ),
    "agg_stddev": (
        f"{SAMPLES_CTE} "
        "SELECT metric, ROUND(STDDEV_POP(value), 4) AS stddev_value, "
        "ROUND(VAR_POP(value), 4) AS stdvar_value "
        "FROM samples GROUP BY metric"
    ),
    "agg_quantile": (
        f"{SAMPLES_CTE}, ordered AS (SELECT metric, value, "
        "ROW_NUMBER() OVER (PARTITION BY metric ORDER BY value, event_id) - 1 "
        "AS rn, COUNT(*) OVER (PARTITION BY metric) AS n FROM samples), "
        "tgt AS (SELECT metric, "
        f"{AGG_QUANTILE_PHI} * (n - 1) AS h, "
        f"CAST(FLOOR({AGG_QUANTILE_PHI} * (n - 1)) AS BIGINT) AS lo, "
        f"CAST(CEIL({AGG_QUANTILE_PHI} * (n - 1)) AS BIGINT) AS hi "
        "FROM (SELECT DISTINCT metric, n FROM ordered)) "
        "SELECT t.metric, "
        "ROUND(l.value + (t.h - t.lo) * (h2.value - l.value), 4) AS q "
        "FROM tgt t "
        "JOIN ordered l ON l.metric = t.metric AND l.rn = t.lo "
        "JOIN ordered h2 ON h2.metric = t.metric AND h2.rn = t.hi"
    ),
    "range_agg_tumbling": (
        f"{_HOURLY_SQL} SELECT metric, hour_ts, sum_value, n FROM hourly"
    ),
    "range_agg_sliding": (
        f"{_HOURLY_SQL} "
        "SELECT metric, hour_ts, "
        "ROUND(SUM(sum_value) OVER (PARTITION BY metric ORDER BY hour_ts "
        "RANGE BETWEEN 7200 PRECEDING AND CURRENT ROW), 4) AS sliding_sum, "
        "CAST(SUM(n) OVER (PARTITION BY metric ORDER BY hour_ts "
        "RANGE BETWEEN 7200 PRECEDING AND CURRENT ROW) AS BIGINT) AS sliding_n "
        "FROM hourly"
    ),
    "distinct_users": (
        f"{SAMPLES_CTE} "
        "SELECT metric, CAST(COUNT(DISTINCT label_user) AS BIGINT) AS n_users "
        "FROM samples GROUP BY metric"
    ),
}
