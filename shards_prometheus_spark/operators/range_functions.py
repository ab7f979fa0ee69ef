"""PromQL range-function family (Tier B, public).

- ``gauge_delta`` — PromQL ``delta()``: last − first value per series
  per range window (gauges; no reset semantics).
- ``counter_resets`` — PromQL ``resets()``: number of monotonicity
  breaks per metric per range window (the same decrease the counter
  operators clamp, counted instead — reference guard prometheus.cpp:209-212
  is what makes decreases "resets" rather than data).
- ``over_time_stats`` — ``avg/min/max/count_over_time`` per series per
  window in one pass.

Scale notes: all three are single window/aggregate passes keyed by
(series, hour); the first/last extraction uses two ROW_NUMBER windows
over the same sort (one shuffle, one sort — Spark reuses the exchange
for both window functions since the partitioning matches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shards_prometheus_spark.model import (
    MICROS_PER_HOUR,
    SAMPLES_CTE,
    dround,
    samples,
)

_HOUR = f"(ts_us // {MICROS_PER_HOUR}) * 3600"


def _with_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    return samples(spark, sf_dir).withColumn(
        "hour_ts", F.expr(f"ts_us div {MICROS_PER_HOUR}") * 3600
    )


def gauge_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """delta(): last − first per series per 1h window."""
    s = _with_hour(spark, sf_dir)
    keys = ["metric", "label_user", "hour_ts"]
    asc = Window.partitionBy(*keys).orderBy("ts_us", "event_id")
    desc = Window.partitionBy(*keys).orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    return (
        s.withColumn("rn_a", F.row_number().over(asc))
        .withColumn("rn_d", F.row_number().over(desc))
        .groupBy(*keys)
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("first_v"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("last_v"),
        )
        .select(
            *keys,
            F.round(F.col("last_v") - F.col("first_v"), 4).alias("delta"),
        )
    )


def counter_resets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resets(): count of per-series decreases per metric per 1h window.

    The lag is scoped to (series, hour) — PromQL evaluates resets()
    within each range window independently, so a decrease between the
    last sample of hour H-1 and the first of hour H is NOT a reset in
    H (same per-range scoping as value_changes below)."""
    s = _with_hour(spark, sf_dir)
    w = Window.partitionBy("metric", "label_user", "hour_ts").orderBy(
        "ts_us", "event_id"
    )
    return (
        s.withColumn("prev", F.lag("value").over(w))
        .filter(F.col("prev").isNotNull())
        .groupBy("metric", "hour_ts")
        .agg(
            F.sum(
                F.when(F.col("value") < F.col("prev"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_resets")
        )
    )


def over_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg/min/max/count_over_time per series per 1h window."""
    s = _with_hour(spark, sf_dir)
    return s.groupBy("metric", "label_user", "hour_ts").agg(
        F.round(F.avg("value"), 4).alias("avg_v"),
        F.round(F.min("value"), 4).alias("min_v"),
        F.round(F.max("value"), 4).alias("max_v"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


def _last_two(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last two samples per (series, hour): the irate/idelta base."""
    s = _with_hour(spark, sf_dir)
    keys = ["metric", "label_user", "hour_ts"]
    desc = Window.partitionBy(*keys).orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    two = s.withColumn("rn", F.row_number().over(desc)).filter(
        F.col("rn") <= 2
    )
    g = two.groupBy(*keys).agg(
        F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("v1"),
        F.max(F.when(F.col("rn") == 2, F.col("value"))).alias("v0"),
        F.max(F.when(F.col("rn") == 1, F.col("ts_us"))).alias("t1"),
        F.max(F.when(F.col("rn") == 2, F.col("ts_us"))).alias("t0"),
    )
    return g.filter(F.col("v0").isNotNull() & (F.col("t1") > F.col("t0")))


def counter_irate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """irate(): instantaneous rate from the last two samples of each
    (series, 1h window), counter-reset clamped (public PromQL)."""
    lt = _last_two(spark, sf_dir)
    inc = F.when(
        F.col("v1") < F.col("v0"), F.col("v1")
    ).otherwise(F.col("v1") - F.col("v0"))
    dt_s = (F.col("t1") - F.col("t0")) / F.lit(1_000_000.0)
    return lt.select(
        "metric",
        "label_user",
        "hour_ts",
        F.round(inc / dt_s, 6).alias("irate"),
    )


def gauge_idelta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """idelta(): difference of the last two samples per (series, 1h)."""
    lt = _last_two(spark, sf_dir)
    return lt.select(
        "metric",
        "label_user",
        "hour_ts",
        F.round(F.col("v1") - F.col("v0"), 4).alias("idelta"),
    )


def value_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """changes(): number of value changes per (series, 1h window);
    the lag is scoped to the window, matching PromQL's per-range
    evaluation."""
    s = _with_hour(spark, sf_dir)
    w = Window.partitionBy("metric", "label_user", "hour_ts").orderBy(
        "ts_us", "event_id"
    )
    return (
        s.withColumn("prev", F.lag("value").over(w))
        .filter(F.col("prev").isNotNull())
        .groupBy("metric", "label_user", "hour_ts")
        .agg(
            F.sum(F.when(F.col("value") != F.col("prev"), 1).otherwise(0))
            .cast("long")
            .alias("n_changes")
        )
    )


#: predict_linear horizon: 15 min past the window end (seconds).
PREDICT_AT_S = 3600.0 + 900.0


def _regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(metric, hour) least-squares sums over (x = seconds into the
    window, y = value). x is window-relative so the products stay small
    and the Spark/DuckDB accumulation-order noise (~1e-10 absolute)
    sits far below the output rounding grid."""
    s = _with_hour(spark, sf_dir)
    x = (F.col("ts_us") - F.col("hour_ts") * F.lit(1_000_000)) / F.lit(
        1_000_000.0
    )
    y = F.col("value")
    g = (
        s.select("metric", "hour_ts", x.alias("x"), y.alias("y"))
        .groupBy("metric", "hour_ts")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    return g.filter((F.col("n") >= 2) & (denom != 0)).withColumn(
        "slope", slope
    )


def gauge_deriv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deriv(): least-squares slope per (metric, 1h), reported per
    HOUR — per-second slopes are ~1e-4, the same magnitude as the
    4-decimal rounding grid, so engine float noise would straddle
    rounding boundaries; the hour scale puts values 3-4 orders above
    the grid. `+ 0.0` collapses IEEE −0.0 to 0.0 on both engines."""
    return _regression(spark, sf_dir).select(
        "metric",
        "hour_ts",
        (F.round(F.col("slope") * 3600.0, 4) + F.lit(0.0)).alias(
            "deriv_per_hour"
        ),
    )


def predict_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """predict_linear(): extrapolate the regression 15 min past the
    window end (public PromQL)."""
    r = _regression(spark, sf_dir)
    intercept = (F.col("sy") - F.col("slope") * F.col("sx")) / F.col("n")
    return r.select(
        "metric",
        "hour_ts",
        (
            F.round(intercept + F.col("slope") * F.lit(PREDICT_AT_S), 4)
            + F.lit(0.0)
        ).alias("predicted"),
    )


#: φ for quantile_over_time (median).
QOT_PHI = 0.5


def quantile_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``quantile_over_time(0.5, …[1h])``: exact interpolated
    median per series per hour window — the same rank arithmetic as
    agg_quantile at (series, hour) granularity, never an engine-native
    percentile (whose interpolation/rounding differs across engines).

    Scale: the rank-target relation is 2 rows per series-hour (≪
    samples) and the lookup is a plain equi-join on (series, hour, rn)
    — no broadcast assumption, so the shape holds however many
    series-hours exist."""
    s = _with_hour(spark, sf_dir)
    keys = ["metric", "label_user", "hour_ts"]
    counts = s.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    h = F.lit(QOT_PHI) * (F.col("n") - 1)
    need = counts.select(
        *keys,
        h.alias("h"),
        F.floor(h).cast("long").alias("lo"),
        F.ceil(h).cast("long").alias("hi"),
    ).selectExpr(*keys, "h", "stack(2, 'lo', lo, 'hi', hi) AS (side, rn)")
    w = Window.partitionBy(*keys).orderBy("value", "event_id")
    ordered = s.select(
        *keys, "value", (F.row_number().over(w) - 1).alias("rn")
    )
    frac = F.col("h") - F.floor("h")
    return (
        ordered.join(need, [*keys, "rn"])
        .groupBy(*keys, "h")
        .agg(
            F.max(F.when(F.col("side") == "lo", F.col("value"))).alias("v_lo"),
            F.max(F.when(F.col("side") == "hi", F.col("value"))).alias("v_hi"),
        )
        .select(
            *keys,
            F.round(
                F.col("v_lo") + frac * (F.col("v_hi") - F.col("v_lo")), 4
            ).alias("q_value"),
        )
    )


#: Probe metric for time-series similarity search.
SIM_PROBE_METRIC = "purchase"


def series_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (the 'find metrics that move like
    this one' query; cf. "Time Series Similarity Search for Streaming
    Data in Distributed Systems", EDBT 2019 — PAPERS.md): Pearson
    correlation of each metric's hourly-sum profile against the probe
    metric's, over their aligned hours.

    Scale shape: correlation runs over the HOURLY ROLLUP (series-hours,
    not raw samples) and the probe profile broadcasts; the correlation
    is explicit sum arithmetic (nΣxy − ΣxΣy …), not an engine-native
    corr(), so both engines compute the identical expression."""
    hour_ts = F.expr(f"ts_us div {MICROS_PER_HOUR}") * 3600
    hourly = (
        samples(spark, sf_dir)
        .groupBy("metric", hour_ts.alias("hour_ts"))
        .agg(F.round(F.sum("value"), 4).alias("v"))
    )
    probe = hourly.filter(F.col("metric") == SIM_PROBE_METRIC).select(
        "hour_ts", F.col("v").alias("pv")
    )
    joined = (
        hourly.filter(F.col("metric") != SIM_PROBE_METRIC)
        .join(F.broadcast(probe), "hour_ts")
    )
    g = joined.groupBy("metric").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("v").alias("sx"),
        F.sum("pv").alias("sy"),
        F.sum(F.col("v") * F.col("pv")).alias("sxy"),
        F.sum(F.col("v") * F.col("v")).alias("sxx"),
        F.sum(F.col("pv") * F.col("pv")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return (
        g.filter(den != 0)
        .select(
            "metric",
            F.col("n").cast("long").alias("n_hours"),
            F.round(num / den, 4).alias("pearson_corr"),
        )
    )


#: EWMA smoothing factor (PromQL holt_winters' level component).
EWMA_ALPHA = 0.3


def ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per series per hour, in the
    ADJUSTED (normalized) form: weights (1−α)^(n−i) over the
    time-ordered window, ewma = Σwᵢxᵢ / Σwᵢ (pandas ``ewm(adjust=True)``
    semantics). NOTE this is deliberately NOT the recursive
    ``holt_winters`` level component — the recursion gives the oldest
    sample full weight (1−α)^(n−1) rather than the normalized
    (1−α)^(n−1)/Σw, and the two differ for small windows; the adjusted
    form is chosen because it is a single windowed aggregation
    (order-free, shuffle-parallel — a recursive smoother would
    serialize per series)."""
    s = _with_hour(spark, sf_dir)
    keys = ["metric", "label_user", "hour_ts"]
    w = Window.partitionBy(*keys).orderBy("ts_us", "event_id")
    ranked = s.select(
        *keys,
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(*keys)).alias("n"),
    )
    wt = F.pow(F.lit(1.0 - EWMA_ALPHA), F.col("n") - F.col("rn"))
    return ranked.groupBy(*keys).agg(
        F.round(
            F.sum(wt * F.col("value")) / F.sum(wt), 4
        ).alias("ewma")
    )


def ses_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE recursive exponential smoothing (the ``holt_winters`` level
    recursion, sₙ = α·xₙ + (1−α)·sₙ₋₁ with s₁ = x₁) per series per
    hour — the un-normalized companion of ``ewma_smooth``'s adjusted
    form; the two differ materially for small windows.

    The recursion is LINEAR in the inputs, so the final level has the
    closed form sₙ = (1−α)ⁿ⁻¹·x₁ + Σᵢ₌₂ⁿ α(1−α)ⁿ⁻ⁱ·xᵢ — a plain
    windowed weighted sum, order-free and shuffle-parallel (no
    per-series serial fold, unlike a naive recursive evaluation; the
    trend component's matrix-power weights stay out of scope). Output:
    the final smoothed level per (series, hour).
    """
    s = _with_hour(spark, sf_dir)
    keys = ["metric", "label_user", "hour_ts"]
    w = Window.partitionBy(*keys).orderBy("ts_us", "event_id")
    ranked = s.select(
        *keys,
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(*keys)).alias("n"),
    )
    decay = F.pow(F.lit(1.0 - EWMA_ALPHA), F.col("n") - F.col("rn"))
    wt = F.when(F.col("rn") == 1, decay).otherwise(F.lit(EWMA_ALPHA) * decay)
    return ranked.groupBy(*keys).agg(
        F.round(F.sum(wt * F.col("value")), 4).alias("level")
    )


#: Subquery step: the inner expression re-evaluates every 10 minutes.
SUBQ_STEP_S = 600
SUBQ_STEP_US = SUBQ_STEP_S * 1_000_000


def subquery_max_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL subquery semantics — ``max_over_time(rate(m[10m])[1h:10m])``:
    the inner ``rate`` evaluates per series on a 10-minute grid, the
    outer ``max_over_time`` folds the six inner points of each hour.
    Two stacked groupings over ONE scan: the 10-min bucket is a pure
    integer function of ts_us and the hour key a pure function of the
    bucket, so Spark keeps partial aggregation map-side for both levels
    — no second shuffle beyond the coarser key.

    The inner lag is scoped to the 10-min range (per-range evaluation,
    same scoping as counter_resets / value_changes).
    """
    s = samples(spark, sf_dir).withColumn(
        "step_ts", F.expr(f"ts_us div {SUBQ_STEP_US}") * SUBQ_STEP_S
    )
    w = Window.partitionBy("metric", "label_user", "step_ts").orderBy(
        "ts_us", "event_id"
    )
    deltas = (
        s.withColumn("prev", F.lag("value").over(w))
        .filter(F.col("prev").isNotNull())
        .withColumn(
            "delta",
            F.when(F.col("value") < F.col("prev"), F.col("value")).otherwise(
                F.col("value") - F.col("prev")
            ),
        )
    )
    inner = deltas.groupBy("metric", "label_user", "step_ts").agg(
        F.round(F.sum("delta") / F.lit(float(SUBQ_STEP_S)), 6).alias("rate")
    )
    hour_ts = (F.expr(f"step_ts div 3600") * 3600).alias("hour_ts")
    return inner.groupBy("metric", "label_user", hour_ts).agg(
        F.round(F.max("rate"), 6).alias("max_rate"),
        F.count(F.lit(1)).cast("long").alias("n_points"),
    )


QUERIES = {
    "quantile_over_time": quantile_over_time,
    "series_similarity": series_similarity,
    "ewma_smooth": ewma_smooth,
    "gauge_delta": gauge_delta,
    "counter_resets": counter_resets,
    "over_time_stats": over_time_stats,
    "counter_irate": counter_irate,
    "gauge_idelta": gauge_idelta,
    "value_changes": value_changes,
    "gauge_deriv": gauge_deriv,
    "predict_linear": predict_linear,
    "ses_smooth": ses_smooth,
    "subquery_max_rate": subquery_max_rate,
}

_SUBQ_STEP = f"(ts_us // {SUBQ_STEP_US}) * {SUBQ_STEP_S}"

ORACLES = {
    "ses_smooth": (
        f"{SAMPLES_CTE}, k AS (SELECT metric, label_user, "
        f"{_HOUR} AS hour_ts, value, "
        "ROW_NUMBER() OVER (PARTITION BY metric, label_user, "
        f"({_HOUR}) ORDER BY ts_us, event_id) AS rn, "
        "COUNT(*) OVER (PARTITION BY metric, label_user, "
        f"({_HOUR})) AS n FROM samples) "
        "SELECT metric, label_user, hour_ts, "
        + dround(
            f"SUM((CASE WHEN rn = 1 THEN POWER({1.0 - EWMA_ALPHA}, n - rn) "
            f"ELSE {EWMA_ALPHA} * POWER({1.0 - EWMA_ALPHA}, n - rn) END) "
            "* value)",
            4,
        )
        + " AS level FROM k GROUP BY metric, label_user, hour_ts"
    ),
    "subquery_max_rate": (
        f"{SAMPLES_CTE}, d AS (SELECT metric, label_user, "
        f"{_SUBQ_STEP} AS step_ts, value, "
        "LAG(value) OVER (PARTITION BY metric, label_user, "
        f"({_SUBQ_STEP}) ORDER BY ts_us, event_id) AS prev FROM samples), "
        "inner_rate AS (SELECT metric, label_user, step_ts, "
        + dround(
            "SUM(CASE WHEN value < prev THEN value ELSE value - prev END) "
            f"/ {float(SUBQ_STEP_S)}",
            6,
        )
        + " AS rate FROM d WHERE prev IS NOT NULL "
        "GROUP BY metric, label_user, step_ts) "
        "SELECT metric, label_user, (step_ts // 3600) * 3600 AS hour_ts, "
        + dround("MAX(rate)", 6)
        + " AS max_rate, CAST(COUNT(*) AS BIGINT) AS n_points "
        "FROM inner_rate GROUP BY metric, label_user, hour_ts"
    ),
    "ewma_smooth": (
        f"{SAMPLES_CTE}, k AS (SELECT metric, label_user, "
        f"{_HOUR} AS hour_ts, value, "
        "ROW_NUMBER() OVER (PARTITION BY metric, label_user, "
        f"({_HOUR}) ORDER BY ts_us, event_id) AS rn, "
        "COUNT(*) OVER (PARTITION BY metric, label_user, "
        f"({_HOUR})) AS n FROM samples) "
        "SELECT metric, label_user, hour_ts, "
        + dround(
            f"SUM(POWER({1.0 - EWMA_ALPHA}, n - rn) * value) / "
            f"SUM(POWER({1.0 - EWMA_ALPHA}, n - rn))",
            4,
        )
        + " AS ewma FROM k GROUP BY metric, label_user, hour_ts"
    ),
    "series_similarity": (
        f"{SAMPLES_CTE}, hourly AS (SELECT metric, {_HOUR} AS hour_ts, "
        "ROUND(SUM(value), 4) AS v FROM samples GROUP BY metric, hour_ts), "
        "probe AS (SELECT hour_ts, v AS pv FROM hourly "
        f"WHERE metric = '{SIM_PROBE_METRIC}'), "
        "g AS (SELECT h.metric, CAST(COUNT(*) AS DOUBLE) AS n, "
        "SUM(h.v) AS sx, SUM(p.pv) AS sy, SUM(h.v * p.pv) AS sxy, "
        "SUM(h.v * h.v) AS sxx, SUM(p.pv * p.pv) AS syy "
        f"FROM hourly h JOIN probe p USING (hour_ts) "
        f"WHERE h.metric <> '{SIM_PROBE_METRIC}' GROUP BY h.metric) "
        "SELECT metric, CAST(n AS BIGINT) AS n_hours, "
        + dround(
            "(n * sxy - sx * sy) / "
            "SQRT((n * sxx - sx * sx) * (n * syy - sy * sy))",
            4,
        )
        + " AS pearson_corr FROM g "
        "WHERE (n * sxx - sx * sx) * (n * syy - sy * sy) <> 0"
    ),
    "quantile_over_time": (
        f"{SAMPLES_CTE}, k AS (SELECT metric, label_user, {_HOUR} AS hour_ts, "
        "value, event_id FROM samples), "
        "ordered AS (SELECT metric, label_user, hour_ts, value, "
        "ROW_NUMBER() OVER (PARTITION BY metric, label_user, hour_ts "
        "ORDER BY value, event_id) - 1 AS rn, "
        "COUNT(*) OVER (PARTITION BY metric, label_user, hour_ts) AS n "
        "FROM k), "
        f"tgt AS (SELECT metric, label_user, hour_ts, {QOT_PHI} * (n - 1) AS h, "
        f"CAST(FLOOR({QOT_PHI} * (n - 1)) AS BIGINT) AS lo, "
        f"CAST(CEIL({QOT_PHI} * (n - 1)) AS BIGINT) AS hi "
        "FROM (SELECT DISTINCT metric, label_user, hour_ts, n FROM ordered)) "
        "SELECT o.metric, o.label_user, o.hour_ts, "
        "ROUND(MAX(CASE WHEN o.rn = t.lo THEN o.value END) "
        "+ (t.h - FLOOR(t.h)) * (MAX(CASE WHEN o.rn = t.hi THEN o.value END) "
        "- MAX(CASE WHEN o.rn = t.lo THEN o.value END)), 4) AS q_value "
        "FROM ordered o JOIN tgt t ON o.metric = t.metric "
        "AND o.label_user = t.label_user AND o.hour_ts = t.hour_ts "
        "AND o.rn IN (t.lo, t.hi) "
        "GROUP BY o.metric, o.label_user, o.hour_ts, t.h"
    ),
    "gauge_delta": (
        f"{SAMPLES_CTE}, d AS (SELECT metric, label_user, {_HOUR} AS hour_ts, "
        "value, "
        "ROW_NUMBER() OVER (PARTITION BY metric, label_user, "
        f"({_HOUR}) ORDER BY ts_us ASC, event_id ASC) AS rn_a, "
        "ROW_NUMBER() OVER (PARTITION BY metric, label_user, "
        f"({_HOUR}) ORDER BY ts_us DESC, event_id DESC) AS rn_d "
        "FROM samples) "
        "SELECT metric, label_user, hour_ts, "
        "ROUND(MAX(CASE WHEN rn_d = 1 THEN value END) "
        "- MAX(CASE WHEN rn_a = 1 THEN value END), 4) AS delta "
        "FROM d GROUP BY metric, label_user, hour_ts"
    ),
    "counter_resets": (
        f"{SAMPLES_CTE}, d AS (SELECT metric, label_user, "
        f"{_HOUR} AS hour_ts, ts_us, value, "
        "LAG(value) OVER (PARTITION BY metric, label_user, "
        f"({_HOUR}) ORDER BY ts_us, event_id) AS prev FROM samples) "
        "SELECT metric, hour_ts, "
        "CAST(SUM(CASE WHEN value < prev THEN 1 ELSE 0 END) AS BIGINT) AS n_resets "
        "FROM d WHERE prev IS NOT NULL GROUP BY metric, hour_ts"
    ),
    "over_time_stats": (
        f"{SAMPLES_CTE} "
        f"SELECT metric, label_user, {_HOUR} AS hour_ts, "
        "ROUND(AVG(value), 4) AS avg_v, ROUND(MIN(value), 4) AS min_v, "
        "ROUND(MAX(value), 4) AS max_v, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM samples GROUP BY metric, label_user, hour_ts"
    ),
}

_LAST_TWO_SQL = (
    f"{SAMPLES_CTE}, d AS (SELECT metric, label_user, {_HOUR} AS hour_ts, "
    "ts_us, value, ROW_NUMBER() OVER (PARTITION BY metric, label_user, "
    f"({_HOUR}) ORDER BY ts_us DESC, event_id DESC) AS rn FROM samples), "
    "lt AS (SELECT metric, label_user, hour_ts, "
    "MAX(CASE WHEN rn = 1 THEN value END) AS v1, "
    "MAX(CASE WHEN rn = 2 THEN value END) AS v0, "
    "MAX(CASE WHEN rn = 1 THEN ts_us END) AS t1, "
    "MAX(CASE WHEN rn = 2 THEN ts_us END) AS t0 "
    "FROM d WHERE rn <= 2 GROUP BY metric, label_user, hour_ts) "
)

_REGR_SQL = (
    f"{SAMPLES_CTE}, p AS (SELECT metric, {_HOUR} AS hour_ts, "
    f"(ts_us - ({_HOUR}) * 1000000) / 1000000.0 AS x, value AS y "
    "FROM samples), "
    "g AS (SELECT metric, hour_ts, CAST(COUNT(*) AS DOUBLE) AS n, "
    "SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx "
    "FROM p GROUP BY metric, hour_ts), "
    "r AS (SELECT *, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope "
    "FROM g WHERE n >= 2 AND n * sxx - sx * sx <> 0) "
)

ORACLES.update(
    {
        "counter_irate": (
            _LAST_TWO_SQL
            + "SELECT metric, label_user, hour_ts, "
            "ROUND((CASE WHEN v1 < v0 THEN v1 ELSE v1 - v0 END) "
            "/ ((t1 - t0) / 1000000.0), 6) AS irate "
            "FROM lt WHERE v0 IS NOT NULL AND t1 > t0"
        ),
        "gauge_idelta": (
            _LAST_TWO_SQL
            + "SELECT metric, label_user, hour_ts, "
            "ROUND(v1 - v0, 4) AS idelta "
            "FROM lt WHERE v0 IS NOT NULL AND t1 > t0"
        ),
        "value_changes": (
            f"{SAMPLES_CTE}, d AS (SELECT metric, label_user, "
            f"{_HOUR} AS hour_ts, ts_us, value, "
            "LAG(value) OVER (PARTITION BY metric, label_user, "
            f"({_HOUR}) ORDER BY ts_us, event_id) AS prev FROM samples) "
            "SELECT metric, label_user, hour_ts, "
            "CAST(SUM(CASE WHEN value <> prev THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_changes FROM d WHERE prev IS NOT NULL "
            "GROUP BY metric, label_user, hour_ts"
        ),
        "gauge_deriv": (
            _REGR_SQL
            + "SELECT metric, hour_ts, "
            "ROUND(slope * 3600.0, 4) + 0.0 AS deriv_per_hour FROM r"
        ),
        "predict_linear": (
            _REGR_SQL
            + "SELECT metric, hour_ts, "
            "ROUND((sy - slope * sx) / n + slope * "
            f"{PREDICT_AT_S}, 4) + 0.0 AS predicted FROM r"
        ),
    }
)
