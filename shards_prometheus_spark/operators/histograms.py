"""Histogram operators.

Tier A `Prometheus.Histogram` (reference prometheus.cpp:256-306):
Observe(x) into explicit, static bucket boundaries fixed per series at
warmup (prometheus.cpp:264-269 unpacks the bucket seq; :277-293 creates
the series with those bounds). State = per-bucket counts + _sum/_count,
exposed cumulatively in `le` convention (right-closed upper bounds,
public prometheus-cpp exposition semantics).

Declarative form: bucket assignment is a chained conditional (a static
searched CASE Catalyst folds into whole-stage codegen — no UDF), counts
are one hash aggregate, cumulative `le` counts are a running-sum window
over the tiny aggregated relation.

Tier B `histogram_quantile(φ)` (public PromQL): linear interpolation
inside the first bucket whose cumulative count reaches φ·total; if the
quantile lands in the +Inf bucket, the highest finite bound is returned
(PromQL convention). `histogram_quantile` is the exact-over-raw-samples
twin (interpolated order statistic) used when raw observations are
retained.

Scale notes: all post-aggregation math runs on O(#metrics × #buckets)
rows; only the first hash aggregate touches the 100 TB samples scan,
and it combines map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shards_prometheus_spark.model import SAMPLES_CTE, dround, samples

#: Static explicit bounds, the engine-level analog of the reference's
#: per-series BucketBoundaries (prometheus.cpp:277-293).
BOUNDS = [1.0, 5.0, 10.0, 25.0, 50.0, 100.0, 250.0, 500.0]
QUANTILES = [0.5, 0.95, 0.99]

_LE_LABELS = [f"{b:g}" for b in BOUNDS] + ["+Inf"]


def _bucket_idx_col() -> Column:
    expr: Column | None = None
    for i, b in enumerate(BOUNDS):
        cond = F.col("value") <= F.lit(b)
        expr = F.when(cond, F.lit(i)) if expr is None else expr.when(cond, F.lit(i))
    assert expr is not None
    return expr.otherwise(F.lit(len(BOUNDS))).alias("bucket_idx")


def _bucket_idx_sql() -> str:
    whens = " ".join(
        f"WHEN value <= {b!r} THEN {i}" for i, b in enumerate(BOUNDS)
    )
    return f"CASE {whens} ELSE {len(BOUNDS)} END"


def _le_label_col() -> Column:
    # bucket_idx → 'le' label via a literal array lookup (JVM-side).
    return F.element_at(
        F.array(*[F.lit(s) for s in _LE_LABELS]), F.col("bucket_idx") + 1
    ).alias("le")


def _le_label_sql() -> str:
    whens = " ".join(
        f"WHEN {i} THEN '{s}'" for i, s in enumerate(_LE_LABELS)
    )
    return f"CASE bucket_idx {whens} END"


def _bucket_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        samples(spark, sf_dir)
        .select("metric", _bucket_idx_col())
        .groupBy("metric", "bucket_idx")
        .agg(F.count(F.lit(1)).cast("long").alias("bucket_count"))
    )


def histogram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-metric bucket counts + cumulative `le` counts."""
    w = Window.partitionBy("metric").orderBy("bucket_idx")
    return (
        _bucket_counts(spark, sf_dir)
        .select(
            "metric",
            F.col("bucket_idx").cast("long").alias("le_idx"),
            _le_label_col(),
            "bucket_count",
            F.sum("bucket_count").over(w).cast("long").alias("cum_count"),
        )
    )


def histogram_sum_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `_sum` / `_count` series of the exposition format."""
    return (
        samples(spark, sf_dir)
        .groupBy("metric")
        .agg(
            F.round(F.sum("value"), 4).alias("hist_sum"),
            F.count(F.lit(1)).cast("long").alias("hist_count"),
        )
    )


def histogram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``histogram_fraction`` analog: per metric, the fraction
    of observations with value ≤ each bucket bound (cumulative bucket
    count over the series total). Exact integer arithmetic up to one
    final rounded division — the `le` convention mirrors the explicit
    bounds the reference fixes per series (prometheus.cpp:264-269,
    exposed cumulatively by prometheus-cpp)."""
    hb = histogram_buckets(spark, sf_dir)
    total = Window.partitionBy("metric")
    return hb.select(
        "metric",
        "le_idx",
        "le",
        F.round(
            F.col("cum_count") / F.sum("bucket_count").over(total), 4
        ).alias("frac"),
    )


#: Per-series bucket boundaries — the SURVEY §1.2 `series` dimension
#: materialized. The reference fixes BucketBoundaries PER SERIES at
#: warmup (prometheus.cpp:277-293); each metric here registers its own
#: bounds (different counts and scales), with the global BOUNDS above
#: kept as the legacy single-config special case.
SERIES_BOUNDS = {
    "click": [1.0, 10.0, 50.0, 200.0],
    "error": [2.0, 20.0, 80.0, 320.0],
    "purchase": [10.0, 100.0, 1000.0],
    "signup": [50.0, 150.0, 450.0],
    "view": [5.0, 50.0, 500.0],
}


def histogram_bounds_per_series(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bucket + cumulative counts with PER-SERIES bounds.

    The bounds dimension (metric → buckets ARRAY<DOUBLE>) broadcasts
    onto the samples scan; bucket assignment is
    ``size(filter(bounds, b -> value > b))`` — a JVM-side higher-order
    expression over the array, so per-series bounds cost no explosion
    and no UDF. Empty buckets are omitted (same convention as
    `histogram_buckets`); the +Inf bucket reports le = NULL (IEEE
    Infinity breaks tolerance-based comparisons — inf−inf is NaN — so
    the unbounded bucket is identified by le_idx = size(bounds)).
    """
    dim = spark.createDataFrame(
        sorted(SERIES_BOUNDS.items()), "metric string, bounds array<double>"
    )
    s = samples(spark, sf_dir).join(F.broadcast(dim), "metric")
    idx = F.size(F.filter("bounds", lambda b: F.col("value") > b))
    g = (
        s.select("metric", idx.cast("long").alias("le_idx"))
        .groupBy("metric", "le_idx")
        .agg(F.count(F.lit(1)).cast("long").alias("bucket_count"))
    )
    w = Window.partitionBy("metric").orderBy("le_idx")
    le = F.when(
        F.col("le_idx") < F.size("bounds"),
        F.element_at("bounds", (F.col("le_idx") + 1).cast("int")),
    )
    return (
        g.join(F.broadcast(dim), "metric")
        .select(
            "metric",
            "le_idx",
            le.alias("le"),
            "bucket_count",
            F.sum("bucket_count").over(w).cast("long").alias("cum_count"),
        )
    )


def _quantile_params(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([(p,) for p in QUANTILES], "p double")


def histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact φ-quantile per metric: interpolated order statistic.

    rank h = φ·(n-1); q = v[⌊h⌋] + (h-⌊h⌋)·(v[⌈h⌉]-v[⌊h⌋]) — identical
    IEEE arithmetic on both engines, so ROUND(…,4) is deterministic.
    """
    s = samples(spark, sf_dir)
    # Per-metric sample counts come from a cheap hash aggregate (no
    # window), so the expensive per-metric sort below runs exactly ONCE
    # and is consumed in a single pass: the needed ranks (≤ 2·|φ| per
    # metric) are broadcast and matched against row_number directly.
    counts = s.groupBy("metric").agg(F.count(F.lit(1)).alias("n"))
    h = F.col("p") * (F.col("n") - 1)
    tgt = counts.crossJoin(F.broadcast(_quantile_params(spark))).select(
        "metric",
        "p",
        h.alias("h"),
        F.floor(h).cast("long").alias("lo"),
        F.ceil(h).cast("long").alias("hi"),
    )
    need = tgt.selectExpr(
        "metric", "p", "h", "lo", "stack(2, 'lo', lo, 'hi', hi) AS (side, rn)"
    )
    w = Window.partitionBy("metric").orderBy("value", "event_id")
    ordered = s.select(
        "metric", "value", (F.row_number().over(w) - 1).alias("rn")
    )
    return (
        ordered.join(F.broadcast(need), ["metric", "rn"])
        .groupBy("metric", "p", "h", "lo")
        .agg(
            F.max(F.when(F.col("side") == "lo", F.col("value"))).alias("v_lo"),
            F.max(F.when(F.col("side") == "hi", F.col("value"))).alias("v_hi"),
        )
        .select(
            "metric",
            "p",
            F.round(
                F.col("v_lo")
                + (F.col("h") - F.col("lo")) * (F.col("v_hi") - F.col("v_lo")),
                4,
            ).alias("q"),
        )
    )


def histogram_quantile_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``histogram_quantile(φ, buckets)``: interpolate inside the
    first bucket whose cumulative count ≥ φ·total; +Inf bucket clamps to
    the highest finite bound (public PromQL convention)."""
    w = Window.partitionBy("metric").orderBy("bucket_idx")
    counts = _bucket_counts(spark, sf_dir).select(
        "metric",
        "bucket_idx",
        "bucket_count",
        F.sum("bucket_count").over(w).cast("long").alias("cum"),
        F.sum("bucket_count")
        .over(Window.partitionBy("metric"))
        .cast("long")
        .alias("total"),
    )
    joined = counts.crossJoin(F.broadcast(_quantile_params(spark)))
    target = F.col("p") * F.col("total")
    hit = joined.filter(F.col("cum") >= target)
    pick_w = Window.partitionBy("metric", "p").orderBy("bucket_idx")
    first_hit = (
        hit.withColumn("pick", F.row_number().over(pick_w))
        .filter(F.col("pick") == 1)
    )
    lb = F.element_at(
        F.array(*([F.lit(0.0)] + [F.lit(b) for b in BOUNDS])),
        F.col("bucket_idx") + 1,
    )
    ub = F.element_at(
        F.array(*[F.lit(b) for b in BOUNDS] + [F.lit(BOUNDS[-1])]),
        F.col("bucket_idx") + 1,
    )
    cum_prev = F.col("cum") - F.col("bucket_count")
    interp = lb + (ub - lb) * (target - cum_prev) / F.col("bucket_count")
    q = F.when(F.col("bucket_idx") == len(BOUNDS), F.lit(BOUNDS[-1])).otherwise(
        interp
    )
    return first_hit.select("metric", "p", F.round(q, 4).alias("q"))


def histogram_quantile_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dashboard query: ``histogram_quantile(φ, rate(m_bucket[1h]))``
    per metric per hour window. Observations are raw here, so the
    hourly bucket *increase* is simply the hour's per-bucket count —
    the same one hash aggregate as `histogram_buckets` keyed by
    (metric, hour) — and the PromQL interpolation then runs per
    (metric, hour, φ) over O(#metrics × #hours × #buckets) rows.
    Only the first aggregate touches the raw scan; everything after is
    rollup-sized.
    """
    from shards_prometheus_spark.model import MICROS_PER_HOUR

    hour = (F.expr(f"ts_us div {MICROS_PER_HOUR}") * 3600).alias("hour_ts")
    counts = (
        samples(spark, sf_dir)
        .select("metric", hour, _bucket_idx_col())
        .groupBy("metric", "hour_ts", "bucket_idx")
        .agg(F.count(F.lit(1)).cast("long").alias("bucket_count"))
    )
    w = Window.partitionBy("metric", "hour_ts").orderBy("bucket_idx")
    cum = counts.select(
        "metric",
        "hour_ts",
        "bucket_idx",
        "bucket_count",
        F.sum("bucket_count").over(w).cast("long").alias("cum"),
        F.sum("bucket_count")
        .over(Window.partitionBy("metric", "hour_ts"))
        .cast("long")
        .alias("total"),
    )
    joined = cum.crossJoin(F.broadcast(_quantile_params(spark)))
    target = F.col("p") * F.col("total")
    hit = joined.filter(F.col("cum") >= target)
    pick_w = Window.partitionBy("metric", "hour_ts", "p").orderBy("bucket_idx")
    first_hit = (
        hit.withColumn("pick", F.row_number().over(pick_w))
        .filter(F.col("pick") == 1)
    )
    lb = F.element_at(
        F.array(*([F.lit(0.0)] + [F.lit(b) for b in BOUNDS])),
        F.col("bucket_idx") + 1,
    )
    ub = F.element_at(
        F.array(*[F.lit(b) for b in BOUNDS] + [F.lit(BOUNDS[-1])]),
        F.col("bucket_idx") + 1,
    )
    cum_prev = F.col("cum") - F.col("bucket_count")
    interp = lb + (ub - lb) * (target - cum_prev) / F.col("bucket_count")
    q = F.when(
        F.col("bucket_idx") == len(BOUNDS), F.lit(BOUNDS[-1])
    ).otherwise(interp)
    return first_hit.select(
        "metric", "hour_ts", "p", F.round(q, 4).alias("q")
    )


_PS_VALUES = ", ".join(f"(CAST({p!r} AS DOUBLE))" for p in QUANTILES)
_LB_SQL = "CASE bucket_idx " + " ".join(
    f"WHEN {i} THEN {lb!r}" for i, lb in enumerate([0.0] + BOUNDS[:-1])
) + f" ELSE {BOUNDS[-1]!r} END"
_UB_SQL = "CASE bucket_idx " + " ".join(
    f"WHEN {i} THEN {ub!r}" for i, ub in enumerate(BOUNDS)
) + f" ELSE {BOUNDS[-1]!r} END"

_BUCKET_COUNTS_SQL = (
    f"{SAMPLES_CTE}, b AS (SELECT metric, {_bucket_idx_sql()} AS bucket_idx "
    "FROM samples), g AS (SELECT metric, bucket_idx, "
    "CAST(COUNT(*) AS BIGINT) AS bucket_count FROM b GROUP BY metric, bucket_idx)"
)

_BOUNDS_VALUES = ", ".join(
    f"('{m}', {i}, {b!r})"
    for m, bs in sorted(SERIES_BOUNDS.items())
    for i, b in enumerate(bs)
)

QUERIES = {
    "histogram_buckets": histogram_buckets,
    "histogram_bounds_per_series": histogram_bounds_per_series,
    "histogram_fraction": histogram_fraction,
    "histogram_sum_count": histogram_sum_count,
    "histogram_quantile": histogram_quantile,
    "histogram_quantile_bucketed": histogram_quantile_bucketed,
    "histogram_quantile_windowed": histogram_quantile_windowed,
}

ORACLES = {
    "histogram_bounds_per_series": (
        f"{SAMPLES_CTE}, bv(metric, i, bound) AS (VALUES {_BOUNDS_VALUES}), "
        "bi AS (SELECT s.event_id, s.metric, "
        "COUNT(CASE WHEN s.value > bv.bound THEN 1 END) AS bucket_idx "
        "FROM samples s JOIN bv ON bv.metric = s.metric "
        "GROUP BY s.event_id, s.metric), "
        "g AS (SELECT metric, bucket_idx, "
        "CAST(COUNT(*) AS BIGINT) AS bucket_count "
        "FROM bi GROUP BY metric, bucket_idx) "
        "SELECT g.metric, CAST(g.bucket_idx AS BIGINT) AS le_idx, "
        "b2.bound AS le, "
        "g.bucket_count, "
        "CAST(SUM(g.bucket_count) OVER (PARTITION BY g.metric "
        "ORDER BY g.bucket_idx) AS BIGINT) AS cum_count "
        "FROM g LEFT JOIN bv b2 "
        "ON b2.metric = g.metric AND b2.i = g.bucket_idx"
    ),
    "histogram_buckets": (
        f"{_BUCKET_COUNTS_SQL} "
        f"SELECT metric, CAST(bucket_idx AS BIGINT) AS le_idx, "
        f"{_le_label_sql()} AS le, bucket_count, "
        "CAST(SUM(bucket_count) OVER (PARTITION BY metric ORDER BY bucket_idx) "
        "AS BIGINT) AS cum_count FROM g"
    ),
    "histogram_fraction": (
        f"{_BUCKET_COUNTS_SQL}, c AS (SELECT metric, bucket_idx, "
        "SUM(bucket_count) OVER (PARTITION BY metric ORDER BY bucket_idx) "
        "AS cum, SUM(bucket_count) OVER (PARTITION BY metric) AS tot FROM g) "
        f"SELECT metric, CAST(bucket_idx AS BIGINT) AS le_idx, "
        f"{_le_label_sql()} AS le, "
        + dround("cum * 1.0 / tot", 4)
        + " AS frac FROM c"
    ),
    "histogram_sum_count": (
        f"{SAMPLES_CTE} "
        "SELECT metric, ROUND(SUM(value), 4) AS hist_sum, "
        "CAST(COUNT(*) AS BIGINT) AS hist_count FROM samples GROUP BY metric"
    ),
    "histogram_quantile": (
        f"{SAMPLES_CTE}, ordered AS (SELECT metric, value, "
        "ROW_NUMBER() OVER (PARTITION BY metric ORDER BY value, event_id) - 1 AS rn, "
        "COUNT(*) OVER (PARTITION BY metric) AS n FROM samples), "
        f"ps(p) AS (VALUES {_PS_VALUES}), "
        "base AS (SELECT DISTINCT metric, n FROM ordered), "
        "tgt AS (SELECT metric, p, p * (n - 1) AS h, "
        "CAST(FLOOR(p * (n - 1)) AS BIGINT) AS lo, "
        "CAST(CEIL(p * (n - 1)) AS BIGINT) AS hi FROM base, ps) "
        "SELECT t.metric, t.p, "
        "ROUND(l.value + (t.h - t.lo) * (h2.value - l.value), 4) AS q "
        "FROM tgt t "
        "JOIN ordered l ON l.metric = t.metric AND l.rn = t.lo "
        "JOIN ordered h2 ON h2.metric = t.metric AND h2.rn = t.hi"
    ),
    "histogram_quantile_bucketed": (
        f"{_BUCKET_COUNTS_SQL}, "
        "c AS (SELECT metric, bucket_idx, bucket_count, "
        "CAST(SUM(bucket_count) OVER (PARTITION BY metric ORDER BY bucket_idx) AS BIGINT) AS cum, "
        "CAST(SUM(bucket_count) OVER (PARTITION BY metric) AS BIGINT) AS total FROM g), "
        f"ps(p) AS (VALUES {_PS_VALUES}), "
        "hit AS (SELECT c.*, ps.p, ps.p * c.total AS target, "
        "ROW_NUMBER() OVER (PARTITION BY c.metric, ps.p ORDER BY c.bucket_idx) AS pick "
        "FROM c, ps WHERE c.cum >= ps.p * c.total) "
        "SELECT metric, p, "
        + dround(
            f"CASE WHEN bucket_idx = {len(BOUNDS)} THEN {BOUNDS[-1]!r} "
            f"ELSE ({_LB_SQL}) + (({_UB_SQL}) - ({_LB_SQL})) "
            "* (target - (cum - bucket_count)) / bucket_count END",
            4,
        )
        + " AS q FROM hit WHERE pick = 1"
    ),
    "histogram_quantile_windowed": (
        f"{SAMPLES_CTE}, b AS (SELECT metric, "
        "(ts_us // 3600000000) * 3600 AS hour_ts, "
        f"{_bucket_idx_sql()} AS bucket_idx FROM samples), "
        "g AS (SELECT metric, hour_ts, bucket_idx, "
        "CAST(COUNT(*) AS BIGINT) AS bucket_count "
        "FROM b GROUP BY metric, hour_ts, bucket_idx), "
        "c AS (SELECT metric, hour_ts, bucket_idx, bucket_count, "
        "CAST(SUM(bucket_count) OVER (PARTITION BY metric, hour_ts "
        "ORDER BY bucket_idx) AS BIGINT) AS cum, "
        "CAST(SUM(bucket_count) OVER (PARTITION BY metric, hour_ts) "
        "AS BIGINT) AS total FROM g), "
        f"ps(p) AS (VALUES {_PS_VALUES}), "
        "hit AS (SELECT c.*, ps.p, ps.p * c.total AS target, "
        "ROW_NUMBER() OVER (PARTITION BY c.metric, c.hour_ts, ps.p "
        "ORDER BY c.bucket_idx) AS pick "
        "FROM c, ps WHERE c.cum >= ps.p * c.total) "
        "SELECT metric, hour_ts, p, "
        + dround(
            f"CASE WHEN bucket_idx = {len(BOUNDS)} THEN {BOUNDS[-1]!r} "
            f"ELSE ({_LB_SQL}) + (({_UB_SQL}) - ({_LB_SQL})) "
            "* (target - (cum - bucket_count)) / bucket_count END",
            4,
        )
        + " AS q FROM hit WHERE pick = 1"
    ),
}
