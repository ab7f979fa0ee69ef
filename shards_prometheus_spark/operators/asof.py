"""As-of (point-in-time) join — the canonical TSDB operator Spark
lacks as a built-in.

PromQL's instant-vector evaluation is an as-of join in disguise: "the
latest sample at or before T per series, within lookback"
(SURVEY.md §2b #5 — scrape snapshot of the registry state at T,
prometheus.cpp:80). The general form joins every probe row to the most
recent reference row per key.

Implementation is the scalable union trick, NOT a range join:
tag both streams, union, one window per key ordered by
(ts, is_probe, seq) carrying last_value(ref, ignorenulls) forward, keep
probe rows. One shuffle on the key, one sort — O(n log n) per key
partition, no quadratic candidate generation, and skew follows the key
distribution exactly like every other per-series operator here.

Reference rows are pre-aggregated to one row per (key, ts) so tie
semantics are deterministic on both engines (DuckDB ASOF JOIN, which
the oracle uses natively, leaves same-ts duplicates unspecified).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shards_prometheus_spark.model import SAMPLES_CTE, samples

PROBE_METRIC = "purchase"
REF_METRIC = "click"


def asof_join(
    probe: DataFrame,
    ref: DataFrame,
    by: str,
    ts: str,
    value_col: str,
    out: str = "asof_value",
) -> DataFrame:
    """Left as-of join: for each probe row, the latest `value_col` from
    `ref` with ref.ts <= probe.ts, matched on `by`.

    probe keeps all its columns; `ref` must have (by, ts, value_col)
    with one row per (by, ts).
    """
    p = probe.withColumn("_is_probe", F.lit(1)).withColumn(
        "_ref_v", F.lit(None).cast("double")
    )
    r = ref.select(
        F.col(by),
        F.col(ts),
        F.lit(0).alias("_is_probe"),
        F.col(value_col).cast("double").alias("_ref_v"),
    )
    merged = p.select(
        *[F.col(c) for c in probe.columns], "_is_probe", "_ref_v"
    ).unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts), F.col("_is_probe"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried: Column = F.last("_ref_v", ignorenulls=True).over(w)
    return (
        merged.withColumn(out, carried)
        .filter(F.col("_is_probe") == 1)
        .drop("_is_probe", "_ref_v")
    )


def asof_join_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase joined to the user's latest preceding click value
    (point-in-time attribution — no future leakage by construction)."""
    s = samples(spark, sf_dir)
    probe = s.filter(F.col("metric") == PROBE_METRIC).select(
        "event_id", "label_user", "ts_us", "value"
    )
    ref = (
        s.filter(F.col("metric") == REF_METRIC)
        .groupBy("label_user", "ts_us")
        .agg(F.max("value").alias("ref_value"))
    )
    joined = asof_join(
        probe, ref, by="label_user", ts="ts_us", value_col="ref_value"
    )
    return joined.select(
        "event_id",
        "label_user",
        "ts_us",
        F.round("value", 4).alias("value"),
        F.round("asof_value", 4).alias("asof_value"),
    )


#: Range-join window: count ref events within this many µs BEFORE probe.
RANGE_WINDOW_US = 3_600 * 1_000_000


def range_join_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase: clicks by the same user in the preceding hour.

    A naive `t1 - w <= t2 <= t1` join plans as a nested loop at scale;
    instead both sides are bucketed to the window size and candidates
    come from an equi-join on (key, bucket) with the probe matched to
    its own and the previous bucket — any ref within the window is in
    one of the two (complete, not approximate), and the exact time
    predicate filters the equi-join's candidates. Shuffle volume is
    O(matches within ±1 bucket), never O(n²).
    """
    s = samples(spark, sf_dir)
    bucket = lambda c: (c / RANGE_WINDOW_US).cast("long")  # noqa: E731
    probe = s.filter(F.col("metric") == PROBE_METRIC).select(
        "event_id",
        "label_user",
        F.col("ts_us").alias("p_ts"),
        bucket(F.col("ts_us")).alias("bkt"),
    )
    ref = s.filter(F.col("metric") == REF_METRIC).select(
        F.col("label_user"),
        F.col("ts_us").alias("r_ts"),
        bucket(F.col("ts_us")).alias("r_bkt"),
    )
    # probe row explodes to its own and the previous bucket id
    cand = probe.withColumn(
        "r_bkt", F.explode(F.array(F.col("bkt") - 1, F.col("bkt")))
    )
    hits = cand.join(ref, ["label_user", "r_bkt"]).filter(
        (F.col("r_ts") <= F.col("p_ts"))
        & (F.col("r_ts") > F.col("p_ts") - F.lit(RANGE_WINDOW_US))
    )
    counts = hits.groupBy("event_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_clicks_1h")
    )
    return (
        probe.join(counts, "event_id", "left")
        .select(
            "event_id",
            "label_user",
            F.col("p_ts").alias("ts_us"),
            F.coalesce("n_clicks_1h", F.lit(0)).cast("long").alias(
                "n_clicks_1h"
            ),
        )
    )


QUERIES = {
    "asof_join_demo": asof_join_demo,
    "range_join_demo": range_join_demo,
}

ORACLES = {
    # DuckDB's native ASOF JOIN is the independent semantic oracle.
    "asof_join_demo": (
        f"{SAMPLES_CTE}, probe AS (SELECT event_id, label_user, ts_us, value "
        f"FROM samples WHERE metric = '{PROBE_METRIC}'), "
        "ref AS (SELECT label_user, ts_us, MAX(value) AS ref_value "
        f"FROM samples WHERE metric = '{REF_METRIC}' "
        "GROUP BY label_user, ts_us) "
        "SELECT p.event_id, p.label_user, p.ts_us, "
        "ROUND(p.value, 4) AS value, ROUND(r.ref_value, 4) AS asof_value "
        "FROM probe p ASOF LEFT JOIN ref r "
        "ON p.label_user = r.label_user AND p.ts_us >= r.ts_us"
    ),
    # the oracle states the range join as the naive inequality join —
    # semantics, not strategy
    "range_join_demo": (
        f"{SAMPLES_CTE}, probe AS (SELECT event_id, label_user, ts_us "
        f"FROM samples WHERE metric = '{PROBE_METRIC}'), "
        "ref AS (SELECT label_user, ts_us AS r_ts FROM samples "
        f"WHERE metric = '{REF_METRIC}') "
        "SELECT p.event_id, p.label_user, p.ts_us, "
        "CAST(COUNT(r.r_ts) AS BIGINT) AS n_clicks_1h "
        "FROM probe p LEFT JOIN ref r ON r.label_user = p.label_user "
        "AND r.r_ts <= p.ts_us "
        f"AND r.r_ts > p.ts_us - {RANGE_WINDOW_US} "
        "GROUP BY p.event_id, p.label_user, p.ts_us"
    ),
}
