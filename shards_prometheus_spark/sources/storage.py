"""Physical layout for the 100 TB samples table.

The reference's state is resident atomics (prometheus.cpp:34-45); at
Spark scale the registry is a partitioned parquet/Delta table. Layout
choice (SURVEY.md §1.2): partition by (event date, metric) —

- `metric` equality matchers prune whole partitions (the common case:
  every PromQL selector names a metric);
- date partitions bound scans for range selectors and make retention a
  partition drop (no rewrite);
- within files, rows sorted by (label_user, ts_us) so parquet row-group
  min/max stats skip on both series and time predicates.

Partition count math, 100 TB: ~365 dates × ~100 metrics = 36 500
partitions of ~2.7 GB — comfortably under the small-files regime with
~128 MB row groups (~20 files each).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shards_prometheus_spark.model import samples
from shards_prometheus_spark.session import prepare_session


def write_samples_partitioned(
    spark: SparkSession, sf_dir: str, out_path: str
) -> None:
    """Materialize the samples view as a (date, metric)-partitioned
    parquet table with in-file ordering for row-group skipping."""
    df = samples(spark, sf_dir).withColumn(
        "event_date",
        F.to_date(F.timestamp_micros(F.col("ts_us"))),
    )
    (
        df.repartition("event_date", "metric")
        .sortWithinPartitions("label_user", "ts_us")
        .write.mode("overwrite")
        .partitionBy("event_date", "metric")
        .parquet(out_path)
    )


def read_samples_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned layout back (partition columns restored)."""
    prepare_session(spark)
    return spark.read.parquet(path)


#: Text-format schema for CSV/JSON interchange (the map column is
#: excluded — text formats have no portable map type; label_user is the
#: materialized hot label, SURVEY.md §1.2).
TEXT_SCHEMA = (
    "event_id LONG, metric STRING, label_user STRING, "
    "ts_us LONG, value DOUBLE"
)


def write_samples_text(
    spark: SparkSession, sf_dir: str, out_path: str, fmt: str = "csv"
) -> None:
    """Interchange export: the samples relation as CSV or JSON lines.

    Spark prints doubles in shortest round-trip form, so a text export
    re-imports bit-identically (pinned in tests). For 100 TB these
    formats are interchange-only — no pushdown, no column pruning, no
    row-group stats; parquet stays the at-rest layout."""
    df = samples(spark, sf_dir).select(
        "event_id", "metric", "label_user", "ts_us", "value"
    )
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", True).csv(out_path)
    elif fmt == "json":
        writer.json(out_path)
    else:
        raise ValueError(f"unsupported text format: {fmt}")


def read_samples_text(
    spark: SparkSession, path: str, fmt: str = "csv"
) -> DataFrame:
    """Read a text export back with the explicit schema (never infer —
    schema inference is a full extra pass and nondeterministic on
    partial data)."""
    prepare_session(spark)
    if fmt == "csv":
        return spark.read.schema(TEXT_SCHEMA).option("header", True).csv(path)
    if fmt == "json":
        return spark.read.schema(TEXT_SCHEMA).json(path)
    raise ValueError(f"unsupported text format: {fmt}")


def write_samples_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    path: str,
    n_buckets: int = 8,
) -> None:
    """Materialize samples as a parquet table bucketed + sorted by the
    series identity (metric, label_user).

    Bucketing is the at-rest answer to the engine's one recurring
    exchange: every per-series aggregation and every series-aligned
    join (vector binops, scrape snapshot unions) hash-distributes on
    the series key, and a bucketed scan already satisfies that
    distribution — aggregations and co-located joins run with ZERO
    shuffles (pinned by tests/test_plans.py). At 100 TB this is the
    difference between re-shuffling the corpus per query and never
    shuffling it at all; the reference's analog is that its registry
    is permanently "clustered" by series object identity
    (prometheus.cpp:34-45)."""
    df = samples(spark, sf_dir)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, "metric", "label_user")
        .sortBy("metric", "label_user")
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_series_stats_join(
    spark: SparkSession, table_a: str, table_b: str
) -> DataFrame:
    """Per-series sum from one bucketed table joined to per-series
    count from another — agg + agg + join with no Exchange anywhere
    when both tables are bucketed by the series key."""
    keys = ["metric", "label_user"]
    a = (
        spark.table(table_a)
        .groupBy(*keys)
        .agg(F.round(F.sum("value"), 4).alias("sum_value"))
    )
    b = (
        spark.table(table_b)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return a.join(b, keys)
