"""Streaming ingest smoke tests (SURVEY.md §2b #17).

The reference's runtime is an unbounded tick loop updating running
state (test.edn:2-8); these tests check the Structured Streaming
equivalents converge to exactly the batch answers.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from shards_prometheus_spark.operators.counters import counter_sum
from shards_prometheus_spark.streaming import (
    counter_totals_stream,
    run_to_memory,
    samples_stream,
    stream_events,
    windowed_sums_stream,
)
from tests.conftest import SF_SMOKE


def _await(query, timeout=120):
    deadline = time.time() + timeout
    while query.isActive and time.time() < deadline:
        time.sleep(0.5)
    assert not query.isActive, "streaming query did not finish"


def test_stream_counter_totals_match_batch(spark):
    stream = samples_stream(stream_events(spark, SF_SMOKE))
    q = run_to_memory(counter_totals_stream(stream), "totals_t")
    _await(q)
    got = {
        (r["metric"], r["label_user"]): (round(r["total"], 4), r["n_samples"])
        for r in spark.table("totals_t").collect()
    }
    want = {
        (r["metric"], r["label_user"]): (r["sum_value"], r["n_samples"])
        for r in counter_sum(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_stream_windowed_sums_match_batch(spark):
    stream = samples_stream(stream_events(spark, SF_SMOKE))
    q = run_to_memory(windowed_sums_stream(stream), "hourly_t")
    _await(q)
    got = {
        (r["metric"], r["window_start"].isoformat()): round(r["sum_value"], 4)
        for r in spark.table("hourly_t").collect()
    }
    # batch twin over the same projection
    from shards_prometheus_spark.model import samples

    batch = (
        samples(spark, SF_SMOKE)
        .groupBy(
            F.window(F.timestamp_micros("ts_us"), "1 hour").alias("w"), "metric"
        )
        .agg(F.round(F.sum("value"), 4).alias("s"))
        .select(F.col("w.start").alias("ws"), "metric", "s")
    )
    want = {
        (r["metric"], r["ws"].isoformat()): r["s"] for r in batch.collect()
    }
    assert got == want
