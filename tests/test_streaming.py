"""Streaming ingest smoke tests (SURVEY.md §2b #17).

The reference's runtime is an unbounded tick loop updating running
state (test.edn:2-8); these tests check the Structured Streaming
equivalents converge to exactly the batch answers.
"""

from __future__ import annotations

import datetime
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


def test_rate_source_feeds_counter_aggs(spark):
    """Non-file source: the built-in rate source (the driver-less analog
    of the reference's 5 Hz tick loop, test.edn:8) drives the same
    update-mode counter aggregation."""
    from shards_prometheus_spark.streaming import counter_totals_stream

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 100)
        .load()
        .selectExpr(
            "value AS event_id",
            "CASE CAST(value % 3 AS INT) WHEN 0 THEN 'tick_a' "
            "WHEN 1 THEN 'tick_b' ELSE 'tick_c' END AS metric",
            "CAST(value % 5 AS STRING) AS label_user",
            "unix_micros(timestamp) AS ts_us",
            "CAST(1.0 AS DOUBLE) AS value",
        )
    )
    q = (
        counter_totals_stream(rate)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("rate_totals_t")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            rows = spark.table("rate_totals_t").collect()
            if len(rows) >= 3:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    metrics = {r["metric"] for r in rows}
    assert metrics & {"tick_a", "tick_b", "tick_c"}
    assert all(r["total"] == r["n_samples"] for r in rows)  # unit ticks


def test_stream_gauge_and_histogram_match_batch(spark):
    """All three reference metric kinds stream: gauge last-write and
    histogram bucket counts in update mode equal their batch twins."""
    from shards_prometheus_spark.operators.gauges import gauge_last
    from shards_prometheus_spark.operators.histograms import (
        BOUNDS,
        histogram_buckets,
    )
    from shards_prometheus_spark.streaming import (
        gauge_last_stream,
        histogram_buckets_stream,
    )

    stream = samples_stream(stream_events(spark, SF_SMOKE))
    q1 = run_to_memory(gauge_last_stream(stream), "gauge_t")
    _await(q1)
    got_g = {
        (r["metric"], r["label_user"]): round(r["last_value"], 4)
        for r in spark.table("gauge_t").collect()
    }
    want_g = {
        (r["metric"], r["label_user"]): r["last_value"]
        for r in gauge_last(spark, SF_SMOKE).collect()
    }
    assert got_g == want_g

    stream2 = samples_stream(stream_events(spark, SF_SMOKE))
    q2 = run_to_memory(histogram_buckets_stream(stream2, BOUNDS), "hist_t")
    _await(q2)
    got_h = {
        (r["metric"], r["bucket_idx"]): r["bucket_count"]
        for r in spark.table("hist_t").collect()
    }
    want_h = {
        (r["metric"], r["le_idx"]): r["bucket_count"]
        for r in histogram_buckets(spark, SF_SMOKE).collect()
    }
    assert got_h == want_h


def test_stream_session_windows_match_batch(spark):
    """Session windows (30 min gap) over the stream equal the batch
    sessionization computed with a lag-gap cumulative-sum window."""
    from shards_prometheus_spark.model import samples
    from shards_prometheus_spark.streaming import session_windows_stream

    stream = samples_stream(stream_events(spark, SF_SMOKE))
    q = run_to_memory(
        session_windows_stream(stream), "sessions_t", output_mode="complete"
    )
    _await(q)
    got = {
        (r["label_user"], r["session_start"].isoformat()): (
            round(r["sum_value"], 4),
            r["n_events"],
        )
        for r in spark.table("sessions_t").collect()
    }
    # batch twin: gap > 30 min starts a new session per user
    from pyspark.sql import Window

    s = samples(spark, SF_SMOKE)
    w = Window.partitionBy("label_user").orderBy("ts_us", "event_id")
    gap_us = 30 * 60 * 1_000_000
    sess = (
        s.withColumn("prev_ts", F.lag("ts_us").over(w))
        .withColumn(
            "new_sess",
            (
                F.col("prev_ts").isNull()
                | (F.col("ts_us") - F.col("prev_ts") > gap_us)
            ).cast("int"),
        )
        .withColumn("sess_id", F.sum("new_sess").over(w))
        .groupBy("label_user", "sess_id")
        .agg(
            F.min("ts_us").alias("start_us"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    want = {
        (
            r["label_user"],
            __import__("datetime")
            .datetime.fromtimestamp(
                r["start_us"] / 1e6, tz=__import__("datetime").timezone.utc
            )
            .replace(tzinfo=None)
            .isoformat(),
        ): (r["sum_value"], r["n_events"])
        for r in sess.collect()
    }
    assert got == want


def test_stateful_increase_matches_batch_lag(spark, tmp_path):
    """applyInPandasWithState across REAL micro-batches: events split
    into 4 time-ordered files (maxFilesPerTrigger=1 → 4 batches), so
    per-series lag state must survive batch boundaries. The final
    running increase must equal the batch lag()-window form."""
    import os

    from pyspark.sql import functions as F

    from shards_prometheus_spark.model import samples
    from shards_prometheus_spark.operators.counters import _deltas
    from shards_prometheus_spark.streaming import (
        run_to_memory,
        stateful_increase_stream,
    )
    from shards_prometheus_spark.streaming.ingest import (
        EVENTS_SCHEMA,
        samples_stream,
    )

    # Split events into 4 contiguous time ranges, one file each, with
    # ascending mtimes so the file source replays them in time order.
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").orderBy("ts")
    n = ev.count()
    src = str(tmp_path / "events_split")
    rows = ev.collect()
    os.makedirs(src, exist_ok=True)
    chunk = (n + 3) // 4
    for i in range(4):
        pdf = spark.createDataFrame(rows[i * chunk : (i + 1) * chunk], ev.schema)
        d = f"{src}/batch_{i}.parquet.dir"
        pdf.coalesce(1).write.mode("overwrite").parquet(d)
        # oldest-mtime-first is the file source's replay order
        for root, _, files in os.walk(d):
            for fn in files:
                os.utime(os.path.join(root, fn), (1_000_000 + i, 1_000_000 + i))
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet.dir")
    )
    q = run_to_memory(
        stateful_increase_stream(samples_stream(stream)), "increase_t"
    )
    _await(q)
    got: dict = {}
    for r in spark.table("increase_t").collect():
        k = (r["metric"], r["label_user"])
        v = (round(r["total_increase"], 4), r["n_samples"])
        if k not in got or v[1] > got[k][1]:
            got[k] = v
    want_df = (
        _deltas(spark, SF_SMOKE)
        .groupBy("metric", "label_user")
        .agg(
            F.round(F.sum("delta"), 4).alias("ti"),
            (F.count(F.lit(1)) + 1).alias("n"),
        )
    )
    want = {
        (r["metric"], r["label_user"]): (r["ti"], r["n"])
        for r in want_df.collect()
    }
    # series with a single sample produce no delta row in the batch
    # form but do appear (increase 0) in the stream — align on shared
    singles = {k for k in got if k not in want}
    for k in singles:
        assert got[k][0] == 0.0
        del got[k]
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


def _split_events_dir(spark, tmp_path, n_parts=4, copies=1):
    """Events split into n_parts time-ordered files (ascending mtimes →
    file-source replay order); copies>1 re-delivers each part."""
    import os

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").orderBy("ts")
    rows = ev.collect()
    src = str(tmp_path / "events_split")
    os.makedirs(src, exist_ok=True)
    chunk = (len(rows) + n_parts - 1) // n_parts
    seq = 0
    for i in range(n_parts):
        pdf = spark.createDataFrame(rows[i * chunk : (i + 1) * chunk], ev.schema)
        for c in range(copies):
            d = f"{src}/batch_{i}_{c}.parquet.dir"
            pdf.coalesce(1).write.mode("overwrite").parquet(d)
            seq += 1
            for root, _, files in os.walk(d):
                for fn in files:
                    os.utime(
                        os.path.join(root, fn),
                        (1_000_000 + seq, 1_000_000 + seq),
                    )
    return f"{src}/*.parquet.dir", len(rows)


def test_continuous_rollup_matches_batch(spark, tmp_path):
    """foreachBatch partial-aggregate rollup across 4 real micro-batches
    merges (on read) to exactly the batch hourly aggregation."""
    from shards_prometheus_spark.model import MICROS_PER_HOUR, samples
    from shards_prometheus_spark.streaming import continuous_rollup, read_rollup
    from shards_prometheus_spark.streaming.ingest import EVENTS_SCHEMA, samples_stream

    glob, _ = _split_events_dir(spark, tmp_path, n_parts=4)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(glob)
    )
    out = str(tmp_path / "rollup_out")
    q = continuous_rollup(
        samples_stream(stream), out, str(tmp_path / "ckpt")
    )
    _await(q)
    got = {tuple(r) for r in read_rollup(spark, out).collect()}
    want = {
        tuple(r)
        for r in samples(spark, SF_SMOKE)
        .withColumn(
            "hour_ts", F.expr(f"ts_us div {MICROS_PER_HOUR}") * 3600
        )
        .groupBy("metric", "label_user", "hour_ts")
        .agg(
            F.round(F.sum("value"), 4).alias("sum_v"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.min("value"), 4).alias("min_v"),
            F.round(F.max("value"), 4).alias("max_v"),
        )
        .collect()
    }
    assert got == want


def test_stream_dedup_drops_redelivered_events(spark, tmp_path):
    """Each micro-batch re-delivered twice; dropDuplicatesWithinWatermark
    keeps exactly one copy of every event."""
    from shards_prometheus_spark.streaming import dedup_events_stream, run_to_memory
    from shards_prometheus_spark.streaming.ingest import EVENTS_SCHEMA, samples_stream

    glob, n = _split_events_dir(spark, tmp_path, n_parts=2, copies=2)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(glob)
    )
    q = run_to_memory(
        dedup_events_stream(samples_stream(stream)),
        "dedup_stream_t",
        output_mode="append",
    )
    _await(q)
    out = spark.table("dedup_stream_t")
    assert out.count() == n
    assert out.select("event_id").distinct().count() == n


def test_stream_static_enrichment(spark):
    """Stream-static broadcast join: every streamed sample is enriched
    with its customer dimension row (user ids ⊂ customer keys)."""
    from shards_prometheus_spark.model import load_table
    from shards_prometheus_spark.streaming import run_to_memory, samples_stream, stream_events
    from shards_prometheus_spark.streaming.ingest import enriched_stream

    q = run_to_memory(
        enriched_stream(
            samples_stream(stream_events(spark, SF_SMOKE)),
            load_table(spark, SF_SMOKE, "customer"),
        ),
        "enriched_t",
        output_mode="append",
    )
    _await(q)
    out = spark.table("enriched_t")
    n = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert out.count() == n
    assert out.filter("c_mktsegment IS NULL").count() == 0


def test_continuous_rollup_checkpoint_is_idempotent(spark, tmp_path):
    """Restarting the rollup stream against the same checkpoint must
    append NOTHING — the checkpointed source offsets make re-delivery
    impossible, which is what makes foreachBatch-append exactly-once."""
    from shards_prometheus_spark.streaming import continuous_rollup
    from shards_prometheus_spark.streaming.ingest import samples_stream, stream_events

    out = str(tmp_path / "rollup_out")
    ckpt = str(tmp_path / "ckpt")
    for _ in range(2):
        q = continuous_rollup(
            samples_stream(stream_events(spark, SF_SMOKE)), out, ckpt
        )
        q.awaitTermination(120)
    n_partials = spark.read.parquet(out).count()
    q = continuous_rollup(
        samples_stream(stream_events(spark, SF_SMOKE)), out, ckpt
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_partials


def test_stateful_increase_rocksdb_ttl_late_data(spark, tmp_path):
    """The at-scale state configuration, exercised for real: RocksDB
    state store provider + event-time TTL eviction, across 3 true
    micro-batches containing counter resets AND late data (rows shuffled
    within each batch file, so the fold must re-order by event time
    inside the batch). The final running increase must equal the
    reset-clamped fold over the event-time-ordered samples."""
    import os

    from shards_prometheus_spark.streaming import (
        run_to_memory,
        samples_stream,
        stateful_increase_stream,
        use_rocksdb_state_store,
    )
    from shards_prometheus_spark.streaming.ingest import EVENTS_SCHEMA

    # one counter series, 3 micro-batches; values reset twice; rows
    # inside each batch are written OUT of time order (late data)
    base_us = 1_700_000_000_000_000
    batches = [
        [(2, 5.0), (1, 1.0), (3, 9.0)],          # shuffled: 1,5,9
        [(5, 6.0), (4, 2.0), (6, 10.0)],         # reset to 2, then 6,10
        [(8, 7.0), (9, 11.0), (7, 3.0)],         # reset to 3, then 7,11
    ]
    # expected fold over 1,5,9,2,6,10,3,7,11 → 4+4+2+4+4+3+4+4 = 29
    expected_total, expected_n = 29.0, 9
    src = str(tmp_path / "rocks_events")
    os.makedirs(src, exist_ok=True)
    epoch = datetime.datetime(1970, 1, 1)
    for i, rows in enumerate(batches):
        pdf = spark.createDataFrame(
            [
                (
                    k,
                    epoch
                    + datetime.timedelta(
                        microseconds=base_us + k * 60_000_000
                    ),
                    7,
                    "cnt",
                    v,
                    "{}",
                )
                for k, v in rows
            ],
            EVENTS_SCHEMA,
        )
        d = f"{src}/batch_{i}.parquet.dir"
        pdf.coalesce(1).write.mode("overwrite").parquet(d)
        for root, _, files in os.walk(d):
            for fn in files:
                os.utime(os.path.join(root, fn), (1_000_000 + i,) * 2)
    use_rocksdb_state_store(spark)
    try:
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*.parquet.dir")
        )
        q = run_to_memory(
            stateful_increase_stream(
                samples_stream(stream), state_ttl="365 days"
            ),
            "rocks_increase_t",
        )
        _await(q)
        progress = q.lastProgress
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    rows = spark.table("rocks_increase_t").collect()
    final = max(rows, key=lambda r: r["n_samples"])
    assert final["metric"] == "cnt"
    assert final["n_samples"] == expected_n
    assert round(final["total_increase"], 4) == expected_total
    # the query really ran on RocksDB: provider-specific state metrics
    assert "rocksdb" in str(progress["stateOperators"]).lower()


def test_stream_stream_interval_join_matches_batch(spark):
    """Watermarked stream-stream interval join (click→purchase within
    1h per user) produces exactly the batch join's pairs."""
    from shards_prometheus_spark.model import samples
    from shards_prometheus_spark.streaming import (
        interval_join_stream,
        run_to_memory,
        samples_stream,
        stream_events,
    )

    clicks = samples_stream(stream_events(spark, SF_SMOKE)).filter(
        F.col("metric") == "click"
    )
    buys = samples_stream(stream_events(spark, SF_SMOKE)).filter(
        F.col("metric") == "purchase"
    )
    q = run_to_memory(
        interval_join_stream(clicks, buys),
        "ssjoin_t",
        output_mode="append",
    )
    _await(q)
    got = {
        (r["l_id"], r["r_id"]) for r in spark.table("ssjoin_t").collect()
    }

    s = samples(spark, SF_SMOKE)
    l = s.filter(F.col("metric") == "click").select(
        F.col("label_user").alias("u"),
        F.col("ts_us").alias("l_ts"),
        F.col("event_id").alias("l_id"),
    )
    r = s.filter(F.col("metric") == "purchase").select(
        F.col("label_user").alias("u"),
        F.col("ts_us").alias("r_ts"),
        F.col("event_id").alias("r_id"),
    )
    want = {
        (row["l_id"], row["r_id"])
        for row in l.join(r, "u")
        .filter(
            (F.col("r_ts") > F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + 3600 * 1_000_000)
        )
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_compaction_survives_crash_orphan_slice(spark, tmp_path):
    """A crash between the slice rename and the manifest replace leaves
    an orphan batch_id=-(gen+1) dir. The next compaction must remove
    the orphan and succeed (not ENOTEMPTY forever), and readers must
    see identical results throughout."""
    import os

    from shards_prometheus_spark.model import samples
    from shards_prometheus_spark.streaming import rollup as R

    out = str(tmp_path / "rollup_out")
    s = samples(spark, SF_SMOKE)
    for i in range(2):
        R._partials(s.filter(F.col("event_id") % 2 == i)).write.mode(
            "overwrite"
        ).parquet(f"{out}/batch_id={i}")
    want = {tuple(r) for r in R.read_rollup(spark, out).collect()}
    R.compact_rollup(spark, out)  # gen 1
    # simulate the crashed run: a fully-written but never-activated
    # next-generation slice (manifest still points at gen 1)
    orphan = f"{out}/batch_id=-2"
    R._live_partials(spark, out).limit(3).write.mode("overwrite").parquet(
        orphan
    )
    assert os.path.exists(orphan)
    man_before = R._read_manifest(out)
    assert man_before["gen"] == 1
    assert {tuple(r) for r in R.read_rollup(spark, out).collect()} == want
    R.compact_rollup(spark, out)  # must replace the orphan, gen 2
    man = R._read_manifest(out)
    assert man["gen"] == 2
    assert {tuple(r) for r in R.read_rollup(spark, out).collect()} == want


def test_compaction_skips_uncommitted_batch_dir(spark, tmp_path):
    """A batch dir without _SUCCESS (torn foreachBatch write) must not
    be folded or sealed: it stays live, the replay overwrites it, and
    no rows are lost across the compaction."""
    import os

    from shards_prometheus_spark.model import samples
    from shards_prometheus_spark.streaming import rollup as R

    out = str(tmp_path / "rollup_out")
    s = samples(spark, SF_SMOKE)
    chunk = [s.filter(F.col("event_id") % 3 == i) for i in range(3)]
    for i in range(2):
        R._partials(chunk[i]).write.mode("overwrite").parquet(
            f"{out}/batch_id={i}"
        )
    # torn write of batch 2: only half its rows, no _SUCCESS marker
    R._partials(chunk[2].filter(F.col("event_id") % 2 == 0)).write.mode(
        "overwrite"
    ).parquet(f"{out}/batch_id=2")
    os.remove(f"{out}/batch_id=2/_SUCCESS")

    R.compact_rollup(spark, out)
    man = R._read_manifest(out)
    assert man["max_id"] == 1  # the torn dir was NOT sealed
    assert os.path.exists(f"{out}/batch_id=2")  # ...and not deleted

    # the replay (at-least-once) rewrites batch 2 completely
    R._partials(chunk[2]).write.mode("overwrite").parquet(
        f"{out}/batch_id=2"
    )
    got = {tuple(r) for r in R.read_rollup(spark, out).collect()}
    from shards_prometheus_spark.model import MICROS_PER_HOUR

    truth = {
        tuple(r)
        for r in s.withColumn(
            "hour_ts", F.expr(f"ts_us div {MICROS_PER_HOUR}") * 3600
        )
        .groupBy("metric", "label_user", "hour_ts")
        .agg(
            F.round(F.sum("value"), 4).alias("sum_v"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.min("value"), 4).alias("min_v"),
            F.round(F.max("value"), 4).alias("max_v"),
        )
        .collect()
    }
    assert got == truth


def test_streaming_promql_rate_matches_batch(spark, tmp_path):
    """The parsed PromQL evaluator over the STREAMED samples relation:
    events arrive across ≥2 real micro-batches (4 time-split files,
    maxFilesPerTrigger=1) into an append-mode sink; evaluating
    'sum by (user) (rate(click[720h]))' against the sink table must
    equal the batch evaluator over the original events — the
    scrape-loop-writes / query-engine-reads split of a Prometheus
    server (prometheus.cpp:27-93's exposer, distributed)."""
    from shards_prometheus_spark.functions.promql_parser import (
        PROMQL_RATE_BY_USER,
        PromQLEvaluator,
    )
    from shards_prometheus_spark.streaming import samples_multi_stream
    from shards_prometheus_spark.streaming.ingest import EVENTS_SCHEMA

    glob, _ = _split_events_dir(spark, tmp_path, n_parts=4)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(glob)
    )
    q = run_to_memory(
        samples_multi_stream(stream),
        "promql_stream_samples",
        output_mode="append",
    )
    _await(q)
    fed = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(fed) >= 2, "expected >=2 non-empty micro-batches"

    streamed = spark.table("promql_stream_samples")
    got = {
        (r["labels"], r["value"])
        for r in PromQLEvaluator(streamed)
        .eval(PROMQL_RATE_BY_USER)
        .collect()
    }
    want = {
        (r["labels"], r["value"])
        for r in PromQLEvaluator.from_dir(spark, SF_SMOKE)
        .eval(PROMQL_RATE_BY_USER)
        .collect()
    }
    assert len(want) > 0
    assert got == want


def test_streaming_promql_grid_matches_batch(spark, tmp_path):
    """The LIVE-DASHBOARD story: eval_range (the query_range grid API)
    over the STREAMED samples relation — events arrive across ≥2 real
    micro-batches, then the full step grid of
    'sum by (user) (rate(click[240h]))' over the sink table must equal
    the batch grid over the original events, instant for instant.
    (240h windows: sf0.001 series are too sparse for 2-sample 24h
    windows, and rate needs consecutive in-window samples.)"""
    from shards_prometheus_spark.functions.promql_parser import (
        PromQLEvaluator,
    )

    expr = "sum by (user) (rate(click[240h]))"
    from shards_prometheus_spark.streaming import samples_multi_stream
    from shards_prometheus_spark.streaming.ingest import EVENTS_SCHEMA

    glob, _ = _split_events_dir(spark, tmp_path, n_parts=4)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(glob)
    )
    q = run_to_memory(
        samples_multi_stream(stream),
        "promql_grid_stream_samples",
        output_mode="append",
    )
    _await(q)
    fed = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(fed) >= 2, "expected >=2 non-empty micro-batches"

    span, step = 240 * 3_600_000_000, 24 * 3_600_000_000
    streamed = spark.table("promql_grid_stream_samples")
    got = {
        (r["ts_us"], r["labels"], r["value"])
        for r in PromQLEvaluator(streamed)
        .eval_range(expr, span, step)
        .collect()
    }
    want = {
        (r["ts_us"], r["labels"], r["value"])
        for r in PromQLEvaluator.from_dir(spark, SF_SMOKE)
        .eval_range(expr, span, step)
        .collect()
    }
    assert len(want) > 0
    assert got == want


def test_streaming_rule_groups_match_batch(spark, tmp_path):
    """Live rule evaluation: the recording AND alert rule groups over
    the STREAMED samples relation (events across ≥2 real micro-batches)
    equal the batch groups — the 'rules evaluated each interval against
    the live store' Prometheus-server behavior."""
    from shards_prometheus_spark.functions.promql_parser import (
        PromQLEvaluator,
    )
    from shards_prometheus_spark.operators.rules import (
        ALERT_FOR_RULES,
        ALERT_RULES,
        RECORDING_RULES,
        alert_rules,
        alert_rules_for,
        eval_alert_for_group,
        eval_rule_group,
        recording_rules,
    )
    from shards_prometheus_spark.streaming import samples_multi_stream
    from shards_prometheus_spark.streaming.ingest import EVENTS_SCHEMA

    glob, _ = _split_events_dir(spark, tmp_path, n_parts=3)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(glob)
    )
    q = run_to_memory(
        samples_multi_stream(stream),
        "rules_stream_samples",
        output_mode="append",
    )
    _await(q)
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 2

    ev = PromQLEvaluator(spark.table("rules_stream_samples"))
    for group, name_col, batch_fn in (
        (RECORDING_RULES, "metric", recording_rules),
        (ALERT_RULES, "alertname", alert_rules),
    ):
        got = {
            (r[name_col], r["labels"], r["value"])
            for r in eval_rule_group(ev, group, name_col).collect()
        }
        want = {
            (r[name_col], r["labels"], r["value"])
            for r in batch_fn(spark, SF_SMOKE).collect()
        }
        assert len(want) > 0
        assert got == want

    # `for:`-duration alerts over the live store: the hold-window grid
    # re-derives pending/firing from the streamed samples each
    # evaluation, so the streamed store's firing set equals batch
    got_for = {
        (r["alertname"], r["labels"], r["value"])
        for r in eval_alert_for_group(
            ev, ALERT_FOR_RULES, "alertname"
        ).collect()
    }
    want_for = {
        (r["alertname"], r["labels"], r["value"])
        for r in alert_rules_for(spark, SF_SMOKE).collect()
    }
    assert len(want_for) > 0
    assert got_for == want_for


def test_streaming_countmin_matches_batch(spark, tmp_path):
    """Count-min sketch state accumulated over 4 real micro-batches
    equals the batch sketch cell table (mergeability end to end)."""
    from shards_prometheus_spark.streaming import countmin_cells_stream
    from shards_prometheus_spark.streaming.ingest import (
        EVENTS_SCHEMA,
        samples_stream,
    )
    from shards_prometheus_spark.model import samples
    from shards_prometheus_spark.operators.sketches import (
        CM_P,
        CM_PARAMS,
        CM_W,
    )

    glob, _ = _split_events_dir(spark, tmp_path, n_parts=4)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(glob)
    )
    q = run_to_memory(
        countmin_cells_stream(samples_stream(stream)),
        "cm_cells",
        output_mode="complete",
    )
    _await(q)
    got = {
        (r["j"], r["cell"]): r["c"]
        for r in spark.sql("SELECT * FROM cm_cells").collect()
    }
    s = samples(spark, SF_SMOKE)
    uid = F.col("label_user").cast("long")
    want = {}
    for j, a, b in CM_PARAMS:
        cell = (F.lit(a) * uid + F.lit(b)) % F.lit(CM_P) % F.lit(CM_W)
        for r in (
            s.select(cell.alias("cell"))
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ):
            want[(j, r["cell"])] = r["c"]
    assert got == want


def test_alert_state_machine_for_hold_boundary(spark, tmp_path):
    """The pending→firing boundary across real micro-batches: with
    for: = 3 evaluation intervals (for_n=3), firing needs for_n + 1
    consecutive TRUE evaluations — Prometheus fires when
    now - ActiveAt >= for, and the activation tick is at hold 0.
    A series true for exactly 3 ticks must stay PENDING (the r6
    implementation wrongly fired it); 4 ticks fire; a false tick
    resets to inactive."""
    import pyspark.sql.types as T

    from shards_prometheus_spark.streaming.stateful import (
        alert_state_stream,
    )

    h = 3_600_000_000 * 24  # one evaluation interval (24h) in µs
    # batch 1 ticks, then batch 2 ticks (2 parquet files → 2
    # micro-batches, state carried across them)
    b1 = [
        ("A", "user=a", 1 * h, True),
        ("A", "user=a", 2 * h, True),
        ("A", "user=b", 1 * h, True),
        ("A", "user=b", 2 * h, True),
        ("A", "user=c", 1 * h, True),
        ("A", "user=c", 2 * h, True),
    ]
    b2 = [
        ("A", "user=a", 3 * h, True),
        ("A", "user=a", 4 * h, True),  # 4th consecutive true → firing
        ("A", "user=b", 3 * h, True),  # only 3 → must stay pending
        ("A", "user=c", 3 * h, False),  # reset → inactive
    ]
    schema = T.StructType(
        [
            T.StructField("alertname", T.StringType()),
            T.StructField("labels", T.StringType()),
            T.StructField("ts_us", T.LongType()),
            T.StructField("cond", T.BooleanType()),
        ]
    )
    d = tmp_path / "ticks"
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        str(d / "p1")
    )
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        str(d / "p2")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "p*"))
    )
    q = run_to_memory(
        alert_state_stream(stream, for_n=3), "alert_states"
    )
    _await(q)
    rows = {
        (r["alertname"], r["labels"], r["state"], r["consec"])
        for r in spark.table("alert_states").collect()
    }
    assert ("A", "user=a", "firing", 4) in rows
    assert ("A", "user=b", "pending", 3) in rows
    assert ("A", "user=c", "inactive", 0) in rows
    # the off-by-one pin: NO series with consec <= for_n ever fired,
    # and user=b / user=c never fired at all
    assert not {r for r in rows if r[2] == "firing" and r[3] <= 3}
    assert not {r for r in rows if r[1] != "user=a" and r[2] == "firing"}


def test_alert_keep_firing_grace_across_micro_batches(spark, tmp_path):
    """keep_firing_for across REAL micro-batch boundaries: a firing
    alert held through false evaluations inside the grace window
    (including a batch boundary), re-armed by a single true evaluation
    WITHOUT a fresh for: run, and resolved once the window elapses.
    Pending alerts get no grace."""
    import pyspark.sql.types as T

    from shards_prometheus_spark.streaming.stateful import (
        alert_keep_state_stream,
    )

    h = 3_600_000_000  # one evaluation interval in µs
    keep = int(1.5 * h)  # deliberately NOT a step multiple: pins the
    # upstream first-false anchor (a last-true anchor resolves one
    # step early on exactly this config — ADVICE r8)
    # for_n=1 → firing needs 2 consecutive trues
    batches = [
        # b1: a fires (2 trues); b pends (1 true)
        [("K", "user=a", 1 * h, True), ("K", "user=a", 2 * h, True),
         ("K", "user=b", 1 * h, True)],
        # b2: a's countdown anchors at the first false (3h); re-armed
        # by ONE true at 4h (no new for: run needed), clearing the
        # anchor; b resets — pending gets no grace
        [("K", "user=a", 3 * h, False), ("K", "user=a", 4 * h, True),
         ("K", "user=b", 2 * h, False)],
        # b3: false at 5h re-anchors the countdown THERE (5h-5h=0)
        [("K", "user=a", 5 * h, False)],
        # b4: 6h-5h=1h < keep → STILL held; without the 4h re-arm the
        # 3h anchor would have resolved at 4.5h, so both these firing
        # states exist ONLY because of the re-arm
        [("K", "user=a", 6 * h, False)],
        # b5: 7h-5h=2h ≥ keep → grace elapsed, inactive
        [("K", "user=a", 7 * h, False)],
    ]
    schema = T.StructType(
        [
            T.StructField("alertname", T.StringType()),
            T.StructField("labels", T.StringType()),
            T.StructField("ts_us", T.LongType()),
            T.StructField("cond", T.BooleanType()),
        ]
    )
    d = tmp_path / "kticks"
    for i, b in enumerate(batches):
        spark.createDataFrame(b, schema).coalesce(1).write.parquet(
            str(d / f"p{i}")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "p*"))
    )
    q = run_to_memory(
        alert_keep_state_stream(stream, for_n=1, keep_us=keep),
        "alert_keep_states",
    )
    _await(q)
    rows = [
        (r["labels"], r["state"], r["consec"])
        for r in spark.table("alert_keep_states").collect()
    ]
    a_states = [s for l, s, _c in rows if l == "user=a"]
    # per-batch latest state for a: firing, firing (re-armed), firing
    # (countdown re-anchored at 5h), firing (held at 6h ONLY because
    # the 4h re-arm cleared the 3h anchor — grace carried ACROSS two
    # boundaries), inactive (7h: 2h ≥ keep since the 5h anchor)
    assert sorted(a_states) == sorted(
        ["firing", "firing", "firing", "firing", "inactive"]
    )
    assert ("user=a", "firing", 0) in rows  # held-by-grace, not a run
    assert not [r for r in rows if r[0] == "user=b" and r[1] == "firing"]


def test_alert_keep_firing_stream_equals_batch(spark, tmp_path):
    """The streaming keep_firing_for machine, fed the REAL rule's
    evaluation ticks (true/false per label per grid instant from the
    batch evaluator on the sf0.001 tables, split into two micro-
    batches), must end with exactly the batch group's firing set."""
    import pyspark.sql.types as T

    from shards_prometheus_spark.functions.promql_parser import (
        PromQLEvaluator,
        Subquery,
    )
    from shards_prometheus_spark.operators.rules import (
        ALERT_KEEP_RULES,
        alert_rules_keep_firing,
    )
    from shards_prometheus_spark.streaming.stateful import (
        alert_keep_state_stream,
    )

    name, expr, for_us, keep_us, step_us = ALERT_KEEP_RULES[0]
    span_us = for_us + keep_us + 4 * step_us
    ev = PromQLEvaluator.from_dir(spark, SF_SMOKE)
    trues = {
        (r["labels"], r["ts_us"])
        for r in ev.eval_range(expr, span_us, step_us).collect()
    }
    instants = sorted(
        r["_ets"]
        for r in ev._grid(Subquery(None, span_us, step_us)).collect()
    )
    labels = sorted({l for l, _t in trues})
    ticks = [
        (name, l, t, (l, t) in trues) for l in labels for t in instants
    ]
    assert ticks and any(not c for *_x, c in ticks)  # real true/false mix
    schema = T.StructType(
        [
            T.StructField("alertname", T.StringType()),
            T.StructField("labels", T.StringType()),
            T.StructField("ts_us", T.LongType()),
            T.StructField("cond", T.BooleanType()),
        ]
    )
    cut = instants[len(instants) // 2]
    d = tmp_path / "rticks"
    spark.createDataFrame(
        [t for t in ticks if t[2] <= cut], schema
    ).coalesce(1).write.parquet(str(d / "p1"))
    spark.createDataFrame(
        [t for t in ticks if t[2] > cut], schema
    ).coalesce(1).write.parquet(str(d / "p2"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "p*"))
    )
    q = run_to_memory(
        alert_keep_state_stream(
            stream, for_n=for_us // step_us, keep_us=keep_us
        ),
        "alert_keep_equal",
    )
    _await(q)
    # last batch's state per label = the stream's final word
    import collections

    last = {}
    for r in spark.table("alert_keep_equal").collect():
        last[r["labels"]] = r["state"]  # memory sink appends in order
    stream_firing = {l for l, s in last.items() if s == "firing"}
    batch_firing = {
        r["labels"] for r in alert_rules_keep_firing(spark, SF_SMOKE).collect()
    }
    assert stream_firing == batch_firing
    assert batch_firing  # non-vacuous at sf0.001


def test_live_api_query_over_streaming_registry(spark):
    """The read API over a LIVE registry: events stream into a
    memory-sink samples_multi relation; /api/v1/query evaluates
    PromQL against THAT table per request (collect-on-query, the
    read twin of the collect-on-scrape exposition test above). The
    streamed corpus equals the batch corpus, so the JSON must equal
    the batch evaluator's relation."""
    import json
    import urllib.request
    from urllib.parse import quote

    from shards_prometheus_spark.functions.promql_parser import (
        PromQLEvaluator,
    )
    from shards_prometheus_spark.model import samples_multi
    from shards_prometheus_spark.sources import MetricsExposer
    from shards_prometheus_spark.streaming import (
        run_to_memory,
        stream_events,
    )
    from shards_prometheus_spark.streaming.ingest import (
        samples_multi_stream,
    )

    q = run_to_memory(
        samples_multi_stream(stream_events(spark, SF_SMOKE)),
        "live_api_samples_t",
        output_mode="append",
    )
    _await(q)

    expr = "sum by (user) (count_over_time(click[720h]))"
    exposer = MetricsExposer(
        spark, samples_fn=lambda: spark.table("live_api_samples_t")
    ).start()
    try:
        url = (
            f"http://{exposer.host}:{exposer.port}"
            f"/api/v1/query?query={quote(expr)}"
        )
        with urllib.request.urlopen(url, timeout=120) as resp:
            payload = json.loads(resp.read().decode())
    finally:
        exposer.stop()
    assert payload["status"] == "success"
    assert payload["data"]["resultType"] == "vector"
    got = {
        (tuple(sorted(e["metric"].items())), float(e["value"][1]))
        for e in payload["data"]["result"]
    }
    want = {
        (tuple(sorted(r["labels"].items())), r["value"])
        for r in PromQLEvaluator(samples_multi(spark, SF_SMOKE))
        .eval_instant_map(expr)
        .collect()
    }
    assert got == want and len(got) > 0
