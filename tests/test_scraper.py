"""The live scrape-loop ingestion source (sources/scraper.py).

The reference pairing: its exposer serves `/metrics` and an external
server GETs it on a cadence (prometheus.cpp:47,73,80; test.edn:8).
Here engine A exposes and engine A's scraper scrapes it back — the
closed loop — and the scraped registry must equal the direct-ingest
twin. Streaming smoke contract (B#17): no batch oracle row, real
micro-batches asserted instead.
"""

from __future__ import annotations

import time

from tests.conftest import SF_SMOKE


def _start_exposer(spark):
    from shards_prometheus_spark.sources import MetricsExposer

    return MetricsExposer(spark, SF_SMOKE).start()


def test_scrape_once_batch_matches_exposition(spark):
    """One batch scrape round (`spark.read.format("prometheus_scrape")`)
    returns exactly the exposer's payload lines, stamped at scrape
    time, tagged with the target URL."""
    from shards_prometheus_spark.sources.scraper import scrape_once

    exposer = _start_exposer(spark)
    try:
        url = f"http://{exposer.host}:{exposer.port}/metrics"
        t0 = time.time_ns() // 1_000
        rows = scrape_once(spark, url).collect()
        t1 = time.time_ns() // 1_000
        want = sorted(
            ln for ln in exposer.collect_text().splitlines() if ln
        )
        assert sorted(r["line"] for r in rows) == want
        stamps = {r["scrape_ts_us"] for r in rows}
        assert len(stamps) == 1  # one GET, one stamp
        (ts,) = stamps
        assert t0 <= ts <= t1  # honest scrape-time stamping
        assert {r["target"] for r in rows} == {url}
    finally:
        exposer.stop()


def test_scrape_loop_registry_matches_direct_twin(spark):
    """Scrape the exposer N times through the STREAMING source (one
    micro-batch per tick), accumulate the scrape log in a sink, and
    check the scraped registry equals the direct-ingest twin:

    - counter state == `counter_sum` (metric, label_user, total)
    - gauge state == `gauge_last` (metric, label_user, value)
    - full last-scrape relation == `exposition_parse` (the no-HTTP
      parse of the same payload), histograms included
    - N real micro-batches (N distinct scrape_idx), each with its own
      honest scrape timestamp, increasing with tick order
    """
    from pyspark.sql import functions as F

    from shards_prometheus_spark.operators.counters import counter_sum
    from shards_prometheus_spark.operators.gauges import gauge_last
    from shards_prometheus_spark.sources.exposition import (
        exposition_parse,
    )
    from shards_prometheus_spark.sources.scraper import (
        registry_from_scrapes,
        scrape_stream,
        scraped_samples,
    )

    n_scrapes = 3
    exposer = _start_exposer(spark)
    query = None
    try:
        url = f"http://{exposer.host}:{exposer.port}/metrics"
        lines = scrape_stream(spark, url, max_ticks=n_scrapes)
        query = (
            lines.writeStream.outputMode("append")
            .format("memory")
            .queryName("scrape_log_t")
            .trigger(processingTime="1 second")
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            done = (
                spark.table("scrape_log_t")
                .select("scrape_idx")
                .distinct()
                .count()
            )
            if done >= n_scrapes:
                break
            time.sleep(0.5)
        else:
            raise AssertionError("scrape loop never reached N ticks")
        query.stop()
        query = None

        log = spark.table("scrape_log_t")
        scraped = scraped_samples(log)
        reg = registry_from_scrapes(scraped).cache()

        # N real micro-batches, one honest stamp per tick, increasing
        ticks = sorted(
            (r["scrape_idx"], r["scrape_ts_us"])
            for r in log.select("scrape_idx", "scrape_ts_us")
            .distinct()
            .collect()
        )
        assert len(ticks) == n_scrapes
        assert [i for i, _ in ticks] == list(
            range(1, n_scrapes + 1)
        )
        assert all(
            ticks[i][1] < ticks[i + 1][1] for i in range(len(ticks) - 1)
        )

        # full last-scrape state == the direct no-HTTP parse twin
        got = sorted(
            map(
                tuple,
                reg.select(
                    "metric", "kind", "stat", "label_user", "le", "value"
                ).collect(),
            )
        )
        want = sorted(
            map(tuple, exposition_parse(spark, SF_SMOKE).collect())
        )
        assert got == want

        # counter state == counter_sum (the reference Increment twin)
        got_c = {
            (r["metric"], r["label_user"]): r["value"]
            for r in reg.filter(
                (F.col("kind") == "counter") & (F.col("stat") == "total")
            ).collect()
        }
        want_c = {
            (r["metric"], r["label_user"]): r["sum_value"]
            for r in counter_sum(spark, SF_SMOKE).collect()
        }
        assert got_c == want_c

        # gauge state == gauge_last (the reference Gauge twin)
        got_g = {
            (r["metric"], r["label_user"]): r["value"]
            for r in reg.filter(F.col("kind") == "gauge").collect()
        }
        want_g = {
            (r["metric"], r["label_user"]): r["last_value"]
            for r in gauge_last(spark, SF_SMOKE).collect()
        }
        assert got_g == want_g
        reg.unpersist()
    finally:
        if query is not None:
            query.stop()
        exposer.stop()


def test_scrape_fleet_one_partition_per_target(spark):
    """A multi-target scrape fans out one input partition per target
    (the 10k-fleet shape: GETs run as parallel tasks, not a driver
    loop): both exposers' payloads land in one round, each tagged and
    stamped independently."""
    from shards_prometheus_spark.sources import MetricsExposer
    from shards_prometheus_spark.sources.scraper import scrape_once

    a = MetricsExposer(spark, SF_SMOKE).start()
    b = MetricsExposer(spark, SF_SMOKE).start()
    try:
        urls = [
            f"http://{a.host}:{a.port}/metrics",
            f"http://{b.host}:{b.port}/metrics",
        ]
        df = scrape_once(spark, urls)
        assert df.rdd.getNumPartitions() == 2
        rows = df.collect()
        by_target = {}
        for r in rows:
            by_target.setdefault(r["target"], []).append(r["line"])
        assert set(by_target) == set(urls)
        want = sorted(ln for ln in a.collect_text().splitlines() if ln)
        for t in urls:
            assert sorted(by_target[t]) == want
    finally:
        a.stop()
        b.stop()


def test_scraped_samples_honor_timestamps(spark):
    """The classic grammar's optional trailing timestamp: honored by
    default (upstream honor_timestamps=true), scrape-time-stamped when
    disabled; OpenMetrics epoch-seconds via timestamp_unit='s';
    exemplar suffixes stripped before the value parse."""
    from pyspark.sql import functions as F

    from shards_prometheus_spark.sources.scraper import scraped_samples

    scrape_us = 9_999_000_000
    rows = [
        ("t", 0, scrape_us, 'up{user="a"} 1.5 1700000000123'),
        ("t", 0, scrape_us, 'up{user="b"} 2.5'),           # no ts
        ("t", 0, scrape_us, "up_sum 7 1700000000456"),     # label-less
        ("t", 0, scrape_us, 'up{user="a b"} 3 1700000000789'),
        (
            "t", 0, scrape_us,
            'req_total{user="c"} 4 1700000000111 # {trace_id="x"} 4 17',
        ),
    ]
    lines = spark.createDataFrame(
        rows,
        "target string, scrape_idx long, scrape_ts_us long, line string",
    )
    got = {
        (r["metric"], r["stat"], r["label_user"]): (
            r["value"], r["ts_us"]
        )
        for r in scraped_samples(lines, drop_created=False).collect()
    }
    assert got[("up", "value", "a")] == (1.5, 1_700_000_000_123_000)
    assert got[("up", "value", "b")] == (2.5, scrape_us)
    assert got[("up", "sum", None)] == (7.0, 1_700_000_000_456_000)
    assert got[("up", "value", "a b")] == (3.0, 1_700_000_000_789_000)
    # the exemplar never contaminates value or timestamp
    assert got[("req", "total", "c")] == (4.0, 1_700_000_000_111_000)

    # honor_timestamps=False: everything stamps at scrape time
    off = scraped_samples(
        lines, drop_created=False, honor_timestamps=False
    )
    assert {r["ts_us"] for r in off.collect()} == {scrape_us}

    # OpenMetrics serves SECONDS (possibly fractional)
    om = spark.createDataFrame(
        [("t", 0, scrape_us, 'up{user="a"} 1 1700000000.25')],
        "target string, scrape_idx long, scrape_ts_us long, line string",
    )
    (r,) = scraped_samples(
        om, drop_created=False, timestamp_unit="s"
    ).collect()
    assert (r["value"], r["ts_us"]) == (1.0, 1_700_000_000_250_000)
