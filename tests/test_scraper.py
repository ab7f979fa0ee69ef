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


def _split_synthetic(rows):
    """Partition scrape rows into (payload, synthetic-report) lines."""
    from shards_prometheus_spark.sources.scraper import SYNTHETIC_METRICS

    payload, synth = [], []
    for r in rows:
        name = r["line"].split("{")[0].split(" ")[0]
        (synth if name in SYNTHETIC_METRICS else payload).append(r)
    return payload, synth


def test_scrape_once_batch_matches_exposition(spark):
    """One batch scrape round (`spark.read.format("prometheus_scrape")`)
    returns exactly the exposer's payload lines plus the synthetic
    report family (up 1, duration, sample count — upstream emits
    these on EVERY scrape), stamped at scrape time, tagged with the
    target URL."""
    from shards_prometheus_spark.sources.scraper import scrape_once

    exposer = _start_exposer(spark)
    try:
        url = f"http://{exposer.host}:{exposer.port}/metrics"
        t0 = time.time_ns() // 1_000
        all_rows = scrape_once(spark, url).collect()
        t1 = time.time_ns() // 1_000
        rows, synth = _split_synthetic(all_rows)
        want = sorted(
            ln for ln in exposer.collect_text().splitlines() if ln
        )
        assert sorted(r["line"] for r in rows) == want
        syn_lines = sorted(r["line"] for r in synth)
        n_samples = sum(1 for ln in want if not ln.startswith("#"))
        assert f"scrape_samples_scraped {n_samples}" in syn_lines
        assert "up 1" in syn_lines
        assert any(
            ln.startswith("scrape_duration_seconds ")
            for ln in syn_lines
        )
        rows = all_rows  # provenance asserts cover synthetics too
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

        from shards_prometheus_spark.sources.scraper import (
            SYNTHETIC_METRICS,
        )

        log = spark.table("scrape_log_t")
        scraped = scraped_samples(log)
        full_reg = registry_from_scrapes(scraped).cache()
        # the synthetic report family is NEW state the direct-ingest
        # twin cannot have (it never scraped): assert it separately,
        # compare the twins over the payload families
        synth = {
            (r["metric"], r["value"])
            for r in full_reg.filter(
                F.col("metric").isin(*SYNTHETIC_METRICS)
            ).collect()
            if r["metric"] != "scrape_duration_seconds"
        }
        n_payload_samples = (
            scraped.filter(
                ~F.col("metric").isin(*SYNTHETIC_METRICS)
                & (F.col("scrape_idx") == n_scrapes)
            ).count()
        )
        assert ("up", 1.0) in synth
        assert (
            "scrape_samples_scraped",
            float(n_payload_samples),
        ) in synth
        reg = full_reg.filter(
            ~F.col("metric").isin(*SYNTHETIC_METRICS)
        ).cache()

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
        full_reg.unpersist()
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
        rows, synth = _split_synthetic(df.collect())
        by_target = {}
        for r in rows:
            by_target.setdefault(r["target"], []).append(r["line"])
        assert set(by_target) == set(urls)
        want = sorted(ln for ln in a.collect_text().splitlines() if ln)
        for t in urls:
            assert sorted(by_target[t]) == want
        # each target carries its OWN synthetic report rows
        assert sorted(
            r["line"] for r in synth if r["line"] == "up 1"
        ) == ["up 1", "up 1"]
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


def test_dead_target_does_not_fail_the_batch(spark):
    """The r12 VERDICT's weak component, hardened: one target dies
    mid-loop in a 3-target fleet. The streaming query KEEPS RUNNING,
    the live targets' data lands every tick, `up{instance}` flips to
    0 for the dead target (with its duration/sample-count
    synthetics), and the dead target's real series leave the
    registry at the next tick via the staleness diff — target death
    is data, never a task failure."""
    import http.server
    import threading

    from pyspark.sql import functions as F

    from shards_prometheus_spark.sources.scraper import (
        SYNTHETIC_METRICS,
        registry_from_scrapes,
        scrape_stream,
        scraped_samples,
        scraped_with_staleness,
    )

    payload = 'g{user="a"} 1\ng{user="b"} 2\n'

    class _Srv:
        def __init__(self):
            outer = self

            class H(http.server.BaseHTTPRequestHandler):
                def do_GET(self):  # noqa: N802
                    body = payload.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/plain")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)

                def log_message(self, *a):
                    pass

            self._srv = http.server.ThreadingHTTPServer(
                ("127.0.0.1", 0), H
            )
            self.url = (
                f"http://127.0.0.1:{self._srv.server_port}/metrics"
            )
            threading.Thread(
                target=self._srv.serve_forever, daemon=True
            ).start()

        def stop(self):
            self._srv.shutdown()
            self._srv.server_close()

    n_ticks = 3
    servers = [_Srv() for _ in range(3)]
    victim = servers[2]
    urls = [s.url for s in servers]
    query = None
    try:
        lines = scrape_stream(spark, urls, max_ticks=n_ticks)
        query = (
            lines.writeStream.outputMode("append")
            .format("memory")
            .queryName("dead_target_t")
            .trigger(processingTime="1 second")
            .start()
        )

        def ticks_done() -> int:
            return (
                spark.table("dead_target_t")
                .select("scrape_idx")
                .distinct()
                .count()
            )

        deadline = time.time() + 120
        while time.time() < deadline and ticks_done() < 1:
            time.sleep(0.2)
        assert ticks_done() >= 1, "first tick never landed"
        victim.stop()  # the target dies mid-loop
        while time.time() < deadline and ticks_done() < n_ticks:
            time.sleep(0.2)
        assert ticks_done() >= n_ticks, (
            "the loop stalled after a target died — a dead endpoint "
            "must never fail the micro-batch"
        )
        query.stop()
        query = None

        log = spark.table("dead_target_t")
        last_tick = log.agg(F.max("scrape_idx")).collect()[0][0]
        scraped = scraped_samples(log).cache()

        # live targets delivered their payload on the LAST tick too
        live = scraped.filter(
            (F.col("scrape_idx") == last_tick)
            & ~F.col("metric").isin(*SYNTHETIC_METRICS)
        )
        assert {r["target"] for r in live.collect()} == set(urls[:2])

        # the dead target reported up=0 (+ the other synthetics) on
        # the last tick; live targets up=1
        up = {
            r["target"]: r["value"]
            for r in scraped.filter(
                (F.col("metric") == "up")
                & (F.col("scrape_idx") == last_tick)
            ).collect()
        }
        assert up == {urls[0]: 1.0, urls[1]: 1.0, victim.url: 0.0}
        dead_synth = {
            r["metric"]: r["value"]
            for r in scraped.filter(
                (F.col("target") == victim.url)
                & (F.col("scrape_idx") == last_tick)
            ).collect()
        }
        assert dead_synth["scrape_samples_scraped"] == 0.0
        assert "scrape_duration_seconds" in dead_synth

        # staleness: the dead target's REAL series left the registry
        # (its synthetics keep reporting, exactly like upstream)
        reg = registry_from_scrapes(scraped_with_staleness(scraped))
        reg_g = reg.filter(F.col("metric") == "g").collect()
        assert {r["target"] for r in reg_g} == set(urls[:2])
        assert len(reg_g) == 4  # 2 live targets × 2 series
        scraped.unpersist()
    finally:
        if query is not None:
            query.stop()
        for s in servers:
            try:
                s.stop()
            except Exception:
                pass


def test_up_alert_over_scrape_log(spark):
    """`up == 0` — upstream's most common alert — evaluates straight
    off the scrape log through the PromQL evaluator via
    `scraped_as_samples`: the dead target's instance is the one
    returned, and after the target dies its REAL series leave `g`'s
    instant vector (staleness honored by the evaluator)."""
    from pyspark.sql import functions as F

    from shards_prometheus_spark.functions.promql_parser import (
        PromQLEvaluator,
    )
    from shards_prometheus_spark.sources.query_api import parse_label_str
    from shards_prometheus_spark.sources.scraper import (
        scraped_as_samples,
        scraped_samples,
        scraped_with_staleness,
    )

    def tick(target, idx, ts, lines):
        return [(target, idx, ts, ln, "") for ln in lines]

    live, dead = "http://live:9100/metrics", "http://dead:9100/metrics"
    rows = (
        # tick 0: both targets healthy
        tick(live, 0, 10_000_000, ['g{user="a"} 1', "up 1"])
        + tick(dead, 0, 10_000_000, ['g{user="b"} 2', "up 1"])
        # tick 1: the second target died — only synthetics, up 0
        + tick(live, 1, 20_000_000, ['g{user="a"} 3', "up 1"])
        + tick(dead, 1, 20_000_000, ["up 0"])
    )
    log = spark.createDataFrame(
        rows,
        "target string, scrape_idx long, scrape_ts_us long, "
        "line string, content_type string",
    )
    samples = scraped_as_samples(
        scraped_with_staleness(scraped_samples(log))
    )
    ev = PromQLEvaluator(samples)

    down = ev.eval("up == 0").collect()
    assert [parse_label_str(r["labels"])["instance"] for r in down] == [dead]
    assert [r["value"] for r in down] == [0.0]

    up_ok = {
        parse_label_str(r["labels"])["instance"] for r in ev.eval("up == 1").collect()
    }
    assert up_ok == {live}

    # the dead target's real series left the instant vector at its
    # death tick, the live target's survives with its latest value
    g = {
        parse_label_str(r["labels"]).get("user"): r["value"]
        for r in ev.eval("g").collect()
    }
    assert g == {"a": 3.0}


def test_timestamp_unit_from_content_type(spark):
    """ADVICE r12: the timestamp unit follows the TARGET's served
    dialect per row — an OpenMetrics target's epoch-second exposed
    timestamps scale 1e6, a classic target's milliseconds 1e3, in
    ONE mixed-fleet scrape log with no per-job override."""
    from shards_prometheus_spark.sources.scraper import scraped_samples

    om = "application/openmetrics-text; version=1.0.0; charset=utf-8"
    classic = "text/plain; version=0.0.4; charset=utf-8"
    rows = [
        ("om", 0, 9_000_000, 'g{user="a"} 1 1700000000.25', om),
        ("cl", 0, 9_000_000, 'g{user="b"} 2 1700000000250', classic),
        ("cl", 0, 9_000_000, 'g{user="c"} 3', classic),  # no exposed ts
    ]
    log = spark.createDataFrame(
        rows,
        "target string, scrape_idx long, scrape_ts_us long, "
        "line string, content_type string",
    )
    got = {
        r["label_user"]: r["ts_us"]
        for r in scraped_samples(log).filter("metric = 'g'").collect()
    }
    assert got == {
        "a": 1_700_000_000_250_000,  # OM seconds × 1e6
        "b": 1_700_000_000_250_000,  # classic ms × 1e3
        "c": 9_000_000,              # no exposed ts → scrape stamp
    }

    # honor_timestamps=False overrides both dialects
    off = scraped_samples(log, honor_timestamps=False).filter(
        "metric = 'g'"
    )
    assert {r["ts_us"] for r in off.collect()} == {9_000_000}


def test_sample_limit_fails_the_scrape(spark):
    """Upstream's sample_limit guard: an over-limit payload FAILS its
    scrape — up 0, NOTHING ingested (never a partial payload), while
    scrape_samples_scraped still reports the observed count; a target
    under the limit ingests normally."""
    from pyspark.sql import functions as F

    from shards_prometheus_spark.sources import MetricsExposer
    from shards_prometheus_spark.sources.scraper import (
        SYNTHETIC_METRICS,
        scrape_once,
        scraped_samples,
    )

    payload = [f'g{{user="u{i}"}} {i}' for i in range(5)]

    def lines_fn():
        return spark.createDataFrame(
            [(ln,) for ln in payload], "line string"
        )

    exposer = MetricsExposer(spark, SF_SMOKE, lines_fn=lines_fn).start()
    try:
        url = f"http://{exposer.host}:{exposer.port}/metrics"
        over = scraped_samples(
            scrape_once(spark, url, sample_limit=3).withColumn(
                "scrape_idx", F.lit(0).cast("long")
            )
        ).collect()
        synth = {
            r["metric"]: r["value"]
            for r in over
            if r["metric"] in SYNTHETIC_METRICS
        }
        assert synth["up"] == 0.0
        assert synth["scrape_samples_scraped"] == 5.0
        assert [r for r in over if r["metric"] == "g"] == []

        under = scraped_samples(
            scrape_once(spark, url, sample_limit=10).withColumn(
                "scrape_idx", F.lit(0).cast("long")
            )
        ).collect()
        synth = {
            r["metric"]: r["value"]
            for r in under
            if r["metric"] in SYNTHETIC_METRICS
        }
        assert synth["up"] == 1.0
        assert len([r for r in under if r["metric"] == "g"]) == 5
    finally:
        exposer.stop()


def test_body_size_limit_fails_the_scrape(spark):
    """Upstream's body_size_limit: an oversized payload fails its
    scrape (up 0, nothing ingested) and the body is never buffered
    past limit+1 bytes; a within-limit target scrapes normally. The
    YAML accepts upstream's size units."""
    from pyspark.sql import functions as F

    from shards_prometheus_spark.sources import MetricsExposer
    from shards_prometheus_spark.sources.scrape_config import (
        load_scrape_configs,
    )
    from shards_prometheus_spark.sources.scraper import (
        scrape_once,
        scraped_samples,
    )

    cfg = load_scrape_configs(
        """
scrape_configs:
  - job_name: a
    body_size_limit: 1KB
    static_configs:
      - targets: ['x:1']
"""
    )
    assert cfg.jobs[0].body_limit == 1024

    payload = [f'g{{user="u{i}"}} {i}' for i in range(5)]

    def lines_fn():
        return spark.createDataFrame(
            [(ln,) for ln in payload], "line string"
        )

    exposer = MetricsExposer(spark, SF_SMOKE, lines_fn=lines_fn).start()
    try:
        url = f"http://{exposer.host}:{exposer.port}/metrics"
        over = scraped_samples(
            scrape_once(spark, url, body_limit=16).withColumn(
                "scrape_idx", F.lit(0).cast("long")
            )
        ).collect()
        up = {r["metric"]: r["value"] for r in over}
        assert up["up"] == 0.0
        assert [r for r in over if r["metric"] == "g"] == []

        under = scraped_samples(
            scrape_once(spark, url, body_limit=1 << 20).withColumn(
                "scrape_idx", F.lit(0).cast("long")
            )
        ).collect()
        up = {r["metric"]: r["value"] for r in under if r["metric"] == "up"}
        assert up["up"] == 1.0
        assert len([r for r in under if r["metric"] == "g"]) == 5
    finally:
        exposer.stop()
