"""The r15 scrape guard family (sources/scrape_config.py,
sources/scraper.py): label_limit / label_name_length_limit /
label_value_length_limit (per-sample payload guards, same failure
mode as sample_limit), target_limit (pool marked failed without
scraping), enable_compression (gzip negotiation + inflate) and
follow_redirects — upstream scrape_config knobs a real fleet sets.
"""

from __future__ import annotations

import gzip
import http.server
import threading

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


class _Srv:
    """One configurable test exporter; records each request's
    Accept-Encoding and counts hits."""

    def __init__(self, payload: str, mode: str = "plain"):
        outer = self
        self.hits = 0
        self.accept_encodings: "list[str]" = []

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                outer.hits += 1
                ae = self.headers.get("Accept-Encoding") or ""
                outer.accept_encodings.append(ae)
                if self.path == "/redirect":
                    self.send_response(302)
                    self.send_header("Location", "/metrics")
                    self.end_headers()
                    return
                body = payload.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                if mode == "gzip" and "gzip" in ae:
                    body = gzip.compress(body)
                    self.send_header("Content-Encoding", "gzip")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        self._srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.port = self._srv.server_port
        self.url = f"http://127.0.0.1:{self.port}/metrics"
        threading.Thread(
            target=self._srv.serve_forever, daemon=True
        ).start()

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()


def _synth(rows):
    from shards_prometheus_spark.sources.scraper import SYNTHETIC_METRICS

    return {
        r["metric"]: r["value"]
        for r in rows
        if r["metric"] in SYNTHETIC_METRICS
    }


def _scrape(spark, url, limits=None):
    from shards_prometheus_spark.sources.scraper import (
        scrape_once,
        scraped_samples,
    )

    return scraped_samples(
        scrape_once(spark, url, limits=limits).withColumn(
            "scrape_idx", F.lit(0).cast("long")
        )
    ).collect()


def test_label_limits_fail_the_scrape(spark):
    """A payload with a 3-label sample fails under label_limit 2 (up
    0, nothing ingested) and passes under 3; the name/value length
    guards trip on the long label name / long value / long metric
    name respectively."""
    srv = _Srv(
        'g{alpha="1",beta="22",gamma_long="333333"} 1\n'
        "short_name 2\n"
    )
    try:
        over = _scrape(spark, srv.url, {"label_limit": 2})
        assert _synth(over)["up"] == 0.0
        assert [r for r in over if r["metric"] == "g"] == []

        under = _scrape(spark, srv.url, {"label_limit": 3})
        assert _synth(under)["up"] == 1.0
        assert len([r for r in under if r["metric"] == "g"]) == 1

        # label NAME length: gamma_long is 10 chars
        assert _synth(
            _scrape(spark, srv.url, {"label_name_length_limit": 9})
        )["up"] == 0.0
        assert _synth(
            _scrape(spark, srv.url, {"label_name_length_limit": 10})
        )["up"] == 1.0

        # label VALUE length: longest exposed value is 6 chars, but
        # the metric name counts as __name__'s value (10 chars) —
        # upstream's length check covers the full label set
        assert _synth(
            _scrape(spark, srv.url, {"label_value_length_limit": 5})
        )["up"] == 0.0
        assert _synth(
            _scrape(spark, srv.url, {"label_value_length_limit": 11})
        )["up"] == 1.0
    finally:
        srv.stop()


def test_target_limit_marks_pool_failed_without_scraping(spark):
    """3 resolved targets over a target_limit of 2: EVERY member
    reports up 0 and no GET is ever issued (upstream marks the pool
    failed without scraping); at limit 3 the pool scrapes normally."""
    servers = [_Srv("g 1\n") for _ in range(3)]
    urls = ",".join(s.url for s in servers)
    try:
        rows = _scrape(spark, urls, {"target_limit": 2})
        ups = [r for r in rows if r["metric"] == "up"]
        assert len(ups) == 3 and all(r["value"] == 0.0 for r in ups)
        assert [r for r in rows if r["metric"] == "g"] == []
        assert sum(s.hits for s in servers) == 0

        rows = _scrape(spark, urls, {"target_limit": 3})
        ups = [r for r in rows if r["metric"] == "up"]
        assert len(ups) == 3 and all(r["value"] == 1.0 for r in ups)
        assert sum(s.hits for s in servers) == 3
    finally:
        for s in servers:
            s.stop()


def test_gzip_compression_negotiated_and_inflated(spark):
    """The default scrape advertises Accept-Encoding: gzip and
    inflates a gzip answer; enable_compression false advertises
    identity and the exporter serves plain."""
    srv = _Srv('g{user="a"} 7\n', mode="gzip")
    try:
        rows = _scrape(spark, srv.url)
        assert _synth(rows)["up"] == 1.0
        (g,) = [r for r in rows if r["metric"] == "g"]
        assert g["value"] == 7.0
        assert "gzip" in srv.accept_encodings[-1]

        rows = _scrape(spark, srv.url, {"compression": False})
        assert _synth(rows)["up"] == 1.0
        (g,) = [r for r in rows if r["metric"] == "g"]
        assert g["value"] == 7.0
        assert "gzip" not in srv.accept_encodings[-1]
    finally:
        srv.stop()


def test_follow_redirects_knob(spark):
    """A 3xx answer is chased by default (payload lands) and fails
    the scrape when follow_redirects is false."""
    srv = _Srv("g 5\n")
    redirect_url = f"http://127.0.0.1:{srv.port}/redirect"
    try:
        rows = _scrape(spark, redirect_url)
        assert _synth(rows)["up"] == 1.0
        assert [r["value"] for r in rows if r["metric"] == "g"] == [5.0]

        rows = _scrape(
            spark, redirect_url, {"follow_redirects": False}
        )
        assert _synth(rows)["up"] == 0.0
        assert [r for r in rows if r["metric"] == "g"] == []
    finally:
        srv.stop()


def test_guard_knobs_parse_from_yaml():
    """The YAML knobs land on ScrapeJob and compile to the scraper's
    limits map; defaults compile to None (no option emitted)."""
    from shards_prometheus_spark.sources.scrape_config import (
        load_scrape_configs,
    )

    yml = """
global:
  scrape_interval: 15s
scrape_configs:
  - job_name: guarded
    label_limit: 30
    label_name_length_limit: 128
    label_value_length_limit: 512
    target_limit: 100
    enable_compression: false
    follow_redirects: false
    static_configs:
      - targets: ["127.0.0.1:9100"]
  - job_name: defaults
    static_configs:
      - targets: ["127.0.0.1:9100"]
"""
    jobs = {j.job_name: j for j in load_scrape_configs(yml).jobs}
    g = jobs["guarded"]
    assert (
        g.label_limit,
        g.label_name_length_limit,
        g.label_value_length_limit,
        g.target_limit,
        g.enable_compression,
        g.follow_redirects,
    ) == (30, 128, 512, 100, False, False)
    assert g.guard_limits() == {
        "label_limit": 30,
        "label_name_length_limit": 128,
        "label_value_length_limit": 512,
        "target_limit": 100,
        "compression": False,
        "follow_redirects": False,
    }
    assert jobs["defaults"].guard_limits() is None


def test_smoke_default_scrape_unaffected(spark):
    """The default (no limits) batch scrape against the repo's own
    exposer still round-trips — the guard plumbing is inert when
    every knob is at its default."""
    from shards_prometheus_spark.sources import MetricsExposer

    exposer = MetricsExposer(spark, SF_SMOKE).start()
    try:
        url = f"http://{exposer.host}:{exposer.port}/metrics"
        rows = _scrape(spark, url)
        assert _synth(rows)["up"] == 1.0
        assert len(rows) > 10
    finally:
        exposer.stop()


def test_proxy_url_routes_the_scrape(spark):
    """`proxy_url`: the GET goes to the proxy with the absolute
    target URI (the HTTP proxy protocol); the target itself is never
    contacted directly."""
    import http.server
    import threading

    target = _Srv("g 9\n")  # never hit directly
    seen: "list[str]" = []

    class ProxyH(http.server.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            seen.append(self.path)
            body = b"g 9\n"
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    proxy = http.server.ThreadingHTTPServer(("127.0.0.1", 0), ProxyH)
    threading.Thread(target=proxy.serve_forever, daemon=True).start()
    try:
        rows = _scrape(
            spark,
            target.url,
            {"proxy_url": f"http://127.0.0.1:{proxy.server_port}"},
        )
        assert _synth(rows)["up"] == 1.0
        assert [r["value"] for r in rows if r["metric"] == "g"] == [9.0]
        assert seen and seen[-1] == target.url  # absolute-URI proxy GET
        assert target.hits == 0
    finally:
        proxy.shutdown()
        proxy.server_close()
        target.stop()


def test_proxy_url_parses_from_yaml():
    from shards_prometheus_spark.sources.scrape_config import (
        load_scrape_configs,
    )

    cfg = load_scrape_configs(
        """
scrape_configs:
  - job_name: proxied
    proxy_url: http://127.0.0.1:3128
    static_configs:
      - targets: ['127.0.0.1:9100']
"""
    )
    (j,) = cfg.jobs
    assert j.proxy_url == "http://127.0.0.1:3128"
    assert j.guard_limits() == {"proxy_url": "http://127.0.0.1:3128"}


def test_fallback_scrape_protocol_picks_blank_type_dialect(spark):
    """3.x `fallback_scrape_protocol`: a target omitting Content-Type
    parses exposed timestamps under the ASSUMED dialect — classic ms
    by default, epoch seconds with an OpenMetrics fallback; a target
    that DOES serve a Content-Type is unaffected."""
    from shards_prometheus_spark.sources.scraper import scraped_samples

    ts_s = 1_700_000_000
    rows = [
        ("t1", 0, 99_000_000, f"g 5 {ts_s}", ""),  # blank content type
        ("t2", 0, 99_000_000, f"g 6 {ts_s}",
         "application/openmetrics-text; version=1.0.0"),
    ]
    lines = spark.createDataFrame(
        rows,
        "target string, scrape_idx long, scrape_ts_us long, "
        "line string, content_type string",
    )

    default = {
        r["target"]: r["ts_us"]
        for r in scraped_samples(lines).collect()
    }
    assert default["t1"] == ts_s * 1_000  # classic: ms grid
    assert default["t2"] == ts_s * 1_000_000  # typed OM unaffected

    om = {
        r["target"]: r["ts_us"]
        for r in scraped_samples(
            lines, fallback_protocol="OpenMetricsText1.0.0"
        ).collect()
    }
    assert om["t1"] == ts_s * 1_000_000  # fallback picks seconds
    assert om["t2"] == ts_s * 1_000_000


def test_fallback_scrape_protocol_parses_from_yaml():
    from shards_prometheus_spark.sources.scrape_config import (
        load_scrape_configs,
    )

    cfg = load_scrape_configs(
        """
scrape_configs:
  - job_name: om_fallback
    fallback_scrape_protocol: OpenMetricsText1.0.0
    static_configs:
      - targets: ['127.0.0.1:9100']
"""
    )
    assert cfg.jobs[0].fallback_scrape_protocol == "OpenMetricsText1.0.0"
