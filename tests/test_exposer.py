"""HTTP exposer parity test.

The reference's read path is an HTTP pull of the text exposition
format (prometheus.cpp:47,73,80). This test scrapes our exposer over
real HTTP and checks the payload equals the exposition relation.
"""

from __future__ import annotations

import urllib.request

from shards_prometheus_spark.sources import MetricsExposer, exposition_lines
from tests.conftest import SF_SMOKE


def test_http_scrape_serves_exposition_payload(spark):
    exposer = MetricsExposer(spark, SF_SMOKE).start()
    try:
        url = f"http://{exposer.host}:{exposer.port}/metrics"
        with urllib.request.urlopen(url, timeout=60) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith("text/plain")
            body = resp.read().decode()
    finally:
        exposer.stop()
    want = sorted(
        r["line"] for r in exposition_lines(spark, SF_SMOKE).collect()
    )
    got = body.rstrip("\n").split("\n")
    assert got == want
    # the three kinds all expose
    assert any(l.startswith("# TYPE ") and l.endswith(" counter") for l in got)
    assert any("_bucket{le=" in l for l in got)


def test_404_on_other_paths(spark):
    exposer = MetricsExposer(spark, SF_SMOKE).start()
    try:
        url = f"http://{exposer.host}:{exposer.port}/other"
        try:
            urllib.request.urlopen(url, timeout=60)
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 404
        assert raised
    finally:
        exposer.stop()


def test_exposition_round_trip_recovers_snapshot(spark):
    """serialize → parse recovers the counter snapshot exactly (values
    survive the DECIMAL(28,4) text rendering bit-for-bit)."""
    from shards_prometheus_spark.operators.snapshot import scrape_snapshot
    from shards_prometheus_spark.sources.exposition import exposition_parse
    from tests.conftest import SF_SMOKE

    parsed = {
        (r["metric"], r["label_user"]): r["value"]
        for r in exposition_parse(spark, SF_SMOKE)
        .filter("stat = 'total'")
        .collect()
    }
    snap = {
        (r["metric"], r["label_user"]): r["value"]
        for r in scrape_snapshot(spark, SF_SMOKE)
        .filter("kind = 'counter'")
        .collect()
    }
    assert parsed == snap
