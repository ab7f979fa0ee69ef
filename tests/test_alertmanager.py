"""Alertmanager notification push (sources/alertmanager.py): firing
alerts POSTed to the configured pool as the v2 JSON array, the pool
reflected on /api/v1/alertmanagers, delivery failures reported but
never raised.
"""

from __future__ import annotations

import http.server
import json
import re
import threading
import urllib.request

from tests.conftest import SF_SMOKE

FIRING_RULE_FILE = """
groups:
  - name: paging
    interval: 1d
    rules:
      - alert: AnyClicks
        expr: sum by (user) (increase(click[720h])) > 0
        labels:
          severity: page
        annotations:
          summary: "user {{ $labels.user }} clicked {{ $value }}"
"""


class _Sink:
    """Capturing HTTP sink: records (path, body) per POST; responds
    with `status` (default 200)."""

    def __init__(self, status: int = 200):
        self.received: list[tuple[str, bytes]] = []
        self.status = status  # mutable: tests flip mid-scenario
        outer = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802
                n = int(self.headers.get("Content-Length") or 0)
                outer.received.append((self.path, self.rfile.read(n)))
                self.send_response(outer.status)
                self.send_header("Content-Length", "0")
                self.end_headers()

            def log_message(self, *a):
                pass

        self._srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.url = f"http://127.0.0.1:{self._srv.server_port}"
        threading.Thread(
            target=self._srv.serve_forever, daemon=True
        ).start()

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()


def test_notify_firing_matches_alerts_api(spark):
    """The webhook receives label-for-label what /api/v1/alerts
    serves, as the v2 push array with an RFC3339 startsAt."""
    from shards_prometheus_spark.functions.promql_parser import (
        PromQLEvaluator,
    )
    from shards_prometheus_spark.model import samples_multi
    from shards_prometheus_spark.sources.alertmanager import (
        AlertmanagerNotifier,
        notify_firing,
    )
    from shards_prometheus_spark.sources.query_api import alerts_data

    ev = PromQLEvaluator(samples_multi(spark, SF_SMOKE))
    sink = _Sink()
    try:
        payload, statuses = notify_firing(
            ev, FIRING_RULE_FILE, AlertmanagerNotifier([sink.url])
        )
        assert statuses == {f"{sink.url}/api/v2/alerts": 200}
        assert len(sink.received) == 1
        path, body = sink.received[0]
        assert path == "/api/v2/alerts"
        delivered = json.loads(body)
        assert delivered == payload and len(delivered) > 0

        served = alerts_data(ev, FIRING_RULE_FILE)["alerts"]
        assert [a["labels"] for a in delivered] == [
            a["labels"] for a in served
        ]
        assert [a["annotations"] for a in delivered] == [
            a["annotations"] for a in served
        ]
        for a in delivered:
            assert a["labels"]["alertname"] == "AnyClicks"
            assert a["labels"]["severity"] == "page"
            assert re.fullmatch(
                r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}Z",
                a["startsAt"],
            )
    finally:
        sink.stop()


def test_exposer_pool_and_push(spark):
    """The exposer reflects its configured pool on
    /api/v1/alertmanagers and push_alerts() delivers the firing set."""
    from shards_prometheus_spark.sources import MetricsExposer

    sink = _Sink()
    exposer = MetricsExposer(
        spark,
        SF_SMOKE,
        rule_file=FIRING_RULE_FILE,
        alertmanagers=[sink.url],
    ).start()
    try:
        with urllib.request.urlopen(
            f"http://{exposer.host}:{exposer.port}/api/v1/alertmanagers",
            timeout=60,
        ) as resp:
            pool = json.loads(resp.read())["data"]
        assert pool == {
            "activeAlertmanagers": [
                {"url": f"{sink.url}/api/v2/alerts"}
            ],
            "droppedAlertmanagers": [],
        }
        payload, statuses = exposer.push_alerts()
        assert statuses == {f"{sink.url}/api/v2/alerts": 200}
        assert len(payload) > 0
        delivered = json.loads(sink.received[-1][1])
        assert delivered == payload
        assert all(
            a["generatorURL"]
            == f"http://{exposer.host}:{exposer.port}/graph"
            for a in delivered
        )
    finally:
        exposer.stop()
        sink.stop()


def test_exposer_without_pool_serves_empty(spark):
    from shards_prometheus_spark.sources import MetricsExposer

    exposer = MetricsExposer(spark, SF_SMOKE).start()
    try:
        with urllib.request.urlopen(
            f"http://{exposer.host}:{exposer.port}/api/v1/alertmanagers",
            timeout=60,
        ) as resp:
            pool = json.loads(resp.read())["data"]
        assert pool == {
            "activeAlertmanagers": [],
            "droppedAlertmanagers": [],
        }
        assert exposer.push_alerts() == ([], {})
    finally:
        exposer.stop()


def test_notifier_reports_failures_without_raising():
    from shards_prometheus_spark.sources.alertmanager import (
        AlertmanagerNotifier,
    )

    sink = _Sink(status=500)
    try:
        notifier = AlertmanagerNotifier(
            [sink.url, "http://127.0.0.1:1/unreachable"],
            timeout_s=2.0,
        )
        statuses = notifier.notify([{"labels": {"alertname": "x"}}])
        assert statuses[f"{sink.url}/api/v2/alerts"] == 500
        assert (
            statuses["http://127.0.0.1:1/unreachable/api/v2/alerts"] == -1
        )
    finally:
        sink.stop()


def test_pool_from_scrape_config(spark):
    """A prometheus.yml alerting section configures the pool — one
    config file drives scraping AND notification, per upstream."""
    from shards_prometheus_spark.sources import MetricsExposer

    cfg = """
scrape_configs:
  - job_name: self
    static_configs:
      - targets: ['127.0.0.1:9999']
alerting:
  alertmanagers:
    - static_configs:
        - targets: ['am.example:9093']
"""
    exposer = MetricsExposer(spark, SF_SMOKE, scrape_config=cfg).start()
    try:
        with urllib.request.urlopen(
            f"http://{exposer.host}:{exposer.port}/api/v1/alertmanagers",
            timeout=60,
        ) as resp:
            pool = json.loads(resp.read())["data"]
        assert pool["activeAlertmanagers"] == [
            {"url": "http://am.example:9093/api/v2/alerts"}
        ]
    finally:
        exposer.stop()


def test_resolved_alerts_carry_endsAt():
    """An alert that stops firing between pushes is re-sent ONCE as a
    resolved entry: original startsAt, endsAt = the later evaluation
    time — the notification Alertmanager closes the incident on."""
    import re as _re

    from shards_prometheus_spark.sources.alertmanager import (
        AlertmanagerNotifier,
        firing_to_v2,
    )

    sink = _Sink()
    try:
        # resend_delay_us=0: every evaluation re-delivers, so the
        # push cadence itself is out of the picture and the test pins
        # the RESOLVED semantics alone (cadence has its own tests)
        notifier = AlertmanagerNotifier([sink.url], resend_delay_us=0)
        t1, t2, t3 = 10_000_000, 20_000_000, 30_000_000
        a = {"labels": {"alertname": "A", "user": "1"}, "value": "1"}
        b = {"labels": {"alertname": "B"}, "annotations": {"s": "x"}}
        p1, _ = notifier.push_state(firing_to_v2([a, b], t1), t1)
        assert len(p1) == 2 and not any("endsAt" in e for e in p1)

        p2, _ = notifier.push_state(firing_to_v2([a], t2), t2)
        assert [e["labels"] for e in p2] == [
            {"alertname": "A", "user": "1"},
            {"alertname": "B"},
        ]
        resolved = p2[1]
        assert resolved["annotations"] == {"s": "x"}  # carried over
        assert resolved["startsAt"] == p1[1]["startsAt"]
        assert _re.fullmatch(
            r"1970-01-01T00:00:20\.000Z", resolved["endsAt"]
        )
        assert "endsAt" not in p2[0]  # still firing

        # resolution is sent once, not re-sent forever
        p3, _ = notifier.push_state(firing_to_v2([a], t3), t3)
        assert [e["labels"] for e in p3] == [
            {"alertname": "A", "user": "1"}
        ]
        assert len(sink.received) == 3
    finally:
        sink.stop()


def test_resend_delay_suppresses_unchanged_firing():
    """Upstream cadence (--rules.alert.resend-delay, default 1m): a
    steady-firing alert is delivered once, then NOT re-POSTed until
    the delay elapses; a suppressed evaluation sends nothing at all.
    startsAt stays pinned to the first-seen firing time throughout
    (upstream's ActiveAt), including on the eventual resend."""
    from shards_prometheus_spark.sources.alertmanager import (
        AlertmanagerNotifier,
        firing_to_v2,
    )

    sink = _Sink()
    try:
        notifier = AlertmanagerNotifier(
            [sink.url], resend_delay_us=60_000_000
        )
        a = {"labels": {"alertname": "A"}, "value": "1"}
        t1 = 10_000_000
        p1, s1 = notifier.push_state(firing_to_v2([a], t1), t1)
        assert len(p1) == 1 and s1 and len(sink.received) == 1
        starts_at = p1[0]["startsAt"]

        # 10s later: still firing, inside the window — nothing sent
        t2 = t1 + 10_000_000
        p2, s2 = notifier.push_state(firing_to_v2([a], t2), t2)
        assert p2 == [] and s2 == {}
        assert len(sink.received) == 1  # no POST at all

        # 70s after the first send: the delay elapsed — re-sent with
        # the ORIGINAL startsAt, not t3's stamp
        t3 = t1 + 70_000_000
        p3, _ = notifier.push_state(firing_to_v2([a], t3), t3)
        assert [e["labels"] for e in p3] == [{"alertname": "A"}]
        assert p3[0]["startsAt"] == starts_at
        assert len(sink.received) == 2
    finally:
        sink.stop()


def test_resolved_bypasses_resend_window():
    """A resolution always delivers immediately (inside the resend
    window) and carries the ORIGINAL startsAt; a re-fire after the
    resolution counts as a NEW alert — fresh startsAt, fresh send."""
    from shards_prometheus_spark.sources.alertmanager import (
        AlertmanagerNotifier,
        firing_to_v2,
    )

    sink = _Sink()
    try:
        notifier = AlertmanagerNotifier(
            [sink.url], resend_delay_us=60_000_000
        )
        a = {"labels": {"alertname": "A"}}
        t1, t2, t3 = 10_000_000, 20_000_000, 30_000_000
        p1, _ = notifier.push_state(firing_to_v2([a], t1), t1)
        starts_at = p1[0]["startsAt"]

        # resolved 10s later, well inside the window: sent anyway
        p2, s2 = notifier.push_state([], t2)
        assert len(p2) == 1 and "endsAt" in p2[0] and s2
        assert p2[0]["startsAt"] == starts_at

        # re-fires at t3: a new incident — delivered immediately
        # with t3's startsAt, not the stale pin
        p3, _ = notifier.push_state(firing_to_v2([a], t3), t3)
        assert len(p3) == 1 and "endsAt" not in p3[0]
        assert p3[0]["startsAt"] != starts_at
        assert len(sink.received) == 3
    finally:
        sink.stop()


def test_failed_push_rolls_back_resend_stamp():
    """A FULLY-failed delivery (every pool member dead/5xx) must not
    consume the resend window: upstream's notifier queue retries
    failed sends, so the next evaluation re-attempts instead of
    silently dropping the alert for resend_delay."""
    from shards_prometheus_spark.sources.alertmanager import (
        AlertmanagerNotifier,
        firing_to_v2,
    )

    sink = _Sink(status=503)
    try:
        notifier = AlertmanagerNotifier(
            [sink.url], resend_delay_us=60_000_000
        )
        a = {"labels": {"alertname": "A"}, "value": "1"}
        t1 = 10_000_000
        p1, s1 = notifier.push_state(firing_to_v2([a], t1), t1)
        assert len(p1) == 1
        assert all(s == 503 for s in s1.values())

        # 1s later, still inside the window: the failed send did NOT
        # stamp — the alert is retried immediately
        t2 = t1 + 1_000_000
        p2, _ = notifier.push_state(firing_to_v2([a], t2), t2)
        assert [e["labels"] for e in p2] == [{"alertname": "A"}]
        assert len(sink.received) == 2
    finally:
        sink.stop()

    # a DELIVERED push (2xx from at least one member) stamps normally
    ok = _Sink()
    try:
        notifier = AlertmanagerNotifier(
            [ok.url], resend_delay_us=60_000_000
        )
        t1 = 10_000_000
        notifier.push_state(firing_to_v2([a], t1), t1)
        t2 = t1 + 1_000_000
        p2, s2 = notifier.push_state(firing_to_v2([a], t2), t2)
        assert p2 == [] and s2 == {} and len(ok.received) == 1
    finally:
        ok.stop()


def test_failed_push_retries_resolved_entries():
    """A resolved notification whose delivery FULLY fails must be
    regenerated on the next evaluation (upstream retries resolved
    sends exactly like firing ones) — not dropped permanently the
    moment the diff was computed."""
    from shards_prometheus_spark.sources.alertmanager import (
        AlertmanagerNotifier,
        firing_to_v2,
    )

    sink = _Sink()
    try:
        notifier = AlertmanagerNotifier([sink.url], resend_delay_us=0)
        a = {"labels": {"alertname": "A"}, "value": "1"}
        t1, t2, t3, t4 = (
            10_000_000, 20_000_000, 30_000_000, 40_000_000,
        )
        p1, s1 = notifier.push_state(firing_to_v2([a], t1), t1)
        assert len(p1) == 1 and all(
            200 <= s < 300 for s in s1.values()
        )

        # the alert resolves while the pool is down: the resolved
        # entry is attempted but every member fails
        sink.status = 503
        p2, s2 = notifier.push_state([], t2)
        assert [e for e in p2 if "endsAt" in e] == p2 and len(p2) == 1
        assert all(s == 503 for s in s2.values())

        # pool back up: the NEXT evaluation regenerates the resolved
        # delta (fresh endsAt, original startsAt) and delivers it
        sink.status = 200
        p3, s3 = notifier.push_state([], t3)
        resolved = [e for e in p3 if "endsAt" in e]
        assert len(resolved) == 1
        assert resolved[0]["labels"] == {"alertname": "A"}
        assert resolved[0]["startsAt"] == p1[0]["startsAt"]
        assert resolved[0]["endsAt"].startswith("1970-01-01T00:00:30")
        assert all(200 <= s < 300 for s in s3.values())

        # delivered once: the resolution is not re-sent forever
        p4, s4 = notifier.push_state([], t4)
        assert p4 == [] and s4 == {}
    finally:
        sink.stop()


def test_alert_relabel_configs_rewrite_and_drop(spark):
    """The VERDICT Done-bar: top-level alert_relabel_configs run
    through the compiled relabel chain BEFORE the POST — one alert's
    labels rewritten, another dropped entirely; /api/v1/alerts (the
    served state) stays un-relabeled, exactly upstream's split."""
    from shards_prometheus_spark.sources.alertmanager import (
        AlertmanagerNotifier,
        relabel_alerts,
    )

    alerts = [
        {"labels": {"alertname": "Noisy", "severity": "info"},
         "annotations": {"a": "1"}},
        {"labels": {"alertname": "Real", "severity": "page"},
         "annotations": {"b": "2"}},
    ]
    rules = [
        {"action": "drop", "source_labels": ["alertname"],
         "regex": "Noisy"},
        {"action": "replace", "source_labels": ["severity"],
         "regex": "page", "target_label": "team",
         "replacement": "oncall"},
    ]
    out = relabel_alerts(alerts, rules, spark)
    assert [a["labels"] for a in out] == [
        {"alertname": "Real", "severity": "page", "team": "oncall"}
    ]
    assert out[0]["annotations"] == {"b": "2"}

    # end-to-end: the POSTed payload reflects the relabeled set
    sink = _Sink()
    try:
        from shards_prometheus_spark.sources.alertmanager import (
            firing_to_v2,
        )

        notifier = AlertmanagerNotifier([sink.url])
        notifier.push_state(firing_to_v2(out, 10_000_000), 10_000_000)
        delivered = json.loads(sink.received[0][1])
        assert [e["labels"] for e in delivered] == [
            {"alertname": "Real", "severity": "page", "team": "oncall"}
        ]
    finally:
        sink.stop()


def test_alertmanager_discovery_relabel_hop(spark):
    """alerting.alertmanagers[].relabel_configs route through the
    same compiled chain as scrape-target discovery: a dropped
    __address__ removes the pool member, a rewrite changes the push
    URL."""
    from shards_prometheus_spark.sources.scrape_config import (
        load_scrape_configs,
        resolve_alertmanagers,
    )

    cfg = load_scrape_configs(
        """
alerting:
  alert_relabel_configs:
    - action: drop
      source_labels: [severity]
      regex: info
  alertmanagers:
    - path_prefix: /am
      static_configs:
        - targets: ['keep:9093', 'drop:9093']
      relabel_configs:
        - action: drop
          source_labels: [__address__]
          regex: 'drop:.*'
        - action: replace
          source_labels: [__address__]
          regex: 'keep:(.*)'
          target_label: __address__
          replacement: 'kept:${1}'
scrape_configs:
  - job_name: j
    static_configs: [{targets: ['t:1']}]
"""
    )
    assert cfg.alert_relabel_configs == [
        {"action": "drop", "source_labels": ["severity"],
         "regex": "info"}
    ]
    assert resolve_alertmanagers(spark, cfg) == ["http://kept:9093/am"]
    # the static (un-relabeled) list still reflects the raw config
    assert cfg.alertmanager_urls == [
        "http://keep:9093/am", "http://drop:9093/am"
    ]


def test_notify_batches_to_max_batch_size():
    """Upstream's notifier caps each POST at maxBatchSize alerts: a
    150-alert payload arrives as sequential chunks of <= 64, in
    order, nothing dropped."""
    from shards_prometheus_spark.sources.alertmanager import (
        AlertmanagerNotifier,
    )

    sink = _Sink()
    try:
        notifier = AlertmanagerNotifier([sink.url], max_batch_size=64)
        alerts = [
            {"labels": {"alertname": "A", "i": str(i)}}
            for i in range(150)
        ]
        statuses = notifier.notify(alerts)
        assert statuses == {f"{sink.url}/api/v2/alerts": 200}
        bodies = [json.loads(b) for _, b in sink.received]
        assert [len(b) for b in bodies] == [64, 64, 22]
        assert [a["labels"]["i"] for b in bodies for a in b] == [
            str(i) for i in range(150)
        ]
    finally:
        sink.stop()


def test_alertmanager_pool_auth(spark):
    """`alerting.alertmanagers[].basic_auth`: the compiled
    Authorization header rides every push to that entry's members —
    a secured Alertmanager answers 401 to a bare POST (reported as
    delivery status, never raised) and 200 with credentials."""
    import base64
    import http.server
    import threading

    from shards_prometheus_spark.sources.alertmanager import (
        AlertmanagerNotifier,
    )
    from shards_prometheus_spark.sources.scrape_config import (
        load_scrape_configs,
        resolve_alertmanagers_full,
    )

    want = "Basic " + base64.b64encode(b"am:pw").decode()
    got_headers: "list[str]" = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            auth = self.headers.get("Authorization") or ""
            got_headers.append(auth)
            n = int(self.headers.get("Content-Length") or 0)
            self.rfile.read(n)
            self.send_response(200 if auth == want else 401)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        cfg = load_scrape_configs(
            f"""
alerting:
  alertmanagers:
    - basic_auth:
        username: am
        password: pw
      static_configs:
        - targets: ['127.0.0.1:{srv.server_port}']
scrape_configs: []
"""
        )
        resolved = resolve_alertmanagers_full(spark, cfg)
        ((url, headers),) = resolved
        assert headers == {"Authorization": want}

        notifier = AlertmanagerNotifier(
            [url], headers_by_url={url: headers}
        )
        statuses = notifier.notify(
            [{"labels": {"alertname": "x"}, "annotations": {}}]
        )
        assert list(statuses.values()) == [200]
        assert got_headers[-1] == want

        bare = AlertmanagerNotifier([url])
        statuses = bare.notify(
            [{"labels": {"alertname": "x"}, "annotations": {}}]
        )
        assert list(statuses.values()) == [401]  # reported, not raised
    finally:
        srv.shutdown()
        srv.server_close()
