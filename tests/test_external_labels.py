"""`global.external_labels` (sources/scrape_config.py + the outbound
boundaries): the identity labels upstream attaches to every alert
pushed to Alertmanager, every /federate output line, and every
remote-write send — but never stores in its own TSDB. The knob an HA
pair sets (cluster:/replica:) on day one so one Alertmanager can
dedup their notifications; reference pairing per prometheus.cpp:47,73
(the config file drives the paired server scraping the exposer).
"""

from __future__ import annotations

import json
import urllib.request

from tests.conftest import SF_SMOKE

RULE_FILE = """
groups:
  - name: paging
    interval: 1d
    rules:
      - alert: AnyClicks
        expr: sum by (user) (increase(click[720h])) > 0
        labels:
          severity: page
          cluster: rule-wins
"""


def test_parse_external_labels():
    from shards_prometheus_spark.sources.scrape_config import (
        load_scrape_configs,
    )

    cfg = load_scrape_configs(
        """
global:
  scrape_interval: 15s
  external_labels:
    cluster: a
    replica: r1
scrape_configs:
  - job_name: x
    static_configs: [{targets: ['h:1']}]
"""
    )
    assert cfg.external_labels == {"cluster": "a", "replica": "r1"}
    # absent section → empty dict, attach helpers are no-ops
    assert (
        load_scrape_configs("scrape_configs: []").external_labels == {}
    )


def test_attach_external_labels_alert_own_label_wins():
    from shards_prometheus_spark.sources.alertmanager import (
        attach_external_labels,
    )

    alerts = [
        {"labels": {"alertname": "A", "cluster": "mine"}},
        {"labels": {"alertname": "B"}},
    ]
    out = attach_external_labels(
        alerts, {"cluster": "ext", "replica": "r1"}
    )
    assert out[0]["labels"] == {
        "alertname": "A",
        "cluster": "mine",  # the alert's own label wins
        "replica": "r1",
    }
    assert out[1]["labels"] == {
        "alertname": "B",
        "cluster": "ext",
        "replica": "r1",
    }
    # input untouched; empty/None ext is the identity
    assert alerts[1]["labels"] == {"alertname": "B"}
    assert attach_external_labels(alerts, None) == alerts


def test_alert_push_carries_external_labels(spark):
    """The VERDICT Done-bar: a config with `external_labels:
    {cluster: a}` pushes alerts carrying cluster=a — attached BEFORE
    alert_relabel_configs (the relabel hop can act on the external
    label), and a rule's own label beats the external one."""
    from tests.test_alertmanager import _Sink

    from shards_prometheus_spark.sources import MetricsExposer

    sink = _Sink()
    yml = f"""
global:
  scrape_interval: 15s
  external_labels:
    cluster: a
    replica: r1
alerting:
  alert_relabel_configs:
    - source_labels: [replica]
      target_label: region
      replacement: "${{1}}-west"
  alertmanagers:
    - static_configs:
        - targets: ['{sink.url.replace("http://", "")}']
scrape_configs:
  - job_name: self
    static_configs: [{{targets: ['localhost:9090']}}]
"""
    exposer = MetricsExposer(
        spark, SF_SMOKE, rule_file=RULE_FILE, scrape_config=yml
    ).start()
    try:
        payload, statuses = exposer.push_alerts()
        assert statuses and all(
            200 <= s < 300 for s in statuses.values()
        )
        assert payload
        delivered = json.loads(sink.received[-1][1])
        for a in delivered:
            # external label attached
            assert a["labels"]["replica"] == "r1"
            # the rule's own `cluster` label wins the conflict
            assert a["labels"]["cluster"] == "rule-wins"
            # ...and alert_relabel_configs ran AFTER attachment, so
            # the relabel chain saw (and acted on) the external label
            assert a["labels"]["region"] == "r1-west"
    finally:
        exposer.stop()
        sink.stop()


def test_inject_external_labels_line_shapes():
    from shards_prometheus_spark.sources.exposition import (
        inject_external_labels,
    )

    ext = {"cluster": "a", "q": 'x"y\\z'}
    got = inject_external_labels(
        [
            "# TYPE click counter",
            "click_total 5",
            'click_total{user="1"} 5',
            '{"web.click"} 2',
            '{"web.click",user="1"} 2',
            'view{cluster="mine",user="2"} 3',
            'odd{note="a,cluster=fake"} 1',
        ],
        ext,
    )
    pair = 'cluster="a",q="x\\"y\\\\z"'
    assert got == [
        "# TYPE click counter",  # headers untouched
        "click_total{" + pair + "} 5",
        'click_total{user="1",' + pair + "} 5",
        '{"web.click",' + pair + "} 2",
        '{"web.click",user="1",' + pair + "} 2",
        # the series' own cluster label wins; q still attaches
        'view{cluster="mine",user="2",q="x\\"y\\\\z"} 3',
        # a label VALUE containing `cluster=` is not a label name
        'odd{note="a,cluster=fake",' + pair + "} 1",
    ]
    # no external labels → identity
    assert inject_external_labels(["x 1"], {}) == ["x 1"]


def test_federate_two_hop_shows_external_labels(spark):
    """An engine configured with external_labels federates them out;
    a DOWNSTREAM engine scraping /federate ingests series carrying
    the label — the full two-hop path of upstream's federation
    identity semantics."""
    from pyspark.sql import functions as F

    from shards_prometheus_spark.sources import MetricsExposer
    from shards_prometheus_spark.sources.scraper import (
        SYNTHETIC_METRICS,
        scrape_once,
        scraped_samples,
    )

    yml = """
global:
  external_labels: {cluster: a}
scrape_configs:
  - job_name: self
    static_configs: [{targets: ['localhost:9090']}]
"""
    exposer = MetricsExposer(
        spark, SF_SMOKE, scrape_config=yml
    ).start()
    try:
        url = (
            f"http://{exposer.host}:{exposer.port}/federate"
            "?match[]=view"
        )
        with urllib.request.urlopen(url, timeout=120) as resp:
            text = resp.read().decode()
        samples = [
            ln for ln in text.splitlines()
            if ln and not ln.startswith("#")
        ]
        assert samples
        assert all('cluster="a"' in ln for ln in samples)

        # hop 2: a downstream engine SCRAPES the federate endpoint
        # and classifies — the external label lands in its label map
        scraped = scraped_samples(scrape_once(spark, url))
        rows = (
            scraped.filter(~F.col("metric").isin(*SYNTHETIC_METRICS))
            .select("metric", "labels")
            .collect()
        )
        assert rows
        assert all(r["labels"]["cluster"] == "a" for r in rows)
    finally:
        exposer.stop()


def test_remote_write_send_attaches_external_labels(spark):
    """The SEND boundary: encode_write_requests(external_labels=…)
    stamps every outgoing series lacking the name; a series' own
    label wins. Round-tripped through the public 1.0 wire decoder."""
    from shards_prometheus_spark.sources.remote_write import (
        encode_write_requests,
        parse_write_request,
    )

    df = spark.createDataFrame(
        [
            ("m", {"user": "1"}, 1_000_000, 2.0),
            ("m", {"user": "2", "cluster": "mine"}, 2_000_000, 3.0),
        ],
        "metric string, labels map<string,string>, ts_us long, "
        "value double",
    ).coalesce(1)
    payloads = encode_write_requests(
        df, external_labels={"cluster": "a", "replica": "r1"}
    ).collect()
    rows = [
        r
        for p in payloads
        if p["payload"] is not None
        for r in parse_write_request(bytes(p["payload"]))
    ]
    got = {
        lbls["user"]: (lbls.get("cluster"), lbls.get("replica"))
        for lbls, _ts, _v in rows
    }
    assert got == {"1": ("a", "r1"), "2": ("mine", "r1")}
