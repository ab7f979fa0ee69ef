"""The config-driven wire federation surface (r15): prometheus.yml's
`remote_write:` / `remote_read:` sections and `scrape_config_files`
includes — the knobs a fleet shipping to Mimir/Thanos/Cortex (or
federating reads across engines) sets on day one.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

_RW_YAML = """
global:
  scrape_interval: 15s
  external_labels:
    cluster: alpha
remote_write:
  - url: http://127.0.0.1:9999/api/v1/write
    name: long-term
    remote_timeout: 45s
    protobuf_message: io.prometheus.write.v2.Request
    basic_auth:
      username: push
      password: secret
    headers:
      X-Scope-OrgID: tenant-a
    write_relabel_configs:
      - action: drop
        source_labels: [__name__]
        regex: debug_.*
  - url: http://127.0.0.1:9998/api/v1/write
remote_read:
  - url: http://127.0.0.1:9997/api/v1/read
    required_matchers:
      cluster: beta
    read_recent: true
    remote_timeout: 20s
scrape_configs: []
"""


def test_remote_write_read_config_parses():
    from shards_prometheus_spark.sources.scrape_config import (
        load_scrape_configs,
    )

    cfg = load_scrape_configs(_RW_YAML)
    a, b = cfg.remote_write
    assert a.name == "long-term" and a.protocol == "2.0"
    assert a.timeout_s == 45.0
    assert a.write_relabel_configs[0]["action"] == "drop"
    h = a.request_headers()
    assert h["Authorization"].startswith("Basic ")
    assert h["X-Scope-OrgID"] == "tenant-a"
    assert b.protocol == "1.0" and b.request_headers() is None
    (r,) = cfg.remote_read
    assert r.required_matchers == {"cluster": "beta"}
    assert r.read_recent is True and r.timeout_s == 20.0


def test_scrape_config_files_include(tmp_path):
    from shards_prometheus_spark.sources.scrape_config import (
        load_scrape_configs,
    )

    (tmp_path / "jobs_a.yml").write_text(
        "scrape_configs:\n"
        "  - job_name: from_a\n"
        "    static_configs:\n"
        "      - targets: ['127.0.0.1:1111']\n"
    )
    (tmp_path / "jobs_b.yml").write_text(
        "- job_name: from_b\n"  # bare top-level list also accepted
        "  static_configs:\n"
        "    - targets: ['127.0.0.1:2222']\n"
    )
    cfg = load_scrape_configs(
        """
scrape_configs:
  - job_name: inline
    static_configs:
      - targets: ['127.0.0.1:3333']
scrape_config_files:
  - jobs_*.yml
""",
        base_dir=str(tmp_path),
    )
    assert [j.job_name for j in cfg.jobs] == [
        "inline",
        "from_a",
        "from_b",
    ]


def test_push_samples_for_config_policy(spark):
    """The config-driven send: external_labels attach FIRST, then
    write_relabel_configs run (and can drop series); auth headers
    ride the POST; the delivered store carries the shaped series."""
    from shards_prometheus_spark.model import samples_multi
    from shards_prometheus_spark.sources.remote_write import (
        RemoteWriteReceiver,
        push_samples_for_config,
    )
    from shards_prometheus_spark.sources.scrape_config import (
        load_scrape_configs,
    )

    rx = RemoteWriteReceiver().start()
    try:
        yml = f"""
global:
  external_labels:
    cluster: alpha
remote_write:
  - url: http://{rx.host}:{rx.port}/api/v1/write
    name: primary
    write_relabel_configs:
      - action: keep
        source_labels: [__name__]
        regex: click
      - action: replace
        source_labels: [cluster]
        target_label: origin
        regex: (.+)
        replacement: from-$1
scrape_configs: []
"""
        cfg = load_scrape_configs(yml)
        s = samples_multi(spark, SF_SMOKE).repartition(2, "metric")
        results = push_samples_for_config(s, cfg)
        statuses = results["primary"].collect()
        assert statuses and all(r["status"] == 204 for r in statuses)

        pushed = rx.samples(spark)
        got_metrics = {
            r["metric"] for r in pushed.select("metric").distinct().collect()
        }
        assert got_metrics == {"click"}  # the keep rule dropped the rest
        row = pushed.select("labels").first()
        labels = dict(row["labels"])
        # external label attached BEFORE the relabel hop, so the hop
        # could derive origin from it
        assert labels["cluster"] == "alpha"
        assert labels["origin"] == "from-alpha"
        assert pushed.count() == s.filter(
            F.col("metric") == "click"
        ).count()
    finally:
        rx.stop()


def test_remote_read_client_federation(spark):
    """Engine A serves /api/v1/read; a config-driven client fetches
    its series as a §1.2 relation equal to the direct selection;
    required_matchers gate the fan-out and ride the request."""
    from shards_prometheus_spark.model import samples_multi
    from shards_prometheus_spark.sources import MetricsExposer
    from shards_prometheus_spark.sources.remote_read import (
        remote_samples_for_config,
    )
    from shards_prometheus_spark.sources.scrape_config import (
        load_scrape_configs,
    )

    exposer = MetricsExposer(spark, SF_SMOKE).start()
    try:
        yml = f"""
remote_read:
  - url: http://{exposer.host}:{exposer.port}/api/v1/read
    required_matchers:
      shard: "3"
scrape_configs: []
"""
        cfg = load_scrape_configs(yml)
        got = remote_samples_for_config(
            spark, cfg, matchers=[("__name__", "=", "view")]
        )
        assert got is not None
        s = samples_multi(spark, SF_SMOKE)
        want = s.filter(
            (F.col("metric") == "view")
            & (F.element_at("labels", F.lit("shard")) == "3")
        )
        # remote timestamps ride the ms wire grid
        w = {
            (r["u"], r["n"], r["sv"])
            for r in want.groupBy(
                F.element_at("labels", F.lit("user")).alias("u")
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 4).alias("sv"),
            )
            .collect()
        }
        g = {
            (r["u"], r["n"], r["sv"])
            for r in got.groupBy(
                F.element_at("labels", F.lit("user")).alias("u")
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 4).alias("sv"),
            )
            .collect()
        }
        assert g == w and len(g) > 0
        # series identity re-hashes canonically: one series_id per
        # (metric, labels) and no NULLs
        assert got.filter(F.col("series_id").isNull()).count() == 0

        # a selector CONTRADICTING the gate skips the endpoint
        none = remote_samples_for_config(
            spark, cfg, matchers=[("shard", "=", "5")]
        )
        assert none is None
    finally:
        exposer.stop()


def test_serve_config_pushes_remote_writes(spark):
    """The running engine drives its config's `remote_write:` section:
    scraped samples land on the receiver carrying external_labels +
    write relabeling, and the per-entry watermark pushes each
    scrape's delta exactly once."""
    import time as _time

    from shards_prometheus_spark.sources import MetricsExposer
    from shards_prometheus_spark.sources.remote_write import (
        RemoteWriteReceiver,
    )
    from shards_prometheus_spark.sources.scrape_config import (
        serve_scraped_config,
    )

    payload = [
        "# TYPE beat_total counter",
        'beat_total{user="u1"} 5',
        "# TYPE temp gauge",
        "temp 42.5",
    ]

    def lines_fn():
        return spark.createDataFrame(
            [(ln,) for ln in payload], "line string"
        )

    target = MetricsExposer(spark, SF_SMOKE, lines_fn=lines_fn).start()
    rx = RemoteWriteReceiver().start()
    srv = None
    try:
        cfg = f"""
global:
  scrape_interval: 1s
  external_labels:
    cluster: alpha
remote_write:
  - url: http://{rx.host}:{rx.port}/api/v1/write
    name: primary
    write_relabel_configs:
      - action: drop
        source_labels: [__name__]
        regex: scrape_.*
scrape_configs:
  - job_name: demo
    static_configs:
      - targets: ['{target.host}:{target.port}']
"""
        srv = serve_scraped_config(
            spark, cfg, SF_SMOKE, max_ticks=3, trigger_seconds=1.0
        )
        deadline = _time.time() + 240
        pushed_rows = 0
        while _time.time() < deadline:
            try:
                results = srv.push_remote_writes()
            except Exception:  # noqa: BLE001 - store may be empty yet
                _time.sleep(0.5)
                continue
            statuses = results.get("primary", [])
            assert all(r["status"] == 204 for r in statuses)
            pushed_rows = rx.n_rows
            got = {
                r["metric"]
                for r in rx.samples(spark).select("metric").distinct().collect()
            }
            if {"beat_total", "temp", "up"} <= got:
                break
            _time.sleep(0.5)
        else:
            raise AssertionError("pushed metrics never arrived")

        pushed = rx.samples(spark)
        # the drop rule removed the scrape_* synthetics, up survived
        names = {
            r["metric"]
            for r in pushed.select("metric").distinct().collect()
        }
        assert "scrape_duration_seconds" not in names
        assert "scrape_samples_scraped" not in names
        # external label attached at the boundary
        assert all(
            dict(r["labels"]).get("cluster") == "alpha"
            for r in pushed.select("labels").collect()
        )
        # watermark: a push with no new ticks sends nothing
        for q in srv.streams:
            q.processAllAvailable()
        srv.push_remote_writes()
        n_after = rx.n_rows
        again = srv.push_remote_writes()
        assert again.get("primary", []) == []
        assert rx.n_rows == n_after >= pushed_rows
    finally:
        if srv is not None:
            srv.stop()
        rx.stop()
        target.stop()
