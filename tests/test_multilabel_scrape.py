"""Multi-label scrape classification (r12 VERDICT gap #2/#3).

`classify_lines` parses EVERY `k="v"` pair into a labels map, so the
engine's own multi-label writers — and any third-party exporter
(node_exporter serves 2–4 labels per series) — round-trip
exposer → scrape loop → registry without collapsing distinct series
or dropping labels. Summary families (`x{quantile=…}` + x_sum/x_count)
classify as kind='summary' with the quantile label intact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

#: A ≥3-label counter family plus a 2-label gauge — the classic
#: text-format dialect. Distinct series differ only in the THIRD
#: label (device), the case the old single-pair classifier collapsed.
_MULTI_PAYLOAD = [
    "# TYPE disk_io_total counter",
    'disk_io_total{device="sda",mode="read",user="u1"} 5',
    'disk_io_total{device="sdb",mode="read",user="u1"} 7',
    'disk_io_total{device="sda",mode="write",user="u2"} 11',
    "# TYPE temp gauge",
    'temp{sensor="cpu",zone="z1"} 42.5',
]


def _lines_df(spark, lines):
    return spark.createDataFrame([(ln,) for ln in lines], "line string")


def test_multilabel_roundtrip_both_dialects(spark):
    """A ≥3-label family served by a live exposer round-trips through
    the REAL scrape loop (HTTP GET → classify → registry) in both
    dialects: every label pair survives, series distinct in the third
    label stay distinct, totals exact."""
    from shards_prometheus_spark.sources import MetricsExposer
    from shards_prometheus_spark.sources.scraper import (
        SYNTHETIC_METRICS,
        registry_from_scrapes,
        scrape_once,
        scraped_samples,
    )

    for openmetrics in (False, True):
        payload = list(_MULTI_PAYLOAD) + (["# EOF"] if openmetrics else [])
        exposer = MetricsExposer(
            spark,
            SF_SMOKE,
            lines_fn=lambda p=payload: _lines_df(spark, p),
            openmetrics=openmetrics,
        ).start()
        try:
            url = f"http://{exposer.host}:{exposer.port}/metrics"
            scraped = scraped_samples(
                scrape_once(spark, url).withColumn(
                    "scrape_idx", F.lit(0).cast("long")
                )
            )
            reg = registry_from_scrapes(scraped).filter(
                ~F.col("metric").isin(*SYNTHETIC_METRICS)
            )
            got = sorted(
                (
                    r["metric"],
                    r["kind"],
                    tuple(sorted((r["labels"] or {}).items())),
                    r["value"],
                )
                for r in reg.collect()
            )
            assert got == [
                (
                    "disk_io",
                    "counter",
                    (("device", "sda"), ("mode", "read"), ("user", "u1")),
                    5.0,
                ),
                (
                    "disk_io",
                    "counter",
                    (("device", "sda"), ("mode", "write"), ("user", "u2")),
                    11.0,
                ),
                (
                    "disk_io",
                    "counter",
                    (("device", "sdb"), ("mode", "read"), ("user", "u1")),
                    7.0,
                ),
                (
                    "temp",
                    "gauge",
                    (("sensor", "cpu"), ("zone", "z1")),
                    42.5,
                ),
            ], f"openmetrics={openmetrics}"
        finally:
            exposer.stop()


def test_multilabel_staleness_third_label(spark):
    """Series differing only in a non-user label die independently:
    dropping ONE device between ticks stales exactly that series."""
    from shards_prometheus_spark.sources.scraper import (
        SYNTHETIC_METRICS,
        registry_from_scrapes,
        scraped_samples,
        scraped_with_staleness,
    )

    def tick(idx, ts, lines):
        return [("t", idx, ts, ln, "") for ln in lines]

    rows = tick(
        0,
        10_000_000,
        [
            'io_total{device="sda",user="u"} 1',
            'io_total{device="sdb",user="u"} 2',
        ],
    ) + tick(1, 20_000_000, ['io_total{device="sda",user="u"} 3'])
    log = spark.createDataFrame(
        rows,
        "target string, scrape_idx long, scrape_ts_us long, "
        "line string, content_type string",
    )
    reg = registry_from_scrapes(
        scraped_with_staleness(scraped_samples(log))
    ).filter(~F.col("metric").isin(*SYNTHETIC_METRICS))
    got = sorted(
        (dict(r["labels"])["device"], r["value"]) for r in reg.collect()
    )
    # sdb (same user!) staled out; sda survives with its tick-1 value
    assert got == [("sda", 3.0)]


def test_summary_family_node_exporter_style(spark):
    """A node_exporter-style summary parses with kind='summary', the
    quantile label intact, and _sum/_count joining the family via
    classify_summary_families; the quantile series stays queryable
    like a gauge (instant read serves its value per quantile)."""
    from shards_prometheus_spark.registry_api import MetricsRegistry
    from shards_prometheus_spark.sources.exposition import (
        classify_lines,
        classify_summary_families,
    )

    payload = [
        "# TYPE go_gc_duration_seconds summary",
        'go_gc_duration_seconds{quantile="0"} 0.00005',
        'go_gc_duration_seconds{quantile="0.5"} 0.0002',
        'go_gc_duration_seconds{quantile="1"} 0.004',
        "go_gc_duration_seconds_sum 1.5",
        "go_gc_duration_seconds_count 300",
        "# TYPE process_cpu_seconds_total counter",
        "process_cpu_seconds_total 12.5",
    ]
    parsed = classify_summary_families(
        classify_lines(_lines_df(spark, payload), with_labels=True)
    )
    rows = {
        (r["metric"], r["stat"], (r["labels"] or {}).get("quantile")): (
            r["kind"],
            r["value"],
        )
        for r in parsed.collect()
    }
    fam = "go_gc_duration_seconds"
    assert rows[(fam, "value", "0.5")] == ("summary", 0.0002)
    assert rows[(fam, "sum", None)] == ("summary", 1.5)
    assert rows[(fam, "count", None)] == ("summary", 300.0)
    # a bare counter is untouched by the family rewrite
    assert rows[("process_cpu_seconds", "total", None)] == (
        "counter",
        12.5,
    )

    # quantile series query like gauges: latest value per series,
    # quantile label readable off the map
    q = (
        parsed.filter(
            (F.col("kind") == "summary") & (F.col("stat") == "value")
        )
        .withColumn("ts_us", F.lit(0).cast("long"))
        .withColumn("event_id", F.lit(0).cast("long"))
        .withColumn("label_user", F.lit(None).cast("string"))
    )
    got = {
        dict(r["labels"])["quantile"]: r["value"]
        for r in MetricsRegistry(q).instant().collect()
    }
    assert got == {"0": 0.00005, "0.5": 0.0002, "1": 0.004}


def test_relabel_scraped_uses_parsed_map(spark):
    """metric_relabel_configs operate on the REAL parsed label map
    (relabel.py:375 gap): a rule keyed on a third payload label —
    one the flattened pair never carried — rewrites correctly."""
    from shards_prometheus_spark.sources.scraper import scraped_samples

    rows = [
        ("t", 0, 10_000_000, 'io_total{device="sda",user="u"} 1', ""),
        ("t", 0, 10_000_000, 'io_total{device="sdb",user="u"} 2', ""),
    ]
    log = spark.createDataFrame(
        rows,
        "target string, scrape_idx long, scrape_ts_us long, "
        "line string, content_type string",
    )
    out = scraped_samples(
        log,
        metric_relabel_configs=[
            # keyed on the THIRD label: keep only sda
            {
                "action": "keep",
                "source_labels": ["device"],
                "regex": "sda",
            },
            # and copy it into a new label
            {
                "action": "replace",
                "source_labels": ["device"],
                "regex": "(.+)",
                "target_label": "disk",
                "replacement": "disk-$1",
            },
        ],
    )
    got = [
        (dict(r["labels"]), r["value"])
        for r in out.filter(F.col("metric") == "io").collect()
    ]
    assert len(got) == 1
    labels, value = got[0]
    assert value == 1.0
    assert labels["device"] == "sda"
    assert labels["disk"] == "disk-sda"
    assert labels["user"] == "u"
    assert labels["instance"] == "t"


def test_classified_lines_reexposes_scraped_state(spark):
    """The serving half of the scraped-registry loop
    (`classified_lines`, the inverse writer): scrape a multi-label +
    summary payload, re-expose the scraped registry through a SECOND
    exposer, scrape THAT, and get identical state — multi-label
    series, summary quantiles, histogram les, and a label-less gauge
    all surviving two full HTTP round trips. This is federation of
    scraped state in effect."""
    from shards_prometheus_spark.sources import MetricsExposer
    from shards_prometheus_spark.sources.exposition import (
        classified_lines,
    )
    from shards_prometheus_spark.sources.scraper import (
        SYNTHETIC_METRICS,
        registry_from_scrapes,
        scrape_once,
        scraped_samples,
    )

    payload = [
        "# TYPE disk_io_total counter",
        'disk_io_total{device="sda",mode="read",user="u1"} 5.25',
        'disk_io_total{device="sdb",mode="read",user="u1"} 7.5',
        "# TYPE lat summary",
        'lat{quantile="0.5"} 0.00025',
        "lat_sum 1.5",
        "lat_count 300",
        "# TYPE h histogram",
        'h_bucket{le="0.5",user="u"} 2',
        'h_bucket{le="+Inf",user="u"} 3',
        "h_sum 4.5",
        "h_count 3",
        "# TYPE plain gauge",
        "plain 42.5",
    ]

    def state(reg):
        return sorted(
            (
                r["metric"],
                r["kind"],
                r["stat"],
                tuple(sorted((r["labels"] or {}).items())),
                r["value"],
            )
            for r in reg.collect()
            if r["metric"] not in SYNTHETIC_METRICS
        )

    def scrape_state(exposer):
        scraped = scraped_samples(
            scrape_once(
                spark, f"http://{exposer.host}:{exposer.port}/metrics"
            ).withColumn("scrape_idx", F.lit(0).cast("long"))
        )
        return registry_from_scrapes(scraped)

    first = MetricsExposer(
        spark,
        SF_SMOKE,
        lines_fn=lambda: _lines_df(spark, payload),
    ).start()
    try:
        reg1 = scrape_state(first).cache()
        want = state(reg1)
        assert len(want) == 10  # every payload sample survived
        second = MetricsExposer(
            spark,
            SF_SMOKE,
            lines_fn=lambda: classified_lines(
                reg1.filter(~F.col("metric").isin(*SYNTHETIC_METRICS))
            ),
        ).start()
        try:
            got = state(scrape_state(second))
            assert got == want
        finally:
            second.stop()
        reg1.unpersist()
    finally:
        first.stop()
