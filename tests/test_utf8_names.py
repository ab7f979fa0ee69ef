"""UTF-8 (3.x quoted) metric names through the exposition WRITERS —
the r11 selector syntax's serialization half: a dotted OTel-style
family renders as `{"web.click_total",user="a"} v` with quoted
`# TYPE` headers, both parsers accept it, and the family round-trips
exposer → scrape loop → registry across both dialects.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

SNAP_SCHEMA = "kind string, metric string, label_user string, value double"

SNAP_ROWS = [
    ("counter", "web.click", "a", 3.0),
    ("counter", "web.click", "b", 5.0),
    ("gauge", "temp.θ", "x", 21.5),
    ("counter", "plain", "a", 7.0),
    ("gauge", "bare", "y", 1.0),
]


def _snap(spark):
    return spark.createDataFrame(SNAP_ROWS, SNAP_SCHEMA)


def test_writer_quotes_non_classic_names(spark):
    from shards_prometheus_spark.sources.exposition import snapshot_lines

    lines = sorted(
        r["line"] for r in snapshot_lines(_snap(spark)).collect()
    )
    assert '# TYPE "web.click" counter' in lines
    assert '# TYPE "temp.θ" gauge' in lines
    assert "# TYPE plain counter" in lines  # classic stays bare
    assert '{"web.click_total",user="a"} 3.0000' in lines
    assert '{"temp.θ",user="x"} 21.5000' in lines
    assert 'plain_total{user="a"} 7.0000' in lines
    assert 'bare{user="y"} 1.0000' in lines


def test_parser_accepts_quoted_names(spark):
    """_parse_payload (header-validated) recovers quoted families with
    the same kinds/values as classic ones — the writer/parser pair is
    a lossless round trip."""
    from shards_prometheus_spark.sources.exposition import (
        _parse_payload,
        snapshot_lines,
    )

    parsed = _parse_payload(snapshot_lines(_snap(spark)))
    got = sorted(
        (r["metric"], r["kind"], r["stat"], r["label_user"], r["value"])
        for r in parsed.collect()
    )
    assert got == sorted(
        [
            ("web.click", "counter", "total", "a", 3.0),
            ("web.click", "counter", "total", "b", 5.0),
            ("temp.θ", "gauge", "value", "x", 21.5),
            ("plain", "counter", "total", "a", 7.0),
            ("bare", "gauge", "value", "y", 1.0),
        ]
    )


def test_label_escaping_survives_quoted_lines(spark):
    """A label value containing quote/backslash escapes parses back
    exactly on a quoted-name line (the `,key="` anchor cannot be
    shadowed by the escaped name body)."""
    from shards_prometheus_spark.sources.exposition import (
        _parse_payload,
        snapshot_lines,
    )

    snap = spark.createDataFrame(
        [("counter", 'dot.name"q', 'va"l\\ue', 2.0)], SNAP_SCHEMA
    )
    lines = [r["line"] for r in snapshot_lines(snap).collect()]
    sample = next(ln for ln in lines if not ln.startswith("#"))
    assert sample == '{"dot.name\\"q_total",user="va\\"l\\\\ue"} 2.0000'
    (row,) = _parse_payload(snapshot_lines(snap)).collect()
    assert (row["metric"], row["label_user"], row["value"]) == (
        'dot.name"q',
        'va"l\\ue',
        2.0,
    )


def test_openmetrics_text_groups_quoted_families(spark):
    """The OM serializer's section order holds for quoted families:
    HELP/TYPE headers precede the family's samples."""
    from shards_prometheus_spark.sources.exposition import (
        openmetrics_text,
        snapshot_lines,
    )

    extra = spark.createDataFrame(
        [('# HELP "web.click" Series exported by the metrics registry.',),
         ("# EOF",)],
        "line string",
    )
    text = openmetrics_text(
        snapshot_lines(_snap(spark)).unionByName(extra)
    )
    lines = text.strip().split("\n")
    assert lines[-1] == "# EOF"
    fam = [ln for ln in lines if "web.click" in ln]
    assert fam[0] == (
        '# HELP "web.click" Series exported by the metrics registry.'
    )
    assert fam[1] == '# TYPE "web.click" counter'
    assert fam[2:] == [
        '{"web.click_total",user="a"} 3.0000',
        '{"web.click_total",user="b"} 5.0000',
    ]


def test_utf8_round_trip_exposer_scrape_registry(spark):
    """The closed loop for a dotted family, both dialects: an exposer
    serving a quoted-name payload is scraped by the engine's own
    scrape source and the scraped registry recovers the family's
    series and values exactly."""
    from shards_prometheus_spark.sources import MetricsExposer
    from shards_prometheus_spark.sources.exposition import (
        openmetrics_text,
        snapshot_lines,
    )
    from shards_prometheus_spark.sources.scraper import (
        registry_from_scrapes,
        scrape_once,
        scraped_samples,
    )

    want = sorted(
        [
            ("web.click", "counter", "a", 3.0),
            ("web.click", "counter", "b", 5.0),
            ("temp.θ", "gauge", "x", 21.5),
            ("plain", "counter", "a", 7.0),
            ("bare", "gauge", "y", 1.0),
        ]
    )
    for openmetrics in (False, True):
        if openmetrics:
            eof = spark.createDataFrame([("# EOF",)], "line string")
            lines_fn = lambda: snapshot_lines(_snap(spark)).unionByName(  # noqa: E731,E501
                eof
            )
        else:
            lines_fn = lambda: snapshot_lines(_snap(spark))  # noqa: E731
        exposer = MetricsExposer(
            spark, SF_SMOKE, lines_fn=lines_fn, openmetrics=openmetrics
        ).start()
        try:
            url = f"http://{exposer.host}:{exposer.port}/metrics"
            if openmetrics:
                # the OM serializer groups quoted families correctly
                assert '# TYPE "web.click" counter' in openmetrics_text(
                    lines_fn()
                )
            scraped = scraped_samples(
                scrape_once(spark, url).withColumn(
                    "scrape_idx", F.lit(0).cast("long")
                )
            )
            from shards_prometheus_spark.sources.scraper import (
                SYNTHETIC_METRICS,
            )

            reg = registry_from_scrapes(scraped)
            got = sorted(
                (r["metric"], r["kind"], r["label_user"], r["value"])
                for r in reg.collect()
                if r["metric"] not in SYNTHETIC_METRICS
            )
            assert got == want, f"openmetrics={openmetrics}"
        finally:
            exposer.stop()
