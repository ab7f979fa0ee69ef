"""Remote-read (`/api/v1/read`, sources/remote_read.py) — the pull
wire twin of remote-write: snappy+protobuf ReadRequest in,
ReadResponse time series out, answered off the exposer's samples
relation with the same matcher semantics as every other selector.
"""

from __future__ import annotations

import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_read_request_codec_round_trip():
    from shards_prometheus_spark.sources.remote_read import (
        encode_read_request,
        parse_read_request,
    )

    queries = [
        (
            1_700_000_000_000,
            1_700_003_600_000,
            [("__name__", "=", "click"), ("user", "=~", "a.*|b")],
        ),
        (-120_000, 0, [("user", "!=", "x"), ("shard", "!~", "[0-3]")]),
    ]
    assert parse_read_request(encode_read_request(queries)) == queries
    assert (
        parse_read_request(
            encode_read_request(queries, compress=False),
            compressed=False,
        )
        == queries
    )
    with pytest.raises(ValueError):
        parse_read_request(b"\x00\x01garbage")


def test_read_response_codec_round_trip():
    from shards_prometheus_spark.sources.remote_read import (
        encode_read_response,
        parse_read_response,
    )

    results = [
        [
            (
                {"__name__": "web.click", "user": "α7"},
                [(1_700_000_000_000, 1.5), (1_700_000_060_000, 2.0)],
            ),
            ({"__name__": "view", "user": "b"}, [(-5_000, -3.25)]),
        ],
        [],  # second query matched nothing
    ]
    assert parse_read_response(encode_read_response(results)) == results


def test_read_query_frame_matches_direct_selection(spark):
    """The matcher→DataFrame compiler: closed [start, end] ms bounds,
    __name__ ops against the metric column, label ops through
    apply_matchers — equal to the hand-written filter."""
    from shards_prometheus_spark.model import samples_multi
    from shards_prometheus_spark.sources.remote_read import (
        read_query_frame,
    )

    s = samples_multi(spark, SF_SMOKE)
    row = s.agg(
        F.expr("min(ts_us) div 1000").alias("lo"),
        F.expr("max(ts_us) div 1000").alias("hi"),
    ).collect()[0]
    lo, hi = row["lo"], row["hi"]
    mid = (lo + hi) // 2
    got = read_query_frame(
        s, lo, mid, [("__name__", "=", "click"), ("user", "=~", "1.*")]
    )
    want = s.filter(
        (F.col("ts_us") >= lo * 1000)
        & (F.col("ts_us") <= mid * 1000)
        & (F.col("metric") == "click")
        & F.element_at("labels", "user").rlike("(?d)^(?:1.*)\\z")
    )
    assert got.count() == want.count() > 0
    # set ops reject MAP columns — compare on the flattened shape
    flat = lambda df: df.select(  # noqa: E731
        "event_id", "metric", F.to_json("labels"), "ts_us", "value"
    )
    assert flat(got).exceptAll(flat(want)).count() == 0


def _post(url: str, body: bytes):
    req = urllib.request.Request(
        url,
        data=body,
        headers={"Content-Type": "application/x-protobuf"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, resp.read()


def test_read_endpoint_round_trip(spark):
    """Encode a ReadRequest, POST it to the exposer, decode the
    ReadResponse — equal to the direct selector query; a corrupt
    payload answers 400."""
    from shards_prometheus_spark.model import samples_multi
    from shards_prometheus_spark.sources import MetricsExposer
    from shards_prometheus_spark.sources.remote_read import (
        encode_read_request,
        parse_read_response,
        read_query_frame,
    )

    s = samples_multi(spark, SF_SMOKE)
    row = s.agg(
        F.expr("min(ts_us) div 1000").alias("lo"),
        F.expr("max(ts_us) div 1000").alias("hi"),
    ).collect()[0]
    lo, hi = row["lo"], row["hi"]
    matchers = [("__name__", "=", "click"), ("user", "=~", "1.*")]

    exposer = MetricsExposer(spark, SF_SMOKE).start()
    try:
        url = f"http://{exposer.host}:{exposer.port}/api/v1/read"
        status, body = _post(
            url, encode_read_request([(lo, hi, matchers)])
        )
        assert status == 200
        (series_list,) = parse_read_response(body)

        want_rows = read_query_frame(s, lo, hi, matchers).select(
            "metric",
            "labels",
            F.expr("ts_us div 1000").alias("ts_ms"),
            "value",
        ).collect()
        want: dict = {}
        for r in want_rows:
            labels = dict(r["labels"] or {})
            labels["__name__"] = r["metric"]
            want.setdefault(
                tuple(sorted(labels.items())), []
            ).append((r["ts_ms"], r["value"]))
        got = {
            tuple(sorted(labels.items())): samples
            for labels, samples in series_list
        }
        assert set(got) == set(want) and len(got) > 0
        for key in want:
            assert got[key] == sorted(want[key])

        # corrupt payload → the public 400
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(url, b"\x03not-snappy")
        assert exc.value.code == 400
    finally:
        exposer.stop()


def test_read_endpoint_serves_pushed_state(spark):
    """remote-write in, remote-read out: a pushed sample comes back
    through /api/v1/read — the two wire halves share one store."""
    from shards_prometheus_spark.sources import MetricsExposer
    from shards_prometheus_spark.sources.remote_read import (
        encode_read_request,
        parse_read_response,
    )
    from shards_prometheus_spark.sources.remote_write import (
        encode_write_request,
    )

    exposer = MetricsExposer(spark, SF_SMOKE, remote_write=True).start()
    try:
        base = f"http://{exposer.host}:{exposer.port}"
        ts_ms = 1_700_000_000_000
        push = encode_write_request(
            [({"__name__": "pushed_series", "user": "rr"}, ts_ms, 42.0)]
        )
        status, _ = _post(f"{base}/api/v1/write", push)
        assert status == 204
        status, body = _post(
            f"{base}/api/v1/read",
            encode_read_request(
                [
                    (
                        ts_ms - 1000,
                        ts_ms + 1000,
                        [("__name__", "=", "pushed_series")],
                    )
                ]
            ),
        )
        assert status == 200
        (series_list,) = parse_read_response(body)
        assert series_list == [
            (
                {"__name__": "pushed_series", "user": "rr"},
                [(ts_ms, 42.0)],
            )
        ]
    finally:
        exposer.stop()
