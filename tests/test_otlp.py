"""OTLP metrics ingest (sources/otlp.py) — the paired server's 3.x
OTLP receiver: ExportMetricsServiceRequest decoded on the vendored
wire walker, Prometheus translation applied (attribute labels,
service.name/instance promotion, _total suffixing, histogram and
summary explosion), served through the same pushed store the
remote-write receiver feeds.
"""

from __future__ import annotations

import gzip
import json
import urllib.error
import urllib.request
from urllib.parse import quote

import pytest

from tests.conftest import SF_SMOKE

_TS_NS = 1_700_000_000_000_000_000  # 2023-11-14T22:13:20Z


def _request_bytes():
    from shards_prometheus_spark.sources.otlp import encode_otlp_request

    return encode_otlp_request(
        [
            {
                "name": "http.requests",
                "kind": "sum",
                "monotonic": True,
                "points": [
                    ({"method": "GET"}, _TS_NS, 5.0),
                    ({"method": "POST"}, _TS_NS, 2.0),
                ],
            },
            {
                "name": "queue.depth",
                "kind": "gauge",
                "points": [({}, _TS_NS, 7.5)],
            },
            {
                "name": "rpc.latency",
                "kind": "histogram",
                "points": [
                    (
                        {"svc": "a"},
                        _TS_NS,
                        [0.5, 1.0],
                        [2, 1, 3],
                        4.25,
                        6,
                    )
                ],
            },
            {
                "name": "gc.pause",
                "kind": "summary",
                "points": [
                    ({}, _TS_NS, [(0.5, 0.001), (1.0, 0.004)], 1.5, 300)
                ],
            },
        ],
        resource={
            "service.name": "checkout",
            "service.instance.id": "pod-7",
            "host.name": "ignored-by-promotion",
        },
    )


def test_parse_otlp_translation_rules():
    """The public Prometheus translation: sanitized names, `_total`
    on monotonic sums, cumulative buckets with +Inf, summary
    quantiles, job/instance promoted from resource attributes."""
    from shards_prometheus_spark.sources.otlp import parse_otlp_request

    rows = parse_otlp_request(_request_bytes())
    by_series = {
        (
            r[0]["__name__"],
            tuple(
                sorted(
                    (k, v)
                    for k, v in r[0].items()
                    if k != "__name__"
                )
            ),
        ): r[2]
        for r in rows
    }
    job = ("instance", "pod-7"), ("job", "checkout")

    # monotonic sum → _total, attribute label, promotion applied
    assert (
        by_series[("http_requests_total", (*job, ("method", "GET")))]
        == 5.0
    )
    assert (
        by_series[("http_requests_total", (*job, ("method", "POST")))]
        == 2.0
    )
    # gauge keeps its (sanitized) name
    assert by_series[("queue_depth", job)] == 7.5
    # histogram: per-bucket counts cumulate; +Inf = total count
    h = ("svc", "a")
    assert by_series[("rpc_latency_bucket", (*job, ("le", "0.5"), h))] == 2.0
    assert by_series[("rpc_latency_bucket", (*job, ("le", "1"), h))] == 3.0
    assert (
        by_series[("rpc_latency_bucket", (*job, ("le", "+Inf"), h))] == 6.0
    )
    assert by_series[("rpc_latency_sum", (*job, h))] == 4.25
    assert by_series[("rpc_latency_count", (*job, h))] == 6.0
    # summary: quantile-labelled samples + sum/count
    assert by_series[("gc_pause", (*job, ("quantile", "0.5")))] == 0.001
    assert by_series[("gc_pause", (*job, ("quantile", "1")))] == 0.004
    assert by_series[("gc_pause_sum", job)] == 1.5
    assert by_series[("gc_pause_count", job)] == 300.0
    # one shared millisecond timestamp throughout
    assert {r[1] for r in rows} == {_TS_NS // 1_000_000}

    # corrupt payload → the 400 contract's ValueError
    with pytest.raises(ValueError):
        parse_otlp_request(b"\x0a\x03ab")  # truncated length-delimited


def test_otlp_endpoint_serves_through_read_api(spark):
    """POST OTLP to /api/v1/otlp/v1/metrics (gzip accepted): 200 with
    the protobuf content type, rows land in the SAME pushed store as
    remote-write, and PromQL serves them; 404 when the receiver flag
    is off."""
    from shards_prometheus_spark.sources import MetricsExposer

    body = _request_bytes()

    exposer = MetricsExposer(spark, SF_SMOKE, otlp_receiver=True).start()
    base = f"http://{exposer.host}:{exposer.port}"
    try:
        req = urllib.request.Request(
            base + "/api/v1/otlp/v1/metrics",
            data=gzip.compress(body),
            headers={
                "Content-Type": "application/x-protobuf",
                "Content-Encoding": "gzip",
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"] == "application/x-protobuf"

        q = quote(
            "sum by (method) (http_requests_total @ %d)"
            % (_TS_NS // 1_000_000_000)
        )
        with urllib.request.urlopen(
            base + f"/api/v1/query?query={q}", timeout=120
        ) as resp:
            res = json.loads(resp.read())["data"]["result"]
        got = {r["metric"]["method"]: float(r["value"][1]) for r in res}
        assert got == {"GET": 5.0, "POST": 2.0}

        # corrupt body → 400
        bad = urllib.request.Request(
            base + "/api/v1/otlp/v1/metrics",
            data=b"\x0a\x03ab",
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(bad, timeout=60)
        assert exc.value.code == 400
    finally:
        exposer.stop()

    # flag off: 404, exactly like the remote-write receiver
    exposer = MetricsExposer(spark, SF_SMOKE).start()
    try:
        req = urllib.request.Request(
            f"http://{exposer.host}:{exposer.port}/api/v1/otlp/v1/metrics",
            data=body,
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=60)
        assert exc.value.code == 404
    finally:
        exposer.stop()


def test_distributed_otlp_decode(spark):
    """The 100 TB path: a relation of OTLP payloads decodes via the
    Arrow-batched kernel into the same samples schema remote-write
    decode produces."""
    from pyspark.sql import functions as F

    from shards_prometheus_spark.sources.otlp import (
        decode_otlp_requests,
        encode_otlp_request,
    )

    payloads = [
        encode_otlp_request(
            [
                {
                    "name": "beat",
                    "kind": "sum",
                    "points": [({"user": str(i)}, _TS_NS, float(i))],
                }
            ]
        )
        for i in range(4)
    ]
    df = spark.createDataFrame(
        [(p,) for p in payloads], "payload binary"
    ).repartition(2)
    got = sorted(
        (r["metric"], r["label_user"], r["ts_us"], r["value"])
        for r in decode_otlp_requests(df).collect()
    )
    assert got == [
        ("beat_total", str(i), _TS_NS // 1_000, float(i))
        for i in range(4)
    ]
    # the label map carries the attribute
    row = decode_otlp_requests(df).filter(F.col("label_user") == "2").first()
    assert dict(row["labels"]) == {"user": "2"}
