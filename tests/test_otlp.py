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

        # delta-temporality sum → 400 AND no rows land
        from shards_prometheus_spark.functions.miniformats import (
            pb_double,
            pb_fields,
            pb_len,
            pb_varint,
        )
        from shards_prometheus_spark.sources.otlp import _fixed64

        dp = pb_len(1, _fixed64(3, _TS_NS) + pb_double(4, 9.0))
        delta = _wrap_metric(
            pb_len(1, b"delta.only")
            + pb_len(7, dp + pb_varint(2, 1) + pb_varint(3, 1))
        )
        req = urllib.request.Request(
            base + "/api/v1/otlp/v1/metrics", data=delta, method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=60)
        assert exc.value.code == 400
        assert b"temporality" in exc.value.read()
        with urllib.request.urlopen(
            base + "/api/v1/query?query=" + quote("delta_only_total"),
            timeout=120,
        ) as resp:
            assert json.loads(resp.read())["data"]["result"] == []

        # exponential histogram → 200 + partial_success accounting
        expo = pb_len(1, _fixed64(3, _TS_NS))
        req = urllib.request.Request(
            base + "/api/v1/otlp/v1/metrics",
            data=_wrap_metric(pb_len(1, b"exp.lat") + pb_len(10, expo)),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            assert resp.status == 200
            body_ps = resp.read()
        partial = next(
            v for f, wt, v in pb_fields(body_ps) if f == 1 and wt == 2
        )
        fields = {f: v for f, _wt, v in pb_fields(partial)}
        assert fields[1] == 1  # rejected_data_points
        assert b"exp_lat" in fields[2]
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


def _wrap_metric(metric: bytes) -> bytes:
    """Metric bytes → ExportMetricsServiceRequest bytes (one resource,
    one scope) — hand-built, independent of encode_otlp_request."""
    from shards_prometheus_spark.functions.miniformats import pb_len

    return pb_len(1, pb_len(2, pb_len(2, metric)))


def test_histogram_bucket_counts_are_packed_fixed64():
    """bucket_counts is `repeated fixed64` in the public OTLP proto —
    packed 8-byte little-endian words. This vector is hand-built to
    the proto spec (the shape a real OTel SDK exports), NOT produced
    by our encoder, with a count >= 128 and multiple buckets: a
    uvarint reading of these bytes decodes to garbage."""
    import struct

    from shards_prometheus_spark.functions.miniformats import (
        pb_double,
        pb_len,
        pb_varint,
    )
    from shards_prometheus_spark.sources.otlp import (
        _fixed64,
        encode_otlp_request,
        parse_otlp_request,
    )

    dp = (
        _fixed64(3, _TS_NS)
        + _fixed64(4, 531)  # count
        + pb_double(5, 123.25)  # sum
        + pb_len(6, struct.pack("<QQQ", 130, 1, 400))  # bucket_counts
        + pb_len(7, struct.pack("<dd", 0.5, 1.0))  # explicit_bounds
    )
    hist = pb_len(1, dp) + pb_varint(2, 2)  # cumulative
    metric = pb_len(1, b"lat") + pb_len(9, hist)
    rows = parse_otlp_request(_wrap_metric(metric))
    got = {
        (r[0]["__name__"], r[0].get("le", "")): r[2] for r in rows
    }
    assert got[("lat_bucket", "0.5")] == 130.0
    assert got[("lat_bucket", "1")] == 131.0  # cumulative
    assert got[("lat_bucket", "+Inf")] == 531.0
    assert got[("lat_sum", "")] == 123.25
    assert got[("lat_count", "")] == 531.0

    # the encoder twin emits the same packed-fixed64 wire form (a real
    # Prometheus misreads varint-packed counts)
    body = encode_otlp_request(
        [
            {
                "name": "lat",
                "kind": "histogram",
                "points": [({}, _TS_NS, [0.5, 1.0], [130, 1, 400],
                            123.25, 531)],
            }
        ]
    )
    assert struct.pack("<QQQ", 130, 1, 400) in body

    # unpacked repeated fixed64 is also legal on the wire
    unpacked = (
        _fixed64(3, _TS_NS)
        + _fixed64(4, 531)
        + pb_double(5, 123.25)
        + _fixed64(6, 130)
        + _fixed64(6, 1)
        + _fixed64(6, 400)
        + pb_len(7, struct.pack("<dd", 0.5, 1.0))
    )
    hist2 = pb_len(1, unpacked) + pb_varint(2, 2)
    rows2 = parse_otlp_request(
        _wrap_metric(pb_len(1, b"lat") + pb_len(9, hist2))
    )
    assert {
        (r[0]["__name__"], r[0].get("le", "")): r[2] for r in rows2
    } == got

    # roundtrip: encoder output decodes to the identical cumulative rows
    assert {
        (r[0]["__name__"], r[0].get("le", "")): r[2]
        for r in parse_otlp_request(body)
    } == got


def test_packed_repeated_chunks_concatenate():
    """proto3: EVERY occurrence of a repeated field concatenates — a
    packed list split across several length-delimited chunks (or
    mixed with unpacked wt=1 entries) is legal on the wire and must
    decode identically to the single-chunk form. Hand-built vectors;
    an assigning (rather than extending) decoder keeps only the last
    chunk."""
    import struct

    from shards_prometheus_spark.functions.miniformats import (
        pb_double,
        pb_len,
        pb_varint,
    )
    from shards_prometheus_spark.sources.otlp import (
        _fixed64,
        parse_otlp_request,
    )

    def decode(dp: bytes) -> dict:
        hist = pb_len(1, dp) + pb_varint(2, 2)  # cumulative
        metric = pb_len(1, b"lat") + pb_len(9, hist)
        rows = parse_otlp_request(_wrap_metric(metric))
        return {
            (r[0]["__name__"], r[0].get("le", "")): r[2] for r in rows
        }

    single = decode(
        _fixed64(3, _TS_NS)
        + _fixed64(4, 531)
        + pb_double(5, 123.25)
        + pb_len(6, struct.pack("<QQQ", 130, 1, 400))
        + pb_len(7, struct.pack("<dd", 0.5, 1.0))
    )
    assert single[("lat_bucket", "1")] == 131.0  # sanity: cumulative

    # bucket_counts split into two packed chunks; bounds likewise
    split = decode(
        _fixed64(3, _TS_NS)
        + _fixed64(4, 531)
        + pb_double(5, 123.25)
        + pb_len(6, struct.pack("<QQ", 130, 1))
        + pb_len(6, struct.pack("<Q", 400))
        + pb_len(7, struct.pack("<d", 0.5))
        + pb_len(7, struct.pack("<d", 1.0))
    )
    assert split == single

    # mixed: an unpacked wt=1 entry BEFORE a packed chunk must not be
    # discarded by it (and an unpacked bound appends too)
    mixed = decode(
        _fixed64(3, _TS_NS)
        + _fixed64(4, 531)
        + pb_double(5, 123.25)
        + _fixed64(6, 130)
        + pb_len(6, struct.pack("<QQ", 1, 400))
        + pb_len(7, struct.pack("<d", 0.5))
        + _fixed64_double(7, 1.0)
    )
    assert mixed == single


def _fixed64_double(field: int, v: float) -> bytes:
    """An unpacked wt=1 occurrence of a double-typed repeated field
    (explicit_bounds), built to the spec for the mixed-encoding test:
    the tag byte (field << 3 | wiretype 1) then 8 LE payload bytes."""
    import struct

    return bytes([(field << 3) | 1]) + struct.pack("<d", v)


def test_delta_temporality_rejected():
    """Upstream's OTLP receiver rejects non-cumulative temporality by
    default — a delta sum/histogram stored as running totals silently
    corrupts rate()/increase(). ValueError = the 400 contract."""
    import struct

    from shards_prometheus_spark.functions.miniformats import (
        pb_double,
        pb_len,
        pb_varint,
    )
    from shards_prometheus_spark.sources.otlp import (
        _fixed64,
        parse_otlp_request,
        parse_otlp_request_full,
    )

    dp = pb_len(1, _fixed64(3, _TS_NS) + pb_double(4, 5.0))
    # delta (1) sum
    delta_sum = dp + pb_varint(2, 1) + pb_varint(3, 1)
    with pytest.raises(ValueError, match="delta.*temporality|temporality"):
        parse_otlp_request(
            _wrap_metric(pb_len(1, b"reqs") + pb_len(7, delta_sum))
        )
    # unspecified (0, the proto3 default when absent) also rejects
    unspec_sum = dp + pb_varint(3, 1)
    with pytest.raises(ValueError):
        parse_otlp_request(
            _wrap_metric(pb_len(1, b"reqs") + pb_len(7, unspec_sum))
        )
    # delta histogram
    hdp = pb_len(
        1,
        _fixed64(3, _TS_NS)
        + _fixed64(4, 3)
        + pb_len(6, struct.pack("<QQ", 2, 1))
        + pb_len(7, struct.pack("<d", 0.5)),
    )
    with pytest.raises(ValueError):
        parse_otlp_request(
            _wrap_metric(
                pb_len(1, b"lat") + pb_len(9, hdp + pb_varint(2, 1))
            )
        )
    # cumulative (2) passes and no points are rejected
    ok_sum = dp + pb_varint(2, 2) + pb_varint(3, 1)
    rows, rejected, msgs, deltas = parse_otlp_request_full(
        _wrap_metric(pb_len(1, b"reqs") + pb_len(7, ok_sum))
    )
    assert [r[2] for r in rows] == [5.0] and rejected == 0 and not msgs
    assert deltas == set()


def _delta_sum_request(name: bytes, points):
    """Hand-built DELTA-temporality monotonic Sum request:
    points = [(ts_ns, value)]."""
    from shards_prometheus_spark.functions.miniformats import (
        pb_double,
        pb_len,
        pb_varint,
    )
    from shards_prometheus_spark.sources.otlp import _fixed64

    dps = b"".join(
        pb_len(1, _fixed64(3, ts) + pb_double(4, v))
        for ts, v in points
    )
    body = dps + pb_varint(2, 1) + pb_varint(3, 1)  # delta, monotonic
    return _wrap_metric(pb_len(1, name) + pb_len(7, body))


def test_convert_delta_flag_accumulates(spark):
    """Upstream's opt-in `otlp.convert_delta_to_cumulative`: with the
    exposer's otlp_convert_delta flag, delta sums parse and accumulate
    onto per-series running totals ACROSS requests (in timestamp
    order within one), so the stored samples are cumulative; the
    default exposer still answers 400."""
    import json
    import urllib.request
    from urllib.parse import quote

    from shards_prometheus_spark.sources import MetricsExposer
    from shards_prometheus_spark.sources.otlp import (
        parse_otlp_request_full,
    )

    # unit: the parser surfaces the delta series instead of raising
    req1 = _delta_sum_request(
        b"d.reqs", [(_TS_NS, 5.0), (_TS_NS + 1_000_000_000, 3.0)]
    )
    rows, rejected, msgs, deltas = parse_otlp_request_full(
        req1, convert_delta=True
    )
    assert [r[2] for r in rows] == [5.0, 3.0] and rejected == 0
    assert len(deltas) == 1

    exposer = MetricsExposer(
        spark, SF_SMOKE, otlp_receiver=True, otlp_convert_delta=True
    ).start()
    base = f"http://{exposer.host}:{exposer.port}"
    try:
        def post(body):
            r = urllib.request.Request(
                base + "/api/v1/otlp/v1/metrics",
                data=body,
                headers={"Content-Type": "application/x-protobuf"},
                method="POST",
            )
            with urllib.request.urlopen(r, timeout=60) as resp:
                assert resp.status == 200

        post(req1)
        # second request: another +2 on the same series
        post(
            _delta_sum_request(
                b"d.reqs", [(_TS_NS + 2_000_000_000, 2.0)]
            )
        )
        # the stored series is cumulative: 5, 8, 10
        q = quote(
            "d_reqs_total[1h] @ %d" % (_TS_NS // 1_000_000_000 + 2)
        )
        with urllib.request.urlopen(
            base + f"/api/v1/query?query={q}", timeout=120
        ) as resp:
            res = json.loads(resp.read())["data"]["result"]
        assert len(res) == 1
        assert [float(v) for _t, v in res[0]["values"]] == [
            5.0, 8.0, 10.0
        ]
    finally:
        exposer.stop()


def test_delta_accumulation_rejects_out_of_order(spark):
    """Cross-request ordering guard on the opt-in delta conversion: a
    replayed/late delta point (timestamp at-or-before the series'
    last accumulated stamp) is DROPPED, never folded — an
    out-of-order collector replay must not corrupt the running
    cumulative total (upstream's deltatocumulative start-timestamp
    tracking)."""
    from shards_prometheus_spark.sources import MetricsExposer

    ex = MetricsExposer(
        spark, SF_SMOKE, otlp_receiver=True, otlp_convert_delta=True
    )
    try:
        labels = {"__name__": "d_total"}
        k = tuple(sorted(labels.items()))
        out1 = ex._accumulate_otlp_deltas(
            [(labels, 1000, 5.0), (labels, 2000, 3.0)], {k}
        )
        assert [(t, v) for _l, t, v in out1] == [
            (1000, 5.0), (2000, 8.0),
        ]
        # second request replays ts=1500 (late) alongside a fresh
        # point: the late one is rejected, the fresh one accumulates
        # onto the UNCORRUPTED total
        out2 = ex._accumulate_otlp_deltas(
            [(labels, 1500, 7.0), (labels, 3000, 2.0)], {k}
        )
        assert [(t, v) for _l, t, v in out2] == [(3000, 10.0)]
        # non-delta series pass through untouched regardless of order
        out3 = ex._accumulate_otlp_deltas(
            [(labels, 100, 1.0)], set()
        )
        assert [(t, v) for _l, t, v in out3] == [(100, 1.0)]
    finally:
        ex._server.server_close()  # never start()ed: close the socket


def test_exponential_histogram_partial_success():
    """Metric field 10 (ExponentialHistogram — the default histogram
    aggregation of several OTel SDKs) has no classic-bucket store to
    land in: its points are dropped WITH ACCOUNTING (rejected count +
    message for the OTLP partial-success response), never silently."""
    from shards_prometheus_spark.functions.miniformats import (
        pb_double,
        pb_len,
    )
    from shards_prometheus_spark.sources.otlp import (
        _fixed64,
        parse_otlp_request_full,
    )

    # two exponential-histogram data points (minimal: just timestamps)
    expo = pb_len(1, _fixed64(3, _TS_NS)) + pb_len(
        1, _fixed64(3, _TS_NS + 1)
    )
    gauge_dp = pb_len(1, _fixed64(3, _TS_NS) + pb_double(4, 7.5))
    # one scope carrying both metrics: the rejected one and a live gauge
    scope = pb_len(2, pb_len(1, b"exp_lat") + pb_len(10, expo)) + pb_len(
        2, pb_len(1, b"depth") + pb_len(5, gauge_dp)
    )
    req = pb_len(1, pb_len(2, scope))
    rows, rejected, msgs, _deltas = parse_otlp_request_full(req)
    # the gauge still lands; the exponential points are counted out
    assert [(r[0]["__name__"], r[2]) for r in rows] == [("depth", 7.5)]
    assert rejected == 2
    assert any("exp_lat" in m and "2 data points" in m for m in msgs)


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


def test_promote_resource_attributes(spark):
    """Upstream's `otlp.promote_resource_attributes` config knob:
    LISTED resource attributes promote to (sanitized) labels; every
    other resource attribute is still dropped; a data point's own
    attribute of the same name wins the conflict (target_info-style
    label-wins); the job/instance promotions are never overridden.
    Pinned at the parser AND through the exposer's HTTP receiver +
    read API."""
    import json
    import urllib.request
    from urllib.parse import quote

    from shards_prometheus_spark.functions.miniformats import (
        pb_double,
        pb_len,
    )
    from shards_prometheus_spark.sources import MetricsExposer
    from shards_prometheus_spark.sources.otlp import (
        _fixed64,
        parse_otlp_request,
    )

    def kv(key: bytes, val: bytes) -> bytes:
        return pb_len(1, key) + pb_len(2, pb_len(1, val))

    # Resource{repeated KeyValue attributes=1}: one field-1 entry
    # PER KeyValue (concatenating them into one would be malformed)
    resource = pb_len(
        1,
        pb_len(1, kv(b"service.name", b"checkout"))
        + pb_len(1, kv(b"k8s.pod.name", b"pod-7"))
        + pb_len(1, kv(b"deployment.environment", b"prod"))
        + pb_len(1, kv(b"drop.me", b"x")),
    )
    # two gauge points: one bare, one carrying its OWN k8s_pod_name
    dp_bare = pb_len(
        1, _fixed64(3, _TS_NS) + pb_double(4, 1.0)
    )
    dp_own = pb_len(
        1,
        _fixed64(3, _TS_NS)
        + pb_double(4, 2.0)
        + pb_len(7, kv(b"k8s_pod_name", b"point-wins")),
    )
    metric = pb_len(1, b"promo.gauge") + pb_len(5, dp_bare + dp_own)
    body = pb_len(1, resource + pb_len(2, pb_len(2, metric)))

    # parser level
    rows = parse_otlp_request(
        body,
        promote_resource_attributes=[
            "k8s.pod.name", "deployment.environment",
        ],
    )
    by_val = {
        r[2]: r[0]
        for r in rows
        if r[0].get("__name__") != "target_info"  # r15: emitted too
    }
    assert by_val[1.0]["k8s_pod_name"] == "pod-7"
    assert by_val[1.0]["deployment_environment"] == "prod"
    assert by_val[1.0]["job"] == "checkout"
    assert "drop_me" not in by_val[1.0]  # unlisted attrs still drop
    assert by_val[2.0]["k8s_pod_name"] == "point-wins"  # label-wins

    # without the knob: only job/instance promote (upstream default)
    bare = parse_otlp_request(body)
    assert "k8s_pod_name" not in bare[0][0]

    # end to end: the exposer flag → queryable labels
    ex = MetricsExposer(
        spark,
        SF_SMOKE,
        otlp_receiver=True,
        otlp_promote_resource_attributes=["k8s.pod.name"],
    ).start()
    base = f"http://{ex.host}:{ex.port}"
    try:
        req = urllib.request.Request(
            base + "/api/v1/otlp/v1/metrics",
            data=body,
            headers={"Content-Type": "application/x-protobuf"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            assert resp.status == 200
        q = quote('promo_gauge{k8s_pod_name="pod-7"}')
        ts = _TS_NS // 1_000_000_000
        with urllib.request.urlopen(
            base + f"/api/v1/query?query={q}&time={ts}", timeout=120
        ) as resp:
            res = json.loads(resp.read())["data"]["result"]
        assert len(res) == 1
        assert res[0]["metric"]["k8s_pod_name"] == "pod-7"
        assert float(res[0]["value"][1]) == 1.0
    finally:
        ex.stop()


def test_promote_scope_metadata():
    """Upstream's `otlp.promote_scope_metadata` (3.x): the
    InstrumentationScope's name/version/schema_url and attributes
    land as otel_scope_* labels on every sample of that scope; off
    by default; a second scope in the same resource keeps its own
    labels."""
    from shards_prometheus_spark.functions.miniformats import (
        pb_double,
        pb_len,
    )
    from shards_prometheus_spark.sources.otlp import (
        _fixed64,
        parse_otlp_request,
    )

    def kv(key: bytes, val: bytes) -> bytes:
        return pb_len(1, key) + pb_len(2, pb_len(1, val))

    resource = pb_len(1, pb_len(1, kv(b"service.name", b"checkout")))
    dp = pb_len(1, _fixed64(3, _TS_NS) + pb_double(4, 1.0))
    metric_a = pb_len(1, b"scoped.gauge") + pb_len(5, dp)
    dp_b = pb_len(1, _fixed64(3, _TS_NS) + pb_double(4, 2.0))
    metric_b = pb_len(1, b"other.gauge") + pb_len(5, dp_b)
    scope = (
        pb_len(1, b"my.instrumentation.lib")
        + pb_len(2, b"1.2.3")
        + pb_len(3, kv(b"feature.flag", b"on"))
    )
    sm_a = (
        pb_len(1, scope)
        + pb_len(2, metric_a)
        + pb_len(3, b"https://example/schema")
    )
    sm_b = pb_len(2, metric_b)  # scope-less ScopeMetrics
    body = pb_len(1, resource + pb_len(2, sm_a) + pb_len(2, sm_b))

    rows = parse_otlp_request(body, promote_scope_metadata=True)
    by_val = {r[2]: r[0] for r in rows}
    a = by_val[1.0]
    assert a["otel_scope_name"] == "my.instrumentation.lib"
    assert a["otel_scope_version"] == "1.2.3"
    assert a["otel_scope_schema_url"] == "https://example/schema"
    assert a["otel_scope_feature_flag"] == "on"
    assert a["job"] == "checkout"  # resource promotion unaffected
    b = by_val[2.0]
    assert not any(k.startswith("otel_scope") for k in b)

    # off by default
    rows = parse_otlp_request(body)
    assert not any(
        k.startswith("otel_scope") for r in rows for k in r[0]
    )


def test_target_info_emitted_from_resource_attributes():
    """Upstream's OTLP translation writes ONE `target_info` series
    per resource carrying the non-identifying resource attributes —
    the info metric info() joins. Emitted only when the resource has
    non-identifying attributes; stamped at the resource's newest
    data-point timestamp; `keep_identifying_resource_attributes`
    also copies the service.* identity into its label set."""
    from shards_prometheus_spark.functions.miniformats import (
        pb_double,
        pb_len,
    )
    from shards_prometheus_spark.sources.otlp import (
        _fixed64,
        parse_otlp_request,
    )

    def kv(key: bytes, val: bytes) -> bytes:
        return pb_len(1, key) + pb_len(2, pb_len(1, val))

    resource = pb_len(
        1,
        pb_len(1, kv(b"service.name", b"checkout"))
        + pb_len(1, kv(b"service.instance.id", b"pod-1"))
        + pb_len(1, kv(b"k8s.cluster.name", b"east"))
        + pb_len(1, kv(b"deployment.environment", b"prod")),
    )
    dp1 = pb_len(1, _fixed64(3, _TS_NS) + pb_double(4, 1.0))
    dp2 = pb_len(
        1, _fixed64(3, _TS_NS + 60_000_000_000) + pb_double(4, 2.0)
    )
    metric = pb_len(1, b"g") + pb_len(5, dp1 + dp2)
    body = pb_len(1, resource + pb_len(2, pb_len(2, metric)))

    rows = parse_otlp_request(body)
    infos = [r for r in rows if r[0].get("__name__") == "target_info"]
    assert len(infos) == 1
    labels, ts_ms, value = infos[0]
    assert value == 1.0
    assert ts_ms == (_TS_NS + 60_000_000_000) // 1_000_000  # newest dp
    assert labels == {
        "__name__": "target_info",
        "job": "checkout",
        "instance": "pod-1",
        "k8s_cluster_name": "east",
        "deployment_environment": "prod",
    }

    # keep_identifying: the service.* identity ALSO lands in the set
    rows = parse_otlp_request(
        body, keep_identifying_resource_attributes=True
    )
    (info,) = [
        r for r in rows if r[0].get("__name__") == "target_info"
    ]
    assert info[0]["service_name"] == "checkout"
    assert info[0]["service_instance_id"] == "pod-1"

    # a resource with ONLY identifying attributes emits no target_info
    resource2 = pb_len(1, pb_len(1, kv(b"service.name", b"bare")))
    body2 = pb_len(1, resource2 + pb_len(2, pb_len(2, metric)))
    rows = parse_otlp_request(body2)
    assert not any(
        r[0].get("__name__") == "target_info" for r in rows
    )


def test_otlp_target_info_feeds_promql_info(spark):
    """The round-trip the 3.x pairing exists for: an OTLP payload
    with resource attributes lands target_info in the pushed store,
    and a PromQL `info()` query through the READ API joins those
    data labels onto the pushed metric."""
    import json
    import urllib.request
    from urllib.parse import quote

    from shards_prometheus_spark.functions.miniformats import (
        pb_double,
        pb_len,
    )
    from shards_prometheus_spark.sources import MetricsExposer
    from shards_prometheus_spark.sources.otlp import _fixed64

    def kv(key: bytes, val: bytes) -> bytes:
        return pb_len(1, key) + pb_len(2, pb_len(1, val))

    resource = pb_len(
        1,
        pb_len(1, kv(b"service.name", b"checkout"))
        + pb_len(1, kv(b"service.instance.id", b"pod-1"))
        + pb_len(1, kv(b"k8s.cluster.name", b"east")),
    )
    dp = pb_len(1, _fixed64(3, _TS_NS) + pb_double(4, 7.5))
    metric = pb_len(1, b"queue.depth") + pb_len(5, dp)
    body = pb_len(1, resource + pb_len(2, pb_len(2, metric)))

    exposer = MetricsExposer(spark, SF_SMOKE, otlp_receiver=True).start()
    base = f"http://{exposer.host}:{exposer.port}"
    try:
        req = urllib.request.Request(
            base + "/api/v1/otlp/v1/metrics",
            data=body,
            headers={"Content-Type": "application/x-protobuf"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            assert resp.status == 200

        q = quote("info(queue_depth)")
        t = _TS_NS // 1_000_000_000  # pin eval time to the push
        with urllib.request.urlopen(
            base + f"/api/v1/query?query={q}&time={t}", timeout=120
        ) as resp:
            doc = json.loads(resp.read())
        assert doc["status"] == "success"
        (r,) = doc["data"]["result"]
        assert float(r["value"][1]) == 7.5
        assert r["metric"]["job"] == "checkout"
        assert r["metric"]["instance"] == "pod-1"
        assert r["metric"]["k8s_cluster_name"] == "east"  # joined
    finally:
        exposer.stop()


def test_otlp_config_section_adopted(spark):
    """The prometheus.yml top-level `otlp:` section drives the
    receiver's translation knobs; an explicit constructor flag wins."""
    from shards_prometheus_spark.sources import MetricsExposer
    from shards_prometheus_spark.sources.scrape_config import (
        load_scrape_configs,
    )

    yml = """
otlp:
  promote_resource_attributes: [k8s.pod.name]
  keep_identifying_resource_attributes: true
  promote_scope_metadata: true
scrape_configs: []
"""
    cfg = load_scrape_configs(yml)
    assert cfg.otlp == {
        "promote_resource_attributes": ["k8s.pod.name"],
        "keep_identifying_resource_attributes": True,
        "promote_scope_metadata": True,
    }
    exposer = MetricsExposer(
        spark, SF_SMOKE, otlp_receiver=True, scrape_config=yml
    )
    assert exposer._otlp_promote == ["k8s.pod.name"]
    assert exposer._otlp_promote_scope is True
    assert exposer._otlp_keep_identifying is True

    # explicit constructor flag wins over the config section
    exposer = MetricsExposer(
        spark,
        SF_SMOKE,
        otlp_receiver=True,
        scrape_config=yml,
        otlp_promote_resource_attributes=["deployment.environment"],
    )
    assert exposer._otlp_promote == ["deployment.environment"]

    # no otlp section -> everything stays off
    cfg = load_scrape_configs("scrape_configs: []")
    assert cfg.otlp == {}
