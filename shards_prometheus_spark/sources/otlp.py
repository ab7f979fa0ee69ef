"""OTLP metrics ingest — the paired server's 3.x OTLP receiver.

Prometheus 3.x accepts OpenTelemetry metrics on
``POST /api/v1/otlp/v1/metrics`` (behind ``--web.enable-otlp-receiver``)
and translates them into its own data model (public translation rules:
attribute labels, ``service.name``/``service.instance.id`` promoted to
``job``/``instance``, monotonic sums suffixed ``_total``, histograms
exploded into cumulative ``_bucket``/``_sum``/``_count`` children,
summaries into quantile-labelled samples). This module is that hop on
the repo's vendored protobuf walker (functions.miniformats) — no
otel SDK, no protobuf library:

- ``parse_otlp_request``: one ``ExportMetricsServiceRequest`` body →
  the SAME ``[(labels incl. __name__, ts_ms, value)]`` triples the
  remote-write receiver stores, so OTLP rides the existing store /
  read-API path unchanged.
- ``encode_otlp_request``: the sender twin (tests; an engine-side
  OTLP exporter for round trips).
- ``decode_otlp_requests``: the distributed form — a relation of OTLP
  payload blobs decodes via Arrow-batched ``mapInPandas`` with the
  scan's parallelism (a Kafka topic of OTLP exports at 100 TB).
- ``handle_otlp_post``: the HTTP body shared by MetricsExposer
  (gzip accepted per spec, 200 + empty ``ExportMetricsServiceResponse``
  on success, 400 on a corrupt payload).

Reference anchor: the reference's pairing is a Prometheus server
scraping its exposer (prometheus.cpp:47,73); OTLP is that same paired
server's OTHER standard ingestion door in 3.x, exactly like
remote-write (sources/remote_write.py).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

from shards_prometheus_spark.functions.miniformats import (
    pb_double,
    pb_fields,
    pb_len,
    pb_varint,
)

#: The endpoint path and content type (public OTLP/HTTP binary spec).
OTLP_PATH = "/api/v1/otlp/v1/metrics"
OTLP_CONTENT_TYPE = "application/x-protobuf"

_NAME_OK = set(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_:"
)


def _sanitize(name: str) -> str:
    """Prometheus's metric/label name translation: every char outside
    the classic charset becomes '_' (the 3.x default
    UnderscoreEscaping strategy's name half)."""
    out = "".join(c if c in _NAME_OK else "_" for c in name)
    if out and out[0].isdigit():
        out = "_" + out
    return out


def _anyvalue_str(body: bytes) -> str:
    """AnyValue → its Prometheus label-value rendering (strings pass
    through; bool/int/double render canonically; nested values render
    as their wire-repr — labels are strings)."""
    for f, wt, v in pb_fields(body):
        if f == 1 and wt == 2:  # string_value
            return v.decode("utf-8")
        if f == 2 and wt == 0:  # bool_value
            return "true" if v else "false"
        if f == 3 and wt == 0:  # int_value (two's complement)
            return str(v - (1 << 64) if v >= (1 << 63) else v)
        if f == 4 and wt == 1:  # double_value
            return repr(v)
    return ""


def _attributes(body_iter) -> dict:
    """repeated KeyValue → {sanitized key: rendered value}."""
    out: dict = {}
    for kv in body_iter:
        key = value = ""
        for f, wt, v in pb_fields(kv):
            if f == 1 and wt == 2:
                key = v.decode("utf-8")
            elif f == 2 and wt == 2:
                value = _anyvalue_str(v)
        if key:
            out[_sanitize(key)] = value
    return out


def _packed_fixed64(v) -> "list[int]":
    """A packed repeated fixed64 field's raw bytes → ints (also
    accepts the single unpacked int the walker yields for wt=1)."""
    if isinstance(v, (int, float)):
        return [int(v)]
    import struct

    return [
        struct.unpack_from("<Q", v, i)[0] for i in range(0, len(v), 8)
    ]


def _packed_double(v) -> "list[float]":
    if isinstance(v, float):
        return [v]
    import struct

    return [
        struct.unpack_from("<d", v, i)[0] for i in range(0, len(v), 8)
    ]


def _number_point(body: bytes) -> "tuple[dict, int, float]":
    """NumberDataPoint → (attr labels, ts_ms, value)."""
    import struct

    attrs: list = []
    ts_ms = 0
    val = 0.0
    for f, wt, v in pb_fields(body):
        if f == 7 and wt == 2:
            attrs.append(v)
        elif f == 3 and wt == 1:  # time_unix_nano (fixed64 as double?)
            # the walker decodes wt=1 as double — recover the raw bits
            ts_ms = struct.unpack("<Q", struct.pack("<d", v))[0] // 1_000_000
        elif f == 4 and wt == 1:  # as_double
            val = float(v)
        elif f == 6 and wt == 1:  # as_int (sfixed64)
            val = float(
                struct.unpack("<q", struct.pack("<d", v))[0]
            )
    return _attributes(attrs), ts_ms, val


def _ts_ms(v: float) -> int:
    import struct

    return struct.unpack("<Q", struct.pack("<d", v))[0] // 1_000_000


def parse_otlp_request(
    payload: bytes,
    promote_resource_attributes: "list[str] | None" = None,
    promote_scope_metadata: bool = False,
    keep_identifying_resource_attributes: bool = False,
) -> "list[tuple[dict, int, float]]":
    """ExportMetricsServiceRequest → [(labels incl. __name__, ts_ms,
    value)] (rows only; see parse_otlp_request_full for the
    partial-success accounting twin)."""
    return parse_otlp_request_full(
        payload,
        promote_resource_attributes=promote_resource_attributes,
        promote_scope_metadata=promote_scope_metadata,
        keep_identifying_resource_attributes=(
            keep_identifying_resource_attributes
        ),
    )[0]


def parse_otlp_request_full(
    payload: bytes,
    convert_delta: bool = False,
    promote_resource_attributes: "list[str] | None" = None,
    promote_scope_metadata: bool = False,
    keep_identifying_resource_attributes: bool = False,
) -> "tuple[list[tuple[dict, int, float]], int, list[str], set]":
    """ExportMetricsServiceRequest → (rows, rejected_data_points,
    messages), Prometheus translation applied:

    - attributes → labels (names sanitized);
    - resource ``service.name`` → ``job``, ``service.instance.id`` →
      ``instance`` (the public promotion rules);
    - ``promote_resource_attributes`` (upstream's
      ``otlp.promote_resource_attributes`` config knob): the LISTED
      resource attributes additionally promote to labels (names
      sanitized — ``k8s.pod.name`` lands as ``k8s_pod_name``); every
      other resource attribute is dropped, upstream's default. A
      data point's OWN attribute of the same name wins the conflict
      (target_info-style label-wins resolution), and the job/instance
      promotions are never overridden;
    - monotonic Sum → ``<name>_total``; Gauge/non-monotonic Sum →
      ``<name>``;
    - Histogram → cumulative ``_bucket{le=…}`` (+Inf included) +
      ``_sum`` + ``_count``;
    - Summary → ``<name>{quantile=…}`` + ``_sum`` + ``_count``;
    - ExponentialHistogram (Metric field 10): NOT translated (the
      engine has no native-histogram store, matching the reference's
      prometheus-cpp 1.1.0 pin) — its data points are DROPPED and
      counted into ``rejected_data_points`` with a message, so the
      HTTP layer answers with an OTLP partial-success response
      instead of a silently clean 200.

    Returns (rows, rejected_data_points, messages, delta_series):
    with ``convert_delta`` (the receiver's twin of upstream's opt-in
    ``otlp.convert_delta_to_cumulative`` feature flag) DELTA Sums and
    Histograms parse instead of raising, their per-interval values
    pass through UNCONVERTED, and ``delta_series`` holds the affected
    series' sorted-label-items keys — the CALLER owns the running
    accumulation (it needs cross-request state; see
    MetricsExposer's ``otlp_convert_delta``). Without the flag,
    ``delta_series`` is always empty.

    Raises ValueError on a structurally corrupt body OR on a
    non-cumulative (delta/unspecified) Sum/Histogram temporality —
    upstream's OTLP receiver rejects non-cumulative temporality by
    default (only converts behind ``otlp.convert_delta_to_cumulative``);
    decoding delta increments as if they were running totals would
    silently corrupt every rate()/increase() over the series.
    UNSPECIFIED temporality rejects even with the flag (an invalid
    metric, per the proto)."""
    import struct

    if payload[:2] == b"\x1f\x8b":  # gzip magic — spec-permitted
        import gzip

        payload = gzip.decompress(payload)
    out: list = []
    rejected = [0]
    messages: list = []
    delta_series: set = set()
    promote = {
        _sanitize(str(a)) for a in promote_resource_attributes or []
    }
    try:
        for f, wt, rm in pb_fields(payload):
            if f != 1 or wt != 2:  # resource_metrics
                continue
            resource_labels: dict = {}
            scope_bufs: list = []
            raw: dict = {}
            for f2, wt2, v2 in pb_fields(rm):
                if f2 == 1 and wt2 == 2:  # Resource
                    attrs = [
                        v3
                        for f3, wt3, v3 in pb_fields(v2)
                        if f3 == 1 and wt3 == 2
                    ]
                    raw = _attributes(attrs)
                    if "service_name" in raw:
                        resource_labels["job"] = raw["service_name"]
                    if "service_instance_id" in raw:
                        resource_labels["instance"] = raw[
                            "service_instance_id"
                        ]
                    for want in sorted(promote):
                        # the job/instance promotions above are never
                        # overridden; data-point attributes still win
                        # over any promoted resource attr (lbl())
                        if want in raw and want not in resource_labels:
                            resource_labels[want] = raw[want]
                elif f2 == 2 and wt2 == 2:  # ScopeMetrics
                    scope_bufs.append(v2)
            n_before = len(out)
            for sm in scope_bufs:
                base_labels = resource_labels
                if promote_scope_metadata:
                    # upstream's `otlp.promote_scope_metadata` (3.x):
                    # the InstrumentationScope's name/version/
                    # schema_url and attributes land on every sample
                    # of the scope as otel_scope_* labels
                    # (data-point attributes still win — lbl())
                    scope_labels: dict = {}
                    for f2, wt2, v2 in pb_fields(sm):
                        if f2 == 1 and wt2 == 2:  # InstrumentationScope
                            for f3, wt3, v3 in pb_fields(v2):
                                if f3 == 1 and wt3 == 2:
                                    scope_labels["otel_scope_name"] = (
                                        v3.decode("utf-8")
                                    )
                                elif f3 == 2 and wt3 == 2:
                                    scope_labels[
                                        "otel_scope_version"
                                    ] = v3.decode("utf-8")
                                elif f3 == 3 and wt3 == 2:
                                    for k, v in _attributes(
                                        [v3]
                                    ).items():
                                        scope_labels[
                                            f"otel_scope_{k}"
                                        ] = v
                        elif f2 == 3 and wt2 == 2:  # schema_url
                            scope_labels[
                                "otel_scope_schema_url"
                            ] = v2.decode("utf-8")
                    if scope_labels:
                        base_labels = {
                            **resource_labels,
                            **scope_labels,
                        }
                for f2, wt2, metric in pb_fields(sm):
                    if f2 != 2 or wt2 != 2:  # Metric
                        continue
                    out.extend(
                        _parse_metric(
                            metric,
                            base_labels,
                            rejected,
                            messages,
                            convert_delta,
                            delta_series,
                        )
                    )
            # upstream's OTLP translation writes ONE `target_info`
            # series per resource carrying the NON-identifying
            # resource attributes as (sanitized) labels — the info
            # metric the 3.x info() function joins; emitted only when
            # the resource has data labels to carry (upstream's
            # condition) and samples landed, stamped at the
            # resource's newest data-point timestamp.
            # `keep_identifying_resource_attributes` (the public 3.x
            # knob) ALSO copies service.name/service.namespace/
            # service.instance.id into target_info's label set.
            identifying = {
                "service_name",
                "service_namespace",
                "service_instance_id",
            }
            data_attrs = {
                k: v
                for k, v in raw.items()
                if keep_identifying_resource_attributes
                or k not in identifying
            }
            has_nonident = any(
                k not in identifying for k in raw
            )
            if has_nonident and len(out) > n_before:
                info_labels = {"__name__": "target_info"}
                if "job" in resource_labels:
                    info_labels["job"] = resource_labels["job"]
                if "instance" in resource_labels:
                    info_labels["instance"] = resource_labels[
                        "instance"
                    ]
                for k in sorted(data_attrs):
                    if k not in ("__name__", "job", "instance"):
                        info_labels.setdefault(k, data_attrs[k])
                ts_ms = max(r[1] for r in out[n_before:])
                out.append((info_labels, ts_ms, 1.0))
    except OTLPTemporalityError:
        raise  # semantic reject, not corruption — keep the message
    except (IndexError, ValueError, struct.error) as exc:
        raise ValueError(f"corrupt OTLP payload: {exc}") from exc
    return out, rejected[0], messages, delta_series


#: AggregationTemporality enum (public OTLP proto): 0 unspecified,
#: 1 delta, 2 cumulative. Upstream Prometheus rejects non-cumulative
#: by default; so do we (ValueError → the 400 contract).
_TEMPORALITY_CUMULATIVE = 2
_TEMPORALITY_NAMES = {0: "unspecified", 1: "delta", 2: "cumulative"}


class OTLPTemporalityError(ValueError):
    """Non-cumulative temporality — semantically rejected (400), not
    a structurally corrupt payload."""


def _check_cumulative(
    temporality: int, kind: str, name: str, allow_delta: bool = False
) -> bool:
    """Returns True when the metric's points are DELTA and the caller
    opted into conversion (upstream's
    ``otlp.convert_delta_to_cumulative`` feature flag); raises for
    any non-cumulative temporality otherwise."""
    if temporality == _TEMPORALITY_CUMULATIVE:
        return False
    if allow_delta and temporality == 1:  # DELTA, conversion opted in
        return True
    raise OTLPTemporalityError(
        f"{_TEMPORALITY_NAMES.get(temporality, temporality)}"
        f"-temporality {kind} {name!r} rejected: only cumulative"
        " temporality is supported (upstream default; delta points"
        " stored as running totals would corrupt rate()/increase())"
    )


def _parse_metric(
    metric: bytes,
    resource_labels: dict,
    rejected: "list[int] | None" = None,
    messages: "list[str] | None" = None,
    convert_delta: bool = False,
    delta_series: "set | None" = None,
) -> list:
    import struct

    name = ""
    gauge = sums = hist = summ = expo = None
    monotonic = False
    for f, wt, v in pb_fields(metric):
        if f == 1 and wt == 2:
            name = _sanitize(v.decode("utf-8"))
        elif f == 5 and wt == 2:
            gauge = v
        elif f == 7 and wt == 2:
            sums = v
        elif f == 9 and wt == 2:
            hist = v
        elif f == 10 and wt == 2:
            expo = v
        elif f == 11 and wt == 2:
            summ = v
    rows: list = []
    if expo is not None:
        # ExponentialHistogram (the default histogram aggregation of
        # several OTel SDKs) translates to native histograms upstream;
        # this engine's store is classic-bucket only (the reference's
        # prometheus-cpp 1.1.0 pin has no native histograms either), so
        # the points are rejected WITH ACCOUNTING — they surface in the
        # OTLP partial-success response, never as silent data loss.
        n_points = sum(
            1 for f, wt, _ in pb_fields(expo) if f == 1 and wt == 2
        )
        if rejected is not None:
            rejected[0] += n_points
        if messages is not None:
            messages.append(
                f"exponential histogram {name!r} is not supported"
                f" ({n_points} data points dropped)"
            )

    def lbl(attrs: dict, **extra) -> dict:
        d = dict(resource_labels)
        d.update(attrs)
        d.update(extra)
        return d

    is_delta = False
    if gauge is not None or sums is not None:
        body = gauge if gauge is not None else sums
        if sums is not None:
            temporality = 0
            for f, wt, v in pb_fields(sums):
                if f == 2 and wt == 0:  # aggregation_temporality
                    temporality = v
                elif f == 3 and wt == 0:  # is_monotonic
                    monotonic = bool(v)
            is_delta = _check_cumulative(
                temporality, "sum", name, convert_delta
            )
        out_name = (
            name + "_total"
            if monotonic and not name.endswith("_total")
            else name
        )
        for f, wt, dp in pb_fields(body):
            if f != 1 or wt != 2:
                continue
            attrs, ts_ms, val = _number_point(dp)
            full = lbl(attrs, __name__=out_name)
            rows.append((full, ts_ms, val))
            if is_delta and delta_series is not None:
                delta_series.add(tuple(sorted(full.items())))
    if hist is not None:
        temporality = 0
        for f, wt, v in pb_fields(hist):
            if f == 2 and wt == 0:  # aggregation_temporality
                temporality = v
        hist_delta = _check_cumulative(
            temporality, "histogram", name, convert_delta
        )
        hist_start = len(rows)
        for f, wt, dp in pb_fields(hist):
            if f != 1 or wt != 2:
                continue
            attrs: list = []
            ts_ms = 0
            count = 0
            hsum = None
            bucket_counts: list = []
            bounds: list = []
            for f2, wt2, v2 in pb_fields(dp):
                if f2 == 9 and wt2 == 2:
                    attrs.append(v2)
                elif f2 == 3 and wt2 == 1:
                    ts_ms = _ts_ms(v2)
                elif f2 == 4 and wt2 == 1:
                    ts_ms_count = _packed_fixed64(
                        __import__("struct").pack("<d", v2)
                    )
                    count = ts_ms_count[0]
                elif f2 == 5 and wt2 == 1:
                    hsum = float(v2)
                elif f2 == 6 and wt2 == 2:
                    # bucket_counts is `repeated fixed64` in the public
                    # proto: packed = 8-byte little-endian words, NOT
                    # uvarints (a uvarint read of a real SDK payload
                    # with any count >= 128 or > 1 bucket decodes to
                    # garbage cumulative _bucket values). extend, not
                    # assign: proto3 requires CONCATENATING every
                    # occurrence of a repeated field, so a packed list
                    # split across chunks (or mixed with unpacked
                    # wt=1 entries) must accumulate
                    bucket_counts.extend(_packed_fixed64(v2))
                elif f2 == 6 and wt2 == 1:
                    # unpacked repeated fixed64 (also legal on the
                    # wire); the walker yields wt=1 as a double —
                    # recover the raw u64 bits
                    bucket_counts.append(
                        struct.unpack("<Q", struct.pack("<d", v2))[0]
                    )
                elif f2 == 7 and wt2 == 2:
                    # concatenate split packed chunks (proto3 repeated
                    # semantics), mirroring bucket_counts above
                    bounds.extend(_packed_double(v2))
                elif f2 == 7 and wt2 == 1:
                    bounds.append(float(v2))
            a = _attributes(attrs)
            base = lbl(a)
            cum = 0
            for i, b in enumerate(bounds):
                cum += bucket_counts[i] if i < len(bucket_counts) else 0
                rows.append(
                    (
                        {**base, "__name__": name + "_bucket",
                         "le": _fmt_bound(b)},
                        ts_ms,
                        float(cum),
                    )
                )
            rows.append(
                (
                    {**base, "__name__": name + "_bucket",
                     "le": "+Inf"},
                    ts_ms,
                    float(count),
                )
            )
            if hsum is not None:
                rows.append(
                    ({**base, "__name__": name + "_sum"}, ts_ms, hsum)
                )
            rows.append(
                (
                    {**base, "__name__": name + "_count"},
                    ts_ms,
                    float(count),
                )
            )
        if hist_delta and delta_series is not None:
            # every exploded child series (_bucket/_sum/_count)
            # accumulates independently — delta-to-cumulative over
            # the exploded relation is per-series running addition
            for labels, _ts, _v in rows[hist_start:]:
                delta_series.add(tuple(sorted(labels.items())))
    if summ is not None:
        for f, wt, dp in pb_fields(summ):
            if f != 1 or wt != 2:
                continue
            attrs = []
            ts_ms = 0
            count = 0
            ssum = None
            quantiles: list = []
            for f2, wt2, v2 in pb_fields(dp):
                if f2 == 7 and wt2 == 2:
                    attrs.append(v2)
                elif f2 == 3 and wt2 == 1:
                    ts_ms = _ts_ms(v2)
                elif f2 == 4 and wt2 == 1:
                    count = _packed_fixed64(
                        __import__("struct").pack("<d", v2)
                    )[0]
                elif f2 == 5 and wt2 == 1:
                    ssum = float(v2)
                elif f2 == 6 and wt2 == 2:  # ValueAtQuantile
                    q = val = 0.0
                    for f3, _wt3, v3 in pb_fields(v2):
                        if f3 == 1:
                            q = float(v3)
                        elif f3 == 2:
                            val = float(v3)
                    quantiles.append((q, val))
            a = _attributes(attrs)
            base = lbl(a)
            for q, val in quantiles:
                rows.append(
                    (
                        {**base, "__name__": name,
                         "quantile": _fmt_bound(q)},
                        ts_ms,
                        val,
                    )
                )
            if ssum is not None:
                rows.append(
                    ({**base, "__name__": name + "_sum"}, ts_ms, ssum)
                )
            rows.append(
                (
                    {**base, "__name__": name + "_count"},
                    ts_ms,
                    float(count),
                )
            )
    return rows


def _fmt_bound(b: float) -> str:
    """Bucket bound / quantile rendering: integral values drop the
    trailing .0 (Prometheus's own formatting of le/quantile)."""
    return str(int(b)) if float(b).is_integer() else repr(float(b))


# --- encoder twin (tests / engine-side exporter) --------------------------


def _kv(key: str, value: str) -> bytes:
    return pb_len(
        1, pb_len(1, key.encode()) + pb_len(2, pb_len(1, value.encode()))
    )


def _fixed64(field: int, n: int) -> bytes:
    import struct

    from shards_prometheus_spark.functions.miniformats import (
        _uvarint_encode,
    )

    return _uvarint_encode((field << 3) | 1) + struct.pack("<Q", n)


def encode_otlp_request(
    metrics: "list[dict]", resource: "dict | None" = None
) -> bytes:
    """Build one ExportMetricsServiceRequest. ``metrics`` entries:
    {name, kind: gauge|sum|histogram|summary, points: [...]} with
    point shapes
      gauge/sum:  (attrs, ts_ns, value)
      histogram:  (attrs, ts_ns, bounds, bucket_counts, sum, count)
      summary:    (attrs, ts_ns, quantiles [(q, v)], sum, count)
    ``resource``: raw attribute dict (e.g. {"service.name": "svc"})."""
    res_attrs = b"".join(
        _kv(k, v) for k, v in (resource or {}).items()
    )
    metric_bufs = []
    for m in metrics:
        name = pb_len(1, m["name"].encode())
        kind = m.get("kind", "gauge")
        if kind in ("gauge", "sum"):
            # list-accumulate + one join: a `bytes +=` loop here is
            # O(n^2) over a partition-sized point list (the sf3 wire
            # leg caught exactly that — ratio 11 at 3x data)
            dps: list = []
            for attrs, ts_ns, value in m["points"]:
                dp = (
                    b"".join(_kv_at(7, k, v) for k, v in attrs.items())
                    + _fixed64(3, ts_ns)
                    + pb_double(4, float(value))
                )
                dps.append(pb_len(1, dp))
            if kind == "sum":
                dps.append(pb_varint(2, 2))  # cumulative
                dps.append(
                    pb_varint(3, 1 if m.get("monotonic", True) else 0)
                )
                metric_bufs.append(
                    pb_len(2, name + pb_len(7, b"".join(dps)))
                )
            else:
                metric_bufs.append(
                    pb_len(2, name + pb_len(5, b"".join(dps)))
                )
        elif kind == "histogram":
            import struct

            dps = []
            for attrs, ts_ns, bounds, counts, hsum, count in m["points"]:
                dp = (
                    b"".join(_kv_at(9, k, v) for k, v in attrs.items())
                    + _fixed64(3, ts_ns)
                    + _fixed64(4, count)
                    + pb_double(5, float(hsum))
                    + pb_len(
                        6,
                        # packed repeated fixed64 per the public proto
                        # (NOT varints — a real Prometheus misreads a
                        # varint-packed payload)
                        b"".join(struct.pack("<Q", c) for c in counts),
                    )
                    + pb_len(
                        7,
                        b"".join(struct.pack("<d", b) for b in bounds),
                    )
                )
                dps.append(pb_len(1, dp))
            metric_bufs.append(
                pb_len(
                    2,
                    name
                    + pb_len(9, b"".join(dps) + pb_varint(2, 2)),
                )
            )
        elif kind == "summary":
            dps = []
            for attrs, ts_ns, quantiles, ssum, count in m["points"]:
                qbuf = b"".join(
                    pb_len(6, pb_double(1, q) + pb_double(2, v))
                    for q, v in quantiles
                )
                dp = (
                    b"".join(_kv_at(7, k, v) for k, v in attrs.items())
                    + _fixed64(3, ts_ns)
                    + _fixed64(4, count)
                    + pb_double(5, float(ssum))
                    + qbuf
                )
                dps.append(pb_len(1, dp))
            metric_bufs.append(
                pb_len(2, name + pb_len(11, b"".join(dps)))
            )
        else:  # pragma: no cover - encoder input contract
            raise ValueError(f"unknown kind {kind!r}")
    scope = pb_len(2, b"".join(metric_bufs))
    rm = (
        (pb_len(1, res_attrs) if res_attrs else b"")
        + scope
    )
    return pb_len(1, rm)


def _kv_at(field: int, key: str, value: str) -> bytes:
    return pb_len(
        field,
        pb_len(1, key.encode()) + pb_len(2, pb_len(1, value.encode())),
    )


# --- distributed decode + HTTP body ---------------------------------------


def decode_otlp_requests(
    payloads: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Distributed OTLP decode: a relation of export payloads → the
    samples relation (same schema as remote_write.decode_write_requests
    — metric from __name__, label map, ts µs). Arrow-batched
    mapInPandas; a 100 TB payload corpus decodes with the scan's
    parallelism."""
    import pandas as pd

    from shards_prometheus_spark.sources.remote_write import (
        DECODED_SCHEMA,
    )

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for raw in pdf[payload_col]:
                for labels, ts_ms, value in parse_otlp_request(
                    bytes(raw)
                ):
                    lbls = dict(labels)
                    metric = lbls.pop("__name__", "")
                    rows.append(
                        (
                            metric,
                            lbls,
                            lbls.get("user"),
                            ts_ms * 1_000,
                            value,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "metric",
                    "labels",
                    "label_user",
                    "ts_us",
                    "value",
                ],
            )

    return payloads.mapInPandas(kernel, DECODED_SCHEMA)


def encode_partial_success(rejected: int, message: str) -> bytes:
    """ExportMetricsServiceResponse with partial_success set (public
    OTLP proto: field 1 = ExportMetricsPartialSuccess
    {1: rejected_data_points int64, 2: error_message string})."""
    body = pb_varint(1, rejected) + pb_len(2, message.encode())
    return pb_len(1, body)


def handle_otlp_post(handler, receive) -> None:
    """Shared POST body for the OTLP endpoint: size cap → 413,
    corrupt payload / non-cumulative temporality → 400, internal →
    500, success → 200 with the ExportMetricsServiceResponse — empty
    on full success, carrying ``partial_success`` (rejected point
    count + message) when ``receive`` returns a non-None
    ``(rejected_data_points, error_message)`` tuple (e.g. dropped
    exponential-histogram points). The remote-write 204 does NOT
    apply here."""
    from shards_prometheus_spark.sources.remote_write import (
        MAX_WRITE_BODY_BYTES,
    )

    def _respond(code: int, body: bytes = b"", ctype: str = "text/plain"):
        handler.send_response(code)
        handler.send_header("Content-Type", ctype)
        handler.send_header("Content-Length", str(len(body)))
        handler.end_headers()
        if body:
            handler.wfile.write(body)

    n = int(handler.headers.get("Content-Length") or 0)
    if n > MAX_WRITE_BODY_BYTES:
        _respond(413, b"body exceeds the write limit")
        return
    raw = handler.rfile.read(n)
    if (handler.headers.get("Content-Encoding") or "").lower() == "gzip":
        import gzip

        try:
            raw = gzip.decompress(raw)
        except Exception:  # noqa: BLE001 - bad encoding is client error
            _respond(400, b"bad gzip body")
            return
    try:
        partial = receive(raw)
    except ValueError as exc:
        _respond(400, str(exc).encode())
    except Exception as exc:  # noqa: BLE001 - the 5xx contract
        _respond(500, str(exc).encode())
    else:
        if partial:
            rejected, message = partial
            _respond(
                200,
                encode_partial_success(int(rejected), str(message)),
                OTLP_CONTENT_TYPE,
            )
        else:
            # an empty ExportMetricsServiceResponse is zero bytes
            _respond(200, b"", OTLP_CONTENT_TYPE)


def encode_otlp_requests(samples: DataFrame) -> DataFrame:
    """Distributed encode twin: the samples relation → one
    ExportMetricsServiceRequest PER PARTITION (payload count =
    partition count, like remote_write.encode_write_requests) — each
    partition's rows grouped into per-family gauge metrics with the
    user label as the point attribute."""
    import pandas as pd

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        by_metric: dict = {}
        for pdf in batches:
            for metric, user, ts_us, value in zip(
                pdf["metric"], pdf["label_user"], pdf["ts_us"], pdf["value"]
            ):
                by_metric.setdefault(metric, []).append(
                    (
                        {"user": user} if user is not None else {},
                        int(ts_us) * 1_000,
                        float(value),
                    )
                )
        if not by_metric:
            yield pd.DataFrame({"payload": pd.Series([], dtype=object)})
            return
        metrics = [
            {"name": m, "kind": "gauge", "points": pts}
            for m, pts in sorted(by_metric.items())
        ]
        yield pd.DataFrame(
            {"payload": [encode_otlp_request(metrics)]}
        )

    return samples.select(
        "metric", "label_user", "ts_us", "value"
    ).mapInPandas(kernel, "payload binary")


def roundtrip_otlp_requests(samples: DataFrame) -> DataFrame:
    """Fused encode→decode OTLP round trip: each partition's rows
    become ONE ExportMetricsServiceRequest and are immediately parsed
    back through the Prometheus translation inside the SAME kernel —
    the identical byte path as
    `decode_otlp_requests(encode_otlp_requests(s))` with ONE
    JVM↔Python crossing per task instead of two (guide §4.2)."""
    import pandas as pd

    from shards_prometheus_spark.sources.remote_write import (
        DECODED_SCHEMA,
    )

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        by_metric: dict = {}
        for pdf in batches:
            for metric, user, ts_us, value in zip(
                pdf["metric"], pdf["label_user"], pdf["ts_us"], pdf["value"]
            ):
                by_metric.setdefault(metric, []).append(
                    (
                        {"user": user} if user is not None else {},
                        int(ts_us) * 1_000,
                        float(value),
                    )
                )
        out = []
        if by_metric:
            metrics = [
                {"name": m, "kind": "gauge", "points": pts}
                for m, pts in sorted(by_metric.items())
            ]
            payload = encode_otlp_request(metrics)
            for labels, ts_ms, value in parse_otlp_request(payload):
                lbls = dict(labels)
                metric = lbls.pop("__name__", "")
                out.append(
                    (
                        metric,
                        lbls,
                        lbls.get("user"),
                        ts_ms * 1_000,
                        value,
                    )
                )
        yield pd.DataFrame(
            out,
            columns=["metric", "labels", "label_user", "ts_us", "value"],
        )

    return samples.select(
        "metric", "label_user", "ts_us", "value"
    ).mapInPandas(kernel, DECODED_SCHEMA)


def otlp_roundtrip(spark, sf_dir: str) -> DataFrame:
    """Registered parity query: the samples relation encoded into
    OTLP export payloads (one per partition, DISTRIBUTED) and decoded
    back through the Prometheus translation, then folded per series —
    the OTLP twin of `remote_write_roundtrip`, proving the vendored
    OTLP codec preserves every (series, timestamp, value) triple
    (timestamps truncate to ms on the wire, so the fold compares at
    ms). Encode and decode run FUSED in one kernel
    (`roundtrip_otlp_requests` — same bytes, one Python worker round
    trip per task instead of two)."""
    from pyspark.sql import functions as F

    from shards_prometheus_spark.model import samples

    # payload framing scales with the core count (see
    # remote_write_roundtrip) — the decoded fold is framing-invariant
    n_payloads = max(8, spark.sparkContext.defaultParallelism)
    s = samples(spark, sf_dir).repartition(
        n_payloads, "metric", "label_user"
    )
    decoded = roundtrip_otlp_requests(s)
    return (
        decoded.groupBy("metric", "label_user")
        .agg(
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.count(F.lit(1)).alias("n_samples"),
            F.max(F.expr("ts_us div 1000")).alias("last_ts_ms"),
        )
        .orderBy("metric", "label_user")
    )


QUERIES = {"otlp_roundtrip": otlp_roundtrip}


def _otlp_roundtrip_sql() -> str:
    from shards_prometheus_spark.model import SAMPLES_CTE, dround

    return (
        f"{SAMPLES_CTE} "
        "SELECT metric, label_user, "
        + dround("SUM(value)", 4)
        + " AS sum_value, COUNT(*) AS n_samples, "
        "MAX(ts_us // 1000) AS last_ts_ms "
        "FROM samples GROUP BY metric, label_user"
    )


ORACLES = {"otlp_roundtrip": _otlp_roundtrip_sql()}
