"""Prometheus remote-read — the pull wire twin of remote-write.

The paired server's `/api/v1/read` endpoint (the reference's exposer
is HTTP pull at the TEXT layer, prometheus.cpp:47,73,80; remote-read
is the same pairing at the WIRE layer): an HTTP POST of a
snappy-compressed protobuf ``ReadRequest`` answered with a
snappy-compressed ``ReadResponse``. Public message shapes:

- ``ReadRequest{repeated Query queries = 1}``
- ``Query{int64 start_timestamp_ms = 1, int64 end_timestamp_ms = 2,
  repeated LabelMatcher matchers = 3}``
- ``LabelMatcher{Type type = 1 (EQ/NEQ/RE/NRE), string name = 2,
  string value = 3}``
- ``ReadResponse{repeated QueryResult results = 1}`` where
  ``QueryResult{repeated TimeSeries timeseries = 1}`` reuses
  remote-write's ``TimeSeries{Label labels = 1, Sample samples = 2}``.

Layering mirrors sources/remote_write.py: pure wire codecs (built on
functions.miniformats' varint/field walker + snappy block codec, no
protobuf library), a DECLARATIVE matcher→DataFrame compiler (the
selection is one filtered scan — time range and equality matchers
push down to the parquet reader; regex matchers share
`apply_matchers`' anchored-RE2 semantics with every other selector),
and the HTTP hop on MetricsExposer. The response collect is
response-sized by contract and guard-capped like every other read
endpoint (a plan-level CollectLimit probe, never an unbounded
driver materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shards_prometheus_spark.functions.labelset import apply_matchers
from shards_prometheus_spark.functions.miniformats import (
    _u_to_int64,
    pb_double,
    pb_fields,
    pb_len,
    pb_varint,
    snappy_compress,
    snappy_decompress,
)

#: LabelMatcher.Type enum order on the wire: EQ=0 NEQ=1 RE=2 NRE=3.
MATCHER_OPS = ["=", "!=", "=~", "!~"]

#: Default plan-level cap on rows one remote-read query may collect —
#: the same role as the read API's max_samples guard.
DEFAULT_READ_LIMIT = 1_000_000

#: Per-frame byte budget for the streamed response (upstream's
#: --storage.remote.read-max-bytes-in-frame default, 1 MiB).
DEFAULT_MAX_BYTES_IN_FRAME = 1_048_576


# --- wire codecs ----------------------------------------------------------


def encode_read_request(
    queries: "list[tuple[int, int, list[tuple[str, str, str]]]]",
    compress: bool = True,
    accepted_response_types: "list[int] | None" = None,
) -> bytes:
    """[(start_ms, end_ms, [(name, op, value)])] → one ReadRequest.
    ``accepted_response_types`` (ReadRequest field 2, packed enum) is
    the client's preference order — [STREAMED_XOR_CHUNKS] asks for the
    chunked-frame stream; absent/empty means SAMPLES per the proto3
    default."""
    out = []
    for start_ms, end_ms, matchers in queries:
        body = pb_varint(1, int(start_ms)) + pb_varint(2, int(end_ms))
        for name, op, value in matchers:
            m = (
                pb_varint(1, MATCHER_OPS.index(op))
                + pb_len(2, name.encode("utf-8"))
                + pb_len(3, value.encode("utf-8"))
            )
            body += pb_len(3, m)
        out.append(pb_len(1, body))
    body = b"".join(out)
    if accepted_response_types:
        from shards_prometheus_spark.functions.miniformats import (
            _uvarint_encode,
        )

        body += pb_len(
            2,
            b"".join(_uvarint_encode(t) for t in accepted_response_types),
        )
    return snappy_compress(body) if compress else body


def parse_read_request(
    payload: bytes, compressed: bool = True
) -> "list[tuple[int, int, list[tuple[str, str, str]]]]":
    """One ReadRequest → [(start_ms, end_ms, matchers)]. Unknown
    fields skipped per proto semantics; a malformed matcher type or
    truncated body raises ValueError (the 400 contract)."""
    return parse_read_request_full(payload, compressed)[0]


def parse_read_request_full(
    payload: bytes, compressed: bool = True
) -> "tuple[list[tuple[int, int, list[tuple[str, str, str]]]], list[int]]":
    """One ReadRequest → ([(start_ms, end_ms, matchers)],
    accepted_response_types). Field 2 is a repeated packed enum;
    both packed and unpacked spellings are accepted per proto3
    (mirroring the r14 packed-fixed64 lesson: concatenate every
    occurrence, never overwrite)."""
    body = snappy_decompress(payload) if compressed else payload
    queries = []
    accepted: "list[int]" = []
    for field, wt, qbytes in pb_fields(body):
        if field == 2:  # ReadRequest.accepted_response_types
            if wt == 0:
                accepted.append(int(qbytes))
            elif wt == 2:
                from shards_prometheus_spark.functions.miniformats import (
                    _uvarint_decode,
                )

                pos = 0
                while pos < len(qbytes):
                    v, pos = _uvarint_decode(qbytes, pos)
                    accepted.append(v)
            continue
        if field != 1 or wt != 2:  # ReadRequest.queries
            continue
        start_ms = end_ms = 0
        matchers: list[tuple[str, str, str]] = []
        for f2, wt2, v2 in pb_fields(qbytes):
            if f2 == 1 and wt2 == 0:
                start_ms = _u_to_int64(v2)
            elif f2 == 2 and wt2 == 0:
                end_ms = _u_to_int64(v2)
            elif f2 == 3 and wt2 == 2:  # Query.matchers
                mtype, name, value = 0, "", ""
                for f3, _wt3, v3 in pb_fields(v2):
                    if f3 == 1:
                        mtype = v3
                    elif f3 == 2:
                        name = v3.decode("utf-8")
                    elif f3 == 3:
                        value = v3.decode("utf-8")
                if not 0 <= mtype < len(MATCHER_OPS):
                    raise ValueError(
                        f"remote-read: unknown matcher type {mtype}"
                    )
                matchers.append((name, MATCHER_OPS[mtype], value))
        queries.append((start_ms, end_ms, matchers))
    return queries, accepted


def encode_read_response(
    results: "list[list[tuple[dict, list[tuple[int, float]]]]]",
    compress: bool = True,
) -> bytes:
    """Per query: [(labels incl. __name__, [(ts_ms, value)])] → one
    ReadResponse. Reuses remote-write's TimeSeries shape."""
    res = []
    for series_list in results:
        ts_msgs = []
        for labels, samples in series_list:
            body = b"".join(
                pb_len(
                    1,
                    pb_len(1, k.encode("utf-8"))
                    + pb_len(2, v.encode("utf-8")),
                )
                for k, v in sorted(labels.items())
            ) + b"".join(
                pb_len(2, pb_double(1, val) + pb_varint(2, ts_ms))
                for ts_ms, val in samples
            )
            ts_msgs.append(pb_len(1, body))
        res.append(pb_len(1, b"".join(ts_msgs)))
    body = b"".join(res)
    return snappy_compress(body) if compress else body


def parse_read_response(
    payload: bytes, compressed: bool = True
) -> "list[list[tuple[dict, list[tuple[int, float]]]]]":
    """One ReadResponse → per query: [(labels, [(ts_ms, value)])]."""
    body = snappy_decompress(payload) if compressed else payload
    results = []
    for field, wt, rbytes in pb_fields(body):
        if field != 1 or wt != 2:  # ReadResponse.results
            continue
        series_list = []
        for f2, wt2, tsb in pb_fields(rbytes):
            if f2 != 1 or wt2 != 2:  # QueryResult.timeseries
                continue
            labels: dict = {}
            samples: list[tuple[int, float]] = []
            for f3, wt3, v3 in pb_fields(tsb):
                if f3 == 1 and wt3 == 2:  # labels
                    name = value = ""
                    for f4, _wt4, v4 in pb_fields(v3):
                        if f4 == 1:
                            name = v4.decode("utf-8")
                        elif f4 == 2:
                            value = v4.decode("utf-8")
                    labels[name] = value
                elif f3 == 2 and wt3 == 2:  # samples
                    val, ts_ms = float("nan"), 0
                    for f4, _wt4, v4 in pb_fields(v3):
                        if f4 == 1:
                            val = v4
                        elif f4 == 2:
                            ts_ms = _u_to_int64(v4)
                    samples.append((ts_ms, val))
            series_list.append((labels, samples))
        results.append(series_list)
    return results


# --- query execution ------------------------------------------------------


def read_query_frame(
    samples: DataFrame,
    start_ms: int,
    end_ms: int,
    matchers: "list[tuple[str, str, str]]",
) -> DataFrame:
    """One remote-read Query as a declarative selection over the §1.2
    samples relation: closed time range [start_ms, end_ms] (upstream's
    remote-read bounds are inclusive) plus the four matcher ops.
    ``__name__`` matchers compile against the metric column (equality
    pushes down to the parquet scan); everything else shares
    `apply_matchers`' anchored-regex semantics. One scan, zero
    shuffles — ordering/grouping into series happens at the
    response-sized edge."""
    df = samples.filter(
        (F.col("ts_us") >= F.lit(int(start_ms) * 1_000))
        & (F.col("ts_us") <= F.lit(int(end_ms) * 1_000))
    )
    for name, op, value in matchers:
        if name != "__name__":
            continue
        col = F.col("metric")
        anchored = f"(?d)^(?:{value})\\z"
        if op == "=":
            df = df.filter(col == value)
        elif op == "!=":
            df = df.filter(col != value)
        elif op == "=~":
            df = df.filter(col.rlike(anchored))
        else:
            df = df.filter(~col.rlike(anchored))
    return apply_matchers(
        df, [m for m in matchers if m[0] != "__name__"]
    )


def answer_read_request(
    samples: DataFrame,
    payload: bytes,
    max_rows: int | None = DEFAULT_READ_LIMIT,
) -> bytes:
    """Decode a ReadRequest payload, answer every query off the
    samples relation, encode the ReadResponse. The per-query collect
    is LIMIT-probed in the plan (CollectLimit — executors stop
    producing past the cap) and overflow raises ValueError → the
    endpoint's 400, never an unbounded driver materialization."""
    queries = parse_read_request(payload)
    results = []
    for start_ms, end_ms, matchers in queries:
        df = read_query_frame(samples, start_ms, end_ms, matchers).select(
            "metric",
            "labels",
            F.expr("(ts_us - pmod(ts_us, 1000)) div 1000").alias("ts_ms"),
            F.col("value").cast("double").alias("value"),
        )
        probe = df if max_rows is None else df.limit(max_rows + 1)
        rows = probe.collect()
        if max_rows is not None and len(rows) > max_rows:
            raise ValueError(
                f"remote-read query matches more than {max_rows} samples"
            )
        by_series: dict = {}
        for r in rows:
            labels = dict(r["labels"] or {})
            labels["__name__"] = r["metric"]
            key = tuple(sorted(labels.items()))
            by_series.setdefault(key, []).append(
                (r["ts_ms"], r["value"])
            )
        series_list = [
            (dict(key), sorted(samples_))
            for key, samples_ in sorted(by_series.items())
        ]
        results.append(series_list)
    return encode_read_response(results)


# --- streamed XOR-chunk response (negotiated response type 2) ---------------


def _xor_chunk_rows(df: DataFrame) -> DataFrame:
    """Per-series Gorilla XOR chunk encode as an Arrow-batched grouped
    kernel (chunkenc.py is the pure codec): one group per series,
    ≤120 samples per chunk (the TSDB head-chunk bound the streamed
    read re-serves). The bit-packing runs EXECUTOR-side with the scan's
    parallelism; the driver later collects only chunk-sized rows
    (≈ samples/120 plus one per series), never raw samples — the same
    wire-sized-collect posture as every other endpoint.

    Input: metric/labels/ts_ms/value. Output: one row per chunk with
    the full label set (incl. ``__name__``) as JSON.

    Shape note (measured, sf1 wire leg): a metric corpus has MANY
    short series — per-GROUP applyInPandas paid ~2 ms of pandas
    per-group overhead on ~2-sample groups (84 s for 44 k series).
    The kernel is therefore mapInPandas over partitions REPARTITIONED
    BY series AND SORTED by (series, ts): consecutive-key grouping in
    plain Python costs ~1 µs/row, one pandas frame per ARROW BATCH
    instead of per series, and an incomplete tail group carries
    across batch boundaries (safe — the repartition pins a series to
    one partition)."""
    from shards_prometheus_spark.functions.labelset import label_str

    keyed = (
        df.select(
            F.concat_ws(
                "\x00", F.col("metric"), label_str("labels")
            ).alias("series_key"),
            F.to_json(
                F.map_concat(
                    F.create_map(F.lit("__name__"), F.col("metric")),
                    F.col("labels"),
                )
            ).alias("labels_json"),
            "ts_ms",
            F.col("value").cast("double").alias("value"),
        )
        .repartition("series_key")
        .sortWithinPartitions("series_key", "ts_ms")
    )

    def encode_partition(batches):
        import pandas as pd

        from shards_prometheus_spark.sources.chunkenc import (
            SAMPLES_PER_CHUNK,
            encode_xor_chunk,
        )

        cols = [
            "series_key",
            "labels_json",
            "min_ms",
            "max_ms",
            "n",
            "data",
        ]
        pend_key = pend_lj = None
        pend: "list[tuple[int, float]]" = []

        def flush(rows):
            for i in range(0, len(pend), SAMPLES_PER_CHUNK):
                seg = pend[i : i + SAMPLES_PER_CHUNK]
                rows.append(
                    (
                        pend_key,
                        pend_lj,
                        int(seg[0][0]),
                        int(seg[-1][0]),
                        len(seg),
                        encode_xor_chunk(seg),
                    )
                )

        for pdf in batches:
            rows: list = []
            for key, lj, ts, val in zip(
                pdf["series_key"], pdf["labels_json"],
                pdf["ts_ms"], pdf["value"],
            ):
                if key != pend_key:
                    if pend:
                        flush(rows)
                    pend_key, pend_lj = key, lj
                    pend = []
                pend.append((int(ts), float(val)))
            if rows:
                yield pd.DataFrame(rows, columns=cols)
        if pend:
            rows = []
            flush(rows)
            yield pd.DataFrame(rows, columns=cols)

    return keyed.mapInPandas(
        encode_partition,
        schema=(
            "series_key string, labels_json string, min_ms long, "
            "max_ms long, n long, data binary"
        ),
    )


def answer_read_request_chunked(
    samples: DataFrame,
    payload: bytes,
    max_rows: "int | None" = DEFAULT_READ_LIMIT,
    max_frame_bytes: int = DEFAULT_MAX_BYTES_IN_FRAME,
) -> bytes:
    """Answer a ReadRequest with the STREAMED_XOR_CHUNKS body: a
    sequence of uvarint+CRC32C-framed ChunkedReadResponse messages,
    each ≤~max_frame_bytes (upstream's read-max-bytes-in-frame), in
    query order with ``query_index`` stamped per frame. The sample
    guard is the SAMPLES path's contract transposed to chunks: the
    collect is LIMIT-probed at max_rows+1 chunk rows (each chunk holds
    ≥1 sample, so the probe bounds the driver materialization by the
    same constant) and the decoded sample total is re-checked against
    max_rows → ValueError → the endpoint's 400."""
    import json

    from shards_prometheus_spark.sources.chunkenc import (
        encode_chunked_read_response,
        write_frames,
    )

    queries = parse_read_request(payload)
    frames: "list[bytes]" = []
    for qi, (start_ms, end_ms, matchers) in enumerate(queries):
        df = read_query_frame(samples, start_ms, end_ms, matchers).select(
            "metric",
            "labels",
            F.expr("(ts_us - pmod(ts_us, 1000)) div 1000").alias("ts_ms"),
            "value",
        )
        chunks_df = _xor_chunk_rows(df)
        probe = (
            chunks_df if max_rows is None else chunks_df.limit(max_rows + 1)
        )
        rows = probe.collect()
        if max_rows is not None and (
            len(rows) > max_rows
            or sum(r["n"] for r in rows) > max_rows
        ):
            raise ValueError(
                f"remote-read query matches more than {max_rows} samples"
            )
        rows.sort(key=lambda r: (r["series_key"], r["min_ms"]))
        # greedy frame packing: adjacent chunks of one series share a
        # ChunkedSeries entry; a series too big for one frame splits
        # across frames with its labels repeated (upstream framing)
        cur: "list[tuple[dict, list[tuple[int, int, bytes]]]]" = []
        cur_bytes = 0
        for r in rows:
            labels = json.loads(r["labels_json"])
            est = (
                len(r["data"])
                + sum(len(k) + len(v) + 4 for k, v in labels.items())
                + 32
            )
            if cur and cur_bytes + est > max_frame_bytes:
                frames.append(encode_chunked_read_response(cur, qi))
                cur, cur_bytes = [], 0
            chunk = (int(r["min_ms"]), int(r["max_ms"]), bytes(r["data"]))
            if cur and cur[-1][0] == labels:
                cur[-1][1].append(chunk)
            else:
                cur.append((labels, [chunk]))
            cur_bytes += est
        if cur or not rows:
            # an empty result still answers one (empty) frame so the
            # client sees the query_index
            frames.append(encode_chunked_read_response(cur, qi))
    return write_frames(frames)


def parse_chunked_read_stream(
    stream: bytes, n_queries: "int | None" = None
) -> "list[list[tuple[dict, list[tuple[int, float]]]]]":
    """Client half: a framed STREAMED_XOR_CHUNKS body → per query
    (by ``query_index``): [(labels, [(ts_ms, value)])], chunks decoded
    and merged per label set in time order — the same return shape as
    ``parse_read_response`` so callers can treat both response types
    uniformly."""
    from shards_prometheus_spark.sources.chunkenc import (
        CHUNK_ENCODING_XOR,
        decode_xor_chunk,
        parse_chunked_read_response,
        read_frames,
    )

    per_query: "dict[int, dict[tuple, list]]" = {}
    for msg in read_frames(stream):
        series, qi = parse_chunked_read_response(msg)
        bucket = per_query.setdefault(qi, {})
        for labels, chunks in series:
            key = tuple(sorted(labels.items()))
            samples_ = bucket.setdefault(key, [])
            for _min_ms, _max_ms, enc, data in chunks:
                if enc != CHUNK_ENCODING_XOR:
                    raise ValueError(
                        f"chunked stream: unsupported encoding {enc}"
                    )
                samples_.extend(decode_xor_chunk(data))
    n = n_queries if n_queries is not None else (
        max(per_query) + 1 if per_query else 0
    )
    return [
        [
            (dict(key), sorted(samples_))
            for key, samples_ in sorted(per_query.get(qi, {}).items())
        ]
        for qi in range(n)
    ]


# --- client half (the `remote_read:` config section) -------------------------


def fetch_remote_samples(
    spark,
    url: str,
    start_ms: int,
    end_ms: int,
    matchers: "list[tuple[str, str, str]]",
    timeout_s: float = 60.0,
    headers: "dict | None" = None,
) -> DataFrame:
    """The CLIENT half of remote-read: POST one ReadRequest to a
    paired server's `/api/v1/read` and return the decoded series as a
    §1.2 samples relation (event_id, series_id, metric, labels,
    ts_us, value) — pluggable anywhere the local relations are
    (union into an evaluator, register, re-expose). The HTTP hop is
    driver-side and response-sized by the remote's own LIMIT
    contract, exactly like upstream's remote-read client
    materializing a QueryResult; series identity re-hashes through
    the canonical `series_id_expr` so remote series join local
    window partitions."""
    import urllib.request

    from shards_prometheus_spark.model import series_id_expr

    req = urllib.request.Request(
        url,
        data=encode_read_request([(start_ms, end_ms, matchers)]),
        headers={
            "Content-Type": "application/x-protobuf",
            "Content-Encoding": "snappy",
            "X-Prometheus-Remote-Read-Version": "0.1.0",
            **(headers or {}),
        },
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
        body = resp.read()
    (series_list,) = parse_read_response(body) or ([],)
    rows = []
    for i, (labels, samples_) in enumerate(series_list):
        metric = labels.get("__name__", "")
        rest = {k: v for k, v in labels.items() if k != "__name__"}
        for j, (ts_ms, value) in enumerate(samples_):
            # negative-namespaced synthetic event_ids, the pushed-row
            # convention (deterministic LAG tiebreak, no collision
            # with parquet ids)
            rows.append(
                (
                    -(i * 1_000_000 + j + 1),
                    metric,
                    rest,
                    int(ts_ms) * 1_000,
                    float(value),
                )
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, metric string, labels map<string,string>, "
        "ts_us long, value double",
    )
    return df.select(
        "event_id",
        series_id_expr(F.col("metric"), F.col("labels")).alias(
            "series_id"
        ),
        "metric",
        "labels",
        "ts_us",
        "value",
    )


def remote_samples_for_config(
    spark,
    cfg,
    start_ms: int = 0,
    end_ms: int = 4_102_444_800_000,
    matchers: "list[tuple[str, str, str]] | None" = None,
) -> "DataFrame | None":
    """Fetch every `remote_read:` endpoint of a loaded ScrapeConfig
    and union the results — the read-federation relation a query
    layer unions with local samples. Each entry's
    `required_matchers` gate the fan-out (upstream: an entry only
    serves selectors carrying them) and are ADDED to its
    ReadRequest as equality matchers; None when no endpoint
    qualifies."""
    out = None
    for entry in getattr(cfg, "remote_read", None) or []:
        ms = list(matchers or [])
        given = {m[0]: m for m in ms}
        skip = False
        for k, v in (entry.required_matchers or {}).items():
            m = given.get(k)
            if m is None:
                ms.append((k, "=", v))
            elif not (m[1] == "=" and m[2] == v):
                skip = True  # selector contradicts the gate
                break
        if skip:
            continue
        df = fetch_remote_samples(
            spark,
            entry.url,
            start_ms,
            end_ms,
            ms,
            timeout_s=entry.timeout_s,
            headers=entry.request_headers(),
        )
        out = df if out is None else out.unionByName(df)
    return out


# --- registered parity query ------------------------------------------------


def remote_read_roundtrip(spark, sf_dir: str) -> DataFrame:
    """Registered parity row: a ReadRequest (a `click` name matcher +
    a `user` regex, full time range) encoded to the wire, answered off
    the multi-label samples relation, the ReadResponse decoded back,
    and the recovered time series folded per (metric, user, shard) —
    proving request codec → matcher compilation → response codec
    preserve every (series, timestamp, value) triple. The Spark-side
    selection is one pushed-down scan; the response materialization is
    response-sized by the protocol contract (and LIMIT-probed). The
    oracle computes the same fold straight off the events table
    (wire timestamps are ms, so the fold compares at ms)."""
    from shards_prometheus_spark.model import samples_multi

    s = samples_multi(spark, sf_dir)
    req = encode_read_request(
        [
            (
                0,
                4_102_444_800_000,  # far future: the full corpus
                [("__name__", "=", "click"), ("user", "=~", "1.*")],
            )
        ]
    )
    (series_list,) = parse_read_response(answer_read_request(s, req))
    rows = []
    for labels, samples_ in series_list:
        for ts_ms, value in samples_:
            rows.append(
                (
                    labels.get("__name__", ""),
                    labels.get("user", ""),
                    labels.get("shard", ""),
                    int(ts_ms),
                    float(value),
                )
            )
    # pandas → Arrow path: createDataFrame over a plain row list
    # pickles row-at-a-time (guide §6 — Arrow for driver transfers)
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=["metric", "l_user", "l_shard", "ts_ms", "value"],
        ),
        "metric string, l_user string, l_shard string, "
        "ts_ms long, value double",
    )
    return (
        df.groupBy("metric", "l_user", "l_shard")
        .agg(
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.count(F.lit(1)).alias("n_samples"),
            F.max("ts_ms").alias("last_ts_ms"),
        )
        .orderBy("metric", "l_user", "l_shard")
    )


def remote_read_streamed_roundtrip(spark, sf_dir: str) -> DataFrame:
    """Registered parity row for the NEGOTIATED response type 2: the
    same request codec, answered as a STREAMED_XOR_CHUNKS body — the
    per-series Gorilla XOR chunk encode runs in an Arrow-batched
    grouped kernel (executor-side; the driver collects chunk-sized
    rows, ~1/120th of the sample count), the frames are CRC32C-checked
    and the chunks decoded back client-side — proving the whole
    chunked pairing (request → chunk encode → framing → decode)
    preserves every (series, timestamp, value) triple. A `view` name
    matcher + a `shard` regex keeps the selection disjoint from the
    SAMPLES-path row. Oracle: the identical fold straight off the
    events table at ms resolution."""
    from shards_prometheus_spark.model import samples_multi
    from shards_prometheus_spark.sources.chunkenc import (
        CHUNK_ENCODING_XOR,
        parse_chunked_read_response,
        read_frames,
    )

    s = samples_multi(spark, sf_dir)
    req = encode_read_request(
        [
            (
                0,
                4_102_444_800_000,  # far future: the full corpus
                [("__name__", "=", "view"), ("shard", "=~", "[0-3]")],
            )
        ],
        accepted_response_types=[1],  # STREAMED_XOR_CHUNKS
    )
    stream = answer_read_request_chunked(s, req)
    # Client framing + CRC32C checks stay driver-side (read_frames —
    # frame-sized work); the per-SAMPLE XOR chunk decode distributes:
    # the driver handles ~samples/120 chunk rows and the executors run
    # the same vendored decode_xor_chunk per chunk inside one
    # Arrow-batched kernel (guide §5: the driver does no data work;
    # §4.2: batch Python work executor-side — the r16 sf1 rehearsal
    # measured the driver loop at 10.2 s for ~400 k samples).
    chunk_rows = []
    for msg in read_frames(stream):
        series, _qi = parse_chunked_read_response(msg)
        for labels, chunks in series:
            m = labels.get("__name__", "")
            u = labels.get("user", "")
            sh = labels.get("shard", "")
            for _min_ms, _max_ms, enc, data in chunks:
                if enc != CHUNK_ENCODING_XOR:
                    raise ValueError(
                        f"chunked stream: unsupported encoding {enc}"
                    )
                chunk_rows.append((m, u, sh, bytes(data)))
    import pandas as pd

    chunks_df = spark.createDataFrame(
        pd.DataFrame(
            chunk_rows, columns=["metric", "l_user", "l_shard", "data"]
        ),
        "metric string, l_user string, l_shard string, data binary",
    )

    def kernel(batches):
        from shards_prometheus_spark.sources.chunkenc import (
            decode_xor_chunk,
        )

        for pdf in batches:
            out = []
            for m, u, sh, data in zip(
                pdf["metric"], pdf["l_user"], pdf["l_shard"], pdf["data"]
            ):
                for ts_ms, value in decode_xor_chunk(bytes(data)):
                    out.append((m, u, sh, int(ts_ms), float(value)))
            yield pd.DataFrame(
                out,
                columns=["metric", "l_user", "l_shard", "ts_ms", "value"],
            )

    n_par = max(8, spark.sparkContext.defaultParallelism)
    df = chunks_df.repartition(n_par).mapInPandas(
        kernel,
        "metric string, l_user string, l_shard string, "
        "ts_ms long, value double",
    )
    return (
        df.groupBy("metric", "l_user", "l_shard")
        .agg(
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.count(F.lit(1)).alias("n_samples"),
            F.max("ts_ms").alias("last_ts_ms"),
        )
        .orderBy("metric", "l_user", "l_shard")
    )


QUERIES = {
    "remote_read_roundtrip": remote_read_roundtrip,
    "remote_read_streamed_roundtrip": remote_read_streamed_roundtrip,
}


def _roundtrip_sql() -> str:
    from shards_prometheus_spark.model import SAMPLES_MULTI_CTE, dround

    return (
        f"{SAMPLES_MULTI_CTE} "
        "SELECT metric, l_user, l_shard, "
        + dround("SUM(value)", 4)
        + " AS sum_value, COUNT(*) AS n_samples, "
        "MAX(ts_us // 1000) AS last_ts_ms "
        "FROM samples_multi "
        "WHERE metric = 'click' AND regexp_matches(l_user, '^(?:1.*)$') "
        "GROUP BY metric, l_user, l_shard"
    )


def _streamed_roundtrip_sql() -> str:
    from shards_prometheus_spark.model import SAMPLES_MULTI_CTE, dround

    return (
        f"{SAMPLES_MULTI_CTE} "
        "SELECT metric, l_user, l_shard, "
        + dround("SUM(value)", 4)
        + " AS sum_value, COUNT(*) AS n_samples, "
        "MAX(ts_us // 1000) AS last_ts_ms "
        "FROM samples_multi "
        "WHERE metric = 'view' AND regexp_matches(l_shard, '^(?:[0-3])$') "
        "GROUP BY metric, l_user, l_shard"
    )


ORACLES = {
    "remote_read_roundtrip": _roundtrip_sql(),
    "remote_read_streamed_roundtrip": _streamed_roundtrip_sql(),
}
