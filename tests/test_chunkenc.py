"""Gorilla XOR chunks + the STREAMED_XOR_CHUNKS remote-read response
(sources/chunkenc.py, sources/remote_read.py chunked path).

The codec is pinned by HAND-BUILT vectors derived from the published
specs (the r14 packed-fixed64 lesson: never pin a codec only against
its own encoder): the CRC32C check vector from RFC 3720 §B.4, and a
bit-by-bit hand assembly of a 3-sample chunk per the published TSDB
XOR chunk format / the Gorilla paper (Pelkonen et al., VLDB 2015).
"""

from __future__ import annotations

import random
import urllib.error
import urllib.request

import pytest

from tests.conftest import SF_SMOKE


def _post(url: str, payload: bytes):
    req = urllib.request.Request(url, data=payload, method="POST")
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.status, resp.headers, resp.read()


# --- codec pins ---------------------------------------------------------------


def test_crc32c_check_vector():
    """RFC 3720 §B.4: crc32c("123456789") == 0xE3069283 — proves the
    Castagnoli polynomial, not zlib's IEEE one."""
    from shards_prometheus_spark.sources.chunkenc import crc32c

    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_xor_chunk_hand_built_spec_vector():
    """Bit-by-bit hand assembly of [(1000,1.0),(2000,2.0),(3000,3.0)]
    per the published format: 2-byte BE count; zigzag-varint t0 + raw
    64-bit float; uvarint tDelta + Gorilla XOR (new-window form:
    1,1,5-bit leading,6-bit sigbits,sig bits); dod=0 control bit +
    a second new window. Assembled WITHOUT the module's bit writer."""
    from shards_prometheus_spark.sources.chunkenc import (
        decode_xor_chunk,
        encode_xor_chunk,
    )

    bits = ""
    bits += "11010000" + "00001111"  # varint zigzag(1000) = 2000
    bits += format(0x3FF0000000000000, "064b")  # float64 bits of 1.0
    bits += "11101000" + "00000111"  # uvarint tDelta = 1000
    # xor(1.0, 2.0) = 0x7FF0...: leading 1, trailing 52, sigbits 11
    bits += "1" + "1" + "00001" + "001011" + "1" * 11
    bits += "0"  # dod == 0
    # xor(2.0, 3.0) = 0x0008...: leading 12, trailing 51, sigbits 1
    # (trailing shrank below the window -> new-window form again)
    bits += "1" + "1" + "01100" + "000001" + "1"
    bits += "0" * ((-len(bits)) % 8)  # zero pad to a byte
    hand = bytes([0, 3]) + bytes(
        int(bits[i : i + 8], 2) for i in range(0, len(bits), 8)
    )
    samples = [(1000, 1.0), (2000, 2.0), (3000, 3.0)]
    assert encode_xor_chunk(samples) == hand
    assert decode_xor_chunk(hand) == samples


def test_xor_chunk_round_trip_properties():
    """Irregular timestamps, negative t0, constants, window reuse and
    shrink, ±0.0/denormals/inf, and the 64-bit dod escape all survive
    an encode→decode round trip bit-exactly."""
    from shards_prometheus_spark.sources.chunkenc import (
        decode_xor_chunk,
        encode_xor_chunk,
    )

    rng = random.Random(1515)
    cases = [
        [(0, 3.14)],
        [(5, 1.0), (5, 1.0)],  # zero tDelta, zero vdelta
        [(-9_000_000, -1.5), (0, 0.0), (1, -0.0)],  # negative t0
        [(i * 15_000, 42.0) for i in range(300)],  # constant value
        [  # irregular deltas exercise every dod size class
            (t, rng.random() * 1e6 - 5e5)
            for t in sorted(
                rng.randrange(0, 2**41) for _ in range(400)
            )
        ],
        [(i, float("inf") if i % 7 == 0 else 1e-310) for i in range(64)],
        # 64-bit dod escape: a delta jump beyond the 20-bit class
        [(0, 1.0), (10, 2.0), (2**33, 3.0), (2**33 + 10, 4.0)],
    ]
    for idx, samples in enumerate(cases):
        data = encode_xor_chunk(samples)
        assert decode_xor_chunk(data) == samples, f"case {idx}"
    with pytest.raises(ValueError):
        encode_xor_chunk([(10, 1.0), (5, 2.0)])  # decreasing ts
    with pytest.raises(ValueError):
        decode_xor_chunk(b"\x00\x05\x01")  # truncated bitstream


def test_chunked_frame_stream_and_crc_guard():
    from shards_prometheus_spark.sources.chunkenc import (
        crc32c,
        encode_chunked_read_response,
        encode_xor_chunk,
        parse_chunked_read_response,
        read_frames,
        write_frames,
    )

    chunk = encode_xor_chunk([(0, 1.0), (60_000, 2.0)])
    msg = encode_chunked_read_response(
        [({"__name__": "m", "job": "j"}, [(0, 60_000, chunk)])],
        query_index=3,
    )
    stream = write_frames([msg, b"", msg])
    assert read_frames(stream) == [msg, b"", msg]
    series, qi = parse_chunked_read_response(msg)
    assert qi == 3
    ((labels, chunks),) = series
    assert labels == {"__name__": "m", "job": "j"}
    assert chunks == [(0, 60_000, 1, chunk)]
    # frame checksum: uvarint len + 4-byte BE crc32c + body
    assert stream[1:5] == crc32c(msg).to_bytes(4, "big")
    tampered = bytearray(stream)
    tampered[-1] ^= 0x01
    with pytest.raises(ValueError):
        read_frames(bytes(tampered))
    with pytest.raises(ValueError):
        read_frames(stream[:-2])  # truncated frame


def test_accepted_response_types_codec():
    """ReadRequest field 2 round-trips packed; unpacked and
    split-packed spellings are concatenated per proto3."""
    from shards_prometheus_spark.functions.miniformats import (
        pb_len,
        pb_varint,
        snappy_compress,
    )
    from shards_prometheus_spark.sources.remote_read import (
        encode_read_request,
        parse_read_request_full,
    )

    q = [(0, 1000, [("__name__", "=", "m")])]
    queries, accepted = parse_read_request_full(
        encode_read_request(q, accepted_response_types=[1, 0])
    )
    assert queries == q and accepted == [1, 0]
    queries, accepted = parse_read_request_full(encode_read_request(q))
    assert accepted == []
    # foreign spellings: unpacked (wt=0) then a second packed chunk
    body = (
        pb_len(1, pb_varint(1, 0) + pb_varint(2, 1000))
        + pb_varint(2, 1)  # unpacked occurrence
        + pb_len(2, b"\x00\x01")  # packed chunk [0, 1]
    )
    _, accepted = parse_read_request_full(snappy_compress(body))
    assert accepted == [1, 0, 1]


# --- chunked answer path -------------------------------------------------------


def test_chunked_answer_matches_samples_answer(spark):
    """The STREAMED_XOR_CHUNKS body decodes to exactly the SAMPLES
    body's series/timestamps/values; chunks split at 120 samples."""
    from shards_prometheus_spark.model import samples_multi
    from shards_prometheus_spark.sources.chunkenc import (
        parse_chunked_read_response,
        read_frames,
    )
    from shards_prometheus_spark.sources.remote_read import (
        answer_read_request,
        answer_read_request_chunked,
        encode_read_request,
        parse_chunked_read_stream,
        parse_read_response,
    )

    s = samples_multi(spark, SF_SMOKE)
    req = encode_read_request(
        [
            (0, 4_102_444_800_000, [("__name__", "=", "view")]),
            (0, 4_102_444_800_000, [("__name__", "=", "no_such")]),
        ],
        accepted_response_types=[1],
    )
    want = parse_read_response(answer_read_request(s, req))
    stream = answer_read_request_chunked(s, req)
    got = parse_chunked_read_stream(stream, n_queries=2)
    assert len(got) == len(want) == 2
    for g_series, w_series in zip(got, want):
        g = {tuple(sorted(ls.items())): sm for ls, sm in g_series}
        w = {tuple(sorted(ls.items())): sorted(sm) for ls, sm in w_series}
        assert g == w
    assert got[1] == []  # empty query still answered (query_index 1)
    # every chunk obeys the 120-sample head-chunk bound
    for msg in read_frames(stream):
        series, _qi = parse_chunked_read_response(msg)
        for _labels, chunks in series:
            for _mn, _mx, _enc, data in chunks:
                assert 1 <= int.from_bytes(data[:2], "big") <= 120

    # the over-limit guard holds on the chunked path too
    with pytest.raises(ValueError):
        answer_read_request_chunked(s, req, max_rows=10)


def test_read_endpoint_negotiates_streamed_chunks(spark):
    """POSTing a ReadRequest with accepted_response_types=[1] answers
    the framed chunk stream (streamed content type, NO snappy
    Content-Encoding) equal to the SAMPLES answer; without the field
    the endpoint still answers the classic snappy ReadResponse."""
    from shards_prometheus_spark.model import samples_multi
    from shards_prometheus_spark.sources import MetricsExposer
    from shards_prometheus_spark.sources.remote_read import (
        answer_read_request,
        encode_read_request,
        parse_chunked_read_stream,
        parse_read_response,
    )

    s = samples_multi(spark, SF_SMOKE)
    queries = [
        (0, 4_102_444_800_000, [("__name__", "=", "click"),
                                ("shard", "=~", "[0-2]")])
    ]
    want = parse_read_response(answer_read_request(s, encode_read_request(queries)))

    exposer = MetricsExposer(spark, SF_SMOKE).start()
    try:
        url = f"http://{exposer.host}:{exposer.port}/api/v1/read"
        status, headers, body = _post(
            url,
            encode_read_request(queries, accepted_response_types=[1]),
        )
        assert status == 200
        assert headers.get("Content-Type", "").startswith(
            "application/x-streamed-protobuf"
        )
        assert "proto=prometheus.ChunkedReadResponse" in headers.get(
            "Content-Type", ""
        )
        assert headers.get("Content-Encoding") is None
        (got_series,) = parse_chunked_read_stream(body, n_queries=1)
        g = {tuple(sorted(ls.items())): sm for ls, sm in got_series}
        w = {
            tuple(sorted(ls.items())): sorted(sm)
            for ls, sm in want[0]
        }
        assert g == w and len(g) > 0

        # no accepted_response_types -> classic snappy SAMPLES body
        status, headers, body = _post(url, encode_read_request(queries))
        assert status == 200
        assert headers.get("Content-Type") == "application/x-protobuf"
        assert headers.get("Content-Encoding") == "snappy"
        (classic,) = parse_read_response(body)
        assert {
            tuple(sorted(ls.items())): sm for ls, sm in classic
        } == w
    finally:
        exposer.stop()
