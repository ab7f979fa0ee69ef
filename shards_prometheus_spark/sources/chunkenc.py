"""Gorilla XOR chunk codec + chunked-frame streaming for remote-read.

The paired server's remote-read endpoint negotiates TWO response
types (prompb/remote.proto `ReadRequest.accepted_response_types`):
``SAMPLES`` (the snappy+proto ``ReadResponse`` sources/remote_read.py
already speaks) and ``STREAMED_XOR_CHUNKS`` — a stream of
length-prefixed, CRC32C-framed ``ChunkedReadResponse`` protobuf
messages whose sample payloads are TSDB XOR chunks (the Gorilla
compression of Pelkonen et al., VLDB 2015, as specified by the
published tsdb/chunkenc XOR format). Thanos/Cortex read this framing;
it is the scale path of remote read (bounded frames instead of one
monolithic response). Reference pairing: the reference's exposer is
the TEXT pull layer (prometheus.cpp:47,73,80); this module is the
same read pairing at the streamed WIRE layer.

Public message shapes (prompb/remote.proto):

- ``ChunkedReadResponse{repeated ChunkedSeries chunked_series = 1,
  int64 query_index = 2}``
- ``ChunkedSeries{repeated Label labels = 1, repeated Chunk chunks = 2}``
- ``Chunk{int64 min_time_ms = 1, int64 max_time_ms = 2,
  Encoding type = 3 (XOR = 1), bytes data = 4}``

Frame format (storage/remote chunked framing, public wire spec):
``uvarint(len(msg)) + 4-byte big-endian CRC32-Castagnoli(msg) + msg``,
with NO outer snappy (chunk payloads are already compressed) and
Content-Type ``application/x-streamed-protobuf;
proto=prometheus.ChunkedReadResponse``.

XOR chunk layout (published tsdb/chunkenc format):
2-byte big-endian sample count, then an MSB-first bitstream —
sample 0: zigzag-varint timestamp (ms) + raw 64-bit float;
sample 1: uvarint time delta + Gorilla value-XOR;
sample 2+: delta-of-delta with the varbit control codes
``0 | 10+14b | 110+17b | 1110+20b | 1111+64b`` + Gorilla value-XOR
(leading-zero window clamped to 31, 6-bit sigbits with 64 encoded
as 0).

Everything here is stdlib-only (struct + the repo's own varint
helpers); the per-series chunk ENCODE rides executor parallelism in
sources/remote_read.py's Arrow kernel — this module is the pure
codec both halves share.
"""

from __future__ import annotations

import struct

from shards_prometheus_spark.functions.miniformats import (
    _u_to_int64,
    _uvarint_decode,
    _uvarint_encode,
    pb_fields,
    pb_len,
    pb_varint,
)

#: Chunk.Encoding on the wire (prompb): XOR = 1.
CHUNK_ENCODING_XOR = 1

#: ReadRequest.ResponseType enum: SAMPLES = 0, STREAMED_XOR_CHUNKS = 1.
RESPONSE_TYPE_SAMPLES = 0
RESPONSE_TYPE_STREAMED_XOR_CHUNKS = 1

#: upstream cuts head chunks at 120 samples (the TSDB default the
#: streamed read re-serves); our re-encode honours the same bound so
#: a frame's worst-case size stays predictable
SAMPLES_PER_CHUNK = 120

#: Content-Type the streamed response carries.
STREAMED_CONTENT_TYPE = (
    "application/x-streamed-protobuf; proto=prometheus.ChunkedReadResponse"
)


# --- CRC32-Castagnoli (frame checksums) -------------------------------------

#: reflected Castagnoli polynomial — the crc32c the chunked framing
#: pins (zlib.crc32 is the IEEE polynomial, NOT wire-compatible)
_CRC32C_POLY = 0x82F63B78


def _crc32c_table() -> "list[int]":
    table = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ _CRC32C_POLY if c & 1 else c >> 1
        table.append(c)
    return table


_TABLE = _crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    tab = _TABLE
    for b in data:
        crc = (crc >> 8) ^ tab[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


# --- MSB-first bit stream ----------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator (the bstream write order)."""

    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write_bits(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_bytes(self, data: bytes) -> None:
        for b in data:
            self.write_bits(b, 8)

    def tobytes(self) -> bytes:
        if self.nbits:
            # zero-pad the trailing partial byte (reader stops at the
            # decoded sample count, never the pad)
            return bytes(self.buf) + bytes(
                [(self.acc << (8 - self.nbits)) & 0xFF]
            )
        return bytes(self.buf)


class _BitReader:
    """MSB-first bit reader over one chunk's bitstream."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes, bitpos: int = 0) -> None:
        self.data = data
        self.bitpos = bitpos

    def read_bits(self, nbits: int) -> int:
        end = self.bitpos + nbits
        if end > len(self.data) * 8:
            raise ValueError("xor chunk: bitstream truncated")
        lo, hi = self.bitpos >> 3, (end + 7) >> 3
        chunk = int.from_bytes(self.data[lo:hi], "big")
        self.bitpos = end
        return (chunk >> ((hi << 3) - end)) & ((1 << nbits) - 1)

    def read_uvarint(self) -> int:
        shift = n = 0
        while True:
            b = self.read_bits(8)
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                return n
            shift += 7
            if shift > 63:
                raise ValueError("xor chunk: uvarint overflow")

    def read_varint(self) -> int:
        u = self.read_uvarint()
        return (u >> 1) ^ -(u & 1)  # zigzag


def _zigzag(n: int) -> int:
    # (n << 1) ^ (n >> 63): Python's arithmetic shift makes this exact
    # for negatives too ((-1) >> 63 == -1, and x ^ -1 == ~x)
    return (n << 1) ^ (n >> 63)


# --- XOR chunk encode/decode --------------------------------------------------


def _float_bits(v: float) -> int:
    return struct.unpack(">Q", struct.pack(">d", v))[0]


def _bits_float(b: int) -> float:
    return struct.unpack(">d", struct.pack(">Q", b))[0]


def _bit_range(x: int, nbits: int) -> bool:
    return -((1 << (nbits - 1)) - 1) <= x <= (1 << (nbits - 1))


def _leading_zeros64(x: int) -> int:
    return 64 - x.bit_length()


def _trailing_zeros64(x: int) -> int:
    return (x & -x).bit_length() - 1 if x else 64


def _write_vdelta(
    w: _BitWriter, vbits: int, prev_vbits: int, window: "list[int]"
) -> None:
    """Gorilla value XOR: window = [leading, trailing] (0xFF sentinel
    = no window yet), mutated in place exactly as the appender state."""
    delta = vbits ^ prev_vbits
    if delta == 0:
        w.write_bits(0, 1)
        return
    w.write_bits(1, 1)
    leading = _leading_zeros64(delta)
    trailing = _trailing_zeros64(delta)
    if leading >= 32:
        leading = 31
    if (
        window[0] != 0xFF
        and leading >= window[0]
        and trailing >= window[1]
    ):
        # reuse the previous meaningful-bit window
        w.write_bits(0, 1)
        w.write_bits(delta >> window[1], 64 - window[0] - window[1])
        return
    window[0], window[1] = leading, trailing
    w.write_bits(1, 1)
    w.write_bits(leading, 5)
    sigbits = 64 - leading - trailing
    w.write_bits(sigbits & 0x3F, 6)  # 64 encodes as 0
    w.write_bits(delta >> trailing, sigbits)


def _read_vdelta(r: _BitReader, prev_vbits: int, window: "list[int]") -> int:
    if not r.read_bits(1):
        return prev_vbits
    if r.read_bits(1):
        leading = r.read_bits(5)
        mbits = r.read_bits(6) or 64
        window[0], window[1] = leading, 64 - leading - mbits
    mbits = 64 - window[0] - window[1]
    bits = r.read_bits(mbits)
    return prev_vbits ^ (bits << window[1])


def encode_xor_chunk(samples: "list[tuple[int, float]]") -> bytes:
    """[(ts_ms, value)] (ts non-decreasing, ≤65535 samples) → one XOR
    chunk's `data` bytes (2-byte BE count + bitstream)."""
    n = len(samples)
    if n > 0xFFFF:
        raise ValueError("xor chunk: more than 65535 samples")
    w = _BitWriter()
    prev_t = prev_vbits = 0
    t_delta = 0
    window = [0xFF, 0xFF]
    for i, (t, v) in enumerate(samples):
        t = int(t)
        vbits = _float_bits(float(v))
        if i == 0:
            w.write_bytes(_uvarint_encode(_zigzag(t)))
            w.write_bits(vbits, 64)
        elif i == 1:
            t_delta = t - prev_t
            if t_delta < 0:
                raise ValueError("xor chunk: timestamps must not decrease")
            w.write_bytes(_uvarint_encode(t_delta))
            _write_vdelta(w, vbits, prev_vbits, window)
        else:
            new_delta = t - prev_t
            if new_delta < 0:
                raise ValueError("xor chunk: timestamps must not decrease")
            dod = new_delta - t_delta
            t_delta = new_delta
            if dod == 0:
                w.write_bits(0, 1)
            elif _bit_range(dod, 14):
                w.write_bits(0b10, 2)
                w.write_bits(dod, 14)
            elif _bit_range(dod, 17):
                w.write_bits(0b110, 3)
                w.write_bits(dod, 17)
            elif _bit_range(dod, 20):
                w.write_bits(0b1110, 4)
                w.write_bits(dod, 20)
            else:
                w.write_bits(0b1111, 4)
                w.write_bits(dod, 64)
            _write_vdelta(w, vbits, prev_vbits, window)
        prev_t, prev_vbits = t, vbits
    return n.to_bytes(2, "big") + w.tobytes()


def decode_xor_chunk(data: bytes) -> "list[tuple[int, float]]":
    """One XOR chunk's `data` bytes → [(ts_ms, value)]."""
    if len(data) < 2:
        raise ValueError("xor chunk: missing sample count")
    n = int.from_bytes(data[:2], "big")
    r = _BitReader(data[2:])
    out: "list[tuple[int, float]]" = []
    t = vbits = 0
    t_delta = 0
    window = [0xFF, 0xFF]
    for i in range(n):
        if i == 0:
            t = r.read_varint()
            vbits = r.read_bits(64)
        elif i == 1:
            t_delta = r.read_uvarint()
            t += t_delta
            vbits = _read_vdelta(r, vbits, window)
        else:
            sz = 0
            if r.read_bits(1):
                if not r.read_bits(1):
                    sz = 14
                elif not r.read_bits(1):
                    sz = 17
                elif not r.read_bits(1):
                    sz = 20
                else:
                    dod = _u_to_int64(r.read_bits(64))
                    sz = -1
            if sz == 0:
                dod = 0
            elif sz > 0:
                bits = r.read_bits(sz)
                if bits > (1 << (sz - 1)):
                    bits -= 1 << sz
                dod = bits
            t_delta += dod
            t += t_delta
            vbits = _read_vdelta(r, vbits, window)
        out.append((t, _bits_float(vbits)))
    return out


# --- ChunkedReadResponse proto + frame stream --------------------------------


def encode_chunked_read_response(
    series: "list[tuple[dict, list[tuple[int, int, bytes]]]]",
    query_index: int = 0,
) -> bytes:
    """[(labels, [(min_ms, max_ms, chunk_data)])] → ONE (unframed)
    ChunkedReadResponse message."""
    body = b""
    for labels, chunks in series:
        s = b"".join(
            pb_len(
                1,
                pb_len(1, k.encode("utf-8")) + pb_len(2, v.encode("utf-8")),
            )
            for k, v in sorted(labels.items())
        )
        for min_ms, max_ms, data in chunks:
            s += pb_len(
                2,
                pb_varint(1, int(min_ms))
                + pb_varint(2, int(max_ms))
                + pb_varint(3, CHUNK_ENCODING_XOR)
                + pb_len(4, data),
            )
        body += pb_len(1, s)
    return body + pb_varint(2, int(query_index))


def parse_chunked_read_response(
    msg: bytes,
) -> "tuple[list[tuple[dict, list[tuple[int, int, int, bytes]]]], int]":
    """One ChunkedReadResponse message → ([(labels, [(min_ms, max_ms,
    encoding, data)])], query_index)."""
    series = []
    query_index = 0
    for field, wt, v in pb_fields(msg):
        if field == 2 and wt == 0:
            query_index = _u_to_int64(v)
        elif field == 1 and wt == 2:
            labels: dict = {}
            chunks: "list[tuple[int, int, int, bytes]]" = []
            for f2, wt2, v2 in pb_fields(v):
                if f2 == 1 and wt2 == 2:
                    name = value = ""
                    for f3, _w3, v3 in pb_fields(v2):
                        if f3 == 1:
                            name = v3.decode("utf-8")
                        elif f3 == 2:
                            value = v3.decode("utf-8")
                    labels[name] = value
                elif f2 == 2 and wt2 == 2:
                    min_ms = max_ms = 0
                    enc = 0
                    data = b""
                    for f3, _w3, v3 in pb_fields(v2):
                        if f3 == 1:
                            min_ms = _u_to_int64(v3)
                        elif f3 == 2:
                            max_ms = _u_to_int64(v3)
                        elif f3 == 3:
                            enc = v3
                        elif f3 == 4:
                            data = v3
                    chunks.append((min_ms, max_ms, enc, data))
            series.append((labels, chunks))
    return series, query_index


def write_frames(messages: "list[bytes]") -> bytes:
    """Frame each message: uvarint length + 4-byte BE crc32c + body."""
    out = bytearray()
    for m in messages:
        out += _uvarint_encode(len(m))
        out += crc32c(m).to_bytes(4, "big")
        out += m
    return bytes(out)


def read_frames(stream: bytes) -> "list[bytes]":
    """Split a framed stream back into messages, CRC-checked (the 400
    contract on a corrupt frame)."""
    out = []
    pos = 0
    n = len(stream)
    while pos < n:
        size, pos = _uvarint_decode(stream, pos)
        if pos + 4 + size > n:
            raise ValueError("chunked stream: truncated frame")
        want = int.from_bytes(stream[pos : pos + 4], "big")
        body = stream[pos + 4 : pos + 4 + size]
        if crc32c(body) != want:
            raise ValueError("chunked stream: frame CRC mismatch")
        out.append(body)
        pos += 4 + size
    return out
