"""Minimal protobuf wire-format codec (no generated code, no protobuf
dependency) — just enough for the Prometheus remote read/write messages.

The wire format is public and tiny: varints, 64-bit fixed, and
length-delimited fields (https://protobuf.dev/programming-guides/encoding/).
The message schemas come from Prometheus ``prompb`` (remote.proto /
types.proto), which the reference consumes via prost
(src/parsing/prometheus/remote_write_parser.rs).
"""

from __future__ import annotations

import struct

WIRE_VARINT = 0
WIRE_FIXED64 = 1
WIRE_LEN = 2
WIRE_FIXED32 = 5


def encode_varint(n: int) -> bytes:
    if n < 0:
        n += 1 << 64  # two's-complement for negative int64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def signed64(n: int) -> int:
    return n - (1 << 64) if n >= 1 << 63 else n


def tag(field: int, wire: int) -> bytes:
    return encode_varint((field << 3) | wire)


class Writer:
    """Append-only message builder."""

    def __init__(self) -> None:
        self.buf = bytearray()

    def varint(self, field: int, value: int) -> "Writer":
        self.buf += tag(field, WIRE_VARINT) + encode_varint(value)
        return self

    def double(self, field: int, value: float) -> "Writer":
        self.buf += tag(field, WIRE_FIXED64) + struct.pack("<d", value)
        return self

    def bytes_field(self, field: int, value: bytes) -> "Writer":
        self.buf += tag(field, WIRE_LEN) + encode_varint(len(value)) + value
        return self

    def string(self, field: int, value: str) -> "Writer":
        return self.bytes_field(field, value.encode())

    def message(self, field: int, inner: "Writer") -> "Writer":
        return self.bytes_field(field, bytes(inner.buf))

    def __bytes__(self) -> bytes:
        return bytes(self.buf)


def iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) triples; value is int for
    varint/fixed, bytes for length-delimited."""
    pos = 0
    while pos < len(buf):
        key, pos = decode_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == WIRE_VARINT:
            value, pos = decode_varint(buf, pos)
        elif wire == WIRE_FIXED64:
            value = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        elif wire == WIRE_LEN:
            length, pos = decode_varint(buf, pos)
            value = buf[pos:pos + length]
            pos += length
        elif wire == WIRE_FIXED32:
            value = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, value


def fixed64_double(raw: int) -> float:
    return struct.unpack("<d", struct.pack("<Q", raw))[0]
