"""Gorilla/Prometheus XOR chunk codec (operator X7 building block).

Implements the public Prometheus TSDB ``chunkenc`` XOR layout (also the
Facebook Gorilla paper, VLDB 2015):

* 2-byte big-endian sample count;
* sample 0: zigzag-varint timestamp + raw 64-bit float bits;
* sample 1: uvarint time delta + XOR-encoded value;
* sample ≥2: delta-of-delta with prefix codes ``0 | 10+14b | 110+17b |
  1110+20b | 1111+64b`` + XOR-encoded value;
* XOR value encoding: ``0`` bit when unchanged; else ``1`` + (``0``
  reuse previous leading/trailing window | ``1`` + 5-bit leading +
  6-bit significant-bit count) + significant bits.

Both encoder and decoder are provided; round-trip tests pin the format.
Reference consumes this via rusty_chunkenc
(src/parsing/prometheus/chunk_encoder.rs:20-97).
"""

from __future__ import annotations

import struct


class BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._bits = 0  # bit count currently in _acc
        self._acc = 0

    def write_bit(self, bit: int) -> None:
        self.write_bits(bit, 1)

    def write_bits(self, value: int, n: int) -> None:
        value &= (1 << n) - 1
        self._acc = (self._acc << n) | value
        self._bits += n
        while self._bits >= 8:
            self._bits -= 8
            self.buf.append((self._acc >> self._bits) & 0xFF)
        self._acc &= (1 << self._bits) - 1

    def write_byte(self, b: int) -> None:
        self.write_bits(b, 8)

    def getvalue(self) -> bytes:
        out = bytearray(self.buf)
        if self._bits:
            out.append((self._acc << (8 - self._bits)) & 0xFF)
        return bytes(out)


class BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read_bits(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            bit = (byte >> (7 - (self.pos & 7))) & 1
            out = (out << 1) | bit
            self.pos += 1
        return out

    def read_bit(self) -> int:
        return self.read_bits(1)

    def read_byte(self) -> int:
        return self.read_bits(8)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_uvarint(w: BitWriter, n: int) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            w.write_byte(b | 0x80)
        else:
            w.write_byte(b)
            return


def _read_uvarint(r: BitReader) -> int:
    result = 0
    shift = 0
    while True:
        b = r.read_byte()
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result
        shift += 7


def _bit_range(dod: int, nbits: int) -> bool:
    return -((1 << (nbits - 1)) - 1) <= dod <= (1 << (nbits - 1))


def _float_bits(v: float) -> int:
    return struct.unpack(">Q", struct.pack(">d", v))[0]


def _bits_float(b: int) -> float:
    return struct.unpack(">d", struct.pack(">Q", b))[0]


def _leading_zeros(v: int) -> int:
    return 64 - v.bit_length() if v else 64


def _trailing_zeros(v: int) -> int:
    return (v & -v).bit_length() - 1 if v else 64


def encode_xor_chunk(samples: list[tuple[int, float]]) -> bytes:
    """samples: [(timestamp_ms, value)] sorted by time → chunk bytes."""
    if len(samples) > 0xFFFF:
        raise ValueError("XOR chunk holds at most 65535 samples")
    w = BitWriter()
    w.write_byte(len(samples) >> 8)
    w.write_byte(len(samples) & 0xFF)
    prev_t = prev_tdelta = 0
    prev_v = 0
    leading, trailing = 0xFF, 0
    for i, (t, v) in enumerate(samples):
        if i == 0:
            _write_uvarint(w, _zigzag(t) & (1 << 64) - 1)
            w.write_bits(_float_bits(v), 64)
            prev_t, prev_v = t, _float_bits(v)
            continue
        if i == 1:
            tdelta = t - prev_t
            _write_uvarint(w, tdelta)
        else:
            tdelta = t - prev_t
            dod = tdelta - prev_tdelta
            if dod == 0:
                w.write_bit(0)
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
                w.write_bits(dod & (1 << 64) - 1, 64)
        prev_tdelta = tdelta
        prev_t = t
        # value: XOR vs previous
        vbits = _float_bits(v)
        xor = vbits ^ prev_v
        prev_v = vbits
        if xor == 0:
            w.write_bit(0)
            continue
        w.write_bit(1)
        lead = min(_leading_zeros(xor), 31)
        trail = _trailing_zeros(xor)
        if leading != 0xFF and lead >= leading and trail >= trailing:
            w.write_bit(0)
            w.write_bits(xor >> trailing, 64 - leading - trailing)
        else:
            leading, trailing = lead, trail
            w.write_bit(1)
            w.write_bits(lead, 5)
            sigbits = 64 - lead - trail
            w.write_bits(sigbits, 6)
            w.write_bits(xor >> trail, sigbits)
    return w.getvalue()


def decode_xor_chunk(data: bytes) -> list[tuple[int, float]]:
    r = BitReader(data)
    count = (r.read_byte() << 8) | r.read_byte()
    out: list[tuple[int, float]] = []
    t = tdelta = 0
    vbits = 0
    leading, trailing = 0, 0
    for i in range(count):
        if i == 0:
            t = _unzigzag(_read_uvarint(r))
            if t >= 1 << 63:
                t -= 1 << 64
            vbits = r.read_bits(64)
            out.append((t, _bits_float(vbits)))
            continue
        if i == 1:
            tdelta = _read_uvarint(r)
        else:
            prefix = 0
            while prefix < 4 and r.read_bit():
                prefix += 1
            if prefix == 0:
                dod = 0
            else:
                nbits = {1: 14, 2: 17, 3: 20, 4: 64}[prefix]
                raw = r.read_bits(nbits)
                # Sign-extension is strictly-greater: +2^(n-1) is a legal
                # positive dod (the encoder's bit_range is asymmetric).
                if nbits == 64:
                    if raw >= 1 << 63:
                        raw -= 1 << 64
                elif raw > 1 << (nbits - 1):
                    raw -= 1 << nbits
                dod = raw
            tdelta += dod
        t += tdelta
        if r.read_bit():
            if r.read_bit():
                leading = r.read_bits(5)
                sigbits = r.read_bits(6)
                if sigbits == 0:
                    sigbits = 64
                trailing = 64 - leading - sigbits
            sigbits = 64 - leading - trailing
            vbits ^= r.read_bits(sigbits) << trailing
        out.append((t, _bits_float(vbits)))
    return out


# -- CRC32C (Castagnoli) for the stream framing -----------------------------

_CRC32C_TABLE = []


def _crc32c_table():
    if not _CRC32C_TABLE:
        poly = 0x82F63B78
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
            _CRC32C_TABLE.append(crc)
    return _CRC32C_TABLE


def crc32c(data: bytes) -> int:
    table = _crc32c_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF
