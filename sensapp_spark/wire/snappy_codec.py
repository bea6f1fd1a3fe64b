"""Pure-Python Snappy *block format* codec (the format Prometheus remote
read/write bodies use — raw blocks, not the framed stream).

Format reference: google/snappy format_description.txt (public).

* ``decompress`` implements the full format (literals + all three copy
  element kinds) so any conforming producer (real clients) is readable.
* ``compress`` emits literal-only output — valid Snappy by the spec,
  just without back-references; ~1.0 ratio. Prometheus clients accept
  it fine; swap in python-snappy for ratio if it's ever installed.
"""

from __future__ import annotations


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def compress(data: bytes) -> bytes:
    out = bytearray(_uvarint(len(data)))
    pos = 0
    while pos < len(data):
        chunk = data[pos:pos + 65536]
        n = len(chunk) - 1
        if n < 60:
            out.append(n << 2)
        elif n < 0x100:
            out.append(60 << 2)
            out.append(n)
        else:
            out.append(61 << 2)
            out += n.to_bytes(2, "little")
        out += chunk
        pos += len(chunk)
    return bytes(out)


def decompress(data: bytes) -> bytes:
    pos = 0
    length = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated snappy header")
        b = data[pos]
        pos += 1
        length |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    out = bytearray()
    while pos < len(data):
        t = data[pos]
        pos += 1
        kind = t & 3
        if kind == 0:  # literal
            n = t >> 2
            if n >= 60:
                extra = n - 59
                n = int.from_bytes(data[pos:pos + extra], "little")
                pos += extra
            n += 1
            out += data[pos:pos + n]
            pos += n
        else:
            if kind == 1:  # copy, 1-byte offset
                n = ((t >> 2) & 0x7) + 4
                offset = ((t >> 5) << 8) | data[pos]
                pos += 1
            elif kind == 2:  # copy, 2-byte offset
                n = (t >> 2) + 1
                offset = int.from_bytes(data[pos:pos + 2], "little")
                pos += 2
            else:  # copy, 4-byte offset
                n = (t >> 2) + 1
                offset = int.from_bytes(data[pos:pos + 4], "little")
                pos += 4
            if offset == 0 or offset > len(out):
                raise ValueError("bad snappy copy offset")
            start = len(out) - offset
            for i in range(n):  # may overlap — byte-at-a-time per spec
                out.append(out[start + i])
    if len(out) != length:
        raise ValueError(f"snappy length mismatch: {len(out)} != {length}")
    return bytes(out)
