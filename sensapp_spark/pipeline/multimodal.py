"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

The decode kernels are REAL, no codec library required: a pure-Python
container-header parser for PNG / GIF / BMP / WAV (dimensions, channels,
sample rate from the actual bytes), a full PNG pixel decode with stdlib
``zlib`` (IDAT inflate + the five PNG row filters), an uncompressed
24-bit BMP pixel decode, a PCM16 WAV sample decode, and a from-scratch
GIF decode (variable-width LZW per GIF89a Appendix F, palette mapping,
4-pass deinterlace) — all unit-tested against fully valid fixtures
(CRCs and all), the GIF path additionally pinned to a well-known
public 1×1 GIF byte string so the LZW bit conventions match external
encoders, not just our own test encoder.

The demo corpus has no binary files, so ``attach_binary`` synthesizes a
DECODABLE PNG per document with pure JVM expressions: signature, IHDR
with an md5-derived width, a genuine zlib IDAT stream (stored-mode
deflate, adler32 computed in closed form — see ``synthesize_png``), a
tEXt chunk holding the document bytes, IEND. Chunk CRCs are zeroed
placeholders — the header parser, like most fast-path decoders, does not
verify CRCs, though the adler32 IS verified by ``zlib.decompress`` —
which keeps every payload byte reproducible in the DuckDB oracle (blob
concat of unhex() pieces), so the driver's correctness gate checks the
real decode path end-to-end, pixels included.

Scale notes: payloads stay in executor memory one Arrow batch at a time
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch bytes);
feature extraction is a narrow mapInPandas — no shuffle; downstream
joins happen on the small extracted-feature frame, never on the blobs.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("sha_prefix", T.StringType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
    ]
)


# ---------------------------------------------------------------------------
# Real container-header parsers (pure Python, no codec libraries)
# ---------------------------------------------------------------------------

def parse_media_header(payload: bytes) -> dict:
    """Sniff + parse the container header of ``payload``.

    Returns a dict with ``format`` plus whichever of ``width``,
    ``height``, ``sample_rate``, ``channels`` the container declares;
    ``{"format": None}`` for unrecognized bytes. Parses the genuine
    binary layouts (big-endian PNG IHDR, little-endian GIF screen
    descriptor / BMP DIB header / RIFF-WAVE fmt chunk); CRCs are not
    verified (fast-path decoder behavior)."""
    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        # First chunk must be IHDR: 4B length, b'IHDR', 4B W, 4B H (BE).
        if payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            return {"format": "png", "width": w, "height": h}
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return {"format": "gif", "width": w, "height": h}
    if len(payload) >= 22 and payload[:2] == b"BM":
        hdr_size = struct.unpack("<I", payload[14:18])[0]
        if hdr_size >= 40 and len(payload) >= 26:  # BITMAPINFOHEADER
            w, h = struct.unpack("<ii", payload[18:26])
            return {"format": "bmp", "width": w, "height": abs(h)}
        if hdr_size == 12 and len(payload) >= 22:  # BITMAPCOREHEADER
            w, h = struct.unpack("<HH", payload[18:22])
            return {"format": "bmp", "width": w, "height": h}
    if (
        len(payload) >= 36
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    ):
        # Walk chunks to the fmt chunk (usually at offset 12).
        off = 12
        while off + 8 <= len(payload):
            cid = payload[off : off + 4]
            size = struct.unpack("<I", payload[off + 4 : off + 8])[0]
            if cid == b"fmt " and off + 16 <= len(payload):
                channels, rate = struct.unpack(
                    "<HI", payload[off + 10 : off + 16]
                )
                return {
                    "format": "wav",
                    "sample_rate": rate,
                    "channels": channels,
                }
            off += 8 + size + (size & 1)
    return {"format": None}


# Adam7 pass grid (PNG spec §8.2): (row_start, col_start, row_step,
# col_step) for each of the 7 passes, in transmission order.
_ADAM7 = [
    (0, 0, 8, 8), (0, 4, 8, 8), (4, 0, 8, 4), (0, 2, 4, 4),
    (2, 0, 4, 2), (0, 1, 2, 2), (1, 0, 2, 1),
]


def _png_unfilter(raw: bytes, off: int, w_px: int, h_px: int,
                  bpp: int, stride: int | None = None) -> tuple[bytes, int]:
    """Undo the five PNG row filters (None/Sub/Up/Average/Paeth, spec
    §9) for one (sub-)image of ``h_px`` scanlines starting at ``off`` in
    the inflated stream. ``bpp`` is the FILTER distance in bytes (spec:
    max(1, bytes per pixel) — 1 for sub-byte depths); ``stride`` is the
    scanline byte length (defaults to ``w_px * bpp`` for byte-aligned
    depths). Returns (pixel bytes, next offset)."""
    if stride is None:
        stride = w_px * bpp
    if off + h_px * (1 + stride) > len(raw):
        raise ValueError("pixel data length does not match dimensions")
    out = bytearray()
    prev = bytes(stride)
    for _ in range(h_px):
        ft = raw[off]
        row = bytearray(raw[off + 1 : off + 1 + stride])
        off += 1 + stride
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown filter type {ft}")
        out += row
        prev = row
    return bytes(out), off


def decode_png_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL PNG pixel decode with stdlib ``zlib`` only: walk chunks,
    inflate the concatenated IDAT stream, undo the five row filters
    (None/Sub/Up/Average/Paeth, PNG spec §9), and return
    ``(width, height, channels, pixels)`` with ``pixels`` row-major
    unfiltered bytes. Supports:

    * gray / gray+alpha / RGB / RGBA at 8- and 16-bit depth (16-bit
      samples are narrowed to their high byte — the standard 8-bit
      feature view);
    * palette (color type 3, 1/2/4/8-bit indices) — indices are mapped
      through PLTE so the result is plain RGB;
    * sub-byte grayscale (1/2/4-bit, MSB-first packing per spec §7.2)
      — samples are rescaled to full 8-bit range (x * 255/max);
    * Adam7 interlacing (spec §8.2) for all of the above — each pass is
      unfiltered as its own sub-image and scattered into place.

    Chunk CRCs are not verified (fast-path decoder behavior) but the
    zlib adler32 IS — a corrupt stream raises."""
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        if ctype == b"IHDR":
            ihdr = payload[pos + 8 : pos + 8 + ln]
        elif ctype == b"PLTE":
            plte = payload[pos + 8 : pos + 8 + ln]
        elif ctype == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + ln]
        elif ctype == b"IEND":
            break
        pos += 12 + ln  # length + type + data + CRC
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h = struct.unpack(">II", ihdr[:8])
    depth, color, _comp, _filt, interlace = ihdr[8:13]
    try:
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    except KeyError:
        raise NotImplementedError(f"color type {color}") from None
    allowed = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}[color]
    if depth not in allowed:
        raise NotImplementedError(
            f"unsupported bit depth {depth} for color type {color}"
        )
    if interlace not in (0, 1):
        raise ValueError(f"unknown interlace method {interlace}")
    if color == 3 and (plte is None or len(plte) % 3):
        raise ValueError("palette PNG missing a valid PLTE chunk")
    # Filter distance in bytes (spec §9: max(1, bytes per pixel)) and
    # expanded per-pixel width after sub-byte unpack / before 16-bit
    # narrowing.
    bpp = max(1, channels * depth // 8)
    exp_bpp = channels * (2 if depth == 16 else 1)

    def decode_subimage(pw: int, ph: int, off: int) -> tuple[bytes, int]:
        """Unfilter one (sub-)image and expand sub-byte samples to one
        byte each, so downstream scatter/palette logic is uniform."""
        stride = (pw * channels * depth + 7) // 8
        buf, off = _png_unfilter(raw, off, pw, ph, bpp, stride)
        if depth >= 8:
            return buf, off
        mask = (1 << depth) - 1
        ppb = 8 // depth
        out = bytearray(pw * ph)
        pos = 0
        for r in range(ph):
            row = buf[r * stride : (r + 1) * stride]
            for c in range(pw):
                shift = 8 - depth * ((c % ppb) + 1)
                out[pos] = (row[c // ppb] >> shift) & mask
                pos += 1
        return bytes(out), off

    raw = zlib.decompress(bytes(idat))

    if interlace == 0:
        pixels, off = decode_subimage(w, h, 0)
        if off != len(raw):
            raise ValueError("pixel data length does not match dimensions")
    else:  # Adam7: 7 independently-filtered sub-images, scattered
        img = bytearray(w * h * exp_bpp)
        off = 0
        for row0, col0, rstep, cstep in _ADAM7:
            pw = (w - col0 + cstep - 1) // cstep
            ph = (h - row0 + rstep - 1) // rstep
            if pw <= 0 or ph <= 0:
                continue  # pass empty at this image size (spec §8.2)
            sub, off = decode_subimage(pw, ph, off)
            for ri in range(ph):
                src = ri * pw * exp_bpp
                dst_row = (row0 + ri * rstep) * w * exp_bpp
                for ci in range(pw):
                    dst = dst_row + (col0 + ci * cstep) * exp_bpp
                    img[dst : dst + exp_bpp] = sub[src : src + exp_bpp]
                    src += exp_bpp
        if off != len(raw):
            raise ValueError("pixel data length does not match dimensions")
        pixels = bytes(img)

    if depth == 16:
        # Big-endian samples: the high byte is every even offset.
        pixels = pixels[0::2]
    elif depth < 8 and color == 0:
        # Rescale sub-byte gray to full 8-bit range (0..max -> 0..255).
        scale = 255 // ((1 << depth) - 1)
        pixels = bytes(v * scale for v in pixels)
    if color == 3:
        out = bytearray(w * h * 3)
        n_entries = len(plte) // 3
        for i, idx in enumerate(pixels):
            if idx >= n_entries:
                raise ValueError("palette index out of range")
            out[3 * i : 3 * i + 3] = plte[3 * idx : 3 * idx + 3]
        return w, h, 3, bytes(out)
    return w, h, channels, pixels


def decode_bmp_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL BMP decode: honors the pixel-data offset, 4-byte row
    padding, bottom-up vs top-down row order, and both DIB header
    flavors. Spec-complete for the raster formats: uncompressed 24-bit,
    palette at 1/4/8 bpp, RLE8 and RLE4 (run-length +
    absolute/delta/EOL escapes), and 16/32-bpp direct color with
    default (X1R5G5B5 / XRGB8888) or explicit BI_BITFIELDS channel
    masks. Returns ``(width, height, 3, pixels)`` with pixels
    row-major top-down in RGB order (BMP stores BGR)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size == 12:  # BITMAPCOREHEADER
        w, h = struct.unpack("<HH", payload[18:22])
        bpp = struct.unpack("<H", payload[24:26])[0]
        top_down = False
        compression = 0
        clr_used = 0  # core header has no biClrUsed: full-size table
    else:  # BITMAPINFOHEADER and later
        w, h = struct.unpack("<ii", payload[18:26])
        top_down = h < 0
        h = abs(h)
        bpp = struct.unpack("<H", payload[28:30])[0]
        compression = struct.unpack("<I", payload[30:34])[0]
        clr_used = (
            struct.unpack("<I", payload[46:50])[0]
            if len(payload) >= 50 else 0
        )
    if bpp == 24 and compression == 0:
        row_bytes = ((w * 3 + 3) // 4) * 4
        # Validate the pixel region against the declared dimensions
        # (same contract as the PNG decoder's length check): a
        # truncated payload must raise, not silently return short data.
        if data_off + h * row_bytes > len(payload):
            raise ValueError("BMP pixel data shorter than declared dimensions")
        rows = []
        for r in range(h):
            src = r if top_down else (h - 1 - r)
            line = payload[data_off + src * row_bytes :][: w * 3]
            # BGR → RGB per pixel
            rgb = bytearray(len(line))
            rgb[0::3] = line[2::3]
            rgb[1::3] = line[1::3]
            rgb[2::3] = line[0::3]
            rows.append(bytes(rgb))
        return w, h, 3, b"".join(rows)
    if bpp in (1, 4, 8) and compression in (0, 1, 2):
        if compression == 1 and bpp != 8:
            raise ValueError("RLE8 compression requires 8-bit pixels")
        if compression == 2 and bpp != 4:
            raise ValueError("RLE4 compression requires 4-bit pixels")
        palette = _bmp_palette(payload, hdr_size, clr_used)
        if compression == 0:
            # Rows pad to a 32-BIT boundary at every depth (spec).
            row_bytes = ((w * bpp + 31) // 32) * 4
            if data_off + h * row_bytes > len(payload):
                raise ValueError(
                    "BMP pixel data shorter than declared dimensions"
                )
            idx_rows = [
                _bmp_unpack_indices(
                    payload[data_off + (r if top_down else h - 1 - r)
                            * row_bytes :][:row_bytes],
                    w,
                    bpp,
                )
                for r in range(h)
            ]
        elif compression == 1:  # RLE8 (always bottom-up per the spec)
            idx_rows = _bmp_rle8(payload[data_off:], w, h)
            idx_rows.reverse()
        else:  # RLE4 (always bottom-up per the spec)
            idx_rows = _bmp_rle4(payload[data_off:], w, h)
            idx_rows.reverse()
        out = bytearray(w * h * 3)
        pos = 0
        for row in idx_rows:
            for idx in row:
                out[pos : pos + 3] = palette[idx]
                pos += 3
        return w, h, 3, bytes(out)
    if bpp in (16, 32) and compression in (0, 3):
        # Default masks per the spec: 16-bpp is X1R5G5B5, 32-bpp is
        # XRGB8888; BI_BITFIELDS (3) reads the three channel masks that
        # follow a 40-byte INFOHEADER — the same file offset (54) where
        # the V4/V5 headers store their in-header masks, so one read
        # covers every header flavor.
        if compression == 3:
            if len(payload) < 66:
                raise ValueError("truncated BI_BITFIELDS masks")
            rm, gm, bm = struct.unpack("<III", payload[54:66])
            if not (rm and gm and bm):
                raise ValueError("zero BI_BITFIELDS channel mask")
        elif bpp == 16:
            rm, gm, bm = 0x7C00, 0x03E0, 0x001F
        else:
            rm, gm, bm = 0x00FF0000, 0x0000FF00, 0x000000FF
        step = bpp // 8
        row_bytes = ((w * step + 3) // 4) * 4
        if data_off + h * row_bytes > len(payload):
            raise ValueError("BMP pixel data shorter than declared dimensions")
        shifts = [_bmp_mask_shift(m) for m in (rm, gm, bm)]
        out = bytearray(w * h * 3)
        pos = 0
        for r in range(h):
            src = r if top_down else (h - 1 - r)
            line = payload[data_off + src * row_bytes :][: w * step]
            for x in range(w):
                pix = int.from_bytes(line[x * step : (x + 1) * step],
                                     "little")
                for shift, maxv in shifts:
                    out[pos] = ((pix >> shift) & maxv) * 255 // maxv
                    pos += 1
        return w, h, 3, bytes(out)
    raise NotImplementedError(
        f"unsupported BMP layout (bpp={bpp}, compression={compression})"
    )


def _bmp_mask_shift(mask: int) -> tuple[int, int]:
    """(right shift, channel max) of a contiguous bitfield mask — the
    channel value scales to 8-bit as ``v * 255 // max``."""
    shift = (mask & -mask).bit_length() - 1
    return shift, mask >> shift


def _bmp_unpack_indices(line: bytes, w: int, bpp: int) -> bytes:
    """Unpack one uncompressed palette scanline to ``w`` byte indices:
    8-bpp as-is; 4-bpp two pixels per byte, HIGH nibble first; 1-bpp
    eight pixels per byte, MSB first (spec bit order)."""
    if bpp == 8:
        return line[:w]
    out = bytearray(w)
    if bpp == 4:
        for x in range(w):
            byte = line[x >> 1]
            out[x] = (byte >> 4) if x % 2 == 0 else (byte & 0x0F)
    else:  # bpp == 1
        for x in range(w):
            out[x] = (line[x >> 3] >> (7 - (x & 7))) & 1
    return bytes(out)


def _bmp_palette(
    payload: bytes, hdr_size: int, clr_used: int = 0
) -> list[bytes]:
    """256-entry RGB palette from the color table following the DIB
    header: BGRA quads (BGR triples for the 12-byte core header).
    ``clr_used`` (biClrUsed) caps how many entries the file actually
    stores — reading past it would interpret PIXEL data as colors —
    and indices beyond it (or beyond the payload) map to black, a
    deterministic fallback instead of content-dependent garbage."""
    entry = 3 if hdr_size == 12 else 4
    base = 14 + hdr_size
    n = min(clr_used, 256) if clr_used else 256
    table = []
    for i in range(256):
        off = base + i * entry
        if i < n and off + 3 <= len(payload):
            b, g, r = payload[off : off + 3]
            table.append(bytes((r, g, b)))
        else:
            table.append(b"\x00\x00\x00")
    return table


def _bmp_rle8(data: bytes, w: int, h: int) -> list[bytes]:
    """RLE8 run decode (BMP spec): (count, value) runs; escape 0
    introduces end-of-line (0), end-of-bitmap (1), delta (2: dx,dy of
    transparent skip — filled with index 0), or absolute mode (n >= 3:
    n literal bytes, word-aligned). Returns h rows bottom-up."""
    rows: list[bytes] = []
    cur = bytearray()
    i = 0
    def flush():
        cur.extend(b"\x00" * (w - len(cur)))
        rows.append(bytes(cur[:w]))
        cur.clear()
    while i + 1 < len(data) and len(rows) < h:
        n, v = data[i], data[i + 1]
        i += 2
        if n > 0:
            cur.extend(bytes([v]) * n)
        elif v == 0:  # end of line
            flush()
        elif v == 1:  # end of bitmap
            break
        elif v == 2:  # delta: move to (x + dx, y + dy), skipped = 0
            if i + 2 > len(data):
                raise ValueError("truncated RLE8 delta")
            dx, dy = data[i], data[i + 1]
            i += 2
            # Per spec the cursor moves RELATIVE to the current (x, y):
            # after dy line flushes the new row resumes at old_x + dx,
            # not at dx (skipped pixels are undefined → index 0). A
            # malformed dy past the bitmap clamps to the remaining rows
            # so the output can never exceed h rows (the caller sizes
            # its pixel buffer as w*h and trusts that bound).
            x = len(cur)
            for _ in range(min(dy, h - len(rows))):
                flush()
            cur.extend(b"\x00" * (x + dx if dy else dx))
        else:  # absolute run of v literal indices, word-aligned
            if i + v > len(data):
                raise ValueError("truncated RLE8 absolute run")
            cur.extend(data[i : i + v])
            i += v + (v & 1)
    if cur or len(rows) < h:
        while len(rows) < h:
            flush()
    return rows


def _bmp_rle4(data: bytes, w: int, h: int) -> list[bytes]:
    """RLE4 run decode (BMP spec), mirroring :func:`_bmp_rle8` with
    nibble pixels: an encoded run ``(count, value)`` emits ``count``
    pixels ALTERNATING the high and low nibbles of ``value``; absolute
    mode packs its literal pixels as nibbles high-first, padded to a
    16-bit boundary. Escapes (EOL / EOB / delta) are byte-identical to
    RLE8. Returns h rows of one-byte indices, bottom-up."""
    rows: list[bytes] = []
    cur = bytearray()
    i = 0

    def flush():
        cur.extend(b"\x00" * (w - len(cur)))
        rows.append(bytes(cur[:w]))
        cur.clear()

    while i + 1 < len(data) and len(rows) < h:
        n, v = data[i], data[i + 1]
        i += 2
        if n > 0:
            hi, lo = v >> 4, v & 0x0F
            cur.extend(hi if k % 2 == 0 else lo for k in range(n))
        elif v == 0:  # end of line
            flush()
        elif v == 1:  # end of bitmap
            break
        elif v == 2:  # delta (same semantics as RLE8's)
            if i + 2 > len(data):
                raise ValueError("truncated RLE4 delta")
            dx, dy = data[i], data[i + 1]
            i += 2
            x = len(cur)
            for _ in range(min(dy, h - len(rows))):
                flush()
            cur.extend(b"\x00" * (x + dx if dy else dx))
        else:  # absolute run of v literal nibbles, word-aligned
            nbytes = (v + 1) // 2
            if i + nbytes > len(data):
                raise ValueError("truncated RLE4 absolute run")
            for k in range(v):
                byte = data[i + (k >> 1)]
                cur.append((byte >> 4) if k % 2 == 0 else (byte & 0x0F))
            i += nbytes + (nbytes & 1)
    if cur or len(rows) < h:
        while len(rows) < h:
            flush()
    return rows


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytes:
    """Variable-width LZW decode per GIF89a Appendix F (public spec).

    Codes are packed LSB-first; the code width starts at
    ``min_code_size + 1`` and grows by one whenever the table fills the
    current width (mirror of the encoder growing after assigning an
    index that no longer fits), capping at 12 bits; CLEAR resets the
    table, EOI ends the stream. Output is the flat index stream,
    truncated to ``max_pixels`` (trailing garbage after a full frame is
    ignored, matching lenient real-world decoders)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8
    prev = None
    while bitpos + code_size <= nbits and len(out) < max_pixels:
        byte_i = bitpos >> 3
        window = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("LZW stream starts with a non-literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream (code out of range)")
        # Width grows one step ahead of the encoder's table (the
        # decoder is one entry behind until the next code arrives).
        if len(table) >= (1 << code_size) and code_size < 12:
            code_size += 1
        out += entry
        prev = entry
    return bytes(out[:max_pixels])


def decode_gif_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL GIF pixel decode, pure Python from the public GIF89a spec:
    logical screen descriptor, global/local color table, extension-block
    skipping, sub-block reassembly, variable-width LZW decompression
    (``_lzw_decode``), palette mapping, and 4-pass interlace reordering.
    Decodes the FIRST image frame; returns ``(width, height, 3,
    pixels)`` with row-major top-down RGB bytes (the frame's own
    dimensions, which for animations may be a sub-rectangle of the
    screen). Transparency is ignored — the transparent index still maps
    through the palette, which is what mean-color features want."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(payload) < 14:
        raise ValueError("GIF truncated inside the screen descriptor")
    gct = None
    packed = payload[10]
    pos = 13
    if packed & 0x80:  # global color table present
        n = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte + sub-blocks
            pos += 1
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1  # block terminator
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # Image descriptor.
        if pos + 9 > len(payload):
            raise ValueError("GIF truncated inside the image descriptor")
        w, h = struct.unpack("<HH", payload[pos + 4 : pos + 8])
        ipacked = payload[pos + 8]
        pos += 9
        ct = gct
        if ipacked & 0x80:  # local color table overrides
            n = 2 << (ipacked & 0x07)
            ct = payload[pos : pos + 3 * n]
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image has no color table")
        if pos >= len(payload):
            raise ValueError("GIF truncated before the LZW stream")
        min_code_size = payload[pos]
        pos += 1
        chunks = bytearray()
        while pos < len(payload) and payload[pos]:
            ln = payload[pos]
            chunks += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        indices = _lzw_decode(bytes(chunks), min_code_size, w * h)
        if len(indices) < w * h:
            raise ValueError("GIF pixel data shorter than frame")
        if ipacked & 0x40:  # interlaced: 4-pass row order
            order = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            rows: list[bytes] = [b""] * h
            for i, r in enumerate(order):
                rows[r] = indices[i * w : (i + 1) * w]
            indices = b"".join(rows)
        lut = [ct[3 * i : 3 * i + 3].ljust(3, b"\x00") for i in range(len(ct) // 3)]
        try:
            px = b"".join(lut[i] for i in indices)
        except IndexError:
            raise ValueError("GIF index outside color table") from None
        return w, h, 3, px
    raise ValueError("GIF has no image frame")


def decode_wav_samples(payload: bytes) -> tuple[int, int, list]:
    """REAL WAV decode: returns ``(sample_rate, channels, samples)``
    with interleaved samples. Supported sample formats (RIFF/WAVE
    public spec): PCM16 (int16), PCM8 (unsigned, recentred to signed
    int like every audio stack does), and IEEE float32 (format code 3,
    kept as floats). Other layouts (PCM24, ADPCM, float64) raise
    ``NotImplementedError``."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    off = 12
    rate = channels = None
    fmt_code = bits = None
    data = None
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        size = struct.unpack("<I", payload[off + 4 : off + 8])[0]
        body = payload[off + 8 : off + 8 + size]
        if cid == b"fmt ":
            fmt_code, channels, rate = struct.unpack("<HHI", body[0:8])
            bits = struct.unpack("<H", body[14:16])[0]
        elif cid == b"data":
            data = body
        off += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if fmt_code == 1 and bits == 16:
        n = len(data) // 2
        return rate, channels, list(struct.unpack(f"<{n}h", data[: 2 * n]))
    if fmt_code == 1 and bits == 8:
        # PCM8 is unsigned with midpoint 128.
        return rate, channels, [b - 128 for b in data]
    if fmt_code == 3 and bits == 32:
        n = len(data) // 4
        return rate, channels, list(struct.unpack(f"<{n}f", data[: 4 * n]))
    raise NotImplementedError(
        f"unsupported WAV sample format (fmt={fmt_code}, bits={bits})"
    )


def decode_pixels(payload: bytes):
    """Pixel/sample decode over the sniffed container format — every
    branch is a REAL pure-Python/stdlib decode: PNG (zlib inflate + row
    unfilter; 8/16-bit, palette, Adam7 interlace), GIF (from-scratch
    LZW + palette + deinterlace), BMP (24-bit, 1/4/8-bit palette,
    RLE8/RLE4, 16/32-bpp incl. BI_BITFIELDS masks), WAV
    (PCM16/PCM8/float32). PNG and BMP are raster-spec-complete;
    genuinely exotic layouts (WAV ADPCM) raise ``NotImplementedError``
    — swap in PIL/libvips/ffmpeg in production; the Spark-side
    plumbing does not change."""
    fmt = parse_media_header(payload).get("format")
    if fmt == "png":
        return decode_png_pixels(payload)
    if fmt == "gif":
        return decode_gif_pixels(payload)
    if fmt == "bmp":
        return decode_bmp_pixels(payload)
    if fmt == "wav":
        return decode_wav_samples(payload)
    raise ValueError("unknown container format")


def _rgb_means(payload: bytes):
    """(mean_r, mean_g, mean_b) from a real pixel decode, or Nones when
    the payload has no decodable image pixels. Gray maps to r=g=b;
    alpha channels are ignored."""
    try:
        fmt = parse_media_header(payload).get("format")
        if fmt == "png":
            w, h, ch, px = decode_png_pixels(payload)
        elif fmt == "gif":
            w, h, ch, px = decode_gif_pixels(payload)
        elif fmt == "bmp":
            w, h, ch, px = decode_bmp_pixels(payload)
        else:
            return (None, None, None)
    except Exception:
        return (None, None, None)
    n = w * h
    if n == 0:
        return (None, None, None)
    if ch == 1 or ch == 2:  # gray / gray+alpha
        s = sum(px[0::ch])
        m = s / n
        return (m, m, m)
    return (
        sum(px[0::ch]) / n,
        sum(px[1::ch]) / n,
        sum(px[2::ch]) / n,
    )


# ---------------------------------------------------------------------------
# Demo payload synthesis (JVM expressions — oracle-reproducible)
# ---------------------------------------------------------------------------

def _be4(col: Column) -> Column:
    """4-byte big-endian encoding of an int column as BINARY."""
    return F.unhex(F.lpad(F.hex(col), 8, "0"))


def _hex2(col: Column) -> Column:
    """2-hex-digit (1-byte) encoding of an int column as a STRING."""
    return F.lpad(F.hex(col), 2, "0")


def _div(col: Column, n: int) -> Column:
    """Integer division on a non-negative long column."""
    return F.floor(col / n).cast("long")


def synthesize_png(
    text_col: Column, width: Column, r: Column, g: Column, b: Column
) -> Column:
    """A DECODABLE PNG BINARY built from JVM expressions: signature,
    IHDR (8-bit RGBA, width × 1), a real zlib IDAT stream (stored-mode
    deflate block carrying one filter-0 scanline of ``width`` constant
    (r, g, b, 255) pixels, with the adler32 checksum computed in closed
    form — stdlib ``zlib.decompress`` accepts it), one tEXt chunk with
    keyword ``doc`` carrying the utf-8 text, IEND. Chunk CRCs are zeroed
    placeholders (the fast-path parser skips them; adler32 is the
    integrity check that IS verified) so every byte is reproducible in
    SQL on any engine — the DuckDB oracle rebuilds identical blobs.

    adler32 closed form for the scanline [0x00, (r g b 255) × W] of
    length m = 1 + 4W:  S0 = W(r+g+b+255);  A = (1 + S0) mod 65521;
    S1 = Σ j·byte_j = W(2r+3g+4b+5·255) + 2W(W−1)(r+g+b+255);
    B = (m + (m+1)·S0 − S1) mod 65521;  checksum = B·2^16 + A."""
    text_bytes = F.encode(text_col, "UTF-8")
    w = width.cast("long")
    rr, gg, bb = r.cast("long"), g.cast("long"), b.cast("long")
    m = F.lit(1) + w * 4  # raw scanline length (filter byte + RGBA · W)
    s0 = w * (rr + gg + bb + 255)
    a = (F.lit(1) + s0) % 65521
    s1 = w * (rr * 2 + gg * 3 + bb * 4 + 5 * 255) + (
        F.lit(2) * w * (w - 1) * (rr + gg + bb + 255)
    )
    bsum = (m + (m + 1) * s0 - s1) % 65521
    adler = bsum * F.lit(65536) + a
    nlen = F.lit(65535) - m  # one's complement of LEN, 16-bit
    scanline_hex = F.concat(
        F.lit("00"),  # filter type 0 (None)
        F.repeat(F.concat(_hex2(rr), _hex2(gg), _hex2(bb), F.lit("FF")), w.cast("int")),
    )
    idat_data = F.concat(
        F.unhex(F.lit("7801")),                          # zlib hdr (no dict)
        F.unhex(F.lit("01")),                            # BFINAL=1, stored
        F.unhex(F.concat(_hex2(m % 256), _hex2(_div(m, 256)))),       # LEN LE
        F.unhex(F.concat(_hex2(nlen % 256), _hex2(_div(nlen, 256)))),  # NLEN LE
        F.unhex(scanline_hex),
        _be4(adler),                                     # adler32 (BE)
    )
    return F.concat(
        F.unhex(F.lit("89504E470D0A1A0A")),              # signature
        F.unhex(F.lit("0000000D49484452")),              # IHDR len + type
        _be4(width),
        _be4(F.lit(1)),                                  # height = 1
        F.unhex(F.lit("0806000000")),                    # depth/color/etc
        F.unhex(F.lit("00000000")),                      # IHDR crc (zeroed)
        _be4(m + F.lit(11)),                             # IDAT len
        F.unhex(F.lit("49444154")),                      # 'IDAT'
        idat_data,
        F.unhex(F.lit("00000000")),                      # IDAT crc (zeroed)
        _be4(F.octet_length(text_col) + F.lit(4)),       # tEXt len
        F.unhex(F.lit("74455874")),                      # 'tEXt'
        F.encode(F.lit("doc"), "UTF-8"),
        F.unhex(F.lit("00")),                            # keyword NUL
        text_bytes,
        F.unhex(F.lit("00000000")),                      # tEXt crc (zeroed)
        F.unhex(F.lit("0000000049454E44AE426082")),      # IEND (real crc)
    )


# Fixed 128-entry GIF palette: entry i = (i, 255-i, 2i mod 256). A
# module-level hex constant so the Spark expressions and the DuckDB
# oracle inline the identical 384 bytes.
GIF_PALETTE_HEX = "".join(
    f"{i:02X}{255 - i:02X}{(2 * i) % 256:02X}" for i in range(128)
)


def synthesize_gif(width: Column, pix: Column) -> Column:
    """A DECODABLE GIF89a BINARY built from JVM expressions: header,
    logical screen descriptor with a 128-entry global color table
    (``GIF_PALETTE_HEX``), one image frame of ``width`` x 1 constant
    pixels of palette index ``pix``, LZW data emitted as BYTE-ALIGNED
    8-bit literal codes (min code size 7 → initial code width 8; CLEAR,
    then ``width`` literals, then EOI). Byte alignment means every code
    is exactly one byte, so the stream is a plain SQL concat — no bit
    packing. The decoder's table grows by one entry per literal after
    the first; capping ``width`` at 125 keeps it below 256 entries, so
    the code width never grows past 8 bits and the stream stays
    aligned. The DuckDB oracle rebuilds identical bytes."""
    w = width.cast("long")
    p = pix.cast("long")
    return F.concat(
        F.unhex(F.lit("474946383961")),                  # 'GIF89a'
        F.unhex(F.concat(_hex2(w), F.lit("00"))),        # screen W (LE)
        F.unhex(F.lit("0100")),                          # screen H = 1
        F.unhex(F.lit("F60000")),                        # GCT, 128 entries
        F.unhex(F.lit(GIF_PALETTE_HEX)),
        F.unhex(F.lit("2C00000000")),                    # image descriptor
        F.unhex(F.concat(_hex2(w), F.lit("00"))),        # frame W (LE)
        F.unhex(F.lit("010000")),                        # frame H, packed
        F.unhex(F.lit("07")),                            # min code size
        F.unhex(_hex2(w + 2)),                           # sub-block length
        F.unhex(F.lit("80")),                            # CLEAR (code 128)
        F.unhex(F.repeat(_hex2(p), w.cast("int"))),      # W literal codes
        F.unhex(F.lit("81")),                            # EOI (code 129)
        F.unhex(F.lit("003B")),                          # terminator+trailer
    )


def _md5_byte(col: Column, i: int) -> Column:
    """i-th byte of md5(col) as an int (hex-pair parse — same formula the
    DuckDB oracle uses)."""
    return F.conv(F.substring(F.md5(col), 2 * i + 1, 2), 16, 10).cast("int")


def attach_binary(docs: DataFrame, spread: bool = False) -> DataFrame:
    """Demo adapter: synthesize a real payload per document — a GIF89a
    for every 4th document by content hash (``synthesize_gif``), a PNG
    for the rest (``synthesize_png``), both with md5-derived dimensions
    and colors, so BOTH pixel-decode paths (zlib inflate+unfilter and
    LZW+palette) are exercised end-to-end. The real pipeline reads
    payloads from object storage with ``binaryFile`` or parquet binary
    columns.

    ``spread=True`` repartitions a below-core-count input up to full
    parallelism so a CPU-heavy decode isn't serialized into a few Python
    workers. Off by default: real media tables arrive with many file
    splits (binaryFile yields one split per file) where the shuffle is a
    no-op, and on small demo inputs the shuffle + per-partition Python
    worker spin-up costs far more than the header parse saves."""
    if spread:
        from sensapp_spark.pipeline.text import spread_if_needed

        docs = spread_if_needed(docs)
    text = F.col("text")
    width = _md5_byte(text, 0) % 192 + 64
    # Constant-color scanline: RGB from md5 bytes 3..5 (byte 1 fed the
    # old synthetic height — height is now a real 1 so the IDAT stream
    # decodes; byte 2 feeds the video n_frames).
    r = _md5_byte(text, 3)
    g = _md5_byte(text, 4)
    b = _md5_byte(text, 5)
    is_gif = _md5_byte(text, 6) % 4 == 0
    gif_w = _md5_byte(text, 0) % 62 + 64   # 64..125: code width stays 8
    gif_p = _md5_byte(text, 3) % 128       # palette index
    payload = F.when(is_gif, synthesize_gif(gif_w, gif_p)).otherwise(
        synthesize_png(text, width, r, g, b)
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.lit("image").alias("media_type"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def attach_video_meta(docs: DataFrame, fps: int = 24) -> DataFrame:
    """Demo adapter for the video path: payload stays opaque (the text
    bytes — video containers aren't synthesized), while typed metadata
    carries the frame count and rate the way a production table stores
    probed container metadata alongside the blob. ``n_frames`` derives
    deterministically from the content hash."""
    text = F.col("text")
    n_frames = _md5_byte(text, 2) % 240 + 1
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(text, "UTF-8").alias("payload"),
        F.lit("video").alias("media_type"),
        F.create_map(
            F.lit("n_frames"), n_frames.cast("string"),
            F.lit("fps"), F.lit(fps).cast("string"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Feature extraction (Arrow-batched mapInPandas over the real parser)
# ---------------------------------------------------------------------------

def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: the real
    container-header parser for format/dimension metadata plus the REAL
    pixel decode (``_rgb_means`` → zlib-inflated, unfiltered PNG rows /
    unpadded BMP rows) for per-channel color means.

    ``sha_prefix`` fingerprints the payload as sha256 over its UPPERCASE
    HEX encoding (not the raw bytes): DuckDB's hash functions are
    VARCHAR-only, and hashing the hex form keeps the value reproducible
    by the SQL oracle on the identical payload bytes.

    The worker references the module-level parser/decoders directly —
    ONE implementation, no closure copy to drift out of sync (a 12-byte
    DIB header divergence slipped into the old duplicated closure).
    Workers therefore need ``sensapp_spark`` importable, which local
    mode gives for free and clusters get from the standard
    ``--py-files``/pex deployment."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            infos = [parse_media_header(p) for p in payloads]
            means = [_rgb_means(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": [len(p) for p in payloads],
                    "sha_prefix": [
                        _hl.sha256(p.hex().upper().encode()).hexdigest()[:16]
                        for p in payloads
                    ],
                    "format": [i.get("format") for i in infos],
                    "width": pd.array(
                        [i.get("width") for i in infos], dtype="Int32"
                    ),
                    "height": pd.array(
                        [i.get("height") for i in infos], dtype="Int32"
                    ),
                    "sample_rate": pd.array(
                        [i.get("sample_rate") for i in infos], dtype="Int32"
                    ),
                    "channels": pd.array(
                        [i.get("channels") for i in infos], dtype="Int32"
                    ),
                    "mean_r": pd.array(
                        [m[0] for m in means], dtype="Float64"
                    ),
                    "mean_g": pd.array(
                        [m[1] for m in means], dtype="Float64"
                    ),
                    "mean_b": pd.array(
                        [m[2] for m in means], dtype="Float64"
                    ),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling driven by container metadata: one row per
    sampled frame index with its presentation timestamp in ms
    (integer arithmetic: ``idx * 1000 DIV fps``). This is the real
    sampling plan — a bounded JVM-side ``sequence`` explode, frames
    co-partitioned with their source media; only the per-frame pixel
    decode (``decode_pixels``) would be attached in production."""
    n_frames = F.element_at("meta", F.lit("n_frames")).cast("int")
    fps = F.element_at("meta", F.lit("fps")).cast("int")
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    out = media.select(
        "media_id", fps.alias("__fps"), F.explode(idx).alias("frame_idx")
    )
    return out.select(
        "media_id",
        "frame_idx",
        F.expr("frame_idx * 1000 DIV __fps").alias("frame_ts_ms"),
    )
