"""Multimodal plumbing: the real container-header parser against fully
valid PNG/GIF/BMP/WAV fixtures, the JVM-expression PNG synthesis, the
Arrow-batched feature extraction, and the metadata-driven frame-sampling
plan."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest

from sensapp_spark.pipeline.multimodal import (
    attach_binary,
    attach_video_meta,
    decode_bmp_pixels,
    decode_gif_pixels,
    decode_pixels,
    decode_png_pixels,
    decode_wav_samples,
    extract_features,
    frame_sample_plan,
    parse_media_header,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# genuine fixtures (correct CRCs / layouts a real viewer would accept)
# ---------------------------------------------------------------------------

def make_png(width: int, height: int) -> bytes:
    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    # one row of RGBA zeros per height, filter byte 0 — a real decodable image
    raw = b"".join(b"\x00" + b"\x00" * (4 * width) for _ in range(height))
    idat = zlib.compress(raw)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def make_gif(width: int, height: int) -> bytes:
    """Header-only GIF: parseable screen descriptor, no image frame."""
    screen = struct.pack("<HH", width, height) + bytes([0x00, 0x00, 0x00])
    return b"GIF89a" + screen + b"\x3b"


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Reference GIF-LZW encoder for fixtures: variable code width
    (grows after assigning an index the current width can't emit),
    LSB-first packing, leading CLEAR, trailing EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    acc = 0
    nacc = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += code_size
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    buf = b""
    for c in indices:
        nxt = buf + bytes([c])
        if nxt in table:
            buf = nxt
            continue
        emit(table[buf])
        if next_code < 4096:  # freeze at the 12-bit cap (deferred clear)
            table[nxt] = next_code
            next_code += 1
            if next_code > (1 << code_size) and code_size < 12:
                code_size += 1
        buf = bytes([c])
    if buf:
        emit(table[buf])
    emit(eoi)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def make_gif_full(
    width: int,
    height: int,
    indices: bytes,
    palette: list[tuple[int, int, int]],
    interlace: bool = False,
) -> bytes:
    """Fully valid single-frame GIF89a with a global color table and
    genuinely LZW-compressed pixel data."""
    assert len(indices) == width * height
    ct_bits = max(1, (max(len(palette), 2) - 1).bit_length())
    n = 1 << ct_bits
    gct = b"".join(bytes(c) for c in palette) + b"\x00\x00\x00" * (n - len(palette))
    screen = struct.pack("<HH", width, height) + bytes([0x80 | (ct_bits - 1), 0, 0])
    min_code = max(2, ct_bits)
    if interlace:
        order = (
            list(range(0, height, 8))
            + list(range(4, height, 8))
            + list(range(2, height, 4))
            + list(range(1, height, 2))
        )
        indices = b"".join(
            indices[r * width : (r + 1) * width] for r in order
        )
    data = lzw_encode(indices, min_code)
    subs = b"".join(
        bytes([len(data[i : i + 255])]) + data[i : i + 255]
        for i in range(0, len(data), 255)
    )
    desc = b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + bytes(
        [0x40 if interlace else 0]
    )
    # A graphic-control extension before the frame, to exercise skipping.
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    return (
        b"GIF89a" + screen + gct + gce + desc
        + bytes([min_code]) + subs + b"\x00" + b"\x3b"
    )


def make_bmp(width: int, height: int) -> bytes:
    row = ((width * 3 + 3) // 4) * 4
    pixels = b"\x00" * (row * height)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(pixels), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 54)
    return header + dib + pixels


def make_bmp_core(width: int, height: int) -> bytes:
    """OS/2-style BMP with the 12-byte BITMAPCOREHEADER (unsigned
    16-bit dimensions) — the legacy DIB variant."""
    row = ((width * 3 + 3) // 4) * 4
    pixels = b"\x00" * (row * height)
    dib = struct.pack("<IHHHH", 12, width, height, 1, 24)
    header = struct.pack("<2sIHHI", b"BM", 14 + 12 + len(pixels), 0, 0, 26)
    return header + dib + pixels


def make_wav(sample_rate: int, channels: int, n_samples: int) -> bytes:
    data = b"\x00\x00" * n_samples * channels
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * channels * 2, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_parse_png_real_file():
    p = make_png(320, 200)
    assert parse_media_header(p) == {"format": "png", "width": 320, "height": 200}


def test_parse_gif():
    assert parse_media_header(make_gif(99, 44)) == {
        "format": "gif", "width": 99, "height": 44,
    }


def test_parse_bmp():
    assert parse_media_header(make_bmp(17, 9)) == {
        "format": "bmp", "width": 17, "height": 9,
    }


def test_parse_bmp_core_header():
    assert parse_media_header(make_bmp_core(31, 7)) == {
        "format": "bmp", "width": 31, "height": 7,
    }


def test_parse_bmp_topdown_negative_height():
    b = bytearray(make_bmp(17, 9))
    b[22:26] = struct.pack("<i", -9)
    assert parse_media_header(bytes(b))["height"] == 9


def test_parse_wav():
    assert parse_media_header(make_wav(44100, 2, 10)) == {
        "format": "wav", "sample_rate": 44100, "channels": 2,
    }


def test_parse_unknown_bytes():
    assert parse_media_header(b"plain text, not a container") == {"format": None}
    assert parse_media_header(b"") == {"format": None}


def _filter_rows(rows: list[bytes], ftypes: list[int], bpp: int) -> bytes:
    """FORWARD PNG row filtering (encoder direction) — the module only
    implements the inverse, so round-tripping through this validates the
    unfilter logic independently."""
    out = b""
    prev = bytes(len(rows[0]))
    for row, ft in zip(rows, ftypes):
        n = len(row)
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = bytes(
                (row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(n)
            )
        elif ft == 2:
            enc = bytes((row[i] - prev[i]) & 0xFF for i in range(n))
        elif ft == 3:
            enc = bytes(
                (row[i] - (((row[i - bpp] if i >= bpp else 0) + prev[i]) >> 1))
                & 0xFF
                for i in range(n)
            )
        elif ft == 4:
            enc = bytearray()
            for i in range(n):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc.append((row[i] - pred) & 0xFF)
            enc = bytes(enc)
        out += bytes([ft]) + enc
        prev = row
    return out


def make_png_pixels(
    width: int, height: int, rows: list[bytes], ftypes: list[int]
) -> bytes:
    """Fully valid RGBA PNG (real CRCs, real zlib) from explicit pixel
    rows, filtered per-row with the given filter types."""
    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    idat = zlib.compress(_filter_rows(rows, ftypes, bpp=4))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def test_decode_png_all_filter_types():
    # 3×5 RGBA image with deterministic pseudo-random pixels; every
    # filter type 0-4 appears at least once.
    width, height = 3, 5
    rows = [
        bytes(((r * 37 + i * 11 + 7) % 256) for i in range(width * 4))
        for r in range(height)
    ]
    for ftypes in ([0, 1, 2, 3, 4], [4, 3, 2, 1, 0], [2, 2, 4, 4, 3]):
        p = make_png_pixels(width, height, rows, ftypes)
        w, h, ch, px = decode_png_pixels(p)
        assert (w, h, ch) == (width, height, 4)
        assert px == b"".join(rows), f"unfilter failed for {ftypes}"


def test_decode_png_zero_image():
    w, h, ch, px = decode_png_pixels(make_png(4, 3))
    assert (w, h, ch) == (4, 3, 4)
    assert px == b"\x00" * (4 * 3 * 4)


def test_decode_png_corrupt_adler_raises():
    p = bytearray(make_png(2, 2))
    # Flip a byte inside IDAT (after the zlib header) — adler32 must
    # catch it.
    idat_at = p.find(b"IDAT") + 6
    p[idat_at] ^= 0xFF
    with pytest.raises(Exception):
        decode_png_pixels(bytes(p))


def test_decode_bmp_pixels():
    # make_bmp writes all-zero 24-bit pixels, bottom-up.
    w, h, ch, px = decode_bmp_pixels(make_bmp(5, 3))
    assert (w, h, ch) == (5, 3, 3)
    assert px == b"\x00" * (5 * 3 * 3)


def test_decode_wav_samples():
    rate, channels, samples = decode_wav_samples(make_wav(16000, 1, 7))
    assert (rate, channels) == (16000, 1)
    assert samples == [0] * 7


def test_decode_pixels_dispatch():
    assert decode_pixels(make_png(2, 2))[0:2] == (2, 2)
    assert decode_pixels(make_bmp(2, 2))[0:2] == (2, 2)
    assert decode_pixels(make_wav(8000, 1, 2))[0] == 8000
    pal = [(255, 0, 0), (0, 255, 0)]
    assert decode_pixels(make_gif_full(2, 1, b"\x00\x01", pal))[0:2] == (2, 1)
    with pytest.raises(ValueError):
        decode_pixels(make_gif(2, 2))  # header-only: no image frame
    with pytest.raises(ValueError):
        decode_pixels(b"junk bytes")


# ---------------------------------------------------------------------------
# GIF: from-scratch LZW decode
# ---------------------------------------------------------------------------

def test_gif_golden_public_1x1():
    # Canonical public 1x1 black GIF (the ubiquitous tracking-pixel
    # bytes) — pins the LZW bit conventions against external encoders.
    import base64

    golden = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAICRAEAOw=="
    )
    assert parse_media_header(golden) == {
        "format": "gif", "width": 1, "height": 1,
    }
    assert decode_gif_pixels(golden) == (1, 1, 3, b"\x00\x00\x00")


def test_gif_roundtrip_small_palette():
    pal = [(10, 20, 30), (200, 100, 50), (0, 0, 255), (255, 255, 255)]
    idx = bytes([0, 1, 2, 3, 3, 2, 1, 0, 1, 1, 2, 2])
    w, h, ch, px = decode_gif_pixels(make_gif_full(4, 3, idx, pal))
    assert (w, h, ch) == (4, 3, 3)
    assert px == b"".join(bytes(pal[i]) for i in idx)


def test_gif_roundtrip_code_width_growth():
    # 300 pixels over an 8-entry palette forces the LZW table past the
    # 16- and 32-code widths — exercises the variable-width growth on
    # both encoder and decoder sides.
    pal = [(i * 30 % 256, i * 50 % 256, i * 70 % 256) for i in range(8)]
    idx = bytes((i * i * 7 + i) % 8 for i in range(300))
    w, h, ch, px = decode_gif_pixels(make_gif_full(20, 15, idx, pal))
    assert (w, h) == (20, 15)
    assert px == b"".join(bytes(pal[i]) for i in idx)


def test_gif_interlaced():
    pal = [(0, 0, 0), (255, 255, 255)]
    # 2x9: rows alternate black/white; interlaced storage must be
    # re-ordered back to top-down row order.
    idx = b"".join(bytes([r % 2]) * 2 for r in range(9))
    w, h, ch, px = decode_gif_pixels(
        make_gif_full(2, 9, idx, pal, interlace=True)
    )
    assert (w, h) == (2, 9)
    assert px == b"".join(bytes(pal[r % 2]) * 2 for r in range(9))


def test_gif_truncation_raises_value_error_everywhere():
    # Every truncation point must surface as ValueError (the
    # decode_pixels error contract), never IndexError/struct.error.
    pal = [(1, 2, 3), (4, 5, 6)]
    full = make_gif_full(16, 16, bytes(256), pal)
    for cut in range(7, len(full), 11):
        with pytest.raises(ValueError):
            decode_gif_pixels(full[:cut])


def test_gif_truncated_pixel_data_raises():
    pal = [(1, 2, 3), (4, 5, 6)]
    idx = bytes((i * 5 + 1) % 2 for i in range(256))
    full = make_gif_full(16, 16, idx, pal)
    # chop the tail of the data sub-blocks but keep a clean terminator:
    # fewer decoded indices than the frame declares must raise
    with pytest.raises(ValueError):
        decode_gif_pixels(full[:-12] + b"\x00\x3b")


# ---------------------------------------------------------------------------
# Spark-side plumbing
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").limit(20).cache()


def test_synthesized_payloads_parse_and_decode(spark, docs):
    rows = attach_binary(docs).select("media_id", "payload").collect()
    assert rows
    formats = set()
    for r in rows:
        payload = bytes(r.payload)
        info = parse_media_header(payload)
        formats.add(info["format"])
        assert info["height"] == 1
        if info["format"] == "png":
            assert 64 <= info["width"] < 256
            # The synthesized IDAT is a genuine zlib stream: the real
            # decoder inflates it (adler32 verified) into one constant-
            # color RGBA scanline.
            w, h, ch, px = decode_png_pixels(payload)
            assert (w, h, ch) == (info["width"], 1, 4)
            first = px[:4]
            assert first[3] == 255
            assert px == first * w
        else:
            assert info["format"] == "gif"
            # Byte-aligned literal LZW: the real decoder must recover a
            # constant-color palette-mapped row at widths 64..125.
            assert 64 <= info["width"] <= 125
            w, h, ch, px = decode_gif_pixels(payload)
            assert (w, h, ch) == (info["width"], 1, 3)
            assert px == px[:3] * w
            assert (px[1], px[2]) == (255 - px[0], (2 * px[0]) % 256)
    # the md5-derived format split lands both kinds in the first 20 docs
    assert formats == {"png", "gif"}


def test_extract_features_matches_direct_parse(spark, docs):
    media = attach_binary(docs)
    feats = {r.media_id: r for r in extract_features(media).collect()}
    seen = set()
    for r in media.collect():
        payload = bytes(r.payload)
        info = parse_media_header(payload)
        f = feats[r.media_id]
        seen.add(f.format)
        assert f.byte_len == len(payload)
        assert f.width == info["width"]
        assert f.height == info["height"]
        assert f.format == info["format"]
        expected_sha = hashlib.sha256(
            payload.hex().upper().encode()
        ).hexdigest()[:16]
        assert f.sha_prefix == expected_sha
        # Pixel-derived means: constant-color scanline → exact RGB.
        if f.format == "png":
            _, _, _, px = decode_png_pixels(payload)
        else:
            _, _, _, px = decode_gif_pixels(payload)
        assert (f.mean_r, f.mean_g, f.mean_b) == (px[0], px[1], px[2])


def test_extract_features_on_genuine_mixed_corpus(spark):
    fixtures = [
        (1, make_png(320, 200)),
        (2, make_gif(99, 44)),
        (3, make_bmp(17, 9)),
        (4, make_wav(16000, 1, 5)),
        (5, b"not media"),
        (6, make_bmp_core(31, 7)),
    ]
    media = spark.createDataFrame(
        [(i, p, "image", None) for i, p in fixtures],
        "media_id long, payload binary, media_type string, "
        "meta map<string,string>",
    )
    out = {r.media_id: r for r in extract_features(media).collect()}
    assert (out[1].format, out[1].width, out[1].height) == ("png", 320, 200)
    assert (out[2].format, out[2].width, out[2].height) == ("gif", 99, 44)
    assert (out[3].format, out[3].width, out[3].height) == ("bmp", 17, 9)
    assert (out[4].format, out[4].sample_rate, out[4].channels) == (
        "wav", 16000, 1,
    )
    assert out[5].format is None and out[5].width is None
    assert (out[6].format, out[6].width, out[6].height) == ("bmp", 31, 7)
    # Pixel means: decodable zero images → 0.0; wav/unknown → null.
    assert (out[1].mean_r, out[1].mean_g, out[1].mean_b) == (0.0, 0.0, 0.0)
    assert (out[3].mean_r, out[3].mean_g, out[3].mean_b) == (0.0, 0.0, 0.0)
    assert out[2].mean_r is None  # GIF: header parsed, pixels LZW
    assert out[4].mean_r is None and out[5].mean_r is None


def test_frame_sample_plan(spark, docs):
    media = attach_video_meta(docs, fps=24)
    meta = {r.media_id: dict(r.meta) for r in media.collect()}
    out = frame_sample_plan(media, every_n=10).collect()
    by_media: dict[int, list] = {}
    for r in out:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, rows in by_media.items():
        n = int(meta[mid]["n_frames"])
        idxs = sorted(r.frame_idx for r in rows)
        assert idxs == list(range(0, n, 10))
        for r in rows:
            assert r.frame_ts_ms == r.frame_idx * 1000 // 24

def test_gif_local_color_table_overrides_global():
    # Global table says red; the frame carries a LOCAL table saying
    # blue — the decoder must use the local one.
    gpal = [(255, 0, 0), (0, 0, 0)]
    lpal = [(0, 0, 255), (255, 255, 255)]
    w, h = 3, 2
    idx = bytes([0, 1, 0, 1, 0, 1])
    base = make_gif_full(w, h, idx, gpal)
    # splice a local color table into the image descriptor
    gct_size = 2 * 3  # padded to 2 entries
    desc_pos = base.index(b"\x2c")
    packed_pos = desc_pos + 9
    lct = bytes([c for rgb in lpal for c in rgb])
    patched = (
        base[:packed_pos]
        + bytes([base[packed_pos] | 0x80 | 0x00])  # LCT flag, size 0 -> 2
        + lct
        + base[packed_pos + 1:]
    )
    got = decode_gif_pixels(patched)
    assert got == (w, h, 3, b"".join(bytes(lpal[i]) for i in idx))


def test_gif_multi_frame_returns_first():
    pal = [(9, 9, 9), (200, 200, 200)]
    f1 = make_gif_full(2, 2, bytes([0, 1, 1, 0]), pal)
    f2 = make_gif_full(2, 2, bytes([1, 1, 1, 1]), pal)
    # graft frame 2's descriptor+data after frame 1's (before trailer)
    two = f1[:-1] + f2[f2.index(b"\x2c"):]
    w, h, ch, px = decode_gif_pixels(two)
    assert (w, h) == (2, 2)
    assert px == b"".join(bytes(pal[i]) for i in [0, 1, 1, 0])


# ---------------------------------------------------------------------------
# PNG palette / Adam7 / 16-bit branches (spec §8.2, §9; forward encoder
# below is written from the same public spec, so round-trips validate
# the inverse independently)
# ---------------------------------------------------------------------------

_ADAM7_TEST = [
    (0, 0, 8, 8), (0, 4, 8, 8), (4, 0, 8, 4), (0, 2, 4, 4),
    (2, 0, 4, 2), (0, 1, 2, 2), (1, 0, 2, 1),
]


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def make_png_full(
    width: int,
    height: int,
    rows: list[bytes],
    *,
    color: int,
    depth: int = 8,
    bpp: int,
    palette: bytes | None = None,
    interlace: int = 0,
    ftype: int = 0,
) -> bytes:
    """Valid PNG from raw pixel rows for any color type / depth /
    interlace combination under test. Adam7 passes are extracted and
    forward-filtered independently (prev-row resets per pass)."""
    if interlace == 0:
        raw = _filter_rows(rows, [ftype] * height, bpp=bpp)
    else:
        raw = b""
        for row0, col0, rstep, cstep in _ADAM7_TEST:
            sub_rows = []
            for r in range(row0, height, rstep):
                row = rows[r]
                cells = [
                    row[c * bpp : (c + 1) * bpp]
                    for c in range(col0, width, cstep)
                ]
                if cells:
                    sub_rows.append(b"".join(cells))
            if sub_rows:
                raw += _filter_rows(
                    sub_rows, [ftype] * len(sub_rows), bpp=bpp
                )
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", palette)
    out += _png_chunk(b"IDAT", zlib.compress(raw))
    return out + _png_chunk(b"IEND", b"")


_PAL = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 17, 34, 51])  # 4 entries


def test_decode_png_palette():
    # 3x2 of indices; expect PLTE-mapped RGB out (channels becomes 3).
    rows = [bytes([0, 1, 2]), bytes([3, 3, 0])]
    p = make_png_full(3, 2, rows, color=3, bpp=1, palette=_PAL, ftype=1)
    w, h, ch, px = decode_png_pixels(p)
    assert (w, h, ch) == (3, 2, 3)
    assert px == bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 17, 34, 51, 17, 34, 51, 255, 0, 0]
    )


def test_decode_png_adam7_matches_progressive():
    # 9x9 RGB gradient: interlaced and non-interlaced encodes of the
    # SAME image must decode identically (9x9 exercises every pass,
    # including partially-empty edges).
    rows = [
        bytes(
            v
            for c in range(9)
            for v in ((r * 28) & 0xFF, (c * 28) & 0xFF, (r * c) & 0xFF)
        )
        for r in range(9)
    ]
    plain = make_png_full(9, 9, rows, color=2, bpp=3, ftype=4)
    inter = make_png_full(9, 9, rows, color=2, bpp=3, interlace=1, ftype=4)
    assert decode_png_pixels(plain) == decode_png_pixels(inter)
    w, h, ch, px = decode_png_pixels(inter)
    assert (w, h, ch) == (9, 9, 3) and px == b"".join(rows)


def test_decode_png_palette_adam7():
    rows = [bytes((r + c) % 4 for c in range(5)) for r in range(6)]
    inter = make_png_full(
        5, 6, rows, color=3, bpp=1, palette=_PAL, interlace=1
    )
    plain = make_png_full(5, 6, rows, color=3, bpp=1, palette=_PAL)
    assert decode_png_pixels(inter) == decode_png_pixels(plain)
    assert decode_png_pixels(inter)[2] == 3  # RGB out


def test_decode_png_16bit_gray_high_byte():
    # 2x2 gray16 big-endian samples; decode narrows to the high byte.
    samples = [0x0102, 0xFF00, 0x8040, 0x00FF]
    rows = [
        struct.pack(">2H", *samples[0:2]),
        struct.pack(">2H", *samples[2:4]),
    ]
    p = make_png_full(2, 2, rows, color=0, depth=16, bpp=2, ftype=2)
    w, h, ch, px = decode_png_pixels(p)
    assert (w, h, ch) == (2, 2, 1)
    assert px == bytes([0x01, 0xFF, 0x80, 0x00])


def test_decode_png_palette_errors():
    rows = [bytes([0, 1])]
    no_plte = make_png_full(2, 1, rows, color=3, bpp=1)
    with pytest.raises(ValueError, match="PLTE"):
        decode_png_pixels(no_plte)
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        # 16-bit palette indices are not a thing (spec: palette depth
        # <= 8) — rejected loudly, not mis-decoded.
        decode_png_pixels(
            make_png_full(2, 1, rows, color=3, depth=16, bpp=1, palette=_PAL)
        )
    # Index beyond the palette is data corruption, not a decode result.
    bad_idx = make_png_full(2, 1, [bytes([0, 200])], color=3, bpp=1,
                            palette=_PAL)
    with _pytest.raises(ValueError, match="palette index"):
        decode_png_pixels(bad_idx)


def test_adam7_grid_partitions_image():
    """The pass table must tile every pixel exactly once (guards against
    a wrong table that the shared encoder/decoder would round-trip
    'successfully' while leaving holes)."""
    for w, h in ((16, 16), (9, 9), (1, 1), (3, 5), (8, 2)):
        seen = {}
        for row0, col0, rstep, cstep in _ADAM7_TEST:
            for r in range(row0, h, rstep):
                for c in range(col0, w, cstep):
                    seen[(r, c)] = seen.get((r, c), 0) + 1
        assert seen == {(r, c): 1 for r in range(h) for c in range(w)}, (w, h)


# ---------------------------------------------------------------------------
# BMP 8-bit palette / RLE8 and WAV float32 / PCM8 branches
# ---------------------------------------------------------------------------

_BMP_PAL = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]


def _bmp_header8(width, height, data, compression):
    pal = b"".join(bytes((b, g, r, 0)) for r, g, b in _BMP_PAL)
    pal += b"\x00" * 4 * (256 - len(_BMP_PAL))
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8, compression,
                      len(data), 2835, 2835, len(_BMP_PAL), 0)
    off = 14 + 40 + len(pal)
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    return header + dib + pal + data


def test_decode_bmp_8bit_palette():
    # 3x2, bottom-up storage: file rows are (bottom) [3,3,0], (top) [0,1,2]
    rows_file = [bytes([3, 3, 0]) + b"\x00", bytes([0, 1, 2]) + b"\x00"]
    p = _bmp_header8(3, 2, b"".join(rows_file), compression=0)
    w, h, ch, px = decode_bmp_pixels(p)
    assert (w, h, ch) == (3, 2, 3)
    # top-down output: row0 = indices 0,1,2 -> red, green, blue
    assert px[:9] == bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    assert px[9:] == bytes([10, 20, 30, 10, 20, 30, 255, 0, 0])


def test_decode_bmp_rle8():
    # 4x3 bottom-up RLE8 stream:
    #   bottom row: run 4x index 1 | EOL
    #   middle row: absolute [0,1,2] (pad) + run 1x3 | EOL
    #   top row:    delta skip 2 (filled 0), run 2x index 2 | EOB
    rle = bytes(
        [4, 1, 0, 0,
         0, 3, 0, 1, 2, 0x00, 1, 3, 0, 0,
         0, 2, 2, 0, 2, 2, 0, 1]
    )
    p = _bmp_header8(4, 3, rle, compression=1)
    w, h, ch, px = decode_bmp_pixels(p)
    assert (w, h, ch) == (4, 3, 3)
    def rgb(*idxs):
        return b"".join(bytes(_BMP_PAL[i]) for i in idxs)
    assert px[0:12] == rgb(0, 0, 2, 2)      # top: delta skip then 2x blue
    assert px[12:24] == rgb(0, 1, 2, 3)     # middle: absolute + run
    assert px[24:36] == rgb(1, 1, 1, 1)     # bottom: 4x green


def _bmp_pal_lowbpp(width, height, bpp, data, compression=0):
    """Palette BMP at 1/4 bpp (same 4-color table as _bmp_header8)."""
    pal = b"".join(bytes((b, g, r, 0)) for r, g, b in _BMP_PAL)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, bpp,
                      compression, len(data), 2835, 2835, len(_BMP_PAL), 0)
    off = 14 + 40 + len(pal)
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    return header + dib + pal + data


def _bmp_direct(width, height, bpp, data, compression=0, masks=None):
    """16/32-bpp direct-color BMP, optionally with BI_BITFIELDS masks
    (which sit immediately after the 40-byte INFOHEADER)."""
    extra = struct.pack("<III", *masks) if masks else b""
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, bpp,
                      compression, len(data), 2835, 2835, 0, 0)
    off = 14 + 40 + len(extra)
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    return header + dib + extra + data


def _rgb(*idxs):
    return b"".join(bytes(_BMP_PAL[i]) for i in idxs)


def test_decode_bmp_4bit_palette():
    # 3x2 bottom-up, nibbles high-first, rows pad to 4 bytes:
    # file row order: bottom [3,3,0], top [0,1,2]
    rows_file = [b"\x33\x00\x00\x00", b"\x01\x20\x00\x00"]
    p = _bmp_pal_lowbpp(3, 2, 4, b"".join(rows_file))
    w, h, ch, px = decode_bmp_pixels(p)
    assert (w, h, ch) == (3, 2, 3)
    assert px == _rgb(0, 1, 2) + _rgb(3, 3, 0)


def test_decode_bmp_1bit_palette():
    # 3x2 bottom-up, MSB-first bits: bottom 011 -> 0x60, top 101 -> 0xA0
    rows_file = [b"\x60\x00\x00\x00", b"\xA0\x00\x00\x00"]
    p = _bmp_pal_lowbpp(3, 2, 1, b"".join(rows_file))
    w, h, ch, px = decode_bmp_pixels(p)
    assert (w, h, ch) == (3, 2, 3)
    assert px == _rgb(1, 0, 1) + _rgb(0, 1, 1)


def test_decode_bmp_rle4():
    # 4x2 bottom-up RLE4:
    #   bottom row: run 4 of 0x12 (alternating 1,2,1,2) | EOL
    #   top row:    absolute [3,0,1] (nibbles 0x30 0x10) + run 1 of
    #               0x20 (pixel 2) | EOB
    rle = bytes(
        [4, 0x12, 0, 0,
         0, 3, 0x30, 0x10, 1, 0x20, 0, 1]
    )
    p = _bmp_pal_lowbpp(4, 2, 4, rle, compression=2)
    w, h, ch, px = decode_bmp_pixels(p)
    assert (w, h, ch) == (4, 2, 3)
    assert px[:12] == _rgb(3, 0, 1, 2)   # top
    assert px[12:] == _rgb(1, 2, 1, 2)   # bottom


def test_decode_bmp_16bpp_default_555():
    # 2x1: pure red (0x7C00) and mid green (0x01E0: 15/31 -> 123)
    data = struct.pack("<HH", 0x7C00, 0x01E0)
    w, h, ch, px = decode_bmp_pixels(_bmp_direct(2, 1, 16, data))
    assert (w, h, ch) == (2, 1, 3)
    assert px == bytes([255, 0, 0, 0, 15 * 255 // 31, 0])


def test_decode_bmp_16bpp_bitfields_565():
    data = struct.pack("<HH", 0xF800, 0x07E0)  # red max, green max
    p = _bmp_direct(2, 1, 16, data, compression=3,
                    masks=(0xF800, 0x07E0, 0x001F))
    w, h, ch, px = decode_bmp_pixels(p)
    assert px == bytes([255, 0, 0, 0, 255, 0])


def test_decode_bmp_32bpp_default_xrgb():
    data = struct.pack("<I", 0x00A0B0C0)
    w, h, ch, px = decode_bmp_pixels(_bmp_direct(1, 1, 32, data))
    assert px == bytes([0xA0, 0xB0, 0xC0])


def test_decode_bmp_32bpp_bitfields_bgra_order():
    # Explicit masks with blue in the HIGH byte (nonstandard order).
    data = struct.pack("<I", 0xC0A0B000)
    p = _bmp_direct(1, 1, 32, data, compression=3,
                    masks=(0x0000FF00, 0x00FF0000, 0xFF000000))
    w, h, ch, px = decode_bmp_pixels(p)
    assert px == bytes([0xB0, 0xA0, 0xC0])


def test_decode_bmp_rle4_requires_4bpp():
    p = _bmp_header8(2, 1, b"\x00\x00", compression=2)
    with pytest.raises(ValueError, match="RLE4"):
        decode_bmp_pixels(p)


def make_wav_float(sample_rate, channels, samples):
    data = struct.pack(f"<{len(samples)}f", *samples)
    fmt = struct.pack("<HHIIHH", 3, channels, sample_rate,
                      sample_rate * channels * 4, channels * 4, 32)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_wav_float32():
    samples = [0.0, 0.5, -0.25, 1.0]
    rate, ch, out = decode_wav_samples(make_wav_float(16000, 1, samples))
    assert (rate, ch) == (16000, 1)
    assert out == pytest.approx(samples)


def test_decode_wav_pcm8():
    data = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    rate, ch, out = decode_wav_samples(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert out == [-128, 0, 127]


def test_decode_wav_unsupported_raises():
    data = b"\x00" * 6
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)  # ADPCM
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    with pytest.raises(NotImplementedError):
        decode_wav_samples(b"RIFF" + struct.pack("<I", len(body)) + body)


# ---------------------------------------------------------------------------
# PNG sub-byte depths (1/2/4-bit gray + palette, MSB-first packing)
# ---------------------------------------------------------------------------

def _pack_bits(values, depth):
    """MSB-first bit packing of one scanline of sub-byte samples
    (spec §7.2), padded to a byte boundary."""
    out = bytearray()
    acc = nbits = 0
    for v in values:
        acc = (acc << depth) | v
        nbits += depth
        if nbits == 8:
            out.append(acc)
            acc = nbits = 0
    if nbits:
        out.append(acc << (8 - nbits))
    return bytes(out)


def make_png_subbyte(width, height, value_rows, *, color, depth,
                     palette=None, interlace=0):
    """Valid sub-byte PNG from per-pixel value rows."""
    def pack(rows_vals):
        return [_pack_bits(r, depth) for r in rows_vals]

    if interlace == 0:
        packed = pack(value_rows)
        raw = b"".join(b"\x00" + r for r in packed)
    else:
        raw = b""
        for row0, col0, rstep, cstep in _ADAM7_TEST:
            sub = [
                [value_rows[r][c] for c in range(col0, width, cstep)]
                for r in range(row0, height, rstep)
                if range(col0, width, cstep)
            ]
            sub = [s for s in sub if s]
            if sub:
                raw += b"".join(b"\x00" + r for r in pack(sub))
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color, 0, 0,
                       interlace)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", palette)
    out += _png_chunk(b"IDAT", zlib.compress(raw))
    return out + _png_chunk(b"IEND", b"")


def test_decode_png_1bit_gray():
    rows = [[1, 0, 1, 0, 1, 0, 1, 0, 1], [0] * 9, [1] * 9]
    p = make_png_subbyte(9, 3, rows, color=0, depth=1)
    w, h, ch, px = decode_png_pixels(p)
    assert (w, h, ch) == (9, 3, 1)
    assert px == bytes(v * 255 for r in rows for v in r)


def test_decode_png_2bit_gray_scaling():
    rows = [[0, 1, 2, 3, 3]]
    p = make_png_subbyte(5, 1, rows, color=0, depth=2)
    assert decode_png_pixels(p)[3] == bytes([0, 85, 170, 255, 255])


def test_decode_png_4bit_palette():
    rows = [[0, 1, 2], [3, 3, 0]]
    p = make_png_subbyte(3, 2, rows, color=3, depth=4, palette=_PAL)
    w, h, ch, px = decode_png_pixels(p)
    assert (w, h, ch) == (3, 2, 3)
    assert px == bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 17, 34, 51, 17, 34, 51, 255, 0, 0]
    )


def test_decode_png_subbyte_adam7_matches_progressive():
    rows = [[(r * 3 + c) % 4 for c in range(9)] for r in range(9)]
    plain = make_png_subbyte(9, 9, rows, color=3, depth=2, palette=_PAL)
    inter = make_png_subbyte(9, 9, rows, color=3, depth=2, palette=_PAL,
                             interlace=1)
    assert decode_png_pixels(plain) == decode_png_pixels(inter)
    assert decode_png_pixels(plain)[2] == 3


def test_decode_bmp_rle8_delta_preserves_x():
    """RLE8 delta with dy > 0 moves RELATIVE to the current cursor:
    after (dx=1, dy=1) from x=2, the next write lands at x=3 of the
    next row — not at x=1 (the regression a from-scratch decoder makes
    when the flush resets x)."""
    # 4x2 bottom-up: bottom row writes 2 px of idx 1, delta(1,1),
    # then 1 px of idx 2 lands at x=3 of the TOP row; EOB.
    rle = bytes([2, 1, 0, 2, 1, 1, 1, 2, 0, 1])
    p = _bmp_header8(4, 2, rle, compression=1)
    w, h, ch, px = decode_bmp_pixels(p)
    def rgb(*idxs):
        return b"".join(bytes(_BMP_PAL[i]) for i in idxs)
    assert px[0:12] == rgb(0, 0, 0, 2)   # top row: delta skipped to x=3
    assert px[12:24] == rgb(1, 1, 0, 0)  # bottom row: 2 px then padding


def test_bmp_palette_respects_clr_used():
    """Indices at/past biClrUsed decode to deterministic black, never
    to pixel bytes misread as palette entries."""
    from sensapp_spark.pipeline.multimodal import _bmp_palette

    # Truncated table: only 2 entries stored, biClrUsed=2 declared.
    data = bytes([0, 1, 2, 3]) * 2  # 8 pixel-ish bytes after the table
    pal = b"".join(bytes((b, g, r, 0)) for r, g, b in _BMP_PAL[:2])
    dib = struct.pack("<IiiHHIIiiII", 40, 4, 1, 1, 8, 0, 8, 2835, 2835,
                      2, 0)
    payload = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pal) + len(data),
                          0, 0, 14 + 40 + len(pal)) + dib + pal + data
    table = _bmp_palette(payload, 40, clr_used=2)
    assert table[0] == bytes(_BMP_PAL[0]) and table[1] == bytes(_BMP_PAL[1])
    assert table[2] == b"\x00\x00\x00"  # NOT the pixel bytes after PLTE
