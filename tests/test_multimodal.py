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
    decode_pixels,
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
    screen = struct.pack("<HH", width, height) + bytes([0x00, 0x00, 0x00])
    return b"GIF89a" + screen + b"\x3b"


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


def test_decode_pixels_is_declared_stub():
    with pytest.raises(NotImplementedError):
        decode_pixels(make_png(2, 2))


# ---------------------------------------------------------------------------
# Spark-side plumbing
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").limit(20).cache()


def test_synthesized_png_parses_with_real_parser(spark, docs):
    rows = attach_binary(docs).select("media_id", "payload").collect()
    assert rows
    for r in rows:
        payload = bytes(r.payload)
        info = parse_media_header(payload)
        assert info["format"] == "png"
        assert 64 <= info["width"] < 256
        assert 64 <= info["height"] < 256


def test_extract_features_matches_direct_parse(spark, docs):
    media = attach_binary(docs)
    feats = {r.media_id: r for r in extract_features(media).collect()}
    for r in media.collect():
        payload = bytes(r.payload)
        info = parse_media_header(payload)
        f = feats[r.media_id]
        assert f.byte_len == len(payload)
        assert f.width == info["width"]
        assert f.height == info["height"]
        assert f.format == "png"
        expected_sha = hashlib.sha256(
            payload.hex().upper().encode()
        ).hexdigest()[:16]
        assert f.sha_prefix == expected_sha


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