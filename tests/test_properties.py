"""Property-based tests (hypothesis) — beyond the reference's
example-based suite (SURVEY §5 notes it has no property testing).

Each property pins an invariant that example tests can't sweep:
codec round-trips over arbitrary inputs, parser/lattice laws, identity
hash stability.
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from sensapp_spark.datamodel.sensor import sensor_uuid
from sensapp_spark.datamodel.types import SensorType
from sensapp_spark.ingest.inference import (
    InferredType,
    infer_cell,
    infer_column,
)
from sensapp_spark.wire import snappy_codec
from sensapp_spark.wire.protowire import (
    Writer,
    decode_varint,
    encode_varint,
    iter_fields,
    signed64,
)
from sensapp_spark.wire.xorchunk import decode_xor_chunk, encode_xor_chunk

# -- codecs -----------------------------------------------------------------


@given(st.binary(max_size=200_000))
@settings(max_examples=50, deadline=None)
def test_snappy_roundtrip_any_bytes(payload):
    assert snappy_codec.decompress(snappy_codec.compress(payload)) == payload


@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_varint_roundtrip(n):
    value, pos = decode_varint(encode_varint(n), 0)
    assert value == n


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_varint_signed64_roundtrip(n):
    raw, _ = decode_varint(encode_varint(n), 0)
    assert signed64(raw) == n


_ts_values = st.floats(
    allow_nan=False, allow_infinity=True, width=64
)


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10_000_000),
                  _ts_values),
        min_size=0, max_size=200,
    )
)
@settings(max_examples=60, deadline=None)
def test_xor_chunk_roundtrip_random_series(deltas):
    t = 1_600_000_000_000
    samples = []
    for d, v in deltas:
        t += d
        samples.append((t, v))
    assert decode_xor_chunk(encode_xor_chunk(samples)) == samples


@given(st.lists(st.tuples(st.text(max_size=20), st.text(max_size=20)),
                max_size=10))
def test_protowire_string_fields_roundtrip(pairs):
    w = Writer()
    for name, value in pairs:
        w.message(1, Writer().string(1, name).string(2, value))
    decoded = []
    for f, _, v in iter_fields(bytes(w)):
        inner = {g: x for g, _, x in iter_fields(v)}
        decoded.append((inner.get(1, b"").decode(), inner.get(2, b"").decode()))
    assert decoded == pairs


# -- inference laws ---------------------------------------------------------


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_integers_always_infer_integer(n):
    assert infer_cell(str(n)) == (InferredType.INTEGER, n)


@given(st.floats(allow_nan=False, allow_infinity=False))
def test_finite_float_repr_infers_numeric_kind(f):
    kind, value = infer_cell(repr(f))
    assert kind in (InferredType.INTEGER, InferredType.FLOAT)
    assert math.isclose(float(value), f, rel_tol=1e-15)


@given(st.lists(st.sampled_from(["1", "2.5", "true", "x", "{}",
                                 "2020-01-01T00:00:00Z", ""]),
                min_size=1, max_size=8))
def test_lattice_string_dominates(cells):
    # Law: if any cell is a String, the column is String with original
    # content (columns.rs:57-61).
    kinds = {infer_cell(c)[0] for c in cells}
    k, values = infer_column(cells)
    if InferredType.STRING in kinds:
        assert k is InferredType.STRING and values == cells


@given(st.lists(st.integers(-10**15, 10**15).map(str), min_size=1, max_size=20))
def test_lattice_pure_integers(cells):
    assert infer_column(cells) == (InferredType.INTEGER,
                                   [int(c) for c in cells])


@given(st.datetimes(min_value=dt.datetime(1900, 1, 1),
                    max_value=dt.datetime(2100, 1, 1)))
def test_iso_datetime_cells_infer_datetime(d):
    s = d.strftime("%Y-%m-%dT%H:%M:%S") + "Z"
    kind, value = infer_cell(s)
    assert kind is InferredType.DATETIME
    assert value == d.replace(microsecond=0, tzinfo=dt.timezone.utc)


# -- identity ---------------------------------------------------------------

_label_text = st.text(
    alphabet=st.characters(blacklist_characters="\x0b\x1c\x1d\x1e\x1f",
                           blacklist_categories=("Cs",)),
    max_size=12,
)


@given(st.dictionaries(_label_text, _label_text, max_size=5))
@settings(max_examples=50, deadline=None)
def test_sensor_uuid_label_order_invariance(labels):
    a = sensor_uuid("m", SensorType.FLOAT, None, labels)
    b = sensor_uuid("m", SensorType.FLOAT, None,
                    dict(reversed(list(labels.items()))))
    assert a == b


@given(_label_text.filter(lambda s: s))
@settings(max_examples=50, deadline=None)
def test_sensor_uuid_name_prefix_property(name):
    # First 8 hex chars depend only on the name (sensor.rs:159-175).
    a = sensor_uuid(name, SensorType.FLOAT, None, {"k": "1"})
    b = sensor_uuid(name, SensorType.INTEGER, "unit", {"k": "2"})
    assert a[:8] == b[:8]


# ---------------------------------------------------------------------------
# GIF LZW codec round-trip (pipeline/multimodal.py)
# ---------------------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=12),
    n_colors=st.integers(min_value=2, max_value=16),
    data=st.data(),
    interlace=st.booleans(),
)
def test_gif_lzw_roundtrip_arbitrary_frames(w, h, n_colors, data, interlace):
    """Any index frame over any small palette must survive the full
    container encode (test encoder) → decode (real decoder) cycle,
    including variable code-width growth and interlaced row order."""
    from tests.test_multimodal import make_gif_full

    from sensapp_spark.pipeline.multimodal import decode_gif_pixels

    palette = [(i * 17 % 256, i * 29 % 256, i * 43 % 256)
               for i in range(n_colors)]
    idx = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=n_colors - 1),
                min_size=w * h, max_size=w * h,
            )
        )
    )
    payload = make_gif_full(w, h, idx, palette, interlace=interlace)
    got_w, got_h, ch, px = decode_gif_pixels(payload)
    assert (got_w, got_h, ch) == (w, h, 3)
    assert px == b"".join(bytes(palette[i]) for i in idx)


# ---------------------------------------------------------------------------
# Chunk-plan window arithmetic (pipeline/text.py) — pure replay of the
# closed-form last-start, no Spark session needed
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=5000),
    chunk=st.integers(min_value=2, max_value=512),
    data=st.data(),
)
def test_chunk_windows_cover_exactly(n, chunk, data):
    """The closed-form window starts must (a) cover every token,
    (b) start a window only when it adds new tokens, (c) overlap
    consecutive windows by exactly `overlap` away from the tail, and
    (d) emit exactly one window for short documents."""
    import math

    overlap = data.draw(st.integers(min_value=0, max_value=chunk - 1))
    step = chunk - overlap
    last_start = max(0, math.floor((n - overlap - 1) / step) * step)
    starts = list(range(0, last_start + 1, step))
    covered = set()
    prev_end = None
    for s in starts:
        end = min(n, s + chunk)
        assert s < n, f"window starts past the document ({s} >= {n})"
        if prev_end is not None:
            assert end > prev_end, "window adds no new tokens"
        covered.update(range(s, end))
        prev_end = end
    assert covered == set(range(n)), "tokens not fully covered"
    if n <= chunk:
        assert starts == [0]


# ---------------------------------------------------------------------------
# PNG decode round-trip (round-5 branches: filters x color types x
# depths x Adam7) — the forward encoder lives in test_multimodal and is
# written independently from the same public spec
# ---------------------------------------------------------------------------

@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 11),
    h=st.integers(1, 11),
    color=st.sampled_from([0, 2, 4, 6]),
    ftype=st.integers(0, 4),
    interlace=st.sampled_from([0, 1]),
    seed=st.integers(0, 2**31),
)
def test_png_roundtrip_any_geometry(w, h, color, ftype, interlace, seed):
    import random

    from test_multimodal import make_png_full

    from sensapp_spark.pipeline.multimodal import decode_png_pixels

    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    rng = random.Random(seed)
    rows = [bytes(rng.randrange(256) for _ in range(w * ch))
            for _ in range(h)]
    p = make_png_full(w, h, rows, color=color, bpp=ch,
                      interlace=interlace, ftype=ftype)
    got = decode_png_pixels(p)
    assert got == (w, h, ch, b"".join(rows))


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    depth=st.sampled_from([1, 2, 4]),
    interlace=st.sampled_from([0, 1]),
    seed=st.integers(0, 2**31),
)
def test_png_subbyte_gray_roundtrip(w, h, depth, interlace, seed):
    import random

    from test_multimodal import make_png_subbyte

    from sensapp_spark.pipeline.multimodal import decode_png_pixels

    rng = random.Random(seed)
    mx = (1 << depth) - 1
    rows = [[rng.randrange(mx + 1) for _ in range(w)] for _ in range(h)]
    p = make_png_subbyte(w, h, rows, color=0, depth=depth,
                         interlace=interlace)
    scale = 255 // mx
    got = decode_png_pixels(p)
    assert got == (w, h, 1, bytes(v * scale for r in rows for v in r))
