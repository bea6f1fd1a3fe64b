"""Inference engine tests (I1-I6) — ports the corpus from reference
src/infer/columns.rs:169-358, src/infer/parsing.rs tests,
tests/parser_edge_cases.rs, and FIXTURES.md §F3."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from sensapp_spark.ingest.inference import (
    InferredType,
    datetime_score,
    infer_cell,
    infer_column,
    is_header,
    likely_datetime_column,
    likely_geo_columns,
    parse_datetime,
)

I = InferredType


def kind(col, trim=True, numeric=False):
    return infer_column(col, trim, numeric)[0]


# -- I1 cell parser chain ---------------------------------------------------

def test_cell_integer():
    assert infer_cell("42") == (I.INTEGER, 42)
    assert infer_cell("-42") == (I.INTEGER, -42)
    # i64 overflow falls through to float (parsing.rs:238-244)
    k, v = infer_cell("123456789123456789123456789")
    assert k is I.FLOAT


def test_cell_float():
    assert infer_cell("1.5") == (I.FLOAT, 1.5)
    assert infer_cell("-3.14e2") == (I.FLOAT, -314.0)
    assert infer_cell(".5") == (I.FLOAT, 0.5)


def test_cell_nan_inf_are_strings():
    # Reference rejects NaN/Inf as floats (parsing.rs:33-46).
    for s in ("NaN", "nan", "inf", "-inf", "Infinity"):
        assert infer_cell(s)[0] is I.STRING


def test_cell_boolean():
    assert infer_cell("true") == (I.BOOLEAN, True)
    assert infer_cell("FALSE") == (I.BOOLEAN, False)
    assert infer_cell("TrUe") == (I.BOOLEAN, True)
    assert infer_cell("truex")[0] is I.STRING


def test_cell_trim_modes():
    assert infer_cell(" 42 ", trim=True) == (I.INTEGER, 42)
    assert infer_cell(" 42 ", trim=False)[0] is I.STRING
    # Strings are never trimmed: original content preserved.
    assert infer_cell(" .  ", trim=True) == (I.STRING, " .  ")


def test_cell_numeric_mode():
    assert infer_cell("2.2", numeric=True) == (I.NUMERIC, Decimal("2.2"))
    assert infer_cell("78953678389071", numeric=True) == (
        I.NUMERIC, Decimal("78953678389071"))


def test_cell_json():
    assert infer_cell('{"a": 1}') == (I.JSON, {"a": 1})
    assert infer_cell('[{"b": 2}]') == (I.JSON, [{"b": 2}])
    assert infer_cell("{not json}")[0] is I.STRING
    assert infer_cell("[1, 2")[0] is I.STRING


def test_cell_datetime():
    k, v = infer_cell("2020-01-01T00:00:00Z")
    assert k is I.DATETIME
    assert v == dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc)


def test_datetime_additive_tz_quirk():
    # Reference ADDS the offset (parsing.rs:126-131; columns.rs:330-332):
    # 1951-10-26T00:00:00+02:00 → 1951-10-26T02:00:00Z.
    v = parse_datetime("1951-10-26T00:00:00+02:00")
    assert v == dt.datetime(1951, 10, 26, 2, 0, 0, tzinfo=dt.timezone.utc)


def test_datetime_ordinal_date():
    # From reference columns.rs:343-356: 1969-358T14:21:32.0933+05:35
    # → 1969-12-24T19:56:32.093Z.
    v = parse_datetime("1969-358T14:21:32.0933+05:35")
    assert v == dt.datetime(1969, 12, 24, 19, 56, 32, 93300,
                            tzinfo=dt.timezone.utc)


# -- I2 column lattice ------------------------------------------------------

def test_column_integers():
    assert infer_column(["1", "2", "3", "4"], False, False) == (
        I.INTEGER, [1, 2, 3, 4])


def test_column_floats_absorb_integers():
    assert infer_column(["1.1", "2", "3.3", "4"], False, False) == (
        I.FLOAT, [1.1, 2.0, 3.3, 4.0])


def test_column_numeric_mode():
    assert kind(["1", "2.2", "78953678389071"], numeric=True) is I.NUMERIC


def test_column_booleans():
    assert infer_column([" true ", "false", "TRUE", "FALSE\n"], True, False) == (
        I.BOOLEAN, [True, False, True, False])


def test_column_bool_mixed_with_number_is_string():
    # columns.rs:253-264
    col = [" true ", "false", "42"]
    assert infer_column(col, True, True) == (I.STRING, col)


def test_column_any_string_wins():
    col = ["abcd", "efgh", " .  ", "42", "true"]
    assert infer_column(col, True, False) == (I.STRING, col)


def test_column_json_absorbs_scalars():
    # columns.rs:311-334
    col = ['{"a": 1}', '[{"b": 2}]', "42", "42.83", "true",
           "1951-10-26T00:00:00+02:00"]
    k, vals = infer_column(col, True, False)
    assert k is I.JSON
    assert vals == [{"a": 1}, [{"b": 2}], 42, 42.83, True,
                    "1951-10-26T02:00:00+00:00"]


def test_column_datetime_mixed_with_number_is_string():
    assert kind(["2020-01-01T00:00:00Z", "42"]) is I.STRING


def test_column_pure_datetimes():
    k, vals = infer_column(
        ["2020-01-01T00:00:00Z", "1969-358T14:21:32.0933+05:35"], True, False)
    assert k is I.DATETIME
    assert vals[0] == dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc)


def test_column_empty_fallback_integer():
    assert infer_column([], True, False) == (I.INTEGER, [])


# -- I5 header detection ----------------------------------------------------

def test_is_header():
    assert is_header(["name", "value"])
    assert not is_header(["name", "value", "3"])
    assert not is_header(["name", "value", ""])
    assert not is_header([])


# -- I3 datetime column guesser ---------------------------------------------

def test_datetime_guesser_by_name():
    cols = {
        "datetime": (I.STRING, ["x"]),   # 100 - 100 = 0
        "timestamp": (I.INTEGER, [1700000000]),  # 99 + 42 = 141
        "value": (I.FLOAT, [1.5]),       # 0 + 1 = 1
    }
    names = list(cols)
    assert likely_datetime_column(names, [cols[n] for n in names]) == "timestamp"


def test_datetime_guesser_epoch_range():
    assert datetime_score("x", I.INTEGER, [1700000000, 1700000001]) == 42
    assert datetime_score("x", I.INTEGER, [5, 1700000000]) == 2
    assert datetime_score("ts_time", I.FLOAT, [1.7e9]) == 9 + 32


def test_datetime_guesser_threshold():
    # Sub-threshold (<5) candidates are ignored.
    assert likely_datetime_column(["v"], [(I.INTEGER, [3])]) is None


def test_datetime_guesser_prefers_real_datetime_column():
    names = ["when", "reading"]
    cols = [(I.DATETIME, [dt.datetime(2024, 1, 1)]), (I.FLOAT, [2.0])]
    assert likely_datetime_column(names, cols) == "when"


# -- I4 geo guesser ---------------------------------------------------------

def test_geo_guesser():
    names = ["gps_lat", "gps_lon", "value"]
    cols = [(I.FLOAT, [59.9, 60.1]), (I.FLOAT, [10.7, 10.8]), (I.FLOAT, [1.0])]
    assert likely_geo_columns(names, cols) == ("gps_lat", "gps_lon")


def test_geo_guesser_range_validation():
    names = ["latitude", "longitude"]
    cols = [(I.FLOAT, [95.0]), (I.FLOAT, [10.0])]  # lat out of range
    assert likely_geo_columns(names, cols) is None


def test_geo_guesser_requires_both():
    assert likely_geo_columns(["latitude"], [(I.FLOAT, [45.0])]) is None


# ---------------------------------------------------------------------------
# Reference parser edge-case parity (tests/parser_edge_cases.rs) —
# behaviors verified identical to the Rust nom chain.
# ---------------------------------------------------------------------------

def test_i64_bounds_and_overflow():
    # parser_edge_cases.rs:45-58: i64 extremes stay Integer; one past
    # the bound falls through to the float parser (Rust from_str fails
    # the same way).
    assert infer_cell("9223372036854775807") == (
        InferredType.INTEGER, 9223372036854775807)
    assert infer_cell("-9223372036854775808") == (
        InferredType.INTEGER, -9223372036854775808)
    t, v = infer_cell("9223372036854775808")
    assert t is InferredType.FLOAT


def test_scientific_notation_is_float():
    # parser_edge_cases.rs:59-61
    assert infer_cell("1.5e10") == (InferredType.FLOAT, 1.5e10)
    assert infer_cell("2.5E-3") == (InferredType.FLOAT, 2.5e-3)


def test_boolean_lookalikes_stay_strings():
    # parser_edge_cases.rs:85-96: yes/no are NOT booleans; 1/0 are ints.
    assert infer_cell("yes") == (InferredType.STRING, "yes")
    assert infer_cell("no") == (InferredType.STRING, "no")
    assert infer_cell("1") == (InferredType.INTEGER, 1)
    assert infer_cell("0") == (InferredType.INTEGER, 0)


def test_unicode_passthrough():
    # parser_edge_cases.rs:156-186
    for s in ("café", "北京", "🚀", 'data"with"quotes', "data\nwith\nnewlines"):
        assert infer_cell(s) == (InferredType.STRING, s)


def test_numeric_mode_preserves_decimal_precision():
    # parser_edge_cases.rs:257-283: exact Decimals under numeric mode,
    # floats otherwise.
    from decimal import Decimal

    t, v = infer_column(["123.456789", "987.654321", "0.000001"], numeric=True)
    assert t is InferredType.NUMERIC
    assert v == [Decimal("123.456789"), Decimal("987.654321"),
                 Decimal("0.000001")]
    t2, _ = infer_column(["123.456789", "987.654321", "0.000001"],
                         numeric=False)
    assert t2 is InferredType.FLOAT


def test_timestamp_ms_name_detection():
    # parser_edge_cases.rs:285-302: "timestamp_ms" beats plain integer
    # columns via the name+epoch-range score.
    cols = [
        (InferredType.INTEGER, [1, 2, 3]),
        (InferredType.INTEGER,
         [1609459200000, 1609459260000, 1609459320000]),
        (InferredType.FLOAT, [20.5, 21.0, 21.5]),
    ]
    assert likely_datetime_column(
        ["id", "timestamp_ms", "value"], cols) == "timestamp_ms"


def test_abbreviated_geo_columns_lat_lng():
    # parser_edge_cases.rs:369-387: lat/lng abbreviations + value-range
    # validation.
    geo = likely_geo_columns(
        ["lat", "lng", "speed"],
        [(InferredType.FLOAT, [40.7128, 40.7129, 40.7130]),
         (InferredType.FLOAT, [-74.0060, -74.0061, -74.0062]),
         (InferredType.FLOAT, [50.0, 55.0, 60.0])],
    )
    assert geo == ("lat", "lng")
