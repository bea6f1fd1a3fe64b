"""CSV schema-on-read type inference (operators I1-I6).

Semantics follow the reference's inference engine:

* per-cell parser chain (reference src/infer/parsing.rs:171-223):
  Integer → Float (NaN/Inf rejected → String) → Boolean → ISO8601
  DateTime → JSON → String fallback; ``numeric`` mode replaces
  Integer+Float with exact Decimal; ``trim`` mode ignores surrounding
  whitespace for everything except Strings.
* column-level type lattice (src/infer/columns.rs:17-167): any String ⇒
  String; JSON absorbs scalars; Boolean or DateTime mixed with numbers ⇒
  String; Numeric wins over Float; Float absorbs Integer; empty ⇒ Integer.
* datetime column scoring (src/infer/datetime_guesser.rs:27-107): name
  weights + content weights, threshold ≥ 5, max wins.
* geo column scoring (src/infer/geo_guesser.rs:36-117).
* header detection (src/infer/is_header.rs:3-19): first row is a header
  iff every cell infers as a non-empty String.

Two deliberate reference quirks are replicated (documented here so they
don't look like bugs):

* **Additive timezone offsets**: the reference *adds* the UTC offset to
  the wall-clock time instead of subtracting it
  (parsing.rs:126-131 — ``1951-10-26T00:00:00+02:00`` becomes
  ``1951-10-26T02:00:00Z``, per its own test columns.rs:311-334).
* ``NaN``/``inf`` strings are rejected as floats and fall through to
  String (parsing.rs:33-46).

This module is pure Python and runs on a ≤128-row sample on the driver
(SENSAPP_MAX_INFERENCES_ROWS, reference src/config/mod.rs:24-26); the
resulting schema drives JVM-side casts over the full data — inference
never touches the big scan.
"""

from __future__ import annotations

import datetime as dt
import json
import re
from decimal import Decimal, InvalidOperation, localcontext
from enum import Enum

I64_MIN, I64_MAX = -(2**63), 2**63 - 1

_INT_RE = re.compile(r"[+-]?\d+")
_FLOAT_RE = re.compile(
    r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?"
)
_BOOL_RE = re.compile(r"(?i)true|false")
# ISO8601 date: YMD | ordinal (YYYY-DDD) | week (YYYY-Www-D)
_ISO_DT_RE = re.compile(
    r"""
    (?P<year>[+-]?\d{4})
    (?:
        -(?P<week>W\d{2})-(?P<wday>\d)
      | -(?P<ord>\d{3})
      | -(?P<month>\d{2})-(?P<day>\d{2})
    )
    [Tt\ ]
    (?P<hour>\d{2}):(?P<minute>\d{2})
    (?::(?P<second>\d{2})(?:[.,](?P<frac>\d+))?)?
    (?P<tz>[Zz]|[+-]\d{2}(?::?\d{2})?)?
    """,
    re.VERBOSE,
)


class InferredType(Enum):
    INTEGER = "Integer"
    NUMERIC = "Numeric"
    FLOAT = "Float"
    STRING = "String"
    BOOLEAN = "Boolean"
    DATETIME = "DateTime"
    JSON = "Json"


def _full(m: re.Match | None, s: str) -> bool:
    return m is not None and m.group(0) == s


def parse_integer(s: str) -> int | None:
    if _full(_INT_RE.fullmatch(s), s):
        v = int(s)
        if I64_MIN <= v <= I64_MAX:
            return v
    return None


def parse_float(s: str) -> float | None:
    # NaN/Inf deliberately NOT matched by the pattern → treated as String
    # (reference parsing.rs:33-46).
    if _FLOAT_RE.fullmatch(s):
        return float(s)
    return None


def parse_numeric(s: str) -> Decimal | None:
    if not _FLOAT_RE.fullmatch(s):
        return None
    try:
        with localcontext() as ctx:
            ctx.prec = 38
            return Decimal(s)
    except InvalidOperation:
        return None


def parse_boolean(s: str) -> bool | None:
    if _BOOL_RE.fullmatch(s):
        return s.lower() == "true"
    return None


def parse_datetime(s: str) -> dt.datetime | None:
    """ISO8601 datetime incl. ordinal and week dates, with the reference's
    additive-timezone quirk. Returns a tz-aware UTC datetime."""
    m = _ISO_DT_RE.fullmatch(s)
    if m is None:
        return None
    try:
        year = int(m["year"])
        if m["ord"]:
            base = dt.datetime(year, 1, 1) + dt.timedelta(days=int(m["ord"]) - 1)
        elif m["week"]:
            ww = int(m["week"][1:])
            base = dt.datetime(year, 1, 1) + dt.timedelta(
                days=7 * (ww - 1) + int(m["wday"]) - 1
            )
        else:
            base = dt.datetime(year, int(m["month"]), int(m["day"]))
        micros = int((m["frac"] or "0").ljust(6, "0")[:6])
        base = base.replace(
            hour=int(m["hour"]),
            minute=int(m["minute"]),
            second=int(m["second"] or 0),
            microsecond=micros,
        )
        tz = m["tz"]
        if tz and tz not in ("Z", "z"):
            sign = 1 if tz[0] == "+" else -1
            hh = int(tz[1:3])
            mm = int(tz.replace(":", "")[3:5] or 0)
            # Reference quirk: offsets are ADDED, not subtracted
            # (parsing.rs:126-131).
            base += sign * dt.timedelta(hours=hh, minutes=mm)
        return base.replace(tzinfo=dt.timezone.utc)
    except (ValueError, OverflowError):
        return None


def parse_json(s: str):
    likely = (s.startswith("{") and s.endswith("}")) or (
        s.startswith("[") and s.endswith("]")
    )
    if not likely:
        return None
    try:
        return (json.loads(s),)  # wrapped so a parsed ``null``/False is truthy
    except (json.JSONDecodeError, RecursionError):
        return None


def infer_cell(
    s: str, trim: bool = True, numeric: bool = False
) -> tuple[InferredType, object]:
    """Operator I1: parser chain over one cell. Chain order matters —
    reference parsing.rs:171-223."""
    probe = s.strip() if trim else s
    if numeric:
        d = parse_numeric(probe)
        if d is not None:
            return InferredType.NUMERIC, d
    else:
        i = parse_integer(probe)
        if i is not None:
            return InferredType.INTEGER, i
        f = parse_float(probe)
        if f is not None:
            return InferredType.FLOAT, f
    b = parse_boolean(probe)
    if b is not None:
        return InferredType.BOOLEAN, b
    t = parse_datetime(probe)
    if t is not None:
        return InferredType.DATETIME, t
    j = parse_json(probe)
    if j is not None:
        return InferredType.JSON, j[0]
    return InferredType.STRING, s  # untrimmed original, like the reference


def _rfc3339(t: dt.datetime) -> str:
    return t.strftime("%Y-%m-%dT%H:%M:%S") + (
        f".{t.microsecond:06d}".rstrip("0").rstrip(".") if t.microsecond else ""
    ) + "+00:00"


def infer_column(
    column: list[str], trim: bool = True, numeric: bool = False
) -> tuple[InferredType, list]:
    """Operator I2: column-level type lattice (reference columns.rs:17-167).

    Returns the unified type and the converted values.
    """
    inferred = [infer_cell(v, trim, numeric) for v in column]
    kinds = {k for k, _ in inferred}

    if InferredType.STRING in kinds:
        return InferredType.STRING, list(column)
    if InferredType.JSON in kinds:
        out = []
        for k, v in inferred:
            if k is InferredType.JSON:
                out.append(v)
            elif k is InferredType.DATETIME:
                out.append(_rfc3339(v))
            elif k is InferredType.NUMERIC:
                out.append(float(v))
            else:  # Integer / Float / Boolean are valid JSON scalars
                out.append(v)
        return InferredType.JSON, out
    if InferredType.BOOLEAN in kinds:
        if kinds & {
            InferredType.INTEGER,
            InferredType.NUMERIC,
            InferredType.FLOAT,
            InferredType.DATETIME,
        }:
            return InferredType.STRING, list(column)
        return InferredType.BOOLEAN, [v for _, v in inferred]
    if InferredType.DATETIME in kinds:
        if kinds & {InferredType.INTEGER, InferredType.NUMERIC, InferredType.FLOAT}:
            return InferredType.STRING, list(column)
        return InferredType.DATETIME, [v for _, v in inferred]
    if InferredType.NUMERIC in kinds:
        return InferredType.NUMERIC, [v for _, v in inferred]
    if InferredType.FLOAT in kinds:
        return InferredType.FLOAT, [
            float(v) for _, v in inferred
        ]  # integers absorbed
    if InferredType.INTEGER in kinds:
        return InferredType.INTEGER, [v for _, v in inferred]
    return InferredType.INTEGER, []  # empty column fallback (columns.rs:162-166)


def is_header(cells: list[str]) -> bool:
    """Operator I5: first row is a header iff every cell infers (untrimmed)
    as a non-empty String (reference is_header.rs:3-19)."""
    if not cells:
        return False
    for cell in cells:
        kind, value = infer_cell(cell, trim=False, numeric=False)
        if kind is not InferredType.STRING or value == "":
            return False
    return True


# --------------------------------------------------------------------------
# I3 — datetime column guesser (reference datetime_guesser.rs:27-107)
# --------------------------------------------------------------------------

EPOCH_LO, EPOCH_HI = 946_684_800, 4_670_438_400  # 2000-01-01 .. 2118-01-01

_NAME_SCORES = {
    "datetime": 100,
    "timestamp": 99,
    "date": 50,
    "time": 49,
    "created_at": 38,
    "createdat": 38,
    "updated_at": 37,
    "updatedat ": 37,  # trailing space replicates datetime_guesser.rs:36
    "recorded_at": 36,
    "recordedat": 36,
}


def datetime_score(column_name: str, col_type: InferredType, values: list) -> int:
    name = column_name.lower()
    score = _NAME_SCORES.get(name, 0)
    if score == 0:
        if "date" in name:
            score += 10
        if "time" in name:
            score += 9
        if name.endswith("at"):
            score += 4
    if col_type is InferredType.DATETIME:
        score += 100
    elif col_type is InferredType.INTEGER:
        score += 42 if all(EPOCH_LO <= v <= EPOCH_HI for v in values) else 2
    elif col_type is InferredType.NUMERIC:
        score += 42 if all(EPOCH_LO <= v <= EPOCH_HI for v in values) else 2
    elif col_type is InferredType.FLOAT:
        score += 32 if all(EPOCH_LO <= v <= EPOCH_HI for v in values) else 1
    elif col_type is InferredType.BOOLEAN:
        score -= 80
    elif col_type is InferredType.STRING:
        score -= 100
    elif col_type is InferredType.JSON:
        score -= 128
    return score


def likely_datetime_column(
    column_names: list[str],
    columns: list[tuple[InferredType, list]],
) -> str | None:
    best_name, best_score = None, None
    for name, (kind, values) in zip(column_names, columns):
        s = datetime_score(name, kind, values)
        if s >= 5 and (best_score is None or s > best_score):
            best_name, best_score = name, s
    return best_name


# --------------------------------------------------------------------------
# I4 — geo column guesser (reference geo_guesser.rs:36-117)
# --------------------------------------------------------------------------

_GEO_PREFIX = (
    r"(?i)^(gps_?(loc_?|location_?|position_?|)|geo_?(loc_?|location_?|position_?|)"
    r"|position_?|pos_?|coord_?|coordinates_?|)"
)
_LAT_RE = re.compile(_GEO_PREFIX + r"(lat|latitude)$")
_LON_RE = re.compile(_GEO_PREFIX + r"(lng|lon|long|longitude)$")


def _geo_score(
    regex: re.Pattern, lo: float, hi: float, name: str,
    col_type: InferredType, values: list,
) -> int:
    score = 100 if regex.match(name) else -200
    if col_type in (InferredType.FLOAT, InferredType.NUMERIC):
        ok = all(lo <= float(v) <= hi for v in values)
        base = 99 if col_type is InferredType.FLOAT else 98
        score += base if ok else (-101 if col_type is InferredType.FLOAT else -102)
    else:
        score += -103
    return score


def likely_geo_columns(
    column_names: list[str],
    columns: list[tuple[InferredType, list]],
) -> tuple[str, str] | None:
    """Returns (latitude_column, longitude_column) or None."""

    def best(regex, lo, hi):
        top, top_score = None, 0
        for name, (kind, values) in zip(column_names, columns):
            s = _geo_score(regex, lo, hi, name, kind, values)
            if s > 0 and s > top_score:
                top, top_score = name, s
        return top

    lat = best(_LAT_RE, -90.0, 90.0)
    if lat is None:
        return None
    lon = best(_LON_RE, -180.0, 180.0)
    if lon is None:
        return None
    return lat, lon


# --------------------------------------------------------------------------
# I6 — UUID literal recognizer (reference src/infer/uuid.rs:26-60)
# --------------------------------------------------------------------------

_UUID_RE = re.compile(
    r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-"
    r"[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"
)


def parse_uuid(s: str) -> str | None:
    """Operator I6: recognize a UUID literal (8-4-4-4-12 hex groups);
    returns the canonical lowercase form or None."""
    if _UUID_RE.fullmatch(s):
        return s.lower()
    return None
