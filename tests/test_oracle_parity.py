"""Replicates the driver's correctness gate locally: every entry in
``queries()`` is run via Spark and its ``oracle_sql()`` via DuckDB on the
same parquet, and results must match (row count, column names, dtypes,
values — order-insensitive). Runs at sf0.001 for speed; the driver runs
sf0.01.

The dtype check exists because the driver's value-hash is type-sensitive:
round 2's ``events_sessionize`` produced identical VALUES but hashed
differently because DuckDB emitted HUGEINT where Spark emitted BIGINT —
and the old string-normalizing gate here let it through. Dtypes are
compared in canonical form (datetime units, pandas nullable-vs-numpy
carriers, AND integer widths all collapsed — int32 vs int64 passes, as
``canonical_dtypes`` documents) while the int-vs-float KIND stays
strict: the HUGEINT regression is caught because HUGEINT marshals to
float64, flipping the kind.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from sensapp_spark.plans.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def canonical_dtypes(df: pd.DataFrame) -> dict[str, str]:
    """Dtype map collapsed to the KIND the driver's hash actually sees
    (both engines marshal values to Python scalars): all integer widths
    and carriers → "int", all floats → "float", datetime units →
    "datetime". What stays visible is exactly what bit round 2:
    int-vs-float divergence (DuckDB HUGEINT marshals as float64 while
    Spark BIGINT stays int) and int/float-vs-object/bool mixups."""
    out = {}
    for col in df.columns:
        s = str(df.dtypes[col]).lower()
        if s.startswith("datetime64"):
            s = "datetime"
        elif "int" in s:
            s = "int"
        elif s.startswith("float"):
            s = "float"
        out[col] = s
    return out


def normalize(df):
    """Sort columns by name, round floats, sort rows — order-insensitive
    comparable form (mirrors the driver's value-hash)."""
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("NaN")
                else:
                    row.append(f"{v:.6g}")
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


def assert_frames_match(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame):
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch {sorted(spark_df.columns)} vs "
        f"{sorted(oracle_df.columns)}"
    )
    s_types = canonical_dtypes(spark_df)
    o_types = canonical_dtypes(oracle_df)
    mismatched_types = {
        c: (s_types[c], o_types[c])
        for c in s_types
        if s_types[c] != o_types[c]
    }
    assert not mismatched_types, f"{name}: dtype mismatch {mismatched_types}"
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} vs {len(oracle_df)}"
    )
    s, o = normalize(spark_df), normalize(oracle_df)
    mismatches = [(a, b) for a, b in zip(s, o) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    spark_df = QUERIES[name](spark, SF_DIR).toPandas()
    oracle_df = duck.execute(ORACLES[name]).fetchdf()
    assert_frames_match(name, spark_df, oracle_df)


def test_every_query_has_entry():
    assert QUERIES, "no queries registered"
    # Every oracle key must have a query.
    assert set(ORACLES) <= set(QUERIES)


def test_registry_fits_driver_window():
    """The driver records correctness for the first 50 registry rows
    only — every entry must sit inside that window or it is silently
    unverified (round-2 lesson)."""
    assert len(QUERIES) <= 50


def test_gate_catches_integer_width_mismatch(duck):
    """The round-2 regression fixture: identical values, BIGINT vs
    HUGEINT carriers. The hardened gate must fail it."""
    spark_like = pd.DataFrame({"v": pd.array([1, 2], dtype="int64")})
    oracle_like = duck.execute(
        "SELECT CAST(v AS HUGEINT) AS v FROM (VALUES (1), (2)) t(v)"
    ).fetchdf()
    with pytest.raises(AssertionError, match="dtype mismatch"):
        assert_frames_match("fixture", spark_like, oracle_like)


def test_gate_catches_int_vs_float(duck):
    spark_like = pd.DataFrame({"v": pd.array([1.0, 2.0], dtype="float64")})
    oracle_like = duck.execute(
        "SELECT CAST(v AS BIGINT) AS v FROM (VALUES (1), (2)) t(v)"
    ).fetchdf()
    with pytest.raises(AssertionError, match="dtype mismatch"):
        assert_frames_match("fixture", spark_like, oracle_like)


def test_gate_accepts_nullable_carrier_and_datetime_units(duck):
    """Representation-only differences both engines marshal identically
    must NOT fail: pandas nullable Int32 vs numpy int32, datetime64[us]
    vs [ns]."""
    a = pd.DataFrame(
        {
            "v": pd.array([1, 2], dtype="Int32"),
            "t": pd.to_datetime(["2024-01-01", "2024-01-02"]).astype(
                "datetime64[ns]"
            ),
        }
    )
    b = pd.DataFrame(
        {
            "v": pd.array([1, 2], dtype="int32"),
            "t": pd.to_datetime(["2024-01-01", "2024-01-02"]).astype(
                "datetime64[us]"
            ),
        }
    )
    assert_frames_match("fixture", a, b)
