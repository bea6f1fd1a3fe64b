"""Replicates the driver's correctness gate locally: every entry in
``queries()`` is run via Spark and its ``oracle_sql()`` via DuckDB on the
same parquet, and results must match (row count, column names, values —
order-insensitive). Runs at sf0.001 for speed; the driver runs sf0.01."""

from __future__ import annotations

import math

import duckdb
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


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    spark_df = QUERIES[name](spark, SF_DIR).toPandas()
    oracle_df = duck.execute(ORACLES[name]).fetchdf()
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch {sorted(spark_df.columns)} vs "
        f"{sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} vs {len(oracle_df)}"
    )
    s, o = normalize(spark_df), normalize(oracle_df)
    mismatches = [(a, b) for a, b in zip(s, o) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


def test_every_query_has_entry():
    assert QUERIES, "no queries registered"
    # Every oracle key must have a query.
    assert set(ORACLES) <= set(QUERIES)
