"""Driver-replica verification gate (see .claude/skills/verify/SKILL.md).

Runs ``entry()`` as a smoke check, then every ``queries()`` entry against
its ``oracle_sql()`` DuckDB oracle at the given scale factor, comparing
sorted column names, row count, and sorted rows (floats at %.6g).

Usage: python scripts/verify_gate.py [sf_dir] [name_substring ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:]
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df):
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                row.append("NaN" if math.isnan(v) else f"{v:.6g}")
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


def main() -> int:
    import duckdb

    import __spark_entry__ as mod
    from sensapp_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)

    out = mod.entry(spark)
    rows = out.collect()
    print(f"entry(): {len(rows)} rows, schema {[f.name for f in out.schema]}")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = mod.queries()
    oracles = mod.oracle_sql()
    n_fail = 0
    for i, (name, fn) in enumerate(queries.items()):
        if ONLY and not any(s in name for s in ONLY):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # pragma: no cover - diagnostic path
            print(f"[{i}] {name}: SPARK ERROR {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"[{i}] {name}: rows={len(sdf)} (no oracle — rows-only)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # pragma: no cover - diagnostic path
            print(f"[{i}] {name}: ORACLE ERROR {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        dt = time.time() - t0
        cols_ok = sorted(sdf.columns) == sorted(odf.columns)
        rows_ok = len(sdf) == len(odf)
        vals_ok = False
        if cols_ok and rows_ok:
            s, o = normalize(sdf), normalize(odf)
            vals_ok = s == o
            detail = ""
            if not vals_ok:
                bad = [(a, b) for a, b in zip(s, o) if a != b][:2]
                detail = f" first diffs: {bad}"
        else:
            detail = (
                f" cols {sorted(sdf.columns)} vs {sorted(odf.columns)}"
                if not cols_ok
                else f" rows {len(sdf)} vs {len(odf)}"
            )
        ok = cols_ok and rows_ok and vals_ok
        n_fail += 0 if ok else 1
        status = "OK " if ok else "FAIL"
        print(f"[{i}] {status} {name}: rows={len(sdf)} ({dt:.1f}s){detail}")
    print(f"\n{len(queries)} queries, {n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
