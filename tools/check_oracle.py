"""Local mirror of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark AND its ``oracle_sql()``
twin on DuckDB, then compare row count, column names/types, and values
(columns sorted by name, rows sorted) — exact match required.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from kafka_delta_ingest_spark.io import TABLES  # noqa: E402
from kafka_delta_ingest_spark.session import get_spark  # noqa: E402


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", v)
    if isinstance(v, datetime.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(norm_cell(x) for x in v))
    if hasattr(v, "as_py"):
        v = v.as_py()
    import decimal

    if isinstance(v, decimal.Decimal):
        return ("f", float(v))
    return (type(v).__name__, v)


def rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    )
    return [cols[i] for i in order], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-oracle")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{spark_t:.1f}s]")
            if len(srows) == 0:
                print(f"      WARNING: zero rows from {name}")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            failures.append(name)
            continue
        _, sset = rows_to_set(scols, srows)
        _, dset = rows_to_set(dcols, drows)
        if len(sset) != len(dset):
            print(f"FAIL  {name}: rowcount spark={len(sset)} duck={len(dset)}")
            failures.append(name)
            continue
        if sset != dset:
            ndiff = sum(1 for a, b in zip(sset, dset) if a != b)
            print(f"FAIL  {name}: {ndiff}/{len(sset)} rows differ")
            for a, b in zip(sset, dset):
                if a != b:
                    print(f"      spark: {a}")
                    print(f"      duck : {b}")
                    break
            failures.append(name)
            continue
        print(f"OK    {name}: {len(sset)} rows match [{spark_t:.1f}s]")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
