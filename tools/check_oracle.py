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


def duck_rows(con, sql):
    """Materialize an oracle query the way the DRIVER does: through
    ``con.execute(sql).df()`` (pandas).  This is dtype-sensitive — e.g.
    DuckDB HUGEINT (the return type of ``list_sum``) becomes float64 in
    pandas, so an uncast ``list_sum`` oracle mismatches an int64 Spark
    column here exactly as it does in CORRECTNESS_r{N}.json.  The old
    ``fetchall()`` path converted HUGEINT to Python int and masked that
    class of failure (VERDICT r5, What's wrong #1)."""
    pdf = con.execute(sql).df()
    cols = list(pdf.columns)
    rows = [
        tuple(_from_pandas(v) for v in tup)
        for tup in pdf.itertuples(index=False, name=None)
    ]
    return cols, rows


def _from_pandas(v):
    import numpy as np
    import pandas as pd

    if isinstance(v, np.ndarray):
        return [_from_pandas(x) for x in v.tolist()]
    if v is pd.NaT:
        return None
    if isinstance(v, np.generic):
        return v.item()
    return v


def norm_cell(v):
    if v is None:
        # None and NaN normalize to ONE orderable key: the driver
        # materializes both engines through pandas, where a NULL in a
        # float column IS NaN — so the mirror must treat them as equal
        # (and the old ("f", "nan") string crashed sorted() against
        # float-valued cells).
        return ("null", 0)
    if isinstance(v, float):
        if math.isnan(v):
            return ("null", 0)
        return ("f", v)
    if isinstance(v, datetime.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        # DuckDB DATE arrives as datetime64 (midnight Timestamp) through
        # the pandas path while Spark collect() yields datetime.date —
        # normalize both to the same midnight-datetime key.
        return ("t", datetime.datetime(v.year, v.month, v.day).isoformat())
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
            # through pandas, matching the driver: an int column with
            # NULLs becomes float64 on BOTH engines, so the mirror must
            # see the same dtype coercions on the Spark side as on the
            # DuckDB side (collect() kept ints int and false-failed
            # queries the driver passes).
            spdf = sdf.toPandas()
            scols = list(spdf.columns)
            srows = [
                tuple(_from_pandas(v) for v in tup)
                for tup in spdf.itertuples(index=False, name=None)
            ]
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
            dcols, drows = duck_rows(con, oracles[name])
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
