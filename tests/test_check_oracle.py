"""Regression tests for the oracle-mirror checker itself.

Round-5 verdict root cause: ``tools/check_oracle.py`` fetched oracle
results via ``fetchall()`` (DuckDB HUGEINT -> Python int), while the
DRIVER materializes through pandas (HUGEINT -> float64), so an uncast
``list_sum(...)`` oracle passed the local mirror but failed the driver's
value-hash.  The checker must go through the same pandas path and be
dtype-sensitive so that exact failure class is visible locally.
"""

import datetime
import sys

import duckdb

sys.path.insert(0, "/root/repo/tools")

from check_oracle import duck_rows, norm_cell  # noqa: E402


def test_uncast_list_sum_mismatches_int():
    con = duckdb.connect()
    _, rows = duck_rows(con, "SELECT list_sum([1, 2, 3]) AS s")
    # HUGEINT arrives as float64 through pandas — must NOT equal int 6.
    assert norm_cell(rows[0][0]) != norm_cell(6)


def test_cast_list_sum_matches_int():
    con = duckdb.connect()
    _, rows = duck_rows(con, "SELECT CAST(list_sum([1, 2, 3]) AS BIGINT) AS s")
    assert norm_cell(rows[0][0]) == norm_cell(6)


def test_no_oracle_outputs_hugeint():
    """DESCRIBE every registered oracle against the sf0.001 views and
    assert no output column is HUGEINT (or UHUGEINT) — those become
    float64 through the driver's pandas materialization and value-hash-
    mismatch an int64 Spark column even when every value is equal.
    DESCRIBE plans without executing, so this sweeps all ~130 oracles in
    well under a second."""
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E
    from kafka_delta_ingest_spark.io import TABLES

    con = duckdb.connect()
    sf_dir = "/root/testdata/sf0.001"
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    offenders = []
    for name, sql in E.oracle_sql().items():
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as ex:  # noqa: BLE001
            offenders.append((name, f"describe-error: {ex}"))
            continue
        for col, ctype, *_ in desc:
            if "HUGEINT" in str(ctype).upper():
                offenders.append((name, f"{col}: {ctype}"))
    assert not offenders, f"HUGEINT-typed oracle outputs: {offenders}"


def test_none_and_nan_unify_and_sort_safely():
    # the driver sees NULL-in-float-column as NaN on both engines
    # (pandas materialization), so the mirror must equate them; and
    # rows mixing NaN with real floats must stay sortable (the old
    # ("f", "nan") string crashed sorted() — r6 full-sweep regression).
    assert norm_cell(None) == norm_cell(float("nan"))
    rows = sorted([(norm_cell(float("nan")),), (norm_cell(1.5),),
                   (norm_cell(None),), (norm_cell("x"),)])
    assert len(rows) == 4


def test_date_normalizes_to_midnight_datetime():
    # Spark collect() yields datetime.date; DuckDB-via-pandas yields a
    # midnight Timestamp — norm_cell must unify them.
    d = datetime.date(2024, 3, 5)
    t = datetime.datetime(2024, 3, 5)
    assert norm_cell(d) == norm_cell(t)


def test_duck_rows_converts_numpy_scalars():
    con = duckdb.connect()
    _, rows = duck_rows(
        con, "SELECT 1::BIGINT AS a, 1.5::DOUBLE AS b, [1, 2] AS c"
    )
    a, b, c = rows[0]
    assert type(a) is int and type(b) is float
    assert isinstance(c, list) and c == [1, 2]
