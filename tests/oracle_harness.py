"""Local replica of the driver's correctness gate: run a registered Spark
query and its DuckDB oracle on the same parquet tables and compare
row-count, column names, and (order-insensitively) values.

We hold ourselves to EXACT cell equality after each side's own rounding —
the driver hashes values, so "close" floats are not good enough; queries
must round any arithmetic double output on both sides.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and representation noise below the queries' own rounding
        r = round(v, 9)
        return "0.0" if r == 0 else repr(r)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(row[i]) for i in order) for row in rows]
    out.sort()
    return out


_INTEGRAL_SPARK = {"tinyint", "smallint", "int", "bigint"}


def _check_dtype_kinds(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    # The driver hashes values AFTER a pandas conversion, where DuckDB's
    # HUGEINT (e.g. SUM over BIGINT) lands as float64 — so an oracle column
    # that is integral on the Spark side but floating in pandas hashes
    # "1435.0" vs "1435" and fails the driver even though fetchall() (used
    # for the value compare below) returns int on both sides.  Catch that
    # drift here: any Spark-integral column must be integral in the
    # oracle's pandas frame too (fix: CAST(... AS BIGINT) in the SQL).
    # A column that CONTAINS nulls converts to float64 (NaN) on BOTH
    # sides' pandas frames, so it hashes consistently — only a null-free
    # integral column coming back floating marks the HUGEINT drift.
    pdf = con.execute(sql).df()
    spark_types = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}
    for col, styp in spark_types.items():
        if styp in _INTEGRAL_SPARK and col in pdf.columns:
            s = pdf[col]
            if s.dtype.kind == "f" and not s.isna().any():
                raise AssertionError(
                    f"column {col!r}: spark type {styp} but null-free oracle "
                    f"pandas dtype {s.dtype} — driver hash will mismatch "
                    f"('1435.0' vs '1435'); CAST the oracle expression AS BIGINT"
                )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    _check_dtype_kinds(spark_df, con, sql)
    duck = con.execute(sql)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()

    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    s = _normalize(spark_rows, spark_cols)
    d = _normalize(duck_rows, duck_cols)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(f"value mismatch; first diffs (spark, duck): {diffs}")
