"""Local replica of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL on the same parquet tables, sort columns by
name, sort rows, compare values. Used by tests/test_oracle_parity.py as
the pre-commit correctness gate."""

from __future__ import annotations

import datetime as _dt
import math
import os
from decimal import Decimal

import duckdb

from big_data_analysis_spark.io import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _normalize_rows(rows, col_names):
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(spark_df, con, sql: str, float_tol: float = 0.0):
    """Returns (ok, message). Column names are compared case-insensitively
    (DuckDB lowercases unquoted identifiers)."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = [c.lower() for c in spark_df.columns]
    res = con.execute(sql)
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"

    sn = _normalize_rows(s_rows, s_cols)
    dn = _normalize_rows(d_rows, d_cols)
    for i, (a, b) in enumerate(zip(sn, dn)):
        if a == b:
            continue
        if float_tol and _rows_close(a, b, float_tol):
            continue
        return False, f"value mismatch at sorted row {i}:\n  spark : {a}\n  duckdb: {b}"
    return True, f"ok ({len(s_rows)} rows)"


def _rows_close(a, b, tol):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=tol, abs_tol=tol):
                return False
        elif x != y:
            return False
    return True
