"""The pre-commit correctness gate: every oracle-backed query in the
registry must match its DuckDB oracle exactly (same comparison shape as
the driver: row count + schema + order-insensitive values), and every
rows-only query must at least run and return a stable schema."""

from __future__ import annotations

import pytest

from big_data_analysis_spark.queries import ORACLES, QUERIES

from .oracle_utils import compare, duckdb_connection

ORACLE_NAMES = sorted(ORACLES)
ROWS_ONLY_NAMES = sorted(set(QUERIES) - set(ORACLES))


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, con, ORACLES[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0
