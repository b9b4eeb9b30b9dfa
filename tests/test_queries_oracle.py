"""Every registered query must hash-match its DuckDB oracle — the local
mirror of the driver's t2 correctness gate (BASELINE.md)."""

from __future__ import annotations

import pytest

from pharmacodi_spark.plans import QUERIES
from tests.oracle import compare, duckdb_connect


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb_connect(sf_dir)
    yield con
    con.close()


ORACLE_QUERIES = [(name, fn, sql) for name, (fn, sql) in QUERIES.items() if sql]
ROWS_ONLY = [(name, fn) for name, (fn, sql) in QUERIES.items() if sql is None]


@pytest.mark.parametrize(
    "name,fn,sql", ORACLE_QUERIES, ids=[n for n, _, _ in ORACLE_QUERIES]
)
def test_query_matches_oracle(spark, sf_dir, con, name, fn, sql):
    df = fn(spark, sf_dir)
    ok, msg = compare(df, con, sql)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name,fn", ROWS_ONLY, ids=[n for n, _ in ROWS_ONLY])
def test_rows_only_query_runs(spark, sf_dir, name, fn):
    df = fn(spark, sf_dir)
    assert df.count() >= 0


def test_array_typed_output_rejected(spark, sf_dir, con):
    """The real driver's pandas canonicalizer crashes on list cells
    (CORRECTNESS_r09 ``array_kit`` err: unhashable type 'list'); the local
    mirror must fail the same way so array-typed query outputs never reach
    the driver. An intentionally array-typed result must raise."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        "id", F.array(F.lit("a"), F.lit("b")).alias("arr")
    )
    with pytest.raises(TypeError, match="unhashable type: 'list'"):
        compare(df, con, "SELECT 1 AS id, ['a','b'] AS arr")


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()).issubset(set(mod.queries()))
