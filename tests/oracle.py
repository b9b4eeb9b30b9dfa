"""Local mirror of the driver's DuckDB-oracle comparison: run a Spark query
and its oracle SQL on the same parquet tables, sort columns by name, sort
rows, and compare values exactly (floats via repr equality after the queries'
own rounding — the driver hashes values, so we enforce exact equality here).
"""

from __future__ import annotations

import datetime as _dt
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


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, int):
        return int(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        # The REAL driver canonicalizes with pandas ``sort_values``, which
        # raises ``TypeError: unhashable type: 'list'`` on array-typed cells
        # (CORRECTNESS_r09.json ``array_kit`` err). Reproduce that
        # intolerance here so array-typed query outputs fail in the local
        # mirror BEFORE burning a driver window slot: queries must project
        # arrays to scalars (e.g. ``array_join(array_sort(...), ' ')``).
        raise TypeError(
            "unhashable type: 'list' — array-typed result cell; the driver's "
            "pandas canonicalizer cannot sort it. Project arrays to scalars."
        )
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    return v


def _canonical(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return sorted(columns), out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    sc, s_canon = _canonical(s_rows, s_cols)
    dc, d_canon = _canonical(d_rows, d_cols)
    for i, (a, b) in enumerate(zip(s_canon, d_canon)):
        if a != b:
            return False, (
                f"value mismatch at sorted row {i} (cols {sc}):\n spark={a}\n duck ={b}"
            )
    return True, "ok"
