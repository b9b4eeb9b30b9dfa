"""Scalar function kit (SURVEY §2.9 F1-F12).

Policy (SURVEY §2.10): zero row-at-a-time Python UDFs — every scalar the
reference computes via ``.apply``/``np.vectorize`` (e.g. regex cleanup at
build_synonym_tables.py:77-82, build_primary_pset_tables.py:121-122) is a
native Catalyst expression here, so it stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_version_suffix(col: Column | str) -> Column:
    """F1: strip Ensembl gene version ``\\.[0-9]*$`` —
    build_primary_pset_tables.py:65, map_genes_to_genomic_coordinates.py:38-39."""
    return F.regexp_replace(col, r"\.[0-9]*$", "")


def strip_file_suffix(col: Column | str) -> Column:
    """F1: slot-name normalization ``.*@|.csv(.gz)?$|.parquet$|.txt$`` —
    read_pset.py:69-72."""
    return F.regexp_replace(col, r"@.*$|\.csv(\.gz)?$|\.parquet$|\.txt$", "")


def recode(col: Column | str, mapping: dict, default: Column | None = None) -> Column:
    """P9/F12: CASE-WHEN recode (dataset-name cleanup,
    build_meta_tables.py:200-201). Literal maps constant-fold in Catalyst."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for k, v in mapping.items():
        cond = c == F.lit(k)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    if expr is None:
        return default if default is not None else c
    return expr.otherwise(default if default is not None else c)


def clamp_expr(col: Column | str, upper: float) -> Column:
    """F8: IC50-style overflow clamp (combine_pset_tables.py:173)."""
    return F.least(F.col(col) if isinstance(col, str) else col, F.lit(upper))


def round8(col: Column | str) -> Column:
    """F7: dose/response rounding (build_experiment_tables.py:136-137)."""
    return F.round(col, 8)


def int_array_lit(vals) -> Column:
    """Single-NODE integer array literal (guide §1.2 plan-build cost).

    ``F.lit(list)`` builds a ``CreateArray`` with one child Literal per
    element, and every analyzer/optimizer rule walks all of them on every
    plan build — measured +2.4 s of pure ``explain()`` time at dim=4096.
    One string literal split + cast is 3 nodes at analysis and folds to a
    single ArrayData Literal in ConstantFolding: same values, same
    execution, constant plan-walk cost at any dim.
    """
    vals = [int(v) for v in vals]
    assert len(vals) > 0, "int_array_lit: empty array would cast to [null]"
    return F.split(F.lit(",".join(str(v) for v in vals)), ",").cast(
        "array<long>"
    )
