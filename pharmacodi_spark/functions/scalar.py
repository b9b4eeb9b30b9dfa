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


def json_array_lit(vals, schema: str) -> Column:
    """Single-NODE literal for NESTED arrays (guide §1.2 plan-build cost).

    The :func:`int_array_lit` split+cast trick only folds one level; for a
    matrix (e.g. a k×dim centroid table) ``transform`` over a folded split
    does NOT constant-fold (ArrayTransform is never foldable), so the
    splits would re-execute per ROW. ``from_json`` of a string literal IS
    foldable: the whole value collapses to one nested ArrayData Literal in
    ConstantFolding — verified on Spark 4.1 (optimized plan shows
    ``[[1.0,2.0],[3.0,4.0]] AS m``). json.dumps round-trips longs exactly
    and uses repr shortest-round-trip for doubles (Jackson parses back to
    the identical bits); ``allow_nan=False`` raises loudly on non-finite
    values instead of silently producing nulls.
    """
    import json as _json

    s = _json.dumps(vals, allow_nan=False, separators=(",", ":"))
    return F.from_json(F.lit(s), schema)


def double_array_lit(vals) -> Column:
    """Single-NODE ``array<double>`` literal (see :func:`json_array_lit`);
    exact for every finite double (shortest-round-trip decimal both ways)."""
    vals = [float(v) for v in vals]
    assert len(vals) > 0, "double_array_lit: empty array"
    return json_array_lit(vals, "array<double>")


def long_matrix_lit(rows) -> Column:
    """k×dim ``array<array<long>>`` literal as ONE plan node (see
    :func:`json_array_lit`). Replaces the O(k·dim)-node
    ``F.array(*[F.array(*[F.lit(x) ...]) ...])`` shape, whose per-element
    Literals every analyzer/optimizer rule re-walks on every plan build —
    and whose construction pays one py4j round trip per element
    (measured ~1.6 s driver-side at k=8, dim=64 in kmeans_lloyd_int)."""
    rows = [[int(x) for x in r] for r in rows]
    assert rows and all(rows), "long_matrix_lit: empty matrix/row"
    return json_array_lit(rows, "array<array<long>>")


def double_matrix_lit(rows) -> Column:
    """k×dim ``array<array<double>>`` literal as ONE plan node (see
    :func:`json_array_lit`); exact for every finite double."""
    rows = [[float(x) for x in r] for r in rows]
    assert rows and all(rows), "double_matrix_lit: empty matrix/row"
    return json_array_lit(rows, "array<array<double>>")


def _sql_lit(v, typ: str | None = None) -> str:
    """Render one Python literal as a Spark SQL literal (local_df)."""
    if v is None:
        return f"CAST(NULL AS {typ})" if typ else "NULL"
    if typ is not None:
        return f"CAST({_sql_lit(v)} AS {typ})"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return f"{v}L"  # BIGINT, matching createDataFrame's LongType
    if isinstance(v, float):
        # repr round-trips doubles exactly; parse via string cast so the
        # SQL literal never lands in DECIMAL
        return f"CAST('{v!r}' AS DOUBLE)"
    if isinstance(v, str):
        esc = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{esc}'"
    if isinstance(v, (list, tuple)):
        return "ARRAY(" + ", ".join(_sql_lit(x) for x in v) + ")"
    raise TypeError(f"local_df: unsupported literal {type(v).__name__}")


def local_df(spark, rows, cols, types: list[str | None] | None = None):
    """Tiny driver-side literal frame as a VALUES LocalRelation.

    ``spark.createDataFrame(list_of_tuples)`` parallelizes the rows
    through a PYTHON-serialized RDD: at execution every scan task blocks
    ~100-150 ms on a Python worker round trip with near-zero CPU (r13
    profile of crawl_permission_funnel: 3 such scans = 96 tasks of pure
    wait), and the RDD relation carries no stats, so joins against it
    can't auto-broadcast. A ``VALUES`` relation is a LocalRelation:
    zero tasks, exact row-count stats, constant-foldable.

    ``types``: optional per-column Spark DDL types; every value of a
    typed column is wrapped in an explicit CAST. Untyped columns infer
    from the Python value (int -> BIGINT, matching createDataFrame).
    """
    assert rows, "local_df needs at least one row"
    types = types or [None] * len(cols)
    body = ",\n".join(
        "(" + ", ".join(_sql_lit(v, t) for v, t in zip(r, types)) + ")"
        for r in rows
    )
    collist = ", ".join(f"`{c}`" for c in cols)
    return spark.sql(f"SELECT * FROM VALUES\n{body}\nAS __t({collist})")
