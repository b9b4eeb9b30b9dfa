"""Slowly-changing-dimension (type 2) history build: turn a change stream
(key, attributes, change timestamp) into versioned dimension rows with
[valid_from, valid_to) intervals and a current-row flag — the dimension-
management op a warehouse layers over the reference's overwrite-only dim
tables when attribute history must be queryable (as-of joins against these
intervals are operators/temporal.py's range/as-of path).

Scale design: everything is two window functions over ONE hash partition
by key — the change stream shuffles once on the key; collapse-unchanged
and interval assembly both read that same sorted run (Spark keeps the sort
order through the intermediate filter, so the second window adds no
exchange and no sort). No global ordering, no driver state; version
explosion is bounded by the real change rate per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
    collapse_unchanged: bool = True,
) -> DataFrame:
    """Build SCD2 rows: one output row per attribute VERSION per key, with
    ``valid_from`` = its first change timestamp, ``valid_to`` = the next
    version's (exclusive; null on the open version) and ``is_current``.

    ``collapse_unchanged`` drops change rows whose attributes equal the
    previous row's (null-safe struct compare) — re-stated unchanged values
    create no new version, per standard SCD2 semantics. ``tiebreak_cols``
    deterministically orders simultaneous changes (same key, same ts)."""
    order = [ts_col, *(tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    df = changes
    if collapse_unchanged:
        cur = F.struct(*[F.col(c) for c in attr_cols])
        # lag of the struct is NULL on each key's first row; eqNullSafe with
        # null is false, so the first row always survives (window exprs
        # can't sit in a WHERE — project, filter, drop)
        df = (
            df.withColumn("__same", cur.eqNullSafe(F.lag(cur).over(w)))
            .where(~F.col("__same"))
            .drop("__same")
        )
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
