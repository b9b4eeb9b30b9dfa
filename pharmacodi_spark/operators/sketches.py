"""Mergeable sketches for approximate distinct counting (north star).

Exact ``count(DISTINCT x)`` at 100 TB forces a full shuffle of the distinct
keys. Spark 3.5+'s Apache DataSketches HLL bindings give a mergeable,
bounded-memory alternative: build per-partition/per-slice sketches once,
store the binary sketch alongside each partition of a table, and answer
corpus-wide distinct questions by merging the (KB-sized) sketches — no
rescan. These helpers wrap that pattern; estimates are within ~2% at
default lgk=12.

No oracle query: HLL implementations are engine-specific (DuckDB's
approx_count_distinct is a different sketch), so the correctness surface is
pytest — merge associativity and accuracy bounds vs exact counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sketch(
    df: DataFrame,
    col: str,
    by: list[str] | None = None,
    lgk: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Per-group (or global) HLL sketch of ``col`` — store these per
    table-partition/date-slice as the distinct-count index."""
    agg = F.hll_sketch_agg(F.col(col), lgk).alias(sketch_col)
    return df.groupBy(*(by or [])).agg(agg)


def merge_sketches(
    sketches: DataFrame,
    by: list[str] | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union sketches (optionally regrouped to coarser keys) — the rollup
    that answers "distinct across all slices" without rescanning data."""
    return sketches.groupBy(*(by or [])).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    )


def sketch_estimate(sketch_col: str = "sketch") -> Column:
    """Estimated distinct count from a sketch column."""
    return F.hll_sketch_estimate(F.col(sketch_col)).alias("n_distinct_est")
