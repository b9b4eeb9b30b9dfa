"""Scan-spread guard: parallelize CPU-heavy per-row transforms that sit
directly on a small-file scan (guide §2.5 input skew).

A parquet file under ``spark.sql.files.maxPartitionBytes`` arrives as ONE
scan task, so an expensive projection placed on the scan (per-gram md5,
shingle hashing, token scoring) serializes on one core no matter how many
the session has. At corpus scale the scan already has >= defaultParallelism
splits and the guard no-ops — no payload shuffle is added where it would
cost (the r12 incremental_winnow root cause, and the measured rationale in
dedup.repeated_spans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread_small_scan(df: DataFrame, key: "Column | str | None" = None) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` ONLY when it currently
    has fewer partitions (a small-file scan); no-op otherwise.

    ``key``: hash-partition by this column (use the doc id when downstream
    work is keyed by it — the exchange then doubles as that partitioning);
    ``None`` round-robins, which is safe whenever downstream results do not
    depend on row placement (every aggregation/join keyed by content).
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    if key is None:
        return df.repartition(par)
    return df.repartition(par, F.col(key) if isinstance(key, str) else key)
