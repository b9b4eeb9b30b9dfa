"""spread_small_scan (operators/partitioning.py): the r12 scan-spread
guard that parallelizes CPU-heavy transforms sitting on a small-file scan
(one task) while no-oping on inputs that already have enough partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from pharmacodi_spark.operators.partitioning import spread_small_scan


def test_spreads_single_partition_input(spark):
    df = spark.range(1000).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = spread_small_scan(df, "id")
    par = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == par


def test_noop_when_already_spread(spark):
    par = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(par + 3)
    out = spread_small_scan(df)
    # returned unchanged: no extra exchange on top of the existing one
    assert out is df


def test_results_identical_keyed_and_roundrobin(spark):
    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 37)).alias("text"),
    ).coalesce(1)
    agg = lambda d: sorted(  # noqa: E731
        d.groupBy("text").agg(F.count("*").alias("n"), F.min("doc_id").alias("m"))
        .collect()
    )
    base = agg(df)
    assert agg(spread_small_scan(df, "doc_id")) == base
    assert agg(spread_small_scan(df)) == base
