"""Skew (salted join) and bucketed co-located join tests — the two manual
shuffle-topology tools for the 100 TB design point (SURVEY §7.3 item 8;
north-star 'repartition/bucketing for co-located joins, salting for skew')."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from pharmacodi_spark.operators.joins import salted_join


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_join_matches_plain_join(spark):
    # one hot key (90% of rows) + uniform tail
    left = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
    )
    plain = left.join(right, "k").groupBy().agg(
        F.count("*").alias("n"), F.sum("attr").alias("s")
    ).collect()[0]
    salted = salted_join(left, right, "k", salts=8).groupBy().agg(
        F.count("*").alias("n"), F.sum("attr").alias("s")
    ).collect()[0]
    assert (plain.n, plain.s) == (salted.n, salted.s)
    # salt spreads the hot key across shards: the joined key+salt pairs for
    # the hot key must use more than one shard
    shards = (
        left.withColumn("__salt", (F.rand(seed=42) * 8).cast("int"))
        .where(F.col("k") == 7)
        .select("__salt")
        .distinct()
        .count()
    )
    assert shards > 1


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
            "o_orderkey", "o_orderpriority"
        )
        for df, name, key in [(li, "li_b", "l_orderkey"), (orders, "ord_b", "o_orderkey")]:
            (
                df.write.mode("overwrite")
                .bucketBy(8, key)
                .sortBy(key)
                .option("path", str(tmp_path / name))
                .saveAsTable(name)
            )
        a = spark.table("li_b")
        b = spark.table("ord_b")
        joined = a.join(b, a.l_orderkey == b.o_orderkey)
        plan = _explain(joined)
        # co-located bucketed join: no Exchange on either side
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
        # referee: same row count as the plain parquet join
        assert joined.count() == li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
