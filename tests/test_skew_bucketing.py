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


def test_zorder_clusters_both_dims(spark):
    """Morton-key range clustering: each output partition must cover a
    narrow range of BOTH dimensions (the property that lets parquet row-
    group stats prune 2-D filters), unlike a 1-D sort which clusters only
    its leading column."""
    from pharmacodi_spark.operators.clustering import zorder_repartition

    n, parts = 40_000, 16
    df = spark.range(n).select(
        (F.col("id") % 200).alias("x"),
        ((F.col("id") * 7919) % 200).alias("y"),
    )

    def avg_spread(clustered):
        stats = (
            clustered.withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .agg(
                (F.max("x") - F.min("x")).alias("sx"),
                (F.max("y") - F.min("y")).alias("sy"),
            )
            .agg(F.avg("sx").alias("ax"), F.avg("sy").alias("ay"))
            .collect()[0]
        )
        return stats.ax, stats.ay

    zx, zy = avg_spread(zorder_repartition(df, ["x", "y"], parts))
    # 1-D sort baseline: x clusters tightly, y spans the full range
    sx, sy = avg_spread(df.repartitionByRange(parts, "x").sortWithinPartitions("x"))
    assert zx < 200 * 0.6 and zy < 200 * 0.6, (zx, zy)   # both dims clustered
    assert sy > 200 * 0.75, sy                           # baseline: y unclustered
    assert zy < sy * 0.7, (zy, sy)                       # z-order beats 1-D on y
    # and it is a pure reorder: same rows
    assert zorder_repartition(df, ["x", "y"], parts).count() == n


def test_save_canonical_bucketed_join_and_pruning(spark, tmp_path):
    """Canonical experiment/dose_response layouts: bucketed co-located join
    plans with no Exchange; the partitioned table prunes on dataset_id."""
    from pharmacodi_spark.io import save_canonical

    exp = spark.range(0, 2000).select(
        F.col("id").alias("experiment_id"),
        (F.col("id") % 50).alias("cell_id"),
        (F.col("id") % 7).alias("compound_id"),
        F.concat(F.lit("DS"), (F.col("id") % 3)).alias("dataset_id"),
    )
    dr = spark.range(0, 6000).select(
        (F.col("id") % 2000).alias("experiment_id"),
        (F.col("id") % 10).alias("dose_id"),
        (F.col("id") * 1.5).alias("response"),
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ident = save_canonical(
            exp, "experiment", str(tmp_path),
            layout={"partition_by": ["dataset_id"],
                    "bucket_by": (["experiment_id"], 8),
                    "sort_by": ["experiment_id"]},
        )
        # catalog id is namespaced by base_dir → two destinations of the
        # same logical table cannot clobber one global catalog entry
        assert ident.startswith("experiment_") and ident != "experiment"
        save_canonical(dr, "dose_response", str(tmp_path))
        e = spark.table(ident)
        # partition pruning on the per-dataset access path
        pruned = e.where(F.col("dataset_id") == "DS1")
        plan = _explain(pruned)
        assert "PartitionFilters: [isnotnull(dataset_id" in plan, plan
        assert pruned.count() == exp.where(F.col("dataset_id") == "DS1").count()

        # co-located bucketed join on the hot key: bucketed side needs no
        # exchange; only the unbucketed dose_response shuffles
        d = spark.read.parquet(str(tmp_path / "dose_response"))
        joined = e.join(d.hint("shuffle_hash"), "experiment_id")
        plan = _explain(joined)
        import re

        n_exchanges = len(re.findall(r"\n\(\d+\) Exchange", plan))
        assert n_exchanges == 1, plan  # dose_response only; bucketed side reused
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 6000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        from pharmacodi_spark.io import canonical_table_name

        spark.sql(
            f"DROP TABLE IF EXISTS {canonical_table_name('experiment', str(tmp_path))}"
        )


# ---------------------------------------------------------------------------
# Hot-cell skew guard (triangle-block re-split) — VERDICT r4 item 1: one
# oversized LSH bucket / IVF cell must not become an O(m^2) straggler task,
# and the guard must be EXACT (identical pair set to the naive path).
# ---------------------------------------------------------------------------


def _skewed_cells(spark, n=400, hot_frac=0.5):
    """(doc_id, band, bucket) cells where one bucket holds ``hot_frac`` of
    all ids — the realistic boilerplate-cluster failure mode."""
    hot = int(n * hot_frac)
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("band"),
        F.when(F.col("id") < hot, F.lit(999))
        .otherwise(F.col("id") % 37)
        .alias("bucket"),
    )


def test_capped_pairs_exact_on_skewed_fixture(spark):
    from pharmacodi_spark.text.dedup import pairs_from_cells

    cells = _skewed_cells(spark)
    uncapped = {
        (r.doc_a, r.doc_b) for r in pairs_from_cells(cells).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in pairs_from_cells(cells, max_cell_size=16).collect()
    }
    # hot bucket of 200 → C(200,2) pairs must all survive the re-split
    assert len(uncapped) > 200 * 199 // 2
    assert capped == uncapped


def test_triangle_blocks_bound_per_task(spark):
    from pharmacodi_spark.text.dedup import triangle_blocks

    cap = 16
    cells = _skewed_cells(spark)
    blk = triangle_blocks(cells, ["band", "bucket"], "doc_id", cap)
    sizes = (
        blk.groupBy("band", "bucket", "__bi", "__bj")
        .count()
        .agg(F.max("count").alias("mx"))
        .collect()[0]
        .mx
    )
    # each block holds members of at most two subgroups, each ~<= cap
    # (hash-split subgroups are approximately even; allow 2x slack)
    assert sizes <= 4 * cap, sizes
    # every id is replicated s times (s blocks contain its subgroup)
    hot = blk.where(F.col("bucket") == 999)
    n_ids = hot.select("doc_id").distinct().count()
    s = hot.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0]
    assert n_ids == 200 and s == -(-200 // cap)  # ceil(200/16) = 13


def test_simhash_capped_pairs_match_uncapped(spark):
    from pharmacodi_spark.text.dedup import simhash, simhash_near_pairs

    docs = spark.range(0, 120).select(
        F.col("id").alias("doc_id"),
        # 3 near-dup families sharing long prefixes + unique tails → a few
        # populated prefix buckets with real Hamming-close pairs
        F.concat(
            F.lit("the quick brown fox jumps over the lazy dog family"),
            (F.col("id") % 3).cast("string"),
            F.lit(" tail"),
            F.when(F.col("id") % 7 == 0, F.lit("variant")).otherwise(
                (F.col("id") % 11).cast("string")
            ),
        ).alias("text"),
    )
    sim = simhash(docs).localCheckpoint()
    base = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_pairs(sim, max_hamming=8).collect()
    }
    capped = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_pairs(sim, max_hamming=8, max_cell_size=8).collect()
    }
    assert base and capped == base


def test_minhash_capped_pairs_match_uncapped(spark, sf_dir):
    from pharmacodi_spark.text.dedup import minhash_near_dup_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = {
        (r.doc_a, r.doc_b) for r in minhash_near_dup_pairs(docs).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in minhash_near_dup_pairs(docs, max_cell_size=4).collect()
    }
    assert base and capped == base
