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


def _cm_bucket(col: Column, row: int, width: int, salt: str) -> Column:
    """md5-slice bucket for CM row ``row`` — oracle-expressible (DuckDB
    ``('0x'||substr(md5(..),1,15))::BIGINT % width``)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}{row}:"), col.cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cm_sketch(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cm",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of the values in
    ``col``: a ``depth × width`` counter table as ``(row, bucket, c)``
    rows — the mergeable frequency summary for heavy-hitter monitoring
    when the exact value-count table is too wide to keep per slice
    (store one KB-scale sketch per partition/day; merge = sum on
    (row, bucket); estimate = min over rows — always ≥ the true count,
    over by at most ~2N/width with probability 1−2^−depth).

    Scale shape: one explode (×depth) collapsing map-side to the bounded
    ``depth·width`` counter table — the shuffle carries at most
    ``depth·width`` rows per task regardless of corpus size."""
    assert depth >= 1 and width >= 1
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cm_bucket(F.col(col), r, width, salt).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p")
    )
    return pairs.groupBy(
        F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket")
    ).agg(F.count("*").cast("long").alias("c"))


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CM sketches built with identical (depth, width, salt): sum
    counters per cell — the property that lets per-slice sketches answer
    corpus-wide questions without rescanning."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(
        F.sum("c").cast("long").alias("c")
    )


def cm_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cm",
) -> DataFrame:
    """Point-query the sketch for every row of ``items``: estimate =
    ``min`` over the depth rows of the addressed counters (absent bucket
    ⇒ 0). The sketch is ≤ depth·width rows — it broadcasts; the probe
    never shuffles the items."""
    probes = items.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cm_bucket(F.col(col), r, width, salt).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    ).select(col, F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("cm_est"))
    )


def streaming_cm_sketch(
    stream: DataFrame,
    base_dir: str,
    checkpoint_dir: str,
    col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cm",
):
    """Maintain a CM sketch over a document stream — the monitoring side
    of the mergeable-summary story: each micro-batch's sketch lands in its
    OWN ``batch_id=N`` partition (dynamic partition overwrite ⇒ a replayed
    batch rewrites the same partition instead of double-counting), and
    :func:`read_cm_sketch` folds the partitions with :func:`cm_merge` at
    question time.  State size: ≤ depth·width rows per batch — KB-scale
    regardless of stream volume.  availableNow drain, as the repo's other
    sinks.

    Overwrite mode is scoped to THIS writer via
    ``.option("partitionOverwriteMode", "dynamic")`` — never by mutating
    session conf, which would leak dynamic semantics into any concurrent
    write in the same SparkSession mid-batch (ADVICE r6)."""

    def do_batch(batch: DataFrame, batch_id: int) -> None:
        (
            cm_sketch(batch, col, depth, width, salt)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{base_dir}/cm_sketch")
        )

    return (
        stream.writeStream.foreachBatch(do_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_cm_sketch(spark, base_dir: str) -> DataFrame:
    """Fold the per-batch sketch partitions into ONE queryable sketch."""
    parts = spark.read.parquet(f"{base_dir}/cm_sketch").drop("batch_id")
    return parts.groupBy("row", "bucket").agg(
        F.sum("c").cast("long").alias("c")
    )
