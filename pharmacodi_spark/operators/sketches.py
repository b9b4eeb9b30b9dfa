"""Mergeable sketches for approximate distinct counting (north star).

Exact ``count(DISTINCT x)`` at 100 TB forces a full shuffle of the distinct
keys. Spark 3.5+'s Apache DataSketches HLL bindings give a mergeable,
bounded-memory alternative: build per-partition/per-slice sketches once,
store the binary sketch alongside each partition of a table, and answer
corpus-wide distinct questions by merging the (KB-sized) sketches — no
rescan. These helpers wrap that pattern; estimates are within ~2% at
default lgk=12.

The NATIVE path has no oracle query: DataSketches binaries are
engine-specific (DuckDB's approx_count_distinct is a different sketch),
so its correctness surface is pytest — merge associativity and accuracy
bounds vs exact counts. The r10 :func:`hll_md5_distinct` below closes
that gap with a deterministic integer HLL whose estimate is
bit-identical across engines (oracle row ``hll_distinct``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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
    # NULL values must not mint counter cells: md5(NULL) is NULL, so a
    # NULL input lands depth rows on a NULL bucket — junk cells that
    # inflate the sketch's total mass (the same silent-corruption class
    # the r11 hll_md5_registers NULL fix closed). CM counts non-NULLs.
    pairs = df.where(F.col(col).isNotNull()).select(
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


# ---------------------------------------------------------------------------
# Deterministic md5-HLL: the oracle-expressible sibling of the native
# DataSketches path above (which stays pytest-only because its binary
# sketch is engine-specific). Same register/rank algebra as Flajolet's
# HyperLogLog, but every step is integer arithmetic over md5 slices, so
# Spark and DuckDB produce the IDENTICAL estimate.
# ---------------------------------------------------------------------------

HLL_P = 8  #: 2^8 = 256 registers (σ ≈ 1.04/√m ≈ 6.5%)
HLL_W = 30  #: rho field bits (fine for < ~10^8 distincts per group)
#: alpha_m and ln2 in 10-bit fixed point — driver-side constants shared
#: verbatim with the oracle SQL literal
HLL_ALPHA_FP10 = int(0.7213 / (1 + 1.079 / (1 << HLL_P)) * 1024)  # 735
HLL_LN2_FP10 = 709


def hll_md5_distinct(
    df: DataFrame,
    col: str,
    by: list[str] | None = None,
    salt: str = "h",
) -> DataFrame:
    """Per-group approximate distinct count, engine-deterministic:
    ``(by..., n_hit, v_empty, n_est)``.

    The HLL recipe in exact integer steps — md5 hash → register
    ``j = h % m`` + rank ``rho = W+1−bitlength(w)`` (w = the next W hash
    bits; leading-zero count via ``length(bin(w))``, the repo's log2
    idiom) → per-register max → harmonic sum as ONE integer
    ``S = Σ 2^(W+1−M[j])`` over the common denominator ``2^(W+1)`` →
    ``raw = α·m²·2^(W+1) div S div 1024`` → Flajolet's small-range
    linear-counting branch ``m·ln(m/V)`` via the fixed-point log2 kit
    (``(il(m)−il(V))·ln2``) when registers are still empty and the raw
    estimate is under ``5m/2``. Accuracy: σ≈6.5% in the HLL regime;
    the linear-counting branch adds the il interpolation error (≤0.09
    bits) — pytest-bounded.

    Scale shape (100 TB): ONE map-side-combining aggregate keyed by
    (group, register) — at most m=256 rows per group survive the
    combine regardless of input rows — then a group-keyed rollup of
    ≤256 rows. The exact-distinct alternative shuffles every distinct
    value; this shuffles 256 longs per group. Duplicates collapse
    map-side (max is idempotent), so the sketch is also
    replay/append-friendly: union register tables and re-max to merge.
    """
    regs = hll_md5_registers(df, col, by=by, salt=salt)
    return hll_md5_estimate(regs, by=by)


def hll_md5_registers(
    df: DataFrame,
    col: str,
    by: list[str] | None = None,
    salt: str = "h",
) -> DataFrame:
    """The sketch STATE: per-group register table ``(by..., __j, __m)``
    — ≤ 2^HLL_P rows per group after the map-side combine. Persist these
    per table-partition/date-slice (the distinct_sketch pattern) and
    answer coarser-grained distinct questions later via
    :func:`hll_md5_merge` without rescanning data."""
    m = 1 << HLL_P
    keys = by or []
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    j = h % m
    return (
        # NULL values must not mint a register: a NULL hash would yield a
        # (__j NULL, __m NULL) row that count(*) counts but the harmonic
        # sum skips, driving v_empty = m - n_hit negative and corrupting
        # the estimate (identically in Spark and the SQL oracle — i.e.
        # oracle-green but wrong). HLL counts distinct non-NULL values.
        df.where(F.col(col).isNotNull())
        .select(*keys, j.alias("__j"), h.alias("__h"))
        .withColumn("__w", F.expr(f"(__h div {m}) % {1 << HLL_W}"))
        .withColumn(
            "__rho",
            F.when(F.col("__w") == 0, F.lit(HLL_W + 1)).otherwise(
                F.lit(HLL_W + 1) - F.length(F.bin(F.col("__w")))
            ),
        )
        .groupBy(*keys, "__j")
        .agg(F.max("__rho").alias("__m"))
    )


def hll_md5_merge(
    *register_tables: DataFrame, by: list[str] | None = None
) -> DataFrame:
    """Union register tables and re-max — the HLL merge (max is
    idempotent, commutative, associative, so merging ANY partition of
    the input rows into sketches estimates exactly like sketching the
    union once; pytest-proven). Also the regroup point: pass coarser
    ``by`` keys to roll slices up."""
    keys = by or []
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy(*keys, "__j").agg(F.max("__m").alias("__m"))


def hll_md5_estimate(
    regs: DataFrame, by: list[str] | None = None
) -> DataFrame:
    """Fold a register table into ``(by..., n_hit, v_empty, n_est)`` —
    the estimate stage of :func:`hll_md5_distinct`, shared by the
    merge path."""
    m = 1 << HLL_P
    keys = by or []
    per = regs.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n_hit"),
        F.sum(
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.lit(HLL_W + 1) - F.col("__m")).cast("int"),
            )
        ).alias("__s_hit"),
    )
    num = HLL_ALPHA_FP10 * m * m * (1 << (HLL_W + 1))
    # linear-counting ln(m/V) in fixed point via argument reduction +
    # 2-term atanh series: q = m·1024/V, s = bitlength(q)−11 (so
    # r = q>>s ∈ [1024, 2048)), z = (r−1024)·1024/(r+1024) ≤ 1024/3 —
    # series error < 0.5%, far below the il() interpolation error that
    # dominated the first cut (0.09 bits ABSOLUTE ≈ 60% relative on the
    # small logs this branch computes)
    out = (
        per.withColumn("v_empty", (F.lit(m) - F.col("n_hit")).cast("long"))
        .withColumn(
            "__s",
            F.col("__s_hit") + F.col("v_empty") * F.lit(1 << (HLL_W + 1)),
        )
        .withColumn("__raw", F.expr(f"({num} div __s) div 1024"))
        # greatest(,1): ANSI sessions raise on div-by-zero even in the
        # not-taken branch of the CASE below (v_empty = 0 ⇒ raw path)
        .withColumn("__q", F.expr(f"{m * 1024} div greatest(v_empty, 1)"))
        .withColumn("__sh", (F.length(F.bin("__q")) - 11).cast("int"))
        .withColumn(
            "__r", F.call_function("shiftright", F.col("__q"), F.col("__sh"))
        )
        .withColumn("__z", F.expr("((__r - 1024) * 1024) div (__r + 1024)"))
        .withColumn(
            "__ln",
            F.col("__sh").cast("long") * HLL_LN2_FP10
            + 2 * F.col("__z")
            + F.expr("(2 * __z * __z * __z) div 3145728"),
        )
        .withColumn(
            "n_est",
            F.when(
                (F.col("v_empty") > 0)
                & (F.col("__raw") * 2 < F.lit(5 * m)),
                F.expr(f"({m} * __ln) div 1024"),
            )
            .otherwise(F.col("__raw"))
            .cast("long"),
        )
    )
    return out.select(*keys, "n_hit", "v_empty", "n_est")


# ---------------------------------------------------------------------------
# log2-bucket quantile sketch (round 11): the third leg of the sketch
# family — distinct (md5-HLL), frequency (count-min), QUANTILES (this).
# Deterministic, mergeable, and ANSI-SQL-expressible: values bucket by
# floor(log2(v)), so every estimate carries a PROVEN [2^b, 2^(b+1)-1]
# envelope (relative error ≤ 2×) instead of a probabilistic rank bound —
# the right trade for percentile MONITORING (p99 doc length per source
# per day) where the exact per-group sort is the thing being avoided.
# ---------------------------------------------------------------------------


def log2_hist_sketch(
    df: DataFrame, col: str, by: list[str] | None = None
) -> DataFrame:
    """The sketch STATE: ``(by..., __b, __n)`` — one row per occupied
    log2 bucket (≤ 64 per group for int64 inputs, ≤ ~40 in practice).
    Bucket ``b`` holds values in ``[2^b, 2^(b+1))``; value 0 buckets at
    ``-1``. Inputs must be non-negative; NULLs mint no bucket (the r11
    sketch-hygiene rule shared with the HLL/CM fixes).

    Scale shape: ONE map-side-combining aggregate keyed by
    ``(by..., bucket)`` — at most 64 rows per group reach the exchange
    no matter how many values were scanned. Merge = sum on the same key
    (:func:`log2_hist_merge`), so per-slice sketches persisted next to
    table partitions answer coarser-grained quantile questions later
    without a rescan — exactly the distinct_sketch pattern."""
    keys = by or []
    v = F.col(col).cast("long")
    b = F.when(v == 0, F.lit(-1)).otherwise(
        (F.length(F.bin(v)) - 1).cast("int")
    )
    return (
        df.where(v.isNotNull() & (v >= 0))
        .select(*keys, b.alias("__b"))
        .groupBy(*keys, "__b")
        .agg(F.count("*").cast("long").alias("__n"))
    )


def log2_hist_merge(
    *sketches: DataFrame, by: list[str] | None = None
) -> DataFrame:
    """Union sketch states and re-sum — count addition is commutative/
    associative, so merging ANY partition of the rows estimates exactly
    like sketching the union once (pytest-proven). Also the regroup
    point: pass coarser ``by`` keys EXPLICITLY (``by=[]`` for a global
    roll-up) to roll slices up. With ``by=None`` (the default) the keys
    are INFERRED from the stored schema — every column that isn't sketch
    state — so folding a per-source sketch without naming the keys can
    never silently sum counts across sources (ADVICE r11)."""
    if by is None:
        keys = [c for c in sketches[0].columns if c not in ("__b", "__n")]
    else:
        keys = list(by)
        missing = [k for k in keys if k not in sketches[0].columns]
        if missing:
            raise ValueError(
                f"log2_hist_merge: by names columns absent from the "
                f"sketch state: {missing} (have {sketches[0].columns})"
            )
    out = sketches[0]
    for t in sketches[1:]:
        out = out.unionByName(t)
    return out.groupBy(*keys, "__b").agg(F.sum("__n").alias("__n"))


def log2_hist_quantiles(
    sketch: DataFrame,
    qs_ppm: list[int],
    by: list[str] | None = None,
) -> DataFrame:
    """Quantile envelopes from the sketch: one row per (group, q) with
    ``(q_ppm, n_values, lo, hi)`` where the discrete quantile at rank
    ``ceil(q·n)`` (1-based, ties-low — the ``quantile_disc`` convention)
    is GUARANTEED to lie in ``[lo, hi]`` (the occupied bucket's bounds;
    exact integer arithmetic end to end).

    Scale shape: the cumulative walk is a window over the ≤64-row
    per-group HISTOGRAM — metadata-scale, the vocab_coverage /
    quality_percentile_gate trick — then one explode over the
    ``len(qs_ppm)`` literal quantile list and a min-bucket aggregate.
    Nothing here ever touches the original values."""
    assert qs_ppm and all(0 < q <= 1_000_000 for q in qs_ppm)
    keys = by or []
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy("__b")
    tot = Window.partitionBy(*[F.col(k) for k in keys])
    cum = sketch.select(
        *keys,
        "__b",
        F.sum("__n").over(w).alias("__cum"),
        F.sum("__n").over(tot).alias("n_values"),
    )
    qarr = F.array(*[F.lit(int(q)) for q in qs_ppm])
    hit = (
        cum.select(
            *keys, "__b", "__cum", "n_values",
            F.explode(qarr).alias("q_ppm"),
        )
        # rank = ceil(n·q/1e6), integer-exact; smallest bucket covering it
        .where(
            F.col("__cum") * 1_000_000
            >= F.col("n_values") * F.col("q_ppm")
        )
        .groupBy(*keys, "q_ppm")
        .agg(
            F.min("__b").alias("__b"),
            F.max("n_values").alias("n_values"),
        )
    )
    lo = F.when(F.col("__b") < 0, F.lit(0)).otherwise(
        F.call_function("shiftleft", F.lit(1).cast("long"), F.col("__b"))
    )
    hi = F.when(F.col("__b") < 0, F.lit(0)).otherwise(
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.col("__b") + 1
        )
        - 1
    )
    return hit.select(
        *keys,
        F.col("q_ppm").cast("long").alias("q_ppm"),
        F.col("n_values").cast("long").alias("n_values"),
        lo.cast("long").alias("lo"),
        hi.cast("long").alias("hi"),
    )


def log2_hist_top_gate(
    sketch: DataFrame,
    keep_pct: int,
    by: list[str] | None = None,
) -> DataFrame:
    """Top-``keep_pct``% gate thresholds from the quantile sketch — the
    percentile gate (text/selection.py::percentile_gate, the DCLM
    "keep top-p% by classifier score" filter) answered from PERSISTED
    per-slice sketch state instead of a corpus rescan: merge the slices
    (:func:`log2_hist_merge`), walk the ≤64-row histogram, done.

    Per group emits ``(by..., n_values, gate_b, gate_lo, gate_hi_excl)``
    where ``gate_b`` is the bucket CONTAINING the exact tie-keeping
    threshold ``thr`` (the score of the ⌊n·p/100⌋-th largest value):
    ``gate_b = max{b : count(v ≥ 2^b) ≥ quota}`` — since bucket b holds
    ``[2^b, 2^(b+1))``, the cumulative-from-top at b IS ``count(v≥2^b)``,
    so ``2^gate_b ≤ thr < 2^(gate_b+1)`` exactly. Hence the PROVEN
    envelope the audit query asserts: gating at ``v ≥ gate_lo`` keeps a
    SUPERSET of the exact gate, ``v ≥ gate_hi_excl`` a subset —
    ``n_strict ≤ n_exact ≤ n_loose`` always. Groups whose quota floors
    to 0 (the exact gate keeps nothing) emit NO row — absent = empty
    gate, the floor semantics of percentile_gate.

    Scale shape: two windows + one aggregate over the per-group ≤64-row
    histogram — pure metadata; the corpus is never touched. The caller
    broadcasts the result back onto the corpus for the actual filter."""
    assert 0 <= keep_pct <= 100
    if by is None:
        keys = [c for c in sketch.columns if c not in ("__b", "__n")]
    else:
        keys = list(by)
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.desc("__b"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy(*[F.col(k) for k in keys])
    cum = sketch.select(
        *keys,
        "__b",
        F.sum("__n").over(w).alias("__cum_top"),
        F.sum("__n").over(tot).alias("n_values"),
    )
    hit = (
        cum.where(
            F.col("__cum_top")
            >= F.expr(f"(n_values * {int(keep_pct)}) div 100")
        )
        .where(F.expr(f"(n_values * {int(keep_pct)}) div 100") >= 1)
        .groupBy(*keys)
        .agg(
            F.max("__b").alias("gate_b"),
            F.max("n_values").cast("long").alias("n_values"),
        )
    )
    lo = F.when(F.col("gate_b") < 0, F.lit(0)).otherwise(
        F.call_function("shiftleft", F.lit(1).cast("long"), F.col("gate_b"))
    )
    hi_excl = F.when(F.col("gate_b") < 0, F.lit(1)).otherwise(
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.col("gate_b") + 1
        )
    )
    return hit.select(
        *keys,
        "n_values",
        F.col("gate_b").cast("int").alias("gate_b"),
        lo.cast("long").alias("gate_lo"),
        hi_excl.cast("long").alias("gate_hi_excl"),
    )


def streaming_log2_hist_sketch(
    stream: DataFrame,
    base_dir: str,
    checkpoint_dir: str,
    col: str,
    by: list[str] | None = None,
):
    """Maintain the quantile sketch over a stream — the monitoring twin
    of :func:`streaming_cm_sketch` with the identical replay-idempotence
    pattern: each micro-batch's ≤64-rows-per-group state lands in its
    OWN ``batch_id=N`` partition (dynamic partition overwrite ⇒ a
    replayed batch rewrites its partition instead of double-counting);
    :func:`read_log2_hist_sketch` folds partitions with
    :func:`log2_hist_merge` at question time. Answers "p99 doc length
    per source, so far today" from KB-scale state without rescanning
    the stream's history."""
    keys = by or []

    def do_batch(batch: DataFrame, batch_id: int) -> None:
        (
            log2_hist_sketch(batch, col, by=keys)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{base_dir}/log2_hist")
        )

    return (
        stream.writeStream.foreachBatch(do_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_log2_hist_sketch(
    spark, base_dir: str, by: list[str] | None = None
) -> DataFrame:
    """Fold the per-batch sketch partitions into ONE queryable state.

    ``by=None`` infers the group keys from the stored schema (all
    columns except ``__b``/``__n``/``batch_id``), so forgetting to name
    the keys a sketch was built with preserves them instead of silently
    summing across groups; pass an explicit coarser list to roll up."""
    parts = spark.read.parquet(f"{base_dir}/log2_hist").drop("batch_id")
    return log2_hist_merge(parts, by=by)


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) bottom-k sketch (round 12): the fourth leg of
# the mergeable-sketch family — distinct (md5-HLL), frequency
# (count-min), quantiles (log2 histogram), SET OPERATIONS (this). The
# bottom-k of a uniform hash is a fixed-size uniform sample of the
# DISTINCT key space, so two corpus snapshots' sketches answer
# union / intersection / Jaccard questions — "how much does the new
# crawl's vocabulary overlap the old?" — from ≤k longs per group
# without ever joining the corpora. Deterministic (md5-hashed like the
# HLL leg) → exactly oracle-able; merge = union ∘ re-bottom-k
# (idempotent, commutative, associative). Beyer et al., "On synopses
# for distinct-value estimation under multiset operations" (SIGMOD'07).
# ---------------------------------------------------------------------------

KMV_BITS = 60  #: md5 15-hex-char slice → uniform on [0, 2^60)
KMV_K = 256  #: default sketch size (σ ≈ 1/√(k−2) ≈ 6.3% on distincts)


def _kmv_hash(col: str, salt: str) -> Column:
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def kmv_sketch(
    df: DataFrame,
    col: str,
    k: int = KMV_K,
    by: list[str] | None = None,
    salt: str = "kmv",
    fan_in: int = 16,
) -> DataFrame:
    """The sketch STATE: ``(by..., __kmv array<long>)`` — the k smallest
    distinct 60-bit md5 hashes of ``col`` per group, sorted ascending
    (shorter than k when the group has fewer distincts — then the
    sketch IS the exact distinct set and estimates degrade to exact).
    NULLs mint no hash (the r11 sketch-hygiene rule shared with the
    HLL/CM/log2 legs).

    Scale shape (100 TB): two map-side-combining aggregates. Phase 1
    keys on ``(by..., hash mod fan_in)`` and keeps each salt lane's
    bottom-k, so AT MOST ``fan_in · k`` longs per group reach the
    second exchange no matter how many rows were scanned (the lane
    dedup itself is a hash aggregate — spillable, the same class as any
    distinct); phase 2 folds the lanes. The exact alternative shuffles
    every distinct value to one task per group; this shuffles ≤
    ``fan_in·k`` longs and no group ever lands on a single straggler
    task with its full distinct set."""
    assert k >= 2, "KMV needs k >= 2 (the k-th order statistic)"
    keys = by or []
    hashed = (
        df.where(F.col(col).isNotNull())
        .select(*keys, _kmv_hash(col, salt).alias("__h"))
        .withColumn("__lane", F.pmod(F.col("__h"), F.lit(fan_in)))
    )
    lanes = hashed.groupBy(*keys, "__lane").agg(
        F.slice(F.array_sort(F.collect_set("__h")), 1, k).alias("__p")
    )
    # lanes hold disjoint hash residues → the flatten is already
    # duplicate-free; one sort + slice finishes the bottom-k
    return lanes.groupBy(*keys).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("__p"))), 1, k
        ).alias("__kmv")
    )


def kmv_merge(
    *sketches: DataFrame, k: int = KMV_K, by: list[str] | None = None
) -> DataFrame:
    """Union sketch states and re-bottom-k — set-union then k smallest
    is idempotent/commutative/associative, so merging ANY partition of
    the input rows (per-shard, per-day, replayed batches) sketches
    exactly like one pass over the union (pytest-proven). Also the
    regroup point: pass coarser ``by`` keys EXPLICITLY (``by=[]`` for a
    global roll-up). With ``by=None`` the keys are INFERRED from the
    stored schema — every column that isn't sketch state — so folding a
    per-source sketch without naming the keys can never silently pool
    hashes across sources (the ADVICE r11 rule).

    Caller contract (the cm_merge identical-(depth,width,salt) rule):
    every input must be built with the SAME ``k`` and ``salt`` — a
    sketch saturated at a smaller k merged under a larger one reads as
    unsaturated-exact, and different salts make the hash spaces
    incomparable. Neither is detectable from the state alone."""
    if by is None:
        keys = [
            c for c in sketches[0].columns if c not in ("__kmv", "batch_id")
        ]
    else:
        keys = list(by)
        missing = [k_ for k_ in keys if k_ not in sketches[0].columns]
        if missing:
            raise ValueError(
                f"kmv_merge: by names columns absent from the sketch "
                f"state: {missing} (have {sketches[0].columns})"
            )
    out = sketches[0]
    for t in sketches[1:]:
        out = out.unionByName(t)
    return out.groupBy(*keys).agg(
        F.slice(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("__kmv")))
            ),
            1,
            k,
        ).alias("__kmv")
    )


def _kmv_est(arr: Column, k: int) -> Column:
    """Distinct estimate from a bottom-k array: exact size when the
    sketch is unsaturated, else ``floor((k−1)·2^60 / h_k)`` (Beyer et
    al.'s unbiased KMV estimator). Every step is deterministic IEEE —
    ``(k−1)·2^60`` is an exact double (mantissa k−1 < 2^53), the
    long→double cast of ``h_k`` and the division are correctly rounded
    identically in Spark and DuckDB. ``h_k = 0`` is impossible: the
    k-th smallest of k DISTINCT non-negative hashes is ≥ k−1 ≥ 1."""
    n = F.size(arr)
    hk = F.element_at(arr, k).cast("double")
    return (
        F.when(n < k, n.cast("long"))
        .otherwise(
            F.floor(F.lit(float((k - 1) * (1 << KMV_BITS))) / hk).cast(
                "long"
            )
        )
    )


def kmv_distinct_estimate(
    sketch: DataFrame, k: int = KMV_K, by: list[str] | None = None
) -> DataFrame:
    """Fold sketch state into ``(by..., n_kept, n_est)``. ``by=None``
    infers keys from the schema (the kmv_merge rule)."""
    if by is None:
        keys = [c for c in sketch.columns if c not in ("__kmv", "batch_id")]
    else:
        keys = list(by)
    return sketch.select(
        *keys,
        F.size("__kmv").cast("long").alias("n_kept"),
        _kmv_est(F.col("__kmv"), k).alias("n_est"),
    )


def kmv_set_ops(
    a: DataFrame,
    b: DataFrame,
    k: int = KMV_K,
    by: list[str] | None = None,
) -> DataFrame:
    """Set-operation estimates between two sketches (per shared group):
    ``(by..., n_a_est, n_b_est, union_est, inter_est, jaccard_ppm)``.

    The bottom-k of the UNION of the two hash sets is itself the KMV
    sketch of A ∪ B (computable from the two sketches alone — the KMV
    closure property), and within that combined bottom-k the fraction
    of hashes present in BOTH sketches is an unbiased Jaccard estimate;
    ``inter_est = union_est · n_common div n_u`` and ``jaccard_ppm``
    (parts-per-million, integer fixed point) follow deterministically.
    With ``by=None`` both sides must be GLOBAL (one-row) sketches —
    they join as 1×1 broadcast relations; grouped sketches join on the
    inferred keys (inner: a group absent from either side has no
    overlap question to answer)."""
    if by is None:
        keys = [c for c in a.columns if c not in ("__kmv", "batch_id")]
    else:
        keys = list(by)
    left = a.select(*keys, F.col("__kmv").alias("__ka"))
    right = b.select(*keys, F.col("__kmv").alias("__kb"))
    j = left.crossJoin(right) if not keys else left.join(right, keys)
    return _kmv_pair_estimates(j, k).select(
        *keys, "n_a_est", "n_b_est", "union_est", "inter_est", "jaccard_ppm"
    )


def _kmv_pair_estimates(j: DataFrame, k: int) -> DataFrame:
    """Append the set-operation estimate columns to a frame carrying
    ``__ka``/``__kb`` sketch arrays — shared by :func:`kmv_set_ops`
    (two sketch tables joined on group keys) and
    :func:`kmv_overlap_matrix` (one grouped sketch self-paired).
    Integer ``div`` (not double ``/``) keeps the fixed-point results
    exact and identical to the oracle's ``//``."""
    u = F.slice(
        F.array_sort(F.array_distinct(F.concat("__ka", "__kb"))), 1, k
    )
    return (
        j.withColumn("__u", u)
        .withColumn("__n_u", F.size("__u").cast("long"))
        .withColumn(
            "__n_common",
            F.size(
                F.array_intersect(F.array_intersect("__u", "__ka"), "__kb")
            ).cast("long"),
        )
        .withColumn("union_est", _kmv_est(F.col("__u"), k))
        .withColumn("n_a_est", _kmv_est(F.col("__ka"), k))
        .withColumn("n_b_est", _kmv_est(F.col("__kb"), k))
        .withColumn(
            "inter_est", F.expr("(union_est * __n_common) div __n_u")
        )
        .withColumn(
            "jaccard_ppm", F.expr("(__n_common * 1000000) div __n_u")
        )
    )


def kmv_overlap_matrix(
    sketch: DataFrame, key: str, k: int = KMV_K, barrier: str | None = "local"
) -> DataFrame:
    """All-pairs overlap surface between per-group sketches — "which
    sources duplicate each other?" as one row per unordered group pair
    ``(key_a < key_b)`` with the :func:`kmv_set_ops` estimate columns.

    Scale shape: the sketch table IS the input (S rows of ≤k longs —
    KB-scale state, typically read back from the persisted per-slice
    partitions), so the S·(S−1)/2 pair expansion is a broadcast-size
    self-join over index metadata; the corpora are never touched. When
    the sketch comes in as an unmaterialized plan over the corpus, it
    feeds BOTH self-join sides, so it is stage-barrier-pinned first
    (the consumed-twice rule): the corpus scan + sketch aggregate run
    ONCE, both sides read the KB-scale pin. ``barrier=None`` opts out
    (e.g. when the input is already a read-back parquet). The caller
    contract is kmv_merge's: one sketch table, one (k, salt)."""
    if barrier is not None:
        from pharmacodi_spark.barrier import stage_barrier

        sketch = stage_barrier(sketch, mode=barrier, name="kmv_matrix")
    a = sketch.select(
        F.col(key).alias(f"{key}_a"), F.col("__kmv").alias("__ka")
    )
    b = sketch.select(
        F.col(key).alias(f"{key}_b"), F.col("__kmv").alias("__kb")
    )
    j = a.join(b, F.col(f"{key}_a") < F.col(f"{key}_b"))
    return _kmv_pair_estimates(j, k).select(
        f"{key}_a",
        f"{key}_b",
        "n_a_est",
        "n_b_est",
        "union_est",
        "inter_est",
        "jaccard_ppm",
    )


def streaming_kmv_sketch(
    stream: DataFrame,
    base_dir: str,
    checkpoint_dir: str,
    col: str,
    k: int = KMV_K,
    by: list[str] | None = None,
):
    """Maintain the KMV sketch over a stream — the set-operations twin
    of :func:`streaming_log2_hist_sketch` with the identical
    replay-idempotence pattern: each micro-batch's ≤k-longs-per-group
    state lands in its OWN ``batch_id=N`` partition (dynamic partition
    overwrite ⇒ a replayed batch rewrites its partition; and because
    merge is set-union ∘ bottom-k, even double-counting would be
    harmless — KMV merge is fully idempotent, unlike the counting
    sketches). :func:`read_kmv_sketch` folds partitions with
    :func:`kmv_merge` at question time — "how much does today's crawl
    overlap yesterday's?" from KB-scale state."""
    keys = by or []

    def do_batch(batch: DataFrame, batch_id: int) -> None:
        (
            kmv_sketch(batch, col, k=k, by=keys)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{base_dir}/kmv")
        )

    return (
        stream.writeStream.foreachBatch(do_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_kmv_sketch(
    spark, base_dir: str, k: int = KMV_K, by: list[str] | None = None
) -> DataFrame:
    """Fold the per-batch sketch partitions into ONE queryable state.

    ``by=None`` infers the group keys from the stored schema (all
    columns except ``__kmv``/``batch_id``) — the ADVICE r11 rule: a
    sketch built per-source folds per-source unless the caller
    EXPLICITLY rolls up with a coarser list."""
    parts = spark.read.parquet(f"{base_dir}/kmv").drop("batch_id")
    return kmv_merge(parts, k=k, by=by)
