"""Named query registry — the driver-facing correctness surface.

Every entry exercises one (or a cluster of) SURVEY.md §2 operators on the
driver's synthetic tables, with a DuckDB-equivalent ANSI SQL oracle. The
driver runs both at sf0.01 and compares row-count + schema + order-
insensitive value-hash, so:

- every computed column is aliased identically on both sides;
- double aggregates are ``round``-ed (fp accumulation order differs between
  engines — rounding at 2-6 decimals absorbs the ulp drift);
- integer sums are cast to BIGINT on the DuckDB side (DuckDB widens integer
  SUM to HUGEINT, Spark to LONG);
- rank/row_number outputs are cast to LONG on the Spark side (DuckDB windows
  return BIGINT);
- timestamps never leave a query raw — epoch seconds/micros (BIGINT) or
  formatted date strings only, with the Spark session pinned to UTC;
- cross-engine float kernels (similarity) are quantized to integer math so
  results are bit-exact, not merely close.

Cross-engine-deterministic hashing: Spark's ``hash``/``xxhash64`` have no
DuckDB counterpart, so content hashes are built from ``md5`` (identical hex
output in both engines) → first 15 hex digits → BIGINT (60 bits):
Spark ``conv(substr(md5(x),1,15),16,10)`` ≡ DuckDB
``('0x' || substr(md5(x),1,15))::BIGINT``. This makes even MinHash
signatures oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window

from pharmacodi_spark.functions.scalar import local_df
from pyspark.sql import functions as F

# name -> (spark_fn, oracle_sql | None)
QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn

    return deco


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_queries() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}


# sessions already pinned by _pin_session (keyed by JVM session hash so a
# restarted session re-pins). NOTE for embedders: queries built through this
# registry REQUIRE a UTC session and nanos-as-long parquet reads for oracle
# parity; _pin_session mutates those two confs on first use of a session.
_PINNED_SESSIONS: set[int] = set()


def _pin_session(spark: SparkSession) -> None:
    key = spark._jsparkSession.hashCode()
    if key in _PINNED_SESSIONS:
        # cheap drift check (ADVICE r4): an embedder that reset the timezone
        # mid-session would silently break oracle parity for every later
        # query — re-pin instead of trusting the cache (also covers a
        # hashCode collision with a dead session).
        if spark.conf.get("spark.sql.session.timeZone", "") == "UTC":
            return
        _PINNED_SESSIONS.discard(key)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _PINNED_SESSIONS.add(key)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Fixture vintages differ in how events.ts is stored: TIMESTAMP(NANOS)
    # (rejected by Spark's reader unless nanosAsLong, which then surfaces it
    # as an epoch-nanos LONG) vs TIMESTAMP(MICROS) (read as timestamp/
    # timestamp_ntz). Normalize at the one load boundary to epoch-nanos LONG
    # under a UTC session so every downstream integer-epoch expression and
    # every DuckDB oracle (epoch_ns(ts)) sees identical values either way.
    # Confs are pinned here (once per session, not per load), not only in
    # our session builder, because the driver runs these queries in its own
    # SparkSession. Exact integer epoch math beats timestamp semantics for
    # oracle parity anyway.
    _pin_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and df.schema["ts"].dataType.typeName().startswith("timestamp"):
        df = df.withColumn(
            "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
        )
    return df


def fan_out(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition a narrow DataFrame by ``keys`` to the session's
    default parallelism, for use right before CPU-dense per-row work
    (shingle explode + md5, simhash bit sums).

    Why: the fixture tables are single-row-group parquet files, so the scan
    is ONE task and everything fused into it (explode, hashing, partial agg)
    runs serially. Shuffling the narrow pre-explode rows (ids + text, no
    derived data yet) costs ~MBs and buys full-width parallelism. On a real
    cluster the scan already has thousands of splits, and partitioning by
    the downstream aggregation key still pays: the groupBy reuses this
    exchange (hashpartitioning(keys) satisfies the agg distribution) instead
    of shuffling the much wider exploded rows."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *[F.col(k) for k in keys])


def _md5_long(col) -> F.Column:
    """60-bit integer hash from md5 hex — cross-engine deterministic."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _rnd(col, n: int = 0) -> F.Column:
    """Cross-engine-deterministic rounding: floor(x*10^n + 0.5)/10^n.

    Spark's ``round`` rounds the decimal string repr (BigDecimal HALF_UP)
    while DuckDB rounds the binary value — they disagree on exact .5
    boundaries even for IDENTICAL input doubles. floor/multiply/add are
    plain IEEE ops, so this helper + the same formula in the oracle SQL
    produce bit-identical doubles in both engines."""
    if isinstance(col, str):
        col = F.col(col)
    s = 10**n
    if s == 1:
        return F.floor(col + F.lit(0.5))
    return F.floor(col * s + F.lit(0.5)) / s


_MD5_LONG_SQL = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4) + scalar kit (§2.9)
# ---------------------------------------------------------------------------


@q(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
           floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS sum_base_price,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS sum_disc_price,
           floor((avg(l_quantity)) * 10000 + 0.5) / 10000 AS avg_qty,
           floor((avg(l_discount)) * 10000 + 0.5) / 10000 AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_discount BETWEEN 0.01 AND 0.08
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped groupBy/agg: A3/A5 group aggregates + F7 rounding +
    P5 range predicate. Map-side partial aggregation: only one row per
    (returnflag, linestatus) per partition reaches the shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_discount").between(0.01, 0.08))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
            _rnd(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            _rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            _rnd(F.avg("l_quantity"), 4).alias("avg_qty"),
            _rnd(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@q(
    "experiment_join",
    """
    SELECT c.c_mktsegment, o.o_orderpriority,
           floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100 AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment, o.o_orderpriority
    """,
)
def experiment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (SURVEY §7.1 step 2): the experiment-table build shape —
    fact ⋈ two lookups (J1/J2 equi-joins, reference build_experiment_tables.
    py:41-75) + group aggregate. Physical strategy by table role: orders
    GROWS with the fact (broadcasting it is a dead end at scale), so it
    co-shuffles via shuffled-hash (unique unskewed key — no sort passes);
    customer is the dim-ish side and broadcasts, so the joined stream flows
    join→partial-agg with no further exchange before the final agg."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").hint("shuffle_hash")
    cust = _t(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            _rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


@q(
    "group_count",
    """
    SELECT o_orderpriority, count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY o_orderpriority
    """,
)
def group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: value_counts (reference build_all_pset_tables.py:112-113) +
    countDistinct."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


@q(
    "table_stats",
    """
    SELECT 'customer' AS table_name, count(*) AS row_count FROM customer
    UNION ALL SELECT 'orders', count(*) FROM orders
    UNION ALL SELECT 'lineitem', count(*) FROM lineitem
    UNION ALL SELECT 'supplier', count(*) FROM supplier
    UNION ALL SELECT 'part', count(*) FROM part
    """,
)
def table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: dataset_statistics — row counts of N tables assembled into one
    summary (reference build_all_pset_tables.py:139-173)."""
    dfs = []
    for name in ["customer", "orders", "lineitem", "supplier", "part"]:
        dfs.append(
            _t(spark, sf_dir, name).agg(
                F.lit(name).alias("table_name"), F.count("*").alias("row_count")
            )
        )
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


@q(
    "null_counts",
    """
    SELECT CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
           CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
           count(*) AS n_rows
    FROM events
    """,
)
def null_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: null-count audit (reference np.any(isna) guards,
    build_meta_tables.py:84,191,216) as one aggregate pass."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.sum(F.col("value").isNull().cast("int")).cast("long").alias("null_value"),
        F.sum(F.col("props").isNull().cast("int")).cast("long").alias("null_props"),
        F.count("*").alias("n_rows"),
    )


@q(
    "group_concat",
    """
    SELECT r.r_name, string_agg(n.n_name, '|||' ORDER BY n.n_name) AS nations,
           count(*) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: '|||' group-concat (Cellosaurus assembly,
    build_cellosaurus.py:58-61). collect_list is order-nondeterministic
    under parallelism → array_sort before join (SURVEY reshape notes)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), "|||").alias("nations"),
            F.count("*").alias("n_nations"),
        )
    )


@q(
    "rollup_stats",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets extension (SURVEY §2.4 note): reference has no
    cube/rollup; Spark provides it free — per-dimension stats tables in one
    pass instead of N separate groupBys."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), _rnd(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


# ---------------------------------------------------------------------------
# Projection / filter / conditional update (SURVEY §2.2)
# ---------------------------------------------------------------------------


@q(
    "harmonize_contract",
    """
    SELECT c_custkey AS customer_id,
           c_name AS name,
           CAST(floor((c_acctbal) * 100 + 0.5) / 100 AS DOUBLE) AS acctbal,
           CAST(NULL AS VARCHAR) AS phone,
           CAST(c_nationkey AS BIGINT) AS nation_id
    FROM customer
    """,
)
def harmonize_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/P10/P11: select+rename+cast+typed-null padding — the
    harmonize_df_columns contract (reference utilities.py:6-50) as a single
    projection folded into the scan."""
    from pharmacodi_spark.schema import harmonize

    c = _t(spark, sf_dir, "customer")
    c = c.select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("name"),
        _rnd("c_acctbal", 2).alias("acctbal"),
        F.col("c_nationkey").alias("nation_id"),
    )
    return harmonize(
        c,
        {
            "customer_id": "long",
            "name": "string",
            "acctbal": "double",
            "phone": "string",
            "nation_id": "long",
        },
    )


@q(
    "filter_predicates",
    """
    SELECT l_orderkey, l_linenumber, l_discount
    FROM lineitem
    WHERE l_discount > 0.05 AND l_returnflag = 'R'
      AND l_quantity IS NOT NULL AND l_linestatus <> ''
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/P5/P6: comparison, equality, not-null and empty-string predicates
    (reference combine_pset_tables.py:173, build_synonym_tables.py:69) — all
    pushed to the parquet scan (PushedFilters)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_discount") > 0.05)
        & (F.col("l_returnflag") == "R")
        & F.col("l_quantity").isNotNull()
        & (F.col("l_linestatus") != "")
    ).select("l_orderkey", "l_linenumber", "l_discount")


@q(
    "clamp_recode",
    """
    SELECT l_orderkey, l_linenumber,
           floor((least(l_extendedprice, 2000.0)) * 100 + 0.5) / 100 AS clamped_price,
           CASE WHEN l_returnflag = 'R' THEN 'RETURNED'
                WHEN l_returnflag = 'A' THEN 'ACCEPTED'
                ELSE 'NONE' END AS return_status
    FROM lineitem
    """,
)
def clamp_recode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/P9: conditional-update clamp (IC50 ≤ 1e54,
    combine_pset_tables.py:173) + CASE-WHEN recode
    (build_meta_tables.py:200-201)."""
    from pharmacodi_spark.functions.scalar import recode

    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _rnd(F.least(F.col("l_extendedprice"), F.lit(2000.0)), 2).alias("clamped_price"),
        recode("l_returnflag", {"R": "RETURNED", "A": "ACCEPTED"}, default=F.lit("NONE")).alias(
            "return_status"
        ),
    )


@q(
    "constant_flag",
    """
    SELECT o_orderkey, 'tpch' AS source,
           CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS high_value
    FROM orders
    """,
)
def constant_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12/P13: constant column (df['dataset_id'] = name,
    build_experiment_tables.py:65) + derived 0/1 flag (permutation_done,
    build_gene_compound_tissue_dataset_tables.py:81-82)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.lit("tpch").alias("source"),
        F.when(F.col("o_totalprice") > 150000, 1).otherwise(0).alias("high_value"),
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------


@q(
    "broadcast_left_join",
    """
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def broadcast_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J3: dim-enrichment left join, dim broadcast (reference keyed joins
    combine_pset_tables.py:296-330; build_experiment_tables.py:68-69)."""
    from pharmacodi_spark.operators.joins import broadcast_left_join as blj

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return blj(
        o.withColumnRenamed("o_custkey", "c_custkey"), c, on="c_custkey"
    ).select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")


@q(
    "composite_key_join",
    """
    SELECT d.l_orderkey, d.l_linenumber, d.l_quantity AS dose,
           r.l_extendedprice AS response,
           floor((r.l_extendedprice / d.l_quantity) * 10000 + 0.5) / 10000 AS unit_price
    FROM (SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem) d
    JOIN (SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem) r
      ON d.l_orderkey = r.l_orderkey AND d.l_linenumber = r.l_linenumber
    """,
)
def composite_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: the dose⋈response composite-key join
    (build_experiment_tables.py:123-129). The reference pre-indexes for a
    "~3x" speedup; here the physical choice is explicit: the composite key
    is UNIQUE per side and unskewed, so a shuffled-hash hint skips both
    sort passes of the default sort-merge join (~2x measured at sf0.1 —
    the Spark analog of the reference's indexing note). AQE's skew-join
    splitting still applies if a deployment's key distribution degrades."""
    li = _t(spark, sf_dir, "lineitem")
    dose = li.select("l_orderkey", "l_linenumber", "l_quantity")
    resp = li.select("l_orderkey", "l_linenumber", "l_extendedprice").hint(
        "shuffle_hash"
    )
    return dose.join(resp, on=["l_orderkey", "l_linenumber"]).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("dose"),
        F.col("l_extendedprice").alias("response"),
        _rnd(F.col("l_extendedprice") / F.col("l_quantity"), 4).alias("unit_price"),
    )


@q(
    "fk_remap_dense",
    """
    WITH dim AS (
      SELECT event_type AS name,
             CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) AS id
      FROM (SELECT DISTINCT event_type FROM events)
    )
    SELECT e.event_id, d.id AS event_type_id
    FROM events e JOIN dim d ON e.event_type = d.name
    """,
)
def fk_remap_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 + W1: the combine-phase core — build a dim with dense surrogate ids
    (combine_pset_tables.py:345-348), then rewrite the fact's natural key to
    ids via broadcast join (combine_pset_tables.py:296-330). The fact table
    never shuffles; the dim's global row_number is a single-task shuffle on
    ≤|distinct| rows only (SURVEY §7.3 item 1)."""
    from pharmacodi_spark.operators.dedup import distinct_dim
    from pharmacodi_spark.operators.keys import surrogate_key, remap_fk

    ev = _t(spark, sf_dir, "events")
    dim = surrogate_key(distinct_dim(ev, "event_type"), order_by=["name"])
    dim = dim.withColumn("id", F.col("id").cast("long"))
    remapped, _audit = remap_fk(
        ev.select("event_id", F.col("event_type")),
        dim.withColumnRenamed("name", "event_type"),
        fk="event_type",
        on_miss="drop",
    )
    return remapped.select("event_id", "event_type_id")


@q(
    "update_join_coalesce",
    """
    SELECT n.n_nationkey,
           coalesce(p.iso, n.n_name) AS display_name
    FROM nation n
    LEFT JOIN (VALUES ('ALGERIA', 'DZ'), ('ARGENTINA', 'AR'), ('BRAZIL', 'BR'))
         AS p(name, iso)
      ON n.n_name = p.name
    """,
)
def update_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/J6: update-join — overwrite a column from a patch table only where
    matched (utilities.py:54-83 map_foreign_key_to_table;
    build_meta_tables.py:199-207 conditional compound-name patch). Pure
    join+coalesce projection; Tungsten fuses it into one stage."""
    from pharmacodi_spark.operators.joins import update_join

    n = _t(spark, sf_dir, "nation")
    patch = local_df(
        spark,
        [("ALGERIA", "DZ"), ("ARGENTINA", "AR"), ("BRAZIL", "BR")],
        ["n_name", "iso"],
    )
    out = update_join(
        n.withColumn("display_name", F.col("n_name")),
        patch.withColumnRenamed("iso", "display_name_new"),
        on="n_name",
        update_cols={"display_name": "display_name_new"},
    )
    return out.select("n_nationkey", "display_name")


@q(
    "dim_preserving_join",
    """
    SELECT n.n_name, CAST(coalesce(cnt.n_customers, 0) AS BIGINT) AS n_customers
    FROM nation n
    LEFT JOIN (SELECT c_nationkey, count(*) AS n_customers
               FROM customer GROUP BY c_nationkey) cnt
      ON n.n_nationkey = cnt.c_nationkey
    """,
)
def dim_preserving_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: dim-preserving direction — keep every dim row even with no facts
    (gene_annotation joined 'the other way', combine_pset_tables.py:115-119)."""
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    cnt = c.groupBy("c_nationkey").agg(F.count("*").alias("n_customers"))
    return (
        n.join(cnt, n.n_nationkey == cnt.c_nationkey, "left")
        .select(
            "n_name",
            F.coalesce(F.col("n_customers"), F.lit(0)).cast("long").alias("n_customers"),
        )
    )


@q(
    "semi_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9-as-semi: the reference fakes semi joins with join+null-filter
    (build_cellosaurus.py:84-89); Spark has a real left_semi — no payload
    columns move, the probe side short-circuits on first match."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        F.broadcast(o.select(F.col("o_custkey").alias("c_custkey"))), on="c_custkey", how="left_semi"
    ).select("c_custkey", "c_name")


@q(
    "anti_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4's delete-unjoined audit path (combine_pset_tables.py:318-326) as a
    real left_anti join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        F.broadcast(o.select(F.col("o_custkey").alias("c_custkey"))), on="c_custkey", how="left_anti"
    ).select("c_custkey", "c_name")


@q(
    "cross_join_pairs",
    """
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
)
def cross_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: all-pairs cross join (np.meshgrid stub,
    build_meta_tables.py:256-268). Broadcast-nested-loop with the small side
    broadcast — never a shuffled cartesian."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return r.crossJoin(F.broadcast(n)).select("r_name", "n_name")


@q(
    "map_lookup",
    """
    SELECT n_nationkey,
           CASE CAST(n_regionkey AS INTEGER)
                WHEN 0 THEN 'R0' WHEN 1 THEN 'R1' WHEN 2 THEN 'R2'
                WHEN 3 THEN 'R3' WHEN 4 THEN 'R4' END AS region_label
    FROM nation
    """,
)
def map_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11: dict-lookup applied to a column (dataset_map .apply,
    build_synonym_tables.py:74-82) — constant-folded CASE WHEN, no join, no
    UDF."""
    from pharmacodi_spark.operators.joins import lookup_map

    n = _t(spark, sf_dir, "nation")
    out = lookup_map(
        n, "n_regionkey", {i: f"R{i}" for i in range(5)}, out_col="region_label"
    )
    return out.select("n_nationkey", "region_label")


# ---------------------------------------------------------------------------
# Dedup / windows / sort / sets (SURVEY §2.4-2.7)
# ---------------------------------------------------------------------------


@q(
    "distinct_rows",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_rows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: full-row distinct (drop_duplicates,
    combine_pset_tables.py:231-234)."""
    from pharmacodi_spark.operators.dedup import distinct_rows

    return distinct_rows(_t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus"))


@q(
    "first_per_group",
    """
    SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS first_order_date
    FROM (
      SELECT *, row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS g_rn,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def first_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: deterministic first-row-per-group — the reference's
    df[0,:,by(keys)] (combine_pset_tables.py:266-270) keeps file-order rows;
    we tie-break explicitly (SURVEY §2.4 A2 'deterministic variant')."""
    from pharmacodi_spark.operators.dedup import first_per_group

    o = _t(spark, sf_dir, "orders")
    first = first_per_group(o, keys=["o_custkey"], order_by=["o_orderdate", "o_orderkey"])
    return first.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("first_order_date"),
    )


@q(
    "surrogate_key_dim",
    """
    SELECT n_name AS name, CAST(row_number() OVER (ORDER BY n_name) AS BIGINT) AS id
    FROM nation
    """,
)
def surrogate_key_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W2 + O1: dense id = rank-in-sort-order on a dim
    (combine_pset_tables.py:345-348; sort-then-id at
    build_meta_tables.py:105-107)."""
    from pharmacodi_spark.operators.keys import surrogate_key

    n = _t(spark, sf_dir, "nation").select(F.col("n_name").alias("name"))
    return surrogate_key(n, order_by=["name"]).withColumn("id", F.col("id").cast("long"))


@q(
    "top_k_orders",
    """
    SELECT o_orderkey, floor((o_totalprice) * 100 + 0.5) / 100 AS total,
           CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k extension (SURVEY §2.6 note: reference has none). Spark compiles
    orderBy+limit to TakeOrderedAndProject — per-partition heaps, no global
    sort."""
    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_orderkey",
            _rnd("o_totalprice", 2).alias("total"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .orderBy("rank")
        .limit(10)
    )


@q(
    "union_dedup",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U2: union-all + dedup = set union (build_target_tables.py:73-75)."""
    from pharmacodi_spark.operators.sets import union_distinct

    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return union_distinct([c, s])


@q(
    "except_distinct",
    """
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT DISTINCT s_nationkey FROM supplier
    """,
)
def except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 extension: row-level set difference (reference only does
    column-name-level setdiff, build_meta_tables.py:62)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
    return c.subtract(s)


# ---------------------------------------------------------------------------
# Reshape (SURVEY §2.8)
# ---------------------------------------------------------------------------


@q(
    "melt_unpivot",
    """
    WITH wide AS (
      SELECT l_orderkey,
             floor((sum(CASE WHEN l_linenumber = 1 THEN l_quantity END)) * 100 + 0.5) / 100 AS q1,
             floor((sum(CASE WHEN l_linenumber = 2 THEN l_quantity END)) * 100 + 0.5) / 100 AS q2,
             floor((sum(CASE WHEN l_linenumber = 3 THEN l_quantity END)) * 100 + 0.5) / 100 AS q3
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey, line_id, qty FROM (
      SELECT l_orderkey, 1 AS line_id, q1 AS qty FROM wide
      UNION ALL SELECT l_orderkey, 2, q2 FROM wide
      UNION ALL SELECT l_orderkey, 3, q3 FROM wide
    ) WHERE qty IS NOT NULL
    """,
)
def melt_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1: the dose/response wide→long melt (build_experiment_tables.py:
    104-121): pivot lineitem into a ragged wide matrix (nulls where a line
    number is absent), then melt_wide back dropping nulls — round-trips both
    reshape directions. Our melt keys off actual column names, fixing the
    reference's rows-vs-columns rename bug (SURVEY §7.3 item 5)."""
    from pharmacodi_spark.operators.reshape import melt_wide

    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_orderkey").agg(
        *[
            _rnd(
                F.sum(F.when(F.col("l_linenumber") == i, F.col("l_quantity"))), 2
            ).alias(f"q{i}")
            for i in (1, 2, 3)
        ]
    )
    return melt_wide(
        wide, id_vars=["l_orderkey"], value_prefix="q", var_name="line_id", value_name="qty"
    )


@q(
    "pivot_wide",
    """
    SELECT l_returnflag,
           floor((sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END)) * 100 + 0.5) / 100 AS F,
           floor((sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END)) * 100 + 0.5) / 100 AS O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6: long→wide pivot (Cellosaurus record assembly shape,
    build_cellosaurus.py:53-63). Pivot values passed explicitly — skips
    Spark's extra distinct-values job (matters at scale)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(_rnd(F.sum("l_quantity"), 2))
    )


@q(
    "explode_tokens",
    """
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    """,
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3/F2: split + explode (Drug-IDs split-explode,
    get_chembl_targets.py:23-27) → token frequencies over documents."""
    from pharmacodi_spark.operators.reshape import explode_list

    d = _t(spark, sf_dir, "documents")
    tokens = explode_list(d.select("text"), "text", out_col="token", split_on=" ")
    return tokens.groupBy("token").agg(F.count("*").alias("n"))


@q(
    "regex_kit",
    """
    SELECT p_partkey,
           regexp_replace(p_type, ' .*$', '') AS type_head,
           lower(p_brand) AS brand_lower,
           CAST(len(string_split(p_name, ' ')) AS BIGINT) AS name_tokens,
           string_split(p_name, ' ')[1] AS first_word,
           regexp_replace(p_name, ' ', '', 'g') AS name_nospace
    FROM part
    """,
)
def regex_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F6: regexp_replace / split / lower / whitespace-strip — the
    reference's .apply+re.sub cleanups (build_synonym_tables.py:77-82,
    build_primary_pset_tables.py:121-122) as native codegen'd expressions.
    NB DuckDB regexp_replace needs the 'g' flag to match Spark's
    replace-all."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace("p_type", " .*$", "").alias("type_head"),
        F.lower("p_brand").alias("brand_lower"),
        F.size(F.split("p_name", " ")).cast("long").alias("name_tokens"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.regexp_replace("p_name", " ", "").alias("name_nospace"),
    )
