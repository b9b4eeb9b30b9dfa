"""Subquery / decorrelation kit — TPC-H-shaped analytic queries.

The reference's query surface is dataframe-mutation-shaped, but any engine
claiming its analytics seat must also run the classic warehouse patterns:
correlated scalar subqueries, EXISTS / NOT EXISTS audits, global-scalar
thresholds, arg-min-per-group, and count-distribution histograms. Each
query here states the *subquery* form in the DuckDB oracle and implements
the *decorrelated* Spark plan by hand — aggregate-then-join with explicit
broadcasts — which is exactly the rewrite a 1000-executor cluster needs
(per-row rescans of the inner table do not exist in a distributed plan;
the decorrelated aggregate is one shuffle, reused).

Cross-engine determinism notes (see plans/queries.py module docstring):
money is summed in integer cents (``floor(x*100+0.5)`` per row, then an
exact BIGINT sum) because summing 2-dp doubles accumulates
order-dependent ulp drift, while integer sums are exact in both engines;
quantities are integral doubles, so their sums/averages are exact and a
single IEEE division (avg) is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pharmacodi_spark.plans.queries import q, _t

# ---------------------------------------------------------------------------
# Q17-style: correlated scalar average (revenue from below-half-average
# quantity lineitems, per brand)
# ---------------------------------------------------------------------------


@q(
    "corr_avg_filter",
    """
    WITH part_avg AS (
        SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_brand,
           CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_small
    FROM lineitem l
    JOIN part_avg a ON a.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity < a.half_avg_qty
    GROUP BY p.p_brand
    """,
)
def corr_avg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 pattern: ``WHERE l_quantity < (SELECT 0.5*avg(l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)``.

    Decorrelated by hand: the per-part average is ONE aggregation (small
    output — one row per part), broadcast back onto lineitem, so the fact
    table is scanned once and never re-scanned per outer row. The oracle
    states the same plan as a CTE; DuckDB's optimizer performs the
    identical decorrelation from the EXISTS form, so the CTE form keeps
    the two plans comparable without changing semantics.

    Determinism: avg(l_quantity) = exact-integer-sum / count — one IEEE
    division, bit-identical in both engines; revenue summed in cents.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    part_avg = li.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(part_avg), "l_partkey")
        .where(F.col("l_quantity") < F.col("half_avg_qty"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


# ---------------------------------------------------------------------------
# Q2-style: arg-min per group (cheapest supplier per part)
# ---------------------------------------------------------------------------


@q(
    "argmin_supplier",
    """
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cost_cents
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT l_partkey AS p_partkey, l_suppkey AS best_suppkey,
           cost_cents, s.s_name
    FROM cost JOIN supplier s ON s.s_suppkey = cost.l_suppkey
    QUALIFY row_number() OVER (
        PARTITION BY l_partkey ORDER BY cost_cents, l_suppkey
    ) = 1
    """,
)
def argmin_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 pattern: ``WHERE cost = (SELECT min(cost) ... WHERE
    inner.part = outer.part)`` — the cheapest supplier for every part.

    The Spark plan avoids the window entirely: ``min(struct(cost,
    suppkey))`` is an ordinary aggregate, so there is no rank() and no
    per-part window sort over the fact. Struct min isn't hash-aggregable,
    so Spark plans it as a partial SortAggregate — but the sort runs over
    the (part, supplier)-grain cost table (already reduced by the first
    map-side partial sum), not over lineitem, and still combines map-side
    before its shuffle. Ties broken by suppkey via the struct's
    lexicographic order — deterministic in both engines because cost is an
    exact integer. Supplier names attach via broadcast (dim-sized).
    """
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("cost_cents")
    )
    best = (
        cost.groupBy("l_partkey")
        .agg(F.min(F.struct("cost_cents", "l_suppkey")).alias("m"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("m.l_suppkey").alias("best_suppkey"),
            F.col("m.cost_cents").alias("cost_cents"),
        )
    )
    return best.join(
        F.broadcast(supp), F.col("s_suppkey") == F.col("best_suppkey")
    ).select("p_partkey", "best_suppkey", "cost_cents", "s_name")


# ---------------------------------------------------------------------------
# Q21-style: EXISTS + NOT EXISTS audit (sole returning supplier in
# multi-supplier orders)
# ---------------------------------------------------------------------------


@q(
    "exists_coexist_audit",
    """
    SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS n_orders
    FROM (SELECT DISTINCT l_orderkey, l_suppkey
          FROM lineitem WHERE l_returnflag = 'R') l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def exists_coexist_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 pattern: suppliers who were the ONLY returning supplier
    in orders that involved more than one supplier — an EXISTS plus
    NOT EXISTS pair over the same fact table.

    Decorrelated without any semi/anti join: one aggregation to per-
    (order, supplier) grain with a ``bool_or(returned)`` flag, one more to
    per-order grain counting suppliers and returning suppliers, then a
    self-join back on l_orderkey.

    The explicit not-null filter below is load-bearing: without it, the
    final broadcast join injects ``IsNotNull(l_suppkey)`` into only ONE
    branch of the shared per-(order, supplier) subtree, the two branches
    stop being canonically equal, and ReuseExchange can't fire — the fact
    table gets scanned and aggregated twice. With it, the plan shows a
    single lineitem scan + shuffle feeding a ``ReusedExchange`` on the
    other branch (plan-asserted in tools/explain_audit.py).
    """
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey").isNotNull() & F.col("l_suppkey").isNotNull()
    )
    supp = _t(spark, sf_dir, "supplier")
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("ret")
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("ret").alias("n_ret")
    )
    return (
        per_os.join(per_o, "l_orderkey")
        .where((F.col("ret") == 1) & (F.col("n_supp") > 1) & (F.col("n_ret") == 1))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Q22-style: global scalar threshold + NOT EXISTS (wealthy customers with
# no big-ticket order)
# ---------------------------------------------------------------------------


@q(
    "global_scalar_anti",
    """
    WITH cust AS (
        SELECT c_custkey, c_nationkey,
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
        FROM customer
    ),
    thr AS (
        SELECT CAST(sum(bal_cents) AS DOUBLE) / count(*) AS avg_cents
        FROM cust WHERE bal_cents > 0
    )
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
           CAST(sum(bal_cents) AS BIGINT) AS total_cents
    FROM cust, thr
    WHERE bal_cents > avg_cents
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = cust.c_custkey
                        AND o.o_totalprice > 350000)
    GROUP BY c_nationkey
    """,
)
def global_scalar_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 pattern: customers with above-average (positive) account
    balance and NO order above a price threshold, grouped by nation —
    a global scalar subquery plus a correlated NOT EXISTS.

    Spark plan: the scalar is a 1-row aggregate crossed in via broadcast
    (a broadcast nested-loop join with one build row — free); the
    NOT EXISTS is a left_anti join against the *pre-filtered* orders
    (filter pushed below the join, so the anti join builds on big-ticket
    orders only, a small fraction of the table). Balances compared in
    exact cents: the threshold is one IEEE division of an exact integer
    sum, bit-identical across engines.
    """
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("bal_cents"),
    )
    orders = _t(spark, sf_dir, "orders")
    thr = (
        cust.where(F.col("bal_cents") > 0)
        .agg(
            (F.sum("bal_cents").cast("double") / F.count(F.lit(1))).alias("avg_cents")
        )
    )
    big = orders.where(F.col("o_totalprice") > 350000).select("o_custkey")
    return (
        cust.join(F.broadcast(thr))
        .where(F.col("bal_cents") > F.col("avg_cents"))
        .join(big, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum("bal_cents").alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Q13-style: count-distribution histogram (orders per customer)
# ---------------------------------------------------------------------------


@q(
    "count_distribution",
    """
    SELECT n_orders, CAST(count(*) AS BIGINT) AS n_cust
    FROM (
        SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    """,
)
def count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 pattern: the distribution of orders-per-customer,
    including zero-order customers (hence LEFT join, not a plain groupBy
    of orders).

    Spark plan: count orders per custkey FIRST (shrinks the fact side to
    dim cardinality with a map-side partial count), then a left join from
    customer to the counts. The second aggregation (histogram) groups on
    the count itself — tiny domain, so the final shuffle moves almost
    nothing. ``count(o_orderkey)`` vs ``count(*)`` matters: the former is
    0 for unmatched customers on both engines.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        cust.join(per_cust, F.col("o_custkey") == F.col("c_custkey"), "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


# ---------------------------------------------------------------------------
# Q18-style: HAVING threshold + semi join back to the fact (large orders)
# ---------------------------------------------------------------------------


@q(
    "having_semi_top",
    """
    WITH big AS (
        SELECT l_orderkey, sum(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200
    )
    SELECT o.o_orderkey, o.o_custkey, c.c_name,
           CAST(floor(big.total_qty + 0.5) AS BIGINT) AS total_qty,
           CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def having_semi_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 pattern: orders whose total lineitem quantity exceeds a
    threshold (``o_orderkey IN (SELECT l_orderkey ... HAVING sum > N)``),
    joined back to orders and customer for display columns.

    Spark plan: the HAVING aggregate runs first (map-side partial sums),
    and its small output joins orders on the unique o_orderkey; customer
    attaches by broadcast. Quantities are integral doubles, so
    sum(l_quantity) is exact and the >200 comparison cannot straddle an
    ulp; the output casts through floor(+0.5) only to land an integer
    column type on both engines.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 200)
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "o_orderkey",
            "o_custkey",
            "c_name",
            F.floor(F.col("total_qty") + F.lit(0.5)).cast("long").alias("total_qty"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("price_cents"),
        )
    )
