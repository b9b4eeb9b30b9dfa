"""End-to-end pipeline composition under the oracle gate (VERDICT r1 item 4).

The reference's actual product is the per-PSet → combine cascade
(combine_pset_tables.py:27-48): union per-PSet dims, dedupe, sort, assign
dense surrogate ids, FK-remap every dependent table, re-key experiment on
the composite (dataset, experiment), remap facts against it with the IC50
clamp (:173). Round 1 golden-tested the pieces in pytest; this query runs
the REAL pipeline functions (pipelines/combine.py — combine_dim,
combine_experiment, remap_fact_to_experiment) end-to-end on dims/facts
derived deterministically from the TPC-H fixture tables and hash-checks the
resulting fact table against a pure-SQL oracle that re-derives the entire
cascade.

Shape mapping (fixture → PharmacoDB):
  cells     ← customer names, sharded into two overlapping "PSets"
              (c_custkey % 4 ∈ {0,1} and ∈ {1,2}; % 4 == 3 appears in
              neither dim → exercises the on_miss="drop" audit path)
  compounds ← order priorities  (two shards by o_orderkey parity)
  tissues   ← nation names      (two overlapping shards)
  datasets  ← region names
  experiment← orders with natural keys (cell/compound/tissue/dataset names)
  fact      ← per-order profile with IC50 = o_totalprice, spiked to 2e60 on
              every 10th order so the 1e54 clamp (combine_pset_tables.py:173)
              is observable in the hash.

Scale: dims flow through row_number surrogate keys (≤1e5 rows — the dim
strategy per operators/keys.py); the fact side only ever touches broadcast
joins, zero fact shuffles, exactly the combine-phase design contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pharmacodi_spark.pipelines.combine import (
    combine_dim,
    combine_experiment,
    remap_fact_to_experiment,
)
from pharmacodi_spark.plans.queries import q, _rnd, _t

_COMBINE_SQL = """
WITH cell_dim AS (
  SELECT name, CAST(row_number() OVER (ORDER BY name) AS BIGINT) AS id
  FROM (SELECT DISTINCT c_name AS name FROM customer WHERE c_custkey % 4 IN (0, 1, 2))
),
compound_dim AS (
  SELECT name, CAST(row_number() OVER (ORDER BY name) AS BIGINT) AS id
  FROM (SELECT DISTINCT o_orderpriority AS name FROM orders)
),
tissue_dim AS (
  SELECT name, CAST(row_number() OVER (ORDER BY name) AS BIGINT) AS id
  FROM (SELECT DISTINCT n_name AS name FROM nation)
),
dataset_dim AS (
  SELECT name, CAST(row_number() OVER (ORDER BY name) AS BIGINT) AS id
  FROM (SELECT DISTINCT r_name AS name FROM region)
),
exp_nat AS (
  SELECT o_orderkey AS experiment_nat, c_name AS cell_nat,
         o_orderpriority AS comp_nat, n_name AS tis_nat, r_name AS ds_nat
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
),
exp_keyed AS (
  SELECT e.experiment_nat, e.ds_nat,
         c.id AS cell_id, p.id AS compound_id, t.id AS tissue_id,
         d.id AS dataset_id,
         CAST(row_number() OVER (ORDER BY d.id, e.experiment_nat) AS BIGINT) AS id
  FROM exp_nat e
  JOIN cell_dim c ON e.cell_nat = c.name
  JOIN compound_dim p ON e.comp_nat = p.name
  JOIN tissue_dim t ON e.tis_nat = t.name
  JOIN dataset_dim d ON e.ds_nat = d.name
),
fact AS (
  SELECT r_name AS ds_nat, o_orderkey AS experiment_nat,
         CASE WHEN o_orderkey % 10 = 0 THEN 2e60 ELSE o_totalprice END AS ic50
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
)
SELECT k.id AS experiment_id, k.cell_id, k.compound_id, k.tissue_id,
       k.dataset_id, LEAST(f.ic50, 1e54) AS "IC50"
FROM fact f
JOIN exp_keyed k
  ON f.experiment_nat = k.experiment_nat AND f.ds_nat = k.ds_nat
"""


@q("combine_pipeline", _COMBINE_SQL)
def combine_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1→E2 composition: combine_dim × 4 → combine_experiment (FK-remap
    cascade with drop audits + composite re-key) → remap_fact_to_experiment
    (broadcast composite join + IC50 clamp). All values pass through
    untouched doubles or exact literals, so the hash compare is exact."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    mod4 = F.col("c_custkey") % 4
    cell_dim = combine_dim(
        [
            cust.where(mod4.isin(0, 1)).select(F.col("c_name").alias("name")),
            cust.where(mod4.isin(1, 2)).select(F.col("c_name").alias("name")),
        ]
    )
    par = F.col("o_orderkey") % 2
    compound_dim = combine_dim(
        [
            orders.where(par == 0).select(F.col("o_orderpriority").alias("name")),
            orders.where(par == 1).select(F.col("o_orderpriority").alias("name")),
        ]
    )
    tissue_dim = combine_dim(
        [
            nation.where(F.col("n_nationkey") < 15).select(F.col("n_name").alias("name")),
            nation.where(F.col("n_nationkey") >= 10).select(F.col("n_name").alias("name")),
        ]
    )
    dataset_dim = combine_dim([region.select(F.col("r_name").alias("name"))])

    geo = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )
    with_geo = orders.join(geo, orders.o_custkey == geo.c_custkey)
    exp_nat = with_geo.select(
        F.col("o_orderkey").alias("experiment_id"),
        F.col("c_name").alias("cell_id"),
        F.col("o_orderpriority").alias("compound_id"),
        F.col("n_name").alias("tissue_id"),
        F.col("r_name").alias("dataset_id"),
    )
    exp, _audits = combine_experiment(
        exp_nat, cell_dim, compound_dim, tissue_dim, dataset_dim
    )

    fact = with_geo.select(
        F.col("r_name").alias("dataset_id"),
        F.col("o_orderkey").alias("experiment_id"),
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(2e60))
        .otherwise(F.col("o_totalprice"))
        .alias("IC50"),
    )
    # carry the remapped dim ids through the one broadcast join instead of
    # re-joining the experiment subtree afterwards — one pass over the fact,
    # and the dim/experiment plan forest is traversed once
    remapped = remap_fact_to_experiment(
        fact, exp, clamp_ic50=True,
        carry=["cell_id", "compound_id", "tissue_id", "dataset_id"],
    )
    return remapped.select(
        F.col("experiment_id").cast("long"),
        F.col("cell_id").cast("long"),
        F.col("compound_id").cast("long"),
        F.col("tissue_id").cast("long"),
        F.col("dataset_id").cast("long"),
        "IC50",
    )


_SYN_SQL = """
WITH dim AS (
  SELECT c_name AS name, CAST(row_number() OVER (ORDER BY c_name) AS BIGINT) AS id
  FROM (SELECT DISTINCT c_name FROM customer)
),
ds AS (
  SELECT r_name AS name, CAST(row_number() OVER (ORDER BY r_name) AS BIGINT) AS id
  FROM (SELECT DISTINCT r_name FROM region)
),
long AS (
  SELECT c_name AS uniq, 'AFRICA' AS dataset_name, c_name || '@AF' AS synonym
  FROM customer WHERE c_custkey % 2 = 0
  UNION
  SELECT c_name, 'AMERICA', c_name || '@AM' FROM customer WHERE c_custkey % 3 = 0
  UNION
  SELECT c_name, 'ASIA', c_name || '@AS' FROM customer WHERE c_custkey % 5 = 0
),
joined AS (
  SELECT DISTINCT d.id AS cell_id, s.id AS dataset_id, l.synonym
  FROM long l
  JOIN dim d ON l.uniq = d.name
  JOIN ds s ON l.dataset_name = s.name
)
SELECT cell_id, dataset_id, synonym,
       CAST(row_number() OVER (ORDER BY cell_id, dataset_id, synonym) AS BIGINT) AS id
FROM joined
"""


@q("synonym_pipeline", _SYN_SQL)
def synonym_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 composition under the oracle gate: the parameterized synonym-table
    builder (pipelines/enrichment.py::build_synonym_table — the op the
    reference duplicates 3× in build_synonym_tables.py) run end-to-end on a
    metadata sheet derived from TPC-H: one wide row per canonical name
    ("unique.cellid") with per-dataset spelling columns (AFRICA_cellid, ...),
    melted (R2), dataset-column names regex-cleaned (F1), dim and dataset
    ids attached via broadcast joins, deduped, dense ids ranked by
    (cell_id, dataset_id, synonym). The oracle re-derives the whole cascade."""
    from pharmacodi_spark.operators.keys import surrogate_key
    from pharmacodi_spark.pipelines.enrichment import build_synonym_table

    cust = _t(spark, sf_dir, "customer")
    region = _t(spark, sf_dir, "region")
    dim = surrogate_key(
        cust.select(F.col("c_name").alias("name")).distinct(), order_by=["name"]
    )
    dataset = surrogate_key(
        region.select(F.col("r_name").alias("name")).distinct(), order_by=["name"]
    )
    meta = cust.select(
        F.col("c_name").alias("unique.cellid"),
        F.when(
            F.col("c_custkey") % 2 == 0, F.concat(F.col("c_name"), F.lit("@AF"))
        ).alias("AFRICA_cellid"),
        F.when(
            F.col("c_custkey") % 3 == 0, F.concat(F.col("c_name"), F.lit("@AM"))
        ).alias("AMERICA_cellid"),
        F.when(
            F.col("c_custkey") % 5 == 0, F.concat(F.col("c_name"), F.lit("@AS"))
        ).alias("ASIA_cellid"),
    )
    out = build_synonym_table(meta, dim, dataset, "cellid", "cell_id")
    return out.select(
        F.col("cell_id").cast("long"),
        F.col("dataset_id").cast("long"),
        "synonym",
        F.col("id").cast("long"),
    )


_META_SQL = """
WITH cust_dim AS (
  SELECT c_name AS name, CAST(row_number() OVER (ORDER BY c_name) AS BIGINT) AS id
  FROM (SELECT DISTINCT c_name FROM customer)
),
nat_dim AS (
  SELECT n_name AS name, CAST(row_number() OVER (ORDER BY n_name) AS BIGINT) AS id
  FROM (SELECT DISTINCT n_name FROM nation WHERE n_nationkey % 4 != 3)
),
fact AS (
  SELECT o_orderkey, c_name, n_name, o_orderpriority AS mdt,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS centi
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
),
mapped AS (
  SELECT f.o_orderkey, cd.id AS cust_id, nd.id AS nat_id, f.mdt, f.centi
  FROM fact f
  JOIN cust_dim cd ON f.c_name = cd.name
  JOIN nat_dim nd ON f.n_name = nd.name
)
SELECT CAST(row_number() OVER (ORDER BY cust_id, nat_id, mdt, o_orderkey)
            AS BIGINT) AS id,
       cust_id, nat_id, mdt, o_orderkey, centi
FROM mapped
"""


@q("meta_pipeline", _META_SQL)
def meta_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The meta-table builder (pipelines/meta.py::build_meta_table — the
    10⁷–10⁸-row gene_compound_* family) end-to-end: broadcast FK remap of
    each natural key with required-raise vs warn-drop audit semantics (the
    nat dim is missing every 4th nation → drop path exercised), then the
    FACT-SCALE dense primary key (range-repartition surrogate, no global
    window — dense_global inside build_meta_table) over a tie-broken sort.
    The oracle re-derives the cascade with a row_number over the same total
    order, value-checking that the parallel surrogate strategy assigns
    EXACTLY the rank-in-sort-order ids."""
    from pharmacodi_spark.pipelines.meta import build_meta_table
    from pharmacodi_spark.operators.keys import surrogate_key

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    cust_dim = surrogate_key(
        cust.select(F.col("c_name").alias("name")).distinct(), order_by=["name"]
    )
    nat_dim = surrogate_key(
        nation.where(F.col("n_nationkey") % 4 != 3)
        .select(F.col("n_name").alias("name"))
        .distinct(),
        order_by=["name"],
    )
    fact = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .select(
            "o_orderkey",
            F.col("c_name").alias("cust_id"),
            F.col("n_name").alias("nat_id"),
            F.col("o_orderpriority").alias("mdt"),
            _rnd(F.col("o_totalprice") * 100).cast("long").alias("centi"),
        )
    )
    table, _audit = build_meta_table(
        fact,
        {"cust": cust_dim, "nat": nat_dim},
        required_fks=["cust"],
        id_order=["cust_id", "nat_id", "mdt", "o_orderkey"],
    )
    return table.select(
        F.col("id").cast("long"),
        F.col("cust_id").cast("long"),
        F.col("nat_id").cast("long"),
        "mdt",
        "o_orderkey",
        "centi",
    )


@q(
    "salted_join_equiv",
    """
    SELECT o_orderkey, c_name
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def salted_join_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural-skew tool under the oracle gate: salted_join (random
    shard on the skewed side, ``salts``× replication of the other, equi-join
    on (key, salt)) must produce EXACTLY the plain join's rows — the salt
    is an execution-topology detail invisible in the result, which is what
    the hash compare certifies."""
    from pharmacodi_spark.operators.joins import salted_join

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    return salted_join(orders, cust, on="o_custkey", salts=8).select(
        "o_orderkey", "c_name"
    )
