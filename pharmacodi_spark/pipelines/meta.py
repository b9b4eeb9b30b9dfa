"""Meta-analysis statistics tables (SURVEY §3 E3: build_meta_tables.py and
build_gene_compound_tissue_dataset_tables.py) — the 10⁷–10⁸-row
gene_compound_* facts.

The reference ships three near-identical builders (its own FIXME at
build_meta_tables.py:119-121 asks for the refactor); here one parameterized
``build_meta_table`` covers gene_compound_tissue / gene_compound_dataset /
gene_compound_tissue_dataset, differing only in the declared contract and
FK set.

Scale: these are the LARGEST tables in the system — every remap is a
broadcast join against a dim (fact never shuffles for remapping), the
all-mapped checks are aggregate probes (no collect of fact rows), and the
dense primary key uses the fact-scalable surrogate path (no global window).
AQE skew-join handling covers the hot genes (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pharmacodi_spark.functions.scalar import strip_version_suffix
from pharmacodi_spark.operators.keys import surrogate_key
from pharmacodi_spark.schema import harmonize

GCTD_STAT_COLUMNS: dict[str, str] = {
    "estimate": "double",
    "lower_analytic": "double",
    "upper_analytic": "double",
    "lower_permutation": "double",
    "upper_permutation": "double",
    "n": "int",
    "pvalue_analytic": "double",
    "pvalue_permutation": "double",
    "df": "int",
    "fdr_analytic": "double",
    "fdr_permutation": "double",
    "significant_permutation": "int",
}


def build_gene_compound_tissue_dataset_df(
    gene_sig: DataFrame, pset_name: str
) -> DataFrame:
    """Per-PSet gene-signature fact (reference
    build_gene_compound_tissue_dataset_tables.py:46-95): filter to the PSet,
    project the declared stat columns (missing ones arrive as typed nulls —
    harmonize), stamp ``sens_stat='AAC'``, derive ``permutation_done`` from
    fdr_permutation presence (P13), rename natural-key columns to ``*_id``
    and strip Ensembl gene versions (F1)."""
    contract = {
        "gene": "string",
        "compound": "string",
        "tissue": "string",
        "dataset": "string",
        **GCTD_STAT_COLUMNS,
        "mDataType": "string",
    }
    h = harmonize(gene_sig.where(F.col("dataset") == pset_name), contract)
    return h.select(
        strip_version_suffix(F.col("gene")).alias("gene_id"),
        F.col("compound").alias("compound_id"),
        F.col("dataset").alias("dataset_id"),
        F.col("tissue").alias("tissue_id"),
        *GCTD_STAT_COLUMNS,
        F.when(F.col("fdr_permutation").isNotNull(), 1).otherwise(0).alias(
            "permutation_done"
        ),
        F.lit("AAC").alias("sens_stat"),
        "mDataType",
    )


def build_meta_table(
    fact: DataFrame,
    dims: dict[str, DataFrame],
    required_fks: list[str] | None = None,
    id_order: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Combine-phase meta builder (reference build_meta_tables.py:30-116,
    one function instead of three copies): remap each ``{fk}_id`` natural
    key to the dim's surrogate id (J5 update-join ≡ broadcast join +
    replace), enforce the reference's inline invariants, then sort and
    assign the dense primary key (W2: ids are rank-in-sort-order).

    ``dims`` maps fk name (``"gene"``) → dim DataFrame with (id, name).
    ``required_fks``: unmapped keys RAISE (the reference's failed-genes
    check at :81-84); others warn-and-drop (:86-89 semantics) — the dropped
    keys are returned in the audit DataFrame instead of a warning log.

    Returns (table, audit): audit has one row per (fk, distinct unmapped
    natural key) — the §5 invariant surfaced as data, not a log line.
    """
    required_fks = required_fks or []
    id_order = id_order or [f"{fk}_id" for fk in dims] + ["mDataType"]
    audits: list[DataFrame] = []
    out = fact
    for fk, dim in dims.items():
        col = f"{fk}_id"
        lookup = F.broadcast(
            dim.select(F.col("name").alias(col), F.col("id").alias(f"__{col}_new"))
        )
        out = out.join(lookup, col, "left")
        missing = (
            out.where(F.col(f"__{col}_new").isNull())
            .select(F.lit(fk).alias("fk"), F.col(col).alias("unmapped_key"))
            .distinct()
        )
        audits.append(missing)
        if fk in required_fks:
            bad = [r.unmapped_key for r in missing.limit(5).collect()]
            if bad:
                raise ValueError(f"{fk} keys failed to map: {bad} ...")
        out = (
            out.where(F.col(f"__{col}_new").isNotNull())
            .withColumn(col, F.col(f"__{col}_new"))
            .drop(f"__{col}_new")
        )
    audit = audits[0]
    for a in audits[1:]:
        audit = audit.unionByName(a)
    table = surrogate_key(out, order_by=id_order, dense_global=True)
    return table, audit
