"""Meta-table pipeline tests (SURVEY §3 E3 / §5 invariants): per-PSet
gene-signature fact build + the parameterized combine-phase remap with
required-FK raise, warn-drop audit, and rank-in-sort-order ids."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pharmacodi_spark.pipelines.meta import (
    build_gene_compound_tissue_dataset_df,
    build_meta_table,
)


@pytest.fixture(scope="module")
def gene_sig(spark):
    return spark.createDataFrame(
        [
            ("ENSG00000000003.14", "dA", "lung", "PSET_A", 0.5, 0.1, None, 10, "rna"),
            ("ENSG00000000005.5", "dB", "breast", "PSET_A", -0.2, None, 0.01, 20, "rna"),
            ("ENSG00000000003.14", "dA", "lung", "PSET_B", 0.9, 0.2, 0.3, 5, "cnv"),
        ],
        ["gene", "compound", "tissue", "dataset", "estimate", "fdr_analytic",
         "fdr_permutation", "n", "mDataType"],
    )


def test_per_pset_gctd(gene_sig):
    out = build_gene_compound_tissue_dataset_df(gene_sig, "PSET_A")
    rows = {r.gene_id: r for r in out.collect()}
    assert set(rows) == {"ENSG00000000003", "ENSG00000000005"}  # versions stripped
    a = rows["ENSG00000000003"]
    assert a.permutation_done == 0 and a.sens_stat == "AAC"  # no fdr_permutation
    assert rows["ENSG00000000005"].permutation_done == 1
    # harmonize padded the undeclared stat columns with typed nulls
    assert a.pvalue_analytic is None and a.df is None
    assert dict(out.dtypes)["n"] == "int"


@pytest.fixture(scope="module")
def dims(spark):
    return {
        "gene": spark.createDataFrame(
            [(1, "ENSG00000000003"), (2, "ENSG00000000005")], ["id", "name"]
        ),
        "compound": spark.createDataFrame([(11, "dA"), (12, "dB")], ["id", "name"]),
        "tissue": spark.createDataFrame([(21, "lung")], ["id", "name"]),
    }


@pytest.mark.slow
def test_meta_table_remap_audit_and_ids(spark, gene_sig, dims):
    fact = build_gene_compound_tissue_dataset_df(gene_sig, "PSET_A").drop("dataset_id")
    table, audit = build_meta_table(
        fact, dims, required_fks=["gene"],
        id_order=["gene_id", "compound_id", "tissue_id", "mDataType"],
    )
    rows = table.orderBy("id").collect()
    # breast is not in the tissue dim -> warn-drop with audit, one row left
    assert len(rows) == 1
    assert rows[0].gene_id == 1 and rows[0].compound_id == 11 and rows[0].tissue_id == 21
    assert rows[0].id == 1  # dense rank-in-sort-order
    assert {(r.fk, r.unmapped_key) for r in audit.collect()} == {("tissue", "breast")}


def test_meta_table_required_fk_raises(spark, gene_sig, dims):
    fact = build_gene_compound_tissue_dataset_df(gene_sig, "PSET_A").drop("dataset_id")
    bad_dims = dict(dims)
    bad_dims["gene"] = spark.createDataFrame([(1, "ENSG00000000003")], ["id", "name"])
    with pytest.raises(ValueError, match="gene keys failed to map"):
        build_meta_table(fact, bad_dims, required_fks=["gene"])


@pytest.mark.slow
def test_meta_table_row_count_invariant(spark, gene_sig, dims):
    """With fully-covering dims no rows are lost (reference
    build_meta_tables.py:109-111 sanity check)."""
    full_dims = dict(dims)
    full_dims["tissue"] = spark.createDataFrame(
        [(21, "lung"), (22, "breast")], ["id", "name"]
    )
    fact = build_gene_compound_tissue_dataset_df(gene_sig, "PSET_A").drop("dataset_id")
    table, audit = build_meta_table(fact, full_dims, required_fks=["gene"])
    assert table.count() == fact.count()
    assert audit.count() == 0
    ids = sorted(r.id for r in table.collect())
    assert ids == list(range(1, fact.count() + 1))
