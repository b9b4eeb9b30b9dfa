"""Enrichment-phase tests (SURVEY §3 E3): synonym tables, target tables with
injected UniProt fetcher, clinical trials with injected API fetcher,
Cellosaurus parse+join — fixtures mirror the reference's input shapes."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pharmacodi_spark.pipelines.enrichment import (
    build_cellosaurus_table,
    build_clinical_trial_tables,
    build_compound_target_table,
    build_gene_target_table,
    build_synonym_table,
    build_target_table,
)


@pytest.fixture(scope="module")
def dims(spark):
    cell = spark.createDataFrame(
        [(1, "22RV1"), (2, "A549"), (3, "MCF7")], ["id", "name"]
    )
    dataset = spark.createDataFrame(
        [(1, "CCLE"), (2, "GDSC_v1"), (3, "GDSC_v2"), (4, "CTRPv2")], ["id", "name"]
    )
    gene = spark.createDataFrame([(1, "EGFR"), (2, "KRAS")], ["id", "name"])
    return {"cell": cell, "dataset": dataset, "gene": gene}


def test_build_synonym_table(spark, dims):
    meta = spark.createDataFrame(
        [
            ("22RV1", "22Rv1", "22RV1-a", None, "ignored"),
            ("A549", "A549", None, "A549_GDSC", "x"),
            ("NOTINDIM", "n1", "n2", "n3", "y"),
        ],
        ["unique.cellid", "CCLE.cellid", "GDSC_v2.cellid", "GDSC1000.cellid", "other"],
    )
    out = build_synonym_table(
        meta, dims["cell"], dims["dataset"], id_suffix="cellid", fk_name="cell_id"
    )
    rows = {(r.cell_id, r.dataset_id, r.synonym) for r in out.collect()}
    # NOTINDIM dropped (inner join); GDSC1000 -> GDSC_v1, GDSC_v2 kept
    assert rows == {
        (1, 1, "22Rv1"),
        (1, 3, "22RV1-a"),
        (2, 1, "A549"),
        (2, 2, "A549_GDSC"),
    }
    ids = sorted(r.id for r in out.collect())
    assert ids == [1, 2, 3, 4]  # dense, deterministic


@pytest.fixture(scope="module")
def target_inputs(spark):
    chembl = spark.createDataFrame(
        [("EGFR inhibitor target", "P00533", 11), ("KRAS target", "P01116", 12)],
        ["name", "uniprot_id", "compound_id"],
    )
    drugbank = spark.createDataFrame(
        [("EGFR inhibitor target", "P00533", "gefitinib"), ("Novel target", "P99999", "drugX")],
        ["name", "uniprot_id", "compound_name"],
    )
    synonym = spark.createDataFrame(
        [(21, "gefitinib"), (22, "drugX"), (23, "unused")],
        ["compound_id", "compound_name"],
    )
    return chembl, drugbank, synonym


def test_target_and_compound_target(spark, target_inputs):
    chembl, drugbank, synonym = target_inputs
    target = build_target_table(chembl, drugbank)
    t = {r.name: r.id for r in target.collect()}
    assert sorted(t.values()) == [1, 2, 3]  # union+dedup of 3 names

    ct = build_compound_target_table(chembl, drugbank, target, synonym)
    got = {(r.target_id, r.compound_id) for r in ct.collect()}
    assert got == {
        (t["EGFR inhibitor target"], 11),
        (t["KRAS target"], 12),
        (t["EGFR inhibitor target"], 21),
        (t["Novel target"], 22),
    }


def test_gene_target_with_injected_fetcher(spark, dims, target_inputs):
    chembl, drugbank, _ = target_inputs
    target = build_target_table(chembl, drugbank)

    def fake_uniprot(batch):
        mapping = {"P00533": "EGFR", "P01116": "KRAS"}  # P99999 unknown
        rows = [
            {"uniprot_id": u, "gene_name": mapping[u]} for u in batch if u in mapping
        ]
        return pd.DataFrame(rows, columns=["uniprot_id", "gene_name"])

    gt = build_gene_target_table(
        chembl, drugbank, target, dims["gene"], fake_uniprot, batch_size=1
    )
    t = {r.name: r.id for r in target.collect()}
    got = {(r.gene_id, r.target_id) for r in gt.collect()}
    assert got == {(1, t["EGFR inhibitor target"]), (2, t["KRAS target"])}


def test_clinical_trials_with_injected_fetcher(spark):
    synonym = spark.createDataFrame(
        [(21, "gefitinib"), (22, "drugX"), (23, "nohits")],
        ["compound_id", "compound_name"],
    )

    def fake_trials(batch):
        data = {
            "gefitinib": [("NCT001", "http://a", "Completed"), ("NCT002", "http://b", "Active")],
            "drugX": [("NCT002", "http://b", "Active")],
        }
        rows = [
            {"compound_name": n, "nct": nct, "link": link, "status": st}
            for n in batch
            for nct, link, st in data.get(n, [])
        ]
        return pd.DataFrame(
            rows, columns=["compound_name", "nct", "link", "status"]
        )

    trials, compound_trial = build_clinical_trial_tables(synonym, fake_trials, batch_size=2)
    t = {r.nct: r.clinical_trial_id for r in trials.collect()}
    assert t == {"NCT001": 1, "NCT002": 2}  # ranked by nct, dense
    got = {(r.clinical_trial_id, r.compound_id) for r in compound_trial.collect()}
    assert got == {(1, 21), (2, 21), (2, 22)}


def test_cellosaurus_parse_and_join(spark, dims, tmp_path):
    path = tmp_path / "cello.txt"
    lines = ["header"] * 3 + [
        "ID   22RV1",
        "AC   CVCL_1045",
        "SY   22-Rv1",
        "SY   22Rv-1",
        "OX   NCBI_TaxID=9606; ! Homo sapiens",
        "AG   52Y",
        "//",
        "ID   UNKNOWNCELL",
        "AC   CVCL_9999",
        "//",
    ]
    path.write_text("\n".join(lines) + "\n")
    out = build_cellosaurus_table(spark, str(path), dims["cell"], header_lines=3)
    rows = out.collect()
    assert len(rows) == 1  # UNKNOWNCELL dropped by the inner join (J9)
    r = rows[0]
    assert r.identifier == "22RV1" and r.cell_id == 1
    assert r.accession == "CVCL_1045"
    assert r.sy == "22-Rv1|||22Rv-1"  # group-concat in line order
    assert "ag" not in out.columns  # AG/DT dropped


def test_map_genes_to_genomic_coordinates(spark, dims):
    from pharmacodi_spark.pipelines.enrichment import map_genes_to_genomic_coordinates

    gene = spark.createDataFrame(
        [(1, "ENSG00000000003"), (2, "ENSG00000000005")], ["id", "name"]
    )
    annot = spark.createDataFrame([(1, "x"), (2, "y")], ["gene_id", "extra"])
    gencode = spark.createDataFrame(
        [("ENSG00000000003.14", "TSPAN6", 100627109, 100639991, "-", "chrX")],
        ["gene_id", "gene_name", "start", "end", "strand", "seqnames"],
    )
    out = map_genes_to_genomic_coordinates(gene, annot, gencode)
    rows = {r.gene_id: r for r in out.collect()}
    assert rows[1].symbol == "TSPAN6" and rows[1].chr == "chrX"
    assert rows[1].gene_seq_start == 100627109
    assert rows[2].symbol is None  # unmapped gene keeps its row (left join)
    assert out.count() == 2
