"""curation_pipeline E2E invariants beyond the oracle hash-match: funnel
containment, eval-slice exclusion, post-dedup uniqueness, determinism."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.mark.slow
def test_curation_funnel_invariants(spark):
    from pharmacodi_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    fn = QUERIES["curation_pipeline"][0]
    out = fn(spark, sf).cache()
    rows = out.collect()
    ids = {r["doc_id"] for r in rows}
    assert rows, "curation must keep something at sf0.001"

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    # containment + eval-slice exclusion
    assert ids <= all_ids
    assert not any(i % 97 == 0 for i in ids)

    # post-exact-dedup: no two survivors share a text body
    texts = (
        docs.where(F.col("doc_id").isin(list(ids)))
        .groupBy("text")
        .count()
        .where("count > 1")
        .count()
    )
    assert texts == 0

    # per-source rate is a single value and within (0, 1]
    for r in rows:
        assert 0.0 < r["rate"] <= 1.0

    # deterministic: a second run returns the identical set
    again = {r["doc_id"] for r in fn(spark, sf).collect()}
    assert again == ids


@pytest.mark.slow
def test_curation_funnel_audit_table(spark):
    """curation_funnel (VERDICT r5 item 5): five stages, rows_kept monotone
    non-increasing, each stage's rows_in = previous stage's rows_kept, and
    the funnel's terminal count equals the pipeline's actual output."""
    from pharmacodi_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    funnel = QUERIES["curation_funnel"][0](spark, sf).collect()
    assert [r["stage"] for r in funnel] == [
        "quality", "decontam", "passage_dedup", "exact_dedup", "mixture"
    ]
    for prev, cur in zip(funnel, funnel[1:]):
        assert cur["rows_in"] == prev["rows_kept"], (prev, cur)
    for r in funnel:
        assert r["rows_kept"] <= r["rows_in"], r

    n_final = QUERIES["curation_pipeline"][0](spark, sf).count()
    assert funnel[-1]["rows_kept"] == n_final
