"""curation_pipeline E2E invariants beyond the oracle hash-match: funnel
containment, eval-slice exclusion, post-dedup uniqueness, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F


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
