"""soft_dedup_weights (text/dedup.py): inverse-cluster-size weights and
the constant-gradient-mass invariant."""

from __future__ import annotations

from pharmacodi_spark.text.dedup import soft_dedup_weights


def test_weights_inverse_cluster_size(spark):
    rows = [
        (0, "same text"),
        (1, "same text"),
        (2, "same text"),
        (3, "unique a"),
        (4, "unique b"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in soft_dedup_weights(df).collect()}
    assert len(got) == 5  # nothing dropped
    for i in (0, 1, 2):
        assert got[i]["cluster_size"] == 3
        assert got[i]["weight_ppm"] == 1_000_000 // 3
    for i in (3, 4):
        assert got[i]["cluster_size"] == 1
        assert got[i]["weight_ppm"] == 1_000_000
    # constant total mass per unique content (up to the integer floor)
    mass = sum(got[i]["weight_ppm"] for i in (0, 1, 2))
    assert 1_000_000 - 3 <= mass <= 1_000_000
