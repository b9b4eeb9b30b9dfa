"""shard_manifest (text/packing.py): reader-side recompute equality and
corruption detection via the order-insensitive XOR checksums."""

from __future__ import annotations

from pyspark.sql import functions as F

from pharmacodi_spark.text.packing import shard_manifest, shuffle_shards


def _layout(spark):
    rows = [(i, 100 + (i * 37) % 200) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    return shuffle_shards(df, shard_bytes=1000)


def test_manifest_totals_and_recompute(spark):
    shards = _layout(spark)
    man = {r["shard_id"]: r for r in shard_manifest(shards).collect()}
    rows = shards.collect()
    assert sum(m["n_docs"] for m in man.values()) == len(rows)
    # reader-side recompute from the "read" rows matches the manifest
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r)
    for sid, rs in by_shard.items():
        m = man[sid]
        assert m["n_docs"] == len(rs)
        assert m["n_bytes"] == sum(r["n_bytes"] for r in rs)
        assert m["first_byte"] == min(r["byte_start"] for r in rs)
        x = 0
        for r in rs:
            x ^= r["doc_id"]
        assert m["id_xor"] == x


def test_manifest_detects_lost_row(spark):
    shards = shard_manifest(_layout(spark)).collect()
    # simulate a truncated shard: drop one document before recompute
    broken = shard_manifest(
        _layout(spark).where(F.col("doc_id") != 17)
    ).collect()
    a = {r["shard_id"]: (r["n_docs"], r["id_xor"]) for r in shards}
    b = {r["shard_id"]: (r["n_docs"], r["id_xor"]) for r in broken}
    diffs = [s for s in a if a[s] != b.get(s)]
    assert len(diffs) == 1  # exactly the shard that lost doc 17
