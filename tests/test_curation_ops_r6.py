"""Round-6 curation operators: per-group reservoir invariants, chunking
coverage/overlap algebra, and source-level filter semantics."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_sample_per_group_deterministic_and_bounded(spark):
    from pharmacodi_spark.operators.sampling import sample_per_group

    df = spark.range(1000).select(
        (F.col("id") % 7).alias("g"), F.col("id").alias("k")
    )
    a = sample_per_group(df, "g", 3, key_cols=["k"], salt="x")
    b = sample_per_group(df, "g", 3, key_cols=["k"], salt="x")
    ra = sorted(map(tuple, a.collect()))
    assert ra == sorted(map(tuple, b.collect()))       # same salt ⇒ same draw
    per_g = a.groupBy("g").count().collect()
    assert all(r["count"] == 3 for r in per_g) and len(per_g) == 7
    c = sample_per_group(df, "g", 3, key_cols=["k"], salt="y")
    assert ra != sorted(map(tuple, c.collect()))       # new salt ⇒ redraw
    # a group smaller than k returns all its rows
    small = spark.createDataFrame([(1, 10), (1, 11)], ["g", "k"])
    assert sample_per_group(small, "g", 5, key_cols=["k"]).count() == 2


def test_chunk_documents_coverage_and_overlap(spark):
    from pharmacodi_spark.text.corpus import chunk_documents

    texts = [
        (1, " ".join(f"t{i}" for i in range(100))),  # 100 toks: multi-chunk
        (2, " ".join(f"u{i}" for i in range(10))),   # < chunk: single
        (3, " ".join(f"v{i}" for i in range(32))),   # == chunk: single
        (4, " ".join(f"w{i}" for i in range(33))),   # one over: two chunks
        (5, ""),                                     # empty: no chunks
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=32, overlap=8)
    rows = {r.doc_id: [] for r in out.collect()}
    for r in out.collect():
        rows[r.doc_id].append(r)
    assert 5 not in rows
    assert len(rows[2]) == 1 and rows[2][0].n_tokens == 10
    assert len(rows[3]) == 1 and rows[3][0].n_tokens == 32
    assert len(rows[4]) == 2
    # doc 1: stride 24, chunks at 1,25,49,73 → last reaches 100
    ch = sorted(rows[1], key=lambda r: r.chunk_id)
    assert [c.start_token for c in ch] == [1, 25, 49, 73]
    assert ch[-1].start_token + ch[-1].n_tokens - 1 == 100
    # every token covered; consecutive chunks overlap by exactly 8 (except
    # possibly the tail, which overlaps by >= 8)
    for a, b in zip(ch, ch[1:]):
        assert a.start_token + a.n_tokens - 1 >= b.start_token + 7
    # chunk text round-trips the token slice
    assert ch[1].chunk_text.split(" ")[0] == "t24"  # token 25 is t24 (0-based)


@pytest.mark.slow
def test_source_level_filter(spark):
    from pharmacodi_spark.text.analysis import (
        source_level_filter, source_quality_rollup,
    )

    good = [
        (i, "ok", " ".join(f"word{i}x{j}" for j in range(30)))
        for i in range(10)
    ]
    # spam source: one dominant bigram → fails the top-fraction gate
    bad = [(100 + i, "spam", "buy now " * 20) for i in range(10)]
    df = spark.createDataFrame(good + bad, "doc_id long, source string, text string")
    roll = source_quality_rollup(df)
    flags = {r.source: r.source_ok for r in roll.collect()}
    assert flags == {"ok": True, "spam": False}
    kept = source_level_filter(df, roll)
    assert {r.source for r in kept.collect()} == {"ok"}
    assert kept.count() == 10
