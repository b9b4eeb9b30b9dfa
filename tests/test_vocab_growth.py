"""Heaps-law vocabulary growth curve: bucket algebra and cumulative
invariants on a crafted corpus."""

from __future__ import annotations


def test_vocab_growth_invariants(spark):
    from pharmacodi_spark.text.corpus import vocab_growth

    # 10 docs, 5 buckets of 2; vocabulary repeats so growth bends
    docs = []
    for i in range(10):
        shared = "alpha beta gamma"
        fresh = f"new{i}a new{i}b"
        docs.append((i, f"{shared} {fresh}"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = vocab_growth(df, buckets=5).collect()
    assert [r.bucket for r in out] == [0, 1, 2, 3, 4]
    assert [r.n_docs_cum for r in out] == [2, 4, 6, 8, 10]
    assert [r.n_tokens_cum for r in out] == [10, 20, 30, 40, 50]
    # vocab: bucket 0 sees 3 shared + 4 fresh = 7; each later bucket adds
    # exactly its 4 fresh tokens
    assert [r.vocab_cum for r in out] == [7, 11, 15, 19, 23]
    # monotone non-decreasing and bounded by token count
    for a, b in zip(out, out[1:]):
        assert b.vocab_cum >= a.vocab_cum
        assert b.vocab_cum <= b.n_tokens_cum


def test_vocab_growth_single_bucket_totals(spark):
    from pyspark.sql import functions as F

    from pharmacodi_spark.text.corpus import vocab_growth

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = vocab_growth(df, buckets=1).collect()
    assert len(out) == 1
    toks = df.select(
        F.explode(F.split("text", " ")).alias("t")
    ).where("t <> ''")
    assert out[0].n_tokens_cum == toks.count()
    assert out[0].vocab_cum == toks.distinct().count()
    assert out[0].n_docs_cum == df.count()
