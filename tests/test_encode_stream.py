"""Streaming embedding backfill: the stream twin must produce an
embeddings store row-identical to one batch encode for ANY arrival order,
and micro-batch replay must leave it unchanged."""

from __future__ import annotations

import pytest

# multi-second E2E / streaming-equivalence module: default-deselected
# (pytest.ini), included in CI mode with -m ""
pytestmark = pytest.mark.slow

import json
import os
import time

SF = "/root/testdata/sf0.001"
SCHEMA = "doc_id long, text string"
DIM = 16


def _write_files(rows, src_dir, n_files=3, reverse=False):
    os.makedirs(src_dir)
    rows = sorted(rows, key=lambda r: r["doc_id"], reverse=reverse)
    per = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = rows[i * per : (i + 1) * per]
        path = os.path.join(src_dir, f"b{i}.json")
        with open(path, "w") as f:
            for r in chunk:
                f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")
        os.utime(path, (time.time() + i * 10, time.time() + i * 10))


def _collect_store(spark, base):
    return {
        r.doc_id: tuple(r.embedding)
        for r in spark.read.parquet(f"{base}/embeddings").collect()
    }


def test_stream_encode_equals_batch_any_order(spark, tmp_path):
    from pharmacodi_spark.pipelines.encode_stream import streaming_encode
    from pharmacodi_spark.text.embeddings import encode_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = [r.asDict() for r in docs.select("doc_id", "text").collect()]
    src = str(tmp_path / "incoming")
    # DESCENDING arrival — encoding is pointwise, so the store must be
    # identical for any order
    _write_files(rows, src, reverse=True)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    )
    base = str(tmp_path / "store")
    q = streaming_encode(stream, base, str(tmp_path / "ckpt"), dim=DIM)
    q.awaitTermination()

    got = _collect_store(spark, base)
    want = {
        r.doc_id: tuple(r.embedding)
        for r in encode_documents(docs, dim=DIM).collect()
    }
    assert got == want and len(got) == len(rows)


def test_stream_encode_replay_idempotent(spark, tmp_path):
    from pharmacodi_spark.pipelines.encode_stream import streaming_encode

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = [r.asDict() for r in docs.select("doc_id", "text").collect()]
    src = str(tmp_path / "incoming")
    _write_files(rows, src)
    base = str(tmp_path / "store")

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    )
    q = streaming_encode(stream, base, str(tmp_path / "ckpt1"), dim=DIM)
    q.awaitTermination()
    first = _collect_store(spark, base)

    # replay the whole source against the SAME store with a fresh
    # checkpoint: every batch re-runs; the deterministic encoder makes
    # the upsert rewrite identical rows
    stream2 = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    )
    q2 = streaming_encode(stream2, base, str(tmp_path / "ckpt2"), dim=DIM)
    q2.awaitTermination()
    assert _collect_store(spark, base) == first


def test_stream_encode_feeds_similarity_store(spark, tmp_path):
    """The store is byte-compatible with the similarity family's input:
    cosine top-k over the streamed embeddings finds the planted dup."""
    from pyspark.sql import functions as F

    from pharmacodi_spark.pipelines.encode_stream import streaming_encode
    from pharmacodi_spark.text.similarity import cosine_topk

    rows = [
        {"doc_id": 0, "text": "alpha beta gamma delta"},
        {"doc_id": 1, "text": "alpha beta gamma delta"},
        {"doc_id": 2, "text": "completely different tokens here"},
    ]
    src = str(tmp_path / "incoming")
    _write_files(rows, src, n_files=3)
    base = str(tmp_path / "store")
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    )
    q = streaming_encode(stream, base, str(tmp_path / "ckpt"), dim=DIM)
    q.awaitTermination()

    store = spark.read.parquet(f"{base}/embeddings").select(
        F.col("doc_id").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    probe = [list(r.embedding) for r in store.where("vec_id = 0").collect()]
    top = cosine_topk(
        store.where("vec_id <> 0"), probe[0], k=1,
        vec_col="embedding", id_col="vec_id",
    )
    best = top.collect()[0]
    assert best.vec_id == 1 and best.cosine == pytest.approx(1.0)
