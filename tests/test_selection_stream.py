"""Streaming DSIR twin: pointwise scoring against the frozen λ sidecar
must equal the batch twin for ANY arrival order, and micro-batch replay
must leave the scores table unchanged."""

from __future__ import annotations

import pytest

# multi-second E2E / streaming-equivalence module: default-deselected (pytest.ini),
# included in CI mode with -m ""
pytestmark = pytest.mark.slow

import json
import os
import time

SF = "/root/testdata/sf0.001"
SCHEMA = "doc_id long, text string"
DIM, SALT = 256, "ss"


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


def _setup(spark, tmp_path):
    from pyspark.sql import functions as F

    from pharmacodi_spark.pipelines.selection_stream import (
        prepare_selection_state,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base = str(tmp_path / "state")
    prepare_selection_state(
        spark, base, docs, F.col("lang") == "en", dim=DIM, salt=SALT
    )
    rows = [r.asDict() for r in docs.select("doc_id", "text").collect()]
    return docs, base, rows


def test_stream_scores_equal_batch_any_order(spark, tmp_path):
    from pharmacodi_spark.pipelines.selection_stream import (
        batch_dsir_scores, streaming_dsir_scores,
    )

    docs, base, rows = _setup(spark, tmp_path)
    src = str(tmp_path / "incoming")
    # DESCENDING arrival — scoring is pointwise, so unlike the curation
    # stream the equivalence must hold for any order
    _write_files(rows, src, reverse=True)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    )
    q = streaming_dsir_scores(stream, base, str(tmp_path / "ckpt"), dim=DIM, salt=SALT)
    q.awaitTermination()

    got = {
        (r.doc_id, r.n_tokens, r.dsir_fp)
        for r in spark.read.parquet(f"{base}/scores").collect()
    }
    want = {
        (r.doc_id, r.n_tokens, r.dsir_fp)
        for r in batch_dsir_scores(spark, base, docs, dim=DIM, salt=SALT).collect()
    }
    assert got == want and len(got) == len(rows)


def test_stream_replay_idempotent(spark, tmp_path):
    from pharmacodi_spark.pipelines.selection_stream import (
        streaming_dsir_scores,
    )

    docs, base, rows = _setup(spark, tmp_path)
    src = str(tmp_path / "incoming")
    _write_files(rows, src)
    for ckpt in ("ckpt1", "ckpt2"):  # fresh checkpoint = full replay
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        q = streaming_dsir_scores(
            stream, base, str(tmp_path / ckpt), dim=DIM, salt=SALT
        )
        q.awaitTermination()
        rows_now = sorted(
            (r.doc_id, r.dsir_fp)
            for r in spark.read.parquet(f"{base}/scores").collect()
        )
        if ckpt == "ckpt1":
            first = rows_now
    assert rows_now == first
