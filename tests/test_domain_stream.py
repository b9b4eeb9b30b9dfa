"""pipelines/domain_stream.py: the streaming whole-domain quality gate —
stream ≡ batch against text/urls.py::domain_quality_gate, cross-batch
accumulation (a spam host crossing min_docs only after several batches),
replay idempotence, and the as-of point-in-time view."""

from __future__ import annotations

import json
import os
import time

import pytest

from pharmacodi_spark.pipelines.domain_stream import (
    domain_gate_from_stats,
    host_stats_batch,
    read_host_stats,
    streaming_host_quality,
)
from pharmacodi_spark.text.urls import domain_quality_gate

# (doc_id, url, failed): spam.com fails 5/6 spread over batches; good.org
# fails 1/6; tiny.net fails 2/2 but stays under min_docs
ROWS = (
    [(i, "http://spam.com/p", i < 5) for i in range(6)]
    + [(i, "http://good.org/p", i == 6) for i in range(6, 12)]
    + [(12, "http://tiny.net/p", True), (13, "http://tiny.net/p", True)]
)
KW = dict(min_docs=5, max_fail_ppm=400_000)


def _write_json_batches(rows, src_dir, n_files=3):
    os.makedirs(src_dir)
    per = (len(rows) + n_files - 1) // n_files
    chunks = []
    for i in range(n_files):
        chunk = rows[i * per : (i + 1) * per]
        chunks.append(chunk)
        path = os.path.join(src_dir, f"b{i}.json")
        with open(path, "w") as f:
            for doc_id, url, failed in chunk:
                f.write(
                    json.dumps(
                        {"doc_id": doc_id, "url": url, "failed": failed}
                    )
                    + "\n"
                )
        os.utime(path, (time.time() + i * 10, time.time() + i * 10))
    return chunks


def _docs(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "url", "failed"])


@pytest.mark.slow
def test_domain_stream_equals_batch(spark, tmp_path):
    """After draining the stream, the question-time gate over accumulated
    host stats equals the one-shot batch operator on the full corpus —
    including a host (spam.com) that crosses min_docs only across
    batches."""
    src = str(tmp_path / "incoming")
    _write_json_batches(ROWS, src)
    stream = (
        spark.readStream.schema("doc_id long, url string, failed boolean")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = streaming_host_quality(
        stream, str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    docs = _docs(spark)
    got = sorted(
        map(
            tuple,
            domain_gate_from_stats(
                spark, str(tmp_path / "state"), docs, **KW
            ).collect(),
        )
    )
    want = sorted(map(tuple, domain_quality_gate(docs, "failed", **KW).collect()))
    assert got == want and got
    # the cross-batch case actually triggered: spam.com is blocked
    blocked = {r[1] for r in got if not r[3]}
    assert blocked == {"spam.com"}


def test_domain_stream_replay_idempotent(spark, tmp_path):
    """A replayed micro-batch (same batch_id) rewrites its own partition
    with identical content — cumulative stats unchanged."""
    base = str(tmp_path / "state")
    b1 = spark.createDataFrame(ROWS[:7], ["doc_id", "url", "failed"])
    b2 = spark.createDataFrame(ROWS[7:], ["doc_id", "url", "failed"])
    host_stats_batch(b1, base, 0)
    host_stats_batch(b2, base, 1)
    before = sorted(map(tuple, read_host_stats(spark, base).collect()))
    host_stats_batch(b2, base, 1)  # replay
    after = sorted(map(tuple, read_host_stats(spark, base).collect()))
    assert before == after


def test_domain_stream_as_of_view(spark, tmp_path):
    """as_of_batch gives the point-in-time gate: spam.com is NOT yet
    blocked after batch 0 (only 4 pages seen), blocked after batch 1."""
    base = str(tmp_path / "state")
    b1 = spark.createDataFrame(ROWS[:4], ["doc_id", "url", "failed"])  # spam x4
    b2 = spark.createDataFrame(ROWS[4:], ["doc_id", "url", "failed"])
    host_stats_batch(b1, base, 0)
    host_stats_batch(b2, base, 1)
    docs = _docs(spark)
    at0 = {
        r["host"]: r["keep"]
        for r in domain_gate_from_stats(
            spark, base, docs, as_of_batch=0, **KW
        ).collect()
    }
    at1 = {
        r["host"]: r["keep"]
        for r in domain_gate_from_stats(
            spark, base, docs, as_of_batch=1, **KW
        ).collect()
    }
    assert at0["spam.com"] is True     # only 4 pages seen: under min_docs
    assert at1["spam.com"] is False    # crossed the threshold in batch 1
    assert at1["good.org"] is True and at1["tiny.net"] is True
