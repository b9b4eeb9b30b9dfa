"""distribution_psi (operators/profile.py): pure-Python replay, the
zero-drift identity, and one-sided buckets staying finite."""

from __future__ import annotations

import pytest

from pharmacodi_spark.operators.profile import distribution_psi
from pharmacodi_spark.text.selection import ilog2_fp_int


def _py_psi(ref: list[str], cur: list[str]):
    from collections import Counter

    cp, cq = Counter(ref), Counter(cur)
    np, nq = len(ref), len(cur)
    out = {}
    for b in set(cp) | set(cq):
        p, q = cp.get(b, 0), cq.get(b, 0)
        ppm_p, ppm_q = p * 1_000_000 // np, q * 1_000_000 // nq
        lr = (
            ilog2_fp_int(p + 1)
            + ilog2_fp_int(nq)
            - ilog2_fp_int(q + 1)
            - ilog2_fp_int(np)
        )
        out[b] = (p, q, ppm_p, ppm_q, (ppm_p - ppm_q) * lr)
    return out


def test_psi_matches_python(spark):
    ref = ["a"] * 50 + ["b"] * 30 + ["c"] * 20
    cur = ["a"] * 20 + ["b"] * 30 + ["d"] * 10  # c vanished, d appeared
    rdf = spark.createDataFrame([(x,) for x in ref], ["bucket"])
    cdf = spark.createDataFrame([(x,) for x in cur], ["bucket"])
    got = {
        r["bucket"]: (
            r["c_ref"], r["c_cur"], r["ppm_ref"], r["ppm_cur"],
            r["psi_term_fp"],
        )
        for r in distribution_psi(rdf, cdf, "bucket").collect()
    }
    assert got == _py_psi(ref, cur)
    # one-sided buckets present and finite
    assert got["c"][1] == 0 and got["d"][0] == 0


def test_psi_zero_when_identical(spark):
    rows = ["x"] * 10 + ["y"] * 5
    df = spark.createDataFrame([(x,) for x in rows], ["bucket"])
    out = distribution_psi(df, df, "bucket").collect()
    assert all(r["psi_term_fp"] == 0 for r in out)
    # drifted pair must sum strictly positive (PSI >= 0, 0 only if equal)
    df2 = spark.createDataFrame([("x",)] * 14 + [("y",)] * 1, ["bucket"])
    tot = sum(
        r["psi_term_fp"] for r in distribution_psi(df, df2, "bucket").collect()
    )
    assert tot > 0


def _write_json_batches(rows, src_dir, n_files=3):
    import json
    import os
    import time

    os.makedirs(src_dir)
    per = (len(rows) + n_files - 1) // n_files
    chunks = []
    for i in range(n_files):
        chunk = rows[i * per : (i + 1) * per]
        chunks.append(chunk)
        path = os.path.join(src_dir, f"b{i}.json")
        with open(path, "w") as f:
            for doc_id, bucket in chunk:
                f.write(json.dumps({"doc_id": doc_id, "bucket": bucket}) + "\n")
        os.utime(path, (time.time() + i * 10, time.time() + i * 10))
    return chunks


@pytest.mark.slow
def test_psi_series_stream_equals_batch(spark, tmp_path):
    """streaming_bucket_snapshots + psi_series_from_snapshots ≡ a
    distribution_psi run per micro-batch (stream ≡ batch, VERDICT r6
    item 5)."""
    from pharmacodi_spark.operators.profile import (
        psi_series_from_snapshots,
        read_bucket_snapshots,
        streaming_bucket_snapshots,
    )

    ref_rows = ["a"] * 50 + ["b"] * 30 + ["c"] * 20
    ref = spark.createDataFrame([(x,) for x in ref_rows], ["bucket"])
    rows = [(i, "abd"[i % 3]) for i in range(90)]
    src = str(tmp_path / "incoming")
    chunks = _write_json_batches(rows, src)

    stream = (
        spark.readStream.schema("doc_id long, bucket string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = streaming_bucket_snapshots(
        stream, str(tmp_path / "state"), "bucket", str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    snaps = read_bucket_snapshots(spark, str(tmp_path / "state"))
    series = {
        r["batch_id"]: (r["psi_fp"], r["n_cur"])
        for r in psi_series_from_snapshots(snaps, ref, "bucket").collect()
    }
    assert len(series) == 3
    for bid, chunk in enumerate(chunks):
        cur = spark.createDataFrame([(b,) for _, b in chunk], ["bucket"])
        want = distribution_psi(ref, cur, "bucket").agg(
            {"psi_term_fp": "sum"}
        ).collect()[0][0]
        assert series[bid] == (want, len(chunk)), (bid, series[bid], want)


@pytest.mark.slow
def test_psi_snapshots_replay_idempotent(spark, tmp_path):
    """Re-running the drained stream from a FRESH checkpoint re-delivers
    the same files under the same batch ids — the per-batch-id dynamic
    partition overwrite must leave the snapshot state unchanged."""
    from pharmacodi_spark.operators.profile import (
        read_bucket_snapshots,
        streaming_bucket_snapshots,
    )

    rows = [(i, "xyz"[i % 3]) for i in range(60)]
    src = str(tmp_path / "incoming")
    _write_json_batches(rows, src)

    def drain(ckpt):
        stream = (
            spark.readStream.schema("doc_id long, bucket string")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        q = streaming_bucket_snapshots(
            stream, str(tmp_path / "state"), "bucket", str(tmp_path / ckpt)
        )
        q.awaitTermination()

    drain("ckpt1")
    before = sorted(
        (r["batch_id"], r["bucket"], r["c_cur"])
        for r in read_bucket_snapshots(spark, str(tmp_path / "state")).collect()
    )
    drain("ckpt2")  # full replay under the same batch ids
    after = sorted(
        (r["batch_id"], r["bucket"], r["c_cur"])
        for r in read_bucket_snapshots(spark, str(tmp_path / "state")).collect()
    )
    assert before == after and len({b for b, _, _ in before}) == 3
