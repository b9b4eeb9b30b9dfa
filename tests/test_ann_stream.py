"""Streaming IVF index maintenance (pipelines/ann_stream.py): the
maintained index must equal the batch twin for ANY arrival order, replay
must be idempotent, and a probe over the maintained index must match
brute-force over the union corpus."""

from __future__ import annotations

import json
import os
import time

import pytest

# multi-second E2E / streaming-equivalence module: default-deselected (pytest.ini),
# included in CI mode with -m ""
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"
SCHEMA = "vec_id long, embedding array<float>"
N_CENT = 8


def _split_corpus(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    snapshot = emb.where("vec_id % 3 != 0")
    arriving = emb.where("vec_id % 3 = 0")
    return emb, snapshot, arriving


def _write_files(rows, src_dir, n_files=3, reverse=False):
    os.makedirs(src_dir)
    rows = sorted(rows, key=lambda r: r["vec_id"], reverse=reverse)
    per = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = rows[i * per : (i + 1) * per]
        path = os.path.join(src_dir, f"b{i}.json")
        with open(path, "w") as f:
            for r in chunk:
                f.write(
                    json.dumps(
                        {
                            "vec_id": r["vec_id"],
                            "embedding": [float(x) for x in r["embedding"]],
                        }
                    )
                    + "\n"
                )
        os.utime(path, (time.time() + i * 10, time.time() + i * 10))


def _drain(spark, base, src, ckpt):
    from pharmacodi_spark.pipelines.ann_stream import streaming_ivf_upserts

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    )
    q = streaming_ivf_upserts(stream, base, ckpt)
    q.awaitTermination()


def _index_rows(spark, base):
    from pharmacodi_spark.pipelines.ann_stream import read_index

    return {
        (r["vec_id"], r["centroid_id"]) for r in read_index(spark, base).collect()
    }


def test_stream_index_equals_batch_any_order(spark, tmp_path):
    from pharmacodi_spark.pipelines.ann_stream import (
        batch_ivf_index,
        prepare_ann_index,
    )

    emb, snapshot, arriving = _split_corpus(spark)
    base = str(tmp_path / "ann")
    prepare_ann_index(spark, base, snapshot, n_centroids=N_CENT)

    rows = [r.asDict() for r in arriving.collect()]
    src = str(tmp_path / "incoming")
    _write_files(rows, src, reverse=True)  # descending arrival
    _drain(spark, base, src, str(tmp_path / "ckpt"))

    got = _index_rows(spark, base)
    want = {
        (r["vec_id"], r["centroid_id"])
        for r in batch_ivf_index(spark, base, emb).collect()
    }
    assert got == want
    assert len(got) == emb.count()


def test_stream_replay_is_idempotent(spark, tmp_path):
    from pharmacodi_spark.pipelines.ann_stream import prepare_ann_index

    _, snapshot, arriving = _split_corpus(spark)
    base = str(tmp_path / "ann")
    prepare_ann_index(spark, base, snapshot, n_centroids=N_CENT)

    rows = [r.asDict() for r in arriving.collect()]
    src = str(tmp_path / "incoming")
    _write_files(rows, src)
    _drain(spark, base, src, str(tmp_path / "ckpt1"))
    first = _index_rows(spark, base)
    # fresh checkpoint -> the same files re-deliver from scratch
    _drain(spark, base, src, str(tmp_path / "ckpt2"))
    assert _index_rows(spark, base) == first


def test_probe_over_maintained_index_matches_bruteforce(spark, tmp_path):
    from pyspark.sql import functions as F

    from pharmacodi_spark.pipelines.ann_stream import (
        load_centroids,
        prepare_ann_index,
        read_index,
    )
    from pharmacodi_spark.text.similarity import ivf_assign

    emb, snapshot, arriving = _split_corpus(spark)
    base = str(tmp_path / "ann")
    prepare_ann_index(spark, base, snapshot, n_centroids=N_CENT)
    rows = [r.asDict() for r in arriving.collect()]
    src = str(tmp_path / "incoming")
    _write_files(rows, src)
    _drain(spark, base, src, str(tmp_path / "ckpt"))

    cents = load_centroids(spark, base)
    query = emb.orderBy("vec_id").limit(1).collect()[0]
    qvec = [float(x) for x in query["embedding"]]
    qcell = (
        ivf_assign(
            spark.createDataFrame([(0, qvec)], "i long, embedding array<double>"),
            cents,
        ).collect()[0]["centroid_id"]
    )

    def dist_expr(df):
        return df.withColumn(
            "d2",
            F.aggregate(
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    F.lit(qvec).cast("array<double>"),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda a, d: a + d,
            ),
        )

    probed = (
        dist_expr(read_index(spark, base).where(F.col("centroid_id") == qcell))
        .orderBy("d2", "vec_id")
        .limit(5)
        .collect()
    )
    brute = (
        dist_expr(ivf_assign(emb, cents).where(F.col("centroid_id") == qcell))
        .orderBy("d2", "vec_id")
        .limit(5)
        .collect()
    )
    assert [r["vec_id"] for r in probed] == [r["vec_id"] for r in brute]


def test_probe_scan_prunes_to_cell_partitions(spark, tmp_path):
    """The IVF scale story: filtering on centroid_id must reach the scan as
    a partition filter (PartitionFilters), not a post-scan filter."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from pharmacodi_spark.pipelines.ann_stream import (
        prepare_ann_index,
        read_index,
    )

    _, snapshot, _ = _split_corpus(spark)
    base = str(tmp_path / "ann")
    prepare_ann_index(spark, base, snapshot, n_centroids=N_CENT)
    df = read_index(spark, base).where(F.col("centroid_id") == 3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "centroid_id" in m.group(1), plan
