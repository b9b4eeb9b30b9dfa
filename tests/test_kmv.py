"""KMV bottom-k sketch (r12): the set-operations leg of the mergeable
sketch family. Deterministic md5 hashing makes every assertion exact —
the bottom-k itself, the merge identity, and the unsaturated regime
where the sketch IS the distinct hash set and all estimates are exact."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pharmacodi_spark.operators.sketches import (
    KMV_BITS,
    kmv_distinct_estimate,
    kmv_merge,
    kmv_set_ops,
    kmv_sketch,
)


def _h(v, salt="kmv"):
    return int(hashlib.md5(f"{salt}:{v}".encode()).hexdigest()[:15], 16)


def test_kmv_bottom_k_exact_and_dup_invariant(spark):
    """The sketch is exactly the k smallest md5 hashes of the DISTINCT
    values — duplicates and NULLs change nothing."""
    vals = [f"tok{i}" for i in range(500)]
    rows = [(v,) for v in vals for _ in (0, 1)] + [(None,)] * 7
    df = spark.createDataFrame(rows, "t string")
    got = kmv_sketch(df, "t", k=64).first()["__kmv"]
    assert got == sorted(_h(v) for v in vals)[:64]


def test_kmv_unsaturated_is_exact_distinct(spark):
    df = spark.createDataFrame([(f"v{i}",) for i in range(30)], "t string")
    est = kmv_distinct_estimate(kmv_sketch(df, "t", k=256), k=256).first()
    assert est["n_kept"] == 30 and est["n_est"] == 30


def test_kmv_estimator_matches_brute_force_formula(spark):
    """Saturated regime: n_est must equal floor((k−1)·2^60 / h_k) on the
    exact md5 order statistic — the Spark arithmetic IS the formula."""
    n, k = 3000, 128
    df = spark.createDataFrame(
        [(f"tok{i}",) for i in range(n)], "t string"
    )
    est = kmv_distinct_estimate(kmv_sketch(df, "t", k=k), k=k).first()
    hk = sorted(_h(f"tok{i}") for i in range(n))[k - 1]
    assert est["n_kept"] == k
    assert est["n_est"] == math.floor((k - 1) * (1 << KMV_BITS) / hk)
    # and the draw lands inside the 4σ KMV band (σ ≈ 1/√(k−2))
    assert abs(est["n_est"] - n) / n < 4 / math.sqrt(k - 2)


def test_kmv_merge_identity_and_key_inference(spark):
    """Merging per-slice sketches ≡ sketching the whole (set-union ∘
    bottom-k is associative/idempotent), and by=None infers group keys
    from the schema instead of silently pooling across groups."""
    df = spark.createDataFrame(
        [(f"t{i % 700}", i % 3) for i in range(2100)], "t string, src int"
    )
    whole = {
        r["src"]: r["__kmv"]
        for r in kmv_sketch(df, "t", k=96, by=["src"]).collect()
    }
    parts = [
        kmv_sketch(df.where(F.col("t") <= "t4"), "t", k=96, by=["src"]),
        kmv_sketch(df.where(F.col("t") > "t4"), "t", k=96, by=["src"]),
        # replay: merging a slice twice must change nothing (idempotent)
        kmv_sketch(df.where(F.col("t") > "t4"), "t", k=96, by=["src"]),
    ]
    merged = {r["src"]: r["__kmv"] for r in kmv_merge(*parts, k=96).collect()}
    assert merged == whole  # keys inferred, per-src granularity kept
    # explicit global rollup
    glob = kmv_merge(*parts, k=96, by=[]).first()["__kmv"]
    want = sorted(_h(f"t{i}") for i in range(700))[:96]
    assert glob == want
    with pytest.raises(ValueError, match="absent"):
        kmv_merge(parts[0], k=96, by=["nope"])


def test_kmv_set_ops_exact_when_unsaturated(spark):
    """|A|=60, |B|=60, |A∩B|=20 with k=256: the combined bottom-k holds
    the full union, so union/intersection/Jaccard are EXACT."""
    a = spark.createDataFrame([(f"x{i}",) for i in range(60)], "t string")
    b = spark.createDataFrame(
        [(f"x{i}",) for i in range(40, 100)], "t string"
    )
    r = kmv_set_ops(
        kmv_sketch(a, "t", k=256), kmv_sketch(b, "t", k=256), k=256
    ).first()
    assert (r["n_a_est"], r["n_b_est"]) == (60, 60)
    assert r["union_est"] == 100 and r["inter_est"] == 20
    assert r["jaccard_ppm"] == 200000


def test_kmv_set_ops_grouped_and_saturated_band(spark):
    """Grouped sketches join on the inferred keys; in the saturated
    regime the Jaccard estimate stays within a loose 4σ band of truth
    (σ ≈ √(J(1−J)/k) on the k-sample overlap indicator)."""
    n, overlap, k = 4000, 2000, 256
    a = spark.createDataFrame(
        [(f"w{i}", i % 2) for i in range(n)], "t string, g int"
    )
    b = spark.createDataFrame(
        [(f"w{i}", i % 2) for i in range(n - overlap, 2 * n - overlap)],
        "t string, g int",
    )
    out = {
        r["g"]: r
        for r in kmv_set_ops(
            kmv_sketch(a, "t", k=k, by=["g"]),
            kmv_sketch(b, "t", k=k, by=["g"]),
            k=k,
        ).collect()
    }
    true_j = overlap / (2 * n - overlap)
    sigma = math.sqrt(true_j * (1 - true_j) / k)
    for g in (0, 1):
        assert abs(out[g]["jaccard_ppm"] / 1e6 - true_j) < 4 * sigma
        assert abs(out[g]["union_est"] - (n - overlap / 2) * 2 / 2) < (
            (n - overlap / 2)
        ) * 0.3  # per-group union ≈ (2n−overlap)/2, generous band


def test_kmv_lane_fan_in_invariance(spark):
    """fan_in is a physical knob: any lane count yields the identical
    sketch (the lanes partition the hash space)."""
    df = spark.createDataFrame([(f"q{i}",) for i in range(900)], "t string")
    base = kmv_sketch(df, "t", k=80, fan_in=16).first()["__kmv"]
    assert kmv_sketch(df, "t", k=80, fan_in=1).first()["__kmv"] == base
    assert kmv_sketch(df, "t", k=80, fan_in=64).first()["__kmv"] == base


def test_streaming_kmv_replay_idempotent(spark, tmp_path):
    """The streaming twin: per-batch bottom-k states land in batch_id
    partitions; a FULL replay (fresh checkpoint over the same files)
    must fold to the identical sketch — and that sketch must equal the
    batch sketch over all rows (merge ≡ one pass)."""
    import json as _json
    import os as _os
    import time as _time

    from pharmacodi_spark.operators.sketches import (
        read_kmv_sketch,
        streaming_kmv_sketch,
    )

    rows = [{"src": f"s{i % 2}", "t": f"tok{i % 40}"} for i in range(90)]
    src = str(tmp_path / "incoming")
    _os.makedirs(src)
    for i in range(3):
        path = _os.path.join(src, f"b{i}.json")
        with open(path, "w") as f:
            for r in rows[i * 30 : (i + 1) * 30]:
                f.write(_json.dumps(r) + "\n")
        _os.utime(path, (_time.time() + i * 10, _time.time() + i * 10))

    base = str(tmp_path / "state")
    for ckpt in ("c1", "c2"):  # second pass = full replay
        stream = (
            spark.readStream.schema("src string, t string")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        q = streaming_kmv_sketch(
            stream, base, str(tmp_path / ckpt), col="t", k=16, by=["src"]
        )
        q.awaitTermination()
    folded = {
        r["src"]: r["__kmv"]
        for r in read_kmv_sketch(spark, base, k=16).collect()
    }
    batch = {
        r["src"]: r["__kmv"]
        for r in kmv_sketch(
            spark.createDataFrame(
                [(r["src"], r["t"]) for r in rows], "src string, t string"
            ),
            "t",
            k=16,
            by=["src"],
        ).collect()
    }
    assert folded == batch and set(folded) == {"s0", "s1"}


def test_kmv_overlap_matrix_exact_when_unsaturated(spark):
    """Three groups with known pairwise overlaps, k large enough that
    every sketch is the full hash set → the matrix is EXACT: one row
    per unordered pair, kmv_set_ops-identical columns."""
    from pharmacodi_spark.operators.sketches import kmv_overlap_matrix

    rows = (
        [(f"x{i}", "a") for i in range(40)]
        + [(f"x{i}", "b") for i in range(20, 60)]  # |a∩b|=20, |b|=40
        + [(f"y{i}", "c") for i in range(10)]  # disjoint from both
    )
    df = spark.createDataFrame(rows, "t string, g string")
    sk = kmv_sketch(df, "t", k=256, by=["g"])
    out = {
        (r["g_a"], r["g_b"]): r
        for r in kmv_overlap_matrix(sk, key="g", k=256).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    assert (ab["n_a_est"], ab["n_b_est"]) == (40, 40)
    assert ab["union_est"] == 60 and ab["inter_est"] == 20
    assert ab["jaccard_ppm"] == 20 * 1000000 // 60
    for pair in (("a", "c"), ("b", "c")):
        assert out[pair]["inter_est"] == 0
        assert out[pair]["jaccard_ppm"] == 0
        assert out[pair]["union_est"] == 50
