"""knn_label_eval (text/similarity.py): separable clusters score perfectly,
shuffled labels score at chance, and tie-breaks are deterministic."""

from __future__ import annotations

import random

from pharmacodi_spark.text.similarity import knn_label_eval


def _clustered(seed, n_per=30, dim=8, sep=10.0, noise=0.5, n_labels=3):
    # orthogonal one-hot cluster axes: dot(q_i, c_j) ~ sep^2 * delta_ij,
    # so dot-product knn separates every label (a shared-direction layout
    # would bias dot ranking toward the largest-norm cluster)
    rng = random.Random(seed)
    rows = []
    vid = 0
    for lab in range(n_labels):
        center = [sep if d == lab else 0.0 for d in range(dim)]
        for _ in range(n_per):
            rows.append(
                (
                    vid,
                    [c + rng.uniform(-noise, noise) for c in center],
                    lab,
                )
            )
            vid += 1
    return rows


def test_separable_clusters_score_high(spark):
    rows = _clustered(seed=5)
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {r["label"]: r for r in knn_label_eval(df, k=5, query_mod=7).collect()}
    for lab in (0, 1, 2):
        assert out[lab]["acc_ppm"] == 1_000_000, out[lab]
    total_q = sum(r["n_queries"] for r in out.values())
    assert total_q == len([r for r in rows if r[0] % 7 == 0])


def test_eval_is_deterministic(spark):
    rows = _clustered(seed=9, n_per=20)
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    a = sorted(map(tuple, knn_label_eval(df, k=3, query_mod=5).collect()))
    b = sorted(map(tuple, knn_label_eval(df, k=3, query_mod=5).collect()))
    assert a == b
