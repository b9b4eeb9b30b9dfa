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


def _py_referee_eval(rows, k, query_mod, scale, scorer, pool_factor=3):
    """Driver-side replay of the scorer-refereed path: integer-dot pool ->
    scorer re-rank (ties on id) -> majority vote (ties on smaller label)."""
    # floor(x*scale+0.5) for possibly-negative x: mirror Spark's floor
    import math

    quant = {
        vid: [math.floor(x * scale + 0.5) for x in vec]
        for vid, vec, _ in rows
    }
    labels = {vid: lab for vid, _, lab in rows}
    texts = {vid: f"{lab}:{vid}" for vid, _, lab in rows}
    out = {}
    for qid, qv, qlab in rows:
        if qid % query_mod != 0:
            continue
        dots = [
            (-sum(a * b for a, b in zip(quant[cid], quant[qid])), cid)
            for cid, _, _ in rows
            if cid != qid
        ]
        pool = [cid for _, cid in sorted(dots)[: k * pool_factor]]
        scoredc = sorted(
            pool,
            key=lambda cid: (
                -scorer([texts[qid]], [texts[cid]])[0], cid
            ),
        )[:k]
        votes = {}
        for cid in scoredc:
            votes[labels[cid]] = votes.get(labels[cid], 0) + 1
        pred = min(votes, key=lambda l: (-votes[l], l))
        n, c = out.get(qlab, (0, 0))
        out[qlab] = (n + 1, c + (1 if pred == qlab else 0))
    return {
        lab: (n, c, c * 1_000_000 // n) for lab, (n, c) in out.items()
    }


def test_scorer_referee_matches_python_replay(spark):
    from pharmacodi_spark.text.similarity import knn_label_eval

    rows = _clustered(seed=11, n_per=12)
    # content encodes the label so a deterministic "cross-encoder" can act
    # on it: same-label pairs score by a stable hash, never by randomness
    def scorer(qs, cs):
        return [
            (2.0 if q.split(":")[0] == c.split(":")[0] else 1.0)
            + (int(c.split(":")[1]) % 7) / 100.0
            for q, c in zip(qs, cs)
        ]

    df = spark.createDataFrame(
        [(vid, vec, lab, f"{lab}:{vid}") for vid, vec, lab in rows],
        "vec_id long, embedding array<double>, label int, text string",
    )
    got = {
        r["label"]: (r["n_queries"], r["n_correct"], r["acc_ppm"])
        for r in knn_label_eval(
            df, k=5, query_mod=7, scorer=scorer, content_col="text"
        ).collect()
    }
    want = _py_referee_eval(rows, k=5, query_mod=7, scale=10000, scorer=scorer)
    assert got == want


def test_scorer_referee_can_overrule_dot_vote(spark):
    """A referee that inverts same-label preference must drag accuracy
    DOWN vs the baseline — proof the scorer actually controls the vote."""
    from pharmacodi_spark.text.similarity import knn_label_eval

    rows = _clustered(seed=13, n_per=12, noise=6.0)  # noisy: pool is mixed

    def adversary(qs, cs):
        return [
            0.0 if q.split(":")[0] == c.split(":")[0] else 1.0
            for q, c in zip(qs, cs)
        ]

    df = spark.createDataFrame(
        [(vid, vec, lab, f"{lab}:{vid}") for vid, vec, lab in rows],
        "vec_id long, embedding array<double>, label int, text string",
    )
    base = sum(
        r["n_correct"] for r in knn_label_eval(df, k=5, query_mod=7).collect()
    )
    refereed = sum(
        r["n_correct"]
        for r in knn_label_eval(
            df, k=5, query_mod=7, scorer=adversary, content_col="text"
        ).collect()
    )
    assert refereed < base
