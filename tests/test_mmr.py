"""MMR diversified retrieval: equality with a pure-Python greedy replay,
and the diversity property (a plain-top-k near-duplicate is displaced by a
distinct-but-relevant result)."""

from __future__ import annotations


def _py_mmr(vecs, q, k, lam_pct, scale=10_000):
    qi = [int(x * scale + 0.5) if x >= 0 else -int(-x * scale + 0.5) for x in q]
    vi = {
        i: [int(x * scale + 0.5) if x >= 0 else -int(-x * scale + 0.5) for x in v]
        for i, v in vecs.items()
    }
    dot = lambda a, b: sum(x * y for x, y in zip(a, b))
    chosen = []
    while len(chosen) < k and len(chosen) < len(vecs):
        best = None
        for i, v in vi.items():
            if i in [c[0] for c in chosen]:
                continue
            rel = dot(v, qi)
            pen = max((dot(v, vi[j]) for j, *_ in chosen), default=0)
            key = lam_pct * rel - (100 - lam_pct) * pen
            cand = (key, -i)
            if best is None or cand > best[0]:
                best = (cand, i, rel, key)
        chosen.append((best[1], best[2], best[3]))
    return chosen


VECS = {
    1: [1.0, 0.0, 0.0],     # most relevant
    2: [0.99, 0.01, 0.0],   # near-copy of 1
    3: [0.7, 0.7, 0.0],     # relevant, different angle
    4: [0.0, 1.0, 0.0],     # orthogonal to the query
    5: [0.6, 0.0, 0.6],     # relevant, third angle
}
Q = [1.0, 0.3, 0.3]
# NOTE: q must not equal any doc vector, else rel(v) == sim(v, chosen) and
# every MMR key collapses to 0 at λ=50 (ties resolve by id, not diversity)


def test_mmr_matches_python_replay(spark):
    from pharmacodi_spark.text.similarity import mmr_topk

    df = spark.createDataFrame(
        [(i, v) for i, v in VECS.items()], "vec_id long, embedding array<double>"
    )
    got = mmr_topk(df, Q, k=4, lam_pct=70)
    want = _py_mmr(VECS, Q, k=4, lam_pct=70)
    assert got == want, (got, want)


def test_mmr_displaces_near_duplicates(spark):
    from pharmacodi_spark.text.similarity import mmr_topk

    df = spark.createDataFrame(
        [(i, v) for i, v in VECS.items()], "vec_id long, embedding array<double>"
    )
    # plain relevance order: 1, 2 (the near-copy), then 3/5
    diverse = [i for i, *_ in mmr_topk(df, Q, k=3, lam_pct=50)]
    assert diverse[0] == 1
    assert 2 not in diverse, diverse  # the near-copy is displaced
    assert set(diverse[1:]) <= {3, 4, 5}
    # λ=100 degenerates to plain top-k by relevance
    plain = [i for i, *_ in mmr_topk(df, Q, k=3, lam_pct=100)]
    assert plain == [1, 2, 3]


def test_jl_projection_preserves_separation_and_is_shuffle_free(spark):
    from pharmacodi_spark.text.similarity import jl_project, jl_sign_matrix

    dim, k = 32, 12
    # two well-separated clusters, small within-cluster jitter
    rows = []
    for i in range(6):
        rows.append((i, [1.0 + 0.01 * ((i * 7 + d) % 3) for d in range(dim)]))
        rows.append((100 + i, [-1.0 - 0.01 * ((i * 5 + d) % 3) for d in range(dim)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = jl_project(df, jl_sign_matrix(dim, k))
    proj = {r.vec_id: [r[f"p{j}"] for j in range(k)] for r in out.collect()}
    d2 = lambda a, b: sum((x - y) ** 2 for x, y in zip(a, b))
    within = [d2(proj[a], proj[b]) for a in range(6) for b in range(6) if a < b]
    across = [d2(proj[a], proj[100 + b]) for a in range(6) for b in range(6)]
    assert max(within) < min(across)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_cross_encoder_rerank_seam(spark):
    from pharmacodi_spark.text.retrieval import rerank_with_scorer

    q1, q2 = "spark shuffle join", "window functions"
    rows = [
        (q1, 1, "spark shuffle join"),
        (q1, 2, "spark spark spark spark"),
        (q1, 3, "unrelated words here"),
        (q2, 4, "window functions"),
        (q2, 5, "window window window"),
    ]
    df = spark.createDataFrame(rows, "query string, doc_id long, text string")

    def scorer(queries, docs):  # deterministic "cross-encoder": term overlap
        return [
            sum(d.split().count(t) for t in q.split()) / (1 + len(d.split()))
            for q, d in zip(queries, docs)
        ]

    out = rerank_with_scorer(df, scorer, query_col="query", k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query, []).append((r.rank, r.doc_id, r.ce_score))
    r1 = sorted(by_q[q1])
    assert [d for _, d, _ in r1] == [2, 1]        # term-dense doc first
    assert len(by_q[q2]) == 2 and sorted(by_q[q2])[0][1] == 5
    # python replay of the top scores
    assert r1[0][2] == 4 / 5 and r1[1][2] == 3 / 4
