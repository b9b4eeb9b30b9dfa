"""Arrow GEMM pair-scoring tier (r12): cell_cosine_pairs_arrow must emit
the EXACT pair set of the codegen join paths — including under the
triangle-block hot-cell guard, where off-diagonal blocks score only
cross-subgroup pairs (the diagonal rule) — and the auto-dispatch must
route dim ≥ CELL_PAIRS_ARROW_MIN_DIM to it and keep narrow vectors on
the JVM paths."""

import numpy as np
import pytest

from pharmacodi_spark.text.similarity import (
    CELL_PAIRS_ARROW_MIN_DIM,
    cell_cosine_pairs,
    cell_cosine_pairs_arrow,
)


def _fixture(spark, dim=16, n=60, cells=2, seed=3):
    """Integer-valued vectors with real near-dup structure and a skewed
    cell layout (cell 0 gets 3/4 of the rows → multiple triangle
    subgroups at small max_cell_size)."""
    rng = np.random.default_rng(seed)
    protos = rng.integers(-9, 9, size=(4, dim))
    vecs = [
        (protos[i % 4] + rng.integers(-1, 2, size=dim)).tolist()
        for i in range(n)
    ]
    cell = [0 if i % 4 else 1 for i in range(n)]  # skew: 75% in cell 0
    df = spark.createDataFrame(
        [(i, cell[i], [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, cell int, embedding array<double>",
    )
    a = np.array(vecs, dtype=np.float64)
    norm = np.sqrt((a * a).sum(axis=1))
    cos = (a @ a.T) / np.outer(norm, norm)
    want = {
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if cell[i] == cell[j] and cos[i, j] >= 0.8
    }
    return df, want


def _pairs(df, **kw):
    return {
        (r.doc_a, r.doc_b)
        for r in cell_cosine_pairs_arrow(
            df,
            vec_col="embedding",
            id_col="vec_id",
            cell_col="cell",
            threshold=0.8,
            **kw,
        ).collect()
    }


def test_arrow_matches_codegen_and_brute_force(spark):
    df, want = _fixture(spark)
    assert want  # non-degenerate fixture
    codegen = {
        (r.doc_a, r.doc_b)
        for r in cell_cosine_pairs(
            df,
            vec_col="embedding",
            id_col="vec_id",
            cell_col="cell",
            threshold=0.8,
            method="codegen",
        ).collect()
    }
    assert codegen == want
    assert _pairs(df) == want


def test_arrow_triangle_guard_exact_and_slabbed(spark):
    """max_cell_size far below the hot cell size forces s ≥ 3 subgroups
    → off-diagonal cross-blocks exercise the diagonal rule; slab_rows
    below the block size forces multi-slab GEMMs. Pair set unchanged."""
    df, want = _fixture(spark)
    assert _pairs(df, max_cell_size=8) == want
    assert _pairs(df, max_cell_size=8, slab_rows=3) == want
    assert _pairs(df, slab_rows=7) == want


def test_auto_dispatch_by_width(spark):
    """dim ≥ CELL_PAIRS_ARROW_MIN_DIM routes to the Arrow tier
    (FlatMapGroupsInPandas in the physical plan); narrow vectors stay on
    the JVM join paths (no Python node)."""
    assert CELL_PAIRS_ARROW_MIN_DIM == 129  # just above the flatten ceiling
    df, _ = _fixture(spark, dim=8, n=12)
    narrow = cell_cosine_pairs(
        df, vec_col="embedding", id_col="vec_id", cell_col="cell"
    )
    nplan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in nplan

    wide, _ = _fixture(spark, dim=CELL_PAIRS_ARROW_MIN_DIM, n=12)
    routed = cell_cosine_pairs(
        wide, vec_col="embedding", id_col="vec_id", cell_col="cell"
    )
    wplan = routed._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in wplan

    forced = cell_cosine_pairs(
        df, vec_col="embedding", id_col="vec_id", cell_col="cell",
        method="arrow",
    )
    fplan = forced._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in fplan


def test_arrow_empty_result_schema(spark):
    df, _ = _fixture(spark, n=8)
    out = cell_cosine_pairs_arrow(
        df, vec_col="embedding", id_col="vec_id", cell_col="cell",
        threshold=1.1,  # cosine ≤ 1 → nothing passes
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_a", "doc_b"]
    assert out.schema["doc_a"].dataType.simpleString() == "bigint"


def test_zero_norm_vectors_excluded_identically(spark):
    """Cosine is undefined for zero vectors: both tiers must EXCLUDE
    them explicitly (r12) — under Spark 4's default ANSI session the
    unguarded pair expression would raise DIVIDE_BY_ZERO on the codegen
    path while numpy silently NaN-drops; the shared n2 > 0 rule makes
    the tiers equivalent and ANSI-safe."""
    df, want = _fixture(spark, n=24)
    dim = 16
    zeros = spark.createDataFrame(
        [(1000, 0, [0.0] * dim), (1001, 1, [0.0] * dim)],
        "vec_id long, cell int, embedding array<double>",
    )
    noisy = df.unionByName(zeros)
    for kw in ({"method": "codegen"}, {"method": "arrow"},
               {"method": "arrow", "max_cell_size": 8}):
        got = {
            (r.doc_a, r.doc_b)
            for r in cell_cosine_pairs(
                noisy, vec_col="embedding", id_col="vec_id",
                cell_col="cell", threshold=0.8, **kw,
            ).collect()
        }
        assert got == want, kw


def test_method_validation(spark):
    df, _ = _fixture(spark, n=4)
    with pytest.raises(ValueError, match="method"):
        cell_cosine_pairs(
            df, vec_col="embedding", id_col="vec_id", cell_col="cell",
            method="gemm",
        )


@pytest.mark.slow
def test_semantic_dedup_e2e_path_invariant_at_wide_dim(spark):
    """The full semantic-dedup cascade (seeded blocking → pair scoring →
    connected components → droplist) at dim 300 — where the auto
    dispatch routes scoring to the Arrow tier — must produce the
    IDENTICAL droplist as the forced-codegen path: the tier swap is a
    physical decision, invisible end-to-end."""
    from pharmacodi_spark.text.clusters import near_dup_droplist
    from pharmacodi_spark.text.similarity import (
        cell_cosine_pairs,
        seeded_cell_assign,
    )

    rng = np.random.default_rng(11)
    dim, n = 300, 200
    protos = rng.integers(-15, 15, size=(8, dim))
    vecs = [
        (protos[i % 8] + rng.integers(-1, 2, size=dim)).tolist()
        for i in range(n)
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, qe array<double>",
    )
    assigned = seeded_cell_assign(df, 4, vec_col="qe", out_col="cid")

    def droplist(method):
        pairs = cell_cosine_pairs(
            assigned,
            vec_col="qe",
            id_col="vec_id",
            cell_col="cid",
            threshold=0.40,
            max_cell_size=64,
            method=method,
        )
        return {
            (r.vec_id, r.component, r.keep)
            for r in near_dup_droplist(
                df.select("vec_id"), pairs, id_col="vec_id"
            ).collect()
        }

    auto = droplist(None)  # dim 300 ≥ 256 → arrow tier
    codegen = droplist("codegen")
    assert auto == codegen
    assert any(not keep for _, _, keep in auto)  # real dups were dropped
