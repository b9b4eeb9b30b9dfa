"""Property-based tests for the selection primitives: the fixed-point
integer log2 (every oracle's workhorse), the exact percentile gate, and
UniMax water-filling — randomized inputs vs pure-Python references."""

from __future__ import annotations

import pytest

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

PURE_SETTINGS = settings(max_examples=300, deadline=None)


@given(x=st.integers(1, 2**62), s=st.integers(0, 20))
@PURE_SETTINGS
def test_ilog2_fp_int_error_bound_and_monotone(x, s):
    """il(x)/2^s approximates log2 x within the documented bound
    (linear-interp peak ~0.0861 bits + quantization), never negative
    error beyond quantization, and is monotone at the boundary x±1."""
    from pharmacodi_spark.text.selection import ilog2_fp_int

    got = ilog2_fp_int(x, s) / (1 << s)
    true = math.log2(x)
    assert got <= true + 2 ** -s + 1e-12          # never overshoots much
    assert got >= true - 0.0862 - 2 ** -s         # documented max error
    assert ilog2_fp_int(x + 1, s) >= ilog2_fp_int(x, s)
    if x > 1:
        assert ilog2_fp_int(x - 1, s) <= ilog2_fp_int(x, s)


@given(
    scores=st.lists(st.integers(0, 20), min_size=1, max_size=30),
    pct=st.integers(0, 100),
)
@SETTINGS
@pytest.mark.slow
def test_percentile_gate_property(spark, scores, pct):
    """Gate semantics vs a pure-Python reference: keep every row whose
    score >= the ⌊N·p/100⌋-th highest score (all ties included); quota 0
    keeps nothing."""
    from pharmacodi_spark.text.selection import percentile_gate

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(scores)], "doc_id long, score long"
    )
    kept = sorted(r.doc_id for r in percentile_gate(df, "score", pct).collect())
    quota = len(scores) * pct // 100
    if quota == 0:
        want = []
    else:
        thr = sorted(scores, reverse=True)[quota - 1]
        want = sorted(i for i, s in enumerate(scores) if s >= thr)
    assert kept == want, (scores, pct, kept, want)


@given(
    sizes=st.lists(st.integers(0, 50), min_size=1, max_size=8),
    budget=st.integers(0, 500),
    epochs=st.integers(1, 3),
)
@SETTINGS
@pytest.mark.slow
def test_unimax_property(spark, sizes, budget, epochs):
    """Water-filling invariants vs a pure-Python greedy reference:
    Σalloc ≤ budget, alloc ≤ cap, and the allocation is the lexicographic
    max-min (raising any origin's share would breach budget or its cap)."""
    from pharmacodi_spark.text.selection import unimax_allocation

    rows = [
        (i, " ".join(["w"] * n) if n else "", f"s{i}")
        for i, n in enumerate(sizes)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in unimax_allocation(df, budget, epochs).collect()}
    total_cap = sum(n * epochs for n in sizes)
    allocs = {f"s{i}": out[f"s{i}"].alloc for i in range(len(sizes))}
    caps = {f"s{i}": sizes[i] * epochs for i in range(len(sizes))}
    assert all(0 <= allocs[s] <= caps[s] for s in allocs)
    spent = sum(allocs.values())
    assert spent <= max(budget, 0) or budget >= total_cap
    if budget >= total_cap:
        assert allocs == caps            # degenerate branch: everyone capped
    else:
        # waterline property: any uncapped origin could absorb the leftover
        leftover = budget - spent
        uncapped = [s for s in allocs if allocs[s] < caps[s]]
        n_uncapped = len(uncapped)
        if n_uncapped:
            # integer div leaves < n_uncapped tokens unassigned at most
            assert leftover < n_uncapped + len(allocs)
