"""group_quantiles (operators/profile.py): pure-Python percentile_disc
replay including tie plateaus and singleton groups."""

from __future__ import annotations

import math
import random

from pharmacodi_spark.operators.profile import group_quantiles


def _py_q(vals: list[int], q: int) -> int:
    s = sorted(vals)
    r = max(math.ceil(len(s) * q / 100), 1)
    return s[r - 1]


def test_group_quantiles_matches_python(spark):
    rng = random.Random(3)
    rows = []
    for g in range(6):
        n = rng.randint(1, 40)
        # small value domain forces tie plateaus in the histogram
        rows += [(f"g{g}", rng.randint(0, 9)) for _ in range(n)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    got = {
        r["grp"]: r
        for r in group_quantiles(df, "v", "grp", qs=(1, 25, 50, 75, 100)).collect()
    }
    by_g: dict[str, list[int]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        r = got[g]
        assert r["n_rows"] == len(vals)
        for q in (1, 25, 50, 75, 100):
            assert r[f"p{q}"] == _py_q(vals, q), (g, q)


def test_group_quantiles_singleton_and_constant(spark):
    df = spark.createDataFrame(
        [("a", 7), ("b", 5), ("b", 5), ("b", 5)], ["grp", "v"]
    )
    got = {r["grp"]: r for r in group_quantiles(df, "v", "grp").collect()}
    assert got["a"]["p25"] == got["a"]["p95"] == 7
    assert got["b"]["p25"] == got["b"]["p95"] == 5
