"""auto_salted_join: strategy selection from the measured profile, and
row-for-row equivalence with the plain join on both branches."""

from __future__ import annotations

from pyspark.sql import functions as F


def _mk(spark):
    # key 5 holds 60% of fact rows — structurally skewed
    fact = spark.createDataFrame(
        [(i, 5 if i % 10 < 6 else i % 10) for i in range(1000)],
        "row_id long, k long",
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(10)], "k long, name string")
    return fact, dim


def _rows(df):
    return sorted((r["row_id"], r["k"], r["name"]) for r in df.collect())


def test_salted_branch_equivalent_to_plain_join(spark):
    from pharmacodi_spark.operators.joins import auto_salted_join

    fact, dim = _mk(spark)
    plain = _rows(fact.join(dim, "k"))
    # target 50 rows/task -> hot key 5 (600 rows) needs salt 12
    out = auto_salted_join(fact, dim, on="k", target_rows_per_task=50)
    assert _rows(out) == plain


def test_plain_branch_when_no_key_overflows(spark):
    from pharmacodi_spark.operators.joins import auto_salted_join

    fact, dim = _mk(spark)
    out = auto_salted_join(fact, dim, on="k", target_rows_per_task=10_000)
    assert _rows(out) == _rows(fact.join(dim, "k"))
    # plain branch adds no salt machinery to the plan
    assert "__salt" not in out.columns
    assert "Generate" not in out._jdf.queryExecution().executedPlan().toString()


def test_salt_capped_at_max(spark):
    from pharmacodi_spark.operators.joins import auto_salted_join

    fact, dim = _mk(spark)
    # target 1 row/task would ask for salt 600; cap must clamp it
    out = auto_salted_join(
        fact, dim, on="k", target_rows_per_task=1, max_salts=8
    )
    assert _rows(out) == _rows(fact.join(dim, "k"))


def test_outer_join_modes_rejected(spark):
    """right/full outer would emit unmatched right rows once per salt
    replica — both entry points refuse them up front (ADVICE r5)."""
    import pytest

    from pharmacodi_spark.operators.joins import auto_salted_join, salted_join

    left = spark.range(10).withColumnRenamed("id", "k")
    right = spark.range(5).withColumnRenamed("id", "k")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="outer"):
            salted_join(left, right, "k", salts=4, how=how)
        with pytest.raises(ValueError, match="outer"):
            auto_salted_join(left, right, "k", how=how)
    # supported modes still work
    assert salted_join(left, right, "k", salts=4, how="left_anti").count() == 5
