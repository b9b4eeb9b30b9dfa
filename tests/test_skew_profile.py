"""skew_profile: heavy-hitter detection + salt-factor recommendation on a
deliberately skewed fixture."""

from __future__ import annotations


def test_skew_profile_flags_hot_key(spark):
    from pharmacodi_spark.operators.profile import skew_profile

    # key 7 holds 50% of rows; keys 0-9 share the rest
    rows = [(7,) for _ in range(500)] + [(k % 10,) for k in range(500)]
    df = spark.createDataFrame(rows, "k long")
    got = [
        (r["k"], r["n_rows"], r["share_ppm"], r["salt_factor"])
        for r in skew_profile(df, "k", top_k=3, target_rows_per_task=100).collect()
    ]
    # key 7: 500 + 50 = 550 rows of 1000 -> 550000 ppm, salt ceil(550/100)=6
    assert got[0] == (7, 550, 550000, 6)
    # the rest hold 50 rows each -> 50000 ppm, salt 1; tie-break by key asc
    assert got[1] == (0, 50, 50000, 1)
    assert got[2] == (1, 50, 50000, 1)


def test_skew_profile_uniform_keys_all_salt_one(spark):
    from pharmacodi_spark.operators.profile import skew_profile

    df = spark.createDataFrame([(k % 20,) for k in range(400)], "k long")
    out = skew_profile(df, "k", top_k=20, target_rows_per_task=1000).collect()
    assert len(out) == 20
    assert all(r["salt_factor"] == 1 for r in out)
    assert all(r["n_rows"] == 20 for r in out)
