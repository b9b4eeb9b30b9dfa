"""distribution_psi (operators/profile.py): pure-Python replay, the
zero-drift identity, and one-sided buckets staying finite."""

from __future__ import annotations

from pharmacodi_spark.operators.profile import distribution_psi
from pharmacodi_spark.text.selection import ilog2_fp_int


def _py_psi(ref: list[str], cur: list[str]):
    from collections import Counter

    cp, cq = Counter(ref), Counter(cur)
    np, nq = len(ref), len(cur)
    out = {}
    for b in set(cp) | set(cq):
        p, q = cp.get(b, 0), cq.get(b, 0)
        ppm_p, ppm_q = p * 1_000_000 // np, q * 1_000_000 // nq
        lr = (
            ilog2_fp_int(p + 1)
            + ilog2_fp_int(nq)
            - ilog2_fp_int(q + 1)
            - ilog2_fp_int(np)
        )
        out[b] = (p, q, ppm_p, ppm_q, (ppm_p - ppm_q) * lr)
    return out


def test_psi_matches_python(spark):
    ref = ["a"] * 50 + ["b"] * 30 + ["c"] * 20
    cur = ["a"] * 20 + ["b"] * 30 + ["d"] * 10  # c vanished, d appeared
    rdf = spark.createDataFrame([(x,) for x in ref], ["bucket"])
    cdf = spark.createDataFrame([(x,) for x in cur], ["bucket"])
    got = {
        r["bucket"]: (
            r["c_ref"], r["c_cur"], r["ppm_ref"], r["ppm_cur"],
            r["psi_term_fp"],
        )
        for r in distribution_psi(rdf, cdf, "bucket").collect()
    }
    assert got == _py_psi(ref, cur)
    # one-sided buckets present and finite
    assert got["c"][1] == 0 and got["d"][0] == 0


def test_psi_zero_when_identical(spark):
    rows = ["x"] * 10 + ["y"] * 5
    df = spark.createDataFrame([(x,) for x in rows], ["bucket"])
    out = distribution_psi(df, df, "bucket").collect()
    assert all(r["psi_term_fp"] == 0 for r in out)
    # drifted pair must sum strictly positive (PSI >= 0, 0 only if equal)
    df2 = spark.createDataFrame([("x",)] * 14 + [("y",)] * 1, ["bucket"])
    tot = sum(
        r["psi_term_fp"] for r in distribution_psi(df, df2, "bucket").collect()
    )
    assert tot > 0
