"""log2-bucket quantile sketch (operators/sketches.py::log2_hist_*):
pure-Python replay equality, the guaranteed [lo, hi] envelope vs exact
discrete quantiles, merge/rollup equivalence, NULL/zero hygiene, and the
bounded-state scale property."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from pharmacodi_spark.operators.sketches import (
    log2_hist_merge,
    log2_hist_quantiles,
    log2_hist_sketch,
)

QS = [500_000, 900_000, 990_000]


def _py_quantiles(values, qs_ppm):
    out = {}
    n = len(values)
    s = sorted(values)
    for q in qs_ppm:
        rank = -(-n * q // 1_000_000)  # ceil
        exact = s[rank - 1]
        b = -1 if exact == 0 else exact.bit_length() - 1
        lo = 0 if b < 0 else 1 << b
        hi = 0 if b < 0 else (1 << (b + 1)) - 1
        out[q] = (n, exact, lo, hi)
    return out


def test_quantile_sketch_matches_python_replay(spark):
    rng = random.Random(3)
    rows = [
        (f"g{i % 3}", int(math.exp(rng.uniform(0, 12)))) for i in range(900)
    ]
    df = spark.createDataFrame(rows, "grp string, v long")
    got = {
        (r["grp"], r["q_ppm"]): (r["n_values"], r["lo"], r["hi"])
        for r in log2_hist_quantiles(
            log2_hist_sketch(df, "v", by=["grp"]), QS, by=["grp"]
        ).collect()
    }
    for g in ("g0", "g1", "g2"):
        vals = [v for grp, v in rows if grp == g]
        py = _py_quantiles(vals, QS)
        for q, (n, exact, lo, hi) in py.items():
            assert got[(g, q)] == (n, lo, hi), (g, q)
            assert lo <= exact <= hi  # the guaranteed envelope


def test_quantile_envelope_always_contains_exact(spark):
    # property sweep over distribution shapes: uniform, heavy-tailed,
    # constant, with zeros
    rng = random.Random(17)
    shapes = {
        "uniform": [rng.randint(0, 10**6) for _ in range(500)],
        "heavy": [int(math.exp(rng.uniform(0, 20))) for _ in range(500)],
        "const": [42] * 300,
        "zeros": [0] * 50 + [rng.randint(1, 100) for _ in range(200)],
    }
    for name, vals in shapes.items():
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = {
            r["q_ppm"]: (r["n_values"], r["lo"], r["hi"])
            for r in log2_hist_quantiles(
                log2_hist_sketch(df, "v"), QS
            ).collect()
        }
        py = _py_quantiles(vals, QS)
        for q, (n, exact, lo, hi) in py.items():
            assert got[q] == (n, lo, hi), (name, q)
            assert lo <= exact <= hi, (name, q)
            if exact > 0:
                assert hi < 2 * lo  # the 2x relative-error contract


def test_quantile_sketch_merge_equals_single(spark):
    rng = random.Random(29)
    rows = [
        ("s0" if i % 2 else "s1", rng.randint(0, 10**9)) for i in range(600)
    ]
    df = spark.createDataFrame(rows, "slice string, v long")
    a = df.where("slice = 's0'")
    b = df.where("slice = 's1'")
    merged = log2_hist_merge(
        log2_hist_sketch(a, "v"), log2_hist_sketch(b, "v")
    )
    once = log2_hist_sketch(df, "v")
    qm = {
        r["q_ppm"]: tuple(r)
        for r in log2_hist_quantiles(merged, QS).collect()
    }
    qo = {
        r["q_ppm"]: tuple(r)
        for r in log2_hist_quantiles(once, QS).collect()
    }
    assert qm == qo
    # coarser-key rollup: per-slice states -> global quantiles
    rolled = log2_hist_merge(
        log2_hist_sketch(df, "v", by=["slice"]), by=[]
    )
    qr = {
        r["q_ppm"]: tuple(r)
        for r in log2_hist_quantiles(rolled, QS).collect()
    }
    assert qr == qo


def test_quantile_sketch_ignores_nulls_and_bounds_state(spark):
    vals = [(i % 1000 + 1,) for i in range(5000)]
    df = spark.createDataFrame(vals, "v long")
    with_nulls = df.unionByName(
        spark.createDataFrame([(None,)] * 100, "v long")
    )
    sk_clean = {tuple(r) for r in log2_hist_sketch(df, "v").collect()}
    sk_nulls = {tuple(r) for r in log2_hist_sketch(with_nulls, "v").collect()}
    assert sk_clean == sk_nulls
    # bounded state: 5000 values in [1, 1000] occupy <= 10 buckets
    assert len(sk_clean) <= 10


import pytest


@pytest.mark.slow
def test_streaming_quantile_sketch_equals_batch_and_survives_replay(
    spark, tmp_path
):
    import json as _json
    import os as _os
    import time as _time

    from pharmacodi_spark.operators.sketches import (
        log2_hist_quantiles,
        log2_hist_sketch,
        read_log2_hist_sketch,
        streaming_log2_hist_sketch,
    )

    rng = random.Random(31)
    rows = [
        {"src": f"s{i % 2}", "v": rng.randint(0, 10**6)} for i in range(60)
    ]
    src = str(tmp_path / "incoming")
    _os.makedirs(src)
    for i in range(3):
        path = _os.path.join(src, f"b{i}.json")
        with open(path, "w") as f:
            for r in rows[i * 20 : (i + 1) * 20]:
                f.write(_json.dumps(r) + "\n")
        _os.utime(path, (_time.time() + i * 10, _time.time() + i * 10))

    base = str(tmp_path / "state")
    for ckpt in ("c1", "c2"):  # second pass = full replay, must not double
        stream = (
            spark.readStream.schema("src string, v long")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        q = streaming_log2_hist_sketch(
            stream, base, str(tmp_path / ckpt), col="v", by=["src"]
        )
        q.awaitTermination()
    folded = read_log2_hist_sketch(spark, base, by=["src"])
    batch = log2_hist_sketch(
        spark.createDataFrame(
            [(r["src"], r["v"]) for r in rows], "src string, v long"
        ),
        "v",
        by=["src"],
    )
    qs = [500_000, 990_000]
    got = {
        tuple(r)
        for r in log2_hist_quantiles(folded, qs, by=["src"]).collect()
    }
    want = {
        tuple(r)
        for r in log2_hist_quantiles(batch, qs, by=["src"]).collect()
    }
    assert got == want


def test_merge_infers_group_keys_when_by_omitted(spark):
    # ADVICE r11: by=None must INFER the stored keys (every non-state
    # column), not silently sum counts across groups; naming an absent
    # key raises instead of dropping rowgroups on a typo.
    import pytest

    df = spark.createDataFrame(
        [("a", 4), ("a", 9), ("b", 4), ("b", 100)], "src string, v long"
    )
    sk = log2_hist_sketch(df, "v", by=["src"])
    inferred = log2_hist_merge(sk, sk)
    assert set(inferred.columns) == {"src", "__b", "__n"}
    per_src = {
        (r["src"], r["__b"]): r["__n"] for r in inferred.collect()
    }
    direct = {
        (r["src"], r["__b"]): 2 * r["__n"] for r in sk.collect()
    }
    assert per_src == direct
    with pytest.raises(ValueError, match="absent"):
        log2_hist_merge(sk, by=["sourc"])


def _py_top_gate(vals, pct):
    # pure-python replay: exact tie-keeping threshold + its log2 bucket
    q = len(vals) * pct // 100
    if q < 1:
        return None
    thr = sorted(vals, reverse=True)[q - 1]
    b = -1 if thr == 0 else thr.bit_length() - 1
    return b, (0 if b < 0 else 1 << b), (1 if b < 0 else 1 << (b + 1))


def test_top_gate_bucket_matches_exact_threshold_and_envelope(spark):
    # log2_hist_top_gate: gate_b must be the bucket CONTAINING the exact
    # tie-keeping top-p% threshold, for every group and several p — so
    # strict (v >= gate_hi_excl) <= exact <= loose (v >= gate_lo) holds
    # by construction. Values include 0 (bucket -1) and heavy ties.
    from pharmacodi_spark.operators.sketches import log2_hist_top_gate

    rng = random.Random(43)
    rows = []
    groups = {
        "a": [rng.randint(0, 10**6) for _ in range(400)],
        "b": [rng.choice([0, 1, 7, 7, 8, 1000]) for _ in range(97)],
        "tiny": [3, 9],  # quota floors to 0 at pct=20 -> NO row
    }
    for g, vs in groups.items():
        rows += [(g, v) for v in vs]
    df = spark.createDataFrame(rows, "src string, v long")
    sk = log2_hist_sketch(df, "v", by=["src"])
    for pct in (1, 20, 55, 100):
        got = {
            r["src"]: (r["gate_b"], r["gate_lo"], r["gate_hi_excl"])
            for r in log2_hist_top_gate(sk, pct, by=["src"]).collect()
        }
        want = {
            g: _py_top_gate(vs, pct)
            for g, vs in groups.items()
            if _py_top_gate(vs, pct) is not None
        }
        assert got == want, (pct, got, want)
        for g, vs in groups.items():
            if g not in want:
                continue
            b, lo, hi_excl = got[g]
            q = len(vs) * pct // 100
            thr = sorted(vs, reverse=True)[q - 1]
            n_exact = sum(v >= thr for v in vs)
            assert sum(v >= hi_excl for v in vs) <= n_exact
            assert n_exact <= sum(v >= lo for v in vs)


def test_top_gate_from_merged_slices_equals_from_scan(spark):
    # the item the sketch exists for: per-slice persisted states, merged
    # with inferred keys, gate identical to sketching the corpus once
    from pharmacodi_spark.operators.sketches import log2_hist_top_gate

    rng = random.Random(47)
    rows = [("s%d" % (i % 3), rng.randint(0, 10**9)) for i in range(900)]
    df = spark.createDataFrame(rows, "src string, v long")
    slices = [
        log2_hist_sketch(df.where(F.col("v") % 2 == i), "v", by=["src"])
        for i in (0, 1)
    ]
    merged = log2_hist_merge(*slices)  # by=None -> infers ["src"]
    once = log2_hist_sketch(df, "v", by=["src"])
    a = sorted(map(tuple, log2_hist_top_gate(merged, 10, by=["src"]).collect()))
    b = sorted(map(tuple, log2_hist_top_gate(once, 10, by=["src"]).collect()))
    assert a == b and len(a) == 3


@pytest.mark.slow
def test_streaming_gate_equals_batch_gate(spark, tmp_path):
    # the maintenance story end to end: a percentile gate answered from
    # STREAMING-maintained sketch state (per-batch-id partitions, keys
    # inferred at fold time) equals the gate from one batch scan — no
    # rescan of stream history, the log2_hist_top_gate contract over
    # read_log2_hist_sketch
    import json as _json
    import os as _os
    import time as _time

    from pharmacodi_spark.operators.sketches import (
        log2_hist_sketch,
        log2_hist_top_gate,
        read_log2_hist_sketch,
        streaming_log2_hist_sketch,
    )

    rng = random.Random(61)
    rows = [
        {"src": f"s{i % 2}", "v": rng.randint(0, 10**6)} for i in range(90)
    ]
    src = str(tmp_path / "incoming")
    _os.makedirs(src)
    for i in range(3):
        path = _os.path.join(src, f"b{i}.json")
        with open(path, "w") as f:
            for r in rows[i * 30 : (i + 1) * 30]:
                f.write(_json.dumps(r) + "\n")
        _os.utime(path, (_time.time() + i * 10, _time.time() + i * 10))

    base = str(tmp_path / "state")
    stream = (
        spark.readStream.schema("src string, v long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = streaming_log2_hist_sketch(
        stream, base, str(tmp_path / "ckpt"), col="v", by=["src"]
    )
    q.awaitTermination()
    folded = read_log2_hist_sketch(spark, base)  # keys inferred
    batch = log2_hist_sketch(
        spark.createDataFrame(
            [(r["src"], r["v"]) for r in rows], "src string, v long"
        ),
        "v",
        by=["src"],
    )
    for pct in (10, 35):
        a = sorted(
            map(tuple, log2_hist_top_gate(folded, pct).collect())
        )
        b = sorted(
            map(tuple, log2_hist_top_gate(batch, pct, by=["src"]).collect())
        )
        assert a == b and len(a) == 2
