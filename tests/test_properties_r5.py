"""Property-based tests for the round-5 operators: randomized corpora
through the real Spark operators vs pure-Python references. Examples kept
small (Spark per-example cost); the properties carry the coverage."""

from __future__ import annotations

import pytest

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

token = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
doc_text = st.lists(token, min_size=0, max_size=12).map(" ".join)
corpus = st.dictionaries(st.integers(0, 40), doc_text, min_size=1, max_size=12)


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@given(docs=corpus, shard_kb=st.integers(1, 64))
@SETTINGS
@pytest.mark.slow
def test_shuffle_shards_property(spark, docs, shard_kb):
    """byte_start is the exclusive prefix sum of sizes in md5-key order,
    and shard_id = byte_start // shard_bytes — for ANY corpus and target."""
    from pharmacodi_spark.text.packing import shuffle_shards

    sized = [(i, len(t)) for i, t in docs.items()]
    df = spark.createDataFrame(sized, "doc_id long, n_chars long")
    sb = shard_kb * 16
    got = {
        r["doc_id"]: (r["byte_start"], r["shard_id"])
        for r in shuffle_shards(df, shard_bytes=sb, salt="p").collect()
    }
    cum = 0
    for i, nb in sorted(sized, key=lambda d: (_md5_long("p" + str(d[0])), d[0])):
        assert got[i] == (cum, cum // sb), (i, got[i], cum)
        cum += nb


@given(docs=corpus, w=st.integers(1, 5))
@SETTINGS
@pytest.mark.slow
def test_passage_dedup_property(spark, docs, w):
    """n_passages/n_dup_passages match a naive Python chunker for ANY corpus
    and window; keep is the integer cross-multiplied half gate."""
    from pharmacodi_spark.text.dedup import passage_dedup_stats

    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_passages"], r["n_dup_passages"], r["keep"])
        for r in passage_dedup_stats(df, window=w).collect()
    }
    chunks: dict[int, list[str]] = {}
    for i, t in docs.items():
        toks = [x for x in t.split(" ") if x]
        chunks[i] = [
            " ".join(toks[j : j + w]) for j in range(0, len(toks), w)
        ]
    owners: dict[str, set[int]] = {}
    for i, cs in chunks.items():
        for c in cs:
            owners.setdefault(c, set()).add(i)
    for i in docs:
        n = len(chunks[i])
        dup = sum(1 for c in chunks[i] if len(owners[c]) >= 2)
        assert got[i] == (n, dup, 2 * dup <= n), i


@given(
    rows=st.lists(st.integers(0, 6), min_size=1, max_size=40),
    target=st.integers(1, 20),
)
@SETTINGS
@pytest.mark.slow
def test_skew_profile_property(spark, rows, target):
    """Counts, ppm shares and salt factors match exact integer math for ANY
    key distribution and task target."""
    from pharmacodi_spark.operators.profile import skew_profile

    df = spark.createDataFrame([(k,) for k in rows], "k long")
    got = {
        r["k"]: (r["n_rows"], r["share_ppm"], r["salt_factor"])
        for r in skew_profile(df, "k", top_k=10, target_rows_per_task=target).collect()
    }
    total = len(rows)
    for k in set(rows):
        n = rows.count(k)
        assert got[k] == (n, (n * 1_000_000) // total, (n + target - 1) // target)


@given(docs=corpus)
@SETTINGS
@pytest.mark.slow
def test_bm25_property(spark, docs):
    """Score equality vs the pure-Python fixed-point reference for ANY
    corpus (reusing tests/test_retrieval.py's reference)."""
    from pharmacodi_spark.text.retrieval import bm25_scores

    from tests.test_retrieval import _py_bm25

    terms = ["alpha", "gamma", "zeta"]
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = [
        (r["doc_id"], r["n_hit_terms"], r["score_fp"])
        for r in bm25_scores(df, terms, k=50).collect()
    ]
    assert got == _py_bm25(docs, terms, k=50)


@given(
    vec=st.lists(
        st.floats(-8, 8, allow_nan=False, width=32), min_size=1, max_size=12
    )
)
@SETTINGS
def test_int8_quantize_property(spark, vec):
    """Codes bounded by ±127, max-magnitude element hits ±127 exactly, and
    codes match floor(x·127/m + 0.5) for ANY float32 vector."""
    from pharmacodi_spark.text.similarity import int8_quantize

    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<float>")
    row = int8_quantize(df).collect()[0]
    q, m = row["q8"], row["q_scale"]
    import numpy as np

    v32 = [float(np.float32(x)) for x in vec]
    mm = max(abs(x) for x in v32)
    assert m == mm
    if mm == 0.0:
        assert q == [0] * len(vec)
    else:
        assert q == [int(math.floor(x * 127.0 / mm + 0.5)) for x in v32]
        assert max(abs(c) for c in q) == 127
