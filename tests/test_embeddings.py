"""Embedding-generation seam (text/embeddings.py, VERDICT r9 item 5):
documents encode to vectors via mapInPandas with an injected encoder, and
the UNCHANGED semantic-dedup machinery consumes the output — text in,
droplist out."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_default_encoder_deterministic_and_signed(spark):
    from pharmacodi_spark.text.embeddings import encode_documents, hashed_signed_bow

    rows = [(0, "alpha beta beta"), (1, "alpha beta beta"), (2, ""), (3, "gamma")]
    out = {
        r["doc_id"]: np.array(r["embedding"])
        for r in encode_documents(_docs(spark, rows), dim=8).collect()
    }
    # identical text -> identical vector; local replay is bit-equal
    assert np.array_equal(out[0], out[1])
    assert np.array_equal(out[0], hashed_signed_bow(["alpha beta beta"], 8)[0])
    # empty doc -> zero vector, magnitudes are signed token counts
    assert not out[2].any()
    assert sorted(abs(int(x)) for x in out[0] if x) in ([1, 2], [3])
    assert np.abs(out[3]).sum() == 1


def test_encoder_injection_and_contract(spark):
    from pharmacodi_spark.text.embeddings import encode_documents

    rows = [(0, "a"), (1, "bb"), (2, "ccc")]

    def length_encoder(texts):
        return np.array([[len(t), 1.0] for t in texts], dtype=np.float32)

    got = {
        r["doc_id"]: list(r["embedding"])
        for r in encode_documents(
            _docs(spark, rows), encoder=length_encoder, dim=2
        ).collect()
    }
    assert got == {0: [1.0, 1.0], 1: [2.0, 1.0], 2: [3.0, 1.0]}

    # wrong-width encoder fails loudly at the first batch
    bad = encode_documents(_docs(spark, rows), encoder=length_encoder, dim=5)
    with pytest.raises(Exception, match="contract mismatch"):
        bad.collect()


def test_text_to_droplist_through_unchanged_semantic_dedup(spark):
    """The r9 verdict's done-criterion: a deterministic stand-in encoder
    feeds the semantic_dedup_pipeline stage composition UNCHANGED —
    encode_documents output slots where the embeddings fixture was, and
    planted near-duplicate texts come out as droplist components."""
    from pharmacodi_spark.text.clusters import near_dup_droplist
    from pharmacodi_spark.text.embeddings import encode_documents
    from pharmacodi_spark.text.similarity import cell_cosine_pairs, ivf_assign

    dup_a = "the quick brown fox jumps over the lazy dog again and again"
    dup_b = dup_a + " extra"          # near-dup: one extra token
    rows = [
        (0, dup_a),
        (1, dup_a),                   # exact dup of 0
        (2, dup_b),                   # near-dup of 0/1
        (3, "completely different content about spark shuffle partitions"),
        (4, "yet another unrelated document mentioning catalyst optimizer"),
    ]
    enc = encode_documents(_docs(spark, rows), dim=16)

    # the same stages semantic_dedup_pipeline runs on the fixture
    qe = enc.select(
        F.col("doc_id").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qe"),
    )
    seed = [list(r.qe) for r in sorted(qe.collect(), key=lambda r: r.vec_id)[:2]]
    assigned = ivf_assign(qe, seed, vec_col="qe", out_col="cid")
    pairs = cell_cosine_pairs(
        assigned, vec_col="qe", id_col="vec_id", cell_col="cid",
        threshold=0.80, max_cell_size=256,
    )
    out = near_dup_droplist(qe.select("vec_id"), pairs, id_col="vec_id")
    got = {r["vec_id"]: (r["component"], r["keep"]) for r in out.collect()}

    # 0/1/2 form one component; min-id keeper keeps 0, drops 1 and 2
    assert got[0][0] == got[1][0] == got[2][0]
    assert got[0][1] is True and got[1][1] is False and got[2][1] is False
    # the unrelated docs survive in their own components
    assert got[3][1] is True and got[4][1] is True
    assert got[3][0] != got[0][0] != got[4][0]


def test_model_encoder_batch_invariance(spark):
    """VERDICT r10 item 7: a MODEL-shaped encoder (dense numpy weight
    matrix, no hashing) through the Arrow seam must produce the same
    embedding column regardless of Arrow batch size — the contract the
    order-free hashing stand-in cannot guard. Any per-batch state leak
    (batch-relative indexing, buffer reuse, row drop/dup at batch
    boundaries) shows up as a mismatch between the 3-row-batch run, the
    big-batch run, and the driver-side ground truth."""
    from pharmacodi_spark.text.embeddings import encode_documents

    dim = 16
    rng = np.random.RandomState(42)
    # dense model weights, INTEGER-valued in float32: every product and
    # partial sum stays an exact integer < 2^24, so the comparison is
    # exact regardless of BLAS blocking/summation order (a float-valued
    # W showed last-ULP SGEMM kernel differences between a (3,8) and a
    # (40,8) left operand — real non-associativity, not a seam leak) —
    # the same quantize-first contract the similarity family documents
    w = rng.randint(-9, 10, size=(8, dim)).astype(np.float32)

    def featurize(texts):
        x = np.zeros((len(texts), 8), dtype=np.float32)
        for i, t in enumerate(texts):
            t = t if isinstance(t, str) else ""
            x[i] = [
                len(t), t.count(" "), t.count("e"), t.count("a"),
                sum(ord(c) for c in t[:20]) % 97,
                len(t.split()), t.count("."), 1.0,
            ]
        return x

    def model_encoder(texts):
        return featurize(texts) @ w  # (n, 8) @ (8, dim)

    rows = [(i, f"doc number {i} with body " + "word " * (i % 7)) for i in range(40)]
    df = _docs(spark, rows).repartition(4)

    def run(batch_size):
        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", batch_size)
        try:
            out = encode_documents(df, encoder=model_encoder, dim=dim)
            return {r["doc_id"]: list(r["embedding"]) for r in out.collect()}
        finally:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old
            )

    tiny, big = run(3), run(100000)
    assert tiny == big  # batch-boundary invariance, exact float equality

    truth = model_encoder([t for _, t in rows]).astype(np.float32)
    for i, (_did, _t) in enumerate(rows):
        assert tiny[i] == [float(v) for v in truth[i]], i
