"""token_entropy (text/analysis.py): pure-Python fixed-point replay +
gate-semantics edges (empty doc, single token, uniform vs degenerate)."""

from __future__ import annotations

from collections import Counter

from pharmacodi_spark.text.analysis import token_entropy
from pharmacodi_spark.text.selection import ilog2_fp_int


def _py_entropy_fp(text: str) -> tuple[int, int, int]:
    toks = [t for t in text.split(" ") if t]
    n = len(toks)
    if n == 0:
        return 0, 0, 0
    c = Counter(toks)
    s = sum(v * ilog2_fp_int(v) for v in c.values())
    return n, len(c), n * ilog2_fp_int(n) - s


def test_token_entropy_matches_python_replay(spark):
    rows = [
        (0, "a b c d e f g h"),            # all-distinct: max entropy
        (1, "a a a a a a a a"),            # degenerate: zero entropy
        (2, "a a b b c c d d"),            # uniform over 4
        (3, "spam spam spam ham"),
        (4, "x"),                          # single token
        (5, "   "),                        # all-separator -> no tokens
        (6, "a b a b a b a b a c"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in token_entropy(df, min_bits_fp=1 << 10).collect()
    }
    assert len(got) == len(rows)
    for doc_id, text in rows:
        n, nd, ent = _py_entropy_fp(text)
        r = got[doc_id]
        assert r["n_tokens"] == n, doc_id
        assert r["n_distinct"] == nd, doc_id
        assert r["entropy_fp"] == ent, doc_id
        # gate: per-token entropy >= 1.0 bits, empty docs always fail
        assert r["keep"] == (n > 0 and ent >= (1 << 10) * n), doc_id


def test_token_entropy_gate_ordering(spark):
    # entropy must rank: all-distinct > mixed > degenerate
    rows = [(0, "a b c d"), (1, "a a b b"), (2, "a a a a")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    ent = {
        r["doc_id"]: r["entropy_fp"] for r in token_entropy(df).collect()
    }
    assert ent[0] > ent[1] > ent[2] == 0
