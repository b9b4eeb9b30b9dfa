"""stupid_backoff_scores (text/corpus.py): pure-Python replay of the
three-level backoff chain and its fixed-point arithmetic."""

from __future__ import annotations

from collections import Counter

from pharmacodi_spark.text.corpus import stupid_backoff_scores
from pharmacodi_spark.text.selection import ilog2_fp_int

A = -1354


def _py_scores(ref_texts, scored_texts):
    def toks(t):
        return [x for x in t.split(" ") if x]

    uni: Counter = Counter()
    bi: Counter = Counter()
    tri: Counter = Counter()
    for t in ref_texts:
        w = toks(t)
        uni.update(w)
        bi.update(" ".join(w[i : i + 2]) for i in range(len(w) - 1))
        tri.update(" ".join(w[i : i + 3]) for i in range(len(w) - 2))
    n_total = sum(uni.values())
    out = {}
    for doc_id, t in scored_texts:
        w = toks(t)
        n = max(len(w) - 2, 0)
        s = bo1 = bo2 = 0
        for i in range(n):
            t3 = " ".join(w[i : i + 3])
            ctx = " ".join(w[i : i + 2])
            suf = " ".join(w[i + 1 : i + 3])
            if tri.get(t3):
                s += ilog2_fp_int(tri[t3]) - ilog2_fp_int(bi[ctx])
            elif bi.get(suf):
                s += A + ilog2_fp_int(bi[suf]) - ilog2_fp_int(uni[w[i + 1]])
                bo1 += 1
            else:
                s += (
                    2 * A
                    + ilog2_fp_int(uni.get(w[i + 2], 0) + 1)
                    - ilog2_fp_int(n_total)
                )
                bo2 += 1
        out[doc_id] = (n, s, bo1, bo2)
    return out


def test_backoff_matches_python_replay(spark):
    ref = [
        "the cat sat on the mat",
        "the cat sat on the rug",
        "a dog ran in the park",
        "the dog sat on a mat",
    ]
    scored = [
        (0, "the cat sat on the mat"),     # all trigrams seen
        (1, "the cat ran in the park"),    # partial backoff
        (2, "zebra quark flux the cat"),   # unseen words -> alpha^2 floor
        (3, "too short"),                  # < 3 tokens: zero row
    ]
    rdf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(ref)], ["doc_id", "text"]
    )
    sdf = spark.createDataFrame(scored, ["doc_id", "text"])
    got = {
        r["doc_id"]: (
            r["n_trigrams"], r["sb_fp"], r["n_backoff1"], r["n_backoff2"]
        )
        for r in stupid_backoff_scores(rdf, sdf, alpha_fp=A).collect()
    }
    want = _py_scores(ref, scored)
    assert got == want
    # sanity on the gate's ordering: in-domain scores above gibberish
    assert got[0][1] / got[0][0] > got[2][1] / got[2][0]
    # the doc with unseen words actually exercised the alpha^2 floor
    assert got[2][3] > 0
    assert got[3] == (0, 0, 0, 0)
