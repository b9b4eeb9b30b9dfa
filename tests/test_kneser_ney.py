"""kneser_ney_scores (text/corpus.py): pure-Python replay of the
discount → continuation-backoff chain and its integer fixed point."""

from __future__ import annotations

from collections import Counter

from pharmacodi_spark.text.corpus import kneser_ney_scores
from pharmacodi_spark.text.selection import ilog2_fp_int


def _py_scores(ref_texts, scored_texts, num=3, den=4):
    def toks(t):
        return [x for x in t.split(" ") if x]

    bi: Counter = Counter()
    for t in ref_texts:
        w = toks(t)
        bi.update((w[i], w[i + 1]) for i in range(len(w) - 1))
    c1: Counter = Counter()
    n1p: Counter = Counter()
    ncont: Counter = Counter()
    for (w1, w2), c in bi.items():
        c1[w1] += c
        n1p[w1] += 1
        ncont[w2] += 1
    t_types = len(bi)
    il = ilog2_fp_int
    out = {}
    for doc_id, t in scored_texts:
        w = toks(t)
        n = max(len(w) - 1, 0)
        s = bo = unseen = 0
        for i in range(n):
            w1, w2 = w[i], w[i + 1]
            if bi.get((w1, w2)):
                s += il(den * bi[(w1, w2)] - num) - il(den * c1[w1])
            elif c1.get(w1):
                s += (
                    il(num * n1p[w1])
                    - il(den * c1[w1])
                    + il(ncont.get(w2, 0) + 1)
                    - il(t_types + 1)
                )
                bo += 1
            else:
                s += il(ncont.get(w2, 0) + 1) - il(t_types + 1)
                unseen += 1
        out[doc_id] = (n, s, bo, unseen)
    return out


def test_kn_matches_python_replay(spark):
    ref = [
        "the cat sat on the mat",
        "the cat sat on the rug",
        "a dog ran in the park",
        "the dog sat on a mat",
        "san francisco is on the bay",
    ]
    scored = [
        (0, "the cat sat on the mat"),      # all bigrams seen
        (1, "the cat ran in the park"),     # partial backoff
        (2, "zebra quark flux the cat"),    # unseen contexts
        (3, "francisco the"),               # continuation-count case
        (4, "solo"),                        # < 2 tokens: zero row
    ]
    rdf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(ref)], ["doc_id", "text"]
    )
    sdf = spark.createDataFrame(scored, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_bigrams"], r["kn_fp"], r["n_backoff"], r["n_unseen_ctx"])
        for r in kneser_ney_scores(rdf, sdf).collect()
    }
    want = _py_scores(ref, scored)
    assert got == want
    # in-domain text scores above gibberish (mean log-prob)
    assert got[0][1] / got[0][0] > got[2][1] / got[2][0]
    assert got[2][3] > 0            # unseen-context path exercised
    assert got[1][2] > 0            # backoff path exercised
    assert got[4] == (0, 0, 0, 0)   # sub-bigram doc: zero row


def test_kn_continuation_beats_raw_frequency(spark):
    """The KN signature: a frequent-but-context-bound word ("francisco",
    always after "san") gets LESS backoff mass than a versatile word seen
    the same number of times in fewer distinct repeats."""
    ref = [
        "san francisco san francisco san francisco san francisco",
        "a walk b walk c walk d walk",
    ]
    # both "francisco" and "walk" occur 4x; "francisco" follows only
    # "san" (ncont=1), "walk" follows 4 distinct words (ncont=4)
    scored = [(0, "x francisco"), (1, "x walk")]
    rdf = spark.createDataFrame(
        [(10 + i, t) for i, t in enumerate(ref)], ["doc_id", "text"]
    )
    sdf = spark.createDataFrame(scored, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["kn_fp"] for r in kneser_ney_scores(rdf, sdf).collect()
    }
    assert got[1] > got[0]  # versatile word gets more continuation mass
