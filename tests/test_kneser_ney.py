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


def _py_scores3(ref_texts, scored_texts, num=3, den=4):
    """Sequential replay of kneser_ney3_scores: trigram top layer, the
    bigram-KN machinery on the trigram TYPE table as the middle order,
    continuation unigram at the bottom."""

    def toks(t):
        return [x for x in t.split(" ") if x]

    tri: Counter = Counter()
    for t in ref_texts:
        w = toks(t)
        tri.update((w[i], w[i + 1], w[i + 2]) for i in range(len(w) - 2))
    c12: Counter = Counter()
    n1p12: Counter = Counter()
    d2: Counter = Counter()
    for (w1, w2, w3), c in tri.items():
        c12[(w1, w2)] += c
        n1p12[(w1, w2)] += 1
        d2[(w2, w3)] += 1
    cc2: Counter = Counter()
    nn2: Counter = Counter()
    ncont: Counter = Counter()
    for (w2, w3), cc in d2.items():
        cc2[w2] += cc
        nn2[w2] += 1
        ncont[w3] += 1
    t_types = len(d2)
    il = ilog2_fp_int

    def p2(w2, w3):
        if d2.get((w2, w3)):
            return il(den * d2[(w2, w3)] - num) - il(den * cc2[w2]), 1
        if cc2.get(w2):
            return (
                il(num * nn2[w2])
                - il(den * cc2[w2])
                + il(ncont.get(w3, 0) + 1)
                - il(t_types + 1)
            ), 2
        return il(ncont.get(w3, 0) + 1) - il(t_types + 1), 3

    out = {}
    for doc_id, t in scored_texts:
        w = toks(t)
        n = max(len(w) - 2, 0)
        s = bo1 = bo2 = unseen = 0
        for i in range(n):
            w1, w2, w3 = w[i], w[i + 1], w[i + 2]
            if tri.get((w1, w2, w3)):
                s += il(den * tri[(w1, w2, w3)] - num) - il(
                    den * c12[(w1, w2)]
                )
                continue
            mid, kind = p2(w2, w3)
            if c12.get((w1, w2)):
                s += il(num * n1p12[(w1, w2)]) - il(den * c12[(w1, w2)]) + mid
            else:
                s += mid
            bo1 += kind == 1
            bo2 += kind == 2
            unseen += kind == 3
        out[doc_id] = (n, s, bo1, bo2, unseen)
    return out


def test_kn3_matches_python_replay(spark):
    from pharmacodi_spark.text.corpus import kneser_ney3_scores

    ref = [
        "the cat sat on the mat today",
        "the cat sat on the rug today",
        "a dog ran in the park today",
        "the dog sat on a mat now",
        "san francisco is on the bay area",
        "the cat ran in the park now",
    ]
    scored = [
        (0, "the cat sat on the mat today"),   # trigrams all seen
        (1, "the cat sat in the park now"),    # middle-order backoff
        (2, "zebra quark flux the cat sat"),   # unseen contexts
        (3, "x y the cat sat"),                # fully unseen prefix
        (4, "two words"),                      # < 3 tokens: zero row
        (5, "a dog sat on the bay area"),      # mixed orders
    ]
    rdf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(ref)], ["doc_id", "text"]
    )
    sdf = spark.createDataFrame(scored, ["doc_id", "text"])
    got = {
        r["doc_id"]: (
            r["n_trigrams"], r["kn3_fp"], r["n_backoff1"], r["n_backoff2"],
            r["n_unseen"],
        )
        for r in kneser_ney3_scores(rdf, sdf).collect()
    }
    want = _py_scores3(ref, scored)
    assert got == want
    # in-domain text outranks gibberish on mean log-prob
    assert got[0][1] / got[0][0] > got[2][1] / got[2][0]
    assert got[4] == (0, 0, 0, 0, 0)         # sub-trigram doc: zero row
    assert got[1][2] + got[1][3] > 0         # middle-order path exercised
    assert got[2][4] + got[3][4] > 0         # fully-unseen path exercised


def test_kn3_type_counts_drive_middle_order(spark):
    """The one-order-up KN signature: the middle order sees TYPE counts
    of the trigram table — a (w2,w3) pair occurring many times but after
    a single w1 gets less middle-order mass than one backed by many
    distinct left contexts."""
    from pharmacodi_spark.text.corpus import kneser_ney3_scores

    ref = [
        # "golden gate" always after "the" (one left type), 4 occurrences
        "the golden gate x the golden gate y the golden gate z the golden gate",
        # "open door" after 4 DISTINCT left words, 4 occurrences
        "a open door b open door c open door d open door",
    ]
    # unseen (w1, w2) context forces the middle order for both
    scored = [(0, "q r golden gate"), (1, "q r open door")]
    rdf = spark.createDataFrame(
        [(10 + i, t) for i, t in enumerate(ref)], ["doc_id", "text"]
    )
    sdf = spark.createDataFrame(scored, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["kn3_fp"]
        for r in kneser_ney3_scores(rdf, sdf).collect()
    }
    assert got[1] > got[0]
