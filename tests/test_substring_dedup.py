"""ExactSubstr-style substring dedup (text/dedup.py::repeated_spans /
trim_repeated_spans): span semantics on a hand-crafted corpus, the
remove-all trim policy, and content-defined sampling containment."""

from __future__ import annotations


def _mk(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


SHARED = " ".join(f"s{i}" for i in range(10))       # 10-token shared run
UNIQ1 = " ".join(f"a{i}" for i in range(6))
UNIQ2 = " ".join(f"b{i}" for i in range(6))
UNIQ3 = " ".join(f"c{i}" for i in range(6))
REP8 = " ".join(f"r{i}" for i in range(8))          # 8-token internal repeat

DOCS = [
    (1, f"{UNIQ1} {SHARED} {UNIQ2}"),               # shared with doc 2
    (2, f"{SHARED} {UNIQ3} extra tail words here"),
    (3, f"{REP8} mid1 mid2 mid3 {REP8}"),           # same-doc repeat
    (4, "totally unique words nothing repeated in this document at all"),
]


def test_repeated_spans_semantics(spark):
    from pharmacodi_spark.text.dedup import repeated_spans

    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in repeated_spans(_mk(spark, DOCS), min_len=8).collect()
    }
    # doc 1: shared run occupies tokens 7..16; windows 7..9 are duplicated
    # (each 8-window fully inside the run), merged span = [7, 16]
    assert (1, 7, 16) in spans
    # doc 2: shared run at tokens 1..10 → span [1, 10]
    assert (2, 1, 10) in spans
    # doc 3: REP8 at 1..8 and 12..19 — both occurrences of the same window
    # hash → two spans (gap 3 tokens > 0, not merged)
    assert (3, 1, 8) in spans and (3, 12, 19) in spans
    # doc 4: clean
    assert not any(d == 4 for d, _, _ in spans)
    assert len(spans) == 4


def test_trim_removes_all_occurrences(spark):
    from pharmacodi_spark.text.dedup import repeated_spans, trim_repeated_spans

    df = _mk(spark, DOCS)
    spans = repeated_spans(df, min_len=8)
    out = {
        r.doc_id: (r.clean_text, r.n_removed_tokens)
        for r in trim_repeated_spans(df, spans).collect()
    }
    # doc 1 loses the 10 shared tokens, keeps its unique prefix/suffix
    assert out[1] == (f"{UNIQ1} {UNIQ2}", 10)
    assert out[2] == (f"{UNIQ3} extra tail words here", 10)
    # doc 3 loses BOTH copies (remove-all policy)
    assert out[3] == ("mid1 mid2 mid3", 16)
    # doc 4 untouched
    assert out[4] == (DOCS[3][1], 0)


def test_sample_mod_spans_are_contained(spark):
    """Content-defined sampling (hash % mod == 0) may miss short spans but
    every span it does report must be contained in a full-detection span —
    both copies of a duplicate select the same windows."""
    from pharmacodi_spark.text.dedup import repeated_spans

    docs = _mk(spark, DOCS)
    full = [
        (r.doc_id, r.span_start, r.span_end)
        for r in repeated_spans(docs, min_len=8).collect()
    ]
    sampled = [
        (r.doc_id, r.span_start, r.span_end)
        for r in repeated_spans(docs, min_len=8, sample_mod=2).collect()
    ]
    for d, s, e in sampled:
        assert any(
            fd == d and fs <= s and e <= fe for fd, fs, fe in full
        ), (d, s, e, full)


def test_exact_verify_referee_kills_hash_collisions(spark):
    # adversarial collision (VERDICT r8 item 4): two DISTINCT 8-token
    # windows are forced onto the SAME hash via an injected
    # deliberately-degenerate hash_fn (constant). Without the exact
    # byte-compare referee every window is "duplicated"; with it
    # (default) only text that truly occurs twice is flagged.
    from pyspark.sql import functions as F

    from pharmacodi_spark.text.dedup import repeated_spans

    dup = " ".join(f"d{i}" for i in range(8))
    docs = [
        (0, dup + " " + " ".join(f"u{i}" for i in range(8))),
        (1, dup + " " + " ".join(f"v{i}" for i in range(8))),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    collide = lambda t: F.lit(7).cast("long")  # every window same hash

    # the referee keeps only the true duplicate (the shared 8-token
    # prefix), even though every window hash-collides
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in repeated_spans(
            df, min_len=8, hash_fn=collide, exact_verify=True
        ).collect()
    )
    assert got == [(0, 1, 8), (1, 1, 8)]

    # sanity: without the referee the collision false-positives the
    # whole document (this is the failure mode the referee closes)
    loose = repeated_spans(
        df, min_len=8, hash_fn=collide, exact_verify=False
    )
    assert {r["span_end"] for r in loose.collect()} == {16}

    # and with the real hash, exact_verify changes nothing on a
    # collision-free corpus (the oracle-parity guarantee)
    a = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in repeated_spans(df, min_len=8).collect()
    )
    b = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in repeated_spans(df, min_len=8, exact_verify=False).collect()
    )
    assert a == b == [(0, 1, 8), (1, 1, 8)]
