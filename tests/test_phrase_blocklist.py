"""phrase_blocklist_hits (text/cleaning.py): replace-diff counting
semantics — non-overlapping, left-to-right, multi-phrase totals — and the
Aho–Corasick variant's exact parity with them, small and 10k-phrase."""

from __future__ import annotations

from pharmacodi_spark.text.cleaning import (
    build_aho_corasick,
    phrase_blocklist_hits,
    phrase_blocklist_hits_ac,
)


def test_counts_and_gate(spark):
    rows = [
        (0, "clean document with nothing to flag"),
        (1, "as an AI language model I cannot"),
        (2, "as an AI language model ... as an AI language model"),
        (3, "aaaa"),  # "aa" occurs twice non-overlapping
        (4, "mixed: as an AI language model and lorem ipsum here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in phrase_blocklist_hits(
            df, ["as an AI language model", "lorem ipsum", "aa"]
        ).collect()
    }
    assert got[0]["n_hits"] == 0 and got[0]["keep"]
    assert got[1]["n_hits"] == 1 and not got[1]["keep"]
    assert got[2]["n_hits"] == 2 and got[2]["n_phrases_hit"] == 1
    assert got[3]["n_hits"] == 2  # non-overlapping count in "aaaa"
    assert got[4]["n_hits"] == 2 and got[4]["n_phrases_hit"] == 2
    assert not got[4]["keep"]


def _rows_by_id(df):
    return {r["doc_id"]: (r["n_hits"], r["n_phrases_hit"], r["keep"])
            for r in df.collect()}


def test_ac_parity_with_replace_diff(spark):
    """The automaton form must be verdict- AND count-identical to the
    replace-diff form, including nested/overlapping phrase sets where the
    fail-chain outputs matter ("aa" inside "aaa", shared prefixes/suffixes)."""
    rows = [
        (0, "clean document with nothing to flag"),
        (1, "as an AI language model I cannot"),
        (2, "as an AI language model ... as an AI language model"),
        (3, "aaaaa"),
        (4, "mixed: as an AI language model and lorem ipsum here"),
        (5, "ababab xyx yxyx"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for phrases in (
        ["as an AI language model", "lorem ipsum", "aa"],
        ["aa", "aaa", "aaaa"],          # nested — fail-chain outputs
        ["ab", "bab", "abab"],          # shared overlaps
        ["xyx", "yxy"],                 # interleaved
    ):
        want = _rows_by_id(phrase_blocklist_hits(df, phrases))
        got = _rows_by_id(phrase_blocklist_hits_ac(df, phrases))
        assert got == want, (phrases, got, want)


def test_ac_parity_on_documents_fixture(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    phrases = ["table part", "fast merge", "lorem ipsum dolor", "the"]
    want = _rows_by_id(phrase_blocklist_hits(docs, phrases))
    got = _rows_by_id(phrase_blocklist_hits_ac(docs, phrases))
    assert got == want and any(not k for _, _, k in got.values())


def test_ac_10k_phrase_list(spark):
    """The scale case the replace-diff form can't express: 10^4 phrases in
    ONE automaton pass. Hit counts cross-checked against str.count."""
    phrases = [f"tok{i:05d} tok{i + 1:05d}" for i in range(10_000)]
    texts = [
        (0, "tok00000 tok00001 tok00002 filler tok09998 tok09999"),
        (1, "tok04242 tok04243 " * 3),
        (2, "no hits at all"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = _rows_by_id(phrase_blocklist_hits_ac(df, phrases))
    for doc_id, text in texts:
        n = sum(text.count(p) for p in phrases)  # non-overlap == count here
        d = sum(1 for p in phrases if p in text)
        assert got[doc_id] == (n, d, n == 0), (doc_id, got[doc_id], n, d)


def test_automaton_structure():
    goto, fail, out = build_aho_corasick(["he", "she", "his", "hers"])
    # classic AC example: "ushers" yields she@3, he@3(fail chain), hers@5
    s = 0
    hits = []
    text = "ushers"
    for i, ch in enumerate(text):
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        hits.extend((i, idx) for idx in out[s])
    assert sorted(hits) == [(3, 0), (3, 1), (5, 3)]
