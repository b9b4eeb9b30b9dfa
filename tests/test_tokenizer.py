"""text/tokenizer.py — greedy real-vocab tokenization.

Three layers of evidence:
- property: trie-walk greedy encoder ≡ brute-force longest-prefix reference
  on random words/vocabs (hypothesis);
- fixtures: hand-computed counts on a small WordPiece-style English vocab,
  including overlap (longest-match) and unk-fallback cases;
- Spark: vocab_token_counts (mapInPandas, memoized) matches a pure-Python
  fold over the same documents, and the injected-encoder seam
  (encode_with_tokenizer) plumbs an arbitrary full-text encoder through
  Arrow batches with the declared schema.
"""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from pharmacodi_spark.text.tokenizer import (
    build_greedy_encoder,
    build_trie,
    encode_with_tokenizer,
    greedy_encode,
    vocab_token_counts,
)


def brute_force_greedy(word: str, vocab: set[str]) -> tuple[int, int]:
    """O(n·max_len) reference: try every prefix length descending."""
    max_len = max((len(p) for p in vocab), default=0)
    pos, tokens, unk = 0, 0, 0
    while pos < len(word):
        step = 0
        for ln in range(min(max_len, len(word) - pos), 0, -1):
            if word[pos : pos + ln] in vocab:
                step = ln
                break
        if step == 0:
            step, unk = 1, unk + 1
        pos += step
        tokens += 1
    return tokens, unk


@settings(max_examples=200, deadline=None)
@given(
    word=st.text(alphabet="abcde", min_size=0, max_size=24),
    vocab=st.sets(
        st.text(alphabet="abcde", min_size=1, max_size=4), min_size=0, max_size=12
    ),
)
def test_greedy_encoder_matches_brute_force(word, vocab):
    trie = build_trie(vocab)
    assert greedy_encode(word, trie) == brute_force_greedy(word, vocab)


WORDPIECE_VOCAB = [
    # full words + overlapping prefixes force real longest-match decisions
    "the", "th", "t", "h", "e", "a", "un", "know", "able", "ing",
    "token", "ize", "izer", "er", "s", "o", "r",
]


def test_fixture_counts_hand_verified():
    enc = build_greedy_encoder(WORDPIECE_VOCAB)
    # "the" -> ["the"]
    assert enc("the") == (1, 0)
    # "there" -> "the" + "r" + "e"  (longest-match takes "the" over "th")
    assert enc("there") == (3, 0)
    # "tokenizer" -> "token" + "izer"  ("izer" beats "ize")
    assert enc("tokenizer") == (2, 0)
    # "unknowable" -> "un" + "know" + "able"
    assert enc("unknowable") == (3, 0)
    # "tokens" -> "token" + "s"
    assert enc("tokens") == (2, 0)
    # "xq" -> two unk chars (x, q not in vocab)
    assert enc("xq") == (2, 2)
    # "thx" -> "th" + unk(x)
    assert enc("thx") == (2, 1)
    assert enc("") == (0, 0)


def test_vocab_token_counts_spark(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = ["a", "e", "o", "r", "s", "t", "th", "the", "row", "join", "table"]
    got = {
        r.doc_id: (r.n_vocab_tokens, r.n_unk)
        for r in vocab_token_counts(docs, vocab).collect()
    }
    enc = build_greedy_encoder(vocab)
    for row in docs.select("doc_id", "text").collect():
        tot = unk = 0
        for w in (row.text or "").split():
            t, u = enc(w)
            tot, unk = tot + t, unk + u
        assert got[row.doc_id] == (tot, unk), row.doc_id
    assert len(got) == docs.count()


def test_injected_encoder_seam(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, None), (4, "a b c")],
        "doc_id long, text string",
    )
    # a "real tokenizer"-shaped injectable: returns a token SEQUENCE
    out = {
        r.doc_id: r.n_tokens
        for r in encode_with_tokenizer(df, lambda s: s.split()).collect()
    }
    assert out == {1: 2, 2: 0, 3: 0, 4: 3}
    # count-returning encoder + custom column name
    out2 = encode_with_tokenizer(
        df, lambda s: len(s), out_col="n_bytes"
    )
    assert out2.columns == ["doc_id", "n_bytes"]
    assert {r.doc_id: r.n_bytes for r in out2.collect()}[1] == 11


def test_memoization_consistency_across_batches(spark):
    # the per-batch memo must be an optimization, not a semantic: repeated
    # words across many partitions yield the same totals as a single batch
    rows = [(i, "alpha beta alpha gamma beta alpha") for i in range(64)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    vocab = ["al", "pha", "bet", "a", "g", "m"]
    res = vocab_token_counts(df, vocab).collect()
    enc = build_greedy_encoder(vocab)
    t, u = 0, 0
    for w in "alpha beta alpha gamma beta alpha".split():
        a, b = enc(w)
        t, u = t + a, u + b
    assert all((r.n_vocab_tokens, r.n_unk) == (t, u) for r in res)
    assert len(res) == 64


def test_train_vocab_counts(spark):
    df = spark.createDataFrame(
        [(1, "ab ab cd"), (2, "ab")], "doc_id long, text string"
    )
    got = {r.piece: r.total for r in
           __import__("pharmacodi_spark.text.tokenizer", fromlist=["train_vocab"])
           .train_vocab(df, vocab_size=100, max_piece_len=2).collect()}
    # "ab" occurs 3x, "cd" 1x; substrings weighted by word occurrences
    assert got == {"a": 3, "b": 3, "ab": 3, "c": 1, "d": 1, "cd": 1}


def test_trained_vocab_closes_the_loop(spark, sf_dir):
    """train_vocab → build_greedy_encoder → vocab_token_counts: growing the
    trained vocabulary must monotonically improve BOTH coverage (fewer
    unknowns) and compression (fewer total tokens) on the training corpus —
    the property that makes corpus-trained budgets usable without an
    external vocab."""
    from pharmacodi_spark.text.tokenizer import train_vocab, vocab_token_counts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def stats(k):
        pieces = [r.piece for r in train_vocab(docs, vocab_size=k).collect()]
        c = vocab_token_counts(docs, pieces)
        return (
            c.agg({"n_unk": "sum"}).first()[0],
            c.agg({"n_vocab_tokens": "sum"}).first()[0],
        )

    unk60, tot60 = stats(60)
    unk200, tot200 = stats(200)
    assert tot60 > 0 and unk60 / tot60 < 0.05  # small-vocab coverage already high
    assert unk200 == 0  # 200 pieces cover every character of this corpus
    assert tot200 < tot60  # larger pieces ⇒ better compression


def test_byte_fallback_pricing():
    from pharmacodi_spark.text.tokenizer import build_trie, greedy_encode

    trie = build_trie(["ab"])
    # default: one unk per unmatched CHARACTER
    assert greedy_encode("abé", trie) == (2, 1)
    # byte fallback: é is 2 UTF-8 bytes → 2 tokens; CJK is 3
    assert greedy_encode("abé", trie, byte_fallback=True) == (3, 2)
    assert greedy_encode("中", trie, byte_fallback=True) == (3, 3)
    # pure-ASCII behavior is identical under both modes
    assert greedy_encode("abxy", trie, byte_fallback=True) == greedy_encode(
        "abxy", trie
    )
