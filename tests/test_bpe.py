"""True merge-based BPE training (VERDICT r5 item 4): the Spark trainer must
reproduce an INDEPENDENT pure-Python sequential-BPE reference exactly at
max_batch=1, reproduce the batched variant exactly at max_batch>1, and its
vocabulary must compress the corpus at least as well as the substring-
frequency vocab (train_vocab) at equal vocab size."""

from __future__ import annotations

import pytest

from collections import Counter


# --- independent Python reference (no imports from the module under test) ---

def _apply(syms, merge_map):
    """One left-to-right pass applying a chain-free merge batch."""
    out = []
    for x in syms:
        if out and (out[-1], x) in merge_map:
            out[-1] = merge_map[(out[-1], x)]
        else:
            out.append(x)
    return out


def _py_word_counts(texts, max_word_len):
    wc = Counter()
    for t in texts:
        for w in t.split():
            if w:
                wc[w[:max_word_len]] += 1
    return {tuple(w): c for w, c in wc.items()}


def py_bpe(texts, num_merges, max_batch=1, max_word_len=64):
    """Reference trainer: per round, rank pairs by (count DESC, l, r), keep
    the top 4*max_batch, greedily accept up to `remaining` candidates whose
    {l, r, l+r} strings don't intersect anything an earlier acceptance
    touched, apply them all in one left-to-right pass. max_batch=1 is
    exactly sequential Sennrich BPE."""
    words = _py_word_counts(texts, max_word_len)
    merges = []
    while len(merges) < num_merges:
        pc = Counter()
        for syms, c in words.items():
            for p in zip(syms, syms[1:]):
                pc[p] += c
        if not pc:
            break
        ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        ranked = ranked[: 4 * max_batch]
        touched, batch = set(), []
        for (l, r), c in ranked:
            if len(batch) >= min(max_batch, num_merges - len(merges)):
                break
            strs = {l, r, l + r}
            if strs & touched:
                continue
            touched |= strs
            batch.append((l, r, c))
        if not batch:
            break
        merges.extend(batch)
        mm = {(l, r): l + r for l, r, _ in batch}
        rebuilt = {}
        for syms, c in words.items():
            ns = tuple(_apply(list(syms), mm))
            rebuilt[ns] = rebuilt.get(ns, 0) + c
        words = rebuilt
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide wide wider",
    "the cat sat on the mat the cat",
    "ab ab ab abc abc abcd",
]


def test_sequential_bpe_matches_python_reference(spark):
    from pharmacodi_spark.text.tokenizer import train_bpe

    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    got = train_bpe(df, num_merges=12, max_batch=1)
    want = py_bpe(TEXTS, num_merges=12, max_batch=1)
    assert got == want


def test_batched_bpe_matches_python_reference(spark):
    from pharmacodi_spark.text.tokenizer import train_bpe

    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    got = train_bpe(df, num_merges=20, max_batch=6)
    want = py_bpe(TEXTS, num_merges=20, max_batch=6)
    assert got == want


def test_select_nonconflicting_contract():
    from pharmacodi_spark.text.tokenizer import select_nonconflicting

    cands = [
        ("t", "h", 100),   # takes {t, h, th}
        ("h", "e", 90),    # rejected: h touched
        ("a", "b", 80),    # takes {a, b, ab}
        ("ab", "c", 70),   # rejected: ab is a produced symbol
        ("x", "y", 60),    # takes
    ]
    assert select_nonconflicting(cands, 10) == [
        ("t", "h", 100), ("a", "b", 80), ("x", "y", 60)
    ]
    assert select_nonconflicting(cands, 1) == [("t", "h", 100)]


@pytest.mark.slow
def test_bpe_compresses_at_least_as_well_as_substring_vocab(spark):
    """The verdict's acceptance bar: at equal vocab size, BPE-merge pieces
    encode the corpus in <= the tokens of the substring-frequency vocab."""
    from pharmacodi_spark.text.tokenizer import (
        bpe_vocab, train_bpe, train_vocab, vocab_token_counts,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # sf0.001 has ~31 distinct words, so BPE SATURATES (every word collapses
    # to one symbol, no pairs left) before 150 merges — the trainer must
    # stop cleanly there rather than loop forever.
    merges = train_bpe(docs, num_merges=150, max_batch=16)
    assert 31 <= len(merges) < 150
    base = sorted(
        {ch for m in merges for s in (m[0], m[1]) for ch in s}
    )
    bpe_pieces = bpe_vocab(merges, base_chars=base)
    sub_pieces = [
        r["piece"]
        for r in train_vocab(docs, vocab_size=len(bpe_pieces)).collect()
    ]
    assert len(sub_pieces) == len(bpe_pieces)

    def total_tokens(pieces):
        out = vocab_token_counts(docs, pieces)
        return out.agg({"n_vocab_tokens": "sum"}).first()[0]

    t_bpe = total_tokens(bpe_pieces)
    t_sub = total_tokens(sub_pieces)
    assert t_bpe <= t_sub, f"BPE {t_bpe} tokens vs substring {t_sub}"


@pytest.mark.slow
def test_encode_token_ids_e2e_with_bpe_vocab(spark):
    """The full training-prep chain: train BPE on the corpus, build the
    vocab, encode to id arrays, and feed the counts into pack_sequences —
    with the ids validated against a pure-Python greedy replay."""
    from pyspark.sql import functions as F

    from pharmacodi_spark.text.packing import pack_sequences
    from pharmacodi_spark.text.tokenizer import (
        bpe_vocab, encode_token_ids, train_bpe, vocab_token_counts,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = train_bpe(docs, num_merges=60, max_batch=8)
    base = sorted({ch for m in merges for s in (m[0], m[1]) for ch in s})
    vocab = bpe_vocab(merges, base_chars=base)

    enc = encode_token_ids(docs, vocab)
    cnt = vocab_token_counts(docs, vocab)
    joined = enc.join(cnt, "doc_id").select(
        "doc_id",
        F.size("token_ids").alias("n_ids"),
        (F.col("n_vocab_tokens")).alias("n_total"),
        F.size(F.filter("token_ids", lambda i: i == -1)).alias("n_unk_ids"),
        "n_unk",
    )
    for r in joined.collect():
        # id stream length == total token count; unk ids == unk count
        assert r.n_ids == r.n_total, r
        assert r.n_unk_ids == r.n_unk, r

    # pure-Python greedy replay on a sample of docs
    sample = docs.limit(5).collect()
    ids_by_doc = {
        r.doc_id: r.token_ids
        for r in enc.join(
            docs.limit(5).select("doc_id"), "doc_id", "left_semi"
        ).collect()
    }
    piece_id = {p: i for i, p in enumerate(vocab)}
    pieces_sorted = sorted(vocab, key=len, reverse=True)

    def py_encode(text):
        out = []
        for w in text.split():
            pos = 0
            while pos < len(w):
                m = next(
                    (p for p in pieces_sorted if w.startswith(p, pos)), None
                )
                if m:
                    out.append(piece_id[m])
                    pos += len(m)
                else:
                    out.append(-1)
                    pos += 1
        return out

    for r in sample:
        assert ids_by_doc[r.doc_id] == py_encode(r.text), r.doc_id

    # ids feed straight into sequence packing
    counted = enc.select("doc_id", F.size("token_ids").alias("n_tokens"))
    packed = pack_sequences(counted, seq_len=64)
    total = counted.agg(F.sum("n_tokens")).first()[0]
    last = packed.orderBy(F.col("token_start").desc()).first()
    assert last.token_start + last.n_tokens == total


def test_decode_token_ids_round_trip(spark):
    """decode(encode(text)) reconstructs the text modulo word boundaries:
    concat(pieces) == text without spaces when the vocab covers every
    character; unknown ids decode to the unk marker."""
    from pyspark.sql import functions as F

    from pharmacodi_spark.text.tokenizer import decode_token_ids, encode_token_ids

    vocab = ["ab", "a", "b", "c", "cc"]
    df = spark.createDataFrame(
        [(1, "ab c abab"), (2, "ccc ab"), (3, "abq")],  # q not in vocab
        "doc_id long, text string",
    )
    enc = encode_token_ids(df, vocab)
    dec = decode_token_ids(enc, vocab)
    out = {
        r.doc_id: (list(r.token_ids), list(r.pieces))
        for r in dec.collect()
    }
    for i, text in [(1, "ab c abab"), (2, "ccc ab")]:
        assert "".join(out[i][1]) == text.replace(" ", "")
    assert out[3][1][-1] == "<unk>" and -1 in out[3][0]
    # decoding is a pure literal transform — no shuffle, no Python
    plan = decode_token_ids(enc, vocab)._jdf.queryExecution().optimizedPlan().toString()
    assert "Exchange" not in plan
