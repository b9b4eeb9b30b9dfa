"""Unicode/multilingual tokenization (text/analysis.py::unicode_tokens,
VERDICT r8 item 3): CJK/Thai text must not collapse to one "word" per
line, and the Gopher/surprisal gates must stay meaningful on mixed-script
corpora through the tokens_col seam."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_unicode_tokens_no_cjk_collapse(spark):
    from pharmacodi_spark.text.analysis import unicode_tokens

    rows = [
        (0, "深度学习模型"),                      # 6 Han chars
        (1, "日本語のテキスト処理"),               # JP mixed scripts
        (2, "ทดสอบ"),                             # Thai chars
        (3, "plain ascii words"),                  # Latin control
        (4, "mixed 深度 latin 学习 line"),         # interleaved
        (5, "naïve café résumé"),                  # accented Latin
        (6, "한국어 단어 분리"),                   # Hangul IS space-split
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["toks"]
        for r in df.select(
            "doc_id", unicode_tokens("text").alias("toks")
        ).collect()
    }
    assert got[0] == list("深度学习模型")          # char-level fallback
    assert len(got[1]) == 10                        # 10 JP chars
    assert got[2] == list("ทดสอบ")
    assert got[3] == ["plain", "ascii", "words"]
    assert got[4] == ["mixed", "深", "度", "latin", "学", "习", "line"]
    assert got[5] == ["naïve", "café", "résumé"]    # \p{L} keeps accents
    assert got[6] == ["한국어", "단어", "분리"]      # Hangul not exploded


def test_gates_on_mixed_script_fixture(spark):
    # the r8-flagged silent degrade: split-on-space sees ONE token per
    # CJK line, so repetition/surprisal gates are vacuous; through the
    # tokens_col seam they see real token streams again
    from pharmacodi_spark.text.analysis import repetition_metrics, unicode_tokens
    from pharmacodi_spark.text.corpus import unigram_surprisal

    cjk_rep = "深度学习" * 6                        # heavy 4-gram repetition
    rows = [(0, cjk_rep), (1, "独特的字符串没有重复内容在这里"), (2, "a b c a b c a b c a b c")]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "toks", unicode_tokens("text")
    )

    # whitespace tokenization: every CJK doc is 1 token -> n_grams == 0,
    # the gate passes everything (the silent failure)
    ws = {
        r["doc_id"]: (r["n_tokens"], r["keep"])
        for r in repetition_metrics(df).collect()
    }
    assert ws[0][0] == 1 and ws[0][1] is True

    # unicode tokens: the repeated doc now FAILS the dup-gram gate
    uni = {
        r["doc_id"]: (r["n_tokens"], r["keep"])
        for r in repetition_metrics(df, tokens_col="toks").collect()
    }
    assert uni[0][0] == 24 and uni[0][1] is False   # caught
    assert uni[1][1] is True                         # unique text keeps
    assert uni[2][1] is False                        # Latin control works

    # surprisal: whitespace view scores every CJK doc over one giant
    # "token"; the seam restores a per-char unigram LM
    s = {
        r["doc_id"]: r["n_words"]
        for r in unigram_surprisal(df, tokens_col="toks").collect()
    }
    assert s[0] == 24 and s[1] == 15 and s[2] == 12


def test_normalize_spacefree_feeds_existing_detectors(spark):
    # the stage-0 projection that makes the split-on-space operator
    # family CJK-correct without touching the operators
    from pharmacodi_spark.text.analysis import normalize_spacefree

    rows = [
        (0, "深度学习模型"),
        (1, "mixed 深度学习 and latin"),
        (2, "  plain   spaced    text "),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", normalize_spacefree("text").alias("n")
        ).collect()
    }
    assert got[0] == "深 度 学 习 模 型"
    assert got[1] == "mixed 深 度 学 习 and latin"
    assert got[2] == "plain spaced text"      # whitespace collapsed+trimmed


def test_lm_gates_nondegenerate_on_cjk(spark):
    """VERDICT r9 item 4: the KN/backoff/bigram LMs hard-split on space,
    so a CJK line is ONE token — zero transitions, every score row
    silently empty. Through tokens_col= the same corpora produce real
    n-gram streams; the default path stays byte-identical (fixture-oracle
    contract unchanged)."""
    from pharmacodi_spark.text.analysis import unicode_tokens
    from pharmacodi_spark.text.corpus import (
        bigram_surprisal,
        kneser_ney3_scores,
        kneser_ney_scores,
        stupid_backoff_scores,
    )

    rows = [
        (0, "深度学习模型训练深度学习模型评估"),
        (1, "语言模型的数据处理流程语言模型的质量过滤"),
        (2, "plain latin words repeat plain latin words"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "toks", unicode_tokens("text")
    )

    # default split-on-space: each CJK doc is one token -> no transitions
    ws_bi = {r["doc_id"]: r["n_transitions"] for r in bigram_surprisal(df).collect()}
    assert 0 not in ws_bi and 1 not in ws_bi        # no row: <2 tokens
    assert ws_bi[2] == 6

    # seam: real per-char transition streams
    uni_bi = {
        r["doc_id"]: r["n_transitions"]
        for r in bigram_surprisal(df, tokens_col="toks").collect()
    }
    assert uni_bi[0] == 15 and uni_bi[1] == 19 and uni_bi[2] == 6

    sb = {
        r["doc_id"]: (r["n_trigrams"], r["n_backoff2"])
        for r in stupid_backoff_scores(df, df, tokens_col="toks").collect()
    }
    assert sb[0][0] == 14 and sb[1][0] == 18        # trigram stream forms
    # scored against itself every trigram is seen -> no alpha^2 backoff
    assert sb[0][1] == 0

    kn = {
        r["doc_id"]: r["n_bigrams"]
        for r in kneser_ney_scores(df, df, tokens_col="toks").collect()
    }
    assert kn[0] == 15 and kn[1] == 19
    kn3 = {
        r["doc_id"]: r["n_trigrams"]
        for r in kneser_ney3_scores(df, df, tokens_col="toks").collect()
    }
    assert kn3[0] == 14 and kn3[1] == 18

    # default path on the split-friendly doc is unchanged by the seam
    d2 = {r["doc_id"]: r for r in bigram_surprisal(df).collect()}
    u2 = {r["doc_id"]: r for r in bigram_surprisal(df, tokens_col="toks").collect()}
    assert d2[2]["sum_bits"] == u2[2]["sum_bits"]


def test_exactsubstr_nondegenerate_on_cjk(spark):
    """repeated_spans tokenized F.split(content, ' ') — on CJK a line is
    one token so no min_len window ever forms (the ExactSubstr pass finds
    nothing on a corpus full of repeated spans). tokens_col= restores
    char-level windows."""
    from pharmacodi_spark.text.analysis import unicode_tokens
    from pharmacodi_spark.text.dedup import repeated_spans

    shared = "深度学习模型的训练数据去重流程"      # 15 chars, shared span
    rows = [
        (0, shared + "第一份文档的独特尾部内容在此处结束"),
        (1, "另一份文档的开头部分" + shared),
        (2, "完全独特的内容没有任何重复片段存在这里面"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "toks", unicode_tokens("text")
    )

    # default: zero spans (the silent degenerate)
    assert repeated_spans(df, min_len=10).count() == 0

    got = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in repeated_spans(df, min_len=10, tokens_col="toks").collect()
    }
    assert got[0] == (1, 15)                        # span at doc start
    assert got[1] == (11, 25)                       # span after 10-char head
    assert 2 not in got


def test_vocab_trainers_on_cjk(spark):
    """train_vocab/train_bpe/train_unigram_lm collapse to a distinct-WORD
    table first; with whitespace words a CJK corpus yields line-sized
    "words". tokens_col= feeds the trainers real units."""
    from pharmacodi_spark.text.analysis import unicode_tokens
    from pharmacodi_spark.text.tokenizer import train_bpe, train_vocab

    rows = [(i, "深度学习模型训练") for i in range(4)] + [(9, "深度学习")]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "toks", unicode_tokens("text")
    )

    # default: every "word" is the whole line -> pieces are line substrings
    default_pieces = {r["piece"] for r in train_vocab(df, vocab_size=50).collect()}
    assert "深度学习模型训练"[:6] in default_pieces  # 6-char line substring

    # seam: words are single chars -> vocabulary is the char set
    uni = train_vocab(df, vocab_size=50, tokens_col="toks").collect()
    pieces = {r["piece"] for r in uni}
    assert pieces == set("深度学习模型训练")
    cnt = {r["piece"]: r["total"] for r in uni}
    assert cnt["深"] == 5 and cnt["模"] == 4

    # BPE over char-level words: no adjacent pairs inside 1-char symbols
    merges = train_bpe(df, num_merges=5, tokens_col="toks")
    assert merges == []                             # nothing to merge
    merges_ws = train_bpe(df, num_merges=2, tokens_col=None)
    assert len(merges_ws) == 2                      # default still merges
