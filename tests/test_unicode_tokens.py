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
