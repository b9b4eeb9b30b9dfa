"""Text analysis library (north star): tokenization stats, quality scoring,
language-ID scoring, fingerprinting — all native expressions (one codegen
stage per feature set, no UDFs, no shuffle except the explicit aggregations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"],
    "es": ["el", "la", "de", "y", "en", "que", "los", "un", "por", "con"],
    "de": ["der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
}


def token_counts(df: DataFrame, content_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token counting: word tokens, subword-ish units
    (runs of letters/digits/punctuation — a regex approximation of byte-pair
    pretokenization), chars."""
    words = F.split(F.col(content_col), r"\s+")
    subwords = F.regexp_extract_all(
        F.col(content_col), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0
    )
    return df.withColumns(
        {
            "n_words": F.size(words).cast("long"),
            "n_subword_tokens": F.size(subwords).cast("long"),
            "n_chars_obs": F.length(content_col).cast("long"),
        }
    )


def text_features(df: DataFrame, content_col: str = "text") -> DataFrame:
    """Quality-scoring features: length, word stats, punctuation ratio,
    uppercase ratio, digit ratio, mean word length, repetition ratio
    (distinct/total words) — the usual pretraining-corpus filters."""
    words = F.split(F.col(content_col), r"\s+")
    n_words = F.size(words)
    n_chars = F.length(content_col)
    strip = lambda pat: n_chars - F.length(F.regexp_replace(content_col, pat, ""))  # noqa: E731
    return df.withColumns(
        {
            "n_chars_obs": n_chars.cast("long"),
            "n_words": n_words.cast("long"),
            "punct_ratio": strip(r"[^\p{Punct}]") / F.greatest(n_chars, F.lit(1)),
            "digit_ratio": strip(r"[^0-9]") / F.greatest(n_chars, F.lit(1)),
            "upper_ratio": strip(r"[^A-Z]") / F.greatest(n_chars, F.lit(1)),
            "mean_word_len": (n_chars - n_words + 1) / F.greatest(n_words, F.lit(1)),
            "repetition_ratio": F.size(F.array_distinct(words))
            / F.greatest(n_words, F.lit(1)),
        }
    )


def language_scores(
    df: DataFrame,
    content_col: str = "text",
    stopwords: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Language-ID heuristic: per-language stopword hit-rate over tokens +
    argmax prediction. One pass: tokens stay in an array; each language
    score is a filtered array size — no explode, no shuffle."""
    stopwords = stopwords or DEFAULT_STOPWORDS
    words = F.split(F.lower(F.col(content_col)), r"\s+")
    n = F.greatest(F.size(words), F.lit(1))
    out = df
    for lang, sws in stopwords.items():
        sw_arr = F.lit(sws).cast("array<string>")
        hits = F.size(F.filter(words, lambda w: F.array_contains(sw_arr, w)))
        out = out.withColumn(f"score_{lang}", hits / n)
    score_cols = [f"score_{lang}" for lang in stopwords]
    best = F.greatest(*[F.col(c) for c in score_cols])
    pred = None
    for lang in stopwords:
        cond = F.col(f"score_{lang}") == best
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return out.withColumn("pred_lang", F.when(best > 0, pred).otherwise("unknown"))
