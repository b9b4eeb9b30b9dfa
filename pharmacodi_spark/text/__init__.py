from pharmacodi_spark.text.dedup import exact_dedup, minhash_signatures, minhash_near_dup_pairs, simhash
from pharmacodi_spark.text.similarity import cosine_topk, lsh_bucket_topk
from pharmacodi_spark.text.analysis import text_features, language_scores, token_counts

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_near_dup_pairs",
    "simhash",
    "cosine_topk",
    "lsh_bucket_topk",
    "text_features",
    "language_scores",
    "token_counts",
]
