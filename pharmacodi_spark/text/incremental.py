"""Incremental dedup (north star): deduplicate a NEW batch against an
already-deduplicated corpus without touching the corpus rows.

The production shape for daily ingest: the corpus keeps compact indices —
content hashes for exact dedup, LSH band buckets for near-dup — and each
incoming batch is (1) self-deduped, (2) anti-joined against the index, (3)
appended, with the index updated from the survivors. Corpus text is never
re-read; the shuffles carry only (hash) or (band, bucket) keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pharmacodi_spark.text.dedup import exact_dedup, minhash_signatures


def content_hashes(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The exact-dedup index: one md5 per surviving document. Store this
    (tiny: 32 bytes/doc) instead of re-hashing the corpus each ingest."""
    return df.select(F.md5(F.col(content_col)).alias("h")).distinct()


def incremental_exact_dedup(
    new: DataFrame,
    seen_hashes: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Survivors of the new batch: self-dedup (min id per content wins),
    then drop anything whose hash is already in the corpus index — one
    within-batch shuffle plus one anti-join keyed on 32-byte hashes."""
    self_deduped = exact_dedup(new, content_col, id_col)
    return self_deduped.join(
        seen_hashes,
        F.md5(F.col(content_col)) == seen_hashes.h,
        "left_anti",
    )


def band_buckets(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_len: int = 5,
) -> DataFrame:
    """The near-dup index: distinct (band, bucket) cells occupied by the
    corpus — the LSH state equivalent of content_hashes. A new doc is a
    near-dup *candidate* iff any of its bands lands in an occupied cell."""
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sig = minhash_signatures(df, content_col, id_col, num_hashes, shingle_len)
    cells = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"h{b * rows + r}") for r in range(rows)]).alias(
                "bucket"
            ),
        )
        for b in range(bands)
    ]
    return (
        sig.select(F.explode(F.array(*cells)).alias("c"))
        .select("c.band", "c.bucket")
        .distinct()
    )


def incremental_near_dup_flags(
    new: DataFrame,
    corpus_buckets: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_len: int = 5,
) -> DataFrame:
    """(id, near_dup_candidate) for the new batch: a doc flags true when any
    of its LSH bands hits an occupied corpus cell. Candidates then go to the
    referee (jaccard) or straight to drop, per pipeline policy — the corpus
    itself is never rescanned."""
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sig = minhash_signatures(new, content_col, id_col, num_hashes, shingle_len)
    cells = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"h{b * rows + r}") for r in range(rows)]).alias(
                "bucket"
            ),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*cells)).alias("c")
    ).select(id_col, "c.band", "c.bucket")
    hits = (
        banded.join(corpus_buckets, ["band", "bucket"], "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("near_dup_candidate", F.lit(True))
    )
    return (
        new.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("near_dup_candidate", F.lit(False)).alias(
                "near_dup_candidate"
            ),
        )
    )
