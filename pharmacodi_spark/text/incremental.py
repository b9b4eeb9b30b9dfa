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

from pharmacodi_spark.text.dedup import (
    band_cells,
    exact_dedup,
    minhash_signatures,
)


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
    sig = minhash_signatures(df, content_col, id_col, num_hashes, shingle_len)
    return (
        band_cells(sig, id_col, num_hashes, bands)
        .select("band", "bucket")
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
    cells: DataFrame | None = None,
) -> DataFrame:
    """(id, near_dup_candidate) for the new batch: a doc flags true when any
    of its LSH bands hits an occupied corpus cell. Candidates then go to the
    referee (jaccard) or straight to drop, per pipeline policy — the corpus
    itself is never rescanned. Pass precomputed ``cells`` (band_cells
    output for exactly the rows of ``new``) to skip re-running the
    shingle+hash subplan when the caller already has them (the
    signature-reuse path pipelines/ingest.py takes)."""
    if cells is None:
        sig = minhash_signatures(new, content_col, id_col, num_hashes, shingle_len)
        cells = band_cells(sig, id_col, num_hashes, bands)
    hits = (
        cells.join(corpus_buckets, ["band", "bucket"], "left_semi")
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


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Snapshot diff between two corpus versions: per id, ``added`` (new
    only), ``removed`` (old only), ``changed`` (both, content hash
    differs), or ``unchanged`` — the crawl-over-crawl changelog that
    decides what an incremental pipeline actually has to reprocess (feed
    ``added`` ∪ ``changed`` to the ingest gauntlet; retire ``removed``
    ids from the index sidecars).

    Scale shape: both sides collapse to ``(id, 32-byte hash)`` in their
    scan projections; ONE id-keyed full-outer join (fact⋈fact —
    SMJ/shuffled-hash is the correct physical shape; neither snapshot
    broadcasts at corpus scale) and bodies never shuffle.
    """
    o = old.select(F.col(id_col), F.md5(F.col(content_col)).alias("__ho"))
    n = new.select(F.col(id_col), F.md5(F.col(content_col)).alias("__hn"))
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("__ho").isNull(), "added")
        .when(F.col("__hn").isNull(), "removed")
        .when(F.col("__ho") == F.col("__hn"), "unchanged")
        .otherwise("changed")
    )
    return j.select(F.col(id_col), status.alias("status"))
