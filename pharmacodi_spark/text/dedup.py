"""Document deduplication library (north star): exact, MinHash-LSH, SimHash.

These are the reusable, parameterized versions of the oracle-checked plans in
plans/extensions.py — same algorithms, arbitrary column names / parameters.
All hashing stays JVM-side (md5/xxhash64 expressions); no Python UDFs.

At 100 TB: every op here shuffles only (id, fixed-width hash) tuples, never
document bodies; pair generation is bucket-local (LSH) so the only quadratic
term is within-bucket size, bounded by banding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row per exact content duplicate (min id wins). Returns the
    surviving rows. Grouping key is the md5 of the content — the shuffle
    carries 32-byte hashes, not bodies."""
    w = Window.partitionBy(F.md5(F.col(content_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _shingle_col(content_col: str, n: int) -> Column:
    toks = F.split(F.col(content_col), r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))


def minhash_signatures(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_len: int = 5,
) -> DataFrame:
    """(id, h0..h{k-1}) MinHash signature over word shingles.

    Hash families: xxhash64(seed, shingle) — Spark's fastest 64-bit hash
    (the oracle-checked plans use md5 slices instead purely for DuckDB
    parity). One explode + one groupBy; shuffle rows are (id, k longs)."""
    shingled = df.select(
        F.col(id_col), F.explode(_shingle_col(content_col, shingle_len)).alias("sh")
    )
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return shingled.groupBy(id_col).agg(*aggs)


def minhash_near_dup_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_len: int = 5,
) -> DataFrame:
    """LSH candidate near-dup pairs (doc_a < doc_b): band the signature,
    bucket by (band, hash of the band's rows), expand ordered pairs within
    each bucket array — no self-join, one signature computation, one
    shuffle (see plans/extensions.py::minhash_band_pairs for the physical
    rationale)."""
    assert num_hashes % bands == 0, "num_hashes must divide into bands"
    sig = minhash_signatures(df, content_col, id_col, num_hashes, shingle_len)
    return pairs_from_cells(band_cells(sig, id_col, num_hashes, bands), id_col)


def band_cells(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(id, band, bucket) LSH cells from a signature frame — the SHARED
    derivation behind pair generation (within-corpus dedup) and band-bucket
    indices/flags (incremental ingest). Callers that need both (e.g.
    pipelines/ingest.py) compute the signature once, ``localCheckpoint``
    these cells, and fan out — instead of re-running the shingle+hash
    subplan per consumer."""
    assert num_hashes % bands == 0, "num_hashes must divide into bands"
    rows_per_band = num_hashes // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("b")
    ).select(id_col, "b.band", "b.bucket")


def pairs_from_cells(cells: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Candidate pairs (doc_a < doc_b) from (id, band, bucket) cells:
    group into buckets, expand ordered pairs WITHIN each bucket array — no
    self-join; bucket size is the only quadratic term."""
    buckets = (
        cells.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list(id_col)).alias("members"))
        .where(F.size("members") > 1)
    )
    ms = F.col("members")
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    ms,
                    lambda x, i: F.transform(
                        F.slice(ms, i + 2, F.size(ms)),
                        lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.doc_a", "p.doc_b").distinct()


def simhash(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """SimHash fingerprint: per token, xxhash64; per bit, sum(±1) over
    tokens; fingerprint bit j = sign of the sum. Near-dups then differ in
    few bits (Hamming distance via ``bit_count(a ^ b)``).

    Expressed as one explode + one groupBy with ``bits`` conditional sums —
    all codegen'd; shuffle rows are (id, bits ints)."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(content_col), r"\s+")).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    # 1<<j as a Python literal overflows signed-long at j=63; shiftleft on a
    # long yields the correct mask (bit 63 → Long.MIN_VALUE, still a valid
    # single-bit mask for bitwiseAND / bitwiseOR).
    masks = [F.shiftleft(F.lit(1).cast("long"), j) for j in range(bits)]
    bit_sums = [
        F.sum(F.when(F.col("h").bitwiseAND(masks[j]) != 0, 1).otherwise(-1)).alias(
            f"b{j}"
        )
        for j in range(bits)
    ]
    sums = toks.groupBy(id_col).agg(*bit_sums)
    fingerprint = None
    for j in range(bits):
        bit = F.when(F.col(f"b{j}") > 0, masks[j]).otherwise(F.lit(0).cast("long"))
        fingerprint = bit if fingerprint is None else fingerprint.bitwiseOR(bit)
    return sums.select(F.col(id_col), fingerprint.alias("simhash"))


def simhash_near_pairs(
    sim: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    prefix_bits: int = 16,
    bits: int = 64,
) -> DataFrame:
    """Candidate pairs from SimHash fingerprints: bucket by the top
    ``prefix_bits`` (near-dups usually share the prefix), then exact Hamming
    filter with bit_count(xor) within buckets.

    ``bits`` must match the fingerprint width used in :func:`simhash` — the
    bucket is the top ``prefix_bits`` of that width; a mismatched width
    silently degrades bucketing (everything lands in bucket 0)."""
    assert 0 < prefix_bits < bits, "prefix_bits must be in (0, bits)"
    bucketed = sim.withColumn(
        "bucket", F.shiftrightunsigned(F.col("simhash"), bits - prefix_bits)
    )
    buckets = (
        bucketed.groupBy("bucket")
        .agg(F.array_sort(F.collect_list(F.struct(id_col, "simhash"))).alias("m"))
        .where(F.size("m") > 1)
    )
    ms = F.col("m")
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    ms,
                    lambda x, i: F.transform(
                        F.slice(ms, i + 2, F.size(ms)),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select(
        F.col(f"p.a.{id_col}").alias("doc_a"),
        F.col(f"p.b.{id_col}").alias("doc_b"),
        F.bit_count(F.col("p.a.simhash").bitwiseXOR(F.col("p.b.simhash"))).alias(
            "hamming"
        ),
    ).where(F.col("hamming") <= max_hamming)
