"""Streaming curation twin (VERDICT r5 item 9): the curation gates run
incrementally under Structured Streaming, reusing the ingest pipeline's
state-dir machinery, with a BATCH twin the stream provably equals.

Production shape: quality models and decontamination indices are FROZEN
sidecars (you don't retrain the LM per micro-batch), so curation splits
into two phases:

- **prepare** (batch, once per corpus refresh): persist the unigram LM
  ``(token, c)`` and the eval-slice 13-gram hash index under ``base_dir``;
- **stream** (``foreachBatch``): each micro-batch applies, in order,
  (1) the Gopher repetition gate (pointwise), (2) the surprisal gate
  against the frozen LM, (3) 13-gram decontamination against the frozen
  eval index, (4) FIRST-OWNER passage dedup against the persisted
  passage-owner index (text/dedup.py::passage_first_owner_stats — the
  prefix-consistent semantics), (5) exact dedup (min-id keeper within
  batch + anti-join of the persisted content-hash index), then upserts
  survivors and extends the owner/hash indices. Index rows carry the
  ``batch_id`` that wrote them; reads take the strictly-earlier view
  (``batch_id < current``) and writes are per-batch-id dynamic partition
  overwrites — so a replayed micro-batch recomputes bit-identical
  verdicts and rewrites identical state, whatever partial writes the
  crashed attempt left behind (the winnow_stream discipline).

The temperature-mixture stage is deliberately ABSENT from the stream: its
per-source rates depend on the FINAL curated counts, a corpus-global
quantity — production re-samples the curated store per training run
(operators/sampling.py::temperature_mixture_sample on the ``curated/``
table), it doesn't sample mid-stream.

Equivalence contract (pytest-proven in tests/test_curation_stream.py):
if micro-batches arrive as ascending ``doc_id`` ranges (file sources:
order by mtime), the final ``curated/`` table is ROW-IDENTICAL to
:func:`incremental_curation_batch` run once over the concatenated corpus
— every gate is pointwise-given-frozen-state except passage/exact dedup,
which are prefix-consistent by construction.

State layout under ``base_dir``: ``lm/`` (token, c), ``eval_grams/``
(gh), ``passage_owner/`` (h), ``hash_index/`` (h), ``curated/`` (rows).
All indices are hash/token tables — bodies never re-read, never shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pharmacodi_spark.io import merge_upsert, path_exists
from pharmacodi_spark.text.analysis import repetition_metrics
from pharmacodi_spark.text.dedup import passage_first_owner_stats

_SCALE_BITS = 20
_MAX_MEAN_CENTIBITS = 2405  # 100 * sum_bits <= 2405 * n_words (mean <= 24.05)
_NGRAM = 13
_WINDOW = 16


def _paths(base_dir: str) -> dict[str, str]:
    return {
        k: os.path.join(base_dir, k)
        for k in ("lm", "eval_grams", "passage_owner", "hash_index", "curated")
    }


def _tokens(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    return (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.col(content_col), " ")).alias("token"),
        )
        .where(F.col("token") != "")
    )


def _gram_hashes(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    toks = F.filter(F.split(F.col(content_col), " "), lambda x: x != "")
    g = F.transform(
        F.sequence(F.lit(1), F.size("__toks") - (_NGRAM - 1)),
        lambda i: F.md5(F.array_join(F.slice("__toks", i, _NGRAM), " ")),
    )
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .where(F.size("__toks") >= _NGRAM)
        .select(id_col, F.explode(g).alias("gh"))
    )


def prepare_curation_state(
    spark: SparkSession,
    base_dir: str,
    stats_docs: DataFrame,
    eval_docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Phase 1: freeze the corpus LM and the eval-slice gram index."""
    p = _paths(base_dir)
    (
        _tokens(stats_docs, content_col, id_col)
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("c"))
        .write.mode("overwrite")
        .parquet(p["lm"])
    )
    (
        _gram_hashes(eval_docs, content_col, id_col)
        .select("gh")
        .distinct()
        .write.mode("overwrite")
        .parquet(p["eval_grams"])
    )


def _gates_1_to_3(
    new: DataFrame,
    lm: DataFrame,
    eval_grams: DataFrame,
    content_col: str,
    id_col: str,
) -> DataFrame:
    """Pointwise-given-frozen-state gates: repetition ∧ surprisal ∧
    not-contaminated. Returns the entrant id set."""
    gop = (
        repetition_metrics(new, content_col, id_col)
        .where("keep")
        .select(id_col)
    )
    # surprisal vs the FROZEN LM: unseen tokens price as c=1 (max surprisal)
    total = lm.agg(F.sum("c").alias("n"))
    bits = (
        _tokens(new, content_col, id_col)
        .join(lm, "token", "left")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            # shift-free fixed point: floor(log2(n·2^s/c)) ==
            # floor(log2(n div c)) + s for n >= c >= 1, so no pre-shift
            # that would overflow int64 once the frozen LM exceeds
            # ~2^43 tokens (ADVICE r6); matches unigram_surprisal
            (
                F.length(F.bin(F.expr("n div coalesce(c, 1L)")))
                - 1
                + _SCALE_BITS
            ).alias("bits"),
        )
        .groupBy(id_col)
        .agg(F.count("*").alias("n_words"), F.sum("bits").alias("sum_bits"))
        .where(100 * F.col("sum_bits") <= _MAX_MEAN_CENTIBITS * F.col("n_words"))
        .select(id_col)
    )
    contam = (
        _gram_hashes(new, content_col, id_col)
        .join(eval_grams, "gh", "left_semi")
        .select(id_col)
        .distinct()
    )
    return gop.join(bits, id_col).join(contam, id_col, "left_anti")


#: read schema for the two index tables — explicit so an index directory
#: whose only batches were empty (no part files) still reads as an empty
#: frame instead of failing schema inference
_INDEX_SCHEMA = "h string, batch_id bigint"


def _strictly_earlier(
    spark: SparkSession, path: str, batch_id: int
) -> DataFrame | None:
    """The index view a micro-batch is allowed to see: rows written by
    STRICTLY earlier batches. Structured Streaming re-delivers a failed
    batch under the SAME batch id, so a replay sees the index exactly as
    the first delivery did — even if the crash happened after some of this
    batch's own index writes landed (the winnow_stream discipline;
    ADVICE r6)."""
    if not path_exists(spark, path):
        return None
    return (
        spark.read.schema(_INDEX_SCHEMA)
        .parquet(path)
        .where(F.col("batch_id") < int(batch_id))
        .select("h")
    )


def _max_batch_id_on_disk(spark: SparkSession, path: str) -> int | None:
    """Highest ``batch_id=N`` partition under an index path (directory
    listing — no Spark job). Returns None for an absent path. Raises on a
    pre-batch-id layout (bare part files, no partition dirs): those index
    directories were written by the old append format and need a one-time
    rewrite into ``batch_id=`` partitions before the stream can resume —
    under ``_INDEX_SCHEMA`` their rows would read as null batch_id and be
    silently filtered out of every strictly-earlier view (ADVICE r7)."""
    from pharmacodi_spark.io import _hadoop_fs

    fs, hpath = _hadoop_fs(spark, path)
    if not fs.exists(hpath):
        return None
    best = None
    legacy_parts = False
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if name.startswith("batch_id="):
            try:
                v = int(name.split("=", 1)[1])
            except ValueError:
                continue
            best = v if best is None else max(best, v)
        elif name.startswith("part-"):
            legacy_parts = True
    if best is None and legacy_parts:
        raise ValueError(
            f"{path} holds a pre-batch-id index layout (bare part files); "
            "rewrite it once into batch_id= partitions before resuming "
            "the stream"
        )
    return best


def curate_stream_batch(
    spark: SparkSession,
    base_dir: str,
    new: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    *,
    batch_id: int,
) -> None:
    """One micro-batch through gates 1-5 against the persisted state; also
    the ``foreachBatch`` body of :func:`streaming_curation`. Idempotent
    under replay: index rows carry the ``batch_id`` that wrote them, reads
    take the strictly-earlier view (so a replayed batch never sees its own
    first-delivery rows — first-owner verdicts recompute bit-identically),
    writes are per-batch-id dynamic partition overwrites (a replay rewrites
    its own partition with identical content), and survivors merge_upsert
    by id. Each state path is gated on ITS OWN existence, so a crash
    between the two index writes cannot wedge a replay.

    ``batch_id`` is required and must be monotone: a direct caller passing
    a stale id (< the max already on disk) would read a partial index view
    and dynamically overwrite a live batch's rows — guarded here
    (ADVICE r7; replays of the CURRENT max are the supported case)."""
    p = _paths(base_dir)
    for idx_path in (p["passage_owner"], p["hash_index"]):
        on_disk = _max_batch_id_on_disk(spark, idx_path)
        if on_disk is not None and int(batch_id) < on_disk:
            raise ValueError(
                f"batch_id={batch_id} is behind the index at {idx_path} "
                f"(max on disk: {on_disk}); replaying an OLD batch would "
                "corrupt the first-owner state — only the latest batch "
                "may be replayed"
            )
    lm = spark.read.parquet(p["lm"])
    eval_grams = spark.read.parquet(p["eval_grams"])
    prior_owned = _strictly_earlier(spark, p["passage_owner"], batch_id)
    hash_index = _strictly_earlier(spark, p["hash_index"], batch_id)

    entrants = _gates_1_to_3(new, lm, eval_grams, content_col, id_col)
    q3 = new.join(entrants, id_col).localCheckpoint()

    # stage 4: first-owner passage dedup vs index + within batch
    keep4 = (
        passage_first_owner_stats(
            q3, _WINDOW, content_col, id_col, prior_owned=prior_owned
        )
        .where("keep")
        .select(id_col)
    )
    q4 = q3.join(keep4, id_col)

    # stage 5: exact dedup — min-id keeper within batch, then vs index
    h = F.md5(F.col(content_col)).alias("h")
    keeper = (
        q4.select(F.col(id_col), h)
        .groupBy("h")
        .agg(F.min(id_col).alias(id_col))
    )
    if hash_index is not None:
        keeper = keeper.join(hash_index, "h", "left_anti")
    survivors = q4.join(keeper.select(id_col), id_col).localCheckpoint()

    # state updates — every entrant claims its passages (accepted or not:
    # the batch twin's owner is the min id among ENTRANTS); content hashes
    # claimed by keepers only
    new_owned = (
        q3.select(
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.floor(
                            (
                                F.size(
                                    F.filter(
                                        F.split(F.col(content_col), " "),
                                        lambda x: x != "",
                                    )
                                )
                                - 1
                            )
                            / F.lit(float(_WINDOW))
                        ).cast("int"),
                    ),
                    lambda i: F.md5(
                        F.array_join(
                            F.slice(
                                F.filter(
                                    F.split(F.col(content_col), " "),
                                    lambda x: x != "",
                                ),
                                i * _WINDOW + 1,
                                _WINDOW,
                            ),
                            " ",
                        )
                    ),
                )
            ).alias("h")
        )
        .where(F.col("h").isNotNull())
        .distinct()
    )
    new_hashes = survivors.select(F.md5(F.col(content_col)).alias("h")).distinct()
    if prior_owned is not None:
        new_owned = new_owned.join(prior_owned, "h", "left_anti")
    if hash_index is not None:
        new_hashes = new_hashes.join(hash_index, "h", "left_anti")
    for df, path in ((new_owned, p["passage_owner"]), (new_hashes, p["hash_index"])):
        (
            df.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )
    if path_exists(spark, p["curated"]):
        merge_upsert(spark, p["curated"], survivors, [id_col])
    else:
        survivors.write.parquet(p["curated"])


def streaming_curation(
    stream: DataFrame,
    base_dir: str,
    checkpoint_dir: str,
    content_col: str = "text",
    id_col: str = "doc_id",
):
    """Gates 1-5 under Structured Streaming (availableNow drain — the
    repo's upsert_sink convention). Returns the started StreamingQuery."""

    def do_batch(batch: DataFrame, batch_id: int) -> None:
        curate_stream_batch(
            batch.sparkSession, base_dir, batch, content_col, id_col,
            batch_id=batch_id,
        )

    return (
        stream.writeStream.foreachBatch(do_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def incremental_curation_batch(
    spark: SparkSession,
    docs: DataFrame,
    stats_docs: DataFrame | None = None,
    eval_docs: DataFrame | None = None,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The batch twin: gates 1-5 over the whole corpus in one pass, with
    the SAME semantics the stream reproduces — surprisal against the
    ``stats_docs`` LM (default: the corpus itself), decontam against
    ``eval_docs`` (default: the ``doc_id % 97 == 0`` slice), first-owner
    passage dedup, min-id exact dedup. Returns the curated rows."""
    stats_docs = docs if stats_docs is None else stats_docs
    if eval_docs is None:
        eval_docs = docs.where(F.col(id_col) % 97 == 0)
        docs = docs.where(F.col(id_col) % 97 != 0)
    lm = (
        _tokens(stats_docs, content_col, id_col)
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("c"))
    )
    eval_grams = _gram_hashes(eval_docs, content_col, id_col).select("gh").distinct()
    entrants = _gates_1_to_3(docs, lm, eval_grams, content_col, id_col)
    q3 = docs.join(entrants, id_col).localCheckpoint()
    # keep4 is metadata-scale (ids) but its subplan carries the passage
    # chunk-hash pass; q4 is consumed twice (keeper build + final join),
    # so unpinned this evaluated the passage stats TWICE (r13 profile:
    # two twin 3.7s-cpu chunk-md5 stages). Pin the id set once.
    keep4 = (
        passage_first_owner_stats(q3, _WINDOW, content_col, id_col)
        .where("keep")
        .select(id_col)
        .localCheckpoint()
    )
    q4 = q3.join(keep4, id_col)
    keeper = (
        q4.select(F.col(id_col), F.md5(F.col(content_col)).alias("h"))
        .groupBy("h")
        .agg(F.min(id_col).alias(id_col))
    )
    return q4.join(keeper.select(id_col), id_col)
