#!/usr/bin/env python
"""Materialize an sf1-equivalent dataset (10x sf0.1) for the second-scale-
factor bench point (VERDICT r4 item 3).

The driver ships fixtures only up to sf0.1, so the 2x-of-baseline target
has evidence at exactly one scale. This tool builds /tmp/bench_sf1/sf1 —
10 key-shifted copies of every sf0.1 fact table with CONSISTENT foreign-key
offsets (the join graph of the copies is 10 disjoint sf0.1-shaped
subgraphs, like TPC-H SF scaling), dims (region/nation) kept 1x per TPC-H
convention, written as 32-partition parquet so scans split.

Content mutation per copy — deliberately NOT identical copies:
- documents: every token suffixed ``_k`` for copy k>0 (shingle sets
  disjoint across copies → dedup pair counts grow ~10x like a real corpus,
  not ~100x like a dup-dense one);
- embeddings: cyclic-shift by 5*k positions for copy k>0 (norms and
  within-copy geometry preserved, cross-copy cosine decorrelated → the
  semantic-dedup quadratic term scales like real data).

Usage: python tools/make_sf1.py  →  prints the output dir; then
       SPARK_GRAFT_SF_DIR=/tmp/bench_sf1/sf1 python bench.py --runs 1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pharmacodi_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/bench_sf1/sf1"
COPIES = 10

# per-entity key offsets — far above any sf0.1 key, mutually consistent
OFF = {
    "custkey": 1_000_000,
    "suppkey": 1_000_000,
    "partkey": 10_000_000,
    "orderkey": 100_000_000,
    "event_id": 100_000_000,
    "user_id": 10_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}


def _shift(df, k: int, cols: dict[str, int]):
    out = df
    for c, off in cols.items():
        out = out.withColumn(c, F.col(c) + F.lit(k * off))
    return out


def _scale(df, cols: dict[str, int], mutate=None):
    parts = []
    for k in range(COPIES):
        p = _shift(df, k, cols)
        if mutate is not None and k > 0:
            p = mutate(p, k)
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    spark = get_spark(app_name="make_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(OUT, exist_ok=True)

    def read(t):
        return spark.read.parquet(f"{SRC}/{t}.parquet")

    def write(df, t):
        df.repartition(32).write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")

    # dims stay 1x (TPC-H convention; every copy's FKs still resolve)
    for t in ("region", "nation"):
        read(t).write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")

    write(_scale(read("customer"), {"c_custkey": OFF["custkey"]}), "customer")
    write(_scale(read("supplier"), {"s_suppkey": OFF["suppkey"]}), "supplier")
    write(_scale(read("part"), {"p_partkey": OFF["partkey"]}), "part")
    write(
        _scale(
            read("orders"),
            {"o_orderkey": OFF["orderkey"], "o_custkey": OFF["custkey"]},
        ),
        "orders",
    )
    write(
        _scale(
            read("lineitem"),
            {
                "l_orderkey": OFF["orderkey"],
                "l_partkey": OFF["partkey"],
                "l_suppkey": OFF["suppkey"],
            },
        ),
        "lineitem",
    )
    write(
        _scale(
            read("events"),
            {"event_id": OFF["event_id"], "user_id": OFF["user_id"]},
        ),
        "events",
    )
    write(
        _scale(
            read("documents"),
            {"doc_id": OFF["doc_id"]},
            mutate=lambda df, k: df.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"$1_{k}")
            ),
        ),
        "documents",
    )
    dim = read("embeddings").select(F.size("embedding")).first()[0]
    write(
        _scale(
            read("embeddings"),
            {"vec_id": OFF["vec_id"]},
            mutate=lambda df, k: df.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", 5 * k % dim + 1, dim - 5 * k % dim),
                    F.slice("embedding", 1, 5 * k % dim),
                ),
            ),
        ),
        "embeddings",
    )
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        n = spark.read.parquet(f"{OUT}/{t}.parquet").count()
        print(f"{t}: {n:,} rows")
    print(OUT)


if __name__ == "__main__":
    main()
