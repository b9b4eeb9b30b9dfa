"""Near-dup candidate pairs → clusters → keeper drop-list (VERDICT r1 item 5).

LSH banding (text/dedup.py::minhash_near_dup_pairs, simhash_near_pairs)
stops at candidate PAIRS; a production corpus dedup needs to go from pairs
to one keeper per duplicate *cluster* and a drop list for everything else.
The cluster step is connected components over the pair graph.

Spark-first CC without GraphFrames: iterative hash-min label propagation —
every node starts labeled with itself; each round a node takes the min of
its own label and its neighbors' labels; converge when no label changes.
Rounds = O(max component diameter), which for near-dup clusters is tiny
(they are dense almost-cliques). Each round is two broadcast-free shuffle
joins on (node) plus a metadata-scale count; ``localCheckpoint`` truncates
the lineage every round so the plan does not grow with iterations (the
classic iterative-DataFrame hazard at scale).

At 100 TB: the edge list is the LSH output (|pairs| ≪ |docs|), labels are
(node, long) tuples — the shuffles never carry document bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pharmacodi_spark.barrier import stage_barrier


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
    barrier: str = "local",
    barrier_dir: str | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component is
    the min node id reachable — deterministic, engine-independent labels.

    Raises if not converged after ``max_iter`` rounds (a pathological
    diameter; near-dup graphs converge in <10)."""
    _b = lambda df, name: stage_barrier(
        df, mode=barrier, name=name, barrier_dir=barrier_dir
    )
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = _b(sym.distinct(), "cc-edges")

    labels = _b(
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("lab", F.col("node")),
        "cc-labels0",
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("lab").alias("nlab"))
        )
        # change detection rides IN the update frame (a flag column) so a
        # round costs ONE materializing job + a metadata-scale aggregate on
        # the already-checkpointed result — not a second join of new vs old
        new_lab = F.least(F.col("lab"), F.coalesce("nlab", "lab"))
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.u, "left")
            .select(
                "node",
                new_lab.alias("lab"),
                (new_lab != F.col("lab")).alias("ch"),
            )
        )
        new_labels = _b(new_labels, "cc-iter")
        changed = new_labels.agg(F.sum(F.col("ch").cast("int"))).first()[0]
        labels = new_labels.drop("ch")
        if not changed:
            return labels.select("node", F.col("lab").alias("component"))
    raise RuntimeError(f"connected_components: not converged after {max_iter} rounds")


def near_dup_droplist(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """(id, component, keep) for EVERY id in ``ids``: cluster the candidate
    pairs, keep the min id of each cluster (the reference-style
    deterministic keeper policy — cf. exact_dedup), mark everything else
    drop. Singletons (no pair) keep themselves. Filter ``keep = false`` for
    the drop list; semi-join ``keep = true`` against the corpus for the
    surviving documents."""
    comp = connected_components(pairs, src=src, dst=dst)
    # the label attach: full id set LEFT JOIN the component table. Both
    # sides are barrier-pinned RDD scans in every caller, so the planner
    # has no stats and falls back to sort-merge — but the join is a plain
    # equi-join whose build side (labels ≤ the dup mass) is the smaller by
    # construction; hint it hash so neither side pays a sort (the r8
    # pagerank_int lesson, caught again by the r10 text_semantic_dedup
    # plan audit).
    out = (
        ids.select(F.col(id_col))
        .join(comp.hint("shuffle_hash"), ids[id_col] == comp.node, "left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
        )
    )
    return out.withColumn("keep", F.col("component") == F.col(id_col))


def contamination_safe_splits(
    df: DataFrame,
    pairs: DataFrame,
    fractions: list[float],
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    salt: str = "split",
) -> list[DataFrame]:
    """Train/val/test splits that near-dup clusters can never straddle:
    label components over the candidate pairs (singletons keep their own
    id), then hash-band the COMPONENT id (operators/sampling.py::
    hash_split) — every member of a cluster shares the component, hence
    the band, so a test document's near-duplicate cannot sit in train (the
    decontamination requirement for LLM eval splits; doc-keyed splits
    cannot give it). Deterministic on any engine/partitioning; each
    returned frame carries a ``component`` column for audit."""
    from pharmacodi_spark.operators.sampling import hash_split

    comp = near_dup_droplist(df.select(id_col), pairs, id_col=id_col, src=src, dst=dst)
    keyed = df.join(comp.select(id_col, "component"), id_col)
    return hash_split(keyed, "component", fractions, salt)


def dup_cluster_histogram(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Cluster-size distribution of the near-dup graph: how much of the
    corpus sits in how-big duplicate clusters — the curation-report table
    that separates "a few mirrored pages" (many size-2 clusters) from "a
    boilerplate storm" (one giant component), and the input to sizing the
    hot-cell guard (``triangle_blocks``' cap should exceed the typical
    cluster, not the pathological one).

    Per ``cluster_size``: ``n_clusters`` and ``n_docs`` (= size ×
    clusters; singletons are size-1 rows, so the column sums to the
    corpus).  Scale shape: the CC loop's shuffles are edge-scale; the two
    rollups (component → size, size → histogram) collapse map-side and
    end metadata-scale."""
    keep = near_dup_droplist(ids, pairs, id_col=id_col, src=src, dst=dst)
    sizes = keep.groupBy("component").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").cast("long").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
        )
    )
