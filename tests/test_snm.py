"""Sorted-neighborhood blocking (r12): deterministic positions from the
tie-broken (key, id) sort, window pairs exactly once, and the fact-scale
dense_global position path must be pair-identical to the window path."""

from pharmacodi_spark.text.dedup import sorted_neighborhood_pairs


def _df(spark):
    rows = [
        (1, "apple"),
        (2, "apricot"),
        (3, "banana"),
        (4, "apple"),  # ties with 1 on the key → id breaks the tie
        (5, "cherry"),
        (6, "banana2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, sk string")


def _want(window):
    # sort by (sk, id): apple(1), apple(4), apricot(2), banana(3),
    # banana2(6), cherry(5)
    order = [1, 4, 2, 3, 6, 5]
    return {
        (order[i], order[i + d], d)
        for i in range(len(order))
        for d in range(1, window)
        if i + d < len(order)
    }


def test_snm_pairs_window3_and_tie_break(spark):
    got = {
        (r.doc_a, r.doc_b, r.pos_gap)
        for r in sorted_neighborhood_pairs(
            _df(spark), sort_key="sk", id_col="doc_id", window=3
        ).collect()
    }
    assert got == _want(3)
    # the tie pair (1, 4) is adjacent — key equality alone can't order it
    assert (1, 4, 1) in got


def test_snm_adjacent_only_window2(spark):
    got = {
        (r.doc_a, r.doc_b, r.pos_gap)
        for r in sorted_neighborhood_pairs(
            _df(spark), sort_key="sk", id_col="doc_id", window=2
        ).collect()
    }
    assert got == _want(2)
    assert all(g == 1 for _, _, g in got)


def test_snm_dense_global_path_identical(spark):
    """The fact-scale range-partition position path (no single-task
    window) must emit the identical pair set."""
    df = spark.createDataFrame(
        [(i, f"k{i % 37:03d}") for i in range(500)], "doc_id long, sk string"
    ).repartition(8)
    a = {
        tuple(r)
        for r in sorted_neighborhood_pairs(
            df, sort_key="sk", id_col="doc_id", window=4
        ).collect()
    }
    b = {
        tuple(r)
        for r in sorted_neighborhood_pairs(
            df, sort_key="sk", id_col="doc_id", window=4, dense_global=True
        ).collect()
    }
    assert a == b and len(a) == 3 * 500 - (1 + 2 + 3)
