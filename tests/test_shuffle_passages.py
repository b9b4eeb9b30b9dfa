"""shuffle_shards (deterministic epoch shuffle + byte-budget shards) and
passage_dedup_stats (CCNet-style cross-doc passage dedup) vs naive
Python references on fixtures that exercise the interesting paths."""

from __future__ import annotations

import hashlib


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_shuffle_shards_matches_naive_cumsum(spark):
    docs = [(i, 100 + (i * 37) % 250) for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, n_chars long")
    from pharmacodi_spark.text.packing import shuffle_shards

    got = {
        r["doc_id"]: (r["shuffle_key"], r["byte_start"], r["shard_id"])
        for r in shuffle_shards(df, shard_bytes=4096, salt="s1").collect()
    }
    order = sorted(docs, key=lambda d: (_md5_long("s1" + str(d[0])), d[0]))
    cum = 0
    for i, nb in order:
        assert got[i] == (_md5_long("s1" + str(i)), cum, cum // 4096), i
        cum += nb

    # deterministic: same salt -> identical assignment on a rerun
    again = {
        r["doc_id"]: (r["shuffle_key"], r["byte_start"], r["shard_id"])
        for r in shuffle_shards(df, shard_bytes=4096, salt="s1").collect()
    }
    assert again == got

    # different salt -> different permutation (overwhelmingly likely)
    other = {
        r["doc_id"]: r["byte_start"]
        for r in shuffle_shards(df, shard_bytes=4096, salt="s2").collect()
    }
    assert any(other[i] != got[i][1] for i, _ in docs)

    # shard sizes are near-uniform: every shard except the last reaches
    # the target within one document's size
    by_shard: dict[int, int] = {}
    for i, nb in docs:
        by_shard[got[i][2]] = by_shard.get(got[i][2], 0) + nb
    last = max(by_shard)
    max_doc = max(nb for _, nb in docs)
    for s, total in by_shard.items():
        if s != last:
            assert total >= 4096 - max_doc  # no shard closes early
            assert total < 4096 + max_doc


def test_passage_dedup_flags_shared_boilerplate(spark):
    w = 4
    boiler = "this is shared boiler"           # exactly one 4-token passage
    uniq = lambda i: f"unique text piece {i}"  # noqa: E731
    docs = [
        # doc 0: all boilerplate (2 passages, both shared) -> dropped
        (0, f"{boiler} {boiler}"),
        # doc 1: half boiler, half unique -> kept (2*1 <= 2)
        (1, f"{boiler} {uniq(1)}"),
        # doc 2: another carrier of the boilerplate
        (2, f"{boiler} {uniq(2)} {uniq(3)}"),
        # doc 3: fully unique
        (3, f"{uniq(4)} {uniq(5)}"),
        # doc 4: empty
        (4, ""),
        # doc 5: within-doc repetition only -> NOT counted as dup
        (5, f"{uniq(6)} {uniq(6)}"),
        # doc 6: partial last passage shared with doc 7
        (6, f"{uniq(7)} tail bit"),
        (7, f"{uniq(7)} tail bit"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from pharmacodi_spark.text.dedup import passage_dedup_stats

    got = {
        r["doc_id"]: (r["n_passages"], r["n_dup_passages"], r["keep"])
        for r in passage_dedup_stats(df, window=w).collect()
    }
    assert got[0] == (2, 2, False)   # all passages shared -> drop
    assert got[1] == (2, 1, True)
    assert got[2] == (3, 1, True)
    assert got[3] == (2, 0, True)
    assert got[4] == (0, 0, True)    # empty doc: zero passages, kept
    assert got[5] == (2, 0, True)    # within-doc repeat is not cross-doc dup
    # docs 6/7 share both the full and the partial passage
    assert got[6] == (2, 2, False)
    assert got[7] == (2, 2, False)
