"""phrase_blocklist_hits (text/cleaning.py): replace-diff counting
semantics — non-overlapping, left-to-right, multi-phrase totals."""

from __future__ import annotations

from pharmacodi_spark.text.cleaning import phrase_blocklist_hits


def test_counts_and_gate(spark):
    rows = [
        (0, "clean document with nothing to flag"),
        (1, "as an AI language model I cannot"),
        (2, "as an AI language model ... as an AI language model"),
        (3, "aaaa"),  # "aa" occurs twice non-overlapping
        (4, "mixed: as an AI language model and lorem ipsum here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in phrase_blocklist_hits(
            df, ["as an AI language model", "lorem ipsum", "aa"]
        ).collect()
    }
    assert got[0]["n_hits"] == 0 and got[0]["keep"]
    assert got[1]["n_hits"] == 1 and not got[1]["keep"]
    assert got[2]["n_hits"] == 2 and got[2]["n_phrases_hit"] == 1
    assert got[3]["n_hits"] == 2  # non-overlapping count in "aaaa"
    assert got[4]["n_hits"] == 2 and got[4]["n_phrases_hit"] == 2
    assert not got[4]["keep"]
