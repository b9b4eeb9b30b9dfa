"""text/urls.py: canonical-form contract cases, dedup-key stability, and
the suffix-semantics domain gate."""

from __future__ import annotations

from pharmacodi_spark.text.urls import domain_gate, parse_urls


CASES = [
    # (raw, canon, host)
    ("HTTPS://WWW.Example.COM:443/Path/", "https://example.com/Path", "example.com"),
    ("http://example.com", "http://example.com/", "example.com"),
    ("example.com/a/b", "http://example.com/a/b", "example.com"),
    ("http://user:pw@example.com:8080/x", "http://example.com/x", "example.com"),
    ("http://example.com/x#frag", "http://example.com/x", "example.com"),
    (
        "http://example.com/x?utm_source=tw&b=2&fbclid=z&a=1",
        "http://example.com/x?a=1&b=2",
        "example.com",
    ),
    (
        "http://example.com/x?b=2&a=1",
        "http://example.com/x?a=1&b=2",
        "example.com",
    ),
    ("http://cdn.sub.example.co.uk/y/", "http://cdn.sub.example.co.uk/y",
     "cdn.sub.example.co.uk"),
    ("http://example.com/?utm_campaign=only", "http://example.com/",
     "example.com"),
]


def test_canonical_contract_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(CASES)], ["doc_id", "url"]
    )
    got = {r["doc_id"]: (r["canon_url"], r["host"])
           for r in parse_urls(df).collect()}
    for i, (raw, canon, host) in enumerate(CASES):
        assert got[i] == (canon, host), (raw, got[i], canon)


def test_param_order_never_splits_dedup_key(spark):
    variants = [
        "http://example.com/x?a=1&b=2",
        "http://Example.com/x?b=2&a=1#top",
        "https://example.com/x?a=1&utm_medium=m&b=2",
        "HTTP://www.example.com:80/x/?gclid=g&a=1&b=2",
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(variants)], ["doc_id", "url"]
    )
    canon = {r["canon_url"] for r in parse_urls(df).collect()}
    # scheme differences survive (http vs https ARE different resources);
    # everything else collapses
    assert canon == {"http://example.com/x?a=1&b=2",
                     "https://example.com/x?a=1&b=2"}


def test_domain_gate_suffix_semantics(spark):
    rows = [
        (0, "http://spam.example.com/a"),       # subdomain of blocked
        (1, "http://example.com/b"),            # exact blocked
        (2, "http://notexample.com/c"),         # NOT a suffix match
        (3, "http://deep.ads.tracker.net/d"),   # blocked at 2-label suffix
        (4, "http://fine.org/e"),               # kept
        (5, "http://ads.tracker.net/f"),        # longest match preferred
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    blocked = spark.createDataFrame(
        [("example.com",), ("tracker.net",), ("ads.tracker.net",)],
        ["domain"],
    )
    got = {r["doc_id"]: (r["keep"], r["matched_domain"])
           for r in domain_gate(df, blocked).collect()}
    assert got[0] == (False, "example.com")
    assert got[1] == (False, "example.com")
    assert got[2] == (True, None)
    assert got[3] == (False, "ads.tracker.net")   # longest suffix wins
    assert got[4] == (True, None)
    assert got[5] == (False, "ads.tracker.net")
