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
    # no-path URLs with a query/fragment: the authority must be cut at the
    # first of '/', '?', '#' — not just '/'
    ("http://example.com?b=2&a=1", "http://example.com/?a=1&b=2",
     "example.com"),
    ("http://example.com#frag", "http://example.com/", "example.com"),
    ("HTTPS://WWW.Example.COM:443?utm_source=x&a=1#f",
     "https://example.com/?a=1", "example.com"),
    ("example.com?a=1", "http://example.com/?a=1", "example.com"),
    ("http://user:pw@example.com:8080?a=1", "http://example.com/?a=1",
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


# a verbatim excerpt of the Mozilla public_suffix_list.dat grammar: comments,
# blank lines, plain rules, the .ck wildcard, and its exception rule
PSL_EXCERPT = [
    "// This Source Code Form is subject to the terms of the MPL 2.0.",
    "",
    "// ===BEGIN ICANN DOMAINS===",
    "com",
    "uk",
    "co.uk",
    "gov.uk",
    "jp",
    "kawasaki.jp",
    "*.ck",
    "!www.ck",
    "",
]


def test_registered_domains_real_psl_rules(spark):
    """publicsuffix.org semantics on a real PSL excerpt: wildcard `*.ck`
    makes <label>.ck the public suffix; exception `!www.ck` prevails over
    the wildcard; plain rules pick the longest match; comment/blank lines
    are dropped by the parser."""
    from pharmacodi_spark.text.urls import registered_domains

    rows = [
        (0, "http://example.com/p"),          # com -> example.com
        (1, "http://a.b.example.co.uk/p"),    # co.uk beats uk
        (2, "http://hmrc.gov.uk/p"),          # gov.uk beats uk
        (3, "http://shop.city.kawasaki.jp/p"),  # kawasaki.jp beats jp
        (4, "http://foo.zone.ck/p"),          # *.ck -> ps zone.ck
        (5, "http://zone.ck/p"),              # host IS the wildcard ps
        (6, "http://a.www.ck/p"),             # !www.ck: ps ck, reg www.ck
        (7, "http://b.www.ck/p"),             # exception again
        (8, "http://nomatch.example/p"),      # no rule -> nulls
        (9, "http://ck/p"),                   # bare ck: *.ck needs a label
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    psl = spark.createDataFrame([(l,) for l in PSL_EXCERPT], ["suffix"])
    got = {
        r["doc_id"]: (r["public_suffix"], r["registered_domain"])
        for r in registered_domains(df, psl, strip_www=False).collect()
    }
    assert got[0] == ("com", "example.com")
    assert got[1] == ("co.uk", "example.co.uk")
    assert got[2] == ("gov.uk", "hmrc.gov.uk")
    assert got[3] == ("kawasaki.jp", "city.kawasaki.jp")
    assert got[4] == ("zone.ck", "foo.zone.ck")
    assert got[5] == ("zone.ck", None)        # bare public suffix
    assert got[6] == ("ck", "www.ck")
    assert got[7] == ("ck", "www.ck")
    assert got[8] == (None, None)
    assert got[9] == (None, None)


def test_registered_domains_implicit_star(spark):
    """implicit_star=True adds the algorithm's fallback `*` rule: an
    unmatched host's public suffix is its last label."""
    from pharmacodi_spark.text.urls import registered_domains

    df = spark.createDataFrame(
        [(0, "http://svc.internal/p"), (1, "http://example.com/p")],
        ["doc_id", "url"],
    )
    psl = spark.createDataFrame([("com",)], ["suffix"])
    got = {
        r["doc_id"]: (r["public_suffix"], r["registered_domain"])
        for r in registered_domains(df, psl, implicit_star=True).collect()
    }
    assert got[0] == ("internal", "svc.internal")
    assert got[1] == ("com", "example.com")


def test_domain_quality_gate_blocks_failing_hosts(spark):
    from pharmacodi_spark.text.urls import domain_quality_gate

    rows = []
    # spam.com: 6 docs, 5 fail (833333 ppm) -> blocked
    for i in range(6):
        rows.append((i, "http://spam.com/p", i < 5))
    # good.org: 6 docs, 1 fails (166666 ppm) -> kept
    for i in range(6, 12):
        rows.append((i, "http://good.org/p", i == 6))
    # tiny.net: 2 docs, both fail, but below min_docs -> kept
    rows.append((12, "http://tiny.net/p", True))
    rows.append((13, "http://tiny.net/p", True))
    df = spark.createDataFrame(rows, ["doc_id", "url", "failed"])
    got = {r["doc_id"]: (r["keep"], r["host_fail_ppm"])
           for r in domain_quality_gate(df, "failed", min_docs=5,
                                        max_fail_ppm=400_000).collect()}
    for i in range(6):
        assert got[i] == (False, 833_333), got[i]
    for i in range(6, 12):
        assert got[i] == (True, None)
    assert got[12] == (True, None) and got[13] == (True, None)


def test_fuzzy_decontaminate_catches_paraphrase(spark):
    """Exact 13-gram decontam misses a lightly edited eval item; the
    MinHash pass must flag it, and unrelated docs must survive."""
    from pharmacodi_spark.text.cleaning import (
        decontaminate_against,
        fuzzy_decontaminate,
    )

    base = ("w00 w01 w02 w03 w04 w05 w06 w07 w08 w09 w10 w11 w12 w13 w14 "
            "w15 w16 w17 w18 w19 w20 w21 w22 w23 w24 w25 w26 w27 w28 w29 "
            "w30 w31 w32 w33 w34 w35 w36 w37 w38 w39").split()
    eval_rows = [(1000, " ".join(base))]
    # edits at positions 10/22/34: every 13-token window contains one, so
    # the exact pass finds NO shared 13-gram, but most 5-shingles survive
    para = list(base)
    for p in (10, 22, 34):
        para[p] = f"edit{p}"
    train_rows = [
        (0, " ".join(para)),                              # paraphrase
        (1, "completely different text about spark physical plans and "
            "shuffle partitions in a distributed aggregation pipeline"),
        (2, " ".join(base)),                              # exact copy
    ]
    train = spark.createDataFrame(train_rows, ["doc_id", "text"])
    ev = spark.createDataFrame(eval_rows, ["doc_id", "text"])

    exact = {r["doc_id"]: r["contaminated"]
             for r in decontaminate_against(train, ev, n=13).collect()}
    fuzzy = {r["doc_id"]: (r["keep"], r["matched_eval_id"])
             for r in fuzzy_decontaminate(
                 train, ev, num_hashes=16, bands=8, min_est_ppm=300_000
             ).collect()}
    assert exact[2] and not exact[1]
    assert not fuzzy[2][0] and fuzzy[2][1] == 1000   # exact copy flagged
    assert not fuzzy[0][0] and fuzzy[0][1] == 1000   # paraphrase flagged
    assert fuzzy[1][0]                               # unrelated survives
    # the gap this op closes: the paraphrase slips past the exact pass
    assert not exact[0]


def test_fuzzy_decontaminate_deterministic(spark):
    from pharmacodi_spark.text.cleaning import fuzzy_decontaminate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from pyspark.sql import functions as F

    train = docs.where(F.col("doc_id") % 97 != 0)
    ev = docs.where(F.col("doc_id") % 97 == 0)
    a = sorted(map(tuple, fuzzy_decontaminate(train, ev).collect()))
    b = sorted(map(tuple, fuzzy_decontaminate(train, ev).collect()))
    assert a == b and len(a) == train.count()


def test_registered_domains_psl_semantics(spark):
    from pharmacodi_spark.text.urls import registered_domains

    rows = [
        (0, "http://a.b.example.co.uk/x"),   # PSL co.uk -> example.co.uk
        (1, "http://example.com/x"),         # com -> example.com
        (2, "http://cdn.shop.example.com/x"),
        (3, "http://co.uk/x"),               # bare public suffix -> null
        (4, "http://unknown.tld/x"),         # no PSL match -> nulls
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    psl = spark.createDataFrame([("com",), ("uk",), ("co.uk",)], ["suffix"])
    got = {r["doc_id"]: (r["public_suffix"], r["registered_domain"])
           for r in registered_domains(df, psl).collect()}
    assert got[0] == ("co.uk", "example.co.uk")   # longest suffix wins
    assert got[1] == ("com", "example.com")
    assert got[2] == ("com", "example.com")
    assert got[3] == ("co.uk", None)              # bare suffix
    assert got[4] == (None, None)


def test_domain_quality_gate_psl_pools_subdomains(spark):
    """Registered-domain keying (psl=...): a spam operation split over
    cdn./www2./bare hosts stays under min_docs per HOST but crosses once
    pooled on its registrable domain — the host-keyed gate misses it, the
    PSL-keyed gate blocks every variant."""
    from pharmacodi_spark.text.urls import domain_quality_gate

    rows = []
    # spam.co.uk: 6 failing docs spread over 3 host variants (2 each)
    for i, pre in enumerate(["", "cdn.", "www2."] * 2):
        rows.append((i, f"http://{pre}spam.co.uk/p", True))
    # fine.co.uk: 6 docs, 1 fails
    for i in range(6, 12):
        rows.append((i, "http://fine.co.uk/p", i == 6))
    df = spark.createDataFrame(rows, ["doc_id", "url", "failed"])
    psl = spark.createDataFrame([("uk",), ("co.uk",)], ["suffix"])
    kw = dict(min_docs=5, max_fail_ppm=400_000)

    by_host = {r["doc_id"]: r["keep"]
               for r in domain_quality_gate(df, "failed", **kw).collect()}
    assert all(by_host.values())   # every host variant under min_docs

    pooled = {r["doc_id"]: (r["keep"], r["rollup_key"], r["host_fail_ppm"])
              for r in domain_quality_gate(df, "failed", psl=psl,
                                           **kw).collect()}
    for i in range(6):
        assert pooled[i] == (False, "spam.co.uk", 1_000_000), pooled[i]
    for i in range(6, 12):
        assert pooled[i][0] is True and pooled[i][1] == "fine.co.uk"


def test_parse_robots_lines():
    from pharmacodi_spark.text.urls import parse_robots_lines

    body = """
# comment line
User-agent: GoodBot
User-agent: OtherBot
Disallow: /private/   # inline comment
Allow: /private/ok

User-agent: *
Disallow:
Disallow: /tmp/
"""
    rules = parse_robots_lines("h.com", body)
    # consecutive user-agent lines share the rule block; empty Disallow
    # (allow-all marker) skipped; comments stripped
    assert ("h.com", "goodbot", False, "/private/") in rules
    assert ("h.com", "otherbot", False, "/private/") in rules
    assert ("h.com", "goodbot", True, "/private/ok") in rules
    assert ("h.com", "*", False, "/tmp/") in rules
    assert all(r[3] != "" for r in rules)
    # a user-agent line AFTER rules starts a NEW group
    assert ("h.com", "*", False, "/private/") not in rules


def test_robots_gate_semantics(spark):
    from pharmacodi_spark.text.urls import parse_robots_lines, robots_gate

    bodies = {
        "a.com": "User-agent: *\nDisallow: /p/\nAllow: /p/ok\n",
        "b.com": "User-agent: bot\nDisallow: /\nUser-agent: *\nAllow: /\n",
    }
    rules = spark.createDataFrame(
        [r for h, b in sorted(bodies.items())
         for r in parse_robots_lines(h, b)],
        ["host", "agent", "allow", "prefix"],
    )
    urls = [
        (0, "http://a.com/p/x"),        # disallowed
        (1, "http://a.com/p/ok/y"),     # longest prefix re-allows
        (2, "http://a.com/other"),      # no match -> allowed
        (3, "http://b.com/anything"),   # bot group overrides permissive *
        (4, "http://c.com/no/robots"),  # unknown host -> allowed
        (5, "http://b.com"),            # bare host -> path '/'
    ]
    df = spark.createDataFrame(urls, ["doc_id", "url"])
    got = {
        r["doc_id"]: (r["allowed"], r["matched_prefix"])
        for r in robots_gate(df, rules, agent="bot").collect()
    }
    assert got[0] == (False, "/p/")
    assert got[1] == (True, "/p/ok")
    assert got[2] == (True, None)
    assert got[3] == (False, "/")
    assert got[4] == (True, None)
    assert got[5] == (False, "/")
    # the same corpus under the default agent: b.com's * group allows
    star = {
        r["doc_id"]: r["allowed"]
        for r in robots_gate(df, rules, agent="*").collect()
    }
    assert star[3] is True and star[0] is False


def test_robots_gate_google_rep_wildcards(spark):
    # the worked examples from Google's REP documentation (§ URL
    # matching based on path values) — '*' any char sequence, '$' end
    # anchor, longest-rule specificity
    from pharmacodi_spark.text.urls import robots_gate

    rules = spark.createDataFrame(
        [
            ("g.com", "*", False, "/fish*"),
            ("h.com", "*", False, "/*.php"),
            ("i.com", "*", False, "/*.php$"),
            ("j.com", "*", False, "/fish*.php"),
        ],
        ["host", "agent", "allow", "prefix"],
    )
    urls = [
        (0, "http://g.com/fish"),            # /fish* matches
        (1, "http://g.com/fishheads/x.html"),  # /fish* matches
        (2, "http://g.com/Fish.asp"),        # case-sensitive: no match
        (3, "http://g.com/catfish"),         # no match (not a prefix)
        (10, "http://h.com/filename.php"),
        (11, "http://h.com/folder/any.php.file.html"),
        (12, "http://h.com/"),               # /*.php does not match '/'
        (13, "http://h.com/windows.PHP"),    # case-sensitive
        (20, "http://i.com/filename.php"),   # anchored: matches
        (21, "http://i.com/filename.php?parameters"),  # anchored: no
        (22, "http://i.com/filename.php5"),  # anchored: no
        (30, "http://j.com/fish.php"),
        (31, "http://j.com/fishheads/catfish.php?parameters"),
        (32, "http://j.com/Fish.PHP"),       # case-sensitive: no match
    ]
    df = spark.createDataFrame(urls, ["doc_id", "url"])
    got = {
        r["doc_id"]: r["allowed"]
        for r in robots_gate(df, rules, agent="*").collect()
    }
    assert got[0] is False and got[1] is False
    assert got[2] is True and got[3] is True
    assert got[10] is False and got[11] is False
    assert got[12] is True and got[13] is True
    assert got[20] is False and got[21] is True and got[22] is True
    assert got[30] is False and got[31] is False and got[32] is True


def test_robots_gate_host_normalization_and_query(spark):
    from pharmacodi_spark.text.urls import robots_gate

    rules = spark.createDataFrame(
        [
            # fetched from the www. host — must gate the apex host too
            ("www.a.com", "*", False, "/"),
            # RFC 9309: a literal '?' rule matches against path+query
            ("b.com", "*", False, "/search?"),
            # wildcard query targeting
            ("c.com", "*", False, "*?ref="),
        ],
        ["host", "agent", "allow", "prefix"],
    )
    urls = [
        (0, "http://a.com/page"),            # www rule gates apex
        (1, "http://www.a.com/page"),        # and the www host itself
        (2, "http://b.com/search?q=x"),      # literal '?' rule matches
        (3, "http://b.com/search"),          # no query -> no match
        (4, "http://c.com/p/1?ref=spam"),    # wildcard query rule
        (5, "http://c.com/p/1"),             # no query -> allowed
        (6, "http://c.com?ref=x"),           # path-less URL + query
    ]
    df = spark.createDataFrame(urls, ["doc_id", "url"])
    got = {
        r["doc_id"]: (r["allowed"], r["path"])
        for r in robots_gate(df, rules, agent="*").collect()
    }
    assert got[0] == (False, "/page")
    assert got[1] == (False, "/page")
    assert got[2] == (False, "/search?q=x")  # path carries the query
    assert got[3] == (True, "/search")
    assert got[4] == (False, "/p/1?ref=spam")
    assert got[5] == (True, "/p/1")
    assert got[6] == (False, "/?ref=x")      # '/' restored before query
