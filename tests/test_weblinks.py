"""Anchor-text aggregation and robots.txt parse/gate (the web-link
operators a crawl-scale KG pipeline needs beyond the reference's
citation graph)."""

import pytest
from pyspark.sql import functions as F

from bertseyeview_spark.operators.weblinks import (
    anchor_text_topk,
    parse_robots,
    robots_filter,
)


def test_anchor_text_topk_normalization_and_rank(spark):
    links = spark.createDataFrame(
        [
            ("t1", "Click Here"), ("t1", "click  here"), ("t1", "Docs"),
            ("t1", "docs"), ("t1", "docs "), ("t1", "  "),
            ("t2", "alpha"), ("t2", "beta"),
        ],
        ["dst", "anchor"],
    )
    got = {
        (r["id"], r["rank"]): (
            r["anchor"], r["n_mentions"], r["n_inlinks"],
            r["n_unique_anchors"],
        )
        for r in anchor_text_topk(links, "dst", "anchor", k=2).collect()
    }
    # whitespace-only anchor dropped; case + inner-space variants merge
    assert got == {
        ("t1", 1): ("docs", 3, 5, 2),
        ("t1", 2): ("click here", 2, 5, 2),
        # tie on count -> lexicographic anchor order
        ("t2", 1): ("alpha", 1, 2, 2),
        ("t2", 2): ("beta", 1, 2, 2),
    }
    # min_count drops singleton anchors BEFORE ranking and totals
    got2 = {
        (r["id"], r["rank"]): (r["anchor"], r["n_inlinks"])
        for r in anchor_text_topk(
            links, "dst", "anchor", k=2, min_count=2
        ).collect()
    }
    assert got2 == {("t1", 1): ("docs", 5), ("t1", 2): ("click here", 5)}
    with pytest.raises(ValueError, match="k"):
        anchor_text_topk(links, "dst", "anchor", k=0)


ROBOTS = """Disallow: /pre/
User-agent: *
Disallow: /a/
User-Agent: BevBot
User-agent: other
Allow: /b/ok
Disallow: /b/   # trailing comment
DISALLOW:

User-agent: *
Disallow: /c/
"""


def test_parse_robots_group_semantics(spark):
    df = spark.createDataFrame([("h", ROBOTS)], ["host", "robots_txt"])
    # named agent: ONLY the BevBot/other group applies ('*' suppressed);
    # the pre-group rule and the empty Disallow contribute nothing
    named = {
        (r["rule"], r["path_prefix"])
        for r in parse_robots(df, "host", "robots_txt", agent="bevbot").collect()
    }
    assert named == {("allow", "/b/ok"), ("disallow", "/b/")}
    # unknown agent: both '*' groups apply
    star = {
        (r["rule"], r["path_prefix"])
        for r in parse_robots(df, "host", "robots_txt", agent="nobody").collect()
    }
    assert star == {("disallow", "/a/"), ("disallow", "/c/")}
    # agent matching is case-insensitive on both sides
    upper = {
        r["path_prefix"]
        for r in parse_robots(df, "host", "robots_txt", agent="BEVBOT").collect()
    }
    assert upper == {"/b/ok", "/b/"}


def test_robots_filter_precedence(spark):
    rules = spark.createDataFrame(
        [
            ("h", "disallow", "/p/"), ("h", "allow", "/p/o"),
            ("h", "disallow", "/p/ok"),
            ("h", "allow", "/t/"), ("h", "disallow", "/t/"),
        ],
        ["host", "rule", "path_prefix"],
    )
    urls = spark.createDataFrame(
        [
            ("https://h/p/okay",),          # longest prefix /p/ok -> disallow
            ("https://h/p/other",),         # /p/o allow beats /p/ disallow
            ("https://h/t/x",),             # equal length -> allow wins
            ("https://h/free",),            # no match -> allowed, NULLs
            ("https://elsewhere/p/okay",),  # host without rules -> allowed
            ("HTTP://User@H:8080/p/okay",), # userinfo/port/case stripped
            ("https://h",),                 # empty path -> '/'
        ],
        ["url"],
    )
    got = {
        r["url"]: (r["allowed"], r["matched_rule"], r["matched_prefix"], r["path"])
        for r in robots_filter(urls, rules, "url").collect()
    }
    assert got["https://h/p/okay"] == (False, "disallow", "/p/ok", "/p/okay")
    assert got["https://h/p/other"] == (True, "allow", "/p/o", "/p/other")
    assert got["https://h/t/x"] == (True, "allow", "/t/", "/t/x")
    assert got["https://h/free"] == (True, None, None, "/free")
    assert got["https://elsewhere/p/okay"][0] is True
    assert got["HTTP://User@H:8080/p/okay"] == (
        False, "disallow", "/p/ok", "/p/okay"
    )
    assert got["https://h"] == (True, None, None, "/")


def test_anchor_text_edge_whitespace(spark):
    """r6 review finding: tab/newline-padded anchors must merge with
    their clean spelling, and whitespace-only anchors of ANY kind
    (not just 0x20) are dropped."""
    links = spark.createDataFrame(
        [("t", "\tfoo"), ("t", "foo"), ("t", "foo\n"), ("t", "\t"),
         ("t", " \r\n ")],
        ["dst", "anchor"],
    )
    got = anchor_text_topk(links, "dst", "anchor", k=3).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["anchor"], r["n_mentions"], r["n_inlinks"],
            r["n_unique_anchors"]) == ("foo", 3, 3, 1)


def test_crawl_delays_group_semantics(spark):
    """Crawl-delay resolves with the same group machinery: named agent
    suppresses '*', non-numeric values ignored, max of the chosen
    groups wins, hosts without a parseable delay are absent."""
    from bertseyeview_spark.operators.weblinks import crawl_delays

    # the Disallow separates the two groups (a UA line directly after
    # another UA's delay would MERGE per RFC 9309: non-group-member
    # lines do not break a user-agent run — pinned separately below)
    r1 = ("User-agent: *\nDisallow: /a\nCrawl-delay: 2\n"
          "User-agent: bevbot\nCrawl-delay: 0.5\n")
    r2 = "User-agent: *\nCrawl-delay: 10\n"
    r3 = "User-agent: *\nCrawl-delay: soon\n"          # non-numeric
    r4 = "Crawl-delay: 9\nUser-agent: *\nDisallow: /x\n"  # pre-group: ignored
    r5 = ("User-agent: bevbot\nCrawl-delay: 1\n\n"
          "User-agent: bevbot\nCrawl-delay: 4\n")      # two named groups -> max
    df = spark.createDataFrame(
        [("h1", r1), ("h2", r2), ("h3", r3), ("h4", r4), ("h5", r5)],
        ["host", "robots_txt"],
    )
    got = {
        r["host"]: r["crawl_delay"]
        for r in crawl_delays(df, "host", "robots_txt", agent="bevbot").collect()
    }
    assert got == {"h1": 0.5, "h2": 10.0, "h5": 4.0}
    star = {
        r["host"]: r["crawl_delay"]
        for r in crawl_delays(df, "host", "robots_txt", agent="nobody").collect()
    }
    assert star == {"h1": 2.0, "h2": 10.0}


def test_crawl_delay_does_not_break_ua_adjacency(spark):
    """r6 second-review finding: an unrecognized-for-grouping line
    (Crawl-delay) between two User-agent lines must neither end the UA
    run nor start its own group (RFC 9309: such lines do not break a
    group) — both agents share the rules AND the delay."""
    from bertseyeview_spark.operators.weblinks import (
        crawl_delays,
        parse_robots,
    )

    body = ("User-agent: bevbot\nCrawl-delay: 1\nUser-agent: otherbot\n"
            "Disallow: /x\n")
    df = spark.createDataFrame([("h", body)], ["host", "robots_txt"])
    for agent in ("bevbot", "otherbot"):
        rules = {
            (r["rule"], r["path_prefix"])
            for r in parse_robots(df, "host", "robots_txt", agent=agent).collect()
        }
        assert rules == {("disallow", "/x")}, agent
        delays = {
            r["host"]: r["crawl_delay"]
            for r in crawl_delays(df, "host", "robots_txt", agent=agent).collect()
        }
        assert delays == {"h": 1.0}, agent


def test_parse_sitemaps(spark):
    """Both document kinds, entity decode, whitespace trim, lastmod day
    extraction, non-numeric priority -> NULL, entries without <loc>
    dropped, empty/null/namespace-prefixed XML -> zero rows."""
    from bertseyeview_spark.operators.weblinks import parse_sitemaps

    urlset = (
        '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://a/x?p=1&amp;q=2</loc>"
        "<lastmod>2024-05-06T01:02:03+00:00</lastmod>"
        "<changefreq>weekly</changefreq><priority>0.8</priority></url>"
        "<url><loc>\n  https://a/padded \n</loc><priority>soon</priority></url>"
        "<url><lastmod>2024-01-01</lastmod></url>"   # no loc -> dropped
        "</urlset>"
    )
    index = (
        "<sitemapindex><sitemap><loc>https://b/s1.xml</loc>"
        "<lastmod>2023-12-31</lastmod></sitemap></sitemapindex>"
    )
    prefixed = (
        "<sm:urlset><sm:url><sm:loc>https://c/x</sm:loc></sm:url></sm:urlset>"
    )
    df = spark.createDataFrame(
        [("a", urlset), ("b", index), ("c", prefixed), ("d", ""), ("e", None)],
        ["host", "xml"],
    )
    rows = parse_sitemaps(df, "host", "xml").collect()
    got = {(r["host"], r["loc"]): r for r in rows}
    assert set(got) == {
        ("a", "https://a/x?p=1&q=2"),
        ("a", "https://a/padded"),
        ("b", "https://b/s1.xml"),
    }
    r = got[("a", "https://a/x?p=1&q=2")]
    assert (r["kind"], r["lastmod"], str(r["lastmod_date"]),
            r["changefreq"], r["priority"]) == (
        "url", "2024-05-06T01:02:03+00:00", "2024-05-06", "weekly", 0.8
    )
    p = got[("a", "https://a/padded")]
    assert (p["priority"], p["lastmod"], p["changefreq"]) == (None, None, None)
    b = got[("b", "https://b/s1.xml")]
    assert (b["kind"], str(b["lastmod_date"])) == ("sitemap", "2023-12-31")


def test_parse_sitemaps_review_edges(spark):
    """r6 third-review findings: a urlset whose comment mentions
    '<sitemapindex' must NOT be misclassified (kind comes from the
    first root tag), an uppercase root yields zero rows (never
    garbage), and a CDATA-wrapped loc is stripped to the bare URL."""
    from bertseyeview_spark.operators.weblinks import parse_sitemaps

    tricky = (
        "<!-- generated; this is not a <sitemapindex> document -->\n"
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc><![CDATA[https://a/x?p=1]]></loc></url>"
        "<!-- <url><loc>https://a/commented-out</loc></url> -->"
        "<url><loc>https://a/y</loc></url></urlset>"
    )
    upper = "<SITEMAPINDEX><SITEMAP><LOC>https://b/s.xml</LOC></SITEMAP></SITEMAPINDEX>"
    df = spark.createDataFrame(
        [("a", tricky), ("b", upper)], ["host", "xml"]
    )
    rows = parse_sitemaps(df, "host", "xml").collect()
    got = {(r["host"], r["loc"]): r["kind"] for r in rows}
    assert got == {
        ("a", "https://a/x?p=1"): "url",
        ("a", "https://a/y"): "url",
    }


def test_sitemap_parse_plan_zero_shuffle(spark, sf_dir):
    """The parse is a narrow per-file map: no Exchange, no join, and
    the Generate must carry the per-file entry array, not the xml
    body (kind + entries materialize before the explode)."""
    import __spark_entry__ as E

    df = E.queries()["sitemap_parse"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the r8 scan-spread repartition (round-robin, right after the
    # read — __spark_entry__._t) is allowed; any KEYED exchange is not
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "RoundRobinPartitioning" in line, line
    assert "hashpartitioning" not in plan
    assert "Join" not in plan
    gen = [l for l in plan.splitlines() if "Generate" in l]
    assert gen and all("xml" not in l for l in gen)


def test_crawl_discovery_composition(spark):
    """The composed plan's cross-leg agreements: one canonicalizer
    feeds the union dedup, the robots host key, and the anchor target
    key — messy spellings on ANY leg must land on the same row."""
    from bertseyeview_spark.plans.crawl_discovery import discover_urls

    fetched = spark.createDataFrame(
        [
            # messy: canonicalizes to https://site.example/private/x
            ("HTTPS://bot@SITE.Example:443/private/x#top",),
            # trailing slash: -> https://site.example/pub/a
            ("https://site.example/pub/a/",),
            # also arrives via the sitemap -> both flags
            ("https://site.example/both",),
            ("https://other.example/free",),
        ],
        "url string",
    )
    robots = spark.createDataFrame(
        [("site.example", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string",
    )
    sitemaps = spark.createDataFrame(
        [
            (
                "site.example",
                "<urlset><url><loc>https://site.example/both</loc></url>"
                "<url><loc>  https://SITE.example/private/smap  </loc></url>"
                "</urlset>",
            ),
            (
                "idx.example",
                "<sitemapindex><sitemap><loc>https://idx.example/s.xml"
                "</loc></sitemap></sitemapindex>",
            ),
        ],
        "host string, xml string",
    )
    links = spark.createDataFrame(
        [
            # messy dst -> must name https://site.example/pub/a
            ("https://site.example:443/pub/a", "Alpha  Page"),
            ("https://site.example/pub/a", "alpha page"),
            ("https://site.example/pub/a", "Other Name"),
            ("https://site.example/both", "   "),  # whitespace-only only
        ],
        "dst string, anchor string",
    )
    rows = {
        r["url"]: r
        for r in discover_urls(fetched, robots, sitemaps, links).collect()
    }
    # messy fetch spelling canonicalized, then gated by the
    # lowercase-host rules
    assert set(rows) == {
        "https://site.example/private/x", "https://site.example/pub/a",
        "https://site.example/both", "https://other.example/free",
        "https://site.example/private/smap",
    }
    r = rows["https://site.example/private/x"]
    assert (r["allowed"], r["matched_rule"]) == (False, "disallow")
    assert (r["from_fetched"], r["from_sitemap"]) == (True, False)
    # sitemap-discovered URL is gated too (messy sitemap host spelling
    # canonicalized first)
    s = rows["https://site.example/private/smap"]
    assert (s["allowed"], s["from_fetched"], s["from_sitemap"]) == (
        False, False, True,
    )
    # overlap carries both provenance flags
    b = rows["https://site.example/both"]
    assert (b["from_fetched"], b["from_sitemap"], b["allowed"]) == (
        True, True, True,
    )
    # whitespace-only anchors carry no naming evidence
    assert b["top_anchor"] is None and b["n_inlinks"] is None
    # naming: messy dst canonicalized onto the page row; 'alpha page'
    # normalization merges two spellings (2 mentions > 1)
    a = rows["https://site.example/pub/a"]
    assert (a["top_anchor"], a["top_anchor_mentions"], a["n_inlinks"]) == (
        "alpha page", 2, 3,
    )
    # the sitemapindex host contributes no page URLs; a host with no
    # robots rules is allowed
    f = rows["https://other.example/free"]
    assert f["allowed"] and f["matched_rule"] is None


def test_fetch_schedule_hand_walked(spark):
    """Slots follow (priority desc, url asc) per host; delays join on
    the robots_filter host key (messy spellings canonicalize); hosts
    without a delay row get the default; max_per_host prunes exactly."""
    from bertseyeview_spark.operators.weblinks import fetch_schedule

    urls = spark.createDataFrame(
        [
            # messy spellings of host a.example (case, port, userinfo)
            ("HTTPS://A.Example:443/x", 5),
            ("https://bot@a.example/y", 9),
            ("https://a.example/z", 9),   # ties with /y -> url asc
            ("https://a.example/w", 1),   # pruned at max_per_host=3
            ("https://b.example/only", 7),
        ],
        "url string, priority int",
    )
    delays = spark.createDataFrame(
        [("a.example", 2.5)], "host string, crawl_delay double"
    )
    rows = {
        r["url"]: r
        for r in fetch_schedule(
            urls, delays, priority_col="priority",
            default_delay=1.0, max_per_host=3,
        ).collect()
    }
    # pruned: /w (lowest priority beyond the top-3)
    assert set(rows) == {
        "HTTPS://A.Example:443/x", "https://bot@a.example/y",
        "https://a.example/z", "https://b.example/only",
    }
    # order on a.example: the 9-priority tie breaks on the RAW url
    # string ('https://a.example/z' < 'https://bot@a.example/y'),
    # then /x (priority 5)
    assert rows["https://a.example/z"]["slot"] == 0
    assert rows["https://bot@a.example/y"]["slot"] == 1
    assert rows["HTTPS://A.Example:443/x"]["slot"] == 2
    assert rows["HTTPS://A.Example:443/x"]["fetch_at_sec"] == 2 * 2.5
    assert rows["https://a.example/z"]["delay_sec"] == 2.5
    # host without a delay row -> default
    b = rows["https://b.example/only"]
    assert (b["slot"], b["delay_sec"], b["fetch_at_sec"]) == (0, 1.0, 0.0)


def test_fetch_schedule_salted_prune_is_exact(spark):
    """The two-phase salted top-k prune equals the plain window on a
    skewed host (one host with many URLs, adversarial priorities)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bertseyeview_spark.operators.weblinks import fetch_schedule

    n = 200
    urls = spark.createDataFrame(
        [(f"https://hub.example/p/{i:04d}", (i * 37) % 50) for i in range(n)]
        + [(f"https://tiny.example/{i}", i) for i in range(3)],
        "url string, priority int",
    )
    delays = spark.createDataFrame(
        [("hub.example", 3.0)], "host string, crawl_delay double"
    )
    got = sorted(
        (r["host"], r["slot"], r["url"], r["fetch_at_sec"])
        for r in fetch_schedule(
            urls, delays, priority_col="priority",
            default_delay=0.5, max_per_host=25,
        ).collect()
    )
    w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("url"))
    host = F.regexp_extract(
        F.col("url"), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1
    )
    want = sorted(
        (r["host"], r["rn"] - 1, r["url"],
         (r["rn"] - 1) * (3.0 if r["host"] == "hub.example" else 0.5))
        for r in urls.select("url", "priority", host.alias("host"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 25)
        .collect()
    )
    assert got == want


def test_crawl_discovery_without_links(spark):
    """links=None: the naming columns are typed NULLs, everything else
    works — the discovery legs are independent of the anchor leg."""
    from bertseyeview_spark.plans.crawl_discovery import discover_urls

    fetched = spark.createDataFrame(
        [("https://s.example/a",)], "url string"
    )
    robots = spark.createDataFrame(
        [("s.example", "User-agent: *\nDisallow: /a\n")],
        "host string, robots_txt string",
    )
    sitemaps = spark.createDataFrame(
        [("s.example", "<urlset><url><loc>https://s.example/b</loc></url></urlset>")],
        "host string, xml string",
    )
    rows = {r["url"]: r for r in discover_urls(fetched, robots, sitemaps).collect()}
    assert set(rows) == {"https://s.example/a", "https://s.example/b"}
    assert rows["https://s.example/a"]["allowed"] is False
    assert rows["https://s.example/b"]["allowed"] is True
    for r in rows.values():
        assert r["top_anchor"] is None
        assert r["top_anchor_mentions"] is None
        assert r["n_inlinks"] is None
