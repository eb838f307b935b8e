"""The end-to-end crawl-discovery recipe — one composed plan.

What a crawl scheduler actually runs over the discovery surface, as a
single declarative composition of the engine's proven web operators
(the :mod:`.cleaning` discipline — real users run these legs together,
and composition is where key/normalization mismatches hide):

    fetched URLs (WARC ingest or frontier)  --+
    sitemap <urlset> entries                --+--> canonical_url
                                                  -> union w/ provenance
                                                  -> robots gate (RFC 9309)
                                                  -> anchor-text naming

Every URL population passes through the SAME :func:`canonical_url`
normalization BEFORE any join — one spelling per page is what makes
the union dedup, the robots host equi-join, and the anchor-target join
agree (robots_filter's own host extraction then sees already-canonical
URLs, so its lowercase/port/userinfo handling and the canonicalizer
can never disagree on the join key).

Every output row carries its full per-stage lineage: discovery
provenance (``from_fetched`` / ``from_sitemap``), the gate verdict
(``allowed`` + the matched rule/prefix), and the naming evidence (top
anchor + in-link mass) — per-stage counts are one groupBy away, the
corpus_clean audit shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import canonical_url
from ..operators.weblinks import anchor_text_topk, parse_robots, robots_filter
from ..operators.weblinks import parse_sitemaps


def discover_urls(
    fetched: DataFrame,
    robots: DataFrame,
    sitemaps: DataFrame,
    links: DataFrame | None = None,
    *,
    url_col: str = "url",
    robots_host_col: str = "host",
    robots_text_col: str = "robots_txt",
    sitemap_host_col: str = "host",
    sitemap_xml_col: str = "xml",
    link_dst_col: str = "dst",
    link_anchor_col: str = "anchor",
    agent: str = "*",
) -> DataFrame:
    """-> one row per discovered canonical URL:

        (url, host, path, from_fetched, from_sitemap, allowed,
         matched_rule, matched_prefix, top_anchor, top_anchor_mentions,
         n_inlinks)

    ``fetched`` is a frame of fetched/frontier URLs (``url_col``),
    ``robots`` the per-host robots.txt bodies, ``sitemaps`` the
    per-host sitemap XML bodies (only ``<urlset>`` entries contribute
    page URLs — ``<sitemapindex>`` children are fetch-next scheduler
    work, not discovered pages), ``links`` an optional (dst, anchor)
    link table whose rank-1 normalized anchor becomes the page's
    naming evidence. NULL naming/matched columns mean "no evidence" /
    "no rule matched", never a dropped row.

    Distributed shape: canonicalization is a codegen expression fused
    into each scan; the union dedup is ONE groupBy on the canonical
    url; the robots gate is one host equi-join (rules side is
    robots-file-sized — broadcast); naming is the salted two-phase
    top-k join. Nothing here materializes more state than the URL set
    itself, so the plan holds at crawl scale.
    """
    fetched_urls = fetched.select(
        canonical_url(F.col(url_col)).alias("url"),
        F.lit(True).alias("from_fetched"),
        F.lit(False).alias("from_sitemap"),
    )
    pages = parse_sitemaps(sitemaps, sitemap_host_col, sitemap_xml_col)
    sitemap_urls = pages.where(F.col("kind") == "url").select(
        canonical_url(F.col("loc")).alias("url"),
        F.lit(False).alias("from_fetched"),
        F.lit(True).alias("from_sitemap"),
    )
    discovered = (
        fetched_urls.unionByName(sitemap_urls)
        .groupBy("url")
        .agg(
            F.max("from_fetched").alias("from_fetched"),
            F.max("from_sitemap").alias("from_sitemap"),
        )
    )
    rules = parse_robots(robots, robots_host_col, robots_text_col, agent=agent)
    gated = robots_filter(discovered.select("url"), rules, "url")
    out = gated.join(discovered, "url")
    if links is not None:
        naming = anchor_text_topk(
            links.select(
                canonical_url(F.col(link_dst_col)).alias("dst"),
                F.col(link_anchor_col).alias("anchor"),
            ),
            "dst",
            "anchor",
            k=1,
        )
        top = naming.where(F.col("rank") == 1).select(
            F.col("id").alias("url"),
            F.col("anchor").alias("top_anchor"),
            F.col("n_mentions").alias("top_anchor_mentions"),
            "n_inlinks",
        )
        out = out.join(top, "url", "left")
    else:
        out = out.select(
            "*",
            F.lit(None).cast("string").alias("top_anchor"),
            F.lit(None).cast("bigint").alias("top_anchor_mentions"),
            F.lit(None).cast("bigint").alias("n_inlinks"),
        )
    return out.select(
        "url", "host", "path", "from_fetched", "from_sitemap", "allowed",
        "matched_rule", "matched_prefix", "top_anchor",
        "top_anchor_mentions", "n_inlinks",
    )
