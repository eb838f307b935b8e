"""Web-link-graph operators: anchor-text aggregation and robots.txt
policy filtering.

Both are standard stages of a web-scale KG-construction pipeline that
the reference (a PubMed-shaped engine) never needed: anchor text is
the classic surface-form evidence for entity naming/linking (the link
graph votes on what a page is called), and robots rules gate which
fetched URLs may be used at all. They operate on the same
url-keyed corpus shape as the rest of this engine (north-rule input
hint) and stay entirely JVM-side — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_WS = r"[ \t\n\x0B\f\r]+"


def anchor_text_topk(
    links: DataFrame,
    dst_col: str,
    anchor_col: str,
    k: int = 3,
    min_count: int = 1,
) -> DataFrame:
    """Per-target anchor-text profile — for every link target, the
    top-``k`` normalized anchor strings with counts, plus the target's
    in-link totals. Anchor text is how the web names a page: the
    aggregated profile feeds entity naming / linking (the same
    surface-form evidence operators/linking.py consumes) and is the
    textbook KG-construction signal the PageRank-family operators
    don't capture.

    Anchors are normalized (lowercase, trim, inner whitespace
    collapsed — the ``norm_tokens`` whitespace class) and empty /
    whitespace-only anchors are dropped up front: they carry no naming
    evidence and on real crawls are a double-digit fraction of links.
    Returns one row per (target, rank):

        (id, n_inlinks, n_unique_anchors, rank, anchor, n_mentions)

    ``n_inlinks`` counts the surviving (non-empty-anchor) links;
    ``rank`` orders by (count desc, anchor asc) — a total order, so
    output is deterministic under any partitioning. Totals are
    computed from the UNFILTERED pair counts, so ``min_count`` (which
    prunes the ranked list) never changes a target's reported in-link
    mass or unique-anchor count.

    Distributed shape: ONE (target, anchor) grouped count with
    map-side combine (the shuffle carries pre-aggregated pairs, not
    links), per-target totals as a second grouped agg over that
    (already partitioned on the target key), and the top-k as a
    TWO-PHASE window: anchors are salted into ``n_salts`` buckets by
    anchor hash, each (target, bucket) keeps its local top-k, and the
    final per-target window sorts only the <= n_salts*k survivors.
    Because the pair counts are already final when the buckets are
    cut, every true global top-k anchor is within its bucket's top-k,
    so the two-phase result is EXACT — a mega-hub whose unique-anchor
    vocabulary is millions of rows never sorts its full vocabulary in
    one window partition (the r6 watch item), yet no exactness opt-in
    is needed. ``min_count`` remains the optional mass prune for the
    ranked list.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    n_salts = 16
    # collapse BEFORE trimming: trim() strips only 0x20, so a
    # tab/newline-padded anchor would otherwise survive as ' ' or
    # ' foo' and fragment counts (r6 review finding)
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(anchor_col)), _WS, " ")
    )
    pairs = (
        links.select(F.col(dst_col).alias("id"), norm.alias("anchor"))
        .where(F.col("anchor") != "")
        .groupBy("id", "anchor")
        .agg(F.count("*").alias("n_mentions"))
    )
    # totals BEFORE any min_count prune: n_inlinks/n_unique_anchors
    # describe the target's full in-link mass (ADVICE r6)
    totals = pairs.groupBy("id").agg(
        F.sum("n_mentions").cast("bigint").alias("n_inlinks"),
        F.count("*").alias("n_unique_anchors"),
    )
    ranked = pairs
    if min_count > 1:
        ranked = ranked.where(F.col("n_mentions") >= min_count)
    order = (F.desc("n_mentions"), F.asc("anchor"))
    w_local = Window.partitionBy("id", "_salt").orderBy(*order)
    cand = (
        ranked.withColumn(
            "_salt", F.pmod(F.xxhash64("anchor"), F.lit(n_salts))
        )
        .withColumn("_lr", F.row_number().over(w_local))
        .where(F.col("_lr") <= k)
    )
    w = Window.partitionBy("id").orderBy(*order)
    topk = cand.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
    return topk.join(totals, "id").select(
        "id", "n_inlinks", "n_unique_anchors", "rank", "anchor",
        "n_mentions",
    )


def parse_robots(
    robots: DataFrame,
    host_col: str,
    text_col: str,
    agent: str = "*",
) -> DataFrame:
    """Parse raw robots.txt bodies into per-host (rule, path_prefix)
    rows for one crawler identity — the REP group semantics of
    RFC 9309: consecutive ``User-agent`` lines open a group, the
    group's rules run until the next group starts, and a crawler obeys
    the most specific matching group ONLY (its own product token if
    any group names it, else the ``*`` groups; never both).

    Line handling: ``#`` comments stripped, keys case-insensitive,
    values trimmed; rules before any ``User-agent`` line are ignored
    (no group); an EMPTY ``Disallow:`` value (the classic
    "allow everything" idiom) and empty ``Allow:`` values match
    nothing and are dropped. Agent matching is exact-token or ``*``
    (RFC product-token prefix matching is deliberately out of scope —
    callers pass the token they crawl under). Wildcards inside paths
    (``*``/``$``) are NOT interpreted; prefixes are literal, the
    original REP semantics (documented limitation shared with
    :func:`robots_filter`).

    Distributed shape: posexplode of lines, then two per-host windows
    ordered by line number — a lag to detect group starts (a
    User-agent line whose predecessor was not one) and a running sum
    to assign group ids — the gaps-and-islands idiom
    (operators/dedup.py uses the same shape for span merge). Group
    selection is one per-host aggregate joined back; everything is
    JVM-side and per-host state is a robots file (KiB), so no skew.

    Returns (host, rule, path_prefix) with rule in {'allow',
    'disallow'}.
    """
    grouped, chosen = _robot_groups(robots, host_col, text_col, agent)
    rules = grouped.where(
        F.col("kind").isin("allow", "disallow")
        & (F.col("grp") > 0)
        & (F.col("val") != "")
    ).select("host", "grp", F.col("kind").alias("rule"),
             F.col("val").alias("path_prefix"))
    return rules.join(chosen, ["host", "grp"]).select(
        "host", "rule", "path_prefix"
    ).distinct()


def _robot_groups(robots, host_col, text_col, agent):
    """Shared REP group machinery: line classify -> group-start lag ->
    running-sum group ids -> most-specific group choice. Returns
    (grouped typed lines, chosen (host, grp) groups)."""
    a = agent.strip().lower()
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("line_no", "raw"),
    )
    clean = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    key = F.lower(F.trim(F.regexp_extract(clean, "^([^:]+):", 1)))
    val = F.trim(F.regexp_extract(clean, "^[^:]+:(.*)$", 1))
    typed = lines.select(
        "host",
        "line_no",
        F.when(key == "user-agent", F.lit("ua"))
        .when(key == "allow", F.lit("allow"))
        .when(key == "disallow", F.lit("disallow"))
        .when(key == "crawl-delay", F.lit("delay"))
        .alias("kind"),
        val.alias("val"),
    ).where(F.col("kind").isNotNull())
    byline = Window.partitionBy("host").orderBy("line_no")
    # group-start detection looks at the previous NON-delay line: per
    # RFC 9309 2.2.2 only allow/disallow are group-member lines, and
    # other lines "MUST NOT be treated as ending a group", so a
    # Crawl-delay between two User-agent lines neither ends the UA run
    # (the agents share one group — the rules AND the delay) nor
    # starts a group of its own (r6 second-review finding; NOTE this
    # is the RFC reading — protego-style parsers instead treat a
    # recognized delay as closing the UA run, a documented divergence
    # and the more-restrictive/polite choice when rules follow)
    prev_kind = F.last(
        F.when(F.col("kind") != "delay", F.col("kind")), ignorenulls=True
    ).over(byline.rowsBetween(Window.unboundedPreceding, -1))
    grouped = typed.withColumn(
        "_starts",
        (
            (F.col("kind") == "ua")
            & (F.coalesce(prev_kind, F.lit("")) != "ua")
        ).cast("int"),
    ).withColumn("grp", F.sum("_starts").over(byline))
    agents = (
        grouped.where((F.col("kind") == "ua") & (F.col("grp") > 0))
        .select("host", "grp", F.lower(F.col("val")).alias("agent"))
        .distinct()
    )
    # most-specific group set per host: the named token's groups if any
    # group names it, else the '*' groups
    named = agents.where(F.col("agent") == a).select("host", "grp")
    star = agents.where(F.col("agent") == "*").select("host", "grp")
    has_named = named.select("host").distinct()
    chosen = named.unionByName(
        star.join(has_named, "host", "left_anti")
    )
    return grouped, chosen


def crawl_delays(
    robots: DataFrame,
    host_col: str,
    text_col: str,
    agent: str = "*",
) -> DataFrame:
    """Per-host ``Crawl-delay`` for one crawler identity — the
    de-facto REP extension most crawl schedulers honor (not in
    RFC 9309; Google ignores it, Bing/Yandex apply it), resolved with
    the SAME group semantics as :func:`parse_robots` (named agent
    suppresses '*'). Returns (host, crawl_delay) for hosts whose
    chosen groups carry at least one parseable numeric delay; when
    several chosen groups disagree the MAXIMUM wins (the polite
    reading). Non-numeric values are ignored, matching the major
    crawlers' behavior.
    """
    grouped, chosen = _robot_groups(robots, host_col, text_col, agent)
    delays = grouped.where(
        (F.col("kind") == "delay") & (F.col("grp") > 0)
    ).select(
        "host", "grp", F.expr("try_cast(val AS double)").alias("delay")
    ).where(F.col("delay").isNotNull())
    return (
        delays.join(chosen, ["host", "grp"])
        .groupBy("host")
        .agg(F.max("delay").alias("crawl_delay"))
    )



def _url_host(u: Column) -> Column:
    """Host key from a URL column: lowercase, userinfo/port stripped,
    IPv6 literal brackets removed. SHARED by :func:`robots_filter` and
    :func:`fetch_schedule` — the gate and the budget must join on the
    same key, so there is exactly one copy of this extraction (the r7
    IPv6 fix had to land twice before this helper existed)."""
    host = F.lower(
        F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    )
    host = F.regexp_replace(host, r"^.*@", "")
    host = F.regexp_replace(host, r":\d+$", "")
    return F.regexp_replace(host, r"^\[|\]$", "")

def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str,
) -> DataFrame:
    """Gate URLs on parsed robots rules with RFC 9309 precedence:
    among the rules whose literal path prefix matches the URL's path,
    the LONGEST prefix wins, an ``allow`` beating a ``disallow`` of
    equal length; a URL with no matching rule (or no rules for its
    host at all) is allowed. Returns every input URL annotated —

        (url, host, path, allowed, matched_rule, matched_prefix)

    with NULL matched_* when nothing matched (filter-as-annotation,
    like gopher_quality_flags). Host extraction lowercases and strips
    port/userinfo and IPv6 literal brackets (``[2001:db8::1]:8080``
    joins as ``2001:db8::1``); the path keeps its query string (robots prefixes
    may legitimately match into ``?``); literal prefixes only (no
    ``*``/``$`` wildcard interpretation — see :func:`parse_robots`).

    Distributed shape: ONE equi-join on host. Rule sets per host are
    robots-file-sized (dozens of rows), so the per-URL candidate set
    after the join is tiny and the longest-match pick is a per-url
    window over those few rows; a boilerplate host with millions of
    URLs is handled by AQE skew split on the join key, and at crawl
    scale the rules side is usually small enough that Catalyst
    broadcast-plans it outright.
    """
    u = F.col(url_col)
    host = _url_host(u)
    path_raw = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1)
    path = F.when(path_raw == "", F.lit("/")).otherwise(path_raw)
    base = urls.select(
        u.alias("url"), host.alias("host"), path.alias("path")
    )
    # inner join + prefix filter finds MATCHING rules only; the left
    # join back onto base resurfaces URLs with zero matches (a host
    # with rules none of which match must stay allowed, not vanish)
    cand = base.join(rules, "host").where(
        F.col("path").startswith(F.col("path_prefix"))
    )
    w = Window.partitionBy("url").orderBy(
        F.desc(F.length("path_prefix")),
        F.desc(F.col("rule") == "allow"),
        F.asc("path_prefix"),
        F.asc("rule"),
    )
    best = (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "url",
            F.col("rule").alias("matched_rule"),
            F.col("path_prefix").alias("matched_prefix"),
        )
    )
    return base.join(best, "url", "left").select(
        "url",
        "host",
        "path",
        (
            F.col("matched_rule").isNull()
            | (F.col("matched_rule") == "allow")
        ).alias("allowed"),
        "matched_rule",
        "matched_prefix",
    )


def parse_sitemaps(
    sitemaps: DataFrame,
    host_col: str,
    xml_col: str,
) -> DataFrame:
    """Parse sitemap.org XML bodies — the third leg of the crawl
    discovery surface next to robots rules and WARC ingestion. Handles
    both document kinds: a ``<urlset>`` yields one row per ``<url>``
    entry with its optional fields, a ``<sitemapindex>`` yields one row
    per child ``<sitemap>`` (kind='sitemap' — the scheduler fetches
    those next). Returns

        (host, kind, loc, lastmod, lastmod_date, changefreq, priority)

    with kind in {'url', 'sitemap'}; ``lastmod`` is the raw W3C
    datetime string, ``lastmod_date`` its calendar day (the scheduling
    granularity crawl planners actually use — full timestamp+tz parse
    is deliberately out of scope), ``priority`` a double (non-numeric
    -> NULL), and ``loc`` XML-entity-decoded for the five predefined
    entities (a CDATA wrapper around the loc is stripped). Entries
    without a ``<loc>`` are dropped (nothing to fetch). Namespace
    prefixes and attributes on the entry tags are NOT handled (real
    sitemaps overwhelmingly use the default namespace); a prefixed
    feed parses to zero rows, never garbage. The document kind comes
    from the FIRST root-element tag in the file (not a raw substring
    scan, which a generator comment mentioning the other root would
    fool), matched case-sensitively like the entry tags — XML names
    are case-sensitive and the spec tags are lowercase.

    Distributed shape: the kind and the entry array are materialized
    ONCE PER FILE before the explode (so the Generate carries a short
    kind string, never the 50 MB-by-spec xml body, and the root scan
    runs once, not once per entry); per-entry field extraction is
    codegen'd regexp on the entry slice. A narrow per-file map with NO
    shuffle — the :func:`~..textquality.c4_line_filter` discipline.
    """
    # strip XML comments once per file BEFORE anything else: a comment
    # mentioning the other root tag must not flip the kind, and a
    # commented-out <url> entry must not be emitted
    xml = F.regexp_replace(
        F.coalesce(F.col(xml_col), F.lit("")), r"(?s)<!--.*?-->", ""
    )
    root = F.regexp_extract(
        xml, r"(?s)<\s*(urlset|sitemapindex)[\s>]", 1
    )
    entries = F.when(
        root == "sitemapindex",
        F.regexp_extract_all(xml, F.lit(r"(?s)<sitemap>(.*?)</sitemap>"), 1),
    ).otherwise(
        F.regexp_extract_all(xml, F.lit(r"(?s)<url>(.*?)</url>"), 1)
    )
    kind = F.when(root == "sitemapindex", F.lit("sitemap")).otherwise(
        F.lit("url")
    )
    # materialize kind + entries BEFORE the explode: computed once per
    # file, and the Generate never carries the xml body (r6 review)
    per_file = sitemaps.select(
        F.col(host_col).alias("host"),
        kind.alias("kind"),
        entries.alias("_entries"),
    )
    ex = per_file.select(
        "host", "kind", F.explode(F.col("_entries")).alias("_e")
    )
    def field(tag):
        return F.regexp_extract(
            F.col("_e"), rf"(?s)<{tag}>\s*(.*?)\s*</{tag}>", 1
        )
    loc = F.regexp_replace(
        field("loc"), r"^<!\[CDATA\[(.*)\]\]>$", "$1"
    )
    for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")]:
        loc = F.replace(loc, F.lit(ent), F.lit(ch))
    lastmod = F.nullif(field("lastmod"), F.lit(""))
    return ex.select(
        "host",
        "kind",
        loc.alias("loc"),
        lastmod.alias("lastmod"),
        F.substring(lastmod, 1, 10).try_cast("date").alias("lastmod_date"),
        F.nullif(field("changefreq"), F.lit("")).alias("changefreq"),
        F.nullif(field("priority"), F.lit("")).try_cast("double").alias(
            "priority"
        ),
    ).where(F.col("loc") != "")


def fetch_schedule(
    urls: DataFrame,
    delays: DataFrame,
    url_col: str = "url",
    priority_col: str | None = None,
    default_delay: float = 1.0,
    max_per_host: int | None = None,
) -> DataFrame:
    """Politeness fetch scheduler — turn a URL frontier plus per-host
    ``Crawl-delay`` budgets (:func:`crawl_delays` output: (host,
    crawl_delay)) into per-host fetch slots: the k-th URL of a host
    fetches no earlier than ``k * delay`` seconds into the crawl
    window. This is the scheduling leg every polite crawler runs
    between discovery (:mod:`..plans.crawl_discovery`) and fetching.

    Per host, URLs order by (priority desc, url asc) — a total order,
    deterministic under any partitioning; ``priority_col`` is the
    caller's ranking signal (PageRank, OPIC credit, sitemap
    priority...), absent = url-ordered. Hosts without a delay row get
    ``default_delay``. Returns
    (url, host, slot, delay_sec, fetch_at_sec) with slot 0-based and
    ``fetch_at_sec = slot * delay_sec`` (exact IEEE product of an int
    and the delay — bit-replayable).

    Per-host slot assignment is INHERENTLY sequential — politeness IS
    per-host serialization — so the per-host window is the semantic
    requirement, not an accident. The scale hazard is a mega-host
    sorting millions of frontier rows in one window partition:
    ``max_per_host`` is the budget knob — an EXACT two-phase top-k
    (the anchor_text_topk salting discipline: priorities are caller-
    final before bucketing, so each salt bucket's local top-k
    provably contains every global top-k member) prunes the frontier
    before the slot window, which then sorts <= 16*max_per_host rows
    per host. At 10^12 URLs you always set it: no crawl window is
    long enough for an unbounded per-host queue anyway.

    Host extraction IS :func:`robots_filter`'s (the shared
    ``_url_host`` expression) — the two operators agree on the join
    key by construction, or a host's gate and its budget would
    diverge.
    """
    u = F.col(url_col)
    host = _url_host(u)
    prio = (
        F.col(priority_col) if priority_col else F.lit(0)
    )
    base = urls.select(
        u.alias("url"), host.alias("host"), prio.alias("_prio")
    )
    order = (F.desc("_prio"), F.asc("url"))
    if max_per_host is not None:
        if max_per_host < 1:
            raise ValueError("max_per_host must be >= 1")
        n_salts = 16
        w_local = Window.partitionBy("host", "_salt").orderBy(*order)
        base = (
            base.withColumn(
                "_salt", F.pmod(F.xxhash64("url"), F.lit(n_salts))
            )
            .withColumn("_lr", F.row_number().over(w_local))
            .where(F.col("_lr") <= max_per_host)
            .drop("_salt", "_lr")
        )
    w = Window.partitionBy("host").orderBy(*order)
    ranked = base.withColumn("slot", F.row_number().over(w) - 1)
    if max_per_host is not None:
        ranked = ranked.where(F.col("slot") < max_per_host)
    d = delays.select(
        F.col("host"), F.col("crawl_delay").cast("double").alias("_d")
    )
    return (
        ranked.join(d, "host", "left")
        .select(
            "url",
            "host",
            F.col("slot").cast("int").alias("slot"),
            F.coalesce("_d", F.lit(float(default_delay))).alias("delay_sec"),
            (
                F.col("slot")
                * F.coalesce("_d", F.lit(float(default_delay)))
            ).alias("fetch_at_sec"),
        )
    )
