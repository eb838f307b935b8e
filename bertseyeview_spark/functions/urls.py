"""URL canonicalization for web-corpus hygiene.

Common-Crawl-style corpora key everything on the url (north-rule input
hint), and the same page arrives under many spellings: upper-case
scheme/host, explicit default ports, fragments, tracking parameters,
unordered query strings, trailing slashes. Canonicalizing BEFORE the
url-hash bucketing / dedup / citation joins is what makes "same page"
a single key — the standard first normalization pass of every crawl
pipeline (the reference keys articles by a normalized id the same way;
shared/helper/neo4j_helper.py MERGEs on the normalized id).

Everything here is a single Catalyst expression tree over one row — no
UDFs, no joins — so it fuses into whatever scan feeds it. The query
re-assembly uses split/filter/array_sort/array_join; ``filter`` is a
higher-order function (interpreted, not codegen'd), acceptable here
because query strings are a handful of short tokens per row, unlike
the per-document shingle arrays where the interpreted path measurably
dominated (see operators/dedup.py `shingle_table`).
"""

from __future__ import annotations

from pyspark.sql import functions as F

# dropped query parameters: click/campaign trackers that never change
# page identity (the public "tracking params" lists all start here).
# Deliberately NOT included: ``ref`` — on major sites it is
# content-bearing (branch selectors, product variants), so dropping it
# would merge genuinely different pages, losing content rather than
# spellings.
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|igshid)="


def canonical_url(col):
    """Canonical form of a URL column:

    * scheme and host lower-cased;
    * explicit default ports dropped (``:80`` for http, ``:443`` for
      https);
    * fragment removed;
    * tracking query parameters removed (:data:`TRACKING_PARAM_RE`),
      remaining parameters sorted bytewise and re-joined;
    * empty path becomes ``/``; trailing slashes on a non-root path
      are dropped;
    * userinfo (``user:pass@``) is dropped — credentials are not page
      identity; bracketed IPv6 hosts keep their brackets and ports
      split correctly.

    Rows that don't look like ``scheme://host...`` pass through with
    only the fragment stripped (garbage in, unchanged garbage out —
    never NULL, so downstream group-bys don't invent a null key).
    """
    u = F.regexp_replace(F.trim(col), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    # authority: strip userinfo (credentials are never page identity),
    # then split host/port with IPv6 bracket awareness — a plain
    # first-colon split would truncate 'user:pass@h' to 'user' and
    # '[::1]:8080' to '['
    authority = F.regexp_replace(
        F.regexp_extract(rest, r"^([^/?]*)", 1), r"^[^@]*@", ""
    )
    bracket = F.regexp_extract(authority, r"^(\[[^\]]*\])", 1)
    host = F.when(bracket != "", F.lower(bracket)).otherwise(
        F.lower(F.regexp_extract(authority, r"^([^:]*)", 1))
    )
    port = F.when(
        bracket != "",
        F.regexp_extract(authority, r"^\[[^\]]*\]:([0-9]+)$", 1),
    ).otherwise(F.regexp_extract(authority, r"^[^:]*:([0-9]+)$", 1))
    keep_port = ~(
        (port == F.lit(""))
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    raw_path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(
        F.when(
            F.length(raw_path) > 1, F.regexp_replace(raw_path, r"/+$", "")
        ).otherwise(raw_path)
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qcanon = F.array_join(params, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(
            F.lit("")
        ),
    )
    return F.when(scheme == "", u).otherwise(canon)
