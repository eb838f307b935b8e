"""Motif finding over the edge table — GraphFrames-style pattern joins.

Reference analogue: the store's multi-hop Cypher MATCH patterns (e.g.
the pathway/GO jump query, neo4j_helper.py:426-470, and the viz
virtual-edge expansions). Cypher's MATCH is a join chain; here a motif
pattern compiles directly to Catalyst equi-joins:

    find_motif(edges, "(a)-[citing]->(b); (b)-[has_named_entity]->(c)")

Each `(x)-[rel]->(y)` term is one filtered view of the edge table with
its endpoints renamed to the variable names; terms join on shared
variables. The output is one row per distinct variable binding.

Scale shape: k-term motifs are k-1 equi-joins keyed on the shared
variables — the same plan Cypher compiles to, with Catalyst free to
reorder/broadcast. Anonymous relationships use `*`:
``(a)-[*]->(b)`` matches any rel (the rel name is not returned).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TERM_RE = re.compile(
    r"^\(\s*(\w+)\s*\)\s*-\s*\[\s*([\w*]+)\s*\]\s*->\s*\(\s*(\w+)\s*\)$"
)


def parse_pattern(pattern: str) -> list[tuple[str, str, str]]:
    """'(a)-[rel]->(b); ...' -> [(src_var, rel, dst_var), ...]."""
    terms = []
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _TERM_RE.match(raw)
        if not m:
            raise ValueError(f"bad motif term: {raw!r}")
        terms.append((m.group(1), m.group(2), m.group(3)))
    if not terms:
        raise ValueError("empty motif pattern")
    return terms


def find_motif(edges: DataFrame, pattern: str) -> DataFrame:
    """Edge table (src, rel, dst) x motif pattern -> one row per
    distinct variable binding, columns = variables in first-appearance
    order. Repeated variables inside one term (self loops) and across
    terms both constrain the join as in Cypher."""
    terms = parse_pattern(pattern)
    out: DataFrame | None = None
    bound: list[str] = []
    for i, (sv, rel, dv) in enumerate(terms):
        t = edges.select("src", "rel", "dst")
        if rel != "*":
            t = t.where(F.col("rel") == rel)
        if sv == dv:  # self loop within a term -> one column
            t = t.where(F.col("src") == F.col("dst")).select(
                F.col("src").alias(sv)
            )
        else:
            t = t.select(F.col("src").alias(sv), F.col("dst").alias(dv))
        if out is None:
            out = t
            bound = list(dict.fromkeys([sv, dv]))
            continue
        shared = [v for v in (sv, dv) if v in bound]
        if shared:
            out = out.join(t, on=shared)
        else:
            # disconnected motif component: cross product of bindings
            out = out.crossJoin(t)
        bound += [v for v in (sv, dv) if v not in bound]
    return out.select(*bound).distinct()
