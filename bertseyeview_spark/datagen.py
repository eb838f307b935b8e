"""Deterministic synthetic corpus generator.

Produces the exact input shape from BASELINE.json's input_hint —
``pages(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)`` — plus the broadcast ``alias_dict``, ``curation_rules``
and closed-form *expected* mention/triple oracles (FIXTURES.md §1-§4).

Design goals:

* **Fully deterministic** under a seed (hash-free of PYTHONHASHSEED:
  we use ``zlib.crc32`` and ``random.Random(seed)`` only), so the
  byte-identity and P/R checks are exact and local[8] == local[32].
* **Closed-form oracles**: every planted mention, link, keyword and
  relation sentence is recorded, then passed through the same
  canonicalization map the pipeline must discover, giving the expected
  (subj, pred, obj) set scored at P/R >= 0.95.
* **Skew knobs** (FIXTURES.md): a hub entity mentioned in ~30% of pages
  (stopword-like mega-hub -> exercises salted aggregation) and a
  celebrity page linked from ~20% of pages (PageRank/citation skew);
  plus a ``Null`` entity whose mentions must be cleaned
  (reference: neo4j_helper.py:2128-2129).

The reference analogue of this corpus is the PubMed/PubTator feed
(knowledge-graph-manager/__main__.py:224-435); here the corpus is
already a table, per the north rule.
"""

from __future__ import annotations

import datetime as dt
import random
import zlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

EMBED_DIM = 16

# ---------------------------------------------------------------------------
# Entity universe
# ---------------------------------------------------------------------------

# (canonical_id, type, [aliases])  — id shapes follow the reference's
# Type:Namespace:Id convention (pubtator_test_results.csv).
_ENTITIES: list[tuple[str, str, list[str]]] = [
    ("Disease:MESH:D000690", "disease", ["amyotrophic lateral sclerosis", "lou gehrig disease"]),
    ("Disease:MESH:D005234", "disease", ["steatohepatitis", "fatty liver disease"]),
    ("Disease:MESH:D003924", "disease", ["type 2 diabetes", "diabetes mellitus"]),
    ("Gene:6647", "gene", ["sod1", "superoxide dismutase 1"]),
    ("Gene:2671", "gene", ["gfer", "augmenter of liver regeneration"]),
    ("Gene:348", "gene", ["apoe", "apolipoprotein e"]),
    ("Gene:7124", "gene", ["tnf", "tumor necrosis factor"]),
    ("Chemical:MESH:D000069337", "chemical", ["riluzole"]),
    ("Chemical:MESH:D008687", "chemical", ["metformin"]),
    ("Chemical:MESH:D005947", "chemical", ["glucose"]),
    ("Species:9606", "species", ["human", "homo sapiens"]),
    ("Species:10090", "species", ["mouse", "mus musculus"]),
    # hub entity: stopword-like, mentioned in ~30% of pages
    ("Disease:MESH:D009369", "disease", ["tumor", "neoplasm"]),
    # near-duplicate canonical pair: same real-world entity under two
    # namespaces; canonicalization must merge them (min-id wins ->
    # Disease:MESH:D000690). Mirrors curate_annotations.json merges.
    ("Disease:OMIM:105400", "disease", ["als type 1"]),
]

# ambiguous alias: same surface -> two ids, resolved by sentence-context
# embedding similarity (SURVEY.md G6). "als" is a real PubTator ambiguity
# (disease ALS vs gene ALR/liver).
_AMBIGUOUS_ALIAS = "als"
_AMBIG_CANDIDATES = [
    ("Disease:MESH:D000690", "neurodegenerative motor neuron decline"),
    ("Gene:2671", "liver regeneration hepatocyte growth"),
]

# the Null entity: detected then cleaned (reference F8)
_NULL_ALIASES = {"unknown entity"}

_KEYWORDS = ["therapy", "biomarker", "clinical trial", "prognosis"]

# (phrase, predicate, inverted) — inverted phrases are passive voice:
# "B is inhibited by A" plants the triple (A, inhibits, B)
_RELATION_PATTERNS: list[tuple[str, str, bool]] = [
    (" interacts with ", "interacts_with", False),
    (" is associated with ", "associated_with", False),
    (" inhibits ", "inhibits", False),
    (" treats ", "treats", False),
    (" is inhibited by ", "inhibits", True),
    (" is treated with ", "treats", True),
]

_BOILERPLATE_NAV = "Home | About | Contact | Privacy Policy | Terms of Service"
_BOILERPLATE_FOOTER = "Copyright 2024 Example Corp. All rights reserved."

_LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "de", "fr"]


def _crc(s: str) -> int:
    return zlib.crc32(s.encode("utf-8"))


def token_embedding(token: str) -> np.ndarray:
    """Deterministic pseudo-embedding of a token (public trick: seeded
    Gaussian from a stable hash; no model download needed)."""
    rng = np.random.RandomState(_crc("tok:" + token) % (2**31))
    v = rng.standard_normal(EMBED_DIM)
    return v / np.linalg.norm(v)


def text_embedding(text: str) -> np.ndarray:
    toks = [t for t in text.lower().split() if t]
    if not toks:
        return np.zeros(EMBED_DIM)
    v = np.sum([token_embedding(t) for t in toks], axis=0)
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


@dataclass
class Corpus:
    pages: pd.DataFrame                 # url, warc_ts, html, text, lang
    alias_dict: pd.DataFrame            # alias, entity_id, entity_type, embedding
    curation_rules: pd.DataFrame        # method, from_id, to_id
    expected_triples: pd.DataFrame      # subj, pred, obj (post-canonicalization)
    expected_text: pd.DataFrame = field(default=None)  # url, text oracle

    @property
    def n_pages(self) -> int:
        return len(self.pages)


def build_alias_dict() -> pd.DataFrame:
    """Broadcast linking dictionary (FIXTURES.md §2). Embeddings are the
    text-embedding of the entity's context description so ambiguous
    mentions resolve by sentence-context cosine."""
    rows = []
    for eid, etype, aliases in _ENTITIES:
        desc = " ".join(aliases)
        for a in aliases:
            rows.append((a, eid, etype, text_embedding(a + " " + desc).astype(np.float32)))
    for eid, ctx in _AMBIG_CANDIDATES:
        rows.append((_AMBIGUOUS_ALIAS, eid, eid.split(":")[0].lower(),
                     text_embedding(ctx).astype(np.float32)))
    for a in _NULL_ALIASES:
        rows.append((a, "Null", "null", np.zeros(EMBED_DIM, dtype=np.float32)))
    return pd.DataFrame(rows, columns=["alias", "entity_id", "entity_type", "embedding"])


def build_curation_rules() -> pd.DataFrame:
    """Curation merge map (reference: input/global/curate_annotations.json
    driven through neo4j_helper.py:803-842). Merge the OMIM duplicate of
    ALS into its MESH canonical id."""
    return pd.DataFrame(
        [("merge", "Disease:OMIM:105400", "Disease:MESH:D000690")],
        columns=["method", "from_id", "to_id"],
    )


def _canon_map() -> dict[str, str]:
    return dict(
        zip(build_curation_rules()["from_id"], build_curation_rules()["to_id"])
    )


def generate_corpus(
    n_pages: int,
    seed: int = 42,
    min_sentences: int = 2,
    max_sentences: int = 5,
) -> Corpus:
    """Generate ``n_pages`` synthetic web pages with planted facts.

    Each page gets 2-5 sentences; a sentence is either a relation
    sentence (two entities + pattern), a plain-mention sentence, an
    ambiguous-alias sentence (with a disambiguating context clause), or
    a Null-entity sentence. ~30% of pages mention the hub entity; ~20%
    link to the celebrity page; each page links to 0-3 others.
    """
    rng = random.Random(seed)
    canon = _canon_map()
    ent_by_idx = _ENTITIES
    hub_id = "Disease:MESH:D009369"
    hub_aliases = ["tumor", "neoplasm"]

    urls = [f"https://example.org/page/{i:08d}" for i in range(n_pages)]
    celebrity = urls[0]
    base_ts = dt.datetime(2024, 1, 1)

    page_rows = []
    triple_rows: list[tuple[str, str, str]] = []

    for i, url in enumerate(urls):
        prng = random.Random(seed * 1_000_003 + i)
        lang = _LANGS[prng.randrange(len(_LANGS))]
        title = f"Report {i}: findings on web page {i}"
        sentences: list[str] = []
        mentions_here: list[str] = []  # canonical ids mentioned on this page

        def plant_mention(eid: str, surface: str) -> None:
            cid = canon.get(eid, eid)
            if cid != "Null":
                triple_rows.append((url, "has_named_entity", cid))
                mentions_here.append(cid)

        n_sent = prng.randint(min_sentences, max_sentences)
        for _ in range(n_sent):
            kind = prng.random()
            if kind < 0.45:
                # relation sentence between two distinct entities
                a_idx, b_idx = prng.sample(range(len(ent_by_idx)), 2)
                aid, _, aal = ent_by_idx[a_idx]
                bid, _, bal = ent_by_idx[b_idx]
                asurf = aal[prng.randrange(len(aal))]
                bsurf = bal[prng.randrange(len(bal))]
                phrase, pred, inverted = _RELATION_PATTERNS[
                    prng.randrange(len(_RELATION_PATTERNS))
                ]
                sentences.append(f"{asurf.capitalize()}{phrase}{bsurf}.")
                plant_mention(aid, asurf)
                plant_mention(bid, bsurf)
                ca, cb = canon.get(aid, aid), canon.get(bid, bid)
                if ca != cb:
                    triple_rows.append(
                        (cb, pred, ca) if inverted else (ca, pred, cb)
                    )
            elif kind < 0.70:
                # plain mention sentence
                eidx = prng.randrange(len(ent_by_idx))
                eid, _, eal = ent_by_idx[eidx]
                surf = eal[prng.randrange(len(eal))]
                sentences.append(f"Researchers studied {surf} in a recent cohort.")
                plant_mention(eid, surf)
            elif kind < 0.85:
                # ambiguous alias with disambiguating context
                tgt, ctx = _AMBIG_CANDIDATES[prng.randrange(2)]
                sentences.append(
                    f"The role of {_AMBIGUOUS_ALIAS} in {ctx} was examined."
                )
                plant_mention(tgt, _AMBIGUOUS_ALIAS)
            else:
                # Null entity — detected, then cleaned; no expected triple
                sentences.append("An unknown entity appeared in the registry.")

        if prng.random() < 0.30:
            surf = hub_aliases[prng.randrange(2)]
            sentences.append(f"The sample also showed {surf} markers.")
            plant_mention(hub_id, surf)

        # keywords (reference F2: additional_keywords found in text)
        for kw in _KEYWORDS:
            if prng.random() < 0.15:
                sentences.append(f"This {kw} result needs validation.")
                triple_rows.append((url, "contains", f"Keyword:{kw}"))

        # outbound links -> citing edges
        links: list[str] = []
        if i > 0 and prng.random() < 0.20:
            links.append(celebrity)
        for _ in range(prng.randint(0, 3)):
            j = prng.randrange(n_pages)
            if urls[j] != url and urls[j] not in links:
                links.append(urls[j])
        for dst in links:
            triple_rows.append((url, "citing", dst))

        body = " ".join(sentences)
        text = f"{title}\n{body}"
        anchor_html = "".join(
            f'<a href="{dst}">ref {k}</a>' for k, dst in enumerate(links)
        )
        html = (
            "<html><head><title>" + title + "</title></head><body>"
            + "<nav>" + _BOILERPLATE_NAV + "</nav>"
            + "<article><p>" + body + "</p></article>"
            + "<aside>" + anchor_html + "</aside>"
            + "<footer>" + _BOILERPLATE_FOOTER + "</footer>"
            + "</body></html>"
        )
        ts = base_ts + dt.timedelta(minutes=i % (60 * 24 * 90))
        page_rows.append((url, ts, html.encode("utf-8"), text, lang))

    pages = pd.DataFrame(
        page_rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )
    expected = (
        pd.DataFrame(triple_rows, columns=["subj", "pred", "obj"])
        .drop_duplicates()
        .reset_index(drop=True)
    )
    return Corpus(
        pages=pages,
        alias_dict=build_alias_dict(),
        curation_rules=build_curation_rules(),
        expected_triples=expected,
        expected_text=pages[["url", "text"]].copy(),
    )


def pages_to_spark(spark, corpus_or_pdf, num_partitions: int | None = None):
    """Create the Spark ``pages`` DataFrame with the exact input_hint
    schema. In production this is ``spark.read.table("pages")`` on an
    Iceberg catalog with hidden partitioning ``days(warc_ts)``."""
    from pyspark.sql import types as T

    pdf = (
        corpus_or_pdf.pages if isinstance(corpus_or_pdf, Corpus) else corpus_or_pdf
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    df = spark.createDataFrame(pdf, schema=schema)
    if num_partitions:
        df = df.repartition(num_partitions, "url")
    return df


def alias_dict_to_spark(spark, alias_pdf: pd.DataFrame):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("alias", T.StringType(), False),
            T.StructField("entity_id", T.StringType(), False),
            T.StructField("entity_type", T.StringType(), True),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        ]
    )
    pdf = alias_pdf.copy()
    pdf["embedding"] = pdf["embedding"].map(lambda v: [float(x) for x in v])
    return spark.createDataFrame(pdf, schema=schema)
