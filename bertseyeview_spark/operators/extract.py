"""E1 — trafilatura-style main-text extraction from raw HTML.

Reference analogue: the PubTator/BioC text acquisition path
(knowledge-graph-manager/__main__.py:311-435 and :553-723) which yields
title + abstract/full text per article. Here the input is a binary
``html`` column on the pages table and the contract (BASELINE.json
input_hint) is **byte-identical extracted text per url**, so the
extractor is pure, deterministic Python executed as a *batched Arrow
UDF* via ``mapInPandas`` — never per-row Python UDFs.

Extraction rules (deterministic boilerplate removal, the public
trafilatura idea in miniature):

* the ``<title>`` is the first line;
* text inside ``<p>`` elements that are NOT inside ``<nav>``,
  ``<aside>``, ``<footer>``, ``<script>`` or ``<style>`` is kept,
  paragraphs joined with a single space;
* entities are HTML-unescaped; whitespace inside a paragraph is
  collapsed to single spaces.

Outbound links (``<a href>``) are collected separately — they become
the ``citing`` edges (reference: elink citedin/references calls,
__main__.py:1037-1098).
"""

from __future__ import annotations

import html as html_lib
import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame

_EXTRACT_SCHEMA = (
    "url string, warc_ts timestamp, lang string, text string, links array<string>"
)

_BLOCK_TAGS = {"nav", "aside", "footer", "script", "style", "header"}
_WS = re.compile(r"\s+")


class _MainTextParser(HTMLParser):
    """Single-pass SAX-style extractor: title, article paragraphs, hrefs."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title_parts: list[str] = []
        self.paragraphs: list[str] = []
        self.links: list[str] = []
        self._block_depth = 0
        self._in_title = False
        self._p_parts: list[str] | None = None

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS:
            self._block_depth += 1
        elif tag == "title":
            self._in_title = True
        elif tag == "p" and self._block_depth == 0:
            self._p_parts = []
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)

    def handle_endtag(self, tag: str) -> None:
        if tag in _BLOCK_TAGS and self._block_depth > 0:
            self._block_depth -= 1
        elif tag == "title":
            self._in_title = False
        elif tag == "p" and self._p_parts is not None:
            para = _WS.sub(" ", "".join(self._p_parts)).strip()
            if para:
                self.paragraphs.append(para)
            self._p_parts = None

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self.title_parts.append(data)
        elif self._p_parts is not None:
            self._p_parts.append(data)


def extract_one(html_bytes: bytes | None) -> tuple[str, list[str]]:
    """Pure function: html bytes -> (text, links). Deterministic."""
    if html_bytes is None:
        return "", []
    raw = html_bytes.decode("utf-8", errors="replace")
    parser = _MainTextParser()
    parser.feed(raw)
    title = _WS.sub(" ", html_lib.unescape("".join(parser.title_parts))).strip()
    body = " ".join(parser.paragraphs)
    text = f"{title}\n{body}" if title else body
    return text, parser.links


def extract_text(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> (url, warc_ts, lang, text, links).

    Column pruning matters at 100 TB: we select only the columns this
    stage needs before entering the Arrow exchange, so the parquet scan
    reads ``url, warc_ts, html, lang`` and nothing else.
    """
    src = pages.select("url", "warc_ts", "html", "lang")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["url", "warc_ts", "lang"]].copy()
            extracted = pdf["html"].map(extract_one)
            out["text"] = extracted.map(lambda t: t[0])
            out["links"] = extracted.map(lambda t: t[1])
            yield out

    return src.mapInPandas(run, schema=_EXTRACT_SCHEMA)


def citing_edges(extracted: DataFrame) -> DataFrame:
    """(url, links) -> (src, rel='citing', dst) edge rows.

    ``explode`` keeps this fully JVM-side after the extraction UDF; a
    later inner join against the page-url set drops dangling links
    (reference MERGE only creates Article nodes it has metadata for).
    May emit duplicates — the graph-materialization dedup
    (union_edges) is the single dedup shuffle for all edge sources.
    """
    from pyspark.sql import functions as F

    return (
        extracted.select(
            F.col("url").alias("src"), F.explode("links").alias("dst")
        )
        .where(F.col("dst") != F.col("src"))
        .withColumn("rel", F.lit("citing"))
        .select("src", "rel", "dst")
    )
