"""WARC (ISO 28500) ingestion — the Common-Crawl wire format.

The north rule's input is "an Iceberg table of Common-Crawl-style web
pages (url, warc_ts, html, ...)"; this module is the step that turns
raw Common-Crawl WARC files into exactly that table, so a user can
point the pipeline at a crawl dump instead of a pre-built table.
Reference analogue: the reference ingests its corpus over NCBI HTTP
(knowledge-graph-manager/__main__.py's esearch/fetch loop) — WARC is
the equivalent acquisition layer for the web-corpus setting this
engine targets.

Spark shape: WARC files load through ``spark.read.format("binaryFile")``
(one row per file — crawl dumps are ~1 GB members, a good Spark split
already), and record parsing runs as a batched Arrow ``mapInPandas``
over the blobs — pure-Python per BLOB, never per row of output, within
the engine's 5-UDF discipline. Both the per-record-gzip layout real
Common Crawl uses (concatenated gzip members) and plain WARC are
handled; non-``response`` records (warcinfo, request, metadata) are
skipped, and the HTTP envelope is stripped from response payloads so
``html`` is the raw document body.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"

WARC_SCHEMA = "url string, warc_ts timestamp, html binary"


def warc_record_bytes(
    url: str,
    date_iso: str,
    payload: bytes,
    warc_type: str = "response",
    http_envelope: bool = True,
) -> bytes:
    """One well-formed WARC record (writer — used by tests and the
    roundtrip query; also handy to emit WARC from the engine)."""
    if http_envelope and warc_type == "response":
        body = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload
        )
    else:
        body = payload
    head = (
        b"WARC/1.0\r\n"
        + f"WARC-Type: {warc_type}\r\n".encode()
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"WARC-Date: {date_iso}\r\n".encode()
        + f"Content-Length: {len(body)}\r\n".encode()
    )
    return head + _CRLF + body + _CRLF + _CRLF


def gzip_member(record: bytes) -> bytes:
    """Per-record gzip member (mtime pinned to 0 for determinism) —
    the layout Common Crawl ships (.warc.gz = concatenated members)."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(record)
    return buf.getvalue()


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members to one plain blob."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data))
        d.flush()
        data = d.unused_data
    return b"".join(out)


def parse_warc(data: bytes) -> Iterator[dict]:
    """Iterate the ``response`` records of one WARC blob (plain or
    gzip-member) as dicts (url, warc_ts, html). Malformed trailing
    garbage ends the scan instead of crashing — a truncated fetch
    yields the records that are whole, matching how the pipeline's
    malformed-html path degrades (extract_one on bad bytes)."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = _gunzip_members(data)
        except (OSError, zlib.error):
            return
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = data.find(_HDR_END, start)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if v:
                headers[k.decode("ascii", "replace").strip().lower()] = (
                    v.decode("utf-8", "replace").strip()
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = hdr_end + len(_HDR_END)
        body = data[body_start : body_start + length]
        if len(body) < length:
            return  # truncated final record
        pos = body_start + length
        if headers.get("warc-type") == "response":
            if body[:5] == b"HTTP/":
                split = body.find(_HDR_END)
                if split >= 0:
                    body = body[split + len(_HDR_END) :]
            ts = None
            raw_ts = headers.get("warc-date", "")
            try:
                ts = datetime.strptime(
                    raw_ts, "%Y-%m-%dT%H:%M:%SZ"
                ).replace(tzinfo=timezone.utc)
            except ValueError:
                pass
            yield {
                "url": headers.get("warc-target-uri"),
                "warc_ts": ts,
                "html": body,
            }


def read_warc_blobs(blobs: DataFrame, blob_col: str = "content") -> DataFrame:
    """(… blob binary …) -> (url, warc_ts, html) rows via one Arrow
    pass; each input row is one WARC file/segment."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list[str | None] = []
            tss: list[datetime | None] = []
            htmls: list[bytes] = []
            for blob in pdf[blob_col]:
                if blob is None:
                    continue
                for rec in parse_warc(bytes(blob)):
                    urls.append(rec["url"])
                    tss.append(rec["warc_ts"])
                    htmls.append(rec["html"])
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype="object"),
                    "warc_ts": pd.Series(tss, dtype="object"),
                    "html": pd.Series(htmls, dtype="object"),
                }
            )

    return blobs.select(F.col(blob_col)).mapInPandas(run, schema=WARC_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of .warc / .warc.gz files -> the north-rule pages
    shape (url, warc_ts, html). One binaryFile row per crawl segment;
    column pruning keeps only the bytes."""
    blobs = spark.read.format("binaryFile").load(path)
    return read_warc_blobs(blobs, "content")
