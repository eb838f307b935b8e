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


def _iter_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members ONE AT A TIME: a
    corrupt member ends the iteration but every member before it is
    yielded whole — a mid-file corruption must not drop the segment's
    earlier pages."""
    while data:
        d = zlib.decompressobj(wbits=31)
        try:
            member = d.decompress(data)
            d.flush()
        except (OSError, zlib.error):
            return
        yield member
        if not d.eof:
            return  # truncated final member
        data = d.unused_data


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer body (hex-size lines +
    CRLF framing). On any framing error the RAW body is returned —
    degrade, never crash, matching the malformed-html contract."""
    out = []
    pos = 0
    try:
        while True:
            eol = body.index(_CRLF, pos)
            size = int(body[pos:eol].split(b";")[0], 16)
            if size == 0:
                break
            start = eol + len(_CRLF)
            out.append(body[start : start + size])
            pos = start + size + len(_CRLF)
    except (ValueError, IndexError):
        return body
    return b"".join(out)


def parse_warc(data: bytes) -> Iterator[dict]:
    """Iterate the ``response`` records of one WARC blob (plain or
    gzip-member) as dicts (url, warc_ts, html). Malformed trailing
    garbage — plain or a corrupt gzip member — ends the scan instead
    of crashing, yielding every record that is whole, matching how the
    pipeline's malformed-html path degrades (extract_one on bad
    bytes). Chunked HTTP response bodies are de-framed."""
    if data[:2] == b"\x1f\x8b":
        for member in _iter_gzip_members(data):
            yield from parse_warc(member)
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
                    http_headers = body[:split].lower()
                    body = body[split + len(_HDR_END) :]
                    # real crawls store chunked bodies verbatim; strip
                    # the hex-size framing or downstream extraction
                    # tokenizes chunk lengths as document text
                    if (
                        b"transfer-encoding:" in http_headers
                        and b"chunked" in http_headers
                    ):
                        body = _dechunk(body)
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
            # yield per BLOB, not per Arrow batch: one row is a whole
            # crawl segment (~1 GB decompressed), so accumulating a
            # batch of them before yielding would hold several
            # segments' pages in memory at once
            for blob in pdf[blob_col]:
                if blob is None:
                    continue
                urls: list[str | None] = []
                tss: list[datetime | None] = []
                htmls: list[bytes] = []
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
