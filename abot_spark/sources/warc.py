"""WARC source — Common-Crawl-style ingest into the engine's page table.

The BASELINE input is "an Iceberg table of Common-Crawl-style web pages
(url, warc_ts, html, text, lang)"; this module is the loader that builds
that table from raw WARC archives (ISO 28500 — the format Common Crawl
publishes).  The reference crawler has no archive reader (it only fetches
live — ``Abot/Core/Requests/PageRequester.cs``); WARC ingest is engine
surface the Spark rebuild adds so a 100 TB crawl can seed/replay from
published captures.

Layout at scale: Common Crawl ships ~1 GB gzip WARCs, each a concatenation
of per-record gzip members.  ``spark.read.format("binaryFile")`` makes one
task per file — the natural parallel unit (a CC segment is ~30k files →
30k tasks).  Parsing is a ``mapInPandas`` generator that walks gzip
members / raw records sequentially and *yields batches*, so peak memory
per task is one output batch + one file buffer, not the decompressed
archive.  Text extraction reuses the S4 kernel (byte-identical contract);
``lang`` uses the same stopword heuristic as ``ops.textstats.lang_id``.
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType, TimestampType,
)

from abot_spark.functions.text_extract import extract_text
from abot_spark.urls import canonicalize

PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])

_CRLF2 = b"\r\n\r\n"

def _lang_guess(text: str | None) -> str | None:
    """Same marker table + argmax/first-wins tie-break as the SQL-side
    ``ops.textstats.lang_id`` so WARC-ingested ``lang`` matches what the
    operator would predict on the same text."""
    import re

    from abot_spark.ops.textstats import LANG_MARKERS

    if not text:
        return None
    probe = text[:4000].lower()
    scores = {
        lang: len(re.findall(r"\b(" + "|".join(ms) + r")\b", probe))
        for lang, ms in LANG_MARKERS.items()
    }
    best = max(scores.values())
    for lang, s in scores.items():   # dict order = the fixed tie-break
        if s == best:
            return lang
    return "und"


def _split_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:   # [0] is the version/status line
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = \
                v.strip().decode("latin-1")
    return headers


def parse_warc(data: bytes):
    """Yield dicts ``(url, warc_ts, html, content_type, status_code)`` for
    each ``WARC-Type: response`` record in one WARC file (gzip — including
    multi-member per-record gzip, the Common Crawl layout — or plain)."""
    if data[:2] == b"\x1f\x8b":
        # multi-member: decompress members sequentially; zlib exposes
        # unused_data after each member so this is a linear walk
        buf = io.BytesIO()
        rest = data
        while rest[:2] == b"\x1f\x8b":
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            buf.write(d.decompress(rest))
            buf.write(d.flush())
            rest = d.unused_data
        data = buf.getvalue()

    pos = 0
    n = len(data)
    while pos < n:
        if not data.startswith(b"WARC/", pos):
            nxt = data.find(b"WARC/", pos)
            if nxt < 0:
                return
            pos = nxt
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            return
        headers = _split_headers(data[pos:hdr_end])
        length = int(headers.get("content-length", "0"))
        body = data[hdr_end + 4: hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        # records are separated by two CRLFs
        while data.startswith(b"\r\n", pos):
            pos += 2
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        ts_raw = headers.get("warc-date")
        ts = None
        if ts_raw:
            try:
                ts = dt.datetime.fromisoformat(ts_raw.replace("Z", "+00:00"))
            except ValueError:
                ts = None
        # payload is an HTTP/1.1 response: status line + headers + body
        http_end = body.find(_CRLF2)
        if http_end < 0:
            continue
        http_headers = _split_headers(body[:http_end])
        status_line = body.split(b"\r\n", 1)[0].split(b" ")
        try:
            status = int(status_line[1])
        except (IndexError, ValueError):
            status = 0
        yield {
            "url": url,
            "warc_ts": ts,
            "html": body[http_end + 4:],
            "content_type": http_headers.get("content-type"),
            "status_code": status,
        }


def read_warc(spark: SparkSession, path: str, *,
              batch_rows: int = 256) -> DataFrame:
    """WARC files at ``path`` (glob ok) → the BASELINE pages table
    ``(url, warc_ts, html, text, lang)``.

    One Spark task per archive file (``binaryFile`` source); non-200 and
    non-HTML records are dropped (a crawl table holds fetched pages — the
    engine's own decision pipeline re-applies F3 on read).  ``text`` is the
    S4 extraction of ``html`` (same kernel, byte-identical contract).
    """

    def gen(batches):
        for pdf in batches:
            rows: list[dict] = []
            for blob in pdf["content"]:
                for rec in parse_warc(bytes(blob)):
                    if rec["status_code"] != 200 or not rec["url"]:
                        continue
                    ctype = rec["content_type"] or ""
                    if "html" not in ctype and "text/" not in ctype:
                        continue
                    _charset, text = extract_text(rec["html"],
                                                  rec["content_type"])
                    rows.append({
                        "url": canonicalize(rec["url"]) or rec["url"],
                        "warc_ts": rec["warc_ts"],
                        "html": rec["html"],
                        "text": text,
                        "lang": _lang_guess(text),
                    })
                    if len(rows) >= batch_rows:
                        yield pd.DataFrame(rows)
                        rows = []
            if rows:
                yield pd.DataFrame(rows)

    files = spark.read.format("binaryFile").load(path)
    return files.select("content").mapInPandas(gen, PAGES_SCHEMA)


def write_warc(records: list[dict], path: str, *, compress: bool = True,
               member_gzip: bool = True) -> None:
    """Deterministic WARC writer for tests: ``records`` dicts carry
    ``url, ts (datetime), html (bytes), content_type``.  ``member_gzip``
    writes one gzip member per record (the Common Crawl layout);
    ``compress=False`` writes plain WARC."""
    out = io.BytesIO()
    for r in records:
        http = (b"HTTP/1.1 200 OK\r\n"
                + f"Content-Type: {r['content_type']}\r\n"
                  f"Content-Length: {len(r['html'])}\r\n\r\n"
                  .encode("latin-1")
                + r["html"])
        ts = r["ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        warc_hdr = ("WARC/1.0\r\n"
                    "WARC-Type: response\r\n"
                    f"WARC-Target-URI: {r['url']}\r\n"
                    f"WARC-Date: {ts}\r\n"
                    f"Content-Length: {len(http)}\r\n"
                    "Content-Type: application/http; msgtype=response\r\n"
                    "\r\n").encode("latin-1")
        rec = warc_hdr + http + b"\r\n\r\n"
        if compress and member_gzip:
            # mtime=0 keeps the archive byte-deterministic
            out.write(gzip.compress(rec, mtime=0))
        else:
            out.write(rec)
    data = out.getvalue()
    if compress and not member_gzip:
        data = gzip.compress(data, mtime=0)
    with open(path, "wb") as f:
        f.write(data)
