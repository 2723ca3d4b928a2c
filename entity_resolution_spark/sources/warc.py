"""WARC source — Common Crawl's native archive format, read distributed.

Crawl data arrives as ``*.warc.gz``: a concatenation of per-record gzip
members, each holding one WARC record (``WARC/1.0`` headers + payload;
``response`` records carry the HTTP response whose body is the page).
This reader turns a directory of them into the engine's canonical pages
shape ``(url, warc_ts, html, source_file)`` with stdlib ``gzip`` only.

Scale shape: files are the unit of parallelism — ``spark.read.format
("binaryFile")`` gives one row per file (Common Crawl segments are ~1 GB,
thousands per crawl, so file-granularity saturates any cluster), and a
``mapInPandas`` pass parses each file's records inside the executor.
Whole-file bytes do appear in executor memory one-at-a-time per task —
the same bound as any gzip-stream consumer, and why crawls ship as many
medium files.  Per-record gzip members (the Common Crawl convention)
would also support offset-based splitting via the cdx index; that path
needs the index file and is left to the deployment.

Only ``response`` records with an HTTP 200 status line are emitted (the
conversion/metadata/request records crawls interleave are skipped), which
is exactly the page set the extract stage wants.
"""

from __future__ import annotations

import gzip
import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, source_file string"
)


def parse_warc_stream(raw: bytes, source: str):
    """Yield (url, iso_ts, html_bytes, source) from (gzipped) WARC bytes.

    Accepts both plain ``.warc`` and member-concatenated ``.warc.gz``
    (``gzip.GzipFile`` reads across members).  Tolerant of trailing
    garbage: stops at the first undecodable point instead of failing the
    task — crawl archives routinely contain truncated tails.
    """
    if raw[:2] == b"\x1f\x8b":
        # member-incremental gunzip: every COMPLETE gzip member survives a
        # truncated/corrupt tail (an all-at-once GzipFile.read would throw
        # away the whole file on the first bad byte)
        out = bytearray()
        pos = 0
        while pos < len(raw):
            d = zlib.decompressobj(wbits=31)
            try:
                out += d.decompress(raw[pos:])
            except zlib.error:
                break
            if not d.eof:
                break  # truncated final member
            pos = len(raw) - len(d.unused_data)
        data = bytes(out)
    else:
        data = raw
    pos = 0
    n = len(data)
    while pos < n:
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0 or not data.startswith(b"WARC/", pos):
            return
        headers = {}
        for line in data[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            return
        body = data[head_end + 4 : head_end + 4 + length]
        # each record is followed by two CRLFs
        pos = head_end + 4 + length + 4
        if headers.get(b"warc-type") != b"response":
            continue
        url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        ts = headers.get(b"warc-date", b"").decode("ascii", "replace")
        # split the HTTP response: status line + headers, then the page
        http_end = body.find(b"\r\n\r\n")
        if http_end < 0:
            continue
        # Status code is the SECOND whitespace-separated token of the
        # status line (RFC 9112 §4) — a substring test would false-positive
        # on reason phrases containing " 200" and assumes single spacing.
        status_parts = body[: body.find(b"\r\n")].split()
        if len(status_parts) < 2 or status_parts[1] != b"200":
            continue
        yield url, ts, body[http_end + 4 :], source


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Directory (or glob) of ``*.warc``/``*.warc.gz`` → pages DataFrame."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        for pdf in batches:
            rows = []
            for fpath, raw in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_stream(bytes(raw), fpath))
            out = pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "source_file"]
            )
            out["warc_ts"] = pd.to_datetime(
                out["warc_ts"], utc=True, errors="coerce"
            ).dt.tz_localize(None)
            yield out

    return files.select("path", "content").mapInPandas(parse, PAGES_SCHEMA)


def write_warc(records, path: str) -> None:
    """Test-fixture writer: one member-gzipped WARC response record per
    (url, iso_ts, html) tuple — the Common Crawl member convention."""
    with open(path, "wb") as f:
        for url, ts, html in records:
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
            )
            rec = (
                b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                + f"WARC-Target-URI: {url}\r\n".encode()
                + f"WARC-Date: {ts}\r\n".encode()
                + f"Content-Length: {len(http)}\r\n".encode()
                + b"Content-Type: application/http; msgtype=response\r\n"
                b"\r\n" + http + b"\r\n\r\n"
            )
            f.write(gzip.compress(rec))
