"""WARC ingestion: raw Common-Crawl-style archives → the engine's page table.

The north rule's input is an Iceberg table of Common-Crawl-style pages
``(url, warc_ts, html, text, lang)``; raw Common Crawl ships as WARC/1.0
files (ISO 28500: concatenated records, each = header block, CRLF CRLF,
``Content-Length`` payload bytes, CRLF CRLF).  This module is the bridge:

* :func:`parse_warc` — pure-Python record parser over one archive's bytes,
  yielding ``response`` records as (url, warc_ts, http_status, html).  The
  HTTP response inside the payload is split at its own header/body
  boundary; truncated or malformed records are SKIPPED, not fatal — a
  100 TB crawl dump always contains some.
* :func:`read_warc_archives` — the Spark surface: ``binaryFile``-sourced
  DataFrame of whole archives → ``mapInPandas`` → one row per page.  One
  archive = one Arrow row = one task's working set, the standard Spark
  WARC-processing shape (CC archives are ~1 GB: size executor memory for
  a few archives per task slot, and feed MANY archives — parallelism
  comes from the file count, 64k+ files per crawl snapshot, not from
  splitting one file).
* :func:`encode_warc` — deterministic WARC writer (fixtures + round-trip
  tests; also how the engine would re-publish fetched pages as WARC).

No third-party warc library (none is installed here, and the format is
simple enough that a dependency buys nothing but version skew).
"""

from __future__ import annotations

from collections.abc import Iterator

CRLF = b"\r\n"


def encode_warc(records: list[dict]) -> bytes:
    """Serialize ``[{url, warc_ts, html, status?}]`` as WARC/1.0 response
    records (deterministic: fixed header order, no uuids)."""
    out = bytearray()
    for r in records:
        status = int(r.get("status", 200))
        html = r["html"] if isinstance(r["html"], bytes) else r["html"].encode()
        http = (
            f"HTTP/1.1 {status} OK".encode() + CRLF
            + b"Content-Type: text/html; charset=utf-8" + CRLF
            + f"Content-Length: {len(html)}".encode() + CRLF + CRLF
            + html
        )
        hdr = (
            b"WARC/1.0" + CRLF
            + b"WARC-Type: response" + CRLF
            + f"WARC-Target-URI: {r['url']}".encode() + CRLF
            + f"WARC-Date: {r['warc_ts']}".encode() + CRLF
            + b"Content-Type: application/http; msgtype=response" + CRLF
            + f"Content-Length: {len(http)}".encode() + CRLF
        )
        out += hdr + CRLF + http + CRLF + CRLF
    return bytes(out)


def parse_warc(blob: bytes) -> Iterator[dict]:
    """Yield ``{url, warc_ts, http_status, html}`` per well-formed
    ``response`` record; skip anything malformed or truncated."""
    pos, n = 0, len(blob)
    while pos < n:
        # skip inter-record padding
        while blob.startswith(CRLF, pos):
            pos += 2
        if pos >= n:
            return
        head_end = blob.find(CRLF + CRLF, pos)
        if head_end < 0:
            return  # truncated header block
        head = blob[pos:head_end]
        if not head.startswith(b"WARC/"):
            return  # lost sync — stop rather than misattribute payloads
        fields: dict[bytes, bytes] = {}
        for line in head.split(CRLF)[1:]:
            k, _, v = line.partition(b":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get(b"content-length", b""))
        except ValueError:
            return  # cannot even skip the payload safely
        payload = blob[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        if len(payload) < length:
            return  # truncated payload
        if fields.get(b"warc-type") != b"response":
            continue  # request/metadata/warcinfo records: skip
        url = fields.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        ts = fields.get(b"warc-date", b"").decode("ascii", "replace")
        http_end = payload.find(CRLF + CRLF)
        if not url or http_end < 0:
            continue
        status_line = payload[:http_end].split(CRLF, 1)[0].split(b" ")
        try:
            status = int(status_line[1])
        except (IndexError, ValueError):
            continue
        yield {
            "url": url,
            "warc_ts": ts,
            "http_status": status,
            "html": payload[http_end + 4 :],
        }


def read_warc_archives(spark, path: str):
    """``binaryFile`` scan of ``*.warc`` archives → one row per response:
    ``(archive, url, warc_ts, http_status, html binary)``.  Arrow-batched;
    parallelism = number of archive files."""
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["archive", "url", "warc_ts", "http_status", "html"]
        for pdf in batches:
            rows = [
                {"archive": p, **rec}
                for p, blob in zip(pdf["path"], pdf["content"])
                for rec in parse_warc(bytes(blob))
            ]
            yield pd.DataFrame(rows, columns=cols)

    return raw.mapInPandas(
        explode,
        "archive string, url string, warc_ts string, http_status int, "
        "html binary",
    )
