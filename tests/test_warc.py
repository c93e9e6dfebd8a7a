"""WARC source (sources/warc.py): record round-trip, malformed-record
handling, and the binaryFile Spark surface.  The catalog entry
`warc_roundtrip` carries the value oracle (test_entry_oracle)."""

from __future__ import annotations

import os

from mizzounewscrawler_spark.sources.warc import (
    CRLF,
    encode_warc,
    parse_warc,
    read_warc_archives,
)

RECS = [
    {"url": "https://a.test/x", "warc_ts": "2024-01-01T00:00:01Z",
     "html": b"<html>alpha</html>"},
    {"url": "https://b.test/y", "warc_ts": "2024-01-02T00:00:02Z",
     "status": 404, "html": b"not found"},
    {"url": "https://c.test/z", "warc_ts": "2024-01-03T00:00:03Z",
     "html": b""},  # empty body
]


def test_roundtrip_exact():
    got = list(parse_warc(encode_warc(RECS)))
    assert [g["url"] for g in got] == [r["url"] for r in RECS]
    assert [g["warc_ts"] for g in got] == [r["warc_ts"] for r in RECS]
    assert [g["http_status"] for g in got] == [200, 404, 200]
    assert [g["html"] for g in got] == [r["html"] for r in RECS]


def test_non_response_records_skipped():
    blob = encode_warc(RECS[:1])
    info = (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: warcinfo" + CRLF
        + b"Content-Length: 5" + CRLF + CRLF
        + b"hello" + CRLF + CRLF
    )
    got = list(parse_warc(info + blob + info))
    assert [g["url"] for g in got] == ["https://a.test/x"]


def test_truncated_tail_skipped_not_fatal():
    blob = encode_warc(RECS)
    # cut into the last record's payload: first two still parse
    cut = blob[: len(encode_warc(RECS[:2])) + 40]
    got = list(parse_warc(cut))
    assert [g["url"] for g in got] == [r["url"] for r in RECS[:2]]
    # garbage prefix → lost sync → no misattributed records
    assert list(parse_warc(b"garbage" + blob)) == []


def test_binaryfile_surface(spark, tmp_path):
    d = str(tmp_path / "warcs")
    os.makedirs(d)
    with open(os.path.join(d, "a.warc"), "wb") as f:
        f.write(encode_warc(RECS[:2]))
    with open(os.path.join(d, "b.warc"), "wb") as f:
        f.write(encode_warc(RECS[2:]))
    rows = read_warc_archives(spark, d).collect()
    assert sorted(r["url"] for r in rows) == sorted(r["url"] for r in RECS)
    by_url = {r["url"]: r for r in rows}
    assert bytes(by_url["https://b.test/y"]["html"]) == b"not found"
    assert by_url["https://b.test/y"]["http_status"] == 404
    assert by_url["https://b.test/y"]["archive"].endswith("a.warc")
