"""Native WARC reader — the container Common Crawl ships, i.e. THE
input format of a web-scale training-data pipeline, with zero
dependencies (stdlib zlib + the Spark binaryFile source).

WARC (ISO 28500): records back to back, each
``WARC/1.0\\r\\n`` + header lines + ``\\r\\n`` + Content-Length payload
bytes + ``\\r\\n\\r\\n``. Common Crawl stores each record as its OWN
gzip member and concatenates the members — that layout is what makes
the format splittable in principle (any member boundary is a record
boundary), and :func:`parse_warc` handles both it and plain
uncompressed WARC.

Spark shape: :func:`read_warc` = ``binaryFile`` scan →
:func:`warc_records` (one Arrow ``mapInPandas`` pass exploding files
into records). At 100 TB the unit of parallelism is the FILE —
Common Crawl segments are ~1 GB .warc.gz, tens of thousands per
crawl, so a file-per-task layout saturates any executor count without
an intra-file splitter; if a corpus arrives as few huge files,
re-shard first (one gzip-member scan, embarrassingly parallel). HTTP
response payloads split into status/headers/body with
:func:`split_http_payload` — JVM-side callers get (url, status,
body) columns ready for the text-pipeline operators.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_SCHEMA = (
    "path string, rec_idx int, warc_type string, record_id string, "
    "target_uri string, warc_date string, content_type string, "
    "content_length long, payload binary"
)


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the Common Crawl
    record-per-member layout) into one contiguous buffer."""
    out = []
    data = blob
    while data[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data))
        out.append(d.flush())
        data = d.unused_data
    if data:
        raise ValueError("trailing non-gzip bytes in WARC")
    return b"".join(out)


def parse_warc(blob: bytes) -> list[dict]:
    """All records of one WARC file (plain or gzip-member
    concatenation) as dicts with the headers a pipeline keys on
    (WARC-Type / WARC-Record-ID / WARC-Target-URI / WARC-Date /
    Content-Type / Content-Length) plus the raw payload bytes.
    Malformed input raises ValueError (callers map that to the
    auditable-NULL contract)."""
    if blob[:2] == b"\x1f\x8b":
        blob = _gunzip_members(blob)
    records = []
    pos = 0
    while pos < len(blob):
        if blob[pos : pos + 5] != b"WARC/":
            raise ValueError(f"bad record start at {pos}")
        hdr_end = blob.index(b"\r\n\r\n", pos)
        lines = blob[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        headers = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        payload = blob[hdr_end + 4 : hdr_end + 4 + length]
        if len(payload) != length:
            raise ValueError("truncated payload")
        if blob[hdr_end + 4 + length : hdr_end + 8 + length] != b"\r\n\r\n":
            raise ValueError("missing record separator")
        records.append(
            {
                "rec_idx": len(records),
                "warc_type": headers.get("warc-type", ""),
                "record_id": headers.get("warc-record-id", ""),
                "target_uri": headers.get("warc-target-uri", ""),
                "warc_date": headers.get("warc-date", ""),
                "content_type": headers.get("content-type", ""),
                "content_length": length,
                "payload": payload,
            }
        )
        pos = hdr_end + 8 + length
    return records


def write_warc(records: list[dict], *, gzip_members: bool = True) -> bytes:
    """Serialize records (dicts with warc_type / record_id /
    target_uri / warc_date / content_type / payload) as a WARC file —
    each record its own gzip member when ``gzip_members`` (the Common
    Crawl layout). Lossless partner of :func:`parse_warc`."""
    out = []
    for r in records:
        payload = r["payload"]
        headers = [
            "WARC/1.0",
            f"WARC-Type: {r['warc_type']}",
            f"WARC-Record-ID: {r.get('record_id', '<urn:uuid:0>')}",
            f"WARC-Date: {r.get('warc_date', '2026-01-01T00:00:00Z')}",
        ]
        if r.get("target_uri"):
            headers.append(f"WARC-Target-URI: {r['target_uri']}")
        if r.get("content_type"):
            headers.append(f"Content-Type: {r['content_type']}")
        headers.append(f"Content-Length: {len(payload)}")
        rec = (
            "\r\n".join(headers).encode() + b"\r\n\r\n" + payload + b"\r\n\r\n"
        )
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            rec = co.compress(rec) + co.flush()
        out.append(rec)
    return b"".join(out)


def split_http_payload(payload: bytes):
    """(status int | None, body bytes) of an HTTP response payload —
    the ``application/http; msgtype=response`` record body a crawler
    stores. Non-HTTP payloads return (None, payload)."""
    if not payload.startswith(b"HTTP/"):
        return None, payload
    try:
        hdr_end = payload.index(b"\r\n\r\n")
        status = int(payload[: hdr_end].split(b"\r\n", 1)[0].split(b" ")[1])
        return status, payload[hdr_end + 4 :]
    except (ValueError, IndexError):
        return None, payload


def warc_records(
    files: DataFrame, content_col: str = "content", path_col: str = "path"
) -> DataFrame:
    """Explode (path, content) WARC blobs into records — one Arrow
    pass, no shuffle; a malformed file yields a single NULL-typed
    marker row (warc_type NULL) instead of poisoning the job, the
    auditable-NULL contract at file granularity."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf[path_col], pdf[content_col]):
                try:
                    recs = parse_warc(bytes(blob))
                except (ValueError, IndexError, zlib.error):
                    rows.append(
                        {
                            "path": path, "rec_idx": -1, "warc_type": None,
                            "record_id": None, "target_uri": None,
                            "warc_date": None, "content_type": None,
                            "content_length": None, "payload": None,
                        }
                    )
                    continue
                for r in recs:
                    rows.append({"path": path, **r})
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "rec_idx", "warc_type", "record_id",
                    "target_uri", "warc_date", "content_type",
                    "content_length", "payload",
                ],
            )

    return files.select(path_col, content_col).mapInPandas(
        _parse, schema=RECORD_SCHEMA
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) → record rows: ``binaryFile`` scan (one file per
    task — the Common Crawl parallelism unit) into
    :func:`warc_records`."""
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )
    return warc_records(files)


_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_warc(spark: SparkSession, path: str) -> DataFrame:
    """CONTINUOUS WARC ingest: the streaming twin of
    :func:`read_warc` — new .warc/.warc.gz files landing in ``path``
    become record rows exactly once (the file-source offsets log
    tracks which files are absorbed; a crash replays only the
    unacknowledged batch). This is how a crawl pipeline keeps up with
    a live fetch fleet: segments land, records flow into the
    html-extract/quality/dedup stages, no batch scheduler in the
    loop. The binaryFile stream source requires the schema explicitly
    (binary sources don't infer)."""
    files = spark.readStream.format("binaryFile").schema(
        _BINARYFILE_SCHEMA
    ).load(path).select("path", "content")
    return warc_records(files)
