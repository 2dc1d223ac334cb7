"""Round-11 queries — charset fidelity, archive/document realism:

- DECLARED-CHARSET decoding for captured HTML (`source_warc_charset`):
  BOM → Content-Type ``charset=`` → meta prescan → utf-8 fallback,
  WHATWG label aliasing (latin-1→cp1252, shift_jis→cp932), per-row
  encoding attribution — the deterministic decode WET generation
  performs before any mojibake heuristic (r10 verdict item 1);
- ZIP64 archives, OpenDocument text/cells, JPEG EXIF metadata,
  ALAC sample decode (r10 verdict items 3-6).

Registered into the same QUERIES/ORACLE registry as the other query
modules; every entry carries an exact DuckDB oracle. Fresh module per
the regression discipline (new operators must not churn certified
modules).
"""

from __future__ import annotations

from typing import Iterator  # noqa: F401  (pandas_udf string annotations)

import pandas as pd  # noqa: F401  (pandas_udf string annotations)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopxmlextractor_spark.queries import query
from hadoopxmlextractor_spark.tables import load

_MD5B = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':{salt}'), "
    "{pos}, 2)) AS BIGINT)"
)


def _b(salt: str, k: int) -> str:
    """SQL for byte k of md5(doc_id:salt) — the synth parameter replay."""
    return _MD5B.format(salt=salt, pos=2 * k + 1)

# Planted vocabulary per charset family (the mojibake plant words plus
# CJK/BMP arms) — every phrase is a single token encodable in its
# arm's codec, so the oracle replays it as a UTF-8 SQL literal.
_CP1252_PHRASES = ["café", "naïve", "über", "don’t"]
_SJIS_PHRASES = ["カフェ", "東京", "日本語", "テスト"]
_ANY_PHRASES = ["déjà", "Σigma", "中文", "żółw"]

# arm → (python codec reported, enc_source reported)
_CHARSET_ARMS = [
    ("utf-8", "default"),    # 0: undeclared utf-8
    ("cp1252", "header"),    # 1: Content-Type charset=windows-1252
    ("cp932", "meta"),       # 2: <meta charset="shift_jis">
    ("cp1252", "header"),    # 3: declared iso-8859-1 → cp1252 (WHATWG)
    ("utf-8-sig", "bom"),    # 4: UTF-8 BOM
    ("utf-16", "bom"),       # 5: UTF-16LE BOM
    ("utf-8", "header"),     # 6: header utf-8 BEATS conflicting meta
    ("utf-8", "default"),    # 7: bogus header label → fallback
]


def _charset_page(i: int) -> tuple[bytes, bytes]:
    """(Content-Type header value, encoded HTML body) for doc ``i`` —
    the arm rotation the oracle of ``source_warc_charset`` replays."""
    import hashlib

    x = hashlib.md5(f"{i}:chs".encode()).hexdigest()
    b0 = hashlib.md5(f"{i}:chsp".encode()).digest()[0]
    arm = i % 8
    if arm == 2:
        phrase = _SJIS_PHRASES[b0 % 4]
    elif arm in (1, 3):
        phrase = _CP1252_PHRASES[b0 % 4]
    else:
        phrase = _ANY_PHRASES[b0 % 4]
    meta = ""
    if arm == 2:
        meta = '<meta charset="shift_jis">'
    elif arm == 6:
        meta = '<meta charset="shift_jis">'  # loses to the header
    html = (
        f"<html><head><title>skip</title>{meta}</head>"
        f"<body><h1>{phrase} w{x[0:2]}</h1>"
        f"<p>w{x[2:4]} &amp; w{x[4:6]}</p></body></html>"
    )
    ctype = {
        1: b"text/html; charset=windows-1252",
        3: b"text/html; charset=iso-8859-1",
        6: b"text/html; charset=utf-8",
        7: b"text/html; charset=bogus-enc",
    }.get(arm, b"text/html")
    codec = {1: "cp1252", 2: "cp932", 3: "cp1252"}.get(arm, "utf-8")
    body = html.encode(codec)
    if arm == 4:
        body = b"\xef\xbb\xbf" + body
    elif arm == 5:
        body = b"\xff\xfe" + html.encode("utf-16-le")
    return ctype, body


@query(
    "source_warc_charset",
    """
    WITH h AS (
      SELECT doc_id, doc_id % 8 AS arm,
             md5(CAST(doc_id AS VARCHAR) || ':chs') AS x,
             CAST(('0x' || substring(
               md5(CAST(doc_id AS VARCHAR) || ':chsp'), 1, 2)) AS BIGINT)
               AS b0
      FROM documents
    ),
    p AS (
      SELECT doc_id, arm, x,
             CASE WHEN arm = 2
                    THEN (['カフェ', '東京', '日本語', 'テスト'])[b0 % 4 + 1]
                  WHEN arm IN (1, 3)
                    THEN (['café', 'naïve', 'über', 'don’t'])[b0 % 4 + 1]
                  ELSE (['déjà', 'Σigma', '中文', 'żółw'])[b0 % 4 + 1]
             END AS phrase
      FROM h
    ),
    e AS (
      SELECT doc_id, arm,
             phrase || ' w' || substring(x, 1, 2)
                    || ' w' || substring(x, 3, 2)
                    || ' & w' || substring(x, 5, 2) AS extracted
      FROM p
    )
    SELECT doc_id,
           CAST(200 AS INT) AS http_status,
           CASE arm WHEN 1 THEN 'cp1252' WHEN 2 THEN 'cp932'
                    WHEN 3 THEN 'cp1252' WHEN 4 THEN 'utf-8-sig'
                    WHEN 5 THEN 'utf-16' ELSE 'utf-8' END AS encoding,
           CASE arm WHEN 1 THEN 'header' WHEN 2 THEN 'meta'
                    WHEN 3 THEN 'header' WHEN 4 THEN 'bom'
                    WHEN 5 THEN 'bom' WHEN 6 THEN 'header'
                    ELSE 'default' END AS enc_source,
           extracted,
           CAST(length(extracted) AS INT) AS n_chars
    FROM e
    """,
)
def q_source_warc_charset(spark: SparkSession, sf: str) -> DataFrame:
    # DECLARED-CHARSET fidelity for captured pages (r10 verdict item
    # 1): real crawls are 5-15% non-UTF-8 with a DECLARED charset, and
    # WET generation resolves it deterministically before any
    # heuristic. Eight rotating arms cover every resolution mechanism:
    # undeclared utf-8 fallback / Content-Type charset= header (both a
    # true windows-1252 label and the iso-8859-1 label that must decode
    # as cp1252 per the WHATWG mapping) / <meta charset> prescan
    # (shift_jis→cp932) / UTF-8 and UTF-16LE BOMs (BOM wins) / a
    # header-vs-meta CONFLICT (header wins) / a bogus header label
    # (falls through, never errors). Bodies carry planted non-ASCII
    # vocabulary only the correct decode preserves; gzip content-
    # coding rotates on top, so the coding-undo and charset stages are
    # proven composed. encoding/enc_source are the per-row attribution
    # columns a curator filters on. One Arrow chain, zero shuffles.
    import gzip

    from hadoopxmlextractor_spark.operators import text as T
    from hadoopxmlextractor_spark.sources import warc as W

    docs = load(spark, sf, "documents")

    @F.pandas_udf("binary")
    def _warc(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            out = []
            for i in ids:
                ctype, body = _charset_page(int(i))
                hdr = b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n"
                if (int(i) // 8) % 2 == 0:
                    hdr += b"Content-Encoding: gzip\r\n"
                    body = gzip.compress(body, 6)
                out.append(
                    W.write_warc(
                        [
                            {
                                "warc_type": "response",
                                "record_id": f"<urn:chs:{i}>",
                                "target_uri": f"https://example.com/{i}",
                                "content_type": (
                                    "application/http; msgtype=response"
                                ),
                                "payload": hdr + b"\r\n" + body,
                            }
                        ],
                        gzip_members=(int(i) % 2 == 0),
                    )
                )
            yield pd.Series(out)

    files = docs.select(
        F.col("doc_id").cast("string").alias("path"),
        _warc("doc_id").alias("content"),
    )
    recs = W.warc_records(files).filter(F.col("warc_type") == "response")

    @F.pandas_udf(
        "struct<http_status:int, encoding:string, enc_source:string, "
        "text:string>"
    )
    def _decode(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for payloads in it:
            rows = []
            for p in payloads:
                s, enc, how, text = W.decode_http_html(bytes(p))
                rows.append(
                    {"http_status": s, "encoding": enc,
                     "enc_source": how, "text": text}
                )
            yield pd.DataFrame(rows)

    return (
        recs.withColumn("h", _decode("payload"))
        .select(
            F.col("path").cast("bigint").alias("doc_id"),
            F.col("h.http_status").alias("http_status"),
            F.col("h.encoding").alias("encoding"),
            F.col("h.enc_source").alias("enc_source"),
            T.html_text(F.col("h.text")).alias("extracted"),
        )
        .withColumn("n_chars", F.length("extracted").cast("int"))
    )


# ---------------------------------------------------------------------------
# ZIP64 archives (r10 verdict item 3)
# ---------------------------------------------------------------------------


@query(
    "archive_zip64_meta",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('z64', 0)} AS b0, {_b('z64', 1)} AS b1,
             {_b('z64', 2)} AS b2, {_b('z64', 3)} AS b3
      FROM documents
    ),
    m AS (
      SELECT doc_id, unnest(generate_series(0, b0 % 3)) AS k,
             b1, b2, b3
      FROM p
    ),
    e AS (
      SELECT doc_id, k,
             (['payload','chunk','blob','part'])[(b1 + k) % 4 + 1]
               || '_' || CAST(k AS VARCHAR) || '.dat' AS name,
             'member ' || CAST(k AS VARCHAR) || ' '
               || repeat('z' || CAST((b2 + k) % 10 AS VARCHAR) || ' ',
                         4 + (b3 + k) % 6) AS payload
      FROM m
    )
    SELECT doc_id AS archive_id, CAST(k AS INT) AS member_idx, name,
           CASE WHEN k % 2 = 1 THEN 'deflate' ELSE 'stored' END AS method,
           CAST(LENGTH(payload) AS BIGINT) AS uncomp_bytes,
           TRUE AS crc_ok,
           substring(payload, 1, 16) AS head,
           doc_id % 2 = 1 AS is_zip64
    FROM e
    """,
)
def q_archive_zip64_meta(spark: SparkSession, sf: str) -> DataFrame:
    # ZIP64 (r10 verdict item 3) — any archive >4 GiB or >65,535
    # members is ZIP64, routine at crawl scale: odd docs write the
    # full forced-64-bit layout (sentineled central entries + 0x0001
    # extended-information extras, EOCD64 record + locator, a
    # sentineled classic EOCD so readers MUST take the 64-bit path),
    # even docs stay classic — is_zip64 comes from the PARSE
    # (locator detection), so the rotation provably exercises both
    # walks (vacuous-check rule). Members still inflate + CRC-verify;
    # `head` replay proves the local-header offsets promoted from the
    # extras really point at the data. Cross-validated against stdlib
    # zipfile both directions in tests/test_documents.py. One Arrow
    # pass, zero shuffles.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents")

    def _rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        cols = ["archive_id", "member_idx", "name", "method",
                "uncomp_bytes", "crc_ok", "head", "is_zip64"]
        stems = ("payload", "chunk", "blob", "part")
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                b = hashlib.md5(f"{i}:z64".encode()).digest()
                members = []
                for k in range(1 + b[0] % 3):
                    name = f"{stems[(b[1] + k) % 4]}_{k}.dat"
                    payload = (
                        f"member {k} "
                        + f"z{(b[2] + k) % 10} " * (4 + (b[3] + k) % 6)
                    ).encode()
                    members.append((name, payload, 8 if k % 2 else 0, False))
                blob = D.build_zip(members, zip64=(i % 2 == 1))
                is64 = D.zip_has_eocd64(blob)
                for k, e in enumerate(D.zip_member_list(blob)):
                    data = D.zip_read_member(blob, e)
                    rows.append({
                        "archive_id": i, "member_idx": k,
                        "name": e["name"],
                        "method": "deflate" if e["method"] == 8
                        else "stored",
                        "uncomp_bytes": e["usize"], "crc_ok": True,
                        "head": data[:16].decode("utf-8"),
                        "is_zip64": is64,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return docs.select("doc_id").mapInPandas(
        _rows,
        schema="archive_id bigint, member_idx int, name string, "
        "method string, uncomp_bytes bigint, crc_ok boolean, "
        "head string, is_zip64 boolean",
    )
