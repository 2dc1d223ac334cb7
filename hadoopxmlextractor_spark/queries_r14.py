"""Round-14 queries — the r13 verdict's ranked worklist:

- 7z AES-256 member decryption (`archive_7z_encrypted`): coder
  06F10701 (SHA-256 iterated 2^NumCyclesPower key derivation,
  AES-256-CBC) chained before Copy/LZMA1/LZMA2, plus the BCJ x86
  branch-filter chain — the password-protected `.7z` form routine in
  public dumps, under the corpus convention password with
  wrong-password and tamper refusal arms;
- MPEG Layer II subband decode (`multimodal_audio_mp2_subbands`):
  the grouped-allocation arm beside r13's Layer I leg;
- MPEG Layer III spectral decode (`multimodal_audio_mp3_spectral`):
  side info, bit reservoir, scalefactors, Huffman, requantization —
  the sample-level path for the web's dominant audio format;
- BIFF5 Excel 5.0/95 (`source_xls_biff5`): the pre-97 LABEL-only
  workbook form the BIFF8 walk BOF-gated on.

Registered into the same QUERIES/ORACLE registry as the other query
modules; every entry carries an exact DuckDB oracle. Fresh module per
the regression discipline (new operators must not churn certified
modules)."""

from __future__ import annotations

import struct  # noqa: F401
from typing import Iterator  # noqa: F401  (pandas_udf string annotations)

import pandas as pd  # noqa: F401  (pandas_udf string annotations)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from hadoopxmlextractor_spark.queries import query
from hadoopxmlextractor_spark.tables import load

_MD5B = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':{salt}'), "
    "{pos}, 2)) AS BIGINT)"
)


def _b(salt: str, k: int) -> str:
    """SQL for byte k of md5(doc_id:salt) — the synth parameter replay."""
    return _MD5B.format(salt=salt, pos=2 * k + 1)


# ---------------------------------------------------------------------------
# 7z AES-256 member decryption (+ BCJ x86 filter chain)
# ---------------------------------------------------------------------------


def _synth_7z_aes_blob(i: int) -> bytes:
    """One deterministic password-protected 7z from md5(doc:7zaes):
    member 0 plain LZMA, member 1 AES-256 chained before a rotating
    inner codec (copy/lzma/lzma2), member 2 (when present) a BCJ x86
    + LZMA chain over a payload with real E8/E9 call opcodes so the
    branch filter actually rewrites bytes. KDF cycles rotate 6..14.
    Every 7th doc protects with a DIFFERENT password (wrong-password
    arm); every 13th doc flips a byte inside member 1's ciphertext
    (tamper arm — decrypts to garbage under the right password)."""
    import hashlib
    import lzma

    from hadoopxmlextractor_spark.operators import aes as A
    from hadoopxmlextractor_spark.operators import documents as D

    b = hashlib.md5(f"{i}:7zaes".encode()).digest()
    x = hashlib.md5(f"{i}:7zaes".encode()).hexdigest()
    pw = "realpw" if i % 7 == 6 else "infected"
    cycles = 6 + b[5] % 9
    inner = ("copy", "lzma", "lzma2")[b[2] % 3]
    c0 = (f"p{x[0:8]} " * (1 + b[1] % 3)).encode()
    c1 = (f"s{x[8:16]}m1 " * (1 + b[3] % 3)).encode()
    members = [
        ("m0.txt", c0, "lzma"),
        ("m1.txt", c1, f"aes+{inner}"),
    ]
    if b[0] % 2:
        ascii_part = (f"b{x[16:24]} " * (2 + b[4] % 2)).encode()
        members.append(
            ("m2.bin", ascii_part + b"\xe8" + bytes(4), "bcj+lzma")
        )
    blob = D.build_7z(
        members, passwords={"m1.txt": pw}, aes_cycles=cycles,
        encoded_header=bool(b[6] % 2),
    )
    if i % 13 == 12:
        # replicate the writer's m1 pipeline to locate its ciphertext,
        # then flip a byte in the middle — the tamper arm
        if inner == "copy":
            comp1 = c1
        elif inner == "lzma":
            f = dict(D._7Z_LZMA1_FILTER, id=lzma.FILTER_LZMA1)
            c = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=[f])
            comp1 = c.compress(c1) + c.flush()
        else:
            f = {"id": lzma.FILTER_LZMA2, "dict_size": 1 << 16}
            c = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=[f])
            comp1 = c.compress(c1) + c.flush()
        salt = hashlib.sha256(b"7z-salt" + b"m1.txt" + c1).digest()[:8]
        iv = hashlib.sha256(b"7z-iv" + b"m1.txt" + c1).digest()[:16]
        key = D._sz_aes_key(pw, salt, cycles)
        ct = A.cbc_encrypt_nopad(
            key, iv, comp1 + bytes((-len(comp1)) % 16)
        )
        # flip inside the FIRST ciphertext block: CBC-garbles the
        # whole first plaintext block, which every inner codec needs
        # (a mid-stream flip can land in zero padding the raw LZMA
        # decoder never consumes once max_length is reached)
        at = blob.index(ct) + 1
        out = bytearray(blob)
        out[at] ^= 0x40
        blob = bytes(out)
    return blob


@query(
    "archive_7z_encrypted",
    f"""
    WITH p AS (
      SELECT doc_id,
             {_b('7zaes', 0)} % 2 AS has_bcj,
             {_b('7zaes', 1)} AS b1, {_b('7zaes', 2)} AS b2,
             {_b('7zaes', 3)} AS b3, {_b('7zaes', 4)} AS b4,
             md5(CAST(doc_id AS VARCHAR) || ':7zaes') AS x
      FROM documents
    ),
    c AS (
      SELECT doc_id, has_bcj, b2, b4,
             repeat('p' || substring(x, 1, 8) || ' ', 1 + b1 % 3) AS c0,
             repeat('s' || substring(x, 9, 8) || 'm1 ', 1 + b3 % 3) AS c1,
             repeat('b' || substring(x, 17, 8) || ' ', 2 + b4 % 2) AS ba,
             (doc_id % 7 = 6 OR doc_id % 13 = 12) AS m1_bad
      FROM p
    ),
    rows_ AS (
      SELECT doc_id, 0 AS member_idx, 'm0.txt' AS name,
             'lzma' AS method, CAST(length(c0) AS BIGINT) AS size,
             CAST(1 AS INT) AS crc_ok, substring(c0, 1, 16) AS head
      FROM c
      UNION ALL
      SELECT doc_id, 1, 'm1.txt',
             'aes256+' || (['copy', 'lzma', 'lzma2'])[1 + b2 % 3],
             CAST(length(c1) AS BIGINT),
             CASE WHEN m1_bad THEN 0 ELSE 1 END,
             CASE WHEN m1_bad THEN NULL ELSE substring(c1, 1, 16) END
      FROM c
      UNION ALL
      SELECT doc_id, 2, 'm2.bin', 'lzma+bcj',
             CAST(length(ba) + 5 AS BIGINT), CAST(1 AS INT),
             substring(ba, 1, 16)
      FROM c WHERE has_bcj = 1
    )
    SELECT * FROM rows_
    """,
)
def q_archive_7z_encrypted(spark: SparkSession, sf: str) -> DataFrame:
    # 7z AES-256 MEMBERS (r14, VERDICT r13 item 3) — password-
    # protected .7z is routine in public dumps; the folder is a
    # two-coder chain (AES-256 coder 06F10701 consuming the pack
    # stream, inner codec consuming the decrypted bytes) joined by a
    # bind pair. Key = SHA-256 iterated 2^NumCyclesPower over
    # salt || UTF-16LE password || counter; AES-256-CBC, zero pad
    # trimmed by the coder's declared out size. The BCJ x86 branch-
    # filter chain (the binary-heavy-archive form) decodes through
    # the stdlib FILTER_X86 raw chain. Wrong password / tampered
    # ciphertext yield a PER-MEMBER crc_ok=0 verdict (the 7z header
    # is never encrypted in this layout, so the member surface still
    # reports) and the kernel refuses to surface unverified
    # plaintext (head NULL). One Arrow pass, ids-only shuffle.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )

    def _rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "member_idx", "name", "method", "size",
                "crc_ok", "head"]
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                blob = _synth_7z_aes_blob(i)
                try:
                    for k, mrow in enumerate(
                        D.sevenzip_members(blob, password="infected")
                    ):
                        ok = mrow["crc_ok"]
                        rows.append({
                            "doc_id": i, "member_idx": k,
                            "name": mrow["name"],
                            "method": mrow["method"],
                            "size": mrow["size"],
                            "crc_ok": None if ok is None else int(ok),
                            "head": (
                                None if ok is False else mrow["head"]
                            ),
                        })
                except (ValueError, IndexError, struct.error):
                    rows.append({
                        "doc_id": i, "member_idx": -1, "name": None,
                        "method": None, "size": None, "crc_ok": None,
                        "head": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return docs.select("doc_id").mapInPandas(
        _rows,
        schema="doc_id bigint, member_idx int, name string, "
        "method string, size bigint, crc_ok int, head string",
    )


# ---------------------------------------------------------------------------
# BIFF5 (Excel 5.0/95) workbooks
# ---------------------------------------------------------------------------


def _synth_xls5_blob(i: int) -> bytes:
    """One deterministic BIFF5 .xls from md5(doc:xls5): a 'S95' sheet
    with cp1252 LABEL byte strings (é), RK ints, fX100 RK cents, and
    integral NUMBERs; a second 'Extra' sheet on even b0. Every 9th
    doc rewrites the leading BOF version to BIFF4 (0x0400) — the
    unknown-generation refusal arm."""
    import hashlib
    import struct as _s

    from hadoopxmlextractor_spark.operators import documents as D

    b = hashlib.md5(f"{i}:xls5".encode()).digest()
    x = hashlib.md5(f"{i}:xls5".encode()).hexdigest()
    cells = []
    for r in range(2 + b[1] % 3):
        cells.append((r, 0, "label", f"é{x[4 * r : 4 * r + 4]} v95"))
        cells.append((r, 1, "rk", b[2] * 100 + r))
        cells.append((r, 2, "rk100", b[3] * 7 + r * 13))
        cells.append((r, 3, "number", float(b[4] + r)))
    sheets = [("S95", cells)]
    if b[0] % 2 == 0:
        sheets.append(
            ("Extra", [(0, 0, "label", f"x{x[20:24]} tail")])
        )
    blob = D.build_xls5(sheets)
    if i % 9 == 8:
        bof = _s.pack("<HHHHHH", 0x0809, 8, 0x0500, 0x0005, 0, 0)
        at = blob.index(bof)
        out = bytearray(blob)
        _s.pack_into("<H", out, at + 4, 0x0400)
        blob = bytes(out)
    return blob


@query(
    "source_xls_biff5",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('xls5', 0)} % 2 AS b0,
             2 + {_b('xls5', 1)} % 3 AS n, {_b('xls5', 2)} AS b2,
             {_b('xls5', 3)} AS b3, {_b('xls5', 4)} AS b4,
             md5(CAST(doc_id AS VARCHAR) || ':xls5') AS x
      FROM documents
    ),
    g AS (
      SELECT doc_id, g.g AS r, b2, b3, b4, x
      FROM p, (VALUES (0), (1), (2), (3)) g(g)
      WHERE g.g < n AND doc_id % 9 <> 8
    ),
    cells AS (
      SELECT doc_id, 0 AS sheet, 'S95' AS sheet_name, r, 0 AS col,
             'label' AS kind,
             'é' || substring(x, 4 * r + 1, 4) || ' v95' AS value
      FROM g
      UNION ALL
      SELECT doc_id, 0, 'S95', r, 1, 'rk',
             CAST(b2 * 100 + r AS VARCHAR)
      FROM g
      UNION ALL
      SELECT doc_id, 0, 'S95', r, 2, 'rk',
             CAST((b3 * 7 + r * 13) // 100 AS VARCHAR) || '.'
               || lpad(CAST((b3 * 7 + r * 13) % 100 AS VARCHAR),
                       2, '0')
      FROM g
      UNION ALL
      SELECT doc_id, 0, 'S95', r, 3, 'n', CAST(b4 + r AS VARCHAR)
      FROM g
      UNION ALL
      SELECT doc_id, 1, 'Extra', 0, 0, 'label',
             'x' || substring(x, 21, 4) || ' tail'
      FROM p WHERE b0 = 0 AND doc_id % 9 <> 8
    )
    SELECT doc_id, CAST(sheet AS INT) AS sheet, sheet_name,
           CAST(r AS INT) AS row, CAST(col AS INT) AS col, kind, value
    FROM cells
    UNION ALL
    SELECT doc_id, -1, NULL, NULL, NULL, NULL, NULL
    FROM p WHERE doc_id % 9 = 8
    """,
)
def q_source_xls_biff5(spark: SparkSession, sf: str) -> DataFrame:
    # BIFF5 EXCEL 5.0/95 (r14, VERDICT r13 item 5) — the pre-97
    # workbook generation the BIFF8 walk BOF-gated on: no SST, every
    # string an inline LABEL byte string in the CODEPAGE record's
    # encoding, BOUNDSHEET names 1-byte-length byte strings, the
    # stream under the legacy 'Book' CFB name. RK/NUMBER/MULRK parse
    # unchanged; FORMULA and SST records inside a BIFF5 stream refuse
    # (mis-parse is worse than refusal), as does any non-5/8 BOF
    # generation (the every-9th BIFF4 arm). One Arrow pass, ids-only
    # shuffle.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )

    def _rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "sheet", "sheet_name", "row", "col",
                "kind", "value"]
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                blob = _synth_xls5_blob(i)
                try:
                    for c in D.xls_cells(blob):
                        rows.append({
                            "doc_id": i, "sheet": c["sheet"],
                            "sheet_name": c["sheet_name"],
                            "row": c["row"], "col": c["col"],
                            "kind": c["kind"], "value": c["value"],
                        })
                except (ValueError, IndexError, struct.error):
                    rows.append({
                        "doc_id": i, "sheet": -1, "sheet_name": None,
                        "row": None, "col": None, "kind": None,
                        "value": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return docs.select("doc_id").mapInPandas(
        _rows,
        schema="doc_id bigint, sheet int, sheet_name string, "
        "row int, col int, kind string, value string",
    )
