"""Round-9 document-format queries — the text a crawl carries OUTSIDE
HTML: ZIP/TAR archives, DOCX/XLSX/PPTX and EPUB (ZIP-of-XML — the
reference's XML extraction heritage applied to office/ebook
containers), PDF content streams, LaTeX source, SRT/WebVTT subtitles,
RSS/Atom feeds, mbox email (+ reply-chain threading), HTML structured
metadata and web tables, and source-code triage features — plus the
compositions: documents→corpus admission with a CROSS-FORMAT dedup
plant, feeds→crawl-frontier assembly, and subtitle↔shot multimodal
alignment.

All are single Arrow-pass operators from
:mod:`hadoopxmlextractor_spark.operators.documents` over
md5-parameterized synthetic blobs (the capstones add exactly the one
shuffle their aggregate/join needs), so every oracle replays the
extracted fields — member names, inflated sizes, paragraph/chapter/
page text, cue timestamps, entry epochs, thread roots — with pure
integer and string arithmetic. No float crosses the engine boundary
anywhere in this module.
"""

from __future__ import annotations

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

_W = "(['alpha','bravo','charlie','delta','echo'])"


def _b(salt: str, k: int) -> str:
    """SQL for byte k of md5(doc_id:salt) — the synth parameter replay."""
    return _MD5B.format(salt=salt, pos=2 * k + 1)


@query(
    "source_docx_text",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('docx', 0)} AS b0, {_b('docx', 1)} AS b1,
             {_b('docx', 2)} AS b2
      FROM documents
    ),
    e AS (
      SELECT doc_id, 1 + b0 % 3 AS n,
             {_W}[b1 % 5 + 1] || ' 0'
               || CASE WHEN b2 % 2 = 1 THEN chr(9) || 'tabbed'
                  ELSE '' END AS p0,
             {_W}[(b1 + 1) % 5 + 1] || ' 1' AS p1,
             {_W}[(b1 + 2) % 5 + 1] || ' 2' AS p2
      FROM p
    )
    SELECT doc_id, 'docx' AS format, CAST(n AS INT) AS n_units,
           p0 || CASE WHEN n >= 2 THEN chr(10) || p1 ELSE '' END
              || CASE WHEN n >= 3 THEN chr(10) || p2 ELSE '' END AS text
    FROM e
    """,
)
def q_source_docx_text(spark: SparkSession, sf: str) -> DataFrame:
    # DOCX text extraction — the office-document leg of the crawl's
    # non-HTML text (r9): a REAL ZIP central-directory walk (EOCD
    # scan-back past a trailing comment, stored + deflate inflate,
    # CRC verify; word/document.xml rotates the bit-3 data-descriptor
    # convention so zero-size local headers stay live) feeding an
    # ElementTree paragraph walk — w:t runs concatenated, w:tab as a
    # TAB character (an element, not text — paragraph 0 plants one on
    # b2%2), bold rPr formatting transparent. The oracle reconstructs
    # the exact paragraph text incl. the chr(9)/chr(10) structure.
    # One Arrow pass, zero shuffle (SCALE.md: per-blob kernel).
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents")
    return D.document_text(D.synth_docx(docs))


@query(
    "source_epub_text",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('epub', 1)} AS b1, {_b('epub', 2)} AS b2,
             {_b('epub', 3)} AS b3
      FROM documents
    ),
    e AS (
      SELECT doc_id, 1 + b1 % 3 AS n, b2 % 2 AS rev,
             [{_W}[b3 % 5 + 1] || ' chapter 0',
              {_W}[(b3 + 1) % 5 + 1] || ' chapter 1',
              {_W}[(b3 + 2) % 5 + 1] || ' chapter 2'] AS chs
      FROM p
    )
    SELECT doc_id, 'epub' AS format, CAST(n AS INT) AS n_units,
           array_to_string(
             CASE WHEN rev = 1 THEN list_reverse(chs[1:n])
                  ELSE chs[1:n] END, chr(10)) AS text
    FROM e
    """,
)
def q_source_epub_text(spark: SparkSession, sf: str) -> DataFrame:
    # EPUB text extraction (r9): META-INF/container.xml names the OPF
    # package (its directory rotates OEBPS/ vs archive root, so href
    # resolution is live), the OPF spine's itemref order — REVERSED vs
    # zip layout on b2%2 — is the reading order resolved through the
    # manifest id→href map, and each XHTML chapter contributes its
    # <body> text with the <head><title> subtree dropped. A nav.xhtml
    # present in the manifest but NOT the spine must never be emitted
    # (the decoy keeps spine-driven selection honest). The oracle
    # replays chapter text in the same spine order via list slicing +
    # conditional reverse. One Arrow pass, zero shuffle.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents")
    return D.document_text(D.synth_epub(docs))


@query(
    "source_pdf_text",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('pdf', 0)} AS b0, {_b('pdf', 2)} AS b2,
             {_b('pdf', 4)} AS b4
      FROM documents
    ),
    pg AS (
      SELECT doc_id, 1 + b0 % 3 AS n,
             unnest(generate_series(0, b0 % 3)) AS pp, b2, b4
      FROM p
    ),
    t AS (
      SELECT doc_id, n, pp,
             {_W}[(b2 + pp) % 5 + 1] ||
             CASE (b4 + pp) % 8
                  WHEN 0 THEN ' page ' || CAST(pp AS VARCHAR)
                  WHEN 1 THEN ' (page) ' || CAST(pp AS VARCHAR)
                  WHEN 2 THEN ' A' || CAST(pp AS VARCHAR)
                  WHEN 3 THEN ' (nested) ' || CAST(pp AS VARCHAR)
                  WHEN 4 THEN ' hex ' || CAST(pp AS VARCHAR)
                  WHEN 5 THEN ' cid ' || CAST(pp AS VARCHAR)
                  WHEN 6 THEN ' don’t ' || CAST(pp AS VARCHAR)
                  ELSE ' é•á ' || CAST(pp AS VARCHAR) END AS page_text
      FROM pg
    )
    SELECT doc_id, 'pdf' AS format, CAST(n AS INT) AS n_units,
           string_agg(page_text, chr(10) ORDER BY pp) AS text
    FROM t
    GROUP BY doc_id, n
    """,
)
def q_source_pdf_text(spark: SparkSession, sf: str) -> DataFrame:
    # PDF text extraction (r9) — the single largest non-HTML text
    # source on the web: object walk → /Catalog → /Pages → /Kids order
    # → per-page /Contents stream (FlateDecode rotating with plain per
    # (b1+p)%2 — both inflate branches live), then the content-stream
    # text operators: Tj, TJ arrays whose inter-string numbers are
    # kerning (concatenated with NOTHING, as a viewer lays them),
    # literal-string escapes \\( \\) (variant 1), octal \\101 → 'A'
    # (variant 2), balanced UNESCAPED nested parens inside one literal
    # (variant 3, legal per ISO 32000 §7.3.4.2), whitespace-tolerant
    # HEX strings <...> (variant 4, §7.3.4.3), (r10) CID hex
    # strings mapped through the page font's /ToUnicode CMap (variant
    # 5, §9.10.3 — bfchar + array bfrange both live), and (r11) the
    # SIMPLE-FONT encodings (§9.6.6) that dominate real ToUnicode-less
    # PDFs: /Encoding /WinAnsiEncoding (variant 6 — byte 0x92 must
    # surface as U+2019, not a C1 control) and an indirect /Encoding
    # dict with /BaseEncoding /MacRomanEncoding + /Differences
    # (variant 7 — 'A'→/eacute remap, 233→/bullet, 0x87 from the
    # MacRoman base). The FILE
    # STRUCTURE also rotates (b3%2): classic xref tables vs the PDF
    # 1.5+ /XRef cross-reference stream (W-array, PNG Up predictor)
    # with dict objects packed in a FlateDecode /ObjStm — the modern
    # layout most real PDFs use. The oracle reconstructs the shown
    # text of every variant; the container rotation must be
    # text-invariant. One Arrow pass.
    from hadoopxmlextractor_spark.operators import documents as D

    # id-only repartition before the per-doc xref/CMap work (r10): the
    # one-file test table yields a single scan partition, serializing
    # the codec kernels on a 32-core box; at 100 TB this is a
    # no-op-sized shuffle of ids, never of document bytes
    docs = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return D.document_text(D.synth_pdf(docs))


@query(
    "archive_zip_meta",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('zip', 0)} AS b0, {_b('zip', 1)} AS b1,
             {_b('zip', 2)} AS b2, {_b('zip', 3)} AS b3,
             {_b('zip', 4)} AS b4
      FROM documents
    ),
    m AS (
      SELECT doc_id, unnest(generate_series(0, b0 % 4)) AS k,
             b1, b2, b3, b4
      FROM p
    ),
    e AS (
      SELECT doc_id, k,
             (['notes','readme','data','img','logs'])[(b1 + k) % 5 + 1]
               || '_' || CAST(k AS VARCHAR)
               || (['.txt','.csv','.md'])[(b2 + k) % 3 + 1] AS name,
             b3, b4
      FROM m
    )
    SELECT doc_id AS archive_id, CAST(k AS INT) AS member_idx, name,
           CASE WHEN (b4 + k) % 2 = 1 THEN 'deflate' ELSE 'stored' END
             AS method,
           CAST(LENGTH(name || ' ' ||
                repeat('row ' || CAST(k AS VARCHAR) || ' ',
                       3 + (b3 + k) % 5)) AS BIGINT) AS uncomp_bytes,
           TRUE AS crc_ok,
           substring(name || ' ' ||
                repeat('row ' || CAST(k AS VARCHAR) || ' ',
                       3 + (b3 + k) % 5), 1, 16) AS head
    FROM e
    """,
)
def q_archive_zip_meta(spark: SparkSession, sf: str) -> DataFrame:
    # ZIP archive walk (r9) — the container under DOCX/EPUB/JAR and a
    # large share of crawled binary attachments: EOCD located by the
    # APPNOTE backward scan (a trailing archive comment rotates on
    # b6%2, so the scan-back is live, not decorative), central
    # directory walked as the authoritative member table, and every
    # member ACTUALLY inflated (stored + deflate rotating per member,
    # data-descriptor members carry zero sizes in their local headers
    # per bit 3 — (b5+k)%3==0 keeps that convention live) with CRC32
    # verified over the inflated bytes; `head` is the first 16 decoded
    # characters, so the oracle's substring replay proves the inflate
    # really ran. One Arrow pass, zero shuffle.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents")
    return D.archive_members(D.synth_zip_archives(docs))


@query(
    "source_subtitle_cues",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('subs', 0)} AS b0, {_b('subs', 1)} AS b1,
             {_b('subs', 2)} AS b2, {_b('subs', 3)} AS b3,
             {_b('subs', 4)} AS b4, {_b('subs', 5)} AS b5
      FROM documents
    ),
    c AS (
      SELECT doc_id, unnest(generate_series(0, b0 % 4)) AS cc,
             3000 + 500 * (b1 % 10) AS gap, b2 % 1000 AS tail,
             b3, b4, b5
      FROM p
    )
    SELECT doc_id AS media_id, CAST(cc AS INT) AS cue_idx,
           CASE WHEN doc_id % 2 = 1 THEN 'vtt' ELSE 'srt' END AS kind,
           CAST(gap * cc + tail AS BIGINT) AS start_ms,
           CAST(gap * cc + tail + 800 + 250 * ((b3 + cc) % 12) AS BIGINT)
             AS end_ms,
           {_W}[(b4 + cc) % 5 + 1] || ' cue ' || CAST(cc AS VARCHAR)
             || CASE WHEN doc_id % 2 = 0 AND (b5 + cc) % 2 = 1
                THEN chr(10) || 'line two ' || CAST(cc AS VARCHAR)
                ELSE '' END AS text
    FROM c
    """,
)
def q_source_subtitle_cues(spark: SparkSession, sf: str) -> DataFrame:
    # Subtitle cue tables (r9) — the transcript side of crawled video
    # and the alignment table a multimodal training pipeline joins
    # against frame timestamps: SRT (even docs — numeric index lines,
    # comma millisecond separator, multi-line cue bodies) and WebVTT
    # (odd docs — WEBVTT signature, NOTE blocks skipped, optional cue
    # identifiers, optional HOURS field (MM:SS.mmm short form rotates),
    # cue settings after the arrow ignored, <i> inline tags STRIPPED).
    # Timestamps normalize to integer milliseconds, so the oracle is
    # pure integer arithmetic over the synth grid. One Arrow pass.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents")
    return D.subtitle_cues(D.synth_subtitles(docs))


@query(
    "source_feed_entries",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('feed', 0)} AS b0, {_b('feed', 1)} AS b1,
             {_b('feed', 2)} AS b2, {_b('feed', 3)} AS b3,
             {_b('feed', 4)} AS b4
      FROM documents
    ),
    c AS (
      SELECT doc_id, unnest(generate_series(0, b0 % 4)) AS e,
             b1, b2, b3, b4
      FROM p
    )
    SELECT doc_id AS feed_id, CAST(e AS INT) AS entry_idx,
           CASE WHEN doc_id % 2 = 0 THEN 'rss' ELSE 'atom' END AS kind,
           {_W}[(b1 + e) % 5 + 1] || ' post ' || CAST(e AS VARCHAR)
             AS title,
           'https://ex.org/' || CAST(doc_id AS VARCHAR) || '/'
             || CAST(e AS VARCHAR) AS url,
           CAST((1700000000 + 86400 * b2 + 3600 * e + 7 * b3) * 1000
                AS BIGINT) AS published_ms,
           'summary ' || {_W}[(b4 + e) % 5 + 1] || ' ' || CAST(e AS VARCHAR)
             AS summary
    FROM c
    """,
)
def q_source_feed_entries(spark: SparkSession, sf: str) -> DataFrame:
    # RSS/Atom feed parsing (r9) — the crawl frontier's change-
    # discovery source and the reference's XML heritage on the fetch
    # side (sitemap's sibling): RSS 2.0 channel/item (element-text
    # links, RFC 822 pubDate, CDATA descriptions rotating on (b5+e)%2)
    # and Atom feed/entry (@href links, ISO 8601 Zulu updated) both
    # normalize through the SAME integer civil-date arithmetic
    # (Hinnant days-from-civil — locale-free, no strptime %b) to epoch
    # milliseconds, which the oracle replays as the planted integer.
    # One Arrow pass, zero shuffle.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents")
    return D.feed_entries(D.synth_feeds(docs))


@query(
    "source_xlsx_cells",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('xlsx', 0)} AS b0, {_b('xlsx', 1)} AS b1,
             {_b('xlsx', 2)} AS b2, {_b('xlsx', 3)} AS b3,
             {_b('xlsx', 4)} AS b4, {_b('xlsx', 5)} AS b5
      FROM documents
    ),
    s AS (
      SELECT doc_id, unnest(generate_series(0, b0 % 2)) AS s,
             b0, b1, b2, b3, b4, b5
      FROM p
    ),
    ph AS (
      SELECT doc_id, s,
             CASE WHEN b0 % 2 = 1 THEN (s + b5 % 2) % 2 ELSE 0 END AS pp,
             b1, b2, b3, b4
      FROM s
    ),
    r AS (
      SELECT doc_id, s, pp, unnest(generate_series(0, (b1 + pp) % 3)) AS r0,
             b2, b3, b4
      FROM ph
    )
    SELECT doc_id, 'S' || CAST(s AS VARCHAR) AS sheet,
           CAST(r0 + 1 AS INT) AS "row", 'A' AS col, 's' AS kind,
           {_W}[(b2 + pp + r0) % 5 + 1] AS value
    FROM r
    UNION ALL
    SELECT doc_id, 'S' || CAST(s AS VARCHAR), CAST(r0 + 1 AS INT), 'B', 'n',
           CAST((b3 + 17 * r0 + pp) % 1000 AS VARCHAR)
    FROM r
    UNION ALL
    SELECT doc_id, 'S' || CAST(s AS VARCHAR), CAST(r0 + 1 AS INT), 'C',
           CASE WHEN (b4 + r0 + pp) % 2 = 1 THEN 'inlineStr' ELSE 'str' END,
           CASE WHEN (b4 + r0 + pp) % 2 = 1
                THEN 'inline ' || {_W}[(b2 + r0) % 5 + 1]
                ELSE 'calc ' || CAST(r0 AS VARCHAR) END
    FROM r
    """,
)
def q_source_xlsx_cells(spark: SparkSession, sf: str) -> DataFrame:
    # XLSX cell extraction (r9) — tabular training data inside the
    # crawl's office documents: workbook.xml's <sheet> order resolved
    # through the workbook RELS (with two sheets, b5%2 swaps which
    # physical worksheet member each name reaches — the oracle's
    # name->content join fails if resolution ever falls back to zip
    # member naming), shared-string cells looked up in
    # xl/sharedStrings.xml, inline strings from <is><t>, cached
    # formula strings (t="str") from <v>, and numbers kept as their
    # RAW token (no float parse — so the oracle replay is exact string
    # arithmetic). One Arrow pass, zero shuffle.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents")
    return D.xlsx_cells(D.synth_xlsx(docs))


@query(
    "source_pptx_text",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('pptx', 0)} AS b0, {_b('pptx', 1)} AS b1,
             {_b('pptx', 2)} AS b2, {_b('pptx', 3)} AS b3
      FROM documents
    ),
    k AS (
      SELECT doc_id, 1 + b0 % 3 AS n, unnest(generate_series(0, b0 % 3)) AS k,
             b1, b2, b3
      FROM p
    ),
    m AS (
      SELECT doc_id, n, k,
             CASE WHEN b1 % 2 = 1 THEN n - 1 - k ELSE k END AS mm, b2, b3
      FROM k
    ),
    t AS (
      SELECT doc_id, n, k,
             {_W}[(b2 + mm) % 5 + 1] || ' slide ' || CAST(mm AS VARCHAR)
               || chr(10) || 'point one ' || CAST(mm AS VARCHAR)
               || CASE WHEN (b3 + mm) % 2 = 1
                  THEN chr(10) || 'point two ' || CAST(mm AS VARCHAR)
                  ELSE '' END AS slide_text
      FROM m
    )
    SELECT doc_id, 'pptx' AS format, CAST(n AS INT) AS n_units,
           string_agg(slide_text, chr(10) ORDER BY k) AS text
    FROM t
    GROUP BY doc_id, n
    """,
)
def q_source_pptx_text(spark: SparkSession, sf: str) -> DataFrame:
    # PPTX slide-text extraction (r9), through the same unified
    # document_text dispatch as DOCX/EPUB/PDF: presentation.xml's
    # <p:sldIdLst> order resolved through the presentation RELS — and
    # b1%2 REVERSES that order relative to the physical slide member
    # numbering, so the oracle diverges if extraction ever walks
    # members by name instead of by relationship; a:t runs concatenate
    # per a:p paragraph (title rPr formatting transparent), paragraphs
    # and slides join with newlines. One Arrow pass, zero shuffle.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents")
    return D.document_text(D.synth_pptx(docs))


@query(
    "pipeline_documents_to_corpus",
    """
    WITH c AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 1 THEN doc_id - 1 ELSE doc_id END AS cid
      FROM documents
    ),
    f AS (
      SELECT doc_id, cid, md5(CAST(cid AS VARCHAR) || ':d2c') AS x,
             (cid % 7 = 3) AS short
      FROM c
    ),
    txt AS (
      SELECT doc_id,
             (['pdf','docx','epub'])[CAST(doc_id % 3 AS INT) + 1] AS format,
             CASE WHEN short
                  THEN 'w' || substring(x, 1, 2) || ' w' || substring(x, 3, 2)
                  ELSE 'w' || substring(x, 1, 2) || ' w' || substring(x, 3, 2)
                    || ' w' || substring(x, 5, 2) || ' w' || substring(x, 7, 2)
                    || chr(10)
                    || 'w' || substring(x, 9, 2) || ' w' || substring(x, 11, 2)
                    || ' w' || substring(x, 13, 2) || ' w' || substring(x, 15, 2)
             END AS extracted,
             CASE WHEN short THEN 2 ELSE 8 END AS n_tokens
      FROM f
    ),
    g AS (
      SELECT doc_id, format, extracted, n_tokens,
             md5(replace(extracted, chr(10), ' ')) AS fp
      FROM txt
    ),
    pass AS (SELECT doc_id, fp FROM g WHERE n_tokens >= 5),
    rn AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM pass
    )
    SELECT g.doc_id, g.format, g.extracted,
           CAST(g.n_tokens AS INT) AS n_tokens, g.fp AS fingerprint,
           CASE WHEN g.n_tokens < 5 THEN 'short'
                WHEN rn.rn > 1 THEN 'duplicate'
                ELSE 'kept' END AS reason,
           (g.n_tokens >= 5 AND rn.rn = 1) AS kept
    FROM g LEFT JOIN rn ON g.doc_id = rn.doc_id
    """,
)
def q_pipeline_documents_to_corpus(spark: SparkSession, sf: str) -> DataFrame:
    # The document-tier CAPSTONE — the non-HTML twin of
    # pipeline_crawl_to_corpus: mixed PDF / DOCX / EPUB blobs (format
    # rotating by doc_id%3, PDF alternating FlateDecode/plain) →
    # document_text total-routing extraction → whitespace token-count
    # quality gate (cid%7==3 docs carry 2 words → 'short') → exact
    # fingerprint dedup among survivors. The dedup plant is CROSS-
    # FORMAT: doc 10k+1 carries the same content id as doc 10k but a
    # DIFFERENT container, so the duplicate is only caught if a PDF
    # and a DOCX of the same words extract to the IDENTICAL text —
    # the property that makes container-agnostic corpus dedup work.
    # Scale shape: extraction and gating are map-side Arrow passes;
    # the only shuffle is the fingerprint hash partition.
    import hashlib

    from pyspark.sql import Window

    from hadoopxmlextractor_spark.operators import documents as D
    from hadoopxmlextractor_spark.operators import text as T

    # id-only repartition before the per-doc container synth/extract
    # (see q_source_pdf_text) — the fingerprint exchange downstream
    # is unchanged
    docs = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )

    @F.pandas_udf("binary")
    def _blob(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            out = []
            for i in ids:
                i = int(i)
                cid = i - 1 if i % 10 == 1 else i
                x = hashlib.md5(f"{cid}:d2c".encode()).hexdigest()

                def hp(j: int) -> str:
                    return x[2 * j - 2 : 2 * j]

                if cid % 7 == 3:
                    units = [f"w{hp(1)} w{hp(2)}"]
                else:
                    units = [
                        f"w{hp(1)} w{hp(2)} w{hp(3)} w{hp(4)}",
                        f"w{hp(5)} w{hp(6)} w{hp(7)} w{hp(8)}",
                    ]
                fmt = ("pdf", "docx", "epub")[i % 3]
                out.append(
                    D.synth_text_document(fmt, units, flate=cid % 2 == 0)
                )
            yield pd.Series(out)

    blobs = docs.select("doc_id", _blob("doc_id").alias("content"))
    ext = (
        D.document_text(blobs)
        .select("doc_id", "format", F.col("text").alias("extracted"))
        .withColumn(
            "n_tokens", F.size(T.tokens(F.col("extracted"))).cast("int")
        )
        .withColumn("fingerprint", T.fingerprint(F.col("extracted")))
        # r14-opt (guide §5): ext feeds the dedup-rank branch AND the
        # final join — unpersisted, the whole synth→extract Python
        # chain ran twice (baseline plan: two parquet scans, two
        # ArrowEvalPython, two MapInPandas). The cache holds extracted
        # TEXT (never the container blobs), so it is the small end of
        # the pipeline at any scale. Eager count per the AQE race rule.
        .persist()
    )
    ext.count()
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    passing = ext.filter(F.col("n_tokens") >= 5).select(
        "doc_id", F.row_number().over(w).alias("rn")
    )
    return ext.join(passing, "doc_id", "left").select(
        "doc_id", "format", "extracted", "n_tokens", "fingerprint",
        F.when(F.col("n_tokens") < 5, F.lit("short"))
        .when(F.col("rn") > 1, F.lit("duplicate"))
        .otherwise(F.lit("kept"))
        .alias("reason"),
        ((F.col("n_tokens") >= 5) & (F.col("rn") == 1)).alias("kept"),
    )


@query(
    "archive_tar_meta",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('tar', 0)} AS b0, {_b('tar', 1)} AS b1,
             {_b('tar', 2)} AS b2, {_b('tar', 3)} AS b3
      FROM documents
    ),
    m AS (
      SELECT doc_id, unnest(generate_series(0, 1 + b0 % 4)) AS kk,
             1 + b0 % 4 AS n, b1, b2, b3
      FROM p
    ),
    e AS (
      SELECT doc_id, kk, kk - 1 AS k0, n, b1, b2,
             (kk - 1 = b3 % n) AS is_long
      FROM m
    ),
    named AS (
      SELECT doc_id, kk, k0,
             -- r14: directory names normalize slash-free (stdlib-
             -- tarfile-matching; real-fixture sweep)
             CASE WHEN kk = 0 THEN 'top'
                  WHEN is_long THEN 'top/'
                    || repeat('deep_directory_level/', 5)
                    || 'leaf_' || CAST(k0 AS VARCHAR) || '.txt'
                  ELSE 'top/'
                    || (['notes','readme','data','img','logs'])
                       [(b1 + k0) % 5 + 1]
                    || '_' || CAST(k0 AS VARCHAR) || '.txt' END AS name,
             CASE WHEN kk = 0 THEN NULL
                  WHEN is_long THEN 'leaf_' || CAST(k0 AS VARCHAR) || '.txt'
                  ELSE (['notes','readme','data','img','logs'])
                       [(b1 + k0) % 5 + 1]
                    || '_' || CAST(k0 AS VARCHAR) || '.txt' END
               || ' ' || repeat('row ' || CAST(k0 AS VARCHAR) || ' ',
                                3 + (b2 + k0) % 5) AS payload
      FROM e
    )
    SELECT doc_id AS archive_id, CAST(kk AS INT) AS member_idx, name,
           CASE WHEN kk = 0 THEN '5' ELSE '0' END AS typeflag,
           CAST(CASE WHEN kk = 0 THEN 0 ELSE LENGTH(payload) END
                AS BIGINT) AS uncomp_bytes,
           CASE WHEN kk = 0 THEN NULL
                ELSE substring(payload, 1, 16) END AS head
    FROM named
    """,
)
def q_archive_tar_meta(spark: SparkSession, sf: str) -> DataFrame:
    # TAR/ustar walk (r9) — the other dominant archive format in a
    # crawl (source tarballs, data releases), with .tar.gz handled
    # transparently (odd docs gzip the whole archive — both container
    # branches live): 512-byte header blocks with the POSIX checksum
    # VERIFIED per header (chksum field read as spaces; a flipped byte
    # refuses the stream), octal size fields, ceil(size/512) data
    # runs, a leading DIRECTORY entry (typeflag 5), and one entry per
    # archive carrying a >100-char GNU 'L' long-name extension whose
    # payload names the following header — the convention GNU/BSD tar
    # emit. `head` proves the data run was located correctly. One
    # Arrow pass, zero shuffle.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents")
    return D.archive_tar_members(D.synth_tar_archives(docs))


@query(
    "pipeline_feeds_to_frontier",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('feedf', 0)} AS b0 FROM documents
    ),
    ent AS (
      SELECT doc_id, unnest(generate_series(0, b0 % 3)) AS e FROM p
    ),
    m AS (
      SELECT doc_id, e, doc_id + 7 * e AS mm,
             (doc_id + 7 * e) % 300 AS pid
      FROM ent
    ),
    canon AS (
      SELECT doc_id, e,
             (CASE WHEN mm % 3 = 0 THEN 'http' ELSE 'https' END)
               || '://example' || CAST(pid % 4 AS VARCHAR)
               || '.com/page/' || CAST(pid AS VARCHAR)
               || CASE WHEN mm % 2 = 0
                  THEN '?x=' || CAST(pid % 3 AS VARCHAR) ELSE '' END
               AS canon_url,
             (pid % 4 = 3) AS blocked
      FROM m
    )
    SELECT canon_url,
           CAST(MIN(doc_id * 10 + e) AS BIGINT) AS first_ref,
           CAST(COUNT(*) AS BIGINT) AS n_refs
    FROM canon
    WHERE NOT blocked
    GROUP BY canon_url
    """,
)
def q_pipeline_feeds_to_frontier(spark: SparkSession, sf: str) -> DataFrame:
    # The crawl-FRONTIER capstone — change discovery to fetch queue
    # through four certified stages in one plan: RSS/Atom parsing
    # (messy links XML-escaped, RFC822/ISO dates), URL
    # canonicalization (uppercase scheme+host, scheme-default ports,
    # trailing slashes, utm_* tracking params, fragments — every
    # variation planted), suffix blocklist on the CANONICAL host
    # (example3.com ~25% of pages), and exact frontier dedup keyed on
    # the canonical URL (entries m and m+300 collapse organically,
    # often across DIFFERENT feeds and cosmetic forms). The oracle is
    # the ANALYTICALLY-derived canonical form — it never reapplies the
    # engine's regexes, so any canonicalization defect diverges. Scale
    # shape: parse + canon + blocklist are map-side; the only shuffle
    # is the canonical-URL aggregate.
    from hadoopxmlextractor_spark.operators import documents as D
    from hadoopxmlextractor_spark.operators import text as T

    docs = load(spark, sf, "documents")
    entries = D.feed_entries(D.synth_frontier_feeds(docs))
    canon = entries.select(
        "feed_id", "entry_idx", T.canonical_url(F.col("url")).alias("canon_url")
    ).withColumn(
        "host", F.regexp_extract(F.col("canon_url"), r"^[a-z]+://([^/?#]+)", 1)
    )
    kept = canon.filter(~F.col("host").like("%example3.com"))
    return kept.groupBy("canon_url").agg(
        F.min(F.col("feed_id") * 10 + F.col("entry_idx")).alias("first_ref"),
        F.count(F.lit(1)).alias("n_refs"),
    )


@query(
    "source_latex_text",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('tex', 0)} AS b0, {_b('tex', 1)} AS b1,
             {_b('tex', 2)} AS b2, {_b('tex', 3)} AS b3,
             {_b('tex', 5)} AS b5, {_b('tex', 6)} AS b6,
             {_b('tex', 7)} AS b7, {_b('tex', 8)} AS b8,
             {_b('tex', 9)} AS b9
      FROM documents
    ),
    t AS (
      SELECT doc_id,
             {_W}[(b0 + 0) % 5 + 1] || ' study ' || CAST(doc_id AS VARCHAR)
             || ' intro ' || {_W}[(b1 + 1) % 5 + 1]
             || ' ' || {_W}[(b2 + 2) % 5 + 1]
             || ' part ' || CAST(1 + b8 % 9 AS VARCHAR)
             || ' nested ' || {_W}[(b3 + 3) % 5 + 1]
             || ' bold follows math inline and then display '
             || {_W}[(b5 + 5) % 5 + 1] || ' one '
             || {_W}[(b6 + 6) % 5 + 1] || ' two '
             || CAST(b9 % 100 AS VARCHAR) || '% of &'
             || {_W}[(b7 + 7) % 5 + 1] || ' cited' AS text
      FROM p
    )
    SELECT doc_id, text,
           CAST(LENGTH(text) - LENGTH(replace(text, ' ', '')) + 1 AS INT)
             AS n_tokens
    FROM t
    """,
)
def q_source_latex_text(spark: SparkSession, sf: str) -> DataFrame:
    # LaTeX → text (r9) — the arXiv leg of corpus extraction (the
    # named source in Pile/RedPajama-class mixes): the deterministic
    # rule subset production pipelines run, every rule live in the
    # fixture — preamble declarations dropped WITH their arguments
    # (incl. bracketed options), \\title/\\section unwrapped, a
    # trailing comment stripped, nested \\emph{\\textbf{}} unwrapped
    # inside-out, inline $math$ and \\[display\\] dropped, the
    # equation ENVIRONMENT dropped whole (its E=mc^2 body must not
    # leak) while itemize markers vanish keeping the items, \\\\ line
    # breaks, ~ ties, escaped \\% and \\& restored to literals, \\cite
    # dropped with its key, and a bare \\LaTeX command dropped. The
    # oracle is the closed-form expected text. One Arrow pass.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents")
    return D.latex_text(D.synth_latex(docs))


@query(
    "text_html_metadata",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('hmeta', 0)} AS b0, {_b('hmeta', 1)} AS b1,
             {_b('hmeta', 2)} AS b2, {_b('hmeta', 3)} AS b3,
             {_b('hmeta', 4)} AS b4, {_b('hmeta', 5)} AS b5
      FROM documents
    )
    SELECT doc_id,
           {_W}[b1 % 5 + 1] || ' page ' || CAST(doc_id AS VARCHAR)
             AS og_title,
           CASE WHEN b2 % 2 = 1
                THEN 'about ' || {_W}[(b2 + 1) % 5 + 1] END
             AS og_description,
           'https://img.ex.org/' || CAST(doc_id AS VARCHAR) || '?a=1&b=2'
             AS og_image,
           'https://ex.org/page/' || CAST(doc_id % 300 AS VARCHAR)
             AS canonical_href,
           CASE WHEN b3 % 3 <> 0 THEN 'Article' END AS jsonld_type,
           CASE WHEN b3 % 3 <> 0
                THEN {_W}[b1 % 5 + 1] || ' page ' || CAST(doc_id AS VARCHAR)
                END AS jsonld_name,
           CASE WHEN b3 % 3 <> 0
                THEN '20' || CAST(10 + b4 % 15 AS VARCHAR) || '-'
                  || lpad(CAST(1 + b5 % 12 AS VARCHAR), 2, '0') || '-01'
                END AS jsonld_date
    FROM p
    """,
)
def q_text_html_metadata(spark: SparkSession, sf: str) -> DataFrame:
    # HTML structured metadata (r9) — the schema.org / OpenGraph layer
    # a crawl pipeline extracts next to visible text (document titles,
    # publish dates, canonical identity for URL-level dedup): og:*
    # meta tags with ROTATING attribute order (content-first vs
    # property-first), og:description absent on half the pages (NULL
    # branch live), a charref inside og:image the parser must decode,
    # the canonical <link>, and the first VALID JSON-LD block — each
    # JSON-LD page leads with a malformed decoy block that must be
    # skipped, never fatal, and a third of pages carry no JSON-LD at
    # all. One Arrow pass, zero shuffle.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents")
    return D.html_metadata(D.synth_metadata_html(docs))


@query(
    "text_html_tables",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('htab', 0)} AS b0, {_b('htab', 1)} AS b1,
             {_b('htab', 2)} AS b2, {_b('htab', 3)} AS b3,
             {_b('htab', 4)} AS b4
      FROM documents
    ),
    tabled AS (SELECT * FROM p WHERE b3 % 7 <> 0),
    t AS (
      SELECT doc_id, unnest(generate_series(0, b0 % 2)) AS t,
             2 + b1 % 2 AS n_cols, b2, b4
      FROM tabled
    ),
    hdr AS (
      SELECT doc_id, t, 0 AS row_idx,
             unnest(generate_series(0, n_cols - 1)) AS c,
             TRUE AS is_header, b2, b4
      FROM t
    ),
    bodyr AS (
      SELECT doc_id, t, n_cols,
             unnest(generate_series(0, (b2 + t) % 3)) AS r, b4
      FROM t
    ),
    body AS (
      SELECT doc_id, t, r + 1 AS row_idx,
             unnest(generate_series(0, n_cols - 1)) AS c,
             FALSE AS is_header, r, b4
      FROM bodyr
    )
    SELECT doc_id, CAST(t AS INT) AS table_idx, CAST(row_idx AS INT)
             AS row_idx, CAST(c AS INT) AS col_idx, is_header,
           'col ' || CAST(c AS VARCHAR) AS text
    FROM hdr
    UNION ALL
    SELECT doc_id, CAST(t AS INT), CAST(row_idx AS INT), CAST(c AS INT),
           is_header,
           CASE WHEN c = 0
                THEN {_W}[(b4 + t + r) % 5 + 1] || ' & ' || CAST(r AS VARCHAR)
                ELSE {_W}[(b4 + t + r + c) % 5 + 1] || ' '
                  || CAST(t AS VARCHAR) || CAST(r AS VARCHAR)
                  || CAST(c AS VARCHAR) END
    FROM body
    UNION ALL
    SELECT doc_id, -1, NULL, NULL, FALSE, NULL
    FROM p WHERE b3 % 7 = 0
    """,
)
def q_text_html_tables(spark: SparkSession, sf: str) -> DataFrame:
    # Web-table extraction (r9) — the relational layer of crawled
    # pages a corpus pipeline mines for structured training data: one
    # row per cell with table/row/column coordinates and the th-vs-td
    # header flag; inline <b>/<span> markup transparent, &amp;
    # charrefs decoded, whitespace collapsed. Pages without tables
    # (b3%7==0) yield the table_idx -1 marker row so page accounting
    # stays total. One Arrow pass, zero shuffle.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents")
    return D.html_tables(D.synth_table_html(docs))


@query(
    "source_mbox_emails",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('mbox', 0)} AS b0, {_b('mbox', 1)} AS b1,
             {_b('mbox', 2)} AS b2, {_b('mbox', 3)} AS b3,
             {_b('mbox', 4)} AS b4, {_b('mbox', 5)} AS b5,
             {_b('mbox', 6)} AS b6
      FROM documents
    ),
    m AS (
      SELECT doc_id, unnest(generate_series(0, b0 % 3)) AS m,
             b1, b2, b3, b4, b5, b6
      FROM p
    )
    SELECT doc_id, CAST(m AS INT) AS msg_idx,
           'dev' || CAST(m AS VARCHAR) || '@lists.ex.org' AS from_addr,
           CASE WHEN (b5 + m) % 2 = 1
                THEN (['café update','naïve plan','plain note'])
                     [(b6 + m) % 3 + 1]
                ELSE 're: ' || {_W}[(b3 + m) % 5 + 1]
                  || ' thread ' || CAST(m AS VARCHAR) END AS subject,
           CAST((1690000000 + 86400 * b1 + 7200 * m + 13 * b2) * 1000
                AS BIGINT) AS date_ms,
           CASE WHEN (b4 + m) % 4 = 1 THEN 'café ' ELSE '' END
             || {_W}[(b3 + m) % 5 + 1] || ' body ' || CAST(m AS VARCHAR)
             || ' of doc ' || CAST(doc_id AS VARCHAR)
             || CASE WHEN (b4 + m) % 4 = 1 THEN ' endshere' ELSE '' END
             AS body
    FROM m
    """,
)
def q_source_mbox_emails(spark: SparkSession, sf: str) -> DataFrame:
    # mbox / RFC 5322 email parsing (r9) — the mailing-list corpus
    # source: envelope From_ splitting, header UNFOLDING (subjects
    # fold across a continuation line on half the messages), RFC 2047
    # Q-encoded subject words (non-ASCII phrases — the decode is
    # live), dates through the shared civil-date integer arithmetic,
    # and body transport rotating 7bit / quoted-printable (soft line
    # breaks + =C3=A9 escapes) / base64 / multipart-alternative where
    # the text/html DECOY part must never be chosen. One Arrow pass;
    # malformed payloads degrade to the msg_idx -1 marker.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents")
    return D.mbox_emails(D.synth_mbox(docs))


@query(
    "source_code_features",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('code', 0)} AS b0, {_b('code', 1)} AS b1,
             {_b('code', 2)} AS b2, {_b('code', 3)} AS b3,
             {_b('code', 4)} AS b4, {_b('code', 5)} AS b5
      FROM documents
    ),
    j AS (
      SELECT doc_id, unnest(generate_series(0, 2 + b1 % 5)) AS jj,
             b2
      FROM p
    ),
    cm AS (
      SELECT doc_id,
             SUM(CASE WHEN (b2 + jj) % 3 = 0 THEN 1 ELSE 0 END) AS n_cm
      FROM j GROUP BY doc_id
    )
    SELECT p.doc_id,
           CASE WHEN b5 % 4 = 0 THEN 'python'
                ELSE (['python','javascript','sql','shell','rust'])
                     [b0 % 5 + 1] END AS lang,
           CAST((CASE WHEN b5 % 4 = 0 THEN 1 ELSE 0 END)
                + (CASE WHEN b3 % 3 = 0 THEN 2 ELSE 0 END)
                + (3 + b1 % 5) + 1 AS INT) AS n_lines,
           CAST(cm.n_cm
                + (CASE WHEN b3 % 3 = 0 THEN 2 ELSE 0 END)
                + (CASE WHEN b5 % 4 = 0 THEN 1 ELSE 0 END) AS INT)
             AS n_comment_lines,
           CAST(56 + b4 % 40 AS INT) AS max_line_len,
           (b5 % 4 = 0) AS has_shebang,
           (b3 % 3 = 0) AS has_license
    FROM p JOIN cm ON p.doc_id = cm.doc_id
    """,
)
def q_source_code_features(spark: SparkSession, sf: str) -> DataFrame:
    # Source-code triage features (r9) — the code-corpus (The Stack
    # class) pre-filter columns: language from the extension map with
    # a SHEBANG fallback (b5%4==0 files are extensionless scripts —
    # the fallback branch is live, and the shebang line itself counts
    # as a '#' comment, pinned on both sides), per-language line-
    # comment counting ('#' vs '//' vs '--'), license-HEADER detection
    # scanned in the first 5 lines only, line counts, and the longest
    # line (one planted 56+b4%40-char string dominates by
    # construction). One Arrow pass, zero shuffle.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents")
    return D.code_features(D.synth_code_files(docs))


def _subtitle_shot_align_oracle() -> str:
    from hadoopxmlextractor_spark import oracles as O

    shots_sql = O.video_shots_oracle()
    asub = _MD5B.replace("doc_id", "c.media_id")
    b = lambda k: asub.format(salt="asub", pos=2 * k + 1)  # noqa: E731
    return f"""
    WITH sh AS ({shots_sql}),
    seg0 AS (
      SELECT media_id, frame_idx,
             SUM(CASE WHEN is_boundary THEN 1 ELSE 0 END)
               OVER (PARTITION BY media_id ORDER BY frame_idx) - 1
               AS shot_id
      FROM sh
    ),
    seg AS (
      SELECT media_id, shot_id,
             MIN(frame_idx) * 250 AS s_start,
             (MAX(frame_idx) + 1) * 250 - 1 AS s_end
      FROM seg0 GROUP BY media_id, shot_id
    ),
    c AS (SELECT doc_id AS media_id FROM documents),
    cp AS (
      SELECT media_id, {b(0)} AS b0, {b(1)} AS b1, {b(2)} AS b2,
             {b(3)} AS b3
      FROM c
    ),
    cues AS (
      SELECT media_id, unnest(generate_series(0, b0 % 4)) AS cue_idx,
             400 + 40 * (b1 % 10) AS gap, b2 % 200 AS off, b3
      FROM cp
    ),
    ci AS (
      SELECT media_id, cue_idx, gap * cue_idx + off AS cs,
             gap * cue_idx + off + 150 + 30 * ((b3 + cue_idx) % 12) AS ce
      FROM cues
    )
    SELECT ci.media_id, CAST(ci.cue_idx AS INT) AS cue_idx,
           CAST(seg.shot_id AS INT) AS shot_id,
           CAST(LEAST(ci.ce, seg.s_end) - GREATEST(ci.cs, seg.s_start) + 1
                AS BIGINT) AS overlap_ms
    FROM ci JOIN seg
      ON ci.media_id = seg.media_id
     AND ci.cs <= seg.s_end AND seg.s_start <= ci.ce
    """


@query("pipeline_subtitles_to_shots", _subtitle_shot_align_oracle())
def q_pipeline_subtitles_to_shots(spark: SparkSession, sf: str) -> DataFrame:
    # The MULTIMODAL alignment capstone (r9) — the table a video-text
    # training pipeline actually trains on: which transcript cue
    # overlaps which SHOT, with the overlap duration. Composes three
    # certified operators in one plan: video_shot_boundaries over the
    # real PPM frame stream (scene cuts at frames 0/3/6; shots =
    # running boundary count, segments on the 4 fps = 250 ms/frame
    # clock), subtitle_cues over real SRT/VTT payloads on the same
    # 2000 ms timeline, and temporal.interval_join — the BIN equi-join
    # form (1 s bins), never a per-media theta cross product. Cues
    # running past the video end stay unmatched (inner-join branch
    # live). The oracle replays the FULL pixel→aHash→boundary chain
    # (video_shots_oracle verbatim as a subquery) composed with the
    # cue grid and integer overlap arithmetic. Shuffles: the
    # media-keyed shot window + the (media, bin) join exchange.
    from pyspark.sql import Window

    from hadoopxmlextractor_spark.operators import documents as D
    from hadoopxmlextractor_spark.operators import multimodal as M
    from hadoopxmlextractor_spark.operators.temporal import interval_join

    docs = load(spark, sf, "documents")
    shots = M.video_shot_boundaries(M.synth_ppm_video(docs))
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    seg = (
        shots.withColumn(
            "shot_id",
            F.sum(F.col("is_boundary").cast("int")).over(w) - 1,
        )
        .groupBy("media_id", "shot_id")
        .agg(
            (F.min("frame_idx") * 250).alias("s_start"),
            ((F.max("frame_idx") + 1) * 250 - 1).alias("s_end"),
        )
    )
    cues = D.subtitle_cues(D.synth_aligned_subtitles(docs))
    left = cues.select(
        "media_id", "cue_idx",
        F.timestamp_millis(F.col("start_ms")).alias("start"),
        F.timestamp_millis(F.col("end_ms")).alias("end"),
    )
    right = seg.select(
        "media_id", "shot_id",
        F.timestamp_millis(F.col("s_start")).alias("start"),
        F.timestamp_millis(F.col("s_end")).alias("end"),
    )
    j = interval_join(left, right, "media_id", bin_seconds=1)
    ms = F.unix_millis
    return j.select(
        "media_id", F.col("cue_idx").cast("int").alias("cue_idx"),
        F.col("shot_id_r").cast("int").alias("shot_id"),
        (
            F.least(ms(F.col("end")), ms(F.col("end_r")))
            - F.greatest(ms(F.col("start")), ms(F.col("start_r")))
            + 1
        ).alias("overlap_ms"),
    )


@query(
    "source_mbox_threads",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('thr', 0)} AS b0, {_b('thr', 1)} AS b1
      FROM documents
    ),
    m AS (
      SELECT doc_id, unnest(generate_series(0, 1 + b0 % 4)) AS m, b1
      FROM p
    ),
    r AS (
      SELECT doc_id, m, (m = 0 OR (b1 + m) % 3 = 0) AS is_root FROM m
    ),
    t AS (
      SELECT doc_id, m,
             MAX(CASE WHEN is_root THEN m END)
               OVER (PARTITION BY doc_id ORDER BY m) AS root
      FROM r
    )
    SELECT doc_id, CAST(m AS INT) AS msg_idx,
           CAST(root AS INT) AS thread_root_idx,
           CAST(m - root AS INT) AS depth
    FROM t
    """,
)
def q_source_mbox_threads(spark: SparkSession, sf: str) -> DataFrame:
    # Mailing-list THREADING (r9) — reply-chain assembly, the step
    # between raw mbox and dialogue training data: In-Reply-To chains
    # followed back to their roots (odd replies carry the parent only
    # in a References list — the RFC 5322 fallback branch is live),
    # per-message depth, dangling/cyclic references stop gracefully.
    # Threads never span files, so resolution happens inside the Arrow
    # pass and the operator is zero-shuffle. The oracle derives roots
    # analytically (last root ≤ m via a running MAX window) — it never
    # follows the reply pointers, so a threading defect diverges.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents")
    return D.mbox_threads(D.synth_threaded_mbox(docs))


@query(
    "source_notebook_cells",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('nb', 0)} AS b0, {_b('nb', 1)} AS b1,
             {_b('nb', 2)} AS b2, {_b('nb', 3)} AS b3
      FROM documents
    ),
    c AS (
      SELECT doc_id, unnest(generate_series(0, b0 % 4)) AS k, b1, b2, b3
      FROM p
    )
    SELECT doc_id, CAST(k AS INT) AS cell_idx,
           CASE WHEN (b1 + k) % 2 = 0 THEN 'markdown' ELSE 'code' END
             AS cell_type,
           CASE WHEN (b1 + k) % 2 = 0
                THEN '# ' || {_W}[(b3 + k) % 5 + 1] || ' section '
                  || CAST(k AS VARCHAR) || chr(10) || 'notes '
                  || CAST(k AS VARCHAR)
                ELSE 'x_' || CAST(k AS VARCHAR) || ' = '''
                  || {_W}[(b3 + k) % 5 + 1] || '''' || chr(10)
                  || 'print(x_' || CAST(k AS VARCHAR) || ')' END AS source,
           CAST(CASE WHEN (b1 + k) % 2 = 0 THEN 0
                ELSE 1 + (b2 + k) % 3 END AS INT) AS n_outputs
    FROM c
    """,
)
def q_source_notebook_cells(spark: SparkSession, sf: str) -> DataFrame:
    # Jupyter notebooks (r9) — a named code-corpus source (The Stack
    # ships notebooks as first-class files): nbformat-4 JSON cells
    # with LIST-form multi-line source joined verbatim, markdown/code
    # types, and execution outputs COUNTED but never inlined (outputs
    # are execution artifacts, not authored text — the DECOY stream
    # text must never leak into `source`). One Arrow pass; malformed
    # notebooks degrade to the cell_idx -1 marker.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents")
    return D.notebook_cells(D.synth_ipynb(docs))


def _se_score_sql(a: str) -> str:
    return (
        f"CASE WHEN {a} = 1 AND b3 % 2 = 1 AND 1 + b0 % 3 > 1 "
        f"THEN b2 % 20 - 5 ELSE (b2 + {a}) % 20 - 5 END"
    )


@query(
    "source_stackexchange_posts",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('se', 0)} AS b0, {_b('se', 1)} AS b1,
             {_b('se', 2)} AS b2, {_b('se', 3)} AS b3,
             {_b('se', 4)} AS b4, {_b('se', 5)} AS b5
      FROM documents
    ),
    q AS (
      SELECT doc_id, 1 AS post_id, 1 AS post_type,
             CAST(NULL AS INT) AS parent_id,
             CAST(b5 % 50 AS INT) AS score,
             (1600000000 + 86400 * b1) * 1000 AS created_ms,
             '<p>how to ' || {_W}[b4 % 5 + 1] || ' &amp; why '
               || CAST(doc_id AS VARCHAR)
               || '?</p><pre>code block</pre>' AS body_html
      FROM p
    ),
    a AS (
      SELECT doc_id, unnest(generate_series(0, b0 % 3)) AS a,
             b0, b1, b2, b3, b4
      FROM p
    ),
    ans AS (
      SELECT doc_id, CAST(a + 2 AS INT) AS post_id, 2 AS post_type,
             CAST(1 AS INT) AS parent_id,
             CAST({_se_score_sql('a')} AS INT) AS score,
             (1600000000 + 86400 * b1 + 3600 * (a + 1)) * 1000
               AS created_ms,
             '<p>' || {_W}[(b4 + a + 1) % 5 + 1] || ' answer '
               || CAST(a AS VARCHAR) || ' &amp; done</p>' AS body_html
      FROM a
    )
    SELECT doc_id, CAST(post_id AS INT) AS post_id,
           CAST(post_type AS INT) AS post_type, parent_id, score,
           CAST(created_ms AS BIGINT) AS created_ms, body_html
    FROM (SELECT * FROM q UNION ALL SELECT * FROM ans)
    """,
)
def q_source_stackexchange_posts(spark: SparkSession, sf: str) -> DataFrame:
    # Stack Exchange Posts.xml (r9) — THE classic public XML corpus
    # dump, and the reference's XML-extraction heritage on a real
    # dataset shape: one <row> per post with the payload in
    # ATTRIBUTES. Body is entity-escaped HTML, so the XML attribute
    # decode must resolve the OUTER escaping layer exactly once
    # (&amp;amp; → &amp; — the HTML entity stays for the html_text
    # stage downstream); ISO CreationDates (no zone suffix, as real
    # dumps ship) normalize through the shared civil-date arithmetic;
    # question + answers with ParentId threading and a planted score
    # TIE for the Q&A stage. One Arrow pass, zero shuffle.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents")
    return D.stackexchange_posts(D.synth_stackexchange(docs))


@query(
    "pipeline_stackexchange_qa",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('se', 0)} AS b0, {_b('se', 2)} AS b2,
             {_b('se', 3)} AS b3, {_b('se', 4)} AS b4,
             {_b('se', 5)} AS b5
      FROM documents
    ),
    a AS (
      SELECT doc_id, unnest(generate_series(0, b0 % 3)) AS a,
             b0, b2, b3, b4
      FROM p
    ),
    scored AS (
      SELECT doc_id, a, CAST({_se_score_sql('a')} AS INT) AS score,
             {_W}[(b4 + a + 1) % 5 + 1] || ' answer '
               || CAST(a AS VARCHAR) || ' & done' AS answer_text
      FROM a
    ),
    best AS (
      SELECT doc_id, a, score, answer_text,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, a) AS rn,
             COUNT(*) OVER (PARTITION BY doc_id) AS n_answers
      FROM scored
    )
    SELECT p.doc_id, CAST(1 AS INT) AS question_id,
           'how to ' || {_W}[b4 % 5 + 1] || ' & why '
             || CAST(p.doc_id AS VARCHAR) || '? code block'
             AS question_text,
           b.answer_text AS best_answer_text,
           b.score AS best_score,
           CAST(b.n_answers AS INT) AS n_answers
    FROM p JOIN best b ON p.doc_id = b.doc_id AND b.rn = 1
    """,
)
def q_pipeline_stackexchange_qa(spark: SparkSession, sf: str) -> DataFrame:
    # The SFT-assembly capstone (r9): Stack Exchange posts → question/
    # best-answer PAIRS, the instruction-tuning data shape. Composes
    # the posts parse with html_text (entity-decoded bodies stripped
    # of markup — <pre> content kept, it's authored text) and a
    # deterministic best-answer selection: max score with the planted
    # TIE broken by min post id (engine-arbitrary max_by is never
    # trusted — the tiebreak is folded into the ranking). Scale shape:
    # parse + html_text are map-side; the only shuffle is the
    # question-keyed (doc, parent) window/aggregate.
    from pyspark.sql import Window

    from hadoopxmlextractor_spark.operators import documents as D
    from hadoopxmlextractor_spark.operators import text as T

    docs = load(spark, sf, "documents")
    # r14-opt (guide §5): posts feeds the question AND answer branches
    # — unpersisted, the synth→parse→html_text Python chain ran twice.
    # Text-cardinality cache; eager count per the AQE race rule.
    posts = D.stackexchange_posts(D.synth_stackexchange(docs)).withColumn(
        "text", T.html_text(F.col("body_html"))
    ).persist()
    posts.count()
    questions = posts.filter(F.col("post_type") == 1).select(
        "doc_id", F.col("post_id").alias("question_id"),
        F.col("text").alias("question_text"),
    )
    answers = posts.filter(F.col("post_type") == 2)
    w = Window.partitionBy("doc_id", "parent_id").orderBy(
        F.col("score").desc(), F.col("post_id")
    )
    wn = Window.partitionBy("doc_id", "parent_id")
    best = (
        answers.withColumn("rn", F.row_number().over(w))
        .withColumn("n_answers", F.count(F.lit(1)).over(wn))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id", F.col("parent_id").alias("question_id"),
            F.col("text").alias("best_answer_text"),
            F.col("score").alias("best_score"),
            F.col("n_answers").cast("int").alias("n_answers"),
        )
    )
    return questions.join(best, ["doc_id", "question_id"]).select(
        "doc_id", "question_id", "question_text", "best_answer_text",
        "best_score", "n_answers",
    )


@query(
    "source_wikipedia_pages",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('wiki', 0)} AS b0, {_b('wiki', 1)} AS b1,
             {_b('wiki', 2)} AS b2, {_b('wiki', 3)} AS b3,
             {_b('wiki', 4)} AS b4
      FROM documents
    ),
    art AS (
      SELECT doc_id,
             CAST(10 + doc_id % 1000 AS INT) AS page_id,
             'Article ' || CAST(doc_id AS VARCHAR) AS title,
             CAST(CASE WHEN b1 % 2 = 0 THEN 0 ELSE 4 END AS INT) AS ns,
             CAST(NULL AS VARCHAR) AS redirect_to,
             {_W}[b0 % 5 + 1] || ' history The ' || {_W}[(b1 + 1) % 5 + 1]
               || ' is really a ' || {_W}[(b2 + 2) % 5 + 1]
               || ' idea and a plain ' || {_W}[(b3 + 3) % 5 + 1]
               || '. See the ' || {_W}[(b4 + 4) % 5 + 1]
               || ' site for more.' AS text_clean
      FROM p
    ),
    red AS (
      SELECT doc_id,
             CAST(5000 + doc_id % 1000 AS INT) AS page_id,
             'Alias ' || CAST(doc_id AS VARCHAR) AS title,
             CAST(0 AS INT) AS ns,
             'Article ' || CAST(doc_id AS VARCHAR) AS redirect_to,
             '#REDIRECT Article ' || CAST(doc_id AS VARCHAR) AS text_clean
      FROM p WHERE b0 % 3 = 0
    ),
    u AS (SELECT * FROM art UNION ALL SELECT * FROM red)
    SELECT doc_id, page_id, title, ns, redirect_to, text_clean,
           CAST(LENGTH(text_clean)
                - LENGTH(replace(text_clean, ' ', '')) + 1 AS INT)
             AS n_tokens
    FROM u
    """,
)
def q_source_wikipedia_pages(spark: SparkSession, sf: str) -> DataFrame:
    # Wikipedia pages-articles dumps (r9) — THE canonical XML corpus
    # and the reference's XML-extraction heritage on its most famous
    # real-world shape: <page> walk under the MediaWiki namespace
    # (localname-tolerant), first <id> is the page id (revision ids
    # must not shadow it), <redirect title=.../> read from the
    # ATTRIBUTE, and the revision wikitext CLEANED through the full
    # rule subset — every rule live in the fixture: a NESTED
    # {{template}}, piped [[a|b]] and bare [[a]] wikilinks, a dropped
    # [[File:]] link with caption, a <ref> footnote, an HTML comment,
    # bold/italic quote markers, a == heading ==, and an external
    # [url label] link. The oracle is the closed-form cleaned text.
    # One Arrow pass, zero shuffle.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents")
    return D.wikipedia_pages(D.synth_wikipedia(docs))


@query(
    "source_pdf_metadata",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('pdfi', 0)} AS b0, {_b('pdfi', 1)} AS b1,
             {_b('pdfi', 2)} AS b2, {_b('pdfi', 3)} AS b3,
             {_b('pdfi', 4)} AS b4, {_b('pdfi', 5)} AS b5
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN b3 % 5 <> 0
                THEN (['café report','naïve survey','plain notes'])
                     [b0 % 3 + 1] END AS title,
           CASE WHEN b3 % 5 <> 0
                THEN 'dev (' || CAST(b5 % 9 AS VARCHAR) || ')' END
             AS author,
           CASE WHEN b3 % 5 <> 0 THEN 'synth' END AS producer,
           CASE WHEN b3 % 5 <> 0
                THEN CAST((1500000000 + 86400 * b2 + 60 * b4) * 1000
                          AS BIGINT) END AS created_ms,
           (b3 % 5 <> 0) AS has_info
    FROM p
    """,
)
def q_source_pdf_metadata(spark: SparkSession, sf: str) -> DataFrame:
    # PDF document metadata (r9) — the /Info dictionary every corpus
    # pipeline extracts next to the text (dates for freshness, titles
    # for dedup keys): Title rotates a LITERAL string with octal
    # escapes vs a UTF-16BE HEX string with the FEFF BOM (ISO 32000
    # §7.9.2.2 — how real producers write non-ASCII titles; both
    # decode branches carry the same non-ASCII plants), Author a
    # literal with escaped parens, CreationDate's D:YYYYMMDDHHmmSS
    # form through the shared civil-date arithmetic, and a fifth of
    # files carrying NO /Info — the valid all-NULL state, has_info
    # FALSE (never a NULL boolean). One Arrow pass, zero shuffle.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents")
    return D.pdf_metadata(D.synth_pdf_with_info(docs))


@query(
    "source_epub_metadata",
    f"""
    WITH p AS (
      SELECT doc_id, {_b('epubm', 1)} AS b1, {_b('epubm', 2)} AS b2,
             {_b('epubm', 3)} AS b3, {_b('epubm', 4)} AS b4,
             {_b('epubm', 5)} AS b5, {_b('epubm', 6)} AS b6,
             {_b('epubm', 7)} AS b7
      FROM documents
    )
    SELECT doc_id,
           (CASE WHEN b1 % 2 = 1 THEN 'café' ELSE 'plain' END)
             || ' book ' || CAST(doc_id AS VARCHAR) AS title,
           CASE WHEN b5 % 4 <> 0
                THEN 'Author ' || CAST(b7 % 10 AS VARCHAR) END AS creator,
           (['en','fr','de','ja'])[b6 % 4 + 1] AS language,
           'urn:synth:' || CAST(doc_id AS VARCHAR) AS identifier,
           CASE WHEN b5 % 4 <> 0
                THEN CAST((make_date(CAST(2000 + b2 % 24 AS INT),
                                     CAST(1 + b3 % 12 AS INT),
                                     CAST(1 + b4 % 28 AS INT))
                           - DATE '1970-01-01') AS BIGINT) * 86400000
                END AS published_ms
    FROM p
    """,
)
def q_source_epub_metadata(spark: SparkSession, sf: str) -> DataFrame:
    # EPUB Dublin Core metadata (r9) — completes the document-metadata
    # trio (html_metadata / pdf_metadata / epub_metadata): dc:title
    # (non-ASCII plants on half the books), dc:creator, dc:language,
    # dc:identifier, and dc:date (ISO civil date → epoch ms through
    # the SAME integer arithmetic the feed/mbox/PDF legs use — the
    # oracle replays it via DuckDB's proleptic-Gregorian make_date,
    # an INDEPENDENT derivation of the same function). The dc prefix
    # itself ROTATES (dc: vs dcx:) so localname matching is live, and
    # a quarter of books omit creator+date (the NULL branch). One
    # Arrow pass, zero shuffle.
    from hadoopxmlextractor_spark.operators import documents as D

    docs = load(spark, sf, "documents")
    return D.epub_metadata(D.synth_epub_with_meta(docs))
