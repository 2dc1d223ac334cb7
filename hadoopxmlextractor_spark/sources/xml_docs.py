"""Document-collection sources → DataFrame[doc_id: string, content: string].

The reference packs a directory of XML files into one SequenceFile with
UUID keys (``CreateSequenceFile.java:37-51``) purely as a small-files
mitigation, then reads it with a non-splittable input format
(``XmlExtractor.java:57-68``). Spark's file sources batch small files per
task natively (``spark.sql.files.maxPartitionBytes`` /
``openCostInBytes``), so no packing step exists here — but existing
SequenceFiles remain readable for drop-in parity.

Whole-file reads are inherently non-splittable, which preserves the
intra-document order the scanner's ``seq`` offsets rely on; skew from one
giant document is mitigated downstream by exploding fragments before the
expensive projection (see ``extract.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_xml_documents(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory (or glob) of XML files, one row per document.

    Uses the ``text`` source in wholetext mode: distributed, whole-file
    (non-splittable like the reference's input format,
    ``XmlExtractor.java:64-67``), and schema-stable. ``doc_id`` is the
    file path — unique per document, like the reference's per-record UUID
    (``SeqXmlRecordReader.java:171``) but reproducible.
    """
    return (
        # NB: wholetext must be the .text() kwarg — a reader-level
        # .option("wholetext", ...) is overridden by the .text() default.
        spark.read.text(path, wholetext=True)
        .select(
            F.input_file_name().alias("doc_id"),
            F.col("value").alias("content"),
        )
    )


def read_sequence_file(spark: SparkSession, path: str) -> DataFrame:
    """Read a reference-produced SequenceFile of (Text uuid, Text xml doc)
    (``CreateSequenceFile.java:39-51``) for drop-in parity."""
    rdd = spark.sparkContext.sequenceFile(
        path,
        "org.apache.hadoop.io.Text",
        "org.apache.hadoop.io.Text",
    )
    return spark.createDataFrame(rdd, schema="doc_id string, content string")


def pack(spark: SparkSession, in_dir: str, out_path: str) -> None:
    """Directory of XML files → one SequenceFile of (uuid, document),
    mirroring the reference ingest utility (``CreateSequenceFile.main``,
    ``CreateSequenceFile.java:37-51``). Unnecessary for this engine
    (file sources batch small files natively) — provided so existing
    reference pipelines keep working end-to-end."""
    docs = read_xml_documents(spark, in_dir).select(
        F.expr("uuid()").alias("doc_id"), "content"
    )
    docs.rdd.map(tuple).saveAsSequenceFile(out_path)


def docs_from_strings(spark: SparkSession, docs: dict[str, str]) -> DataFrame:
    """Build a document DataFrame from in-memory strings (tests/demos)."""
    return spark.createDataFrame(
        list(docs.items()), schema="doc_id string, content string"
    )


def read_binary_documents(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of XML files via the ``binaryFile`` source —
    the other small-files-native alternative to the reference's
    SequenceFile packing (``CreateSequenceFile.java:19-57``): content
    arrives as raw bytes plus (path, modificationTime, length)
    metadata, which is the right source when documents may not be
    valid UTF-8 or when byte-exact scanning matters. Decodes to the
    same (doc_id, content) contract as :func:`read_xml_documents`."""
    return (
        spark.read.format("binaryFile")
        .load(path)
        .select(
            F.col("path").alias("doc_id"),
            F.decode(F.col("content"), "UTF-8").alias("content"),
        )
    )
