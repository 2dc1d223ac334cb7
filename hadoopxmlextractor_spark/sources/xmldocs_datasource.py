"""Spark 4 Python DataSource for XML document collections:
``spark.read.format("xmldocs").load(dir)`` → (doc_id, content).

The modern custom-connector surface for the same whole-file semantics
as :func:`~hadoopxmlextractor_spark.sources.xml_docs.read_xml_documents`
— one InputPartition PER FILE, so (a) documents are never split
(the reference's non-splittable input format contract,
``XmlExtractor.java:64-67``) and (b) Spark schedules files across
executors independently, the natural parallel grain for a corpus of
many documents. Options: ``path`` (directory), ``suffix`` (filter,
default ``.xml``).

Why a Python DataSource and not just ``spark.read.text(wholetext)``:
the built-in route couples "one row per file" to the text source's
partitioning knobs; a DataSource owns its partition grain explicitly,
carries its own schema, and is the template for connectors Spark has
no reader for at all (the real use of this API). The driver lists the
directory once (names only — cheap at any corpus size); workers open
only their own partition's file.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class XmlDocsDataSource(DataSource):
    """``format("xmldocs")``: whole-file XML document reader."""

    @classmethod
    def name(cls) -> str:
        return "xmldocs"

    def schema(self) -> str:
        return "doc_id string, content string"

    def reader(self, schema) -> "XmlDocsReader":
        return XmlDocsReader(self.options)

    def simpleStreamReader(self, schema) -> "XmlDocsStreamReader":
        return XmlDocsStreamReader(self.options)


class XmlDocsReader(DataSourceReader):
    def __init__(self, options):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("xmldocs source requires a 'path' option")
        self._suffix = options.get("suffix", ".xml")

    def partitions(self):
        names = sorted(
            n
            for n in os.listdir(self._dir)
            if n.endswith(self._suffix)
            and os.path.isfile(os.path.join(self._dir, n))
        )
        # one partition per document: whole-file, never split
        return [_FilePartition(os.path.join(self._dir, n)) for n in names]

    def read(self, partition: _FilePartition):
        with open(partition.path, encoding="utf-8") as f:
            yield (partition.path, f.read())


def register(spark) -> None:
    """Register the source on a session: ``spark.read.format("xmldocs")``."""
    spark.dataSource.register(XmlDocsDataSource)


class XmlDocsStreamReader:
    """Incremental landing-dir reader (SimpleDataSourceStreamReader):
    the offset is the lexicographic high-watermark of consumed file
    names, so producers must land files with sortable names (the usual
    landing-zone convention — timestamped or sequence-numbered). Each
    micro-batch reads every file strictly above the watermark; replay
    of a batch from its start offset is deterministic because files
    are immutable once landed."""

    def __init__(self, options):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("xmldocs source requires a 'path' option")
        self._suffix = options.get("suffix", ".xml")

    def _names(self):
        return sorted(
            n
            for n in os.listdir(self._dir)
            if n.endswith(self._suffix)
            and os.path.isfile(os.path.join(self._dir, n))
        )

    def initialOffset(self):
        return {"watermark": ""}

    def read(self, start):
        mark = start["watermark"]
        fresh = [n for n in self._names() if n > mark]
        rows = []
        for n in fresh:
            p = os.path.join(self._dir, n)
            with open(p, encoding="utf-8") as f:
                rows.append((p, f.read()))
        end = {"watermark": fresh[-1] if fresh else mark}
        return iter(rows), end

    def readBetweenOffsets(self, start, end):
        lo, hi = start["watermark"], end["watermark"]
        for n in self._names():
            if lo < n <= hi:
                p = os.path.join(self._dir, n)
                with open(p, encoding="utf-8") as f:
                    yield (p, f.read())

    def commit(self, end):
        pass  # watermark lives in the checkpoint; nothing to clean up
