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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


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

    def writer(self, schema, overwrite: bool) -> "XmlDocsWriter":
        return XmlDocsWriter(self.options, overwrite)


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


class _WroteFiles(WriterCommitMessage):
    def __init__(self, files):
        self.files = files  # [(tmp_path, final_path)]


class XmlDocsWriter(DataSourceWriter):
    """Batch write half of the connector: each task lands its rows as
    hidden ``._tmp-*`` files and returns their (tmp, final) names in
    the commit message; the DRIVER's commit renames everything into
    place (and under overwrite first clears previous documents) while
    abort deletes the temporaries — the standard two-phase output
    commit, so a failed job never leaves half a corpus visible.

    Expects (doc_id, content) rows; the file name is the sanitized
    basename of doc_id (the reader emits full paths, so read→write
    round-trips keep names)."""

    def __init__(self, options, overwrite: bool):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("xmldocs sink requires a 'path' option")
        self._suffix = options.get("suffix", ".xml")
        self._overwrite = overwrite

    def write(self, iterator) -> _WroteFiles:
        import re
        import uuid

        os.makedirs(self._dir, exist_ok=True)
        files = []
        for row in iterator:
            base = re.sub(
                r"[^A-Za-z0-9_.-]", "_", os.path.basename(str(row.doc_id))
            ) or "doc"
            if not base.endswith(self._suffix):
                base += self._suffix
            final = os.path.join(self._dir, base)
            tmp = os.path.join(self._dir, f"._tmp-{uuid.uuid4().hex}-{base}")
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(row.content)
            files.append((tmp, final))
        return _WroteFiles(files)

    def commit(self, messages) -> None:
        if self._overwrite:
            incoming = {
                os.path.basename(final)
                for m in messages
                for _, final in m.files
            }
            for n in os.listdir(self._dir):
                if (
                    n.endswith(self._suffix)
                    and n not in incoming
                    and not n.startswith("._tmp")
                ):
                    os.remove(os.path.join(self._dir, n))
        for m in messages:
            for tmp, final in m.files:
                os.replace(tmp, final)

    def abort(self, messages) -> None:
        for m in messages:
            for tmp, _ in m.files:
                try:
                    os.remove(tmp)
                except FileNotFoundError:
                    pass
