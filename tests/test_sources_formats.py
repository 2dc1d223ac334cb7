"""Source/sink format coverage (SURVEY §2.3 scans/sources + sinks rows):
csv, json, parquet round-trips; binaryFile documents source; and the
Spark-native `from_xml` structured alternative to the scanner path."""

import pyspark.sql.functions as F

from hadoopxmlextractor_spark.sources.xml_docs import (
    read_binary_documents,
    read_xml_documents,
)


def test_csv_json_parquet_roundtrip(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("s"),
    )
    for fmt in ("csv", "json", "parquet"):
        out = str(tmp_path / fmt)
        writer = df.write.mode("overwrite")
        if fmt == "csv":
            writer = writer.option("header", True)
        getattr(writer, fmt)(out)
        reader = spark.read
        if fmt == "csv":
            reader = reader.option("header", True).schema("id long, k long, s string")
        elif fmt == "json":
            reader = reader.schema("id long, k long, s string")
        back = getattr(reader, fmt)(out)
        assert back.count() == 100
        # nullability flips on read-back (file sources are nullable);
        # names and types must survive exactly
        assert [(f.name, f.dataType) for f in back.schema.fields] == [
            (f.name, f.dataType) for f in df.schema.fields
        ]
        assert back.agg(F.sum("id")).first()[0] == 4950


def test_binary_file_source_matches_wholetext(spark, tmp_path):
    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "a.xml").write_text("<r><x>1</x></r>")
    (docs / "b.xml").write_text("<r><x>2</x></r>")
    wt = {r.doc_id.split("/")[-1]: r.content for r in read_xml_documents(spark, str(docs)).collect()}
    bf = {r.doc_id.split("/")[-1]: r.content for r in read_binary_documents(spark, str(docs)).collect()}
    assert wt == bf == {"a.xml": "<r><x>1</x></r>", "b.xml": "<r><x>2</x></r>"}


def test_events_loader_ts_contract(spark):
    # Loader invariant (round-2 regression): events.parquet stores ts as
    # TIMESTAMP(NANOS). Spark <4 surfaces it as bigint nanos (with
    # nanosAsLong), Spark 4.x as timestamp_ntz natively — load() must
    # normalize BOTH to a plain microsecond `timestamp` column so every
    # downstream `ts` expression resolves in any Spark version.
    from hadoopxmlextractor_spark.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # session tz must be UTC in the NTZ-cast path so NTZ→LTZ is identity
    raw = dict(spark.read.parquet("/root/testdata/sf0.001/events.parquet").dtypes)["ts"]
    if raw != "bigint":
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    # microsecond values must agree with DuckDB's TIMESTAMP_NS→TIMESTAMP
    # truncation: spot-check min/max epoch micros against duckdb
    import duckdb

    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    dlo, dhi = duckdb.sql(
        "SELECT epoch_us(CAST(MIN(ts) AS TIMESTAMP)), epoch_us(CAST(MAX(ts) AS TIMESTAMP)) "
        "FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchone()
    assert (lo, hi) == (dlo, dhi)


def test_from_xml_structured_alternative(spark):
    # The Spark-4-native structured path: from_xml with an explicit
    # schema replaces scanner+xpath when documents are well-formed and
    # the shape is known ahead of time (SURVEY §2.1 O4 note). The
    # scanner path remains the byte-compat route for reference parity.
    df = spark.createDataFrame(
        [(1, '<book id="bk101"><price>44.95</price></book>')],
        "doc_id long, xml string",
    )
    parsed = df.select(
        "doc_id",
        F.from_xml(
            "xml", "struct<_id:string, price:double>"
        ).alias("b"),
    ).select("doc_id", F.col("b._id").alias("book_id"), F.col("b.price").alias("price"))
    row = parsed.first()
    assert row.book_id == "bk101" and row.price == 44.95


def test_training_shards_sink_deterministic(spark, tmp_path):
    # shard membership must be a property of the id (stable md5 bucket),
    # line order a property of the sort — two writes, identical bytes
    from hadoopxmlextractor_spark.operators.corpus import stable_bucket
    from hadoopxmlextractor_spark.sinks import write_training_shards

    docs = spark.createDataFrame(
        [(i, f"w{i} " * (i % 7 + 1)) for i in range(100)],
        "doc_id long, text string",
    )
    outs = []
    for run in ("a", "b"):
        out = str(tmp_path / run)
        manifest = {
            (r["shard"], r["n_docs"], r["n_tokens"])
            for r in write_training_shards(docs, out, n_shards=4).collect()
        }
        back = spark.read.json(f"{out}/shard=*")
        assert back.count() == 100
        rows = sorted(
            (r["doc_id"], r["text"]) for r in back.collect()
        )
        outs.append((manifest, rows))
    assert outs[0] == outs[1]
    # membership matches stable_bucket exactly
    expected = {
        r["doc_id"]: r["b"]
        for r in docs.select("doc_id", stable_bucket("doc_id", 4).alias("b")).collect()
    }
    back = spark.read.json(str(tmp_path / "a"))  # partition col recovered
    got = {r["doc_id"]: r["shard"] for r in back.collect()}
    assert got == expected
    # manifest totals cover the corpus
    assert sum(n for _, n, _ in outs[0][0]) == 100


def test_sorted_parquet_files_have_disjoint_ranges(spark, tmp_path):
    """write_sorted_parquet must produce files whose sort-key min/max
    ranges do not overlap (beyond shared boundary values) — the footer
    statistics property min/max data skipping relies on."""
    import glob

    import pyarrow.parquet as pq

    from hadoopxmlextractor_spark.sinks import write_sorted_parquet

    df = spark.range(0, 10_000).select(
        (F.col("id") * 7919 % 10_000).alias("k"), F.col("id").alias("v")
    )
    out = str(tmp_path / "sorted")
    write_sorted_parquet(df, out, "k", n_files=8)

    ranges = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(0).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) == 8
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # contiguous, non-overlapping key ranges
    # whole domain covered
    assert ranges[0][0] == 0 and ranges[-1][1] == 9999


def test_zorder_parquet_files_cover_small_rectangles(spark, tmp_path):
    """write_zorder_parquet must tighten footer min/max ranges on BOTH
    cluster keys: every file covers a fraction of each column's domain,
    where a single-column sort leaves the second column's per-file
    range at ~100% of the domain (no skipping possible)."""
    import glob

    import pyarrow.parquet as pq

    from hadoopxmlextractor_spark.sinks import write_sorted_parquet, write_zorder_parquet

    # Two independent uniform keys over [0, 4096).
    df = spark.range(0, 20_000).select(
        (F.col("id") * 7919 % 4096).alias("a"),
        (F.col("id") * 104729 % 4096).alias("b"),
    )

    def coverage(out: str, col_idx: int) -> float:
        spans = []
        for f in glob.glob(f"{out}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            spans.append((max(maxs) - min(mins) + 1) / 4096)
        assert len(spans) == 16
        return sum(spans) / len(spans)

    zout = str(tmp_path / "zorder")
    write_zorder_parquet(df, zout, "a", "b", bits=8, n_files=16)
    sout = str(tmp_path / "plain")
    write_sorted_parquet(df.select("a", "b"), sout, "a", n_files=16)

    # Single-column sort: column b's per-file range is the whole domain.
    assert coverage(sout, 1) > 0.9
    # Z-order: BOTH columns' per-file ranges are small rectangles. With
    # 16 files over a 256x256 bucket grid the ideal is 1/4 of the
    # domain per side; allow slack for range-boundary sampling.
    assert coverage(zout, 0) < 0.55
    assert coverage(zout, 1) < 0.55


def test_snapshot_time_travel_upsert_and_rollback(spark, tmp_path):
    from hadoopxmlextractor_spark.snapshots import (
        commit_upsert,
        latest_version,
        read_snapshot,
        rollback,
        write_snapshot,
    )

    table = str(tmp_path / "corpus_table")
    v0 = write_snapshot(
        spark.createDataFrame(
            [(1, "one"), (2, "two"), (3, "three")], "doc_id: long, text: string"
        ),
        table,
    )
    assert v0 == 0 and latest_version(table) == 0

    batch = spark.createDataFrame(
        [(2, "TWO", False), (3, "x", True), (9, "nine", False)],
        "doc_id: long, text: string, is_delete: boolean",
    )
    v1 = commit_upsert(spark, table, batch, "doc_id", delete_col="is_delete")
    assert v1 == 1 and latest_version(table) == 1

    now = {r.doc_id: r.text for r in read_snapshot(spark, table).collect()}
    assert now == {1: "one", 2: "TWO", 9: "nine"}
    # time travel: version 0 still intact
    then = {r.doc_id: r.text for r in read_snapshot(spark, table, version=0).collect()}
    assert then == {1: "one", 2: "two", 3: "three"}

    rollback(table, 0)
    assert latest_version(table) == 0
    back = {r.doc_id: r.text for r in read_snapshot(spark, table).collect()}
    assert back == then
    # rolling back to a missing version must refuse
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        rollback(table, 7)


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC is the second columnar format Spark ships natively; the
    engine's scan contract (predicate pushdown reaching the reader)
    must hold there like it does for parquet."""
    from hadoopxmlextractor_spark.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "docs_orc")
    docs.write.orc(path)
    back = spark.read.orc(path).filter(F.col("n_chars") > 500).select("doc_id", "n_chars")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,500)]" in plan
    expect = docs.filter(F.col("n_chars") > 500).count()
    assert back.count() == expect and expect > 0


def test_python_datasource_xmldocs_matches_wholetext(spark, tmp_path):
    """The Spark 4 Python DataSource route must agree document-for-
    document with the wholetext reader AND drive the full extraction
    pipeline to the same rows."""
    from hadoopxmlextractor_spark.config import ExtractionConfig
    from hadoopxmlextractor_spark.extract import extract
    from hadoopxmlextractor_spark.sources.xml_docs import read_xml_documents
    from hadoopxmlextractor_spark.sources.xmldocs_datasource import register
    from tests.fixtures import BANKS, INVENTORY_CONFIG_XML, SOHO

    indir = tmp_path / "docs"
    indir.mkdir()
    from tests.fixtures import make_store_xml

    stores = [SOHO, BANKS]
    for i, store in enumerate(stores):
        (indir / f"store{i}.xml").write_text(make_store_xml(store))
    (indir / "notes.txt").write_text("not xml")  # suffix-filtered out

    register(spark)
    via_ds = (
        spark.read.format("xmldocs").load(str(indir)).orderBy("doc_id").collect()
    )
    via_text = (
        read_xml_documents(spark, str(indir / "*.xml"))
        .orderBy("doc_id")
        .collect()
    )
    assert [r.content for r in via_ds] == [r.content for r in via_text]
    assert len(via_ds) == len(stores)

    config = ExtractionConfig.from_hadoop_xml(INVENTORY_CONFIG_XML, is_text=True)
    rows_ds = sorted(
        tuple(r) for r in extract(
            spark.read.format("xmldocs").load(str(indir)), config
        ).drop("doc_id").collect()
    )
    rows_text = sorted(
        tuple(r) for r in extract(
            read_xml_documents(spark, str(indir / "*.xml")), config
        ).drop("doc_id").collect()
    )
    assert rows_ds == rows_text and len(rows_ds) == 30


def test_snapshot_vacuum_keeps_recent_and_pinned(spark, tmp_path):
    from hadoopxmlextractor_spark.snapshots import (
        read_snapshot,
        rollback,
        vacuum,
        write_snapshot,
    )

    table = str(tmp_path / "t")
    for n in range(4):  # versions 0..3
        write_snapshot(
            spark.createDataFrame([(n, f"v{n}")], "doc_id: long, text: string"),
            table,
        )
    # keep last 2 (v2, v3); v0, v1 removed
    assert vacuum(table, keep_last=2) == [0, 1]
    assert {r.text for r in read_snapshot(spark, table).collect()} == {"v3"}
    assert {r.text for r in read_snapshot(spark, table, version=2).collect()} == {"v2"}

    # a rolled-back pointer pins its old target through vacuum
    write_snapshot(
        spark.createDataFrame([(9, "v4")], "doc_id: long, text: string"), table
    )
    rollback(table, 2)
    removed = vacuum(table, keep_last=1)
    assert 2 not in removed  # pinned by the pointer
    assert {r.text for r in read_snapshot(spark, table).collect()} == {"v2"}


def test_dynamic_partition_overwrite_replaces_only_touched_partitions(spark, tmp_path):
    """Re-landing one source's data must not clobber the other
    partitions — the daily-reingestion write mode a partitioned corpus
    depends on (static overwrite would truncate the whole table)."""
    out = str(tmp_path / "part")
    spark.createDataFrame(
        [(1, "web"), (2, "web"), (3, "books")], "doc_id: long, source: string"
    ).write.partitionBy("source").parquet(out)
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        spark.createDataFrame(
            [(9, "web")], "doc_id: long, source: string"
        ).write.mode("overwrite").partitionBy("source").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    got = {
        (r.doc_id, r.source) for r in spark.read.parquet(out).collect()
    }
    assert got == {(9, "web"), (3, "books")}  # books partition untouched


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A corpus written over months gains columns; mergeSchema reads
    old and new files as one table with NULLs where the column didn't
    exist yet."""
    out = tmp_path / "evolving"
    spark.createDataFrame([(1, "a")], "doc_id: long, text: string").write.parquet(
        str(out / "m1")
    )
    spark.createDataFrame(
        [(2, "b", "en")], "doc_id: long, text: string, lang: string"
    ).write.parquet(str(out / "m2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        str(out / "m1"), str(out / "m2")
    )
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    rows = {r.doc_id: r.lang for r in merged.collect()}
    assert rows == {1: None, 2: "en"}


def test_compact_parquet_rewrites_small_files(spark, tmp_path):
    from pyspark.sql import functions as F

    from hadoopxmlextractor_spark.sinks import compact_parquet

    path = str(tmp_path / "tbl")
    # land 40 tiny files (the streaming-ingest accretion shape)
    spark.range(0, 4000).withColumn("v", F.col("id") * 2).repartition(
        40
    ).write.parquet(path)
    import os

    n_before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_before >= 40

    before = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    fb, fa = compact_parquet(
        spark, path, target_file_bytes=10**9, sort_col="id"
    )
    assert (fb, fa) == (n_before, 1)
    n_after = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_after == 1
    # data identical, no temp/old dirs left behind
    assert {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()} == before
    assert not [d for d in os.listdir(tmp_path) if "_compact" in d]


def test_malformed_json_csv_permissive_and_dropmalformed(spark, tmp_path):
    """Robust ingestion contract for messy sources: PERMISSIVE mode
    quarantines bad rows into _corrupt_record (audit stream — the
    relational twin of extract.malformed_fragments), DROPMALFORMED
    silently sheds them, and a bad row NEVER kills the job (the ANSI
    try_-function analogue at the source layer)."""
    jpath = tmp_path / "in.json"
    jpath.write_text(
        '{"id": 1, "v": "ok"}\n'
        "{broken json line\n"
        '{"id": 3, "v": "fine"}\n'
    )
    schema = "id long, v string, _corrupt_record string"
    perm = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(jpath))
    )
    rows = perm.collect()
    good = {(r["id"], r["v"]) for r in rows if r["_corrupt_record"] is None}
    bad = [r["_corrupt_record"] for r in rows if r["_corrupt_record"] is not None]
    assert good == {(1, "ok"), (3, "fine")}
    assert bad == ["{broken json line"]

    dropped = (
        spark.read.schema("id long, v string")
        .option("mode", "DROPMALFORMED")
        .json(str(jpath))
    )
    assert {(r["id"], r["v"]) for r in dropped.collect()} == {(1, "ok"), (3, "fine")}

    cpath = tmp_path / "in.csv"
    cpath.write_text("id,v\n1,ok\nnot_a_long,broken\n3,fine\n")
    csv_perm = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(cpath))
    )
    crows = csv_perm.collect()
    assert {(r["id"], r["v"]) for r in crows if r["_corrupt_record"] is None} == {
        (1, "ok"),
        (3, "fine"),
    }
    assert [r["_corrupt_record"] for r in crows if r["_corrupt_record"] is not None] == [
        "not_a_long,broken"
    ]


def test_python_datasource_writer_roundtrip_and_overwrite(spark, tmp_path):
    """The write half of the xmldocs connector: two-phase commit lands
    documents atomically; read->write round-trips names and bytes;
    overwrite clears stale documents."""
    from hadoopxmlextractor_spark.sources.xmldocs_datasource import register

    register(spark)
    out = str(tmp_path / "corpus")
    docs = spark.createDataFrame(
        [("alpha", "<store><a>1</a></store>"), ("beta", "<store><b>2</b></store>")],
        "doc_id string, content string",
    )
    docs.write.format("xmldocs").option("path", out).mode("append").save()

    back = {
        r["doc_id"].split("/")[-1]: r["content"]
        for r in spark.read.format("xmldocs").option("path", out).load().collect()
    }
    assert back == {
        "alpha.xml": "<store><a>1</a></store>",
        "beta.xml": "<store><b>2</b></store>",
    }
    import os

    assert not [n for n in os.listdir(out) if n.startswith("._tmp")]

    # overwrite replaces the corpus: beta disappears, gamma lands
    spark.createDataFrame(
        [("gamma", "<store><c>3</c></store>")], "doc_id string, content string"
    ).write.format("xmldocs").option("path", out).mode("overwrite").save()
    names = sorted(
        r["doc_id"].split("/")[-1]
        for r in spark.read.format("xmldocs").option("path", out).load().collect()
    )
    assert names == ["gamma.xml"]


def test_snapshot_profile_drift_between_versions(spark, tmp_path):
    from hadoopxmlextractor_spark.snapshots import (
        commit_upsert,
        profile_drift,
        write_snapshot,
    )

    table = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
        ),
        table,
    )
    # v1: one update (no row change), one insert with a NULL text
    commit_upsert(
        spark,
        table,
        spark.createDataFrame([(3, "c2"), (4, None)], "doc_id long, text string"),
        "doc_id",
    )
    drift = {
        r["col_name"]: r
        for r in profile_drift(spark, table, 0, 1, ["doc_id", "text"]).collect()
    }
    assert drift["doc_id"]["rows_a"] == 3 and drift["doc_id"]["rows_b"] == 4
    assert drift["doc_id"]["rows_delta"] == 1
    assert drift["text"]["nulls_delta"] == 1
    assert drift["doc_id"]["distinct_delta"] == 1


def test_snapshot_diff_reports_adds_removes_changes(spark, tmp_path):
    from hadoopxmlextractor_spark.snapshots import (
        commit_upsert,
        snapshot_diff,
        write_snapshot,
    )

    table = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame(
            [(1, "a", True), (2, "b", False), (3, "c", False)],
            "doc_id long, text string, takedown boolean",
        ).select("doc_id", "text"),
        table,
    )
    batch = spark.createDataFrame(
        [(2, "b2", False), (3, "c", False), (4, "d", False), (1, None, True)],
        "doc_id long, text string, takedown boolean",
    )
    commit_upsert(spark, table, batch.select("doc_id", "text", "takedown"),
                  "doc_id", delete_col="takedown")
    # v1 = {2: b2, 3: c, 4: d}: id 1 taken down, 2 changed, 3 re-landed
    # byte-identical (must NOT report), 4 added.
    got = {
        r["doc_id"]: r["change"]
        for r in snapshot_diff(
            spark, table, 0, 1, "doc_id", compare_cols=["text"]
        ).collect()
    }
    assert got == {1: "removed", 2: "changed", 4: "added"}


def test_python_datasource_writer_abort_cleans_temporaries(spark, tmp_path):
    import os

    from hadoopxmlextractor_spark.sources.xmldocs_datasource import (
        XmlDocsWriter,
        _WroteFiles,
    )

    out = str(tmp_path / "corpus")
    os.makedirs(out)
    w = XmlDocsWriter({"path": out}, overwrite=False)
    tmp1 = os.path.join(out, "._tmp-x-a.xml")
    open(tmp1, "w").write("<a/>")
    # abort after a partial task: temporaries vanish, nothing published
    w.abort([_WroteFiles([(tmp1, os.path.join(out, "a.xml"))])])
    assert os.listdir(out) == []


def test_catalog_table_roundtrip_and_insert(spark, tmp_path):
    """Catalog surface: saveAsTable → spark.table / SQL reads →
    INSERT INTO appends — the managed-table workflow users migrating
    from warehouse-centric engines expect to keep working."""
    spark.sql("DROP TABLE IF EXISTS cat_demo")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    )
    try:
        df.write.format("parquet").saveAsTable("cat_demo")
        assert spark.table("cat_demo").count() == 2
        spark.sql("INSERT INTO cat_demo VALUES (3, 'c')")
        got = {
            r["id"]: r["v"] for r in spark.sql("SELECT * FROM cat_demo").collect()
        }
        assert got == {1: "a", 2: "b", 3: "c"}
        assert "cat_demo" in [t.name for t in spark.catalog.listTables()]
    finally:
        # managed table: DROP also removes the warehouse-dir files
        spark.sql("DROP TABLE IF EXISTS cat_demo")


def test_sql_registered_pandas_udf(spark):
    """A vectorized (Arrow) UDF registered for the SQL surface — the
    escape hatch stays Arrow-batched even when invoked from SQL text,
    never a row-at-a-time Python UDF."""
    import pandas as pd
    from pyspark.sql import functions as F

    @F.pandas_udf("double")
    def sql_margin_norm(s: pd.Series) -> pd.Series:
        return s / (1.0 + s.abs())

    spark.udf.register("sql_margin_norm", sql_margin_norm)
    spark.createDataFrame([(0.0,), (3.0,), (-1.0,)], "x double").createOrReplaceTempView(
        "udf_demo"
    )
    got = [r["y"] for r in spark.sql(
        "SELECT sql_margin_norm(x) AS y FROM udf_demo ORDER BY x"
    ).collect()]
    assert got == [-0.5, 0.0, 0.75]


def test_task_retry_yields_exact_result(tmp_path):
    """Cluster-realism pin: a task that fails on its FIRST attempt
    (injected via TaskContext) must retry and still produce the exact
    result — Arrow-batched UDF lineages are safely re-computable.
    Runs in a subprocess because retries need a `local[4, 2]` master,
    which the shared session fixture doesn't use."""
    import os
    import subprocess
    import sys
    import textwrap

    script = tmp_path / "retry_probe.py"
    script.write_text(
        textwrap.dedent(
            """
            from typing import Iterator

            import pandas as pd
            from pyspark.sql import SparkSession
            from pyspark.sql import functions as F

            spark = (
                SparkSession.builder.master("local[4, 2]")
                .config("spark.sql.shuffle.partitions", "4")
                .config("spark.ui.enabled", "false")
                .getOrCreate()
            )
            spark.sparkContext.setLogLevel("ERROR")

            @F.pandas_udf("long")
            def flaky_double(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
                from pyspark import TaskContext

                tc = TaskContext.get()
                if tc.partitionId() == 0 and tc.attemptNumber() == 0:
                    raise RuntimeError("injected first-attempt failure")
                for s in it:
                    yield s * 2

            df = spark.range(0, 1000, 1, 4).select(flaky_double("id").alias("v"))
            total = df.agg(F.sum("v")).first()[0]
            assert total == 999 * 1000, total
            print("RETRY_OK", total)
            spark.stop()
            """
        )
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert "RETRY_OK 999000" in out.stdout, out.stdout + out.stderr


def test_maintain_rollup_matches_direct_recompute_with_group_moves(spark):
    from hadoopxmlextractor_spark.snapshots import maintain_rollup

    # old: ids 1-6; new: 1 unchanged, 2 value-changed, 3 MOVES group
    # a→b, 4 removed, 7 added, plus group c vanishing entirely (5,6
    # removed) — the maintained rollup must equal a direct recompute,
    # and c must not surface as a zero-count row.
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 40),
         (5, "c", 50), (6, "c", 60)],
        "id long, grp string, val long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 25), (3, "b", 30), (7, "b", 70)],
        "id long, grp string, val long",
    )
    got = {
        r.grp: (r.n_docs, r.total)
        for r in maintain_rollup(old, new, "id", "grp", "val").collect()
    }
    direct = {
        r.grp: (r.n, r.t)
        for r in new.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("t"))
        .collect()
    }
    assert got == direct == {"a": (2, 35), "b": (2, 100)}
    assert "c" not in got


def test_maintain_minmax_rollup_dirty_group_recompute(spark):
    """Min/max are not self-maintainable: deleting the extremum forces
    a recompute of that group, while untouched groups must carry their
    old rollup forward verbatim (incl. when the old rollup would be
    expensive to rebuild). Covers: extremum DELETED, extremum value
    CHANGED, group-moving row (dirties both groups), group emptied,
    brand-new group, and a clean carried-forward group."""
    from pyspark.sql import functions as F

    from hadoopxmlextractor_spark.snapshots import maintain_minmax_rollup

    old = spark.createDataFrame(
        [
            # group A: max row (id 2) will be DELETED
            (1, "A", 10), (2, "A", 99), (3, "A", 50),
            # group B: min row (id 4) CHANGES value upward
            (4, "B", 5), (5, "B", 40),
            # group C: row 6 will MOVE to group D
            (6, "C", 77), (7, "C", 30),
            # group E: will be emptied entirely
            (8, "E", 1),
            # group F: completely untouched (must carry forward)
            (9, "F", 3), (10, "F", 8),
        ],
        "id long, grp string, v long",
    )
    new = spark.createDataFrame(
        [
            (1, "A", 10), (3, "A", 50),          # A: 99 gone -> max 50
            (4, "B", 60), (5, "B", 40),          # B: min becomes 40
            (6, "D", 77), (7, "C", 30),          # C loses 77; D appears
            (9, "F", 3), (10, "F", 8),           # F untouched
            (11, "G", 200),                      # brand-new group
        ],
        "id long, grp string, v long",
    )
    got = {
        r.grp: (r.n_docs, r.min_val, r.max_val)
        for r in maintain_minmax_rollup(old, new, "id", "grp", "v").collect()
    }
    assert got == {
        "A": (2, 10, 50),
        "B": (2, 40, 60),
        "C": (1, 30, 30),
        "D": (1, 77, 77),
        "F": (2, 3, 8),
        "G": (1, 200, 200),
    }  # E emptied -> absent
    # equality with the direct recompute (the oracle identity)
    direct = {
        r.grp: (r.n_docs, r.min_val, r.max_val)
        for r in new.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("v").alias("min_val"),
            F.max("v").alias("max_val"),
        )
        .collect()
    }
    assert got == direct


def test_maintain_topk_insert_only(spark):
    """Insert-only top-k maintenance: the batch displaces standing
    members exactly as a from-scratch recompute would, ties resolve by
    (value DESC, id ASC) deterministically, and composition over two
    generations stays exact."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hadoopxmlextractor_spark.snapshots import maintain_topk

    def topk_direct(df, k=2):
        w = Window.partitionBy("grp").orderBy(
            F.col("v").desc(), F.col("id").asc()
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn")
        )

    old = spark.createDataFrame(
        [("A", 1, 10), ("A", 2, 20), ("A", 3, 5), ("B", 4, 7), ("B", 5, 7)],
        "grp string, id long, v long",
    )
    standing = topk_direct(old)
    batch = spark.createDataFrame(
        [("A", 6, 15), ("B", 7, 7), ("C", 8, 1)],  # displaces A#1; ties in B
        "grp string, id long, v long",
    )
    got = {
        (r.grp, r.id) for r in maintain_topk(
            standing, batch, "grp", "id", "v", k=2
        ).collect()
    }
    want = {(r.grp, r.id) for r in topk_direct(old.union(batch)).collect()}
    assert got == want
    assert got == {("A", 2), ("A", 6), ("B", 4), ("B", 5), ("C", 8)}
    # second generation composes
    batch2 = spark.createDataFrame([("B", 9, 99)], "grp string, id long, v long")
    got2 = {
        (r.grp, r.id) for r in maintain_topk(
            maintain_topk(standing, batch, "grp", "id", "v", k=2),
            batch2, "grp", "id", "v", k=2,
        ).collect()
    }
    want2 = {
        (r.grp, r.id)
        for r in topk_direct(old.union(batch).union(batch2)).collect()
    }
    assert got2 == want2


def test_distribution_drift_detects_shape_change(spark):
    """A planted mean shift must produce a large chi-square while an
    identical-distribution pair stays near zero — with row counts
    equal in both cases (the signal profile_drift cannot see)."""
    from hadoopxmlextractor_spark.snapshots import distribution_drift

    base = [(i, 100 + (i * 37) % 50) for i in range(400)]
    shifted = [(i, v + 200) for i, v in base]  # same count, shifted shape
    df = lambda rows: spark.createDataFrame(rows, "id long, v long")

    drifted = distribution_drift(df(base), df(shifted), "v", n_buckets=8)
    chi2 = drifted.first()["chi2"]
    assert chi2 > 100  # complete separation across buckets

    same = distribution_drift(df(base), df(list(base)), "v", n_buckets=8)
    assert same.first()["chi2"] == 0.0  # identical shape: zero statistic
    # occupied buckets only; per-bucket counts reconcile with inputs
    tot = same.groupBy().sum("n_old", "n_new").first()
    assert tot[0] == 400 and tot[1] == 400


def test_warc_reader_files_members_and_malformed(spark, tmp_path):
    """Native WARC source (r7): a 3-record .warc.gz written in the
    Common Crawl record-per-gzip-member layout reads back through the
    binaryFile route with headers, payloads, and HTTP split intact; a
    plain (uncompressed) WARC parses identically; a malformed file
    yields the single NULL marker row instead of failing the scan."""
    from hadoopxmlextractor_spark.sources.warc import (
        parse_warc,
        read_warc,
        split_http_payload,
        warc_records,
        write_warc,
    )

    body = b"<html>hello crawl</html>"
    recs = [
        {"warc_type": "warcinfo", "record_id": "<urn:uuid:a>",
         "content_type": "application/warc-fields",
         "payload": b"software: test"},
        {"warc_type": "response", "record_id": "<urn:uuid:b>",
         "target_uri": "https://example.org/x",
         "content_type": "application/http; msgtype=response",
         "payload": b"HTTP/1.1 404 Not Found\r\nX: y\r\n\r\n" + body},
        {"warc_type": "metadata", "record_id": "<urn:uuid:c>",
         "target_uri": "https://example.org/x",
         "content_type": "application/warc-fields",
         "payload": b"fetchTimeMs: 7"},
    ]
    gz = write_warc(recs, gzip_members=True)
    plain = write_warc(recs, gzip_members=False)
    assert gz[:2] == b"\x1f\x8b" and plain[:5] == b"WARC/"
    # both layouts parse to identical records
    for blob in (gz, plain):
        got = parse_warc(blob)
        assert [r["warc_type"] for r in got] == [
            "warcinfo", "response", "metadata"
        ]
        assert got[1]["target_uri"] == "https://example.org/x"
        status, got_body = split_http_payload(got[1]["payload"])
        assert (status, got_body) == (404, body)

    (tmp_path / "a.warc.gz").write_bytes(gz)
    (tmp_path / "b.warc").write_bytes(plain)
    out = read_warc(spark, str(tmp_path / "*.warc*")).collect()
    assert len(out) == 6  # 3 records from each file
    assert {r.warc_type for r in out} == {"warcinfo", "response", "metadata"}
    resp = [r for r in out if r.warc_type == "response"][0]
    assert bytes(resp.payload).endswith(body)
    assert resp.content_length == len(recs[1]["payload"])

    files = spark.createDataFrame(
        [("bad", bytearray(b"not a warc at all"))],
        "path string, content binary",
    )
    marker = warc_records(files).collect()
    assert len(marker) == 1 and marker[0].warc_type is None
    assert marker[0].rec_idx == -1


def test_warc_split_index_ranged_read_equals_whole_file(spark, tmp_path):
    """Intra-file WARC splits (r8): the gzip-member split index cuts a
    multi-member file at record-aligned boundaries only; the ranged
    per-split reads union to EXACTLY the whole-file read (same rows,
    same rec_idx); splits of one file spread over >1 task; a zero-byte
    file surfaces as the marker row instead of vanishing (r7 advice);
    a record SPANNING gzip members still parses via the carry buffer
    and never admits an interior cut point."""
    import zlib

    from pyspark.sql import functions as F

    from hadoopxmlextractor_spark.sources.warc import (
        iter_warc_records,
        read_warc,
        read_warc_split,
        split_warc_blob,
        warc_records,
        warc_split_index,
        write_warc,
    )

    recs = [
        {"warc_type": "response", "record_id": f"<urn:uuid:{i}>",
         "target_uri": f"https://example.org/{i}",
         "content_type": "text/plain",
         "payload": bytes([(i * 7 + j) % 251 for j in range(40 + i * 13)])}
        for i in range(40)
    ]
    gz = write_warc(recs, gzip_members=True)
    (tmp_path / "seg.warc.gz").write_bytes(gz)
    (tmp_path / "empty.warc.gz").write_bytes(b"")

    whole = sorted(
        read_warc(spark, str(tmp_path / "seg.warc.gz")).collect(),
        key=lambda r: r.rec_idx,
    )
    ranged = sorted(
        read_warc_split(
            spark, str(tmp_path / "seg.warc.gz"), target_bytes=512
        ).collect(),
        key=lambda r: r.rec_idx,
    )
    assert len(whole) == 40
    assert [r.rec_idx for r in ranged] == list(range(40))
    for a, b in zip(whole, ranged):
        assert (a.rec_idx, a.record_id, a.content_length) == (
            b.rec_idx, b.record_id, b.content_length
        )
        assert bytes(a.payload) == bytes(b.payload)

    # the file really was cut, and the splits land on >1 task
    splits = split_warc_blob(gz, target_bytes=512)
    assert len(splits) > 4
    assert sum(s["n_recs"] for s in splits) == 40
    files = spark.createDataFrame(
        [("seg", bytearray(gz))], "path string, content binary"
    )
    idx = warc_split_index(files, target_bytes=512)
    n_parts = (
        idx.repartition(8, "path", "split_idx")
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert n_parts > 1

    # zero-byte file: marker row, not zero rows (audit stays total)
    empty = spark.createDataFrame(
        [("empty", bytearray(b""))], "path string, content binary"
    )
    marker = warc_records(empty).collect()
    assert len(marker) == 1 and marker[0].rec_idx == -1

    # a record spanning two gzip members: carry buffer parses it, and
    # the split index refuses to cut inside it
    plain = write_warc(recs[:3], gzip_members=False)
    cut = len(plain) // 2

    def member(b: bytes) -> bytes:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(b) + co.flush()

    spanning = member(plain[:cut]) + member(plain[cut:])
    got = list(iter_warc_records(spanning))
    assert [r["record_id"] for r in got] == [r["record_id"] for r in recs[:3]]
    sp = split_warc_blob(spanning, target_bytes=1)
    # only record-aligned member ends are cut points; the mid-record
    # member end is not one, so a cut there can never happen
    assert sum(s["n_recs"] for s in sp) == 3
    for s in sp:
        piece = spanning[s["offset"]: s["offset"] + s["length"]]
        assert len(list(iter_warc_records(piece, base_idx=s["first_rec"]))) == s["n_recs"]


def test_split_warc_file_streaming_equals_blob(spark, tmp_path):
    """r9 (r8 verdict item 3): the STREAMING per-path split index
    (split_warc_file — chunked reads, no whole-file materialization)
    equals split_warc_blob on every fixture shape, down to 7-byte read
    chunks: multi-member gzip, single-member gzip (degrades to one
    whole-file split), plain WARC, and a record spanning gzip members.
    A 50 MB plain-WARC payload indexes under a tracemalloc peak of a
    few chunks (constant memory — the payload is skipped, never
    buffered), and a URI-escaped path (space → %20 in the binaryFile
    URI) round-trips through read_warc_split (r8 advice)."""
    import tracemalloc
    import zlib

    from hadoopxmlextractor_spark.sources.warc import (
        read_warc,
        read_warc_split,
        split_warc_blob,
        split_warc_file,
        write_warc,
    )

    recs = [
        {"warc_type": "response", "record_id": f"<urn:uuid:{i}>",
         "target_uri": f"https://example.org/{i}",
         "content_type": "text/plain",
         "payload": bytes([(i * 11 + j) % 251 for j in range(30 + i * 17)])}
        for i in range(25)
    ]

    def member(b: bytes) -> bytes:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(b) + co.flush()

    plain = write_warc(recs, gzip_members=False)
    cut = len(plain) // 2
    fixtures = {
        "multi.warc.gz": write_warc(recs, gzip_members=True),
        "single.warc.gz": member(plain),  # no interior cut point
        "plain.warc": plain,
        "spanning.warc.gz": member(plain[:cut]) + member(plain[cut:]),
    }
    for name, blob in fixtures.items():
        p = tmp_path / name
        p.write_bytes(blob)
        want = split_warc_blob(blob, target_bytes=512)
        for chunk_bytes in (7, 4 << 20):
            got = split_warc_file(
                str(p), target_bytes=512, chunk_bytes=chunk_bytes
            )
            assert got == want, (name, chunk_bytes)
    assert len(split_warc_file(str(tmp_path / "single.warc.gz"),
                               target_bytes=512)) == 1
    assert len(split_warc_file(str(tmp_path / "multi.warc.gz"),
                               target_bytes=512)) > 4

    # constant-memory property: a 50 MB plain payload is SKIPPED, not
    # buffered — peak traced allocation stays a few read chunks, far
    # below the payload size (the old binaryFile index held the whole
    # file; this is the measurable difference)
    payload_len = 50 * (1 << 20)
    big = tmp_path / "big.warc"
    with open(big, "wb") as f:
        f.write(
            b"WARC/1.0\r\nWARC-Type: resource\r\n"
            b"WARC-Record-ID: <urn:big:1>\r\n"
            b"Content-Length: %d\r\n\r\n" % payload_len
        )
        piece = bytes(1 << 20)
        for _ in range(50):
            f.write(piece)
        f.write(b"\r\n\r\n")
    tracemalloc.start()
    big_splits = split_warc_file(
        str(big), target_bytes=1 << 20, chunk_bytes=1 << 20
    )
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert [s["n_recs"] for s in big_splits] == [1]
    assert big_splits[0]["length"] == big.stat().st_size
    assert peak < 8 * (1 << 20), peak

    # URI-escaped local path: a space in the filename percent-encodes
    # in the binaryFile URI; the executor-side open() must unquote
    esc_dir = tmp_path / "dir with space"
    esc_dir.mkdir()
    esc = esc_dir / "se g.warc.gz"
    esc.write_bytes(fixtures["multi.warc.gz"])
    whole = sorted(
        read_warc(spark, str(esc)).collect(), key=lambda r: r.rec_idx
    )
    ranged = sorted(
        read_warc_split(spark, str(esc), target_bytes=512).collect(),
        key=lambda r: r.rec_idx,
    )
    assert len(whole) == len(ranged) == 25
    for a, b in zip(whole, ranged):
        assert a.record_id == b.record_id
        assert bytes(a.payload) == bytes(b.payload)


def test_warc_records_salvage_partial_then_marker(spark):
    """r8b streamed record explode: a file that turns malformed MID
    STREAM salvages the records parsed before the fault AND appends
    the rec_idx -1 marker row (auditing stays total); a file malformed
    from byte 0 yields only the marker."""
    from hadoopxmlextractor_spark.sources.warc import warc_records, write_warc

    recs = [
        {"warc_type": "response", "record_id": f"<urn:s:{i}>",
         "target_uri": f"https://x/{i}", "content_type": "t",
         "payload": bytes([i]) * 10}
        for i in range(3)
    ]
    good_then_junk = write_warc(recs, gzip_members=False) + b"JUNK TAIL"
    files = spark.createDataFrame(
        [("partial", bytearray(good_then_junk)),
         ("allbad", bytearray(b"never a warc"))],
        "path string, content binary",
    )
    out = sorted(
        ((r.path, r.rec_idx, r.record_id) for r in warc_records(files).collect())
    )
    assert out == [
        ("allbad", -1, None),
        ("partial", -1, None),
        ("partial", 0, "<urn:s:0>"),
        ("partial", 1, "<urn:s:1>"),
        ("partial", 2, "<urn:s:2>"),
    ]


def test_http_split_transfer_and_content_encodings():
    """Real crawled WARCs store responses AS CAPTURED: chunked
    transfer framing and gzip/deflate content codings must be undone
    (in reverse application order) before downstream text extraction;
    truncated or unsupported codings refuse to (None, payload)."""
    import zlib as _z

    from hadoopxmlextractor_spark.sources.warc import split_http_payload

    body = b"<html><p>the true entity bytes &amp; more</p></html>"

    def gz(data, wbits=31, level=6):
        c = _z.compressobj(level, _z.DEFLATED, wbits)
        return c.compress(data) + c.flush()

    def chunked(data, ext=b"", trailer=b""):
        return (
            (b"%x" % len(data)) + ext + b"\r\n" + data + b"\r\n"
            + b"0\r\n" + trailer + b"\r\n"
        )

    head = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
    # identity
    assert split_http_payload(head + b"\r\n" + body) == (200, body)
    # chunked (multi-chunk, chunk extension, trailer header)
    two = ((b"%x;x=1\r\n" % 16) + body[:16] + b"\r\n"  # noqa: E226
           + (b"%x\r\n" % (len(body) - 16)) + body[16:] + b"\r\n"
           + b"0\r\nX-Digest: abc\r\n\r\n")
    p = head + b"Transfer-Encoding: chunked\r\n\r\n" + two
    assert split_http_payload(p) == (200, body)
    # gzip / x-gzip / zlib-deflate / raw-deflate content codings
    for ce, enc in [
        (b"gzip", gz(body)),
        (b"x-gzip", gz(body)),
        (b"deflate", gz(body, wbits=15)),
        (b"deflate", gz(body, wbits=-15)),
    ]:
        p = head + b"Content-Encoding: " + ce + b"\r\n\r\n" + enc
        assert split_http_payload(p) == (200, body)
    # chunked OVER gzip (sender gzips then chunks; receiver reverses)
    p = (head + b"Content-Encoding: gzip\r\n"
         + b"Transfer-Encoding: chunked\r\n\r\n" + chunked(gz(body)))
    assert split_http_payload(p) == (200, body)
    # TE: gzip, chunked (codings listed in application order)
    p = (head + b"Transfer-Encoding: gzip, chunked\r\n\r\n"
         + chunked(gz(body)))
    assert split_http_payload(p) == (200, body)
    # truncated chunk / corrupt gzip / unsupported coding all refuse
    trunc = head + b"Transfer-Encoding: chunked\r\n\r\n" + b"20\r\n" + body[:16]
    s, b = split_http_payload(trunc)
    assert s is None and b == trunc  # refusal returns the RAW payload
    s, b = split_http_payload(
        head + b"Content-Encoding: gzip\r\n\r\n" + gz(body)[:-5]
    )
    assert s is None
    s, b = split_http_payload(head + b"Content-Encoding: br\r\n\r\n" + body)
    assert s is None and b == head + b"Content-Encoding: br\r\n\r\n" + body
