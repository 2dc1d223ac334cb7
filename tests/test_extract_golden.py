"""E2E golden tests (FIXTURES.md §4, SURVEY.md §5.2): both reference
configs over the synthesized two-store corpus must reproduce the derived
golden outputs — 30 rows for ExtractInventory, 4 rows for ExtractBook.
"""

import pytest

from hadoopxmlextractor_spark.config import ExtractionConfig
from hadoopxmlextractor_spark.extract import extract, extract_cells, run_extraction
from hadoopxmlextractor_spark.sinks import to_reference_lines
from hadoopxmlextractor_spark.sources import docs_from_strings
from tests.fixtures import (
    BANKS,
    BOOK_CONFIG_XML,
    INVENTORY_CONFIG_XML,
    SOHO,
    golden_rows,
    make_store_xml,
)

INV_CFG = ExtractionConfig.from_hadoop_xml(INVENTORY_CONFIG_XML, is_text=True)
BOOK_CFG = ExtractionConfig.from_hadoop_xml(BOOK_CONFIG_XML, is_text=True)


@pytest.fixture(scope="module")
def docs(spark):
    return docs_from_strings(
        spark,
        {"soho.xml": make_store_xml(SOHO), "banks.xml": make_store_xml(BANKS)},
    ).cache()


def _result_rows(df):
    return [tuple(r)[2:] for r in df.orderBy("doc_id", "seq").collect()]


def test_extract_inventory_30_golden_rows(spark, docs):
    out = extract(docs, INV_CFG)
    rows = _result_rows(out)
    assert len(rows) == 30
    # ordered within each document; compare as per-doc ordered lists
    assert rows == golden_rows([BANKS]) + golden_rows([SOHO])  # banks.xml < soho.xml


def test_extract_book_4_golden_rows(spark, docs):
    rows = _result_rows(extract(docs, BOOK_CFG))
    assert rows == golden_rows([BANKS], "bk106") + golden_rows([SOHO], "bk106")


def test_reference_text_format(spark, docs):
    lines = [r["value"] for r in to_reference_lines(extract(docs, BOOK_CFG), BOOK_CFG).collect()]
    assert lines == [
        "BanksBooks;22446688;January;4;bk106;12;",
        "BanksBooks;22446688;February;1;bk106;17;",
        "SohoBooks;11553377;January;3;bk106;13;",
        "SohoBooks;11553377;February;2;bk106;23;",
    ]


def test_cells_long_format(spark, docs):
    cells = extract_cells(docs.filter("doc_id = 'soho.xml'"), INV_CFG)
    got = cells.orderBy("seq", "order").collect()
    # 1 store + 1 phone + 2*2 inventory + 11*2 book cells = 28
    assert len(got) == 28
    assert [tuple(r)[2:] for r in got[:4]] == [
        (0, "SohoBooks"),
        (1, "11553377"),
        (2, "January"),
        (3, "3"),
    ]


def test_run_extraction_files_roundtrip(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "soho.xml").write_text(make_store_xml(SOHO))
    (in_dir / "banks.xml").write_text(make_store_xml(BANKS))
    cfg_path = tmp_path / "extract_book.xml"
    cfg_path.write_text(BOOK_CONFIG_XML)
    out_dir = tmp_path / "out"

    run_extraction(spark, str(in_dir), str(out_dir), str(cfg_path))

    lines = sorted(
        r["value"] for r in spark.read.text(str(out_dir)).collect()
    )
    assert lines == sorted(
        [
            "SohoBooks;11553377;January;3;bk106;13;",
            "SohoBooks;11553377;February;2;bk106;23;",
            "BanksBooks;22446688;January;4;bk106;12;",
            "BanksBooks;22446688;February;1;bk106;17;",
        ]
    )


def test_multi_node_xpath_concatenates(spark):
    # Several matched nodes concatenate with no separator
    # (XmlExtractor.java:105-109).
    cfg = ExtractionConfig.from_rules(
        [ExtractionConfig.parse_rule("r", "r;false;true; ;0#//x/text();1#//r/@nope;2#//y/text();", ";", "#")],
        nr_of_columns=3,
    )
    docs = docs_from_strings(spark, {"d": "<r><x>a</x><x>b</x><y>z</y></r>"})
    out = extract(docs, cfg).collect()
    # col1's xpath matches nothing → " "; col2 (trigger) present
    assert [tuple(r)[2:] for r in out] == [("ab", " ", "z")]


def test_namespaced_config_runs_fused_and_agrees_with_general(spark):
    # A namespaced document + a prefixed config: the prefixed steps are
    # IN the fused subset (local-name matching), so extraction stays on
    # the fast path, and the general JVM path (prefix-stripped xpath)
    # produces identical rows.
    from hadoopxmlextractor_spark.extract import _compile_fused

    doc = (
        '<bk:cat xmlns:bk="http://example.com/b">'
        '<bk:shelf xmlns:bk="http://example.com/b" loc="top">'
        "<bk:book id=\"b1\"><bk:n>7</bk:n></bk:book>"
        "<bk:book id=\"b2\"><bk:n>9</bk:n></bk:book>"
        "</bk:shelf></bk:cat>"
    )
    cfg = ExtractionConfig.from_rules(
        [
            ExtractionConfig.parse_rule(
                "shelf",
                "bk:shelf;true;true; ;0#//bk:shelf/@loc;"
                "1#//bk:book/@id;2#//bk:book/bk:n/text();",
                ";", "#",
            ),
        ],
        nr_of_columns=3,
    )
    assert _compile_fused(cfg) is not None  # prefixed config → fused
    docs = docs_from_strings(spark, {"d": doc})
    # NB the scanner matches the literal byte pattern (<bk:shelf ) exactly
    # like the reference's RecordReader; the bk:shelf fragment carries
    # its own xmlns so the per-fragment parse resolves the prefix.
    fused_rows = [tuple(r)[2:] for r in extract(docs, cfg, fused=True).collect()]
    general_rows = [tuple(r)[2:] for r in extract(docs, cfg, fused=False).collect()]
    assert fused_rows == general_rows
    assert fused_rows == [("top", "b1b2", "79")]


def test_fused_and_general_paths_agree(spark, docs):
    fused = extract(docs, INV_CFG, fused=True)
    general = extract(docs, INV_CFG, fused=False)
    assert sorted(map(tuple, fused.collect())) == sorted(map(tuple, general.collect()))


def test_auto_path_selection():
    from hadoopxmlextractor_spark.extract import _compile_fused
    assert _compile_fused(INV_CFG) is not None  # reference config → fused
    from hadoopxmlextractor_spark.config import ExtractionConfig
    pred_cfg = ExtractionConfig.from_rules(
        [ExtractionConfig.parse_rule("r", "r;false;true; ;0#//r[@x='1']/@x;", ";", "#")],
        nr_of_columns=1,
    )
    assert _compile_fused(pred_cfg) is not None  # eq-predicate → still fused
    # round-5: following:: moved INTO the subset — use a still-exotic
    # form (nested predicate) to exercise the JVM routing decision
    assert _compile_fused(ExtractionConfig.from_rules(
        [ExtractionConfig.parse_rule("r", "r;false;true; ;0#//r/following::x;", ";", "#")],
        nr_of_columns=1,
    )) is not None  # full-document axis → now fused
    exotic = ExtractionConfig.from_rules(
        [ExtractionConfig.parse_rule("r", "r;false;true; ;0#//r[a[b]]/@x;", ";", "#")],
        nr_of_columns=1,
    )
    assert _compile_fused(exotic) is None  # nested predicate → JVM path
    positional = ExtractionConfig.from_rules(
        [ExtractionConfig.parse_rule("r", "r;false;true; ;0#//r[position()=1]/@x;", ";", "#")],
        nr_of_columns=1,
    )
    assert _compile_fused(positional) is not None  # now on the fast path
    ancestor = ExtractionConfig.from_rules(
        [ExtractionConfig.parse_rule("r", "r;false;true; ;0#//r/ancestor::x[1]/@x;", ";", "#")],
        nr_of_columns=1,
    )
    assert _compile_fused(ancestor) is not None  # round-5: fused too


def test_malformed_fragments_audit_stream(spark):
    # A fragment whose start tag matches but whose body is broken XML:
    # the extraction drops it (reference semantics); the audit stream
    # reports it with position and reason.
    from hadoopxmlextractor_spark.extract import extract, malformed_fragments

    cfg = ExtractionConfig.from_hadoop_xml(
        """<?xml version="1.0"?>
        <configuration>
          <property><name>xmlextractor.delimiter_string</name><value>;</value></property>
          <property><name>xmlextractor.sort_order_delimiter_string</name><value>#</value></property>
          <property><name>xmlextractor.output_delimiter_string</name><value>;</value></property>
          <property><name>xmlextractor.nodes</name><value>book;</value></property>
          <property><name>xmlextractor.nr_of_columns</name><value>1</value></property>
          <property><name>book</name><value>book;true;true; ;0#//book/@id;</value></property>
        </configuration>""",
        is_text=True,
    )
    good = '<book id="bk1"><x>1</x></book>'
    bad = '<book id="bk2"><unclosed></book>'
    doc = f"<store>{good}{bad}</store>"
    docs = spark.createDataFrame([("d1", doc)], "doc_id string, content string")
    rows = extract(docs, cfg).collect()
    errs = malformed_fragments(docs, cfg).collect()
    assert len(errs) == 1
    e = errs[0]
    assert e.doc_id == "d1" and e.rule == "book"
    assert e.seq == doc.index(bad)
    assert "mismatched tag" in e.error or "not well-formed" in e.error
    assert e.snippet.startswith('<book id="bk2">')
    # the dropped fragment is exactly the one missing from the output
    assert [r.c0 for r in rows] == ["bk1"]


def test_descendant_and_positional_configs_run_fused_and_agree(spark):
    # Mid-path // (descendant axis) and [n] (per-parent positional
    # predicate) are IN the fused subset; extraction stays on the fast
    # path and matches the general javax/JVM xpath path node-for-node.
    from hadoopxmlextractor_spark.extract import _compile_fused

    doc = (
        '<cat loc="top"><shelf><row><book id="b1"><n>7</n></book>'
        '<book id="b2"><n>9</n></book></row>'
        '<row><book id="b3"><n>4</n></book></row></shelf></cat>'
    )
    cfg = ExtractionConfig.from_rules(
        [
            ExtractionConfig.parse_rule(
                "cat",
                "cat;true;true; ;0#/cat/@loc;"
                "1#//cat//book/@id;2#//row/book[2]/@id;3#//shelf//n/text();"
                "4#//row//text();",
                ";", "#",
            ),
        ],
        nr_of_columns=5,
    )
    assert _compile_fused(cfg) is not None  # //, [n], //text() → still fused
    docs = docs_from_strings(spark, {"d": doc})
    fused_rows = [tuple(r)[2:] for r in extract(docs, cfg, fused=True).collect()]
    general_rows = [tuple(r)[2:] for r in extract(docs, cfg, fused=False).collect()]
    assert fused_rows == general_rows
    assert fused_rows == [("top", "b1b2b3", "b2", "794", "794")]


def test_fused_and_general_paths_agree_with_predicates(spark):
    # The new [@attr='v'] fused support must match javax XPath (the
    # general path) node-for-node, including the no-match → dropped-cell
    # semantics.
    cfg = ExtractionConfig.from_rules(
        [
            ExtractionConfig.parse_rule(
                "inventory",
                "inventory;true;true; ;"
                "0#//inventory/@month;1#//book[@id='bk106']/@inStock;",
                ";",
                "#",
            )
        ],
        nr_of_columns=2,
    )
    doc = (
        "<store>"
        '<inventory month="Jan"><book id="bk106" inStock="13"/>'
        '<book id="bk101" inStock="9"/></inventory>'
        '<inventory month="Feb"><book id="bk101" inStock="7"/></inventory>'
        "</store>"
    )
    docs = spark.createDataFrame([("d", doc)], "doc_id string, content string")
    from hadoopxmlextractor_spark.extract import _compile_fused, extract_cells

    assert _compile_fused(cfg) is not None  # stays on the fast path
    fused = sorted(map(tuple, extract_cells(docs, cfg, fused=True).collect()))
    general = sorted(map(tuple, extract_cells(docs, cfg, fused=False).collect()))
    assert fused == general
    # Jan fragment matches bk106 (13); Feb fragment drops the cell
    assert [(v,) for *_, v in fused].count(("13",)) == 1
