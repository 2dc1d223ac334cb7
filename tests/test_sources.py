from hadoopxmlextractor_spark.config import ExtractionConfig
from hadoopxmlextractor_spark.extract import extract
from hadoopxmlextractor_spark.sources import pack, read_sequence_file
from tests.fixtures import BOOK_CONFIG_XML, SOHO, make_store_xml


def test_pack_and_read_sequence_file_roundtrip(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "soho.xml").write_text(make_store_xml(SOHO))

    seq_path = str(tmp_path / "packed.seq")
    pack(spark, str(in_dir), seq_path)

    docs = read_sequence_file(spark, seq_path)
    assert docs.columns == ["doc_id", "content"]
    rows = docs.collect()
    assert len(rows) == 1
    assert len(rows[0]["doc_id"]) == 36  # uuid key like the reference
    assert rows[0]["content"] == make_store_xml(SOHO)

    # packed input runs through the full extraction pipeline
    cfg = ExtractionConfig.from_hadoop_xml(BOOK_CONFIG_XML, is_text=True)
    out = extract(docs, cfg)
    assert [tuple(r)[2:] for r in out.orderBy("seq").collect()] == [
        ("SohoBooks", "11553377", "January", "3", "bk106", "13"),
        ("SohoBooks", "11553377", "February", "2", "bk106", "23"),
    ]
