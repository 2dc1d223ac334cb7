from hadoopxmlextractor_spark.sources.xml_docs import (
    docs_from_strings,
    pack,
    read_sequence_file,
    read_xml_documents,
)

__all__ = ["read_xml_documents", "read_sequence_file", "docs_from_strings", "pack"]
