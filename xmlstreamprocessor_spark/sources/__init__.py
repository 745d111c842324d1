from xmlstreamprocessor_spark.sources.xml_batch import (
    extract_xml,
    extract_xml_records,
    read_xml,
)

__all__ = ["extract_xml", "extract_xml_records", "read_xml"]
