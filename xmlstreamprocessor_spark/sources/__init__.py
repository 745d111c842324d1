from xmlstreamprocessor_spark.sources.xml_batch import (
    extract_xml,
    extract_xml_jvm,
    extract_xml_records,
    read_xml,
)
from xmlstreamprocessor_spark.sources.datasource import (
    register_xml_source,
    spec_option,
)
from xmlstreamprocessor_spark.sources.udtf import (
    register_xml_array_udtf,
    register_xml_struct_udtf,
    xml_array_udtf,
    xml_struct_udtf,
)
from xmlstreamprocessor_spark.sources.formats import (
    write_bucketed,
    write_partitioned,
    write_zordered,
)

__all__ = [
    "extract_xml",
    "extract_xml_jvm",
    "extract_xml_records",
    "read_xml",
    "register_xml_array_udtf",
    "register_xml_struct_udtf",
    "register_xml_source",
    "spec_option",
    "write_bucketed",
    "write_partitioned",
    "write_zordered",
    "xml_array_udtf",
    "xml_struct_udtf",
]
