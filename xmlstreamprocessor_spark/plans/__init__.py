from xmlstreamprocessor_spark.plans.spec import (
    Spec,
    X,
    compile_array_spec,
    compile_spec,
)
from xmlstreamprocessor_spark.plans.infer import infer_xml_spec

__all__ = ["X", "Spec", "compile_spec", "compile_array_spec", "infer_xml_spec"]
