from xmlstreamprocessor_spark.functions import text, vectors  # noqa: F401
