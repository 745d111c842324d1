"""Operator surface: every module registers (name -> (query_fn, oracle_sql))
pairs into REGISTRY via the @query decorator in registry.py."""

from xmlstreamprocessor_spark.operators.registry import REGISTRY, query  # noqa: F401

# importing the modules populates REGISTRY
from xmlstreamprocessor_spark.operators import relational  # noqa: F401,E402
from xmlstreamprocessor_spark.operators import analytic  # noqa: F401,E402
from xmlstreamprocessor_spark.operators import temporal  # noqa: F401,E402
from xmlstreamprocessor_spark.operators import dedup  # noqa: F401,E402
from xmlstreamprocessor_spark.operators import graph  # noqa: F401,E402
from xmlstreamprocessor_spark.operators import sampling  # noqa: F401,E402
from xmlstreamprocessor_spark.operators import similarity  # noqa: F401,E402
from xmlstreamprocessor_spark.operators import textops  # noqa: F401,E402
from xmlstreamprocessor_spark.operators import multimodal  # noqa: F401,E402
from xmlstreamprocessor_spark.operators import packing  # noqa: F401,E402
from xmlstreamprocessor_spark.operators import formatsq  # noqa: F401,E402
from xmlstreamprocessor_spark.operators import xmlqueries  # noqa: F401,E402
from xmlstreamprocessor_spark.operators import xspxmlq  # noqa: F401,E402
