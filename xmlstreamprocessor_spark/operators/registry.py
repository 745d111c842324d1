"""Query registry backing ``__spark_entry__.queries()`` / ``oracle_sql()``.

Every operator in SURVEY.md §2 gets a named entry: a PySpark callable
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) the equivalent
DuckDB SQL over the pre-registered table views.  Cross-engine exactness
rules used throughout:

* money/quantity aggregation: cast the (2-decimal-valued) doubles to
  ``decimal(18,2)`` *before* aggregating — decimal arithmetic is exact in
  both engines, so sums match bit-for-bit regardless of partitioning or
  parallelism (a float sum would depend on add order and diverge at scale).
* averages / ratios: exact decimal sum -> cast double -> divide -> round(6);
  the same IEEE ops in the same order on both engines.
* timestamps in output: rendered with date_format/strftime to strings, or
  epoch seconds — never raw timestamps, so timezone handling can't skew a
  hash compare.
* every computed column aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F

from xmlstreamprocessor_spark import catalog
from xmlstreamprocessor_spark.session import tune_for_oracle

REGISTRY: dict[str, tuple[Callable, str | None]] = {}

# Cooperative plan-audit hook (r11 verdict #3).  Queries that eagerly
# materialize and return a rebuilt / scratch-scan frame (the roundtrip
# protocol) have a VACUOUS returned-frame plan — the audit would record
# the post-collect LocalTableScan, so the plan gate could never catch a
# regression that un-prunes the real scan.  Such queries publish their
# pre-materialization frame through ``audit_frame`` while their scratch
# is still alive; ``tools/plan_audit.py`` installs the hook (which
# executes the frame and extracts the REAL plan), and everywhere else it
# is None so the call is a no-op passthrough.
_AUDIT_HOOK: Callable | None = None


def audit_active() -> bool:
    """True while a plan auditor has the hook installed — lets queries
    skip computing audit-only extras (file counts etc.) in normal runs."""
    return _AUDIT_HOOK is not None


def audit_frame(df: DataFrame, **extras) -> DataFrame:
    """Publish a query's pre-materialization frame (plus optional
    informational extras, e.g. pruned-scan file counts) to the active
    plan auditor.  Returns the frame unchanged."""
    if _AUDIT_HOOK is not None:
        _AUDIT_HOOK(df, **extras)
    return df


def query(name: str, oracle: str | None = None):
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def t(spark, sf_dir: str, name: str) -> DataFrame:
    tune_for_oracle(spark)
    return catalog.load(spark, sf_dir, name)


def dec2(c) -> F.Column:
    return F.col(c).cast("decimal(18,2)") if isinstance(c, str) else c.cast("decimal(18,2)")


def dec4(c) -> F.Column:
    return F.col(c).cast("decimal(18,4)") if isinstance(c, str) else c.cast("decimal(18,4)")


def avg6(sum_dec: F.Column, count_col: F.Column) -> F.Column:
    """Exact decimal sum -> double -> divide -> round(6): identical IEEE ops
    in both engines (see module docstring)."""
    return F.round(sum_dec.cast("double") / count_col, 6)


def money2(sum_dec: F.Column) -> F.Column:
    """Canonical FINAL projection for an exact decimal money sum.

    DuckDB's ``.df()`` (the driver's fetch path) converts every DECIMAL to
    float64, while Spark's ``toPandas()`` keeps Decimal objects — so a raw
    decimal in the output can never reliably hash-match.  Both engines
    therefore cast the bit-identical decimal sum to DOUBLE and round to the
    decimal's own scale (a no-op numerically: the double is within 1 ulp of
    a 2-decimal value, never at a .5 tie).  Oracle twin:
    ``round(CAST(sum(...) AS DOUBLE), 2)``.
    """
    return F.round(sum_dec.cast("double"), 2)


def money4(sum_dec: F.Column) -> F.Column:
    """As :func:`money2` for scale-4 decimal sums (price*(1-disc) shapes).
    Oracle twin: ``round(CAST(sum(...) AS DOUBLE), 4)``."""
    return F.round(sum_dec.cast("double"), 4)


def big(c: F.Column) -> F.Column:
    """Canonical integer output: BIGINT on both engines.  DuckDB widens
    sum(INTEGER) to HUGEINT (→ float64 in ``.df()``) and Spark's year() is
    int32 (→ int32 in pandas vs DuckDB's int64) — cast both sides so the
    pandas dtype is int64 everywhere.  Oracle twin: ``CAST(... AS BIGINT)``."""
    return c.cast("bigint")


def fmt_d(c) -> F.Column:
    return F.date_format(c, "yyyy-MM-dd")


def fmt_ts(c) -> F.Column:
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
