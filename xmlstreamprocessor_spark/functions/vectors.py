"""Vector math over ArrayType columns — pure JVM expressions (zip_with /
aggregate), no Python UDFs, so they stay inside whole-stage codegen and
vectorize at any scale.

Accumulation is sequential over array positions in both Spark and the DuckDB
oracle formulations, so double-precision results agree bit-for-bit; scores
surfaced to users are still rounded to 6 decimals for robustness.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def as_double_array(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """:func:`dot` unrolled over literal indices — the IDENTICAL
    left-to-right accumulation (0.0 + a[0]*b[0] + a[1]*b[1] + ...), so
    results are bit-for-bit equal to the aggregate fold and the DuckDB
    list_dot_product, but as a plain Add/Multiply chain that stays in
    whole-stage CODEGEN.  Spark's higher-order functions (aggregate /
    zip_with) evaluate INTERPRETED, which is fine once per row but
    dominates wide pair joins: the r13 semantic-prune profile measured
    six interpreted lambdas per candidate pair at 13.7 s for 231 rows.
    Use this form in hot pair/assignment loops where ``dim`` is known;
    requires uniform-length arrays (GetArrayItem is ANSI-strict)."""
    acc: Column = F.lit(0.0)
    for i in range(dim):
        acc = acc + a[i] * b[i]
    return acc


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """NULL when either vector has zero norm (cosine undefined): the
    when-guard keeps the division unevaluated for degenerate rows, so
    Spark 4's default ANSI mode cannot raise DIVIDE_BY_ZERO — a NULL
    score fails every >= threshold filter and ranks last in DESC
    ordering, which is the intended no-pairs/no-rank behavior."""
    denom = norm(a) * norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def cosine6(a: Column, b: Column) -> Column:
    """Cosine similarity rounded to 6 decimals (cross-engine safe)."""
    return F.round(cosine(a, b), 6)


def duck_cosine6(a: str, b: str) -> str:
    """DuckDB twin of :func:`cosine6` (same sequential double accumulation)."""
    return (
        f"round(list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
        f" / (sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))"
        f" * sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[])))), 6)"
    )
