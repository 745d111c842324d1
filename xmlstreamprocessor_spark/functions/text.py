"""Text-analysis building blocks for the LLM-data-pipeline operators:
tokenization, shingling, normalized fingerprints, deterministic 60-bit word
hashes.  Everything is a JVM-side column expression (split / transform /
md5 / conv) — no Python in the hot path — with a documented DuckDB-SQL twin
so every operator is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def words(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.split(F.trim(c), r"\s+")


def grams(c: Column | str, n: int = 3) -> Column:
    """ALL word n-grams in document order (duplicates kept — repetition
    statistics need the multiset).  Empty when the doc has < n words."""
    # Built by zipping the word array with its own shifted slices: the
    # expensive split() is evaluated O(n) times per ROW, not per element
    # (an element_at(split(..), i) formulation re-splits per gram and turns
    # quadratic in document length).  zip_with pads the shorter side with
    # null and concat(null) propagates, so past-the-end grams filter out.
    ws = words(c)
    sz = F.size(ws)
    gs = ws
    for k in range(1, n):
        shifted = F.slice(ws, k + 1, F.greatest(sz - k, F.lit(0)))
        gs = F.zip_with(gs, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(gs, lambda x: x.isNotNull())


def shingles(c: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles, document order of first occurrence
    irrelevant (set semantics).  Empty when the doc has < n words."""
    return F.array_distinct(grams(c, n))


def duck_grams(col: str, n: int = 3) -> str:
    """DuckDB twin of :func:`grams` (1-indexed lists, duplicates kept)."""
    ws = f"string_split_regex(trim({col}), '\\s+')"
    gram = " || ' ' || ".join(f"{ws}[i+{k}]" for k in range(n))
    return (
        f"list_transform(range(1, greatest(len({ws}) - {n - 2}, 1)),"
        f" i -> {gram})"
    )


def duck_shingles(col: str, n: int = 3) -> str:
    """DuckDB twin of :func:`shingles` (1-indexed lists)."""
    return f"list_distinct({duck_grams(col, n)})"


def normalized(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


DUCK_NORMALIZED = "regexp_replace(lower(trim({c})), '\\s+', ' ', 'g')"


def word_hash60(c: Column) -> Column:
    """Deterministic 60-bit integer hash of a token: first 15 hex chars of
    md5, radix-converted.  DuckDB twin:
    ``CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT)``."""
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast("bigint")


DUCK_WORD_HASH60 = "CAST(('0x' || substr(md5({w}), 1, 15)) AS BIGINT)"


def fingerprint(c: Column | str) -> Column:
    """Whole-document fingerprint over normalized text."""
    return F.md5(normalized(c).cast("binary"))
