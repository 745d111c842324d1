"""Deterministic sampling / data-mixing operators for training pipelines.

Random sampling is how a 100 TB corpus becomes a training mix, and at that
scale it must be DETERMINISTIC — a rerun (or a re-executed failed task)
must pick the SAME rows, or downstream dedup/eval-contamination guarantees
evaporate.  Every operator here therefore derives its randomness from an
md5 hash of the row key, never from ``rand()``:

* same input -> same sample, on any cluster size, any retry, any engine
  (the oracle runs the identical arithmetic in DuckDB);
* sampling becomes a pure projection — it composes with scans and runs
  shuffle-free (except where an exact per-stratum quota genuinely needs a
  per-stratum ranking).

The hash is the same 28-bit md5 prefix used by the MinHash family
(``operators/dedup.py``): uniform enough for rate control, cheap, and
expressible identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xmlstreamprocessor_spark.operators.registry import query, t

# 28-bit uniform hash of the doc key, 0..999 rate domain — Spark and DuckDB
# spellings of the SAME arithmetic
_MOD = 1000


def _hash_bucket(key_col):
    """0..999 bucket from an md5 prefix of the (stringified) key."""
    return (
        F.conv(F.substring(F.md5(key_col.cast("string").cast("binary")), 1, 7), 16, 10)
        .cast("bigint")
        % _MOD
    )


def _duck_bucket(key_sql: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 7)) AS BIGINT) "
        f"% {_MOD}"
    )


@query(
    "sample_deterministic_rate",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_duck_bucket('doc_id')} < 100
    """,
)
def sample_deterministic_rate(spark, sf_dir):
    """10% uniform sample as a pure hash predicate (bucket < 100 of 1000).
    Scale: zero shuffles, zero state — the predicate evaluates inside the
    scan stage, every task independently, and a re-executed task selects
    the identical rows.  ``TABLESAMPLE``/``rand()`` give neither property."""
    d = t(spark, sf_dir, "documents")
    return d.filter(_hash_bucket(F.col("doc_id")) < 100).select(
        "doc_id", "lang", "source"
    )


@query(
    "sample_stratified_quota",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang, source
               ORDER BY {_duck_bucket('doc_id')}, doc_id) AS rk
      FROM documents
    )
    SELECT doc_id, lang, source FROM ranked WHERE rk <= 50
    """,
)
def sample_stratified_quota(spark, sf_dir):
    """EXACTLY 50 docs per (lang, source) stratum: rank by hash inside each
    stratum, keep the first 50.  Hash-ordering makes the quota sample
    uniform AND reproducible; doc_id breaks hash ties deterministically.
    Scale: one shuffle on the stratum key; per-group state during the rank
    is a single counter.  If one stratum dominates the corpus (skew), cap
    it first with the rate filter above — quota ranking only needs to see
    rows that could possibly rank <= N."""
    d = t(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("lang", "source").orderBy(
        _hash_bucket(F.col("doc_id")).asc(), F.col("doc_id").asc()
    )
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 50)
        .select("doc_id", "lang", "source")
    )


@query(
    "sample_train_val_split",
    oracle=f"""
    WITH assigned AS (
      SELECT lang,
             CASE WHEN {_duck_bucket('doc_id')} < 850 THEN 'train'
                  WHEN {_duck_bucket('doc_id')} < 925 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT lang, split, count(*) AS n_docs
    FROM assigned GROUP BY lang, split
    ORDER BY lang, split
    """,
)
def sample_train_val_split(spark, sf_dir):
    """85/7.5/7.5 train/val/test assignment by hash band, reported as
    per-language counts.  Membership is a property of the ROW, not of the
    run: adding new data later cannot move an old document between splits,
    which is the eval-contamination guarantee a pipeline actually needs.
    Scale: assignment is a projection; only the audit count shuffles."""
    d = t(spark, sf_dir, "documents")
    b = _hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < 850, "train").when(b < 925, "val").otherwise("test")
    )
    return (
        d.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "split")
    )
