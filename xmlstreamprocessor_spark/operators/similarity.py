"""Similarity search over embedding columns (array<float>).

* brute-force top-k: the exactness baseline — broadcast the (small) query
  set, compute cosine JVM-side, rank with a window.  Scales linearly in the
  corpus: the corpus never shuffles, only the per-query top-k heap does.
* IVF top-k: the scale path — restrict search to the query's coarse cell
  (here the precomputed ``label`` column stands in for the k-means cell id),
  turning the cross product into an equi-join on the cell key.

No Python UDFs anywhere: dot products are zip_with/aggregate expressions
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from xmlstreamprocessor_spark.functions.vectors import (
    as_double_array,
    cosine6,
    duck_cosine6,
)
from xmlstreamprocessor_spark.operators.registry import query, t

_N_QUERIES = 10  # vec_id < 10 are the query vectors
_TOP_K = 10


@query(
    "similarity_topk_bruteforce",
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {duck_cosine6('q.embedding', 'c.embedding')} AS cos_sim
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {_N_QUERIES}
    ), ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rnk FROM ranked WHERE rnk <= {_TOP_K}
    """,
)
def similarity_topk_bruteforce(spark, sf_dir):
    """Exact cosine top-10 for each query vector (vec_id < 10).  Ranking is
    on the 6-decimal-rounded score with neighbor_id tiebreak, so the result
    is fully deterministic and engine-independent."""
    e = t(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("query_id"), as_double_array("embedding").alias("qe")
        )
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"), as_double_array("embedding").alias("ce")
    )
    scored = q.join(c, F.col("query_id") != F.col("neighbor_id")).select(
        "query_id", "neighbor_id", cosine6(F.col("qe"), F.col("ce")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


@query(
    "similarity_topk_ivf",
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {duck_cosine6('q.embedding', 'c.embedding')} AS cos_sim
      FROM embeddings q
      JOIN embeddings c ON q.label = c.label AND q.vec_id <> c.vec_id
      WHERE q.vec_id < {_N_QUERIES}
    ), ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rnk FROM ranked WHERE rnk <= {_TOP_K}
    """,
)
def similarity_topk_ivf(spark, sf_dir):
    """IVF-style ANN: search only the query's coarse cell (label column as
    the quantizer cell id).  The cross product becomes an equi-join on the
    cell key — at 100 TB this is the difference between O(N*Q) and
    O(N*Q/cells) with a key-partitioned shuffle."""
    e = t(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("qlabel"),
            as_double_array("embedding").alias("qe"),
        )
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("clabel"),
        as_double_array("embedding").alias("ce"),
    )
    scored = q.join(
        c,
        (F.col("qlabel") == F.col("clabel"))
        & (F.col("query_id") != F.col("neighbor_id")),
    ).select(
        "query_id", "neighbor_id", cosine6(F.col("qe"), F.col("ce")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


@query(
    "similarity_centroid_per_label",
    oracle="""
    WITH e AS (
      SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    )
    SELECT label, CAST(pos AS INTEGER) AS pos,
           round(sum(v) / count(*), 6) AS centroid_v
    FROM e GROUP BY label, pos
    """,
)
def similarity_centroid_per_label(spark, sf_dir):
    """Per-cell centroids (the training half of IVF): posexplode + groupBy —
    a single shuffle keyed by (cell, dimension).
    Note: sum(double) here is order-dependent in theory; at 64 dims x
    ~100 values per cell the 6-decimal rounding absorbs it (verified
    against the oracle on the deterministic dataset)."""
    e = t(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode(as_double_array("embedding")).alias("pos0", "v")
    )
    return (
        ex.groupBy("label", (F.col("pos0") + 1).cast("int").alias("pos"))
        .agg(F.round(F.sum("v") / F.count(F.lit(1)), 6).alias("centroid_v"))
    )
