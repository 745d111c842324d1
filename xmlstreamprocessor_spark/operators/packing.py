"""Sequence packing and corpus mixing for LLM training pipelines.

Pretraining consumes documents as fixed-length token windows: the corpus is
(logically) concatenated in a canonical order and split every ``cap``
tokens.  The *packing plan* assigns each document to the window containing
its first token — a pure function of the running token-offset prefix sum,
so it is deterministic and re-runnable (same plan on any cluster size or
task retry).

Scale posture: a naive global cumulative sum is a single-task window at
100 TB.  The implementation uses the classic two-level distributed prefix
sum instead — an intra-shard cumulative window (parallel across shards) +
a tiny shard-offset table that is cumulated on one ~n_shards-row dataset
and broadcast back.  No stage touches more than one shard's rows at a
time, and the only all-to-all movement is the hash aggregation of the
final per-chunk rollup.

Corpus mixing uses the same md5-hash-predicate determinism as
``operators/sampling.py``: per-language sampling rates become pure scan
predicates — zero shuffles, identical row picks on every rerun and engine.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from xmlstreamprocessor_spark.operators.registry import query, t

# token-count proxy shared with textops.text_token_count_bpe (same regex)
_TOK_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_DUCK_TOKENS = (
    f"CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))"
    f" AS BIGINT)"
)

_CAP = 2048  # tokens per packed window
_SHARD = 100  # docs per prefix-sum shard


@query(
    "pack_sequences_plan",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKENS} AS n_tokens FROM documents
    ), offs AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS start_off
      FROM toks
    )
    SELECT CAST(floor(COALESCE(start_off, 0) / {_CAP}) AS BIGINT) AS chunk_id,
           count(*)                 AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           min(doc_id)              AS first_doc,
           max(doc_id)              AS last_doc
    FROM offs
    GROUP BY 1
    ORDER BY chunk_id
    """,
)
def pack_sequences_plan(spark, sf_dir):
    """Concatenate-and-split packing plan: documents in doc_id order are
    laid end to end and cut every {cap} tokens; each doc belongs to the
    window holding its first token.  The token offset is a two-level
    distributed prefix sum (see module docstring), not a global window."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_TOK_RE)).cast("bigint").alias("n_tokens"),
        (F.col("doc_id") / _SHARD).cast("bigint").alias("shard"),
    )
    # level 1: cumulative sum inside each shard (parallel across shards)
    w_in = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = d.withColumn("local_off", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)))
    # level 2: shard totals -> exclusive prefix over the tiny shard table
    w_sh = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    shard_offs = (
        d.groupBy("shard")
        .agg(F.sum("n_tokens").alias("shard_tokens"))
        .withColumn(
            "shard_off", F.coalesce(F.sum("shard_tokens").over(w_sh), F.lit(0))
        )
        .select("shard", "shard_off")
    )
    return (
        local.join(F.broadcast(shard_offs), "shard")
        .withColumn(
            "chunk_id",
            ((F.col("shard_off") + F.col("local_off")) / _CAP).cast("bigint"),
        )
        .groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("chunk_id")
    )


# per-language keep rates out of 1000 (an "en-heavy rebalance" mix spec)
_MIX_RATES = {"en": 1000, "de": 500, "fr": 500, "es": 250, "zh": 250}
_DEFAULT_RATE = 100

_DUCK_RATE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_RATES.items())
    + f" ELSE {_DEFAULT_RATE} END"
)
_DUCK_MIX_BUCKET = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000"
)


@query(
    "mix_weighted_corpus",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_DUCK_MIX_BUCKET} < ({_DUCK_RATE})
    ORDER BY doc_id
    """,
)
def mix_weighted_corpus(spark, sf_dir):
    """Language-rebalanced training mix: each language is down-sampled at
    its own deterministic hash rate (en keeps all, zh keeps 25%, unknown
    languages 10%).  Scale: the rate lookup is a broadcast-free CASE inside
    the scan predicate — the mix is a pure projection with zero shuffles,
    and a re-executed task re-picks identical rows."""
    d = t(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 7),
            16,
            10,
        ).cast("bigint")
        % 1000
    )
    rate = F.lit(_DEFAULT_RATE)
    for k, v in reversed(_MIX_RATES.items()):
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    return (
        d.filter(bucket < rate).select("doc_id", "lang", "source").orderBy("doc_id")
    )


@query(
    "mix_weighted_proportions",
    oracle=f"""
    WITH mixed AS (
      SELECT doc_id, lang FROM documents
      WHERE {_DUCK_MIX_BUCKET} < ({_DUCK_RATE})
    ), base AS (
      SELECT lang, count(*) AS n_before FROM documents GROUP BY lang
    )
    SELECT b.lang, b.n_before, count(m.doc_id) AS n_after,
           round(CAST(count(m.doc_id) AS DOUBLE) / b.n_before, 6) AS keep_ratio
    FROM base b LEFT JOIN mixed m ON m.lang = b.lang
    GROUP BY b.lang, b.n_before
    ORDER BY b.lang
    """,
)
def mix_weighted_proportions(spark, sf_dir):
    """Before/after language histogram of the weighted mix — the report a
    data engineer checks before launching a run.  Both sides are map-side
    partial aggregates on a handful of language keys."""
    d = t(spark, sf_dir, "documents")
    mixed = mix_weighted_corpus(spark, sf_dir)
    base = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_before"))
    after = mixed.groupBy("lang").agg(F.count(F.lit(1)).alias("n_after_raw"))
    return (
        base.join(after, "lang", "left")
        .select(
            "lang",
            "n_before",
            F.coalesce(F.col("n_after_raw"), F.lit(0)).alias("n_after"),
            F.round(
                F.coalesce(F.col("n_after_raw"), F.lit(0)).cast("double")
                / F.col("n_before"),
                6,
            ).alias("keep_ratio"),
        )
        .orderBy("lang")
    )


@query(
    "pipeline_dedup_mix_pack",
    oracle=f"""
    WITH keep AS (
      SELECT min(doc_id) AS doc_id
      FROM documents
      GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
    ), mixed AS (
      SELECT d.doc_id, d.lang, {_DUCK_TOKENS} AS n_tokens
      FROM documents d JOIN keep k ON k.doc_id = d.doc_id
      WHERE {_DUCK_MIX_BUCKET.replace("doc_id", "d.doc_id")}
            < ({_DUCK_RATE.replace("lang", "d.lang")})
    ), offs AS (
      SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS start_off
      FROM mixed
    )
    SELECT CAST(floor(COALESCE(start_off, 0) / {_CAP}) AS BIGINT) AS chunk_id,
           count(*)                        AS n_docs,
           CAST(sum(n_tokens) AS BIGINT)   AS total_tokens,
           count(DISTINCT lang)            AS n_langs,
           min(doc_id)                     AS first_doc,
           max(doc_id)                     AS last_doc
    FROM offs
    GROUP BY 1
    ORDER BY chunk_id
    """,
)
def pipeline_dedup_mix_pack(spark, sf_dir):
    """The full training-data pipeline as ONE declarative plan:
    exact-dedup (normalized-text fingerprint, keep min doc_id) -> weighted
    language mix (hash-rate predicate) -> sequence packing (two-level
    distributed prefix sum) -> per-chunk manifest.  Because every stage is
    a DataFrame transformation, the mix predicate and token projection fuse
    into the main scan's stage; the corpus is scanned twice (once to build
    the fingerprint keeper set, once for the kept rows) and only doc_id
    survives the first scan.  Scale: two data shuffles total (fingerprint
    groupBy + the keeper semi join) before the tiny shard-offset and chunk
    rollups; nothing quadratic, nothing on the driver."""
    d = t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    keep = (
        d.select("doc_id", F.md5(norm.cast("binary")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 7),
            16,
            10,
        ).cast("bigint")
        % 1000
    )
    rate = F.lit(_DEFAULT_RATE)
    for k, v in reversed(_MIX_RATES.items()):
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    mixed = (
        d.join(keep, "doc_id", "left_semi")
        .filter(bucket < rate)
        .select(
            "doc_id",
            "lang",
            F.regexp_count(F.col("text"), F.lit(_TOK_RE))
            .cast("bigint")
            .alias("n_tokens"),
            (F.col("doc_id") / _SHARD).cast("bigint").alias("shard"),
        )
    )
    w_in = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = mixed.withColumn(
        "local_off", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
    )
    w_sh = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    shard_offs = (
        mixed.groupBy("shard")
        .agg(F.sum("n_tokens").alias("shard_tokens"))
        .withColumn(
            "shard_off", F.coalesce(F.sum("shard_tokens").over(w_sh), F.lit(0))
        )
        .select("shard", "shard_off")
    )
    return (
        local.join(F.broadcast(shard_offs), "shard")
        .withColumn(
            "chunk_id",
            F.floor((F.col("shard_off") + F.col("local_off")) / _CAP).cast("bigint"),
        )
        .groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("chunk_id")
    )


@query(
    "pack_greedy_shardlocal",
    oracle=f"""
    WITH RECURSIVE docs AS (
      SELECT shard, doc_id, n_tokens,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      FROM (SELECT CAST(floor(doc_id / {_SHARD}) AS BIGINT) AS shard, doc_id,
                   {_DUCK_TOKENS} AS n_tokens
            FROM documents)
    ), walk AS (
      SELECT shard, doc_id, n_tokens, rn,
             CAST(0 AS BIGINT) AS chunk_seq,
             CAST(0 AS BIGINT) AS offset_in_chunk,
             n_tokens AS used
      FROM docs WHERE rn = 1
      UNION ALL
      SELECT d.shard, d.doc_id, d.n_tokens, d.rn,
             CASE WHEN w.used > 0 AND w.used + d.n_tokens > {_CAP}
                  THEN w.chunk_seq + 1 ELSE w.chunk_seq END,
             CASE WHEN w.used > 0 AND w.used + d.n_tokens > {_CAP}
                  THEN CAST(0 AS BIGINT) ELSE w.used END,
             CASE WHEN w.used > 0 AND w.used + d.n_tokens > {_CAP}
                  THEN d.n_tokens ELSE w.used + d.n_tokens END
      FROM docs d JOIN walk w ON d.shard = w.shard AND d.rn = w.rn + 1
    )
    SELECT shard, doc_id, n_tokens, chunk_seq, offset_in_chunk
    FROM walk ORDER BY shard, doc_id
    """,
)
def pack_greedy_shardlocal(spark, sf_dir):
    """Capacity-respecting greedy packer (the strict-bin variant of
    ``pack_sequences_plan``): per shard, a document that would overflow the
    open chunk seals it and starts the next, so no chunk exceeds the cap
    unless a single document does.  The recurrence is inherently
    sequential, so it runs as an Arrow-batched grouped-map kernel — one
    pass per shard, O(1) state, parallel across shards (the oracle proves
    the same recurrence via a recursive CTE).  This is also exactly the
    kernel the streaming packer carries across micro-batches
    (``streaming/packer.py``)."""
    from xmlstreamprocessor_spark.streaming.packer import pack_batch_greedy

    d = t(spark, sf_dir, "documents").select(
        F.floor(F.col("doc_id") / _SHARD).cast("bigint").alias("shard"),
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_TOK_RE)).cast("bigint").alias("n_tokens"),
    )
    return pack_batch_greedy(d, cap=_CAP).orderBy("shard", "doc_id")


# token budget per source for the quality-ranked selection query
_BUDGET = 800


@query(
    "mix_token_budget_by_quality",
    oracle=f"""
    WITH s AS (
      SELECT source, doc_id,
             {_DUCK_TOKENS} AS n_tokens,
             len(string_split_regex(trim(text), '\\s+')) AS n_words,
             round(CAST(n_chars AS DOUBLE)
                   / len(string_split_regex(trim(text), '\\s+')), 6) AS awl,
             length(text) - length(replace(text, '.', '')) AS n_periods
      FROM documents
    ), scored AS (
      SELECT source, doc_id, n_tokens,
             round(least(n_words, 500) + 20 * least(n_periods, 10)
                   - round(abs(awl - 6.0) * 8, 6), 6) AS score
      FROM s
    ), c AS (
      SELECT source, doc_id, score, n_tokens,
             CAST(COALESCE(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY score DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS tokens_before
      FROM scored
    )
    SELECT source, doc_id, score, n_tokens, tokens_before
    FROM c WHERE tokens_before < {_BUDGET}
    ORDER BY source, score DESC, doc_id
    """,
)
def mix_token_budget_by_quality(spark, sf_dir):
    """Quality-ranked token-budget selection: per source, take the
    best-scoring documents until the ``_BUDGET``-token budget fills — the
    "fill an N-billion-token training mix with the best of each source"
    operation.  The score is a deterministic C4-style heuristic (word
    count capped at 500, sentence-period credit, penalty for mean word
    length far from 6) computed as pure scan-stage expressions; selection
    takes every document whose cumulative predecessor tokens (within its
    source, score-descending, doc_id tiebreak) are under budget, so the
    cut is at document granularity and overshoots by at most one document
    — deterministic and re-runnable on any cluster size.

    Scale: ONE shuffle, the per-source window sort.  Source cardinality
    is small but per-source partitions are corpus-sized at 100 TB; the
    production variant first finds each source's score threshold with a
    two-level pass (per-shard (score-bucket -> token-sum) histograms,
    broadcast-merged into an approximate cutoff, exact tie-resolution on
    the boundary bucket only — the same shape as pack_sequences_plan's
    two-level prefix sum), then selects with a scan predicate.  The
    windowed form here IS the boundary-bucket kernel of that plan."""
    d = t(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.col("text")), r"\s+")
    n_words = F.size(ws)
    awl = F.round(F.col("n_chars").cast("double") / n_words, 6)
    n_periods = F.length("text") - F.length(F.regexp_replace("text", r"\.", ""))
    scored = d.select(
        "source",
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_TOK_RE)).cast("bigint").alias("n_tokens"),
        F.round(
            F.least(n_words, F.lit(500)).cast("double")
            + 20 * F.least(n_periods, F.lit(10))
            - F.round(F.abs(awl - 6.0) * 8, 6),
            6,
        ).alias("score"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("score").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        scored.withColumn(
            "tokens_before",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint"),
        )
        .filter(F.col("tokens_before") < _BUDGET)
        .orderBy("source", F.col("score").desc(), "doc_id")
    )


@query(
    "pipeline_chunk_pack",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
      FROM documents
    ), chunks AS (
      SELECT doc_id, CAST(s / 48 AS BIGINT) AS chunk_idx,
             CAST(least(len(w) - s, 64) AS BIGINT) AS n_words
      FROM (
        SELECT doc_id, w, unnest(generate_series(0, len(w) - 1, 48)) AS s
        FROM ws
      )
    ), offs AS (
      SELECT doc_id, chunk_idx, n_words,
             sum(n_words) OVER (ORDER BY doc_id, chunk_idx
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS start_off
      FROM chunks
    )
    SELECT CAST(floor(COALESCE(start_off, 0) / {_CAP}) AS BIGINT) AS bin_id,
           count(*) AS n_chunks,
           CAST(sum(n_words) AS BIGINT) AS total_words,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM offs
    GROUP BY 1
    ORDER BY bin_id
    """,
)
def pipeline_chunk_pack(spark, sf_dir):
    """Chunk -> pack composed as ONE declarative plan: the sliding-window
    chunks (``text_chunk_sliding_window``'s 64/48 windows) laid end to end
    in (doc, chunk) order and cut at every 2048-token boundary — the sample
    table a trainer actually reads, produced without materializing the
    intermediate chunk table.

    Scale: chunking is shuffle-free per-row compute; the token offset
    reuses the two-level distributed prefix sum from
    ``pack_sequences_plan`` (per-shard window in parallel, then an
    exclusive prefix over the tiny shard-totals table) — the lone
    unpartitioned window runs on ~n_docs/100 rows, never the chunk
    stream."""
    d = t(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), r"\s+")
    chunks = (
        d.select("doc_id", w.alias("w"), F.size(w).alias("n"))
        .select(
            "doc_id",
            "n",
            F.explode(F.sequence(F.lit(0), F.col("n") - 1, F.lit(48))).alias(
                "s"
            ),
        )
        .select(
            "doc_id",
            (F.col("s") / 48).cast("bigint").alias("chunk_idx"),
            F.least(F.col("n") - F.col("s"), F.lit(64))
            .cast("bigint")
            .alias("n_words"),
            (F.col("doc_id") / _SHARD).cast("bigint").alias("shard"),
        )
    )
    w_in = (
        Window.partitionBy("shard")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = chunks.withColumn(
        "local_off", F.coalesce(F.sum("n_words").over(w_in), F.lit(0))
    )
    totals = chunks.groupBy("shard").agg(F.sum("n_words").alias("shard_total"))
    w_sh = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    bases = totals.withColumn(
        "base", F.coalesce(F.sum("shard_total").over(w_sh), F.lit(0))
    ).select("shard", "base")
    offs = local.join(F.broadcast(bases), "shard").withColumn(
        "start_off", F.col("base") + F.col("local_off")
    )
    return (
        offs.withColumn(
            "bin_id", F.floor(F.col("start_off") / _CAP).cast("bigint")
        )
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_words").cast("bigint").alias("total_words"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("bin_id")
    )


def _install_pack_efficiency_query() -> None:
    from xmlstreamprocessor_spark.operators.registry import REGISTRY

    plan_sql = REGISTRY["pack_sequences_plan"][1]
    oracle = f"""
    WITH bins AS ({plan_sql})
    SELECT CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum(total_tokens) AS BIGINT) AS total_tokens,
           CAST(count(*) * {_CAP} AS BIGINT) AS capacity_tokens,
           round(CAST(sum(total_tokens) AS DOUBLE) / (count(*) * {_CAP}), 6)
             AS fill_ratio,
           CAST(sum(n_docs) AS BIGINT) AS n_docs
    FROM bins
    """

    @query("pack_efficiency_report", oracle=oracle)
    def pack_efficiency_report(spark, sf_dir):
        """THE packing metric: fill ratio of the concat-and-split plan —
        the fraction of trainer window capacity holding real tokens
        (1 - fill_ratio is pure padding waste, i.e. wasted FLOPs at
        training time).  Concat-and-split fills every bin except the last
        by construction, so a low ratio here means the corpus simply ran
        out mid-window; the greedy document-boundary packer trades some
        fill for intact documents.  Scale: a 1-row reduce over the
        prefix-sum plan."""
        bins = pack_sequences_plan(spark, sf_dir)
        return bins.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bins"),
            F.sum("total_tokens").cast("bigint").alias("total_tokens"),
            (F.count(F.lit(1)) * _CAP).cast("bigint").alias("capacity_tokens"),
            F.round(
                F.sum("total_tokens").cast("double")
                / (F.count(F.lit(1)) * _CAP),
                6,
            ).alias("fill_ratio"),
            F.sum("n_docs").cast("bigint").alias("n_docs"),
        )


_install_pack_efficiency_query()
