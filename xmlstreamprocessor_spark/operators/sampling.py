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


# token-count proxy shared with packing.py / textops.text_token_count_bpe
_DUCK_TOKENS = (
    "CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))"
    " AS BIGINT)"
)
_TOK_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@query(
    "mix_temperature_rates",
    oracle=f"""
    WITH per_lang AS (
      SELECT lang, count(*) AS n_docs,
             CAST(sum({_DUCK_TOKENS}) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ), tot AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             CAST(max(n_tokens) AS BIGINT) AS max_tokens
      FROM per_lang
    )
    SELECT p.lang, p.n_docs, p.n_tokens,
           round(CAST(p.n_tokens AS DOUBLE) / t.total_tokens, 6) AS mass_frac,
           round(sqrt(CAST(p.n_tokens AS DOUBLE) / t.max_tokens)
                 * t.max_tokens / p.n_tokens, 6) AS sample_factor
    FROM per_lang p CROSS JOIN tot t
    ORDER BY p.lang
    """,
)
def mix_temperature_rates(spark, sf_dir):
    """Temperature-scaled multilingual sampling plan (alpha = 0.5, the
    XLM-R / mT5 convention): per-language token mass p_l is re-shaped to
    q_l ~ p_l^alpha, flattening the head languages so low-resource ones
    are not drowned.  ``sample_factor`` is the per-language replication
    factor relative to the largest language (whose factor is exactly 1.0):
    resampling language l by that factor yields token mass ~ t_l^alpha.

    Exactness across engines: token counts aggregate as BIGINTs (exact on
    any partitioning), and the factor is computed per-row from two exact
    integers via divide -> sqrt -> multiply -> divide — IEEE-754 sqrt is
    correctly rounded in both engines (unlike pow, which is only 1-ulp on
    the JVM), so the doubles match bit-for-bit before the cosmetic round.
    Scale: one map-side-combinable groupBy on a handful of language keys,
    then a broadcast of the 1-row totals — no data-sized shuffle."""
    d = t(spark, sf_dir, "documents")
    per_lang = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.regexp_extract_all(F.col("text"), F.lit(_TOK_RE), 0)))
        .cast("bigint")
        .alias("n_tokens"),
    )
    tot = per_lang.agg(
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.max("n_tokens").cast("bigint").alias("max_tokens"),
    )
    return (
        per_lang.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens").cast("double") / F.col("total_tokens"), 6)
            .alias("mass_frac"),
            F.round(
                F.sqrt(F.col("n_tokens").cast("double") / F.col("max_tokens"))
                * F.col("max_tokens")
                / F.col("n_tokens"),
                6,
            ).alias("sample_factor"),
        )
        .orderBy("lang")
    )


_N_SHARDS = 16


@query(
    "shuffle_deterministic_order",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang,
             md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
             {_duck_bucket('doc_id')} % {_N_SHARDS} AS shard_id
      FROM documents
    )
    SELECT doc_id, lang, shard_id,
           row_number() OVER (PARTITION BY shard_id
                              ORDER BY shuffle_key, doc_id) AS pos_in_shard
    FROM keyed
    ORDER BY shard_id, pos_in_shard
    """,
)
def shuffle_deterministic_order(spark, sf_dir):
    """Deterministic global training-order shuffle: every document gets a
    (shard_id, pos_in_shard) address derived purely from md5(doc_id), so
    the epoch-0 data order is reproducible across reruns, engines, and
    cluster sizes — a ``rand()`` shuffle gives a different epoch on every
    retry, which silently changes the training run.

    Scale: this is the shape real dataloader shuffles use — NO total-order
    sort (a global sort range-partitions the whole corpus through one
    barrier).  Rows hash into {_N_SHARDS} independent shards (raise to
    O(cluster cores) at scale) and each shard sorts locally by the hash
    key; the only shuffle is the hash partitioning, and shard sorts run
    fully in parallel.  Readers stream shards in id order, positions in
    order — equivalent to a uniform shuffle of the corpus."""
    d = t(spark, sf_dir, "documents")
    from pyspark.sql import Window

    keyed = d.select(
        "doc_id",
        "lang",
        F.md5(F.col("doc_id").cast("string").cast("binary")).alias("shuffle_key"),
        (_hash_bucket(F.col("doc_id")) % _N_SHARDS).alias("shard_id"),
    )
    w = Window.partitionBy("shard_id").orderBy("shuffle_key", "doc_id")
    return (
        keyed.withColumn("pos_in_shard", F.row_number().over(w).cast("bigint"))
        # no final orderBy: the driver compare is order-insensitive, and a
        # cosmetic global sort would add exactly the range-partition
        # barrier this operator exists to avoid
        .select("doc_id", "lang", "shard_id", "pos_in_shard")
    )


def _install_epoch_plan_query() -> None:
    """Composes mix_temperature_rates' oracle verbatim as a CTE."""
    from xmlstreamprocessor_spark.operators.registry import REGISTRY

    rates_sql = REGISTRY["mix_temperature_rates"][1]
    oracle = f"""
    WITH rates AS ({rates_sql})
    SELECT lang, n_tokens, sample_factor,
           CAST(round(sample_factor * 1000) AS BIGINT) // 1000
             AS full_epochs,
           CAST(round(sample_factor * 1000) AS BIGINT) % 1000
             AS tail_rate_per_mille
    FROM rates
    ORDER BY lang
    """

    @query("mix_epoch_plan", oracle=oracle)
    def mix_epoch_plan(spark, sf_dir):
        """Realize the temperature-sampling factors as an executable
        schedule: factor 2.35 means 2 FULL passes over the language plus
        a 35% deterministic hash-rate pass (bucket < 350 of 1000) — the
        per-language epoch plan a dataloader actually runs.  Both fields
        derive from one rounded integer (round(factor * 1000)), so the
        decomposition cannot disagree between engines even when the
        factor's binary representation sits just under a boundary.

        Scale: a 5-row projection over the temperature-rates aggregate."""
        rates = mix_temperature_rates(spark, sf_dir)
        mille = F.round(F.col("sample_factor") * 1000, 0).cast("bigint")
        return rates.select(
            "lang",
            "n_tokens",
            "sample_factor",
            F.floor(mille / 1000).cast("bigint").alias("full_epochs"),
            (mille % 1000).alias("tail_rate_per_mille"),
        ).orderBy("lang")


_install_epoch_plan_query()


@query(
    "mix_soft_dedup_weights",
    oracle="""
    SELECT doc_id,
           md5(text) AS content_hash,
           CAST(count(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS n_copies,
           round(1.0 / count(*) OVER (PARTITION BY md5(text)), 6) AS weight
    FROM documents
    ORDER BY doc_id
    """,
)
def mix_soft_dedup_weights(spark, sf_dir):
    """Soft dedup for loss weighting: instead of DROPPING exact duplicates,
    keep every copy and weight it 1/n_copies, so each distinct content
    contributes unit mass to training — the gentler alternative when near
    the data wall (duplicate counts carry signal you may not want to
    discard).

    Scale: one shuffle on the content hash (the same key exact dedup
    shuffles on); the count window's per-group state is a single counter.
    No join back — window beats groupBy+join here because the group table
    (distinct texts) is corpus-sized and could never broadcast."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("content_hash")
    return (
        d.select(
            "doc_id", F.md5(F.col("text").cast("binary")).alias("content_hash")
        )
        .withColumn("n_copies", F.count(F.lit(1)).over(w).cast("bigint"))
        .withColumn(
            "weight", F.round(F.lit(1.0) / F.col("n_copies").cast("double"), 6)
        )
        .orderBy("doc_id")
    )


def _install_leakage_free_split() -> None:
    from xmlstreamprocessor_spark.operators.graph import (
        _DUCK_CC_DUP_GROUPS as _CC_SQL,
    )

    @query(
        "sample_leakage_free_split",
        oracle=f"""
        WITH comp AS ({_CC_SQL}
        ), keyed AS (
          SELECT d.doc_id, d.lang,
                 COALESCE(c.component, d.doc_id) AS group_key
          FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
        ), assigned AS (
          SELECT lang, group_key,
                 CASE WHEN {_duck_bucket('group_key')} < 850 THEN 'train'
                      WHEN {_duck_bucket('group_key')} < 925 THEN 'val'
                      ELSE 'test' END AS split
          FROM keyed
        )
        SELECT lang, split, count(*) AS n_docs,
               CAST(count(DISTINCT group_key) AS BIGINT) AS n_groups
        FROM assigned GROUP BY lang, split
        ORDER BY lang, split
        """,
    )
    def sample_leakage_free_split(spark, sf_dir):
        """LEAKAGE-FREE train/val/test split: hash-band assignment keyed by
        the NEAR-DUP GROUP (connected components over the >=0.5 exact-
        Jaccard pair graph; singletons key by their own id), so every
        member of a dup group lands in the SAME split.  The plain
        per-document split (sample_train_val_split) silently places near-
        copies of one document on both sides of the train/eval boundary —
        the eval simply memorizes training data; group-keyed assignment is
        the split a curation pipeline must actually run after dedup
        analysis.  Membership stays a property of the row's group, so
        later data additions never move an existing group between splits.

        Scale: the group table is dup-docs sized (small by construction)
        and its join back to the corpus broadcasts; assignment is a
        projection; only the audit count shuffles.  The heavy lifting is
        the pair+CC chain this REUSES (memoized in-session, cost-based,
        never postings^2)."""
        from xmlstreamprocessor_spark.operators.graph import (
            graph_components_dup_groups,
        )

        comp = graph_components_dup_groups(spark, sf_dir).select(
            "doc_id", "component"
        )
        d = t(spark, sf_dir, "documents")
        keyed = d.join(comp, "doc_id", "left").select(
            "lang",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("group_key"),
        )
        b = _hash_bucket(F.col("group_key"))
        split = F.when(b < 850, "train").when(b < 925, "val").otherwise("test")
        return (
            keyed.select("lang", "group_key", split.alias("split"))
            .groupBy("lang", "split")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.countDistinct("group_key").cast("bigint").alias("n_groups"),
            )
            .orderBy("lang", "split")
        )


_install_leakage_free_split()
