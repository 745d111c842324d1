"""Fluent, DataFrame-level composition of the training-data operators.

The registry queries (``operators/``) are the *verified* forms — each
bound to the benchmark tables and hash-checked against the DuckDB oracle.
This module is the *user-facing* form: the same kernels as chainable steps
over ANY documents DataFrame, so a pipeline reads as its recipe::

    from xmlstreamprocessor_spark.pipeline import CorpusPipeline

    out = (
        CorpusPipeline(docs)                  # any df with doc_id + text
        .dedup_exact()                        # normalized-hash groups
        .dedup_near(threshold=0.5)            # Jaccard pairs -> CC -> keepers
        .decontaminate(eval_docs, n=4)        # n-gram leakage vs an eval set
        .mix_by_rate({"en": 700, "de": 400})  # deterministic hash mixing
        .chunk(window=64, stride=48)          # trainer windows
        .df                                   # -> chunk-level DataFrame
    )

Every step is deterministic (hash-derived randomness only), shuffles no
more than the audited registry twin, and returns a NEW pipeline — the
input frame is never mutated.  Steps delegate to the exact kernels the
oracle-checked queries run (``operators/dedup``, ``functions/text``), so
composition can't drift from the verified semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_MOD = 1000  # hash-rate domain shared with operators/sampling.py


def _bucket(key_col, salt: str = ""):
    key = F.concat(F.lit(salt), key_col.cast("string")) if salt else key_col.cast(
        "string"
    )
    return (
        F.conv(F.substring(F.md5(key.cast("binary")), 1, 7), 16, 10).cast("bigint")
        % _MOD
    )


class CorpusPipeline:
    """Immutable fluent wrapper; ``.df`` yields the current DataFrame."""

    def __init__(self, docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text"):
        for c in (id_col, text_col):
            if c not in docs.columns:
                raise ValueError(f"documents frame lacks required column {c!r}")
        self._docs = docs
        self._id = id_col
        self._text = text_col

    # -- plumbing ---------------------------------------------------------

    @property
    def df(self) -> DataFrame:
        return self._docs

    def _next(self, docs: DataFrame) -> "CorpusPipeline":
        return CorpusPipeline(docs, self._id, self._text)

    # -- dedup ------------------------------------------------------------

    def dedup_exact(self) -> "CorpusPipeline":
        """Keep one document per normalized-content hash (lower +
        whitespace collapse + md5; min id wins).  One hash shuffle."""
        norm = F.regexp_replace(
            F.lower(F.trim(F.col(self._text))), r"\s+", " "
        )
        w = Window.partitionBy(F.md5(norm.cast("binary"))).orderBy(self._id)
        return self._next(
            self._docs.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )

    def dedup_near(self, threshold: float = 0.5,
                   keeper: str = "min_id") -> "CorpusPipeline":
        """Near-dup removal via the audited exact-Jaccard path: cost-based
        pair generation (direct postings join when provably linear, else
        lossless PPJoin prefix filter), connected components over the
        verified pairs, one keeper per component.

        ``keeper``: ``"min_id"`` (the drop-list convention) or
        ``"richest"`` (keep the longest variant per group — what
        ``dedup_keeper_by_quality`` reports; truncated copies lose the
        least content this way)."""
        from xmlstreamprocessor_spark.operators.dedup import _jaccard_pairs_auto
        from xmlstreamprocessor_spark.operators.graph import connected_components

        if keeper not in ("min_id", "richest"):
            raise ValueError(f"unknown keeper strategy {keeper!r}")
        docs = self._docs
        spark = docs.sparkSession
        renamed = docs.select(
            F.col(self._id).alias("doc_id"), F.col(self._text).alias("text")
        )
        pairs = _jaccard_pairs_auto(spark, sf_dir=None, threshold=threshold,
                                    docs=renamed)
        comp = connected_components(pairs, src="doc_a", dst="doc_b")
        if keeper == "min_id":
            drops = comp.filter(F.col("node") != F.col("component")).select(
                F.col("node").alias(self._id)
            )
        else:
            sized = comp.join(
                renamed.select(
                    F.col("doc_id").alias("node"),
                    F.length("text").alias("_len"),
                ),
                "node",
            )
            w = Window.partitionBy("component").orderBy(
                F.desc("_len"), F.asc("node")
            )
            drops = (
                sized.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") > 1)
                .select(F.col("node").alias(self._id))
            )
        return self._next(self._docs.join(drops, self._id, "left_anti"))

    def drop_contained(self, threshold: float = 0.8) -> "CorpusPipeline":
        """Drop every document whose shingle set is >= ``threshold``
        contained in ANOTHER document (the quote/excerpt/boilerplate-
        wrapper relation Jaccard misses — Broder's containment).  The
        containing documents survive, so content is never lost, only its
        redundant sub-copies.  Delegates to the audited
        ``operators/dedup.containment_pairs`` kernel (one-sided
        rarest-first prefix filter; see it for the scale analysis).

        Mutual containment (docs each >= threshold contained in one
        another, e.g. exact duplicates) would drop the WHOLE group; the
        global min-id member of each mutual-equivalence GROUP survives as
        the keeper.  Group-level, not pair-level: a 3-clique of exact
        duplicates {A, B, C} keeps only A — per-pair min-id logic would
        keep every doc that wins at least one of its pairs ({A, B} here),
        letting duplicates through.  Keepers are resolved by connected
        components over the undirected mutual-pair graph (mutual pairs
        are the rare symmetric slice of the containment output — ~one
        edge per duplicate cluster — so the closure is tiny by
        construction)."""
        from xmlstreamprocessor_spark.operators.dedup import containment_pairs
        from xmlstreamprocessor_spark.operators.graph import connected_components

        renamed = self._docs.select(
            F.col(self._id).alias("doc_id"), F.col(self._text).alias("text")
        )
        pairs = containment_pairs(
            self._docs.sparkSession, sf_dir=None, docs=renamed,
            threshold=threshold,
        )
        # mutual-pair edges (undirected, one row per unordered pair)
        mutual = (
            pairs.alias("p")
            .join(
                pairs.alias("q"),
                (F.col("p.contained_id") == F.col("q.container_id"))
                & (F.col("p.container_id") == F.col("q.contained_id")),
            )
            .filter(F.col("p.contained_id") < F.col("p.container_id"))
            .select(
                F.col("p.contained_id").alias("src"),
                F.col("p.container_id").alias("dst"),
            )
        )
        # component label IS the min reachable id -> keepers are the
        # nodes labelled by themselves
        comp = connected_components(mutual, src="src", dst="dst")
        mutual_keep = comp.filter(F.col("node") == F.col("component")).select(
            F.col("node").alias(self._id)
        )
        drops = (
            pairs.select(F.col("contained_id").alias(self._id))
            .distinct()
            .join(mutual_keep, self._id, "left_anti")
        )
        return self._next(self._docs.join(drops, self._id, "left_anti"))

    def decontaminate(self, eval_docs: DataFrame, n: int = 4) -> "CorpusPipeline":
        """Drop documents sharing any word n-gram with ``eval_docs`` —
        the pre-launch benchmark-leakage filter.  The eval shingle set
        broadcasts; the corpus streams one explode + anti join."""
        from xmlstreamprocessor_spark.functions.text import shingles

        eval_sh = (
            eval_docs.select(
                F.explode(
                    shingles(F.lower(F.col(self._text)), n)
                ).alias("_sh")
            ).distinct()
        )
        contaminated = (
            self._docs.select(
                self._id,
                F.explode(
                    shingles(F.lower(F.col(self._text)), n)
                ).alias("_sh"),
            )
            .join(F.broadcast(eval_sh), "_sh")
            .select(self._id)
            .distinct()
        )
        return self._next(self._docs.join(contaminated, self._id, "left_anti"))

    # -- mixing / splitting ----------------------------------------------

    def mix_by_rate(self, rates: dict[str, int], lang_col: str = "lang",
                    default_rate: int = _MOD) -> "CorpusPipeline":
        """Deterministic per-language downsampling: keep a doc iff its
        md5 bucket (0..999) falls under its language's rate.  A pure
        scan-stage predicate — zero shuffles, identical picks on rerun."""
        rate = F.lit(default_rate)
        for k, v in sorted(rates.items(), reverse=True):
            rate = F.when(F.col(lang_col) == k, F.lit(v)).otherwise(rate)
        return self._next(
            self._docs.filter(_bucket(F.col(self._id), salt="mix|") < rate)
        )

    def split(self, train: int = 850, val: int = 925):
        """Hash-banded train/val/test assignment (out of 1000): returns
        three pipelines.  Membership is a property of the row, so adding
        data later never moves an old document between splits."""
        b = _bucket(F.col(self._id), salt="split|")
        return (
            self._next(self._docs.filter(b < train)),
            self._next(self._docs.filter((b >= train) & (b < val))),
            self._next(self._docs.filter(b >= val)),
        )

    # -- chunking ---------------------------------------------------------

    def chunk(self, window: int = 64, stride: int = 48) -> "CorpusPipeline":
        """Cut each document into overlapping word windows (one row per
        chunk, with ``chunk_idx``/``start_word``/``n_words``/``chunk_md5``
        and the chunk text in the text column).  Shuffle-free."""
        w = F.split(F.trim(F.col(self._text)), r"\s+")
        chunk_words = F.slice(F.col("_w"), F.col("_s") + 1, F.lit(window))
        out = (
            self._docs.withColumn("_w", w)
            .withColumn("_n", F.size("_w"))
            .withColumn(
                "_s",
                F.explode(
                    F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
                ),
            )
            .withColumn("chunk_idx", (F.col("_s") / stride).cast("bigint"))
            .withColumn("start_word", F.col("_s").cast("bigint"))
            .withColumn(
                "n_words",
                F.least(F.col("_n") - F.col("_s"), F.lit(window)).cast("bigint"),
            )
            .withColumn(self._text, F.array_join(chunk_words, " "))
            .withColumn("chunk_md5", F.md5(F.col(self._text).cast("binary")))
            .drop("_w", "_n", "_s")
        )
        return self._next(out)

    # -- quality ----------------------------------------------------------

    def lm_filter(self, keep_threshold: float = -3.45) -> "CorpusPipeline":
        """Drop the low-likelihood tail under the corpus-trained add-one
        bigram LM (CCNet-style perplexity filtering; see
        ``operators/textops.text_lm_bigram_score`` for the exactness and
        scale analysis).  The LM is trained on the CURRENT frame, so run
        this before aggressive subsampling.  Documents with fewer than
        two words have no bigrams, hence no score, and are DROPPED —
        contentless rows never belong in a training mix anyway."""
        from xmlstreamprocessor_spark.operators.textops import lm_bigram_scores

        renamed = self._docs.select(
            F.col(self._id).alias("doc_id"), F.col(self._text).alias("text")
        )
        keep = (
            lm_bigram_scores(renamed, keep_threshold=keep_threshold)
            .filter(F.col("keep"))
            .select(F.col("doc_id").alias(self._id))
        )
        return self._next(self._docs.join(keep, self._id, "left_semi"))

    # -- packing ----------------------------------------------------------

    def pack_plan(self, cap: int = 2048, shard: int = 100) -> DataFrame:
        """TERMINAL step: concat-and-split packing plan over the current
        rows in id order — (bin_id, n_rows, total_words, first/last id),
        via the two-level distributed prefix sum (per-shard window in
        parallel, then an exclusive prefix over the tiny shard totals).
        Weights are whitespace word counts of the text column, so this
        composes naturally after ``chunk()``."""
        d = self._docs.select(
            F.col(self._id).alias("_pid"),
            F.size(F.split(F.trim(F.col(self._text)), r"\s+"))
            .cast("bigint")
            .alias("_wt"),
            F.monotonically_increasing_id().alias("_row"),
        )
        # deterministic order: id, then arrival order for id ties (chunk
        # rows share their doc id)
        w_in = (
            Window.partitionBy("_shard")
            .orderBy("_pid", "_row")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        d = d.withColumn("_shard", (F.col("_pid") / shard).cast("bigint"))
        local = d.withColumn(
            "_local", F.coalesce(F.sum("_wt").over(w_in), F.lit(0))
        )
        totals = d.groupBy("_shard").agg(F.sum("_wt").alias("_tot"))
        w_sh = Window.orderBy("_shard").rowsBetween(
            Window.unboundedPreceding, -1
        )
        bases = totals.withColumn(
            "_base", F.coalesce(F.sum("_tot").over(w_sh), F.lit(0))
        ).select("_shard", "_base")
        offs = local.join(F.broadcast(bases), "_shard").withColumn(
            "_off", F.col("_base") + F.col("_local")
        )
        return (
            offs.withColumn("bin_id", F.floor(F.col("_off") / cap).cast("bigint"))
            .groupBy("bin_id")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("_wt").cast("bigint").alias("total_words"),
                F.min("_pid").alias("first_id"),
                F.max("_pid").alias("last_id"),
            )
            .orderBy("bin_id")
        )
