"""Scale-path dedup variants must agree with their exact kernels.

The registered queries use bucketed plans (prefix-filtered similarity
join, RP-LSH banded cosine candidates); the naive quadratic kernels stay
in the package purely as verification twins.  These tests pin the
contract between the two on the deterministic sf0.01 tables.
"""

from xmlstreamprocessor_spark.operators.dedup import (
    _jaccard_pairs,
    dedup_embedding_cosine_pairs_lsh,
    dedup_ngram_jaccard_pairs,
    embedding_cosine_pairs_exact,
)


def _pairs(df, a, b, v):
    return {(r[a], r[b]): r[v] for r in df.collect()}


def test_prefix_filter_is_lossless(spark, oracle_sf_dir):
    """PPJoin prefix filtering is an optimization, not an approximation:
    identical pairs AND identical scores to the all-postings self-join,
    under BOTH supported global orders (hash and rarest-first)."""
    from xmlstreamprocessor_spark.operators.dedup import _jaccard_pairs_prefix

    naive = _pairs(
        _jaccard_pairs(spark, oracle_sf_dir, 0.5), "doc_a", "doc_b", "jaccard"
    )
    pref = _pairs(
        dedup_ngram_jaccard_pairs(spark, oracle_sf_dir), "doc_a", "doc_b", "jaccard"
    )
    assert pref == naive
    df_ordered = _pairs(
        _jaccard_pairs_prefix(spark, oracle_sf_dir, 0.5, order="df"),
        "doc_a", "doc_b", "jaccard",
    )
    assert df_ordered == naive
    hash_ordered = _pairs(
        _jaccard_pairs_prefix(spark, oracle_sf_dir, 0.5, order="hash"),
        "doc_a", "doc_b", "jaccard",
    )
    assert hash_ordered == naive
    assert len(pref) > 0  # non-vacuous on this corpus


def _spy_auto(spark, oracle_sf_dir, monkeypatch, docs):
    """Run _jaccard_pairs_auto with spies on both join strategies; return
    (branches chosen, verified pairs)."""
    from xmlstreamprocessor_spark.operators import dedup as dd

    chosen = []
    real_prefix, real_naive = dd._jaccard_pairs_prefix, dd._jaccard_pairs
    monkeypatch.setattr(
        dd, "_jaccard_pairs_prefix",
        lambda *a, **k: (chosen.append("prefix"), real_prefix(*a, **k))[1],
    )
    monkeypatch.setattr(
        dd, "_jaccard_pairs",
        lambda *a, **k: (chosen.append("naive"), real_naive(*a, **k))[1],
    )
    got = _pairs(
        dd._jaccard_pairs_auto(spark, oracle_sf_dir, 0.5, docs=docs, max_blowup=4),
        "doc_a", "doc_b", "jaccard",
    )
    monkeypatch.undo()
    return chosen, got


def test_jaccard_auto_picks_prefix_on_hot_shingle_few_dups(
    spark, oracle_sf_dir, monkeypatch
):
    """The r11 two-plan cost compare must ROUTE a corpus with a hot
    shingle but FEW true near-dups to the prefix path — asserted with a
    spy, locking the cost model itself, not just output equality.  One
    3-gram shared by every doc puts n^2 rows in the direct self-join,
    while rarest-first prefixes (unique per doc) generate almost no
    candidates — the exact regime prefix filtering exists for."""
    hot = "the quick brown"  # one shared 3-gram across all docs
    rows = [
        (i, f"{hot} unique{i} tokens{i} for{i} doc{i} number{i}")
        for i in range(200)
    ] + [  # one true near-dup pair so the output is non-vacuous
        (900, "dup body alpha beta gamma delta epsilon"),
        (901, "dup body alpha beta gamma delta epsilon"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    chosen, got = _spy_auto(spark, oracle_sf_dir, monkeypatch, docs)
    assert chosen == ["prefix"], f"cost model picked {chosen}, wanted prefix"
    want = _pairs(
        _jaccard_pairs(spark, oracle_sf_dir, 0.5, docs=docs),
        "doc_a", "doc_b", "jaccard",
    )
    assert got == want and len(got) > 0


def test_jaccard_auto_picks_direct_on_dup_heavy_vocab(
    spark, oracle_sf_dir, monkeypatch
):
    """A dup-saturated corpus (3 variant groups of ~67 identical docs)
    is skewed past the linear ratio, but its prefix CANDIDATES are the
    quadratic object itself (every group collides on every prefix
    shingle) — enumeration via the direct self-join is cheaper than
    verifying, and the r11 cost compare must pick it (the pre-r11
    ratio-only rule took the prefix path here: the 10x sf1 defect,
    BASELINE round-11 addendum)."""
    hot = "the quick brown"
    rows = [
        (i, f"{hot} doc {i % 3} body variant {i % 3} tail {i % 3}")
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    chosen, got = _spy_auto(spark, oracle_sf_dir, monkeypatch, docs)
    assert chosen == ["naive"], f"cost model picked {chosen}, wanted direct"
    want = _pairs(
        _jaccard_pairs(spark, oracle_sf_dir, 0.5, docs=docs),
        "doc_a", "doc_b", "jaccard",
    )
    assert got == want and len(got) > 0


def test_jaccard_auto_empty_corpus(spark, oracle_sf_dir):
    """Zero postings (every doc under the 3-gram width) must not crash the
    cost statistic (sum() over zero rows is NULL) — the chooser falls back
    to the naive path, which correctly returns zero pairs."""
    from xmlstreamprocessor_spark.operators.dedup import _jaccard_pairs_auto

    docs = spark.createDataFrame(
        [(0, "too short"), (1, "also short")], "doc_id long, text string"
    )
    assert _jaccard_pairs_auto(spark, oracle_sf_dir, 0.5, docs=docs).count() == 0


def test_wide_simhash_banded_edges_equal_theta(spark, oracle_sf_dir):
    """The pigeonhole band equi-join over the 252-bit signature is
    LOSSLESS at radius 8: identical edge set to the all-pairs theta join
    (which stays in the package as this verification kernel only)."""
    from xmlstreamprocessor_spark.operators.dedup import (
        dedup_simhash_wide_signatures,
        wide_hamming_edges_banded,
        wide_hamming_edges_theta,
    )

    sigs = dedup_simhash_wide_signatures(spark, oracle_sf_dir).cache()
    try:
        banded = {(r["u"], r["v"]) for r in wide_hamming_edges_banded(sigs).collect()}
        theta = {(r["u"], r["v"]) for r in wide_hamming_edges_theta(sigs).collect()}
    finally:
        sigs.unpersist()
    assert banded == theta
    assert len(banded) > 0  # non-vacuous: the corpus has near-dup clusters


def test_embedding_lsh_subset_of_exact_with_equal_scores(spark, oracle_sf_dir):
    """Every LSH-bucketed pair must appear in the exact all-pairs result
    with a bit-identical rounded cosine; recall at the loose 0.4 threshold
    is bounded below (deterministic data + deterministic hyperplanes)."""
    lsh = _pairs(
        dedup_embedding_cosine_pairs_lsh(spark, oracle_sf_dir),
        "vec_a", "vec_b", "cos_sim",
    )
    exact = _pairs(
        embedding_cosine_pairs_exact(spark, oracle_sf_dir), "vec_a", "vec_b", "cos_sim"
    )
    assert set(lsh) <= set(exact)
    assert all(lsh[k] == exact[k] for k in lsh)
    # 4 bands x 4 bits at cos>=0.4 gives ~0.5 recall analytically; this
    # dataset is fixed, so pin a floor that catches banding regressions
    assert len(lsh) >= 0.45 * len(exact)


def test_blocked_cosine_matches_expression_kernel(spark, oracle_sf_dir):
    """The blocked numpy kernel is an execution strategy, not an
    approximation: identical pair set AND bit-identical rounded scores to
    the aggregate(zip_with) expression kernel, across block counts that
    exercise diagonal-only (B=1) and many-cross-block (B=7, non-divisor)
    task shapes."""
    from xmlstreamprocessor_spark.operators.dedup import (
        embedding_cosine_pairs_blocked,
    )

    exact = _pairs(
        embedding_cosine_pairs_exact(spark, oracle_sf_dir), "vec_a", "vec_b", "cos_sim"
    )
    assert len(exact) > 0
    for n_blocks in (1, 7, 16):
        blocked = _pairs(
            embedding_cosine_pairs_blocked(spark, oracle_sf_dir, n_blocks=n_blocks),
            "vec_a", "vec_b", "cos_sim",
        )
        assert blocked == exact, f"n_blocks={n_blocks}"


def test_blocked_cosine_edge_cases_match_expression_kernel(spark, tmp_path):
    """Adversarial corpus: a zero-norm vector (cosine undefined — the
    contract is "no pairs", NOT a DIVIDE_BY_ZERO crash under Spark 4's
    default ANSI mode), exact duplicates (cos 1.0), antiparallel vectors,
    and tiny magnitudes.  The blocked kernel must reproduce the
    expression kernel row-for-row."""
    from xmlstreamprocessor_spark.operators.dedup import (
        embedding_cosine_pairs_blocked,
        embedding_cosine_pairs_exact,
    )

    vecs = [
        (0, [0.0, 0.0, 0.0, 0.0]),       # zero norm -> excluded, no crash
        (1, [1.0, 2.0, -3.0, 0.5]),
        (2, [1.0, 2.0, -3.0, 0.5]),      # exact duplicate of 1
        (3, [-1.0, -2.0, 3.0, -0.5]),    # antiparallel to 1 (cos -1)
        (4, [1e-160, 2e-160, -3e-160, 5e-161]),  # tiny magnitude
        (5, [2.0, 4.0, -6.0, 1.0]),      # parallel to 1 (cos 1)
        (6, [4.0, -1.0, 0.0, 7.0]),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, v) for i, v in vecs], "vec_id bigint, embedding array<double>"
    ).write.parquet(f"{sf}/embeddings.parquet")

    def pairs(df):
        return {
            (r["vec_a"], r["vec_b"]): r["cos_sim"] for r in df.collect()
        }

    exact = pairs(embedding_cosine_pairs_exact(spark, sf))
    for n_blocks in (1, 3):
        blocked = pairs(
            embedding_cosine_pairs_blocked(spark, sf, n_blocks=n_blocks)
        )
        assert blocked == exact, n_blocks
    # the zero vector pairs with nothing; duplicates/parallels score 1.0
    assert not any(0 in k for k in exact)
    assert exact[(1, 2)] == 1.0 and exact[(1, 5)] == 1.0
    # the 1e-160 vector's squared norm (~1e-320) is DENORMAL: precision
    # collapses and the cosine overshoots 1 — identically in both
    # kernels, which is exactly what the bit-parity contract promises
    assert (1, 4) in exact and exact[(1, 4)] == 1.000006


def test_pair_scorer_drops_zero_norm_candidates(spark, tmp_path):
    """The vectorized candidate scorer must DROP zero-norm pairs inside
    the kernel: the expression twin yields NULL there (fails the >=
    filter), while a kernel that emitted NaN would PASS it — Spark
    orders NaN above every double.  Normal pairs must score bit-identical
    to the expression kernel's rounding."""
    from xmlstreamprocessor_spark.operators.dedup import score_candidate_pairs

    emb = spark.createDataFrame(
        [
            (0, [0.0, 0.0, 0.0]),          # zero norm
            (1, [1.0, 2.0, 2.0]),
            (2, [2.0, 4.0, 4.0]),          # parallel to 1 (cos 1.0)
            (3, [-1.0, -2.0, -2.0]),       # antiparallel (cos -1.0)
        ],
        "vec_id bigint, embedding array<double>",
    )
    cand = spark.createDataFrame(
        [(0, 1), (1, 2), (1, 3), (2, 3)], "vec_a bigint, vec_b bigint"
    )
    got = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in score_candidate_pairs(cand, emb, threshold=0.4).collect()
    }
    # zero-norm pair (0,1) dropped, antiparallel pairs fail the threshold
    assert got == {(1, 2): 1.0}
    # with a threshold that admits negatives, antiparallels appear, the
    # zero-norm pair still must not
    got_all = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in score_candidate_pairs(cand, emb, threshold=-2.0).collect()
    }
    assert got_all == {(1, 2): 1.0, (1, 3): -1.0, (2, 3): -1.0}


def test_exact_cosine_size_gate_fires(spark, oracle_sf_dir):
    """The exact all-pairs kernel must REFUSE above the vector-count gate
    (O(n^2 d) arithmetic is a cluster-melter at corpus scale) with an
    error that names the sub-quadratic LSH twin — and must keep working
    when the caller raises or disables the gate."""
    import pytest

    from xmlstreamprocessor_spark.operators.dedup import (
        ExactCosineScaleError,
        embedding_cosine_pairs_blocked,
    )

    with pytest.raises(ExactCosineScaleError, match="cosine_pairs_lsh"):
        # this corpus has 500 vectors; a gate of 10 must trip
        embedding_cosine_pairs_blocked(spark, oracle_sf_dir, max_vectors=10)
    # disabling the gate (or a bound above the corpus) still computes
    assert (
        embedding_cosine_pairs_blocked(
            spark, oracle_sf_dir, max_vectors=None
        ).count()
        > 0
    )


def test_minhash_delta_union_base_equals_full_recompute(spark, oracle_sf_dir):
    """Incremental signature maintenance loses nothing: LSH pairs over the
    base corpus alone, UNIONed with the delta query's pairs (any pair
    touching the newly-arrived batch), must equal a full-corpus
    recompute — the invariant that lets a production pipeline dedup each
    ingest batch against the persisted signature table without ever
    re-shingling the corpus."""
    from pyspark.sql import functions as F

    from xmlstreamprocessor_spark.operators.dedup import (
        _DELTA_MOD,
        _DELTA_REM,
        _lsh_pairs,
        dedup_minhash_delta_pairs,
        dedup_minhash_lsh_pairs,
    )
    from xmlstreamprocessor_spark.operators.registry import t

    full = _pairs(
        dedup_minhash_lsh_pairs(spark, oracle_sf_dir), "doc_a", "doc_b", "jaccard"
    )
    docs = t(spark, oracle_sf_dir, "documents")
    base_docs = docs.filter((F.col("doc_id") % _DELTA_MOD) != _DELTA_REM)
    base_only = _pairs(
        _lsh_pairs(spark, oracle_sf_dir, docs=base_docs), "doc_a", "doc_b", "jaccard"
    )
    delta = _pairs(
        dedup_minhash_delta_pairs(spark, oracle_sf_dir), "doc_a", "doc_b", "jaccard"
    )
    # the two halves partition the full answer: base-internal pairs from
    # the base run, delta-touching pairs from the incremental run
    assert set(base_only).isdisjoint(delta)
    assert {**base_only, **delta} == full
    assert len(delta) > 0  # non-vacuous: the batch has near-dups


def test_minhash_delta_against_persisted_signature_table(
    spark, oracle_sf_dir, tmp_path
):
    """The 'persisted signature table' claim, made literal: write the base
    corpus signatures to parquet, read them back, and run the delta dedup
    against the STORED table (no lineage back to the base text).  Pairs
    must be identical to the recompute path — the corpus text is provably
    not needed once its signatures are on disk."""
    from pyspark.sql import functions as F

    from xmlstreamprocessor_spark.operators.dedup import (
        _DELTA_MOD,
        _DELTA_REM,
        _minhash_signatures_for,
        dedup_minhash_delta_pairs,
    )
    from xmlstreamprocessor_spark.operators.registry import t

    docs = t(spark, oracle_sf_dir, "documents")
    base_docs = docs.filter((F.col("doc_id") % _DELTA_MOD) != _DELTA_REM)
    store = str(tmp_path / "minhash_signatures.parquet")
    _minhash_signatures_for(base_docs).write.parquet(store)

    from_store = _pairs(
        dedup_minhash_delta_pairs(
            spark, oracle_sf_dir, base_signatures=spark.read.parquet(store)
        ),
        "doc_a", "doc_b", "jaccard",
    )
    recomputed = _pairs(
        dedup_minhash_delta_pairs(spark, oracle_sf_dir), "doc_a", "doc_b", "jaccard"
    )
    assert from_store == recomputed and len(from_store) > 0


def test_minhash_expr_signatures_equal_groupby_kernel(spark, oracle_sf_dir):
    """The per-row expression form of the MinHash signature (the streaming
    ingest kernel — array_min over the shingle array) must produce
    exactly the values of the groupBy/min batch kernel for every
    shingleable document, and all-null signatures for docs the batch
    kernel omits (<3 words)."""
    from pyspark.sql import functions as F

    from xmlstreamprocessor_spark.operators.dedup import (
        _minhash_signatures_for,
        with_minhash_signature,
    )
    from xmlstreamprocessor_spark.operators.registry import t

    docs = t(spark, oracle_sf_dir, "documents").union(
        spark.createDataFrame(
            [(10_000_001, "too short", "en", "srcx", 9)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    )
    expr_rows = {
        r["doc_id"]: tuple(r[f"mh{i}"] for i in range(20))
        for r in with_minhash_signature(docs)
        .select("doc_id", *[f"mh{i}" for i in range(20)])
        .collect()
    }
    kernel_rows = {
        r["doc_id"]: tuple(r[f"mh{i}"] for i in range(20))
        for r in _minhash_signatures_for(docs).collect()
    }
    assert expr_rows[10_000_001] == (None,) * 20
    assert 10_000_001 not in kernel_rows  # batch kernel: no signature row
    del expr_rows[10_000_001]
    assert expr_rows == kernel_rows and len(expr_rows) > 0


def test_levenshtein_hot_block_splits_losslessly(spark):
    """A dictionary where EVERY name shares the trailing word collapses
    the [a-z]+$ block key to one quadratic block; the cost-based fallback
    must (a) engage — visible as the length-bucket explode (Generate) in
    the physical plan — and (b) emit exactly the pairs and scores of the
    plain blocked join, because length bucketing with width max_dist+1 is
    lossless for edit distance <= max_dist."""
    from pyspark.sql import functions as F

    from xmlstreamprocessor_spark.operators.dedup import (
        _levenshtein_pairs_from_names,
    )

    # 120 names, one shared trailing word, name lengths spread far enough
    # to fill many length buckets; each name has a <=2-edit twin
    rows = []
    for i in range(60):
        pad = "x" * (i % 17)
        rows.append((f"item {i:03d}{pad} zzz", 1))
        rows.append((f"item {i:04d}{pad} zzz", 2))  # 1 insertion away
    names = spark.createDataFrame(rows, "p_name string, n_parts long")

    def pairs(df):
        return {
            (r["a_name"], r["b_name"]): (r["a_parts"], r["b_parts"], r["edit_dist"])
            for r in df.collect()
        }

    direct_df = _levenshtein_pairs_from_names(names, hot_block_limit=10**9)
    hot_df = _levenshtein_pairs_from_names(names, hot_block_limit=10)
    assert "Generate" in hot_df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in direct_df._jdf.queryExecution().executedPlan().toString()
    direct, hot = pairs(direct_df), pairs(hot_df)
    assert hot == direct
    assert len(hot) >= 60  # non-vacuous: every i has its twin
    # and the single collapsed block really was the hazard
    assert (
        names.withColumn("blk", F.regexp_extract("p_name", "[a-z]+$", 0))
        .select("blk").distinct().count() == 1
    )


def test_minhash_estimate_tracks_exact_jaccard(spark, oracle_sf_dir):
    from xmlstreamprocessor_spark.operators.registry import REGISTRY

    rows = REGISTRY["dedup_minhash_estimate_accuracy"][0](
        spark, oracle_sf_dir
    ).collect()
    assert rows
    # every verified pair is >= 0.8 Jaccard; the 20-hash estimator has
    # granularity 0.05 and stdev ~ sqrt(j(1-j)/20) ~ 0.09 at j=0.8 —
    # errors beyond ~4 sigma mean the estimator is broken
    for r in rows:
        assert r["jaccard"] >= 0.8
        assert 0.0 <= r["mh_estimate"] <= 1.0
        assert r["abs_err"] <= 0.4
    mean_err = sum(r["abs_err"] for r in rows) / len(rows)
    assert mean_err <= 0.15


def test_threshold_sweep_cumulative_consistent(spark, oracle_sf_dir):
    from xmlstreamprocessor_spark.operators.registry import REGISTRY

    rows = REGISTRY["dedup_threshold_sweep"][0](spark, oracle_sf_dir).collect()
    assert rows
    pairs = REGISTRY["dedup_ngram_jaccard_pairs"][0](spark, oracle_sf_dir)
    assert sum(r["n_pairs"] for r in rows) == pairs.count()
    # cumulative column really is the suffix sum (descending bands)
    by_band = sorted(rows, key=lambda r: -r["jaccard_band"])
    run = 0
    for r in by_band:
        run += r["n_pairs"]
        assert r["n_pairs_at_or_above"] == run


def test_jsd_by_source_bounds(spark, oracle_sf_dir):
    import math

    from xmlstreamprocessor_spark.operators.registry import REGISTRY

    rows = REGISTRY["text_jsd_by_source"][0](spark, oracle_sf_dir).collect()
    assert rows
    for r in rows:
        # JSD lies in [0, ln 2]; quantization bias < vocab nano-nats
        assert -1e-3 <= r["jsd_nats"] <= math.log(2) + 1e-3
        assert 0 < r["vocab_shared"] <= r["n_words"]


def test_winnowing_pairs_subset_of_exact(spark, oracle_sf_dir):
    from xmlstreamprocessor_spark.operators.registry import REGISTRY

    win = REGISTRY["dedup_winnowing_pairs"][0](spark, oracle_sf_dir).collect()
    exact = REGISTRY["dedup_ngram_jaccard_pairs"][0](
        spark, oracle_sf_dir
    ).collect()
    w = {(r["doc_a"], r["doc_b"]) for r in win}
    e = {(r["doc_a"], r["doc_b"]) for r in exact}
    assert w and w <= e  # verified candidates are true pairs
    # winnowing is the cheap LOW-recall pass; it must find a nontrivial
    # fraction but is expected to miss pairs the band families catch
    assert len(w) >= 0.05 * len(e)
    for r in win:
        assert r["jaccard"] >= 0.5


def test_winnowing_cost_fallback_branches_identical(spark, oracle_sf_dir):
    """The winnowing cost model must ROUTE a pathological shared-boilerplate
    corpus (every doc starts with the same corpus-minimal window, so one
    wmin bucket holds everything and candidates-first would emit ~n^2/2
    pairs) to the verify-first branch — and both branches must emit
    IDENTICAL rows, because the strategy only reorders the joins."""
    from xmlstreamprocessor_spark.operators import dedup as dd

    # the ' !!!!!!!' window (codepoints 32,33,...) beats every space+letter
    # window in the variable suffix, so the global-min window sits inside
    # the shared boilerplate and every doc lands in ONE wmin bucket
    boiler = "shared !!!!!!!! boilerplate header"
    rows = [
        (i, f"{boiler} unique body {i % 9} variant {i % 9} tail {i % 9}")
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    cand_first = _pairs(
        dd._winnowing_pairs(
            spark, oracle_sf_dir, docs=docs, force_path="candidates-first"
        ),
        "doc_a", "doc_b", "jaccard",
    )
    ver_first = _pairs(
        dd._winnowing_pairs(
            spark, oracle_sf_dir, docs=docs, force_path="verify-first"
        ),
        "doc_a", "doc_b", "jaccard",
    )
    assert ver_first == cand_first and len(ver_first) > 0

    # the cost statistic itself must pick verify-first here: one bucket of
    # 200 docs -> 19900 candidate pairs > 64 * 200.  Spy on the verify
    # kernel the fallback branch calls to lock the routing, not just the
    # output (same idiom as test_jaccard_auto_picks_prefix_on_skewed_vocab).
    called = []
    real = dd._jaccard_pairs_auto
    dd._jaccard_pairs_auto = (
        lambda *a, **k: (called.append("verify-first"), real(*a, **k))[1]
    )
    try:
        auto = _pairs(
            dd._winnowing_pairs(spark, oracle_sf_dir, docs=docs),
            "doc_a", "doc_b", "jaccard",
        )
    finally:
        dd._jaccard_pairs_auto = real
    assert called == ["verify-first"], f"cost model routed {called or 'candidates-first'}"
    assert auto == cand_first


def test_winnowing_standard_corpus_stays_candidates_first(spark, oracle_sf_dir):
    """On the standard corpus the statistic must keep the original
    candidates-first plan (VERDICT r4 #5: 'plan identical on the normal
    corpus') — pinned by comparing auto against the forced branch."""
    from xmlstreamprocessor_spark.operators import dedup as dd

    auto = _pairs(
        dd._winnowing_pairs(spark, oracle_sf_dir),
        "doc_a", "doc_b", "jaccard",
    )
    forced = _pairs(
        dd._winnowing_pairs(spark, oracle_sf_dir, force_path="candidates-first"),
        "doc_a", "doc_b", "jaccard",
    )
    assert auto == forced and len(auto) > 0


def test_exact_delta_union_base_equals_full_recompute(spark, oracle_sf_dir):
    """Incremental EXACT pair-graph maintenance loses nothing: the
    verified >=0.5-Jaccard pairs over the base corpus alone, UNIONed with
    jaccard_pairs_delta's output (any pair touching the delta batch),
    must equal the full-corpus cost-based recompute — pairs AND scores."""
    from pyspark.sql import functions as F

    from xmlstreamprocessor_spark.operators.dedup import (
        _DELTA_MOD,
        _DELTA_REM,
        _jaccard_pairs_auto,
        dedup_pairs_delta,
    )
    from xmlstreamprocessor_spark.operators.registry import t

    full = _pairs(
        _jaccard_pairs_auto(spark, oracle_sf_dir, 0.5), "doc_a", "doc_b", "jaccard"
    )
    docs = t(spark, oracle_sf_dir, "documents")
    base_docs = docs.filter((F.col("doc_id") % _DELTA_MOD) != _DELTA_REM)
    base_only = _pairs(
        _jaccard_pairs_auto(spark, sf_dir=None, threshold=0.5, docs=base_docs),
        "doc_a", "doc_b", "jaccard",
    )
    delta = _pairs(
        dedup_pairs_delta(spark, oracle_sf_dir), "doc_a", "doc_b", "jaccard"
    )
    assert set(base_only).isdisjoint(delta)
    assert {**base_only, **delta} == full
    assert len(delta) > 0


def test_exact_delta_against_persisted_shingle_sets(
    spark, oracle_sf_dir, tmp_path
):
    """The persisted-substrate claim, made literal: write the base corpus
    shingle-set table to parquet, read it back, and run the delta pass
    against the STORED table (no lineage back to the base text).  Pairs
    must be identical to the recompute path."""
    from pyspark.sql import functions as F

    from xmlstreamprocessor_spark.operators.dedup import (
        _DELTA_MOD,
        _DELTA_REM,
        jaccard_pairs_delta,
        shingle_sets,
    )
    from xmlstreamprocessor_spark.operators.registry import t

    docs = t(spark, oracle_sf_dir, "documents")
    base_docs = docs.filter((F.col("doc_id") % _DELTA_MOD) != _DELTA_REM)
    store = str(tmp_path / "shingle_sets.parquet")
    shingle_sets(base_docs).write.parquet(store)

    from_store = _pairs(
        jaccard_pairs_delta(
            spark, oracle_sf_dir,
            base_shingle_sets=spark.read.parquet(store),
        ),
        "doc_a", "doc_b", "jaccard",
    )
    recomputed = _pairs(
        jaccard_pairs_delta(spark, oracle_sf_dir), "doc_a", "doc_b", "jaccard"
    )
    assert from_store == recomputed and len(from_store) > 0


def test_exact_delta_with_persisted_df_stats(spark, oracle_sf_dir, tmp_path):
    """The df-stats table is a persisted artifact too (r6 verdict #5):
    feeding a STORED shingle->df table (even a stale one — prefix order is
    a heuristic, never a correctness input) must yield the identical
    verified pair set as the recompute stand-in."""
    from pyspark.sql import functions as F

    from xmlstreamprocessor_spark.operators.dedup import (
        _DELTA_MOD,
        _DELTA_REM,
        jaccard_pairs_delta,
        shingle_sets,
    )
    from xmlstreamprocessor_spark.operators.registry import t

    docs = t(spark, oracle_sf_dir, "documents")
    base_docs = docs.filter((F.col("doc_id") % _DELTA_MOD) != _DELTA_REM)
    store = str(tmp_path / "df_stats.parquet")
    (
        shingle_sets(base_docs)
        .select(F.explode("s").alias("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .write.parquet(store)
    )
    from_store = _pairs(
        jaccard_pairs_delta(
            spark, oracle_sf_dir, df_stats=spark.read.parquet(store)
        ),
        "doc_a", "doc_b", "jaccard",
    )
    # a deliberately STALE/garbage df table (all df equal) still gives the
    # same answer — only candidate volume can change, the verify is exact
    uniform = spark.read.parquet(store).withColumn("df", F.lit(7))
    from_stale = _pairs(
        jaccard_pairs_delta(spark, oracle_sf_dir, df_stats=uniform),
        "doc_a", "doc_b", "jaccard",
    )
    recomputed = _pairs(
        jaccard_pairs_delta(spark, oracle_sf_dir), "doc_a", "doc_b", "jaccard"
    )
    assert from_store == recomputed == from_stale and len(from_store) > 0


def test_exact_delta_with_bucketed_postings(spark, oracle_sf_dir, tmp_path):
    """r7 verdict task #1: the persisted POSTINGS artifact (Hive-partitioned
    by shingle-hash bucket, bucketed by shingle) must yield the identical
    verified pair set as the array-derived probe, while the plan shows the
    two scale properties: a static PartitionFilter on ``sb`` (the delta's
    touched buckets prune the corpus scan) and a bucketed scan (the corpus
    side's hash distribution satisfies the join — no corpus exchange)."""
    from pyspark.sql import functions as F

    from xmlstreamprocessor_spark.operators.dedup import (
        _DELTA_MOD,
        _DELTA_REM,
        jaccard_pairs_delta,
        persist_postings,
        shingle_sets,
    )
    from xmlstreamprocessor_spark.operators.registry import t

    docs = t(spark, oracle_sf_dir, "documents")
    base_docs = docs.filter((F.col("doc_id") % _DELTA_MOD) != _DELTA_REM)
    base_sh = shingle_sets(base_docs)
    df_store = str(tmp_path / "df_stats.parquet")
    (
        base_sh.select(F.explode("s").alias("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .write.parquet(df_store)
    )
    spark.sql("DROP TABLE IF EXISTS xsp_t_postings")
    post = persist_postings(
        base_sh, "xsp_t_postings", str(tmp_path / "postings")
    )
    try:
        from_postings = jaccard_pairs_delta(
            spark, oracle_sf_dir,
            base_shingle_sets=base_sh,
            df_stats=spark.read.parquet(df_store),
            base_postings=post,
        )
        got = _pairs(from_postings, "doc_a", "doc_b", "jaccard")
        recomputed = _pairs(
            jaccard_pairs_delta(spark, oracle_sf_dir),
            "doc_a", "doc_b", "jaccard",
        )
        assert got == recomputed and len(got) > 0
        plan = from_postings._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert " INSET " in plan.split("PartitionFilters: [sb", 1)[1]
    finally:
        spark.sql("DROP TABLE IF EXISTS xsp_t_postings")


def test_bucketed_postings_prune_and_verify_small_delta(spark, tmp_path):
    """Pruning effectiveness, pinned: a SHORT delta document (2 shingles
    -> 2 prefix shingles) must statically prune the postings scan to at
    most 2 of the 16 ``sb`` directories, and the pruned run still finds
    exactly the true pairs (losslessness of hash-pruning: equal shingles
    hash to equal buckets)."""
    import re

    from pyspark.sql import functions as F

    from xmlstreamprocessor_spark.operators.dedup import (
        jaccard_pairs_delta,
        persist_postings,
        shingle_sets,
    )

    rows = [
        (1, "alpha beta gamma delta"),          # base: shares both shingles
        (2, "alpha beta gamma delta epsilon"),  # base: superset text
        (3, "one two three four five six"),     # base: unrelated
        (7, "alpha beta gamma delta"),          # delta: dup of doc 1
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    base_sh = shingle_sets(docs.filter(F.col("doc_id") != 7))
    spark.sql("DROP TABLE IF EXISTS xsp_t_postings_sm")
    post = persist_postings(
        base_sh, "xsp_t_postings_sm", str(tmp_path / "postings_sm")
    )
    try:
        pairs_df = jaccard_pairs_delta(
            spark, sf_dir=None, threshold=0.5,
            docs=docs, is_delta=F.col("doc_id") == 7,
            base_shingle_sets=base_sh, base_postings=post,
        )
        got = {(r.doc_a, r.doc_b) for r in pairs_df.collect()}
        # doc7 == doc1 (J=1.0); doc7 vs doc2: 2 of 3 shingles, J=2/3 >= .5
        assert got == {(1, 7), (2, 7)}
        plan = pairs_df._jdf.queryExecution().executedPlan().toString()
        # small sets render as `sb IN (8,9)`, large ones as `sb INSET 8, 9`
        m = re.search(
            r"PartitionFilters: \[sb#\d+ (?:IN \(([\d,]+)\)|INSET ([\d, ]+)\])",
            plan,
        )
        assert m, "postings scan lost its static partition filter"
        touched = [int(v) for v in (m.group(1) or m.group(2)).split(",")]
        assert len(touched) <= 2, f"expected <=2 pruned buckets: {touched}"
    finally:
        spark.sql("DROP TABLE IF EXISTS xsp_t_postings_sm")


def test_bucketed_postings_requires_shingle_sets(spark, oracle_sf_dir):
    """base_postings without the verify arrays must fail fast."""
    import pytest

    from xmlstreamprocessor_spark.operators.dedup import jaccard_pairs_delta

    with pytest.raises(ValueError, match="base_shingle_sets"):
        jaccard_pairs_delta(
            spark, oracle_sf_dir, base_postings=spark.range(1)
        )


def test_exact_delta_requires_predicate_with_custom_docs(spark, oracle_sf_dir):
    """Passing docs= without is_delta/base_shingle_sets must fail fast
    instead of silently partitioning a real corpus by the benchmark
    modulus (judge advice r6)."""
    import pytest

    from xmlstreamprocessor_spark.operators.dedup import jaccard_pairs_delta
    from xmlstreamprocessor_spark.operators.registry import t

    docs = t(spark, oracle_sf_dir, "documents")
    with pytest.raises(ValueError, match="is_delta"):
        jaccard_pairs_delta(spark, sf_dir=None, docs=docs)


def test_merge_components_equals_full_cc(spark, oracle_sf_dir):
    """Star-fold correctness: merging the delta pairs into the base
    components must label every node exactly as a full-graph CC run —
    including nodes whose groups FUSE only through a delta document."""
    from pyspark.sql import functions as F

    from xmlstreamprocessor_spark.operators.dedup import (
        _DELTA_MOD,
        _DELTA_REM,
        _jaccard_pairs_auto,
        jaccard_pairs_delta,
    )
    from xmlstreamprocessor_spark.operators.graph import (
        connected_components,
        merge_components,
    )
    from xmlstreamprocessor_spark.operators.registry import t

    docs = t(spark, oracle_sf_dir, "documents")
    base_docs = docs.filter((F.col("doc_id") % _DELTA_MOD) != _DELTA_REM)
    base_pairs = _jaccard_pairs_auto(
        spark, sf_dir=None, threshold=0.5, docs=base_docs
    )
    base_groups = connected_components(base_pairs, src="doc_a", dst="doc_b")
    delta_pairs = jaccard_pairs_delta(spark, oracle_sf_dir, 0.5)
    merged = {
        (r["node"], r["component"])
        for r in merge_components(
            base_groups, delta_pairs, src="doc_a", dst="doc_b"
        ).collect()
    }
    full = {
        (r["node"], r["component"])
        for r in connected_components(
            _jaccard_pairs_auto(spark, oracle_sf_dir, 0.5),
            src="doc_a", dst="doc_b",
        ).collect()
    }
    assert merged == full and len(merged) > 0


def test_merge_components_preserves_untouched_singletons(spark):
    """A base component of size 1 (possible when a caller's groups table
    includes singleton assignments) with no delta edge must survive the
    merge unchanged, and groups fusing through a delta edge must relabel
    to the new global min."""
    from xmlstreamprocessor_spark.operators.graph import merge_components

    base = spark.createDataFrame(
        [(1, 1), (2, 1), (5, 5), (7, 7), (8, 7)],
        "node long, component long",
    )
    # delta edge 2-5 fuses {1,2} with {5}; 9-10 is a brand-new pair
    delta = spark.createDataFrame([(2, 5), (9, 10)], "src long, dst long")
    merged = {
        (r["node"], r["component"])
        for r in merge_components(base, delta).collect()
    }
    assert merged == {
        (1, 1), (2, 1), (5, 1),       # fused, min id 1 wins
        (7, 7), (8, 7),               # untouched multi-member group
        (9, 9), (10, 9),              # new delta-only pair
    }


def test_exact_delta_losslessness_property_random_corpora(spark):
    """Property test of the one-sided prefix filter's losslessness: for
    random tiny corpora and random delta splits, base-only pairs UNION
    delta pairs must equal the full recompute — pairs AND scores.  The
    fixed-corpus tests prove it for one split of one corpus; this varies
    shingle overlap structure, delta fraction (including empty base and
    empty delta), and threshold."""
    from hypothesis import given, settings, strategies as st
    from pyspark.sql import functions as F

    from xmlstreamprocessor_spark.operators.dedup import (
        _jaccard_pairs_auto,
        jaccard_pairs_delta,
    )

    words = st.sampled_from(["red", "blue", "fox", "dog", "run", "sit"])
    text = st.lists(words, min_size=3, max_size=8).map(" ".join)

    @settings(max_examples=6, deadline=None)
    @given(
        texts=st.lists(text, min_size=2, max_size=8),
        delta_mask=st.lists(st.booleans(), min_size=8, max_size=8),
        thr=st.sampled_from([0.3, 0.5, 0.8]),
    )
    def check(texts, delta_mask, thr):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
        )
        is_delta_py = {i: delta_mask[i] for i in range(len(texts))}
        dl = [i for i in range(len(texts)) if is_delta_py[i]]
        is_delta = (
            F.col("doc_id").isin(dl) if dl else F.lit(False)
        )
        full = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in _jaccard_pairs_auto(
                spark, sf_dir=None, threshold=thr, docs=docs
            ).collect()
        }
        base = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in _jaccard_pairs_auto(
                spark, sf_dir=None, threshold=thr,
                docs=docs.filter(~is_delta),
            ).collect()
        }
        delta = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in jaccard_pairs_delta(
                spark, sf_dir=None, threshold=thr, docs=docs,
                is_delta=is_delta,
            ).collect()
        }
        assert set(base).isdisjoint(delta)
        assert {**base, **delta} == full

    check()


def test_bucketed_postings_empty_delta_and_stamp_override(spark, tmp_path):
    """Edge hardening for the postings probe: an EMPTY delta batch yields
    zero pairs (empty touched-bucket set -> isin([]) prunes everything,
    no crash), and the n_sb stamped into the table's column metadata
    overrides a wrong caller parameter — the mismatch that would
    otherwise silently prune live buckets."""
    from pyspark.sql import functions as F

    from xmlstreamprocessor_spark.operators.dedup import (
        jaccard_pairs_delta,
        persist_postings,
        shingle_sets,
    )

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta epsilon"),
        (7, "alpha beta gamma delta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    base_sh = shingle_sets(docs.filter(F.col("doc_id") != 7))
    spark.sql("DROP TABLE IF EXISTS xsp_t_edge")
    post = persist_postings(
        base_sh, "xsp_t_edge", str(tmp_path / "p"), n_sb=16
    )
    try:
        assert dict(post.schema["sb"].metadata)["xsp_n_sb"] == 16
        # empty delta: no document satisfies the predicate
        empty = jaccard_pairs_delta(
            spark, sf_dir=None, threshold=0.5,
            docs=docs, is_delta=F.lit(False),
            base_shingle_sets=base_sh, base_postings=post,
        )
        assert empty.count() == 0
        # wrong n_sb parameter, stamped table: stamp wins, answer lossless
        got = {
            (r.doc_a, r.doc_b)
            for r in jaccard_pairs_delta(
                spark, sf_dir=None, threshold=0.5,
                docs=docs, is_delta=F.col("doc_id") == 7,
                base_shingle_sets=base_sh, base_postings=post, n_sb=32,
            ).collect()
        }
        assert got == {(1, 7), (2, 7)}
    finally:
        spark.sql("DROP TABLE IF EXISTS xsp_t_edge")


def test_verify_jaccard_postings_route_parity(spark, oracle_sf_dir):
    """r9 sf3-stress fix: the cost-routed verify's POSTINGS plan (forced
    by dropping the candidate gate to 0) emits exactly the arrays plan's
    (doc_a, doc_b, jaccard) rows on the same corpus, and its physical
    plan carries no array-typed join payload (no array_intersect).  The
    arrays plan stays the default at this corpus size."""
    import xmlstreamprocessor_spark.operators.dedup as dd

    arrays = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dd._jaccard_pairs_prefix(
            spark, oracle_sf_dir, 0.5, order="hash"
        ).collect()
    }
    assert arrays  # non-degenerate corpus
    old = dd._VERIFY_ARRAYS_MAX_CAND
    old_f = dd._VERIFY_ENUM_FACTOR
    dd._VERIFY_ARRAYS_MAX_CAND = 0
    try:
        # both dense sub-routes (r11): the two narrow equi-joins and the
        # pruned-corpus self-join ENUMERATE plan, forced via the factor
        for factor in (float("inf"), 0.0):
            dd._VERIFY_ENUM_FACTOR = factor
            routed = dd._jaccard_pairs_prefix(
                spark, oracle_sf_dir, 0.5, order="hash"
            )
            plan = routed._jdf.queryExecution().executedPlan().toString()
            assert "array_intersect" not in plan
            got = {(r.doc_a, r.doc_b, r.jaccard) for r in routed.collect()}
            assert got == arrays, f"factor={factor}"
    finally:
        dd._VERIFY_ARRAYS_MAX_CAND = old
        dd._VERIFY_ENUM_FACTOR = old_f


def test_winnowing_gate_consulted(spark, oracle_sf_dir):
    """The gate report (dedup_winnowing_bucket_stats) and the main
    operator's strategy decision consume the SAME bucket aggregate
    (r9 verdict #5): sum(cand_pairs) over the gate's colliding buckets
    IS the decision statistic, and on a one-hot-bucket corpus the gate
    names that bucket while the decision routes verify-first."""
    from pyspark.sql import functions as F

    from xmlstreamprocessor_spark.operators import dedup as dd
    from xmlstreamprocessor_spark.operators.registry import REGISTRY

    # standard corpus: gate total == decision statistic, route stays
    # candidates-first under the default blow-up bound
    gate = REGISTRY["dedup_winnowing_bucket_stats"][0](spark, oracle_sf_dir)
    gate_total = (
        gate.agg(F.sum("cand_pairs").alias("s")).first()["s"] or 0
    )
    from xmlstreamprocessor_spark import catalog

    d = catalog.load(spark, oracle_sf_dir, "documents")
    fp = dd._winnowing_fp(d)
    stats = (
        dd._winnowing_buckets(fp)
        .agg(
            F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("cand_pairs"),
            F.sum("m").alias("n_docs"),
        )
        .first()
    )
    assert int(stats["cand_pairs"]) == int(gate_total)
    assert dd._winnowing_decision(fp, 64) == "candidates-first"
    assert int(stats["cand_pairs"]) <= 64 * int(stats["n_docs"])

    # pathological corpus: the gate's hottest bucket carries ~all the
    # candidate volume and the decision flips to verify-first
    boiler = "shared !!!!!!!! boilerplate header"
    rows = [
        (i, f"{boiler} unique body {i % 9} variant {i % 9} tail {i % 9}")
        for i in range(200)
    ]
    bad = spark.createDataFrame(rows, "doc_id long, text string")
    bad_fp = dd._winnowing_fp(bad)
    hot = (
        dd._winnowing_buckets(bad_fp)
        .filter(F.col("m") >= 2)
        .orderBy(F.desc("m"))
        .first()
    )
    assert hot["m"] == 200  # one bucket holds the whole corpus
    assert dd._winnowing_decision(bad_fp, 64) == "verify-first"


def test_verify_scratch_released_when_materialized(spark, oracle_sf_dir):
    """r9 verdict #6: the candidate DISK_ONLY blocks _verify_jaccard
    registers must NOT accumulate across sequential queries whose
    verified output is eagerly materialized — _jaccard_pairs_auto
    releases them as soon as its collect/checkpoint completes, while a
    LAZY verify caller still holds its block until clear_session_memos()
    (the lazy-consumer contract)."""
    from pyspark.sql import functions as F  # noqa: F401

    from xmlstreamprocessor_spark.operators import dedup as dd

    dd.clear_session_memos()
    assert len(dd._SCRATCH_PERSISTS) == 0

    # shared boilerplate -> hot shingles -> the prefix (verify-bearing)
    # branch of _jaccard_pairs_auto; docs injected so the memo never hits
    boiler = " ".join(f"common{j}" for j in range(30))
    rows = [(i, f"{boiler} unique{i % 7} tail{i % 7}") for i in range(150)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    first = None
    for _ in range(3):
        out = dd._jaccard_pairs_auto(spark, None, 0.5, docs=docs)
        n = out.count()
        first = n if first is None else first
        assert n == first  # same corpus, same answer every round
        assert len(dd._SCRATCH_PERSISTS) == 0  # released, not accumulated

    # lazy contract unchanged: a winnowing candidates-first run returns
    # a lazy frame, so its block stays registered until the session hook
    lazy = dd._winnowing_pairs(
        spark, None, docs=docs, force_path="candidates-first"
    )
    assert len(dd._SCRATCH_PERSISTS) == 1
    assert lazy.count() >= 0  # consuming it later still works
    dd.clear_session_memos()
    assert len(dd._SCRATCH_PERSISTS) == 0


def test_containment_delta_union_base_equals_full_recompute(spark, oracle_sf_dir):
    """The containment chain's incremental path loses nothing (r11
    verdict #7): directed containment pairs over the base corpus alone,
    UNIONed with the delta query's pairs (any pair with a delta
    endpoint), must equal the full-corpus recompute — including the
    ASYMMETRIC direction the Jaccard delta has no analogue for (a base
    doc contained in a newly-arrived container, found by probing the
    base docs' prefixes with the delta's postings)."""
    from pyspark.sql import functions as F

    from xmlstreamprocessor_spark.operators.dedup import (
        _DELTA_MOD,
        _DELTA_REM,
        containment_pairs,
        dedup_containment_delta,
    )
    from xmlstreamprocessor_spark.operators.registry import t

    full = _pairs(
        containment_pairs(spark, oracle_sf_dir),
        "contained_id", "container_id", "containment",
    )
    docs = t(spark, oracle_sf_dir, "documents")
    base_docs = docs.filter((F.col("doc_id") % _DELTA_MOD) != _DELTA_REM)
    base_only = _pairs(
        containment_pairs(spark, oracle_sf_dir, docs=base_docs),
        "contained_id", "container_id", "containment",
    )
    delta = _pairs(
        dedup_containment_delta(spark, oracle_sf_dir),
        "contained_id", "container_id", "containment",
    )
    assert set(base_only).isdisjoint(delta)
    assert {**base_only, **delta} == full
    assert len(delta) > 0  # non-vacuous: the batch has contained docs
    # both directions present: delta doc as contained AND as container
    assert any(a % _DELTA_MOD == _DELTA_REM for (a, b) in delta)
    assert any(b % _DELTA_MOD == _DELTA_REM for (a, b) in delta)


def test_containment_delta_with_persisted_prefix(spark, oracle_sf_dir, tmp_path):
    """r11 verdict #4: the persisted base-PREFIX artifact
    (:func:`persist_prefix`, Hive-partitioned by shingle-hash bucket,
    bucketed by shingle) must yield the identical directed pair set as
    the per-call derived prefix, while the plan shows the two scale
    properties: a static PartitionFilter on ``sb`` (the delta's postings
    name the touched buckets) and a bucketed artifact scan (no
    artifact-side exchange in the prefix x delta-postings join)."""
    from pyspark.sql import functions as F

    from xmlstreamprocessor_spark.operators.dedup import (
        _CONTAIN_T,
        _DELTA_MOD,
        _DELTA_REM,
        containment_pairs_delta,
        df_stats_for,
        persist_prefix,
        shingle_sets,
    )
    from xmlstreamprocessor_spark.operators.registry import t

    docs = t(spark, oracle_sf_dir, "documents")
    base_sh = shingle_sets(
        docs.filter((F.col("doc_id") % _DELTA_MOD) != _DELTA_REM)
    )
    spark.sql("DROP TABLE IF EXISTS xsp_t_prefix")
    pref = persist_prefix(
        base_sh, "xsp_t_prefix", str(tmp_path / "prefix"), _CONTAIN_T
    )
    try:
        assert dict(pref.schema["sb"].metadata)["xsp_n_sb"] == 16
        from_artifact = containment_pairs_delta(
            spark, oracle_sf_dir,
            base_shingle_sets=base_sh,
            df_stats=df_stats_for(base_sh),
            base_prefix=pref,
        )
        got = _pairs(
            from_artifact, "contained_id", "container_id", "containment"
        )
        recomputed = _pairs(
            containment_pairs_delta(spark, oracle_sf_dir),
            "contained_id", "container_id", "containment",
        )
        assert got == recomputed and len(got) > 0
        plan = from_artifact._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert " INSET " in plan.split("PartitionFilters: [sb", 1)[1]
    finally:
        spark.sql("DROP TABLE IF EXISTS xsp_t_prefix")


def test_persisted_prefix_prunes_small_delta(spark, tmp_path):
    """Pruning effectiveness for the prefix artifact: a delta batch whose
    postings touch few buckets must statically prune the artifact scan
    to those ``sb`` directories only, and the pruned run still finds the
    base-contained-in-delta pair (losslessness of hash-pruning)."""
    import re

    from pyspark.sql import functions as F

    from xmlstreamprocessor_spark.operators.dedup import (
        containment_pairs_delta,
        persist_prefix,
        shingle_sets,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon"),      # base: contained in 7
        (2, "one two three four five six seven"),   # base: unrelated
        (7, "alpha beta gamma delta epsilon zeta"), # delta: container of 1
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    base_sh = shingle_sets(docs.filter(F.col("doc_id") != 7))
    spark.sql("DROP TABLE IF EXISTS xsp_t_prefix_sm")
    pref = persist_prefix(
        base_sh, "xsp_t_prefix_sm", str(tmp_path / "prefix_sm"), 0.8
    )
    try:
        pairs_df = containment_pairs_delta(
            spark, sf_dir=None, threshold=0.8,
            docs=docs, is_delta=F.col("doc_id") == 7,
            base_shingle_sets=base_sh, base_prefix=pref,
        )
        got = {
            (r.contained_id, r.container_id) for r in pairs_df.collect()
        }
        # doc1's 3 shingles all appear in doc7 (containment 1.0 >= 0.8);
        # doc7 has 4 shingles, only 3 in doc1 (0.75 < 0.8); doc2 disjoint
        assert got == {(1, 7)}
        plan = pairs_df._jdf.queryExecution().executedPlan().toString()
        m = re.search(
            r"PartitionFilters: \[sb#\d+ (?:IN \(([\d,]+)\)|INSET ([\d, ]+)\])",
            plan,
        )
        assert m, "prefix artifact scan lost its static partition filter"
        touched = [int(v) for v in (m.group(1) or m.group(2)).split(",")]
        # the delta's postings are doc7's 4 shingles -> at most 4 of the
        # 16 sb directories are opened
        assert len(touched) <= 4, f"expected <=4 pruned buckets: {touched}"
        # threshold contract (code-review r12): prefixes written at
        # t=0.8 are too SHORT for a t=0.5 query — must fail fast, not
        # silently drop candidates
        import pytest

        with pytest.raises(ValueError, match="too SHORT"):
            containment_pairs_delta(
                spark, sf_dir=None, threshold=0.5,
                docs=docs, is_delta=F.col("doc_id") == 7,
                base_shingle_sets=base_sh, base_prefix=pref,
            )
        # and a LOWER write-time threshold (longer prefixes) is accepted
        ok = containment_pairs_delta(
            spark, sf_dir=None, threshold=0.9,
            docs=docs, is_delta=F.col("doc_id") == 7,
            base_shingle_sets=base_sh, base_prefix=pref,
        )
        assert {(r.contained_id, r.container_id) for r in ok.collect()} == {
            (1, 7)
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS xsp_t_prefix_sm")


def test_resolve_sb_modulus_unstamped_warns_and_strict_raises(
    spark, monkeypatch
):
    """The sampled modulus-validation fallback is probabilistic, so a
    production pipeline must never rely on it SILENTLY (r12 verdict #7):
    an unstamped frame emits a UserWarning naming the table; strict=True
    (or XSP_STRICT_SB_STAMP=1) turns the missing stamp into an error.
    Stamped tables stay warning-free on every path."""
    import warnings as _w

    import pytest
    from pyspark.sql import functions as F

    from xmlstreamprocessor_spark.operators.dedup import (
        postings_bucket,
        resolve_sb_modulus,
    )

    n_sb = 8
    hand_built = (
        spark.createDataFrame(
            [(d, s) for d in range(4) for s in ("aa bb", "bb cc", "cc dd")],
            "doc_id int, shingle string",
        )
        .withColumn("n", F.lit(3))
        .withColumn("sb", postings_bucket(F.col("shingle"), n_sb))
    )
    monkeypatch.delenv("XSP_STRICT_SB_STAMP", raising=False)
    with _w.catch_warnings(record=True) as got:
        _w.simplefilter("always")
        assert resolve_sb_modulus(hand_built, n_sb, what="hand_built") == n_sb
    msgs = [str(w.message) for w in got if w.category is UserWarning]
    assert any("hand_built" in m and "xsp_n_sb" in m for m in msgs)

    with pytest.raises(ValueError, match="xsp_n_sb"):
        resolve_sb_modulus(hand_built, n_sb, strict=True)
    monkeypatch.setenv("XSP_STRICT_SB_STAMP", "1")
    with pytest.raises(ValueError, match="XSP_STRICT_SB_STAMP"):
        resolve_sb_modulus(hand_built, n_sb)
    # an explicit strict=False call-site override beats the env flag
    with _w.catch_warnings(record=True):
        _w.simplefilter("ignore")
        assert resolve_sb_modulus(hand_built, n_sb, strict=False) == n_sb


def test_lsh_bucket_cap_routing(spark, oracle_sf_dir):
    """The bucket_cap production-routing seam on _lsh_pairs (r14: the
    100x stress OOMed the uncapped verify on a corpus whose replicated
    near-dup groups merge into band mega-buckets): (1) a cap at or
    above the largest bucket is a no-op — identical verified pairs to
    the exact/oracle shape; (2) any cap yields a SUBSET of the exact
    pairs with identical jaccard values (capping only removes
    candidates, never invents or rescores); (3) cap=1 leaves only
    singleton buckets, so zero candidates survive."""
    from xmlstreamprocessor_spark.operators.dedup import _lsh_pairs

    def pairs(df):
        return {
            (r["doc_a"], r["doc_b"]): r["jaccard"] for r in df.collect()
        }

    exact = pairs(_lsh_pairs(spark, oracle_sf_dir))
    assert exact  # the corpus has verified near-dups
    assert pairs(_lsh_pairs(spark, oracle_sf_dir, bucket_cap=10**6)) == exact
    capped = pairs(_lsh_pairs(spark, oracle_sf_dir, bucket_cap=3))
    assert set(capped) <= set(exact)
    assert all(exact[k] == v for k, v in capped.items())
    assert pairs(_lsh_pairs(spark, oracle_sf_dir, bucket_cap=1)) == {}
