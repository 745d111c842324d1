"""Determinism invariants for the sampling operators — the properties a
100 TB pipeline actually relies on, beyond the oracle value match."""

from xmlstreamprocessor_spark.operators.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    fn, _ = REGISTRY[name]
    return fn(spark, SF)


def test_rate_sample_is_idempotent(spark):
    a = {r["doc_id"] for r in _run(spark, "sample_deterministic_rate").collect()}
    b = {r["doc_id"] for r in _run(spark, "sample_deterministic_rate").collect()}
    assert a == b and len(a) > 0


def test_split_partitions_every_document(spark):
    from pyspark.sql import functions as F

    rows = _run(spark, "sample_train_val_split").collect()
    total = sum(r["n_docs"] for r in rows)
    docs = (
        _run(spark, "sample_stratified_quota")
        .sparkSession.read.parquet(f"{SF}/documents.parquet")
        .count()
    )
    assert total == docs  # every doc in exactly one split
    by_split = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    assert by_split["train"] > by_split.get("val", 0)
    assert by_split["train"] > by_split.get("test", 0)


def test_quota_sample_exact_and_stable(spark):
    out = _run(spark, "sample_stratified_quota")
    sizes = out.groupBy("lang", "source").count().collect()
    assert all(r["count"] <= 50 for r in sizes)
    again = {tuple(r) for r in _run(spark, "sample_stratified_quota").collect()}
    assert {tuple(r) for r in out.collect()} == again


def test_temperature_rates_invariants(spark):
    rows = _run(spark, "mix_temperature_rates").collect()
    assert len(rows) >= 2
    # the largest language is the anchor: factor exactly 1.0
    biggest = max(rows, key=lambda r: r["n_tokens"])
    assert biggest["sample_factor"] == 1.0
    # alpha=0.5 flattens: smaller languages get factor >= 1 (upsampled),
    # and the factor is monotone non-increasing in token mass
    ordered = sorted(rows, key=lambda r: r["n_tokens"])
    factors = [r["sample_factor"] for r in ordered]
    assert all(f >= 1.0 for f in factors)
    assert factors == sorted(factors, reverse=True)
    # resulting token mass ~ t^0.5: ratio of resampled masses matches
    # sqrt ratio of original masses (within rounding slack)
    import math

    a, b = ordered[0], ordered[-1]
    got = (a["n_tokens"] * a["sample_factor"]) / (
        b["n_tokens"] * b["sample_factor"]
    )
    want = math.sqrt(a["n_tokens"] / b["n_tokens"])
    assert abs(got - want) < 1e-4


def test_shuffle_order_is_a_permutation_and_stable(spark):
    out = _run(spark, "shuffle_deterministic_order").collect()
    n_docs = (
        _run(spark, "sample_stratified_quota")
        .sparkSession.read.parquet(f"{SF}/documents.parquet")
        .count()
    )
    assert len(out) == n_docs
    assert len({r["doc_id"] for r in out}) == n_docs
    # positions within each shard are 1..len(shard) with no gaps
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r["pos_in_shard"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # shards are reasonably balanced (hash-uniform): no shard > 3x mean
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) <= 3 * (sum(sizes) / len(sizes))
    # rerun is byte-identical
    again = _run(spark, "shuffle_deterministic_order").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


def test_shuffle_order_differs_from_id_order(spark):
    out = _run(spark, "shuffle_deterministic_order").collect()
    ids_in_shuffle_order = [r["doc_id"] for r in out]
    assert ids_in_shuffle_order != sorted(ids_in_shuffle_order)


def test_leakage_free_split_keeps_dup_groups_together(spark, oracle_sf_dir):
    """The property the operator exists for: EVERY >=0.5-Jaccard near-dup
    pair must land in the same split under group-keyed assignment —
    and the plain per-doc split must demonstrably violate it on this
    corpus (else the test is vacuous)."""
    from pyspark.sql import functions as F

    from xmlstreamprocessor_spark.operators.dedup import _jaccard_pairs_auto
    from xmlstreamprocessor_spark.operators.graph import (
        graph_components_dup_groups,
    )
    from xmlstreamprocessor_spark.operators.sampling import _hash_bucket

    comp = graph_components_dup_groups(spark, oracle_sf_dir)
    group = {r["doc_id"]: r["component"] for r in comp.collect()}

    def split_of(key):
        import hashlib
        b = int(hashlib.md5(str(key).encode()).hexdigest()[:7], 16) % 1000
        return "train" if b < 850 else ("val" if b < 925 else "test")

    pairs = _jaccard_pairs_auto(spark, oracle_sf_dir, 0.5).collect()
    assert pairs
    leaky_plain = 0
    for r in pairs:
        a, b = r["doc_a"], r["doc_b"]
        ga, gb = group.get(a, a), group.get(b, b)
        # group-keyed: same component => same key => same split
        assert ga == gb
        assert split_of(ga) == split_of(gb)
        if split_of(a) != split_of(b):
            leaky_plain += 1
    assert leaky_plain > 0  # the per-doc split WOULD leak on this corpus


def test_dsir_weights_separate_target_like_docs(spark, tmp_path):
    """DSIR pins (r11 verdict #6 done-criteria): (1) importance weights
    are DETERMINISTIC — two runs return identical rows; (2) the resample
    hits the target distribution — raw docs written in the target
    domain's vocabulary outweigh (and outrank, Gumbel noise included)
    raw docs written in a disjoint vocabulary, because every A-token's
    bucket has high p_target/p_raw and every B-token's the inverse.
    Doc length (~16 tokens) is chosen so the weight gap (tens of nats)
    dwarfs the bounded Gumbel term (<= ~7.6 nats), making the ranking
    assertion noise-proof by construction."""
    from xmlstreamprocessor_spark.operators.registry import REGISTRY

    a_words = "alpha beta gamma delta epsilon zeta eta theta"
    b_words = "omega sigma tau rho kappa lambda mu nu"
    rows = []
    did = 0
    for _ in range(30):  # target: English docs in vocabulary A
        rows.append((did, f"{a_words} {a_words}", "en", "srcT")); did += 1
    for _ in range(20):  # raw, target-like (vocabulary A)
        rows.append((did, f"{a_words} {a_words}", "fr", "srcA")); did += 1
    for _ in range(20):  # raw, off-target (vocabulary B)
        rows.append((did, f"{b_words} {b_words}", "de", "srcB")); did += 1
    # NULL text must score logw=0 on BOTH engines (code-review r12: a
    # NULL feature array would propagate NULL through Spark's scoring
    # fold while the oracle coalesces to 0)
    rows.append((did, None, "de", "srcNull")); did += 1
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("bigint"))
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/documents.parquet")

    fn, _ = REGISTRY["mix_dsir_importance_resample"]
    got1 = [tuple(r) for r in fn(spark, sf).collect()]
    got2 = [tuple(r) for r in fn(spark, sf).collect()]
    assert got1 == got2 and len(got1) == 41  # deterministic; all raw docs
    null_rows = [r for r in got1 if r[2] == "srcNull"]
    assert len(null_rows) == 1 and null_rows[0][3] == 0.0
    by_src = {}
    for r in fn(spark, sf).collect():
        by_src.setdefault(r["source"], []).append(r)
    # every target-like doc outweighs every off-target doc
    assert min(r["log_weight"] for r in by_src["srcA"]) > max(
        r["log_weight"] for r in by_src["srcB"]
    )
    # and the Gumbel-ranked resample preserves that: the top 20 by score
    # are exactly the target-like docs (gap >> Gumbel range).  Row tuple
    # layout: (doc_id, lang, source, log_weight, score)
    top20 = sorted(got1, key=lambda r: (-r[4], r[0]))[:20]
    assert all(r[2] == "srcA" for r in top20)
