"""Scale-path dedup variants must agree with their exact kernels.

The registered queries use bucketed plans (prefix-filtered similarity
join, RP-LSH banded cosine candidates); the naive quadratic kernels stay
in the package purely as verification twins.  These tests pin the
contract between the two on the deterministic sf0.01 tables.
"""

from xmlstreamprocessor_spark.operators.dedup import (
    _jaccard_pairs,
    dedup_embedding_cosine_pairs,
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


def test_jaccard_auto_picks_prefix_on_skewed_vocab(spark, oracle_sf_dir):
    """The cost-based chooser must route a Zipfian corpus (one shingle in
    every doc) to the prefix path, and still return exact results.  A
    corpus where every doc shares a hot 3-gram makes sum(df^2) ~ n^2
    postings-join rows, far past any linear bound."""
    from xmlstreamprocessor_spark.operators.dedup import _jaccard_pairs_auto

    hot = "the quick brown"  # one shared 3-gram across all docs
    rows = [
        (i, f"{hot} doc {i % 7} body variant {i % 7} tail {i % 7}")
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = _pairs(
        _jaccard_pairs_auto(spark, oracle_sf_dir, 0.5, docs=docs, max_blowup=4),
        "doc_a", "doc_b", "jaccard",
    )
    want = _pairs(
        _jaccard_pairs(spark, oracle_sf_dir, 0.5, docs=docs),
        "doc_a", "doc_b", "jaccard",
    )
    assert got == want and len(got) > 0


def test_embedding_lsh_subset_of_exact_with_equal_scores(spark, oracle_sf_dir):
    """Every LSH-bucketed pair must appear in the exact all-pairs result
    with a bit-identical rounded cosine; recall at the loose 0.4 threshold
    is bounded below (deterministic data + deterministic hyperplanes)."""
    lsh = _pairs(
        dedup_embedding_cosine_pairs(spark, oracle_sf_dir), "vec_a", "vec_b", "cos_sim"
    )
    exact = _pairs(
        embedding_cosine_pairs_exact(spark, oracle_sf_dir), "vec_a", "vec_b", "cos_sim"
    )
    assert set(lsh) <= set(exact)
    assert all(lsh[k] == exact[k] for k in lsh)
    # 4 bands x 4 bits at cos>=0.4 gives ~0.5 recall analytically; this
    # dataset is fixed, so pin a floor that catches banding regressions
    assert len(lsh) >= 0.45 * len(exact)
