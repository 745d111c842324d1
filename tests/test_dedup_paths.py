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
    identical pairs AND identical scores to the all-postings self-join."""
    pref = _pairs(
        dedup_ngram_jaccard_pairs(spark, oracle_sf_dir), "doc_a", "doc_b", "jaccard"
    )
    naive = _pairs(
        _jaccard_pairs(spark, oracle_sf_dir, 0.5), "doc_a", "doc_b", "jaccard"
    )
    assert pref == naive
    assert len(pref) > 0  # non-vacuous on this corpus


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
