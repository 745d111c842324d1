"""Unit tests for the text-analysis kernels on hand-built corpora (the
sf-dir queries are covered by the DuckDB oracle harness; these pin the
semantics on inputs where the expected values are computable by eye)."""

from pyspark.sql import functions as F


def test_grams_and_shingles_consistency(spark):
    """shingles == distinct(grams); grams keeps duplicates in order."""
    from xmlstreamprocessor_spark.functions.text import grams, shingles

    df = spark.createDataFrame(
        [("a b a b a",), ("x y",), ("solo",), ("",)], "text string"
    )
    got = df.select(
        grams("text", 2).alias("g"), shingles("text", 2).alias("s")
    ).collect()
    assert got[0]["g"] == ["a b", "b a", "a b", "b a"]
    assert got[0]["s"] == ["a b", "b a"]
    assert got[1]["g"] == ["x y"]
    assert got[2]["g"] == []  # < n words
    assert got[3]["g"] == []


def test_repetition_filter_flags_degenerate_docs(spark):
    """A doc that is one phrase looped must fail the keep gate; a
    no-repeat doc must pass with zero fractions."""
    from xmlstreamprocessor_spark.operators.textops import text_repetition_filter

    docs = spark.createDataFrame(
        [
            (1, "spam ham spam ham spam ham spam ham spam ham"),
            (2, "every word here is written exactly once today"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in text_repetition_filter(spark, None, docs=docs).collect()
    }
    looped, clean = rows[1], rows[2]
    # 10 words, 2 unique; 9 bigrams, "spam ham" x5; all 8 trigrams repeat
    assert looped["n_words"] == 10 and looped["dup_word_frac"] == 0.8
    assert looped["top_bigram_frac"] == round(5 / 9, 6)
    assert looped["dup_3gram_frac"] == 1.0
    assert looped["keep"] is False
    assert clean["dup_word_frac"] == 0.0
    assert clean["top_bigram_frac"] == round(1 / 7, 6)
    assert clean["dup_3gram_frac"] == 0.0
    assert clean["keep"] is True
