"""CorpusPipeline: the fluent DataFrame-level composition surface.  Steps
must equal the verified registry kernels they delegate to, stay
deterministic, and compose without mutating the input frame."""

from pyspark.sql import functions as F

from xmlstreamprocessor_spark.pipeline import CorpusPipeline

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_dedup_exact_matches_registry_semantics(spark):
    docs = _docs(spark)
    out = CorpusPipeline(docs).dedup_exact().df
    # same number of survivors as distinct normalized hashes
    norm = F.md5(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ").cast(
            "binary"
        )
    )
    assert out.count() == docs.select(norm.alias("h")).distinct().count()
    # survivors are the min doc_id of each group
    again = CorpusPipeline(docs).dedup_exact().df
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in out.collect()
    )


def test_dedup_near_drops_same_docs_as_drop_list(spark, oracle_sf_dir):
    from xmlstreamprocessor_spark.operators.registry import REGISTRY

    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    out = CorpusPipeline(docs).dedup_near(threshold=0.5).df
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    drop_list = {
        r["drop_doc_id"]
        for r in REGISTRY["dedup_drop_list"][0](spark, oracle_sf_dir).collect()
    }
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert kept == all_ids - drop_list


def test_decontaminate_removes_overlapping_docs(spark, oracle_sf_dir):
    from xmlstreamprocessor_spark.operators.registry import REGISTRY
    from xmlstreamprocessor_spark.operators.textops import _EVAL_DOCS

    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    train = docs.filter(F.col("doc_id") >= _EVAL_DOCS)
    evald = docs.filter(F.col("doc_id") < _EVAL_DOCS)
    out = CorpusPipeline(train).decontaminate(evald, n=4).df
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    flagged = {
        r["doc_id"]
        for r in REGISTRY["text_decontaminate_overlap"][0](
            spark, oracle_sf_dir
        ).collect()
    }
    train_ids = {r["doc_id"] for r in train.select("doc_id").collect()}
    assert kept == train_ids - flagged


def test_mix_split_chunk_compose(spark):
    docs = _docs(spark)
    p = CorpusPipeline(docs).mix_by_rate({"en": 1000, "de": 500}, default_rate=800)
    n_mixed = p.df.count()
    assert 0 < n_mixed < docs.count()
    train, val, test = p.split()
    assert train.df.count() + val.df.count() + test.df.count() == n_mixed
    chunks = train.chunk(window=64, stride=48).df
    assert chunks.count() >= train.df.count()
    row = chunks.first()
    assert {"chunk_idx", "start_word", "n_words", "chunk_md5"} <= set(
        chunks.columns
    )
    # chunk text really is the window the metadata describes
    assert len(row["text"].split()) == row["n_words"]
    # determinism end-to-end
    again = (
        CorpusPipeline(docs)
        .mix_by_rate({"en": 1000, "de": 500}, default_rate=800)
        .split()[0]
        .chunk(window=64, stride=48)
        .df
    )
    assert sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_md5"]) for r in again.collect()
    ) == sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_md5"]) for r in chunks.collect()
    )


def test_pipeline_requires_expected_columns(spark):
    import pytest

    bad = _docs(spark).drop("text")
    with pytest.raises(ValueError, match="text"):
        CorpusPipeline(bad)


def test_lm_filter_and_pack_plan_compose(spark):
    docs = _docs(spark)
    p = CorpusPipeline(docs).lm_filter(keep_threshold=-3.45)
    n_kept = p.df.count()
    assert 0 < n_kept <= docs.count()
    bins = p.chunk(window=64, stride=48).pack_plan(cap=2048)
    rows = bins.collect()
    assert rows and [r["bin_id"] for r in rows] == list(range(len(rows)))
    # conservation: packed words == words of the chunked survivor corpus
    from pyspark.sql import functions as F

    chunked = CorpusPipeline(docs).lm_filter(-3.45).chunk(64, 48).df
    total = chunked.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
    ).collect()[0][0]
    assert sum(r["total_words"] for r in rows) == total


def test_pipeline_survives_null_and_empty_text(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [None, "", "   ", "real words here for a document"],
                "lang": ["en"] * 4,
            }
        ),
        schema="doc_id long, text string, lang string",
    )
    # exact dedup groups: NULL, normalized-empty ("" and "   " collapse),
    # and the real doc
    assert CorpusPipeline(df).dedup_exact().df.count() == 3
    # near-dedup: nothing shingles, nothing pairs, all four survive
    assert CorpusPipeline(df).dedup_near(0.5).df.count() == 4
    # chunking drops the NULL row (no content), keeps degenerate empties
    chunks = CorpusPipeline(df).chunk().df
    assert {r["doc_id"] for r in chunks.collect()} == {2, 3, 4}
    # lm_filter drops scoreless (<2-word) docs by contract
    kept = CorpusPipeline(df).lm_filter().df
    assert {r["doc_id"] for r in kept.collect()} == {4}


def test_dedup_near_richest_keeper(spark, oracle_sf_dir):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet")
    min_id = CorpusPipeline(docs).dedup_near(0.5, keeper="min_id").df
    richest = CorpusPipeline(docs).dedup_near(0.5, keeper="richest").df
    # same number of survivors (one keeper per component either way)
    assert min_id.count() == richest.count()
    # the richest keeper set matches dedup_keeper_by_quality's choices
    from xmlstreamprocessor_spark.operators.registry import REGISTRY

    quality = REGISTRY["dedup_keeper_by_quality"][0](spark, oracle_sf_dir)
    expected_keepers = {r["keeper_doc"] for r in quality.collect()}
    kept = {r["doc_id"] for r in richest.select("doc_id").collect()}
    assert expected_keepers <= kept
    # and none of the non-keeper group members survive
    comps = REGISTRY["graph_components_dup_groups"][0](spark, oracle_sf_dir)
    chars = {r["doc_id"]: r["n_chars"] for r in docs.select("doc_id", "n_chars").collect()}
    by_comp = {}
    for r in comps.collect():
        by_comp.setdefault(r["component"], []).append(r["doc_id"])
    for members in by_comp.values():
        if len(members) > 1:
            best = sorted(members, key=lambda d: (-chars[d], d))[0]
            assert set(members) & kept == {best}
    import pytest

    with pytest.raises(ValueError, match="keeper"):
        CorpusPipeline(docs).dedup_near(0.5, keeper="banana")
