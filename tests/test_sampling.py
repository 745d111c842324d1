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
