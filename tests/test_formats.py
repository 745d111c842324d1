"""Connector round-trips: parquet/csv/json write -> read preserves values,
partitioned layout prunes, bucketed join plans without a shuffle on the
bucketed side."""

from pyspark.sql import functions as F

from xmlstreamprocessor_spark import catalog
from xmlstreamprocessor_spark.sources import formats

SF = "/root/testdata/sf0.001"


def _nation(spark):
    return catalog.load(spark, SF, "nation")


def test_parquet_roundtrip(spark, tmp_path):
    df = _nation(spark)
    formats.write_parquet(df, str(tmp_path / "n"))
    back = formats.read_parquet(spark, str(tmp_path / "n"))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_csv_roundtrip_with_schema(spark, tmp_path):
    df = _nation(spark)
    formats.write_csv(df, str(tmp_path / "n"))
    back = formats.read_csv(
        spark,
        str(tmp_path / "n"),
        schema="n_nationkey bigint, n_name string, n_regionkey bigint",
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_json_roundtrip(spark, tmp_path):
    df = _nation(spark)
    formats.write_json(df, str(tmp_path / "n"))
    back = formats.read_json(
        spark,
        str(tmp_path / "n"),
        schema="n_nationkey bigint, n_name string, n_regionkey bigint",
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_partitioned_write_prunes(spark, tmp_path):
    df = catalog.load(spark, SF, "orders")
    formats.write_partitioned(df, str(tmp_path / "o"), ["o_orderstatus"])
    back = formats.read_parquet(spark, str(tmp_path / "o"))
    pruned = back.filter(F.col("o_orderstatus") == "F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter must reach the scan, not run as a post-scan Filter
    assert "PartitionFilters" in plan
    assert pruned.count() == df.filter(F.col("o_orderstatus") == "F").count()


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    orders = catalog.load(spark, SF, "orders")
    lineitem = catalog.load(spark, SF, "lineitem")
    formats.write_bucketed(
        orders, "t_orders_b", "o_orderkey", n_buckets=8, path=str(tmp_path / "ob")
    )
    formats.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        "o_orderkey",
        n_buckets=8,
        path=str(tmp_path / "lb"),
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_orders_b").join(spark.table("t_lineitem_b"), "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # co-bucketed equi-join: SortMergeJoin with zero Exchange operators
        assert "Exchange" not in plan
        assert j.count() == lineitem.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_write_zordered_tightens_file_ranges(spark, tmp_path):
    """Z-ordered files must each cover a tight range of BOTH clustering
    columns (that's what lets parquet min/max footers prune files for
    predicates on either column); a hash-repartitioned layout covers
    nearly the full domain in every file."""
    import glob

    import duckdb

    from xmlstreamprocessor_spark.sources.formats import write_zordered

    df = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").select(
        "o_custkey", "o_totalprice"
    )
    plain = str(tmp_path / "plain")
    zpath = str(tmp_path / "z")
    df.repartition(8).write.parquet(plain)
    write_zordered(df, zpath, ["o_custkey", "o_totalprice"], n_files=8)

    con = duckdb.connect()
    lo_c, hi_c, lo_p, hi_p = con.execute(
        f"SELECT min(o_custkey), max(o_custkey), min(o_totalprice),"
        f" max(o_totalprice) FROM '{plain}/*.parquet'"
    ).fetchone()

    def spans(path, col, lo, hi):
        out = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            mn, mx = con.execute(
                f"SELECT min({col}), max({col}) FROM '{f}'"
            ).fetchone()
            if mn is not None:
                out.append((mx - mn) / (hi - lo))
        return out

    import statistics

    for col, lo, hi in (("o_custkey", lo_c, hi_c), ("o_totalprice", lo_p, hi_p)):
        z = spans(zpath, col, lo, hi)
        p = spans(plain, col, lo, hi)
        plain_avg = sum(p) / len(p)
        z_avg = sum(z) / len(z)
        assert plain_avg > 0.9, (col, plain_avg)  # hash layout: no pruning
        # repartitionByRange derives bounds from session-state-seeded
        # sampling, so ONE file's range can straddle a bad bound on any
        # given run — pin the robust statistic (median file stays tight)
        # plus a relative mean bound instead of a hard mean cutoff
        assert statistics.median(z) < 0.6, (col, sorted(z))
        assert z_avg < 0.75 * plain_avg, (col, z_avg, plain_avg)


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    df = catalog.load(spark, SF, "orders")
    formats.write_orc(df, str(tmp_path / "o_orc"))
    back = formats.read_orc(spark, str(tmp_path / "o_orc"))
    assert back.count() == df.count()
    pruned = back.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # predicate and projection must reach the ORC scan
    assert "PushedFilters" in plan and "o_orderstatus" in plan
    assert pruned.count() == df.filter(F.col("o_orderstatus") == "F").count()


def test_compact_small_files(spark, tmp_path):
    df = catalog.load(spark, SF, "orders")
    frag = str(tmp_path / "frag")
    df.repartition(40).write.parquet(frag)  # fragment: 40 tiny files
    import glob

    assert len(glob.glob(f"{frag}/*.parquet")) == 40
    before = sorted(map(tuple, spark.read.parquet(frag).collect()))
    n = formats.compact_small_files(spark, frag, target_mb=128)
    files = glob.glob(f"{frag}/*.parquet")
    assert len(files) == n and n < 40
    assert sorted(map(tuple, spark.read.parquet(frag).collect())) == before


def test_avro_roundtrip_or_clear_guidance(spark, tmp_path):
    """Avro connector contract: when spark-avro is on the classpath the
    round-trip must be lossless; when it is not (this container), the
    helpers fail fast with deploy guidance instead of a cryptic
    ClassNotFound from deep inside the writer."""
    import pytest

    df = catalog.load(spark, SF, "nation")
    path = str(tmp_path / "avro")
    if formats.avro_available(spark):
        formats.write_avro(df, path)
        back = formats.read_avro(spark, path)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    else:
        with pytest.raises(RuntimeError, match="spark-avro"):
            formats.write_avro(df, path)
        with pytest.raises(RuntimeError, match="spark-avro"):
            formats.read_avro(spark, path)
