"""The general asof_join operator vs pandas.merge_asof ground truth on the
events table (backward/forward, with and without tolerance)."""

import pandas as pd
from pyspark.sql import functions as F

from xmlstreamprocessor_spark import catalog
from xmlstreamprocessor_spark.operators.asof import asof_join

SF = "/root/testdata/sf0.001"


def _frames(spark):
    e = catalog.load(spark, SF, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    return purchases, views


def _expected(purchases, views, direction, tolerance=None):
    lp = purchases.toPandas().sort_values(["ts", "purchase_id"])
    rv = views.toPandas().sort_values(["ts", "view_id"])
    kw = {"tolerance": pd.Timedelta(seconds=tolerance)} if tolerance else {}
    m = pd.merge_asof(
        lp, rv, on="ts", by="user_id", direction=direction, **kw
    )
    return {
        (int(r.purchase_id), None if pd.isna(r.view_id) else int(r.view_id))
        for r in m.itertuples()
    }


def _got(df):
    return {
        (r["purchase_id"], r["view_id_right"]) for r in df.collect()
    }


def test_asof_backward_matches_pandas(spark):
    purchases, views = _frames(spark)
    got = _got(asof_join(purchases, views, on="ts", by="user_id"))
    assert got == _expected(purchases, views, "backward") and len(got) > 0


def test_asof_forward_matches_pandas(spark):
    purchases, views = _frames(spark)
    got = _got(
        asof_join(purchases, views, on="ts", by="user_id", direction="forward")
    )
    assert got == _expected(purchases, views, "forward")


def test_asof_tolerance_nulls_far_matches(spark):
    purchases, views = _frames(spark)
    got = _got(
        asof_join(
            purchases, views, on="ts", by="user_id", tolerance_seconds=3600
        )
    )
    exp = _expected(purchases, views, "backward", tolerance=3600)
    assert got == exp
    # tolerance only removes matches, never rows
    assert len(got) == len(_expected(purchases, views, "backward"))


def test_interval_join_bucketized_matches_naive_and_avoids_bnlj(spark, oracle_sf_dir):
    from pyspark.sql import functions as F

    from xmlstreamprocessor_spark.operators.registry import REGISTRY
    from xmlstreamprocessor_spark.operators.temporal import (
        _IVL_LEN_S,
        _IVL_N,
        _IVL_SPACING_S,
    )

    out = REGISTRY["interval_join_bucketized_incidents"][0](
        spark, oracle_sf_dir
    )
    rows = out.collect()
    assert len(rows) == _IVL_N

    # naive reference: BNLJ containment join, same windows
    e = spark.read.parquet(f"{oracle_sf_dir}/events.parquet").select(
        F.unix_timestamp("ts").alias("es"), "user_id"
    )
    t0 = e.agg(
        (F.floor(F.min("es") / 3600) * 3600).cast("bigint").alias("t0")
    ).collect()[0]["t0"]
    naive = {}
    wins = [
        (k, t0 + k * _IVL_SPACING_S, t0 + k * _IVL_SPACING_S + _IVL_LEN_S)
        for k in range(_IVL_N)
    ]
    ev = e.collect()
    for k, lo, hi in wins:
        in_w = [r for r in ev if lo <= r["es"] < hi]
        naive[k] = (len(in_w), len({r["user_id"] for r in in_w}))
    for r in rows:
        assert (r["n_events"], r["n_users"]) == naive[r["window_id"]]

    # the plan must be equi-join shaped: never a nested-loop containment probe
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_registered_forward_query_matches_pandas(spark):
    """The oracle-paired forward+tolerance query
    (asof_forward_view_next_purchase) against pandas merge_asof ground
    truth: views left, next purchase within 24h, lowest purchase_id on
    timestamp ties (right frame pre-sorted by (ts, id) so pandas' stable
    first-match picks the same row)."""
    from xmlstreamprocessor_spark.operators.registry import REGISTRY

    purchases, views = _frames(spark)
    lp = views.toPandas().sort_values(["ts", "view_id"])
    rv = purchases.toPandas().sort_values(["ts", "purchase_id"])
    m = pd.merge_asof(
        lp, rv, on="ts", by="user_id", direction="forward",
        tolerance=pd.Timedelta(seconds=86400),
    )
    want = {
        (int(r.view_id), None if pd.isna(r.purchase_id) else int(r.purchase_id))
        for r in m.itertuples()
    }
    got = {
        (r["view_id"], r["purchase_id"])
        for r in REGISTRY["asof_forward_view_next_purchase"][0](
            spark, SF
        ).collect()
    }
    assert got == want and len(got) > 0
