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
