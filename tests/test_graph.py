"""Connected components (large-star/small-star) on known topologies."""

from xmlstreamprocessor_spark.operators.graph import connected_components


def _resolve(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


def test_cc_two_components(spark):
    # triangle {1,2,3} + pair {10,11}
    got = _resolve(spark, [(1, 2), (2, 3), (3, 1), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_chain_converges_fast(spark):
    # a 32-node chain has diameter 31 — label propagation would need 31
    # rounds; alternating star closes it within the default max_iter
    edges = [(i, i + 1) for i in range(31)]
    got = _resolve(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 32


def test_cc_star_and_duplicate_edges(spark):
    # duplicate + reversed edges collapse; hub is NOT the min id
    edges = [(5, 1), (5, 2), (5, 3), (1, 5), (5, 1), (5, 9)]
    got = _resolve(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 5: 1, 9: 1}


def test_cc_self_loops_dropped(spark):
    got = _resolve(spark, [(7, 7), (7, 8)])
    assert got == {7: 7, 8: 7}


def test_cc_string_ids(spark):
    df = spark.createDataFrame(
        [("b", "c"), ("c", "d"), ("x", "y")], "a string, b string"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, src="a", dst="b").collect()
    }
    assert got == {"b": "b", "c": "b", "d": "b", "x": "x", "y": "x"}
