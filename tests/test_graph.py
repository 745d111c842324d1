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


def test_cc_scales_to_pseudorandom_graph(spark):
    """100k-edge pseudo-random functional graph, generated executor-side
    (never on the driver): CC must converge within the default round cap
    and produce labels consistent across EVERY edge (both endpoints in the
    same component) — the invariant that survives any graph shape."""
    from pyspark.sql import functions as F

    n_nodes = 200_000
    edges = spark.range(100_000).select(
        (F.col("id") % n_nodes).alias("src"),
        ((F.col("id") * 2654435761) % n_nodes).alias("dst"),
    )
    comp = connected_components(edges).cache()
    # every edge endpoint pair maps to the same component
    inconsistent = (
        edges.filter(F.col("src") != F.col("dst"))
        .join(comp.withColumnRenamed("node", "src").withColumnRenamed("component", "ca"), "src")
        .join(comp.withColumnRenamed("node", "dst").withColumnRenamed("component", "cb"), "dst")
        .filter(F.col("ca") != F.col("cb"))
        .count()
    )
    assert inconsistent == 0
    # every component label is the minimum of its members
    bad_label = (
        comp.groupBy("component")
        .agg(F.min("node").alias("mn"))
        .filter(F.col("component") != F.col("mn"))
        .count()
    )
    assert bad_label == 0


def test_cc_distributed_path_equals_local_finisher(spark):
    """local_threshold=0 forces the alternating-star rounds; the labels
    must be identical to the (default) driver-side union-find on the same
    topologies — the two regimes of the cost-based finisher agree."""
    cases = [
        [(1, 2), (2, 3), (3, 1), (10, 11)],
        [(i, i + 1) for i in range(31)],          # diameter-31 chain
        [(100, 5), (100, 6), (6, 5), (5, 100)],   # dup + reversed edges
    ]
    for edges in cases:
        dist = _resolve(spark, edges, local_threshold=0)
        local = _resolve(spark, edges)
        assert dist == local and len(local) > 0


def test_keeper_by_quality_picks_richest_per_component(spark, oracle_sf_dir):
    from xmlstreamprocessor_spark.operators.registry import REGISTRY

    keepers = REGISTRY["dedup_keeper_by_quality"][0](spark, oracle_sf_dir)
    comps = REGISTRY["graph_components_dup_groups"][0](spark, oracle_sf_dir)
    docs = spark.read.parquet(f"{oracle_sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    by_comp = {}
    chars = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    for r in comps.collect():
        by_comp.setdefault(r["component"], []).append(r["doc_id"])
    rows = keepers.collect()
    assert len(rows) > 0
    seen = set()
    for r in rows:
        members = by_comp[r["component"]]
        assert r["n_docs"] == len(members) > 1
        best = sorted(members, key=lambda d: (-chars[d], d))[0]
        assert r["keeper_doc"] == best
        assert r["keeper_chars"] == chars[best]
        seen.add(r["component"])
    # every multi-doc component got exactly one keeper row
    assert seen == {c for c, m in by_comp.items() if len(m) > 1}


def test_merge_components_property_random_graphs(spark):
    """Property test of the star-equivalence theorem behind
    merge_components: for ANY random edge set split into base/delta, the
    fold of delta edges into CC(base) — with base labels built by a
    reference union-find (min-id member labels, the documented
    precondition) — must equal union-find over ALL edges.  Exercises
    group fusion through delta docs, untouched components, singletons,
    and empty base/delta splits that the fixed corpus tests can't vary."""
    from hypothesis import given, settings, strategies as st

    from xmlstreamprocessor_spark.operators.graph import merge_components

    def uf_components(nodes, edges):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in nodes}

    edge = st.tuples(
        st.integers(min_value=0, max_value=14),
        st.integers(min_value=0, max_value=14),
    ).filter(lambda e: e[0] != e[1])

    @settings(max_examples=12, deadline=None)
    @given(
        base=st.lists(edge, max_size=10),
        delta=st.lists(edge, min_size=1, max_size=6),
    )
    def check(base, delta):
        base_nodes = sorted({n for e in base for n in e})
        base_comp = uf_components(base_nodes, base)
        base_df = spark.createDataFrame(
            [(n, c) for n, c in base_comp.items()] or [],
            "node bigint, component bigint",
        )
        delta_df = spark.createDataFrame(delta, "src bigint, dst bigint")
        got = {
            (r["node"], r["component"])
            for r in merge_components(base_df, delta_df).collect()
        }
        all_nodes = sorted(set(base_nodes) | {n for e in delta for n in e})
        want = set(uf_components(all_nodes, base + delta).items())
        assert got == want

    check()
