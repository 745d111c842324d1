#!/usr/bin/env python3
"""r11 verdict #1: attribute the exact-Jaccard kernel's sf1 wall.

``dedup_ngram_jaccard_pairs`` measures 210.7 s cold at sf1 (r10 addendum
E), up ~40 s from the pre-r9 chain after the DISK_ONLY candidate-count
probe + postings routing landed.  This tool decomposes that wall and A/Bs
the judge-proposed alternative (route the verify by an UPPER BOUND on the
candidate count computed from prefix-postings stats, skipping the count
job when the bound alone decides).

Phase A — one instrumented pass of the CURRENT chain with per-stage
walls (stats/routing job incl. the postings persist fill; candidate
join + DISK_ONLY probe count; probe read-back; verify + pair
materialization), plus the bucket bound's own wall and value vs the
actual candidate count (tightness).

Phase B — serialized cold A/B, interleaved, 3 rounds each (medians).
Phase A's sf1 numbers reframed the question: the probe (8.4 s incl. the
candidate join itself) and the bound job (4.0 s) are NOISE next to the
postings VERIFY of the prefix path's 30.9 M candidates (327.5 s — cand x
~53 shingles/doc ~ 1.6 B rows through the first verify join), while the
DIRECT postings self-join that max_blowup=64 routed AWAY from is exactly
sum(df^2) = 279 M rows — ~6x fewer.  So the A/B that matters:
  V0  current registered kernel (prefix + cost-routed verify)
  V3  direct postings self-join (_jaccard_pairs with the cached
      postings) + the same DISK_ONLY pair-materialization protocol
Each variant's pair set is asserted identical once.

Usage: python tools/bench_jaccard_attrib.py [sf_dir]   (default .scale/sf1)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from xmlstreamprocessor_spark.functions.text import shingles  # noqa: E402
from xmlstreamprocessor_spark.operators import REGISTRY  # noqa: E402
from xmlstreamprocessor_spark.operators.dedup import (  # noqa: E402
    _VERIFY_ARRAYS_MAX_CAND,
    clear_session_memos,
)
from xmlstreamprocessor_spark.operators.registry import t  # noqa: E402
from xmlstreamprocessor_spark.session import get_session  # noqa: E402

THR = 0.5
LIMIT = 100_000


def _postings(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    sh = d.select("doc_id", shingles("text").alias("s")).withColumn(
        "n", F.size("s")
    )
    return (
        sh.filter(F.col("n") > 0)
        .select("doc_id", "n", F.explode("s").alias("shingle"))
    )


def _prefix(e):
    """df-order prefix postings from cached postings e (mirrors
    _jaccard_pairs_prefix's postings+df shortcut, dedup.py)."""
    plen = F.greatest(
        F.lit(1),
        (
            F.col("n")
            - F.ceil(F.lit(THR) * F.col("n") - F.lit(1e-9))
            + F.lit(1)
        ).cast("int"),
    )
    df_tbl = e.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    return (
        e.join(df_tbl, "shingle")
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= plen)
        .select("doc_id", "n", "shingle")
    )


def _candidates(pref):
    a = pref.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"), "shingle")
    b = pref.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"), "shingle")
    return (
        a.join(b, "shingle")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("na") * F.lit(THR) <= F.col("nb"))
            & (F.col("nb") * F.lit(THR) <= F.col("na"))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


def _verify(spark, sf_dir, cand, arrays: bool):
    """Mirror of _verify_jaccard's two post-probe plans (dedup.py)."""
    d = t(spark, sf_dir, "documents")
    cand_ids = cand.select(F.col("doc_a").alias("doc_id")).union(
        cand.select(F.col("doc_b").alias("doc_id"))
    )
    d = d.join(cand_ids, "doc_id", "left_semi")
    sh = d.select("doc_id", shingles("text").alias("s")).withColumn(
        "n", F.size("s")
    )
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    if not arrays:
        e = sh.select("doc_id", "n", F.explode("s").alias("shingle"))
        nn = sh.select("doc_id", "n")
        common = (
            cand.join(
                e.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a"
            )
            .join(
                e.select(F.col("doc_id").alias("doc_b"), "shingle"),
                ["doc_b", "shingle"],
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        verified = common.join(
            nn.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        ).join(
            nn.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
    else:
        sh = sh.repartition(F.col("doc_id"))
        verified = (
            cand.join(
                sh.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("s").alias("sa"),
                    F.col("n").alias("na"),
                ),
                "doc_a",
            )
            .join(
                sh.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("s").alias("sb"),
                    F.col("n").alias("nb"),
                ),
                "doc_b",
            )
            .withColumn("n_common", F.size(F.array_intersect("sa", "sb")))
        )
    return verified.filter(jac >= THR).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )


def _materialize_pairs(pairs):
    pairs = pairs.persist(StorageLevel.DISK_ONLY)
    try:
        # full collect (pairs are 3 scalars/row — MBs even at sf1), so
        # variant pair SETS can be compared for exact equality
        return pairs.collect()
    finally:
        pairs.unpersist()


def phase_a(spark, sf_dir):
    print("## Phase A — instrumented single pass (current chain)", flush=True)
    clear_session_memos()
    walls = {}
    e = _postings(spark, sf_dir).persist()
    t0 = time.perf_counter()
    stats = (
        e.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(
            F.sum(F.col("df") * F.col("df")).alias("join_rows"),
            F.sum("df").alias("postings"),
        )
        .first()
    )
    walls["stats_job_incl_postings_fill"] = time.perf_counter() - t0
    prefix_branch = stats["join_rows"] > 64 * stats["postings"]
    print(
        f"join_rows={stats['join_rows']:,} postings={stats['postings']:,} "
        f"ratio={stats['join_rows']/stats['postings']:.1f} "
        f"branch={'prefix' if prefix_branch else 'direct-postings'}",
        flush=True,
    )
    pref = _prefix(e)
    t0 = time.perf_counter()
    bound = pref.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("c")
    ).agg(
        F.sum(F.expr("c * (c - 1) DIV 2")).alias("bound")
    ).first()["bound"]
    walls["bound_job_unpersisted_pref"] = time.perf_counter() - t0

    cand = _candidates(pref).persist(StorageLevel.DISK_ONLY)
    t0 = time.perf_counter()
    n_cand = cand.count()
    walls["cand_join_plus_probe_count"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    cand.count()
    walls["probe_recount_from_disk"] = time.perf_counter() - t0
    print(
        f"bound={bound:,} actual_cand={n_cand:,} "
        f"tightness={bound / max(n_cand, 1):.2f}x "
        f"(arrays knee {_VERIFY_ARRAYS_MAX_CAND:,})",
        flush=True,
    )
    arrays = n_cand <= _VERIFY_ARRAYS_MAX_CAND
    t0 = time.perf_counter()
    head = _materialize_pairs(_verify(spark, sf_dir, cand, arrays))
    walls[f"verify_{'arrays' if arrays else 'postings'}_plus_materialize"] = (
        time.perf_counter() - t0
    )
    cand.unpersist()
    e.unpersist()
    print(f"pairs={len(head)}", flush=True)
    for k, v in walls.items():
        print(f"  {k}: {v:.2f}s", flush=True)
    print(f"  SUM: {sum(walls.values()):.2f}s", flush=True)
    return {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in head}


def run_v0(spark, sf_dir):
    fn, _ = REGISTRY["dedup_ngram_jaccard_pairs"]
    df = fn(spark, sf_dir)
    return {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in df.collect()}


def run_v3(spark, sf_dir):
    """Direct postings self-join end-to-end: stats job (unchanged — it
    doubles as the postings cache fill), then _jaccard_pairs on the
    cached postings, then the DISK_ONLY materialization protocol."""
    from xmlstreamprocessor_spark.operators.dedup import _jaccard_pairs

    e = _postings(spark, sf_dir).persist()
    try:
        e.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).agg(
            F.sum(F.col("df") * F.col("df")).alias("join_rows"),
            F.sum("df").alias("postings"),
        ).first()
        head = _materialize_pairs(_jaccard_pairs(spark, sf_dir, THR, postings=e))
        return {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in head}
    finally:
        e.unpersist()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1"
    spark = get_session("xsp-jac-attrib")
    spark.range(100).select(F.sum("id")).collect()  # absorb session start
    print(f"# sf_dir={sf_dir}", flush=True)

    golden = None
    if not os.environ.get("JAC_ATTRIB_SKIP_A"):
        golden = phase_a(spark, sf_dir)
        if os.environ.get("JAC_ATTRIB_PHASE_A_ONLY"):
            return

    print("## Phase B — cold A/B, interleaved x3", flush=True)
    variants = {"v0_current": run_v0, "v3_direct_selfjoin": run_v3}
    walls: dict[str, list[float]] = {k: [] for k in variants}
    checked = set()
    for rnd in range(3):
        for name, fn in variants.items():
            clear_session_memos()
            t0 = time.perf_counter()
            got = fn(spark, sf_dir)
            w = time.perf_counter() - t0
            walls[name].append(w)
            if golden is None:
                golden = got  # first run anchors the cross-variant check
            if name not in checked:
                assert got == golden, (
                    f"{name} pair-set mismatch: {len(got)} vs {len(golden)}"
                )
                checked.add(name)
            print(f"  round{rnd} {name}: {w:.2f}s ({len(got)} pairs)",
                  flush=True)
    print("## medians", flush=True)
    for name, ws in walls.items():
        print(
            f"{name}: {statistics.median(ws):.2f}s of "
            f"{[round(w, 2) for w in ws]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
