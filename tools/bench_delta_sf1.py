#!/usr/bin/env python3
"""sf1 walls for the incremental pair-graph chain (r6 verdict task #5).

Measures, at the 10x scale dir (`.scale/sf1`, built by tools/gen_scale.py):

* ``dedup_pairs_delta``             — delta-prefix x postings exact pairs
* ``graph_components_incremental``  — delta pairs + star-merge into base CC
* ``graph_dup_group_sizes``         — the FULL recompute chain they replace

The point is the ratio: per-ingest incremental cost must be well under the
full rebuild.  Median of 3 cold runs (session memos cleared), same protocol
as bench.py.  Results are recorded in BASELINE.md §5.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xmlstreamprocessor_spark.operators import REGISTRY  # noqa: E402
from xmlstreamprocessor_spark.operators.dedup import (  # noqa: E402
    clear_session_memos,
)
from xmlstreamprocessor_spark.session import get_session  # noqa: E402

QUERIES = [
    "dedup_pairs_delta",
    "graph_components_incremental",
    "graph_dup_group_sizes",
]


def persisted_ingest_walls(spark, sf_dir: str, workdir: str) -> None:
    """The number that matters at 100 TB: per-ingest cost of the delta
    chain when the base artifacts are PERSISTED (the registered queries
    recompute them in-query for oracle determinism, which makes their
    end-to-end walls an upper bound, not the production cost).

    Untimed setup (= ingest history): base shingle sets, df stats, base
    pair table, base CC labels — all written to parquet.  Timed, 3 runs:
    delta pairs (persisted substrate + df stats) -> star-merge into the
    persisted components -> count."""
    import shutil

    from pyspark.sql import functions as F

    from xmlstreamprocessor_spark.operators.dedup import (
        _DELTA_MOD,
        _DELTA_REM,
        _jaccard_pairs_auto,
        jaccard_pairs_delta,
        persist_postings,
        shingle_sets,
    )
    from xmlstreamprocessor_spark.operators.graph import (
        connected_components,
        merge_components,
    )
    from xmlstreamprocessor_spark.operators.registry import t

    shutil.rmtree(workdir, ignore_errors=True)
    docs = t(spark, sf_dir, "documents")
    base_docs = docs.filter((F.col("doc_id") % _DELTA_MOD) != _DELTA_REM)
    t0 = time.perf_counter()
    base_sh = shingle_sets(base_docs)
    base_sh.write.parquet(f"{workdir}/shingles")
    (
        spark.read.parquet(f"{workdir}/shingles")
        .select(F.explode("s").alias("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .write.parquet(f"{workdir}/df_stats")
    )
    base_pairs = _jaccard_pairs_auto(
        spark, sf_dir=None, threshold=0.5, docs=base_docs
    )
    connected_components(base_pairs, src="doc_a", dst="doc_b").write.parquet(
        f"{workdir}/components"
    )
    spark.sql("DROP TABLE IF EXISTS xsp_bench_postings")
    persist_postings(
        spark.read.parquet(f"{workdir}/shingles"),
        "xsp_bench_postings",
        f"{workdir}/postings",
    )
    print(f"# persisted-base setup (untimed ingest history): "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def run_ingest(label: str, **delta_kwargs) -> None:
        walls = []
        for _ in range(3):
            clear_session_memos()
            t0 = time.perf_counter()
            delta_pairs = jaccard_pairs_delta(
                spark,
                sf_dir,
                threshold=0.5,
                base_shingle_sets=spark.read.parquet(f"{workdir}/shingles"),
                df_stats=spark.read.parquet(f"{workdir}/df_stats"),
                **delta_kwargs,
            )
            merged = merge_components(
                spark.read.parquet(f"{workdir}/components"),
                delta_pairs,
                src="doc_a",
                dst="doc_b",
            )
            n = merged.count()
            walls.append(time.perf_counter() - t0)
        med = statistics.median(walls)
        print(
            f"{label}: {med:.2f}s "
            f"median of {[round(w, 2) for w in walls]} ({n} nodes)"
        )

    # r7 protocol: arrays only — probe side re-explodes the base corpus
    run_ingest("delta_ingest_persisted (arrays probe, r7 protocol)")
    # r8 protocol: bucketed postings — pruned scan, no corpus exchange
    run_ingest(
        "delta_ingest_postings (bucketed postings probe, r8 protocol)",
        base_postings=spark.table("xsp_bench_postings"),
    )
    spark.sql("DROP TABLE IF EXISTS xsp_bench_postings")
    shutil.rmtree(workdir, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    spark = get_session("xsp-delta-sf1")
    spark.range(1).count()
    for name in QUERIES:
        fn, _ = REGISTRY[name]
        walls = []
        for _ in range(3):
            clear_session_memos()
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            walls.append(time.perf_counter() - t0)
        med = statistics.median(walls)
        print(
            f"{name}: {med:.2f}s median of {[round(w, 2) for w in walls]}"
            f" ({n} rows)"
        )
    persisted_ingest_walls(spark, sf_dir, "/tmp/xsp_delta_state_sf1")
    spark.stop()


if __name__ == "__main__":
    main()
